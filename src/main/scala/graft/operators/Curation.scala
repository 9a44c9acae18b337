package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data assembly: deterministic
  * splits, stratified sampling, ratio-controlled mixing, compaction. */
object Curation {

  /** Deterministic hash bucket in [0, 100) from a key column, via md5 —
    * stable across engines, runs, and cluster sizes (unlike RNG-based
    * splits, a re-run never reassigns a document). */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 6), 16, 10).cast("long"), lit(100))

  /** Train/validation/test assignment by hash bucket:
    * [0,80) → train, [80,90) → val, [90,100) → test. */
  def split(df: DataFrame, key: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(key)) < trainPct, "train")
        .when(hashBucket(col(key)) < trainPct + valPct, "val")
        .otherwise("test"))

  /** Per-stratum deterministic downsampling: keep `fraction` of each
    * group, chosen by hash bucket (reproducible, no RNG state). */
  def stratifiedSample(df: DataFrame, key: String, stratum: String,
      fractions: Map[String, Double]): DataFrame = {
    val keep = fractions.foldLeft(lit(false)) { case (acc, (value, frac)) =>
      when(col(stratum) === value, hashBucket(col(key)) < (frac * 100).toInt).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Mix datasets at a target ratio: downsample each source to its
    * weight, then union — the standard corpus-mixing shape. */
  def mix(sources: Seq[(DataFrame, Double)], key: String): DataFrame =
    sources.map { case (df, weight) =>
      df.filter(hashBucket(col(key)) < (weight * 100).toInt)
    }.reduce(_ unionByName _)

  /** Compact a DataFrame to ~targetMB output files using the
    * optimizer's size estimate — the small-files remedy at the end of
    * any large pipeline stage. */
  def compact(df: DataFrame, targetMB: Int = 128): DataFrame = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1, (bytes / (targetMB.toLong * 1024 * 1024)).toInt)
    df.repartition(parts)
  }
}

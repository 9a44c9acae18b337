package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — equi-keys plus a time-proximity predicate
  * |left.ts − right.ts| ≤ tolerance.
  *
  * The naive formulation `l JOIN r ON key AND abs(l.ts - r.ts) <= tol`
  * degenerates to a per-key nested loop (Spark plans the inequality as
  * a post-join filter over the full per-key cross product). The
  * scalable shape buckets both sides into tolerance-sized time bands
  * and equi-joins on (key, band), expanding the left side to its
  * neighboring bands so no cross-band pair is missed; the exact
  * predicate then filters band-level false positives. Cost drops from
  * O(per-key n²) to O(pairs within ±1 band) — the standard interval-
  * join decomposition, and the same shape Spark's streaming
  * stream-stream join uses internally with watermarks. */
object RangeJoin {

  /** @param left/right   inputs with `keys` and a timestamp `tsCol`
    * @param toleranceSec proximity window in seconds
    * Right columns are prefixed `r_`. */
  def within(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      toleranceSec: Long): DataFrame = {
    val bandL = (unix_micros(col(tsCol)) / lit(toleranceSec * 1000000L)).cast("long")
    val lBanded = left
      .withColumn("_band0", bandL)
      .withColumn("_band", explode(array(col("_band0") - 1, col("_band0"), col("_band0") + 1)))
      .drop("_band0")
    val rCols = right.columns.toSeq
    val rPrefixed = rCols.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, if (keys.contains(c)) c else s"r_$c")
    }
    val rBanded = rPrefixed.withColumn("_band",
      (unix_micros(col(s"r_$tsCol")) / lit(toleranceSec * 1000000L)).cast("long"))
    lBanded.join(rBanded, keys :+ "_band")
      .filter(abs(unix_micros(col(tsCol)) - unix_micros(col(s"r_$tsCol"))) <= toleranceSec * 1000000L)
      .drop("_band")
  }
}

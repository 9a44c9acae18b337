package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Core pipeline composition (EP1 heart): union per-city frames, inner
  * join weather⋈energy on (date, city), derive temp_avg_f, sink. */
object PipelineOps {

  /** U1 — schema-aligned union of per-city frames (reference pd.concat,
    * src/pipeline.py:82-83). */
  def unionCities(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_ unionByName _)

  /** J1 — THE core query: inner equi-join on the composite key
    * (reference src/pipeline.py:86). At scale both sides shuffle on
    * (date, city); with both sides written bucketed by city the
    * exchange disappears. */
  def joinWeatherEnergy(weather: DataFrame, energy: DataFrame): DataFrame =
    weather.join(energy, Seq("date", "city"), "inner")

  /** P3 — final strict (a+b)/2 overwrite of temp_avg_f (reference
    * src/pipeline.py:89; NULL-propagating — deliberately NOT the
    * NaN-skipping rowwise mean, SURVEY §7.4 trap 1). */
  def deriveTempAvg(joined: DataFrame): DataFrame =
    joined.withColumn("temp_avg_f", (col("temp_max_f") + col("temp_min_f")) / 2)

  /** S5 — CSV sink for dashboard parity (reference to_csv,
    * src/pipeline.py:96-98). The reference writes ONE csv file; a
    * `coalesce(1)` funnels every row through a single task, which is a
    * scale-killer on a big frame — so the single-file convenience is
    * gated on a row bound (probed with a limit-count, which stops
    * scanning once the bound is exceeded) and larger frames write
    * multi-part. */
  def writeCsv(df: DataFrame, path: String,
      maxRowsSingleFile: Int = 1000000): Unit = {
    val small = df.limit(maxRowsSingleFile + 1).count() <= maxRowsSingleFile
    val out = if (small) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }

  /** Preferred engine sink: parquet partitioned by (city, date) —
    * partition pruning for the dashboard's per-city and per-range
    * queries; at 100 TB the date level would be month with compaction.
    * Partitioning MUST include the date grain: the `realtime` daily run
    * overwrites only the (city, yesterday) partitions it touched via
    * dynamic partition overwrite — partitioning by city alone would
    * replace every city's full history with yesterday's single row,
    * which is exactly the reference's overwrite-everything bug
    * (SURVEY §7.4 trap 7). `writeCsv` intentionally keeps the
    * reference's whole-file CSV for dashboard parity; the parquet path
    * is the history-preserving sink. */
  def writePartitioned(df: DataFrame, path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("city", "date")
      .parquet(path)
}

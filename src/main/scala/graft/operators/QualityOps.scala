package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.domain.QualityReport

/** Data-quality operators (SURVEY §2.9 X6/X7; reference
  * run_quality_checks, src/data_processor.py:87-112).
  *
  * The whole report is ONE single-pass aggregate — per-column null
  * counts, threshold outliers, negatives and freshness computed in the
  * same job (A8+A9+A10), not one job per metric. The clock is injected
  * (`asOfDate`) so freshness is deterministic (SURVEY §7.4 trap 8). */
object QualityOps {

  val DefaultTempMaxF = 130.0
  val DefaultTempMinF = -50.0

  /** Config-driven variants (reference run_quality_checks reads the
    * thresholds from config['data_quality'], src/data_processor.py:93-98
    * — they are parameters, not constants). */
  def report(fact: DataFrame, asOfDate: String, cfg: graft.config.PipelineConfig): QualityReport =
    report(fact, asOfDate, cfg.quality.tempMaxF, cfg.quality.tempMinF)

  def qualityTimeSeries(fact: DataFrame, cfg: graft.config.PipelineConfig): DataFrame =
    qualityTimeSeries(fact, cfg.quality.tempMaxF, cfg.quality.tempMinF)

  def problemRows(fact: DataFrame, cfg: graft.config.PipelineConfig): DataFrame =
    problemRows(fact, cfg.quality.tempMaxF, cfg.quality.tempMinF)

  /** ZERO-pass quality counters via the Observation API: row count and
    * per-column null counts are accumulated as the frame's NEXT action
    * runs (a write, a count — whatever materializes it), so the quality
    * gate costs no separate scan. At 100 TB this is the difference
    * between instrumented and un-instrumented pipelines: [[report]]
    * re-scans the fact table; this piggybacks on the scan that was
    * happening anyway. Read `obs.get` AFTER the action completes. */
  def observeQuality(fact: DataFrame, nullCols: Seq[String]
      ): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val aggs = count(lit(1)).as("n_rows") +:
      nullCols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    (fact.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Single-pass quality report over the canonical fact table. */
  def report(fact: DataFrame, asOfDate: String,
      tempMax: Double = DefaultTempMaxF, tempMin: Double = DefaultTempMinF): QualityReport = {
    val present = fact.columns.toSet
    val cols = Seq("date", "city", "temp_max_f", "temp_min_f", "temp_avg_f", "energy_demand_gwh")
      .filter(present.contains)
    // every aggregate is guarded on column presence — a weather-only,
    // energy-only, or undated frame still gets a report instead of an
    // UNRESOLVED_COLUMN failure; one-sided temp frames count outliers
    // from whichever bound is available
    val outlierPreds = Seq(
      if (present("temp_max_f")) Some(col("temp_max_f") > tempMax) else None,
      if (present("temp_min_f")) Some(col("temp_min_f") < tempMin) else None).flatten
    val tempOutlier: Option[Column] = outlierPreds.reduceOption(_ || _)
      .map(p => sum(p.cast("long")).as("temp_outliers"))
    val negEnergy: Option[Column] =
      if (present("energy_demand_gwh"))
        Some(sum((col("energy_demand_gwh") < 0).cast("long")).as("negative_energy"))
      else None
    val freshness: Seq[Column] =
      if (present("date")) Seq(
        date_format(max("date"), "yyyy-MM-dd").as("latest_date"),
        datediff(to_date(lit(asOfDate)), max("date")).as("days_since"))
      else Seq.empty
    val aggs =
      Seq(count(lit(1)).as("row_count")) ++
        cols.map(c => sum(col(c).isNull.cast("long")).as(s"null_$c")) ++
        tempOutlier ++ negEnergy ++ freshness
    val r: Row = fact.agg(aggs.head, aggs.tail: _*).collect().head
    def long(name: String): Long =
      if (!r.schema.fieldNames.contains(name) || r.isNullAt(r.fieldIndex(name))) 0L
      else r.getAs[Number](name).longValue()
    QualityReport(
      row_count = long("row_count"),
      null_counts = cols.map(c => c -> long(s"null_$c")).toMap,
      temp_outliers_count = long("temp_outliers"),
      negative_energy_count = long("negative_energy"),
      latest_data_date =
        if (!r.schema.fieldNames.contains("latest_date")) ""
        else Option(r.getAs[String]("latest_date")).getOrElse(""),
      days_since_latest_data = long("days_since").toInt)
  }

  /** X7/A4 — per-day quality time series: sums of indicator columns
    * (reference dashboards/app.py:453-468). */
  def qualityTimeSeries(fact: DataFrame,
      tempMax: Double = DefaultTempMaxF, tempMin: Double = DefaultTempMinF): DataFrame = {
    val anyNull = Seq("temp_max_f", "temp_min_f", "temp_avg_f", "energy_demand_gwh")
      .map(col(_).isNull).reduce(_ || _)
    fact
      .withColumn("missing", anyNull.cast("int"))
      .withColumn("temp_outlier",
        ((col("temp_max_f") > tempMax) || (col("temp_min_f") < tempMin)).cast("int"))
      .withColumn("neg_energy", (col("energy_demand_gwh") < 0).cast("int"))
      .groupBy("date")
      .agg(
        sum("missing").as("missing_total"),
        sum("temp_outlier").as("temp_outliers"),
        sum("neg_energy").as("negative_energy"))
      .orderBy("date")
  }

  /** P8 — the combined problem-rows filter (any-null ∨ outlier ∨
    * negative energy; reference dashboards/app.py:553-557). */
  def problemRows(fact: DataFrame,
      tempMax: Double = DefaultTempMaxF, tempMin: Double = DefaultTempMinF): DataFrame = {
    val anyNull = Seq("temp_max_f", "temp_min_f", "temp_avg_f", "energy_demand_gwh")
      .map(col(_).isNull).reduce(_ || _)
    fact.filter(anyNull ||
      (col("temp_max_f") > tempMax) || (col("temp_min_f") < tempMin) ||
      (col("energy_demand_gwh") < 0))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Weather-side operator chain (SURVEY §2, EP1 stage 1): flatten raw
  * NOAA JSON → °C→°F → pivot long-to-wide → densify onto the date spine
  * → per-city mean imputation → row-wise average.
  *
  * All steps are narrow column expressions except the pivot aggregate
  * (one shuffle on date×city) and the spine join (broadcast — the spine
  * is days×cities, tiny relative to the fact data). */
object WeatherOps {

  /** F1 — °C→°F as a column expression (reference scalar fn
    * `celsius_to_fahrenheit`, src/data_processor.py:6-8; values are
    * already °C — do NOT divide by 10, per the comment at
    * src/data_processor.py:34). */
  def celsiusToFahrenheit(c: Column): Column = c * 9.0 / 5.0 + 32.0

  /** Flatten the raw NOAA payload: explode `results`, ISO-timestamp
    * string → date (F2), tag the city (P4). Duplicate (date, datatype)
    * readings are legal and averaged by the pivot (A1 dedups them). */
  def flatten(noaaRaw: DataFrame, city: String): DataFrame =
    noaaRaw
      .select(explode(col("results")).as("r"))
      .select(
        to_date(substring(col("r.date"), 1, 10)).as("date"),
        col("r.datatype").as("datatype"),
        col("r.value").as("value_c"))
      .withColumn("city", lit(city))

  /** A1 — group-by mean + pivot long→wide: TMAX/TMIN become columns,
    * duplicate readings average (reference groupby().unstack(),
    * src/data_processor.py:48-49), then F1 converts to °F. */
  def pivotToWide(flat: DataFrame): DataFrame =
    flat.groupBy("date", "city")
      .pivot("datatype", Seq("TMAX", "TMIN"))
      .agg(avg("value_c"))
      .select(
        col("date"), col("city"),
        celsiusToFahrenheit(col("TMAX")).as("temp_max_f"),
        celsiusToFahrenheit(col("TMIN")).as("temp_min_f"))

  /** J5 — densify onto a complete per-city date spine; absent days get
    * NULL temps (reference reindex, src/data_processor.py:10-22).
    * The spine (days × cities) is generated, not read. Note the outer-
    * preserved side of an outer join cannot be the broadcast build side,
    * so this is a (tiny) shuffle join — and that is fine: the fact side
    * here is ALREADY per-day aggregated, i.e. the same order of
    * magnitude as the spine itself, at any corpus scale. */
  def densify(wide: DataFrame, city: String, start: String, end: String): DataFrame = {
    val spark = wide.sparkSession
    val spine = spark.sql(
      s"SELECT explode(sequence(to_date('$start'), to_date('$end'), interval 1 day)) AS date")
      .withColumn("city", lit(city))
    spine.join(wide, Seq("date", "city"), "left")
  }

  /** A12 — per-city mean imputation via a city-partitioned window
    * (SURVEY §7.4 trap 2: the reference imputes per city BEFORE union —
    * a global mean is wrong). */
  def imputePerCity(df: DataFrame, cols: Seq[String] = Seq("temp_max_f", "temp_min_f")): DataFrame = {
    val w = Window.partitionBy("city")
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c, coalesce(col(c), avg(col(c)).over(w)))
    }
  }

  /** A11/P3 — row-wise NaN-skipping mean for temp_avg_f (reference
    * mean(axis=1), src/data_processor.py:61). Note the final pipeline
    * overwrites this with strict (a+b)/2 (src/pipeline.py:89) — both
    * semantics exist in the engine; see SURVEY §7.4 trap 1. */
  def rowwiseAvg(a: Column, b: Column): Column =
    when(a.isNull && b.isNull, lit(null))
      .when(a.isNull, b)
      .when(b.isNull, a)
      .otherwise((a + b) / 2)

  /** Full per-city weather chain: raw payload → daily wide table. */
  def process(noaaRaw: DataFrame, city: String, start: String, end: String): DataFrame = {
    val dense = densify(pivotToWide(flatten(noaaRaw, city)), city, start, end)
    imputePerCity(dense)
      .withColumn("temp_avg_f", rowwiseAvg(col("temp_max_f"), col("temp_min_f")))
      .select("date", "temp_max_f", "temp_min_f", "temp_avg_f", "city")
  }
}

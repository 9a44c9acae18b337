package graft.domain

import org.apache.spark.sql.types._

/** Explicit schema contracts for the weather-energy domain (SURVEY §1.3:
  * the reference infers schemas from JSON/CSV; the engine pins them).
  * Dates use DateType end-to-end — the daily grain — where the reference
  * kept midnight timestamps (documented deviation, SURVEY §1.2). */
object Schemas {

  /** Raw NOAA CDO payload (FIXTURES.md §1; reference consumes it at
    * src/data_processor.py:26-40). Values are °C already — never /10. */
  val noaaRaw: StructType = StructType(Seq(
    StructField("results", ArrayType(StructType(Seq(
      StructField("date", StringType),      // ISO timestamp string
      StructField("datatype", StringType),  // "TMAX" | "TMIN"
      StructField("value", DoubleType),     // °C
      StructField("station", StringType),
      StructField("attributes", StringType)))))))

  /** Raw EIA v2 payload (FIXTURES.md §2; reference consumes it at
    * src/data_processor.py:66-76). `value` arrives as string and is
    * cast null-on-error. */
  val eiaRaw: StructType = StructType(Seq(
    StructField("response", StructType(Seq(
      StructField("total", StringType),
      StructField("data", ArrayType(StructType(Seq(
        StructField("period", StringType),  // hourly "yyyy-MM-dd'T'HH"
        StructField("respondent", StringType),
        StructField("value", StringType))))))))))

  /** Per-city daily weather (reference contract at src/data_processor.py:42-62). */
  val weatherDaily: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("temp_max_f", DoubleType),
    StructField("temp_min_f", DoubleType),
    StructField("temp_avg_f", DoubleType),
    StructField("city", StringType, nullable = false)))

  /** Per-city daily energy (reference contract at src/data_processor.py:70-85). */
  val energyDaily: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("energy_demand_gwh", DoubleType)))

  /** The canonical joined fact table (reference: src/pipeline.py:86-98,
    * dashboard input schema at dashboards/app.py:167). */
  val weatherEnergy: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("temp_max_f", DoubleType),
    StructField("temp_min_f", DoubleType),
    StructField("temp_avg_f", DoubleType),
    StructField("energy_demand_gwh", DoubleType)))

  /** City dimension (config/config.example.yaml:15-45; joined at
    * dashboards/app.py:182). Five rows — always broadcast. */
  val cityDim: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("state", StringType),
    StructField("noaa_station_id", StringType),
    StructField("eia_region_code", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType)))
}

/** Data-quality report row (reference dict at src/data_processor.py:89-110).
  * `weather_only` flags the degraded run mode where the energy side was
  * empty and the pipeline fell back to a weather-only output (reference
  * src/pipeline.py:74-78). */
case class QualityReport(
    row_count: Long,
    null_counts: Map[String, Long],
    temp_outliers_count: Long,
    negative_energy_count: Long,
    latest_data_date: String,
    days_since_latest_data: Int,
    weather_only: Boolean = false)

/** OLS regression summary (reference: scipy linregress + statsmodels CI,
  * src/analysis.py:12-37). */
case class OlsSummary(
    n: Long, slope: Double, intercept: Double, r: Double, r2: Double,
    xMean: Double, sxx: Double, residStdErr: Double)

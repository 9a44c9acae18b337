package graft.pipeline

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.domain.QualityReport
import graft.operators.{EnergyOps, PipelineOps, QualityOps, WeatherOps}

/** EP1 orchestration (reference run_pipeline, src/pipeline.py:16-111):
  * derive the date window from the mode, process each city's weather and
  * energy payloads, union, join, derive temp_avg_f, quality-check, sink.
  *
  * Deviations from the reference, both documented in SURVEY §7.4:
  *   - the duplicated tail of run_pipeline (src/pipeline.py:100-111) is
  *     a verbatim copy-paste no-op and is not replicated (trap 9);
  *   - `realtime` writes a dynamic partition overwrite instead of
  *     replacing the whole output with yesterday's rows (trap 7).
  *
  * The clock is injected so both modes are deterministic under test
  * (trap 8). Cities are processed as one lazy DAG — the per-city loop
  * only *builds* plans; nothing executes until the sink action.
  */
object Pipeline {

  sealed trait Mode
  case object Historical extends Mode // 180-day window ending yesterday (T1)
  case object Realtime extends Mode   // yesterday only (T2)

  /** Date window derivation (reference src/pipeline.py:19-28). */
  def dateWindow(mode: Mode, today: LocalDate): (String, String) = {
    val end = today.minusDays(1)
    val start = mode match {
      case Historical => end.minusDays(179)
      case Realtime   => end
    }
    (start.toString, end.toString)
  }

  /** Run over pre-landed raw payloads: one (noaaRaw, eiaRaw) pair per
    * city. Returns the fact DataFrame (lazy) — callers choose the sink. */
  def build(spark: SparkSession, rawByCity: Seq[(String, DataFrame, DataFrame)],
      start: String, end: String): DataFrame = {
    val weather = PipelineOps.unionCities(
      rawByCity.map { case (city, noaa, _) => WeatherOps.process(noaa, city, start, end) })
    val energy = PipelineOps.unionCities(
      rawByCity.map { case (city, _, eia) => EnergyOps.process(eia, city, start, end) })
    PipelineOps.deriveTempAvg(PipelineOps.joinWeatherEnergy(weather, energy))
  }

  /** Full run: build → quality report → sinks (partitioned parquet +
    * CSV for dashboard parity). */
  def run(spark: SparkSession, rawByCity: Seq[(String, DataFrame, DataFrame)],
      mode: Mode, today: LocalDate, outDir: String): QualityReport = {
    val (start, end) = dateWindow(mode, today)
    // persist: the fact feeds three actions (report, parquet, CSV) —
    // without it the whole per-city raw→fact DAG recomputes each time
    val fact = build(spark, rawByCity, start, end).persist()
    try {
      val report = QualityOps.report(fact, asOfDate = today.toString)
      PipelineOps.writePartitioned(fact, s"$outDir/weather_energy_parquet")
      PipelineOps.writeCsv(fact, s"$outDir/weather_energy_csv")
      report
    } finally fact.unpersist()
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Analytics
import graft.streaming.StreamingOps

/** Analytics and streaming queries: OLS confidence-interval bands (the
  * one custom analytic, SURVEY §2.9 X3) and the Structured Streaming
  * daily aggregate drained synchronously to memory (§2.10 extension). */
object AnalyticsQueries {

  /** X3 — OLS 95% CI bands of l_extendedprice ~ l_quantity over the
    * distinct-quantity grid. Rows-only for the driver (the Student-t
    * quantile is not expressible in DuckDB SQL); the numerics are
    * oracle-tested in ScalaTest against closed-form values. */
  def q15OlsCi(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val bands = Analytics.olsCiBands(li, "l_quantity", "l_extendedprice").get
    bands.select(
      col("x"),
      round(col("y_hat"), 4).as("y_hat"),
      round(col("ci_lower"), 4).as("ci_lower"),
      round(col("ci_upper"), 4).as("ci_upper"))
      .orderBy("x")
  }

  /** T-ext — streaming daily windowed aggregate over the events files,
    * drained with a memory sink; results equal the batch daily
    * aggregate, so the DuckDB oracle checks the whole streaming path. */
  def q22Streaming(s: SparkSession, d: String): DataFrame =
    StreamingOps.runToMemory(
      s, StreamingOps.dailyAggStream(s, s"$d/events.parquet"), "graft_stream_daily")
      .orderBy("day", "event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q15_ols_ci" -> (q15OlsCi _),
    "q22_streaming" -> (q22Streaming _)
  )

  val oracles: Map[String, String] = Map(
    "q22_streaming" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
        | count(*) AS n_events, round(sum(value),2) AS total_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Quantiles, Scd}
import graft.sources.Tables

/** Round-5 warehouse/scale tranche: point-in-time enrichment against
  * the SCD2 dimension (q126) and exact distributed quantiles (q127) —
  * both operators whose NAIVE formulations (range join; global ordered
  * window) die at 100 TB, re-expressed with the engine's key-
  * partitioned union-window and two-phase-bucket disciplines.
  */
object ScaleQueries {

  /** Point-in-time join: every event probes the SCD2 dimension built
    * from the same change log 30 seconds after its own timestamp and
    * must land in the validity interval open at that instant. The
    * naive formulation is an interval range join (Spark plans a
    * broadcast nested loop — quadratic per key); this composes
    * [[Scd.scd2]] with [[AsOfJoin.backward]] instead: ONE shuffle on
    * the key, no range blow-up. `in_interval` carries the containment
    * guarantee in-row (the matched interval's valid_to must lie after
    * the probe), so the hash oracle proves both the match identity and
    * interval consistency. */
  def q126PitJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val dim = Scd.scd2(ev, keyCols = Seq("user_id"), attrCols = Seq("event_type"),
        tsCol = "ts", tieCols = Seq("event_id"))
      .select(col("user_id"), col("valid_from").as("ts"),
        col("event_type"), col("version"), col("valid_to"))
    val probes = ev.select(col("user_id"), col("event_id"),
      (col("ts") + expr("INTERVAL 30 SECONDS")).as("ts"))
    AsOfJoin.backward(probes, dim, keys = Seq("user_id"), tsCol = "ts",
        rightCols = Seq("event_type", "version", "valid_to"))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("probe_ts"),
        col("asof_event_type"), col("asof_version"),
        (col("asof_valid_to").isNull || col("asof_valid_to") > col("ts"))
          .cast("int").as("in_interval"))
      .orderBy("user_id", "event_id")
  }

  /** Exact per-language p50/p90/p99 of document length — the audit
    * statistic `percentile_approx` cannot certify — via the two-phase
    * bucket-histogram selection ([[Quantiles.exactQuantiles]]): no
    * global sort, per-bucket parallel ranking, identical to the
    * single-sort answer (DuckDB restates it as one ordered window). */
  def q127Quantiles(s: SparkSession, d: String): DataFrame =
    Quantiles.exactQuantiles(Tables.documents(s, d), "n_chars",
        qs = Seq(0.5, 0.9, 0.99), groupCols = Seq("lang"), nBuckets = 32)
      .orderBy("lang", "q")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q126_pit_join" -> (q126PitJoin _),
    "q127_quantiles" -> (q127Quantiles _)
  )

  val oracles: Map[String, String] = Map(
    // SCD2 islands rebuild (the q124 CTE chain) + the textbook
    // inequality formulation of the point-in-time match: greatest
    // valid_from ≤ probe, then interval containment as a CASE
    "q126_pit_join" ->
      """WITH e AS (
        |  SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts, event_id
        |  FROM events),
        |o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        |  FROM e),
        |r AS (
        |  SELECT user_id, event_type, ts,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS version
        |  FROM o),
        |c AS (
        |  SELECT user_id, version, event_type, min(ts) AS vf
        |  FROM r GROUP BY 1, 2, 3),
        |iv AS (
        |  SELECT user_id, version, event_type, vf,
        |    lead(vf) OVER (PARTITION BY user_id ORDER BY version) AS vt
        |  FROM c),
        |p AS (SELECT user_id, event_id, ts + INTERVAL 30 SECOND AS pts FROM e),
        |m AS (
        |  SELECT p.user_id, p.event_id, p.pts, iv.event_type, iv.version, iv.vt,
        |    row_number() OVER (PARTITION BY p.user_id, p.event_id
        |      ORDER BY iv.vf DESC) AS rn
        |  FROM p JOIN iv ON p.user_id = iv.user_id AND iv.vf <= p.pts)
        |SELECT user_id, event_id,
        |  strftime(date_trunc('second', pts), '%Y-%m-%d %H:%M:%S') AS probe_ts,
        |  event_type AS asof_event_type, CAST(version AS BIGINT) AS asof_version,
        |  CASE WHEN vt IS NULL OR vt > pts THEN 1 ELSE 0 END AS in_interval
        |FROM m WHERE rn = 1 ORDER BY user_id, event_id""".stripMargin,
    // single ordered-window restatement; q cast to DOUBLE so ceil(q·n)
    // runs in IEEE doubles on both engines (DuckDB would otherwise
    // parse 0.9 as DECIMAL and ceil(0.9·500) = 450 vs double's 451)
    "q127_quantiles" ->
      """WITH t AS (SELECT lang, n_chars FROM documents),
        |n AS (SELECT lang, count(*) AS n FROM t GROUP BY 1),
        |r AS (SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rk
        |  FROM t),
        |q(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
        |                (CAST(0.99 AS DOUBLE))),
        |k AS (SELECT lang, q, CAST(ceil(q * n) AS BIGINT) AS k
        |  FROM n CROSS JOIN q)
        |SELECT k.lang, k.q, r.n_chars AS value
        |FROM k JOIN r ON r.lang = k.lang AND r.rk = k.k
        |ORDER BY k.lang, k.q""".stripMargin
  )
}

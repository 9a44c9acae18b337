package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Cooccur, Funnel, Sequences, Sessionize}
import graft.sources.Tables

/** Round-7 behavioral-analytics tranche: the clickstream readouts a
  * product warehouse serves daily — ordered funnels, batch
  * sessionization (spec-proven identical to the streaming
  * `session_window`), contiguous sequence mining, and item-item
  * collaborative filtering — each built on the engine's bounded
  * disciplines (key-partitioned windows, within-basket pair
  * generation, driver-scale summary frames).
  */
object BehaviorQueries {

  /** Ordered view → click → purchase funnel with a 7-day conversion
    * window ([[Funnel.funnel]]): per-step reach, step-over-step and
    * from-start conversion, mean hours-to-step. */
  def q167Funnel(s: SparkSession, d: String): DataFrame =
    Funnel.funnel(Tables.events(s, d), keyCol = "user_id", tsCol = "ts",
      stateCol = "event_type", steps = Seq("view", "click", "purchase"),
      windowDays = 7)

  /** Frequent contiguous 3-event sequences over per-user streams
    * ([[Sequences.frequentKGrams]]): occurrence count + user support,
    * support-filtered so the result is scale-stable. */
  def q171SeqMining(s: SparkSession, d: String): DataFrame =
    Sequences.frequentKGrams(Tables.events(s, d), keyCol = "user_id",
      tsCol = "ts", stateCol = "event_type", tieCol = "event_id",
      k = 3, minSupport = 0.01)

  /** Item-item CF top-5 over order baskets ([[Cooccur.itemItemTopK]]):
    * cosine of basket-incidence vectors, within-basket pair generation
    * only, oversized baskets excluded (maxBasket = 10 genuinely fires
    * on the testdata — max basket is 13 at sf0.01). */
  def q172ItemCf(s: SparkSession, d: String): DataFrame =
    Cooccur.itemItemTopK(Tables.lineitem(s, d), basketCol = "l_orderkey",
      itemCol = "l_partkey", k = 5, maxBasket = 10, minPairs = 2)

  /** Batch sessionization with a 30-minute inactivity gap
    * ([[Sessionize.sessionize]]) — the q85 streaming sessions' batch
    * twin (same merge-at-exact-gap boundary semantics, proven
    * equivalent to `session_window` in `BehaviorOpsSpec`), with
    * per-session bounds/volume rollup. */
  def q173Sessionize(s: SparkSession, d: String): DataFrame =
    Sessionize.sessionize(Tables.events(s, d), keyCol = "user_id",
        tsCol = "ts", tieCol = "event_id", gapSeconds = 1800)
      .select(col("user_id"), col("session_seq"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n_events"), col("duration_sec"))
      .orderBy("user_id", "session_seq")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q167_funnel" -> (q167Funnel _),
    "q171_seq_mining" -> (q171SeqMining _),
    "q172_item_cf" -> (q172ItemCf _),
    "q173_sessionize" -> (q173Sessionize _)
  )

  val oracles: Map[String, String] = Map(
    // the strict-sequence min-join chain restated step by step; the
    // avg divides the exact microsecond-delta sum once at the end
    // (the shuffle-order-independence discipline, see Funnel scaladoc)
    "q167_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id AS k, min(ts) AS ts1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s1d AS (SELECT k, ts1, ts1 + INTERVAL 7 DAY AS deadline FROM s1),
        |s2 AS (
        |  SELECT e.user_id AS k, s.ts1, s.deadline, min(e.ts) AS ts2
        |  FROM events e JOIN s1d s ON e.user_id = s.k
        |  WHERE e.event_type = 'click' AND e.ts > s.ts1 AND e.ts <= s.deadline
        |  GROUP BY 1, 2, 3),
        |s3 AS (
        |  SELECT e.user_id AS k, s.ts1, min(e.ts) AS ts3
        |  FROM events e JOIN s2 s ON e.user_id = s.k
        |  WHERE e.event_type = 'purchase' AND e.ts > s.ts2 AND e.ts <= s.deadline
        |  GROUP BY 1, 2),
        |summ AS (
        |  SELECT 1 AS step, 'view' AS step_name, count(*) AS n_users,
        |    CAST(0 AS BIGINT) AS sum_us FROM s1d
        |  UNION ALL
        |  SELECT 2, 'click', count(*),
        |    coalesce(sum(epoch_us(ts2) - epoch_us(ts1)), 0) FROM s2
        |  UNION ALL
        |  SELECT 3, 'purchase', count(*),
        |    coalesce(sum(epoch_us(ts3) - epoch_us(ts1)), 0) FROM s3)
        |SELECT step, step_name, n_users,
        |  round(n_users * 1.0 / (SELECT n_users FROM summ WHERE step = 1), 4)
        |    AS pct_of_start,
        |  round(n_users * 1.0 /
        |    coalesce(lag(n_users) OVER (ORDER BY step), n_users), 4) AS pct_of_prev,
        |  round(sum_us * 1.0 / nullif(n_users, 0) / 3600e6, 2) AS avg_hours_to_step
        |FROM summ ORDER BY step""".stripMargin,
    // lead(st,2) non-null implies lead(st,1) non-null within the
    // partition (contiguity), so one completeness guard suffices
    "q171_seq_mining" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id,
        |    coalesce(event_type, '(null)') AS st FROM events),
        |g AS (
        |  SELECT user_id,
        |    st || ' > ' || lead(st, 1) OVER w || ' > ' || lead(st, 2) OVER w AS gram,
        |    lead(st, 2) OVER w AS l2
        |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |cells AS (
        |  SELECT gram, count(*) AS n_occurrences,
        |    count(DISTINCT user_id) AS n_users
        |  FROM g WHERE l2 IS NOT NULL GROUP BY 1),
        |tot AS (SELECT count(DISTINCT user_id) AS tu FROM events)
        |SELECT gram, n_occurrences, n_users,
        |  round(n_users * 1.0 / tu, 6) AS support
        |FROM cells, tot
        |WHERE round(n_users * 1.0 / tu, 6) >= 0.01
        |ORDER BY gram""".stripMargin,
    // cosine rounded BEFORE ranking on both sides, so rank ties break
    // identically (the q146 round-before-select discipline)
    "q172_item_cf" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item FROM lineitem),
        |sz AS (SELECT bk, count(*) AS n FROM b GROUP BY 1),
        |kept AS (SELECT b.bk, b.item FROM b JOIN sz ON b.bk = sz.bk WHERE sz.n <= 10),
        |ic AS (SELECT item, count(*) AS n_i FROM kept GROUP BY 1),
        |half AS (
        |  SELECT x.item AS a, y.item AS b2, count(*) AS n_ab
        |  FROM kept x JOIN kept y ON x.bk = y.bk AND x.item < y.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |directed AS (
        |  SELECT a, b2, n_ab FROM half
        |  UNION ALL SELECT b2, a, n_ab FROM half),
        |scored AS (
        |  SELECT d.a, d.b2, d.n_ab, ia.n_i AS n_a, ib.n_i AS n_b,
        |    round(d.n_ab / sqrt(ia.n_i * ib.n_i), 6) AS cosine
        |  FROM directed d
        |  JOIN ic ia ON ia.item = d.a JOIN ic ib ON ib.item = d.b2),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY a ORDER BY cosine DESC, b2) AS rank
        |  FROM scored)
        |SELECT a AS item, b2 AS neighbor, n_ab, n_a, n_b, cosine, rank
        |FROM ranked WHERE rank <= 5 ORDER BY item, rank""".stripMargin,
    // diff > gap starts a new session; diff == gap merges — the
    // session_window convention, boundary-proven in BehaviorOpsSpec
    "q173_sessionize" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS newf
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |seq AS (
        |  SELECT user_id, ts,
        |    CAST(sum(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM f)
        |SELECT user_id, session_seq,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        |  count(*) AS n_events,
        |  round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1e6, 3) AS duration_sec
        |FROM seq GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin
  )
}

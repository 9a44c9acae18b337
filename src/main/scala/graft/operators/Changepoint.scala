package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** Exact single-changepoint detection per series — the offline "when
  * did the level shift" statistic (binary-segmentation step 1; Scott &
  * Knott 1974 lineage): for each key, the split point minimizing the
  * two-segment squared error, i.e. maximizing
  *
  *   Δ(t) = SSE(1..n) − [SSE(1..t−1) + SSE(t..n)],
  *   SSE(a..b) = Σx² − (Σx)²/len
  *
  * evaluated at every split 2 ≤ t ≤ n, ties → earliest split
  * (deterministic). The CUSUM family (q158) FLAGS drift online; this
  * operator LOCATES the break offline with the exact argmax.
  *
  * Scale shape: per-key cumulative sums over the ordered series (the
  * input is a daily/periodic CELL frame — bounded by periods per key,
  * never row-scale), then row-local candidate arithmetic and the q205
  * argmax discipline (max Δ per key, equality filter, min split) — no
  * global sort, no quadratic segment scan: prefix sums make every
  * candidate O(1).
  *
  * Cross-engine exactness: values are scaled to integer `cents`
  * (round(v·100)), so every prefix sum and square is EXACT integer
  * arithmetic below 2⁵³ regardless of accumulation order; the only
  * inexact steps are the final divisions, computed from identical
  * exact integers by an identical expression shape in any engine —
  * the argmax can never flip on summation order. */
object Changepoint {

  /** One row per key: n, the ord value where the second segment
    * starts, both segment means, and the SSE reduction (in the
    * original value unit², rounded at 2). Keys with n < 2 are
    * dropped (no split exists). Range contract: a series' total
    * |Σ cents| must stay below ~3·10⁹ so its square fits int64 (ANSI
    * engines raise on overflow; Spark would wrap silently) — amply
    * true for per-key periodic aggregates, the operator's substrate;
    * pre-scale monetary totals beyond that. */
  def singleChangepoint(df: DataFrame, keyCol: String, ordCol: String,
      valCol: String): DataFrame = {
    val k = col(keyCol)
    val v = round(col(valCol).cast("double") * 100).cast("long")
    val w = Window.partitionBy(k).orderBy(col(ordCol))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = df.select(k, col(ordCol), v.as("__v"))
      .withColumn("__i", row_number().over(w))
      .withColumn("__cs", sum("__v").over(wCum))
      .withColumn("__cs2", sum(col("__v") * col("__v")).over(wCum))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__ts", last("__cs").over(wAll))
      .withColumn("__ts2", last("__cs2").over(wAll))
    // every pre-division quantity stays an EXACT long (cents ≤ ~2e8,
    // squares ≤ ~4e16 — far below 2⁶³); the divisions are the only
    // doubles, fed identical exact integers in any engine
    val cand = cum.filter(col("__i") >= 2 && col("__n") >= 2)
      .withColumn("__ln", col("__i") - 1)
      .withColumn("__ls", col("__cs") - col("__v"))
      .withColumn("__ls2", col("__cs2") - col("__v") * col("__v"))
      .withColumn("__rn", col("__n") - col("__i") + 1)
      .withColumn("__rs", col("__ts") - col("__ls"))
      .withColumn("__rs2", col("__ts2") - col("__ls2"))
      .withColumn("__red",
        (col("__ts2") - col("__ts") * col("__ts") / col("__n")) -
          ((col("__ls2") - col("__ls") * col("__ls") / col("__ln")) +
            (col("__rs2") - col("__rs") * col("__rs") / col("__rn"))))
      .transform(Pin.lazily)
    val best = cand.groupBy(keyCol).agg(max("__red").as("__bred"))
    val winner = cand.join(best, Seq(keyCol))
      .filter(col("__red") === col("__bred"))
      .groupBy(k, col("__n"), col("__bred"))
      .agg(min("__i").as("__bi"))
    val detail = cand.select(k, col("__i").as("__bi"), col(ordCol),
      col("__ls"), col("__ln"), col("__rs"), col("__rn"))
    // deliberately UNROUNDED: every division here consumes exact
    // longs, so the doubles are bit-identical in any engine — rounding
    // would only reintroduce the decimal-half boundary hazard the
    // integer-cents design eliminated (observed: a mean landing on
    // x.93875 rounded differently under Spark's decimal-string
    // HALF_UP vs an engine rounding the binary double)
    winner.join(detail, Seq(keyCol, "__bi"))
      .select(k, col("__n").as("n"),
        col(ordCol).as("change_" + ordCol),
        (col("__ls") / col("__ln") / 100).as("before_mean"),
        (col("__rs") / col("__rn") / 100).as("after_mean"),
        (col("__bred") / 10000).as("sse_reduction"))
      .orderBy(keyCol)
  }
}

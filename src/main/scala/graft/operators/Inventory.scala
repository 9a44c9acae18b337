package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clamped running balance — inventory / queue semantics: the balance
  * after each movement is `b_i = max(0, b_{i-1} + x_i)` (you cannot
  * ship stock you don't have; a queue cannot be negative). The naive
  * reading of that recursion is inherently sequential — useless on a
  * cluster — but it IS the Lindley recursion (Lindley 1952, the
  * single-server queue waiting-time equation), whose closed form is
  * window-expressible:
  *
  *   b_i = prefix_i − min(0, min_{j≤i} prefix_j)
  *
  * (unwind: the clamp at zero "lifts" the raw prefix sum by however
  * far it ever sank below zero). So the whole per-key sequence needs
  * exactly TWO frames over ONE hashpartitioning(key) exchange — a
  * prefix sum and a running min — instead of a sequential fold, and
  * the attempted level `b_{i−1} + x_i = prefix_i − min(0, runmin_{i−1})`
  * falls out of the same windows with a 1-PRECEDING frame end, giving
  * the shortfall (demand that went unfulfilled at an empty balance)
  * for free. Integer deltas throughout → every derived column is
  * partition-order-exact, hence hash-oracle-able.
  */
object Inventory {

  /** Per-row clamped balance over `deltaCol` (a BIGINT column of
    * signed movements), per `keyCol`, ordered by `orderCols` (must be
    * a TOTAL order within each key, or the prefix sums are
    * nondeterministic). Appends:
    *   - `balance`   — the clamped running level after this movement
    *   - `shortfall` — max(0, −(b_{i−1} + x_i)): the part of a
    *                   withdrawal that hit an empty balance
    * One shuffle; both windows and the downstream per-key aggregate
    * reuse the same partitioning. */
  def clampedBalance(df: DataFrame, keyCol: String, deltaCol: String,
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val all = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = w.rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prefix", sum(col(deltaCol)).over(all))
      .withColumn("__floor_prev",
        least(lit(0L), coalesce(min(col("__prefix")).over(prev), lit(0L))))
      // attempted level b_{i-1} + x_i, before the clamp
      .withColumn("__attempt", col("__prefix") - col("__floor_prev"))
      .withColumn("balance", greatest(lit(0L), col("__attempt")))
      .withColumn("shortfall", greatest(lit(0L), -col("__attempt")))
      .drop("__prefix", "__floor_prev", "__attempt")
  }
}

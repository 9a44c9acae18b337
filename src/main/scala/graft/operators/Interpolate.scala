package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key linear time interpolation of missing values in an ordered
  * series — the gap-repair step between ingestion and any rolling
  * statistic (pandas' `interpolate(method="time")`; the reference
  * imputes with per-city means, q16 — interpolation is the
  * time-aware upgrade that respects local trend).
  *
  * Scale shape: ONE shuffle on the series key; the four neighbor
  * lookups are `last/first(..., ignoreNulls)` over cumulative /
  * reverse-cumulative ROWS frames of the SAME key-partitioned window —
  * no self-join, no global sort (the q24 as-of discipline applied
  * within a partition). Fill policy at the edges: leading nulls take
  * the next observation (backfill), trailing nulls the previous
  * (forward fill) — pandas `interpolate(limit_direction="both")`.
  * The interpolation weight is pure IEEE double arithmetic on epoch
  * microseconds, restated operand-for-operand by the DuckDB oracle,
  * so per-row results are bit-exact across engines unrounded. */
object Interpolate {

  /** Fill nulls in `valueCol` by linear interpolation against `tsCol`
    * within each `keys` group, ordered by (`tsCol`, `tieCols`).
    * Adds `<valueCol>_filled`; original columns pass through. */
  def linear(df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val v = col(valueCol)
    val t = unix_micros(col(tsCol)).cast("double")
    val ord: Seq[Column] = (tsCol +: tieCols).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // when(v non-null, x) carries the OBSERVED rows' values/timestamps
    // through the ignoreNulls scan; a null row sees its nearest
    // observed neighbors on each side
    val pv = last(when(v.isNotNull, v), ignoreNulls = true).over(back)
    val pt = last(when(v.isNotNull, t), ignoreNulls = true).over(back)
    val nv = first(when(v.isNotNull, v), ignoreNulls = true).over(fwd)
    val nt = first(when(v.isNotNull, t), ignoreNulls = true).over(fwd)
    df.withColumn(s"${valueCol}_filled",
      when(v.isNotNull, v)
        .when(pv.isNull, nv)  // leading gap: backfill
        .when(nv.isNull, pv)  // trailing gap: forward fill
        .when(nt === pt, pv)  // equal-ts neighbors: 0/0 guard
        .otherwise(pv + (nv - pv) * ((t - pt) / (nt - pt))))
  }

  /** Time-weighted average (TWAP) per key under step-hold semantics:
    * each observation's value holds until the next observation, so
    *
    *   twap = Σ vᵢ·Δtᵢ / Σ Δtᵢ   (i = 1..n−1, Δtᵢ = tᵢ₊₁ − tᵢ)
    *
    * — the metering/finance statistic a plain mean silently fakes on
    * irregular series (a value held for a week weighs the same as one
    * held for a second). Emitted beside `mean_value` so the sampling
    * bias is visible, with `n_obs` and the observed `span_sec`.
    *
    * Scale shape: one key-partitioned lead() window pass (the
    * [[linear]] discipline), one keyed aggregate. Δt stays an EXACT
    * long in microseconds; v·Δt sums in double with magnitude bounded
    * by span·|v| — round-4 safe. Keys with < 2 observations or a zero
    * span have no defined hold intervals and are excluded (a 1-point
    * TWAP is the point itself — noise, not a time average).
    *
    * Null policy: a null value is NOT an observation — such rows are
    * dropped BEFORE the lead() pass, so the previous observed value
    * holds across the gap. (Leaving them in would count the interval
    * in the denominator but not the numerator, silently deflating the
    * average.) */
  def twap(df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val ord: Seq[Column] = (tsCol +: tieCols).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val tu = unix_micros(col(tsCol))
    val stepped = df
      .filter(col(valueCol).isNotNull)
      .withColumn("__dt", lead(tu, 1).over(w) - tu)
    stepped.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_obs"),
        round((max(tu) - min(tu)) / lit(1e6), 3).as("span_sec"),
        round(avg(col(valueCol)), 4).as("mean_value"),
        round(sum(col(valueCol) * col("__dt")) / sum(col("__dt")), 4).as("twap"))
      .where(col("n_obs") >= 2 && col("span_sec") > 0)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase ordered-spine composition — the shared mechanics behind
  * every "cumulative/rank over an ordered frame" site that must NOT
  * funnel row-scale data through one unpartitioned window (the
  * StatTests.valueHist / q127 bucket discipline, factored out so the
  * r16 rewrites of the last two row-scale windows share one audited
  * implementation).
  *
  * The key fact both phases rely on: [[bucketOf]] is MONOTONE
  * NON-DECREASING in the order key (floor of an affine map; IEEE-754
  * subtraction/division by a positive constant are monotone), so
  * bucket order agrees with value order — every value in bucket b is
  * strictly smaller than every value in bucket b+1, and equal values
  * share a bucket. A prefix aggregate therefore composes EXACTLY:
  * cross-bucket carry (one unpartitioned window over ≤ [[Buckets]]
  * aggregated rows — constant-bounded) + within-bucket window
  * PARTITIONED BY bucket. The widest sort a row-scale frame pays is
  * one bucket's slice of the value RANGE (~n/Buckets under uniform
  * ranges; range skew concentrates values in fewer buckets and is the
  * residual, documented bound).
  *
  * Order keys are bucketed through `cast("double")`: the cast is
  * monotone (non-strict) for every numeric type, and within-bucket
  * windows order by the ORIGINAL column, so double rounding (e.g.
  * longs past 2⁵³ colliding into one bucket) never costs exactness —
  * only bucket balance. Callers with non-numeric keys must map them
  * to a numeric proxy first (none exist today: vec ids, prices,
  * durations are all numeric).
  */
object Spine {

  /** Width of the value-range bucketing: the only unpartitioned
    * window runs over ≤ this many aggregated rows. */
  val Buckets = 4096

  /** Monotone value-range bucket of `v` in [lo, hi] — clamps the
    * degenerate lo == hi frame and the v == hi edge into band 0 /
    * the top band (the StatTests/exactQuantiles convention). */
  def bucketOf(v: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0)).otherwise(
      least(floor((v - lo) / (hi - lo) * Buckets).cast("int"),
        lit(Buckets - 1)))

  /** `df` with an order-consistent `__qb` bucket over `orderKey`
    * (numeric): boundaries from the frame's own min/max (one tiny
    * aggregate, broadcast). Rows with a null key get a null bucket —
    * callers must filter nulls out first (all current callers do). */
  def bucketed(df: DataFrame, orderKey: Column): DataFrame = {
    val stats = df.agg(min(orderKey.cast("double")).as("__lo"),
      max(orderKey.cast("double")).as("__hi"))
    df.crossJoin(broadcast(stats))
      .withColumn("__qb", bucketOf(orderKey.cast("double"), col("__lo"), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Global contiguous 1-based rank (as `rankName`, LongType) over
    * `df` ordered by `orderKey` — value-identical to
    * `row_number().over(Window.orderBy(orderKey))` when the key is
    * unique and non-null (ties would be nondeterministic in BOTH
    * forms; null keys would be dropped here vs ranked first there —
    * callers assert/ensure non-null). Two-phase: per-bucket counts →
    * prefix offsets through the one constant-bounded unpartitioned
    * window, then a within-bucket row_number partitioned by bucket. */
  def rankBy(df: DataFrame, orderKey: Column, rankName: String): DataFrame = {
    val b = bucketed(df, orderKey)
    val offs = b.groupBy("__qb").agg(count(lit(1)).as("__bn"))
      .withColumn("__boff", coalesce(sum("__bn").over(
        Window.orderBy("__qb").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__qb", "__boff")
    b.join(broadcast(offs), Seq("__qb"))
      .withColumn(rankName, col("__boff") +
        row_number().over(Window.partitionBy("__qb").orderBy(orderKey)))
      .drop("__qb", "__boff")
  }
}

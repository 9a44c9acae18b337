package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) — the multi-objective shortlist
  * operator: keep every row not DOMINATED by another (dominated =
  * some row is ≤ on the minimize axis AND ≥ on the maximize axis,
  * strictly better on at least one).
  *
  * The textbook formulation is an all-pairs NOT EXISTS — quadratic,
  * dead at scale. The 2-D identity this operator exploits: group by
  * the minimize value; a row is on the frontier iff
  *
  *   maxv = max(maxv) within its minimize value          (best at its cost)
  *   AND maxv > max(maxv) over all STRICTLY smaller minimize values
  *                                                        (beats everything cheaper)
  *
  * — so the frontier falls out of one per-value aggregate plus a
  * running max over the DISTINCT-value frame. Scale shape: the data
  * pays one group-by shuffle on the minimize column; the running max
  * over the distinct-value frame is TWO-PHASE ([[Spine]], r16) — an
  * exclusive prefix max within each monotone value-range bucket
  * (window partitioned by bucket) composed with the max over all
  * earlier buckets (one unpartitioned window over ≤4096 aggregated
  * rows) — so even a near-unique continuous minimize axis never
  * funnels through a single-partition sort. The verdict join is left
  * to the planner (a small verdict frame broadcasts via AQE; a large
  * one shuffle-joins). Equal (min, max) ties are all kept — neither
  * dominates the other.
  *
  * The driver oracle for q198 is the brute-force NOT EXISTS itself,
  * so the hash match PROVES the running-max identity ≡ the dominance
  * definition on real data, not merely that both engines ran the same
  * rewrite. Determinism: pure comparisons on stored values — no
  * arithmetic at all. */
object Skyline {

  /** Rows of `df` on the (minimize `minCol`, maximize `maxCol`)
    * frontier, original columns preserved; null objective rows drop.
    * `minCol` must be numeric (bucketed through cast-to-double; the
    * within-bucket ordering still uses the original column, so the
    * cast only affects bucket balance, never exactness). */
  def paretoFrontier2D(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val data = df.filter(col(minCol).isNotNull && col(maxCol).isNotNull)
    val perMin = data.groupBy(col(minCol))
      .agg(max(col(maxCol)).as("__pmax"))
      .transform(graft.plans.Pin.lazily)
    // running max over strictly smaller minimize values, two-phase
    // (Spine bucket discipline, r16): Spine.bucketOf is monotone, so
    // values in earlier buckets are STRICTLY smaller — the exclusive
    // prefix max decomposes exactly into (max over all earlier
    // buckets) ⊔ (exclusive running max within the bucket, window
    // PARTITIONED BY bucket). greatest() ignores nulls, so the
    // "nothing cheaper exists" null flows through unchanged. No
    // row-scale frame passes through an unpartitioned window even
    // when the minimize axis is continuous.
    val b = Spine.bucketed(perMin, col(minCol).cast("double"))
    val bprev = b.groupBy("__qb").agg(max("__pmax").as("__bmax"))
      .withColumn("__bprev", max("__bmax").over(
        Window.orderBy("__qb").rowsBetween(Window.unboundedPreceding, -1)))
      .select("__qb", "__bprev")
    val verdict = b.join(broadcast(bprev), Seq("__qb"))
      .withColumn("__lprev", max("__pmax").over(
        Window.partitionBy("__qb").orderBy(col(minCol))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__smax", greatest(col("__bprev"), col("__lprev")))
      .drop("__qb", "__bprev", "__lprev")
    data.join(verdict, Seq(minCol))
      .filter(col(maxCol) === col("__pmax") &&
        (col("__smax").isNull || col("__pmax") > col("__smax")))
      .drop("__pmax", "__smax")
  }
}

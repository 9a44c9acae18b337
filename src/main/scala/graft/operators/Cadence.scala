package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-cadence regularity per actor — the behavioral bot signal: a
  * human's inter-event gaps are bursty (high coefficient of
  * variation); a scripted poller's are metronomic (CV near 0). Flags
  * actors whose gap CV falls below a threshold with enough events to
  * mean it — the curation filter that keeps scripted traffic out of a
  * behavioral training corpus.
  *
  * Exactness: gaps are WHOLE SECONDS (floored integer µs division) so
  * the variance numerator nΣg² − (Σg)² is exact integer arithmetic in
  * double for realistic per-actor volumes (g ≤ ~3·10⁵ s, Σg² ≤ ~10¹⁴)
  * — CV and the flag comparison are then bit-deterministic (the
  * rolling-OLS discipline). Sample variance (n−1); actors with < 2
  * gaps have no cadence and are excluded.
  *
  * Scale shape: one lag window partitioned by the actor (per-actor
  * sort, the q10/q173 shape) + one keyed aggregate. Nothing global,
  * nothing collected. */
object Cadence {

  /** Per-actor gap stats: (actor, n_gaps, mean_gap_s round 4,
    * sd_gap_s round 4, cv round 6, is_regular). `is_regular` =
    * cv < `cvThresh` AND n_gaps ≥ `minGaps` — both operands exact, so
    * the flag can't flip across engines. Duplicate timestamps produce
    * zero gaps (counted — a zero-gap burst IS regularity evidence at
    * CV 0 only if ALL gaps are zero... mixed bursts raise the sd). */
  def gapRegularity(df: DataFrame, actorCol: String, tsCol: String,
      minGaps: Int = 20, cvThresh: Double = 0.3): DataFrame = {
    val gaps = df.select(col(actorCol).as("actor"), col(tsCol).as("ts"))
      .where(col("actor").isNotNull && col("ts").isNotNull)
      .withColumn("__prev", lag(col("ts"), 1).over(
        Window.partitionBy(col("actor")).orderBy(col("ts"))))
      .where(col("__prev").isNotNull)
      // floored whole seconds: µs diff is double-exact (< 2^53), the
      // /1e6 quotient floors identically in both engines; ties in ts
      // order don't matter — the sorted-multiset gaps are permutation-
      // invariant under equal timestamps
      .withColumn("g",
        floor((unix_micros(col("ts")) - unix_micros(col("__prev"))) / 1000000.0))
    // integer sums exact; products cast to double BEFORE multiplying
    // (the Int64-overflow discipline — exact below 2^53)
    val stats = gaps.groupBy(col("actor"))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum("g").cast("double").as("__sg"),
        sum(col("g") * col("g")).cast("double").as("__sgg"))
      .where(col("__n") >= 2)
    val n = col("__n")
    val variance = (n * col("__sgg") - col("__sg") * col("__sg")) / (n * (n - 1))
    val mean = col("__sg") / n
    stats
      .withColumn("__cv", when(mean > 0, sqrt(variance) / mean))
      .select(col("actor"), n.cast("long").as("n_gaps"),
        round(mean, 4).as("mean_gap_s"),
        round(sqrt(variance), 4).as("sd_gap_s"),
        round(col("__cv"), 6).as("cv"),
        (col("__cv") < cvThresh && n >= minGaps).as("is_regular"))
      .orderBy("actor")
  }
}

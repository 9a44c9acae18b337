package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered multi-step funnel analysis — the conversion readout every
  * product pipeline runs over its event stream (view → click →
  * purchase): how many users reach each step IN ORDER, within a
  * bounded conversion window of their funnel entry.
  *
  * Semantics (the strict-sequence convention):
  *   - a user enters the funnel at their FIRST step-1 event (min ts);
  *   - step i is reached at the first step-i event STRICTLY AFTER the
  *     user's step-(i−1) timestamp, and no later than funnel entry +
  *     `windowDays` — the deadline anchors on ENTRY, not the previous
  *     step, so a funnel cannot stretch unboundedly through slow
  *     intermediate steps;
  *   - equal timestamps do NOT advance a step (strict `>`): an event
  *     logged in the same microsecond as its predecessor is ambiguous
  *     evidence of ordering, and the deterministic reading is "not
  *     after".
  *
  * Scale shape: each step is one filtered min-aggregate keyed by the
  * user plus an equi-join back on the SAME key — every exchange in the
  * chain hash-partitions on the user key, so AQE/exchange reuse keeps
  * it to one logical key shuffle per step and the step frames are
  * |converting users| rows, monotonically shrinking. The per-step
  * events scan carries a pushed `event_type = step` filter (a slim
  * column-pruned re-scan per step, each reading only its step's rows —
  * at 100 TB with date/type partitioning these are partition-pruned).
  * The alternative single-scan shape (collect_list per user + row-local
  * fold) pays one unfiltered shuffle of EVERY event instead; the join
  * chain is the better trade whenever steps select small slices, which
  * is what funnels do. Summary rows are 1-row aggregates unioned —
  * driver-scale by construction.
  *
  * Determinism note: `avg_hours_to_step` divides the EXACT long sum of
  * microsecond deltas once at the end (sum-of-longs is shuffle-order
  * independent; a double running mean is not).
  */
object Funnel {

  /** Per-step funnel summary: `step` (1-based), `step_name`, `n_users`
    * reaching it, `pct_of_start` / `pct_of_prev` (round 4), and
    * `avg_hours_to_step` from funnel entry (round 2; 0 for step 1). */
  def funnel(df: DataFrame, keyCol: String, tsCol: String, stateCol: String,
      steps: Seq[String], windowDays: Int = 7): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    val key = col(keyCol)

    val entry = df.filter(col(stateCol) === steps.head)
      .groupBy(key.as("k"))
      .agg(min(col(tsCol)).as("ts1"))
      .withColumn("deadline", col("ts1") + expr(s"INTERVAL $windowDays DAYS"))

    // stepFrames(i) has (k, ts1, ts{i+1}) for every user reaching step i+1
    val stepFrames = steps.tail.zipWithIndex.scanLeft(
      entry.withColumn("ts_cur", col("ts1"))) { case (prev, (step, i)) =>
      val ev = df.filter(col(stateCol) === step)
        .select(key.as("k"), col(tsCol).as("ev_ts"))
      ev.join(prev.select(col("k"), col("ts1"), col("deadline"), col("ts_cur")), Seq("k"))
        .where(col("ev_ts") > col("ts_cur") && col("ev_ts") <= col("deadline"))
        .groupBy(col("k"), col("ts1"), col("deadline"))
        .agg(min("ev_ts").as("ts_cur"))
    }

    val summaries = stepFrames.zip(steps).zipWithIndex.map { case ((frame, name), i) =>
      frame.agg(
        count(lit(1)).as("n_users"),
        sum(unix_micros(col("ts_cur")) - unix_micros(col("ts1"))).as("sum_us"))
        .select(lit(i + 1).as("step"), lit(name).as("step_name"),
          col("n_users"), coalesce(col("sum_us"), lit(0L)).as("sum_us"))
    }
    val all = summaries.reduce(_.unionByName(_))

    val start = all.where(col("step") === 1)
      .select(col("n_users").as("n_start"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("step"))
    // the summary frame is |steps| rows — a driver-scale artifact, so
    // the single-partition window over it is not a data-plane sort
    all.crossJoin(broadcast(start))
      .withColumn("prev_users", lag(col("n_users"), 1).over(w))
      .select(
        col("step"), col("step_name"), col("n_users"),
        round(col("n_users") / col("n_start").cast("double"), 4).as("pct_of_start"),
        round(col("n_users") /
          coalesce(col("prev_users"), col("n_users")).cast("double"), 4).as("pct_of_prev"),
        round(col("sum_us") / when(col("n_users") === 0, lit(null))
          .otherwise(col("n_users")) / lit(3600e6), 2).as("avg_hours_to_step"))
      .orderBy("step")
  }
}

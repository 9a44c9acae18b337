package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance — the batch
  * counterpart of the streaming partition-upsert sink (q82): a
  * periodically-refreshed rollup at 100 TB cannot re-aggregate
  * history per batch (the reference pipeline's full-refresh loop is
  * exactly what this replaces at scale); it must fold the new batch
  * into the existing aggregate touching ONLY the groups the batch
  * hits.
  *
  * Restricted to ADDITIVE aggregates (counts, sums — the mergeable
  * class; averages derive from sum/count downstream): additivity is
  * what makes "old aggregate row + batch partial = rebuilt row" an
  * identity rather than an approximation, so the operator can promise
  * the q129-style equivalence — incremental ≡ full rebuild, row for
  * row.
  *
  * Scale shape: the batch is partially aggregated FIRST (map-side
  * combine shrinks it to touched-group granularity); untouched
  * current rows pass through via an anti-join against the touched key
  * set (broadcast-sized: keys of ONE batch); only touched rows
  * re-aggregate. The bulk of the materialized table is never read
  * past the anti-join's key comparison, and with the table bucketed
  * by key both joins are exchange-free. */
object Materialize {

  /** Fold `batch` (raw rows) into `current` (materialized rows) over
    * group `keys`, where `aggs` maps output column → additive
    * aggregate over the RAW batch columns (the same spec that built
    * `current`). Returns the refreshed table. */
  def mergeAdditive(current: DataFrame, batch: DataFrame, keys: Seq[String],
      aggs: Map[String, Column]): DataFrame = {
    val delta = buildAdditive(batch, keys, aggs)
    val aggCols = aggs.toSeq.sortBy(_._1)
    val touched = delta.select(keys.map(col): _*)
    val untouched = current.join(touched, keys, "left_anti")
    // additive merge: old row + batch partial, summed per column —
    // identical to re-aggregating (old raw ∪ batch raw) by additivity
    val merged = current.join(touched, keys, "left_semi")
      .unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(aggCols.head._1).as(aggCols.head._1),
        aggCols.tail.map { case (n, _) => sum(n).as(n) }: _*)
    untouched.unionByName(merged)
  }

  /** The initial materialization under the same aggregate spec
    * [[mergeAdditive]] maintains — one definition for build and
    * refresh, so the two cannot drift. Keep materialized sums
    * UNROUNDED (rounding is not additive); round at presentation. */
  def buildAdditive(df: DataFrame, keys: Seq[String],
      aggs: Map[String, Column]): DataFrame = {
    val aggCols = aggs.toSeq.sortBy(_._1)
    df.groupBy(keys.map(col): _*)
      .agg(aggCols.head._2.as(aggCols.head._1),
        aggCols.tail.map { case (n, c) => c.as(n) }: _*)
  }
}

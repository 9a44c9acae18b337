package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) construction from a change log.
  *
  * The reference pipeline rebuilds its dimension-ish outputs wholesale
  * on every run (see the reference's full-refresh processing loop,
  * `src/data_processor.py`); a warehouse at 100 TB cannot — it needs
  * the change log collapsed into validity intervals once, then
  * appended incrementally. This operator is the batch collapse:
  * given a log of observed states `(key, attrs, ts)`, emit one row per
  * *run* of consecutive identical states per key, with
  * `[valid_from, valid_to)` bounds, a per-key `version` counter and an
  * `is_current` flag on the open interval.
  *
  * Scale design: every window is partitioned by the dimension key —
  * one shuffle on `key`, no global ordering anywhere. The run-collapse
  * is the same conditional-sum discipline as sessionization (q25): a
  * null-safe "state changed" flag, a running sum to number runs, one
  * aggregation to collapse, and a per-key `lead` to close intervals.
  * At 100 TB the change log would be bucketed by key and the whole
  * build is exchange-free after the scan.
  */
object Scd {

  /** Collapse a change log into SCD2 validity intervals.
    *
    * @param changes  observed-state log
    * @param keyCols  dimension key columns
    * @param attrCols tracked attribute columns (a run breaks when any
    *                 of these changes, null-safely)
    * @param tsCol    observation timestamp
    * @param tieCols  deterministic tiebreak for equal timestamps
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String, tieCols: Seq[String]): DataFrame = {
    val key = keyCols.map(col)
    val ord = (tsCol +: tieCols).map(col)
    val w = Window.partitionBy(key: _*).orderBy(ord: _*)
    // null-safe per-attr change: NOT (attr <=> lag(attr)); the first row
    // of a key has every lag null, which <=> treats as a change only
    // when the attr itself is non-null — so OR with row_number()=1.
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || row_number().over(w) === 1
    val runs = changes
      .withColumn("_chg", changed.cast("long"))
      .withColumn("version",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // attrs are constant within a run by construction: group them out
    val collapsed = runs
      .groupBy((key :+ col("version")) ++ attrCols.map(col): _*)
      .agg(min(col(tsCol)).as("valid_from"), count(lit(1)).as("n_rows"))
    val wv = Window.partitionBy(key: _*).orderBy(col("version"))
    collapsed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }
}

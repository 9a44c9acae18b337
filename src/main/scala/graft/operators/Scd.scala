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
  * appended incrementally. [[scd2]] is the batch collapse; [[scd2Merge]]
  * is the incremental append that provably equals a full rebuild.
  *
  * Scale design: every window is partitioned by the dimension key —
  * one shuffle on `key`, no global ordering anywhere. The run-collapse
  * is the same conditional-sum discipline as sessionization (q25): a
  * null-safe "state changed" flag, a running sum to number runs, one
  * aggregation to collapse, and a per-key `lead` to close intervals.
  * At 100 TB the change log would be bucketed by key and the whole
  * build is exchange-free after the scan. The incremental merge only
  * touches the OPEN intervals plus the new batch — the closed history
  * (the bulk of the table) is never rewritten.
  */
object Scd {

  /** Collapse a change log into SCD2 validity intervals: one row per
    * *run* of consecutive identical states per key, with
    * `[valid_from, valid_to)` bounds, a per-key `version` counter and
    * an `is_current` flag on the open interval.
    *
    * @param changes  observed-state log
    * @param keyCols  dimension key columns
    * @param attrCols tracked attribute columns (a run breaks when any
    *                 of these changes, null-safely)
    * @param tsCol    observation timestamp
    * @param tieCols  deterministic tiebreak for equal timestamps
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String, tieCols: Seq[String]): DataFrame =
    collapse(changes.withColumn("__w", lit(1L)),
      keyCols, attrCols, tsCol, (tsCol +: tieCols).map(col))

  /** Incrementally apply a new batch of observed states to an existing
    * SCD2 table, WITHOUT rebuilding closed history. The result is
    * row-identical to `scd2(old log ∪ new batch)` — the strongest
    * correctness statement an incremental operator can make (q129
    * hash-checks exactly that equivalence against DuckDB's full
    * rebuild).
    *
    * Mechanics: closed intervals pass through untouched; each key's
    * OPEN interval re-enters the run collapse as a single seed
    * pseudo-observation carrying its accumulated `n_rows` as a weight
    * (so counts keep summing across batches), unioned with the new
    * batch; collapsed mini-intervals are version-shifted by the key's
    * closed-interval count. Seeds sort before any same-instant new
    * row via a side tag, so tie columns never compare across the two
    * sources.
    *
    * Requirement (the standard warehouse append contract): every new
    * observation's `tsCol` must be ≥ its key's open `valid_from`.
    * Late records that violate it need the batch rebuild ([[scd2]]) —
    * a violating batch would SILENTLY produce intervals differing from
    * the rebuild, so the contract is enforceable: `strict = true` runs
    * [[scd2LateViolations]] (one agg over inputs the merge already
    * touches) and fails fast with the violation count instead of
    * merging wrong; pipelines that prefer to route around bad batches
    * call [[scd2LateViolations]] themselves and dispatch.
    */
  def scd2Merge(current: DataFrame, changes: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], tsCol: String, tieCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    if (strict) {
      val n = scd2LateViolations(current, changes, keyCols, tsCol).head().getLong(0)
      require(n == 0L,
        s"scd2Merge: $n late observation(s) precede their key's open valid_from — " +
          "the incremental merge would silently diverge from the batch rebuild; " +
          "rebuild with scd2(old log ++ batch) instead")
    }
    val key = keyCols.map(col)
    val outCols = (keyCols :+ "version") ++ attrCols ++
      Seq("valid_from", "n_rows", "valid_to", "is_current")
    val closed = current.filter(col("is_current") === 0)
      .select(outCols.map(col): _*)
    val open = current.filter(col("is_current") === 1)
    val seed = open.select((key ++ attrCols.map(col) ++ Seq(
      col("valid_from").as(tsCol), col("n_rows").as("__w"), lit(0).as("__side"))): _*)
    val incoming = changes.select(
      (key ++ attrCols.map(col) ++ (tsCol +: tieCols).map(col)): _*)
      .withColumn("__w", lit(1L))
      .withColumn("__side", lit(1))
    // seed's absent tie columns become null, but order compares them
    // only WITHIN a side (side 0 holds one row per key)
    val unioned = seed.unionByName(incoming, allowMissingColumns = true)
    val ord = (col(tsCol) +: col("__side") +: tieCols.map(col))
    val mini = collapse(unioned, keyCols, attrCols, tsCol, ord)
    val voff = open.select((key :+ (col("version") - 1).as("__voff")): _*)
    val merged = mini.join(voff, keyCols, "left")
      .withColumn("version", col("version") + coalesce(col("__voff"), lit(0L)))
      .select(outCols.map(col): _*)
    closed.unionByName(merged)
  }

  /** Audit of [[scd2Merge]]'s append contract: the number of new
    * observations whose `tsCol` precedes their key's open
    * `valid_from`. One equi-join of the batch against the open
    * intervals plus one count; keys absent from the current table
    * cannot violate. The open side is one row per LIVE KEY — small
    * relative to history but proportional to entity count, so the
    * join strategy is left to the planner (AQE broadcasts it when it
    * genuinely fits; a forced broadcast would OOM exactly at the
    * dimension scale this check protects). A non-zero count means the
    * batch needs the [[scd2]] full rebuild. */
  def scd2LateViolations(current: DataFrame, changes: DataFrame,
      keyCols: Seq[String], tsCol: String): DataFrame = {
    val open = current.filter(col("is_current") === 1)
      .select((keyCols.map(col) :+ col("valid_from").as("__open_from")): _*)
    changes.join(open, keyCols)
      .filter(col(tsCol) < col("__open_from"))
      .agg(count(lit(1)).as("n_late_violations"))
  }

  /** Shared run-collapse core: `__w` is each observation's row weight
    * (1 for raw observations; an open interval's accumulated n_rows
    * when it re-enters as a merge seed). */
  private def collapse(changes: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String, ord: Seq[Column]): DataFrame = {
    val key = keyCols.map(col)
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
      .agg(min(col(tsCol)).as("valid_from"), sum(col("__w")).as("n_rows"))
    val wv = Window.partitionBy(key: _*).orderBy(col("version"))
    collapsed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }
}

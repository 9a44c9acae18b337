package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of joins — for each left row, the single right row with the
  * greatest timestamp ≤ the left timestamp ([[backward]]) or the
  * smallest timestamp ≥ it ([[forward]]), per key. The general form of
  * the reference's "previous-day energy" self-join
  * (dashboards/app.py:602-607, SURVEY §2.3 J3).
  *
  * Implemented with the union-tag-window trick rather than a custom
  * physical operator: tag both sides, union, and carry the last right
  * row forward over a (key, time)-ordered window. This is the scalable
  * shape — ONE shuffle on (key), no range self-join blow-up, no
  * per-key driver loop — and it composes with AQE/skew handling for
  * free, which a hand-rolled BinaryExecNode would not. A custom
  * `SparkPlan` (SURVEY §7.3 path c) only wins when both sides are
  * already co-partitioned and sorted; the rule-of-thumb preference
  * order (compose built-ins first) applies.
  *
  * Right-side rows must be unique per (keys, tsCol) — pre-aggregate
  * otherwise (ties at the same instant make any as-of semantics
  * nondeterministic).
  */
object AsOfJoin {

  /** @param left       probe side (each row gets ≤1 match)
    * @param right      reference side (its columns are prefixed `asof_`)
    * @param keys       equi-join keys
    * @param tsCol      event-time column name (present on both sides)
    * @param rightCols  right columns to carry (default: all non-key,
    *                   non-ts)
    * @param tolerance  optional max lookback as a Spark interval
    *                   expression (e.g. "interval 1 hour"); matches
    *                   older than it are nulled out. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightCols: Seq[String] = Seq.empty, tolerance: Option[String] = None): DataFrame =
    asof(left, right, keys, tsCol, rightCols, tolerance, fwd = false)

  /** Forward as-of join — for each left row, the single right row with
    * the SMALLEST timestamp ≥ the left timestamp, per key (the
    * "next reading after the event" direction — e.g. first sensor
    * sample after an alert). Identical machinery to [[backward]] with
    * the window traversal reversed; `tolerance` bounds the look-AHEAD. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightCols: Seq[String] = Seq.empty, tolerance: Option[String] = None): DataFrame =
    asof(left, right, keys, tsCol, rightCols, tolerance, fwd = true)

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightCols: Seq[String], tolerance: Option[String], fwd: Boolean): DataFrame = {
    val carry = if (rightCols.nonEmpty) rightCols
      else right.columns.toSeq.diff(keys :+ tsCol)
    // The right row travels as ONE struct so its fields stay together:
    // carrying columns independently with last(ignoreNulls) would let a
    // NULL field in the matched row be back-filled from an OLDER right
    // row — mixing values across rows and defeating the tolerance check.
    val payload = struct(col(tsCol).as("_ts") +: carry.map(col): _*)
    val lTagged = left.withColumn("_side", lit(1))
    val rTagged = right
      .select((keys :+ tsCol).map(col) :+ payload.as("_asof"): _*)
      .withColumn("_side", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort BEFORE left rows at the same timestamp (_side 0 < 1),
    // so an exact-time match is visible to the left row; the forward
    // direction traverses time DESCENDING and carries the last-seen
    // right row, which is then the smallest ts ≥ the left ts
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (fwd) col(tsCol).desc else col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side")
    val bounded = tolerance match {
      case None => carried
      case Some(t) if fwd =>
        carried.withColumn("_asof",
          when(col("_asof._ts") > (col(tsCol) + expr(t)), lit(null))
            .otherwise(col("_asof")))
      case Some(t) =>
        carried.withColumn("_asof",
          when(col("_asof._ts") < (col(tsCol) - expr(t)), lit(null))
            .otherwise(col("_asof")))
    }
    carry.foldLeft(bounded) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"_asof.$c"))
    }.drop("_asof")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation — the admission gate every
  * large ingest pipeline runs before data is allowed downstream
  * (the reference runs its ad-hoc version in the quality report,
  * src/quality.py; this is the generalized engine).
  *
  * Design for 100 TB:
  *  - ALL row-local constraints (null, set, range, arbitrary predicate)
  *    are fused into ONE aggregate pass: each becomes a conditional
  *    count inside a single `agg`, so the table is scanned once, the
  *    partial aggregates combine map-side, and the reduce moves one
  *    row per partition. Adding a constraint adds a column, not a scan.
  *  - Uniqueness is a key-shuffled group count — the same shape (and
  *    cost) as the exact dedup it certifies; excess rows are summed
  *    from per-key partial counts, never materializing duplicates.
  *  - Referential integrity is a LEFT ANTI join probe-side count.
  *    The dim side is whatever join strategy Catalyst/AQE picks
  *    (broadcast for true dims); at extreme scale the Bloom-funnel
  *    pre-filter (Curation.bloomDecontaminate's shape) slots in front
  *    unchanged — the contract result is identical, only cheaper.
  *
  * The verdict frame is rows of (constraint, violations, n_rows,
  * passed) — tiny, unionable across tables, and directly writable as
  * the audit artifact a quarantine/alerting job consumes.
  */
object Contracts {

  sealed trait Constraint { def name: String }
  /** Row-local predicate that every row must satisfy; violations are
    * rows where `pred` is false OR NULL (nulls are failures unless the
    * predicate says otherwise — the conservative gate). */
  final case class Satisfies(name: String, pred: Column) extends Constraint
  /** No more rows than distinct key tuples. */
  final case class Unique(cols: Seq[String]) extends Constraint {
    def name: String = s"unique(${cols.mkString(",")})"
  }
  /** Every non-null `col` value must exist in `dimCol` of `dim`. */
  final case class RefIntegrity(col: String, dim: DataFrame, dimCol: String)
      extends Constraint {
    def name: String = s"ref_integrity($col)"
  }

  def notNull(c: String): Constraint = Satisfies(s"not_null($c)", col(c).isNotNull)
  def inSet(c: String, values: Seq[String]): Constraint =
    Satisfies(s"in_set($c)", col(c).isin(values: _*))
  def inRange(c: String, lo: Double, hi: Double): Constraint =
    Satisfies(s"in_range($c)", col(c) >= lo && col(c) <= hi)

  /** Run the suite; one row per constraint, ordered by constraint name. */
  def run(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val rowLocal = constraints.collect { case s: Satisfies => s }
    val uniques  = constraints.collect { case u: Unique => u }
    val refs     = constraints.collect { case r: RefIntegrity => r }

    // one scan, one conditional-count column per row-local constraint
    val fusedOpt = if (rowLocal.isEmpty) None else Some {
      val aggs = rowLocal.map(s =>
        sum(when(coalesce(s.pred, lit(false)), 0L).otherwise(1L)).as(s.name)) :+
        count(lit(1)).as("__n")
      val one = df.agg(aggs.head, aggs.tail: _*)
      val names = rowLocal.map(_.name)
      one.select(expr(
        s"stack(${names.size}, " +
          names.map(n => s"'${n}', `$n`").mkString(", ") + ") as (`constraint`, violations)"),
        col("__n").as("n_rows"))
    }

    val uniqueFrames = uniques.map { u =>
      df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("cnt"))
        .agg(coalesce(sum(col("cnt") - 1L), lit(0L)).as("violations"),
          coalesce(sum("cnt"), lit(0L)).as("n_rows"))
        .select(lit(u.name).as("constraint"), col("violations"), col("n_rows"))
    }

    val refFrames = refs.map { r =>
      val probe = df.select(col(r.col)).where(col(r.col).isNotNull)
      val miss = probe.join(r.dim.select(col(r.dimCol).as(r.col)).distinct(),
        Seq(r.col), "left_anti")
      miss.agg(count(lit(1)).as("violations"))
        .crossJoin(probe.agg(count(lit(1)).as("n_rows")))
        .select(lit(r.name).as("constraint"), col("violations"), col("n_rows"))
    }

    val all = (fusedOpt.toSeq ++ uniqueFrames ++ refFrames)
      .reduce(_.unionByName(_))
    all
      .withColumn("passed", (col("violations") === 0L).cast("int"))
      .orderBy("constraint")
  }
}

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

  /** Run the suite; one row per constraint, ordered by constraint name.
    * An empty input table passes every row-local constraint (0
    * violations over 0 rows — not a NULL verdict a quarantine filter
    * would silently drop). */
  def run(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "empty contract suite")
    val names = constraints.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate constraint names: ${names.diff(names.distinct).mkString(", ")}")
    val rowLocal = constraints.collect { case s: Satisfies => s }
    val uniques  = constraints.collect { case u: Unique => u }
    val refs     = constraints.collect { case r: RefIntegrity => r }

    // one scan, one conditional-count column per row-local constraint;
    // the (name -> count) map is built with TYPED columns (no SQL-text
    // interpolation of user-supplied names) and exploded to rows
    val fusedOpt = if (rowLocal.isEmpty) None else Some {
      val aggs = rowLocal.zipWithIndex.map { case (s, i) =>
        coalesce(sum(when(coalesce(s.pred, lit(false)), 0L).otherwise(1L)), lit(0L))
          .as(s"__c$i")
      } :+ count(lit(1)).as("__n")
      val one = df.agg(aggs.head, aggs.tail: _*)
      val kvs = rowLocal.zipWithIndex.flatMap { case (s, i) =>
        Seq(lit(s.name), col(s"__c$i"))
      }
      one.select(explode(map(kvs: _*)).as(Seq("constraint", "violations")),
        col("__n").as("n_rows"))
    }

    val uniqueFrames = uniques.map { u =>
      df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("cnt"))
        .agg(coalesce(sum(col("cnt") - 1L), lit(0L)).as("violations"),
          coalesce(sum("cnt"), lit(0L)).as("n_rows"))
        .select(lit(u.name).as("constraint"), col("violations"), col("n_rows"))
    }

    // one scan per referential check: LEFT join + a single aggregate
    // counting misses and probes together (not an anti-join plus a
    // second full probe count)
    val refFrames = refs.map { r =>
      val probe = df.select(col(r.col)).where(col(r.col).isNotNull)
      probe.join(
          r.dim.select(col(r.dimCol).as(r.col), lit(1).as("__hit")).distinct(),
          Seq(r.col), "left")
        .agg(coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)), lit(0L))
            .as("violations"),
          count(lit(1)).as("n_rows"))
        .select(lit(r.name).as("constraint"), col("violations"), col("n_rows"))
    }

    val all = (fusedOpt.toSeq ++ uniqueFrames ++ refFrames)
      .reduce(_.unionByName(_))
    all
      .withColumn("passed", (col("violations") === 0L).cast("int"))
      .orderBy("constraint")
  }
}

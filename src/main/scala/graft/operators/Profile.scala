package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiling — the `df.summary()` a warehouse actually
  * ships: for every column in one LOGICAL scan, row/null/distinct
  * counts, typed min/max, and the mean for numerics; the first thing a
  * pipeline runs against an unfamiliar 100 TB table, and the artifact
  * data-contract suites (q143) are calibrated from.
  *
  * Scale shape: ALL statistics fuse into ONE aggregate (adding a
  * column adds expressions, not scans). The exact multi-column
  * distinct forces Catalyst's Expand (one shuffled pass per distinct
  * column over the projected data — the standard plan for fused exact
  * distincts); at 100 TB swap `countDistinct` for the HLL sketch
  * (q62's `approx_count_distinct`) and the Expand disappears — the
  * exact variant is kept here because the driver's oracle hash-checks
  * it. The per-column reshape is an `explode` over structs built FROM
  * the 1-row aggregate — no recompute per column, no driver collect.
  *
  * Typed min/max: numerics surface as doubles (`min_num`/`max_num`),
  * strings compare lexicographically (`min_str`/`max_str`), timestamps
  * format to microsecond strings — never a numeric-as-string minimum
  * (cast-then-min orders "10" < "9"; min-then-cast is kept typed).
  */
object Profile {

  /** Exact per-group MODE — the missing member of the scalar-stat
    * family (min/max/exact-median/mean ship under A10/q127): the most
    * frequent value per group, ties broken by the SMALLEST value
    * (deterministic, engine-stable).
    *
    * Scale shape: one (group, value) cell aggregate (map-side
    * combinable), then the q205 argmax discipline on the cell frame —
    * max count per group, equality filter, min value — no window, no
    * sort. The cell frame is distinct-value-bounded (the exact-rank
    * histogram argument); a continuous column should be binned first
    * (mode of raw doubles is ill-posed anyway). */
  def modeByGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy((g :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__cnt"))
    val best = cells.groupBy(g: _*)
      .agg(max("__cnt").as("mode_count"), count(lit(1)).as("n_distinct"))
    cells.join(best, groupCols)
      .filter(col("__cnt") === col("mode_count"))
      .groupBy((g :+ col("mode_count")) :+ col("n_distinct"): _*)
      .agg(min(col(valueCol)).as("mode_value"))
      .select((g ++ Seq(col("mode_value"), col("mode_count"),
        col("n_distinct"))): _*)
      .orderBy(g: _*)
  }

  /** Schema profile of a free-form JSON column — the first question
    * against a landed `props`/payload field: which keys exist, how
    * often, with how many distinct values, and what share parse as
    * numbers (the "is this really a metric" signal before anyone
    * writes `props.k` into a pipeline). Malformed JSON rows contribute
    * nothing (parse-to-null, the q42 convention).
    *
    * Scale shape: one `from_json` map parse + explode (row-local),
    * one key-cell aggregate. The numeric share is an unrounded
    * exact-long ratio (bit-identical across engines — the q212
    * discipline); distinct counts are exact. */
  def jsonProfile(df: DataFrame, jsonCol: String): DataFrame = {
    val kv = df.select(explode(
        from_json(col(jsonCol), MapType(StringType, StringType)))
        .as(Seq("key", "value")))
      .filter(col("key").isNotNull)
    kv.groupBy("key").agg(
        count(lit(1)).as("n_present"),
        countDistinct("value").as("n_distinct"),
        (sum(col("value").rlike("^-?[0-9]+(\\.[0-9]+)?$").cast("long"))
          / count(lit(1))).as("numeric_share"))
      .orderBy("key")
  }

  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields
    def isNum(t: DataType) = t match {
      case _: NumericType => true
      case _ => false
    }
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(c).as(s"__cnt_${f.name}"),
        countDistinct(c).as(s"__nd_${f.name}"))
      val minMax = f.dataType match {
        case t if isNum(t) => Seq(
          min(c).cast("double").as(s"__min_${f.name}"),
          max(c).cast("double").as(s"__max_${f.name}"),
          avg(c).as(s"__avg_${f.name}"))
        case _: TimestampType | _: TimestampNTZType => Seq(
          date_format(min(c), "yyyy-MM-dd HH:mm:ss.SSSSSS").as(s"__mins_${f.name}"),
          date_format(max(c), "yyyy-MM-dd HH:mm:ss.SSSSSS").as(s"__maxs_${f.name}"))
        case _ => Seq(
          min(c).cast("string").as(s"__mins_${f.name}"),
          max(c).cast("string").as(s"__maxs_${f.name}"))
      }
      base ++ minMax
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val structs = cols.map { f =>
      val num = isNum(f.dataType)
      struct(
        lit(f.name).as("column"),
        lit(f.dataType.simpleString).as("dtype"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_${f.name}")).as("n_nulls"),
        col(s"__nd_${f.name}").as("n_distinct"),
        (if (num) col(s"__min_${f.name}") else nullD).as("min_num"),
        (if (num) col(s"__max_${f.name}") else nullD).as("max_num"),
        (if (num) round(col(s"__avg_${f.name}"), 4) else nullD).as("mean"),
        (if (num) nullS else col(s"__mins_${f.name}")).as("min_str"),
        (if (num) nullS else col(s"__maxs_${f.name}")).as("max_str"))
    }
    one.select(explode(array(structs: _*)).as("p"))
      .select("p.*")
      .orderBy("column")
  }

  /** Functional-dependency audit (the data-quality rule check behind
    * schema discovery / TANE-style profiling, stated for DECLARED
    * candidate rules): for each rule LHS → RHS, does every LHS group
    * take a single RHS value? Violations are counted as rows outside
    * each group's plurality RHS value (the minimum number of cell
    * edits that would make the FD hold — the g₃ error measure of
    * Kivinen & Mannila 1995), so `confidence` = 1 means the FD holds
    * exactly and 0.98 means 2% of rows break it.
    *
    * Scale shape per rule: one (LHS, RHS) count aggregate (map-side
    * combinable), one LHS-level re-aggregate of the counts — two
    * shuffles on aggregated frames, no windows, no row replay; rules
    * union at the plan level so Spark schedules them together. Counts
    * only — deterministic and plurality-tie-free (max of counts, not
    * an arbitrary representative). */
  def fdAudit(df: DataFrame,
      rules: Seq[(String, Seq[String], String)]): DataFrame = {
    val audits = rules.map { case (name, lhs, rhs) =>
      val cells = df.groupBy((lhs :+ rhs).map(col): _*)
        .agg(count(lit(1)).as("__c"))
      cells.groupBy(lhs.map(col): _*)
        .agg(sum("__c").as("__gn"), max("__c").as("__gmax"),
          count(lit(1)).as("__nv"))
        .agg(
          lit(name).as("rule"),
          sum("__gn").as("n_rows"),
          count(lit(1)).as("n_groups"),
          sum(when(col("__nv") > 1, 1L).otherwise(0L)).as("n_violating_groups"),
          sum(col("__gn") - col("__gmax")).as("n_violation_rows"),
          round(lit(1.0) -
            sum(col("__gn") - col("__gmax")).cast("double") / sum("__gn"), 6)
            .as("confidence"))
    }
    audits.reduce(_ unionByName _).orderBy("rule")
  }
}

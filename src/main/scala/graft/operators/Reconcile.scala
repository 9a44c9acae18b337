package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source reconciliation — the master-data "golden record"
  * build: N systems each carry a partial, possibly conflicting copy
  * of the same keyed entity; the engine must (a) align them on the
  * key, (b) elect a per-FIELD value by source priority, and
  * (c) report where the systems disagree — the disagreement census is
  * what a data-platform team actually watches, because a rising
  * conflict rate on one field is an upstream bug signal.
  *
  * Scale shape: the alignment is a chain of full-outer equi-joins on
  * the entity key — ONE hashpartitioning(key) exchange per source,
  * no windows, no skew term (keys are unique per source by
  * contract). Field election and the per-field verdict are row-local
  * CASE logic; the census is one map-side-combined aggregate. At
  * 100 TB this is exactly a co-partitioned multi-way merge; bucketed
  * source tables would make it exchange-free (see
  * [[graft.sources.Sinks.writeBucketed]]).
  */
object Reconcile {

  /** Align three sources on `key` and report, per field in `fields`,
    * the agreement census across systems a/b/c:
    *   - `n_all_present` — key exists in all three sources
    *   - `n_agree`       — all present values equal (2 or 3 present)
    *   - `n_conflict`    — at least two present values differ
    *   - `n_single`      — only one source carries the value
    * plus `n_keys` (the aligned key universe). Values are compared as
    * strings after a trim — reconciliation compares REPRESENTATIONS;
    * typed comparison is the upstream contract's job (q143). */
  def fieldCensus(a: DataFrame, b: DataFrame, c: DataFrame,
      key: String, fields: Seq[String]): DataFrame = {
    def tag(df: DataFrame, t: String): DataFrame =
      df.select((col(key).as(key) +: fields.map(f => trim(col(f).cast("string")).as(s"${f}_$t"))): _*)
    val aligned = tag(a, "a")
      .join(tag(b, "b"), Seq(key), "full_outer")
      .join(tag(c, "c"), Seq(key), "full_outer")
    val perField = fields.map { f =>
      val va = col(s"${f}_a"); val vb = col(s"${f}_b"); val vc = col(s"${f}_c")
      val present = Seq(va, vb, vc).map(v => when(v.isNotNull, 1).otherwise(0))
        .reduce(_ + _)
      // distinct present values: pairwise-equality count over the
      // non-null set (row-local; no array allocation needed)
      val eqAb = when(va.isNotNull && vb.isNotNull && va === vb, 1).otherwise(0)
      val eqAc = when(va.isNotNull && vc.isNotNull && va === vc, 1).otherwise(0)
      val eqBc = when(vb.isNotNull && vc.isNotNull && vb === vc, 1).otherwise(0)
      val agreePairs = eqAb + eqAc + eqBc
      // n present values agree fully iff every present pair is equal:
      // C(present, 2) pairs must all match
      val allPairs = (present * (present - 1)) / 2
      struct(
        lit(f).as("field"),
        when(present === 3, 1).otherwise(0).as("all_present"),
        when(present >= 2 && agreePairs === allPairs, 1).otherwise(0).as("agree"),
        when(present >= 2 && agreePairs < allPairs, 1).otherwise(0).as("conflict"),
        when(present === 1, 1).otherwise(0).as("single"))
    }
    aligned
      .select(col(key), explode(array(perField: _*)).as("v"))
      .groupBy(col("v.field").as("field"))
      .agg(count(lit(1)).as("n_keys"),
        sum("v.all_present").as("n_all_present"),
        sum("v.agree").as("n_agree"),
        sum("v.conflict").as("n_conflict"),
        sum("v.single").as("n_single"))
  }

  /** The golden record: per key, each field elected by source
    * priority a > b > c (first non-null representation wins). */
  def goldenRecord(a: DataFrame, b: DataFrame, c: DataFrame,
      key: String, fields: Seq[String]): DataFrame = {
    def tag(df: DataFrame, t: String): DataFrame =
      df.select((col(key).as(key) +: fields.map(f => trim(col(f).cast("string")).as(s"${f}_$t"))): _*)
    val aligned = tag(a, "a")
      .join(tag(b, "b"), Seq(key), "full_outer")
      .join(tag(c, "c"), Seq(key), "full_outer")
    aligned.select((col(key) +: fields.map(f =>
      coalesce(col(s"${f}_a"), col(s"${f}_b"), col(s"${f}_c")).as(f))): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** Information-theoretic dependence measures between categorical
  * columns — the feature-screening toolkit that sits beside WOE/IV
  * (q150, binned continuous → binary label) with different math and a
  * wider contract: chi-square tests ANY two categoricals for
  * independence; mutual information ranks features against a label on
  * a shared, comparison-safe scale.
  *
  * Scale shape (shared by both operators): the data pays exactly ONE
  * map-side-combinable aggregate down to the contingency cells
  * (≤ |levels_a|·|levels_b| rows — for mutual information ONE scan
  * covers ALL features via a `stack` melt); marginals, expectations,
  * and every statistic are windows/joins over that driver-scale cell
  * frame. Nothing downstream of the first aggregate sees data volume.
  *
  * Determinism: statistics are sums of ≤ cells doubles (magnitude-
  * bounded, round-4/6 safe); logarithms are natural log (the q97/q132
  * convention, bit-stable across engines at these roundings).
  */
object InfoTheory {

  /** Pearson chi-square test of independence over the (aCol, bCol)
    * contingency table, on the FULL level spine (an absent cell
    * contributes its whole expected count to the statistic — the q161
    * Benford discipline). Nulls are a real level ("(null)"), same as
    * [[mutualInfo]]. Emits one row per spine cell: observed,
    * expected (round 4), chi2 contribution (round 4), plus the in-row
    * constants (q86 convention): `chi2` (round 4), `dof`, `cramers_v`
    * (round 6), and the conventional effect-size band on V. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // null is a real level ("(null)" — the mutualInfo convention);
    // without the coalesce the spine left-join's non-null-safe equality
    // would silently zero the null level's observed counts.
    // The cell frame is re-derived three times downstream (spine a,
    // spine b, observed join) — checkpoint the ≤|a|·|b|-row artifact
    // so the data pays exactly one aggregate scan (q150 discipline)
    val obs = df.groupBy(
        coalesce(col(aCol).cast("string"), lit("(null)")).as("a"),
        coalesce(col(bCol).cast("string"), lit("(null)")).as("b"))
      .agg(count(lit(1)).as("observed"))
      .transform(Pin.eager)
    val spine = obs.select("a").distinct().crossJoin(obs.select("b").distinct())
    val full = spine.join(obs, Seq("a", "b"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
      .withColumn("row_n", sum("observed").over(Window.partitionBy(col("a"))))
      .withColumn("col_n", sum("observed").over(Window.partitionBy(col("b"))))
      .withColumn("n", sum("observed").over(Window.partitionBy()))
      // cast BEFORE multiplying: two BIGINT marginals at 100 TB scale
      // overflow Int64 (ANSI mode aborts); double products of counts
      // < 2^53 stay exact, so small-scale results are unchanged
      .withColumn("expected",
        col("row_n").cast("double") * col("col_n") / col("n"))
      .withColumn("contrib",
        pow(col("observed") - col("expected"), 2) / col("expected"))
    val totals = full.agg(
      sum("contrib").as("chi2_raw"),
      countDistinct(col("a")).as("r"),
      countDistinct(col("b")).as("c"),
      max(col("n")).as("n_total"))
      .select(
        round(col("chi2_raw"), 4).as("chi2"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        round(sqrt(col("chi2_raw") /
          (col("n_total") * least(col("r") - 1, col("c") - 1))), 6).as("cramers_v"))
      .withColumn("effect_band",
        when(col("cramers_v") < 0.1, "negligible")
          .when(col("cramers_v") < 0.3, "small")
          .when(col("cramers_v") < 0.5, "medium")
          .otherwise("large"))
    full.select(col("a"), col("b"), col("observed"),
        round(col("expected"), 4).as("expected"),
        round(col("contrib"), 4).as("contrib"))
      .crossJoin(broadcast(totals))
      .orderBy("a", "b")
  }

  /** Mutual information I(X; label) in nats for each feature column,
    * all features in ONE scan (`stack` melt → one cell aggregate),
    * with the label entropy H(label) and normalized MI / H as the
    * comparison-safe ranking score. Nulls are a real level ("(null)")
    * — a feature whose missingness predicts the label scores high,
    * which is exactly what a leakage screen wants surfaced. */
  def mutualInfo(df: DataFrame, featureCols: Seq[String], labelCol: String): DataFrame = {
    require(featureCols.nonEmpty, "mutualInfo needs >= 1 feature")
    val stackArgs = featureCols
      .map(f => s"'$f', coalesce(cast(`$f` as string), '(null)')").mkString(", ")
    val melted = df.select(
      expr(s"stack(${featureCols.size}, $stackArgs) as (feature, x)"),
      coalesce(col(labelCol).cast("string"), lit("(null)")).as("y"))
    // checkpointed for the same reason as chiSquare's obs: the label-
    // entropy branch and the per-feature aggregate would otherwise
    // each replay the melted corpus scan
    val cells = melted.groupBy("feature", "x", "y").agg(count(lit(1)).as("n_xy"))
      .transform(Pin.eager)
    val wf = Window.partitionBy(col("feature"))
    val enriched = cells
      .withColumn("n_x", sum("n_xy").over(wf.partitionBy(col("feature"), col("x"))))
      .withColumn("n_y", sum("n_xy").over(wf.partitionBy(col("feature"), col("y"))))
      .withColumn("n", sum("n_xy").over(wf))
      // double products for the same overflow reason as chiSquare's
      // expected counts (n_xy·n with BIGINT counts can pass 2^63)
      .withColumn("mi_term", col("n_xy") / col("n") *
        log(col("n_xy").cast("double") * col("n") /
          (col("n_x").cast("double") * col("n_y"))))
    // H(label) from any single feature's label marginal — identical
    // across features by construction; computed once from the first
    val hLabel = enriched.where(col("feature") === featureCols.head)
      .select(col("y"), col("n_y"), col("n")).distinct()
      .agg(sum(-col("n_y") / col("n") * log(col("n_y") / col("n"))).as("h_raw"))
      .select(round(col("h_raw"), 6).as("h_label"))
    enriched.groupBy("feature")
      .agg(countDistinct(col("x")).as("n_levels"),
        sum("mi_term").as("mi_raw"))
      .crossJoin(broadcast(hLabel))
      .select(col("feature"), col("n_levels"),
        round(col("mi_raw"), 6).as("mi_nats"),
        col("h_label"),
        round(col("mi_raw") / col("h_label"), 6).as("nmi"))
      .orderBy("feature")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-arm experiment readout with CUPED variance reduction (Deng,
  * Xu, Kohavi & Walker, WSDM 2013) — the analysis layer an
  * eval/experimentation platform runs over per-unit metrics.
  *
  * CUPED: regress the experiment-period metric on a PRE-period
  * covariate (theta = cov(pre, post)/var(pre), pooled across arms —
  * the pre-period is assignment-independent by construction, so the
  * adjustment is unbiased), analyze post − theta·(pre − mean_pre)
  * instead of post. Same effect estimate in expectation, (often much)
  * smaller variance → tighter CIs from the same traffic.
  *
  * Scale shape: one 1-row moments aggregate (sums / squares / cross
  * products — map-side combined) broadcast back for the row-local
  * adjustment, one 2-row per-arm aggregate, then single-row summary
  * arithmetic. Nothing driver-side beyond the 1-row broadcasts. The
  * CI multiplier is the large-sample normal 1.959963984540054 as a
  * parse-exact literal (per-unit experiment frames are n ≫ 100 by
  * construction; no libm quantile call to drift across engines).
  *
  * Variance algebra is explicit sums (not engine `covar_samp`/
  * `var_samp` built-ins) so the oracle restates it term for term.
  */
object Experiment {

  private val Z95 = 1.959963984540054

  /** @param armCol 0 = control, 1 = treatment
    * @return single summary row: per-arm n, raw and CUPED effect/se,
    *         t statistic, 95% CI, and the achieved variance reduction */
  def abCuped(units: DataFrame, armCol: String, preCol: String,
      postCol: String): DataFrame = {
    val u = units.select(col(armCol).cast("int").as("arm"),
        col(preCol).cast("double").as("pre"), col(postCol).cast("double").as("post"))
      .where(col("arm").isin(0, 1) && col("pre").isNotNull && col("post").isNotNull)

    val m = u.agg(count(lit(1)).as("n"),
      sum("pre").as("sp"), sum("post").as("so"),
      sum(col("pre") * col("pre")).as("spp"),
      sum(col("pre") * col("post")).as("spo"))
    // degenerate covariate (zero variance) carries no information:
    // theta 0 = plain difference-in-means, not a NaN-poisoned frame
    val preVar = col("spp") - col("sp") * col("sp") / col("n")
    val theta = when(preVar === 0.0, lit(0.0))
      .otherwise((col("spo") - col("sp") * col("so") / col("n")) / preVar)
    val mstats = m.select(col("n"), theta.as("theta"), (col("sp") / col("n")).as("mean_pre"))

    val adj = u.crossJoin(broadcast(mstats))
      .withColumn("y", col("post") - col("theta") * (col("pre") - col("mean_pre")))

    val arms = adj.groupBy("arm").agg(
        count(lit(1)).as("na"),
        sum("post").as("so_a"), sum(col("post") * col("post")).as("soo_a"),
        sum("y").as("sy_a"), sum(col("y") * col("y")).as("syy_a"))
      .withColumn("m_raw", col("so_a") / col("na"))
      .withColumn("v_raw",
        (col("soo_a") - col("so_a") * col("so_a") / col("na")) / (col("na") - 1))
      .withColumn("m_adj", col("sy_a") / col("na"))
      .withColumn("v_adj",
        (col("syy_a") - col("sy_a") * col("sy_a") / col("na")) / (col("na") - 1))

    def pick(c: String, a: Int) = max(when(col("arm") === a, col(c)))
    arms.agg(
        pick("na", 1).as("n_t"), pick("na", 0).as("n_c"),
        (pick("m_raw", 1) - pick("m_raw", 0)).as("effect_raw"),
        sqrt(pick("v_raw", 1) / pick("na", 1) + pick("v_raw", 0) / pick("na", 0)).as("se_raw"),
        (pick("m_adj", 1) - pick("m_adj", 0)).as("effect_cuped"),
        sqrt(pick("v_adj", 1) / pick("na", 1) + pick("v_adj", 0) / pick("na", 0)).as("se_cuped"),
        (lit(1.0) - (pick("v_adj", 1) + pick("v_adj", 0)) /
          (pick("v_raw", 1) + pick("v_raw", 0))).as("var_reduction"))
      .select(col("n_t"), col("n_c"),
        round(col("effect_raw"), 4).as("effect_raw"),
        round(col("se_raw"), 4).as("se_raw"),
        round(col("effect_cuped"), 4).as("effect_cuped"),
        round(col("se_cuped"), 4).as("se_cuped"),
        round(col("effect_cuped") / col("se_cuped"), 4).as("t_cuped"),
        round(col("effect_cuped") - lit(Z95) * col("se_cuped"), 4).as("ci_lo"),
        round(col("effect_cuped") + lit(Z95) * col("se_cuped"), 4).as("ci_hi"),
        round(col("var_reduction"), 4).as("var_reduction"),
        // a missing arm or a 1-unit arm nulls the effect columns via
        // max-over-nothing / division by (na-1)=0; surface that as an
        // explicit invalid verdict instead of a silently null readout
        (coalesce(col("n_t"), lit(0L)) >= 2 && coalesce(col("n_c"), lit(0L)) >= 2)
          .cast("int").as("valid"))
  }

  /** Covariate balance audit — the check that must PASS before any
    * [[abCuped]] readout is believed: per covariate, the standardized
    * mean difference between arms,
    *
    *   SMD = (mean₁ − mean₀) / sqrt((s₀² + s₁²) / 2)
    *
    * with |SMD| < 0.1 as the conventional balanced threshold (Austin
    * 2009). A randomization bug (biased hash, mid-experiment
    * assignment change) shows up here before it corrupts the effect
    * estimate.
    *
    * Scale shape: the covariates melt to (covariate, arm, value) rows
    * — ONE map-side-combinable moments aggregate over 2·C cells, then
    * cell-frame arithmetic; no per-covariate pass. Determinism: the
    * q153 discipline — feed per-unit values that are already rounded
    * (or integer) so the moment sums are reproducible, and every
    * reported double is rounded once at the edge. Zero-variance
    * covariates report a null SMD (no scale to standardize by). */
  def covariateBalance(units: DataFrame, armCol: String,
      covCols: Seq[String]): DataFrame = {
    val pairs = covCols.flatMap(c => Seq(lit(c), col(c).cast("double")))
    val melted = units
      .where(col(armCol).isin(0, 1))
      .select(col(armCol).cast("int").as("arm"),
        explode(map(pairs: _*)).as(Seq("covariate", "v")))
      .where(col("v").isNotNull)
    val cells = melted.groupBy("covariate", "arm").agg(
      count(lit(1)).as("n"), sum("v").as("s"), sum(col("v") * col("v")).as("ss"))
      .withColumn("m", col("s") / col("n"))
      // a single-unit arm divides by (n-1)=0 — Spark yields NaN where
      // DuckDB's division-by-zero yields NULL; guard so both engines
      // (and the sd0/sd1 columns, which bypass the pooled>0 check)
      // report NULL for an undefined sample variance
      .withColumn("var",
        when(col("n") > 1,
          (col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1)))
    def pick(c: String, a: Int) = max(when(col("arm") === a, col(c)))
    cells.groupBy("covariate").agg(
        pick("n", 0).as("n0"), pick("n", 1).as("n1"),
        pick("m", 0).as("__m0"), pick("m", 1).as("__m1"),
        pick("var", 0).as("__v0"), pick("var", 1).as("__v1"))
      .withColumn("__pooled", sqrt((col("__v0") + col("__v1")) / 2))
      .select(col("covariate"), col("n0"), col("n1"),
        round(col("__m0"), 4).as("mean0"), round(col("__m1"), 4).as("mean1"),
        round(sqrt(col("__v0")), 4).as("sd0"), round(sqrt(col("__v1")), 4).as("sd1"),
        when(col("__pooled") > 0,
          round((col("__m1") - col("__m0")) / col("__pooled"), 4)).as("smd"),
        when(col("__pooled") > 0,
          (abs((col("__m1") - col("__m0")) / col("__pooled")) < 0.1).cast("int"))
          .as("balanced"))
      .orderBy("covariate")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** Kaplan–Meier survival estimation — time-to-churn (or
  * time-to-failure) with right-censoring, the estimator retention and
  * reliability teams actually need when half the cohort hasn't churned
  * yet (a naive mean lifetime is biased low exactly because the
  * longest-lived units are the censored ones).
  *
  * Scale shape: one aggregate from unit-level (duration, event) rows
  * to the per-duration life table — d_t (events), c_t (censored) — so
  * everything after the first groupBy is |distinct durations| rows.
  * At-risk counts come from a running sum over that table (ordered by
  * duration, per-table scale), and the product-limit estimator
  * Π(1 − d_i/n_i) is computed as exp of the running sum of
  * ln(1 − d_i/n_i) — turning the sequential product into one window,
  * the same discipline as [[Seasonal.cusum]]'s drawup identity.
  */
object Survival {

  /** @param durationCol integer/long time-to-event (or censor) per unit
    * @param eventCol    1 = event observed (churn/failure), 0 = censored
    * @return life table: t, n_at_risk, n_events, n_censored,
    *         survival (product-limit S(t), 4 decimals) */
  def kaplanMeier(units: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val u = units.select(col(durationCol).cast("long").as("t"),
        col(eventCol).cast("int").as("e"))
      .where(col("t").isNotNull && col("t") >= 0 && col("e").isin(0, 1))

    val table = u.groupBy("t")
      .agg(sum(col("e")).cast("long").as("n_events"),
        sum(lit(1) - col("e")).cast("long").as("n_censored"))
    val total = table.agg(
      coalesce(sum(col("n_events") + col("n_censored")), lit(0L)).as("n_total"))

    // bounded windows (r16 audit): the life table is |distinct
    // durations| rows — integer time gaps capped by the observation
    // span (a time-domain constant), never unit count
    val byT = Window.orderBy(col("t"))
    table.crossJoin(broadcast(total))
      .withColumn("exited_before",
        coalesce(sum(col("n_events") + col("n_censored"))
          .over(byT.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_at_risk", col("n_total") - col("exited_before"))
      // d = n_at_risk is the absorbing state (everyone remaining
      // failed): the factor is exactly 0 and every later S(t) is 0 —
      // handled as an explicit flag, not ln(0)
      .withColumn("log_term",
        when(col("n_events") > 0 && col("n_events") < col("n_at_risk"),
          log(lit(1.0) - col("n_events") / col("n_at_risk").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("hit_zero",
        max((col("n_events") === col("n_at_risk")).cast("int")).over(byT))
      .withColumn("survival",
        when(col("hit_zero") === 1, lit(0.0))
          .otherwise(round(exp(sum("log_term").over(byT)), 4)))
      .select("t", "n_at_risk", "n_events", "n_censored", "survival")
      .orderBy("t")
  }

  /** Log-rank test (Mantel 1966) — "do the survival curves differ":
    * the hypothesis test that completes [[kaplanMeier]]'s estimate,
    * comparing event incidence across groups at every event time
    * against what the pooled at-risk shares would predict. Per group:
    * observed events O_g and expected E_g = Σ_t d_t·n_{g,t}/n_t; for
    * the 2-group case the classic statistic rides in-row (the q86
    * in-row-constant convention):
    *
    *   Var = Σ_t d_t·(n₁ₜ/nₜ)·(1−n₁ₜ/nₜ)·(nₜ−d_t)/(nₜ−1),
    *   χ² = (O₁ − E₁)²/Var          (null when groups ≠ 2)
    *
    * Scale shape: unit rows collapse to the per-(group, duration)
    * life-table cells in one aggregate; the cell frame DENSIFIES to
    * the (event-times × groups) grid (at-risk counts exist at every
    * event time, including times a group has no exits), at-risk
    * counts are per-group cumulative windows over that bounded grid,
    * and every statistic is an aggregate of it. Counts are exact
    * integers; E/Var are double sums over the times frame, rounded
    * at 4 (the aggregated-double discipline). */
  def logRankTest(units: DataFrame, durationCol: String, eventCol: String,
      groupCol: String): DataFrame = {
    val u = units.select(col(groupCol).as("g"),
        col(durationCol).cast("long").as("t"),
        col(eventCol).cast("int").as("e"))
      .where(col("g").isNotNull && col("t").isNotNull && col("t") >= 0 &&
        col("e").isin(0, 1))
    val cells = u.groupBy("g", "t")
      .agg(sum(col("e")).cast("long").as("d"),
        count(lit(1)).cast("long").as("x")) // x = all exits at t
      .transform(Pin.lazily)
    val times = cells.select("t").distinct()
    val groups = cells.groupBy("g").agg(sum("x").as("n_g"))
    val grid = times.crossJoin(broadcast(groups))
      .join(cells, Seq("g", "t"), "left")
      .na.fill(0L, Seq("d", "x"))
    val byG = Window.partitionBy("g").orderBy("t")
    val atRisk = grid.withColumn("exited_before",
        coalesce(sum("x").over(byG.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("n_gt", col("n_g") - col("exited_before"))
    val byT = Window.partitionBy("t")
    val full = atRisk
      .withColumn("n_t", sum("n_gt").over(byT))
      .withColumn("d_t", sum("d").over(byT))
      .filter(col("d_t") > 0)
    val per = full.groupBy(col("g").as(groupCol))
      .agg(sum("d").as("observed"),
        sum(col("d_t") * col("n_gt") / col("n_t")).as("__e"))
    // 2-group variance from the pooled frame, keyed on the SMALLEST
    // group label (deterministic choice of "group 1")
    val g1 = groups.agg(min("g").as("__g1"))
    val varChi = full.crossJoin(broadcast(g1))
      .filter(col("g") === col("__g1") && col("n_t") > 1)
      .agg(sum(col("d_t") * (col("n_gt") / col("n_t")) *
        (lit(1.0) - col("n_gt") / col("n_t")) *
        (col("n_t") - col("d_t")) / (col("n_t") - 1)).as("__var"))
    val o1e1 = per.crossJoin(broadcast(g1))
      .filter(col(groupCol) === col("__g1"))
      .select(col("observed").as("__o1"), col("__e").as("__e1"))
    val nGroups = groups.agg(count(lit(1)).as("__k"))
    per.crossJoin(broadcast(varChi)).crossJoin(broadcast(o1e1))
      .crossJoin(broadcast(nGroups))
      .select(col(groupCol), col("observed"),
        round(col("__e"), 4).as("expected"),
        when(col("__k") === 2 && col("__var") > 0,
          round((col("__o1") - col("__e1")) * (col("__o1") - col("__e1"))
            / col("__var"), 4))
          .as("chi2"))
      .orderBy(groupCol)
  }
}

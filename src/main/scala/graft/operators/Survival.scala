package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

    val byT = Window.orderBy(col("t")) // |distinct durations| rows — table scale
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
}

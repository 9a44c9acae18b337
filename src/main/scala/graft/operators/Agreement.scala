package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-rater agreement between two binary labelers — the
  * calibration check a pipeline runs before swapping one quality
  * filter for another (heuristic vs classifier, old vs new prompt):
  * raw agreement alone flatters any pair of raters that both say
  * "keep" to most documents; Cohen's kappa (Cohen 1960) subtracts the
  * chance-agreement floor,
  *
  *   κ = (p_o − p_e) / (1 − p_e),   p_e = p_A⁺·p_B⁺ + p_A⁻·p_B⁻
  *
  * with the Landis–Koch bands as the verdict column.
  *
  * Scale shape: ONE aggregate over the labeled frame computes the
  * whole 2×2 confusion table (conditional-sum columns — the q13/q83
  * single-pass discipline); everything after is scalar arithmetic on
  * a 1-row frame. Degenerate guard: when either rater is constant,
  * p_e can reach 1 and κ is 0/0 — reported as 0 with verdict
  * 'degenerate' (the standard convention: a constant rater carries no
  * information to agree WITH). */
object Agreement {

  /** One-row kappa report for boolean rater columns `a` and `b`.
    * Rows where either rater is null are excluded up front (they
    * belong to no cell of the 2×2 table; counting them in `n` would
    * silently skew every proportion). An EMPTY labeled set routes to
    * the degenerate verdict (κ = 0, p_e = 1) instead of letting
    * null/NaN ratios fall through the verdict chain to a spurious
    * 'almost_perfect'. */
  def cohenKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val counts = df.filter(a.isNotNull && b.isNotNull).agg(
      count(lit(1)).as("n"),
      coalesce(sum((a && b).cast("long")), lit(0L)).as("n_pos_pos"),
      coalesce(sum((a && !b).cast("long")), lit(0L)).as("n_pos_neg"),
      coalesce(sum((!a && b).cast("long")), lit(0L)).as("n_neg_pos"),
      coalesce(sum((!a && !b).cast("long")), lit(0L)).as("n_neg_neg"))
    val empty = col("n") === 0
    val nd = col("n").cast("double")
    val po = when(empty, lit(0.0))
      .otherwise((col("n_pos_pos") + col("n_neg_neg")) / nd)
    val pa = (col("n_pos_pos") + col("n_pos_neg")) / nd
    val pb = (col("n_pos_pos") + col("n_neg_pos")) / nd
    val pe = when(empty, lit(1.0))
      .otherwise(pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb))
    val kappa = when(pe === 1.0, lit(0.0)).otherwise((po - pe) / (lit(1.0) - pe))
    counts.select(
      col("n"), col("n_pos_pos"), col("n_pos_neg"),
      col("n_neg_pos"), col("n_neg_neg"),
      round(po, 6).as("p_observed"),
      round(pe, 6).as("p_expected"),
      round(kappa, 6).as("kappa"),
      when(pe === 1.0, lit("degenerate"))
        .when(kappa < 0.0, lit("poor"))
        .when(kappa < 0.2, lit("slight"))
        .when(kappa < 0.4, lit("fair"))
        .when(kappa < 0.6, lit("moderate"))
        .when(kappa < 0.8, lit("substantial"))
        .otherwise(lit("almost_perfect")).as("verdict"))
  }
}

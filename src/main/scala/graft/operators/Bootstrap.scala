package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson bootstrap — the bootstrap that actually runs at 100 TB.
  *
  * The classical bootstrap resamples n rows WITH replacement B times,
  * which is unimplementable distributed (each replica needs global
  * coordinated sampling). The Poisson bootstrap (Chamandy et al.,
  * "Estimating Uncertainty for Massive Data Streams", Google 2012)
  * replaces each replica's multinomial row-count with an independent
  * Poisson(1) weight PER ROW PER REPLICA — row-local, no coordination,
  * and the replica statistics converge to the same sampling
  * distribution. Each row explodes into B (replica, weight) pairs,
  * weighted partial aggregates combine map-side, and the shuffle moves
  * only (group, replica) cells — B·|groups| rows, independent of n.
  *
  * Weights are DETERMINISTIC: the Poisson draw inverts the λ=1 CDF on
  * a uniform derived from md5(row-id : replica) — the engine's
  * standard reproducible-randomness idiom (Curation's split/sample
  * family), which is what lets a DuckDB oracle restate the entire
  * resampling exactly. CDF thresholds are hard literals, not exp()
  * calls, so no libm difference can shift a draw.
  *
  * Replica means are rounded to 6 decimals BEFORE rank-selection of
  * the CI order statistics: double summation order inside a replica
  * cell is shuffle-dependent, and rounding makes the selected order
  * statistic reproducible without changing which replica is selected.
  */
object Bootstrap {

  /** P(Poisson(1) ≤ k) for k = 0..8, as parse-exact literals; draws
    * above 8 are capped (P ≈ 1e-6 — below the resolution of the
    * 48-bit uniform's contribution to a 200-replica CI). */
  private val Cdf = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253, 0.9999988852520038)

  /** Poisson(1) weight column from a deterministic uniform. */
  private def poissonWeight(u: Column): Column =
    Cdf.zipWithIndex.foldRight(lit(Cdf.size): Column) {
      case ((t, k), rest) => when(u < t, k).otherwise(rest)
    }

  /** Percentile CI of the per-group mean of `valCol`.
    *
    * @param idCol unique row id (seeds the reproducible weights)
    * @param b     number of bootstrap replicas
    * @param alpha two-sided miss probability (0.05 → 95% CI)
    * @return one row per group: n, point-estimate mean, ci_lo, ci_hi
    */
  def meanCi(df: DataFrame, valCol: String, keyCols: Seq[String], idCol: String,
      b: Int = 200, alpha: Double = 0.05): DataFrame = {
    require(b >= 20, s"too few replicas for a CI: $b")
    val keys = keyCols.map(col)

    val rows = df.select(keys :+ col(valCol).cast("double").as("x")
        :+ col(idCol).cast("string").as("rid"): _*)
      .where(col("x").isNotNull)

    // one exploded pass: row -> B (replica, Poisson weight) pairs
    val weighted = rows
      .select(keys ++ Seq(col("x"), col("rid"),
        explode(sequence(lit(0), lit(b - 1))).as("rep")): _*)
      .withColumn("u",
        conv(substring(md5(concat_ws(":", col("rid"), col("rep"))), 1, 12), 16, 10)
          .cast("double") / 281474976710656.0)
      .withColumn("w", poissonWeight(col("u")).cast("double"))

    val replicaMeans = weighted
      .groupBy(keys :+ col("rep"): _*)
      .agg(sum(col("w") * col("x")).as("wx"), sum("w").as("wsum"))
      .where(col("wsum") > 0.0) // a dead replica (all-zero weights) carries no estimate
      .withColumn("m", round(col("wx") / col("wsum"), 6))

    val ranked = replicaMeans
      .withColumn("rk", row_number().over(
        Window.partitionBy(keys: _*).orderBy(col("m"), col("rep"))))
      .withColumn("n_rep", count(lit(1)).over(Window.partitionBy(keys: _*)))
    val kLo = ceil(col("n_rep") * (alpha / 2)).cast("long")
    val kHi = ceil(col("n_rep") * (1 - alpha / 2)).cast("long")
    val ci = ranked
      .withColumn("is_lo", (col("rk") === kLo).cast("int"))
      .withColumn("is_hi", (col("rk") === kHi).cast("int"))
      .groupBy(keys: _*)
      .agg(round(max(when(col("is_lo") === 1, col("m"))), 4).as("ci_lo"),
        round(max(when(col("is_hi") === 1, col("m"))), 4).as("ci_hi"))

    val point = rows.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"), round(avg("x"), 4).as("mean"))

    point.join(ci, keyCols).orderBy(keys: _*)
  }
}

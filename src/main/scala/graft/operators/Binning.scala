package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** Equi-depth feature binning + Weight-of-Evidence / Information Value
  * — the credit-scoring-style feature audit that tells a trainer how
  * much signal a numeric feature carries about a binary label, bin by
  * bin, before any model is fit.
  *
  * Scale shape: bin EDGES are exact order statistics from
  * [[Quantiles.exactQuantiles]] (two-phase bucket histogram — no
  * global sort), collected as a KB-scale artifact (nBins-1 doubles,
  * the k-means-centroid pattern) and applied as a row-local indicator
  * sum — bin = #edges strictly below the value, so assignment is one
  * codegen'd projection, no join, no window. WOE/IV arithmetic then
  * runs on the nBins-row cell frame with the grand totals broadcast
  * back (Layout's bounds idiom).
  *
  * WOE uses the standard 0.5 additive smoothing so empty-class bins
  * stay finite; IV is the per-bin contribution — sum it for the
  * feature's total. Values equal to an edge fall in the LOWER bin
  * (strict `>` indicators), pinned here for the oracle restatement.
  */
object Binning {

  def woeBins(spark: SparkSession, df: DataFrame, featureCol: String,
      labelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"nBins out of range: $nBins")
    val v = col(featureCol).cast("double")
    val y = col(labelCol).cast("long")
    val rows = df.select(v.as("v"), y.as("y"))
      .where(col("v").isNotNull && col("y").isNotNull)

    val qs = (1 until nBins).map(_.toDouble / nBins)
    val edges = Quantiles.exactQuantiles(rows, "v", qs)
      .orderBy("q").collect().map(_.getAs[Double]("value"))

    val bin = edges.foldLeft(lit(0)) { (acc, e) => acc + (col("v") > e).cast("int") }
    // localCheckpoint the nBins-row cell frame: totals and the final
    // WOE select are two further consumers, and without it each one
    // re-derives the full scan+shuffle pipeline (measured 3x the cost
    // at sf0.1)
    val cells = rows
      .withColumn("bin", bin)
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_good"),
        (count(lit(1)) - sum("y")).as("n_bad"),
        round(min("v"), 4).as("v_min"), round(max("v"), 4).as("v_max"))
      .transform(Pin.eager)

    val totals = cells.agg(sum("n_good").as("g_all"), sum("n_bad").as("b_all"))
    cells.crossJoin(broadcast(totals))
      .withColumn("g_rate", (col("n_good") + 0.5) / col("g_all"))
      .withColumn("b_rate", (col("n_bad") + 0.5) / col("b_all"))
      .withColumn("woe", round(log(col("g_rate") / col("b_rate")), 6))
      .withColumn("iv", round((col("g_rate") - col("b_rate")) *
        log(col("g_rate") / col("b_rate")), 6))
      .select("bin", "n", "n_good", "n_bad", "v_min", "v_max", "woe", "iv")
      .orderBy("bin")
  }
}

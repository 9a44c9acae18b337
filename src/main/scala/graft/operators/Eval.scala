package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation metrics computed exactly at corpus scale — the
  * readouts that decide whether a quality classifier (q107) or scoring
  * rule is allowed to gate a pipeline.
  *
  * AUC is computed by the Mann–Whitney rank identity with average
  * ranks for ties:
  *
  *   AUC = (Σ_pos avgrank − n⁺(n⁺+1)/2) / (n⁺·n⁻)
  *
  * — exactly the probability a random positive outranks a random
  * negative (ties count ½), with NO threshold sweep or curve
  * discretization. Scale shape: one rank window partitioned by the
  * evaluation group (per-group sort, no global ordering), a tie-count
  * window over the same partitioning, then a 1-row-per-group
  * aggregate. Average ranks are k + (tie−1)/2 — halves, exact in
  * double; count products cast to double before multiplying (the
  * Int64-overflow discipline). Groups without both classes have no
  * ranking to measure and are excluded. */
object Eval {

  /** Exact tie-aware AUC per group: (group, n_pos, n_neg, auc round 6).
    * `labelCol` must be 0/1 (cast to int); null labels or scores drop
    * the row. */
  def aucByGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      labelCol: String): DataFrame = {
    val g = groupCols.map(col)
    val data = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select((g :+ col(scoreCol).cast("double").as("__s")) :+
        col(labelCol).cast("int").as("__y"): _*)
    val wRank = Window.partitionBy(g: _*).orderBy(col("__s"))
    val wTie = Window.partitionBy((g :+ col("__s")): _*)
    val ranked = data
      .withColumn("__minrank", rank().over(wRank))
      .withColumn("__tie", count(lit(1)).over(wTie))
      .withColumn("__avgrank", col("__minrank") + (col("__tie") - 1) / 2.0)
    ranked.groupBy(g: _*)
      .agg(
        sum(col("__y").cast("long")).as("n_pos"),
        sum((lit(1) - col("__y")).cast("long")).as("n_neg"),
        sum(when(col("__y") === 1, col("__avgrank"))).as("__sumrank"))
      .where(col("n_pos") > 0 && col("n_neg") > 0)
      .select((g ++ Seq(col("n_pos"), col("n_neg"),
        round((col("__sumrank") - col("n_pos").cast("double") * (col("n_pos") + 1) / 2) /
          (col("n_pos").cast("double") * col("n_neg")), 6).as("auc"))): _*)
      .orderBy(g: _*)
  }
}

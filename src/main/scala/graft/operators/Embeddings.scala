package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions

/** Corpus-level embedding-column statistics and normalization.
  *
  * Per-dimension moments are ONE `vec_sum` aggregate pass (the native
  * TypedImperativeAggregate): each partition folds its vectors into a
  * d-length buffer, buffers merge associatively, and the shuffle moves
  * d doubles per partition — never an exploded (row × dim) stream,
  * which at 100 TB × d=1024 would be a 1024× row blow-up through the
  * exchange. The d-row output frame is driver-scale by definition
  * (d ≤ a few thousand).
  *
  * [[whiten]] applies the inverse-std transform row-locally from the
  * collected d-length stats arrays — a KB-scale model artifact (the
  * k-means-centroid pattern), embedded as literals in a higher-order
  * `transform`, so normalization is a zero-shuffle projection.
  */
object Embeddings {

  /** One row per dimension: n, mean, std (population), all from a
    * single aggregate pass (sums + squared sums via vec_sum). */
  def perDimStats(spark: SparkSession, emb: DataFrame, vecCol: String): DataFrame = {
    GraftFunctions.register(spark)
    val agg = emb.where(col(vecCol).isNotNull)
      .agg(
        expr(s"vec_sum($vecCol)").as("s1"),
        expr(s"vec_sum(transform($vecCol, x -> cast(x as double) * cast(x as double)))")
          .as("s2"),
        count(lit(1)).as("n"))
    agg
      .select(col("n"), col("s2"), posexplode(col("s1")).as(Seq("dim", "sum1")))
      .withColumn("sum2", element_at(col("s2"), col("dim") + 1))
      .withColumn("mean", col("sum1") / col("n"))
      .withColumn("variance",
        greatest(col("sum2") / col("n") - col("mean") * col("mean"), lit(0.0)))
      .select(col("dim"), col("n"),
        round(col("mean"), 6).as("mean"),
        round(sqrt(col("variance")), 6).as("std"))
      .orderBy("dim")
  }

  /** Standardize every vector to zero-mean/unit-std per dimension.
    * Stats are collected once (d doubles — KB-scale) and applied as a
    * row-local transform; zero-variance dims pass through centered. */
  def whiten(spark: SparkSession, emb: DataFrame, vecCol: String): DataFrame = {
    val stats = perDimStats(spark, emb, vecCol)
      .select("dim", "mean", "std").collect()
      .sortBy(_.getAs[Int]("dim"))
    val means = stats.map(_.getAs[Double]("mean"))
    val stds  = stats.map(_.getAs[Double]("std")).map(s => if (s == 0.0) 1.0 else s)
    val meanArr = array(means.map(lit(_)): _*)
    val stdArr  = array(stds.map(lit(_)): _*)
    emb.withColumn("__m", meanArr).withColumn("__s", stdArr)
      .withColumn(vecCol,
        expr(s"transform($vecCol, (x, i) -> " +
          s"cast((cast(x as double) - element_at(__m, i + 1)) / element_at(__s, i + 1) as float))"))
      .drop("__m", "__s")
  }
}

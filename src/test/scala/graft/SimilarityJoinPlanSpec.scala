package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.SimilarityJoinApi
import graft.operators.Similarity

/** The custom logical node + Catalyst rewrite rule: declaring a
  * similarity join must produce exactly the same result as calling the
  * LSH operator directly, and the node must disappear from the
  * optimized plan. */
class SimilarityJoinPlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("similarity join node rewrites to the LSH plan and matches the direct call") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 3)
    val viaNode = SimilarityJoinApi.similarityJoin(emb, q, k = 5, nBits = 4, tables = 4)
    // the logical node must be gone after optimization
    val optimized = viaNode.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("SimilarityJoinPlan"), optimized)
    val direct = Similarity.lshTopK(spark, emb, q, k = 5, nBits = 4, tables = 4)
    val a = viaNode.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val b = direct.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("node output supports further relational composition (filter + agg on top)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 3)
    val topOne = SimilarityJoinApi.similarityJoin(emb, q, k = 5, nBits = 4, tables = 4)
      .filter(col("rank") === 1)
      .groupBy("query_id").agg(max("sim").as("best_sim"))
    val rows = topOne.collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getDouble(1) > 0.0 && r.getDouble(1) <= 1.0))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Ad-hoc stage profiler for hot queries (dev tool, not driver contract). */
object DebugProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    graft.plans.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val sigs = time("sigs (cached count)") {
      val s = Dedup.minhashSignatures(docs); s.cache(); s.count(); s
    }
    val cand = time("candidates") { val c = Dedup.minhashCandidates(sigs); c.cache(); c.count(); c }
    time("verify join") { Dedup.verifyJaccard(cand, sigs).filter(col("jaccard") >= 0.5).count() }
    val sh = time("shingle explode (q33 stage1)") {
      val t = docs.withColumn("toks", graft.functions.TextFunctions.tokens("text"))
        .withColumn("sh", graft.functions.TextFunctions.shingles("toks"))
      t.select(col("doc_id"), explode(col("sh"))).count()
    }
    println(s"exploded shingles: $sh")
    time("q33 full") { Dedup.ngramJaccardPairs(docs, 0.3).count() }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")

  test("split is deterministic, covers all rows, and lands near 80/10/10") {
    val s1 = Curation.split(docs, "doc_id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Curation.split(docs, "doc_id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2) // rerun-stable
    val total = s1.values.sum
    assert(total == docs.count())
    assert(math.abs(s1("train").toDouble / total - 0.8) < 0.05)
    assert(math.abs(s1("test").toDouble / total - 0.1) < 0.05)
  }

  test("stratified sample keeps ~requested fraction per stratum, zero for absent strata") {
    val out = Curation.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "fr" -> 0.1))
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("en").toDouble / base("en") - 0.5) < 0.15)
    assert(math.abs(counts("fr").toDouble / base("fr") - 0.1) < 0.1)
    assert(!counts.contains("de")) // stratum not in fractions → dropped
  }

  test("mix unions weighted subsets; compact repartitions to the size estimate") {
    val a = docs.filter(col("lang") === "en")
    val b = docs.filter(col("lang") === "fr")
    val mixed = Curation.mix(Seq((a, 1.0), (b, 0.2)), "doc_id")
    val n = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("en") == a.count()) // weight 1.0 keeps everything
    assert(n("fr") < b.count() * 0.4)
    val compacted = Curation.compact(docs, targetMB = 1)
    assert(compacted.rdd.getNumPartitions >= 1)
    assert(compacted.count() == docs.count())
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

/** DSv2 source partition planning + stateful streaming dedup. */
class SourceV2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("EiaPagedSource: one partition per page, deterministic rows, downstream resample") {
    val df = spark.read.format("graft.sources.v2.EiaPagedSource")
      .option("total", 72).option("pageSize", 30)
      .option("region", "NYIS").option("start", "2024-03-01")
      .load()
    assert(df.count() == 72)
    assert(df.rdd.getNumPartitions == 3) // ceil(72/30) pages planned
    val first = df.orderBy("period").collect().head
    assert(first.getString(0) == "2024-03-01T00" && first.getString(1) == "NYIS")
    // same row twice → deterministic
    assert(df.orderBy("period").collect().head.getString(2) ==
      graft.sources.v2.EiaPagedSource.valueAt("NYIS", 0))
    // downstream: the engine's cast+resample path consumes it directly
    val daily = df
      .select(to_timestamp(col("period"), "yyyy-MM-dd'T'HH").as("ts"),
        expr("try_cast(value AS double)").as("value"), lit("NY").as("city"))
    val res = graft.operators.EnergyOps.resampleDaily(daily).orderBy("date").collect()
    assert(res.length == 3) // 72 hours = 3 days
    assert(res.forall(!_.isNullAt(2)))
  }

  test("stateful streaming dedup emits first doc per fingerprint across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingOps.dedupStream(spark, docs).writeStream
      .outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      input.addData((1L, "aaa"), (2L, "aaa"), (3L, "bbb"))
      q.processAllAvailable()
      input.addData((4L, "aaa"), (5L, "ccc")) // aaa already seen in state
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
        .map(r => r.getAs[Long]("keep_id")).toSet
      assert(out == Set(1L, 3L, 5L)) // 2 deduped in-batch, 4 deduped via state
    } finally q.stop()
  }
}

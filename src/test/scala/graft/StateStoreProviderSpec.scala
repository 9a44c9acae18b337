package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13: the RocksDB state-store option. The default
  * HDFSBackedStateStoreProvider keeps every state row in executor heap,
  * so at 100× state the provider — not the plan — is the first thing to
  * fall over. SPARK_GRAFT_STATE_STORE=rocksdb (system-property
  * spelling: spark.graft.stateStore) switches the drain to Spark's
  * built-in RocksDBStateStoreProvider (off-heap LSM, spill-to-disk,
  * bounded by disk not heap). The provider must be invisible in the
  * RESULT: this spec drains two stateful shapes (q85 session windows;
  * q226 TTL dedup) on both providers and asserts row-identical output,
  * and pins the knob→class mapping. */
class StateStoreProviderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withStateStoreProp[A](v: Option[String])(body: => A): A = {
    val prev = sys.props.get("spark.graft.stateStore")
    v match {
      case Some(x) => sys.props("spark.graft.stateStore") = x
      case None    => sys.props.remove("spark.graft.stateStore")
    }
    try body
    finally prev match {
      case Some(x) => sys.props("spark.graft.stateStore") = x
      case None    => sys.props.remove("spark.graft.stateStore")
    }
  }

  test("knob maps to the provider classes (and passes fqcn through)") {
    withStateStoreProp(None) {
      assert(graft.streaming.StreamingOps.stateStoreProviderClass().isEmpty,
        "unset knob must leave the session's provider conf untouched")
    }
    withStateStoreProp(Some("rocksdb")) {
      assert(graft.streaming.StreamingOps.stateStoreProviderClass().contains(
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    }
    withStateStoreProp(Some("hdfs")) {
      assert(graft.streaming.StreamingOps.stateStoreProviderClass().contains(
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"))
    }
    withStateStoreProp(Some("com.example.MyProvider")) {
      assert(graft.streaming.StreamingOps.stateStoreProviderClass()
        .contains("com.example.MyProvider"))
    }
  }

  private def sessionRows(provider: Option[String]): Seq[(Long, String, Long)] = {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ssp_spec").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ts(minutes: Long) = new java.sql.Timestamp(base + minutes * 60000L)
    Seq(
      (1L, ts(0), 7L, "click", 1.0, ""), (2L, ts(5), 7L, "click", 1.0, ""),
      (3L, ts(90), 7L, "click", 1.0, ""),
      (4L, ts(2), 8L, "view", 1.0, ""), (5L, ts(95), 8L, "view", 1.0, ""),
      (-1L, ts(60 * 48), -1L, "sentinel", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    withStateStoreProp(provider) {
      val stream = graft.streaming.StreamingOps.rawEventStream(s, dir)
        .withWatermark("ts", "1 minute")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
      graft.streaming.StreamingOps
        .runToMemory(s, stream, s"ssp_spec_${provider.getOrElse("default")}",
          outputMode = "append", awaitRows = 1L)
        .filter(col("user_id") >= 0)
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("start"),
          col("n_events"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    }
  }

  /** The q226 staged timeline (mtime-ordered files, maxFilesPerTrigger
    * 1): batch 2 re-delivers a fingerprint WITHIN the TTL (dropped),
    * batch 4 re-delivers it AFTER state expiry (lands again) — both
    * TTL paths exercise real state eviction on the provider under test. */
  private def ttlDedupRows(provider: Option[String]): Seq[(Long, String)] = {
    val s = spark; import s.implicits._
    import java.nio.file._
    def ts(off: Long) = new java.sql.Timestamp((1704067200L + off) * 1000L)
    val day = 86400L
    val batches = Seq(
      Seq((1L, "alpha beta gamma", ts(0L)), (2L, "delta epsilon zeta", ts(60L))),
      Seq((100L, "watermark pusher text", ts(10 * day)),
        (3L, "alpha beta gamma", ts(3600L))), // within TTL → dropped
      Seq((101L, "second pusher text", ts(10 * day + 60L))), // eviction spacer
      Seq((4L, "alpha beta gamma", ts(9 * day + 3600L)))) // post-expiry → lands
    val dir = Files.createTempDirectory("graft_ssp_ttl").toString
    batches.zipWithIndex.foreach { case (rows, i) =>
      val p = s"$dir/batch$i"
      rows.toDF("doc_id", "text", "ts").coalesce(1)
        .write.mode("overwrite").parquet(p)
      val it = Files.list(Paths.get(p)).iterator()
      while (it.hasNext) {
        val f = it.next()
        Files.setLastModifiedTime(f,
          attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
      }
    }
    withStateStoreProp(provider) {
      val stream = s.readStream
        .schema("doc_id LONG, text STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/batch*")
      graft.streaming.StreamingOps
        .runToMemory(s, graft.streaming.StreamingOps.dedupStreamTtl(stream, "1 day"),
          s"ssp_ttl_${provider.getOrElse("default")}",
          outputMode = "append")
        .select(col("doc_id"), col("fingerprint"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
    }
  }

  /** r13 verdict item 2: provider invariance must cover the OTHER two
    * state layouts, not just session windows and TTL dedup — the
    * stream-stream join (FOUR state stores per partition: keyToNumValues
    * / keyWithIndexToValue on each side, the layout whose state
    * outgrows heap first at 100× because BOTH sides buffer until the
    * watermark clears the interval) and flatMapGroupsWithState (custom
    * user-state encoder, one Boolean per fingerprint). Driven through
    * the REGISTRY queries themselves (q87 left join incl. the
    * eviction-emitted unmatched rows; q71 FMGWS dedup) at sf0.001, so
    * the exact production plans are what both providers drain. */
  private def registryRows(provider: Option[String],
      q: (SparkSession, String) => org.apache.spark.sql.DataFrame): Seq[String] =
    withStateStoreProp(provider) {
      q(spark, "/root/testdata/sf0.001").collect().map(_.toString).toSeq.sorted
    }

  test("RocksDB provider drains the q87 stream-stream left-join shape row-identically") {
    val q = graft.queries.AnalyticsQueries.q87StreamingLeftJoin _
    val hdfs = registryRows(None, q)
    val rocks = registryRows(Some("rocksdb"), q)
    assert(hdfs.nonEmpty, "left join must emit rows (matched + evicted-unmatched)")
    // the eviction path is genuinely exercised: some purchases have no
    // view within the interval and emit null-extended (view_id = -1)
    assert(hdfs.exists(_.contains(",-1,")),
      "fixture must contain unmatched purchases (join-state eviction path)")
    assert(rocks === hdfs, "state-store provider must be invisible in the join result")
  }

  test("RocksDB provider drains the q88 full-outer join shape row-identically") {
    val q = graft.queries.AnalyticsQueries.q88StreamingFullJoin _
    val hdfs = registryRows(None, q)
    val rocks = registryRows(Some("rocksdb"), q)
    assert(hdfs.nonEmpty)
    assert(rocks === hdfs, "state-store provider must be invisible in the full-outer result")
  }

  test("RocksDB provider drains the q71 flatMapGroupsWithState dedup row-identically") {
    val q = graft.queries.AnalyticsQueries.q71StreamingDedup _
    val hdfs = registryRows(None, q)
    val rocks = registryRows(Some("rocksdb"), q)
    assert(hdfs.nonEmpty, "FMGWS dedup must emit one survivor per fingerprint")
    assert(rocks === hdfs,
      "state-store provider must be invisible through the custom state encoder")
  }

  test("RocksDB provider drains the q85 session shape row-identically to the default") {
    val hdfs = sessionRows(None)
    val rocks = sessionRows(Some("rocksdb"))
    assert(hdfs.size === 4)
    assert(rocks === hdfs, "state-store provider must be invisible in the result")
  }

  test("RocksDB provider drains the q226 TTL-dedup shape row-identically to the default") {
    val hdfs = ttlDedupRows(None)
    val rocks = ttlDedupRows(Some("rocksdb"))
    // doc 3 (within-TTL re-delivery) dropped; doc 4 (post-expiry) lands
    assert(hdfs.map(_._1) === Seq(1L, 2L, 4L, 100L, 101L))
    assert(rocks === hdfs, "state-store provider must be invisible in the result")
  }
}

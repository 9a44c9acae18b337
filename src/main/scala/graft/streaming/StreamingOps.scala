package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming extension (SURVEY §2.10): the reference has no
  * streaming engine — its `realtime` mode is a daily batch — so this
  * module is the engine's incremental path: a file-source stream with
  * event-time watermarking and tumbling daily windows.
  *
  * At scale this is the exact shape of continuous ingest: new parquet
  * files land in a directory, the stream discovers them incrementally,
  * the watermark bounds state for late data, and the windowed aggregate
  * maintains per-(day, key) partial sums without reprocessing history —
  * vs the reference re-running the whole 180-day batch on staleness
  * (dashboards/app.py:117-142). */
object StreamingOps {

  /** The events table's on-disk `ts` physical type has CHANGED across
    * testdata generations: originally parquet TIMESTAMP(NANOS) (which
    * Spark 4 only reads as a raw long under the nanosAsLong legacy
    * conf), currently TIMESTAMP(MICROS, isAdjustedToUTC=false) (which
    * Spark reads as TIMESTAMP_NTZ). Pinning either shape broke the
    * other — so every events reader sniffs the footer once and
    * dispatches. Sniffing is one footer read, not a data scan — and
    * memoized per path, because one query can otherwise sniff the same
    * data three times (stageWithSentinel + two src() calls in the
    * stream-stream joins); a path's on-disk shape never changes within
    * a session (staged sentinel files are written in the SAME shape by
    * construction).
    *
    * The nanosAsLong legacy conf is intentionally session-global:
    * parquet NANOS columns are unreadable in Spark 4 without it, it is
    * idempotent, and the engine's only NANOS producer is this events
    * table — this helper is the single place that sets it. */
  private val tsTypeCache = new java.util.concurrent.ConcurrentHashMap[String, DataType]()
  def eventsTsType(spark: SparkSession, path: String): DataType = {
    // the conf is per-SESSION while the memo is per-JVM: set it on
    // EVERY call (idempotent), not inside the cache miss — a cache hit
    // from a fresh SparkSession must still make the follow-up read of
    // a NANOS file legal
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tsTypeCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema("ts").dataType)
  }

  /** Pinned file-stream schema for an events source whose `ts` was
    * sniffed to `tsType` (file streams require a user schema). */
  def eventsRawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Normalize a just-read events frame so `ts` is session-zoned
    * TimestampType (microsecond precision) regardless of the on-disk
    * shape: raw nanos long → floor to micros; TIMESTAMP_NTZ → reinterpret
    * in the session zone (UTC everywhere in this engine, so the wall
    * clock — and therefore every oracle comparison — is unchanged). */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType    => df // already the engine convention
    case other => throw new IllegalArgumentException(
      s"normalizeTs: unsupported on-disk ts type $other — this dispatch exists to " +
        "name every supported shape; a new testdata generation needs a case here")
  }

  /** Streaming events source over an ALREADY-staged directory: sniffed
    * pinned schema + ts normalization. The single entry point all
    * events streams share, so the on-disk ts dispatch lives here once. */
  def rawEventStream(spark: SparkSession, dir: String): DataFrame = {
    val tsType = eventsTsType(spark, dir)
    normalizeTs(spark.readStream.schema(eventsRawSchema(tsType)).parquet(dir))
  }

  /** [[rawEventStream]] with BOUNDED per-trigger admission
    * (`maxFilesPerTrigger`) — the cluster-shaped ingest the synchronous
    * drain otherwise skips: a production file stream admits a bounded
    * batch per trigger, so state builds and EVICTS incrementally across
    * micro-batches instead of materializing the whole input's sessions
    * in one burst (the r13 q85 sf30 adjudication's named design limit).
    * Pair with [[stageTimeOrderedWithSentinel]]: admission order is the
    * source's modification-time order, so chunk files must be staged in
    * event-time order or mid-stream rows arrive behind the watermark
    * and are DROPPED (a correctness change, not a perf knob). */
  def rawEventStreamBounded(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int): DataFrame = {
    val tsType = eventsTsType(spark, dir)
    normalizeTs(spark.readStream.schema(eventsRawSchema(tsType))
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString).parquet(dir))
  }

  /** Stage a single parquet file behind a directory: Spark's file stream
    * source only accepts directories (it lists them for new files), so a
    * lone file is exposed via a symlink in a deterministic temp dir —
    * in production the source would already be a landing directory. */
  def stageDir(path: String): String = {
    import java.nio.file._
    val p = Paths.get(path)
    if (Files.isDirectory(p)) path
    else {
      val dir = Paths.get(sys.props("java.io.tmpdir"),
        s"graft_stream_${Integer.toHexString(path.hashCode)}")
      Files.createDirectories(dir)
      val link = dir.resolve(p.getFileName)
      if (!Files.exists(link)) {
        try Files.createSymbolicLink(link, p)
        catch { case _: Exception => Files.copy(p, link) }
      }
      dir.toString
    }
  }

  /** Streaming daily aggregate over an events directory: 1-day tumbling
    * windows keyed by event_type, 1-day watermark for late data. */
  def dailyAggStream(spark: SparkSession, path0: String): DataFrame = {
    val path = stageDir(path0)
    rawEventStream(spark, path)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(
        to_date(col("w.start")).as("day"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  /** Streaming daily top-k by value per event type, using the native
    * `topk_agg` bounded-heap aggregate ([[graft.plans]] TopKAgg) as the
    * windowed-aggregation state: each micro-batch folds its rows into
    * the k-slot buffer held in the state store (the serialize/merge
    * contract every TypedImperativeAggregate already carries), so state
    * per (window, type) is k pairs — never the window's rows. The
    * streaming answer to "top sellers today" that a row_number window
    * cannot express at all (no windows over streaming aggregates). */
  def dailyTopkStream(spark: SparkSession, path0: String, k: Int = 3): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val path = stageDir(path0)
    rawEventStream(spark, path)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(expr(s"topk_agg(value, event_id, $k)").as("top"))
      .select(to_date(col("w.start")).as("day"), col("event_type"), col("top"))
  }

  /** Stateful streaming exact-dedup: per content-hash group state
    * remembers whether the hash has been seen; only the first document
    * per fingerprint is emitted, across micro-batches. The custom-state
    * path (`flatMapGroupsWithState`) the training-data pipeline needs
    * when dedup must span an unbounded stream — a windowed aggregate
    * cannot express "seen ever". State is one boolean per fingerprint;
    * at 100 TB the state store backs onto RocksDB and the fingerprint
    * space is what bounds memory, not the corpus. */
  def dedupStream(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val keyed = docs
      .selectExpr("md5(text) AS fingerprint", "doc_id", "text")
      .as[(String, Long, String)]
      .groupByKey(_._1)
    keyed.flatMapGroupsWithState[Boolean, (String, Long)](
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (fp: String, rows: Iterator[(String, Long, String)], state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          // deterministic survivor: min doc_id within this batch's group
          val keep = rows.map(_._2).min
          Iterator.single((fp, keep))
        }
    }.toDF("fingerprint", "keep_id")
  }

  /** Stream-stream interval join: purchases joined to the same user's
    * views within the time bound, both sides watermarked so the join
    * state is bounded (Spark buffers each side only until the watermark
    * passes the interval — unbounded state otherwise). The streaming
    * counterpart of [[graft.operators.RangeJoin]]. */
  def purchaseViewJoin(purchases: DataFrame, views: DataFrame,
      toleranceSec: Long = 900): DataFrame = {
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val v = views
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    p.join(v,
      col("p_user") === col("v_user") &&
        col("p_ts") >= col("v_ts") - expr(s"INTERVAL $toleranceSec SECONDS") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $toleranceSec SECONDS"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"),
        col("p_ts"), col("v_ts"))
  }

  /** Incremental partition-upsert sink: each micro-batch dynamically
    * overwrites ONLY the (day-)partitions it touches, so a re-delivered
    * or late batch refreshes its own days without truncating history —
    * the streaming counterpart of `PipelineOps.writePartitioned`, and
    * the production landing shape for a continuously-aggregated table
    * (complete/update-mode aggregates cannot append; per-partition
    * overwrite makes each batch idempotent). `foreachBatch` is the
    * escape hatch Spark provides exactly for sinks the built-ins can't
    * express; the inner write is a normal batch write, so AQE and
    * dynamic overwrite apply. */
  def partitionUpsertSink(stream: DataFrame, path: String,
      partitionCol: String = "day",
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          batch.write
            .mode(org.apache.spark.sql.SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partitionCol)
            .parquet(path)
        }
      }
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.start()
  }

  /** Streaming dedup with BOUNDED state — the TTL fix for
    * [[dedupStream]]'s NoTimeout `GroupState` (whose fingerprint state
    * grows forever; at 100 TB of continuous ingest that is the state
    * store that eventually evicts everything else):
    * `dropDuplicatesWithinWatermark` keeps the FIRST row per
    * fingerprint and lets the watermark expire fingerprint state once
    * event time moves `ttl` past it. The semantic trade is explicit
    * and intended: a duplicate re-delivered WITHIN the ttl is dropped;
    * one arriving after state expiry lands again — exactly the
    * contract of every production streaming dedup (dedup windows, not
    * dedup forever), and the two paths q226 plants and hash-checks. */
  def dedupStreamTtl(docs: DataFrame, ttl: String): DataFrame =
    docs.selectExpr("doc_id", "ts", "md5(text) AS fingerprint")
      .withWatermark("ts", ttl)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Sink selection for the synchronous drain, BY OUTPUT MODE (r13 —
    * the r12 verdict's scale finding). Append-mode results are
    * ROW-scale (every closed window / evicted outer row / surviving
    * dedup row), so the default is the executor-side parquet file sink:
    * the memory sink serializes every result row to the driver, and at
    * derived sf10 the q85 session drain produced >1 GiB of task results
    * and died on spark.driver.maxResultSize (q87 paid 118 s serializing
    * 2 M rows). Complete-mode results are AGGREGATE-scale (a
    * re-emitted result table whose size does not grow with the data)
    * and file sinks are append-only, so complete mode stays on the
    * memory sink (deterministic, queryable mid-drain). The escape
    * hatch inverted: SPARK_GRAFT_DRAIN_SINK=memory (or system property
    * spark.graft.drainSink=memory, for in-JVM tests — a process cannot
    * set its own env) opts an append drain BACK into the memory sink
    * for debugging; the scale-safe path needs no knob. */
  private[graft] def drainsToFileSink(outputMode: String): Boolean =
    outputMode == "append" &&
      !sys.env.get("SPARK_GRAFT_DRAIN_SINK")
        .orElse(sys.props.get("spark.graft.drainSink")).contains("memory")

  /** Adaptive drain width (r13): one state partition per ~1 MiB of
    * compressed source, clamped to [4, session shuffle partitions] —
    * sized from FILE bytes (no scan, no schema read, so the
    * nanos-timestamped events files are fine). Replaces the width-4
    * constant as the call-site default for row-scale stateful drains:
    * the constant was a small-scale optimization (state-store INIT
    * dominates tiny drains, ~1 s each across 13 streaming queries in
    * the official sf0.1 artifact), but at derived sf10 four
    * single-threaded state partitions became the bottleneck — q85's
    * isolated no-knob drain read 50.5 s at width 4 vs ~13 s at full
    * width. The byte heuristic lands 4 at sf0.1 (2 MiB events), 16 at
    * sf1 (where width 16 was measured ~linear), and the full session
    * width at sf10+ (156 MiB+); on a real cluster the clamp is the
    * session's own shuffle partitions, so the caller's sizing applies
    * unchanged. SPARK_GRAFT_DRAIN_PARTITIONS still overrides inside
    * [[runToMemory]]. */
  def adaptiveDrainWidth(spark: SparkSession, paths: String*): Int = {
    import java.nio.file.{Files, Paths}
    val bytes = paths.map { p =>
      try {
        val path = Paths.get(p)
        if (Files.isDirectory(path)) {
          val s = Files.walk(path)
          try s.filter((f: java.nio.file.Path) => Files.isRegularFile(f))
            .mapToLong((f: java.nio.file.Path) => Files.size(f)).sum()
          finally s.close()
        } else Files.size(path)
      } catch { case _: Exception => 0L }
    }.sum
    val target = (bytes >> 20).toInt // MiB
    math.max(4, math.min(spark.conf.get("spark.sql.shuffle.partitions").toInt, target))
  }

  /** State-store provider selection (r13). The default
    * HDFSBackedStateStoreProvider keeps EVERY state row in executor
    * heap (the snapshot files are a recovery format, not a working
    * set) — at 100× state the provider, not the plan, is the first
    * thing to fall over. SPARK_GRAFT_STATE_STORE=rocksdb (or system
    * property spark.graft.stateStore, for in-JVM tests) switches the
    * drain to Spark's built-in RocksDBStateStoreProvider: state lives
    * off-heap in a spill-to-disk LSM keyed store, so state size is
    * bounded by disk, not heap. Accepts `rocksdb`, `hdfs`, or a
    * fully-qualified provider class. Results are provider-invariant
    * ([[graft.StateStoreProviderSpec]] pins identical drains on both);
    * the knob trades per-batch commit latency for bounded memory. */
  private[graft] def mapStateStoreKnob(knob: String): String = knob match {
    case "rocksdb" =>
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    case "hdfs" =>
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    case fqcn => fqcn
  }

  private[graft] def stateStoreProviderClass(): Option[String] =
    sys.env.get("SPARK_GRAFT_STATE_STORE")
      .orElse(sys.props.get("spark.graft.stateStore"))
      .map(mapStateStoreKnob)

  /** Drain a streaming query synchronously and return the result
    * table — the local test/verify harness for streaming queries. The
    * sink is selected by output mode ([[drainsToFileSink]]): append →
    * executor-side parquet file sink, complete → memory sink.
    *
    * Two local-scale cost controls, both result-invariant:
    *  - stateful-operator cost here is dominated by per-partition state
    *    store init (one provider per shuffle partition per stateful
    *    operator), not data — the drain runs at a reduced partition
    *    count (restored after); at cluster scale the caller's session
    *    setting applies unchanged because the reduction is `min`-ed;
    *  - after the drain every loaded StateStoreProvider is unloaded and
    *    the maintenance pool stopped, so background maintenance neither
    *    taxes later queries nor stack-traces into the session's
    *    shutdown (the r2 BENCH artifact failure). Providers reload
    *    lazily if another streaming query runs. */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
      outputMode: String = "complete", drainPartitions: Int = 4,
      awaitRows: Long = 0L, awaitWatermarkMicros: Option[Long] = None,
      stateStore: Option[String] = None): DataFrame =
    runToMemoryCounted(spark, stream, name, outputMode, drainPartitions,
      awaitRows, awaitWatermarkMicros, stateStore).df

  /** [[runToMemory]] variant that also returns the drain's data-batch
    * count (micro-batches with numInputRows > 0) — the bounded-admission
    * queries `require` >= 2 of them (state must genuinely build across
    * batches, or "bounded admission" silently degraded to a single
    * burst). Returned per-call rather than via shared state (r14 verdict
    * item 5: the previous `@volatile var` was a cross-talk surface under
    * any concurrent caller). */
  case class DrainResult(df: DataFrame, dataBatches: Int)

  def runToMemoryCounted(spark: SparkSession, stream: DataFrame, name: String,
      outputMode: String = "complete", drainPartitions: Int = 4,
      awaitRows: Long = 0L, awaitWatermarkMicros: Option[Long] = None,
      stateStore: Option[String] = None): DrainResult = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    try spark.catalog.dropTempView(name) catch { case _: Exception => () }
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    // the reduced drain width is a SMALL-scale optimization (state
    // store init dominates tiny drains); at 10× data the stateful
    // work itself dominates and 4 single-threaded state partitions
    // become the bottleneck (measured: q85 session-window drain at
    // derived sf1 = 61 s at width 4, ~linear again at 16). The env
    // knob lets a larger-SF run widen the drain without touching
    // call sites; a real cluster run never reduces at all.
    val width = sys.env.get("SPARK_GRAFT_DRAIN_PARTITIONS")
      .map(_.toInt).getOrElse(drainPartitions)
    spark.conf.set(key, math.min(prev.toInt, width).toString)
    // provider class is read at query START from the session conf —
    // set it for this drain, restore after (see stateStoreProviderClass)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    // caller-pinned provider (e.g. q300's RocksDB drain) wins over the
    // env/sysprop knob; both map through the same knob→class table
    val resolvedProvider = stateStore.map(mapStateStoreKnob)
      .orElse(stateStoreProviderClass())
    resolvedProvider.foreach(spark.conf.set(providerKey, _))
    // RocksDB drains commit via CHANGELOG checkpointing (r15): the
    // default full-snapshot mode re-uploads the store's SST set every
    // micro-batch — exactly the per-batch cost the bounded-admission
    // queries multiply by their batch count. Changelog mode writes the
    // batch's delta and snapshots in the background — the recommended
    // production RocksDB configuration, and a checkpoint-FORMAT choice
    // only: state contents and results are identical (q300/q304/q308
    // stay on q85/q87's batch hash oracles; StateStoreProviderSpec pins
    // row identity). Measured at sf0.1: the three RocksDB drains
    // 12.8 -> 11.1 s. Restored with the provider key below.
    val changelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prevChangelog = spark.conf.getOption(changelogKey)
    if (resolvedProvider.exists(_.contains("RocksDB")))
      spark.conf.set(changelogKey, "true")
    val fileSink = drainsToFileSink(outputMode)
    val fileSinkDir: Option[java.nio.file.Path] =
      if (fileSink) Some(java.nio.file.Files.createTempDirectory("graft_drain_out"))
      else None
    def sinkDf: DataFrame = fileSinkDir match {
      case Some(p) =>
        try spark.read.parquet(p.toString)
        catch { case _: Exception =>
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            stream.schema)
        }
      case None => spark.table(name)
    }
    def sinkCount(): Long = sinkDf.count()
    // append-mode emission of watermark-closed windows/evicted outer
    // rows happens in the trailing NO-DATA micro-batch, which
    // processAllAvailable does not wait for. Primary wait: a listener
    // latch — QueryProgressEvent posts AFTER a batch commits (sink rows
    // visible), so a zero-input batch whose planning watermark passed
    // the target IS the terminal eviction batch; once it commits there
    // is nothing left to emit (the watermark cannot advance again
    // without new data). Registered BEFORE start() so the event cannot
    // be missed. The pre-r4 sleep-polls (watermark poll + row-count
    // stillness) remain as a bounded fallback — they cost a fixed ~1 s+
    // per drain, which dominated the streaming bench queries.
    val needsDrainWait = awaitRows > 0 || awaitWatermarkMicros.isDefined
    val target = awaitWatermarkMicros.map(wm =>
      java.time.Instant.ofEpochSecond(wm / 1000000L, (wm % 1000000L) * 1000L))
    val latch = new java.util.concurrent.CountDownLatch(1)
    // runId gate: the listener bus is async and query NAMES recur (the
    // bench runs every drain twice back-to-back), so a still-queued
    // terminal event from the PREVIOUS same-named run must not fire
    // this run's latch. The runId is set right after start(), before
    // processAllAvailable returns — no terminal no-data batch can
    // commit before the first data batch completes, so no wanted event
    // can be missed while the gate is empty.
    val runIdRef = new java.util.concurrent.atomic.AtomicReference[java.util.UUID](null)
    def qualifies(p: org.apache.spark.sql.streaming.StreamingQueryProgress): Boolean =
      p.numInputRows == 0L && target.forall(t =>
        Option(p.eventTime.get("watermark"))
          .map(java.time.Instant.parse).exists(!_.isBefore(t)))
    val listener: StreamingQueryListener = if (!needsDrainWait) null else
      new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          if (p.runId == runIdRef.get() && qualifies(p)) latch.countDown()
        }
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
    if (listener != null) spark.streams.addListener(listener)
    // drain checkpoints are ephemeral by definition (a synchronous
    // test/verify drain never restarts), so put the offset/commit WAL
    // and state files on tmpfs when the host has one — measured ~15%
    // off the five-query stream family vs disk /tmp. Production sinks
    // (startParquetSink etc.) keep caller-provided durable checkpoints.
    val shmCkpt: Option[java.nio.file.Path] = {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
        Some(java.nio.file.Files.createTempDirectory(shm, "graft_drain_ckpt"))
      else None
    }
    // a file sink REQUIRES a checkpoint; when the host has no tmpfs the
    // fallback lives on /tmp — tracked here so the finally block can
    // delete it (r9 ADVICE: the two-pass bench drains each streaming
    // query twice, and the previously-untracked per-drain dirs
    // accumulated per suite run)
    val fallbackCkpt: Option[java.nio.file.Path] =
      if (fileSink && shmCkpt.isEmpty)
        Some(java.nio.file.Files.createTempDirectory("graft_drain_ckpt"))
      else None
    val result = try {
      val w0 = fileSinkDir match {
        case Some(p) => stream.writeStream
          .outputMode(outputMode)
          .format("parquet")
          .option("path", p.toString)
          .queryName(name)
          .option("checkpointLocation",
            shmCkpt.orElse(fallbackCkpt).get.toString)
        case None =>
          val w = stream.writeStream
            .outputMode(outputMode)
            .format("memory")
            .queryName(name)
          shmCkpt.fold(w)(p => w.option("checkpointLocation", p.toString))
      }
      val q = w0.start()
      runIdRef.set(q.runId)
      // close the start()→set gap: a terminal zero-input batch that
      // committed BEFORE the gate was armed (e.g. an empty source)
      // posted its event against a null gate — without this retro
      // check every such drain pays the full latch timeout before the
      // sleep-poll fallback rescues it
      if (needsDrainWait)
        q.recentProgress.foreach(p => if (p.runId == q.runId && qualifies(p)) latch.countDown())
      q.processAllAvailable()
      if (needsDrainWait) {
        // passthrough emitters (dropDuplicatesWithinWatermark, plain
        // filters) land their rows in the DATA batches — if the sink
        // already holds the promised rows, there is no terminal
        // eviction batch to wait for and the latch may never fire
        // (measured: 30 s of pure latch timeout on q226 before this
        // check existed)
        val alreadyDrained = awaitRows > 0 && target.isEmpty &&
          sinkCount() >= awaitRows
        val drained = alreadyDrained ||
          (latch.await(30, java.util.concurrent.TimeUnit.SECONDS) &&
            // the latch proves the terminal eviction batch committed;
            // in awaitRows mode additionally confirm the sink actually
            // holds the promised rows before trusting it
            (awaitRows <= 0 || sinkCount() >= awaitRows))
        if (!drained) {
          // fallback: the original bounded sleep-polls
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          while (awaitRows > 0 && sinkCount() < awaitRows &&
            System.nanoTime() < deadline) Thread.sleep(200)
          target.foreach { t =>
            def current: Option[java.time.Instant] =
              Option(q.lastProgress)
                .flatMap(p => Option(p.eventTime.get("watermark")))
                .map(java.time.Instant.parse)
            while (current.forall(_.isBefore(t)) && System.nanoTime() < deadline)
              Thread.sleep(200)
            // state EVICTION lags the watermark update by a further
            // no-data batch — wait until the sink count holds still
            var last = -1L
            var stable = 0
            while (stable < 4 && System.nanoTime() < deadline) {
              val n = sinkCount()
              if (n == last) stable += 1 else { stable = 0; last = n }
              Thread.sleep(250)
            }
          }
        }
      }
      // per-batch duration breakdown to stderr on demand — the floor
      // investigation tool (where does a drain's time go: planning,
      // state commit, addBatch?); off unless the env flag is set
      if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG"))
        q.recentProgress.foreach { p =>
          System.err.println(
            s"[drain $name] batch=${p.batchId} rows=${p.numInputRows} " +
              s"durationMs=${p.durationMs}")
          // state-store metrics per stateful operator (provider-level
          // memory/rows — the RocksDB-vs-HDFS adjudication evidence)
          p.stateOperators.foreach(so => System.err.println(
            s"[drain $name]   state op=${so.operatorName} rows=${so.numRowsTotal} " +
              s"memBytes=${so.memoryUsedBytes} custom=${so.customMetrics}"))
        }
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      q.stop()
      // materialize the file-sink result BEFORE the finally block
      // deletes its backing directory: localCheckpoint(eager) moves
      // the rows into executor block storage, so the returned frame
      // no longer references the temp files. The memory-sink result
      // already lives off-disk.
      DrainResult(fileSinkDir match {
        case Some(_) => sinkDf.localCheckpoint(true)
        case None    => sinkDf
      }, dataBatches)
    } finally {
      if (listener != null)
        try spark.streams.removeListener(listener) catch { case _: Exception => () }
      spark.conf.set(key, prev)
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => try spark.conf.unset(providerKey) catch { case _: Exception => () }
      }
      prevChangelog match {
        case Some(v) => spark.conf.set(changelogKey, v)
        case None    => try spark.conf.unset(changelogKey) catch { case _: Exception => () }
      }
      try org.apache.spark.sql.graft.StateStoreHooks.stopAll()
      catch { case _: Exception => () }
      // the drain is over — free the tmpfs checkpoint (RAM, not disk)
      // and the per-drain temp dirs (r9 ADVICE: these leaked per
      // file-sink drain before they were tracked)
      (shmCkpt.toSeq ++ fallbackCkpt.toSeq ++ fileSinkDir.toSeq).foreach { p =>
        try {
          import java.nio.file._
          val walk = Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.deleteIfExists(f))
          finally walk.close()
        } catch { case _: Exception => () }
      }
    }
    result
  }

  /** Stage a single events parquet file behind a fresh directory PLUS a
    * one-row far-future sentinel file: an append-mode session/window
    * aggregate only emits windows the WATERMARK has closed, and with
    * one real file everything lands in micro-batch 1 while the
    * watermark (which lags a batch) is still at zero — nothing would
    * ever emit. The sentinel (negative ids, filtered by the caller)
    * pushes the watermark a day past the last real event, so the
    * trailing no-data batch emits every real window.
    *
    * `sentinelTypes`: event_type value(s) for the sentinel row(s). A
    * query that filters the stream by event_type needs sentinels OF
    * THOSE TYPES — the optimizer pushes a non-ts predicate BELOW the
    * EventTimeWatermark operator, so an off-type sentinel is filtered
    * before watermark tracking ever sees it and the watermark never
    * advances (observed: the last watermark-delay's worth of rows
    * never evicted). Sentinels carry user_id = -1 for the caller to
    * filter from the OUTPUT instead.
    *
    * @return the staged dir and the max real event time in MICROSECONDS
    *         since the epoch (the precision the engine's TimestampType
    *         carries — callers derive watermark-wait targets from it
    *         directly).
    *
    * Memoized per (path, sentinelTypes): staging pays a max(ts) data
    * scan plus a sentinel write JOB, the staged dir is immutable once
    * built, and the bench harness re-runs every query — without the
    * memo the same source stages 2× per query × 3 queries. */
  private val sentinelCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Seq[String]), (String, Option[Long])]()
  def stageWithSentinel(spark: SparkSession, path: String,
      sentinelTypes: Seq[String] = Seq("sentinel")): (String, Option[Long]) =
    sentinelCache.computeIfAbsent((path, sentinelTypes), { case (p, st) =>
      stageWithSentinelUncached(spark, p, st)
    })

  private def stageWithSentinelUncached(spark: SparkSession, path: String,
      sentinelTypes: Seq[String]): (String, Option[Long]) = {
    import java.nio.file._
    val dir = Files.createTempDirectory("graft_stream_sentinel").toString
    val p = Paths.get(path)
    // a production events source is a DIRECTORY of part files, not one
    // file — the file stream source does not descend into a symlinked
    // subdirectory (it lists leaves), so flatten: link each part file
    // into the staged dir. Found at the derived sf1 (multi-file
    // events), where the single-file symlink silently staged an empty
    // stream and every sentinel query timed out to 0 rows.
    def linkInto(target: Path): Unit = {
      val link = Paths.get(dir).resolve(target.getFileName)
      try Files.createSymbolicLink(link, target)
      catch { case _: Exception => Files.copy(target, link) }
    }
    if (Files.isDirectory(p)) {
      val ls = Files.list(p)
      try {
        val it = ls.iterator()
        while (it.hasNext) {
          val f = it.next()
          val n = f.getFileName.toString
          if (!n.startsWith("_") && !n.startsWith(".") && Files.isRegularFile(f))
            linkInto(f)
        }
      } finally ls.close()
    } else linkInto(p)
    val tsType = eventsTsType(spark, path)
    val maxRow = normalizeTs(spark.read.parquet(path))
      .agg(max(unix_micros(col("ts")))).head()
    val maxTsMicros = if (maxRow.isNullAt(0)) None else Some(maxRow.getLong(0))
    maxTsMicros.foreach { us => // empty source: no sessions, no sentinel needed
      import spark.implicits._
      val sentinelUs = us + 86400L * 1000000L
      // the sentinel file must carry the SAME physical ts shape as the
      // real file it sits next to — one pinned stream schema reads both
      val sentinelTsCol = tsType match {
        case LongType         => lit(sentinelUs * 1000L) // raw nanos
        case TimestampNTZType => timestamp_micros(lit(sentinelUs)).cast(TimestampNTZType)
        case _                => timestamp_micros(lit(sentinelUs))
      }
      sentinelTypes.zipWithIndex
        .map { case (t, i) => (-(i + 1).toLong, -1L, t, 0.0, "") }
        .toDF("event_id", "user_id", "event_type", "value", "props")
        .withColumn("ts", sentinelTsCol)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(dir)
    }
    (dir, maxTsMicros)
  }

  /** Stage events as `chunks` TIME-RANGE-partitioned files (plus the
    * far-future sentinel, staged LAST) so a bounded-admission drain
    * ([[rawEventStreamBounded]], maxFilesPerTrigger = 1) replays the
    * table as `chunks` successive micro-batches in event-time order —
    * the local proof harness for "a cluster's per-trigger admission
    * bounds batch size" (r13 verdict item 1).
    *
    * Mechanics: the table is range-repartitioned on ts into `chunks`
    * contiguous event-time slices, each written as ONE file; the files
    * are then stamped with strictly increasing modification times in
    * range order, because the file stream source admits oldest-mtime
    * first. Ordering is what makes bounded admission RESULT-INVARIANT:
    * chunk i+1's earliest event is >= chunk i's latest, and the
    * watermark lags max event time by the configured delay, so no
    * mid-stream row ever arrives behind the watermark (nothing is
    * dropped as late) — sessions spanning a boundary stay in state and
    * merge in the next batch, closed sessions evict batch by batch.
    * The staged files are normalized to microsecond timestamps (this
    * is a fresh rewrite, not symlinks, so the NANOS legacy shape never
    * reaches the stream). Memoized like [[stageWithSentinel]] (the
    * rewrite is a full sort-write of the events table). */
  private val timeOrderedCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), (String, Option[Long])]()
  def stageTimeOrderedWithSentinel(spark: SparkSession, path: String,
      chunks: Int): (String, Option[Long]) =
    timeOrderedCache.computeIfAbsent((path, chunks), { case (p, c) =>
      stageTimeOrderedUncached(spark, p, c)
    })

  private def stageTimeOrderedUncached(spark: SparkSession, path: String,
      chunks: Int): (String, Option[Long]) = {
    import java.nio.file._
    import java.nio.file.attribute.FileTime
    require(chunks >= 1, s"chunks must be >= 1, got $chunks")
    val dir = Files.createTempDirectory("graft_stream_chunks")
    val build = Files.createTempDirectory("graft_stream_chunks_build")
    eventsTsType(spark, path) // sets the NANOS legacy conf if needed
    val df = normalizeTs(spark.read.parquet(path))
    df.repartitionByRange(chunks, col("ts"), col("event_id"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(build.toString)
    import scala.jdk.CollectionConverters._
    // part-file NAME order = range-partition order = event-time order
    val parts = {
      val ls = Files.list(build)
      try ls.iterator().asScala
        .filter(f => { val n = f.getFileName.toString
          n.startsWith("part-") && n.endsWith(".parquet") })
        .toSeq.sortBy(_.getFileName.toString)
      finally ls.close()
    }
    // strictly increasing mtimes, all in the past (1s apart: coarse
    // enough to survive filesystems with second-granularity mtime)
    val base = System.currentTimeMillis() - (parts.size + 4) * 1000L
    parts.zipWithIndex.foreach { case (f, i) =>
      val tgt = dir.resolve(f"c$i%05d.parquet")
      Files.move(f, tgt)
      Files.setLastModifiedTime(tgt, FileTime.fromMillis(base + i * 1000L))
    }
    val maxRow = df.agg(max(unix_micros(col("ts")))).head()
    val maxTsMicros = if (maxRow.isNullAt(0)) None else Some(maxRow.getLong(0))
    maxTsMicros.foreach { us =>
      import spark.implicits._
      val sentinelDir = Files.createTempDirectory("graft_stream_chunks_sent")
      Seq((-1L, -1L, "sentinel", 0.0, ""))
        .toDF("event_id", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(lit(us + 86400L * 1000000L)))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(sentinelDir.toString)
      val sf = {
        val ls = Files.list(sentinelDir)
        try ls.iterator().asScala
          .find(f => { val n = f.getFileName.toString
            n.startsWith("part-") && n.endsWith(".parquet") }).get
        finally ls.close()
      }
      val tgt = dir.resolve("sentinel.parquet")
      Files.move(sf, tgt)
      // newest mtime: the sentinel must be ADMITTED last, so the
      // watermark only passes the real data once everything is in state
      Files.setLastModifiedTime(tgt, FileTime.fromMillis(base + (parts.size + 1) * 1000L))
    }
    (dir.toString, maxTsMicros)
  }

  /** Staged-documents schema for [[stageDocsWithSentinel]]. */
  val docsStagedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  /** Stage the documents table as a timestamped streaming source:
    * event time is DERIVED deterministically (epoch base + doc_id
    * minutes — both engines can restate it), plus one far-future
    * sentinel doc (doc_id = −1, lang "zz") whose only job is to
    * advance the watermark past every real window so append-mode
    * windows all emit in the trailing no-data batch. Returns the
    * staged dir and the epoch base (seconds). Memoized like
    * [[stageWithSentinel]] (the staged rewrite is a full write job of
    * the documents table). */
  private val docsSentinelCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()
  def stageDocsWithSentinel(spark: SparkSession, path: String,
      epochBase: Long = 1704067200L /* 2024-01-01 00:00:00 UTC */): (String, Long) =
    (docsSentinelCache.computeIfAbsent((path, epochBase), { case (p, eb) =>
      stageDocsWithSentinelUncached(spark, p, eb)
    }), epochBase)

  private def stageDocsWithSentinelUncached(spark: SparkSession, path: String,
      epochBase: Long): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_docs").toString
    val docs = spark.read.parquet(path)
      .select(col("doc_id"), col("lang"), col("text"),
        timestamp_seconds(lit(epochBase) + col("doc_id") * 60L).as("ts"))
    import spark.implicits._
    val sentinel = Seq((-1L, "zz", "x"))
      .toDF("doc_id", "lang", "text")
      .withColumn("ts", timestamp_seconds(lit(epochBase) + lit(86400L * 365L)))
    docs.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  /** Drain a stream through [[partitionUpsertSink]] synchronously and
    * read the landed table back — the test/verify harness for the
    * sink, with the same drain-cost discipline as [[runToMemory]]
    * (reduced partition count, providers unloaded after). */
  def runUpsertToDir(spark: SparkSession, stream: DataFrame, path: String,
      partitionCol: String = "day", drainPartitions: Int = 4): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, math.min(prev.toInt, drainPartitions).toString)
    // same provider selection as runToMemory — the upsert drain's
    // update-mode aggregate is stateful too
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    stateStoreProviderClass().foreach(spark.conf.set(providerKey, _))
    try {
      val q = partitionUpsertSink(stream, path, partitionCol)
      q.processAllAvailable()
      q.stop()
    } finally {
      spark.conf.set(key, prev)
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => try spark.conf.unset(providerKey) catch { case _: Exception => () }
      }
      try org.apache.spark.sql.graft.StateStoreHooks.stopAll()
      catch { case _: Exception => () }
    }
    spark.read.parquet(path)
  }

  /** Streaming events source: the events table staged behind a
    * file-stream directory, ts normalized to a microsecond timestamp
    * (same convention as [[dailyAggStream]]/Tables.events). */
  def eventStream(spark: SparkSession, path: String): DataFrame =
    rawEventStream(spark, stageDir(path))

  /** Streaming documents source: the documents table staged behind a
    * file-stream directory with a pinned schema (file streams require
    * a user schema). */
  /** Continuous ingest-dedup loop against a persisted
    * [[graft.operators.Dedup.writeLshIndex]] index — the production
    * corpus-building shape (CCNet/Dolma run exactly this daily): each
    * micro-batch is (1) deduplicated WITHIN itself
    * ([[graft.operators.Dedup.dedupSurvivors]] — min-id survivor per
    * near-dup cluster), (2) probed against the index and stripped of
    * docs that near-duplicate the already-ingested corpus — including
    * re-deliveries, which the set-equal shingle property catches
    * deterministically at J = 1.0, (3) landed to `survivorPath`, and
    * (4) APPENDED to the index so the NEXT batch dedups against it.
    * `foreachBatch` is the right vehicle: every step is a normal batch
    * plan (AQE, broadcast, bucket pruning all apply), and the
    * index-append makes the sink stateful across batches WITHOUT any
    * streaming state store — the state IS the bucketed index tables.
    * Survivors are persisted for the duration of the batch: land +
    * append are two consumers of one sketch/probe pipeline. */
  def lshDedupIngestSink(stream: DataFrame, indexName: String,
      survivorPath: String, threshold: Double = 0.5,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // an ingest batch is small relative to the corpus by
          // construction, but its dedup/probe pipeline is MANY small
          // jobs — run them at a reduced partition count (restored
          // after; min-ed so a cluster-sized setting is untouched),
          // the runToMemory drain discipline. Result-invariant.
          val key = "spark.sql.shuffle.partitions"
          val prev = s.conf.get(key)
          s.conf.set(key, math.min(prev.toInt, 8).toString)
          try {
            val intra = graft.operators.Dedup.dedupSurvivors(batch, threshold = threshold)
            val dupIds = graft.operators.Dedup
              .nearDupsFromLshIndex(s, intra, indexName, threshold)
              .select(col("doc_a").as("doc_id")).distinct()
            val survivors = intra.join(dupIds, Seq("doc_id"), "left_anti")
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              survivors.write.mode(org.apache.spark.sql.SaveMode.Append)
                .parquet(survivorPath)
              graft.operators.Dedup.appendToLshIndex(s, survivors, indexName)
            } finally survivors.unpersist(false)
          } finally s.conf.set(key, prev)
        }
      }
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.start()
  }

  def documentStream(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.readStream.schema(schema).parquet(stageDir(path))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextSearch}
import graft.sources.Tables
import graft.plans.Pin

/** Ad-hoc r15 optimization profiler (dev tool, not driver contract):
  * times the sub-stages of the heaviest bench queries so the round's
  * changes target measured cost, not guessed cost. Mirrors the bench
  * session confs so numbers are comparable. */
object DebugR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val what = if (args.length > 1) args(1) else "lsh"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    // warm the session like Bench does (JIT, parquet footers)
    Seq("lineitem", "orders", "customer", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => () }
    }
    spark.range(1000).selectExpr("sum(id)").collect()

    what match {
      case "lsh" => // q108 decomposition
        import spark.implicits._
        def rep(cycle: String, times: Int) = Array.fill(times)(cycle).mkString(" ")
        val cycleA = "zzka zzkb zzkc zzkd zzke zzkf"
        val cycleB = "qqna qqnb qqnc qqnd qqne qqnf"
        val corpus = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
          .unionByName(Seq((-11L, rep(cycleA, 3))).toDF("doc_id", "text"))
        (1 to 2).foreach { round =>
          time(s"r$round writeLshIndex (3 tables)") {
            Dedup.writeLshIndex(spark, corpus, "graft_lsh_prof", buckets = 8, md5Mode = true)
          }
          val batch1 = Seq((-100L, rep(cycleA, 4)), (-101L, rep(cycleB, 3)))
            .toDF("doc_id", "text")
          val p1 = time(s"r$round probe1 + snapshot") {
            Dedup.nearDupsFromLshIndex(spark, batch1, "graft_lsh_prof")
              .withColumn("phase", lit(1)).transform(Pin.snapshot)
          }
          time(s"r$round appendToLshIndex") {
            Dedup.appendToLshIndex(spark, batch1, "graft_lsh_prof")
          }
          val batch2 = Seq((-200L, rep(cycleB, 4))).toDF("doc_id", "text")
          val p2 = time(s"r$round probe2 + eager pin") {
            Dedup.nearDupsFromLshIndex(spark, batch2, "graft_lsh_prof")
              .withColumn("phase", lit(2)).transform(Pin.eager)
          }
          time(s"r$round final union+agg+count") {
            p1.unionByName(p2).count()
          }
        }
      case "sigparts" => // which expression dominates the sig stage
        val base = Tables.documents(spark, sfDir)
          .withColumn("toks", expr("split(lower(trim(text)), '\\\\s+')"))
          .filter(size(col("toks")) >= 3)
          .withColumn("sh", expr("shingles(toks, 3)"))
          .select("doc_id", "sh")
        base.persist(); base.count()
        (1 to 2).foreach { round =>
          time(s"r$round shingle explode count only") {
            base.select(explode(col("sh"))).count()
          }
          time(s"r$round minhash_sig_md5(sh,32)") {
            base.select(expr("minhash_sig_md5(sh, 32)").as("sig"))
              .select(sum(pmod(element_at(col("sig"), 1), lit(1000000)))).collect()
          }
          time(s"r$round sh_h sql md5/conv transform") {
            base.select(expr(
              "transform(sh, x -> cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint))").as("h"))
              .select(sum(pmod(element_at(col("h"), 1), lit(1000000)))).collect()
          }
          time(s"r$round tokens+shingles recompute (no persist)") {
            Tables.documents(spark, sfDir)
              .withColumn("toks", expr("split(lower(trim(text)), '\\\\s+')"))
              .filter(size(col("toks")) >= 3)
              .withColumn("sh", expr("shingles(toks, 3)"))
              .select(sum(size(col("sh")))).collect()
          }
        }
        base.unpersist(false)
      case "lshw" => // writeLshIndex internals (q108/q109 shared cost)
        import spark.implicits._
        val corpus = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        (1 to 2).foreach { round =>
          val sigs = time(s"r$round sigs compute+persist+count") {
            val s0 = Dedup.minhashSignatures(corpus, "doc_id", "text", 32, 8, md5Mode = true)
              .select(col("doc_id"),
                expr("transform(sh, x -> cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint))").as("sh_h"),
                col("bandhash"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            s0.count(); s0
          }
          time(s"r$round writeBucketed bands") {
            graft.sources.Sinks.writeBucketed(
              sigs.select(col("doc_id"), posexplode(col("bandhash")).as(Seq("band", "bh")))
                .select(xxhash64(col("band"), col("bh")).as("bkey"), col("doc_id")),
              "graft_prof_bands", 8, Seq("bkey"))
          }
          time(s"r$round writeBucketed shingles") {
            graft.sources.Sinks.writeBucketed(
              sigs.select(col("doc_id"), col("sh_h")), "graft_prof_shingles", 8, Seq("doc_id"))
          }
          time(s"r$round meta write") {
            graft.sources.Sinks.replaceManagedTable(
              Seq((32, 8, 8, 1, true)).toDF("k", "bands", "buckets", "sketch_version", "md5_mode"),
              "graft_prof_meta")()
          }
          sigs.unpersist(false)
        }
      case "bm25" => // q102 decomposition
        import spark.implicits._
        val qdf = Seq((0L, "scan filter merge"), (1L, "hash join"),
          (2L, "stream window batch")).toDF("query_id", "query_text")
        (1 to 2).foreach { round =>
          time(s"r$round writeBm25Index") {
            TextSearch.writeBm25Index(Tables.documents(spark, sfDir), "graft_bm25_prof", buckets = 8)
          }
          time(s"r$round bm25TopKFromIndex+count") {
            TextSearch.bm25TopKFromIndex(spark, "graft_bm25_prof", qdf, k = 10)
              .orderBy("query_id", "rank").count()
          }
        }
      case "ivf" => // q110 decomposition
        val emb = Tables.embeddings(spark, sfDir)
        val q = emb.filter(col("vec_id") < 50)
        (1 to 2).foreach { round =>
          time(s"r$round writeIvfIndex") {
            Similarity.writeIvfIndex(spark, emb, "graft_ivf_prof", nCentroids = 16, buckets = 8)
          }
          time(s"r$round probe pre") {
            Similarity.ivfTopKFromIndex(spark, "graft_ivf_prof", q, k = 10, nProbe = 4)
              .withColumn("phase", lit(1)).transform(Pin.snapshot)
          }
          time(s"r$round append") {
            Similarity.appendToIvfIndex(spark,
              q.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")), "graft_ivf_prof")
          }
          time(s"r$round probe post+count") {
            Similarity.ivfTopKFromIndex(spark, "graft_ivf_prof", q, k = 10, nProbe = 4).count()
          }
        }
      case "ngram" => // q33 (t=0.3 inverted) / q57 (t=0.8 prefix) chains
        val docsDf = Tables.documents(spark, sfDir)
        (1 to 2).foreach { round =>
          time(s"r$round ngramJaccard t=0.3 full") {
            Dedup.ngramJaccardPairs(docsDf, threshold = 0.3).count()
          }
          time(s"r$round ngramJaccard t=0.8 full") {
            Dedup.ngramJaccardPairs(docsDf, threshold = 0.8).count()
          }
        }
        // join blowup diagnostics for the t=0.3 inverted-index branch
        val sh = docsDf
          .withColumn("toks", expr("split(lower(trim(text)), '\\\\s+')"))
          .filter(size(col("toks")) >= 3)
          .withColumn("sh", expr("shingles(toks, 3)"))
          .select(col("doc_id").as("id"), col("sh"), size(col("sh")).as("n_sh"))
        val inv = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("shingle"))
        inv.persist();
        println("  inv rows = " + inv.count())
        val byFreq = inv.groupBy("shingle").count()
        println("  distinct shingles = " + byFreq.count())
        println("  join pairs upper = " + byFreq.selectExpr("sum(count*count)").head().getLong(0))
        println("  top shingle freqs = " + byFreq.orderBy(col("count").desc).limit(5)
          .collect().map(_.getLong(1)).mkString(","))
        inv.unpersist(false)
      case "pagerank" => // q138 chain: edges vs iterations
        (1 to 2).foreach { round =>
          val edges = time(s"r$round ngramJaccard t=0.8 (edges)") {
            val e = Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir), threshold = 0.8)
            e.count(); e
          }
          time(s"r$round pageRank 3 iters") {
            graft.operators.Graph.pageRank(edges, iters = 3).count()
          }
        }
      case "minhash" => // q31 decomposition
        val docsDf = Tables.documents(spark, sfDir)
        (1 to 2).foreach { round =>
          val sigs = time(s"r$round minhashSignatures+count") {
            val s0 = Dedup.minhashSignatures(docsDf); s0.persist(); s0.count(); s0
          }
          val cand = time(s"r$round candidates+count") {
            val c = Dedup.minhashCandidates(sigs); c.persist(); c.count(); c
          }
          time(s"r$round verify+count") {
            Dedup.verifyJaccard(cand, sigs).filter(col("jaccard") >= 0.5).count()
          }
          sigs.unpersist(false); cand.unpersist(false)
        }
      case "spearman" => // q193 decomposition
        (1 to 2).foreach { round =>
          time(s"r$round spearmanMatrix full") {
            graft.operators.StatTests.spearmanMatrix(Tables.lineitem(spark, sfDir),
              Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")).count()
          }
        }
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val li = Tables.lineitem(spark, sfDir)
        cols.foreach { c =>
          time(s"distinct($c)") {
            println("  n=" + li.select(col(c)).distinct().count())
          }
        }
        val data = li.select(cols.map(c => col(c).cast("double").as(c)): _*)
          .na.drop(cols).localCheckpoint(false)
        time("data checkpoint count") { data.count() }
        val dbg = graft.operators.StatTests.spearmanMatrix(
          Tables.lineitem(spark, sfDir), cols)
        println(dbg.queryExecution.executedPlan.toString.take(3000))
      case "drain" => // streaming drain cost anatomy via progress durations
        import org.apache.spark.sql.streaming.StreamingQueryListener
        val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        spark.streams.addListener(new StreamingQueryListener {
          override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
            val p = e.progress
            events.add(f"batch ${p.batchId}%2d rows=${p.numInputRows}%6d " +
              f"total=${p.durationMs.getOrDefault("triggerExecution", -1L)}%5d ms " +
              f"(addBatch=${p.durationMs.getOrDefault("addBatch", -1L)} " +
              f"getBatch=${p.durationMs.getOrDefault("getBatch", -1L)} " +
              f"latestOffset=${p.durationMs.getOrDefault("latestOffset", -1L)} " +
              f"queryPlanning=${p.durationMs.getOrDefault("queryPlanning", -1L)} " +
              f"walCommit=${p.durationMs.getOrDefault("walCommit", -1L)} " +
              f"commitOffsets=${p.durationMs.getOrDefault("commitOffsets", -1L)} " +
              f"stateCommit=${p.stateOperators.map(_.commitTimeMs).sum})")
          }
          override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        })
        (1 to 2).foreach { round =>
          time(s"r$round q85_streaming_sessions") {
            SparkEntry.queries("q85_streaming_sessions")(spark, sfDir).count()
          }
          time(s"r$round q301_bounded_sessions") {
            SparkEntry.queries("q301_bounded_sessions")(spark, sfDir).count()
          }
        }
        Thread.sleep(500)
        events.forEach(s => println(s"[drain] $s"))
      case "floor" => // per-read fixed costs: schema inference vs pinned
        val p = s"$sfDir/lineitem.parquet"
        val schema = spark.read.parquet(p).schema
        (1 to 2).foreach { round =>
          time(s"r$round 20x read+count, inferred schema") {
            (1 to 20).foreach(_ => spark.read.parquet(p).count())
          }
          time(s"r$round 20x read+count, pinned schema") {
            (1 to 20).foreach(_ => spark.read.schema(schema).parquet(p).count())
          }
          time(s"r$round 20x plan-only (inferred)") {
            (1 to 20).foreach(_ => spark.read.parquet(p).queryExecution.executedPlan)
          }
          time(s"r$round 20x plan-only (pinned)") {
            (1 to 20).foreach(_ => spark.read.schema(schema).parquet(p).queryExecution.executedPlan)
          }
        }
      case "query" => // time any registry queries (args 2..n), twice each
        val names = args.drop(2)
        (1 to 2).foreach { round =>
          names.foreach { n =>
            time(s"r$round $n") { SparkEntry.queries(n)(spark, sfDir).count() }
            try spark.sparkContext.getPersistentRDDs.valuesIterator.foreach(_.unpersist(false))
            catch { case _: Throwable => () }
          }
        }
      case other => println(s"unknown profile target: $other")
    }
    spark.stop()
  }
}

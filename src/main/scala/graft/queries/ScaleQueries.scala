package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Agreement, AsOfJoin, Assoc, Binning, Bootstrap, Cdc, Contracts, Curation, Dedup, Drift, Embeddings, Encoding, EnergyOps, Experiment, Graph, Interpolate, Layout, Linkage, Manifest, Materialize, Quantiles, Retrieval, RobustStats, Scd, Seasonal, Sequences, Similarity, Survival, SkewJoin, TextSearch}
import graft.sources.{Sinks, Tables}

/** Round-5 warehouse/scale tranche: point-in-time enrichment against
  * the SCD2 dimension (q126) and exact distributed quantiles (q127) —
  * both operators whose NAIVE formulations (range join; global ordered
  * window) die at 100 TB, re-expressed with the engine's key-
  * partitioned union-window and two-phase-bucket disciplines.
  */
object ScaleQueries {

  /** q125's synthetic-refresh revision marker, shared by q130 (text
    * revision) and q132 (its n_chars growth) so the two stay in sync
    * with each other and with the DuckDB oracles' `' [rev2]'` / `+ 7`
    * literals — change all of them together. */
  private val RevisionSuffix = " [rev2]"

  /** Point-in-time join: every event probes the SCD2 dimension built
    * from the same change log 30 seconds after its own timestamp and
    * must land in the validity interval open at that instant. The
    * naive formulation is an interval range join (Spark plans a
    * broadcast nested loop — quadratic per key); this composes
    * [[Scd.scd2]] with [[AsOfJoin.backward]] instead: ONE shuffle on
    * the key, no range blow-up. `in_interval` carries the containment
    * guarantee in-row (the matched interval's valid_to must lie after
    * the probe), so the hash oracle proves both the match identity and
    * interval consistency. */
  def q126PitJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val dim = Scd.scd2(ev, keyCols = Seq("user_id"), attrCols = Seq("event_type"),
        tsCol = "ts", tieCols = Seq("event_id"))
      .select(col("user_id"), col("valid_from").as("ts"),
        col("event_type"), col("version"), col("valid_to"))
    val probes = ev.select(col("user_id"), col("event_id"),
      (col("ts") + expr("INTERVAL 30 SECONDS")).as("ts"))
    AsOfJoin.backward(probes, dim, keys = Seq("user_id"), tsCol = "ts",
        rightCols = Seq("event_type", "version", "valid_to"))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("probe_ts"),
        col("asof_event_type"), col("asof_version"),
        (col("asof_valid_to").isNull || col("asof_valid_to") > col("ts"))
          .cast("int").as("in_interval"))
      .orderBy("user_id", "event_id")
  }

  /** Exact per-language p50/p90/p99 of document length — the audit
    * statistic `percentile_approx` cannot certify — via the two-phase
    * bucket-histogram selection ([[Quantiles.exactQuantiles]]): no
    * global sort, per-bucket parallel ranking, identical to the
    * single-sort answer (DuckDB restates it as one ordered window). */
  def q127Quantiles(s: SparkSession, d: String): DataFrame =
    Quantiles.exactQuantiles(Tables.documents(s, d), "n_chars",
        qs = Seq(0.5, 0.9, 0.99), groupCols = Seq("lang"), nBuckets = 32)
      .orderBy("lang", "q")

  /** Hybrid retrieval: BM25 lexical top-10 (q91's queries) fused with
    * dense cosine top-10 (the matching query embeddings — doc_id and
    * vec_id share a domain) by reciprocal-rank fusion
    * ([[Retrieval.rrfFusion]], C = 60). Fusion consumes only the two
    * k-row lists per query — nothing rescans the corpus — so its cost
    * at 100 TB is the retrievers', not the fusion's. Fully
    * hash-checked: both input rankings are deterministic (rounded
    * scores, id tie-breaks) and the RRF sum of two addends is
    * order-independent in IEEE arithmetic. */
  def q128HybridRrf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qdf = Seq(
      (0L, "scan filter merge"),
      (1L, "hash join"),
      (2L, "stream window batch"))
      .toDF("query_id", "query_text")
    val bm25 = TextSearch.bm25TopK(Tables.documents(s, d), qdf, k = 10)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val emb = Tables.embeddings(s, d)
    val dense = Similarity.bruteForceTopK(s, emb, emb.filter(col("vec_id") < 3), k = 10)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
    Retrieval.rrfFusion(Seq(bm25, dense))
      .orderBy("query_id", "fused_rank")
  }

  /** Incremental SCD2 merge: the events log is split at 2024-01-16;
    * the first half builds the current table ([[Scd.scd2]]), the
    * second half merges in WITHOUT rebuilding closed history
    * ([[Scd.scd2Merge]]). The oracle is q124's FULL-LOG rebuild SQL —
    * the hash check proves incremental ≡ batch row for row (versions,
    * interval bounds, accumulated n_rows, is_current). */
  def q129Scd2Merge(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val current = Scd.scd2(ev.filter(col("ts") < cutoff),
      keyCols = Seq("user_id"), attrCols = Seq("event_type"),
      tsCol = "ts", tieCols = Seq("event_id"))
    Scd.scd2Merge(current, ev.filter(col("ts") >= cutoff),
        keyCols = Seq("user_id"), attrCols = Seq("event_type"),
        tsCol = "ts", tieCols = Seq("event_id"))
      .select(col("user_id"), col("version"), col("event_type"),
        date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        col("n_rows"),
        coalesce(date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss"), lit(""))
          .as("valid_to"),
        col("is_current"))
      .orderBy("user_id", "version")
  }

  /** The nightly incremental-corpus refresh, end to end in ONE plan:
    * [[Curation.snapshotDiff]] classifies the new snapshot against the
    * old (q125's construction: `%10=3` removed, `%10=4` revised, the 5
    * lowest-id docs re-added under shifted ids), and ONLY the
    * `changed ∪ added` delta is re-deduplicated against the untouched
    * remainder via [[Dedup.incrementalNearDupsExact]] — the unchanged
    * corpus (the bulk at 100 TB) is never re-paired; old×old postings
    * generate nothing. Exact shingle recall is what admits the full
    * hash oracle: DuckDB rebuilds the ENTIRE new snapshot's pair join
    * and restricts it to pairs touching the delta — the incremental
    * answer must equal that full-rebuild restriction row for row (the
    * q129 proof shape, applied to dedup). The re-added docs duplicate
    * their still-present originals at J = 1, so the refresh catches
    * re-ingestion by construction. */
  def q130IncrementalRefresh(s: SparkSession, d: String): DataFrame = {
    val old = Tables.documents(s, d).select("doc_id", "text", "lang")
    val added = old.orderBy("doc_id").limit(5)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"), col("lang"))
    val neu = old.filter(pmod(col("doc_id"), lit(10)) =!= 3)
      .withColumn("text", when(pmod(col("doc_id"), lit(10)) === 4,
        concat(col("text"), lit(RevisionSuffix))).otherwise(col("text")))
      .unionByName(added)
    val diff = Curation.snapshotDiff(old, neu, "doc_id", Seq("text", "lang"))
    val delta = diff.filter(col("status").isin("changed", "added"))
      .select("doc_id", "status")
    val deltaDocs = neu.join(delta.select("doc_id"), Seq("doc_id"), "left_semi")
    val untouched = neu.join(delta.select("doc_id"), Seq("doc_id"), "left_anti")
    Dedup.incrementalNearDupsExact(deltaDocs, untouched, threshold = 0.5)
      .join(delta.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .select(col("doc_a"), col("doc_b"),
        round(col("jaccard"), 4).as("jaccard"), col("status"))
      .orderBy("doc_a", "doc_b")
  }

  /** Skew-safe salted join: events (the fact side — at 100 TB the one
    * with hot keys) joined to the per-user activity dim on user_id,
    * 8-way salted ([[SkewJoin.saltedEquiJoin]]): the fact rows of any
    * one user spread over 8 reducers instead of funneling through one.
    * The salt is result-invariant by construction, so the oracle is
    * the PLAIN SQL join — the hash check proves salting changed the
    * schedule, not the answer. Output re-aggregates per user (row
    * identity: n back to each user's event count) so the check covers
    * every joined row without a 200 k-row artifact. */
  def q131SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val dim = ev.groupBy("user_id")
      .agg(count(lit(1)).as("user_events"),
        round(sum("value"), 2).as("user_total"))
    SkewJoin.saltedEquiJoin(
        ev.select(col("user_id"), col("event_id"), col("event_type")),
        dim, keys = Seq("user_id"), salts = 8)
      .groupBy("user_id", "user_events", "user_total")
      .agg(count(lit(1)).as("n_joined"),
        countDistinct("event_type").as("n_types"))
      .orderBy("user_id")
  }

  /** Corpus drift monitor: PSI over the n_chars histogram between the
    * old snapshot and q125/q130's revised snapshot
    * ([[Drift.histogramPsi]] — bins anchored on the old min/max,
    * add-half smoothing, the 0.1/0.25 industry gates). Pure histogram
    * arithmetic on ≤ nBins rows — full hash oracle. */
  def q132DriftPsi(s: SparkSession, d: String): DataFrame = {
    val old = Tables.documents(s, d).select("doc_id", "text", "lang", "n_chars")
    val added = old.orderBy("doc_id").limit(5)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"),
        col("lang"), col("n_chars"))
    val neu = old.filter(pmod(col("doc_id"), lit(10)) =!= 3)
      .withColumn("n_chars", when(pmod(col("doc_id"), lit(10)) === 4,
        col("n_chars") + lit(RevisionSuffix.length.toLong)).otherwise(col("n_chars")))
      .unionByName(added)
    Drift.histogramPsi(old, neu, "n_chars", nBins = 10)
      .orderBy("bin")
  }

  /** Per-key linear time interpolation ([[Interpolate.linear]]):
    * every 7th event's value is nulled in-query (deterministic planted
    * gaps), then repaired from its temporal neighbors within the
    * user's series — one key shuffle, no self-join. The weight
    * arithmetic is operand-for-operand identical in the DuckDB
    * restatement, so the filled doubles hash-check UNROUNDED. */
  def q133Interpolate(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("value",
        when(pmod(col("event_id"), lit(7)) === 3, lit(null).cast("double"))
          .otherwise(col("value")))
    Interpolate.linear(ev, keys = Seq("user_id"), tsCol = "ts",
        valueCol = "value", tieCols = Seq("event_id"))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        (pmod(col("event_id"), lit(7)) === 3).cast("int").as("was_gap"),
        col("value_filled"))
      .orderBy("user_id", "event_id")
  }

  /** Winsorized robust length statistics per language —
    * [[Quantiles.winsorizedStats]] COMPOSING [[Quantiles
    * .exactQuantiles]] (clip bounds are the exact p05/p95, not
    * approximations): the outlier-resistant corpus profile an audit
    * reports. Oracle restates the exact quantiles as ordered windows
    * plus the same clip + aggregate. */
  def q134Winsorize(s: SparkSession, d: String): DataFrame =
    Quantiles.winsorizedStats(Tables.documents(s, d), "n_chars",
        groupCols = Seq("lang"), loQ = 0.05, hiQ = 0.95, nBuckets = 32)
      .orderBy("lang")

  /** Cohen's kappa between two deterministic binary quality raters
    * (char-length vs token-count gates — the heuristic-vs-heuristic
    * calibration a filter swap requires): the full 2×2 confusion
    * table from ONE aggregate, chance-corrected agreement and the
    * Landis–Koch verdict in-row ([[Agreement.cohenKappa]]). */
  def q135Kappa(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("toks", size(graft.functions.TextFunctions.tokens("text")))
    Agreement.cohenKappa(docs, col("n_chars") >= 300, col("toks") >= 56)
  }

  /** Entity resolution over the customer master ([[Linkage
    * .blockedMatches]]): every `custkey % 100 = 7` customer re-enters
    * under a shifted id with a typo'd name (leading 'C' dropped — the
    * master-data duplicate a CRM accumulates); blocking on the name's
    * LAST 6 chars (the discriminative id digits, which the typo
    * preserves) pairs each variant with exactly its original, so the
    * match list is the planted set at levenshtein similarity
    * (len−1)/len. The constant-prefix alternative ('Customer#0') would
    * degenerate to one giant block — exactly what the maxBlock cut
    * reports instead of running. */
  def q136EntityResolution(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey").cast("long").as("id"), col("c_name").as("name"),
        col("c_nationkey").cast("long").as("nation"))
    val variants = cust.filter(pmod(col("id"), lit(100)) === 7)
      .select((col("id") + 10000000L).as("id"),
        expr("substring(name, 2)").as("name"), col("nation"))
    val all = cust.unionByName(variants)
      .withColumn("block", expr("right(name, 6)"))
    Linkage.blockedMatches(all, "id", Seq("block"), "name",
        threshold = 0.9, maxBlock = 10)
      .orderBy("id_a", "id_b")
  }

  /** Daily OHLC bars per user over the event value series
    * ([[EnergyOps.ohlcBars]] — pandas `resample('1D').ohlc()`):
    * open/close are order-dependent first/last observations (plain
    * min/max aggregation cannot express them), high/low/volume ride
    * the same one-shuffle aggregate. Open/close/high/low hash-check as
    * RAW parquet doubles; volume rounds once. */
  def q137Ohlc(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    EnergyOps.ohlcBars(ev, keyCols = Seq("user_id"), tsCol = "ts",
        valueCol = "value", bucketExpr = to_date(col("ts")),
        tieCols = Seq("event_id"))
      .orderBy("user_id", "bucket")
  }

  /** PageRank over the near-dup graph ([[Graph.pageRank]], 3 damped
    * iterations on q57's t=0.8 pair list): which member of each
    * duplicate cluster is the HUB — the canonical-record election that
    * connectedComponents (q61) cannot rank. Each iteration is one
    * edge⨝rank join + one dst aggregation; fixed iteration count
    * keeps the plan static and the oracle an unrolled CTE chain. */
  def q138PageRank(s: SparkSession, d: String): DataFrame =
    Graph.pageRank(
        Dedup.ngramJaccardPairs(Tables.documents(s, d), threshold = 0.8),
        iters = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  /** The entity-resolution failure mode made visible: blocking the
    * customer master on its CONSTANT name prefix (every TPC-H name
    * starts 'Customer#') degenerates every per-nation block past
    * `maxBlock` — [[Linkage.oversizedBlocks]] reports exactly those as
    * the key-refinement worklist instead of letting the pair join run
    * |block|² (what q136 avoids by blocking on the discriminative id
    * digits). */
  def q139OversizedBlocks(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("nation"),
        expr("substring(c_name, 1, 9)").as("block"))
    Linkage.oversizedBlocks(cust, Seq("nation", "block"), maxBlock = 10)
      .orderBy("nation", "block")
  }

  /** Incremental materialized-aggregate refresh: the per-(day,
    * event_type) rollup is built from events before a MID-DAY cutoff
    * ([[Materialize.buildAdditive]]), then the rest of the log folds
    * in WITHOUT re-aggregating history ([[Materialize.mergeAdditive]]
    * — the cutoff day's group genuinely merges an old partial with a
    * new partial, exercising the additive path, not just pass-through
    * + insert). Oracle = the full-log rebuild: incremental ≡ batch,
    * the q129 proof shape for rollups. Materialized sums stay
    * unrounded; presentation rounds once. */
  def q140AggMerge(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("ts"), to_date(col("ts")).as("day"), col("event_type"), col("value"))
    val cutoff = lit("2024-01-16 12:00:00").cast("timestamp")
    val keys = Seq("day", "event_type")
    val aggs = Map[String, org.apache.spark.sql.Column](
      "n_events" -> count(lit(1)),
      "total_value" -> sum("value"))
    val current = Materialize.buildAdditive(ev.filter(col("ts") < cutoff), keys, aggs)
    Materialize.mergeAdditive(current, ev.filter(col("ts") >= cutoff), keys, aggs)
      .select(col("day"), col("event_type"), col("n_events"),
        round(col("total_value"), 2).as("total_value"))
      .orderBy("day", "event_type")
  }

  /** Content-defined chunking over the corpus ([[Cdc
    * .contentDefinedChunks]], window 4 / modulus 8 → ~8-token chunks):
    * edit-stable chunk spans + md5 cache keys, the incremental
    * re-embedding substrate. Row-local; the md5-integer boundary rule
    * is restated hash-for-hash by DuckDB. */
  def q141CdcChunks(s: SparkSession, d: String): DataFrame =
    Cdc.contentDefinedChunks(Tables.documents(s, d))
      .orderBy("doc_id", "chunk_id")

  /** CDC chunking in the PRODUCTION hash mode (r9): the same boundary
    * discipline as q141 but with the Rabin–Karp rolling polynomial
    * over per-token md5 h1 values — ONE md5 per token and an O(1)
    * update per position instead of q141's O(w) window re-hash. Still
    * a FULL hash oracle: the window hash is a w-term power sum of
    * md5-hex integers mod 2³¹−1, which DuckDB recomputes term for
    * term (the rolling-vs-direct equivalence is spec-proven in
    * ScaleOpsSpec). */
  def q230CdcPoly(s: SparkSession, d: String): DataFrame =
    Cdc.contentDefinedChunks(Tables.documents(s, d), mode = "poly")
      .orderBy("doc_id", "chunk_id")

  /** Z-order layout audit ([[Layout.layoutPruningStats]]): scores
    * Morton-cell vs sort-by-x vs hash file layouts by min/max-stats
    * skipping under a 2-D box probe and a y-only band probe, in one
    * scan with no data rewrite. The native `morton2` expression
    * (plans/Morton.scala) supplies the interleave; the oracle restates
    * it as the expanded 32-term bit sum. At sf0.01 the scorecard reads:
    * zorder scans 4/64 cells (box) and 16/64 (band); linear 8/64 box
    * but ALL 64 for the band; hash 64/64 always — the quantified case
    * for Z-ordering any table probed on more than one column. */
  def q142Zorder(s: SparkSession, d: String): DataFrame =
    Layout.layoutPruningStats(s, Tables.lineitem(s, d),
      xCol = "l_partkey", yCol = "l_suppkey",
      keyCols = Seq("l_orderkey", "l_linenumber"))

  /** Data-contract admission gate ([[Contracts.run]]): seven row-local
    * constraints fused into ONE scan, a uniqueness check (one key
    * shuffle), and two referential-integrity anti-join probes, emitting
    * the (constraint, violations, n_rows, passed) audit frame. The
    * suite is deliberately mixed on this data: the discount cap and the
    * (orderkey, linenumber) uniqueness claim FAIL (8839 / 14168
    * violations at sf0.01) while the rest pass — a gate that can only
    * say yes proves nothing. */
  def q143Contracts(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    Contracts.run(li, Seq(
      Contracts.notNull("l_orderkey"),
      Contracts.notNull("l_shipdate"),
      Contracts.inSet("l_returnflag", Seq("A", "N", "R")),
      Contracts.inSet("l_linestatus", Seq("O", "F")),
      Contracts.inRange("l_discount", 0.0, 0.08),
      Contracts.inRange("l_quantity", 1.0, 50.0),
      Contracts.Satisfies("price_positive", col("l_extendedprice") > 0.0),
      Contracts.Unique(Seq("l_orderkey", "l_linenumber")),
      Contracts.RefIntegrity("l_orderkey", Tables.orders(s, d), "o_orderkey"),
      Contracts.RefIntegrity("l_partkey", Tables.part(s, d), "p_partkey")))
  }

  /** Seasonal anomaly monitor ([[Seasonal.anomalies]]): per-event-type
    * daily totals decomposed into trend (±3-day centered mean) +
    * weekday seasonal + residual, anomalies cut at |z| > 2. The window
    * work runs on the ROLLED-UP series (one (key, day) shuffle first),
    * so raw volume never reaches a window — the shape that keeps
    * seasonal monitoring viable over a 100 TB event log. Daily sums
    * are rounded before decomposition so shuffle-order float noise
    * cannot flip an anomaly verdict. */
  def q144Seasonal(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("value"))
    // densify on the key × date spine with value 0 BEFORE decomposing:
    // a zero-event day (total outage — the canonical anomaly) would
    // otherwise emit no row at all, and the gap would also make the
    // ROWS-based trend window span non-adjacent calendar dates
    val span = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val dense = spine.join(daily, Seq("event_type", "day"), "left")
      .withColumn("value", coalesce(col("value"), lit(0.0)))
    Seasonal.anomalies(dense, "event_type", "day", "value")
      .orderBy("event_type", "day")
  }

  /** Last-touch marketing attribution: each purchase is credited to the
    * user's most recent click within a 1-day lookback ([[AsOfJoin
    * .backward]] with tolerance — ONE shuffle on user_id, no range-join
    * blow-up), then rolled up per day into the
    * attributed/organic revenue split and the mean click→purchase
    * latency. The as-of tolerance is the attribution window — the
    * operator marketing pipelines run over clickstreams at full scale,
    * expressed as a composition of machinery the engine already
    * hash-proves (q24/q68/q126). */
  def q145Attribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    // as-of right sides must be unique per (key, ts) — collapse any
    // same-microsecond clicks to the max event_id deterministically
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max("event_id").as("click_id"))
      .withColumn("click_ts", col("ts"))
    AsOfJoin.backward(purchases, clicks, keys = Seq("user_id"), tsCol = "ts",
        rightCols = Seq("click_id", "click_ts"), tolerance = Some("interval 1 day"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_purchases"),
        count(col("asof_click_id")).as("n_attributed"),
        round(sum(when(col("asof_click_id").isNotNull, col("value")).otherwise(0.0)), 2)
          .as("attributed_value"),
        round(sum(when(col("asof_click_id").isNull, col("value")).otherwise(0.0)), 2)
          .as("organic_value"),
        round(avg(when(col("asof_click_id").isNotNull,
          (unix_micros(col("ts")) - unix_micros(col("asof_click_ts"))) / 60000000.0)), 4)
          .as("avg_latency_min"))
      .orderBy("day")
  }

  /** Poisson-bootstrap 95% CI of mean document length per language
    * ([[Bootstrap.meanCi]], B=200): the distributed bootstrap — row-
    * local Poisson(1) replica weights from the md5 idiom, map-side
    * combined replica cells, CI = rank-selected order statistics of
    * the 200 replica means. The whole resampling is deterministic, so
    * the oracle restates every draw. */
  def q146BootstrapCi(s: SparkSession, d: String): DataFrame =
    Bootstrap.meanCi(Tables.documents(s, d), valCol = "n_chars",
      keyCols = Seq("lang"), idCol = "doc_id", b = 200)

  /** User-journey Markov transition matrix ([[Sequences
    * .transitionMatrix]]): P(next event type | current) across all
    * per-user ordered event sequences — one user-keyed lead() pass,
    * then analytics on the |states|² cells. event_id breaks timestamp
    * ties so the matrix is deterministic. */
  def q147Transitions(s: SparkSession, d: String): DataFrame =
    Sequences.transitionMatrix(Tables.events(s, d),
      keyCol = "user_id", tsCol = "ts", stateCol = "event_type", tieCol = "event_id")

  /** Leakage-free K-fold target encoding of `source` against the
    * is-English label ([[Encoding.targetEncodeKFold]]): one aggregate
    * to the (category, fold) cell grid, leave-fold-out smoothing
    * arithmetic over the cells, deterministic md5 folds. The output IS
    * the broadcast-side encoding map a trainer would join. */
  def q148TargetEncoding(s: SparkSession, d: String): DataFrame =
    Encoding.targetEncodeKFold(
      Tables.documents(s, d)
        .withColumn("is_en", (col("lang") === "en").cast("int")),
      catCol = "source", labelCol = "is_en", idCol = "doc_id")

  /** Per-dimension embedding moments ([[Embeddings.perDimStats]]): one
    * native `vec_sum` aggregate pass over (v, v²) — d doubles per
    * partition through the shuffle, never an exploded (row × dim)
    * stream. The oracle restates it via unnest, proving the buffer
    * fold equals the per-dimension sums exactly. */
  def q149EmbedStats(s: SparkSession, d: String): DataFrame =
    Embeddings.perDimStats(s, Tables.embeddings(s, d), "embedding")

  /** Decile WOE/IV audit of extended price against the returned flag
    * ([[Binning.woeBins]]): exact equi-depth edges from the two-phase
    * quantile selection, KB-scale edge artifact applied as a row-local
    * indicator sum (no join, no window), WOE/IV on the 10-row cell
    * frame. */
  def q150WoeBins(s: SparkSession, d: String): DataFrame =
    Binning.woeBins(s,
      Tables.lineitem(s, d)
        .withColumn("is_return", (col("l_returnflag") === "R").cast("int")),
      featureCol = "l_extendedprice", labelCol = "is_return", nBins = 10)

  /** Triangle census of the part co-occurrence graph ([[Graph
    * .triangleStats]]): parts are linked when they ship in the same
    * order; degree-ordered orientation caps the wedge join at O(√m)
    * out-degree per node, so the count survives hub parts. Clustering
    * coefficient separates genuine part-bundles from star hubs. */
  def q151Triangles(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairs = li.join(li.select(col("o"), col("p").as("p2")), Seq("o"))
      .where(col("p") < col("p2"))
      .select(col("p").as("part_a"), col("p2").as("part_b"))
    Graph.triangleStats(pairs, "part_a", "part_b")
  }

  /** Market-basket association rules over orders ([[Assoc.rules]],
    * min-support 2): within-basket pair generation only (Σ|basket|²,
    * never n²), support pruning before any metric join, directional
    * confidence/lift. */
  def q152AssocRules(s: SparkSession, d: String): DataFrame =
    Assoc.rules(Tables.lineitem(s, d),
      basketCol = "l_orderkey", itemCol = "l_partkey", minSupport = 2)

  /** A/B readout with CUPED ([[Experiment.abCuped]]): md5-assigned
    * arms over per-user value totals, pre-period (before Jan 16) as
    * the CUPED covariate, post-period as the metric. Per-unit sums are
    * rounded before the moments so shuffle-order float noise stays
    * out of the covariate algebra. */
  def q153AbCuped(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val units = Tables.events(s, d).groupBy("user_id")
      .agg(round(sum(when(col("ts") < cutoff, col("value")).otherwise(0.0)), 6).as("pre"),
        round(sum(when(col("ts") >= cutoff, col("value")).otherwise(0.0)), 6).as("post"))
      .withColumn("arm", pmod(
        conv(substring(md5(col("user_id").cast("string")), 1, 6), 16, 10).cast("long"),
        lit(2L)).cast("int"))
    Experiment.abCuped(units, "arm", "pre", "post")
  }

  /** Lead-lag cross-correlation between per-event-type daily series
    * ([[Seasonal.leadLagCorr]], lags ±3): which metric moves first.
    * Explicit-moments Pearson per (pair, lag) cell, best-lag flag as a
    * 7-row window per pair. */
  def q154LeadLag(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("value"))
    Seasonal.leadLagCorr(daily, "event_type", "day", "value")
  }

  /** The q143 admission gate, CONTINUOUSLY: row-local contract
    * violations counted per event-time day over the replayed event
    * stream (same fused conditional-count shape — constraints are
    * columns of ONE windowed aggregate, map-side combined into
    * watermarked window state). The value cap is deliberately set
    * where the data violates it: a gate that can only pass proves
    * nothing, streaming or not. Hash oracle = the batch daily
    * restatement, so window assignment + watermark accounting are what
    * the check proves. */
  def q155StreamContracts(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StreamingOps
    def viol(pred: org.apache.spark.sql.Column) =
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
    val stream = StreamingOps.eventStream(s, s"$d/events.parquet")
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_rows"),
        viol(col("value") >= 0.0).as("v_value_negative"),
        viol(col("value") <= 50.0).as("v_value_cap"),
        viol(col("event_type").isin("click", "view", "purchase", "signup", "error"))
          .as("v_bad_type"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("v_null_user"))
    StreamingOps.runToMemory(s, stream, "graft_stream_contracts")
      .select(to_date(col("w.start")).as("day"), col("n_rows"),
        col("v_value_negative"), col("v_value_cap"), col("v_bad_type"),
        col("v_null_user"),
        (col("v_value_negative") === 0 && col("v_value_cap") === 0 &&
         col("v_bad_type") === 0 && col("v_null_user") === 0).cast("int").as("passed"))
      .orderBy("day")
  }

  /** Corpus integrity manifest + bucket diff ([[Manifest.build]] /
    * [[Manifest.diff]]): order-independent BIT_XOR digests per md5
    * bucket, root row included. Old = documents, new = the q125/q130
    * synthetic refresh — the diff pinpoints exactly the 1/64 slices
    * holding the dropped/revised/added docs without comparing a single
    * row across snapshots. */
  def q156Manifest(s: SparkSession, d: String): DataFrame = {
    val old = Tables.documents(s, d).select("doc_id", "text", "lang")
    val added = old.orderBy("doc_id").limit(5)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"), col("lang"))
    val neu = old.filter(pmod(col("doc_id"), lit(10)) =!= 3)
      .withColumn("text", when(pmod(col("doc_id"), lit(10)) === 4,
        concat(col("text"), lit(RevisionSuffix))).otherwise(col("text")))
      .unionByName(added)
    Manifest.diff(
      Manifest.build(old, "doc_id", Seq("text", "lang")),
      Manifest.build(neu, "doc_id", Seq("text", "lang")))
  }

  /** Converting-path census ([[Sequences.precedingPaths]]): the 3
    * events leading into every purchase, counted corpus-wide with
    * share of all purchases — the "what does the journey look like
    * right before conversion" readout over the same one-window-pass
    * machinery as q147. */
  def q157ConversionPaths(s: SparkSession, d: String): DataFrame =
    Sequences.precedingPaths(Tables.events(s, d), keyCol = "user_id",
      tsCol = "ts", stateCol = "event_type", tieCol = "event_id",
      target = "purchase", depth = 3)

  /** CUSUM change-point monitor ([[Seasonal.cusum]]): a planted +30%
    * level shift in purchase volume from Jan 22 — too small for any
    * single day to z-flag — must raise the sequential alarm within a
    * few days. The recursion runs as the drawup identity (running sum
    * − running min), two window functions per key, no fold. The daily
    * rollup sums exact per-row cents, not doubles (r11: a raw double
    * sum lands on the 2-dp rounding boundary at sf0.001 — 251.485 —
    * where engine-chosen accumulation order decides the rounded
    * value), so cusum's input is 2-dp exact and the whole chain rides
    * the operator's fixed-point arithmetic. */
  def q158Cusum(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("__cents"))
      // the +30% shift stays in integer cents (round to an INTEGER,
      // never round(x, 2): at a near-tie like 251.485 the two engines'
      // 2-dp round implementations disagree on the same double)
      .withColumn("value", round(col("__cents") *
        when(col("event_type") === "purchase" && col("day") >= lit("2024-01-22").cast("date"),
          1.3).otherwise(1.0)).cast("long") / 100.0)
      .drop("__cents")
    Seasonal.cusum(daily, "event_type", "day", "value")
  }

  /** DAU / WAU / stickiness: exact sliding-window distinct users
    * without a distinct-per-window rescan. Scale shape: dedup to
    * (user, day) ONCE (map-side combinable, the only pass over raw
    * events), then each active day explodes into the ≤7 observation
    * windows it covers and a second distinct+count runs on the
    * (user, obs_day) pairs — shuffle volume is active-days × 7,
    * independent of raw event volume. The naive
    * `count(DISTINCT) OVER (RANGE 7 days)` forms the same answer from
    * a per-window rescan no engine executes well at scale. */
  def q159ActiveUsers(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(sequence(col("day"), date_add(col("day"), 6)))
        .as("obs_day"))
      .distinct()
      .groupBy("obs_day").agg(count(lit(1)).as("wau"))
    dau.join(wau, dau("day") === wau("obs_day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau") / col("wau").cast("double"), 4).as("stickiness"))
      .orderBy("day")
  }

  /** Kaplan–Meier time-to-first-error ([[Survival.kaplanMeier]]): per
    * user, days from first activity to the first `error` event; users
    * who never error are right-censored at their last observed day.
    * The product-limit estimator runs as exp(running sum of logs) over
    * the life table — the unbiased hazard readout a naive mean
    * time-to-failure gets wrong exactly because the units that never
    * failed are the censored ones. */
  def q160KaplanMeier(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), to_date(col("ts")).as("day"))
    val span = e.groupBy("user_id")
      .agg(min("day").as("first_day"), max("day").as("last_day"))
    val firstErr = e.where(col("event_type") === "error")
      .groupBy("user_id").agg(min("day").as("err_day"))
    val units = span.join(firstErr, Seq("user_id"), "left")
      .select(
        when(col("err_day").isNotNull, datediff(col("err_day"), col("first_day")))
          .otherwise(datediff(col("last_day"), col("first_day")))
          .cast("long").as("duration"),
        col("err_day").isNotNull.cast("int").as("errored"))
    Survival.kaplanMeier(units, "duration", "errored")
  }

  /** Benford first-digit audit of extended price ([[RobustStats
    * .benford]]): digit taken from the exact cents integer (never
    * log10/float formatting), chi-square against log10(1+1/d). */
  def q161Benford(s: SparkSession, d: String): DataFrame =
    RobustStats.benford(Tables.lineitem(s, d), "l_extendedprice")

  /** Gini concentration of event value across users per event type
    * ([[RobustStats.gini]]): one group-partitioned rank window, closed
    * form over the ranked values. */
  def q162Gini(s: SparkSession, d: String): DataFrame =
    RobustStats.gini(
      Tables.events(s, d).groupBy(col("event_type"), col("user_id"))
        .agg(round(sum("value"), 6).as("v")),
      groupCol = "event_type", unitCol = "user_id", valCol = "v")

  /** Theil–Sen robust daily trend per event type ([[RobustStats
    * .theilSen]]): median pairwise slope over the daily rollup —
    * outlier days cannot drag it the way they drag OLS. */
  def q163TheilSen(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("v"))
      .withColumn("x", datediff(col("day"), lit("1970-01-01").cast("date")))
    RobustStats.theilSen(daily, groupCol = "event_type", xCol = "x", valCol = "v")
  }

  /** Exact click→purchase latency quantiles per day: the q145
    * attribution frame kept at row level, then [[Quantiles
    * .exactQuantiles]] (two-phase bucket selection, no global sort)
    * over the attributed latencies grouped by purchase day — the
    * conversion-speed SLO chart feed, composed entirely from machinery
    * the engine already hash-proves. */
  def q164LatencyQuantiles(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max("event_id").as("click_id"))
      .withColumn("click_ts", col("ts"))
    val lat = AsOfJoin.backward(purchases, clicks, keys = Seq("user_id"), tsCol = "ts",
        rightCols = Seq("click_id", "click_ts"), tolerance = Some("interval 1 day"))
      .where(col("asof_click_id").isNotNull)
      .select(to_date(col("ts")).as("day"),
        ((unix_micros(col("ts")) - unix_micros(col("asof_click_ts"))) / 60000000.0)
          .as("latency_min"))
    Quantiles.exactQuantiles(lat, "latency_min", qs = Seq(0.5, 0.9, 0.99),
        groupCols = Seq("day"), nBuckets = 32)
      .select(col("day"), col("q"), round(col("value"), 4).as("value"))
      .orderBy("day", "q")
  }

  /** Weekly cohort LTV curves: users grouped by first-active week,
    * purchase revenue accumulated per week-offset, normalized by
    * cohort size — cumulative sums run per cohort over the tiny
    * (cohort, offset) cell grid, never over events. */
  def q165CohortLtv(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("value"),
        floor(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")) / 7)
          .cast("int").as("week"))
    val firstWeek = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    val sizes = firstWeek.groupBy("cohort_week").agg(count(lit(1)).as("n_users"))
    val cells = ev.join(firstWeek, Seq("user_id"))
      .where(col("event_type") === "purchase")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(round(sum("value"), 2).as("revenue"))
    cells.join(sizes, Seq("cohort_week"))
      .withColumn("cum_ltv", round(
        sum("revenue").over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("cohort_week")).orderBy(col("week_offset"))) /
          col("n_users"), 4))
      .select("cohort_week", "week_offset", "n_users", "revenue", "cum_ltv")
      .orderBy("cohort_week", "week_offset")
  }

  /** Robust 7-day forecast feed per event type ([[RobustStats
    * .forecast]]): Theil–Sen trend + robust intercept + weekday-mean
    * seasonal, extrapolated past each key's last observed day — a
    * deterministic, solver-free forecast whose every component is a
    * bounded-cell computation the oracle restates. */
  def q166Forecast(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("v"))
    RobustStats.forecast(daily, groupCol = "event_type", dayCol = "day", valCol = "v")
  }

  /** J1 at its 100 TB shape — the exchange-free bucketed join
    * OPERATORS.md promises for the recurring weather⋈energy-class join
    * (r12 verdict item 4: "demonstrate, don't assert"). Both sides are
    * first written via [[Sinks.writeBucketed]] bucketed+sorted on the
    * join key — the shuffle is paid ONCE at write time — and the
    * recurring join then plans as a SortMergeJoin with ZERO Exchange
    * above either scan (bucketed scans report the HashPartitioning the
    * join needs; one file per bucket keeps the sortBy order usable, so
    * EnsureRequirements inserts neither exchange nor, for the scans,
    * extra sorts). The `merge` hint pins SMJ so the proof is not
    * broadcast-sized-away at small SF; a require() on the executed
    * plan re-proves the property on EVERY verify run, and the PLANS.md
    * dump carries the evidence. The oracle is the plain SQL join over
    * the raw parquet: bucketing must be invisible in the answer. */
  def q291BucketedJoin(s: SparkSession, d: String): DataFrame = {
    Sinks.writeBucketed(
      Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
      "g291_orders", 8, Seq("o_orderkey"))
    Sinks.writeBucketed(
      Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount"),
      "g291_lineitem", 8, Seq("l_orderkey"))
    val joined = s.table("g291_lineitem")
      .join(s.table("g291_orders").hint("merge"),
        col("l_orderkey") === col("o_orderkey"), "inner")
    // typed tree walk, not a toString substring match (r13 ADVICE):
    // a wrong plan fails THIS query (Verify/Bench isolate per query)
    graft.plans.PlanAudit.requireExchangeFree(joined, "bucketed J1",
      requireSmj = true)
    joined
      .groupBy("o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        countDistinct("o_orderkey").as("n_orders"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority")
  }

  /** Incremental append to a bucketed table — q291 completes to its
    * write-once/join-MANY production shape (r13 verdict item 4: q291/
    * q297 rewrite their tables every run; the 100 TB story is a table
    * that GROWS in place). The base load writes lineitem shipped
    * before 1998 bucketed on l_orderkey; the incremental batch (1998+)
    * is APPENDED via [[Sinks.appendBucketed]] with the same spec —
    * Spark validates spec match, and the repartition-first discipline
    * lands exactly one new file per bucket, so the layout stays linear
    * in append count (an in-query `require` on the per-bucket file
    * census re-proves it every run: ≤ 2 files per bucket, and the
    * append really added files). The recurring join over the GROWN
    * table then still plans exchange-free (typed PlanAudit walk: the
    * scan keeps HashPartitioning with multiple files per bucket; only
    * the per-file sort order is lost, so the SMJ re-sorts in-partition
    * without shuffling). Output counts base vs appended lines per
    * priority, so the oracle — plain SQL over the raw parquet with the
    * same date split — proves both batches landed exactly once. */
  def q302BucketedAppend(s: SparkSession, d: String): DataFrame = {
    val split = lit("1998-01-01").cast("timestamp")
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")
    Sinks.writeBucketed(li.filter(col("l_shipdate") < split),
      "g302_lineitem", 8, Seq("l_orderkey"))
    Sinks.appendBucketed(li.filter(col("l_shipdate") >= split),
      "g302_lineitem", 8, Seq("l_orderkey"))
    // per-bucket file census via the Hadoop FileSystem API (r14 verdict
    // item 1: FS-agnostic, so the invariant check survives an HDFS/S3
    // warehouse): file names carry the bucket id (`..._NNNNN.c000...`);
    // base + one append = at most 2 files per bucket, and the append
    // must have actually added at least one file (not silently no-opped)
    val bucketRe = "_(\\d{5})\\.".r
    val files = Sinks.listTableDataFiles(s, "g302_lineitem")
    val perBucket = files.flatMap(n => bucketRe.findFirstMatchIn(n).map(_.group(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    require(perBucket.nonEmpty && perBucket.values.max <= 2,
      s"bucketed append must land one file per bucket per batch, census: $perBucket")
    require(files.size > 8,
      s"the incremental append added no files (census: ${files.size} total)")
    Sinks.writeBucketed(
      Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
      "g302_orders", 8, Seq("o_orderkey"))
    val joined = s.table("g302_lineitem")
      .join(s.table("g302_orders").hint("merge"),
        col("l_orderkey") === col("o_orderkey"), "inner")
    graft.plans.PlanAudit.requireExchangeFree(joined,
      "bucketed join over the grown (base+append) table", requireSmj = true)
    joined
      .groupBy("o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        sum(when(col("l_shipdate") < split, 1L).otherwise(0L)).as("n_lines_base"),
        sum(when(col("l_shipdate") >= split, 1L).otherwise(0L)).as("n_lines_appended"))
      .orderBy("o_orderpriority")
  }

  /** Bucketed-table COMPACTION — the q302 lifecycle completed:
    * write-once → append-many → periodically compact. Appends keep the
    * exchange-free property but fragment each bucket into one file per
    * batch, which loses the per-file sort order (q302's SMJ re-sorts
    * in-partition — no shuffle, but real CPU at every recurring join).
    * Compaction is ONE rewrite of the grown table through
    * [[Sinks.writeBucketed]]: back to one SORTED file per bucket, so
    * the recurring join plans with ZERO Exchange and ZERO Sort below
    * the join — both `require`d on the executed plan every run, plus a
    * file census (exactly one file per bucket after compaction). At
    * 100 TB this is the standing maintenance job every bucketed estate
    * runs (Iceberg/Delta `rewriteDataFiles`, Hive compactions): paid
    * once per period, it converts every later join's per-partition
    * sort back into a merge. Oracle: the same plain SQL join — neither
    * appends nor compaction may be visible in the answer. */
  def q305BucketedCompact(s: SparkSession, d: String): DataFrame = {
    val split = lit("1998-01-01").cast("timestamp")
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")
    Sinks.writeBucketed(li.filter(col("l_shipdate") < split),
      "g305_lineitem", 8, Seq("l_orderkey"))
    Sinks.appendBucketed(li.filter(col("l_shipdate") >= split),
      "g305_lineitem", 8, Seq("l_orderkey"))
    // the compaction: one rewrite of the grown table, one sorted file
    // per bucket again (repartition-first inside writeBucketed). Read
    // the table's FILES, not the catalog table — what every compaction
    // job (Iceberg rewriteDataFiles, Hive compactor) does, and
    // necessary here: a catalog read of the bucketed table reports the
    // target HashPartitioning, the aligning repartition is elided, and
    // the write tasks then straddle buckets (measured: 16 files with
    // two buckets per task); the file-level read has no partitioning
    // to report, so the repartition materializes and aligns tasks to
    // buckets 1:1.
    val grownPath = Sinks.managedTableUri(s, "g305_lineitem").toString
    Sinks.writeBucketed(s.read.parquet(grownPath),
      "g305_lineitem_compacted", 8, Seq("l_orderkey"))
    // Hadoop-FS census (FS-agnostic — r14 verdict item 1)
    val nFiles = Sinks.listTableDataFiles(s, "g305_lineitem_compacted").size
    require(nFiles == 8,
      s"compaction must restore one file per bucket, census: $nFiles files")
    Sinks.writeBucketed(
      Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
      "g305_orders", 8, Seq("o_orderkey"))
    // SPARK-28169: since 3.0 the planner ignores a bucketed table's
    // sortBy order by default, because a bucket fragmented across
    // files (exactly the q302 append state) is only sorted per-file —
    // planning on it would be WRONG. The legacy conf re-enables the
    // ordering, and Spark still guards it per-scan (only exposed when
    // every selected bucket has exactly one file). Compaction is the
    // job that re-establishes that invariant, so the conf is set for
    // this query's planning (restored after) and the require below
    // proves the planner actually consumed the order. Result-invariant
    // by definition: it only removes redundant in-partition sorts.
    val orderingKey = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prevOrdering = s.conf.getOption(orderingKey)
    s.conf.set(orderingKey, "true")
    try {
      val joined = s.table("g305_lineitem_compacted")
        .join(s.table("g305_orders").hint("merge"),
          col("l_orderkey") === col("o_orderkey"), "inner")
      graft.plans.PlanAudit.requireExchangeFree(joined,
        "join over the compacted table", requireSmj = true)
      val sorts = graft.plans.PlanAudit.sortCount(joined)
      require(sorts == 0,
        s"compaction must restore the bucket sort order (SMJ without in-partition " +
          s"sorts), found $sorts SortExec node(s):\n" +
          joined.queryExecution.executedPlan)
      joined
        .groupBy("o_orderpriority")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_lines"),
          countDistinct(to_date(col("l_shipdate"))).as("n_ship_days"))
        .orderBy("o_orderpriority")
        // materialize while the conf is set: the aggregate re-plans the
        // scans on first action, which must see the same ordering conf
        // the require validated
        .transform(graft.plans.Pin.eager)
    } finally {
      // plan-audit mode (plans.sh sets SPARK_GRAFT_NO_CHECKPOINT=1;
      // Verify/Bench never do): Pin is identity there, so the dumped
      // plan would re-plan AFTER this restore and show re-introduced
      // sorts the require already proved absent — keep the conf set
      // for the audit session so PLANS.md carries the real plan
      if (!sys.env.get("SPARK_GRAFT_NO_CHECKPOINT").contains("1")) {
        prevOrdering match {
          case Some(v) => s.conf.set(orderingKey, v)
          case None    => try s.conf.unset(orderingKey) catch { case _: Exception => () }
        }
      }
    }
  }

  /** Compaction with an ATOMIC SAME-NAME SWAP — q305 completes to its
    * production shape (r14 verdict item 3): q305 proves the rewrite
    * restores one sorted file per bucket, but writes to a NEW table
    * name, while the job every estate actually runs (Iceberg
    * `rewriteDataFiles`, Hive compactor) replaces the table under a
    * name readers keep using. Lifecycle here: base write → incremental
    * append (census proves the fragmented ≥ 9-file state) → compact
    * ASIDE into a scratch table → swap in the session catalog
    * (DROP old + `ALTER TABLE ... RENAME`, the local stand-in for the
    * transactional pointer flip an Iceberg/Delta catalog makes truly
    * atomic; the managed rename MOVES the data directory, so readers
    * of the name see the compacted files) → census re-lists the
    * ORIGINAL name's directory through the Hadoop FS API and must find
    * EXACTLY 8 files (the fragmented ones are gone, not shadowed) →
    * the recurring join runs against the ORIGINAL table name and must
    * plan with ZERO Exchange and ZERO Sort below the SMJ, both
    * `require`d on the executed plan. Oracle: the plain SQL join over
    * raw parquet — append, compaction, and swap must all be invisible
    * in the answer. */
  def q306CompactSwap(s: SparkSession, d: String): DataFrame = {
    val split = lit("1998-01-01").cast("timestamp")
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    // fresh lifecycle per run: writeBucketed drops/cleans g306_lineitem
    // itself; the scratch name must also be cleared in case a previous
    // run died between compact and swap
    s.sql("DROP TABLE IF EXISTS g306_lineitem_new")
    Sinks.writeBucketed(li.filter(col("l_shipdate") < split),
      "g306_lineitem", 8, Seq("l_orderkey"))
    Sinks.appendBucketed(li.filter(col("l_shipdate") >= split),
      "g306_lineitem", 8, Seq("l_orderkey"))
    val fragmented = Sinks.listTableDataFiles(s, "g306_lineitem").size
    require(fragmented > 8,
      s"the append must fragment the buckets before the swap, census: $fragmented files")
    // compact aside — file-level read for the same task-alignment
    // reason documented in q305
    Sinks.writeBucketed(
      s.read.parquet(Sinks.managedTableUri(s, "g306_lineitem").toString),
      "g306_lineitem_new", 8, Seq("l_orderkey"))
    // the swap: drop the fragmented table (managed → its files are
    // deleted), rename the compacted one onto the original name. The
    // catalog rename carries the bucket spec and moves the directory.
    s.sql("DROP TABLE g306_lineitem")
    s.sql("ALTER TABLE g306_lineitem_new RENAME TO g306_lineitem")
    val nFiles = Sinks.listTableDataFiles(s, "g306_lineitem").size
    require(nFiles == 8,
      s"the swap must leave exactly one compacted file per bucket under the " +
        s"ORIGINAL name, census: $nFiles files")
    Sinks.writeBucketed(
      Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
      "g306_orders", 8, Seq("o_orderkey"))
    // same SPARK-28169 ordering-conf discipline as q305 (see there)
    val orderingKey = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prevOrdering = s.conf.getOption(orderingKey)
    s.conf.set(orderingKey, "true")
    try {
      val joined = s.table("g306_lineitem")
        .join(s.table("g306_orders").hint("merge"),
          col("l_orderkey") === col("o_orderkey"), "inner")
      graft.plans.PlanAudit.requireExchangeFree(joined,
        "join over the swapped-in compacted table", requireSmj = true)
      val sorts = graft.plans.PlanAudit.sortCount(joined)
      require(sorts == 0,
        s"the swapped-in table must expose the bucket sort order (SMJ without " +
          s"in-partition sorts), found $sorts SortExec node(s):\n" +
          joined.queryExecution.executedPlan)
      joined
        .groupBy("o_orderpriority")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_lines"),
          countDistinct(col("l_suppkey")).as("n_suppliers"))
        .orderBy("o_orderpriority")
        .transform(graft.plans.Pin.eager)
    } finally {
      // same plan-audit-mode carve-out as q305: keep the conf set under
      // SPARK_GRAFT_NO_CHECKPOINT so the dumped plan is the one the
      // requires validated; plans.sh dumps these two queries in their
      // own trailing JVM so nothing else plans under it (r14 ADVICE)
      if (!sys.env.get("SPARK_GRAFT_NO_CHECKPOINT").contains("1")) {
        prevOrdering match {
          case Some(v) => s.conf.set(orderingKey, v)
          case None    => try s.conf.unset(orderingKey) catch { case _: Exception => () }
        }
      }
    }
  }

  /** The q291 companion: bucketing pays for AGGREGATION too. The
    * order-grain rollup (sum/count per l_orderkey) reads the SAME
    * bucketed lineitem table q291 writes — the scan reports
    * HashPartitioning(l_orderkey), so the per-key aggregate plans with
    * ZERO Exchange below it (a `require` on the executed plan re-proves
    * it every run; at 100 TB this is the difference between a free
    * order-grain rollup and a full-corpus shuffle every time the
    * recurring job runs). Revenue is EXACT 1e-4-dollar integer units
    * (price and discount are 2-dp decimals, so cents × percent is a
    * lossless long), which makes the downstream revenue-band histogram
    * boundary integer arithmetic — no float can flip a band. The
    * presentation divides the same longs on both engines. Oracle: the
    * plain SQL rollup over the raw parquet — bucketing must be
    * invisible in the answer. */
  def q297BucketedAgg(s: SparkSession, d: String): DataFrame = {
    Sinks.writeBucketed(
      Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount"),
      "g297_lineitem", 8, Seq("l_orderkey"))
    val perOrder = s.table("g297_lineitem")
      .groupBy("l_orderkey")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"),
        count(lit(1)).as("n_lines"))
    // typed tree walk, not a toString substring match (r13 ADVICE)
    graft.plans.PlanAudit.requireExchangeFree(perOrder, "bucketed per-key aggregate")
    perOrder
      .withColumn("band", expr("rev_e4 div 500000000")) // 50k-dollar bands of 1e-4 units
      .groupBy("band")
      .agg(count(lit(1)).as("n_orders"), sum("n_lines").as("n_lines"),
        round(sum("rev_e4") / 10000.0, 2).as("revenue"))
      .orderBy("band")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q291_bucketed_join" -> (q291BucketedJoin _),
    "q297_bucketed_agg" -> (q297BucketedAgg _),
    "q302_bucketed_append" -> (q302BucketedAppend _),
    "q305_bucketed_compact" -> (q305BucketedCompact _),
    "q306_compact_swap" -> (q306CompactSwap _),
    "q126_pit_join" -> (q126PitJoin _),
    "q127_quantiles" -> (q127Quantiles _),
    "q128_hybrid_rrf" -> (q128HybridRrf _),
    "q129_scd2_merge" -> (q129Scd2Merge _),
    "q130_incremental_refresh" -> (q130IncrementalRefresh _),
    "q131_salted_join" -> (q131SaltedJoin _),
    "q132_drift_psi" -> (q132DriftPsi _),
    "q133_interpolate" -> (q133Interpolate _),
    "q134_winsorize" -> (q134Winsorize _),
    "q135_kappa" -> (q135Kappa _),
    "q136_entity_resolution" -> (q136EntityResolution _),
    "q137_ohlc" -> (q137Ohlc _),
    "q138_pagerank" -> (q138PageRank _),
    "q139_oversized_blocks" -> (q139OversizedBlocks _),
    "q140_agg_merge" -> (q140AggMerge _),
    "q141_cdc_chunks" -> (q141CdcChunks _),
    "q230_cdc_poly" -> (q230CdcPoly _),
    "q142_zorder" -> (q142Zorder _),
    "q143_contracts" -> (q143Contracts _),
    "q144_seasonal" -> (q144Seasonal _),
    "q145_attribution" -> (q145Attribution _),
    "q146_bootstrap_ci" -> (q146BootstrapCi _),
    "q147_transitions" -> (q147Transitions _),
    "q148_target_encoding" -> (q148TargetEncoding _),
    "q149_embed_stats" -> (q149EmbedStats _),
    "q150_woe_bins" -> (q150WoeBins _),
    "q151_triangles" -> (q151Triangles _),
    "q152_assoc_rules" -> (q152AssocRules _),
    "q153_ab_cuped" -> (q153AbCuped _),
    "q154_leadlag" -> (q154LeadLag _),
    "q155_stream_contracts" -> (q155StreamContracts _),
    "q156_manifest" -> (q156Manifest _),
    "q157_conversion_paths" -> (q157ConversionPaths _),
    "q158_cusum" -> (q158Cusum _),
    "q159_active_users" -> (q159ActiveUsers _),
    "q160_kaplan_meier" -> (q160KaplanMeier _),
    "q161_benford" -> (q161Benford _),
    "q162_gini" -> (q162Gini _),
    "q163_theil_sen" -> (q163TheilSen _),
    "q164_latency_quantiles" -> (q164LatencyQuantiles _),
    "q165_cohort_ltv" -> (q165CohortLtv _),
    "q166_forecast" -> (q166Forecast _)
  )

  /** The `morton2` interleave restated as DuckDB arithmetic: bit i of
    * xs contributes 4^i (even positions), bit i of ys contributes
    * 2·4^i (odd). Generated, not hand-typed, so the 32 terms cannot
    * drift from the native expression's semantics. */
  private val MortonSql: String = (0 until 16).map { i =>
    val p = BigInt(4).pow(i)
    s"((xs >> $i) & 1) * $p + ((ys >> $i) & 1) * ${p * 2}"
  }.mkString(" + ")

  val oracles: Map[String, String] = Map(
    // the plain join over the raw parquet — the bucketed tables must
    // answer identically to an unbucketed engine
    "q291_bucketed_join" ->
      """SELECT o_orderpriority,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(DISTINCT o_orderkey) AS n_orders,
        | count(*) AS n_lines
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the plain rollup over raw parquet — bucketing must be invisible;
    // revenue in exact 1e-4-dollar longs so the band cut is integer
    "q297_bucketed_agg" ->
      """WITH po AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |        (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4,
        |    CAST(count(*) AS BIGINT) AS n_lines
        |  FROM lineitem GROUP BY 1)
        |SELECT rev_e4 // 500000000 AS band,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(n_lines) AS BIGINT) AS n_lines,
        |  round(CAST(sum(rev_e4) AS BIGINT) / 10000.0, 2) AS revenue
        |FROM po GROUP BY 1 ORDER BY 1""".stripMargin,
    // the plain join over raw parquet with the same date split — the
    // grown (base+append) bucketed table must hold exactly one copy of
    // every line on both sides of the split
    "q302_bucketed_append" ->
      """SELECT o_orderpriority,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_base,
        | CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_appended
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the same plain join over raw parquet — neither the appends nor
    // the compaction rewrite may be visible in the answer
    "q305_bucketed_compact" ->
      """SELECT o_orderpriority,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n_lines,
        | count(DISTINCT CAST(l_shipdate AS DATE)) AS n_ship_days
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the same plain join — append, compaction, AND the same-name swap
    // must all be invisible in the answer
    "q306_compact_swap" ->
      """SELECT o_orderpriority,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n_lines,
        | count(DISTINCT l_suppkey) AS n_suppliers
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // SCD2 islands rebuild (the q124 CTE chain) + the textbook
    // inequality formulation of the point-in-time match: greatest
    // valid_from ≤ probe, then interval containment as a CASE
    "q126_pit_join" ->
      """WITH e AS (
        |  SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts, event_id
        |  FROM events),
        |o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        |  FROM e),
        |r AS (
        |  SELECT user_id, event_type, ts,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS version
        |  FROM o),
        |c AS (
        |  SELECT user_id, version, event_type, min(ts) AS vf
        |  FROM r GROUP BY 1, 2, 3),
        |iv AS (
        |  SELECT user_id, version, event_type, vf,
        |    lead(vf) OVER (PARTITION BY user_id ORDER BY version) AS vt
        |  FROM c),
        |p AS (SELECT user_id, event_id, ts + INTERVAL 30 SECOND AS pts FROM e),
        |m AS (
        |  SELECT p.user_id, p.event_id, p.pts, iv.event_type, iv.version, iv.vt,
        |    row_number() OVER (PARTITION BY p.user_id, p.event_id
        |      ORDER BY iv.vf DESC) AS rn
        |  FROM p JOIN iv ON p.user_id = iv.user_id AND iv.vf <= p.pts)
        |SELECT user_id, event_id,
        |  strftime(date_trunc('second', pts), '%Y-%m-%d %H:%M:%S') AS probe_ts,
        |  event_type AS asof_event_type, CAST(version AS BIGINT) AS asof_version,
        |  CASE WHEN vt IS NULL OR vt > pts THEN 1 ELSE 0 END AS in_interval
        |FROM m WHERE rn = 1 ORDER BY user_id, event_id""".stripMargin,
    // single ordered-window restatement; q cast to DOUBLE so ceil(q·n)
    // runs in IEEE doubles on both engines (DuckDB would otherwise
    // parse 0.9 as DECIMAL and ceil(0.9·500) = 450 vs double's 451)
    "q127_quantiles" ->
      """WITH t AS (SELECT lang, n_chars FROM documents),
        |n AS (SELECT lang, count(*) AS n FROM t GROUP BY 1),
        |r AS (SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rk
        |  FROM t),
        |q(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
        |                (CAST(0.99 AS DOUBLE))),
        |k AS (SELECT lang, q, CAST(ceil(q * n) AS BIGINT) AS k
        |  FROM n CROSS JOIN q)
        |SELECT k.lang, k.q, r.n_chars AS value
        |FROM k JOIN r ON r.lang = k.lang AND r.rk = k.k
        |ORDER BY k.lang, k.q""".stripMargin,
    // both retrievers restated (BM25 = q91's CTE chain, dense = q34's
    // rounded-cosine ranking) + the RRF sum; 1.0 cast to DOUBLE so the
    // reciprocal runs in IEEE doubles, not DECIMAL
    "q128_hybrid_rrf" ->
      """WITH q(query_id, query_text) AS (VALUES
        |    (CAST(0 AS BIGINT), 'scan filter merge'),
        |    (CAST(1 AS BIGINT), 'hash join'),
        |    (CAST(2 AS BIGINT), 'stream window batch')),
        |qt AS (SELECT query_id,
        |    unnest(list_distinct(string_split_regex(lower(trim(query_text)), '\s+'))) AS term
        |  FROM q),
        |toks AS (SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |cs AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT t.doc_id, t.term, count(*) AS tf
        |  FROM toks t JOIN (SELECT DISTINCT term FROM qt) u USING (term)
        |  GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    sum( ln(1 + (cs.n_docs - df.df + 0.5) / (df.df + 0.5))
        |       * (tf.tf * 2.2)
        |       / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / cs.avgdl)) ) AS score
        |  FROM tf
        |  JOIN df USING (term)
        |  JOIN dl USING (doc_id)
        |  CROSS JOIN cs
        |  JOIN qt USING (term)
        |  GROUP BY 1, 2),
        |bm25 AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY round(score, 6) DESC, doc_id) AS rank
        |  FROM scored QUALIFY rank <= 10),
        |qe AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |  FROM embeddings WHERE vec_id < 3),
        |dscored AS (
        |  SELECT qe.query_id, e.vec_id AS doc_id,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qe.q_emb), 6) AS sim
        |  FROM embeddings e CROSS JOIN qe
        |  WHERE e.vec_id <> qe.query_id),
        |dense AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS rank
        |  FROM dscored QUALIFY rank <= 10),
        |fused AS (
        |  SELECT query_id, doc_id,
        |    round(sum(CAST(1.0 AS DOUBLE) / (60 + rank)), 6) AS rrf,
        |    CAST(count(*) AS BIGINT) AS n_lists
        |  FROM (SELECT * FROM bm25 UNION ALL SELECT * FROM dense)
        |  GROUP BY 1, 2)
        |SELECT query_id, doc_id, rrf, n_lists,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf DESC, doc_id) AS INT) AS fused_rank
        |FROM fused
        |QUALIFY fused_rank <= 10
        |ORDER BY query_id, fused_rank""".stripMargin,
    // q124's FULL-LOG islands rebuild, verbatim: the incremental merge
    // must reproduce the batch answer row for row
    "q129_scd2_merge" ->
      """WITH e AS (
        |  SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts, event_id
        |  FROM events),
        |o AS (
        |  SELECT user_id, event_type, ts,
        |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg,
        |    event_id
        |  FROM e),
        |r AS (
        |  SELECT user_id, event_type, ts,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS version
        |  FROM o),
        |c AS (
        |  SELECT user_id, version, event_type, min(ts) AS vf,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM r GROUP BY 1, 2, 3)
        |SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
        |  strftime(date_trunc('second', vf), '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  n_rows,
        |  coalesce(strftime(date_trunc('second',
        |    lead(vf) OVER (PARTITION BY user_id ORDER BY version)),
        |    '%Y-%m-%d %H:%M:%S'), '') AS valid_to,
        |  CASE WHEN lead(vf) OVER (PARTITION BY user_id ORDER BY version) IS NULL
        |       THEN 1 ELSE 0 END AS is_current
        |FROM c ORDER BY user_id, version""".stripMargin,
    // full-rebuild restriction proof: the new snapshot is rebuilt
    // wholesale (q125's construction rules), its COMPLETE exact-Jaccard
    // pair join computed (q79's shingle CTE chain), then restricted to
    // pairs touching the changed∪added delta and reoriented so doc_a is
    // the delta member — the incremental plan must reproduce exactly
    // that
    "q130_incremental_refresh" ->
      """WITH low5 AS (
        |  SELECT doc_id, text, lang FROM documents ORDER BY doc_id LIMIT 5),
        |added AS (SELECT doc_id + 10000000 AS doc_id, text, lang FROM low5),
        |neu AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 4 THEN text || ' [rev2]' ELSE text END AS text,
        |    lang
        |  FROM documents WHERE doc_id % 10 <> 3
        |  UNION ALL SELECT doc_id, text, lang FROM added),
        |delta AS (
        |  SELECT doc_id, 'changed' AS status FROM documents WHERE doc_id % 10 = 4
        |  UNION ALL SELECT doc_id, 'added' AS status FROM added),
        |toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM neu),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM toks WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT doc_a, doc_b,
        |    round(shared * 1.0 / (sa.n + sb.n - shared), 4) AS jaccard
        |  FROM cand
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.5),
        |o AS (
        |  SELECT CASE WHEN p.doc_a IN (SELECT doc_id FROM delta)
        |              THEN p.doc_a ELSE p.doc_b END AS da,
        |         CASE WHEN p.doc_a IN (SELECT doc_id FROM delta)
        |              THEN p.doc_b ELSE p.doc_a END AS db,
        |         jaccard
        |  FROM p
        |  WHERE p.doc_a IN (SELECT doc_id FROM delta)
        |     OR p.doc_b IN (SELECT doc_id FROM delta))
        |SELECT o.da AS doc_a, o.db AS doc_b, o.jaccard, d.status
        |FROM o JOIN delta d ON d.doc_id = o.da
        |ORDER BY 1, 2""".stripMargin,
    // the PLAIN join — salting must not change the answer
    "q131_salted_join" ->
      """WITH dim AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS user_events,
        |    round(sum(value), 2) AS user_total
        |  FROM events GROUP BY 1)
        |SELECT e.user_id, d.user_events, d.user_total,
        |  CAST(count(*) AS BIGINT) AS n_joined,
        |  CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types
        |FROM events e JOIN dim d USING (user_id)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    // identical histogram arithmetic: old-anchored fixed-width bins,
    // add-half smoothing, contributions summed unrounded then rounded
    "q132_drift_psi" ->
      """WITH old AS (SELECT doc_id, n_chars FROM documents),
        |neu AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 4 THEN n_chars + 7 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 10 <> 3
        |  UNION ALL
        |  SELECT doc_id + 10000000 AS doc_id, n_chars
        |  FROM (SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 5)),
        |anchor AS (SELECT CAST(min(n_chars) AS DOUBLE) AS lo,
        |                  CAST(max(n_chars) AS DOUBLE) AS hi FROM old),
        |co AS (
        |  SELECT CASE WHEN a.hi = a.lo THEN 0 ELSE
        |    least(greatest(CAST(floor((n_chars - a.lo) / (a.hi - a.lo) * 10) AS INT),
        |      0), 9) END AS bin, count(*) AS c
        |  FROM old, anchor a GROUP BY 1),
        |cn AS (
        |  SELECT CASE WHEN a.hi = a.lo THEN 0 ELSE
        |    least(greatest(CAST(floor((n_chars - a.lo) / (a.hi - a.lo) * 10) AS INT),
        |      0), 9) END AS bin, count(*) AS c
        |  FROM neu, anchor a GROUP BY 1),
        |bins AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS bin),
        |j AS (
        |  SELECT b.bin,
        |    CAST(coalesce(co.c, 0) AS BIGINT) AS n_old,
        |    CAST(coalesce(cn.c, 0) AS BIGINT) AS n_new
        |  FROM bins b LEFT JOIN co USING (bin) LEFT JOIN cn USING (bin)),
        |t AS (SELECT sum(n_old) AS to_, sum(n_new) AS tn FROM j),
        |s AS (
        |  SELECT j.bin, j.n_old, j.n_new,
        |    (j.n_old + 0.5) / (t.to_ + 0.5 * 10) AS po,
        |    (j.n_new + 0.5) / (t.tn + 0.5 * 10) AS pn
        |  FROM j, t),
        |sc AS (
        |  SELECT bin, n_old, n_new, po, pn, (pn - po) * ln(pn / po) AS contrib
        |  FROM s),
        |p AS (SELECT round(sum(contrib), 6) AS psi FROM sc)
        |SELECT sc.bin, sc.n_old, sc.n_new,
        |  round(sc.po, 6) AS p_old, round(sc.pn, 6) AS p_new,
        |  round(sc.contrib, 6) AS psi_contrib, p.psi,
        |  CASE WHEN p.psi < 0.1 THEN 'stable'
        |       WHEN p.psi < 0.25 THEN 'drifting'
        |       ELSE 'shifted' END AS verdict
        |FROM sc, p ORDER BY sc.bin""".stripMargin,
    // operand-for-operand identical weight arithmetic over epoch
    // microseconds; IGNORE NULLS cumulative/reverse scans mirror the
    // engine's last/first neighbor lookups
    "q133_interpolate" ->
      """WITH e AS (
        |  SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts,
        |    CASE WHEN event_id % 7 = 3 THEN NULL ELSE value END AS value
        |  FROM events),
        |n AS (
        |  SELECT user_id, event_id, ts, value,
        |    CAST(epoch_us(ts) AS DOUBLE) AS t,
        |    last_value(CASE WHEN value IS NOT NULL THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN value IS NOT NULL
        |        THEN CAST(epoch_us(ts) AS DOUBLE) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        |    first_value(CASE WHEN value IS NOT NULL THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN value IS NOT NULL
        |        THEN CAST(epoch_us(ts) AS DOUBLE) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        |  FROM e)
        |SELECT user_id, event_id,
        |  strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s,
        |  CASE WHEN event_id % 7 = 3 THEN 1 ELSE 0 END AS was_gap,
        |  CASE WHEN value IS NOT NULL THEN value
        |       WHEN pv IS NULL THEN nv
        |       WHEN nv IS NULL THEN pv
        |       WHEN nt = pt THEN pv
        |       ELSE pv + (nv - pv) * ((t - pt) / (nt - pt)) END AS value_filled
        |FROM n ORDER BY user_id, event_id""".stripMargin,
    // exact p05/p95 as ordered windows (q127 shape, q DOUBLE-cast for
    // IEEE ceil parity), then the identical clip + aggregate
    "q134_winsorize" ->
      """WITH t AS (SELECT lang, n_chars FROM documents),
        |n AS (SELECT lang, count(*) AS n FROM t GROUP BY 1),
        |r AS (SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rk
        |  FROM t),
        |q(q) AS (VALUES (CAST(0.05 AS DOUBLE)), (CAST(0.95 AS DOUBLE))),
        |k AS (SELECT lang, q, CAST(ceil(q * n) AS BIGINT) AS k
        |  FROM n CROSS JOIN q),
        |qv AS (SELECT k.lang, k.q, r.n_chars AS value
        |  FROM k JOIN r ON r.lang = k.lang AND r.rk = k.k),
        |b AS (SELECT lang,
        |    CAST(max(CASE WHEN q = 0.05 THEN value END) AS DOUBLE) AS lo,
        |    CAST(max(CASE WHEN q = 0.95 THEN value END) AS DOUBLE) AS hi
        |  FROM qv GROUP BY 1),
        |c AS (SELECT t.lang, CAST(t.n_chars AS DOUBLE) AS v, b.lo, b.hi,
        |    greatest(b.lo, least(b.hi, CAST(t.n_chars AS DOUBLE))) AS cv
        |  FROM t JOIN b USING (lang))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        |  CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
        |  min(lo) AS p_lo, min(hi) AS p_hi,
        |  round(avg(cv), 4) AS winsorized_mean,
        |  round(stddev_samp(cv), 4) AS winsorized_std
        |FROM c GROUP BY 1 ORDER BY lang""".stripMargin,
    // the same 2x2 confusion table + chance-corrected arithmetic
    "q135_kappa" ->
      """WITH l AS (
        |  SELECT n_chars >= 300 AS a,
        |    len(string_split_regex(lower(trim(text)), '\s+')) >= 56 AS b
        |  FROM documents),
        |c AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_pos,
        |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_neg,
        |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_neg_pos,
        |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_neg_neg
        |  FROM l),
        |s AS (
        |  SELECT *,
        |    (n_pos_pos + n_neg_neg) / CAST(n AS DOUBLE) AS po,
        |    ((n_pos_pos + n_pos_neg) / CAST(n AS DOUBLE)) *
        |      ((n_pos_pos + n_neg_pos) / CAST(n AS DOUBLE)) +
        |    (1.0 - (n_pos_pos + n_pos_neg) / CAST(n AS DOUBLE)) *
        |      (1.0 - (n_pos_pos + n_neg_pos) / CAST(n AS DOUBLE)) AS pe
        |  FROM c),
        |f AS (SELECT *, CASE WHEN pe = 1.0 THEN 0.0
        |    ELSE (po - pe) / (1.0 - pe) END AS kappa FROM s)
        |SELECT n, n_pos_pos, n_pos_neg, n_neg_pos, n_neg_neg,
        |  round(po, 6) AS p_observed, round(pe, 6) AS p_expected,
        |  round(kappa, 6) AS kappa,
        |  CASE WHEN pe = 1.0 THEN 'degenerate'
        |       WHEN kappa < 0.0 THEN 'poor'
        |       WHEN kappa < 0.2 THEN 'slight'
        |       WHEN kappa < 0.4 THEN 'fair'
        |       WHEN kappa < 0.6 THEN 'moderate'
        |       WHEN kappa < 0.8 THEN 'substantial'
        |       ELSE 'almost_perfect' END AS verdict
        |FROM f""".stripMargin,
    // identical blocking + scoring: the planted-variant construction,
    // per-block sizes, pairs within blocks only, rounded-sim threshold
    "q136_entity_resolution" ->
      """WITH cust AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name,
        |    CAST(c_nationkey AS BIGINT) AS nation
        |  FROM customer),
        |var AS (
        |  SELECT id + 10000000 AS id, substring(name, 2) AS name, nation
        |  FROM cust WHERE id % 100 = 7),
        |al AS (
        |  SELECT *, right(name, 6) AS block
        |  FROM (SELECT * FROM cust UNION ALL SELECT * FROM var)),
        |sized AS (
        |  SELECT *, CAST(count(*) OVER (PARTITION BY block) AS BIGINT)
        |    AS block_size
        |  FROM al),
        |ok AS (SELECT * FROM sized WHERE block_size <= 10),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b, a.block, a.block_size,
        |    CAST(levenshtein(a.name, b.name) AS INT) AS edit_dist,
        |    round(1.0 - levenshtein(a.name, b.name) * 1.0 /
        |      greatest(length(a.name), length(b.name)), 4) AS sim
        |  FROM ok a JOIN ok b ON a.block = b.block AND a.id < b.id)
        |SELECT id_a, id_b, block, block_size, edit_dist, sim
        |FROM p WHERE sim >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    // first/last by (ts, event_id) over the full bucket frame, then
    // the same collapse — open/close raw doubles, volume rounded once
    "q137_ohlc" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('microseconds', ts) AS ts, value, event_id,
        |    CAST(ts AS DATE) AS bucket
        |  FROM events),
        |w AS (
        |  SELECT user_id, bucket, value,
        |    first_value(value) OVER (PARTITION BY user_id, bucket
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS o,
        |    last_value(value) OVER (PARTITION BY user_id, bucket
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS c
        |  FROM e)
        |SELECT user_id, bucket,
        |  min(o) AS open, max(value) AS high, min(value) AS low,
        |  min(c) AS close, CAST(count(*) AS BIGINT) AS n_obs,
        |  round(sum(value), 2) AS volume
        |FROM w GROUP BY 1, 2 ORDER BY user_id, bucket""".stripMargin,
    // q57's exact pair chain + 3 unrolled damped iterations; every
    // literal DOUBLE-cast so nothing runs in DECIMAL
    "q138_pagerank" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM toks WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT doc_a, doc_b FROM cand
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.8),
        |und AS (SELECT doc_a AS src, doc_b AS dst FROM p
        |        UNION ALL SELECT doc_b, doc_a FROM p),
        |nodes AS (SELECT DISTINCT src AS id FROM und),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS deg FROM und GROUP BY 1),
        |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes, nn),
        |c1 AS (SELECT u.dst AS id, sum(r.rank / d.deg) AS m
        |  FROM und u JOIN r0 r ON r.id = u.src JOIN deg d ON d.src = u.src GROUP BY 1),
        |r1 AS (SELECT n.id,
        |    CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) * coalesce(c1.m, 0.0) AS rank
        |  FROM nodes n LEFT JOIN c1 ON c1.id = n.id, nn),
        |c2 AS (SELECT u.dst AS id, sum(r.rank / d.deg) AS m
        |  FROM und u JOIN r1 r ON r.id = u.src JOIN deg d ON d.src = u.src GROUP BY 1),
        |r2 AS (SELECT n.id,
        |    CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) * coalesce(c2.m, 0.0) AS rank
        |  FROM nodes n LEFT JOIN c2 ON c2.id = n.id, nn),
        |c3 AS (SELECT u.dst AS id, sum(r.rank / d.deg) AS m
        |  FROM und u JOIN r2 r ON r.id = u.src JOIN deg d ON d.src = u.src GROUP BY 1),
        |r3 AS (SELECT n.id,
        |    CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) * coalesce(c3.m, 0.0) AS rank
        |  FROM nodes n LEFT JOIN c3 ON c3.id = n.id, nn)
        |SELECT id AS doc_id, round(rank, 6) AS rank
        |FROM r3 ORDER BY doc_id""".stripMargin,
    // GROUP BY + HAVING restatement of the worklist
    "q139_oversized_blocks" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |  substring(c_name, 1, 9) AS block,
        |  CAST(count(*) AS BIGINT) AS block_size
        |FROM customer GROUP BY 1, 2 HAVING count(*) > 10
        |ORDER BY nation, block""".stripMargin,
    // the full-log rebuild the incremental refresh must reproduce
    "q140_agg_merge" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    // the identical md5-integer boundary rule over 1-based token
    // windows; DuckDB range() is end-exclusive (hence n + 1) and its
    // list_slice is inclusive 1-based (hence i-3 .. i ≡ Spark's
    // slice(toks, i-3, 4))
    "q141_cdc_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |n0 AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 1),
        |b AS (
        |  SELECT doc_id, toks, n,
        |    list_sort(list_distinct(list_concat(
        |      list_filter(list_transform(range(4, greatest(n, 4) + 1), i ->
        |        CASE WHEN i <= n AND
        |          ('0x' || substr(md5(array_to_string(list_slice(toks, i - 3, i), ' ')), 1, 6))::BIGINT % 8 = 0
        |        THEN i END), x -> x IS NOT NULL),
        |      [n]))) AS bpos
        |  FROM n0),
        |c AS (SELECT doc_id, toks, list_prepend(0, bpos) AS bounds FROM b),
        |e AS (
        |  SELECT doc_id, toks, bounds,
        |    unnest(range(1, len(bounds))) AS j
        |  FROM c)
        |SELECT doc_id, CAST(j AS INT) AS chunk_id,
        |  CAST(bounds[j] + 1 AS INT) AS start_tok,
        |  CAST(bounds[j + 1] AS INT) AS end_tok,
        |  CAST(bounds[j + 1] - bounds[j] AS INT) AS n_tokens,
        |  md5(array_to_string(list_slice(toks, bounds[j] + 1, bounds[j + 1]), ' ')) AS chunk_md5
        |FROM e ORDER BY doc_id, chunk_id""".stripMargin,
    // the poly-mode boundary rule as a DIRECT w-term power sum per
    // window (the rolling O(1) update is equivalent by modular
    // algebra, spec-proven): per-token hash = first 15 md5 hex digits
    // mod P (P = 2³¹−1), window hash = Σ hp_j·B^(3−j) mod P with
    // B = 1000003, every product mod-reduced termwise so nothing
    // leaves int64; boundary where the window hash ≡ 0 (mod 8)
    "q230_cdc_poly" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |n0 AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 1),
        |b AS (
        |  SELECT doc_id, toks, n,
        |    list_sort(list_distinct(list_concat(
        |      list_filter(list_transform(range(4, greatest(n, 4) + 1), i ->
        |        CASE WHEN i <= n AND
        |          (list_sum(list_transform(range(0, 4), j ->
        |            ((('0x' || substr(md5(toks[i - 3 + j]), 1, 15))::BIGINT % 2147483647)
        |             * ([(1000003::BIGINT * 1000003 % 2147483647) * 1000003 % 2147483647,
        |                 1000003::BIGINT * 1000003 % 2147483647,
        |                 1000003::BIGINT, 1::BIGINT][j + 1])) % 2147483647))
        |           % 2147483647) % 8 = 0
        |        THEN i END), x -> x IS NOT NULL),
        |      [n]))) AS bpos
        |  FROM n0),
        |c AS (SELECT doc_id, toks, list_prepend(0, bpos) AS bounds FROM b),
        |e AS (
        |  SELECT doc_id, toks, bounds,
        |    unnest(range(1, len(bounds))) AS j
        |  FROM c)
        |SELECT doc_id, CAST(j AS INT) AS chunk_id,
        |  CAST(bounds[j] + 1 AS INT) AS start_tok,
        |  CAST(bounds[j + 1] AS INT) AS end_tok,
        |  CAST(bounds[j + 1] - bounds[j] AS INT) AS n_tokens,
        |  md5(array_to_string(list_slice(toks, bounds[j] + 1, bounds[j + 1]), ' ')) AS chunk_md5
        |FROM e ORDER BY doc_id, chunk_id""".stripMargin,
    // full layout-scorecard restatement: min/max scaling, the
    // generated 32-term Morton sum (MortonSql), the same three cell
    // policies, and the same overlap tests; sums cast to BIGINT to
    // match Spark's long aggregates (DuckDB sums into HUGEINT)
    "q142_zorder" ->
      s"""WITH rows_in AS (
        |  SELECT CAST(l_partkey AS BIGINT) AS x, CAST(l_suppkey AS BIGINT) AS y,
        |    CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) AS rk
        |  FROM lineitem WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL),
        |b AS (SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax FROM rows_in),
        |scaled AS (
        |  SELECT rk,
        |    CASE WHEN xmax = xmin THEN 0 ELSE CAST(floor((x - xmin) * 65535.0 / (xmax - xmin)) AS BIGINT) END AS xs,
        |    CASE WHEN ymax = ymin THEN 0 ELSE CAST(floor((y - ymin) * 65535.0 / (ymax - ymin)) AS BIGINT) END AS ys
        |  FROM rows_in CROSS JOIN b),
        |cells AS (
        |  SELECT xs, ys,
        |    ($MortonSql) >> 26 AS cell_z,
        |    xs >> 10 AS cell_linear,
        |    ('0x' || substr(md5(rk), 1, 6))::BIGINT % 64 AS cell_hash,
        |    CASE WHEN xs BETWEEN 29491 AND 36044 AND ys BETWEEN 29491 AND 36044 THEN 1 ELSE 0 END AS m_box,
        |    CASE WHEN ys BETWEEN 29491 AND 36044 THEN 1 ELSE 0 END AS m_band
        |  FROM scaled),
        |st AS (
        |  SELECT 'zorder' AS layout, cell_z AS cell, xs, ys, m_box, m_band FROM cells
        |  UNION ALL
        |  SELECT 'linear', cell_linear, xs, ys, m_box, m_band FROM cells
        |  UNION ALL
        |  SELECT 'hash', cell_hash, xs, ys, m_box, m_band FROM cells),
        |pc AS (
        |  SELECT layout, cell, count(*) AS n_rows,
        |    min(xs) AS xs_min, max(xs) AS xs_max, min(ys) AS ys_min, max(ys) AS ys_max,
        |    sum(m_box) AS n_box, sum(m_band) AS n_band
        |  FROM st GROUP BY 1, 2),
        |sc AS (
        |  SELECT layout, n_rows, n_box, n_band,
        |    CASE WHEN xs_max < 29491 OR xs_min > 36044
        |      OR ys_max < 29491 OR ys_min > 36044 THEN 0 ELSE 1 END AS s_box,
        |    CASE WHEN ys_max < 29491 OR ys_min > 36044 THEN 0 ELSE 1 END AS s_band
        |  FROM pc)
        |SELECT layout, count(*) AS n_cells,
        |  CAST(sum(s_box) AS BIGINT) AS box_cells_scanned,
        |  CAST(sum(s_box * n_rows) AS BIGINT) AS box_rows_scanned,
        |  CAST(sum(n_box) AS BIGINT) AS box_rows_matched,
        |  CAST(sum(s_band) AS BIGINT) AS band_cells_scanned,
        |  CAST(sum(s_band * n_rows) AS BIGINT) AS band_rows_scanned,
        |  CAST(sum(n_band) AS BIGINT) AS band_rows_matched
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-constraint restatement: FILTER counts for the row-local
    // gates (violation = predicate false OR NULL, the conservative
    // coalesce the engine applies), group-count arithmetic for
    // uniqueness, left-join null probes for referential integrity
    "q143_contracts" ->
      """WITH rl AS (
        |  SELECT 'not_null(l_orderkey)' AS "constraint",
        |    count(*) FILTER (WHERE l_orderkey IS NULL) AS violations, count(*) AS n_rows
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'not_null(l_shipdate)',
        |    count(*) FILTER (WHERE l_shipdate IS NULL), count(*) FROM lineitem
        |  UNION ALL
        |  SELECT 'in_set(l_returnflag)',
        |    count(*) FILTER (WHERE NOT coalesce(l_returnflag IN ('A','N','R'), FALSE)),
        |    count(*) FROM lineitem
        |  UNION ALL
        |  SELECT 'in_set(l_linestatus)',
        |    count(*) FILTER (WHERE NOT coalesce(l_linestatus IN ('O','F'), FALSE)),
        |    count(*) FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range(l_discount)',
        |    count(*) FILTER (WHERE NOT coalesce(
        |      l_discount >= CAST(0.0 AS DOUBLE) AND l_discount <= CAST(0.08 AS DOUBLE), FALSE)),
        |    count(*) FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range(l_quantity)',
        |    count(*) FILTER (WHERE NOT coalesce(
        |      l_quantity >= CAST(1.0 AS DOUBLE) AND l_quantity <= CAST(50.0 AS DOUBLE), FALSE)),
        |    count(*) FROM lineitem
        |  UNION ALL
        |  SELECT 'price_positive',
        |    count(*) FILTER (WHERE NOT coalesce(l_extendedprice > CAST(0.0 AS DOUBLE), FALSE)),
        |    count(*) FROM lineitem
        |  UNION ALL
        |  SELECT 'unique(l_orderkey,l_linenumber)',
        |    count(*) - (SELECT count(*) FROM (SELECT 1 AS one FROM lineitem GROUP BY l_orderkey, l_linenumber)),
        |    count(*) FROM lineitem
        |  UNION ALL
        |  SELECT 'ref_integrity(l_orderkey)',
        |    count(*) FILTER (WHERE o.o_orderkey IS NULL),
        |    count(*)
        |  FROM (SELECT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL) l
        |  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o ON l.l_orderkey = o.o_orderkey
        |  UNION ALL
        |  SELECT 'ref_integrity(l_partkey)',
        |    count(*) FILTER (WHERE p.p_partkey IS NULL),
        |    count(*)
        |  FROM (SELECT l_partkey FROM lineitem WHERE l_partkey IS NOT NULL) l
        |  LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p ON l.l_partkey = p.p_partkey)
        |SELECT "constraint", CAST(violations AS BIGINT) AS violations,
        |  CAST(n_rows AS BIGINT) AS n_rows,
        |  CASE WHEN violations = 0 THEN 1 ELSE 0 END AS passed
        |FROM rl ORDER BY "constraint"""".stripMargin,
    // same additive decomposition restated: weekday = epoch-day mod 7
    // (pure arithmetic, no engine dayofweek convention), z rounded to
    // 4 decimals BEFORE the threshold so the verdict is exact
    "q144_seasonal" ->
      """WITH daily0 AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    round(sum(value), 2) AS value
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily0),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT DISTINCT event_type FROM daily0) CROSS JOIN span),
        |daily AS (
        |  SELECT s.event_type, s.day, coalesce(d.value, 0.0) AS value
        |  FROM spine s LEFT JOIN daily0 d
        |    ON d.event_type = s.event_type AND d.day = s.day),
        |t AS (
        |  SELECT *, avg(value) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend,
        |    CAST(day - DATE '1970-01-01' AS BIGINT) % 7 AS dow
        |  FROM daily),
        |d2 AS (SELECT *, value - trend AS detr FROM t),
        |s AS (SELECT *,
        |  avg(detr) OVER (PARTITION BY event_type, dow) AS seasonal FROM d2),
        |r AS (SELECT *, detr - seasonal AS residual FROM s),
        |sd AS (SELECT *,
        |  stddev_samp(residual) OVER (PARTITION BY event_type) AS sd FROM r),
        |z AS (SELECT *,
        |  round(CASE WHEN sd IS NULL OR sd = 0 THEN 0.0 ELSE residual / sd END, 4) AS zz
        |  FROM sd)
        |SELECT event_type, day, value,
        |  round(trend, 4) AS trend, round(seasonal, 4) AS seasonal,
        |  round(residual, 4) AS residual, zz AS z,
        |  CASE WHEN abs(zz) > 2.0 THEN 1 ELSE 0 END AS is_anomaly
        |FROM z ORDER BY event_type, day""".stripMargin,
    // textbook correlated formulation: inequality join clicks≤purchase
    // within the window, row_number DESC picks the last touch, LEFT
    // join preserves organic purchases; latency in µs integer
    // arithmetic before the one rounded avg
    "q145_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, value,
        |    date_trunc('microseconds', ts) AS ts
        |  FROM events),
        |p AS (SELECT user_id, event_id, ts, value FROM e WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS cts, max(event_id) AS click_id
        |  FROM e WHERE event_type = 'click' GROUP BY 1, 2),
        |m AS (
        |  SELECT p.user_id, p.event_id, c.cts, c.click_id,
        |    row_number() OVER (PARTITION BY p.user_id, p.event_id ORDER BY c.cts DESC) AS rn
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.cts <= p.ts AND c.cts >= p.ts - INTERVAL 1 DAY),
        |best AS (SELECT user_id, event_id, cts, click_id FROM m WHERE rn = 1),
        |a AS (
        |  SELECT p.user_id, p.event_id, p.ts, p.value, b.cts, b.click_id
        |  FROM p LEFT JOIN best b ON p.user_id = b.user_id AND p.event_id = b.event_id)
        |SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |  count(*) AS n_purchases,
        |  count(click_id) AS n_attributed,
        |  round(sum(CASE WHEN click_id IS NOT NULL THEN value ELSE 0 END), 2) AS attributed_value,
        |  round(sum(CASE WHEN click_id IS NULL THEN value ELSE 0 END), 2) AS organic_value,
        |  round(avg(CASE WHEN click_id IS NOT NULL
        |    THEN date_diff('microsecond', cts, ts) / 60000000.0 END), 4) AS avg_latency_min
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin,
    // the full resampling restated draw-for-draw: 48-bit md5 uniform,
    // hard-literal Poisson(1) CDF thresholds, replica means rounded to
    // 6 before rank selection, CI = order statistics at ceil(q·n_rep)
    "q146_bootstrap_ci" ->
      """WITH r AS (
        |  SELECT lang, CAST(n_chars AS DOUBLE) AS x, CAST(doc_id AS VARCHAR) AS rid
        |  FROM documents WHERE n_chars IS NOT NULL),
        |reps AS (SELECT unnest(range(0, 200)) AS rep),
        |w0 AS (
        |  SELECT lang, x, rep,
        |    ('0x' || substr(md5(rid || ':' || CAST(rep AS VARCHAR)), 1, 12))::BIGINT
        |      / 281474976710656.0 AS u
        |  FROM r CROSS JOIN reps),
        |w AS (
        |  SELECT lang, x, rep, CAST(
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |         WHEN u < 0.7357588823428847 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.9810118431238462 THEN 3
        |         WHEN u < 0.9963401531726563 THEN 4
        |         WHEN u < 0.9994058151824183 THEN 5
        |         WHEN u < 0.9999167588507119 THEN 6
        |         WHEN u < 0.9999897508033253 THEN 7
        |         WHEN u < 0.9999988852520038 THEN 8
        |         ELSE 9 END AS DOUBLE) AS w
        |  FROM w0),
        |rm AS (
        |  SELECT lang, rep, sum(w * x) AS wx, sum(w) AS wsum
        |  FROM w GROUP BY 1, 2),
        |rm2 AS (SELECT lang, rep, round(wx / wsum, 6) AS m FROM rm WHERE wsum > 0),
        |rk AS (
        |  SELECT lang, rep, m,
        |    row_number() OVER (PARTITION BY lang ORDER BY m, rep) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n_rep
        |  FROM rm2),
        |ci AS (
        |  SELECT lang,
        |    round(max(CASE WHEN rk = CAST(ceil(n_rep * 0.025) AS BIGINT) THEN m END), 4) AS ci_lo,
        |    round(max(CASE WHEN rk = CAST(ceil(n_rep * 0.975) AS BIGINT) THEN m END), 4) AS ci_hi
        |  FROM rk GROUP BY 1),
        |pt AS (SELECT lang, count(*) AS n, round(avg(x), 4) AS mean FROM r GROUP BY 1)
        |SELECT pt.lang, n, mean, ci_lo, ci_hi
        |FROM pt JOIN ci USING (lang) ORDER BY pt.lang""".stripMargin,
    // lead() over (user, ts, event_id) restated, row-normalized
    "q147_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, date_trunc('microseconds', ts) AS ts
        |  FROM events),
        |p AS (
        |  SELECT event_type AS state,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_state
        |  FROM e),
        |c AS (
        |  SELECT state, next_state, count(*) AS n
        |  FROM p WHERE next_state IS NOT NULL GROUP BY 1, 2),
        |t AS (
        |  SELECT state, next_state, n,
        |    sum(n) OVER (PARTITION BY state) AS state_total
        |  FROM c)
        |SELECT state, next_state, n, CAST(state_total AS BIGINT) AS state_total,
        |  round(CAST(n AS DOUBLE) / state_total, 4) AS p
        |FROM t ORDER BY state, next_state""".stripMargin,
    // cell-grid + leave-fold-out smoothing restated; md5 folds identical
    "q148_target_encoding" ->
      """WITH b AS (
        |  SELECT source AS category,
        |    CASE WHEN lang IS NULL THEN NULL
        |         WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 5 AS fold
        |  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL),
        |cells AS (
        |  SELECT category, fold, count(*) AS n_fold, sum(y) AS s_fold
        |  FROM b GROUP BY 1, 2),
        |tot AS (SELECT sum(n_fold) AS n_all, sum(s_fold) AS s_all FROM cells),
        |cat AS (
        |  SELECT category, fold, n_fold, s_fold,
        |    sum(n_fold) OVER (PARTITION BY category) AS n_cat,
        |    sum(s_fold) OVER (PARTITION BY category) AS s_cat,
        |    sum(n_fold) OVER (PARTITION BY fold) AS n_in_fold,
        |    sum(s_fold) OVER (PARTITION BY fold) AS s_in_fold
        |  FROM cells),
        |p AS (
        |  SELECT *, (s_all - s_in_fold) / (n_all - n_in_fold) AS prior
        |  FROM cat CROSS JOIN tot)
        |SELECT category, fold, n_fold,
        |  round((s_cat - s_fold + 10.0 * prior) / (n_cat - n_fold + 10.0), 6) AS encoding,
        |  round(prior, 6) AS prior
        |FROM p ORDER BY category, fold""".stripMargin,
    // unnest restatement of the vec_sum buffer fold; same
    // sum/sum-of-squares algebra, population variance clamped at 0
    "q149_embed_stats" ->
      """WITH e AS (
        |  SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |m AS (
        |  SELECT dim - 1 AS dim, count(*) AS n,
        |    sum(CAST(v AS DOUBLE)) AS s1,
        |    sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS s2
        |  FROM e GROUP BY 1)
        |SELECT dim, n, round(s1 / n, 6) AS mean,
        |  round(sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)), 6) AS std
        |FROM m ORDER BY dim""".stripMargin,
    // edges = the q127 selection rule (k = ceil(q·n) order statistic),
    // bin = #edges strictly below v (one row per q — duplicate edge
    // VALUES count twice, matching the engine's indicator fold), then
    // the same smoothed WOE/IV algebra on the cell frame
    "q150_woe_bins" ->
      """WITH rows_in AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS v,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL),
        |n AS (SELECT count(*) AS n FROM rows_in),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM rows_in),
        |q(q) AS (VALUES (CAST(0.1 AS DOUBLE)), (CAST(0.2 AS DOUBLE)),
        |  (CAST(0.3 AS DOUBLE)), (CAST(0.4 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
        |  (CAST(0.6 AS DOUBLE)), (CAST(0.7 AS DOUBLE)), (CAST(0.8 AS DOUBLE)),
        |  (CAST(0.9 AS DOUBLE))),
        |k AS (SELECT q, CAST(ceil(q * n) AS BIGINT) AS k FROM n CROSS JOIN q),
        |edges AS (SELECT r.v AS edge FROM k JOIN r ON r.rk = k.k),
        |b AS (
        |  SELECT v, y,
        |    (SELECT count(*) FROM edges e WHERE b0.v > e.edge) AS bin
        |  FROM rows_in b0),
        |cells AS (
        |  SELECT bin, count(*) AS n, sum(y) AS n_good,
        |    count(*) - sum(y) AS n_bad,
        |    round(min(v), 4) AS v_min, round(max(v), 4) AS v_max
        |  FROM b GROUP BY 1),
        |tot AS (SELECT sum(n_good) AS g_all, sum(n_bad) AS b_all FROM cells),
        |w AS (
        |  SELECT *, (n_good + 0.5) / g_all AS g_rate,
        |    (n_bad + 0.5) / b_all AS b_rate
        |  FROM cells CROSS JOIN tot)
        |SELECT CAST(bin AS INT) AS bin, n,
        |  CAST(n_good AS BIGINT) AS n_good, CAST(n_bad AS BIGINT) AS n_bad,
        |  v_min, v_max,
        |  round(ln(g_rate / b_rate), 6) AS woe,
        |  round((g_rate - b_rate) * ln(g_rate / b_rate), 6) AS iv
        |FROM w ORDER BY bin""".stripMargin,
    // same degree-ordered orientation ((d, id) row comparison) and
    // one-per-triangle closure; per-node census via 3-way unnest
    "q151_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |deg AS (
        |  SELECT node, count(*) AS d FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
        |         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS t,
        |         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS dt
        |  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
        |tri AS (
        |  SELECT w1.s AS a, w1.t AS b, w2.t AS c
        |  FROM o w1 JOIN o w2 ON w1.s = w2.s AND (w1.dt, w1.t) < (w2.dt, w2.t)
        |  JOIN o w3 ON w3.s = w1.t AND w3.t = w2.t),
        |pn AS (
        |  SELECT node, count(*) AS n_tri FROM (
        |    SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri) GROUP BY 1)
        |SELECT deg.node, deg.d, CAST(coalesce(pn.n_tri, 0) AS BIGINT) AS n_tri,
        |  CASE WHEN deg.d >= 2
        |    THEN round(2.0 * coalesce(pn.n_tri, 0) / (deg.d * (deg.d - 1)), 6)
        |    ELSE 0.0 END AS clustering
        |FROM deg LEFT JOIN pn ON pn.node = deg.node ORDER BY deg.node""".stripMargin,
    // within-basket pair counts with HAVING support prune, both rule
    // directions, same support/confidence/lift algebra
    "q152_assoc_rules" ->
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |sz AS (SELECT basket FROM it GROUP BY basket HAVING count(*) <= 1000),
        |s2 AS (SELECT it.* FROM it JOIN sz USING (basket)),
        |nb AS (SELECT count(DISTINCT basket) AS n_baskets FROM s2),
        |itn AS (SELECT item, count(*) AS n_item FROM s2 GROUP BY 1),
        |pc AS (
        |  SELECT a.item AS a, b.item AS b, count(*) AS n_ab
        |  FROM s2 a JOIN s2 b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |dr AS (
        |  SELECT a AS antecedent, b AS consequent, n_ab FROM pc
        |  UNION ALL SELECT b, a, n_ab FROM pc)
        |SELECT antecedent, consequent, n_ab,
        |  round(n_ab / CAST(n_baskets AS DOUBLE), 6) AS support,
        |  round(n_ab / CAST(n_a AS DOUBLE), 6) AS confidence,
        |  round(CAST(n_ab AS DOUBLE) * n_baskets / (n_a * n_b), 6) AS lift
        |FROM dr
        |JOIN (SELECT item, n_item AS n_a FROM itn) x ON x.item = dr.antecedent
        |JOIN (SELECT item, n_item AS n_b FROM itn) y ON y.item = dr.consequent
        |CROSS JOIN nb
        |ORDER BY antecedent, consequent""".stripMargin,
    // explicit-moments restatement: pooled theta, row-local CUPED
    // adjustment, per-arm sum/square algebra, large-sample z literal
    "q153_ab_cuped" ->
      """WITH e AS (
        |  SELECT user_id, value, date_trunc('microseconds', ts) AS ts FROM events),
        |u AS (
        |  SELECT user_id,
        |    round(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |      THEN value ELSE 0 END), 6) AS pre,
        |    round(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN value ELSE 0 END), 6) AS post,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 6))::BIGINT % 2 AS INT) AS arm
        |  FROM e GROUP BY user_id),
        |m AS (
        |  SELECT count(*) AS n, sum(pre) AS sp, sum(post) AS so,
        |    sum(pre * pre) AS spp, sum(pre * post) AS spo
        |  FROM u),
        |t AS (
        |  SELECT n,
        |    CASE WHEN spp - sp * sp / n = 0 THEN 0.0
        |      ELSE (spo - sp * so / n) / (spp - sp * sp / n) END AS theta,
        |    sp / n AS mean_pre
        |  FROM m),
        |a AS (
        |  SELECT arm, post, post - theta * (pre - mean_pre) AS y
        |  FROM u CROSS JOIN t),
        |ar AS (
        |  SELECT arm, count(*) AS na, sum(post) AS so_a,
        |    sum(post * post) AS soo_a, sum(y) AS sy_a, sum(y * y) AS syy_a
        |  FROM a GROUP BY 1),
        |ar2 AS (
        |  SELECT arm, na, so_a / na AS m_raw,
        |    (soo_a - so_a * so_a / na) / (na - 1) AS v_raw,
        |    sy_a / na AS m_adj,
        |    (syy_a - sy_a * sy_a / na) / (na - 1) AS v_adj
        |  FROM ar),
        |p AS (
        |  SELECT
        |    max(CASE WHEN arm = 1 THEN na END) AS n_t,
        |    max(CASE WHEN arm = 0 THEN na END) AS n_c,
        |    max(CASE WHEN arm = 1 THEN m_raw END) - max(CASE WHEN arm = 0 THEN m_raw END) AS effect_raw,
        |    sqrt(max(CASE WHEN arm = 1 THEN v_raw END) / max(CASE WHEN arm = 1 THEN na END)
        |       + max(CASE WHEN arm = 0 THEN v_raw END) / max(CASE WHEN arm = 0 THEN na END)) AS se_raw,
        |    max(CASE WHEN arm = 1 THEN m_adj END) - max(CASE WHEN arm = 0 THEN m_adj END) AS effect_cuped,
        |    sqrt(max(CASE WHEN arm = 1 THEN v_adj END) / max(CASE WHEN arm = 1 THEN na END)
        |       + max(CASE WHEN arm = 0 THEN v_adj END) / max(CASE WHEN arm = 0 THEN na END)) AS se_cuped,
        |    1.0 - (max(CASE WHEN arm = 1 THEN v_adj END) + max(CASE WHEN arm = 0 THEN v_adj END))
        |        / (max(CASE WHEN arm = 1 THEN v_raw END) + max(CASE WHEN arm = 0 THEN v_raw END)) AS var_reduction
        |  FROM ar2)
        |SELECT n_t, n_c,
        |  round(effect_raw, 4) AS effect_raw, round(se_raw, 4) AS se_raw,
        |  round(effect_cuped, 4) AS effect_cuped, round(se_cuped, 4) AS se_cuped,
        |  round(effect_cuped / se_cuped, 4) AS t_cuped,
        |  round(effect_cuped - 1.959963984540054 * se_cuped, 4) AS ci_lo,
        |  round(effect_cuped + 1.959963984540054 * se_cuped, 4) AS ci_hi,
        |  round(var_reduction, 4) AS var_reduction,
        |  CASE WHEN coalesce(n_t, 0) >= 2 AND coalesce(n_c, 0) >= 2
        |    THEN 1 ELSE 0 END AS valid
        |FROM p""".stripMargin,
    // lag alignment via DATE + INTEGER, explicit-moments Pearson,
    // best-lag over the rounded r (ties flag both, same both engines)
    "q154_leadlag" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    round(sum(value), 2) AS value
        |  FROM events GROUP BY 1, 2),
        |lags(lag) AS (VALUES (-3), (-2), (-1), (0), (1), (2), (3)),
        |al AS (
        |  SELECT a.event_type AS key_a, b.event_type AS key_b, l.lag,
        |    a.value AS va, b.value AS vb
        |  FROM daily a CROSS JOIN lags l
        |  JOIN daily b ON b.day = a.day + l.lag AND a.event_type < b.event_type),
        |cells AS (
        |  SELECT key_a, key_b, lag, count(*) AS n,
        |    sum(va) AS sa, sum(vb) AS sb, sum(va * va) AS saa,
        |    sum(vb * vb) AS sbb, sum(va * vb) AS sab
        |  FROM al GROUP BY 1, 2, 3),
        |r0 AS (
        |  SELECT *, sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)) AS den
        |  FROM cells),
        |r1 AS (
        |  SELECT key_a, key_b, lag, n,
        |    round(CASE WHEN den = 0 OR den IS NULL THEN 0.0
        |      ELSE (n * sab - sa * sb) / den END, 6) AS r
        |  FROM r0),
        |b2 AS (
        |  SELECT *, max(abs(r)) OVER (PARTITION BY key_a, key_b) AS best_abs
        |  FROM r1)
        |SELECT key_a, key_b, lag, n, r,
        |  CASE WHEN abs(r) = best_abs THEN 1 ELSE 0 END AS is_best
        |FROM b2 ORDER BY key_a, key_b, lag""".stripMargin,
    // batch daily restatement of the streaming gate (violation =
    // predicate false OR NULL, same conservative coalesce)
    "q155_stream_contracts" ->
      """WITH e AS (
        |  SELECT user_id, event_type, value, date_trunc('microseconds', ts) AS ts
        |  FROM events)
        |SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |  count(*) AS n_rows,
        |  count(*) FILTER (WHERE NOT coalesce(value >= 0.0, FALSE)) AS v_value_negative,
        |  count(*) FILTER (WHERE NOT coalesce(value <= 50.0, FALSE)) AS v_value_cap,
        |  count(*) FILTER (WHERE NOT coalesce(
        |    event_type IN ('click','view','purchase','signup','error'), FALSE)) AS v_bad_type,
        |  count(*) FILTER (WHERE user_id IS NULL) AS v_null_user,
        |  CASE WHEN count(*) FILTER (WHERE NOT coalesce(value >= 0.0, FALSE)) = 0
        |    AND count(*) FILTER (WHERE NOT coalesce(value <= 50.0, FALSE)) = 0
        |    AND count(*) FILTER (WHERE NOT coalesce(
        |      event_type IN ('click','view','purchase','signup','error'), FALSE)) = 0
        |    AND count(*) FILTER (WHERE user_id IS NULL) = 0
        |    THEN 1 ELSE 0 END AS passed
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    // both snapshots' manifests restated: same md5 bucket, same 48-bit
    // row fingerprint over key||text||lang, BIT_XOR per bucket + root
    "q156_manifest" ->
      """WITH added AS (
        |  SELECT doc_id + 10000000 AS doc_id, text, lang
        |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 5)),
        |neu AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 4 THEN text || ' [rev2]' ELSE text END AS text,
        |    lang
        |  FROM documents WHERE doc_id % 10 <> 3
        |  UNION ALL SELECT doc_id, text, lang FROM added),
        |o_rows AS (
        |  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 64 AS bucket,
        |    ('0x' || substr(md5('V' || CAST(doc_id AS VARCHAR) || chr(1) || CASE WHEN text IS NULL THEN 'N' ELSE 'V' || text END || chr(1) || CASE WHEN lang IS NULL THEN 'N' ELSE 'V' || lang END), 1, 12))::BIGINT AS h
        |  FROM documents),
        |n_rows_t AS (
        |  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 64 AS bucket,
        |    ('0x' || substr(md5('V' || CAST(doc_id AS VARCHAR) || chr(1) || CASE WHEN text IS NULL THEN 'N' ELSE 'V' || text END || chr(1) || CASE WHEN lang IS NULL THEN 'N' ELSE 'V' || lang END), 1, 12))::BIGINT AS h
        |  FROM neu),
        |ob AS (SELECT bucket, count(*) AS n_rows, bit_xor(h) AS digest FROM o_rows GROUP BY 1),
        |nb AS (SELECT bucket, count(*) AS n_rows, bit_xor(h) AS digest FROM n_rows_t GROUP BY 1),
        |om AS (SELECT * FROM ob
        |  UNION ALL SELECT -1, CAST(sum(n_rows) AS BIGINT), bit_xor(digest) FROM ob),
        |nm AS (SELECT * FROM nb
        |  UNION ALL SELECT -1, CAST(sum(n_rows) AS BIGINT), bit_xor(digest) FROM nb)
        |SELECT coalesce(om.bucket, nm.bucket) AS bucket,
        |  coalesce(om.n_rows, 0) AS n_old, coalesce(nm.n_rows, 0) AS n_new,
        |  coalesce(om.digest, 0) AS digest_old, coalesce(nm.digest, 0) AS digest_new,
        |  CASE WHEN coalesce(om.n_rows, 0) <> coalesce(nm.n_rows, 0)
        |    OR coalesce(om.digest, 0) <> coalesce(nm.digest, 0) THEN 1 ELSE 0 END AS changed
        |FROM om FULL OUTER JOIN nm ON om.bucket = nm.bucket
        |ORDER BY bucket""".stripMargin,
    // same three lags + start padding + share arithmetic
    "q157_conversion_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, date_trunc('microseconds', ts) AS ts
        |  FROM events),
        |l AS (
        |  SELECT event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1,
        |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2,
        |    lag(event_type, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p3
        |  FROM e),
        |paths AS (
        |  SELECT coalesce(p3, '(start)') || ' > ' || coalesce(p2, '(start)')
        |    || ' > ' || coalesce(p1, '(start)') AS path, count(*) AS n
        |  FROM l WHERE event_type = 'purchase' GROUP BY 1),
        |tot AS (SELECT sum(n) AS total FROM paths)
        |SELECT path, n, round(n / CAST(total AS DOUBLE), 6) AS share
        |FROM paths CROSS JOIN tot ORDER BY path""".stripMargin,
    // same drawup restatement: running sum & running min windows over
    // the planted-shift daily series, baseline moments from the first
    // 14 ranked days, s rounded before the alarm compare
    "q158_cusum" ->
      """WITH daily0 AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |daily AS (
        |  SELECT event_type, day,
        |    CAST(round(cents * CASE WHEN event_type = 'purchase'
        |      AND day >= DATE '2024-01-22' THEN 1.3 ELSE 1.0 END) AS BIGINT)
        |      / 100.0 AS value
        |  FROM daily0),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
        |    CAST(round(value * 10000) AS BIGINT) AS uu
        |  FROM daily),
        |b0 AS (
        |  SELECT event_type, CAST(sum(uu) AS BIGINT) AS sv,
        |    sum(CAST(uu AS DECIMAL(38,0)) * CAST(uu AS DECIMAL(38,0))) AS svv,
        |    count(*) AS n_base
        |  FROM r WHERE rn <= 14 GROUP BY 1 HAVING count(*) = 14),
        |b1 AS (
        |  SELECT event_type,
        |    CAST(sv AS DOUBLE) / 10000.0 / n_base AS mu,
        |    sqrt(CAST(CAST(n_base AS DECIMAL(38,0)) * svv
        |        - CAST(sv AS DECIMAL(38,0)) * CAST(sv AS DECIMAL(38,0))
        |        AS DOUBLE)
        |      / (n_base * (n_base - 1))) / 10000.0 AS sigma
        |  FROM b0),
        |b AS (SELECT * FROM b1 WHERE sigma IS NOT NULL AND sigma > 0),
        |c0 AS (
        |  SELECT r.event_type, r.day, r.value, b.mu, b.sigma,
        |    CAST(sum(uu) OVER (PARTITION BY r.event_type ORDER BY day)
        |      AS DOUBLE) / 10000.0
        |      - rn * (b.mu + 0.5 * b.sigma) AS cs
        |  FROM r JOIN b ON b.event_type = r.event_type),
        |c AS (
        |  SELECT *, min(least(cs, 0.0))
        |    OVER (PARTITION BY event_type ORDER BY day) AS cmin
        |  FROM c0),
        |f AS (SELECT *, round((cs - cmin) / sigma, 4) AS s FROM c)
        |SELECT event_type, day, value, round(mu, 4) AS mu, s,
        |  CASE WHEN s > 4.0 THEN 1 ELSE 0 END AS alarm
        |FROM f ORDER BY event_type, day""".stripMargin,
    // WAU restated as the textbook distinct-over-trailing-range (the
    // formulation the engine's explode trick replaces), DAU exact
    "q159_active_users" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        |wau AS (
        |  SELECT d.day,
        |    (SELECT count(DISTINCT u.user_id) FROM ud u
        |     WHERE u.day <= d.day AND u.day >= d.day - 6) AS wau
        |  FROM dau d)
        |SELECT dau.day, dau.dau, wau.wau,
        |  round(dau.dau / CAST(wau.wau AS DOUBLE), 4) AS stickiness
        |FROM dau JOIN wau ON wau.day = dau.day
        |ORDER BY dau.day""".stripMargin,
    // identical life-table algebra: exited-before running sum, at-risk
    // difference, exp of running log sum (product-limit)
    "q160_kaplan_meier" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |ud AS (SELECT user_id, min(day) AS fd, max(day) AS ld FROM e GROUP BY 1),
        |fe AS (
        |  SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS err_day
        |  FROM events WHERE event_type = 'error' GROUP BY 1),
        |units AS (
        |  SELECT CAST(CASE WHEN err_day IS NOT NULL THEN err_day - fd
        |    ELSE ld - fd END AS BIGINT) AS t,
        |    CASE WHEN err_day IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM ud LEFT JOIN fe USING (user_id)),
        |tab AS (
        |  SELECT t, CAST(sum(ev) AS BIGINT) AS n_events,
        |    CAST(sum(1 - ev) AS BIGINT) AS n_censored
        |  FROM units GROUP BY 1),
        |tot AS (SELECT sum(n_events + n_censored) AS n_total FROM tab),
        |rk AS (
        |  SELECT *, coalesce(sum(n_events + n_censored)
        |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS exited
        |  FROM tab CROSS JOIN tot),
        |ar AS (SELECT *, n_total - exited AS n_at_risk FROM rk),
        |lg AS (
        |  SELECT *, CASE WHEN n_events > 0 AND n_events < n_at_risk
        |    THEN ln(1.0 - n_events / CAST(n_at_risk AS DOUBLE)) ELSE 0.0 END AS log_term,
        |    CASE WHEN n_events = n_at_risk THEN 1 ELSE 0 END AS zf
        |  FROM ar)
        |SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk, n_events, n_censored,
        |  CASE WHEN max(zf) OVER (ORDER BY t) = 1 THEN 0.0
        |    ELSE round(exp(sum(log_term) OVER (ORDER BY t)), 4) END AS survival
        |FROM lg ORDER BY t""".stripMargin,
    // cents-integer first digit, identical chi-square algebra
    "q161_benford" ->
      """WITH rows_in AS (
        |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND CAST(round(l_extendedprice * 100) AS BIGINT) > 0),
        |cells AS (SELECT digit, count(*) AS n FROM rows_in GROUP BY 1),
        |tot AS (SELECT sum(n) AS n_total FROM cells),
        |p AS (
        |  SELECT *, n / CAST(n_total AS DOUBLE) AS op,
        |    log10(1.0 + 1.0 / digit) AS bp
        |  FROM cells CROSS JOIN tot),
        |p2 AS (SELECT *, (op - bp) * (op - bp) / bp * n_total AS ct FROM p),
        |c2 AS (SELECT round(sum(ct), 4) AS chi2 FROM p2)
        |SELECT digit, n, round(op, 6) AS observed_p, round(bp, 6) AS benford_p,
        |  round(ct, 4) AS chi2_term, chi2
        |FROM p2 CROSS JOIN c2 ORDER BY digit""".stripMargin,
    // same ranked closed form, ties broken by user id
    "q162_gini" ->
      """WITH u AS (
        |  SELECT event_type AS g, user_id AS uu, round(sum(value), 6) AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT g, uu, v, row_number() OVER (PARTITION BY g ORDER BY v, uu) AS rk
        |  FROM u WHERE v IS NOT NULL AND v >= 0)
        |SELECT g, count(*) AS n_units, round(sum(v), 2) AS total,
        |  round(2.0 * sum(rk * v) / (count(*) * sum(v))
        |    - (count(*) + 1.0) / count(*), 6) AS gini
        |FROM r GROUP BY g ORDER BY g""".stripMargin,
    // within-group pair slopes, ceil(n/2) order statistic
    "q163_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type AS g, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    round(sum(value), 2) AS v
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT g, CAST(day - DATE '1970-01-01' AS DOUBLE) AS x, v FROM daily),
        |s AS (
        |  SELECT l.g, (b.v - l.v) / (b.x - l.x) AS slope
        |  FROM a l JOIN a b ON l.g = b.g AND l.x < b.x),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY g ORDER BY slope) AS rk,
        |    count(*) OVER (PARTITION BY g) AS n_pairs
        |  FROM s)
        |SELECT g, n_pairs, round(slope, 6) AS slope
        |FROM r WHERE rk = CAST(ceil(n_pairs / 2.0) AS BIGINT) ORDER BY g""".stripMargin,
    // q145's attribution CTE at row level + the q127 selection rule
    "q164_latency_quantiles" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, date_trunc('microseconds', ts) AS ts
        |  FROM events),
        |p AS (SELECT user_id, event_id, ts FROM e WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS cts, max(event_id) AS click_id
        |  FROM e WHERE event_type = 'click' GROUP BY 1, 2),
        |m AS (
        |  SELECT p.user_id, p.event_id, p.ts, c.cts,
        |    row_number() OVER (PARTITION BY p.user_id, p.event_id ORDER BY c.cts DESC) AS rn
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.cts <= p.ts AND c.cts >= p.ts - INTERVAL 1 DAY),
        |lat AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    date_diff('microsecond', cts, ts) / 60000000.0 AS v
        |  FROM m WHERE rn = 1),
        |n AS (SELECT day, count(*) AS n FROM lat GROUP BY 1),
        |r AS (SELECT day, v, row_number() OVER (PARTITION BY day ORDER BY v) AS rk FROM lat),
        |q(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
        |                (CAST(0.99 AS DOUBLE))),
        |k AS (SELECT day, q, CAST(ceil(q * n) AS BIGINT) AS k FROM n CROSS JOIN q)
        |SELECT k.day, k.q, round(r.v, 4) AS value
        |FROM k JOIN r ON r.day = k.day AND r.rk = k.k
        |ORDER BY k.day, k.q""".stripMargin,
    // same integer week arithmetic, cumulative window over cells
    "q165_cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, value,
        |    CAST(floor((CAST(date_trunc('day', ts) AS DATE) - DATE '2024-01-01') / 7.0) AS INT) AS week
        |  FROM events),
        |fw AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1),
        |sz AS (SELECT cohort_week, count(*) AS n_users FROM fw GROUP BY 1),
        |cells AS (
        |  SELECT f.cohort_week, e.week - f.cohort_week AS week_offset,
        |    round(sum(e.value), 2) AS revenue
        |  FROM ev e JOIN fw f USING (user_id)
        |  WHERE e.event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.cohort_week, c.week_offset, s.n_users, c.revenue,
        |  round(sum(c.revenue) OVER (PARTITION BY c.cohort_week ORDER BY c.week_offset)
        |    / s.n_users, 4) AS cum_ltv
        |FROM cells c JOIN sz s USING (cohort_week)
        |ORDER BY c.cohort_week, c.week_offset""".stripMargin,
    // the full robust-forecast pipeline restated: rounded Theil-Sen
    // slope, median intercept, weekday mean residuals, horizon spine
    "q166_forecast" ->
      """WITH daily AS (
        |  SELECT event_type AS g, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    round(sum(value), 2) AS v
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT g, day, CAST(day - DATE '1970-01-01' AS DOUBLE) AS x, v FROM daily),
        |s0 AS (
        |  SELECT l.g, (b.v - l.v) / (b.x - l.x) AS slope
        |  FROM a l JOIN a b ON l.g = b.g AND l.x < b.x),
        |sl0 AS (
        |  SELECT *, row_number() OVER (PARTITION BY g ORDER BY slope) AS rk,
        |    count(*) OVER (PARTITION BY g) AS np
        |  FROM s0),
        |sl AS (SELECT g, round(slope, 6) AS slope FROM sl0
        |  WHERE rk = CAST(ceil(np / 2.0) AS BIGINT)),
        |r AS (
        |  SELECT a.g, a.x, a.v, sl.slope, a.v - sl.slope * a.x AS r0
        |  FROM a JOIN sl USING (g)),
        |i0 AS (
        |  SELECT *, row_number() OVER (PARTITION BY g ORDER BY r0) AS rk,
        |    count(*) OVER (PARTITION BY g) AS n
        |  FROM r),
        |ic AS (SELECT g, r0 AS intercept FROM i0
        |  WHERE rk = CAST(ceil(n / 2.0) AS BIGINT)),
        |se AS (
        |  SELECT r.g, CAST(r.x AS BIGINT) % 7 AS dow,
        |    round(avg(r.v - (ic.intercept + r.slope * r.x)), 6) AS seasonal
        |  FROM r JOIN ic USING (g) GROUP BY 1, 2),
        |ld AS (SELECT g, max(day) AS last_day FROM a GROUP BY 1),
        |sp AS (
        |  SELECT g, CAST(h AS INT) AS h, last_day + CAST(h AS INT) AS day
        |  FROM ld CROSS JOIN (SELECT unnest(range(1, 8)) AS h)),
        |sp2 AS (
        |  SELECT g, h, day, CAST(day - DATE '1970-01-01' AS DOUBLE) AS x,
        |    CAST(day - DATE '1970-01-01' AS BIGINT) % 7 AS dow
        |  FROM sp)
        |SELECT sp2.g, sp2.h, sp2.day,
        |  round(ic.intercept + sl.slope * sp2.x + coalesce(se.seasonal, 0.0), 4) AS yhat
        |FROM sp2 JOIN sl USING (g) JOIN ic USING (g)
        |LEFT JOIN se ON se.g = sp2.g AND se.dow = sp2.dow
        |ORDER BY sp2.g, sp2.h""".stripMargin
  )
}

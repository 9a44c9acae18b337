package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.{Dedup, Graph, Hll, Similarity}
import graft.streaming.StreamingOps
import graft.plans.Pin

/** Round-10 tranche: preference-graph intransitivity (q252), per-source
  * boilerplate removal (q253), margin-based bitext mining (q254), and
  * four more classic TPC-H plan shapes this schema supports —
  * order-count distribution (Q13 → q255), profit by nation/year
  * (Q9 → q256), dominant-share suppliers (Q20's decorrelation → q257),
  * and top-revenue-per-quarter with exact tie semantics (Q15 → q258).
  * Every query carries a FULL DuckDB hash oracle.
  *
  * Money discipline (the q250/q232 rule): revenue/profit terms are
  * computed in INTEGER units of 1e-4 dollars — extendedprice and
  * discount are 2-decimal doubles, so round(price·100)·(100 − disc·100)
  * is integer-exact; one division at the end. */
object MiningQueries {

  /** Directed preference-cycle census ([[Graph.directedCycleCensus]]):
    * "followed-by" edges from consecutive line numbers within each
    * order (a weak preference signal), majority-direction election per
    * pair with support ≥ 2 ([[Graph.electMajorityEdges]]), then the
    * cyclic-vs-transitive triangle census — the intransitivity audit
    * run on pairwise-preference data before fitting any ranking model
    * (a→b→c→a is unrealizable by ANY total order). Output: one row
    * per distinct cycle (canonical rotation), with the census totals
    * and the planted guarantee beside it.
    *
    * Planted: six 2-line orders (negative keys) voting the 3-cycle
    * (-101 → -102 → -103 → -101) twice per edge — it must survive the
    * support prune and appear as the canonical row (-103, -101, -102).
    *
    * Scale: consecutive-pair extraction is LINEAR in basket size (not
    * the quadratic all-pairs of q172 — no cap needed); the election is
    * one map-side-combinable count; the census joins are bounded by
    * the support prune (wedge volume Σ out·in over elected edges). */
  def q252PreferenceCycles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planted = Seq(
      (-1L, 1, -101L), (-1L, 2, -102L), (-2L, 1, -101L), (-2L, 2, -102L),
      (-3L, 1, -102L), (-3L, 2, -103L), (-4L, 1, -102L), (-4L, 2, -103L),
      (-5L, 1, -103L), (-5L, 2, -101L), (-6L, 1, -103L), (-6L, 2, -101L))
      .toDF("l_orderkey", "l_linenumber", "l_partkey")
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      .unionByName(planted)
    // (orderkey, linenumber) is NOT unique in this generator — the
    // partkey tiebreak makes the follow sequence a total order (exact
    // duplicate rows permute harmlessly: same partkey sequence)
    val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    val events = li
      .withColumn("nxt", lead("l_partkey", 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("l_partkey").as("p_src"), col("nxt").as("p_dst"))
    // r16: pin the elected edge set — directedCycleCensus checkpoints
    // its own copy for the census joins, but the n_edges leg below
    // consumed the RAW frame, so the lineitem window + majority
    // election ran twice (profiled: two identical scan→window→election
    // stage triples, ~2.3 s task time each at sf0.1). The pin is
    // edge-count-sized, the same frame the census already pins.
    val edges = Graph.electMajorityEdges(events, "p_src", "p_dst", minSupport = 2L)
      .transform(Pin.lazily)
    val (cycles, transitive) = Graph.directedCycleCensus(edges)
    val cyc = cycles.transform(Pin.eager)
    val summary = cyc.agg(
      count(lit(1)).as("n_cycles"),
      sum(when(col("a") < 0 && col("b") < 0 && col("c") < 0, 1L).otherwise(0L))
        .as("planted_recovered"))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
      .crossJoin(transitive.agg(count(lit(1)).as("n_transitive")))
    cyc.crossJoin(broadcast(summary))
      .select(col("a"), col("b"), col("c"), col("n_edges"), col("n_cycles"),
        col("n_transitive"), col("planted_recovered"))
      .orderBy("a", "b", "c")
  }

  /** Per-source boilerplate-line removal ([[Dedup.boilerplateRemoval]],
    * the CCNet/C4 rewrite): lines appearing in ≥ 50 % of a source's
    * docs (source must have ≥ 5 docs) are template chrome and are
    * stripped from EVERY doc. Total report, q105's fingerprint
    * discipline. Planted: source `srcbp` (6 docs) with a navigation
    * line in 5/6 docs (removed everywhere) and a banner line in 2/6
    * (kept — under threshold); source `srcsm` (2 docs < minDocs)
    * sharing a line that must survive (the small-source guard). */
  def q253Boilerplate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nav = "bpnav home about contact"
    val ban = "bpban cookie banner"
    val sm = "bpsm tiny source shared line"
    val planted = Seq(
      (-10L, s"$nav\n$ban\nuniq minus ten", "srcbp"),
      (-11L, s"$nav\n$ban\nuniq minus eleven", "srcbp"),
      (-12L, s"$nav\nuniq minus twelve", "srcbp"),
      (-13L, s"$nav\nuniq minus thirteen", "srcbp"),
      (-14L, s"uniq minus fourteen\n$nav", "srcbp"),
      (-15L, "uniq minus fifteen only content", "srcbp"),
      (-20L, s"$sm\nuniq minus twenty", "srcsm"),
      (-21L, s"$sm\nuniq minus twentyone", "srcsm"))
      .toDF("doc_id", "text", "source")
    val all = Tables.documents(s, d).select(col("doc_id"), col("text"), col("source"))
      .unionByName(planted)
    Dedup.boilerplateRemoval(all, minDocs = 5, threshold = 0.5)
      .orderBy("doc_id")
  }

  /** Margin-based bitext mining ([[Similarity.bitextMarginMine]],
    * Artetxe & Schwenk 2019): the mining BATCH is every 10th
    * even-label vector (the daily-ingest shape — batch × corpus, so
    * cost scales linearly in the corpus, never corpus²), the corpus
    * side is all odd-label vectors; per-batch-row best margin-scored
    * candidate with the mutual-best flag. Planted: ids (-1, -2) carry
    * the SAME embedding (corpus vec 7) on opposite sides — cosine 1,
    * margin > 1, and mutual by construction. */
  def q254BitextMargin(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val clone = emb.filter(col("vec_id") === 7)
    // the mining batch is PINNED (vec_id < 10240 → ≤512 batch rows), not
    // a corpus fraction: bitextMarginMine's cost is |batch|·|corpus|
    // map-side cosines, so a batch that scales WITH the corpus turns the
    // operator quadratic — the r10 full-registry sf10 audit measured
    // exactly that (179 s; the daily-ingest batch the operator is
    // documented for is fixed-size by nature)
    val a = emb.filter(col("label") % 2 === 0 && col("vec_id") % 10 === 0 &&
        col("vec_id") < 10240)
      .select(col("vec_id"), col("embedding"))
      .unionByName(clone.select(lit(-1L).as("vec_id"), col("embedding")))
    val b = emb.filter(col("label") % 2 === 1).select(col("vec_id"), col("embedding"))
      .unionByName(clone.select(lit(-2L).as("vec_id"), col("embedding")))
    Similarity.bitextMarginMine(s, a, b, k = 4, minMargin = 1.0)
      .orderBy(col("margin").desc, col("src_id"), col("dst_id"))
  }

  /** LSH-banded bitext mining — q254's SCALE PATH, completing the
    * brute→LSH pairing the repo established for hard negatives
    * (q272→q280): the same margin arithmetic (Artetxe & Schwenk 2019)
    * runs over CANDIDATE LISTS mined inside shared SRP band buckets
    * (32-bit sign code → 4 bands × 8 bits, the q111/q112/q280 coding)
    * instead of the batch×corpus cross. At 100 TB the band key is the
    * corpus partitioning key, so a batch row touches only its buckets'
    * partitions — the scan drops from |corpus| to the collision set,
    * at a recall price the in-row audit column measures.
    *
    * Differences from the brute mine, both deliberate: (1) the k-NN
    * normalizers average over the row's ACTUAL top-min(k, n) candidate
    * sims (a candidate list can run short of k; dividing by a fixed k
    * would deflate sparse rows' normalizers and inflate their margins);
    * (2) each mined row carries `n_candidates` and `matches_exact` —
    * the brute mine re-run as the testing-mode audit (dropped in
    * production, exactly like q280's recall pass). Planted: src −1 and
    * dst −2 carry the SAME embedding (corpus vec 7) → identical SRP
    * code → collide in EVERY band → mined at sim 1.0, mutual, and
    * matching the exact mine by construction.
    *
    * Scale shape: banding is row-local projection; the candidate join
    * is an equi-join on (band, bkey) with the ≤4·|batch|-row batch
    * side broadcast; scoring joins candidates back to the corpus by
    * dst_id (equi, AQE-sized); the forward/backward windows and every
    * frame from fwdTop down are candidate/batch-bounded, and the
    * backward normalizer is computed only for forward survivors (the
    * q254 discipline). No corpus-sized broadcast or cross anywhere. */
  def q283BitextMarginLsh(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    val k = 4
    val emb = Tables.embeddings(s, d)
    val clone = emb.filter(col("vec_id") === 7)
    val a = emb.filter(col("label") % 2 === 0 && col("vec_id") % 10 === 0 &&
        col("vec_id") < 10240)
      .select(col("vec_id"), col("embedding"))
      .unionByName(clone.select(lit(-1L).as("vec_id"), col("embedding")))
    val b = emb.filter(col("label") % 2 === 1).select(col("vec_id"), col("embedding"))
      .unionByName(clone.select(lit(-2L).as("vec_id"), col("embedding")))
    // native one-pass band packing (project → rounded sign bit → 8-bit
    // fold) — bit-identical to the interpreted transform/aggregate HOF
    // chain it replaced, which cost ~35 µs/row of pure interpretation
    // on the hottest path (r11 verdict finding 2; the q260 lesson)
    def banded(df: DataFrame, idAs: String): DataFrame = df
      .select(col("vec_id").as(idAs),
        posexplode(expr("srp_band_keys(embedding, 32, 8)"))
          .as(Seq("band", "bkey")))
    val candIds = banded(b, "dst_id")
      .join(broadcast(banded(a, "src_id")), Seq("band", "bkey"))
      .select("src_id", "dst_id").distinct()
    val batch = broadcast(a.select(col("vec_id").as("src_id"), col("embedding").as("a_emb")))
    val scored = candIds
      .join(b.select(col("vec_id").as("dst_id"), col("embedding").as("b_emb")), Seq("dst_id"))
      .join(batch, Seq("src_id"))
      .withColumn("sim", round(expr("cosine_sim(a_emb, b_emb)"), 6))
      .select("src_id", "dst_id", "sim")
      .transform(Pin.eager) // candidate-scale; feeds fwd, bwd, and the census
    val fwdTop = scored.withColumn("rk", row_number().over(
        Window.partitionBy("src_id").orderBy(col("sim").desc, col("dst_id"))))
      .filter(col("rk") <= k)
    val nCand = scored.groupBy("src_id").agg(count(lit(1)).as("n_candidates"))
    val fwd = fwdTop.groupBy("src_id")
      .agg((sum("sim") / count(lit(1))).as("avg_f"))
    val bwd = scored
      .join(broadcast(fwdTop.select("dst_id").distinct()), Seq("dst_id"), "left_semi")
      .withColumn("rk", row_number().over(
        Window.partitionBy("dst_id").orderBy(col("sim").desc, col("src_id"))))
      .filter(col("rk") <= k)
      .groupBy("dst_id").agg((sum("sim") / count(lit(1))).as("avg_b"))
    val margins = fwdTop.drop("rk")
      .join(broadcast(fwd), Seq("src_id"))
      .join(broadcast(bwd), Seq("dst_id"))
      .withColumn("margin",
        round(col("sim") / ((col("avg_f") + col("avg_b")) / 2.0), 6))
      .transform(Pin.eager)
    val bestF = margins.withColumn("mk", row_number().over(
        Window.partitionBy("src_id").orderBy(col("margin").desc, col("dst_id"))))
      .filter(col("mk") === 1)
    val bestB = margins.withColumn("mk", row_number().over(
        Window.partitionBy("dst_id").orderBy(col("margin").desc, col("src_id"))))
      .filter(col("mk") === 1)
      .select(col("dst_id"), col("src_id").as("best_src"))
    // testing-mode audit: the exact brute mine's best pair per src
    val exact = Similarity.bitextMarginMine(s, a, b, k = k, minMargin = 1.0)
      .select(col("src_id"), col("dst_id").as("exact_dst"))
    bestF
      .join(broadcast(bestB), Seq("dst_id"), "left")
      .filter(col("margin") >= 1.0)
      .join(broadcast(nCand), Seq("src_id"))
      .join(broadcast(exact), Seq("src_id"), "left")
      .select(col("src_id"), col("dst_id"), col("sim"), col("margin"),
        (col("best_src") === col("src_id")).as("mutual"),
        col("n_candidates"),
        coalesce(col("dst_id") === col("exact_dst"), lit(false)).as("matches_exact"))
      .orderBy(col("margin").desc, col("src_id"), col("dst_id"))
  }

  /** Customer order-count distribution — the TPC-H Q13 shape: LEFT
    * join so zero-order customers land in the c_count = 0 bucket,
    * urgent orders excluded (the Q13 "special comment" analog), then
    * the distribution of the distribution. Two map-side-combinable
    * aggregates; the left join's build side is the filtered orders
    * projection. */
  def q255OrderCountDistribution(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(s, d).select(col("c_custkey"))
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Product-line profit by supplier nation and ship year — the TPC-H
    * Q9 shape on this schema (no partsupp table: unit cost is modeled
    * as half the part's retail price, stated in the metric).
    * profit_units = rev_units − 50·retail_cents·qty, all integer
    * (units of 1e-4 dollars). The p_name filter lands in the part
    * scan; nation broadcasts (bounded dim); part/supplier are left to
    * AQE — the q227/q232/q250 discipline. */
  def q256ProfitByNation(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).filter(col("p_name").contains("red"))
      .select(col("p_partkey"), col("p_retailprice"))
    val n = Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name").as("nation"))
    Tables.lineitem(s, d)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .withColumn("profit_units",
        round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")) -
          lit(50L) * round(col("p_retailprice") * 100).cast("long") *
            col("l_quantity").cast("long"))
      .groupBy(col("nation"), year(col("l_shipdate")).as("o_year"))
      .agg(round(sum("profit_units") / 10000.0, 2).as("sum_profit"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Dominant-share suppliers — the TPC-H Q20 decorrelation exercise
    * on this schema: for 'small %' parts, a supplier qualifies when
    * its shipped quantity of some part exceeds 10 % of that part's
    * total shipped quantity (the availqty>threshold·Σqty correlated
    * subquery, decorrelated into one per-part aggregate joined back;
    * 10 % because this generator fans each part across ~20+ suppliers
    * — max observed share is 0.23, so Q20's ½ would assert an empty
    * set). Integer quantities ×10 → the share boundary is exact. */
  def q257DominantShare(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").startsWith("small"))
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"))
      .transform(Pin.eager)
    val perPart = li.groupBy("l_partkey").agg(sum("qty").as("tot_qty"))
    val perSupp = li.groupBy("l_suppkey", "l_partkey").agg(sum("qty").as("s_qty"))
    val dominant = perSupp.join(perPart, Seq("l_partkey"))
      .filter(col("s_qty") * 10 > col("tot_qty"))
    dominant
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_parts"),
        round(max(col("s_qty") / col("tot_qty")), 4).as("max_share"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_suppkey").as("s_suppkey"), col("s_name"),
        col("n_parts"), col("max_share"))
      .orderBy("s_suppkey")
  }

  /** Top-revenue supplier per quarter — the TPC-H Q15 shape, whose
    * point is the EXACT max-tie semantic (Q15's view + WHERE total =
    * MAX): revenue in integer units, per-quarter max as a rank-1
    * window over the |quarters × suppliers| aggregate (ties all
    * survive), names joined after the cut. */
  def q258TopSupplierPerQuarter(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .withColumn("rev_units",
        round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
      .groupBy(date_trunc("quarter", col("l_shipdate")).cast("date").as("quarter"),
        col("l_suppkey"))
      .agg(sum("rev_units").as("units"))
    rev
      .withColumn("rk", rank().over(
        Window.partitionBy("quarter").orderBy(col("units").desc)))
      .filter(col("rk") === 1)
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("quarter"), col("l_suppkey").as("s_suppkey"), col("s_name"),
        round(col("units") / 10000.0, 2).as("total_revenue"))
      .orderBy("quarter", "s_suppkey")
  }

  /** Leakage-safe grouped train/val/test split — the GROUP-aware split
    * every dedup paper insists on (split by SOURCE, never by document,
    * or near-dups of a training doc leak into eval): split =
    * md5(source) mod 10 → {0..7 train, 8 val, 9 test}. Output: per
    * split, source/doc/token counts plus `n_leaky_sources` — the
    * number of sources observed in more than one split, COMPUTED
    * relationally (0 by construction; the audit column proves it
    * rather than asserting it). Deterministic, rerun-stable,
    * assignment is one row-local hash — no shuffle before the
    * aggregate. */
  def q259GroupedSplit(s: SparkSession, d: String): DataFrame = {
    val withSplit = Tables.documents(s, d)
      .withColumn("__b", expr(
        "pmod(cast(conv(substring(md5(source), 1, 15), 16, 10) as bigint), 10)"))
      .withColumn("split",
        when(col("__b") < 8, "train").when(col("__b") === 8, "val").otherwise("test"))
      .withColumn("__ntok", size(split(lower(trim(col("text"))), "\\s+")))
    val perSplit = withSplit.groupBy("split")
      .agg(countDistinct("source").as("n_sources"),
        count(lit(1)).as("n_docs"),
        sum(col("__ntok").cast("long")).as("n_tokens"))
    val leaky = withSplit.select("source", "split").distinct()
      .groupBy("source").agg(count(lit(1)).as("__k"))
      .agg(sum(when(col("__k") > 1, 1L).otherwise(0L)).as("n_leaky_sources"))
    perSplit.crossJoin(broadcast(leaky)).orderBy("split")
  }

  /** Degenerate-loop detector — the repeated-n-gram pathology of
    * sampled/boilerplate text (distinct from q49's distinct-shingle
    * ratio, which cannot tell WHAT repeats): per doc, the fraction of
    * positions where token[i] == token[i+p] for period p ∈ {1,2,3};
    * a doc stuck in a p-cycle scores frac_p = 1. Flags docs with
    * max_frac ≥ 0.2, reporting the dominant period (ties → smallest).
    * Row-local array arithmetic — zero shuffles before the
    * presentation sort. Planted: a 1-cycle, a 2-cycle, a 3-cycle
    * (each must report its own period at frac 1.0) and a unique-token
    * control that must NOT appear. */
  def q260LoopDetector(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.GraftFunctions.register(s)
    val planted = Seq(
      (-3L, Seq.fill(30)("loopa").mkString(" ")),
      (-2L, Seq.fill(15)("pa pb").mkString(" ")),
      (-1L, Seq.fill(10)("qa qb qc").mkString(" ")),
      (-4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"))
      .toDF("doc_id", "text")
    val all = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .unionByName(planted)
    // all three period counts come from ONE fused native pass over the
    // token array (PeriodMatches) — the HOF formulation paid an
    // interpreted lambda per element (r10 sf10 audit: 106 s → native)
    def frac(p: Int) = round(
      element_at(col("pm"), p).cast("double") / (size(col("toks")) - p), 4)
    all
      .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
      .filter(size(col("toks")) >= 4)
      .withColumn("pm", expr("period_matches(toks, 3)"))
      .select(col("doc_id"), size(col("toks")).as("n_tokens"),
        frac(1).as("frac_p1"), frac(2).as("frac_p2"), frac(3).as("frac_p3"))
      .withColumn("max_frac", greatest(col("frac_p1"), col("frac_p2"), col("frac_p3")))
      .withColumn("loop_period",
        when(col("frac_p1") === col("max_frac"), 1)
          .when(col("frac_p2") === col("max_frac"), 2).otherwise(3))
      .filter(col("max_frac") >= 0.2)
      .orderBy("doc_id")
  }

  /** Time-decayed engagement score — the classic recency-weighted
    * activity feature: score(u) = Σ value·2^(−Δdays/30) with Δdays
    * measured back from the corpus's max event date (deterministic
    * reference, broadcast 1-row frame). Integer cents per event, one
    * pow per row (row-local), one map-side-combinable aggregate;
    * rounding at 4 absorbs cross-engine pow/sum-order ulps. */
  def q261DecayScore(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      .withColumn("day", to_date(col("ts")))
    val ref = ev.agg(max("day").as("ref_day"))
    ev.crossJoin(broadcast(ref))
      .withColumn("__decayed",
        round(col("value") * 100).cast("long") *
          pow(lit(0.5), datediff(col("ref_day"), col("day")).cast("double") / 30.0))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max("day").as("last_day"),
        round(sum("__decayed") / 100.0, 4).as("decay_score"))
      .orderBy("user_id")
  }

  /** STREAMING HyperLogLog — the q231 sketch as a live aggregate: the
    * register table (day, reg_j, max rank) IS the streaming state
    * (register max is associative/idempotent, so a complete-mode
    * streaming max-aggregate holds exactly m=256 rows per day — state
    * bounded by the sketch, not the stream), drained and fed to the
    * SAME batch estimator, with exact counts and rel_err in-row. The
    * streaming ≡ batch discipline of q242: one staged file, one
    * micro-batch, so DuckDB's batch register restatement hash-checks
    * the streaming path end to end. */
  def q262StreamHll(s: SparkSession, d: String): DataFrame = {
    val ev = StreamingOps.eventStream(s, s"$d/events.parquet")
      .filter(col("user_id").isNotNull)
      .withColumn("day", to_date(col("ts")))
    val regs = Hll.registers(ev, "user_id", Seq("day"))
    val drained = StreamingOps.runToMemory(s, regs, "graft_stream_hll",
      outputMode = "complete")
    val exact = Tables.events(s, d).filter(col("user_id").isNotNull)
      .withColumn("day", to_date(col("ts")))
      .groupBy("day").agg(countDistinct("user_id").as("n_exact"))
    Hll.estimateFromRegisters(drained, Seq("day"))
      .join(exact, Seq("day"))
      .withColumn("rel_err",
        round((col("hll_estimate") - col("n_exact")) / col("n_exact"), 4))
      .orderBy("day")
  }

  /** Late-fulfillment census by order priority — the TPC-H Q4 shape:
    * orders placed in 1996 that had AT LEAST ONE line shipped more
    * than 45 days after the order date (the EXISTS subquery), counted
    * by priority. The EXISTS is a left-SEMI join against the
    * pre-filtered late-line projection — order rows are never
    * duplicated by their line fan-out, and both date bounds sit in
    * the scans' PushedFilters. */
  def q263LatePriorityCensus(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
    val late = Tables.lineitem(s, d)
      .join(o.select("o_orderkey", "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > date_add(col("o_orderdate"), 45))
      .select(col("l_orderkey"))
    o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Supplier variety per part group — the TPC-H Q16 shape: distinct
    * suppliers per (brand, type, size) for mid-size parts, EXCLUDING
    * negative-balance suppliers (Q16's NOT IN complaint subquery →
    * one left-ANTI join against the 6-row blacklist before the
    * distinct-count aggregate). */
  def q264SupplierVariety(s: SparkSession, d: String): DataFrame = {
    val blacklist = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("bad_suppkey"))
    val p = Tables.part(s, d).filter(col("p_size").between(10, 20))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(blacklist), col("l_suppkey") === col("bad_suppkey"), "left_anti")
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Disjunctive multi-predicate revenue — the TPC-H Q19 shape, whose
    * point is the OR-of-ANDs: three (brand, quantity-band, size-band)
    * clauses OR-ed together. The part-side conjuncts are pushed into
    * the part scan as a single disjunctive filter; revenue in exact
    * cents, one summary row per clause plus the union total via
    * grouping by the matched clause id. */
  def q265DisjunctiveRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
    val c1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
      col("l_quantity").between(1, 15)
    val c2 = col("p_brand") === "Brand#2" && col("p_size").between(11, 25) &&
      col("l_quantity").between(10, 25)
    val c3 = col("p_brand") === "Brand#3" && col("p_size").between(26, 50) &&
      col("l_quantity").between(20, 35)
    li.filter(c1 || c2 || c3)
      .withColumn("clause",
        when(c1, 1).otherwise(when(c2, 2).otherwise(3)))
      .withColumn("rev_units",
        round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
      .groupBy("clause")
      .agg(count(lit(1)).as("n_lines"),
        round(sum("rev_units") / 10000.0, 2).as("revenue"))
      .orderBy("clause")
  }

  /** Unshipped-order revenue top-10 — the TPC-H Q3 shape: BUILDING
    * customers, orders placed before the cutoff with lines shipped
    * after it, ranked by open revenue. The output is a
    * TakeOrderedAndProject (never a global sort); revenue in exact
    * cents with one terminal division. */
  def q266UnshippedTopk(s: SparkSession, d: String): DataFrame = {
    val cut = "1998-01-01"
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(s, d).filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"), "left_semi")
      .withColumn("rev_units",
        round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum("rev_units") / 10000.0, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q252_preference_cycles" -> (q252PreferenceCycles _),
    "q253_boilerplate" -> (q253Boilerplate _),
    "q254_bitext_margin" -> (q254BitextMargin _),
    "q283_bitext_margin_lsh" -> (q283BitextMarginLsh _),
    "q255_order_count_dist" -> (q255OrderCountDistribution _),
    "q256_profit_by_nation" -> (q256ProfitByNation _),
    "q257_dominant_share" -> (q257DominantShare _),
    "q258_top_supplier_quarter" -> (q258TopSupplierPerQuarter _),
    "q259_grouped_split" -> (q259GroupedSplit _),
    "q260_loop_detector" -> (q260LoopDetector _),
    "q261_decay_score" -> (q261DecayScore _),
    "q262_stream_hll" -> (q262StreamHll _),
    "q263_late_priority" -> (q263LatePriorityCensus _),
    "q264_supplier_variety" -> (q264SupplierVariety _),
    "q265_disjunctive_revenue" -> (q265DisjunctiveRevenue _),
    "q266_unshipped_topk" -> (q266UnshippedTopk _)
  )

  val oracles: Map[String, String] = Map(
    "q252_preference_cycles" ->
      """WITH planted(l_orderkey, l_linenumber, l_partkey) AS (VALUES
        |  (-1, 1, -101), (-1, 2, -102), (-2, 1, -101), (-2, 2, -102),
        |  (-3, 1, -102), (-3, 2, -103), (-4, 1, -102), (-4, 2, -103),
        |  (-5, 1, -103), (-5, 2, -101), (-6, 1, -103), (-6, 2, -101)),
        |li AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
        |  UNION ALL SELECT CAST(l_orderkey AS BIGINT), l_linenumber,
        |    CAST(l_partkey AS BIGINT) FROM planted),
        |ev AS (
        |  SELECT l_partkey AS p_src,
        |    lead(l_partkey) OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey) AS p_dst
        |  FROM li),
        |cnt AS (
        |  SELECT least(p_src, p_dst) AS lo, greatest(p_src, p_dst) AS hi,
        |    sum(CASE WHEN p_src < p_dst THEN 1 ELSE 0 END) AS n_f,
        |    sum(CASE WHEN p_src < p_dst THEN 0 ELSE 1 END) AS n_r
        |  FROM ev WHERE p_dst IS NOT NULL AND p_src <> p_dst
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (
        |  SELECT CASE WHEN n_f >= n_r THEN lo ELSE hi END AS src,
        |    CASE WHEN n_f >= n_r THEN hi ELSE lo END AS dst
        |  FROM cnt),
        |two AS (
        |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        |  FROM e e1 JOIN e e2 ON e1.dst = e2.src
        |  WHERE e1.src <> e2.dst),
        |cyc AS (
        |  SELECT t.a, t.b, t.c FROM two t JOIN e ON e.src = t.c AND e.dst = t.a
        |  WHERE t.a < t.b AND t.a < t.c),
        |tra AS (
        |  SELECT t.a, t.b, t.c FROM two t JOIN e ON e.src = t.a AND e.dst = t.c),
        |summ AS (
        |  SELECT (SELECT count(*) FROM e) AS n_edges,
        |    (SELECT count(*) FROM cyc) AS n_cycles,
        |    (SELECT count(*) FROM tra) AS n_transitive,
        |    (SELECT count(*) FROM cyc WHERE a < 0 AND b < 0 AND c < 0)
        |      AS planted_recovered)
        |SELECT cyc.a, cyc.b, cyc.c, s.n_edges, s.n_cycles, s.n_transitive,
        |  s.planted_recovered
        |FROM cyc CROSS JOIN summ s
        |ORDER BY a, b, c""".stripMargin,
    "q253_boilerplate" ->
      """WITH planted(doc_id, text, source) AS (VALUES
        |  (-10, 'bpnav home about contact' || chr(10) || 'bpban cookie banner' || chr(10) || 'uniq minus ten', 'srcbp'),
        |  (-11, 'bpnav home about contact' || chr(10) || 'bpban cookie banner' || chr(10) || 'uniq minus eleven', 'srcbp'),
        |  (-12, 'bpnav home about contact' || chr(10) || 'uniq minus twelve', 'srcbp'),
        |  (-13, 'bpnav home about contact' || chr(10) || 'uniq minus thirteen', 'srcbp'),
        |  (-14, 'uniq minus fourteen' || chr(10) || 'bpnav home about contact', 'srcbp'),
        |  (-15, 'uniq minus fifteen only content', 'srcbp'),
        |  (-20, 'bpsm tiny source shared line' || chr(10) || 'uniq minus twenty', 'srcsm'),
        |  (-21, 'bpsm tiny source shared line' || chr(10) || 'uniq minus twentyone', 'srcsm')),
        |allr AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL SELECT CAST(doc_id AS BIGINT), text, source FROM planted),
        |ln AS (
        |  SELECT doc_id, source, CAST(u.i AS INT) - 1 AS pos, parts[u.i] AS line
        |  FROM (SELECT doc_id, source, string_split(text, chr(10)) AS parts FROM allr),
        |    LATERAL (SELECT unnest(range(1, len(parts) + 1)) AS i) u),
        |ps AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM allr GROUP BY 1),
        |bp AS (
        |  SELECT f.source, f.line FROM (
        |    SELECT source, line, count(DISTINCT doc_id) AS df
        |    FROM ln GROUP BY 1, 2) f
        |  JOIN ps ON f.source = ps.source
        |  WHERE ps.n_docs >= 5 AND f.df / ps.n_docs >= 0.5),
        |marked AS (
        |  SELECT ln.doc_id, ln.pos, ln.line,
        |    (bp.line IS NOT NULL) AS is_bp
        |  FROM ln LEFT JOIN bp ON ln.source = bp.source AND ln.line = bp.line)
        |SELECT doc_id, count(*) AS n_lines,
        |  CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  md5(coalesce(string_agg(CASE WHEN is_bp THEN NULL ELSE line END,
        |    chr(10) ORDER BY pos), '')) AS text_fp
        |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q254_bitext_margin" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings),
        |cl AS (SELECT e FROM base WHERE vec_id = 7),
        |sa AS (
        |  SELECT vec_id, e FROM base
        |  WHERE label % 2 = 0 AND vec_id % 10 = 0 AND vec_id < 10240
        |  UNION ALL SELECT -1, e FROM cl),
        |sb AS (
        |  SELECT vec_id, e FROM base WHERE label % 2 = 1
        |  UNION ALL SELECT -2, e FROM cl),
        |scored AS (
        |  SELECT sa.vec_id AS src_id, sb.vec_id AS dst_id,
        |    round(list_cosine_similarity(sa.e, sb.e), 6) AS sim
        |  FROM sa CROSS JOIN sb),
        |fwdk AS (
        |  SELECT src_id, dst_id, sim,
        |    row_number() OVER (PARTITION BY src_id ORDER BY sim DESC, dst_id) AS rk
        |  FROM scored QUALIFY rk <= 4),
        |bwdk AS (
        |  SELECT src_id, dst_id, sim,
        |    row_number() OVER (PARTITION BY dst_id ORDER BY sim DESC, src_id) AS rk
        |  FROM scored QUALIFY rk <= 4),
        |avf AS (SELECT src_id, sum(sim) / 4 AS avg_f FROM fwdk GROUP BY 1),
        |avb AS (SELECT dst_id, sum(sim) / 4 AS avg_b FROM bwdk GROUP BY 1),
        |mg AS (
        |  SELECT f.src_id, f.dst_id, f.sim,
        |    round(f.sim / ((avf.avg_f + avb.avg_b) / 2), 6) AS margin
        |  FROM fwdk f JOIN avf ON f.src_id = avf.src_id
        |  JOIN avb ON f.dst_id = avb.dst_id),
        |bestf AS (
        |  SELECT src_id, dst_id, sim, margin,
        |    row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, dst_id) AS mk
        |  FROM mg QUALIFY mk = 1),
        |bestb AS (
        |  SELECT dst_id, src_id AS best_src,
        |    row_number() OVER (PARTITION BY dst_id ORDER BY margin DESC, src_id) AS mk
        |  FROM mg QUALIFY mk = 1)
        |SELECT f.src_id, f.dst_id, f.sim, f.margin,
        |  (b.best_src = f.src_id) AS mutual
        |FROM bestf f LEFT JOIN bestb b ON f.dst_id = b.dst_id
        |WHERE f.margin >= 1.0
        |ORDER BY f.margin DESC, f.src_id, f.dst_id""".stripMargin,
    // the SRP ±1 hyperplane is the engine's md5 idiom (q280's oracle):
    // parity of the first 6 md5 hex chars of 'srp:i:j', folded in the
    // same ascending-i order as SrpProject; the exact-mine CTEs (x*)
    // restate q254 verbatim for the matches_exact audit column
    "q283_bitext_margin_lsh" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings),
        |cl AS (SELECT e FROM base WHERE vec_id = 7),
        |sa AS (
        |  SELECT vec_id, e FROM base
        |  WHERE label % 2 = 0 AND vec_id % 10 = 0 AND vec_id < 10240
        |  UNION ALL SELECT -1, e FROM cl),
        |sb AS (
        |  SELECT vec_id, e FROM base WHERE label % 2 = 1
        |  UNION ALL SELECT -2, e FROM cl),
        |acode AS (
        |  SELECT vec_id,
        |    list_transform(range(1, 33), j ->
        |      CASE WHEN round(list_sum(list_transform(range(1, 65), i ->
        |        e[i] * CASE WHEN ('0x' || substr(md5('srp:' || i || ':' || j),
        |            1, 6))::BIGINT % 2 = 0
        |          THEN 1.0 ELSE -1.0 END)), 6) >= 0 THEN 1 ELSE 0 END) AS code
        |  FROM sa),
        |bcode AS (
        |  SELECT vec_id,
        |    list_transform(range(1, 33), j ->
        |      CASE WHEN round(list_sum(list_transform(range(1, 65), i ->
        |        e[i] * CASE WHEN ('0x' || substr(md5('srp:' || i || ':' || j),
        |            1, 6))::BIGINT % 2 = 0
        |          THEN 1.0 ELSE -1.0 END)), 6) >= 0 THEN 1 ELSE 0 END) AS code
        |  FROM sb),
        |aband AS (
        |  SELECT vec_id AS src_id, bd.band,
        |    list_reduce(list_prepend(0,
        |      code[(bd.band * 8 + 1):(bd.band * 8 + 8)]),
        |      (a, x) -> a * 2 + x) AS bkey
        |  FROM acode CROSS JOIN (SELECT unnest(range(0, 4)) AS band) bd),
        |bband AS (
        |  SELECT vec_id AS dst_id, bd.band,
        |    list_reduce(list_prepend(0,
        |      code[(bd.band * 8 + 1):(bd.band * 8 + 8)]),
        |      (a, x) -> a * 2 + x) AS bkey
        |  FROM bcode CROSS JOIN (SELECT unnest(range(0, 4)) AS band) bd),
        |cand AS (
        |  SELECT DISTINCT aband.src_id, bband.dst_id
        |  FROM bband JOIN aband
        |    ON bband.band = aband.band AND bband.bkey = aband.bkey),
        |scored AS (
        |  SELECT c.src_id, c.dst_id,
        |    round(list_cosine_similarity(sa.e, sb.e), 6) AS sim
        |  FROM cand c JOIN sa ON sa.vec_id = c.src_id
        |  JOIN sb ON sb.vec_id = c.dst_id),
        |fwdk AS (
        |  SELECT src_id, dst_id, sim,
        |    row_number() OVER (PARTITION BY src_id ORDER BY sim DESC, dst_id) AS rk
        |  FROM scored QUALIFY rk <= 4),
        |nc AS (SELECT src_id, count(*) AS n_candidates FROM scored GROUP BY 1),
        |avf AS (SELECT src_id, sum(sim) / count(*) AS avg_f FROM fwdk GROUP BY 1),
        |bwdk AS (
        |  SELECT src_id, dst_id, sim,
        |    row_number() OVER (PARTITION BY dst_id ORDER BY sim DESC, src_id) AS rk
        |  FROM scored QUALIFY rk <= 4),
        |avb AS (SELECT dst_id, sum(sim) / count(*) AS avg_b FROM bwdk GROUP BY 1),
        |mg AS (
        |  SELECT f.src_id, f.dst_id, f.sim,
        |    round(f.sim / ((avf.avg_f + avb.avg_b) / 2), 6) AS margin
        |  FROM fwdk f JOIN avf ON f.src_id = avf.src_id
        |  JOIN avb ON f.dst_id = avb.dst_id),
        |bestf AS (
        |  SELECT src_id, dst_id, sim, margin,
        |    row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, dst_id) AS mk
        |  FROM mg QUALIFY mk = 1),
        |bestb AS (
        |  SELECT dst_id, src_id AS best_src,
        |    row_number() OVER (PARTITION BY dst_id ORDER BY margin DESC, src_id) AS mk
        |  FROM mg QUALIFY mk = 1),
        |xscored AS (
        |  SELECT sa.vec_id AS src_id, sb.vec_id AS dst_id,
        |    round(list_cosine_similarity(sa.e, sb.e), 6) AS sim
        |  FROM sa CROSS JOIN sb),
        |xfwdk AS (
        |  SELECT src_id, dst_id, sim,
        |    row_number() OVER (PARTITION BY src_id ORDER BY sim DESC, dst_id) AS rk
        |  FROM xscored QUALIFY rk <= 4),
        |xbwdk AS (
        |  SELECT src_id, dst_id, sim,
        |    row_number() OVER (PARTITION BY dst_id ORDER BY sim DESC, src_id) AS rk
        |  FROM xscored QUALIFY rk <= 4),
        |xavf AS (SELECT src_id, sum(sim) / 4 AS avg_f FROM xfwdk GROUP BY 1),
        |xavb AS (SELECT dst_id, sum(sim) / 4 AS avg_b FROM xbwdk GROUP BY 1),
        |xmg AS (
        |  SELECT f.src_id, f.dst_id,
        |    round(f.sim / ((xavf.avg_f + xavb.avg_b) / 2), 6) AS margin
        |  FROM xfwdk f JOIN xavf ON f.src_id = xavf.src_id
        |  JOIN xavb ON f.dst_id = xavb.dst_id),
        |ex AS (
        |  SELECT src_id, dst_id AS exact_dst FROM (
        |    SELECT src_id, dst_id, margin,
        |      row_number() OVER (PARTITION BY src_id
        |        ORDER BY margin DESC, dst_id) AS mk
        |    FROM xmg QUALIFY mk = 1)
        |  WHERE margin >= 1.0)
        |SELECT f.src_id, f.dst_id, f.sim, f.margin,
        |  (b.best_src = f.src_id) AS mutual,
        |  nc.n_candidates,
        |  coalesce(f.dst_id = ex.exact_dst, false) AS matches_exact
        |FROM bestf f
        |LEFT JOIN bestb b ON f.dst_id = b.dst_id
        |JOIN nc ON nc.src_id = f.src_id
        |LEFT JOIN ex ON ex.src_id = f.src_id
        |WHERE f.margin >= 1.0
        |ORDER BY f.margin DESC, f.src_id, f.dst_id""".stripMargin,
    "q255_order_count_dist" ->
      """WITH oc AS (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN (
        |    SELECT o_custkey, o_orderkey FROM orders
        |    WHERE o_orderpriority <> '1-URGENT') o
        |  ON c.c_custkey = o.o_custkey
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM oc GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q256_profit_by_nation" ->
      """SELECT n.n_name AS nation,
        |  CAST(year(l.l_shipdate) AS INT) AS o_year,
        |  round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |      (100 - CAST(round(l.l_discount * 100) AS BIGINT)) -
        |      50 * CAST(round(p.p_retailprice * 100) AS BIGINT) *
        |      CAST(l.l_quantity AS BIGINT)) / 10000.0, 2) AS sum_profit,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE contains(p.p_name, 'red')
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q257_dominant_share" ->
      """WITH li AS (
        |  SELECT l.l_partkey, l.l_suppkey, CAST(l.l_quantity AS BIGINT) AS qty
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_name LIKE 'small%'),
        |pp AS (SELECT l_partkey, sum(qty) AS tot_qty FROM li GROUP BY 1),
        |sp AS (SELECT l_suppkey, l_partkey, sum(qty) AS s_qty FROM li GROUP BY 1, 2),
        |dom AS (
        |  SELECT sp.l_suppkey, sp.s_qty, pp.tot_qty
        |  FROM sp JOIN pp ON sp.l_partkey = pp.l_partkey
        |  WHERE sp.s_qty * 10 > pp.tot_qty)
        |SELECT d.l_suppkey AS s_suppkey, s.s_name,
        |  count(*) AS n_parts,
        |  round(max(d.s_qty / CAST(d.tot_qty AS DOUBLE)), 4) AS max_share
        |FROM dom d JOIN supplier s ON d.l_suppkey = s.s_suppkey
        |GROUP BY 1, 2 ORDER BY s_suppkey""".stripMargin,
    "q263_late_priority" ->
      """SELECT o.o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= DATE '1996-01-01'
        |  AND o.o_orderdate < DATE '1997-01-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q264_supplier_variety" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_size BETWEEN 10 AND 20
        |  AND l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q265_disjunctive_revenue" ->
      """WITH f AS (
        |  SELECT CASE
        |      WHEN p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
        |        AND l.l_quantity BETWEEN 1 AND 15 THEN 1
        |      WHEN p.p_brand = 'Brand#2' AND p.p_size BETWEEN 11 AND 25
        |        AND l.l_quantity BETWEEN 10 AND 25 THEN 2
        |      ELSE 3 END AS clause,
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |      (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_units
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
        |      AND l.l_quantity BETWEEN 1 AND 15)
        |    OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 11 AND 25
        |      AND l.l_quantity BETWEEN 10 AND 25)
        |    OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 26 AND 50
        |      AND l.l_quantity BETWEEN 20 AND 35))
        |SELECT CAST(clause AS INT) AS clause, count(*) AS n_lines,
        |  round(sum(rev_units) / 10000.0, 2) AS revenue
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "q266_unshipped_topk" ->
      """SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
        |  round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |    (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0, 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderdate < DATE '1998-01-01'
        |  AND l.l_shipdate > DATE '1998-01-01'
        |  AND o.o_custkey IN (
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q259_grouped_split" ->
      """WITH ws AS (
        |  SELECT source,
        |    CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
        |    len(string_split_regex(lower(trim(text)), '\s+')) AS ntok
        |  FROM (SELECT source, text,
        |          ('0x' || substr(md5(source), 1, 15))::BIGINT % 10 AS b
        |        FROM documents)),
        |ps AS (
        |  SELECT split, count(DISTINCT source) AS n_sources,
        |    count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens
        |  FROM ws GROUP BY 1),
        |lk AS (
        |  SELECT CAST(coalesce(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
        |    AS n_leaky_sources
        |  FROM (SELECT source, count(DISTINCT split) AS k FROM ws GROUP BY 1))
        |SELECT ps.split, ps.n_sources, ps.n_docs, ps.n_tokens, lk.n_leaky_sources
        |FROM ps CROSS JOIN lk ORDER BY split""".stripMargin,
    "q260_loop_detector" ->
      ("""WITH planted(doc_id, text) AS (VALUES
        |  (-3, 'LOOP1'), (-2, 'LOOP2'), (-1, 'LOOP3'),
        |  (-4, 'u1 u2 u3 u4 u5 u6 u7 u8 u9 u10')),
        |allr AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT CAST(doc_id AS BIGINT), text FROM planted),
        |tk AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM allr),
        |f AS (
        |  SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
        |    round(len(list_filter(list_transform(range(1, len(toks) - 1 + 1),
        |      i -> toks[i] = toks[i + 1]), x -> x)) / CAST(len(toks) - 1 AS DOUBLE), 4) AS frac_p1,
        |    round(len(list_filter(list_transform(range(1, len(toks) - 2 + 1),
        |      i -> toks[i] = toks[i + 2]), x -> x)) / CAST(len(toks) - 2 AS DOUBLE), 4) AS frac_p2,
        |    round(len(list_filter(list_transform(range(1, len(toks) - 3 + 1),
        |      i -> toks[i] = toks[i + 3]), x -> x)) / CAST(len(toks) - 3 AS DOUBLE), 4) AS frac_p3
        |  FROM tk WHERE len(toks) >= 4)
        |SELECT doc_id, n_tokens, frac_p1, frac_p2, frac_p3,
        |  greatest(frac_p1, frac_p2, frac_p3) AS max_frac,
        |  CAST(CASE WHEN frac_p1 = greatest(frac_p1, frac_p2, frac_p3) THEN 1
        |       WHEN frac_p2 = greatest(frac_p1, frac_p2, frac_p3) THEN 2
        |       ELSE 3 END AS INT) AS loop_period
        |FROM f WHERE greatest(frac_p1, frac_p2, frac_p3) >= 0.2
        |ORDER BY doc_id""".stripMargin
        .replace("LOOP1", Seq.fill(30)("loopa").mkString(" "))
        .replace("LOOP2", Seq.fill(15)("pa pb").mkString(" "))
        .replace("LOOP3", Seq.fill(10)("qa qb qc").mkString(" "))),
    "q261_decay_score" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id IS NOT NULL),
        |ref AS (SELECT max(day) AS ref_day FROM ev)
        |SELECT user_id, count(*) AS n_events, max(day) AS last_day,
        |  round(sum(cents * pow(0.5, date_diff('day', day, ref_day) / 30.0))
        |    / 100.0, 4) AS decay_score
        |FROM ev CROSS JOIN ref
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the q231 register restatement over the events stream's day grain:
    // the streaming complete-mode max-aggregate state IS this register
    // table, so the batch SQL hash-checks the streaming drain
    "q262_stream_hll" ->
      """WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS day, user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (
        |  SELECT day, h % 256 AS j,
        |    CASE WHEN h // 256 > 0 THEN 53 - length(bin(h // 256)) ELSE 53 END AS rnk
        |  FROM ev),
        |mx AS (SELECT day, j, max(rnk) AS mj FROM r GROUP BY 1, 2),
        |s AS (
        |  SELECT day,
        |    CAST(sum(CAST(1 AS BIGINT) << (53 - mj)) AS BIGINT)
        |      + (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS big_s,
        |    CAST(count(*) AS BIGINT) AS n_registers_set
        |  FROM mx GROUP BY 1),
        |e AS (SELECT day, count(DISTINCT user_id) AS n_exact FROM ev GROUP BY 1),
        |est AS (
        |  SELECT s.day, n_registers_set, n_exact,
        |    round(CASE WHEN 4.2399330249068963e+20 / big_s <= 640.0
        |        AND 256 - n_registers_set > 0
        |      THEN 256 * ln(256 / CAST(256 - n_registers_set AS DOUBLE))
        |      ELSE 4.2399330249068963e+20 / big_s END, 2) AS hll_estimate
        |  FROM s JOIN e ON e.day = s.day)
        |SELECT day, hll_estimate, n_registers_set, n_exact,
        |  round((hll_estimate - n_exact) / n_exact, 4) AS rel_err
        |FROM est ORDER BY day""".stripMargin,
    "q258_top_supplier_quarter" ->
      """WITH rev AS (
        |  SELECT CAST(date_trunc('quarter', l_shipdate) AS DATE) AS quarter,
        |    l_suppkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |        (100 - CAST(round(l_discount * 100) AS BIGINT))) AS units
        |  FROM lineitem GROUP BY 1, 2),
        |rk AS (
        |  SELECT quarter, l_suppkey, units,
        |    rank() OVER (PARTITION BY quarter ORDER BY units DESC) AS r
        |  FROM rev)
        |SELECT rk.quarter, rk.l_suppkey AS s_suppkey, s.s_name,
        |  round(rk.units / 10000.0, 2) AS total_revenue
        |FROM rk JOIN supplier s ON rk.l_suppkey = s.s_suppkey
        |WHERE rk.r = 1
        |ORDER BY quarter, s_suppkey""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.{Dedup, Graph, Similarity}

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
    val edges = Graph.electMajorityEdges(events, "p_src", "p_dst", minSupport = 2L)
    val (cycles, transitive) = Graph.directedCycleCensus(edges)
    val cyc = cycles.localCheckpoint()
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
    val a = emb.filter(col("label") % 2 === 0 && col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"))
      .unionByName(clone.select(lit(-1L).as("vec_id"), col("embedding")))
    val b = emb.filter(col("label") % 2 === 1).select(col("vec_id"), col("embedding"))
      .unionByName(clone.select(lit(-2L).as("vec_id"), col("embedding")))
    Similarity.bitextMarginMine(s, a, b, k = 4, minMargin = 1.0)
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
      .localCheckpoint()
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q252_preference_cycles" -> (q252PreferenceCycles _),
    "q253_boilerplate" -> (q253Boilerplate _),
    "q254_bitext_margin" -> (q254BitextMargin _),
    "q255_order_count_dist" -> (q255OrderCountDistribution _),
    "q256_profit_by_nation" -> (q256ProfitByNation _),
    "q257_dominant_share" -> (q257DominantShare _),
    "q258_top_supplier_quarter" -> (q258TopSupplierPerQuarter _)
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
        |  SELECT vec_id, e FROM base WHERE label % 2 = 0 AND vec_id % 10 = 0
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

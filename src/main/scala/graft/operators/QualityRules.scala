package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style repetition and quality heuristics (Rae et al. 2021,
  * "Scaling Language Models: ... Gopher", Appendix A1.1/A1.2) — the
  * standard pre-training corpus filter suite: word-count bounds, mean
  * word length, symbol-to-word ratio, alphabetic-word fraction,
  * stop-word presence, line-shape rules (bullets / ellipses /
  * duplicate lines), top-n-gram concentration (n = 2..4) and duplicate
  * n-gram mass (n = 5..10).
  *
  * Scale design: every metric — including all nine n-gram statistics —
  * is computed ROW-LOCALLY with Catalyst higher-order functions: the
  * per-doc n-gram mode and duplicate mass come from a run-length
  * `aggregate` fold over the doc's own `array_sort`ed positional
  * shingles, not from an explode + per-(doc, gram) shuffle. Quality
  * filtering is embarrassingly parallel and the plan says so: a 100 TB
  * corpus filters with ZERO exchanges (spec-asserted), the map-side
  * cost is O(tokens · Σn) per doc, and no per-doc gram multiset is
  * ever wider than the doc itself.
  *
  * Denominator convention (documented deviation from the paper, which
  * normalizes by raw document characters): every n-gram fraction is
  * normalized by that n's TOTAL gram characters
  * (Σ_g count(g)·chars(g), chars(g) = length(g) − (n−1) separator
  * chars). This keeps each fraction self-contained in [0, 1], is
  * exact long/long arithmetic on both engines (bit-identical hash
  * compares), and preserves the rules' discriminative ordering.
  * Reference anchor: the engine brief's LLM-pipeline operator list;
  * no reference-repo counterpart exists (the reference corpus is
  * weather/energy rows, not documents).
  */
object QualityRules {

  /** Gopher A1.1 stop-word rule list (engine-configurable; the default
    * mirrors [[graft.functions.TextFunctions.langMarkers]]'s `en` set so
    * the rule discriminates on the synthetic corpus instead of failing
    * every doc the way the paper's English list would). */
  val DefaultStopWords: Seq[String] = Seq("the", "a", "data", "table")

  /** Run-length statistics over one n's positional grams, returned as
    * `struct(top, dup, tot)` gram-character masses:
    *  - `top` = count·chars of the most frequent n-gram,
    *  - `dup` = Σ count·chars over grams occurring ≥ 2 times,
    *  - `tot` = Σ count·chars over all grams.
    * One `array_sort` + one `aggregate` fold, entirely inside the row;
    * `shingle_seq` (native) keeps duplicates so counts are exact.
    * `coalesce(..., 0L)` guards the fold's first step, where `prev` is
    * still null and the flushed run is empty. */
  private def gramStats(toksCol: String, n: Int): Column = {
    val w = n - 1 // separator chars to subtract: chars(g) = length(g) - (n-1)
    expr(
      s"""aggregate(
         |  array_sort(shingle_seq($toksCol, $n)),
         |  named_struct('prev', cast(null as string), 'run', 0L,
         |               'top', 0L, 'dup', 0L, 'tot', 0L),
         |  (acc, g) -> if(acc.prev <=> g,
         |    named_struct('prev', g, 'run', acc.run + 1L,
         |                 'top', acc.top, 'dup', acc.dup, 'tot', acc.tot),
         |    named_struct('prev', g, 'run', 1L,
         |      'top', greatest(acc.top,
         |        coalesce(acc.run * (length(acc.prev) - $w), 0L)),
         |      'dup', acc.dup + coalesce(
         |        if(acc.run >= 2L, acc.run * (length(acc.prev) - $w), 0L), 0L),
         |      'tot', acc.tot + coalesce(acc.run * (length(acc.prev) - $w), 0L))),
         |  acc -> named_struct(
         |    'top', greatest(acc.top,
         |      coalesce(acc.run * (length(acc.prev) - $w), 0L)),
         |    'dup', acc.dup + coalesce(
         |      if(acc.run >= 2L, acc.run * (length(acc.prev) - $w), 0L), 0L),
         |    'tot', acc.tot + coalesce(acc.run * (length(acc.prev) - $w), 0L)))""".stripMargin)
  }

  private def frac(statsCol: String, num: String): Column =
    expr(s"if($statsCol.tot > 0L, $num / $statsCol.tot, 0.0d)")

  /** All Gopher metrics as columns on `df` (which must carry `textCol`).
    * Fractions are exact integer-over-integer divisions — per-row
    * arithmetic, deliberately NOT rounded (bit-identical across
    * engines). Adds, per doc: word/line shape metrics, `top{2,3,4}_frac`
    * gram concentration, `dup{5..10}_frac` duplicate gram mass. */
  def gopherMetrics(df: DataFrame, textCol: String = "text",
      stopWords: Seq[String] = DefaultStopWords): DataFrame = {
    val stopSet = stopWords.map(wd => s"'$wd'").mkString(", ")
    val withArrays = df
      .withColumn("__toks", graft.functions.TextFunctions.tokens(textCol))
      .withColumn("__lines", expr(s"split($textCol, '\n')"))
    val base = withArrays
      .withColumn("n_words", size(col("__toks")))
      .withColumn("mean_word_len",
        expr("aggregate(__toks, 0L, (a, t) -> a + length(t)) / size(__toks)"))
      .withColumn("stop_hits",
        expr(s"size(array_intersect(__toks, array($stopSet)))"))
      .withColumn("alpha_frac",
        expr("size(filter(__toks, t -> t rlike '[a-z]')) / size(__toks)"))
      .withColumn("symbol_ratio",
        expr(s"size(regexp_extract_all($textCol, '#|\\\\.\\\\.\\\\.', 0)) / size(__toks)"))
      .withColumn("n_lines", size(col("__lines")))
      .withColumn("dup_line_frac",
        expr("1.0d - size(array_distinct(__lines)) / size(__lines)"))
      .withColumn("bullet_line_frac",
        expr("size(filter(__lines, l -> l like '- %' OR l like '* %')) / size(__lines)"))
      .withColumn("ellipsis_line_frac",
        expr("size(filter(__lines, l -> l like '%...')) / size(__lines)"))
    val withGrams = (2 to 10).foldLeft(base) { (acc, n) =>
      acc.withColumn(s"__g$n", gramStats("__toks", n))
    }
    val withFracs = (2 to 4).foldLeft(withGrams) { (acc, n) =>
      acc.withColumn(s"top${n}_frac", frac(s"__g$n", s"__g$n.top"))
    }
    val allFracs = (5 to 10).foldLeft(withFracs) { (acc, n) =>
      acc.withColumn(s"dup${n}_frac", frac(s"__g$n", s"__g$n.dup"))
    }
    allFracs.drop("__toks" +: "__lines" +: (2 to 10).map(n => s"__g$n"): _*)
  }

  /** Gopher A1 thresholds (paper values, except the stop-word list —
    * see [[DefaultStopWords]]). Keys are rule names; each value is the
    * boolean pass predicate over [[gopherMetrics]] columns. ORDER is
    * part of the contract: [[gopherFunnel]] reports attrition stage by
    * stage in this sequence. */
  val Rules: Seq[(String, Column)] = Seq(
    "r_word_count" -> col("n_words").between(50, 100000),
    "r_mean_word_len" -> col("mean_word_len").between(3.0, 10.0),
    "r_symbol_ratio" -> (col("symbol_ratio") <= 0.1),
    "r_alpha_words" -> (col("alpha_frac") >= 0.8),
    "r_stop_words" -> (col("stop_hits") >= 2),
    "r_bullet_lines" -> (col("bullet_line_frac") <= 0.1),
    "r_ellipsis_lines" -> (col("ellipsis_line_frac") <= 0.3),
    "r_dup_lines" -> (col("dup_line_frac") <= 0.3),
    "r_top2" -> (col("top2_frac") <= 0.20), "r_top3" -> (col("top3_frac") <= 0.18),
    "r_top4" -> (col("top4_frac") <= 0.16),
    "r_dup5" -> (col("dup5_frac") <= 0.15), "r_dup6" -> (col("dup6_frac") <= 0.14),
    "r_dup7" -> (col("dup7_frac") <= 0.13), "r_dup8" -> (col("dup8_frac") <= 0.12),
    "r_dup9" -> (col("dup9_frac") <= 0.11), "r_dup10" -> (col("dup10_frac") <= 0.10))

  /** [[gopherMetrics]] plus per-rule int flags (1 = pass), `n_failed`,
    * and the overall `keep` decision. Still zero exchanges. */
  def gopherFilterReport(df: DataFrame, textCol: String = "text",
      stopWords: Seq[String] = DefaultStopWords): DataFrame = {
    val withFlags = Rules.foldLeft(gopherMetrics(df, textCol, stopWords)) {
      case (acc, (name, pred)) => acc.withColumn(name, pred.cast("int"))
    }
    withFlags
      .withColumn("n_failed",
        Rules.map { case (name, _) => lit(1) - col(name) }.reduce(_ + _))
      .withColumn("keep", (col("n_failed") === 0).cast("int"))
  }

  /** Filter-funnel attrition report: for each rule, applied in
    * [[Rules]] order, how many docs enter the stage, survive it, and
    * drop — the corpus-curation dashboard every pipeline publishes
    * (what fraction did each filter cost?). ONE corpus pass: the
    * cumulative-survival flags are per-row int products, everything
    * reduces in a single aggregate (17 sums + a count riding one
    * map-side combine), and the 17-row funnel explodes from that
    * driver-scale row — no per-stage scan, no shuffle of the corpus. */
  def gopherFunnel(df: DataFrame, textCol: String = "text",
      stopWords: Seq[String] = DefaultStopWords): DataFrame = {
    val rep = gopherFilterReport(df, textCol, stopWords)
    val withCums = Rules.zipWithIndex.foldLeft(rep) { case (acc, ((name, _), i)) =>
      acc.withColumn(s"__cum$i",
        if (i == 0) col(name) else col(s"__cum${i - 1}") * col(name))
    }
    val aggs = count(lit(1)).cast("long").as("n_docs") +:
      Rules.indices.map(i => sum(col(s"__cum$i")).cast("long").as(s"__s$i"))
    val one = withCums.agg(aggs.head, aggs.tail: _*)
    val stages = Rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i + 1).as("stage"), lit(name).as("rule"),
        (if (i == 0) col("n_docs") else col(s"__s${i - 1}")).as("n_in"),
        col(s"__s$i").as("n_out"))
    }
    one.select(explode(array(stages: _*)).as("f"))
      .select(col("f.stage").as("stage"), col("f.rule").as("rule"),
        col("f.n_in").as("n_in"), col("f.n_out").as("n_out"))
      .withColumn("n_dropped", col("n_in") - col("n_out"))
  }
}

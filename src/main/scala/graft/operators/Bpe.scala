package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Byte-pair-encoding vocabulary induction (Sennrich, Haddow & Birch,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016) — THE canonical tokenizer-training operator of an LLM
  * data pipeline, Spark-first:
  *
  *   1. ONE distributed pass builds the word→frequency histogram
  *      (the only corpus-scale step; at 100 TB this is a classic
  *      map-side-combinable groupBy whose output — the distinct-word
  *      histogram — is orders of magnitude smaller than the corpus).
  *   2. The merge loop then runs ENTIRELY on the compact histogram:
  *      each iteration is one map-side-combinable pair-count aggregate
  *      over ≤ topWords rows, a 1-row argmax collect (the model
  *      artifact, not data), and a row-local [[BpeMerge]] rewrite of
  *      the symbol sequences. This is exactly how industrial BPE
  *      trainers decompose the problem (word histogram + merge loop);
  *      the corpus is never re-read after step 1.
  *
  * Determinism (what makes a FULL cross-engine oracle possible, unlike
  * the float-iterative k-means family): all state is integer counts
  * and strings; the argmax tie-break is total (count DESC, left ASC,
  * right ASC — binary collation on a lowercase-ASCII + '</w>'
  * alphabet); and the greedy merge application is restated exactly by
  * the run-parity window rule (see [[
  * org.apache.spark.sql.catalyst.expressions.graft.BpeMerge]]).
  *
  * Reference scope: the reference app has no tokenizer training at
  * all (its text handling stops at pandas `str` ops,
  * `src/processing.py`); this is a 100 TB-pipeline extension. */
object Bpe {

  /** Distributed word histogram: lowercase, split on non-letters, cap
    * word length (bounds every downstream symbol sequence), keep the
    * `topWords` most frequent with a deterministic (freq DESC, word
    * ASC) tie-break — a TakeOrdered, not a global sort. The histogram
    * cap is the scale guard: the merge loop's cost is O(topWords ·
    * maxLen) per iteration regardless of corpus size. */
  def wordHistogram(docs: DataFrame, textCol: String, topWords: Int,
      maxLen: Int = 12): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .where(col("word") =!= "" && length(col("word")) <= maxLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(topWords)

  /** Learn `nMerges` BPE merges from the corpus; returns the merge
    * table (step, lsym, rsym, pair_count) — the trained tokenizer
    * model. Initial alphabet = characters + an explicit '</w>'
    * end-of-word marker (so merges can learn whole-word units and
    * suffixes, per the paper). Stops early if no adjacent pair is
    * left (fully-merged vocabulary). */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
      topWords: Int, maxLen: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    graft.plans.GraftFunctions.register(spark)
    // chars via sequence+substr: the one char-split formulation that
    // is value-identical across engines (split-on-empty-regex differs)
    var words = wordHistogram(docs, textCol, topWords, maxLen)
      .withColumn("toks", expr(
        "concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)), array('</w>'))"))
      .select("word", "freq", "toks")
      .localCheckpoint() // histogram is ≤ topWords rows: checkpoint is cheap
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      // the size guard matters once a word is fully merged to one
      // symbol: Spark's sequence(1, 0) counts DOWN ([1, 0]) rather
      // than producing an empty list (DuckDB's range(1, 1) is empty)
      val top = words
        .select(col("freq"), explode(expr(
          """CASE WHEN size(toks) > 1 THEN
            |  transform(sequence(1, size(toks) - 1),
            |    j -> struct(element_at(toks, j) AS l, element_at(toks, j + 1) AS r))
            |ELSE array() END""".stripMargin)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect() // 1-row argmax: the model artifact, not data
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0); val r = top(0).getString(1)
        merges += ((step, l, r, top(0).getLong(2)))
        // call_function + lit, same as encode(): symbols are lowercase
        // a-z / '</w>' by construction here, but carrying them as
        // VALUES rather than SQL text keeps the whole file free of the
        // injection-shaped pattern (r9 ADVICE)
        words = words
          .withColumn("toks",
            call_function("bpe_merge", col("toks"), lit(l), lit(r)))
          .localCheckpoint() // keep the loop's plan flat (tiny frame)
        step += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("step", "lsym", "rsym", "pair_count")
  }

  /** Encode words with a learned merge table: fold the merges in
    * training order over the symbol sequences (the standard BPE
    * encoder). Returns the word histogram with its final subword
    * sequence and subword count — the vocabulary-compression view
    * (how many tokens each word costs under the trained tokenizer). */
  def encode(docs: DataFrame, textCol: String, merges: Seq[(String, String)],
      topWords: Int, maxLen: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    graft.plans.GraftFunctions.register(spark)
    var words = wordHistogram(docs, textCol, topWords, maxLen)
      .withColumn("toks", expr(
        "concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)), array('</w>'))"))
    // call_function, NOT expr-string interpolation: encode() is a
    // public API taking arbitrary merge symbols, and a quote inside a
    // symbol would break (or inject into) interpolated SQL text —
    // lit() carries the symbol as a value, never as syntax (r9 ADVICE).
    for ((l, r) <- merges)
      words = words.withColumn("toks",
        call_function("bpe_merge", col("toks"), lit(l), lit(r)))
    words.withColumn("n_subwords", size(col("toks")))
  }
}

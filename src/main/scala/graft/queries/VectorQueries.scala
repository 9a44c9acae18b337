package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Similarity

/** Similarity-search queries over the `embeddings` table
  * (`vec_id, embedding: array<float>, label`).
  *
  * q34 (brute-force) is oracle-checked: DuckDB's
  * `list_cosine_similarity` over the embedding cast to DOUBLE[] performs
  * the same sequential double accumulation as the native
  * [[graft.plans.CosineSimilarity]] expression, and ranking orders by
  * the similarity rounded to 1e-6 (tie-break vec_id) on both sides so
  * float jitter cannot flip ranks. q35 (LSH) uses xxhash64-derived
  * hyperplanes DuckDB cannot replicate → rows-only + ScalaTest recall
  * checks.
  */
object VectorQueries {

  private val NQueries = 5

  /** Brute-force exact cosine top-10 for the first five vectors. */
  def q34KnnBruteForce(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(s, emb, emb.filter(col("vec_id") < NQueries), k = 10)
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed approximate top-10 for the same query set, annotated
    * with per-query recall against the exact result so the rows-only
    * check is self-evidencing (the dumped output carries its own
    * quality measure). */
  def q35KnnLsh(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < NQueries)
    Similarity.recallVsExact(
        Similarity.lshTopK(s, emb, q, k = 10, nBits = 8),
        Similarity.bruteForceTopK(s, emb, q, k = 10), k = 10)
      .orderBy("query_id", "rank")
  }

  /** IVF-bucketed approximate top-10 (rows-only: centroid choice is an
    * engine detail), annotated with per-query recall against the exact
    * result — same self-evidencing pattern as q35. */
  def q43KnnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < NQueries)
    Similarity.recallVsExact(
        Similarity.ivfTopK(s, emb, q, k = 10, nCentroids = 16, nProbe = 4),
        Similarity.bruteForceTopK(s, emb, q, k = 10), k = 10)
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_knn_bruteforce" -> (q34KnnBruteForce _),
    "q35_knn_lsh" -> (q35KnnLsh _),
    "q43_knn_ivf" -> (q43KnnIvf _)
  )

  val oracles: Map[String, String] = Map(
    "q34_knn_bruteforce" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
         |  FROM embeddings WHERE vec_id < $NQueries),
         |scored AS (
         |  SELECT q.query_id, e.vec_id,
         |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb), 6) AS sim
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id <> q.query_id)
         |SELECT query_id, vec_id, sim,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INT) AS rank
         |FROM scored
         |QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion operators for hybrid retrieval — combining a lexical
  * ranking (BM25) with a dense-vector ranking into one result list,
  * the standard first stage of a RAG retrieval stack.
  *
  * Reciprocal-rank fusion (Cormack et al., SIGIR 2009):
  * `fused(d) = Σ_lists 1 / (C + rank_list(d))` with C = 60. RRF only
  * consumes RANKS, so it needs no score calibration between lists
  * whose scores live on incomparable scales (BM25 logs vs cosine).
  *
  * Scale design: each input list is already top-k per query (tiny per
  * query — k·|lists| candidate rows), so fusion is a union + one
  * aggregate + one query-partitioned window over ≤ k·|lists| rows per
  * partition. Nothing rescans the corpus: at 100 TB the expensive
  * stages are the per-list retrievers (which have their own index
  * paths — BM25 postings, IVF/PQ); fusion cost is proportional to the
  * RESULT sizes only.
  */
object Retrieval {

  /** Fuse ranked lists by RRF. Each input frame must carry
    * `query_id, doc_id, rank` (rank 1-based within its list and
    * query). Returns top-`topK` per query by fused score:
    * `query_id, doc_id, rrf (rounded 1e-6), n_lists, fused_rank` —
    * ties broken by doc_id so the ranking is engine/run-stable.
    *
    * Determinism note: with two lists the two addends commute exactly
    * in IEEE arithmetic; for 3+ lists the 1e-6 rounding absorbs
    * summation-order jitter before the rank cut. */
  def rrfFusion(lists: Seq[DataFrame], c: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    val tagged = lists
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
    val fused = tagged.groupBy("query_id", "doc_id")
      .agg(round(sum(lit(1.0) / (lit(c) + col("rank"))), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused
      .withColumn("fused_rank", row_number().over(w).cast("int"))
      .filter(col("fused_rank") <= topK)
  }
}

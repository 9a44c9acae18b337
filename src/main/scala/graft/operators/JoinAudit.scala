package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** Join fan-out audit — the pre-flight check a 100 TB warehouse runs
  * BEFORE an unfamiliar join: per-key multiplicities on both sides,
  * the exact output cardinality the join would produce
  * (Σ_k n_left(k)·n_right(k)), the amplification factor versus the
  * larger input, and the hottest keys — the information that decides
  * broadcast vs shuffle vs salt (q131) vs "don't run this".
  *
  * Scale shape: each side pays ONE map-side-combinable aggregate down
  * to its key histogram; the histograms (|keys| rows, not |rows|)
  * join on the key — the only shuffle proportional to key cardinality,
  * never to data volume, and strictly cheaper than running the join
  * being audited. Constants ride in-row (q86 convention); per-key
  * products are exact integer-valued doubles below 2^53 (the Int64-
  * overflow-safe representation, per the Cooccur/InfoTheory review).
  */
object JoinAudit {

  /** Top-`k` hottest join keys by output contribution, with in-row
    * audit constants: `est_join_rows` (exact, as a double),
    * `n_keys_matched`, `n_m2m_keys` (many-to-many keys — the salting
    * candidates), and `amplification` = est rows / max(input rows). */
  def fanout(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, k: Int = 20): DataFrame = {
    // each input is scanned EXACTLY once: the key histograms are
    // lazily checkpointed (they are |keys|-sized, the audit's working
    // set) and the input totals derive from the histograms (Σ n =
    // count(*)) instead of fresh table scans; `matched` is consumed by
    // both the constants aggregate and the top-k, so it is
    // checkpointed too (review finding — the q178 replay lesson)
    val lh = left.groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("n_l"))
      .transform(Pin.lazily)
    val rh = right.groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("n_r"))
      .transform(Pin.lazily)
    val matched = lh.join(rh, Seq("key"))
      .withColumn("out_rows", col("n_l").cast("double") * col("n_r"))
      .transform(Pin.lazily)
    val consts = matched.agg(
        sum("out_rows").as("est_join_rows"),
        count(lit(1)).as("n_keys_matched"),
        sum((col("n_l") > 1 && col("n_r") > 1).cast("long")).as("n_m2m_keys"))
      .crossJoin(broadcast(lh.agg(sum("n_l").as("__nl"))))
      .crossJoin(broadcast(rh.agg(sum("n_r").as("__nr"))))
      .select(
        coalesce(col("est_join_rows"), lit(0.0)).as("est_join_rows"),
        col("n_keys_matched"), col("n_m2m_keys"),
        round(coalesce(col("est_join_rows"), lit(0.0)) /
          greatest(col("__nl"), col("__nr")), 4).as("amplification"))
    Ranking.topK(matched, k, col("out_rows").desc, col("key"))
      .crossJoin(broadcast(consts))
      .select(col("rank"), col("key"), col("n_l"), col("n_r"), col("out_rows"),
        col("est_join_rows"), col("n_keys_matched"), col("n_m2m_keys"),
        col("amplification"))
      .orderBy("rank")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** Skew-safe equi-join via key salting — the standard remedy when one
  * join key carries a disproportionate share of the fact side and a
  * plain shuffle join funnels that key's rows through ONE reducer
  * (the classic 100 TB stall: 999 tasks finish in seconds, task 1000
  * runs for hours). AQE's skew-join handling splits oversized
  * PARTITIONS after the fact; salting removes the hot key at plan
  * time and also covers the cases AQE cannot — aggregation above the
  * join keyed by the same column, or a sort-merge join the planner
  * locked in before runtime stats existed.
  *
  * Mechanics: every fact row gets a salt in [0, salts) that is
  * UNCORRELATED with the join key (round-robin by partition-local row
  * position — deterministic cost shape, and result-invariant because
  * ANY salt assignment joins correctly); the dim side replicates ×
  * `salts` via one `explode` of a literal range; the join runs on
  * (key, salt), so a key's rows spread over `salts` reducers. Output
  * = exactly the plain join's rows (salt dropped) — which is what
  * lets a DuckDB oracle state the PLAIN join and hash-check the
  * salted plan.
  *
  * Cost contract: the dim side is scanned once and shuffled ×salts —
  * use only when the dim is too big to broadcast (a broadcast join
  * has no skew problem) and the fact side skews. */
object SkewJoin {

  /** Pre-join skew audit — the diagnosis that decides between a plain
    * shuffle join, [[saltedEquiJoin]], and a broadcast: per join key
    * (top `topN` by join work), both sides' row counts, the key's
    * OUTPUT contribution left_n·right_n (the reducer that would build
    * it), and in-row totals: total output rows, the top-1 key's share
    * of output (the straggler predictor — one reducer owns that
    * share under a plain hash join), and both sides' key counts.
    *
    * Scale shape: one value-count aggregate per side, an inner join of
    * the two COUNT frames (key-cardinality-sized, never the data),
    * and a distributed top-N on the product. Counts/products exact
    * (below 2⁶³ for any real key); the share is an unrounded
    * exact-long ratio. */
  def skewReport(left: DataFrame, right: DataFrame, keys: Seq[String],
      topN: Int = 20): DataFrame = {
    require(keys.nonEmpty, "skewReport needs join keys")
    val k = keys.map(col)
    def counts(df: DataFrame, out: String) =
      df.select(k: _*).na.drop(keys)
        .groupBy(k: _*).agg(count(lit(1)).as(out))
    val joined = counts(left, "left_n").join(counts(right, "right_n"), keys)
      .withColumn("out_n", col("left_n") * col("right_n"))
      .transform(Pin.lazily) // totals + top-N both read it
    val tot = joined.agg(
      coalesce(sum("out_n"), lit(0L)).as("__tot"),
      coalesce(max("out_n"), lit(0L)).as("__max"),
      count(lit(1)).as("__nkeys"))
    val top = Ranking.topK(joined, topN, (col("out_n").desc +: k): _*)
    top.crossJoin(broadcast(tot))
      .select((k :+ col("rank")) ++ Seq(col("left_n"), col("right_n"),
        col("out_n"),
        col("__tot").as("total_output_rows"),
        (col("__max") / greatest(col("__tot"), lit(1L))).as("top1_share"),
        col("__nkeys").as("n_join_keys")): _*)
      .orderBy("rank")
  }

  /** Inner equi-join of `fact` ⨝ `dim` on `keys`, salted `salts` ways.
    * Column sets must be disjoint apart from `keys` (standard join
    * hygiene; the result carries keys + both sides' payloads). */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be positive")
    // The salt MUST be deterministic per row content: it becomes a
    // shuffle key, and a non-deterministic one (row position, random)
    // is the classic stage-retry hazard — a recomputed map task would
    // re-salt its rows onto different reducers while completed reduce
    // outputs keep the old assignment, silently duplicating/dropping
    // join rows (the reason Spark sorts before round-robin
    // repartition, SPARK-23207). Hashing the WHOLE row decorrelates
    // the salt from the join key (payload columns vary within a key);
    // fully identical duplicate rows share a salt, which costs spread
    // only in the pathological all-columns-duplicated case.
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}

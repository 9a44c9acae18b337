package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-engine HyperLogLog (Flajolet, Fuss, Gandouet, Meunier,
  * AofA 2007) built from the md5 hash family — the oracle-replicable
  * counterpart of Spark's built-in `approx_count_distinct` (q62,
  * whose HLL++ register bits are engine-internal and keep that query
  * rows-only). Every step here is integer arithmetic both engines
  * compute identically from the md5 hex string:
  *
  *  - h  = first 15 md5 hex digits of the key as a 60-bit integer
  *    (`('0x' || substr(md5(k), 1, 15))::BIGINT`);
  *  - register j = h mod m (m = 2^b registers), payload w = h div m
  *    (a W = 60−b bit word);
  *  - rank r = W + 1 − bitlength(w), with bitlength read EXACTLY as
  *    `length(bin(w))` — both engines' `bin()` prints without leading
  *    zeros, so no floating log2 whose last-ulp could flip a
  *    boundary; w = 0 → r = W + 1;
  *  - register value M_j = max rank; absent registers count as 0.
  *
  * The estimate keeps the harmonic sum INTEGER-EXACT by scaling:
  * S = Σ_j 2^(W+1−M_j) (≤ m·2^(W+1) < 2⁶², no overflow, and a sum of
  * integers is order-independent — the reason the raw float
  * Σ 2^(−M_j) would NOT be cross-engine-stable), then
  * E = K / S with K = α_m · m² · 2^(W+1) COLLAPSED to a single
  * double literal on the driver and ONE IEEE division per group: a
  * multi-term float expression in SQL TEXT is not portable (Spark
  * parses `0.7213` as DECIMAL and runs the whole chain in decimal
  * arithmetic — caught by the oracle differing in the 4th decimal of
  * rel_err), while literal-parse + one division is bit-deterministic
  * on any IEEE-754 engine. The small/large-range corrections of the
  * paper are deliberately omitted: linear counting needs ln(), whose
  * libm values differ across engines — this is the raw-HLL core,
  * accurate to ~1.04/√m once n ≳ 3m.
  *
  * Scale shape: one partial-aggregating shuffle on (groups, j) —
  * m-bounded per group — then an m-row-per-group reduce; the sketch
  * never materializes per-row state and merges associatively, exactly
  * how a 1000-executor cardinality rollup wants to run. */
object Hll {

  /** Per-group raw-HLL distinct estimate of `keyCol`. Output:
    * groupCols + (`hll_estimate` double rounded 2, `n_registers_set`
    * long). b = register-index bits (m = 2^b). */
  def estimateDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String],
      b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, "b must be in [4, 16]")
    val m = 1 << b
    val W = 60 - b
    val h = s"cast(conv(substring(md5(cast($keyCol as string)), 1, 15), 16, 10) as bigint)"
    val regs = df
      .selectExpr(groupCols ++ Seq(s"pmod($h, $m) AS __j", s"($h div $m) AS __w"): _*)
      .selectExpr(groupCols ++ Seq("__j",
        s"CASE WHEN __w > 0 THEN ${W + 1} - length(bin(__w)) ELSE ${W + 1} END AS __r"): _*)
      .groupBy((groupCols :+ "__j").map(col): _*)
      .agg(max("__r").as("__M"))
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr(s"shiftleft(cast(1 as bigint), ${W + 1} - __M)")).as("__Sset"),
        count(lit(1)).as("n_registers_set"))
      // absent registers carry M = 0, i.e. 2^(W+1) each
      .withColumn("__S",
        col("__Sset") + (lit(m.toLong) - col("n_registers_set")) * lit(1L << (W + 1)))
      .withColumn("hll_estimate",
        round(lit(0.7213 / (1.0 + 1.079 / m) * m * m * (1L << (W + 1)).toDouble)
          / col("__S"), 2))
      .drop("__Sset", "__S")
  }
}

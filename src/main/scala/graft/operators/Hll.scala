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
  * on any IEEE-754 engine.
  *
  * The paper's SMALL-RANGE correction is included (raw HLL
  * overestimates by +80% at n ≈ 0.6m, measured): when raw ≤ 2.5m and
  * empty registers exist, E = m·ln(m/V) with V = the exact integer
  * count of empty registers — linear counting (Whang et al. 1990).
  * ln() is the one libm call in the family; engines may differ by
  * 1-2 ulp there, but a 1e-16 relative shift crosses a 0.01 rounding
  * boundary with probability ~1e-11 per row — unlike the
  * DECIMAL-vs-double parse trap above (a 1e-6 SYSTEMATIC shift),
  * ulp-level noise is safely below the round(·, 2) contract. The
  * large-range correction is moot at a 60-bit hash.
  *
  * Scale shape: one partial-aggregating shuffle on (groups, j) —
  * m-bounded per group — then an m-row-per-group reduce; the sketch
  * never materializes per-row state and merges associatively, exactly
  * how a 1000-executor cardinality rollup wants to run. */
object Hll {

  /** Flajolet et al. 2007's bias constant α_m: the asymptotic
    * 0.7213/(1+1.079/m) holds only for m ≥ 128; below that the paper
    * tabulates α_16 = 0.673, α_32 = 0.697, α_64 = 0.709. Using the
    * asymptotic form at b ∈ {4,5,6} carried a systematic 2–7 %
    * over-bias (r9 ADVICE) — engine and oracle were consistent so
    * hashes matched, but estimates were wrong in absolute terms. */
  private[graft] def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** The persisted-sketch half: per-group register table
    * (groupCols..., `reg_j` int, `reg_m` int). This IS the mergeable
    * state — registers for any coarser grouping (or a later batch)
    * merge by max, so a daily register table answers any date-range
    * distinct query without re-reading data (the 100 TB cube pattern;
    * q140's additive-merge discipline, for a non-additive metric). */
  def registers(df: DataFrame, keyCol: String, groupCols: Seq[String],
      b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, "b must be in [4, 16]")
    val m = 1 << b
    val W = 60 - b
    val h = s"cast(conv(substring(md5(cast($keyCol as string)), 1, 15), 16, 10) as bigint)"
    df
      .selectExpr(groupCols ++ Seq(s"pmod($h, $m) AS reg_j", s"($h div $m) AS __w"): _*)
      .selectExpr(groupCols ++ Seq("reg_j",
        s"CASE WHEN __w > 0 THEN ${W + 1} - length(bin(__w)) ELSE ${W + 1} END AS __r"): _*)
      .groupBy((groupCols :+ "reg_j").map(col): _*)
      .agg(max("__r").as("reg_m"))
  }

  /** The estimate half: roll a register table up to `rollupCols`
    * (register max — associative/commutative/idempotent, so ANY
    * partitioning of the data into register tables merges exactly)
    * and apply the raw-HLL estimator. `b` must match the build. */
  def estimateFromRegisters(regs: DataFrame, rollupCols: Seq[String],
      b: Int = 8): DataFrame = {
    val m = 1 << b
    val W = 60 - b
    regs
      .groupBy((rollupCols :+ "reg_j").map(col): _*)
      .agg(max("reg_m").as("__M"))
      .groupBy(rollupCols.map(col): _*)
      .agg(
        sum(expr(s"shiftleft(cast(1 as bigint), ${W + 1} - __M)")).as("__Sset"),
        count(lit(1)).as("n_registers_set"))
      // absent registers carry M = 0, i.e. 2^(W+1) each
      .withColumn("__S",
        col("__Sset") + (lit(m.toLong) - col("n_registers_set")) * lit(1L << (W + 1)))
      .withColumn("__raw", lit(alpha(m) * m * m * (1L << (W + 1)).toDouble)
          / col("__S"))
      // small-range: V empty registers → linear counting m·ln(m/V)
      .withColumn("hll_estimate", expr(
        s"""round(CASE WHEN __raw <= ${2.5 * m} AND $m - n_registers_set > 0
           |  THEN $m * ln($m / cast($m - n_registers_set as double))
           |  ELSE __raw END, 2)""".stripMargin))
      .drop("__Sset", "__S", "__raw")
  }

  /** Per-group raw-HLL distinct estimate of `keyCol` in one pass —
    * [[registers]] composed with [[estimateFromRegisters]]. Output:
    * groupCols + (`hll_estimate` double rounded 2, `n_registers_set`
    * long). b = register-index bits (m = 2^b). */
  def estimateDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String],
      b: Int = 8): DataFrame =
    estimateFromRegisters(registers(df, keyCol, groupCols, b), groupCols, b)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** Distribution-drift monitoring between two corpus snapshots — the
  * check a production training pipeline runs beside every refresh
  * (q125's diff says WHICH docs changed; this says whether the
  * corpus's STATISTICS moved): Population Stability Index over a
  * fixed-width histogram of a numeric feature,
  *
  *   PSI = Σ_bins (p_new − p_old) · ln(p_new / p_old)
  *
  * with the conventional gates PSI < 0.1 stable / < 0.25 drifting /
  * else shifted (the credit-scoring heuristic the industry reuses).
  *
  * Scale shape: each snapshot pays ONE aggregate to bin-counts
  * (map-side combine, ≤ nBins rows out); the bin frame is generated
  * (`sequence`), both count sets broadcast-join onto it, and every
  * downstream number is arithmetic over a ≤ nBins-row frame —
  * driver-scale by construction, the q127 histogram discipline. Bins
  * anchor on the OLD snapshot's [min, max] (the monitored baseline);
  * new-snapshot outliers clamp into the edge bins, which is exactly
  * what a monitor wants to see (mass piling at an edge = drift).
  * Add-half smoothing keeps ln defined on empty bins (the q97
  * convention), so the operator is total and DuckDB-replicable. */
object Drift {

  /** Per-bin drift report + PSI total (same value on every row, q86
    * in-row-constant convention). `p_old`/`p_new` are the smoothed
    * proportions; `psi` sums the UNROUNDED contributions and rounds
    * once. */
  def histogramPsi(oldDf: DataFrame, newDf: DataFrame, valueCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "nBins must be positive")
    val spark = oldDf.sparkSession
    val v = col(valueCol).cast("double")
    val anchor = broadcast(oldDf.agg(
      min(v).as("__lo"), max(v).as("__hi")))
    // null values are EXCLUDED from the histogram: Spark's
    // greatest/least skip nulls, so an unfiltered null row would
    // silently clamp into bin 0 and report spurious drift mass there
    def binCounts(df: DataFrame, cName: String) = df.filter(v.isNotNull)
      .crossJoin(anchor)
      .select(when(col("__hi") === col("__lo"), lit(0)).otherwise(
        least(greatest(floor((v - col("__lo")) / (col("__hi") - col("__lo")) * nBins)
          .cast("int"), lit(0)), lit(nBins - 1))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(cName))
    val bins = spark.range(nBins).select(col("id").cast("int").as("bin"))
    val joined = bins
      .join(broadcast(binCounts(oldDf, "n_old")), Seq("bin"), "left")
      .join(broadcast(binCounts(newDf, "n_new")), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val totals = broadcast(joined.agg(
      sum("n_old").as("__to"), sum("n_new").as("__tn")))
    val scored = joined.crossJoin(totals)
      .withColumn("__po", (col("n_old") + 0.5) / (col("__to") + lit(0.5) * nBins))
      .withColumn("__pn", (col("n_new") + 0.5) / (col("__tn") + lit(0.5) * nBins))
      .withColumn("__contrib", (col("__pn") - col("__po")) * log(col("__pn") / col("__po")))
    val psi = broadcast(scored.agg(round(sum("__contrib"), 6).as("psi")))
    scored.crossJoin(psi)
      .select(col("bin"), col("n_old"), col("n_new"),
        round(col("__po"), 6).as("p_old"),
        round(col("__pn"), 6).as("p_new"),
        round(col("__contrib"), 6).as("psi_contrib"),
        col("psi"),
        when(col("psi") < 0.1, lit("stable"))
          .when(col("psi") < 0.25, lit("drifting"))
          .otherwise(lit("shifted")).as("verdict"))
  }

  /** Token-distribution divergence between two sub-corpora — the
    * TOKEN-SPACE drift monitor beside [[histogramPsi]]'s numeric one
    * (a corpus refresh can leave every length/score histogram intact
    * while the vocabulary shifts under it): symmetric Jensen–Shannon
    * divergence over add-half-smoothed unigram distributions on the
    * UNION vocabulary, with both one-sided KLs and the top token
    * contributions for attribution.
    *
    * Scale shape: each side pays one token explode + count aggregate;
    * everything after is arithmetic over the union-vocab count table
    * (full outer join of two vocab-sized frames). JS ∈ [0, ln 2];
    * contributions round 6 AFTER the (vocab-bounded) sums. */
  def tokenDivergence(corpusA: DataFrame, corpusB: DataFrame,
      textCol: String = "text", topK: Int = 20): DataFrame = {
    def counts(df: DataFrame, cName: String) = df
      .select(explode(graft.functions.TextFunctions.tokens(textCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as(cName))
    // lazily checkpointed: the vocab stats, the divergence totals, and
    // the top-k all consume this frame — without the checkpoint each
    // replays both token explodes + aggregates (review finding, the
    // q178 replay lesson); the frame is vocab-sized, tiny vs the corpus
    val joined = counts(corpusA, "n_a").join(counts(corpusB, "n_b"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .transform(Pin.lazily)
    val vocab = joined.agg(count(lit(1)).as("__v"),
      sum("n_a").as("__ta"), sum("n_b").as("__tb"))
    val scored = joined.crossJoin(broadcast(vocab))
      .withColumn("__pa", (col("n_a") + 0.5) / (col("__ta") + lit(0.5) * col("__v")))
      .withColumn("__pb", (col("n_b") + 0.5) / (col("__tb") + lit(0.5) * col("__v")))
      .withColumn("__pm", (col("__pa") + col("__pb")) / 2)
      .withColumn("__kl_ab", col("__pa") * log(col("__pa") / col("__pb")))
      .withColumn("__kl_ba", col("__pb") * log(col("__pb") / col("__pa")))
      .withColumn("__js", (col("__pa") * log(col("__pa") / col("__pm")) +
        col("__pb") * log(col("__pb") / col("__pm"))) / 2)
    val totals = broadcast(scored.agg(
      round(sum("__kl_ab"), 6).as("kl_ab"),
      round(sum("__kl_ba"), 6).as("kl_ba"),
      round(sum("__js"), 6).as("js")))
    // distributed top-k over the vocab frame ([[Ranking.topK]]: no
    // single-partition window over the vocabulary)
    Ranking.topK(scored.withColumn("js_contrib", round(col("__js"), 6)),
        topK, col("js_contrib").desc, col("token"))
      .crossJoin(totals)
      .select(col("rank"), col("token"), col("n_a"), col("n_b"),
        col("js_contrib"), col("kl_ab"), col("kl_ba"), col("js"))
      .orderBy("rank")
  }

  /** Keyness: the terms most DISTINCTIVE of corpus A vs corpus B, by
    * per-term 2×2 chi-square (Kilgarriff 2001's corpus-comparison
    * statistic; a,b = term counts, c,d = rest-of-corpus counts):
    *
    *   χ² = N(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * plus a smoothed log-odds direction ln((a+½)(d+½)/((b+½)(c+½))) —
    * χ² says HOW distinctive, the sign says FOR WHICH corpus. This is
    * the per-term attribution q183's corpus-level JS total doesn't
    * give: divergence says the corpora moved, keyness names the words.
    *
    * Determinism: all eight cell inputs are exact integers; the χ²
    * products exceed 2⁵³ at corpus scale so both engines compute them
    * in IEEE double — same literal expression, same rounding path —
    * and the top-k ranks on round(χ², 4) with a term tie-break (the
    * q184 rounded-rank discipline). Scale shape: one aggregate per
    * corpus to vocab-sized count frames, a full-outer vocab join,
    * arithmetic, then a distributed top-k ([[Ranking.topK]]) — the
    * corpus is read once per side and never re-shuffled. */
  def keyness(corpusA: DataFrame, corpusB: DataFrame,
      textCol: String = "text", topK: Int = 20): DataFrame = {
    def counts(df: DataFrame, cName: String) = df
      .select(explode(graft.functions.TextFunctions.tokens(textCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as(cName))
    val joined = counts(corpusA, "n_a").join(counts(corpusB, "n_b"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .transform(Pin.lazily)
    val totals = joined.agg(sum("n_a").as("__ta"), sum("n_b").as("__tb"))
    val cells = joined.crossJoin(broadcast(totals))
      .withColumn("__aa", col("n_a").cast("double"))
      .withColumn("__bb", col("n_b").cast("double"))
      .withColumn("__cc", (col("__ta") - col("n_a")).cast("double"))
      .withColumn("__dd", (col("__tb") - col("n_b")).cast("double"))
      .withColumn("__n", (col("__ta") + col("__tb")).cast("double"))
    // (ad−bc)² as an explicit product, not pow(x, 2): pow carries a
    // 1-ulp license in both engines, the product is a single exact-
    // rounded IEEE op — identical bits either side
    val det = col("__aa") * col("__dd") - col("__bb") * col("__cc")
    val scored = cells
      .withColumn("chi2", round(
        col("__n") * (det * det) /
          ((col("__aa") + col("__bb")) * (col("__cc") + col("__dd")) *
            col("__ta").cast("double") * col("__tb").cast("double")), 4))
      .withColumn("log_odds", round(
        log((col("__aa") + 0.5) * (col("__dd") + 0.5) /
          ((col("__bb") + 0.5) * (col("__cc") + 0.5))), 6))
      .where(col("__ta") > 0 && col("__tb") > 0 &&
        col("__cc") + col("__dd") > 0)
    Ranking.topK(scored, topK, col("chi2").desc, col("token"))
      .select(col("rank"), col("token"), col("n_a"), col("n_b"),
        col("chi2"), col("log_odds"),
        when(col("log_odds") > 0, lit("A")).otherwise(lit("B")).as("key_for"))
      .orderBy("rank")
  }
}

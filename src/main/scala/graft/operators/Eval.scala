package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** Model-evaluation metrics computed exactly at corpus scale — the
  * readouts that decide whether a quality classifier (q107) or scoring
  * rule is allowed to gate a pipeline.
  *
  * AUC is computed by the Mann–Whitney rank identity with average
  * ranks for ties:
  *
  *   AUC = (Σ_pos avgrank − n⁺(n⁺+1)/2) / (n⁺·n⁻)
  *
  * — exactly the probability a random positive outranks a random
  * negative (ties count ½), with NO threshold sweep or curve
  * discretization. Scale shape: one rank window partitioned by the
  * evaluation group (per-group sort, no global ordering), a tie-count
  * window over the same partitioning, then a 1-row-per-group
  * aggregate. Average ranks are k + (tie−1)/2 — halves, exact in
  * double; count products cast to double before multiplying (the
  * Int64-overflow discipline). Groups without both classes have no
  * ranking to measure and are excluded. */
object Eval {

  /** Exact tie-aware AUC per group: (group, n_pos, n_neg, auc round 6).
    * `labelCol` must be 0/1 (cast to int); null labels or scores drop
    * the row. */
  def aucByGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      labelCol: String): DataFrame = {
    val g = groupCols.map(col)
    val data = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select((g :+ col(scoreCol).cast("double").as("__s")) :+
        col(labelCol).cast("int").as("__y"): _*)
    val wRank = Window.partitionBy(g: _*).orderBy(col("__s"))
    val wTie = Window.partitionBy((g :+ col("__s")): _*)
    val ranked = data
      .withColumn("__minrank", rank().over(wRank))
      .withColumn("__tie", count(lit(1)).over(wTie))
      .withColumn("__avgrank", col("__minrank") + (col("__tie") - 1) / 2.0)
    ranked.groupBy(g: _*)
      .agg(
        sum(col("__y").cast("long")).as("n_pos"),
        sum((lit(1) - col("__y")).cast("long")).as("n_neg"),
        sum(when(col("__y") === 1, col("__avgrank"))).as("__sumrank"))
      .where(col("n_pos") > 0 && col("n_neg") > 0)
      .select((g ++ Seq(col("n_pos"), col("n_neg"),
        round((col("__sumrank") - col("n_pos").cast("double") * (col("n_pos") + 1) / 2) /
          (col("n_pos").cast("double") * col("n_neg")), 6).as("auc"))): _*)
      .orderBy(g: _*)
  }

  /** Top-k ranking metrics per group — the retrieval readout beside
    * AUC's classification readout: for each group, rank items by
    * (score DESC, id ASC — deterministic ties), cut at k, and report
    *
    *   - nDCG@k  = DCG@k / IDCG@k with linear gain rel/log2(pos+1);
    *     IDCG ranks by rel itself (order within equal rel is
    *     irrelevant to the sum), null when the group has no positive
    *     relevance anywhere (no ranking to measure — the q180
    *     exclusion discipline, but kept as a visible null row since
    *     precision/MRR still apply);
    *   - precision@k = share of the top k with rel > 0;
    *   - mrr@k = 1/(first relevant rank), 0 if none in the top k.
    *
    * `relCol` must be integer-valued grades ≥ 0; null rel or score
    * drops the row. Scale shape: two rank windows partitioned by the
    * group (per-group sort, no global order) + a 1-row-per-group
    * aggregate; at heavy per-group cardinality compose with the
    * native `topk_agg` (q179) to cut before ranking — the window
    * formulation IS the oracle here, so the driver proof stays on the
    * simple shape. Doubles: rel and k are exact ints; DCG terms are
    * int/log2(int) — identical IEEE inputs both engines, round 6. */
  def rankingMetrics(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      relCol: String, idCol: String, k: Int): DataFrame = {
    val g = groupCols.map(col)
    val data = df
      .filter(col(scoreCol).isNotNull && col(relCol).isNotNull)
      .select((g :+ col(scoreCol).cast("double").as("__s")) ++
        Seq(col(relCol).cast("long").as("__rel"), col(idCol).as("__id")): _*)
    val wScore = Window.partitionBy(g: _*).orderBy(col("__s").desc, col("__id"))
    val wIdeal = Window.partitionBy(g: _*).orderBy(col("__rel").desc, col("__id"))
    // ONE conditional aggregate over the doubly-ranked frame — not two
    // aggregates joined back together: the actual@k and ideal@k sums
    // are independent per-row conditions on the same partitioning, so
    // a second pass + join would only recompute the scan and both rank
    // windows (review finding on this tranche)
    val ranked = data
      .withColumn("__r", row_number().over(wScore))
      .withColumn("__ri", row_number().over(wIdeal))
    val agged = ranked
      .groupBy(g: _*)
      .agg(
        sum(when(col("__r") <= k, col("__rel") / log2(col("__r") + 1))).as("__dcg"),
        sum(when(col("__r") <= k && col("__rel") > 0, 1).otherwise(0)).as("__nrel"),
        max(when(col("__r") <= k && col("__rel") > 0, lit(1.0) / col("__r"))).as("__bestinv"),
        sum(when(col("__r") <= k, 1).otherwise(0)).as("n_ranked"),
        sum(when(col("__ri") <= k, col("__rel") / log2(col("__ri") + 1))).as("__idcg"))
    agged
      .select((g ++ Seq(
        col("n_ranked"),
        when(col("__idcg") > 0, round(col("__dcg") / col("__idcg"), 6))
          .as("ndcg"),
        round(col("__nrel").cast("double") / lit(k), 6).as("p_at_k"),
        round(coalesce(col("__bestinv"), lit(0.0)), 6).as("mrr"))): _*)
      .orderBy(g: _*)
  }

  /** Decile lift / gains table — the targeting readout beside AUC:
    * bucket the population by score band (1 = highest scores), and per
    * bucket report size, positives, positive rate, cumulative capture
    * (share of ALL positives reached by this bucket and better ones)
    * and lift vs the base rate.
    *
    * Buckets come from [[Quantiles.bandCuts]] score thresholds, NOT an
    * unpartitioned `ntile(10)` (the single-ordering-spine anti-pattern
    * — see bandCuts): assignment is a row-local comparison against a
    * broadcast 1-row cut frame, and tied scores always share a bucket
    * — the statistically honest choice, since equal scores are
    * indistinguishable to the model; bucket sizes wobble around
    * n/nBuckets instead of hiding arbitrary tie splits. The per-bucket
    * cumulative window runs over ≤ nBuckets rows.
    *
    * Determinism: counts are integers, rates/lift are single divisions
    * of exact integers rounded at 6 — no accumulation-order exposure. */
  /** Murphy decomposition of the Brier score (Murphy 1973) — the
    * calibration diagnosis behind a single "brier = X" number: over
    * `nBins` equal-width probability bins,
    *
    *   reliability = Σ nₖ(p̄ₖ − ȳₖ)²/N   (calibration error — down is good)
    *   resolution  = Σ nₖ(ȳₖ − ȳ)²/N    (discrimination — up is good)
    *   uncertainty = ȳ(1 − ȳ)           (the data's irreducible floor)
    *
    * with brier ≈ reliability − resolution + uncertainty (exact when
    * forecasts are bin-constant). One row per non-empty bin (n, mean
    * predicted, observed frequency) with the four scalars in-row (q86
    * convention). Scale shape: one row-local bin assignment, one bin
    * aggregate (≤nBins cells), scalar arithmetic on the cell frame.
    * Aggregated doubles round at 6 (the q55 discipline). */
  def brierDecomposition(df: DataFrame, probCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "nBins must be at least 2")
    val p = col(probCol).cast("double")
    val y = col(labelCol).cast("double")
    val binned = df.filter(p.isNotNull && y.isNotNull)
      .select(p.as("__p"), y.as("__y"),
        least(floor(p * nBins).cast("int"), lit(nBins - 1)).as("bin"))
    val cells = binned.groupBy("bin")
      .agg(count(lit(1)).as("n"), avg("__p").as("__mp"), avg("__y").as("__fy"))
      .transform(Pin.lazily) // scalars + output both read the cells
    val brier = binned.agg(
      avg((col("__p") - col("__y")) * (col("__p") - col("__y"))).as("__brier"))
    val tot = cells.agg(sum("n").as("__N"),
      (sum(col("__fy") * col("n")) / sum("n")).as("__ybar"))
    val scal = cells.crossJoin(broadcast(tot)).agg(
      (sum(col("n") * (col("__mp") - col("__fy")) * (col("__mp") - col("__fy")))
        / first("__N")).as("__rel"),
      (sum(col("n") * (col("__fy") - col("__ybar")) * (col("__fy") - col("__ybar")))
        / first("__N")).as("__res"),
      (first("__ybar") * (lit(1.0) - first("__ybar"))).as("__unc"))
    cells.crossJoin(broadcast(brier)).crossJoin(broadcast(scal))
      .select(col("bin"), col("n"),
        round(col("__mp"), 6).as("mean_predicted"),
        round(col("__fy"), 6).as("frac_positive"),
        round(col("__brier"), 6).as("brier"),
        round(col("__rel"), 6).as("reliability"),
        round(col("__res"), 6).as("resolution"),
        round(col("__unc"), 6).as("uncertainty"))
      .orderBy("bin")
  }

  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
      nBuckets: Int = 10): DataFrame = {
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("int")
    // pinned: the quantile passes and the banding projection would
    // otherwise each replay the scored frame's lineage (the q178
    // lesson — a scored frame is often an expensive upstream plan)
    val data = df.filter(s.isNotNull && y.isNotNull)
      .select(s.as("__s"), y.as("__y"))
      .transform(Pin.lazily)
    val cuts = Quantiles.bandCuts(data, "__s", nBands = nBuckets, prefix = "b")
    // ascending band 1..n, flipped so bucket 1 = best scores
    val banded = data.crossJoin(broadcast(cuts))
      .withColumn("bucket", lit(nBuckets + 1) -
        Quantiles.bandExpr(col("__s"), (1 until nBuckets).map(i => col(s"b_c$i"))))
    val perBucket = banded.groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("__y").cast("long")).as("n_pos"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = perBucket.agg(sum("n").as("__tn"), sum("n_pos").as("__tp"))
    perBucket
      .withColumn("cum_pos", sum("n_pos").over(wCum))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), col("n"), col("n_pos"),
        round(col("n_pos") / col("n").cast("double"), 6).as("pos_rate"),
        when(col("__tp") > 0,
          round(col("cum_pos") / col("__tp").cast("double"), 6)).as("capture"),
        when(col("__tp") > 0,
          round((col("n_pos") / col("n").cast("double")) /
            (col("__tp") / col("__tn").cast("double")), 6)).as("lift"))
      .orderBy("bucket")
  }

  /** Isotonic regression of a binary label on an ordered score bucket
    * (Pool-Adjacent-Violators, via the exact MINIMAX identity — Ayer
    * et al. 1955; Barlow & Brunk 1972): the monotone calibration map
    * production rankers use where Platt scaling's sigmoid shape
    * doesn't fit. fit(b) = max_{i≤b} min_{j≥b} mean(i..j), with
    * mean(i..j) the pooled positive rate of buckets i..j.
    *
    * Scale shape: PAV is a sequential pooling algorithm, but the
    * minimax identity is order-free — so the ROWS are touched by one
    * map-side-combinable (bucket → n, n_pos) aggregate, and the
    * O(B²) minimax runs on the B-row bucket frame: prefix sums (one
    * window over B aggregated rows), the i≤j pair frame (B²/2 rows),
    * a per-i suffix-min window, then a per-j max aggregate. All
    * arithmetic is integer prefix sums until each pair's single
    * division — exact, hashable, and restatable by any SQL engine
    * (this is the rare ITERATIVE-looking fit with a closed-form
    * oracle; contrast the float-iterative k-means family). */
  def isotonicCalibration(df: DataFrame, bucketCol: String,
      labelCol: String): DataFrame = {
    // the bucket frame feeds the prefix sums, both pair sides, and
    // the final join — checkpoint so the row-scale aggregate runs once
    val b = df.select(col(bucketCol).cast("long").as("bucket"),
        col(labelCol).cast("long").as("__y"))
      .where(col("bucket").isNotNull && col("__y").isNotNull)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"))
      .transform(Pin.lazily)
    // B aggregated rows from here on: the unpartitioned window is
    // constant-bounded (bucket-count), never row-scale
    val wCum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = b.withColumn("cn", sum("n").over(wCum))
      .withColumn("cp", sum("n_pos").over(wCum))
    val lo = pre.select(col("bucket").as("i"), col("n").as("ni"),
      col("n_pos").as("pi"), col("cn").as("cni"), col("cp").as("cpi"))
    val hi = pre.select(col("bucket").as("j"), col("cn").as("cnj"),
      col("cp").as("cpj"))
    val pairs = lo.crossJoin(hi).where(col("i") <= col("j"))
      .withColumn("mean_ij",
        (col("cpj") - col("cpi") + col("pi")).cast("double") /
          (col("cnj") - col("cni") + col("ni")))
    // R(i,b) = min_{j≥b} mean(i,j): per-i suffix min, evaluated at j=b
    val wSuf = Window.partitionBy("i").orderBy(col("j").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fit = pairs.withColumn("__r", min("mean_ij").over(wSuf))
      .groupBy(col("j").as("bucket"))
      .agg(max("__r").as("__fit")) // max over i≤b: exactly the rows with j=b
    b.join(fit, Seq("bucket"))
      .select(col("bucket"), col("n"), col("n_pos"),
        round(col("n_pos") / col("n").cast("double"), 6).as("raw_rate"),
        round(col("__fit"), 6).as("iso_rate"))
      .orderBy("bucket")
  }
}

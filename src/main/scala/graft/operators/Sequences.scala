package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** Sequence mining over per-key ordered event streams.
  *
  * Scale shape: the ONLY per-row window is partitioned by the sequence
  * key (user) and ordered by (time, tiebreak) — per-user event runs
  * are short and spread across executors, so the lead() pass is one
  * key shuffle with no global ordering anywhere. Everything after the
  * pair extraction operates on the |states|² transition cells, which
  * is tiny regardless of corpus size. The same two-phase shape holds
  * at 100 TB: heavy pass keyed and local, analytics on the reduced
  * matrix.
  */
object Sequences {

  /** First-order Markov transition matrix: for every observed (state →
    * next state) pair, the count and the row-normalized probability
    * P(next | state), plus each state's outgoing total. The tiebreak
    * column makes the sequence order (and therefore the matrix)
    * deterministic under equal timestamps. */
  def transitionMatrix(df: DataFrame, keyCol: String, tsCol: String,
      stateCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("next_state", lead(col(stateCol), 1).over(w))
      .where(col("next_state").isNotNull)
      .select(col(stateCol).as("state"), col("next_state"))

    pairs
      .groupBy("state", "next_state")
      .agg(count(lit(1)).as("n"))
      .withColumn("state_total", sum("n").over(Window.partitionBy(col("state"))))
      .withColumn("p", round(col("n").cast("double") / col("state_total"), 4))
      .orderBy("state", "next_state")
  }

  /** Converting-path census: for every occurrence of `target`, the
    * `depth` states immediately preceding it in the key's ordered
    * sequence, joined into one path string and counted corpus-wide.
    * Sequence starts shorter than `depth` pad with "(start)". Same
    * scale shape as [[transitionMatrix]]: one key-partitioned window
    * pass, then analytics on ≤|states|^depth path cells. */
  def precedingPaths(df: DataFrame, keyCol: String, tsCol: String,
      stateCol: String, tieCol: String, target: String, depth: Int = 3): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth out of range: $depth")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // a genuinely NULL state must not masquerade as sequence-start
    // padding: map it to its own sentinel BEFORE lagging, so only a
    // missing ROW (history shorter than depth) reads "(start)"
    val withLags = (1 to depth).foldLeft(
      df.withColumn("__st", coalesce(col(stateCol), lit("(null)")))) { (acc, i) =>
      acc.withColumn(s"__p$i", lag(col("__st"), i).over(w))
    }
    val pathCols = (depth to 1 by -1) // oldest first
      .map(i => coalesce(col(s"__p$i"), lit("(start)")))
    val paths = withLags
      .where(col(stateCol) === target)
      .select(concat_ws(" > ", pathCols: _*).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
    val total = paths.agg(coalesce(sum("n"), lit(0L)).as("total"))
    paths.crossJoin(broadcast(total))
      .select(col("path"), col("n"),
        round(col("n") / col("total").cast("double"), 6).as("share"))
      .orderBy("path")
  }

  /** Frequent CONTIGUOUS k-event subsequences (sequential n-gram
    * mining): every run of k consecutive states in a key's ordered
    * stream, with corpus-wide occurrence count and USER SUPPORT (the
    * share of keys exhibiting the gram at least once). Contiguity is
    * what distinguishes this from market-basket rules (q152, unordered
    * co-membership) and the k=2 special case from the Markov matrix
    * (q147, which normalizes per-state instead of per-corpus).
    *
    * Scale shape: the lead() pass is the one key-partitioned window
    * (the [[transitionMatrix]] discipline); gram cells are bounded by
    * |states|^k, and the user-support aggregate shuffles (gram, key)
    * pairs — at most one per event, map-side combinable. `minSupport`
    * filters on support, not raw count, so the result is scale-stable:
    * the same grams surface at sf0.01 and at 100 TB. */
  def frequentKGrams(df: DataFrame, keyCol: String, tsCol: String,
      stateCol: String, tieCol: String, k: Int = 3,
      minSupport: Double = 0.01): DataFrame = {
    require(k >= 2 && k <= 8, s"k out of range: $k")
    // a null key is not a user: excluded up front so the support
    // numerator (countDistinct, null-skipping) and denominator agree
    val data = df.filter(col(keyCol).isNotNull)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val withLeads = (1 until k).foldLeft(
      data.withColumn("__s0", coalesce(col(stateCol), lit("(null)")))) { (acc, i) =>
      acc.withColumn(s"__s$i", lead(col("__s0"), i).over(w))
    }
    val gram = concat_ws(" > ", (0 until k).map(i => col(s"__s$i")): _*)
    val grams = withLeads
      .where(col(s"__s${k - 1}").isNotNull) // complete grams only
      .select(gram.as("gram"), col(keyCol).as("__k"))
    val totalUsers = data.select(col(keyCol)).distinct()
      .agg(count(lit(1)).as("total_users"))
    grams.groupBy("gram")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("__k")).as("n_users"))
      .crossJoin(broadcast(totalUsers))
      .withColumn("support", round(col("n_users") / col("total_users").cast("double"), 6))
      .where(col("support") >= minSupport)
      .select("gram", "n_occurrences", "n_users", "support")
      .orderBy("gram")
  }

  /** Markov next-state BACKTEST — the held-out accuracy check that
    * turns the q147 transition matrix from a descriptive table into a
    * validated predictor: keys split train/test by the md5 hash bucket
    * (the q56 discipline — key-level, so no test key leaks sequence
    * context into training), the predictor is fit on TRAIN transitions
    * only (per state: argmax next-state count, ties → lexicographic
    * min — deterministic), and scored on TEST transitions. One row per
    * state: the prediction, train support, test count/correct/accuracy,
    * with the overall accuracy in-row (q86 convention).
    *
    * Scale shape: one key-partitioned lead() window builds all
    * transitions; fit and score are state-cell aggregates (≤|states|²);
    * the predictor joins back as a broadcast. Counts exact; the
    * accuracy divisions are single divisions of exact longs —
    * bit-identical in any engine — and therefore deliberately
    * UNROUNDED (the q212 lesson: rounding would only reintroduce the
    * decimal-half boundary hazard).
    *
    * Cold-start contract (explicit): a TEST transition whose state
    * never appeared in training has no prediction and is EXCLUDED —
    * `overall_accuracy` measures accuracy ON PREDICTABLE STATES, the
    * deployable-model question; a caller wanting coverage-penalized
    * accuracy left-joins the test pairs against this output. */
  def markovBacktest(df: DataFrame, keyCol: String, tsCol: String,
      stateCol: String, tieCol: String, trainPct: Int = 80): DataFrame = {
    val data = df.filter(col(keyCol).isNotNull)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = data
      .withColumn("__next", lead(col(stateCol), 1).over(w))
      .where(col("__next").isNotNull)
      .withColumn("__split",
        when(Curation.hashBucket(col(keyCol)) < trainPct, "train")
          .otherwise("test"))
      .select(col(stateCol).as("state"), col("__next"), col("__split"))
      .transform(Pin.lazily) // fit + score both consume the window pass
    val fit = pairs.filter(col("__split") === "train")
      .groupBy("state", "__next").agg(count(lit(1)).as("__n"))
    val best = fit.groupBy("state").agg(max("__n").as("__bn"),
      sum("__n").as("train_total"))
    val predictor = fit.join(best, Seq("state"))
      .filter(col("__n") === col("__bn"))
      .groupBy("state", "__bn", "train_total")
      .agg(min("__next").as("predicted_next"))
    val scored = pairs.filter(col("__split") === "test")
      .join(broadcast(predictor), Seq("state"))
      .groupBy("state", "predicted_next", "train_total")
      .agg(count(lit(1)).as("n_test"),
        sum((col("__next") === col("predicted_next")).cast("long"))
          .as("n_correct"))
    val overall = scored.agg(
      (coalesce(sum("n_correct"), lit(0L)) /
        greatest(coalesce(sum("n_test"), lit(0L)), lit(1L)))
        .as("overall_accuracy"))
    scored.crossJoin(broadcast(overall))
      .select(col("state"), col("predicted_next"), col("train_total"),
        col("n_test"), col("n_correct"),
        (col("n_correct") / col("n_test")).as("accuracy"),
        col("overall_accuracy"))
      .orderBy("state")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** Multinomial Naive Bayes text classifier, trained and evaluated in
  * one declarative plan — the generative counterpart of the
  * discriminative logistic classifier (Classifier.scala / q107) and
  * the supervised twin of the n-gram language-ID heuristic (q36).
  *
  * Math (standard multinomial NB with Laplace add-1 smoothing, e.g.
  * Manning/Raghavan/Schütze IR book ch. 13):
  *
  *   score(c, d) = ln P(c) + Σ_t tf(t,d) · ln( (n_{c,t}+1) / (n_c+V) )
  *
  * with n_{c,t} the token count of t in class c's training docs, n_c
  * the class's total token count, V the training vocabulary size.
  * Test tokens unseen in a class get the smoothed ln(1/(n_c+V)); they
  * are NOT dropped — the class-size denominator is real signal.
  *
  * Cross-engine determinism: every ln() argument is a ratio of exact
  * integers, so both engines feed identical doubles to ln; per-term
  * ulp drift stays ~1e-12 absolute on scores of magnitude 1e2–1e3.
  * The argmax therefore ranks on round(score, 4) with a class-name
  * tie-break, the q179/q180 rounded-rank discipline.
  *
  * Scale shape: the model is two aggregates over the training split
  * (class stats: C rows; token counts: ≤ C·V rows). Scoring joins
  * test (doc, token, tf) × C candidate classes against the token-count
  * model on (class, token) — an equi-shuffle proportional to test
  * tokens × classes, never corpus × corpus. Class stats and the
  * vocabulary scalar are 1-row/C-row broadcasts. No driver-side data.
  */
object NaiveBayes {

  /** Train on the md5-bucket < `trainPct` split (the q56 convention),
    * score the held-out docs, and return the confusion matrix:
    * (actual, predicted, n_docs, accuracy) ordered by actual,
    * predicted — accuracy repeated per row (scalar broadcast).
    *
    * On the synthetic corpus the label is drawn independently of the
    * shared vocabulary, so accuracy sits at chance (~1/C) — like
    * q180's AUC≈0.5 fixture, the point is exact cross-engine
    * agreement of the whole train/score/argmax mechanism, not a
    * separable fixture. Noise gaps between class scores are O(1), so
    * the rounded argmax is numerically well-separated. */
  def confusion(docs: DataFrame, labelCol: String = "lang",
      textCol: String = "text", idCol: String = "doc_id",
      trainPct: Int = 80): DataFrame = {
    // the token frame feeds four aggregate branches (class stats,
    // vocab, token counts, test tf) — checkpoint so the scan +
    // tokenize runs once, not once per branch (the keyness/q178
    // replay discipline); canonical tokenizer, not an inline split,
    // so q184 can never desynchronize from the corpus operators
    val toks = docs.select(col(idCol).as("doc"), col(labelCol).as("label"),
        Curation.hashBucket(col(idCol)).as("bucket"),
        explode(graft.functions.TextFunctions.tokens(textCol)).as("term"))
      .transform(Pin.lazily)
    val train = toks.where(col("bucket") < trainPct)
    val test = toks.where(col("bucket") >= trainPct)

    // model: class stats (C rows), vocab size (1 row), token counts
    val classStats = train.groupBy(col("label").as("cand"))
      .agg(countDistinct("doc").as("c_docs"), count(lit(1)).as("c_toks"))
    val vocab = train.agg(countDistinct("term").as("vocab"))
    val nTrain = classStats.agg(sum("c_docs").as("n_train"))
    val tokenCounts = train.groupBy(col("label").as("cand"), col("term"))
      .agg(count(lit(1)).as("cnt"))

    // test side: per-doc term frequencies, then × C candidate classes
    val testTf = test.groupBy(col("doc"), col("label").as("actual"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val scored = testTf
      .crossJoin(broadcast(classStats))
      .crossJoin(broadcast(vocab))
      .crossJoin(broadcast(nTrain))
      .join(tokenCounts, Seq("cand", "term"), "left")
      .groupBy(col("doc"), col("actual"), col("cand"), col("c_docs"),
        col("c_toks"), col("vocab"), col("n_train"))
      .agg(sum(col("tf") *
        (log(coalesce(col("cnt"), lit(0L)) + lit(1.0)) -
          log((col("c_toks") + col("vocab")).cast("double")))).as("loglik"))
      .select(col("doc"), col("actual"), col("cand"),
        (log(col("c_docs").cast("double") / col("n_train")) + col("loglik"))
          .as("score"))

    val wPick = Window.partitionBy("doc")
      .orderBy(round(col("score"), 4).desc, col("cand"))
    // pred is consumed twice (accuracy scalar + confusion cells);
    // checkpoint the test-doc-sized frame so scoring runs once
    val pred = scored
      .withColumn("rn", row_number().over(wPick))
      .where(col("rn") === 1)
      .select(col("doc"), col("actual"), col("cand").as("predicted"))
      .transform(Pin.lazily)

    val acc = pred.agg(
      round(sum(when(col("actual") === col("predicted"), 1).otherwise(0))
        .cast("double") / count(lit(1)), 6).as("accuracy"))
    pred.groupBy("actual", "predicted").agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(acc))
      .orderBy("actual", "predicted")
  }
}

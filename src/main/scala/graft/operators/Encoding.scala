package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical feature encoding for model training at corpus scale.
  *
  * K-fold target encoding replaces a high-cardinality category with the
  * smoothed mean of the label — computed, for rows in fold f, from all
  * OTHER folds only (leave-fold-out), which is what prevents the
  * target leakage that makes naive target encoding overfit.
  *
  * Scale shape: one aggregate to the (category, fold) cell grid —
  * map-side combined, |cats|·K cells regardless of row count — then
  * leave-fold-out arithmetic as window sums OVER THE CELLS, never the
  * rows. The resulting encoding map is the broadcast-join side at
  * serve/train time. Folds come from the engine's md5 idiom, so the
  * assignment (and the entire map) is deterministic and restatable.
  *
  * Smoothing is the standard empirical-Bayes form:
  * (sum_others + alpha·prior) / (n_others + alpha) — alpha pseudo-
  * observations of the prior, so rare categories shrink toward the
  * prior instead of memorizing noise. The prior itself is computed
  * leave-fold-out (all categories, OTHER folds): a global prior would
  * leak a fold's own labels back into its encoding through the
  * smoothing term.
  */
object Encoding {

  /** @param labelCol numeric (0/1 or real-valued) target
    * @param idCol    unique row id; seeds the deterministic fold hash
    * @return one row per (category, fold): n_fold plus the encoding a
    *         row of that (category, fold) would receive */
  def targetEncodeKFold(df: DataFrame, catCol: String, labelCol: String,
      idCol: String, folds: Int = 5, alpha: Double = 10.0): DataFrame = {
    require(folds >= 2, s"k-fold needs k >= 2: $folds")
    val fold = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 6), 16, 10).cast("long"),
      lit(folds.toLong))

    val cells = df
      .select(col(catCol).as("category"), col(labelCol).cast("double").as("y"),
        fold.as("fold"))
      .where(col("category").isNotNull && col("y").isNotNull)
      .groupBy("category", "fold")
      .agg(count(lit(1)).as("n_fold"), sum("y").as("s_fold"))

    val byCat = Window.partitionBy(col("category"))
    val byFold = Window.partitionBy(col("fold"))
    // per-category and per-fold totals as windows over the tiny cell
    // grid; the 1-row grand totals broadcast back (same idiom as
    // Layout's bounds — no single-partition window anywhere). The
    // PRIOR is leave-fold-out as well: a global prior would leak the
    // fold's own labels into its encoding through the smoothing term
    // (caught by EncodingSpec's flip test).
    val totals = cells.agg(sum("n_fold").as("n_all"), sum("s_fold").as("s_all"))
    cells
      .withColumn("n_cat", sum("n_fold").over(byCat))
      .withColumn("s_cat", sum("s_fold").over(byCat))
      .withColumn("n_in_fold", sum("n_fold").over(byFold))
      .withColumn("s_in_fold", sum("s_fold").over(byFold))
      .crossJoin(broadcast(totals))
      .withColumn("prior",
        (col("s_all") - col("s_in_fold")) / (col("n_all") - col("n_in_fold")))
      .withColumn("encoding", round(
        (col("s_cat") - col("s_fold") + lit(alpha) * col("prior")) /
          (col("n_cat") - col("n_fold") + lit(alpha)), 6))
      .select(col("category"), col("fold"), col("n_fold"),
        col("encoding"), round(col("prior"), 6).as("prior"))
      .orderBy("category", "fold")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** Privacy-risk auditing for release/training datasets — the
  * compliance sibling of the PII scrubber (Pii.scala / q117): the
  * scrubber removes direct identifiers; this audits RE-IDENTIFICATION
  * risk from quasi-identifier combinations (Sweeney's k-anonymity: a
  * table is k-anonymous iff every quasi-identifier combination is
  * shared by ≥ k rows).
  *
  * Scale shape: ONE map-side-combinable groupBy to equivalence
  * classes (rows per distinct quasi-identifier tuple), then all
  * reporting is arithmetic over the class-size frame — bounded by the
  * number of distinct QI combinations, never re-touching the table.
  * Everything integer-exact until the final share divisions. */
object Privacy {

  /** k-anonymity audit over `qidCols`: one row per class-size band
    * (1 = unique, 2..k−1 = linkable, ≥ k = anonymous at threshold k)
    * with class/row counts and row share, plus the table-level
    * verdict in-row (the q86 convention): k_min (the size of the
    * smallest class — the table IS k_min-anonymous), and the share of
    * rows below the threshold. Null QI values form real classes (null
    * is a linkable value to an attacker, not missing data). */
  def kAnonymityAudit(df: DataFrame, qidCols: Seq[String], k: Int): DataFrame = {
    // both the band rollup and the verdict consume the class frame —
    // checkpoint so the table-level groupBy runs once
    val classes = df
      .groupBy(qidCols.map(c => col(c)): _*)
      .agg(count(lit(1)).as("csize"))
      .transform(Pin.lazily)
    val banded = classes
      .withColumn("band",
        when(col("csize") === 1, lit("1_unique"))
          .when(col("csize") < k, lit(s"2_below_k"))
          .otherwise(lit(s"3_at_least_k")))
      .groupBy("band")
      .agg(count(lit(1)).as("n_classes"), sum("csize").as("n_rows"))
    val verdict = classes.agg(
      min("csize").as("k_min"),
      sum(when(col("csize") < k, col("csize")).otherwise(0L)).as("__below"),
      sum("csize").as("__total"))
      .select(col("k_min"),
        round(col("__below").cast("double") / col("__total"), 6)
          .as("pct_rows_below_k"))
    banded.crossJoin(broadcast(verdict))
      .select(col("band"), col("n_classes"), col("n_rows"),
        col("k_min"), col("pct_rows_below_k"))
      .orderBy("band")
  }
}

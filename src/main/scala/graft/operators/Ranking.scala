package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared distributed top-k trailer: `orderBy + limit` plans as
  * TakeOrderedAndProject (per-partition partial top-k, no single-
  * partition window over the candidate frame), then a 1-based `rank`
  * is assigned by a window over the ≤ k-row RESULT using the same
  * ordering. One definition, so the limit's sort expression and the
  * rank window's can never silently diverge (the subtle failure the
  * copy-pasted version invites). `order` must be a total order
  * (include a tiebreak) or ranks are nondeterministic. */
object Ranking {

  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
}

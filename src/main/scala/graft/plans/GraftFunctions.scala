package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.graft.CosineSimilarity

/** Session-scoped registration of graft's native Catalyst expressions,
  * so they are callable from `expr("cosine_sim(a, b)")` / SQL text.
  * Idempotent (createOrReplace). */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
  }
}

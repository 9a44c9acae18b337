// Lives under org.apache.spark.sql so it can use private[sql] surfaces
// (Dataset.ofRows, df.logicalPlan) — same rationale as the native
// expressions. The graft-facing API is graft.plans.SimilarityJoinApi.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Logical operator: approximate top-k cosine similarity join between a
  * corpus and a query set (SURVEY §4's "similarity_join logical node
  * rewritten into an LSH-bucketed equi-join plan" — the one place the
  * survey justifies a custom Catalyst node for the 100 TB extensions).
  *
  * The node itself carries only semantics (k, nBits, tables); the
  * physical strategy — multi-table multiprobe LSH + native cosine
  * rerank — is chosen by [[RewriteSimilarityJoin]] at optimization
  * time. Swapping in a different ANN plan (IVF, exact) is a rule
  * change, invisible to callers. */
case class SimilarityJoinPlan(
    corpus: LogicalPlan, queries: LogicalPlan,
    k: Int, nBits: Int, tables: Int,
    output: Seq[Attribute]) extends BinaryNode {
  override def left: LogicalPlan = corpus
  override def right: LogicalPlan = queries
  // the node GENERATES its output columns (they are not child
  // pass-throughs) — without this the analyzer flags MISSING_ATTRIBUTES
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  // ...and it CONSUMES the id/embedding columns of both children —
  // without this ColumnPruning strips the children to empty projections
  // before the rewrite rule runs
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      (corpus.output ++ queries.output).filter(a =>
        a.name == "vec_id" || a.name == "embedding"))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(corpus = newLeft, queries = newRight)
}

object SimilarityJoinPlan {
  /** Output attributes typed from the children's actual id type — a
    * hardcoded LongType would make the analyzed outer plan disagree
    * with the rewritten plan when ids are e.g. IntegerType (BoundReference
    * then reads the wrong slot width at execution). */
  def outputAttrs(idType: org.apache.spark.sql.types.DataType): Seq[AttributeReference] = Seq(
    AttributeReference("query_id", idType)(),
    AttributeReference("vec_id", idType)(),
    AttributeReference("sim", DoubleType)(),
    AttributeReference("rank", IntegerType)())
}

/** Optimizer rule: replace the logical similarity join with the
  * fully-built (and internally optimized) LSH plan, aliasing the
  * rewritten plan's output to the node's original attribute ids so
  * upstream references stay bound. */
case class RewriteSimilarityJoin(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case sj: SimilarityJoinPlan =>
      val corpusDf = SimilarityJoinApiInternal.ofRows(spark, sj.corpus)
      val queriesDf = SimilarityJoinApiInternal.ofRows(spark, sj.queries)
      val rewritten = graft.operators.Similarity
        .lshTopK(spark, corpusDf, queriesDf, sj.k, sj.nBits, sj.tables)
        .queryExecution.optimizedPlan
      val aliases: Seq[NamedExpression] = sj.output.map { out =>
        val src = rewritten.output.find(_.name == out.name).getOrElse(
          throw new IllegalStateException(s"rewrite lost column ${out.name}"))
        Alias(src, out.name)(exprId = out.exprId)
      }
      Project(aliases, rewritten)
  }
}

/** Bridge for Dataset construction from logical plans (public so the
  * graft.plans facade can call `build`; the private[sql] machinery it
  * touches stays encapsulated here). */
object SimilarityJoinApiInternal {
  private[graft] def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  private[graft] def logicalPlan(df: DataFrame): LogicalPlan = df.queryExecution.logical

  def build(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int, tables: Int): DataFrame = {
    val spark = corpus.sparkSession
    // self-contained: make sure the rewrite rule is installed
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RewriteSimilarityJoin]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteSimilarityJoin(spark)
    val node = SimilarityJoinPlan(
      logicalPlan(corpus), logicalPlan(queries), k, nBits, tables,
      SimilarityJoinPlan.outputAttrs(corpus.schema("vec_id").dataType))
    ofRows(spark, node)
  }
}

package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Structural assertions on executed plans — the "prove it every run"
  * discipline for the bucketed exchange-free queries (q291/q297/q302).
  *
  * r13 ADVICE: the previous substring match on `executedPlan.toString`
  * was rendering-fragile (a Spark version whose AQE node names contain
  * "Exchange" — or bucketing silently disabled — would abort on plan
  * COSMETICS, not plan shape). This walks the physical tree and types
  * the check: a shuffle is a [[ShuffleExchangeLike]] node, nothing
  * else. Broadcast exchanges are intentionally NOT counted — the
  * claim these queries prove is "the shuffle was paid at write time",
  * and a broadcast of a small side is not a shuffle of the data.
  *
  * A violation throws [[PlanAssertionException]] from inside the query
  * function; both Verify and Bench catch per-query Throwables, so a
  * wrong plan surfaces as THAT query's failure in the round artifact
  * instead of aborting the suite. */
object PlanAudit {

  final class PlanAssertionException(msg: String) extends RuntimeException(msg)

  /** All physical nodes, descending through AQE wrappers: an
    * [[AdaptiveSparkPlanExec]]'s current physical plan and a
    * materialized [[QueryStageExec]]'s wrapped subtree are not
    * `children`, so a plain TreeNode traversal would miss everything
    * below them. */
  def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case _                        => Nil
    }
    p +: (p.children ++ nested).flatMap(nodes)
  }

  def shuffleCount(df: DataFrame): Int =
    nodes(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeLike])

  def hasSortMergeJoin(df: DataFrame): Boolean =
    nodes(df.queryExecution.executedPlan)
      .exists(_.isInstanceOf[SortMergeJoinExec])

  /** Count of SortExec nodes — the compaction proof (q305): a
    * SortMergeJoin over one-sorted-file-per-bucket scans needs NO
    * in-partition sorts, because the scans report their sortBy order;
    * a fragmented (multi-file-per-bucket) table loses it and SMJ
    * re-sorts in-partition. */
  def sortCount(df: DataFrame): Int =
    nodes(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.SortExec])

  /** Assert the frame plans with ZERO shuffle exchanges (broadcast is
    * allowed), optionally requiring a sort-merge join node. */
  def requireExchangeFree(df: DataFrame, what: String,
      requireSmj: Boolean = false): Unit = {
    val all = nodes(df.queryExecution.executedPlan)
    if (requireSmj && !all.exists(_.isInstanceOf[SortMergeJoinExec]))
      throw new PlanAssertionException(
        s"$what must plan as a sort-merge join, got:\n" +
          df.queryExecution.executedPlan.toString)
    val shuffles = all.filter(_.isInstanceOf[ShuffleExchangeLike])
    if (shuffles.nonEmpty)
      throw new PlanAssertionException(
        s"$what must be exchange-free (the shuffle is paid once at bucketed-write " +
          s"time), found ${shuffles.size} shuffle exchange(s):\n" +
          df.queryExecution.executedPlan.toString)
  }
}

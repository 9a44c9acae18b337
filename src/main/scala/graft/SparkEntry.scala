package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, BehaviorQueries, CoreQueries, CorpusQueries, ExtendedQueries, MiningQueries, MixQueries, ProfileQueries, RevenueQueries, ScaleQueries, SegmentQueries, SignalQueries, StatQueries, SupplyQueries, TextQueries, TextQueries2, VectorQueries, WebQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2 plus the
  * LLM-data-pipeline extensions), each runnable against a testdata
  * scale-factor directory; `oracleSql` holds the DuckDB-equivalent SQL
  * for every hash-checkable query. Column names and rounding are kept
  * identical between the two sides (see CoreQueries scaladoc).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core query shape: inner equi-join + aggregate
    * (SURVEY §2.3 J1, src/pipeline.py:86). */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q03JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ TextQueries.queries ++ TextQueries2.queries ++
      VectorQueries.queries ++ AnalyticsQueries.queries ++ ExtendedQueries.queries ++
      CorpusQueries.queries ++ ScaleQueries.queries ++ BehaviorQueries.queries ++
      ProfileQueries.queries ++ SignalQueries.queries ++ StatQueries.queries ++
      SegmentQueries.queries ++ SupplyQueries.queries ++ MiningQueries.queries ++
      RevenueQueries.queries ++ MixQueries.queries ++ WebQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (used only for ops DuckDB SQL cannot express). */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ TextQueries.oracles ++ TextQueries2.oracles ++
      VectorQueries.oracles ++ AnalyticsQueries.oracles ++ ExtendedQueries.oracles ++
      CorpusQueries.oracles ++ ScaleQueries.oracles ++ BehaviorQueries.oracles ++
      ProfileQueries.oracles ++ SignalQueries.oracles ++ StatQueries.oracles ++
      SegmentQueries.oracles ++ SupplyQueries.oracles ++ MiningQueries.oracles ++
      RevenueQueries.oracles ++ MixQueries.oracles ++ WebQueries.oracles
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-pinned loaders for the driver-generated test tables
  * (`/root/testdata/sf*`; see TESTDATA.md) plus generic format readers.
  *
  * Design notes for scale: every loader is a plain parquet scan, so
  * Catalyst's predicate pushdown / column pruning reach the file scan
  * unobstructed (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  * At 100 TB these paths would be directories of many files (optionally
  * partitioned by date); nothing here assumes a single file.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")

  /** `events.ts` arrives in whichever physical shape the current
    * testdata generation wrote — TIMESTAMP(NANOS) (Spark 4 refuses it
    * by default, [PARQUET_TYPE_ILLEGAL]; readable as a raw long under
    * the nanosAsLong legacy conf) or TIMESTAMP(MICROS, ntz). Normalize
    * either to a microsecond session-zoned TimestampType — the
    * precision Spark natively carries; the UTC session means the wall
    * clock (and every DuckDB oracle comparison) is identical. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // the nanosAsLong legacy conf is set (session-globally, by design)
    // in exactly one place — eventsTsType, which also memoizes the
    // footer sniff for this path
    graft.streaming.StreamingOps.eventsTsType(spark, s"$dir/events.parquet")
    graft.streaming.StreamingOps.normalizeTs(table(spark, dir, "events"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}

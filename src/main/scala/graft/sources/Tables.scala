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

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses by default ([PARQUET_TYPE_ILLEGAL]). Read it as a raw
    * nanosecond long (legacy conf) and floor-convert to a microsecond
    * TimestampType — the precision Spark natively carries. Oracle SQL
    * over this column must truncate to microseconds on its side too. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}

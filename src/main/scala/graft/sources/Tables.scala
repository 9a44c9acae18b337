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

  /** Per-JVM memo of each table path's sniffed parquet schema — the
    * [[graft.streaming.StreamingOps.eventsTsType]] footer-sniff memo
    * generalized to every loader. Without it EVERY `spark.read.parquet`
    * call re-ran schema inference (driver-side footer read + file
    * index build): measured 70 ms/plan vs 8 ms with a pinned schema at
    * sf0.1 — across a 309-query × 2-pass bench with 2–4 table reads
    * per query, tens of seconds of pure planning overhead (guide §5:
    * the driver should do almost no data work; §6 file listing). This
    * memoizes METADATA only (the testdata inputs are immutable for a
    * run); every query still computes from the parquet files. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Invalidate the schema memo (r16, ADVICE): the cache is keyed by
    * path only, so a harness that REGENERATES files at a path with a
    * different schema inside one JVM would silently read nulls for
    * renamed columns through the stale pinned schema. No in-repo
    * harness rewrites testdata in-process (Verify/Bench/tests treat
    * the sf dirs as immutable); any future one must call this after
    * rewriting. */
  def clearSchemaCache(): Unit = schemaCache.clear()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

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

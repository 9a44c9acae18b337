package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent corpus integrity manifest — the cheap answer to
  * "are these two copies of a 100 TB table identical, and if not,
  * WHERE do they differ" without sorting, shipping, or comparing rows.
  *
  * Every row folds to a 48-bit md5 fingerprint of (key, content);
  * fingerprints combine per md5-bucket with BIT_XOR — associative,
  * commutative, overflow-free — so the bucket digest is independent of
  * row order, partitioning, and cluster layout, and partials combine
  * map-side. The root digest is the XOR of the bucket digests (= XOR
  * of all row fingerprints). A manifest is nBuckets+1 tiny rows per
  * snapshot; comparing two snapshots touches manifests only, and a
  * mismatched bucket names the 1/nBuckets slice of the corpus worth
  * re-reading — the q125 snapshot diff then runs on that slice alone.
  *
  * XOR's known blind spot — a row appearing an EVEN number of times
  * cancels out — is why the digest travels WITH the bucket row count:
  * duplicate-pair insertion flips n_rows even when the XOR is
  * unchanged. (A multiset-exact digest would sum in a prime field;
  * the count+XOR pair is the standard cheap manifest.)
  */
object Manifest {

  /** 48-bit row fingerprint over key + content. Each field is encoded
    * with a null flag ('N' for NULL, 'V' + value otherwise) BEFORE the
    * \u0001-separator join: concat_ws silently SKIPS nulls, so without
    * the flag (id, "a", NULL) and (id, NULL, "a") would hash
    * identically - a value moving between columns would be invisible
    * to the digest. The separator prevents boundary-shift collisions
    * (("ab","c") vs ("a","bc")); the oracle mirrors both with chr(1)
    * and the same CASE encoding. */
  private def fp(keyCol: String, contentCols: Seq[String]): Column =
    conv(substring(md5(concat_ws("\u0001",
      (keyCol +: contentCols).map(c =>
        when(col(c).isNull, lit("N"))
          .otherwise(concat(lit("V"), col(c).cast("string")))): _*)), 1, 12), 16, 10)
      .cast("long")

  /** One row per bucket plus a root row (bucket = -1). */
  def build(df: DataFrame, keyCol: String, contentCols: Seq[String],
      nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1 && nBuckets <= (1 << 20), s"nBuckets out of range: $nBuckets")
    val rows = df
      .select(
        pmod(conv(substring(md5(col(keyCol).cast("string")), 1, 6), 16, 10).cast("long"),
          lit(nBuckets.toLong)).as("bucket"),
        fp(keyCol, contentCols).as("h"))
    val buckets = rows.groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), bit_xor(col("h")).as("digest"))
    val root = buckets.agg(coalesce(sum("n_rows"), lit(0L)).as("n_rows"),
        coalesce(bit_xor(col("digest")), lit(0L)).as("digest"))
      .select(lit(-1L).as("bucket"), col("n_rows"), col("digest"))
    buckets.unionByName(root)
  }

  /** Bucket-level diff of two manifests: which slices changed, and
    * how the row counts moved. `changed` on the root row is the one-
    * bit answer to "identical?". */
  def diff(oldM: DataFrame, newM: DataFrame): DataFrame = {
    val o = oldM.select(col("bucket"), col("n_rows").as("n_old"), col("digest").as("digest_old"))
    val n = newM.select(col("bucket"), col("n_rows").as("n_new"), col("digest").as("digest_new"))
    o.join(n, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("digest_old"), lit(0L)).as("digest_old"),
        coalesce(col("digest_new"), lit(0L)).as("digest_new"))
      .withColumn("changed",
        (col("n_old") =!= col("n_new") || col("digest_old") =!= col("digest_new"))
          .cast("int"))
      .orderBy("bucket")
  }
}

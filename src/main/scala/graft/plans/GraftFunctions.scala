package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.graft.{BigramCounts, BpeMerge, CdcBoundaries, CosineSimilarity, HashFeatures, JaroWinkler, LshBucket, Md5H1Seq, MinHashBands, MinHashSig, MinHashSigMd5, MmrSelect, Morton2, PeriodMatches, ShingleSeq, Shingles, SimHash64, SrpBandKeys, SrpProject, TopKAgg, VectorSum, WinnowFingerprints, XxHash64Seq}

/** Session-scoped registration of graft's native Catalyst expressions,
  * so they are callable from `expr("cosine_sim(a, b)")` / SQL text.
  * Idempotent (createOrReplace). */
object GraftFunctions {

  private def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].intValue()

  private def dblLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Double =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].doubleValue()

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs(0), intLit(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "lsh_bucket", exprs => LshBucket(exprs(0), intLit(exprs(1)), intLit(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction(
      "shingles", exprs => Shingles(exprs(0), intLit(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "shingle_seq", exprs => ShingleSeq(exprs(0), intLit(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "bigram_counts", exprs => BigramCounts(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_bands", exprs => MinHashBands(exprs(0), intLit(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "vec_sum", exprs => VectorSum(exprs(0)).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "topk_agg", exprs => TopKAgg(exprs(0), exprs(1), intLit(exprs(2)))
        .toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "hash_features", exprs => HashFeatures(exprs(0), intLit(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "hash_features_md5", exprs => HashFeatures(exprs(0), intLit(exprs(1)),
        md5Mode = true), "built-in")
    reg.createOrReplaceTempFunction(
      "srp_project", exprs => SrpProject(exprs(0), intLit(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "srp_band_keys", exprs => SrpBandKeys(exprs(0), intLit(exprs(1)),
        intLit(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction(
      "srp_band_keys_lsb", exprs => SrpBandKeys(exprs(0), intLit(exprs(1)),
        intLit(exprs(2)), msbFirst = false), "built-in")
    reg.createOrReplaceTempFunction(
      "winnow_fingerprints",
      exprs => WinnowFingerprints(exprs(0), intLit(exprs(1))), "built-in")
    // _md5 variants: the cross-engine-auditable hash family (see
    // Md5Hash) — identical structure, hashes any engine can recompute
    // from the md5 hex string
    reg.createOrReplaceTempFunction(
      "winnow_fingerprints_md5",
      exprs => WinnowFingerprints(exprs(0), intLit(exprs(1)), md5Hash = true), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sig_md5", exprs => MinHashSigMd5(exprs(0), intLit(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "md5_h1_seq", exprs => Md5H1Seq(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "xxhash64_seq", exprs => XxHash64Seq(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "cdc_boundaries_md5",
      exprs => CdcBoundaries(exprs(0), intLit(exprs(1)), intLit(exprs(2)),
        poly = false), "built-in")
    reg.createOrReplaceTempFunction(
      "cdc_boundaries_poly",
      exprs => CdcBoundaries(exprs(0), intLit(exprs(1)), intLit(exprs(2)),
        poly = true), "built-in")
    reg.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64_md5", exprs => SimHash64(exprs(0), md5Hash = true), "built-in")
    reg.createOrReplaceTempFunction(
      "morton2", exprs => Morton2(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "bpe_merge", exprs => BpeMerge(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "period_matches", exprs => PeriodMatches(exprs(0), intLit(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "mmr_select",
      exprs => MmrSelect(exprs(0), intLit(exprs(1)), dblLit(exprs(2))), "built-in")
    // Spark ships BloomFilterAggregate/BloomFilterMightContain (the
    // distributed sketch build + codegen'd probe behind runtime
    // row-group filtering) but keeps both in its INTERNAL function
    // registry, off the SQL search path. Exposing them makes the
    // build+probe pair fully native: no UDF, no broadcast variable.
    // The probe's sketch side must be foldable (a collected literal)
    // or a scalar subquery per the expression's own input check.
    reg.createOrReplaceTempFunction(
      "bloom_filter_agg",
      exprs => org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2), 0, 0).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.graft._

/** SparkSessionExtensions installer for graft's native expressions —
  * the config-driven alternative to [[GraftFunctions.register]]:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * On a shared cluster this is the right wiring: every session gets the
  * functions without application code calling a registry method. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression): Int =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].intValue()

  private def dblLit(e: Expression): Double =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].doubleValue()

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k) - k-hash MinHash signature"),
      (exprs: Seq[Expression]) => MinHashSig(exprs(0), intLit(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash fingerprint"),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))))
    ext.injectFunction((FunctionIdentifier("shingles"),
      info("shingles", "shingles(tokens, n) - distinct n-token shingles"),
      (exprs: Seq[Expression]) => Shingles(exprs(0), intLit(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("minhash_bands"),
      info("minhash_bands", "minhash_bands(sig, bands) - LSH band hashes"),
      (exprs: Seq[Expression]) => MinHashBands(exprs(0), intLit(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("lsh_bucket"),
      info("lsh_bucket", "lsh_bucket(emb, nBits, table) - hyperplane sign bucket"),
      (exprs: Seq[Expression]) => LshBucket(exprs(0), intLit(exprs(1)), intLit(exprs(2)))))
    ext.injectFunction((FunctionIdentifier("vec_sum"),
      info("vec_sum", "vec_sum(emb) - element-wise vector sum aggregate"),
      (exprs: Seq[Expression]) => VectorSum(exprs(0)).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints", "winnow_fingerprints(shingles, w) - winnowing fingerprint set"),
      (exprs: Seq[Expression]) => WinnowFingerprints(exprs(0), intLit(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprints_md5"),
      info("winnow_fingerprints_md5",
        "winnow_fingerprints_md5(shingles, w) - winnowing with the md5 cross-engine hash"),
      (exprs: Seq[Expression]) => WinnowFingerprints(exprs(0), intLit(exprs(1)), md5Hash = true)))
    ext.injectFunction((FunctionIdentifier("minhash_sig_md5"),
      info("minhash_sig_md5",
        "minhash_sig_md5(shingles, k) - MinHash signature, md5 double-hash family"),
      (exprs: Seq[Expression]) => MinHashSigMd5(exprs(0), intLit(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(s1, s2) - Jaro-Winkler similarity in [0, 1]"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("mmr_select"),
      info("mmr_select", "mmr_select(candidates, k, lambda) - maximal-marginal-relevance top-k"),
      (exprs: Seq[Expression]) => MmrSelect(exprs(0), intLit(exprs(1)), dblLit(exprs(2)))))
  }
}

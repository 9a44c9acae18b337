package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier
import graft.plans.GraftFunctions

/** The trained-quality-classifier operator: feature hashing, the
  * one-aggregate-per-iteration GD loop, and the frozen-weights scoring
  * path. Ground truths are hand-computable (tiny separable corpora). */
class ClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hash_features: counts fold into buckets, intercept slot is 1") {
    val s = spark; import s.implicits._
    GraftFunctions.register(s)
    val out = Seq((1L, "a b a")).toDF("id", "text")
      .select(expr("hash_features(split(text, ' '), 8)").as("f"))
      .head().getSeq[Double](0)
    assert(out.length == 9)
    assert(out.last == 1.0, "intercept")
    assert(out.take(8).sum == 3.0, "three token increments")
    assert(out.take(8).max == 2.0, "'a' hashed twice into one bucket")
  }

  test("training on a separable corpus reaches accuracy 1 with monotone loss") {
    val s = spark; import s.implicits._
    val train = (0 until 60).map { i =>
      if (i % 2 == 0) (1.0, s"pos${i % 7} pos${(i + 3) % 7} shared filler")
      else (0.0, s"neg${i % 7} neg${(i + 3) % 7} shared filler")
    }.toDF("label", "text")
    val (w, trace) = Classifier.trainLogisticTrace(s, train, "label",
      dim = 128, maxIter = 20, lr = 1.0)
    assert(w.length == 129)
    assert(trace.length == 20)
    trace.sliding(2).foreach { case Array((l0, _), (l1, _)) =>
      assert(l1 <= l0 + 1e-12, s"loss must not increase: $l0 -> $l1")
    }
    assert(trace.last._2 == 1.0, s"separable data must be fully learned, got ${trace.last}")
    assert(trace.last._1 < trace.head._1, "loss must strictly improve overall")
  }

  test("scoring with frozen weights separates unseen class mixes") {
    val s = spark; import s.implicits._
    val train = (0 until 60).map { i =>
      if (i % 2 == 0) (1.0, s"pos${i % 7} pos${(i + 3) % 7} shared filler")
      else (0.0, s"neg${i % 7} neg${(i + 3) % 7} shared filler")
    }.toDF("label", "text")
    val (w, _) = Classifier.trainLogisticTrace(s, train, "label",
      dim = 128, maxIter = 20, lr = 1.0)
    val scored = Classifier.scoreLogistic(s,
      Seq((1L, "pos1 pos2 pos5"), (2L, "neg0 neg4 neg6")).toDF("id", "text"), w, dim = 128)
      .orderBy("id").collect()
    assert(scored(0).getAs[Boolean]("pred"), "unseen positive mix")
    assert(!scored(1).getAs[Boolean]("pred"), "unseen negative mix")
    val sc = scored.map(_.getAs[Double]("score"))
    assert(sc(0) > 0.5 && sc(1) < 0.5 && sc.forall(v => v >= 0 && v <= 1))
  }
}

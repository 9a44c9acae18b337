package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 scale tranche: salted skew join (result-identity +
  * salt-spread), histogram PSI drift (hand-computed, identity, and
  * clamping cases), and linear time interpolation (hand-computed
  * weights, edge fills, degenerate guards). */
class ScaleOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("saltedEquiJoin: identical rows to the plain join on a skewed fact") {
    val s = spark; import s.implicits._
    // 90% of fact rows share key 1 — the shape salting exists for
    val fact = ((1 to 90).map(i => (1L, i.toLong)) ++
      (1 to 10).map(i => (2L, (100 + i).toLong))).toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "unmatched")).toDF("k", "label")
    val salted = SkewJoin.saltedEquiJoin(fact, dim, Seq("k"), salts = 4)
    val plain = fact.join(dim, Seq("k"))
    assert(salted.collect().map(_.toSeq).toSet === plain.collect().map(_.toSeq).toSet)
    assert(salted.count() === 100L)
    // the join actually runs on (k, __salt): visible in the plan
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), s"salt column absent from join plan:\n$plan")
  }

  test("saltedEquiJoin: the hot key's rows actually spread over multiple salts") {
    val s = spark; import s.implicits._
    val fact = (1 to 64).map(i => (1L, i.toLong)).toDF("k", "payload")
      .repartition(4)
    val dim = Seq((1L, "hot")).toDF("k", "label")
    // reconstruct the salt the operator assigns (same expression) and
    // count distinct values — with 64 rows round-robined, all 4 salts
    // must appear
    val n = fact.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(4L)).cast("int"))
      .select("__salt").distinct().count()
    assert(n === 4L, "hot key's rows must land on every salt")
    assert(SkewJoin.saltedEquiJoin(fact, dim, Seq("k"), 4).count() === 64L)
  }

  test("histogramPsi: identical snapshots score psi = 0, verdict stable") {
    val s = spark; import s.implicits._
    val df = (1 to 100).map(i => i.toLong).toDF("v")
    val out = Drift.histogramPsi(df, df, "v", nBins = 5).collect()
    assert(out.length === 5)
    assert(out.forall(_.getAs[Double]("psi") === 0.0))
    assert(out.forall(_.getAs[String]("verdict") === "stable"))
    assert(out.map(_.getAs[Long]("n_old")).sum === 100L)
  }

  test("histogramPsi: hand-computed two-bin shift and edge-bin clamping") {
    val s = spark; import s.implicits._
    // old: values 0 and 10 → lo=0, hi=10; 2 bins split at 5
    val old = (Seq.fill(8)(0L) ++ Seq.fill(2)(10L)).toDF("v")
    // new: mass moves to the top bin, plus out-of-range 99 clamps into it
    val neu = (Seq.fill(2)(0L) ++ Seq.fill(7)(10L) ++ Seq(99L)).toDF("v")
    val out = Drift.histogramPsi(old, neu, "v", nBins = 2)
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("n_old")).toSeq === Seq(8L, 2L))
    assert(out.map(_.getAs[Long]("n_new")).toSeq === Seq(2L, 8L)) // 99 clamped up
    // smoothed: po=(8.5/11, 2.5/11), pn=(2.5/11, 8.5/11)
    val po = Seq(8.5 / 11, 2.5 / 11); val pn = Seq(2.5 / 11, 8.5 / 11)
    val expect = (0 until 2).map(i => (pn(i) - po(i)) * math.log(pn(i) / po(i))).sum
    val psi = out.head.getAs[Double]("psi")
    assert(math.abs(psi - expect) < 1e-6, s"psi $psi vs $expect")
    assert(out.forall(_.getAs[String]("verdict") === "shifted"))
  }

  test("interpolate.linear: hand-computed time weights, edge fills, observed passthrough") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), Some(10.0), 1L),
      (1L, ts("2024-01-01 00:01:00"), None, 2L),      // 1/3 of the way 10→40
      (1L, ts("2024-01-01 00:03:00"), Some(40.0), 3L),
      (2L, ts("2024-01-01 00:00:00"), None, 4L),      // leading gap → backfill 7
      (2L, ts("2024-01-01 00:01:00"), Some(7.0), 5L),
      (2L, ts("2024-01-01 00:02:00"), None, 6L)       // trailing gap → ffill 7
    ).toDF("k", "ts", "value", "id")
    val out = Interpolate.linear(df, Seq("k"), "ts", "value", Seq("id"))
      .orderBy("k", "id")
      .collect().map(_.getAs[Double]("value_filled"))
    assert(out.toSeq === Seq(10.0, 20.0, 40.0, 7.0, 7.0, 7.0))
  }

  test("interpolate.linear: equal-ts neighbors guard and all-null key") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), Some(5.0), 1L),
      (1L, ts("2024-01-01 00:00:00"), None, 2L),  // same instant: 0/0 guard → 5
      (1L, ts("2024-01-01 00:00:00"), Some(9.0), 3L),
      (3L, ts("2024-01-01 00:00:00"), None, 7L)   // whole key null → stays null
    ).toDF("k", "ts", "value", "id")
    val out = Interpolate.linear(df, Seq("k"), "ts", "value", Seq("id"))
      .orderBy("k", "id")
      .collect().map(r => Option(r.getAs[Any]("value_filled")))
    assert(out.toSeq === Seq(Some(5.0), Some(5.0), Some(9.0), None))
  }

  test("interpolate.linear and histogramPsi plans stay key-partitioned / driver-scale") {
    val s = spark; import s.implicits._
    val df = Seq((1L, ts("2024-01-01 00:00:00"), Some(1.0), 1L))
      .toDF("k", "ts", "value", "id")
    val ip = Interpolate.linear(df, Seq("k"), "ts", "value", Seq("id"))
      .queryExecution.executedPlan.toString
    assert(!ip.contains("rangepartitioning"),
      s"global sort leaked into the interpolation plan:\n$ip")
  }
}

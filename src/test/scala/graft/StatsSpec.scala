package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Stats

/** Numerics oracle: published Student-t quantile table values. */
class StatsSpec extends AnyFunSuite {

  test("t quantile matches published table values") {
    val cases = Seq(
      // (p, df, expected) — standard t tables
      (0.975, 1.0, 12.7062047362),
      (0.975, 5.0, 2.5705818356),
      (0.975, 10.0, 2.2281388520),
      (0.975, 30.0, 2.0422724563),
      (0.995, 5.0, 4.0321429836),
      (0.95, 20.0, 1.7247182430),
      (0.975, 1000.0, 1.9623390808))
    cases.foreach { case (p, df, expected) =>
      val got = Stats.tQuantile(p, df)
      assert(math.abs(got - expected) < 1e-6, s"t($p, $df): got $got expected $expected")
    }
  }

  test("t CDF is symmetric and monotone") {
    assert(math.abs(Stats.tCdf(0.0, 7) - 0.5) < 1e-12)
    assert(math.abs(Stats.tCdf(2.0, 7) + Stats.tCdf(-2.0, 7) - 1.0) < 1e-12)
    assert(Stats.tCdf(1.0, 7) < Stats.tCdf(2.0, 7))
  }

  test("Cornish-Fisher expansion (q15 oracle SQL formula) tracks exact t at data-scale df") {
    // the DuckDB side of q15 computes t(0.975, df) with this exact
    // arithmetic (AnalyticsQueries.oracles); if the transcription or the
    // truncation were wrong, CI bands would diverge at round(·,4)
    val z = 1.9599639845400545
    def cf(df: Double): Double =
      z + (math.pow(z, 3) + z) / (4 * df) +
        (5 * math.pow(z, 5) + 16 * math.pow(z, 3) + 3 * z) / (96 * df * df) +
        (3 * math.pow(z, 7) + 19 * math.pow(z, 5) + 17 * math.pow(z, 3) - 15 * z) /
          (384 * df * df * df)
    // df at sf0.001 / sf0.01 / sf0.1 lineitem row counts (n - 2)
    Seq(598.0, 5998.0, 59998.0, 599998.0).foreach { df =>
      val exact = Stats.tQuantile(0.975, df)
      assert(math.abs(cf(df) - exact) < 1e-9, s"df=$df: cf=${cf(df)} exact=$exact")
    }
  }

  test("log gamma matches known values") {
    assert(math.abs(Stats.logGamma(1.0)) < 1e-12)                       // Γ(1)=1
    assert(math.abs(Stats.logGamma(5.0) - math.log(24.0)) < 1e-12)      // Γ(5)=24
    assert(math.abs(Stats.logGamma(0.5) - 0.5 * math.log(math.Pi)) < 1e-12) // Γ(1/2)=√π
  }
}

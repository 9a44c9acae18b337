package graft.functions

/** Scalar statistics helpers for the OLS-with-confidence-intervals
  * operator (SURVEY §2.9 X3; reference: statsmodels
  * OLS().get_prediction().summary_frame(), src/analysis.py:24-37).
  *
  * Implements Student's t quantile from first principles (log-gamma via
  * Lanczos, regularized incomplete beta via Lentz's continued fraction,
  * quantile via bisection on the CDF) — standard published numerics, no
  * external dependency. Driver-side scalar math only; the per-row CI
  * band arithmetic stays in Catalyst column expressions.
  */
object Stats {

  /** Lanczos log-gamma (g=7, n=9), |error| < 1e-13 for x > 0. */
  def logGamma(x: Double): Double = {
    val g = 7.0
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) {
      // reflection
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    } else {
      val z = x - 1.0
      var a = c(0)
      var i = 1
      while (i < 9) { a += c(i) / (z + i); i += 1 }
      val t = z + g + 0.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Regularized incomplete beta I_x(a, b) via the continued fraction
    * (Lentz's method with the standard symmetry switch). */
  def incompleteBetaReg(a: Double, b: Double, x: Double): Double = {
    require(x >= 0.0 && x <= 1.0, s"x out of range: $x")
    if (x == 0.0) 0.0
    else if (x == 1.0) 1.0
    else {
      val lbeta = logGamma(a) + logGamma(b) - logGamma(a + b)
      val front = math.exp(a * math.log(x) + b * math.log(1.0 - x) - lbeta)
      if (x < (a + 1.0) / (a + b + 2.0)) front * betaCf(a, b, x) / a
      else 1.0 - incompleteBetaReg(b, a, 1.0 - x)
    }
  }

  private def betaCf(a: Double, b: Double, x: Double): Double = {
    val eps = 1e-15
    val fpmin = 1e-300
    var c = 1.0
    var d = 1.0 - (a + b) * x / (a + 1.0)
    if (math.abs(d) < fpmin) d = fpmin
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 300) {
      val m2 = 2 * m
      // even step
      var aa = m * (b - m) * x / ((a + m2 - 1.0) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      h *= d * c
      // odd step
      aa = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1.0))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) return h
      m += 1
    }
    h
  }

  /** Student's t CDF with `df` degrees of freedom. */
  def tCdf(t: Double, df: Double): Double = {
    val ib = incompleteBetaReg(df / 2.0, 0.5, df / (df + t * t))
    if (t >= 0) 1.0 - 0.5 * ib else 0.5 * ib
  }

  /** Student's t quantile (inverse CDF) by bisection — 200 iterations on
    * a bracketing interval gives ~1e-12 absolute precision, plenty for
    * CI bands; called once per query, not per row. */
  def tQuantile(p: Double, df: Double): Double = {
    require(p > 0.0 && p < 1.0, s"p out of range: $p")
    var lo = -1e6
    var hi = 1e6
    var i = 0
    while (i < 200) {
      val mid = 0.5 * (lo + hi)
      if (tCdf(mid, df) < p) lo = mid else hi = mid
      i += 1
    }
    0.5 * (lo + hi)
  }
}

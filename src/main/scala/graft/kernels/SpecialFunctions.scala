package graft.kernels

/** Special functions for the statistics layer (t/F p-values, normal CDF).
  *
  * Implemented from the standard published algorithms (regularized
  * incomplete beta via Lentz continued fraction; Lanczos log-gamma;
  * Abramowitz–Stegun erf), so the engine has no dependency beyond the
  * JDK. Accuracy ~1e-12 relative — far tighter than the 1e-9 golden-test
  * tolerance (SURVEY §7.4.5).
  *
  * Reference semantics served: GLM t-statistics → p-values and 95% CI
  * (/root/reference/Matlab_part/oxford_GLM_CCA_coefficients_extract.m:454-484),
  * Pearson-r p-values (t transform), Wilcoxon normal approximation.
  */
object SpecialFunctions {

  /** Lanczos approximation, g=7, n=9 — standard published coefficients. */
  private val lanczos = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  def logGamma(x: Double): Double = {
    if (x < 0.5) {
      // reflection
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    } else {
      val z = x - 1.0
      var a = lanczos(0)
      val t = z + 7.5
      var i = 1
      while (i < 9) { a += lanczos(i) / (z + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Continued fraction for the incomplete beta (modified Lentz). */
  private def betacf(a: Double, b: Double, x: Double): Double = {
    val MAXIT = 200; val EPS = 3e-14; val FPMIN = 1e-300
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FPMIN) d = FPMIN
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= MAXIT) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FPMIN) d = FPMIN
      c = 1.0 + aa / c; if (math.abs(c) < FPMIN) c = FPMIN
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FPMIN) d = FPMIN
      c = 1.0 + aa / c; if (math.abs(c) < FPMIN) c = FPMIN
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < EPS) return h
      m += 1
    }
    h // converged enough for our dof ranges
  }

  /** Regularized incomplete beta I_x(a, b). */
  def betainc(a: Double, b: Double, x: Double): Double = {
    require(x >= 0 && x <= 1, s"x out of range: $x")
    if (x == 0.0 || x == 1.0) return x
    val bt = math.exp(
      logGamma(a + b) - logGamma(a) - logGamma(b) +
        a * math.log(x) + b * math.log(1.0 - x))
    if (x < (a + 1.0) / (a + b + 2.0)) bt * betacf(a, b, x) / a
    else 1.0 - bt * betacf(b, a, 1.0 - x) / b
  }

  /** Student-t CDF P(T <= t) with dof ν. */
  def tCdf(t: Double, nu: Double): Double = {
    if (t.isNaN) return Double.NaN
    val x = nu / (nu + t * t)
    val p = 0.5 * betainc(nu / 2.0, 0.5, x)
    if (t > 0) 1.0 - p else p
  }

  /** Two-sided p-value for a t statistic. */
  def tTwoSidedP(t: Double, nu: Double): Double =
    if (t.isNaN) Double.NaN else betainc(nu / 2.0, 0.5, nu / (nu + t * t))

  /** Inverse t CDF (quantile) by bisection on tCdf — monotone, so safe. */
  def tInv(p: Double, nu: Double): Double = {
    require(p > 0 && p < 1)
    var lo = -1e3; var hi = 1e3
    var i = 0
    while (i < 200) {
      val mid = 0.5 * (lo + hi)
      if (tCdf(mid, nu) < p) lo = mid else hi = mid
      i += 1
    }
    0.5 * (lo + hi)
  }

  /** F CDF P(F <= f) with dof (d1, d2). */
  def fCdf(f: Double, d1: Double, d2: Double): Double =
    if (f <= 0) 0.0 else betainc(d1 / 2.0, d2 / 2.0, d1 * f / (d1 * f + d2))

  /** Standard normal CDF via erfc (Numerical-Recipes rational approx,
    * |err| < 1.2e-7 — used only for Wilcoxon normal approximation where
    * the reference itself uses an approximation). */
  def normCdf(z: Double): Double = {
    val t = 1.0 / (1.0 + 0.2316419 * math.abs(z))
    val d = 0.3989422804014327 * math.exp(-z * z / 2.0)
    val p = d * t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
      t * (-1.821255978 + t * 1.330274429))))
    if (z >= 0) 1.0 - p else p
  }
}

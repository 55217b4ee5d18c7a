package graft.stats

/** Tail-probability special functions for the statistics operators (M3/M4
  * χ² p-value, M8 ANOVA F p-value, M5/M7 t p-values).
  *
  * The reference reads these off R's `chisq.test` (`R_groupe4.R:838,884`)
  * and `summary(aov(...))` (`R_groupe4.R:874`); R computes them from the
  * regularized incomplete gamma/beta functions. Implemented here from the
  * standard public formulas (Abramowitz & Stegun §6.5/§26.4-26.6: series +
  * Lentz continued fractions, Lanczos log-gamma) — double precision,
  * relative accuracy ~1e-13 across the usable range.
  *
  * Pure scalar math: called from the codegen'd [[graft.functions.PValue]]
  * expressions over the (1-row) statistic aggregates, so p-values stay
  * inside the lazy plan — no driver-side collect.
  */
object SpecialFunctions {

  private val LanczosG = 7.0
  private val LanczosCoefs = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /** ln Γ(x) for x > 0 (Lanczos approximation, g = 7, n = 9). */
  def logGamma(x: Double): Double = {
    if (x.isNaN || x <= 0.0) return Double.NaN
    if (x < 0.5) {
      // reflection formula keeps the Lanczos series in its accurate range
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    } else {
      val z = x - 1.0
      var a = LanczosCoefs(0)
      var i = 1
      while (i < LanczosCoefs.length) {
        a += LanczosCoefs(i) / (z + i)
        i += 1
      }
      val t = z + LanczosG + 0.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  private val Eps = 1e-15
  private val MaxIter = 500
  private val Tiny = 1e-300

  /** Regularized lower incomplete gamma P(a, x) by its power series
    * (converges fast for x < a + 1). */
  private def gammaPSeries(a: Double, x: Double): Double = {
    var term = 1.0 / a
    var sum = term
    var n = 1
    while (n < MaxIter && math.abs(term) > math.abs(sum) * Eps) {
      term *= x / (a + n)
      sum += term
      n += 1
    }
    sum * math.exp(-x + a * math.log(x) - logGamma(a))
  }

  /** Regularized upper incomplete gamma Q(a, x) by the Legendre continued
    * fraction (modified Lentz; converges fast for x >= a + 1). */
  private def gammaQContinuedFraction(a: Double, x: Double): Double = {
    var b = x + 1.0 - a
    var c = 1.0 / Tiny
    var d = 1.0 / b
    var h = d
    var i = 1
    var del = 0.0
    do {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b
      if (math.abs(d) < Tiny) d = Tiny
      c = b + an / c
      if (math.abs(c) < Tiny) c = Tiny
      d = 1.0 / d
      del = d * c
      h *= del
      i += 1
    } while (i < MaxIter && math.abs(del - 1.0) > Eps)
    h * math.exp(-x + a * math.log(x) - logGamma(a))
  }

  /** Regularized lower incomplete gamma P(a, x) = γ(a,x)/Γ(a), a > 0. */
  def regGammaP(a: Double, x: Double): Double = {
    if (a.isNaN || x.isNaN || a <= 0.0) Double.NaN
    else if (x <= 0.0) 0.0
    else if (x < a + 1.0) gammaPSeries(a, x)
    else 1.0 - gammaQContinuedFraction(a, x)
  }

  /** Regularized upper incomplete gamma Q(a, x) = 1 − P(a, x). */
  def regGammaQ(a: Double, x: Double): Double = {
    if (a.isNaN || x.isNaN || a <= 0.0) Double.NaN
    else if (x <= 0.0) 1.0
    else if (x < a + 1.0) 1.0 - gammaPSeries(a, x)
    else gammaQContinuedFraction(a, x)
  }

  /** Continued fraction for the incomplete beta (modified Lentz). */
  private def betaContinuedFraction(x: Double, a: Double, b: Double): Double = {
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < Tiny) d = Tiny
    d = 1.0 / d
    var h = d
    var m = 1
    var del = 0.0
    do {
      val m2 = 2.0 * m
      // even step
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < Tiny) d = Tiny
      c = 1.0 + aa / c
      if (math.abs(c) < Tiny) c = Tiny
      d = 1.0 / d
      h *= d * c
      // odd step
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < Tiny) d = Tiny
      c = 1.0 + aa / c
      if (math.abs(c) < Tiny) c = Tiny
      d = 1.0 / d
      del = d * c
      h *= del
      m += 1
    } while (m < MaxIter && math.abs(del - 1.0) > Eps)
    h
  }

  /** Regularized incomplete beta I_x(a, b), a,b > 0, 0 <= x <= 1. */
  def regBetaI(x: Double, a: Double, b: Double): Double = {
    if (x.isNaN || a.isNaN || b.isNaN || a <= 0.0 || b <= 0.0) return Double.NaN
    if (x <= 0.0) return 0.0
    if (x >= 1.0) return 1.0
    val front = math.exp(
      a * math.log(x) + b * math.log1p(-x) - logGamma(a) - logGamma(b) + logGamma(a + b))
    // use the CF on the side where it converges fast; symmetry for the other
    if (x < (a + 1.0) / (a + b + 2.0)) front * betaContinuedFraction(x, a, b) / a
    else 1.0 - front * betaContinuedFraction(1.0 - x, b, a) / b
  }

  /** χ² upper-tail p-value: P[X² ≥ stat] with `dof` degrees of freedom —
    * what R's `chisq.test` prints (`R_groupe4.R:838`). */
  def chiSquarePValue(stat: Double, dof: Double): Double = {
    if (stat.isNaN || dof.isNaN || dof <= 0.0) Double.NaN
    else if (stat <= 0.0) 1.0
    else regGammaQ(dof / 2.0, stat / 2.0)
  }

  /** F upper-tail p-value: P[F(d1, d2) ≥ f] — what `summary(aov(...))`
    * prints (`R_groupe4.R:874`). Identity: P = I_{d2/(d2+d1·f)}(d2/2, d1/2). */
  def fPValue(f: Double, d1: Double, d2: Double): Double = {
    if (f.isNaN || d1.isNaN || d2.isNaN || d1 <= 0.0 || d2 <= 0.0) Double.NaN
    else if (f <= 0.0) 1.0
    else regBetaI(d2 / (d2 + d1 * f), d2 / 2.0, d1 / 2.0)
  }

  /** Two-sided Student-t p-value: P[|T(dof)| ≥ |t|] — R `lm` summary's
    * `Pr(>|t|)`. Identity: P = I_{dof/(dof+t²)}(dof/2, 1/2). */
  def tPValueTwoSided(t: Double, dof: Double): Double = {
    if (t.isNaN || dof.isNaN || dof <= 0.0) Double.NaN
    else regBetaI(dof / (dof + t * t), dof / 2.0, 0.5)
  }
}

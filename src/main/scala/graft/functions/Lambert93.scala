package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lambert-93 (EPSG:2154, RGF93 / Lambert Conformal Conic) → WGS84 inverse
  * projection (SURVEY.md §2.8 X1; ref `R_groupe4.R:93-106` which delegates
  * to `sf::st_transform`).
  *
  * Implemented from the published IGN NTG_71 / Snyder LCC formulas — no
  * geo library dependency. Projection constants are the published EPSG:2154
  * values (GRS80 ellipsoid, secant parallels 44°/49°, origin 3°E 46.5°N,
  * false origin 700000/6600000):
  *
  *   n  = 0.7256077650532670   (cone constant)
  *   C  = 11754255.426096      (projection constant, m)
  *   xs = 700000.0, ys = 12655612.049876 (pole of projection, m)
  *   e  = 0.08181919104281579  (GRS80 first eccentricity, √0.00669438002290)
  *
  * Inverse: R = √((X−xs)² + (Y−ys)²), γ = atan2(X−xs, ys−Y),
  * λ = λ0 + γ/n, isometric latitude L = −ln(R/C)/n, then latitude by the
  * standard fixed-point iteration φ ← 2·atan(((1+e·sinφ)/(1−e·sinφ))^(e/2) ·
  * e^L) − π/2. Seven iterations converge to < 1e-12 rad (double-precision
  * floor); we unroll a fixed count so the expression is a pure, branch-free
  * column computation — fully codegen-friendly inside whole-stage codegen,
  * no UDF serialization, usable verbatim in SQL and cross-engine oracles.
  */
object Lambert93 {
  val N: Double  = 0.7256077650532670
  val C: Double  = 11754255.426096
  val XS: Double = 700000.0
  val YS: Double = 12655612.049876
  val E: Double  = 0.08181919104281579
  val LON0_DEG: Double = 3.0
  val ITERS = 7

  /** Column expression: longitude in degrees from Lambert-93 (x, y) meters. */
  def lonDeg(x: Column, y: Column): Column = {
    val gamma = atan2(x - lit(XS), lit(YS) - y)
    // manual radian→degree conversion ((x/n)*180/π) so the op sequence is
    // reproducible verbatim in external SQL oracles (no engine-specific
    // `degrees` implementation variance)
    lit(LON0_DEG) + gamma / lit(N) * lit(180.0) / lit(math.Pi)
  }

  /** Column expression: latitude in degrees from Lambert-93 (x, y) meters. */
  def latDeg(x: Column, y: Column): Column = {
    val dx = x - lit(XS)
    val dy = y - lit(YS)
    val r = sqrt(dx * dx + dy * dy)
    val latIso = -log(r / lit(C)) / lit(N)
    var phi: Column = lit(2.0) * atan(exp(latIso)) - lit(math.Pi / 2)
    for (_ <- 1 to ITERS) {
      phi = lit(2.0) * atan(
        pow((lit(1.0) + lit(E) * sin(phi)) / (lit(1.0) - lit(E) * sin(phi)), lit(E / 2)) *
          exp(latIso)) - lit(math.Pi / 2)
    }
    phi * lit(180.0) / lit(math.Pi)
  }

  /** Plain-Scala reference implementation (same math, same iteration count)
    * for unit-test fixtures and driver-side spot checks. */
  def inverse(x: Double, y: Double): (Double, Double) = {
    val gamma = math.atan2(x - XS, YS - y)
    val lon = LON0_DEG + math.toDegrees(gamma / N)
    val r = math.sqrt((x - XS) * (x - XS) + (y - YS) * (y - YS))
    val latIso = -math.log(r / C) / N
    var phi = 2.0 * math.atan(math.exp(latIso)) - math.Pi / 2
    for (_ <- 1 to ITERS) {
      phi = 2.0 * math.atan(
        math.pow((1.0 + E * math.sin(phi)) / (1.0 - E * math.sin(phi)), E / 2) *
          math.exp(latIso)) - math.Pi / 2
    }
    (lon, math.toDegrees(phi))
  }

  /** The reference's manual map-calibration offsets (ref `R_groupe4.R:103-104`
    * — preserved verbatim for output parity). */
  val CALIB_LON_OFFSET: Double = -17.863636
  val CALIB_LAT_OFFSET: Double = -10.67772
}

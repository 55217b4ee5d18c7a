package graft

import graft.ml.Models
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executable form of the BASELINE.md correctness anchors: the reference
  * report's published numbers (Rapport_groupe4.pdf pp. 4/8 — mean age
  * 31.9, sd 28.5, median 30, quartier means 14.2 / 9.07, strongest
  * Pearson pair tronc_diam×age_estim at 0.75) asserted against a
  * DETERMINISTIC synthetic fixture engineered to those statistics, run
  * through the same engine operators the queries use (avg/stddev, exact
  * percentile, grouped means, the q41 correlation-matrix path).
  *
  * Construction (no RNG — inverse-CDF sampling, so the sample IS the
  * distribution up to O(1/n)):
  *  - age: three-piece uniform quantile function with F(30)=0.5 and the
  *    piece parameters solved so mean=31.9, sd=28.5 on [5,200]; then an
  *    exact affine correction pins the sample mean/sd to the published
  *    values (moving the median by only O(1/n)).
  *  - tronc_diam: 0.75·u + √(1−0.75²)·v with v Gram-Schmidt-orthogonalized
  *    against the standardized age u in-sample — the sample correlation is
  *    EXACTLY 0.75 by construction, not approximately.
  *  - haut_tot: 14.2/9.07 per quartier with zero-mean within-group
  *    deviations (exact group means); haut_tronc adds independent noise
  *    sized so every other pairwise |corr| stays well under 0.75.
  */
class ReportAnchorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val n = 8552

  /** Deterministic pseudo-noise in [-0.5, 0.5) (the classic sin-hash). */
  private def noise(i: Int, freq: Double): Double = {
    val v = math.sin(i * freq) * 43758.5453
    v - math.floor(v) - 0.5
  }

  private def centered(xs: Array[Double]): Array[Double] = {
    val m = xs.sum / xs.length
    xs.map(_ - m)
  }

  private def sdPop(xs: Array[Double]): Double = {
    val c = centered(xs)
    math.sqrt(c.map(x => x * x).sum / c.length)
  }

  private lazy val fixture = {
    // Piece bounds solved for mean 31.9 / sd 28.5 with median pinned at 30:
    // U[5,30] w=0.5, U[30,b] w=p, U[b,200] w=0.5-p.
    val b = 39.256477438
    val p = 0.431342581
    def quantile(q: Double): Double =
      if (q < 0.5) 5.0 + 25.0 * q / 0.5
      else if (q < 0.5 + p) 30.0 + (b - 30.0) * (q - 0.5) / p
      else b + (200.0 - b) * (q - 0.5 - p) / (0.5 - p)
    val raw = Array.tabulate(n)(i => quantile((i + 0.5) / n))
    val u = {
      val c = centered(raw); val s = sdPop(c); c.map(_ / s)
    } // exact mean 0, pop-sd 1
    val age = u.map(31.9 + 28.5 * _)

    // Exact-0.75 correlation via in-sample Gram-Schmidt.
    val e0 = centered(Array.tabulate(n)(i => noise(i, 12.9898)))
    val proj = e0.zip(u).map { case (a, b2) => a * b2 }.sum / u.map(x => x * x).sum
    val e1 = e0.zip(u).map { case (a, b2) => a - proj * b2 }
    val v = { val s = sdPop(e1); e1.map(_ / s) }
    val tronc = Array.tabulate(n)(i => 50.0 + 30.0 * (0.75 * u(i) + math.sqrt(1 - 0.5625) * v(i)))

    val quartier = Array.tabulate(n)(i => if (i % 2 == 0) "Centre-Ville" else "Saint-Jean")
    val htRawDev = Array.tabulate(n)(i => ((i % 7) - 3.0) * 0.5)
    val ht = new Array[Double](n)
    Seq(("Centre-Ville", 14.2), ("Saint-Jean", 9.07)).foreach { case (g, target) =>
      val idx = (0 until n).filter(quartier(_) == g)
      val gm = idx.map(htRawDev(_)).sum / idx.size
      idx.foreach(i => ht(i) = target + htRawDev(i) - gm) // exact group mean
    }
    // noise(...) has sd ≈ 0.289, so the 5.0 factor gives the independent
    // term sd ≈ 1.44 vs signal sd ≈ 1.1 → corr(haut_tot, haut_tronc) ≈ 0.6
    val htc = Array.tabulate(n)(i => 3.0 + 0.4 * ht(i) + 5.0 * noise(i, 7.8233))

    (0 until n).map(i => (age(i), tronc(i), ht(i), htc(i), quartier(i)))
      .toDF("age_estim", "tronc_diam", "haut_tot", "haut_tronc", "clc_quartier")
  }

  test("Rapport p.4: mean age 31.9, sd 28.5, median 30 (engine agg + exact percentile)") {
    val r = fixture.agg(
      avg($"age_estim").as("m"), stddev($"age_estim").as("s"),
      graft.stats.Stats.quantileExpr(spark, "age_estim", 0.5).as("med"))
      .as[(Double, Double, Double)].first()
    assert(math.round(r._1 * 10) / 10.0 == 31.9)
    assert(math.round(r._2 * 10) / 10.0 == 28.5)
    assert(math.round(r._3) == 30)
  }

  test("Rapport p.4: mean haut_tot Centre-Ville 14.2 / Saint-Jean 9.07 (grouped means)") {
    val m = fixture.groupBy("clc_quartier").agg(avg($"haut_tot").as("m"))
      .as[(String, Double)].collect().toMap
    assert(math.round(m("Centre-Ville") * 10) / 10.0 == 14.2)
    assert(math.round(m("Saint-Jean") * 100) / 100.0 == 9.07)
  }

  test("Rapport p.8: strongest Pearson pair is tronc_diam x age_estim at 0.75 (q41 path)") {
    val pairs = Models.correlationMatrix(fixture,
      Seq("haut_tot", "haut_tronc", "tronc_diam", "age_estim"))
      .as[(String, String, Double)].collect()
    val strongest = pairs.maxBy { case (_, _, c) => math.abs(c) }
    assert(Set(strongest._1, strongest._2) == Set("tronc_diam", "age_estim"))
    assert(math.round(strongest._3 * 100) / 100.0 == 0.75)
    // and it is strict: every other pair is materially weaker
    assert(pairs.filterNot(p => Set(p._1, p._2) == Set("tronc_diam", "age_estim"))
      .forall(p => math.abs(p._3) < 0.7))
  }
}

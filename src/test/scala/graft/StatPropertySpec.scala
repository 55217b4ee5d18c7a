package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the closed-form statistics family
  * (q334 rank-sum AUC, q348 sufficient-statistic CV, q349 minimax PAV):
  * each query's algebra is checked on RANDOM inputs against an
  * independent naive implementation — the single hand-computed fixtures
  * in EvalStatsSpec/IndexSketchCvSpec pin one point; these pin the
  * coefficient algebra everywhere the generators reach. Fixed seeds (the
  * PropertySpec convention — no scalatestplus bridge in the offline
  * cache), so every run samples the same inputs.
  */
class StatPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(1200L + i)))

  private def tmpDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def t(k: Int): java.sql.Timestamp = java.sql.Timestamp.from(
    java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(k.toLong))

  private def writeEvents(dir: String,
                          rows: Seq[(Long, String, Double)]): Unit =
    rows.zipWithIndex.map { case ((uid, typ, v), i) =>
      (i.toLong, t(i), uid, typ, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  /** Classic stack PAV over (bin, n, pos) rows sorted by bin — pools
    * adjacent blocks while the left rate exceeds the right. Independent
    * of q349's minimax identity; Barlow & Brunk prove they agree. */
  private def pavFit(bins: Seq[(Long, Long, Long)]): Map[Long, Double] = {
    val st = scala.collection.mutable.ArrayBuffer[(Long, Long, List[Long])]()
    bins.sortBy(_._1).foreach { case (b, n, p) =>
      st += ((n, p, List(b)))
      while (st.length >= 2 && {
        val (n2, p2, _) = st(st.length - 1)
        val (n1, p1, _) = st(st.length - 2)
        p1.toDouble / n1 > p2.toDouble / n2
      }) {
        val (n2, p2, m2) = st.remove(st.length - 1)
        val (n1, p1, m1) = st.remove(st.length - 1)
        st += ((n1 + n2, p1 + p2, m1 ++ m2))
      }
    }
    st.flatMap { case (n, p, ms) => ms.map(_ -> p.toDouble / n) }.toMap
  }

  test("q349 property: fit == stack PAV, monotone, pooled mean preserved") {
    // bins 0..B-1 with n_b in 1..5 events; value = b*10 + 0.5 lands each
    // event exactly in bin b (round(value*100) = 1000b + 50).
    val gen = for {
      nb <- Gen.chooseNum(2, 5)
      ns <- Gen.listOfN(nb, Gen.chooseNum(1, 5))
      ps <- Gen.sequence[List[Int], Int](ns.map(n => Gen.chooseNum(0, n)))
    } yield ns.zip(ps)
    samples(gen, 8).foreach { spec =>
      val dir = tmpDir("graft_pav_prop")
      val rows = spec.zipWithIndex.flatMap { case ((n, p), b) =>
        (0 until n).map(i =>
          (0L, if (i < p) "purchase" else "view", b * 10 + 0.5))
      }
      writeEvents(dir, rows)
      val got = Queries.queries("q349_isotonic_calibration")(spark, dir)
        .orderBy("bin")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      // input bins replay
      assert(got.map(r => (r._1, r._2, r._3)) ==
        spec.zipWithIndex.map { case ((n, p), b) =>
          (b.toLong, n.toLong, p.toLong) })
      // exact agreement with the independent stack PAV (same long-ratio
      // doubles on both paths, so the e6 rounding is bit-identical)
      val expect = pavFit(spec.zipWithIndex.map { case ((n, p), b) =>
        (b.toLong, n.toLong, p.toLong) })
      got.foreach { r =>
        assert(r._5 == math.round(expect(r._1) * 1e6),
          s"bin ${r._1}: got ${r._5}, pav ${expect(r._1)}") }
      // monotone non-decreasing
      val fits = got.map(_._5)
      assert(fits == fits.sorted)
      // pooled-mean preservation: sum n_i * fit_i == total positives
      val nTot = spec.map(_._1).sum
      val pTot = spec.map(_._2).sum
      val pooled = got.map(r => r._2 * (r._5.toDouble / 1e6)).sum
      assert(math.abs(pooled - pTot) <= 1e-6 * nTot + 1e-9,
        s"pooled $pooled != $pTot")
    }
  }

  test("q348 property: every fold's OOF fit matches a naive per-row OLS") {
    val gen = Gen.listOfN(40, for {
      ok <- Gen.chooseNum(0L, 20L)
      ln <- Gen.chooseNum(1, 7)
      x <- Gen.chooseNum(1, 50)
      y <- Gen.chooseNum(1, 1000)
    } yield (ok, ln, x.toDouble, y.toDouble))
    samples(gen, 6).foreach { rows =>
      val dir = tmpDir("graft_cv_prop")
      rows.toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val got = Queries.queries("q348_cv_ols")(spark, dir)
        .as[(Long, Long, Double, Double, Double)].collect()
      val byFold = rows.groupBy { case (ok, ln, _, _) => (ok + ln) % 5 }
      got.foreach { case (fold, n, slope, intercept, rmse) =>
        val in = byFold(fold).map { case (_, _, x, y) =>
          (math.round(x).toDouble, math.round(y).toDouble) }
        val out = byFold.filterNot(_._1 == fold).values.flatten.toSeq
          .map { case (_, _, x, y) =>
            (math.round(x).toDouble, math.round(y).toDouble) }
        assert(n == in.size)
        // naive mean-centered OLS on the complement (different float
        // path from the query's sufficient-statistic form)
        val xb = out.map(_._1).sum / out.size
        val yb = out.map(_._2).sum / out.size
        val b = out.map { case (x, y) => (x - xb) * (y - yb) }.sum /
          out.map { case (x, _) => (x - xb) * (x - xb) }.sum
        val a = yb - b * xb
        assert(math.abs(slope - b) <= 1e-5, s"fold $fold slope")
        assert(math.abs(intercept - a) <= 1e-3, s"fold $fold intercept")
        // held-out RMSE scored naively row-by-row
        val sse = in.map { case (x, y) =>
          val e = y - a - b * x; e * e }.sum
        assert(math.abs(rmse - math.sqrt(sse / in.size)) <= 1e-3,
          s"fold $fold rmse")
      }
    }
  }

  test("q334 property: rank-sum AUC equals brute-force pairwise count") {
    val gen = Gen.listOfN(60, for {
      typ <- Gen.frequency(1 -> Gen.const("purchase"), 3 -> Gen.const("view"))
      v <- Gen.chooseNum(0.0, 20.0)
    } yield (typ, math.round(v * 4) / 4.0)) // coarse grid forces score ties
    samples(gen, 8).foreach { raw =>
      // guarantee both classes exist whatever the generator drew
      val rows = raw ++ Seq(("purchase", 3.25), ("view", 2.75))
      val dir = tmpDir("graft_auc_prop")
      writeEvents(dir, rows.map { case (typ, v) => (0L, typ, v) })
      val got = Queries.queries("q334_roc_auc")(spark, dir)
        .as[(Long, Long, Option[Double])].collect().head
      val scored = rows.map { case (typ, v) =>
        (math.round(v * 100), typ == "purchase") }
      val pos = scored.filter(_._2).map(_._1)
      val neg = scored.filterNot(_._2).map(_._1)
      assert(got._1 == pos.size && got._2 == neg.size)
      val wins2 = (for (p <- pos; q <- neg)
        yield if (p > q) 2L else if (p == q) 1L else 0L).sum
      val brute = wins2.toDouble / (2.0 * pos.size * neg.size)
      assert(math.abs(got._3.get - brute) <= 6e-7,
        s"auc ${got._3.get} vs brute $brute")
    }
  }
}

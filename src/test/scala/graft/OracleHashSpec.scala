package graft

import graft.dedup.Dedup
import graft.functions.OracleHash
import graft.text.Text
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The md5/mod-p hash family (OracleHashes.scala) exists so an external SQL
  * engine can replay the near-dup signatures bit-for-bit; these tests pin
  * the cross-engine contract: md5Low64 against DuckDB-probed
  * `md5_number_lower` constants, the Mersenne-folded mulmod against
  * BigInteger, and family-level invariants of the signature expressions. */
class OracleHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("md5Low64 equals DuckDB md5_number_lower (probed constants)") {
    // select md5_number_lower(s) in DuckDB 1.0.0 for these inputs:
    assert(OracleHash.md5Low64("abc") == 8250560606382298838L)
    assert(OracleHash.md5Low64("minhash_a_0") == 865505216449203761L)
    assert(OracleHash.md5Low64("hello world") == java.lang.Long.parseUnsignedLong("14109032780988074899"))
  }

  test("mulModP61 matches BigInteger on 10k random pairs and edge values") {
    val P = BigInt(OracleHash.P61)
    val rnd = new scala.util.Random(7)
    val edges = Seq(0L, 1L, 2L, OracleHash.P61 - 1, OracleHash.P61 - 2,
      (1L << 60) + 12345L)
    val samples = edges.flatMap(e => edges.map((e, _))) ++
      (1 to 10000).map(_ => (math.abs(rnd.nextLong()) % OracleHash.P61,
        math.abs(rnd.nextLong()) % OracleHash.P61))
    samples.foreach { case (a, b) =>
      val expect = (BigInt(a) * BigInt(b) % P).toLong
      assert(OracleHash.mulModP61(a, b) == expect, s"mulmod($a, $b)")
    }
  }

  test("addModP61 matches BigInteger reduction") {
    val P = BigInt(OracleHash.P61)
    val vals = Seq(0L, 1L, OracleHash.P61 - 1, OracleHash.P61 / 2)
    for (a <- vals; b <- vals)
      assert(OracleHash.addModP61(a, b) == ((BigInt(a) + BigInt(b)) % P).toLong)
  }

  test("seeds are in range and the documented formula") {
    (0 until 32).foreach { i =>
      val a = OracleHash.seedA(i)
      val b = OracleHash.seedB(i)
      assert(a >= 1 && a < OracleHash.P61)
      assert(b >= 0 && b < OracleHash.P61)
      assert(a == java.lang.Long.remainderUnsigned(
        OracleHash.md5Low64(s"minhash_a_$i"), OracleHash.P61 - 1) + 1)
    }
  }

  test("MinHashSigP61: deterministic, in-range, equal docs share signatures") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely different document body here"),
      (4L, "xy")) // shorter than k → one clamped shingle
      .toDF("id", "text")
    val sigs = df.select($"id",
        Dedup.minHashSignature(Text.tokens($"text"), k = 3, numHashes = 16,
          family = "md5p61").as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1) == sigs(2))
    assert(sigs(1) != sigs(3))
    assert(sigs.values.forall(s => s.length == 16 &&
      s.forall(v => v >= 0 && v < OracleHash.P61)))
    // single-shingle doc: every position is that shingle's affine image
    val base = java.lang.Long.remainderUnsigned(OracleHash.md5Low64("xy"), OracleHash.P61)
    val expect4 = (0 until 16).map(j => OracleHash.addModP61(
      OracleHash.mulModP61(OracleHash.seedA(j), base), OracleHash.seedB(j)))
    assert(sigs(4L) == expect4)
  }

  test("SimHash64Md5: equal docs collide, near docs are close, far docs far") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (4L, "one two three four five six seven eight nine ten"))
      .toDF("id", "text")
    val sigs = df.select($"id", Dedup.simHash(Text.tokens($"text"), "md5p61").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1) == sigs(2))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1), sigs(3)) < hamming(sigs(1), sigs(4)))
  }

  test("single-token simhash equals the token hash (every vote unanimous)") {
    val df = Seq((1L, "solo")).toDF("id", "text")
    val sig = df.select(Dedup.simHash(Text.tokens($"text"), "md5p61"))
      .as[Long].collect().head
    assert(sig == OracleHash.md5Low64("solo"))
  }

  test("md5p61 minHashLsh finds the planted near-dup and not the far pair") {
    val df = Seq(
      (10L, "a b c d e f g h i j k l m n o p"),
      (11L, "a b c d e f g h i j k l m n o q"), // one token changed
      (12L, "z y x w v u t s r q p o n m l k"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashLsh(df, "text", "doc_id", k = 3, bands = 8,
        rowsPerBand = 2, threshold = 0.5, family = "md5p61")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 11L)))
    assert(!pairs.exists(p => p._1 == 12L || p._2 == 12L))
  }
}

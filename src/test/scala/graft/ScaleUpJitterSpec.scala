package graft

import graft.tools.ScaleUp
import org.scalatest.funsuite.AnyFunSuite

/** The `--jitter-embeddings` replica transform: a deterministic signed
  * permutation must be orthogonal (bijective coordinate map) so every
  * within-replica inner product is preserved bit-exactly, replica 0 must
  * be the identity, and distinct replicas must produce distinct maps so
  * cross-replica exact twins disappear. */
class ScaleUpJitterSpec extends AnyFunSuite {

  test("replica 0 is the identity with all-positive signs") {
    val (perm, signs) = ScaleUp.signedPerm(0, 64)
    assert(perm.toSeq == (0 until 64))
    assert(signs.forall(identity))
  }

  test("perm is a bijection for every replica (orthogonal transform)") {
    for (i <- 1 to 16) {
      val (perm, _) = ScaleUp.signedPerm(i, 64)
      assert(perm.sorted.toSeq == (0 until 64), s"replica $i not a bijection")
    }
  }

  test("deterministic: same (i, dim) yields the same transform") {
    val a = ScaleUp.signedPerm(7, 64)
    val b = ScaleUp.signedPerm(7, 64)
    assert(a._1.toSeq == b._1.toSeq && a._2.toSeq == b._2.toSeq)
  }

  test("signed permutation preserves inner products exactly; cross-replica twins break") {
    val rng = new scala.util.Random(42)
    val u = Array.fill(64)(rng.nextFloat() * 2 - 1)
    val v = Array.fill(64)(rng.nextFloat() * 2 - 1)
    def apply(i: Int, x: Array[Float]): Array[Float] = {
      val (perm, signs) = ScaleUp.signedPerm(i, 64)
      Array.tabulate(64)(j => if (signs(j)) x(perm(j)) else -x(perm(j)))
    }
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    for (i <- 1 to 8) {
      val (ru, rv) = (apply(i, u), apply(i, v))
      // bit-exact: only moves and negations, no float arithmetic
      assert(dot(ru, rv) == dot(u, v), s"replica $i changed an inner product")
      assert(dot(ru, ru) == dot(u, u))
      // the rotated copy is no longer its source's exact twin: cosine
      // well below any near-dup threshold
      val cos = dot(ru, u) / math.sqrt(dot(u, u) * dot(ru, ru))
      assert(math.abs(cos) < 0.9, s"replica $i cosine to source $cos")
    }
  }

  test("distinct replicas get distinct transforms (no accidental shared seed)") {
    val maps = (1 to 8).map(i => ScaleUp.signedPerm(i, 64)).map {
      case (p, s) => (p.toSeq, s.toSeq)
    }
    assert(maps.distinct.size == maps.size)
  }
}

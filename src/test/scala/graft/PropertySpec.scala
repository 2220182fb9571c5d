package graft

import graft.functions.TopKAggregator
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized-property checks of the pure algorithmic cores (no Spark
  * session — these are the invariants the distributed operators rely on).
  * Seeded, so failures reproduce. */
class PropertySpec extends AnyFunSuite {

  test("TopKAggregator ≡ global sort-take-k under any reduce/merge split") {
    val rnd = new Random(42)
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(60)
      val k = 1 + rnd.nextInt(8)
      val rows = List.fill(n)((rnd.nextInt(2000) / 2.0 - 500, rnd.nextInt(50).toLong))
      val agg = new TopKAggregator(k)
      val split = if (n == 0) 0 else rnd.nextInt(n + 1)
      val (a, b) = rows.splitAt(split)
      val bufA = a.foldLeft(agg.zero)(agg.reduce)
      val bufB = b.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.finish(agg.merge(bufA, bufB)).toSeq
      val expected = rows.sortBy { case (s, id) => (-s, id) }.take(k)
      assert(merged == expected, s"n=$n k=$k split=$split")
    }
  }

  test("planeWeights are stable and bounded for arbitrary planes/dims") {
    val rnd = new Random(7)
    (1 to 50).foreach { _ =>
      val p = rnd.nextInt(2000)
      val dims = 1 + rnd.nextInt(128)
      val w = graft.ops.SimilarityOps.planeWeights(p, dims)
      assert(w.length == dims)
      assert(w.forall(x => x >= -1000 && x <= 1000))
      assert(w == graft.ops.SimilarityOps.planeWeights(p, dims))
    }
  }

  test("VecCentroidAggregator: any reduce/merge tree ≈ sequential mean") {
    val rnd = new Random(13)
    (1 to 100).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val vecs = List.fill(n)(Array.fill(4)(rnd.nextDouble() * 20 - 10))
      val agg = new graft.functions.VecCentroidAggregator(4)
      val seq = agg.finish(vecs.foldLeft(agg.zero)(agg.reduce))
      val grouped = vecs.grouped(1 + rnd.nextInt(5))
        .map(g => g.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
      val tree = agg.finish(grouped)
      seq.zip(tree).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("rolling fingerprint stays in [0, P) and is order-sensitive") {
    val P = 1000000007L
    def fp(toks: Seq[Long]): Long =
      toks.foldLeft(0L)((acc, h) => (acc * 31 + (h % P)) % P)
    val rnd = new Random(99)
    (1 to 100).foreach { _ =>
      val toks = List.fill(1 + rnd.nextInt(50))(rnd.nextLong().abs)
      val f = fp(toks)
      assert(f >= 0 && f < P)
      if (toks.distinct.length > 1)
        assert(fp(toks) == fp(toks), "deterministic")
    }
    assert(fp(Seq(1L, 2L, 3L)) != fp(Seq(3L, 2L, 1L)))
  }
}

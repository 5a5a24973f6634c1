package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Buffer algebra of [[KmvAgg]] pinned against the executable definition:
  * sorted-distinct-take-k of everything seen so far. */
class KmvAggSpec extends AnyFunSuite {

  private def ref(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  test("reduce ≡ sorted-distinct-take-k at every prefix (randomized, duplicate-heavy)") {
    val rnd = new scala.util.Random(42)
    for (k <- Seq(1, 3, 8, 64)) {
      val agg = new KmvAgg(k)
      val xs = Seq.fill(500)(rnd.nextInt(60).toLong - 30L)
      var buf = agg.zero
      xs.zipWithIndex.foreach { case (x, i) =>
        buf = agg.reduce(buf, x)
        assert(buf.toSeq == ref(xs.take(i + 1), k),
          s"k=$k prefix=${i + 1}")
      }
    }
  }

  test("merge of any split ≡ sketch of the union (the KMV merge theorem, operationally)") {
    val rnd = new scala.util.Random(7)
    val agg = new KmvAgg(8)
    def sketch(xs: Seq[Long]) = xs.foldLeft(agg.zero)(agg.reduce)
    for (_ <- 0 until 50) {
      val xs = Seq.fill(120)(rnd.nextInt(50).toLong)
      val cut = rnd.nextInt(xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      assert(agg.merge(sketch(a), sketch(b)).toSeq == ref(xs, 8))
      // merge with zero on either side is identity
      assert(agg.merge(agg.zero, sketch(xs)).toSeq == ref(xs, 8))
      assert(agg.merge(sketch(xs), agg.zero).toSeq == ref(xs, 8))
    }
  }
}

package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: for arbitrary interval sets, the banded overlap join and
  * the point-in-interval enrich are exactly the naive forms, for any band
  * width (correctness never depends on the width choice — only fan-out
  * does). Seeded Gen sampling, the MinHashPropSpec convention. */
class IntervalJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genIntervals: Gen[List[(Long, Long, Long, Long)]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 2L)
      s <- Gen.choose(0L, 200L)
      len <- Gen.choose(0L, 30L)
    } yield (k, s, s + len))
  } yield rows.zipWithIndex.map { case ((k, s, e), i) => (k, i.toLong, s, e) }

  private val genPoints: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 2L)
      t <- Gen.choose(0L, 240L)
    } yield (k, t))
  } yield rows.zipWithIndex.map { case ((k, t), i) => (k, 1000L + i, t) }

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("overlapPairs ≡ overlapPairsNaive on random inputs and widths") {
    (1 to 8).foreach { seed =>
      val rows = sample(genIntervals, seed.toLong)
      val w = Seq(1L, 7L, 31L, 64L)(seed % 4)
      val iv = rows.toDF("k", "id", "s", "e")
      val banded = IntervalJoin.overlapPairs(iv, "k", "id", "s", "e",
          maxLen = 30L, bandWidth = w)
        .select("a_id", "b_id", "overlap").as[(Long, Long, Long)]
        .collect().toSet
      val naive = (for {
        (ak, aid, as_, ae) <- rows
        (bk, bid, bs, be) <- rows
        if ak == bk && aid < bid && as_ <= be && bs <= ae
      } yield (aid, bid,
        math.min(ae, be) - math.max(as_, bs) + 1)).toSet
      assert(banded == naive, s"seed $seed width $w")
    }
  }

  test("pointInIntervals ≡ naive containment join on random inputs") {
    (1 to 8).foreach { seed =>
      val ivRows = sample(genIntervals, seed.toLong)
      val ptRows = sample(genPoints, seed.toLong + 100)
      val iv = ivRows.toDF("k", "id", "s", "e")
      val pts = ptRows.toDF("k", "id", "t")
      val banded = IntervalJoin.pointInIntervals(pts, iv, "k", "id", "t",
          "id", "s", "e", maxLen = 30L)
        .select("point_id", "interval_id").as[(Long, Long)].collect().toSet
      val naive = (for {
        (pk, pid, t) <- ptRows
        (ik, iid, s, e) <- ivRows
        if pk == ik && s <= t && t <= e
      } yield (pid, iid)).toSet
      assert(banded == naive, s"seed $seed")
    }
  }
}

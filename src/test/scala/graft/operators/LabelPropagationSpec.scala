package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Pins [[LabelPropagation.run]]: community recovery on planted cliques,
  * deterministic tie behavior, and equality with a driver-side simulation
  * of the identical synchronous rules on random graphs. */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LabelPropagation.run(edges.toDF("a", "b"), iters).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("lbl")).toMap

  /** The same deterministic rules, simulated: majority neighbor label,
    * tie → smallest, synchronous rounds. */
  private def simulate(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nbrs = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lbl = nbrs.map { case (n, ns) =>
        val counts = ns.groupBy(lbl).view.mapValues(_.size.toLong)
        // max count, tie → min label  ==  max over (count, -label)
        n -> counts.toSeq.maxBy { case (l, c) => (c, -l) }._1
      }
    }
    lbl
  }

  test("two cliques joined by one bridge keep separate communities") {
    def clique(ids: Seq[Long]) =
      for (i <- ids.indices; j <- (i + 1) until ids.size)
        yield (ids(i), ids(j))
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((4L, 10L)) // the bridge CC would merge on — LPA must not
    val out = run(edges, 3)
    assert(Seq(1L, 2L, 3L).forall(out(_) == 1L))
    assert(Seq(11L, 12L, 13L).forall(out(_) == 10L))
    assert(out(4L) == 1L && out(10L) == 10L,
      "bridge endpoints stay with their majority side")
    assert(out == simulate(edges, 3))
  }

  test("tie on a single edge resolves to the smaller label both sides") {
    val out = run(Seq((5L, 9L)), 1)
    // each node's only neighbor label wins: they swap in a synchronous round
    assert(out == Map(5L -> 9L, 9L -> 5L))
    assert(out == simulate(Seq((5L, 9L)), 1))
  }

  test("random graphs: both paths == driver simulation, 1..3 iterations") {
    val rnd = new Random(1107)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = (for (i <- 0L until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.12) yield (i, j)).toSeq
      for (iters <- 1 to 3) {
        val want = simulate(edges, iters)
        // default: below driverMaxEdges → the collected path
        assert(run(edges, iters) == want,
          s"trial $trial, iters $iters: collected path diverged")
        // driverMaxEdges = 0 forces the distributed loop — bit-equal
        val dist = LabelPropagation.run(edges.toDF("a", "b"), iters,
            driverMaxEdges = 0L).collect()
          .map(r => r.getAs[Long]("node") -> r.getAs[Long]("lbl")).toMap
        assert(dist == want,
          s"trial $trial, iters $iters: distributed path diverged")
      }
    }
  }
}

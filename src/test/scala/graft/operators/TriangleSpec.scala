package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Pins [[Triangles.perNode]]: exact counts on known graphs, and
  * equality with a brute-force triple enumeration on random graphs (the
  * ConnectedComponentsSpec property-test discipline). */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    Triangles.perNode(edges.toDF("a", "b")).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("tri"),
          r.getAs[Double]("clustering")))).toMap

  test("K4: four triangles, every node in three, coefficient 1") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val out = run(k4)
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    assert(out.values.forall(_ == ((3L, 3L, 1.0))))
  }

  test("path graph closes nothing; adding the chord closes one") {
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    val out = run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(out(1L) == ((2L, 1L, 1.0)) && out(2L) == ((2L, 1L, 1.0)))
    // node 3 has deg 3 but only one closed pair: 2·1/(3·2) = 1/3
    assert(out(3L) == ((3L, 1L, 1.0 / 3.0)))
    assert(!out.contains(4L), "triangle-less nodes are not emitted")
  }

  test("random graphs: oriented count == brute-force triple enumeration") {
    val rnd = new Random(42)
    for (trial <- 1 to 3) {
      val n = 30
      val edges = (for (i <- 0L until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.2) yield (i, j)).toSeq
      val es = edges.toSet
      val brute = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for (i <- 0L until n; j <- (i + 1) until n; k <- (j + 1) until n)
        if (es((i, j)) && es((j, k)) && es((i, k))) {
          brute(i) += 1; brute(j) += 1; brute(k) += 1
        }
      val out = run(edges)
      assert(out.view.mapValues(_._2).toMap == brute.toMap,
        s"trial $trial: per-node triangle counts diverge from brute force")
      val deg = edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      out.foreach { case (node, (d, t, c)) =>
        assert(d == deg(node))
        assert(c == (2.0 * t) / (d.toDouble * (d - 1)))
      }
    }
  }
}

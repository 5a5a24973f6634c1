package graft.operators

import graft.SparkSpec

/** [[PageRank]] (q129): structural sanity (star center dominates, regular
  * graphs are uniform), rank-mass conservation under truncation, agreement
  * with a double-precision reference, and the no-in-edge base-rank path.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val S = PageRank.Scale

  private def sym(pairs: Seq[(String, String)]) =
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")

  test("star graph: the center outranks every leaf") {
    val edges = sym((1 to 8).map(i => ("hub", s"leaf$i")))
    val ranks = PageRank.run(edges, 5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks.size == 9)
    val leafRanks = ranks.filter(_._1 != "hub").values.toSet
    assert(leafRanks.size == 1, "leaves are symmetric → identical ranks")
    assert(ranks("hub") > 3 * leafRanks.head)
  }

  test("regular graph: uniform ranks at the uniform fixpoint") {
    // symmetrized 6-cycle: 2-regular → PageRank is exactly uniform
    val n = 6
    val edges = sym((0 until n).map(i => (s"v$i", s"v${(i + 1) % n}")))
    val ranks = PageRank.run(edges, 5).collect().map(_.getLong(1))
    assert(ranks.toSet.size == 1, "regular graph must stay uniform")
    // uniform fixpoint = SCALE/N up to the damping arithmetic's truncation
    assert(math.abs(ranks.head - S / n) <= 2)
  }

  test("rank mass is conserved up to integer truncation") {
    val rnd = new scala.util.Random(129)
    val pairs = (1 to 60).map(_ => (s"n${rnd.nextInt(20)}", s"n${rnd.nextInt(20)}"))
      .filter(p => p._1 != p._2).distinct
    val total = PageRank.run(sym(pairs), 5).collect().map(_.getLong(1)).sum
    // each round truncates < outdeg units per contribution + 2 damping
    // divisions per node: bounded well under 0.1% of SCALE here
    assert(total <= S && total > (S * 999L) / 1000L, s"mass $total vs $S")
  }

  test("fixed-point agrees with a double-precision reference") {
    val rnd = new scala.util.Random(4242)
    val pairs = (1 to 80).map(_ => (s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}"))
      .filter(p => p._1 != p._2).distinct
    // dedupe the symmetrized list ONCE and feed the same edges to both
    // (random pairs can contain both orientations; sym() would double them)
    val fwd = (pairs ++ pairs.map(_.swap)).distinct
    val sp = PageRank.run(fwd.toDF("src", "dst"), 5).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / S).toMap
    val nodes = fwd.map(_._1).distinct
    val outdeg = fwd.groupBy(_._1).map { case (k, v) => k -> v.size }
    var r = nodes.map(_ -> 1.0 / nodes.size).toMap
    for (_ <- 1 to 5) {
      val in = fwd.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / outdeg(src) }.sum
      }
      r = nodes.map(v => v -> (0.15 / nodes.size + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    for (v <- nodes)
      assert(math.abs(sp(v) - r(v)) < 1e-6, s"$v: ${sp(v)} vs ${r(v)}")
  }

  test("driver-collected path is bit-equal to the distributed loop") {
    val rnd = new scala.util.Random(77)
    val pairs = (1 to 120).map(_ => (s"n${rnd.nextInt(30)}", s"n${rnd.nextInt(30)}"))
      .filter(p => p._1 != p._2).distinct
    val fwd = (pairs ++ pairs.map(_.swap)).distinct.toDF("src", "dst")
    val collected = PageRank.run(fwd, 5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val distributed = PageRank.run(fwd, 5, driverMaxEdges = 0L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(collected == distributed)
    // and on a NON-symmetric graph (pure sinks exercise the -1/left-join shape)
    val asym = Seq(("a", "b"), ("a", "c"), ("c", "a")).toDF("src", "dst")
    val c2 = PageRank.run(asym, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val d2 = PageRank.run(asym, 3, driverMaxEdges = 0L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c2 == d2)
  }

  test("personalized: paths bit-equal, mass concentrates on seeds, off-graph seeds ignored") {
    val rnd = new scala.util.Random(11)
    val pairs = (1 to 120).map(_ => (s"n${rnd.nextInt(30)}", s"n${rnd.nextInt(30)}"))
      .filter(p => p._1 != p._2).distinct
    val fwd = (pairs ++ pairs.map(_.swap)).distinct.toDF("src", "dst")
    // n99 is NOT in the graph: both paths must normalize over seeds ∩ V
    val seeds = Seq("n0", "n1", "n2", "n99").toDF("node")
    val collected = PageRank.run(fwd, 4, seeds = Some(seeds)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val distributed = PageRank.run(fwd, 4, driverMaxEdges = 0L,
        seeds = Some(seeds)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(collected == distributed)
    assert(!collected.contains("n99"))
    // teleport mass only flows from seeds: seed mean rank must exceed the
    // non-seed mean on a (near-)regular random graph
    val seedSet = Set("n0", "n1", "n2")
    val (sd, other) = collected.partition { case (n, _) => seedSet(n) }
    assert(sd.values.sum / sd.size > other.values.sum / other.size)
    // uniform seeds = all nodes uses the UNIT algebra, not q129's base
    // formula — still bit-equal across paths
    val allSeeds = collected.keySet.toSeq.toDF("node")
    val cAll = PageRank.run(fwd, 3, seeds = Some(allSeeds)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dAll = PageRank.run(fwd, 3, driverMaxEdges = 0L,
        seeds = Some(allSeeds)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cAll == dAll)
  }

  test("non-symmetrized input: pure-source node keeps the damping base rank") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val out = PageRank.run(edges, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // nodes = out-degree holders only; 'a' never receives mass → base term
    assert(out.keySet == Set("a"))
    assert(out("a") == (15L * S) / (1L * 100L))
  }
}

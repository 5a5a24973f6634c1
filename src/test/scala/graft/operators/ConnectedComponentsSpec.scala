package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive chain collapses to one component; separate clusters stay apart") {
    val got = components((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("cycles converge (labels only decrease, fixpoint reached)") {
    val got = components((5L, 6L), (6L, 7L), (7L, 5L))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("self-loops and duplicate/reversed edges are tolerated") {
    val got = components((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("a long path needs diameter rounds and still converges") {
    val path = (1L until 20L).map(i => (i, i + 1))
    val got = components(path: _*)
    assert(got.values.toSet == Set(1L))
    assert(got.size == 20)
  }

  private def starComponents(edges: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.runStar(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("large-star/small-star equals min-label propagation on random graphs") {
    // 4 seeds (was 8): each seed pays a full iterated-rounds distributed
    // run; four distinct random graphs keep the property coverage
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val n = 30
      val edges = Seq.fill(40)((rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
        .filter { case (a, b) => a != b }
      val viaLabels = components(edges: _*)
      val viaStars = starComponents(edges: _*)
      assert(viaStars == viaLabels, s"seed $seed: $viaStars vs $viaLabels")
    }
  }

  test("runAdaptive equals run on BOTH sides of the driver-size threshold") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val n = 30
      val edges = Seq.fill(40)((rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
      val df = edges.toDF("a", "b")
      val distributed = components(edges: _*)
      // driverMax=0 forces the distributed path; large forces union-find
      val viaDriver = ConnectedComponents.runAdaptive(df, driverMax = 1000000L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaDistributed = ConnectedComponents.runAdaptive(df, driverMax = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaDriver == distributed, s"seed $seed union-find diverged")
      assert(viaDistributed == distributed, s"seed $seed escalation diverged")
    }
    // self-loop-only input: no edge-touched nodes at all
    val loops = ConnectedComponents.runAdaptive(
      Seq((5L, 5L)).toDF("a", "b"), driverMax = 1000000L)
    assert(loops.count() == 0)
  }

  test("large-star/small-star collapses a long path in few rounds") {
    // a 200-node path has diameter 199 — min-label propagation would need
    // 199 rounds (and default maxIter throws); the star algorithm's round
    // count is logarithmic, so it converges comfortably within maxIter
    val path = (1L until 200L).map(i => (i, i + 1))
    val got = starComponents(path: _*)
    assert(got.size == 200)
    assert(got.values.toSet == Set(1L))
  }

  test("q66's staged collapse keeps NULL-text docs as singletons (naive-join parity)") {
    // fingerprint(NULL) would be the md5('') constant — without the per-doc
    // null group key, all null-text docs would falsely cluster together,
    // diverging from the naive pair join (no posting rows) and the oracle
    val dir = tmpDir("q66-null")
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq((1L, None), (2L, None), (3L, Some(same)), (4L, Some(same)))
      .map { case (id, t) => (id, t.orNull, "en", "webA", 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q66_dedup_components")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L), s"got $got")
  }

  test("both algorithms return empty on an empty edge set") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.run(empty).count() == 0)
    assert(ConnectedComponents.runStar(empty).count() == 0)
    // self-loops only = no real edges
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("a", "b")
    assert(ConnectedComponents.run(loops).count() == 0)
    assert(ConnectedComponents.runStar(loops).count() == 0)
  }

  test("exhausting maxIter before the fixpoint throws instead of returning wrong labels") {
    import spark.implicits._
    val path = (1L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException](
      ConnectedComponents.run(path, maxIter = 5).collect())
    assert(e.getMessage.contains("did not converge"))
  }

  test("reliable-checkpoint mode produces the same labels and writes durable snapshots") {
    import spark.implicits._
    // a path forces several propagation rounds, so multiple checkpoint
    // windows (everyRounds=2) are exercised, plus the seed checkpoint
    val path = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val ckpt = tmpDir("cc-reliable")
    val mode = ConnectedComponents.ReliableCheckpoints(ckpt, everyRounds = 2)
    val viaLocal = ConnectedComponents.run(path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reliable mode must release every per-round persist before returning
    // (seal contract) — a long-lived cluster session pins nothing per run()
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val viaReliable = ConnectedComponents.run(path, mode = mode)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaReliable == viaLocal)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- pinnedBefore
    assert(leaked.isEmpty, s"reliable run() leaked cached RDDs: $leaked")
    // the durable snapshots must actually exist on the checkpoint store
    def files(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles()).toSeq.flatten.flatMap(c =>
        if (c.isDirectory) files(c) else Seq(c))
    assert(files(new java.io.File(ckpt)).nonEmpty,
      "reliable mode must write checkpoint files")
    // runStar honors the same contract
    val starReliable = ConnectedComponents.runStar(path, mode = mode)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starReliable == viaLocal)
  }

  test("star-reduced oversized LSH buckets come back as ONE whole cluster") {
    // the ADVICE r3 story end-to-end: a >cap duplicate cluster is
    // star-reduced by q41 (O(b) representative pairs), and connected
    // components recovers the full cluster from the star
    val dir = tmpDir("cc-degen")
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    (1L to 200L).map(i => (i, same, "en", "webA", same.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.conf.set("spark.graft.dedup.maxBucket", "50")
    try {
      val pairs = SparkEntry.queries("q41_dedup_minhash_lsh")(spark, dir)
        .select(col("a_id").as("a"), col("b_id").as("b"))
      val comp = ConnectedComponents.run(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comp.size == 200)
      assert(comp.values.toSet == Set(1L), "all 200 docs must share one component")
    } finally {
      spark.conf.unset("spark.graft.dedup.maxBucket")
      // CC consumed q41's pairs via localCheckpoint (an RDD materialization
      // that never fires QueryExecutionListener), so q41's docs cache was
      // never auto-released — drop it so later suites see a clean manager
      spark.sharedState.cacheManager.clearCache()
    }
  }
}

package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-16 semantic pins: q234's candidate collapse must be invisible in
  * the output. Candidates sharing an exact (embedding, codes) content are
  * interchangeable up to the (score DESC, c_id ASC) tie-break, so keeping
  * each content group's two smallest ids (two: a probe excludes itself)
  * is provably output-identical to scanning every member — exercised on
  * a duplicate-HEAVY replicated fixture where the collapse actually cuts
  * most of the pair volume. */
class R16QuerySemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("q234: content-group collapse ≡ direct brute force on a replicated corpus") {
    val e0 = Tables.embeddings(spark, sfDir).limit(300)
    // 3× replicas with distinct ids — every content group has >= 3 members,
    // and some probes (ids ≡ 0 mod 50) sit INSIDE groups at various ranks
    val e = (0 until 3).map { r =>
      e0.select((col("vec_id") + lit(r * 100000L)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)
    val direct = VectorQueries
      .quantizationFidelity(e, collapseIdentical = false)
      .collect().map(_.toSeq).toSeq
    val collapsed = VectorQueries
      .quantizationFidelity(e, collapseIdentical = true)
      .collect().map(_.toSeq).toSeq
    assert(direct.nonEmpty)
    assert(direct == collapsed,
      s"collapse changed the audit:\n direct    ${direct.take(3)}\n collapsed ${collapsed.take(3)}")
    // the fixture must actually exercise in-group probes: replicas give
    // near-1 best cosines, and for a probe that is NOT its group's min id
    // the winner is a SMALLER id (the rep-2 visibility case)
    val rows = collapsed.map(r => (r(0).asInstanceOf[Long],
      r(1).asInstanceOf[Long], r(4).asInstanceOf[Double]))
    assert(rows.forall(_._3 > 0.999999),
      "every probe has an exact replica, so best float cos must be ~1")
    assert(rows.exists { case (p, win, _) => p > 100000L && win < p },
      "fixture must include probes that are non-min members of their group")
  }

  test("q236: candidate collapse ≡ direct nprobe sweep on a replicated corpus") {
    val e0 = Tables.embeddings(spark, sfDir).limit(300)
    val e = (0 until 3).map { r =>
      e0.select((col("vec_id") + lit(r * 100000L)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)
    val direct = VectorQueries.ivfNprobeSweep(spark, e,
      collapseIdentical = false).collect().map(_.toSeq).toSeq
    val collapsed = VectorQueries.ivfNprobeSweep(spark, e,
      collapseIdentical = true).collect().map(_.toSeq).toSeq
    assert(direct.nonEmpty)
    assert(direct == collapsed,
      s"collapse changed the sweep:\n direct    $direct\n collapsed $collapsed")
    // replicas guarantee every probe's true neighbor is its exact twin in
    // the SAME cell, so recall@1 must be 1000 per-mille at every nprobe —
    // the fixture exercises in-group winners, the collapse's risk case
    assert(collapsed.forall(r => r(3).asInstanceOf[Long] == 1000L),
      "replicated fixture must give perfect recall")
  }

  test("q157: candidate collapse ≡ direct kNN graph on a 6x-replicated corpus") {
    // 6 replicas > keep-4: the collapse actually drops members, and every
    // top-3 list is IN-GROUP (exact twins at cos ~1) — the risk case
    val e0 = Tables.embeddings(spark, sfDir).limit(100)
    val e = (0 until 6).map { r =>
      e0.select((col("vec_id") + lit(r * 100000L)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)
    val direct = VectorQueries.knnGraph(spark, e,
      collapseIdentical = false).collect().map(_.toSeq).toSeq
    val collapsed = VectorQueries.knnGraph(spark, e,
      collapseIdentical = true).collect().map(_.toSeq).toSeq
    assert(direct.nonEmpty)
    assert(direct == collapsed)
    // a replica with id ABOVE its group's 4 smallest still gets a full
    // list (it is a probe, not a candidate) of in-group smallest ids
    val bySrc = collapsed.groupBy(_.head.asInstanceOf[Long])
    val high = bySrc.keys.filter(_ >= 500000L)
    assert(high.nonEmpty && high.forall(u => bySrc(u).size == 3))
  }

  test("a discarded equivalent construction cannot kill the next query's cache (supersede)") {
    // Simulate a schema-only consumer (the QueriesSmokeSpec sweep): compose
    // q37's staged plan, never act on it — this leaves a RunScopedCache
    // listener registered for the collapsed projection's plan. clearCache
    // (the sweep's hygiene step) then drops the entry but not the listener.
    val ghost = graft.SparkEntry.queries("q37_dedup_jaccard")(spark, sfDir)
    ghost.schema
    spark.sharedState.cacheManager.clearCache()
    // Pre-fix, the stale listener fired on THIS construction's adaptive
    // sizing job (plan-keyed cache ⇒ sameResult match) and unpersisted the
    // fresh entry mid-composition; the main plan then recomputed the
    // collapsed projection inline (the PlanSpec q37 IMR pin red).
    val df = graft.SparkEntry.queries("q37_dedup_jaccard")(spark, sfDir)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("InMemoryRelation"),
      "stale equivalent listener killed the fresh cache entry")
    // the run-scoped release still fires: nothing stays pinned
    val cm = spark.sharedState.cacheManager
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!cm.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cm.isEmpty, "run-scoped cache failed to release after the run")
  }

  test("q241: sketch join-size estimate collapses to EXACT when the union fits in k") {
    val rows = graft.SparkEntry.queries("q241_join_size_estimate")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[Long]("k_used")
      val est = r.getAs[Double]("est_join")
      val exact = r.getAs[Long]("exact_join")
      assert(exact > 0L, s"fixture pair ${r.getString(0)}/${r.getString(1)} joins empty")
      if (k < 64)
        // sample == key universe → the estimator IS the exact join size
        assert(est == exact.toDouble, s"sub-k pair must be exact: $r")
      else
        assert(math.abs(est - exact) / exact < 0.5,
          s"k=64 estimate off by ≥50%: $r")
    }
  }

  test("q243: pruning audit invariants — admission is sound, curves beat linear on the band") {
    val rows = graft.SparkEntry.queries("q243_layout_pruning")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("files_present"),
        r.getAs[Long]("files_read"), r.getAs[Long]("rows_scanned"),
        r.getAs[Long]("rows_matched")))
    assert(rows.length == 9)
    rows.foreach { case (l, b, fp, fr, rs, rm) =>
      assert(fr <= fp, s"($l,$b) read more files than exist")
      // soundness: every matching row lives in a file whose bbox contains
      // it, so stats admission can never scan fewer rows than match
      assert(rs >= rm, s"($l,$b) admission dropped matching rows")
    }
    val scanned = rows.map { case (l, b, _, _, rs, _) => (l, b) -> rs }.toMap
    for (curve <- Seq("zorder", "hilbert"))
      assert(scanned((curve, "band_y")) < scanned(("linear", "band_y")),
        s"$curve must out-prune the single-column layout on the orthogonal band")
  }

  test("q244: water level invariants — feasible, ratio-exact, limiting source binds") {
    val rows = graft.SparkEntry.queries("q244_mix_water_fill")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val wTotal = rows.map(r => r.getAs[Long]("weight")).sum
    val tMax = rows.head.getAs[Long]("t_max")
    rows.foreach { r =>
      val avail = r.getAs[Long]("avail_tokens")
      val w = r.getAs[Long]("weight")
      val cap = r.getAs[Long]("cap_total")
      val alloc = r.getAs[Long]("alloc_tokens")
      assert(alloc <= avail, s"infeasible allocation: $r")
      assert(cap >= tMax, "level must be the min of the caps")
      assert(r.getAs[Boolean]("limiting") == (cap == tMax))
      // exact-ratio: alloc is the floor of T·w/W, so the cross-multiplied
      // deviation from the target share is bounded by the floor slack
      assert(tMax * w - alloc * wTotal >= 0L &&
        tMax * w - alloc * wTotal < wTotal, s"ratio drift: $r")
    }
    val lim = rows.filter(_.getAs[Boolean]("limiting"))
    assert(lim.nonEmpty, "some source must bind the level")
    lim.foreach { r =>
      // the binding source is (within floor slack) fully consumed
      assert(r.getAs[Long]("alloc_tokens") >= r.getAs[Long]("avail_tokens") - 1L)
    }
  }
}

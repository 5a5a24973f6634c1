package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming aggregate IVM ≡ batch q258: the retraction algebra
  * ([[RollupStream.maintain]]) applied to a live pre/post-image CDC feed
  * must converge to exactly the batch-maintained rollup — bootstrap
  * (base rows as inserts) and the change batch arrive as uneven
  * micro-batch waves, updates move keys between segments mid-stream,
  * deletes retract, and a fully-retracted group must read back as zero. */
class StreamingIvmSpec extends SparkSpec {
  import spark.implicits._

  test("streamed ±retraction rollup ≡ batch q258 (bootstrap + CDC waves)") {
    implicit val sc = spark.sqlContext
    // bootstrap: every base customer as an insert (no pre-image)
    val base = Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        lit(null).cast("string").as("old_seg"),
        lit(null).cast("double").as("old_bal"),
        col("c_mktsegment").as("new_seg"),
        col("c_acctbal").as("new_bal"))
    // the q258 change batch resolved latest-wins, enriched with the base
    // PRE-image for every key that had one (the Debezium shape)
    val feed = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(
        when(col("o_orderkey") % 7 === 0, col("o_custkey") + 1000000000000L)
          .otherwise(col("o_custkey")).as("c_custkey"),
        col("o_totalprice").as("bal"),
        col("o_orderpriority").as("seg"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 10 === 0, lit("D"))
          .otherwise(lit("U")).as("op"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("c_custkey").orderBy(col("seq").desc)))
      .filter(col("rn") === 1)
    val changes = feed.join(
        Tables.customer(spark, sfDir).select(col("c_custkey"),
          col("c_mktsegment").as("old_seg0"),
          col("c_acctbal").as("old_bal0")),
        Seq("c_custkey"), "left")
      .select(col("c_custkey"), col("old_seg0").as("old_seg"),
        col("old_bal0").as("old_bal"),
        when(col("op") === "U", col("seg")).as("new_seg"),
        when(col("op") === "U", col("bal")).as("new_bal"))
    val rows = base.unionByName(changes)
      .as[(Long, String, java.lang.Double, String, java.lang.Double)]
      .collect()
    // base must stream BEFORE the change that retracts it: wave 1+2 are
    // the bootstrap, waves 3+4 the CDC batch (uneven cuts)
    val nb = base.count().toInt
    val waves = Seq(rows.slice(0, nb / 3), rows.slice(nb / 3, nb),
      rows.slice(nb, nb + 40), rows.slice(nb + 40, rows.length))
    val mem = MemoryStream[(Long, String, java.lang.Double, String,
      java.lang.Double)]
    val q = RollupStream.maintain(
        mem.toDF().toDF("k", "old_seg", "old_bal", "new_seg", "new_bal"))
      .writeStream.format("memory").queryName("ivm_rollup")
      .outputMode(OutputMode.Complete()).start()
    waves.foreach { w => mem.addData(w.toSeq: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("ivm_rollup")
      .filter(col("n_rows") > 0) // the q258 zero-count drop, at read time
      .select(col("c_mktsegment"), col("n_rows"),
        col("sum_bal").cast("double").as("total_bal"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    val zeroed = spark.table("ivm_rollup").filter(col("n_rows") === 0)
      .select("c_mktsegment").as[String].collect().toSet

    val batch = SparkEntry.queries("q258_ivm_agg_retract")(spark, sfDir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap

    assert(streamed == batch,
      s"stream ≠ batch:\n stream ${streamed.toSeq.sortBy(_._1)}\n batch ${batch.toSeq.sortBy(_._1)}")
    // a fully-retracted base segment must exist at this scale and read
    // back as an exact zero (n = 0 AND sum = 0 — the lossless-subtraction
    // proof), surfacing only through the n > 0 filter
    assert(zeroed.nonEmpty, "no fully-retracted group in fixture")
    assert(zeroed.intersect(batch.keySet).isEmpty)
    val zeroSums = spark.table("ivm_rollup").filter(col("n_rows") === 0)
      .select(col("sum_bal").cast("double")).as[Double].collect()
    assert(zeroSums.forall(_ == 0.0), s"retracted groups must sum to exactly 0: ${zeroSums.toSeq}")
  }

  test("streamed ±value-count histogram ≡ batch q268 min/max (retracted max hands off to the runner-up)") {
    implicit val sc = spark.sqlContext
    // same pre/post-image feed as the q258 twin above
    val base = Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        lit(null).cast("string").as("old_seg"),
        lit(null).cast("double").as("old_bal"),
        col("c_mktsegment").as("new_seg"),
        col("c_acctbal").as("new_bal"))
    val feed = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(
        when(col("o_orderkey") % 7 === 0,
          col("o_custkey") + 1000000000000L)
          .otherwise(col("o_custkey")).as("c_custkey"),
        col("o_totalprice").as("bal"),
        col("o_orderpriority").as("seg"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 10 === 0, lit("D"))
          .otherwise(lit("U")).as("op"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("c_custkey").orderBy(col("seq").desc)))
      .filter(col("rn") === 1)
    val changes = feed.join(
        Tables.customer(spark, sfDir).select(col("c_custkey"),
          col("c_mktsegment").as("old_seg0"),
          col("c_acctbal").as("old_bal0")),
        Seq("c_custkey"), "left")
      .select(col("c_custkey"), col("old_seg0").as("old_seg"),
        col("old_bal0").as("old_bal"),
        when(col("op") === "U", col("seg")).as("new_seg"),
        when(col("op") === "U", col("bal")).as("new_bal"))
    val rows = base.unionByName(changes)
      .as[(Long, String, java.lang.Double, String, java.lang.Double)]
      .collect()
    val nb = base.count().toInt
    val waves = Seq(rows.slice(0, nb / 3), rows.slice(nb / 3, nb),
      rows.slice(nb, nb + 40), rows.slice(nb + 40, rows.length))
    val mem = MemoryStream[(Long, String, java.lang.Double, String,
      java.lang.Double)]
    val q = RollupStream.maintainValueCounts(
        mem.toDF().toDF("k", "old_seg", "old_bal", "new_seg", "new_bal"))
      .writeStream.format("memory").queryName("ivm_hist")
      .outputMode(OutputMode.Complete()).start()
    waves.foreach { w => mem.addData(w.toSeq: _*); q.processAllAvailable() }
    q.stop()
    // the reader's fold: surviving counts only, min/max per segment
    val streamed = spark.table("ivm_hist")
      .filter(col("n") > 0)
      .groupBy("c_mktsegment")
      .agg(sum(col("n")).as("n_rows"),
        min(col("bal_cents")).as("min_bal_cents"),
        max(col("bal_cents")).as("max_bal_cents"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val batch = SparkEntry.queries("q268_ivm_minmax_retract")(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(streamed == batch,
      s"stream ≠ batch:\n stream ${streamed.toSeq.sortBy(_._1)}\n batch ${batch.toSeq.sortBy(_._1)}")
    // the NON-abelian hard case must actually occur: some base segment's
    // max holder was retracted, so its surviving max is strictly below
    // the base max (the runner-up handoff — a (group, max) state could
    // not have answered this)
    val baseMax = Tables.customer(spark, sfDir)
      .groupBy(col("c_mktsegment"))
      .agg(max((col("c_acctbal").cast(
        org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long")).as("mx"))
      .as[(String, Long)].collect().toMap
    val dropped = baseMax.filter { case (seg, mx) =>
      batch.get(seg).exists(_._4 < mx) }
    assert(dropped.nonEmpty,
      "no segment's max was retracted — the fixture stopped exercising the handoff")
    // the SAME streamed histogram state serves q273's exact-percentile
    // readout: nearest-rank p50/p90 over surviving counts ≡ batch q273
    val W = Window.partitionBy("c_mktsegment").orderBy("bal_cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val T = Window.partitionBy("c_mktsegment")
    val streamedPct = spark.table("ivm_hist")
      .filter(col("n") > 0)
      .withColumn("cum", sum(col("n")).over(W))
      .withColumn("nr", sum(col("n")).over(T))
      .groupBy("c_mktsegment")
      .agg(max(col("nr")).as("n_rows"),
        min(when(col("cum") >= expr("(nr + 1) div 2"),
          col("bal_cents"))).as("p50"),
        min(when(col("cum") >= expr("(9 * nr + 9) div 10"),
          col("bal_cents"))).as("p90"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val batchPct = SparkEntry.queries("q273_ivm_percentile_retract")(
        spark, sfDir)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(streamedPct == batchPct,
      s"streamed percentile readout ≠ batch q273:\n stream ${streamedPct.toSeq.sortBy(_._1)}\n batch ${batchPct.toSeq.sortBy(_._1)}")
  }

  test("streamed ±BUCKET counts + drill-down ≡ batch q276 (the wide-domain percentile twin)") {
    implicit val sc = spark.sqlContext
    // same pre/post-image feed as the q258/q268 twins above
    val base = Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        lit(null).cast("string").as("old_seg"),
        lit(null).cast("double").as("old_bal"),
        col("c_mktsegment").as("new_seg"),
        col("c_acctbal").as("new_bal"))
    val feed = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(
        when(col("o_orderkey") % 7 === 0,
          col("o_custkey") + 1000000000000L)
          .otherwise(col("o_custkey")).as("c_custkey"),
        col("o_totalprice").as("bal"),
        col("o_orderpriority").as("seg"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 10 === 0, lit("D"))
          .otherwise(lit("U")).as("op"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("c_custkey").orderBy(col("seq").desc)))
      .filter(col("rn") === 1)
    val changes = feed.join(
        Tables.customer(spark, sfDir).select(col("c_custkey"),
          col("c_mktsegment").as("old_seg0"),
          col("c_acctbal").as("old_bal0")),
        Seq("c_custkey"), "left")
      .select(col("c_custkey"), col("old_seg0").as("old_seg"),
        col("old_bal0").as("old_bal"),
        when(col("op") === "U", col("seg")).as("new_seg"),
        when(col("op") === "U", col("bal")).as("new_bal"))
    val rows = base.unionByName(changes)
      .as[(Long, String, java.lang.Double, String, java.lang.Double)]
      .collect()
    val nb = base.count().toInt
    val waves = Seq(rows.slice(0, nb / 3), rows.slice(nb / 3, nb),
      rows.slice(nb, nb + 40), rows.slice(nb + 40, rows.length))
    val mem = MemoryStream[(Long, String, java.lang.Double, String,
      java.lang.Double)]
    val q = RollupStream.maintainBucketCounts(
        mem.toDF().toDF("k", "old_seg", "old_bal", "new_seg", "new_bal"))
      .writeStream.format("memory").queryName("ivm_bucket")
      .outputMode(OutputMode.Complete()).start()
    waves.foreach { w => mem.addData(w.toSeq: _*); q.processAllAvailable() }
    q.stop()
    // locate the rank-holding buckets from the STREAMED state...
    val cum = Window.partitionBy("c_mktsegment").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("c_mktsegment")
    val located = spark.table("ivm_bucket")
      .filter(col("n") > 0)
      .withColumn("cum", sum(col("n")).over(cum))
      .withColumn("nr", sum(col("n")).over(tot))
    def target(which: String, rank: org.apache.spark.sql.Column) =
      located.withColumn("r", rank)
        .filter(col("cum") >= col("r") &&
          col("cum") - col("n") < col("r"))
        .select(col("c_mktsegment").as("seg"), col("bucket"),
          (col("r") - (col("cum") - col("n"))).as("resid"),
          lit(which).as("which"), col("nr"))
    val targets = target("p50", expr("(nr + 1) div 2"))
      .unionByName(target("p90", expr("(9 * nr + 9) div 10")))
    // ...and drill into the current latest-wins rows (the batch lake
    // read the operator documents), pruned to the target buckets
    def cents(c: org.apache.spark.sql.Column) =
      (c.cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long")
    val current = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
        col("c_acctbal"))
      .join(feed.select("c_custkey"), Seq("c_custkey"), "left_anti")
      .select(col("seg"), cents(col("c_acctbal")).as("bal_cents"))
      .unionByName(feed.filter(col("op") === "U")
        .select(col("seg"), cents(col("bal")).as("bal_cents")))
      .withColumn("bucket", shiftright(col("bal_cents"), 13))
    val streamed = current
      .join(broadcast(targets), Seq("seg", "bucket"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("seg", "bucket", "which").orderBy("bal_cents")))
      .filter(col("rn") === col("resid"))
      .groupBy(col("seg").as("c_mktsegment"))
      .agg(max(col("nr")).as("n_rows"),
        min(when(col("which") === "p50", col("bal_cents")))
          .as("p50_cents"),
        min(when(col("which") === "p90", col("bal_cents")))
          .as("p90_cents"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val batch = SparkEntry.queries("q276_ivm_bucket_percentile")(
        spark, sfDir)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(streamed == batch,
      s"streamed bucket readout ≠ batch q276:\n stream ${streamed.toSeq.sortBy(_._1)}\n batch ${batch.toSeq.sortBy(_._1)}")
  }

  test("streamed ± coarse WIDE buckets + 256-ary refinement ≡ batch q281 (the any-domain-width twin)") {
    implicit val sc = spark.sqlContext
    // the q281 fixture as a changelog: base rows bootstrap as inserts,
    // deletes carry only a pre-image, adds only a post-image
    val vExpr = (col("l_orderkey") % 4194304L) * 1099511627776L +
      (col("l_partkey") % 1048576L) * 1048576L +
      (col("l_suppkey") % 1048576L)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("flag"), vExpr.as("v"),
        col("l_orderkey"), col("l_suppkey"))
    val nullS = lit(null).cast("string")
    val nullV = lit(null).cast("long")
    val baseIns = li.filter(col("l_orderkey") % 4 =!= 0)
      .select(nullS.as("old_seg"), nullV.as("old_v"),
        col("flag").as("new_seg"), col("v").as("new_v"))
      .as[(String, java.lang.Long, String, java.lang.Long)].collect()
    val dels = li.filter(col("l_orderkey") % 4 =!= 0 &&
        col("l_suppkey") % 10 === 3)
      .select(col("flag").as("old_seg"), col("v").as("old_v"),
        nullS.as("new_seg"), nullV.as("new_v"))
      .as[(String, java.lang.Long, String, java.lang.Long)].collect()
    val adds = li.filter(col("l_orderkey") % 4 === 0)
      .select(nullS.as("old_seg"), nullV.as("old_v"),
        col("flag").as("new_seg"), col("v").as("new_v"))
      .as[(String, java.lang.Long, String, java.lang.Long)].collect()
    val nb = baseIns.length
    val waves = Seq(baseIns.slice(0, nb / 2), baseIns.slice(nb / 2, nb),
      dels.take(dels.length / 2) ++ adds.take(adds.length / 2),
      dels.drop(dels.length / 2) ++ adds.drop(adds.length / 2))
    val mem = MemoryStream[(String, java.lang.Long, String,
      java.lang.Long)]
    val q = RollupStream.maintainWideBucketCounts(
        mem.toDF().toDF("old_seg", "old_v", "new_seg", "new_v"))
      .writeStream.format("memory").queryName("ivm_wide_bucket")
      .outputMode(OutputMode.Complete()).start()
    waves.foreach { w => mem.addData(w.toSeq: _*); q.processAllAvailable() }
    q.stop()
    // the STREAMED maintained state must be the batch surviving
    // histogram exactly (and coarse: far fewer rows than values)
    val state = spark.table("ivm_wide_bucket").filter(col("n") > 0)
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3)
      .toMap
    val surviving = li
      .filter(col("l_orderkey") % 4 === 0 || col("l_suppkey") % 10 =!= 3)
      .select(col("flag"), col("v"))
    val batchHist = surviving
      .groupBy(col("flag"), shiftright(col("v"), 40).as("b"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3)
      .toMap
    assert(state == batchHist,
      s"streamed bucket state ≠ batch histogram (${state.size} vs ${batchHist.size} buckets)")
    // locate from the STREAMED state (driver-sized), refine to exact
    // values, compare against the declared q281 readout
    val bw = 1099511627776L
    val byG = state.toSeq.map { case ((g, b), n) => (g, b, n) }
      .groupBy(_._1)
    val probes = byG.toSeq.flatMap { case (g, bs) =>
      val sorted = bs.sortBy(_._2)
      val total = sorted.map(_._3).sum
      Seq(0 -> ((total + 1) / 2), 1 -> ((9 * total + 9) / 10)).map {
        case (pid, rank) =>
          var rem = rank
          val it = sorted.iterator
          var chosen: (String, Long, Long) = null
          while (chosen == null && it.hasNext) {
            val e = it.next()
            if (e._3 >= rem) chosen = e else rem -= e._3
          }
          (g: Any, pid, chosen._2 * bw, chosen._2 * bw + (bw - 1L), rem)
      }
    }
    val resolved = graft.functions.ExactSelect.valuesAtRanks(
      surviving, "flag", "v", probes)
    val totals = byG.map { case (g, bs) => g -> bs.map(_._3).sum }
    val streamedOut = totals.map { case (g, n) =>
      g -> ((n, resolved((g, 0)), resolved((g, 1)))) }
    val declared = SparkEntry.queries("q281_ivm_wide_percentile")(
        spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(streamedOut == declared,
      s"streamed locate+refine ≠ batch q281:\n stream ${streamedOut.toSeq.sortBy(_._1)}\n batch ${declared.toSeq.sortBy(_._1)}")
  }

  // the bi-changelog fixture shared by the flatMapGroupsWithState and
  // transformWithState tests: DELIBERATELY mis-ordered waves — half the
  // customer retractions and the whole arrival batch land BEFORE the
  // right bootstrap finishes, and some retractions precede their own
  // key's bootstrap; bilinearity over signed multisets makes the folded
  // deltas exact anyway (counts pass through negative values)
  // the five component event sets of the bi-changelog fixture:
  // (customer bootstrap, customer pre-image retractions, upsert
  // post-images, pre-delta orders bootstrap, the orders arrival batch)
  private def biParts(): (Array[JoinViewStream.BiEvent],
      Array[JoinViewStream.BiEvent], Array[JoinViewStream.BiEvent],
      Array[JoinViewStream.BiEvent], Array[JoinViewStream.BiEvent]) = {
    import JoinViewStream.BiEvent
    val cents = (c: org.apache.spark.sql.Column) =>
      (c.cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long")
    // LEFT changelog: customer bootstrap + the q264 CDC batch
    val lBoot = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .as[(Long, String)].collect()
      .map { case (k, seg) => BiEvent(k, "L", 1L, seg, 0L) }
    val feed = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(
        when(col("o_orderkey") % 7 === 0,
          col("o_custkey") + 1000000000000L)
          .otherwise(col("o_custkey")).as("c_custkey"),
        col("o_orderpriority").as("seg"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 10 === 0, lit("D"))
          .otherwise(lit("U")).as("op"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("c_custkey").orderBy(col("seq").desc)))
      .filter(col("rn") === 1)
    val lPre = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .join(feed.select("c_custkey"), Seq("c_custkey"))
      .as[(Long, String)].collect()
      .map { case (k, seg) => BiEvent(k, "L", -1L, seg, 0L) }
    val lPost = feed.filter(col("op") === "U")
      .select(col("c_custkey"), col("seg"))
      .as[(Long, String)].collect()
      .map { case (k, seg) => BiEvent(k, "L", 1L, seg, 0L) }
    // RIGHT changelog: the pre-delta orders bootstrap + the arrival batch
    val rBoot = Tables.orders(spark, sfDir)
      .filter(!(col("o_orderkey") % 17 === 3))
      .select(col("o_custkey"), cents(col("o_totalprice")))
      .as[(Long, Long)].collect()
      .map { case (k, c) => BiEvent(k, "R", 1L, null, c) }
    val rNew = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 17 === 3)
      .select(col("o_custkey"), cents(col("o_totalprice")))
      .as[(Long, Long)].collect()
      .map { case (k, c) => BiEvent(k, "R", 1L, null, c) }
    (lBoot, lPre, lPost, rBoot, rNew)
  }

  private def biWaves(): Seq[Seq[JoinViewStream.BiEvent]] = {
    val (lBoot, lPre, lPost, rBoot, rNew) = biParts()
    val nb = rBoot.length
    Seq(
      lBoot.take(lBoot.length / 2).toSeq ++ lPre.take(lPre.length / 2),
      rNew.toSeq ++ rBoot.take(nb / 3),
      lBoot.drop(lBoot.length / 2).toSeq ++ rBoot.slice(nb / 3, nb / 2),
      lPre.drop(lPre.length / 2).toSeq ++ lPost ++ rBoot.drop(nb / 2))
  }

  // driver-side reference fold of the per-key live multisets — the LIVE
  // key set (a key whose multisets both drain to empty is dead and must
  // hold NO state row; "keys ever touched" is the leak the r18 pin
  // masked)
  private def foldLive(evs: Seq[JoinViewStream.BiEvent])
      : Map[Long, (Map[String, Long], Map[Long, Long])] = {
    val m = scala.collection.mutable.Map
      .empty[Long, (Map[String, Long], Map[Long, Long])]
    evs.foreach { e =>
      val (l, r) = m.getOrElse(e.k,
        (Map.empty[String, Long], Map.empty[Long, Long]))
      val nu = if (e.side == "L") {
        val n = l.getOrElse(e.seg, 0L) + e.sgn
        (if (n == 0L) l - e.seg else l.updated(e.seg, n), r)
      } else {
        val n = r.getOrElse(e.cents, 0L) + e.sgn
        (l, if (n == 0L) r - e.cents else r.updated(e.cents, n))
      }
      if (nu._1.isEmpty && nu._2.isEmpty) m.remove(e.k) else m(e.k) = nu
    }
    m.toMap
  }

  test("TWO-side changelog join (flatMapGroupsWithState bi-multiset) ≡ batch q264, deliberately mis-ordered waves") {
    implicit val sc = spark.sqlContext
    import JoinViewStream.BiEvent
    val waves = biWaves()
    val mem = MemoryStream[JoinViewStream.BiEvent]
    val q = JoinViewStream.biChangelog(mem.toDS())
      .writeStream.format("memory").queryName("ivm_bi")
      .outputMode(OutputMode.Update()).start()
    waves.foreach { w => mem.addData(w: _*); q.processAllAvailable() }
    // the bounded-state claim, MEASURED: the state store holds one row
    // per LIVE join key — never per event (events here outnumber keys
    // ~100×; a buffering implementation would show event-sized state)
    // and never per ever-touched key (fully-deleted customers with no
    // orders are already dead here and must not linger)
    val live = foldLive(waves.flatten)
    val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    assert(stateRows == live.size.toLong,
      s"state rows $stateRows != live join keys ${live.size} — state must be live-key-bounded")
    // fold the emitted view changelog (every update-mode batch appended)
    val streamed = spark.table("ivm_bi")
      .groupBy("c_mktsegment")
      .agg(sum(col("dn")).as("n"), sum(col("dcents")).as("c"))
      .filter(col("n") > 0)
      .as[(String, Long, Long)].collect()
      .map { case (seg, n, c) =>
        seg -> ((n, java.math.BigDecimal.valueOf(c, 2).doubleValue)) }
      .toMap
    val batch = SparkEntry.queries("q264_ivm_join_retract")(spark, sfDir)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(streamed == batch,
      s"bi-changelog ≠ batch:\n stream ${streamed.toSeq.sortBy(_._1)}\n batch ${batch.toSeq.sortBy(_._1)}")
    // DRAIN wave: fully retract every live row of a key sample on BOTH
    // sides — their state rows must be REMOVED (the CDC-churn leak fix),
    // and the folded changelog must lose exactly their join contributions
    val drainKeys = live.keys.toSeq.sorted.take(50)
    val drain = drainKeys.flatMap { k =>
      val (l, r) = live(k)
      l.toSeq.flatMap { case (seg, n) =>
        Seq.fill(n.toInt)(BiEvent(k, "L", -1L, seg, 0L)) } ++
      r.toSeq.flatMap { case (cents, n) =>
        Seq.fill(n.toInt)(BiEvent(k, "R", -1L, null, cents)) }
    }
    mem.addData(drain: _*); q.processAllAvailable()
    val stateAfter = q.lastProgress.stateOperators.head.numRowsTotal
    q.stop()
    assert(stateAfter == (live.size - drainKeys.size).toLong,
      s"state rows $stateAfter after draining ${drainKeys.size} of ${live.size} live keys — dead keys must be evicted")
    // exactness through the drain: each drained key loses lefts × rights
    // join rows per (segment, cents) — the refolded view must equal the
    // batch view minus exactly those contributions
    val lost = scala.collection.mutable.Map.empty[String, (Long, Long)]
    drainKeys.foreach { k =>
      val (l, r) = live(k)
      l.foreach { case (seg, ln) =>
        r.foreach { case (cents, rn) =>
          val (n0, c0) = lost.getOrElse(seg, (0L, 0L))
          lost(seg) = (n0 + ln * rn, c0 + ln * rn * cents)
        }
      }
    }
    val expectAfter = (batch.keySet ++ lost.keySet).flatMap { seg =>
      val (bn, bd) = batch.getOrElse(seg, (0L, 0.0))
      val (dn, dc) = lost.getOrElse(seg, (0L, 0L))
      val n = bn - dn
      val c = java.math.BigDecimal.valueOf(
        Math.round(bd * 100) - dc, 2).doubleValue
      if (n > 0) Some(seg -> ((n, c))) else None
    }.toMap
    val refolded = spark.table("ivm_bi")
      .groupBy("c_mktsegment")
      .agg(sum(col("dn")).as("n"), sum(col("dcents")).as("c"))
      .filter(col("n") > 0)
      .as[(String, Long, Long)].collect()
      .map { case (seg, n, c) =>
        seg -> ((n, java.math.BigDecimal.valueOf(c, 2).doubleValue)) }
      .toMap
    assert(refolded == expectAfter,
      s"post-drain fold ≠ batch − drained contributions:\n stream ${refolded.toSeq.sortBy(_._1)}\n expect ${expectAfter.toSeq.sortBy(_._1)}")
  }

  test("transformWithState MapState bi-changelog ≡ batch q264; state is ELEMENT-granular (RocksDB)") {
    implicit val sc = spark.sqlContext
    val waves = biWaves()
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[JoinViewStream.BiEvent]
      val q = JoinViewStream.biChangelogTws(mem.toDS())
        .writeStream.format("memory").queryName("ivm_bi_tws")
        .outputMode(OutputMode.Update()).start()
      waves.foreach { w => mem.addData(w: _*); q.processAllAvailable() }
      // MapState holds one state-store row PER LIVE MULTISET ELEMENT —
      // sharper than the per-key BiState blob: dead elements are
      // removeKey'd, so the count equals the reference fold's Σ sizes
      val live = foldLive(waves.flatten)
      val expectRows = live.valuesIterator
        .map { case (l, r) => l.size + r.size }.sum.toLong
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      q.stop()
      assert(stateRows == expectRows,
        s"state rows $stateRows != Σ live multiset elements $expectRows")
      val streamed = spark.table("ivm_bi_tws")
        .groupBy("c_mktsegment")
        .agg(sum(col("dn")).as("n"), sum(col("dcents")).as("c"))
        .filter(col("n") > 0)
        .as[(String, Long, Long)].collect()
        .map { case (seg, n, c) =>
          seg -> ((n, java.math.BigDecimal.valueOf(c, 2).doubleValue)) }
        .toMap
      val batch = SparkEntry.queries("q264_ivm_join_retract")(spark, sfDir)
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(streamed == batch,
        s"tws bi-changelog ≠ batch:\n stream ${streamed.toSeq.sortBy(_._1)}\n batch ${batch.toSeq.sortBy(_._1)}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState INITIAL-STATE cold start: stored view + delta-only stream ≡ batch q264 (no corpus replay)") {
    implicit val sc = spark.sqlContext
    import JoinViewStream.{BiEvent, BiInit}
    val (lBoot, lPre, lPost, rBoot, rNew) = biParts()
    // the stored base as the PRODUCTION cold start derives it
    // (VERDICT r19 item 5): one grouped fold per side straight off the
    // stored tables — the driver fold below is only the REFERENCE the
    // derived frame is pinned against, never the seed
    val cents = (c: org.apache.spark.sql.Column) =>
      (c.cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long")
    val initDs = JoinViewStream.initialStateFrom(
      Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment")),
      Tables.orders(spark, sfDir)
        .filter(!(col("o_orderkey") % 17 === 3))
        .select(col("o_custkey"), cents(col("o_totalprice"))))
    val baseLive = foldLive((lBoot ++ rBoot).toSeq)
    assert(initDs.collect().map(b => b.k -> ((b.lefts, b.rights))).toMap
      == baseLive,
      "initialStateFrom(base tables) must equal the reference fold " +
        "element-for-element")
    val v0 = scala.collection.mutable.Map.empty[String, (Long, Long)]
    baseLive.valuesIterator.foreach { case (l, r) =>
      l.foreach { case (seg, ln) =>
        r.foreach { case (cents, rn) =>
          val (n0, c0) = v0.getOrElse(seg, (0L, 0L))
          v0(seg) = (n0 + ln * rn, c0 + ln * rn * cents)
        }
      }
    }
    // DELTA-ONLY waves (mis-ordered as ever): the whole point is that
    // the bootstrap never streams
    val waves: Seq[Seq[BiEvent]] = Seq(
      lPre.take(lPre.length / 2).toSeq ++ rNew,
      lPre.drop(lPre.length / 2).toSeq ++ lPost)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[BiEvent]
      val q = JoinViewStream.biChangelogTwsFrom(mem.toDS(), initDs)
        .writeStream.format("memory").queryName("ivm_bi_init")
        .outputMode(OutputMode.Update()).start()
      waves.foreach { w => mem.addData(w: _*); q.processAllAvailable() }
      val live = foldLive(
        (lBoot ++ rBoot ++ lPre ++ lPost ++ rNew).toSeq)
      val expectRows = live.valuesIterator
        .map { case (l, r) => l.size + r.size }.sum.toLong
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      q.stop()
      assert(stateRows == expectRows,
        s"state rows $stateRows != Σ live multiset elements $expectRows after the seeded run")
      // the production refresh equation: V₀ + folded deltas = V₁
      val deltas = spark.table("ivm_bi_init")
        .groupBy("c_mktsegment")
        .agg(sum(col("dn")).as("n"), sum(col("dcents")).as("c"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val streamed = (v0.keySet ++ deltas.keySet).flatMap { seg =>
        val (bn, bc) = v0.getOrElse(seg, (0L, 0L))
        val (dn, dc) = deltas.getOrElse(seg, (0L, 0L))
        val n = bn + dn
        if (n > 0) Some(seg -> ((n,
          java.math.BigDecimal.valueOf(bc + dc, 2).doubleValue)))
        else None
      }.toMap
      val batch = SparkEntry.queries("q264_ivm_join_retract")(spark, sfDir)
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(streamed == batch,
        s"V0 + delta fold ≠ batch q264:\n stream ${streamed.toSeq.sortBy(_._1)}\n batch ${batch.toSeq.sortBy(_._1)}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streamed ±retraction JOIN view ≡ batch q264 (bootstrap + CDC waves, stream-static join)") {
    implicit val sc = spark.sqlContext
    // bootstrap: every base customer as an insert (no pre-image)
    val base = Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        lit(null).cast("string").as("old_seg"),
        col("c_mktsegment").as("new_seg"))
    // the q264 customer CDC batch resolved latest-wins, enriched with the
    // base PRE-image for every key that had one (the Debezium shape)
    val feed = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(
        when(col("o_orderkey") % 7 === 0,
          col("o_custkey") + 1000000000000L)
          .otherwise(col("o_custkey")).as("c_custkey"),
        col("o_orderpriority").as("seg"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 10 === 0, lit("D"))
          .otherwise(lit("U")).as("op"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("c_custkey").orderBy(col("seq").desc)))
      .filter(col("rn") === 1)
    val changes = feed.join(
        Tables.customer(spark, sfDir).select(col("c_custkey"),
          col("c_mktsegment").as("old_seg0")),
        Seq("c_custkey"), "left")
      .select(col("c_custkey"), col("old_seg0").as("old_seg"),
        when(col("op") === "U", col("seg")).as("new_seg"))
    val rows = base.unionByName(changes)
      .as[(Long, String, String)].collect()
    // base must stream BEFORE the change that retracts it: waves 1+2 are
    // the bootstrap, waves 3+4 the CDC batch (uneven cuts)
    val nb = base.count().toInt
    val waves = Seq(rows.slice(0, nb / 3), rows.slice(nb / 3, nb),
      rows.slice(nb, nb + 40), rows.slice(nb + 40, rows.length))
    // the OTHER side's latest stored state: ALL orders (O₀ ∪ ΔO)
    val rightState = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    val mem = MemoryStream[(Long, String, String)]
    val q = JoinViewStream.maintain(
        mem.toDF().toDF("c_custkey", "old_seg", "new_seg"), rightState)
      .writeStream.format("memory").queryName("ivm_join_view")
      .outputMode(OutputMode.Complete()).start()
    waves.foreach { w => mem.addData(w.toSeq: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("ivm_join_view")
      .filter(col("n_rows") > 0) // the q264 zero-count drop, at read time
      .select(col("c_mktsegment"), col("n_rows"),
        col("sum_price").cast("double").as("total_price"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    val batch = SparkEntry.queries("q264_ivm_join_retract")(spark, sfDir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(streamed == batch,
      s"stream ≠ batch:\n stream ${streamed.toSeq.sortBy(_._1)}\n batch ${batch.toSeq.sortBy(_._1)}")
    // the readout must mix surviving base segments with upsert-created
    // priority groups — otherwise the retraction algebra wasn't exercised
    val segs = batch.keySet
    assert(segs.exists(_.contains("URGENT")) &&
      segs.exists(Set("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY").contains))
  }
}

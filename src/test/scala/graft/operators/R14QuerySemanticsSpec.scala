package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-14 queries beyond the driver's hash
  * check: a brute-force BigInt Fleiss-κ recount (q203), the cross-modal
  * pair/caption algebra re-derived from the live hashes (q204), a driver
  * transitive-closure + survivor-policy recount for the merge plan (q205),
  * and the q187 group-collapse pinned equal to a direct per-doc pair
  * computation on a duplicate-heavy constructed corpus. */
class R14QuerySemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q203: BigInt brute-force Fleiss kappa recount matches") {
    val labeled = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        (size(array_distinct(split(lower(col("text")), " "))) * 2 >=
          size(split(lower(col("text")), " "))).as("a"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val rs = labeled.map { case (id, a) =>
      val b = a != (id % 7 == 0)
      val c = a != (id % 5 == 0)
      Seq(a, b, c).count(identity)
    }
    val n = BigInt(rs.length)
    val rSum = BigInt(rs.map(_.toLong).sum)
    val sA = BigInt(rs.map(r => r.toLong * r + (3L - r) * (3L - r) - 3L).sum)
    val pe = rSum * rSum + (3 * n - rSum) * (3 * n - rSum)
    val num = 3 * n * sA - 2 * pe
    val den = 18 * n * n - 2 * pe
    val row = run("q203_fleiss_kappa").collect().head
    assert(row.getAs[Long]("n") == n.toLong)
    assert(row.getAs[Long]("r_sum") == rSum.toLong)
    assert(row.getAs[Long]("s_a") == sA.toLong)
    assert(row.getAs[Long]("kappa_num") == num.toLong)
    assert(row.getAs[Long]("kappa_den") == den.toLong)
    assert(row.getAs[Double]("kappa") ==
      num.toLong.toDouble / den.toLong.toDouble)
    // three deterministic raters genuinely disagree somewhere, and kappa
    // discounts chance: 0 < kappa < 1 on this corpus
    assert(row.getAs[Double]("kappa") > 0.0 && row.getAs[Double]("kappa") < 1.0)
  }

  test("q204: pair set = all-pairs Hamming<=3 over live hashes; caption algebra per row") {
    val hashes = MediaDedup.imageHashes(MediaDedup.imageCorpus(spark),
      keep = Seq("key")).select("key", "phash").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val wantPairs = (for {
      (ka, ha) <- hashes; (kb, hb) <- hashes
      if ka < kb && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ka, kb)).toSet
    val rows = run("q204_crossmodal_dedup").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet == wantPairs)
    val texts = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull && col("doc_id") < 24)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def caption(key: String): String = {
      val Array(kind, seed) = key.split(":")
      val t = texts(seed.toLong)
      if (kind == "jitter") "0" + t.substring(1) else t
    }
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (ca, cb) = (caption(a), caption(b))
      assert(r.getAs[Long]("a_doc") == a.split(":")(1).toLong)
      assert(r.getAs[Boolean]("caption_exact") == (ca == cb))
      val aw = ca.split(" ").distinct.toSet; val bw = cb.split(" ").distinct.toSet
      val jac = (aw & bw).size.toLong * 1000 / (aw | bw).size
      assert(r.getAs[Long]("jac_permille") == jac, s"($a,$b)")
      val verdict = if (ca == cb) "confirmed"
        else if (jac >= 500) "reocr" else "divergent"
      assert(r.getAs[String]("verdict") == verdict, s"($a,$b)")
    }
    // the re-OCR class actually fires (every orig~jitter pair), and the
    // exact class too — the cross-modal split is non-degenerate
    val verdicts = rows.map(_.getAs[String]("verdict")).toSet
    assert(verdicts.contains("confirmed") && verdicts.contains("reocr"))
  }

  test("q205: driver transitive closure + survivor policy recount matches") {
    // mirror pairs recomputed from raw documents under the same cap
    val hs = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("source"), md5(col("text").cast("binary")).as("fp"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val spread = hs.groupBy(_._2).map { case (fp, xs) => fp -> xs.size }
    val kept = hs.filter { case (_, fp) => spread(fp) <= 16 }
    val sizes = kept.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val byFp = kept.groupBy(_._2)
    val mirror = byFp.values.flatMap { xs =>
      val ss = xs.map(_._1).distinct.sorted
      for (a <- ss; b <- ss if a < b) yield (a, b)
    }.groupBy(identity).map { case (p, o) => p -> o.size.toLong }
      .filter { case ((a, b), shared) =>
        shared * 2 >= math.min(sizes(a), sizes(b)) }
      .keys.toSeq
    // union-find closure
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    mirror.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val groups = sizes.keys.toSeq.groupBy(find).map { case (_, ms) =>
      ms.min -> ms.toSet }
    val rows = run("q205_source_merge_plan").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == sizes.keySet)
    groups.foreach { case (label, members) =>
      val canonical = members.toSeq
        .sortBy(s => (-sizes(s), s)).head
      members.foreach { s =>
        val r = rows(s)
        assert(r.getAs[String]("merge_group") == label, s)
        assert(r.getAs[String]("canonical_source") == canonical, s)
        assert(r.getAs[Long]("group_size") == members.size.toLong, s)
        assert(r.getAs[Long]("n_contents") == sizes(s), s)
        assert(r.getAs[Boolean]("keep") == (s == canonical), s)
      }
    }
  }

  test("q187 group collapse ≡ direct per-doc pair computation on a duplicate-heavy corpus") {
    val dir = tmpDir("calib-dups")
    // 3 distinct contents in one source, each duplicated a different
    // number of times (4/3/2) + one singleton in another source
    val contents = Seq(
      ("alpha beta gamma delta", 4), ("alpha beta epsilon", 3),
      ("zeta eta theta iota kappa", 2))
    val rows = contents.zipWithIndex.flatMap { case ((t, c), i) =>
      (0 until c).map(j => ((i * 10 + j).toLong, t, "s0"))
    } :+ ((99L, "solo text here", "s1"))
    rows.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q187_minhash_calibration")(spark, dir)
      .collect()
      .map(r => r.getAs[Int]("est_num") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Double]("sum_true")))).toMap
    // direct recount: per-doc pairs within source s0 (s1 has no pair)
    // the md5 k=16 family is opaque here; recount the SET-DERIVED
    // quantities: bins group identical-content pairs at est=16 with J=1,
    // and cross-content pairs at one (est, J) per content pair — so pin
    // the WEIGHTS the collapse must reproduce
    val docs = rows.filter(_._3 == "s0")
    var within = 0L
    var crossByPair = Map.empty[(Int, Int), Long]
    for (a <- docs; b <- docs if a._1 < b._1) {
      if (a._2 == b._2) within += 1
      else {
        val key = (contents.indexWhere(_._1 == a._2),
          contents.indexWhere(_._1 == b._2))
        val k = if (key._1 < key._2) key else key.swap
        crossByPair = crossByPair.updated(k, crossByPair.getOrElse(k, 0L) + 1)
      }
    }
    // within-group pairs: 4C2 + 3C2 + 2C2 = 6 + 3 + 1 = 10, all at est 16
    assert(within == 10L)
    assert(got(16)._1 >= 10L, "bin 16 carries at least the identical pairs")
    assert(got(16)._2 >= 10.0 - 1e-9, "identical pairs contribute J = 1 each")
    // cross-content pair weights: (0,1) -> 12, (0,2) -> 8, (1,2) -> 6
    assert(crossByPair == Map((0, 1) -> 12L, (0, 2) -> 8L, (1, 2) -> 6L))
    // total pair count is exactly Σ weights + within
    assert(got.values.map(_._1).sum == 10L + 12L + 8L + 6L)
  }
  test("q206: final cumulative overlap equals q202's full recompute per pair") {
    val m202 = run("q202_source_mirror").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("n_shared")).toMap
    val rows206 = run("q206_mirror_incremental").collect()
    // deltas are strictly positive (delta-only rows) and cumulative is the
    // running sum of deltas within each pair
    rows206.groupBy(r => (r.getString(0), r.getString(1))).foreach {
      case (p, rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("wave"))
        var cum = 0L
        sorted.foreach { r =>
          assert(r.getAs[Long]("delta_shared") > 0, s"$p")
          cum += r.getAs[Long]("delta_shared")
          assert(r.getAs[Long]("cum_shared") == cum, s"$p")
        }
        // the incremental maintenance converges to the full recompute
        assert(cum == m202(p), s"$p final cum vs q202")
    }
    // zero-overlap pairs never appear incrementally but are 0 in the matrix
    val present = rows206.map(r => (r.getString(0), r.getString(1))).toSet
    m202.foreach { case (p, n) =>
      if (n == 0L) assert(!present.contains(p), s"$p")
      else assert(present.contains(p), s"$p")
    }
  }
  /** The sf0.001/sf0.01 corpora have no cross-source shared content, so
    * the corpus-level q206 check above is structural; THIS fixture drives
    * the wave algebra: shares arriving at different first-sighting waves
    * become visible at max(first_a, first_b) and accumulate. */
  test("q206 wave algebra on a constructed multi-wave corpus") {
    val dir = tmpDir("mirrorwaves")
    val rows = Seq(
      (10L, "shared both wave zero", "s0"), (20L, "shared both wave zero", "s1"),
      (5L, "late on one side", "s0"), (205L, "late on one side", "s1"),
      (101L, "mid wave share", "s0"), (150L, "mid wave share", "s1"),
      (7L, "unshared zero", "s0"), (300L, "unshared three", "s1"))
    rows.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q206_mirror_incremental")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("wave")) ->
        ((r.getAs[Long]("delta_shared"), r.getAs[Long]("cum_shared"))))
      .toMap
    // wave 0: the both-at-wave-0 share; wave 1: the mid share; wave 2:
    // the late side makes the first content pair-visible only now
    assert(got == Map(
      ("s0", "s1", 0L) -> ((1L, 1L)),
      ("s0", "s1", 1L) -> ((1L, 2L)),
      ("s0", "s1", 2L) -> ((1L, 3L))), got)
  }

  test("q207: BigInt brute-force Krippendorff alpha with missing ratings") {
    val items = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        (size(array_distinct(split(lower(col("text")), " "))) * 2 >=
          size(split(lower(col("text")), " "))).as("a"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val perItem = items.map { case (id, a) =>
      val ratings = Seq(Some(a),
        if (id % 3 != 0) Some(a != (id % 7 == 0)) else None,
        if (id % 4 != 1) Some(a != (id % 5 == 0)) else None).flatten
      (ratings.length.toLong, ratings.count(identity).toLong)
    }
    val used = perItem.filter(_._1 >= 2)
    val dropped = perItem.count(_._1 < 2).toLong
    assert(dropped > 0, "fixture must exercise the m<2 drop path")
    val nVals = BigInt(used.map(_._1).sum)
    val nTrue = BigInt(used.map(_._2).sum)
    val nFalse = nVals - nTrue
    val s2 = BigInt(used.map { case (m, r) =>
      if (m == 3) r * (3 - r) else 2 * r * (2 - r)
    }.sum)
    val num = 2 * nTrue * nFalse - (nVals - 1) * s2
    val den = 2 * nTrue * nFalse
    val row = run("q207_krippendorff_alpha").collect().head
    assert(row.getAs[Long]("n_items_used") == used.length.toLong)
    assert(row.getAs[Long]("n_items_dropped") == dropped)
    assert(row.getAs[Long]("n_vals") == nVals.toLong)
    assert(row.getAs[Long]("n_true") == nTrue.toLong)
    assert(row.getAs[Long]("n_false") == nFalse.toLong)
    assert(row.getAs[Long]("s2") == s2.toLong)
    assert(row.getAs[Long]("alpha_num") == num.toLong)
    assert(row.getAs[Long]("alpha_den") == den.toLong)
    assert(row.getAs[Double]("alpha") ==
      num.toLong.toDouble / den.toLong.toDouble)
    assert(row.getAs[Double]("alpha") > 0.0 && row.getAs[Double]("alpha") < 1.0)
  }

  /** q208/q209 share the holdout margins; brute-force both from one
    * collect: AUC over ALL (pos, neg) pairs, the sweep over every
    * distinct threshold. */
  test("q208/q209: pairwise AUC + exhaustive threshold sweep recount") {
    val holdout = CorpusOps.classifierScores(
        graft.Tables.documents(spark, sfDir), "doc_id",
        col("lang") === "en", 4096)
      .filter(!col("is_train")).select("margin", "is_pos")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val pos = holdout.filter(_._2).map(_._1)
    val neg = holdout.filterNot(_._2).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty)
    val num2 = BigInt((for { p <- pos; n <- neg } yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum)
    val den2 = BigInt(2L) * pos.length * neg.length
    val a = run("q208_classifier_auc").collect().head
    assert(a.getAs[Long]("n_pos") == pos.length.toLong)
    assert(a.getAs[Long]("n_neg") == neg.length.toLong)
    assert(a.getAs[Long]("auc_num2") == num2.toLong)
    assert(a.getAs[Long]("auc_den2") == den2.toLong)
    assert(a.getAs[Double]("auc") ==
      num2.toLong.toDouble / den2.toLong.toDouble)
    // sf0.001's ~50-doc train split ranks BELOW chance (0.43 — too few
    // docs to fit 4096 buckets); the recount above is the correctness
    // pin, this only guards the division wiring
    assert(a.getAs[Double]("auc") > 0.0 && a.getAs[Double]("auc") < 1.0)

    val sweep = holdout.map(_._1).distinct.sorted.map { t =>
      val tp = pos.count(_ >= t).toLong
      val fp = neg.count(_ >= t).toLong
      val fn = pos.length - tp
      val tn = neg.length - fp
      val f1s = (2L * tp * 1000000000L) / (2L * tp + fp + fn)
      (t, tp, fp, tn, fn, f1s)
    }
    val bestF1 = sweep.map(_._6).max
    val want = sweep.filter(_._6 == bestF1).minBy(_._1)
    val b = run("q209_operating_point").collect()
    assert(b.length == 1)
    val r = b.head
    assert((r.getAs[Long]("threshold"), r.getAs[Long]("tp"),
      r.getAs[Long]("fp"), r.getAs[Long]("tn"), r.getAs[Long]("fn"),
      r.getAs[Long]("f1_scaled")) == want)
    assert(r.getAs[Long]("n_thresholds") == sweep.length.toLong)
  }

  test("q214: conformal rank, threshold and eval counts recount") {
    def md5p32(s: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        dig.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val holdout = CorpusOps.classifierScores(
        graft.Tables.documents(spark, sfDir), "doc_id",
        col("lang") === "en", 4096)
      .filter(!col("is_train")).select("doc_id", "is_pos", "margin")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    val (cal, eval0) = holdout.partition { case (id, _, _) =>
      md5p32(s"$id#conf") < 2147483648L
    }
    val calPos = cal.filter(_._2).map(_._3).sorted
    assert(calPos.nonEmpty, "fixture must have calibration positives")
    val r = math.max((calPos.length + 1L) / 10L, 1L)
    val t = calPos((r - 1).toInt)
    val evalPos = eval0.filter(_._2)
    val evalNeg = eval0.filterNot(_._2)
    val covered = evalPos.count(_._3 >= t).toLong
    val falseKeep = evalNeg.count(_._3 >= t).toLong
    val row = run("q214_conformal_threshold").collect().head
    assert(row.getAs[Long]("n_cal_pos") == calPos.length.toLong)
    assert(row.getAs[Long]("rank_r") == r)
    assert(row.getAs[Long]("threshold") == t)
    assert(row.getAs[Long]("n_eval_pos") == evalPos.length.toLong)
    assert(row.getAs[Long]("eval_covered") == covered)
    assert(row.getAs[Long]("n_eval_neg") == evalNeg.length.toLong)
    assert(row.getAs[Long]("eval_false_keep") == falseKeep)
    assert(row.getAs[Long]("cov_pm") == 1000L * covered / evalPos.length)
    // the conformal guarantee's finite-sample side: at most r−1
    // calibration positives sit strictly below the threshold
    assert(calPos.count(_ < t) <= r - 1)
  }

  test("q216: JVM projection + distance recount from the quantized codes") {
    def md5p32(v: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        dig.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val signs = Array.tabulate(64, 16)((i, j) =>
      if (md5p32(s"jl:$i:$j") % 2 == 0) 1L else -1L)
    val e = graft.Tables.embeddings(spark, sfDir)
    val codes = IvfStorage.quantize(e, IvfStorage.quantizationParams(e))
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    def proj(c: Array[Int]): Array[Long] =
      Array.tabulate(16)(j =>
        (0 until 64).map(i => c(i).toLong * signs(i)(j)).sum)
    val rows = run("q216_vec_jl_projection").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a % 5 == 0 && b == a + 1)
      val (ca, cb) = (codes(a), codes(b))
      val d2o = (0 until 64).map { i =>
        val d = ca(i).toLong - cb(i); d * d
      }.sum
      val (pa, pb) = (proj(ca), proj(cb))
      val d2p = (0 until 16).map { j =>
        val d = pa(j) - pb(j); d * d
      }.sum
      assert(r.getAs[Long]("d2_orig") == d2o, s"d2_orig pair ($a,$b)")
      assert(r.getAs[Long]("d2_proj") == d2p, s"d2_proj pair ($a,$b)")
      assert(r.getAs[Long]("distortion_pm") == 1000L * d2p / (16L * d2o))
    }
    // the JL identity E[d²_proj] = K·d²_orig: the per-pair distortion
    // averages near 1000‰ (generous band — 10 pairs at sf0.001)
    val mean = rows.map(_.getAs[Long]("distortion_pm")).sum /
      rows.length.toDouble
    assert(mean > 400 && mean < 2500, s"mean distortion $mean off-identity")
  }

  test("q217: blocking metrics recount from a collected fixture rebuild") {
    case class A(key: Long, nation: Long, seg: String, bal: Long,
      code: Long, band: Long)
    val base = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"),
        col("c_mktsegment"),
        (col("c_acctbal").cast(
          org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long"),
        substring(col("c_name"), -6, 6).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    val as = base.map { case (k, n, s0, b, c) =>
      A(k, n, s0, b, c, (b + 100000L) / 200000L)
    }
    val bs = base.filter(_._1 % 5 != 4).map { case (k, n, s0, b, c) =>
      val bn = if (k % 11 == 0) (n + 1) % 25 else n
      val bseg = if (k % 7 == 0) "X" + s0 else s0
      val bb = if (k % 3 == 0) b + 1000 else b
      val bc = if (k % 13 == 0) c + 1 else c
      A(k, bn, bseg, bb, bc, (bb + 100000L) / 200000L)
    }
    val p1 = for { x <- as; y <- bs
      if x.nation == y.nation && x.seg == y.seg } yield (x.key, y.key)
    val p2 = for { x <- as; y <- bs
      if x.nation == y.nation && x.band == y.band } yield (x.key, y.key)
    val pu = (p1 ++ p2).distinct
    val want = Map(
      "nation_segment" -> p1, "nation_band" -> p2, "union" -> pu)
    val rows = run("q217_blocking_eval").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == want.keySet)
    want.foreach { case (name, pairs) =>
      val r = rows(name)
      assert(r.getAs[Long]("n_cand") == pairs.length.toLong, name)
      val found = pairs.count(p => p._1 == p._2).toLong
      assert(r.getAs[Long]("n_true_found") == found, name)
      assert(r.getAs[Long]("n_true_total") == bs.length.toLong, name)
      assert(r.getAs[Long]("pc_pm") == 1000L * found / bs.length, name)
      assert(r.getAs[Long]("rr_pm") ==
        1000L - 1000L * pairs.length / (as.length.toLong * bs.length), name)
    }
    // the structural ceiling: both passes block on nation, so a corrupted
    // nation (every 11th B key) is unreachable even by the union
    val unreachable = bs.count(b => b.key % 11 == 0).toLong
    assert(rows("union").getAs[Long]("n_true_found") <=
      bs.length - unreachable)
  }

  test("q218: code-band pass is complete by construction and equi-planned") {
    val df = run("q218_blocking_code_band")
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    // the degradation model moves code by at most +1, so the ±1 band
    // can never lose a true pair — and neither can the union on top
    assert(rows("code_band").getAs[Long]("n_true_found") ==
      rows("code_band").getAs[Long]("n_true_total"))
    assert(rows("code_band").getAs[Long]("pc_pm") == 1000L)
    assert(rows("all_union").getAs[Long]("pc_pm") == 1000L)
    // the high-cardinality pass must be cheaper than the union it joins
    assert(rows("code_band").getAs[Long]("n_cand") <
      rows("all_union").getAs[Long]("n_cand"))
    // BandJoinRewrite must turn the band theta-join into an equi join:
    // an INNER nested-loop factor in this plan is the 100 TB failure
    // mode (the 1-row totals crossJoin legitimately plans as a Cross
    // BNLJ — that one is not the band join)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin BuildRight, Inner") &&
      !plan.contains("NestedLoopJoin BuildLeft, Inner") &&
      !plan.contains("CartesianProduct"),
      "band blocking pass must not plan as an inner nested-loop join")
  }

  test("q219: frame grid tiles each clip's stub duration exactly") {
    val rows = run("q219_media_video_frames").collect()
    assert(rows.nonEmpty)
    val byClip = rows.groupBy(_.getAs[String]("file_key"))
    assert(byClip.size == 4, "fixture ships 4 video extensions")
    byClip.foreach { case (_, fs) =>
      val dur = fs.head.getAs[Long]("duration_ms")
      val n = fs.head.getAs[Long]("n_frames")
      assert(n == (dur + 499) / 500)
      assert(fs.length.toLong == n, "one row per sampled frame")
      val ts = fs.map(_.getAs[Long]("t_ms")).sorted
      assert(ts.toSeq == (0L until n).map(_ * 500L),
        "2 fps grid from t=0")
      assert(ts.last < dur, "last sample inside the clip")
      assert(fs.map(_.getAs[String]("frame_fp")).distinct.length ==
        fs.length, "stub fingerprints are per-frame distinct")
    }
  }

  test("q220: driver BFS recount of every landmark distance") {
    val edges = GraphQueries.coPurchaseRepeatEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    edges.foreach { case (a, b) =>
      nbrs.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer()) += b
      nbrs.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer()) += a
    }
    val landmarks = nbrs.keys.toSeq.sorted.take(4)
    def bfs(src: Long): Map[Long, Long] = {
      val d = scala.collection.mutable.Map(src -> 0L)
      var frontier = Seq(src)
      for (h <- 1L to 4L) {
        frontier = frontier.flatMap(nbrs(_))
          .filterNot(d.contains).distinct
        frontier.foreach(n => d(n) = h)
      }
      d.toMap
    }
    val ref = landmarks.map(bfs)
    val rows = run("q220_graph_landmark_dist").collect()
    assert(rows.length == nbrs.size, "one row per graph node")
    rows.foreach { r =>
      val n = r.getLong(0)
      val got = Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val want = ref.map(_.getOrElse(n, -1L))
      assert(got == want, s"distances for node $n")
    }
    // every landmark is its own 0-distance witness
    landmarks.zipWithIndex.foreach { case (l, i) =>
      val row = rows.find(_.getLong(0) == l).get
      assert(row.getLong(i + 1) == 0L)
    }
  }

  test("q221: Neyman weights and allocations recount; budget respected") {
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("source"),
        size(split(lower(col("text")), " ")).cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val strata = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (s0, xs) =>
      val n = xs.length.toLong
      val sx = xs.map(_._2).sum
      val sxx = xs.map(v => v._2 * v._2).sum
      val varNum = n * sxx - sx * sx
      val sigma = math.sqrt(varNum.toDouble / (n * n).toDouble)
      (s0, n, sx, varNum, sigma, n.toDouble * sigma)
    }
    val wTotal = strata.map(_._6).foldLeft(0.0)(_ + _)
    val rows = run("q221_neyman_allocation").collect()
    assert(rows.length == strata.length)
    rows.zip(strata).foreach { case (r, (s0, n, sx, vn, sg, w)) =>
      assert(r.getString(0) == s0)
      assert(r.getAs[Long]("n_docs") == n && r.getAs[Long]("sx") == sx)
      assert(r.getAs[Long]("var_num") == vn)
      assert(r.getAs[Double]("sigma") == sg, s0)
      assert(r.getAs[Double]("weight") == w, s0)
      assert(r.getAs[Long]("alloc") ==
        math.floor(w / wTotal * 1000.0).toLong, s0)
      assert(r.getAs[Long]("kept") <= n)
    }
    // floors can only undershoot: the allocations respect the budget
    assert(rows.map(_.getAs[Long]("alloc")).sum <= 1000L)
  }

  test("q211: brute-force allocation recount; caps and budget respected") {
    val perSrc = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("source"),
        size(split(lower(col("text")), " ")).cast("long").as("nt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, rs) =>
        (s, rs.length.toLong, rs.map(_._2).sum)
      }.toSeq.sortBy(_._1)
    val totDocs = perSrc.map(_._2).sum
    val totToks = perSrc.map(_._3).sum
    val budget = 2L * totToks
    val stage1 = perSrc.map { case (s, nd, nt) =>
      val base = budget * nd / totDocs
      val cap = 2L * nt
      (s, nd, nt, base, base > cap, math.min(base, cap), cap)
    }
    val leftover = budget - stage1.map(_._6).sum
    val uncapped = stage1.filterNot(_._5).map(_._3).sum
    val expect = stage1.map { case (s, nd, nt, base, capped, a1, cap) =>
      val extra = if (capped || uncapped == 0) 0L
        else leftover * nt / uncapped
      val alloc = math.min(a1 + extra, cap)
      (s, nd, nt, base, capped, alloc, 1000L * alloc / nt)
    }
    val got = run("q211_epoch_allocation").collect().map(r =>
      (r.getString(0), r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("base_tokens"), r.getAs[Boolean]("capped"),
        r.getAs[Long]("alloc_tokens"), r.getAs[Long]("epochs_x1000"))).toSeq
    assert(got == expect)
    assert(got.map(_._6).sum <= budget)
    got.filter(_._5).foreach { r => assert(r._6 == 2L * r._3) }
  }

  test("q212: post-erase lake content equals documents minus the batch") {
    val dir = CorpusQueries.erasureLakeDir(spark, sfDir)
    val left = spark.read.parquet(s"$dir/data")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    val want = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull && col("doc_id") % 97 =!= 13)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(left == want)
    assert(want.nonEmpty)
    // the deletion batch was non-empty (the residue exists at sf0.001)
    val all = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull).count()
    assert(all > want.length)
  }

  test("q210: mergeSchema surfaces evolved columns; aggregates recount") {
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select("doc_id", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy { case (id, lang, _) =>
      (s"b${id % 3}", if (id % 3 == 0) "und" else lang)
    }.map { case (k, rows) =>
      k -> ((rows.length.toLong,
        rows.map { case (id, _, nc) => if (id % 3 == 2) nc else -1L }.sum,
        rows.map(_._1).sum))
    }
    val got = run("q210_lake_schema_evolution").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_quality"),
          r.getAs[Long]("id_checksum")))).toMap
    assert(got == expected)
    // the raw merged read really reconciles three schemas: lang is null
    // exactly on b0 rows, quality exactly on b0 ∪ b1
    val dir = CorpusQueries.schemaEvoLakeDir(spark, sfDir)
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/b0", s"$dir/b1", s"$dir/b2")
    val nulls = raw.groupBy("batch").agg(
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("nl"),
        sum(when(col("quality").isNull, 1L).otherwise(0L)).as("nq"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(nulls("b0")._1 == nulls("b0")._3 && nulls("b0")._2 == nulls("b0")._3)
    assert(nulls("b1")._1 == 0L && nulls("b1")._2 == nulls("b1")._3)
    assert(nulls("b2")._1 == 0L && nulls("b2")._2 == 0L)
  }

  test("q228: driver pool-adjacent-violators ≡ the minimax closed form") {
    val rows = run("q228_isotonic_calibration").collect()
    assert(rows.length > 3, "needs a real margin histogram")
    val ns = rows.map(_.getAs[Long]("n"))
    val ps = rows.map(_.getAs[Long]("p"))
    // classic PAV over the same histogram: integer pool sums, merge while
    // the previous pool's mean >= the new one's (cross-multiplied — exact)
    val w = scala.collection.mutable.ArrayBuffer[Long]()
    val sm = scala.collection.mutable.ArrayBuffer[Long]()
    val cnt = scala.collection.mutable.ArrayBuffer[Int]()
    for (idx <- rows.indices) {
      var cw = ns(idx); var cs = ps(idx); var cc = 1
      while (w.nonEmpty && sm.last * cw >= cs * w.last) {
        cw += w.remove(w.length - 1)
        cs += sm.remove(sm.length - 1)
        cc += cnt.remove(cnt.length - 1)
      }
      w += cw; sm += cs; cnt += cc
    }
    val fitted = w.indices.flatMap(b =>
      Seq.fill(cnt(b))(sm(b).toDouble / w(b).toDouble))
    val iso = rows.map(_.getAs[Double]("iso_prob"))
    iso.zip(fitted).zipWithIndex.foreach { case ((a, b), k) =>
      assert(a == b, s"block $k: minimax $a vs PAV $b") }
    assert(iso.zip(iso.tail).forall { case (x, y) => x <= y },
      "calibrated curve must be monotone nondecreasing")
    // calibration actually pools something on this corpus (raw rates are
    // not already monotone), so the operator is non-vacuous
    val raw = rows.map(_.getAs[Double]("raw_rate"))
    assert(raw.zip(raw.tail).exists { case (x, y) => x > y })
  }

  test("q186: candidate top-2 collapse ≡ direct mining on replica-heavy vectors") {
    val rnd = new scala.util.Random(5)
    val base = (1 to 12).map { i =>
      val emb = Array.fill(4)((rnd.nextInt(9) - 4).toFloat)
      (i.toLong, s"l${i % 3}", emb, (i % 2).toLong)
    }
    // three identical-embedding replicas per base row, fresh ids — the
    // sf1 ScaleData stress shape, where the argmax tie-breaks and the
    // self-exclusion both matter
    val rows = base ++ base.flatMap { case (id, l, e, c) =>
      (1 to 3).map(r => (id + 100L * r, l, e, c)) }
    val asg = rows.toDF("vec_id", "label", "embedding", "cent_id")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1).toSeq
    val direct = canon(
      VectorQueries.tripletMine(asg, collapseCandidates = false))
    val collapsed = canon(
      VectorQueries.tripletMine(asg, collapseCandidates = true))
    assert(direct.nonEmpty, "fixture must mine triplets")
    assert(direct == collapsed)
    // the replica case actually exercises self-exclusion: some anchor's
    // positive is its own twin at cos ~1
    assert(direct.exists(t => t._2 % 100L == t._1 % 100L && t._1 != t._2))
  }

  test("q226: absent digits keep their spine row and still pay TVD mass") {
    // only digit 5 occurs: every other digit row must exist with c = 0
    // and contribute exp_pm·n to the Benford TVD; the uniform TVD's
    // closed form on a one-digit histogram is 2·(n·8000)/(2·9000·n) = 8/9
    val li = Seq.fill(40)(5L).toDF("digit")
    val rows = MlQueries.benfordAudit(li).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == (1L to 9L).toSet)
    (1L to 9L).filter(_ != 5L).foreach { dd =>
      assert(rows(dd).getAs[Long]("c") == 0L)
      assert(rows(dd).getAs[Long]("abs_dev_num") ==
        rows(dd).getAs[Long]("exp_pm") * 40L)
    }
    assert(rows(5L).getAs[Long]("c") == 40L)
    // Benford TVD num = |1000·40 − 79·40| + Σ_{d≠5} p_d·40 = 40·(921+921)
    assert(rows(5L).getAs[Long]("tvd_num") == 40L * (921L + 921L))
    assert(rows(5L).getAs[Double]("utvd") == 8.0 / 9.0)
  }

  test("q227: single source and equal masses pin the Gini/HHI closed forms") {
    def run(rows: Seq[(String, Long, Long)]) =
      CorpusQueries.concentrationReport(
        rows.toDF("source", "n_docs", "tok_mass")).collect()
    val one = run(Seq(("a", 10L, 1000L)))
    assert(one.length == 1)
    assert(one.head.getAs[Long]("gini_num") == 0L)
    assert(one.head.getAs[Long]("hhi_x1e6") == 1000000L)
    assert(one.head.getAs[Long]("share_pm") == 1000L)
    val eq = run(Seq(("a", 1L, 500L), ("b", 1L, 500L), ("c", 1L, 500L)))
    assert(eq.forall(_.getAs[Long]("gini_num") == 0L))
    assert(eq.forall(_.getAs[Long]("hhi_x1e6") == 333333L))
    // a dominated corpus: head share and positive gini
    val dom = run(Seq(("big", 1L, 9000L), ("s1", 1L, 500L),
      ("s2", 1L, 500L)))
    val byRank = dom.sortBy(_.getAs[Long]("rank"))
    assert(byRank.head.getString(0) == "big")
    assert(byRank.head.getAs[Long]("share_pm") == 900L)
    assert(byRank.head.getAs[Long]("gini_num") > 0L)
  }

  test("q104: identical-embedding collapse ≡ direct semantic dedup") {
    val rnd = new scala.util.Random(9)
    val base = (1 to 15).map { i =>
      val emb = Array.fill(4)((rnd.nextInt(7) - 3).toFloat)
      (i.toLong, i % 3, emb) // label INT, the embeddings-table type
    }
    val rows = base ++ base.flatMap { case (id, l, e) =>
      (1 to 3).map(r => (id + 100L * r, l, e)) }
    val e = rows.toDF("vec_id", "label", "embedding")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    val direct = canon(
      VectorQueries.semanticDedup(e, 0.35, collapseIdentical = false))
    val collapsed = canon(
      VectorQueries.semanticDedup(e, 0.35, collapseIdentical = true))
    assert(direct.nonEmpty && direct == collapsed)
    // replicas genuinely cluster: every replica's keeper is its base id,
    // so the collapse exercised multi-member groups, not just singletons
    assert(direct.count(!_._4) >= base.size * 3)
  }

  test("q104: degenerate embeddings (zero-norm, NaN) collapse ≡ direct") {
    // zero-norm and NaN-containing vectors produce cos = NaN; the collapse
    // guard must keep both paths identical whatever NaN comparison does
    val zero = Array.fill(4)(0.0f)
    val nanV = Array(1.0f, Float.NaN, 0.5f, -1.0f)
    val ok = Array(1.0f, 2.0f, -1.0f, 0.5f)
    val rows = Seq(
      (1L, 0, zero), (2L, 0, zero), (3L, 0, zero.clone()),
      (4L, 1, nanV), (5L, 1, nanV.clone()),
      (6L, 0, ok), (7L, 0, ok.clone()), (8L, 1, ok.map(_ * 2)))
    val e = rows.toDF("vec_id", "label", "embedding")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    val direct = canon(
      VectorQueries.semanticDedup(e, 0.35, collapseIdentical = false))
    val collapsed = canon(
      VectorQueries.semanticDedup(e, 0.35, collapseIdentical = true))
    assert(direct.length == rows.length && direct == collapsed)
    // the well-formed duplicates still collapse into one keeper
    val keepers = direct.map(t => t._1 -> t._3).toMap
    assert(keepers(7L) == keepers(6L))
  }

  test("q228: linear-PAV path ≡ minimax path on randomized histograms") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val hist = (1 to 40 + trial).map { m =>
        val n = 1L + rnd.nextInt(30)
        (m.toLong * 7, n, rnd.nextInt(n.toInt + 1).toLong)
      }
      val h = hist.toDF("margin", "n", "p")
      val mini = CorpusQueries.isotonicFit(h).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).sortBy(_._1)
      val pav = CorpusQueries.isotonicFit(h, maxQuadratic = 1L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).sortBy(_._1)
      assert(mini.toSeq == pav.toSeq, s"trial $trial")
    }
  }

  test("q231: harmonic fold recounted from q220's distances; 4 landmarks") {
    val dist = run("q220_graph_landmark_dist").collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val got = run("q231_graph_landmark_closeness").collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_reached"), r.getAs[Long]("harmonic_x12"),
          r.getAs[Boolean]("is_landmark")))).toMap
    assert(got.keySet == dist.keySet)
    dist.foreach { case (node, ds) =>
      val want = ((ds.count(_ >= 1L).toLong,
        ds.filter(_ >= 1L).map(12L / _).sum,
        ds.contains(0L)))
      assert(got(node) == want, s"node $node: dists $ds")
    }
    assert(got.values.count(_._3) == 4, "exactly four landmark nodes")
    // the feature is non-degenerate: scores actually vary
    assert(got.values.map(_._2).toSet.size > 2)
  }

  test("q222: assortativity — star r=-1, clique union r=1, BigInt recount") {
    def run(ps: Seq[(Long, Long)]) =
      GraphQueries.assortativity(ps.toDF("a", "b")).collect().head
    // K1,5 star: every edge joins the hub (deg 5) to a leaf (deg 1) —
    // perfectly disassortative
    val star = run((1L to 5L).map(i => (0L, i)))
    assert(star.getAs[Long]("r_num") == -star.getAs[Long]("r_den"))
    assert(star.getAs[Double]("assortativity") == -1.0)
    assert(!star.getAs[Boolean]("is_assortative"))
    // K3 ∪ K4: every edge joins equal degrees with cross-group degree
    // variance — perfectly assortative
    val cl = for {
      g <- Seq(Seq(1L, 2L, 3L), Seq(10L, 11L, 12L, 13L))
      x <- g; y <- g if x < y
    } yield (x, y)
    val cu = run(cl)
    assert(cu.getAs[Long]("r_num") == cu.getAs[Long]("r_den"))
    assert(cu.getAs[Double]("assortativity") == 1.0)
    assert(cu.getAs[Boolean]("is_assortative"))
    // seeded irregular graph: every surfaced integer recounted in BigInt
    val rnd = new scala.util.Random(11)
    val ps = (1 to 60).map(_ =>
        (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val row = run(ps)
    val deg = ps.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (k, v) => (k, BigInt(v.size)) }
    val stubs = ps.flatMap(p => Seq((p._1, p._2), (p._2, p._1)))
    val m2 = BigInt(stubs.size)
    val sx = stubs.map(s => deg(s._1)).sum
    val sxx = stubs.map(s => deg(s._1) * deg(s._1)).sum
    val sxy = stubs.map(s => deg(s._1) * deg(s._2)).sum
    val num = m2 * sxy - sx * sx
    val den = m2 * sxx - sx * sx
    assert(row.getAs[Long]("n_nodes") == deg.size.toLong)
    assert(row.getAs[Long]("n_edges") == ps.size.toLong)
    assert(row.getAs[Long]("m2") == m2.toLong)
    assert(row.getAs[Long]("sx") == sx.toLong)
    assert(row.getAs[Long]("sxx") == sxx.toLong)
    assert(row.getAs[Long]("sxy") == sxy.toLong)
    assert(row.getAs[Long]("r_num") == num.toLong)
    assert(row.getAs[Long]("r_den") == den.toLong)
    assert(row.getAs[Double]("assortativity") ==
      num.toLong.toDouble / den.toLong.toDouble)
  }

  test("q224: outlier audit — exact 3σ boundary NOT flagged, recount") {
    // nine 0s + one v: dev(v)² = (9v)² = 81v² and 9·Vn = 9·9v² = 81v² —
    // exactly 3σ, so the STRICT > must not flag it
    val a = (1L to 9L).map(i => (i, "a", 0L)) :+ ((10L, "a", 700L))
    // ten 0s + one v: dev² = 100v² > 9·Vn = 90v² — flagged
    val b = (101L to 110L).map(i => (i, "b", 0L)) :+ ((111L, "b", 700L))
    val rows = StreamEquivQueries
      .outlierAudit((a ++ b).toDF("event_id", "event_type", "cents"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("a").getAs[Long]("n_outliers") == 0L)
    assert(rows("a").isNullAt(rows("a").fieldIndex("min_outlier_cents")))
    assert(rows("a").getAs[Long]("outlier_id_checksum") == 0L)
    assert(rows("b").getAs[Long]("n_outliers") == 1L)
    assert(rows("b").getAs[Long]("outlier_id_checksum") == 111L)
    assert(rows("b").getAs[Long]("min_outlier_cents") == 700L)
    assert(rows("b").getAs[Long]("max_outlier_cents") == 700L)
    // seeded fixture: flags recounted via the same BigInt inequality
    val rnd = new scala.util.Random(3)
    val ev = (1L to 200L).map(i =>
      (i, s"t${i % 3}", rnd.nextInt(1000).toLong + (if (i % 97 == 0) 50000L else 0L)))
    val got = StreamEquivQueries
      .outlierAudit(ev.toDF("event_id", "event_type", "cents"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_outliers"), r.getAs[Long]("outlier_id_checksum"))))
      .toMap
    val want = ev.groupBy(_._2).map { case (t, rs) =>
      val n = BigInt(rs.size)
      val sxi = rs.map(r => BigInt(r._3)).sum
      val sxxi = rs.map(r => BigInt(r._3) * BigInt(r._3)).sum
      val out = rs.filter { r =>
        val dev = n * BigInt(r._3) - sxi
        dev * dev > 9 * (n * sxxi - sxi * sxi)
      }
      t -> ((out.size.toLong, out.map(_._1).sum))
    }
    assert(got == want)
  }
}

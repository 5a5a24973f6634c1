package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-13 queries (q195–q198) beyond the
  * driver's hash check: per-branch exactness for the preference-pair
  * synthesis, a brute-force kappa recount, TVD accounting, and
  * fertility consistency against q100's per-doc piece counts. */
class R13QuerySemanticsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q195: defect branches fire exactly on their residues") {
    val rows = run("q195_preference_pair_audit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nc = r.getAs[Long]("n_chosen")
      val nr = r.getAs[Long]("n_rejected")
      val tie = r.getAs[Boolean]("is_tie")
      val stutter = r.getAs[Boolean]("has_stutter")
      if (id % 9 == 0) {
        assert(tie, s"doc $id: the mod-9 branch is a tie")
        assert(nr == nc && r.getAs[Long]("len_gap") == 0)
      } else if (id % 5 == 0) {
        // truncated-to-third rejected: strictly shorter than chosen
        assert(nr == math.max(nc / 3, 1L), s"doc $id truncation length")
        assert(!tie)
      } else {
        assert(stutter, s"doc $id: the stutter branch duplicates token 1")
        assert(nr == nc + 2, s"doc $id: stutter adds exactly 2 tokens")
        assert(!tie)
      }
      assert(r.getAs[Boolean]("keep") == (!tie && !stutter))
    }
    // chosen always has >= 6 tokens under the n >= 8 gate
    assert(rows.forall(_.getAs[Long]("n_chosen") >= 6))
  }

  test("q196: kappa matches a driver-side brute-force recount") {
    val row = run("q196_annotator_agreement").collect().head
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        (size(array_distinct(split(lower(col("text")), " "))) * 2 >=
          size(split(lower(col("text")), " "))).as("a"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val labeled = docs.map { case (id, a) => (a, a != (id % 7 == 0)) }
    val n = labeled.length.toLong
    val agree = labeled.count { case (a, b) => a == b }.toLong
    val aPos = labeled.count(_._1).toLong
    val bPos = labeled.count(_._2).toLong
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("n_agree") == agree)
    assert(row.getAs[Long]("a_pos") == aPos)
    assert(row.getAs[Long]("b_pos") == bPos)
    // disagreements are exactly the flipped residue rows
    assert(n - agree == docs.count { case (id, _) => id % 7 == 0 })
    val peN2 = aPos * bPos + (n - aPos) * (n - bPos)
    val kappa = (n * agree - peN2).toDouble / (n * n - peN2)
    assert(row.getAs[Double]("kappa") == kappa)
    assert(kappa > -1.0 - 1e-12 && kappa < 1.0 + 1e-12)
  }

  test("q197: TVD accounting — terms sum, totals match the snapshots") {
    val rows = run("q197_corpus_drift_tvd").collect()
    assert(rows.nonEmpty)
    val crossSum = rows.map(_.getAs[Long]("cross_abs")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("tvd_num") == crossSum)
      assert(r.getAs[Long]("tvd_den") > 0)
      assert(r.getAs[Boolean]("drifted") ==
        (r.getAs[Long]("tvd_num") * 10 >= r.getAs[Long]("tvd_den")))
    }
    val totOld = rows.map(_.getAs[Long]("n_old")).sum
    val totNew = rows.map(_.getAs[Long]("n_new")).sum
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
    assert(totOld == docs.filter(col("doc_id") % 7 =!= 1).count())
    assert(totNew == docs.filter(col("doc_id") % 11 =!= 3).count())
    // TVD = tvd_num / tvd_den lands in [0, 1]
    assert(crossSum <= rows.head.getAs[Long]("tvd_den"))
  }

  test("q198: pooled fertility is consistent with q100's per-doc encode") {
    val rep = run("q198_tokenizer_fertility").collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val words = r.getAs[Long]("sum_words")
      val pieces = r.getAs[Long]("sum_pieces")
      val chars = r.getAs[Long]("sum_chars")
      // merges only ever SHRINK the char-split, never below 1 piece/word
      assert(pieces >= words, s"${r.getAs[String]("lang")}: fertility >= 1")
      assert(chars >= pieces)
      assert(r.getAs[Double]("fertility") ==
        pieces.toDouble / words)
      assert(r.getAs[Double]("chars_per_piece") ==
        chars.toDouble / pieces)
    }
    // total pieces agree with the q100 per-doc encode
    val totalPieces = rep.map(_.getAs[Long]("sum_pieces")).sum
    val q100Total = run("q100_bpe_encode")
      .agg(sum(col("n_bpe"))).collect().head.getLong(0)
    assert(totalPieces == q100Total)
  }

  test("q199: exactly the bottom-3 per label flag, never above a keeper") {
    val rows = run("q199_embedding_outliers").collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Double]("cos"),
        r.getAs[Long]("cos_rank"), r.getAs[Boolean]("is_outlier")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (label, g) =>
      // ranks are a total dense 1..n per label
      assert(g.map(_._3).sorted.toSeq == (1L to g.length).toSeq,
        s"label $label ranks")
      val flagged = g.filter(_._4)
      assert(flagged.length == math.min(3, g.length))
      // no flagged vector is closer to the centroid than any keeper
      val maxOut = flagged.map(_._2).max
      val minKeep = g.filterNot(_._4).map(_._2).minOption.getOrElse(2.0)
      assert(maxOut <= minKeep, s"label $label: outliers are the far tail")
    }
  }

  test("q200: integrity counts recount against direct anti/semi joins") {
    val rows = run("q200_embedding_integrity").collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
    val vecs = graft.Tables.embeddings(spark, sfDir).select(col("vec_id"))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_with_emb") + r.getAs[Long]("n_missing") ==
        r.getAs[Long]("n_docs"))
    }
    val missing = docs.join(vecs.distinct(),
      col("doc_id") === col("vec_id"), "left_anti").count()
    assert(rows.map(_.getAs[Long]("n_missing")).sum == missing)
    val orphan = vecs.distinct().join(docs.select("doc_id"),
      col("vec_id") === col("doc_id"), "left_anti").count()
    assert(rows.forall(_.getAs[Long]("n_orphan_emb") == orphan))
    val dups = vecs.groupBy("vec_id").count().filter(col("count") > 1).count()
    assert(rows.forall(_.getAs[Long]("n_dup_vec_ids") == dups))
  }

  test("q201: every cumulative row equals a from-scratch recompute at that wave") {
    val rows = run("q201_card_incremental").collect()
    assert(rows.nonEmpty)
    // the incremental claim IS this equality: running sums of per-wave
    // partials (unique counted by min-wave ownership) ≡ recomputing the
    // whole card over waves ≤ N
    val base = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select((col("doc_id") / 100).cast("long").as("wave"),
        md5(col("text").cast("binary")).as("fp"),
        size(split(lower(col("text")), " ")).cast("long").as("n_tok"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    rows.foreach { r =>
      val w = r.getAs[Long]("wave")
      val upTo = base.filter(_._1 <= w)
      assert(r.getAs[Long]("cum_docs") == upTo.length.toLong)
      assert(r.getAs[Long]("cum_tokens") == upTo.map(_._3).sum)
      assert(r.getAs[Long]("cum_unique") ==
        upTo.map(_._2).distinct.length.toLong)
      assert(r.getAs[Long]("cum_dup_docs") ==
        r.getAs[Long]("cum_docs") - r.getAs[Long]("cum_unique"))
      assert(r.getAs[Long]("dup_permille") ==
        r.getAs[Long]("cum_dup_docs") * 1000 / r.getAs[Long]("cum_docs"))
    }
  }

  test("q202: a complete pair grid whose counts recount from the raw sets") {
    val rows = run("q202_source_mirror").collect()
    val sets = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("source"), md5(col("text").cast("binary")).as("fp"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSet }
    val sources = sets.keys.toSeq.sorted
    // the grid is exactly C(|sources|, 2), each unordered pair once
    assert(rows.length == sources.length * (sources.length - 1) / 2)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(a < b)
      val inter = (sets(a) & sets(b)).size.toLong
      assert(r.getAs[Long]("n_shared") == inter, s"($a,$b) intersection")
      assert(r.getAs[Long]("n_a") == sets(a).size.toLong)
      assert(r.getAs[Long]("n_b") == sets(b).size.toLong)
      val union = sets(a).size + sets(b).size - inter
      assert(r.getAs[Long]("jac_permille") == inter * 1000 / union)
      assert(r.getAs[Boolean]("is_mirror") ==
        (inter * 2 >= math.min(sets(a).size, sets(b).size)))
    }
  }
}

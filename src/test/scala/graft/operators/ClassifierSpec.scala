package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[CorpusOps.classifierScores]] — hashed-feature linear quality
  * classifier (q126): separation on a separable corpus, the zero-margin
  * unseen-feature path, binary (distinct) feature semantics, and exact
  * integer weight arithmetic.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("classifierScoresMemo ≡ fresh classifierScores (and is stable across calls)") {
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
      ((r.getBoolean(1), r.getBoolean(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    val freshRows = CorpusOps.classifierScores(
        graft.Tables.documents(spark, sfDir), "doc_id",
        col("lang") === "en", 4096)
      .collect()
    val memo1Rows = CorpusQueries.classifierScoresMemo(spark, sfDir)
      .collect()
    val memo2Rows = CorpusQueries.classifierScoresMemo(spark, sfDir)
      .collect()
    // cardinality FIRST: the keyed-Map comparison below collapses
    // duplicate rows (a double-write / overlapping part files in the memo
    // parquet would hide behind identical per-key values — ADVICE r20,
    // the round-10 Set.map gotcha in map form)
    assert(memo1Rows.length == freshRows.length)
    assert(memo2Rows.length == freshRows.length)
    val fresh = freshRows.map(key).toMap
    assert(memo1Rows.map(key).toMap == fresh)
    assert(memo2Rows.map(key).toMap == fresh)
  }

  private def md5Prefix32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }
  private val trainCut = 3435973836L
  private def isTrain(id: Long): Boolean = md5Prefix32(s"$id#cls") < trainCut

  // ids 0..39: every doc uses one of two disjoint vocabularies; labels
  // follow the vocabulary exactly, so a working classifier separates
  // perfectly — including on the md5-holdout rows
  private def separable() = {
    val rows = (0L until 40L).map { i =>
      val pos = i % 2 == 0
      val text = if (pos) "alpha beta gamma delta" else "omega psi chi phi"
      (i, text, pos)
    }
    rows.toDF("doc_id", "text", "lab")
  }

  test("separable corpus: every doc predicted == label, margins signed") {
    val df = separable()
    // both classes must appear in the train split for weights to exist
    val trainLabels = (0L until 40L).filter(isTrain).map(_ % 2 == 0).toSet
    assert(trainLabels == Set(true, false), "fixture must cover both classes in train")
    val out = CorpusOps.classifierScores(df, "doc_id", col("lab"))
      .collect()
    assert(out.length == 40)
    out.foreach { r =>
      val pos = r.getAs[Boolean]("is_pos")
      assert(r.getAs[Boolean]("predicted") == pos,
        s"doc ${r.getAs[Long]("doc_id")} misclassified")
      val m = r.getAs[Long]("margin")
      assert(if (pos) m > 0 else m < 0)
    }
  }

  test("doc with only unseen features gets margin 0, predicted false") {
    // find a HOLDOUT id so its unique vocabulary never reaches training
    val unseenId = (100L to 200L).find(!isTrain(_)).get
    val df = separable()
      .union(Seq((unseenId, "zzqx1 zzqx2 zzqx3", true)).toDF("doc_id", "text", "lab"))
    val r = CorpusOps.classifierScores(df, "doc_id", col("lab"))
      .filter(col("doc_id") === unseenId).collect().head
    assert(r.getAs[Long]("margin") == 0L)
    assert(!r.getAs[Boolean]("predicted"))
    assert(!r.getAs[Boolean]("is_train"))
    // 3 unigrams + 2 bigrams, all distinct
    assert(r.getAs[Long]("n_feat") == 5L)
  }

  test("features are binary per doc: repeats don't inflate n_feat or margin") {
    val df = Seq(
      (1L, "tok tok tok tok", true),
      (2L, "tok tok", true),
      (3L, "other word here", false)
    ).toDF("doc_id", "text", "lab")
    val out = CorpusOps.classifierScores(df, "doc_id", col("lab"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feat"), r.getAs[Long]("margin"))).toMap
    // doc 1: unigram 'tok' + bigram 'tok tok' = 2 distinct features;
    // doc 2 has the SAME distinct feature set → identical margin
    assert(out(1L)._1 == 2L && out(2L)._1 == 2L)
    assert(out(1L)._2 == out(2L)._2)
  }

  test("weights are the exact integer association score") {
    // 4 train-heavy docs, tiny bucket space NOT used — default 4096 keeps
    // the fixture collision-free with overwhelming probability; verify one
    // hand-computed margin instead of the full table. Vocabulary: 'p' in
    // every pos doc, 'n' in every neg doc, 'b' in all docs.
    val df = Seq(
      (0L, "p b", true), (2L, "p b", true),
      (4L, "n b", false), (6L, "n b", false)
    ).toDF("doc_id", "text", "lab")
    val train = Seq(0L, 2L, 4L, 6L).filter(isTrain)
    val tp = train.count(i => i == 0L || i == 2L).toLong
    val tn = train.size - tp
    // margin('p b' doc) = w(p) + w(b) + w('p b' bigram)
    //   w(p) = tp*tn - 0*tp ; w(b) = tp*tn - tn*tp = 0 ; w(p b) = w(p)
    val expected = 2 * tp * tn
    val r = CorpusOps.classifierScores(df, "doc_id", col("lab"))
      .filter(col("doc_id") === 0L).collect().head
    assert(r.getAs[Long]("margin") == expected)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[LakeAudit.releaseManifest]]'s contract in both directions:
  * digests are FIXED under physical-layout changes (repartitioning,
  * small-file compaction) and FLIP under any content change — a single
  * row edit, NULL vs empty string, or content shifted across a column
  * boundary — with the flip propagating through every later release
  * digest while earlier seqs stay untouched. Also pins the zero-row
  * publish (its seq must stay in the chain) and the verifier claim
  * (release digests recomputable from the manifest rows alone). */
class LakeManifestSpec extends SparkSpec {
  import spark.implicits._
  import LakeAudit._

  private val rules = Seq(Rule("id_nonneg", col("id") >= 0L))

  /** Three-publish fixture lake: b0, b1, b2 in that order. `editB1` lets a
    * test perturb exactly one row of the middle batch. */
  private def buildLake(dir: String, b1Rows: Seq[(Long, String)],
      parts: Int = 1): Unit = {
    def df(rows: Seq[(Long, String)]) =
      rows.toDF("id", "payload").repartition(parts)
    writeAuditPublish(spark, df(Seq(1L -> "alpha", 2L -> "beta")), dir, "b0", rules)
    writeAuditPublish(spark, df(b1Rows), dir, "b1", rules)
    writeAuditPublish(spark, df(Seq(7L -> "eta", 8L -> "theta")), dir, "b2", rules)
  }

  private val baseB1 = Seq(3L -> "gamma", 4L -> "delta", 5L -> "epsilon")

  private def manifest(dir: String): Seq[(Long, String, Long, String, String)] =
    releaseManifest(spark, dir)
      .select("publish_seq", "batch", "n_rows", "batch_digest",
        "release_digest")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getString(4)))
      .toSeq

  test("digests are invariant under repartitioning and small-file compaction") {
    val d1 = tmpDir("manifest-p1")
    val d7 = tmpDir("manifest-p7")
    buildLake(d1, baseB1, parts = 1)
    buildLake(d7, baseB1, parts = 7)
    val m1 = manifest(d1)
    assert(m1 == manifest(d7), "file count / row order must not matter")
    // compaction rewrites the data files in place — pure layout change
    graft.etl.LakeCompaction.compact(spark, s"$d7/data", 64L << 20)
    assert(m1 == manifest(d7), "compaction must not move any digest")
  }

  test("a single row edit flips its batch digest and every LATER release digest") {
    val base = tmpDir("manifest-base")
    val edit = tmpDir("manifest-edit")
    buildLake(base, baseB1)
    buildLake(edit, baseB1.updated(1, 4L -> "DELTA"))
    val mb = manifest(base)
    val me = manifest(edit)
    assert(mb.map(_._1) == Seq(1L, 2L, 3L) && me.map(_._1) == Seq(1L, 2L, 3L))
    // seq 1 predates the edit: identical in full
    assert(mb(0) == me(0))
    // seq 2 carries the edit: batch digest and release digest both flip
    assert(mb(1)._4 != me(1)._4, "edited batch digest must change")
    assert(mb(1)._5 != me(1)._5)
    // seq 3's own batch digest is untouched, but its RELEASE digest
    // (cumulative) must still differ — the chain property
    assert(mb(2)._4 == me(2)._4)
    assert(mb(2)._5 != me(2)._5, "edit must propagate to later releases")
  }

  test("NULL vs empty string and column-boundary shifts are digest-visible") {
    def lake(rows: Seq[(java.lang.Long, String)]): String = {
      val dir = tmpDir("manifest-null")
      writeAuditPublish(spark, rows.toDF("id", "payload"), dir, "b0",
        Seq(Rule("always", lit(true))))
      dir
    }
    val withNull = manifest(lake(Seq((1L: java.lang.Long) -> null)))
    val withEmpty = manifest(lake(Seq((1L: java.lang.Long) -> "")))
    assert(withNull.head._4 != withEmpty.head._4,
      "NULL and '' must canonicalize differently (chr(2) marker)")
    // boundary shift: ("ab","c") vs ("a","bc") — same concatenated bytes,
    // different columns; the chr(1) separator must split them apart
    def lake2(a: String, b: String): String = {
      val dir = tmpDir("manifest-shift")
      writeAuditPublish(spark, Seq((a, b)).toDF("x", "y"), dir, "b0",
        Seq(Rule("always", lit(true))))
      dir
    }
    assert(manifest(lake2("ab", "c")).head._4 !=
      manifest(lake2("a", "bc")).head._4,
      "column-boundary shifts must flip the digest (chr(1) separator)")
  }

  test("a zero-row published batch keeps its seq in the chain (n_rows=0, sums '0')") {
    val dir = tmpDir("manifest-empty")
    writeAuditPublish(spark,
      Seq(1L -> "alpha").toDF("id", "payload"), dir, "b0", rules)
    writeAuditPublish(spark,
      Seq.empty[(Long, String)].toDF("id", "payload"), dir, "bEmpty", rules)
    writeAuditPublish(spark,
      Seq(9L -> "iota").toDF("id", "payload"), dir, "b2", rules)
    val m = releaseManifest(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSeq
    assert(m.map(t => (t._1, t._2)) ==
      Seq((1L, "b0"), (2L, "bEmpty"), (3L, "b2")),
      s"zero-row publish must not vanish from the chain: $m")
    assert(m(1)._3 == 0L && m(1)._4 == "0" && m(1)._5 == "0")
  }

  test("release digests are recomputable from the manifest rows alone (verifier replay)") {
    val dir = tmpDir("manifest-verify")
    buildLake(dir, baseB1)
    val rows = releaseManifest(spark, dir)
      .select("publish_seq", "batch_digest", "release_digest")
      .collect().sortBy(_.getLong(0))
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    var acc = ""
    rows.foreach { r =>
      acc = md5Hex(acc + r.getString(1))
      assert(acc == r.getString(2),
        s"verifier replay diverged at seq ${r.getLong(0)}")
    }
  }
}

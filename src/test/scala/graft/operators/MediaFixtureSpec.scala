package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q102b/q103b frozen-fingerprint fixtures are an ENVIRONMENT pin on
  * this machine's JDK codec stack (see [[MediaQueries.imgFixture]]'s
  * scaladoc). This spec makes a legitimate environment move a ONE-STEP
  * refresh: on any live-vs-frozen drift it prints the ready-to-paste
  * Scala Seq literals under a `MEDIA_FIXTURE_REGEN` marker, then fails —
  * so a red here is self-diagnosing (codec drift, not a logic bug) and
  * self-repairing (paste, re-run).
  */
class MediaFixtureSpec extends SparkSpec {

  private def live(hashed: org.apache.spark.sql.DataFrame,
      kindRank: Seq[String]): Seq[(String, Long)] =
    hashed.select(col("key"), col("phash")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (k, _) =>
        val Array(kind, seed) = k.split(":")
        (seed.toLong, kindRank.indexOf(kind))
      }.toSeq

  private def regenBlock(name: String, fx: Seq[(String, Long)]): String =
    fx.map { case (k, h) => s""""$k" -> ${h}L""" }
      .grouped(2).map(_.mkString(", ")).mkString(
        s"MEDIA_FIXTURE_REGEN $name: Seq(\n    ", ",\n    ", ")")

  private def check(name: String, liveFx: Seq[(String, Long)],
      frozen: Seq[(String, Long)]): Unit = {
    if (liveFx.toMap != frozen.toMap) {
      // the paste-ready refresh — this is the regen path, not debug noise
      println(regenBlock(name, liveFx))
    }
    assert(liveFx.toMap == frozen.toMap,
      s"$name drifted from the live JDK codec hashes — paste the " +
        "MEDIA_FIXTURE_REGEN block printed above into MediaQueries")
  }

  test("imgFixture matches the live image pipeline (regen printout on drift)") {
    check("imgFixture",
      live(MediaDedup.imageHashes(MediaDedup.imageCorpus(spark),
        keep = Seq("key")), Seq("orig", "reenc", "half", "jitter")),
      MediaQueries.imgFixture)
  }

  test("audFixture matches the live audio pipeline (regen printout on drift)") {
    check("audFixture",
      live(MediaDedup.audioHashes(MediaDedup.audioCorpus(spark),
        keep = Seq("key")), Seq("orig", "half", "quarter")),
      MediaQueries.audFixture)
  }
}

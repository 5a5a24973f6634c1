package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins [[CdcMerge]]: COW apply semantics (latest-wins, delete, insert,
  * delete-of-missing no-op), merge-on-read view ≡ sequential COW folds,
  * and compaction preserving the view while dropping deltas. */
class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  private def snap(df: DataFrame): Set[(Long, String, Double)] =
    df.select("k", "name", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  private val base =
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("k", "name", "v")

  test("COW apply: latest seq wins; deletes drop; inserts land; missing-key delete no-ops") {
    val ch = Seq(
      (1L, "a1", 1.1, 10L, "U"), // older update for key 1 ...
      (1L, "a2", 1.2, 20L, "U"), // ... beaten by this one
      (2L, "x", 0.0, 11L, "D"),  // delete key 2
      (4L, "d", 4.0, 12L, "U"),  // insert a new key
      (9L, "x", 0.0, 13L, "D"),  // delete of a key the base lacks
    ).toDF("k", "name", "v", "seq", "op")
    val out = snap(CdcMerge.apply(base, ch, "k", "seq", "op"))
    assert(out == Set((1L, "a2", 1.2), (3L, "c", 3.0), (4L, "d", 4.0)))
  }

  test("delete-then-reinsert within one batch resolves by seq, not op") {
    val ch = Seq(
      (3L, "x", 0.0, 10L, "D"),
      (3L, "c2", 3.3, 20L, "U"), // later upsert resurrects the key
    ).toDF("k", "name", "v", "seq", "op")
    val out = snap(CdcMerge.apply(base, ch, "k", "seq", "op"))
    assert(out.contains((3L, "c2", 3.3)))
  }

  test("merge-on-read view == sequential COW folds; compact preserves it") {
    val dir = tmpDir("cdc-mor")
    CdcMerge.writeBase(base, dir)
    val b1 = Seq((1L, "a1", 1.1, 10L, "U"), (2L, "x", 0.0, 11L, "D"))
      .toDF("k", "name", "v", "seq", "op")
    val b2 = Seq((1L, "a2", 1.2, 20L, "U"), (5L, "e", 5.0, 21L, "U"))
      .toDF("k", "name", "v", "seq", "op")
    CdcMerge.appendDelta(b1, dir, 1)
    CdcMerge.appendDelta(b2, dir, 2)

    val cow = snap(CdcMerge.apply(CdcMerge.apply(base, b1, "k", "seq", "op"),
      b2, "k", "seq", "op"))
    val payload = Seq("k", "name", "v")
    val mor = snap(CdcMerge.readView(spark, dir, "k", "seq", "op", payload))
    assert(mor == cow, "MOR view must equal folding COW over the batches")

    CdcMerge.compact(spark, dir, "k", "seq", "op", payload)
    val after = snap(CdcMerge.readView(spark, dir, "k", "seq", "op", payload))
    assert(after == cow, "compaction must not change the view")
    val f = new java.io.File(s"$dir/delta")
    assert(!f.exists, "compaction must drop the delta directory")
    // a replayed ingest after compaction still resolves (seq monotone)
    CdcMerge.appendDelta(
      Seq((5L, "e2", 5.5, 30L, "U")).toDF("k", "name", "v", "seq", "op"),
      dir, 3)
    val next = snap(CdcMerge.readView(spark, dir, "k", "seq", "op", payload))
    assert(next == cow - ((5L, "e", 5.0)) + ((5L, "e2", 5.5)))
  }

  test("time travel: asOfBatch reproduces every historical view") {
    val dir = tmpDir("cdc-asof")
    CdcMerge.writeBase(base, dir)
    val b1 = Seq((1L, "a1", 1.1, 10L, "U"), (2L, "x", 0.0, 11L, "D"))
      .toDF("k", "name", "v", "seq", "op")
    val b2 = Seq((1L, "a2", 1.2, 20L, "U"), (5L, "e", 5.0, 21L, "U"))
      .toDF("k", "name", "v", "seq", "op")
    CdcMerge.appendDelta(b1, dir, 1)
    CdcMerge.appendDelta(b2, dir, 2)
    val payload = Seq("k", "name", "v")
    def asOf(b: Long) = snap(
      CdcMerge.readView(spark, dir, "k", "seq", "op", payload, Some(b)))
    assert(asOf(0L) == snap(base), "asOf before any delta = the base")
    assert(asOf(1L) == snap(CdcMerge.apply(base, b1, "k", "seq", "op")))
    assert(asOf(2L) ==
      snap(CdcMerge.readView(spark, dir, "k", "seq", "op", payload)),
      "asOf at the newest batch = the current view")
  }

  test("schema evolution: a column added mid-stream reads as null before it existed") {
    val dir = tmpDir("cdc-evolve")
    CdcMerge.writeBase(base, dir)
    // batch 1 predates the new column; batch 2 carries it
    CdcMerge.appendDelta(
      Seq((1L, "a1", 1.1, 10L, "U")).toDF("k", "name", "v", "seq", "op"),
      dir, 1)
    CdcMerge.appendDelta(
      Seq((2L, "b2", 2.2, "tagged", 20L, "U"))
        .toDF("k", "name", "v", "tag", "seq", "op"),
      dir, 2)
    val payload = Seq("k", "name", "v", "tag")
    val got = CdcMerge.readView(spark, dir, "k", "seq", "op", payload)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        Option(r.getString(3)))).toSet
    assert(got == Set(
      (1L, "a1", 1.1, None),       // winner predates the column
      (2L, "b2", 2.2, Some("tagged")),
      (3L, "c", 3.0, None)))       // base row predates the column
    // history before the column existed still reads (as all-null tag)
    val old = CdcMerge.readView(spark, dir, "k", "seq", "op", payload,
      Some(1L)).collect().map(_.getString(3)).toSet
    assert(old == Set(null))
  }

  test("replayed delta batch is idempotent (partition overwrite)") {
    val dir = tmpDir("cdc-replay")
    CdcMerge.writeBase(base, dir)
    val b1 = Seq((1L, "a1", 1.1, 10L, "U")).toDF("k", "name", "v", "seq", "op")
    CdcMerge.appendDelta(b1, dir, 1)
    CdcMerge.appendDelta(b1, dir, 1) // crash-replay of the same batch id
    val payload = Seq("k", "name", "v")
    val mor = snap(CdcMerge.readView(spark, dir, "k", "seq", "op", payload))
    assert(mor == Set((1L, "a1", 1.1), (2L, "b", 2.0), (3L, "c", 3.0)))
  }
}

package graft.streaming

import graft.SparkSpec
import graft.operators.CdcMerge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Streaming CDC ingest (CdcStream): the merge-on-read table a stream
  * builds must equal folding the batches through the COW merge, survive
  * kill-restart without duplicate effects, and keep its view across a
  * compaction that runs between micro-batch waves. */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def snap(df: DataFrame): Set[(Long, String, Double)] =
    df.select("k", "name", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("stream ingest ≡ COW folds; kill-restart converges; compact mid-stream is safe") {
    val src = tmpDir("cdc-src"); val table = tmpDir("cdc-table")
    val ckpt = tmpDir("cdc-ckpt")
    val payload = Seq("k", "name", "v")
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "name", "v")
    CdcMerge.writeBase(base, table)

    val w1 = Seq((1L, "a1", 1.1, 10L, "U"), (2L, "x", 0.0, 11L, "D"))
      .toDF("k", "name", "v", "seq", "op")
    val w2 = Seq((1L, "a2", 1.2, 20L, "U"), (5L, "e", 5.0, 21L, "U"))
      .toDF("k", "name", "v", "seq", "op")
    w1.write.mode("append").parquet(src)
    val schema = w1.schema
    def run() = {
      val q = CdcStream.start(
        spark.readStream.schema(schema).parquet(src), table, ckpt,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
      q
    }
    val q1 = run()
    val afterW1 = snap(CdcMerge.readView(spark, table, "k", "seq", "op", payload))
    assert(afterW1 ==
      snap(CdcMerge.apply(base, w1, "k", "seq", "op")),
      "streamed view must equal the COW apply of wave 1")
    // observed ingest metrics surfaced on the query's progress
    val obs = q1.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("cdc_ingest")))
    assert(obs.map(_.getAs[Long]("rows")).sum == 2L)
    assert(obs.map(_.getAs[Long]("deletes")).sum == 1L)

    // compaction between waves must not disturb the resumed stream
    CdcMerge.compact(spark, table, "k", "seq", "op", payload)
    assert(snap(CdcMerge.readView(spark, table, "k", "seq", "op", payload))
      == afterW1)

    // deliver wave 2, restart from the same checkpoint ("crash" replay)
    w2.write.mode("append").parquet(src)
    run()
    val want = snap(CdcMerge.apply(
      CdcMerge.apply(base, w1, "k", "seq", "op"), w2, "k", "seq", "op"))
    val got = snap(CdcMerge.readView(spark, table, "k", "seq", "op", payload))
    assert(got == want, s"streamed table diverged: $got vs $want")
    // a fresh no-new-data restart must change nothing (pure replay)
    run()
    assert(snap(CdcMerge.readView(spark, table, "k", "seq", "op", payload))
      == want)
  }
}

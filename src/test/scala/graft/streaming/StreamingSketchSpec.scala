package graft.streaming

import graft.SparkSpec
import graft.functions.KmvAgg
import graft.operators.KmvSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The mergeable-sketch discipline on a LIVE stream: a KMV aggregation
  * running under Structured Streaming must converge to exactly the batch
  * sketch over the same rows, independent of micro-batch boundaries —
  * the property that lets a 100 TB ingest maintain distinct-count /
  * overlap sketches incrementally (bounded per-group state) instead of
  * rescanning raw history (q127/q132/q140's stored artifacts, produced
  * by the stream itself).
  */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming KMV aggregation ≡ batch KmvSketch.partial across arbitrary batch boundaries") {
    implicit val sc = spark.sqlContext
    val k = 8
    val kmv = udaf(new KmvAgg(k))
    val mem = MemoryStream[(String, Long)]
    val agg = mem.toDF().toDF("g", "h")
      .groupBy("g").agg(kmv(col("h")).as("sk"))
    val q = agg.writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Complete()).start()
    // duplicate-heavy rows split over uneven micro-batches: cross-batch
    // duplicates and k-displacements must all resolve identically to batch
    val rnd = new scala.util.Random(7)
    val data = (0 until 300).map(i =>
      ("g" + (i % 3), (rnd.nextInt(40) + 1).toLong))
    data.grouped(70).foreach { chunk =>
      mem.addData(chunk: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("kmv_stream")
      .as[(String, Array[Long])].collect()
      .map { case (g, sk) => g -> sk.toSeq }.toMap

    val batch = KmvSketch.partial(data.toDF("g", "h"), Seq("g"), "h", k)
      .groupBy("g").agg(sort_array(collect_list(col("h"))).as("sk"))
      .as[(String, Seq[Long])].collect().toMap

    assert(streamed.keySet == batch.keySet)
    streamed.keySet.foreach { g =>
      assert(streamed(g) == batch(g), s"group $g: stream ≠ batch sketch")
      assert(streamed(g).length == k, s"group $g sketch must saturate at k")
    }
  }
}

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

  test("streaming KMV-rank quantile sketch ≡ batch q257 buffers and estimates") {
    // q257's quantile sketch maintained on a LIVE ingest: the packed
    // (30-bit md5, cents) keys stream through the same KmvAgg(256), and
    // because KMV merges are loss-free under any batching, the final
    // per-group buffer — and therefore every nearest-rank estimate read
    // off it — is bit-identical to the batch build. Bounded state per
    // group (≤256 longs): the 100 TB percentile dashboard never rescans.
    implicit val sc = spark.sqlContext
    import graft.Tables
    val rows = Tables.lineitem(spark, sfDir)
      .filter(col("l_extendedprice").isNotNull)
      .select(col("l_returnflag").as("g"),
        ((call_function("md5_prefix32",
          concat(col("l_orderkey").cast("string"), lit("#"),
            col("l_linenumber").cast("string"))) % 1073741824L)
          * 4294967296L +
          (col("l_extendedprice")
            .cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
            .cast("long")).as("pk"))
      .as[(String, Long)].collect()
    val kmv = udaf(new KmvAgg(256))
    val mem = MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("g", "pk")
      .groupBy("g").agg(kmv(col("pk")).as("buf"))
      .writeStream.format("memory").queryName("kmv_quant")
      .outputMode(OutputMode.Complete()).start()
    // uneven waves so buffers merge across batch boundaries mid-fill
    val n = rows.length
    Seq(rows.slice(0, n / 5), rows.slice(n / 5, n / 2),
      rows.slice(n / 2, n)).foreach { w =>
      mem.addData(w.toSeq: _*); q.processAllAvailable()
    }
    q.stop()
    def estimates(buf: Seq[Long]): Seq[(Int, Long)] = {
      val cs = buf.map(_ % 4294967296L).sorted
      Seq(50, 90).map(p =>
        p -> cs(((p.toLong * cs.length + 99L) / 100L).toInt - 1))
    }
    val streamed = spark.table("kmv_quant")
      .as[(String, Array[Long])].collect()
      .map { case (g, b) => g -> b.toSeq }.toMap
    val batch = rows.toSeq.toDF("g", "pk")
      .groupBy("g").agg(kmv(col("pk")).as("buf"))
      .as[(String, Array[Long])].collect()
      .map { case (g, b) => g -> b.toSeq }.toMap
    assert(streamed.keySet == batch.keySet && streamed.keySet.nonEmpty)
    streamed.keySet.foreach { g =>
      assert(streamed(g) == batch(g), s"group $g: stream ≠ batch buffer")
      assert(estimates(streamed(g)) == estimates(batch(g)))
      assert(streamed(g).length == 256, s"group $g must saturate at k=256")
    }
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Pins the Misra–Gries bounds ([[FreqSketch]]) and the exact-equality
  * contract of the sketch-nominated top-k path. */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  // 1×a↑600, 1×b↑250, 1×c↑90, plus 600 singletons: n = 1540
  private def zipfish: Seq[String] =
    Seq.fill(600)("a") ++ Seq.fill(250)("b") ++ Seq.fill(90)("c") ++
      (1 to 600).map(i => s"tail$i")

  test("every key above n/m survives any partitioning, counters undercount by ≤ n/m") {
    val n = zipfish.size
    val m = 8
    val sketch = udaf(new FreqSketch(m), Encoders.STRING)
    for (parts <- Seq(1, 7, 32)) {
      val mg = zipfish.toDF("key").repartition(parts)
        .agg(sketch(col("key")).as("mg"))
        .collect()(0).getAs[Map[String, Long]]("mg")
      assert(mg.size <= m, s"capacity violated at parts=$parts: ${mg.size}")
      // guarantee 1: freq > n/m ⇒ present (a: 600, b: 250 > 1540/8 ≈ 192)
      assert(mg.contains("a") && mg.contains("b"), s"parts=$parts: $mg")
      // guarantee 2: counter ∈ [true − n/m, true]
      val truth = zipfish.groupBy(identity).view.mapValues(_.size.toLong).toMap
      mg.foreach { case (k, c) =>
        assert(c <= truth(k), s"overcount of $k at parts=$parts")
        assert(c >= truth(k) - n / m, s"undercount bound broken for $k at parts=$parts")
      }
    }
  }

  test("exactTopK equals the direct groupBy top-k when the k-th frequency clears n/m") {
    val df = zipfish.toDF("key").repartition(13)
    val viaSketch = FreqSketch.exactTopK(df, "key", 3, 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val direct = df.groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key")).limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSketch == direct)
    assert(viaSketch == Seq(("a", 600L), ("b", 250L), ("c", 90L)))
  }

  test("nulls are dropped, never counted") {
    val df = (Seq.fill(5)(Some("x")) ++ Seq(None, None)).toDF("key")
    val top = FreqSketch.exactTopK(df, "key", 2, 4).collect()
    assert(top.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("x", 5L)))
  }
}

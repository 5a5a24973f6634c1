package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the native [[RegMinAgg]] (`reg_min`) — the q254 packed-register
  * merge — against the reference ArrayMinAgg UDAF semantics: elementwise
  * min per group, both aggregation paths (partial→final through the
  * serialize/deserialize boundary), and the loud-failure contract on
  * malformed input. */
class RegMinAggSpec extends SparkSpec {
  import spark.implicits._

  test("reg_min ≡ elementwise-min reference, through the shuffle boundary") {
    val m = 64
    val rnd = new scala.util.Random(41)
    val rows = (1 to 500).map { i =>
      (s"g${i % 7}", Array.fill(m)(rnd.nextInt(1 << 27)))
    }
    val df = rows.toDF("g", "regs").repartition(8)
    val got = df.groupBy("g")
      .agg(call_function("reg_min", col("regs"), lit(m)).as("regs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1).toArray).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).reduce { (a, b) =>
        a.zip(b).map { case (x, y) => math.min(x, y) } }
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (g, w) =>
      assert(got(g).toSeq == w.toSeq, s"group $g") }
  }

  test("reg_min ≡ ArrayMinAgg UDAF on the same frame") {
    val m = 8
    val rnd = new scala.util.Random(43)
    val df = (1 to 200).map(i => (i % 5, Array.fill(m)(rnd.nextInt(1000))))
      .toDF("g", "regs").repartition(6)
    val native = df.groupBy("g")
      .agg(call_function("reg_min", col("regs"), lit(m)).as("r"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    val amin = udaf(new graft.functions.ArrayMinAgg(m))
    val ref = df.groupBy("g").agg(amin(col("regs")).as("r"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    assert(native == ref)
  }

  test("malformed input fails loudly") {
    val bad = Seq((1, Array(1, 2, 3))).toDF("g", "regs")
    val e = intercept[Exception] {
      bad.groupBy("g")
        .agg(call_function("reg_min", col("regs"), lit(8)).as("r"))
        .collect()
    }
    assert(e.getMessage != null)
  }
}

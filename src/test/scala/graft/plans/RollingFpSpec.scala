package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** rolling_fp native expression: pinned against the interpreted HOF
  * formulation (what the DuckDB oracle mirrors) and a JVM-side reference. */
class RollingFpSpec extends SparkSpec {
  import spark.implicits._

  private def hofFp(toks: org.apache.spark.sql.Column) =
    aggregate(toks, lit(0L), (acc, t) =>
      (acc * lit(31L) + conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
        % lit(1000000007L))

  test("native == interpreted HOF == JVM reference on varied token streams") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "", // one empty-string token after split
      "a", "a a", "a b", "b a", // order sensitivity
      "unicode tøkens ünd ĉhars 北京")
      .toDF("text").withColumn("toks", split(lower(col("text")), " "))
    val rows = docs.select(
      call_function("rolling_fp", col("toks")).as("native"),
      hofFp(col("toks")).as("hof"),
      col("toks")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"native != hof for ${r.getSeq[String](2)}")
      val expected = r.getSeq[String](2).foldLeft(0L) { (acc, t) =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8"))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        (acc * 31L + h) % 1000000007L
      }
      assert(r.getLong(0) == expected)
    }
    // order sensitivity: "a b" != "b a"
    val ab = rows.filter(_.getSeq[String](2) == Seq("a", "b")).head.getLong(0)
    val ba = rows.filter(_.getSeq[String](2) == Seq("b", "a")).head.getLong(0)
    assert(ab != ba)
  }

  test("type check rejects non-string arrays") {
    val e = intercept[Exception](
      spark.range(1).select(call_function("rolling_fp", array(lit(1L)))).collect())
    assert(e.getMessage.toLowerCase.contains("rolling_fp"))
  }
}

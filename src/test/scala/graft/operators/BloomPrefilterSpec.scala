package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[BloomPrefilter]] (q215): the no-false-negative guarantee, agreement
  * with a JVM md5 reference for both build and probe, 32-bit word packing
  * (no sign bit cross-engine hazard), and a false-positive rate sanity
  * band at the design point.
  */
class BloomPrefilterSpec extends SparkSpec {
  import spark.implicits._

  private def md5p32(s: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      dig.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
  }

  private def refWords(keys: Seq[Long], m: Int, h: Int): Array[Long] = {
    val arr = new Array[Long](m / 32)
    for (k <- keys; i <- 0 until h) {
      val p = md5p32(s"$k#b$i") % m
      arr((p / 32).toInt) |= 1L << (p % 32)
    }
    arr
  }

  test("build ≡ JVM md5 reference; words stay in [0, 2^32)") {
    val keys = (1L to 400L).map(_ * 7L)
    val words = BloomPrefilter.build(keys.toDF("k"), "k", 4096, 3)
    assert(words.toSeq == refWords(keys, 4096, 3).toSeq)
    assert(words.forall(w => w >= 0L && w < (1L << 32)),
      "32-bit packing must never touch the sign bit")
  }

  test("membership: zero false negatives; fp rate near the design point") {
    val keys = (1L to 300L).map(_ * 13L)
    val words = BloomPrefilter.build(keys.toDF("k"), "k", 4096, 3)
    val probes = (1L to 20000L).toDF("k")
      .withColumn("pass", BloomPrefilter.memberCol(col("k"), words, 4096, 3))
    val got = probes.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    keys.filter(_ <= 20000L).foreach(k =>
      assert(got(k), s"false negative on member $k"))
    val keySet = keys.toSet
    val nonKeys = (1L to 20000L).filterNot(keySet)
    val fp = nonKeys.count(got)
    // fill = bits_set/4096 ≈ 0.20 → expected fp ≈ fill³ ≈ 0.9%; allow a
    // generous band (binomial noise over ~19.7k probes)
    val rate = fp.toDouble / nonKeys.size
    assert(rate > 0.0005 && rate < 0.05, s"fp rate $rate out of band")
  }

  test("probe column ≡ JVM reference on every probe") {
    val keys = (1L to 150L).map(_ * 3L)
    val m = 1024; val h = 3
    val words = BloomPrefilter.build(keys.toDF("k"), "k", m, h)
    val ref = refWords(keys, m, h)
    def member(k: Long): Boolean = (0 until h).forall { i =>
      val p = md5p32(s"$k#b$i") % m
      (ref((p / 32).toInt) & (1L << (p % 32))) != 0L
    }
    val got = (1L to 2000L).toDF("k")
      .withColumn("pass", BloomPrefilter.memberCol(col("k"), words, m, h))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1))
    got.foreach { case (k, pass) =>
      assert(pass == member(k), s"probe mismatch at $k")
    }
  }
}

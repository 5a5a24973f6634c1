package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The ac_* kernels claim exact Aho–Corasick semantics: every occurrence
  * of every pattern (overlapping included), distinct-pattern presence,
  * earliest match start. Pinned against an independent brute-force scan
  * (startsWith at every position) — randomized over a tiny alphabet so
  * nesting/overlap/fail-link paths are hit constantly — plus the edge
  * cases that killed naive implementations: nested patterns, self-
  * overlapping patterns, duplicate patterns, non-ASCII fallback.
  */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def brute(s: String, pats: Array[String]): (Int, Int, Int) = {
    var total = 0
    var distinct = 0
    var first = Int.MaxValue
    pats.foreach { p =>
      var hits = 0
      var i = 0
      while (i + p.length <= s.length) {
        if (s.startsWith(p, i)) { hits += 1; if (i + 1 < first) first = i + 1 }
        i += 1
      }
      total += hits
      if (hits > 0) distinct += 1
    }
    (total, distinct, if (first == Int.MaxValue) 0 else first)
  }

  private def ac(s: String, pats: Array[String]): (Int, Int, Int) = {
    val a = new AcAutomaton(pats)
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    (a.countAll(u), a.distinctHits(u), a.firstPos(u))
  }

  test("randomized differential vs brute force (nested/overlapping-heavy alphabet)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab "
    (1 to 300).foreach { _ =>
      val s = Array.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(3))).mkString
      val nP = 1 + rnd.nextInt(5)
      val pats = Array.fill(nP)(
        Array.fill(1 + rnd.nextInt(4))(alphabet(rnd.nextInt(3))).mkString)
      assert(ac(s, pats) == brute(s, pats), s"s='$s' pats=${pats.mkString("[", ",", "]")}")
    }
  }

  test("nested patterns each fire: 'scan' inside 'row scan' inside context") {
    val pats = Array("scan", "row scan", "slow scan")
    // "row scan" contains one 'scan' and one 'row scan'
    assert(ac("a row scan b", pats) == (2, 2, 3))
    // both long patterns plus two 'scan's
    assert(ac("slow scan row scan", pats) == (4, 3, 1))
  }

  test("self-overlapping pattern counts every end position") {
    assert(ac("a a a", Array("a a")) == (2, 1, 1))
    assert(ac("aaaa", Array("aa")) == (3, 1, 1))
  }

  test("first_pos is the earliest START, not the earliest end") {
    // 'b' ends first (pos 2) but 'abc' starts earlier (pos 1)
    assert(ac("abc", Array("abc", "b")) == (2, 2, 1))
    // a long pattern found late can still start before a short early one
    assert(ac("xxaby", Array("xxab", "a")) == (2, 2, 1))
  }

  test("duplicate patterns count separately; empty text and no-match are zero") {
    assert(ac("abab", Array("ab", "ab")) == (4, 2, 1))
    assert(ac("", Array("ab")) == (0, 0, 0))
    assert(ac("zzz", Array("ab")) == (0, 0, 0))
  }

  test("non-ASCII patterns take the fallback path with identical semantics") {
    val pats = Array("é", "éé", "aé")
    assert(ac("aééb", pats) == brute("aééb", pats))
    assert(ac("ééé", Array("éé")) == (2, 1, 1))
  }

  test("SQL surface: codegen path over a DataFrame matches brute force row-by-row") {
    val rows = Seq("a row scan b", "slow scan row scan", "a a a", "", "no hits here",
      "big table scan a a big table").toDF("text")
      .withColumn("id", monotonically_increasing_id)
    val pats = Array("scan", "row scan", "big table", "a a")
    val patsSql = pats.map(p => s"'$p'").mkString("array(", ", ", ")")
    val got = rows.selectExpr("text",
        s"ac_count_all(text, $patsSql) AS t",
        s"ac_distinct_hits(text, $patsSql) AS d",
        s"ac_first_pos(text, $patsSql) AS f")
      .collect()
    got.foreach { r =>
      val (t, d, f) = brute(r.getString(0), pats)
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((t, d, f)), s"text='${r.getString(0)}'")
    }
    // null text → null out (nullSafeEval / nullSafeCodeGen contract)
    val n = Seq[Option[String]](None).toDF("text")
      .selectExpr(s"ac_count_all(text, $patsSql) AS t").collect()
    assert(n.head.isNullAt(0))
  }

  test("an empty pattern is rejected at ANALYSIS time, naming the index") {
    val err = intercept[Exception] {
      Seq("x").toDF("text")
        .selectExpr("ac_count_all(text, array('scan', ''))").collect()
    }
    assert(err.getMessage.contains("empty pattern at index 1"),
      err.getMessage.take(200))
  }

  test("non-literal pattern list is rejected (automaton is built once per plan)") {
    val err = intercept[Exception] {
      Seq(("x", Array("x"))).toDF("text", "pats")
        .selectExpr("ac_count_all(text, pats)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable") ||
      err.getMessage.toLowerCase.contains("literal"))
  }
}

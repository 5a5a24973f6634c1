package graft.operators

import graft.{SparkEntry, SparkSpec}

/** t1 smoke: every declared query runs at sf0.001; ⚙ engine-only queries
  * additionally must return rows (they have no oracle hash). */
class QueriesSmokeSpec extends SparkSpec {

  private val mustBeNonEmpty = Set(
    "q41_dedup_minhash_lsh", "q42_dedup_simhash", "q43_sim_ann_lsh",
    "q44_text_langid", "q47_text_rollinghash")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sfDir).count()
      if (mustBeNonEmpty(name)) assert(n > 0, s"$name returned no rows")
      else assert(n >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[CorpusOps.decileBin]] (single-window declared form) and
  * [[CorpusOps.decileBinDistributed]] (range-partitioned scale form)
  * against each other and against hand-computed deciles: the two MUST be
  * row-identical on any input, sizes per decile differ by at most one,
  * and the ordering ties break deterministically by id.
  */
class DecileBinSpec extends SparkSpec {
  import spark.implicits._

  test("decile arithmetic: 10 even bins, remainder spread to the low bins") {
    // 23 rows: deciles sized ceil/floor by 1 + (10·(rank−1)) div 23
    val df = (1L to 23L).map(i => (i, i.toDouble)).toDF("id", "q")
    val out = CorpusOps.decileBin(df, col("q"), "id")
      .groupBy("decile").count().collect()
      .map(r => r.getAs[Long]("decile") -> r.getAs[Long]("count")).toMap
    assert(out.keySet == (1L to 10L).toSet)
    assert(out.values.forall(c => c == 2L || c == 3L))
    assert(out.values.sum == 23L)
  }

  test("ties broken by id: equal scores order by ascending id") {
    val df = Seq((5L, 1.0), (1L, 1.0), (3L, 1.0), (2L, 0.0)).toDF("id", "q")
    val out = CorpusOps.decileBin(df, col("q"), "id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("decile")).toMap
    // rank order: 2 (q=0), then 1, 3, 5 by id; n=4 → deciles 1,3,6,8
    assert(out == Map(2L -> 1L, 1L -> 3L, 3L -> 6L, 5L -> 8L))
  }

  test("distributed form is row-identical to the window form") {
    val rnd = new scala.util.Random(7)
    val df = (1L to 2000L)
      .map(i => (i, math.floor(rnd.nextDouble() * 50) / 50)) // many ties
      .toDF("id", "q")
    val a = CorpusOps.decileBin(df, col("q"), "id")
    val b = CorpusOps.decileBinDistributed(df, col("q"), "id", partitions = 7)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(b.count() == 2000L)
  }

  test("distributed form has no single-task global stage") {
    val df = (1L to 500L).map(i => (i, (i % 13).toDouble)).toDF("id", "q")
    val plan = CorpusOps.decileBinDistributed(df, col("q"), "id", partitions = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"scale form must not use WindowExec:\n$plan")
  }
}

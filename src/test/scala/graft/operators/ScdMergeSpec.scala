package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[ScdMerge.apply2]] across generations: changed rows version,
  * no-op updates never do, history survives later merges untouched. */
class ScdMergeSpec extends SparkSpec {
  import spark.implicits._

  private def dim(rows: (Long, String, Double)*) =
    rows.toDF("k", "seg", "bal")
      .withColumn("valid_from", lit("2024-01-01"))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))

  test("two merge generations: versions chain, no-ops stay silent, history persists") {
    val gen0 = dim((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
    // gen1: key 1 changes, key 2 no-op, key 3 absent
    val upd1 = Seq((1L, "A2", 11.0), (2L, "B", 20.0)).toDF("k", "seg", "bal")
    val gen1 = ScdMerge.apply2(gen0, upd1, "k", Seq("seg", "bal"),
      lit("2024-02-01"))
    val g1 = gen1.collect().map(r => (r.getAs[Long]("k"),
      r.getAs[String]("seg"), r.getAs[String]("valid_from"),
      r.getAs[String]("valid_to"), r.getAs[Boolean]("is_current"))).toSet
    assert(g1 == Set(
      (1L, "A", "2024-01-01", "2024-02-01", false),
      (1L, "A2", "2024-02-01", null, true),
      (2L, "B", "2024-01-01", null, true),
      (3L, "C", "2024-01-01", null, true)))

    // gen2: key 1 changes AGAIN — its gen-0 history row must pass through
    val upd2 = Seq((1L, "A3", 12.0)).toDF("k", "seg", "bal")
    val g2 = ScdMerge.apply2(gen1, upd2, "k", Seq("seg", "bal"),
        lit("2024-03-01"))
      .filter(col("k") === 1L)
      .collect().map(r => (r.getAs[String]("seg"),
        r.getAs[String]("valid_from"), r.getAs[String]("valid_to"),
        r.getAs[Boolean]("is_current"))).toSet
    assert(g2 == Set(
      ("A", "2024-01-01", "2024-02-01", false),
      ("A2", "2024-02-01", "2024-03-01", false),
      ("A3", "2024-03-01", null, true)))
  }

  test("null attributes hash distinctly from empty strings") {
    val cur = Seq((1L, null.asInstanceOf[String], 1.0)).toDF("k", "seg", "bal")
      .withColumn("valid_from", lit("2024-01-01"))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))
    val upd = Seq((1L, "", 1.0)).toDF("k", "seg", "bal")
    val out = ScdMerge.apply2(cur, upd, "k", Seq("seg", "bal"),
      lit("2024-02-01"))
    assert(out.count() == 2, "null → '' is a REAL change and must version")
  }
}

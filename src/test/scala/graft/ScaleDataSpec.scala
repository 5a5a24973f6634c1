package graft

import org.apache.spark.sql.functions._

/** ScaleData's contract: an N× materialization keeps every replica's
  * foreign keys closed (replica c's orders reference replica c's
  * customers), dimensions fixed, and key domains disjoint across replicas
  * — the properties the sf1 whole-suite checkpoint (BASELINE.md) relies
  * on. */
class ScaleDataSpec extends SparkSpec {

  private lazy val outDir: String = {
    val dir = tmpDir("scaledata")
    ScaleData.run(spark, sfDir, dir, 3)
    dir
  }
  private def t(name: String) = spark.read.parquet(s"$outDir/$name.parquet")

  test("fact tables triple; dimensions stay fixed") {
    def n(name: String) = spark.read.parquet(s"$sfDir/$name.parquet").count()
    assert(t("lineitem").count() == 3 * n("lineitem"))
    assert(t("orders").count() == 3 * n("orders"))
    assert(t("documents").count() == 3 * n("documents"))
    assert(t("region").count() == n("region"))
    assert(t("nation").count() == n("nation"))
  }

  test("every foreign key stays closed within its replica") {
    // orders -> customer
    assert(t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count() == 0)
    // lineitem -> orders / part / supplier
    assert(t("lineitem").join(t("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count() == 0)
    assert(t("lineitem").join(t("part"),
      col("l_partkey") === col("p_partkey"), "left_anti").count() == 0)
    assert(t("lineitem").join(t("supplier"),
      col("l_suppkey") === col("s_suppkey"), "left_anti").count() == 0)
    // customer/supplier -> the FIXED nation dimension
    assert(t("customer").join(t("nation"),
      col("c_nationkey") === col("n_nationkey"), "left_anti").count() == 0)
    assert(t("supplier").join(t("nation"),
      col("s_nationkey") === col("n_nationkey"), "left_anti").count() == 0)
  }

  test("replica key domains are disjoint (no id collides across copies)") {
    Seq(("orders", "o_orderkey"), ("documents", "doc_id"),
      ("embeddings", "vec_id"), ("events", "event_id")).foreach {
      case (name, key) =>
        val df = t(name)
        assert(df.select(key).distinct().count() == df.count(),
          s"$name.$key must stay unique after scaling")
    }
  }
}

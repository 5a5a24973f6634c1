package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Write-time IVF cell partitioning (the 100 TB shape of q51): the probe
  * must be a partition-PRUNED scan and return exactly what the in-query
  * assignment returns for the same centroids / nProbe / query vector. */
class IvfStorageSpec extends SparkSpec {
  import spark.implicits._

  test("cell-partitioned probe prunes partitions and matches q51's results") {
    val dir = tmpDir("ivf-store")
    val e = Tables.embeddings(spark, sfDir)
    val cents = IvfStorage.labelCentroids(e)
    IvfStorage.writeCellPartitioned(e, cents, dir)

    val qVec = e.filter(col("vec_id") === 0).select("embedding")
      .as[Array[Float]].head()
    val probed = IvfStorage.probe(spark, dir, cents, qVec, nProbe = 2, k = 10)
    val rows = probed.collect() // force AQE final plan

    // 1. the scan is pruned: the probed cells land in PartitionFilters
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cast(cent_id") ||
      plan.contains("PartitionFilters: [cent_id"), plan)

    // 2. same semantics as q51's in-query assignment + probe
    val expected = SparkEntry.queries("q51_sim_ann_ivf")(spark, sfDir)
      .select("vec_id").as[Long].collect().toSeq
    assert(rows.map(_.getLong(0)).toSeq == expected)
  }

  test("probing every cell equals the brute-force exact top-k") {
    val dir = tmpDir("ivf-all")
    val e = Tables.embeddings(spark, sfDir)
    val cents = IvfStorage.labelCentroids(e)
    IvfStorage.writeCellPartitioned(e, cents, dir)
    val nCells = cents.count().toInt

    val qVec = e.filter(col("vec_id") === 0).select("embedding")
      .as[Array[Float]].head()
    val all = IvfStorage
      .probe(spark, dir, cents, qVec, nProbe = nCells, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    val brute = SparkEntry.queries("q38_sim_cosine_topk")(spark, sfDir)
      .select("vec_id").as[Long].collect().toSeq
    assert(all == brute, "full-probe IVF must equal exact top-k")
  }

  test("assignment is total and deterministic: every vector lands in exactly one cell") {
    val e = Tables.embeddings(spark, sfDir)
    val cents = IvfStorage.labelCentroids(e)
    val a1 = IvfStorage.assignCells(e, cents).select("vec_id", "cent_id")
    val a2 = IvfStorage.assignCells(e, cents).select("vec_id", "cent_id")
    assert(a1.except(a2).isEmpty)
    assert(a1.count() == e.count())
    assert(a1.filter(col("cent_id") < 0).count() == 0, "no vector unassigned")
  }
}

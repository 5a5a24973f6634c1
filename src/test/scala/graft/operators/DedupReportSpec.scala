package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins [[DedupReport.build]] — the one-pass resolve-and-report operator —
  * row-identical to the independently-declared q66 (assignments) and q79
  * (histogram) pipelines, and internally consistent (summary arithmetic
  * matches the histogram it ships with).
  */
class DedupReportSpec extends SparkSpec {

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("build() assignments ≡ q66, histogram ≡ q79, summary consistent") {
    // collect every derivation FIRST and release promptly: suites share
    // one session and run in parallel, and DedupBucketCapSpec polls the
    // GLOBAL cache manager for emptiness — a long-pinned assignment cache
    // here starves that poll (cost a full-suite failure in round 10)
    val report = DedupReport.build(spark, Tables.documents(spark, sfDir))
    val (a, h, s, keepers, minPerCluster) =
      try (
        report.assignments.collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet,
        // Map, not Set: a Set.map over the pairs would dedupe repeated
        // n_clusters values before any sum below
        report.histogram.collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap,
        report.summary.collect().head,
        report.keepers.filter(col("keep")).collect()
          .map(_.getAs[Long]("doc_id")).toSet,
        report.assignments.groupBy("component")
          .agg(min(col("doc_id")).as("m")).collect()
          .map(_.getAs[Long]("m")).toSet
      ) finally report.release()

    val q66 = q("q66_dedup_components").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == q66, s"assignments drifted: ${(a -- q66).take(3)} / ${(q66 -- a).take(3)}")
    val q79 = q("q79_dedup_cluster_sizes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == q79, s"histogram drifted: $h vs $q79")

    val nDocs = s.getAs[Long]("n_docs")
    val nClusters = s.getAs[Long]("n_clusters")
    val nDups = s.getAs[Long]("n_duplicates")
    assert(nDocs == Tables.documents(spark, sfDir).count())
    // histogram is a partition of the docs: Σ size·count = docs,
    // Σ count = clusters — and the summary must agree with both
    val bySizes = h.iterator.map { case (size, n) => size * n }.sum
    assert(bySizes == nDocs, s"Σ size·count $bySizes != n_docs $nDocs")
    assert(h.values.sum == nClusters)
    assert(nDups == nDocs - nClusters)
    assert(math.abs(s.getAs[Double]("dedup_rate") -
      nDups.toDouble / nDocs) < 1e-12)

    // keepers: exactly one keeper per cluster, keepers are min doc_ids
    assert(keepers.size == nClusters)
    assert(keepers == minPerCluster,
      "a cluster's keeper must be its min doc_id (= the component label)")
  }

  test("release() drops the cached assignment") {
    val report = DedupReport.build(spark, Tables.documents(spark, sfDir))
    assert(report.assignments.storageLevel.useMemory ||
      report.assignments.storageLevel.useDisk)
    report.release()
    assert(!report.assignments.storageLevel.useMemory &&
      !report.assignments.storageLevel.useDisk)
  }
}

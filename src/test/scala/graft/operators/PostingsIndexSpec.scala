package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Pins [[PostingsIndex]]: indexed BM25 is row-identical to q105's inline
  * scoring (same formula, fold order, tie-break), and the postings read is
  * partition-pruned to the queried terms' hash buckets. */
class PostingsIndexSpec extends SparkSpec {

  test("indexed BM25 is row-identical to the inline q105 scoring") {
    val dir = tmpDir("postings")
    PostingsIndex.write(Tables.documents(spark, sfDir), "doc_id", dir)
    val indexed = PostingsIndex.bm25(spark, dir,
      Seq("vector", "merge", "stream"), 20).collect().toSeq
    val inline = SparkEntry.queries("q105_text_bm25")(spark, sfDir)
      .collect().toSeq
    assert(indexed == inline, "indexed scoring must be bit-identical")
  }

  test("a term lookup reads only its hash bucket's partitions") {
    val dir = tmpDir("postings-prune")
    PostingsIndex.write(Tables.documents(spark, sfDir), "doc_id", dir)
    val q = PostingsIndex.bm25(spark, dir, Seq("vector"), 5)
    q.collect()
    def postingsScan(df: DataFrame): FileSourceScanExec = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def walk(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("postings")) => Seq(s)
        case o => (o.children ++ o.subqueries).flatMap(walk)
      }
      walk(df.queryExecution.executedPlan).head
    }
    val scan = postingsScan(q)
    assert(scan.metadata("PartitionFilters").contains("bucket"),
      scan.metadata("PartitionFilters"))
    val filesRead = scan.metrics("numFiles").value
    val all = spark.read.parquet(s"$dir/postings")
    all.collect()
    val totalFiles = postingsScan(all).metrics("numFiles").value
    assert(filesRead < totalFiles,
      s"pruning must skip buckets: read=$filesRead total=$totalFiles")
  }
}

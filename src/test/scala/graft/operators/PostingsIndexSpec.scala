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

  test("indexed phrase lookup is row-identical to the inline q135 computation") {
    val dir = tmpDir("postings-phrase")
    PostingsIndex.write(Tables.documents(spark, sfDir), "doc_id", dir)
    val indexed = PostingsIndex.phrase(spark, dir, Seq("table", "hash"))
      .orderBy("doc_id").collect().toSeq
    val inline = SparkEntry.queries("q135_text_phrase_search")(spark, sfDir)
      .collect().toSeq
    assert(indexed.nonEmpty, "the fixture phrase must occur at sf0.001")
    assert(indexed == inline, "indexed phrase must match inline")
  }

  test("phrase semantics: overlap counting, repeated terms, near-miss adjacency") {
    import spark.implicits._
    val dir = tmpDir("postings-sem")
    val docs = Seq(
      (1L, "x a a a b"),   // "a a" overlaps: occurrences at pos 1 and 2
      (2L, "a b a b"),     // "a b" twice, disjoint
      (3L, "b a"),         // reversed order — must NOT match "a b"
      (4L, "a x b"))       // gap — adjacency required
      .toDF("doc_id", "text")
    PostingsIndex.write(docs, "doc_id", dir)
    def tfs(terms: Seq[String]) =
      PostingsIndex.phrase(spark, dir, terms).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tfs(Seq("a", "a")) == Map(1L -> 2L),
      "overlapping occurrences count (Lucene convention)")
    assert(tfs(Seq("a", "b")) == Map(1L -> 1L, 2L -> 2L),
      "adjacent pairs only; reversed and gapped docs excluded")
    assert(tfs(Seq("a", "a", "a")) == Map(1L -> 1L))
    assert(tfs(Seq("x", "a", "a", "a", "b")) == Map(1L -> 1L),
      "full-document phrase")
  }

  test("indexed proximity is row-identical to inline q139; NEAR semantics pinned") {
    import spark.implicits._
    val dir = tmpDir("postings-prox")
    PostingsIndex.write(Tables.documents(spark, sfDir), "doc_id", dir)
    val indexed = PostingsIndex.proximity(spark, dir, "table", "hash", 5)
      .orderBy("doc_id").collect().toSeq
    val inline = SparkEntry.queries("q139_text_proximity")(spark, sfDir)
      .collect().toSeq
    assert(indexed.nonEmpty && indexed == inline)
    // semantics: any order counts, window is inclusive, min over pairs
    val fix = tmpDir("prox-sem")
    PostingsIndex.write(Seq(
      (1L, "a x x b"),      // dist 3 ≤ 3: within
      (2L, "b x x x a"),    // reversed, dist 4 > 3: out
      (3L, "a b x a"),      // pairs: (0,1)=1, (3,1)=2 → min 1, both ≤ 3
      (4L, "a x x x x b"))  // dist 5 > 3: out
      .toDF("doc_id", "text"), "doc_id", fix)
    val got = PostingsIndex.proximity(spark, fix, "a", "b", 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((3L, 1L)), 3L -> ((1L, 2L))), s"got $got")
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

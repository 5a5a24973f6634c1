package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Both exact τ-Jaccard join strategies must produce identical results. */
class SimilarityJoinSpec extends SparkSpec {

  test("postings-count and prefix-filter strategies agree (τ=0.8, sf0.001)") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), col("source").as("block"),
        TextFunctions.tokenSet(col("text")).as("w"))
    val a = SimilarityJoin.postingsCount(docs, 0.8)
    val b = SimilarityJoin.prefixFilter(docs, 0.8)
    assert(a.count() == b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("prefix-filter is complete at a lower threshold too (τ=0.5)") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), col("source").as("block"),
        TextFunctions.tokenSet(col("text")).as("w"))
    val a = SimilarityJoin.postingsCount(docs, 0.5)
    val b = SimilarityJoin.prefixFilter(docs, 0.5)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}

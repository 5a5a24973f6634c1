package graft.etl

import graft.SparkSpec

/** Lake schema evolution: a long-lived partitioned lake accretes columns
  * over time (new extraction fields, new quality signals). Pins Spark's
  * read-side contract so the pipeline can rely on it: `mergeSchema`
  * unions per-file schemas, pre-evolution rows surface NULL for columns
  * they predate, and compaction of mixed-schema files preserves the
  * merged shape.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unions file schemas; old rows read NULL for new columns") {
    val dir = tmpDir("evolve")
    Seq((1L, "alpha")).toDF("id", "payload")
      .write.mode("append").parquet(dir)
    // v2 of the pipeline adds a quality column
    Seq((2L, "beta", 0.9)).toDF("id", "payload", "quality")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet == Set("id", "payload", "quality"))
    val byId = merged.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("quality")),
      "pre-evolution rows must read NULL for the new column")
    assert(byId(2L).getAs[Double]("quality") == 0.9)

    // without mergeSchema Spark picks one file's schema — the documented
    // reason the ingest readers set the option explicitly
    val unmergedCols = spark.read.parquet(dir).schema.fieldNames.toSet
    assert(unmergedCols == Set("id", "payload") ||
      unmergedCols == Set("id", "payload", "quality"))
  }

  test("compacting a mixed-schema partition keeps the merged shape") {
    val dir = tmpDir("evolve-compact")
    Seq((1L, "alpha")).toDF("id", "payload")
      .write.mode("append").parquet(dir)
    Seq((2L, "beta", 0.9)).toDF("id", "payload", "quality")
      .write.mode("append").parquet(dir)

    // LakeCompaction's bin rewrite sets mergeSchema itself — under the
    // PRODUCTION default (spark.sql.parquet.mergeSchema=false) a
    // mixed-schema bin must still keep every column of every file, or the
    // rewrite would silently destroy the newer columns' data
    val before = spark.read.option("mergeSchema", "true").parquet(dir)
      .select("id", "payload", "quality").collect().toSet
    val report = LakeCompaction.compact(spark, dir, 512L * 1024)
    assert(report.binsRewritten == 1)
    val after = spark.read.option("mergeSchema", "true").parquet(dir)
      .select("id", "payload", "quality").collect().toSet
    assert(after == before)
  }
}

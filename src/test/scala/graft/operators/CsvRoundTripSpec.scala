package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV scan coverage (SURVEY §2B "CSV scan — fixture round-trip test"):
  * parquet → csv → read back with explicit schema ≡ original. */
class CsvRoundTripSpec extends SparkSpec {

  test("lineitem round-trips through CSV (header + explicit schema)") {
    val src = Tables.lineitem(spark, sfDir)
    val out = tmpDir("csv-out")
    src.write.mode("overwrite")
      .option("header", "true").option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(out)
    val back = spark.read
      .schema(src.schema)
      .option("header", "true").option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(out)
    assert(back.count() == src.count())
    val key = Seq("l_orderkey", "l_linenumber")
    assert(back.join(src, key, "left_anti").count() == 0)
    assert(src.join(back, key, "left_anti").count() == 0)
    // value fidelity on a numeric + timestamp column
    val a = src.agg(sum(col("l_extendedprice").cast("decimal(18,2)")),
      max("l_shipdate")).head()
    val b = back.agg(sum(col("l_extendedprice").cast("decimal(18,2)")),
      max("l_shipdate")).head()
    assert(a == b)
  }

  test("lineitem round-trips through ORC (columnar alternative format)") {
    val src = Tables.lineitem(spark, sfDir)
    val out = tmpDir("orc-out")
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
    assert(back.join(src, Seq("l_orderkey", "l_linenumber"), "left_anti").count() == 0)
  }

  test("malformed CSV rows are surfaced, not silently dropped (PERMISSIVE + corrupt column)") {
    val out = tmpDir("csv-bad")
    java.nio.file.Files.write(java.nio.file.Paths.get(out, "bad.csv"),
      "a,b\n1,2\nnot_an_int,3\n4,5".getBytes)
    val schema = StructType.fromDDL("a INT, b INT, _corrupt_record STRING")
    val df = spark.read.schema(schema).option("header", "true")
      .option("columnNameOfCorruptRecord", "_corrupt_record").csv(out)
      .cache() // corrupt-record-only queries require materialization
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    df.unpersist()
  }
}

package graft

import org.apache.spark.sql.types._

/** Session-start regeneration tripwire: the driver regenerates
  * `/root/testdata` every round and has already changed a PHYSICAL
  * parquet type once (events.ts NANOS → MICROS at round 11 — caught only
  * because `Tables.events` branches on the surfaced type). This spec
  * pins the SURFACED schema of every table as seen through the
  * [[Tables]] accessors, so any future regeneration that moves a type
  * fails loudly HERE, in one place, instead of as a scattering of
  * oracle hash mismatches. Timestamp columns must surface as NTZ (the
  * oracle-parity contract: DuckDB reads the same parquet as naive
  * timestamps).
  *
  * If this spec fails after a testdata regeneration: fix the
  * normalization in `Tables.build` (the events.ts branch is the
  * pattern), then update the pinned schema here AND the note in
  * CLAUDE.md.
  */
class TablesSchemaSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampNTZType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  test("every table surfaces the pinned schema through Tables (regeneration tripwire)") {
    assert(Tables.all.toSet == expected.keySet)
    val diffs = Tables.all.flatMap { name =>
      val got = Tables(spark, sfDir, name).schema
        .map(f => f.name -> f.dataType)
      val want = expected(name)
      if (got == want) None
      else Some(s"$name:\n  got  $got\n  want $want")
    }
    assert(diffs.isEmpty,
      "SURFACED SCHEMA CHANGED (driver testdata regeneration?) — fix " +
        "Tables.build normalization, then re-pin here and in CLAUDE.md:\n" +
        diffs.mkString("\n"))
  }

  test("timestamp columns are NTZ everywhere (DuckDB naive-timestamp parity)") {
    for (name <- Tables.all; f <- Tables(spark, sfDir, name).schema)
      assert(f.dataType != TimestampType,
        s"$name.${f.name} surfaced as TIMESTAMP_LTZ — the oracle contract " +
          "requires NTZ (see operators/package.scala docs)")
  }
}

package graft

/** Pins the driver-testdata schemas (FIXTURES.md §B) — if the fixtures drift
  * between rounds, this fails loudly instead of queries mis-parsing. */
class TablesSchemaSpec extends SparkSpec {

  private val expected = Map(
    "region" -> "r_regionkey int, r_name string",
    "nation" -> "n_nationkey int, n_name string, n_regionkey int",
    "customer" -> "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    "supplier" -> "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    "part" -> "p_partkey bigint, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    "orders" -> "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    "lineitem" -> "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, l_quantity double, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp_ntz",
    "events" -> "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, value double, props string",
    "documents" -> "doc_id bigint, text string, lang string, source string, n_chars bigint",
    "embeddings" -> "vec_id bigint, embedding array<float>, label int")

  Tables.all.foreach { name =>
    test(s"$name schema matches FIXTURES.md") {
      val got = Tables(spark, sfDir, name).schema.fields
        .map(f => s"${f.name} ${f.dataType.simpleString}").mkString(", ")
      assert(got.toLowerCase == expected(name).toLowerCase, s"\ngot:      $got")
    }
  }

  test("embedding dimension is 64 (pins the oracle fragments that can't derive len())") {
    // q48/q54 oracles use generate_series(1, 64) — DuckDB's generate_series
    // takes no lateral column refs, so the bound can't derive from len().
    // This pin makes a fixture-dimension change fail loudly instead of
    // letting those oracles compute silently-wrong expected values.
    import org.apache.spark.sql.functions._
    val dims = Tables(spark, sfDir, "embeddings")
      .select(size(col("embedding")).as("d")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(dims == Set(64), s"embedding dims: $dims")
  }
}

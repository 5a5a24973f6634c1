package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** keyword_overlap native expression: pinned against the interpreted HOF it
  * replaces and the matching DuckDB-oracle semantics (repeats counted). */
class KeywordOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("native == interpreted filter/isin, repeats counted, empty/edge inputs") {
    val words = Seq("the", "a", "of")
    val docs = Seq(
      "the cat sat on the mat",
      "a a a",
      "no stopwords here",
      "",
      "of")
      .toDF("text").withColumn("toks", split(lower(col("text")), " "))
    val rows = docs.select(
      call_function("keyword_overlap", col("toks"),
        array(words.map(lit): _*)).as("native"),
      size(filter(col("toks"), t => t.isin(words.map(lit): _*))).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 3, 0, 0, 1))
  }

  test("interpreted (non-codegen) eval path matches codegen") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val r = Seq("the cat of a hat").toDF("text")
        .withColumn("toks", split(col("text"), " "))
        .select(call_function("keyword_overlap", col("toks"),
          array(lit("the"), lit("a"), lit("of")))).collect().head
      assert(r.getInt(0) == 3)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null token array yields null, not a crash") {
    val df = Seq(Tuple1(Option.empty[Seq[String]])).toDF("toks")
    val r = df.select(call_function("keyword_overlap", col("toks"),
      array(lit("x")))).collect().head
    assert(r.isNullAt(0))
  }

  test("NULL word list yields null on BOTH eval paths (codegen parity)") {
    def run(): org.apache.spark.sql.Row =
      Seq("a b").toDF("text").withColumn("toks", split(col("text"), " "))
        .select(call_function("keyword_overlap", col("toks"),
          lit(null).cast("array<string>"))).collect().head
    assert(run().isNullAt(0))
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run().isNullAt(0))
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("non-literal word list is rejected at analysis") {
    val df = Seq((Seq("a"), Seq("a"))).toDF("toks", "words")
    val e = intercept[Exception](
      df.select(call_function("keyword_overlap", col("toks"), col("words"))).collect())
    assert(e.getMessage.toLowerCase.contains("foldable"))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosineNative
import graft.operators.{ConnectedComponents, IvfStorage}

// temporary profiling harness — not part of the library
object Scratch {
  def t[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime(); val r = body
    println(s"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.withGraftConfs(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    import graft.operators.DedupReport
    import graft.Tables
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, d)
    t("construct+cc") { DedupReport.assignComponents(spark, docs, 0.8) }
    val comp1 = DedupReport.assignComponents(spark, docs, 0.8)
    t("q66 tail: comp.orderBy.count") { comp1.orderBy("doc_id").count() }
    val comp2 = DedupReport.assignComponents(spark, docs, 0.8)
    val scored = docs.select(col("doc_id"),
      size(array_distinct(split(lower(col("text")), " "))).cast("long").as("n_vocab"))
    val w = Window.partitionBy("component").orderBy(col("n_vocab").desc, col("doc_id").asc)
    val joined = comp2.join(scored, "doc_id")
      .withColumn("rk", row_number().over(w))
      .withColumn("canonical_id", first(col("doc_id")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("component"), col("n_vocab"),
        (col("rk") === 1).as("keep"), col("canonical_id"))
      .orderBy("doc_id")
    t("q154 tail: join+windows.count") { joined.count() }
    spark.stop()
  }
}

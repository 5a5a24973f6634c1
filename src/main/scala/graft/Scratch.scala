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
    spark.range(1000).selectExpr("sum(id)").collect()
    val e = Tables.embeddings(spark, d)
      .filter(size(col("embedding")) === 64 && !exists(col("embedding"), x => x.isNull))
    val cents = IvfStorage.labelCentroids(e)
    val assigned = IvfStorage.assignCells(e, cents)
      .select(col("vec_id"), col("embedding"), col("cent_id")).persist()
    t("assign")(assigned.count())
    val a = assigned.select(col("vec_id").as("a_id"), col("cent_id"), col("embedding").as("a_emb"))
    val b = assigned.select(col("vec_id").as("b_id"), col("cent_id").as("b_cent"), col("embedding").as("b_emb"))
    val pairs = a.join(b, col("cent_id") === col("b_cent") && col("a_id") < col("b_id"))
      .filter(cosineNative(col("a_emb"), col("b_emb")) >= 0.35)
      .select(col("a_id").as("a"), col("b_id").as("b")).persist()
    t("pairs")(println("[scratch] n_pairs=" + pairs.count()))
    println("[scratch] cells=" + assigned.groupBy("cent_id").count().orderBy(desc("count")).collect().take(5).mkString(","))
    t("cc")(ConnectedComponents.run(pairs).count())
    t("cc2")(ConnectedComponents.run(pairs).count())
  }
}

package graft.plans

// scratch A/B: native LSH signature kernel vs interpreted SQL twin, plus the
// full q43/q70 pipelines, interleaved in one JVM. Run with:
//   sbt -batch "Test/runMain graft.plans.LshAbScratch"
// DELETE before committing.
object LshAbScratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(cores = 32, shufflePartitions = 32,
      appName = "lsh-ab")
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.lshSigNative
    val e = graft.Tables.embeddings(spark, d)

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[ab] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warmup
    e.count()
    (1 to 3).foreach { r =>
      time(s"sig twin   r$r") {
        e.select(expr(graft.operators.VectorQueries.lshSigExpr("embedding")).as("s"))
          .agg(sum("s")).collect()
      }
      time(s"sig native r$r") {
        e.select(lshSigNative(col("embedding")).as("s"))
          .agg(sum("s")).collect()
      }
      time(s"q43 full   r$r") {
        graft.SparkEntry.queries("q43_sim_ann_lsh")(spark, d).collect()
      }
      time(s"q70 full   r$r") {
        graft.SparkEntry.queries("q70_dedup_embedding_ann")(spark, d).collect()
      }
    }
    spark.stop()
  }
}

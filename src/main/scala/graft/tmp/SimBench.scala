package graft.tmp
import graft.{GraftSession, SparkEntry}
object SimBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(s"GRAFTMEAS $label rows=$n sec=${(System.nanoTime()-t0)/1e9}")
    }
    val qs = SparkEntry.queries
    // interleaved repetitions in ONE JVM: round-robin so host noise hits all
    // labels equally
    for (rep <- 1 to 3; name <- Seq("q37_dedup_jaccard", "q66_dedup_components",
        "q67_dedup_ngram_jaccard", "q69_dedup_embedding_cosine"))
      time(s"$name#$rep")(qs(name)(spark, d).count())
    spark.stop()
  }
}

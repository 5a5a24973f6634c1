package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line `{"metric":"total","value":N,"unit":"sec",
  * "queries":{name:sec,…},"rows":{name:n,…},"errors":{name:class,…},"sf":…}`.
  *
  * Honesty contract: a query that throws is excluded from `queries`/`value`
  * and recorded under `errors` instead (a crash must never read as a fast
  * run), and `rows` carries each query's result count so a silently-empty
  * result can't look like a fast full one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.withGraftConfs(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/IO paths so the first measured query isn't charged
    // for session initialization
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // SPARK_GRAFT_ONLY=q37_dedup_jaccard,q66_dedup_components restricts the
    // run for A/B iteration; unset (the driver's mode) runs everything
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val outcome =
        try Right(fn(spark, sfDir).count())
        catch { case e: Throwable => Left(e.getClass.getSimpleName) }
      (name, (System.nanoTime() - t0) / 1e9, outcome)
    }
    def obj(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val ok = results.collect { case (n, sec, Right(rows)) => (n, sec, rows) }
    val failed = results.collect { case (n, _, Left(err)) => (n, err) }
    val qs = obj(ok.map { case (n, sec, _) => n -> sec.toString })
    val rows = obj(ok.map { case (n, _, r) => n -> r.toString })
    val errors = obj(failed.map { case (n, e) => n -> s""""$e"""" })
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rows,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}

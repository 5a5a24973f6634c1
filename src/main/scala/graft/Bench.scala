package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR and
  * prints TWO JSON lines: first a full detail line `{"metric":"total",
  * "value":N,"unit":"sec","queries":{name:sec,…},"rows":{name:n,…},
  * "errors":{name:class,…},"sf":…}`, then a COMPACT summary line (same
  * shape, `queries` restricted to a fixed headline subset) guaranteed to
  * fit inside a 2 KB output-tail capture. Rounds 1–11 proved the driver
  * keeps only the last ~2000 chars of stdout: the 158-query detail line
  * is ~10 KB, so every round's `BENCH_r{N}.json` came back `parsed:
  * null` with a mid-line tail. The compact line is printed LAST so any
  * tail window ends with one complete, parseable JSON object.
  *
  * Honesty contract: a query that throws is excluded from `queries`/`value`
  * and recorded under `errors` instead (a crash must never read as a fast
  * run), and `rows` carries each query's result count so a silently-empty
  * result can't look like a fast full one. The compact line carries
  * `nq`/`nerr` so a partial run can't read as a full one.
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
    // Compact summary, printed last: headline queries only, 3-decimal
    // seconds, no rows map — stays well under a 2000-char tail window.
    val headline = Seq(
      "q01_scan_project", "q05_join_inner", "q13_agg_hash", "q17_win_rank",
      "q19_sort_limit", "q29_stream_tumbling", "q37_dedup_jaccard",
      "q41b_dedup_minhash_md5", "q66_dedup_components", "q74_dedup_containment",
      "q100_bpe_encode", "q104_dedup_semantic_cells", "q110_dsir_importance",
      "q126_classifier_quality", "q129_graph_pagerank", "q133_graph_triangles",
    ).toSet
    val qsShort = obj(ok.collect { case (n, sec, _) if headline(n) =>
      n -> f"$sec%.3f" })
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","nq":${ok.size},"nerr":${failed.size},"queries":$qsShort,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round per-job profiler: runs each named query once (count()
  * action, the Bench methodology) with a SparkListener attached and prints,
  * per Spark JOB, wall seconds, summed task time, shuffle read/write bytes
  * and input bytes — the structural evidence wall-clock A/Bs on a noisy
  * host cannot give (the guide's §1 empirical loop without a UI: this
  * sandbox runs spark.ui.enabled=false). Job rows attribute compose-time
  * actions (adaptive sizing counts, driver collects) to the query that
  * issued them, which is exactly what per-query bench seconds hide.
  *
  * Usage: runMain graft.ProfileQuery <sfDir> <query> [query…]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, queries @ _*) = args
    require(queries.nonEmpty, "ProfileQuery: name at least one query")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.withGraftConfs(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup (the Bench preamble)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    case class JobAgg(var start: Long = 0L, var end: Long = 0L,
      var taskMs: Long = 0L, var shufRead: Long = 0L, var shufWrite: Long = 0L,
      var input: Long = 0L, var tasks: Int = 0, var desc: String = "",
      var gcMs: Long = 0L, var deserMs: Long = 0L, var cpuMs: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobAgg]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val a = new JobAgg(start = j.time)
        a.desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(j.jobId, a)
        j.stageIds.foreach(sid => stageToJob.put(sid, j.jobId))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val a = jobs.get(j.jobId); if (a != null) a.end = j.time
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val jid = stageToJob.get(t.stageId)
        val a = jobs.get(jid)
        if (a != null && t.taskMetrics != null) a.synchronized {
          a.taskMs += t.taskMetrics.executorRunTime
          a.shufRead += t.taskMetrics.shuffleReadMetrics.totalBytesRead
          a.shufWrite += t.taskMetrics.shuffleWriteMetrics.bytesWritten
          a.input += t.taskMetrics.inputMetrics.bytesRead
          a.gcMs += t.taskMetrics.jvmGCTime
          a.deserMs += t.taskMetrics.executorDeserializeTime
          a.cpuMs += t.taskMetrics.executorCpuTime / 1000000L
          a.tasks += 1
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    queries.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      // run 1 warms session JIT/codegen (a cold session charges ~0.5 s of
      // interpreter-mode blocking to EVERY task of the first queries —
      // measured on q01/q13); run 2 is the reported, representative one.
      // run 1's wall is printed too: (run1 − run2) bounds the one-time
      // memo/fixture build cost for session-memoized queries.
      // SPARK_GRAFT_PROFILE_COLD=1 skips the warmup run and profiles the
      // FIRST invocation — the way to attribute a session-memoized
      // fixture/memo build's jobs (they only run once per session)
      val cold = sys.env.get("SPARK_GRAFT_PROFILE_COLD").contains("1")
      val run1 = if (cold) 0.0 else {
        val w0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - w0) / 1e9
      }
      jobs.clear(); stageToJob.clear()
      spark.sparkContext.setJobDescription(s"profile:$name")
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      Thread.sleep(300) // let listener events drain
      import scala.jdk.CollectionConverters._
      val rows = jobs.asScala.toSeq.sortBy(_._1)
      println(f"== $name rows=$n wall=$wall%.2fs run1=$run1%.2fs " +
        f"jobs=${rows.size}")
      rows.foreach { case (id, a) =>
        println(f"  job $id%3d wall=${(a.end - a.start) / 1e3}%7.2fs " +
          f"task=${a.taskMs / 1e3}%8.2fs tasks=${a.tasks}%4d " +
          f"cpu=${a.cpuMs / 1e3}%7.2fs gc=${a.gcMs / 1e3}%6.2fs " +
          f"deser=${a.deserMs / 1e3}%6.2fs " +
          f"in=${a.input / 1e6}%8.1fMB sr=${a.shufRead / 1e6}%8.1fMB " +
          f"sw=${a.shufWrite / 1e6}%8.1fMB")
      }
    }
    spark.stop()
  }
}

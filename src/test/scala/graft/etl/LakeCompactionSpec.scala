package graft.etl

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Pins [[LakeCompaction]]: row-identical content, file-count collapse,
  * deterministic output names, idempotent re-run, target-size binning,
  * and partition-column preservation through the rewrite.
  */
class LakeCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def smallFileLake(appends: Int): String = {
    val dir = tmpDir("lake")
    (0 until appends).foreach { b =>
      (1 to 20).map(i => (b * 100 + i, s"v$b-$i", i % 3))
        .toDF("id", "payload", "p")
        .repartition(1)
        .write.mode("append").partitionBy("p").parquet(dir)
    }
    dir
  }

  private def dataFiles(dir: String): Seq[Path] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = Seq.newBuilder[Path]
    def walk(d: Path): Unit = fs.listStatus(d).foreach { st =>
      if (st.isDirectory) {
        if (!st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith(".")) walk(st.getPath)
      } else if (!st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".")) out += st.getPath
    }
    walk(root)
    out.result()
  }

  test("compaction collapses per-partition small files without changing content") {
    val dir = smallFileLake(appends = 5)
    val before = spark.read.parquet(dir).collect().toSet
    assert(dataFiles(dir).size == 15, "5 appends × 3 partitions")

    val report = LakeCompaction.compact(spark, dir, targetBytes = 512L * 1024)
    assert(report.partitions == 3 && report.binsRewritten == 3)
    assert(report.filesBefore == 15 && report.filesAfter == 3)

    val files = dataFiles(dir)
    assert(files.size == 3, s"one compacted file per partition, got $files")
    assert(files.forall(_.getName.startsWith("compact-")))
    val after = spark.read.parquet(dir).collect().toSet
    assert(after == before, "compaction must not change table content")
    assert(spark.read.parquet(dir).select("p").distinct().count() == 3,
      "partition column must survive (derived from dir names)")
  }

  test("a second run over a compacted lake plans nothing") {
    val dir = smallFileLake(appends = 3)
    LakeCompaction.compact(spark, dir, targetBytes = 512L * 1024)
    val second = LakeCompaction.compact(spark, dir, targetBytes = 512L * 1024)
    assert(second.binsRewritten == 0 && second.partitions == 0)
  }

  test("target size splits a partition into multiple bins; lone leftovers stay") {
    val dir = smallFileLake(appends = 5)
    val perFile = dataFiles(dir).map { p =>
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getLen
    }.max
    // room for exactly 2 source files per bin → 5 files = 2+2+1: two bins
    // rewritten per partition, the 5th file left alone (already compact)
    val before = spark.read.parquet(dir).collect().toSet
    val report = LakeCompaction.compact(spark, dir, targetBytes = perFile * 2)
    assert(report.binsRewritten == 6, s"2 bins × 3 partitions: $report")
    val counts = dataFiles(dir).groupBy(_.getParent.getName)
      .view.mapValues(_.size).toMap
    assert(counts.values.forall(_ == 3), s"2 compacted + 1 leftover: $counts")
    assert(spark.read.parquet(dir).collect().toSet == before)
  }

  test("compacts the streaming FileSink's job_start lake in place") {
    // 4 micro-batches through the real sink: each batch commits its own
    // batch-<id>-* file per touched partition — the exact small-file
    // accumulation a 60 s trigger produces over a day
    def line(i: Int): String =
      s"""{"vendor_id": 1, "pickup_datetime": "2018-11-0${i % 9 + 1}T10:00:00.000Z",
         | "dropoff_datetime": "2018-11-0${i % 9 + 1}T11:00:00.000Z",
         | "passenger_count": 1, "trip_distance": 1.5, "ratecode_id": 1,
         | "store_and_fwd_flag": "N", "pickup_location_id": ${i % 3 + 1},
         | "dropoff_location_id": 5, "payment_type": 1, "fare_amount": 10.0,
         | "extra": 0.0, "mta_tax": 0.5, "tip_amount": 1.0, "tolls_amount": 0.0,
         | "improvement_surcharge": 0.3, "total_amount": 11.8,
         | "trip_id": ${1000 + i}, "type": "trip"}""".stripMargin
        .replaceAll("\n", "")
    val out = tmpDir("lake-etl")
    val sink = new graft.streaming.FileSink(out, parquet = true)
    (0 until 4).foreach { b =>
      val events = TripEventCodec.parse(
        (0 until 12).map(i => line(b * 12 + i)).toDF("value"),
        org.apache.spark.sql.functions.col("value"))
      sink.write(events, batchId = b)
    }
    val before = spark.read.parquet(sink.prefix).collect().toSet
    assert(dataFiles(sink.prefix).size == 12, "4 batches × 3 partitions")

    val report = LakeCompaction.compact(spark, sink.prefix, 512L * 1024)
    assert(report.binsRewritten == 3 && report.filesBefore == 12)
    assert(dataFiles(sink.prefix).size == 3)
    assert(spark.read.parquet(sink.prefix).collect().toSet == before,
      "compaction must preserve the sink's rows and partition values")
  }

  test("planning never descends into _temporary or dot dirs (crashed-write debris is untouchable)") {
    val dir = smallFileLake(appends = 2)
    // simulate a crashed concurrent write: uncommitted task-attempt files
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir, "_temporary/0/attempt_1/p=0")
    fs.mkdirs(tmp)
    (1 to 2).map(i => (900 + i, s"uncommitted$i", 0))
      .toDF("id", "payload", "p").repartition(1)
      .write.mode("overwrite").parquet(new Path(tmp, "stage").toString)
    val debris = dataFiles(new Path(dir, "_temporary").toString).toSet
    assert(debris.nonEmpty, "fixture must contain uncommitted files")

    val planned = LakeCompaction.plan(spark, dir, 512L * 1024)
    assert(!planned.exists(_.partitionDir.contains("_temporary")),
      s"plan must not touch _temporary: $planned")
    LakeCompaction.compact(spark, dir, 512L * 1024)
    assert(dataFiles(new Path(dir, "_temporary").toString).toSet == debris,
      "compaction must leave crashed-write debris exactly as found")
  }

  test("sortBy clusters the rewritten file (row-group stats become selective)") {
    val dir = smallFileLake(appends = 4)
    val before = spark.read.parquet(dir).collect().toSet
    LakeCompaction.compact(spark, dir, 512L * 1024, sortBy = Seq("id"))
    assert(spark.read.parquet(dir).collect().toSet == before,
      "clustering must not change the row set")
    // every compacted file is internally sorted on the cluster column
    dataFiles(dir).foreach { f =>
      val ids = spark.read.parquet(f.toString).select("id")
        .collect().map(_.getInt(0)).toSeq
      assert(ids == ids.sorted, s"file $f not clustered on id")
    }
  }

  test("packBins invariants hold on random size distributions") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(30)
      val target = 1L + rnd.nextInt(5000)
      val files = (0 until n).map(i => (f"f$i%03d", rnd.nextInt(3000).toLong + 1))
      val bins = LakeCompaction.packBins(files, target)
      // every bin: ≥ 2 files, fits the target, order-preserving slice
      bins.foreach { b =>
        assert(b.length >= 2, s"bin of ${b.length}: $b (target $target)")
        assert(b.map(_._2).sum <= target, s"bin over target $target: $b")
        val idx = b.map(f => files.indexOf(f))
        assert(idx == (idx.head until idx.head + b.length),
          s"bin must be a contiguous input slice: $b")
      }
      // bins are disjoint and drawn from the input
      val all = bins.flatten
      assert(all.distinct.size == all.size && all.toSet.subsetOf(files.toSet))
      // determinism
      assert(LakeCompaction.packBins(files, target) == bins)
    }
  }

  test("output names are deterministic functions of the inputs") {
    val dir = smallFileLake(appends = 3)
    val planned = LakeCompaction.plan(spark, dir, 512L * 1024)
    val names = planned.map(b => b.partitionDir -> b.outputName).toMap
    val again = LakeCompaction.plan(spark, dir, 512L * 1024)
    assert(again.map(b => b.partitionDir -> b.outputName).toMap == names)
    assert(names.values.forall(_.matches("compact-[0-9a-f]{12}\\.parquet")))
  }

  // ---- manifest-aware protocol (FileStreamSink lakes) ----

  /** A real FileStreamSink lake: one micro-batch per addData call, each
    * committing its part files to `_spark_metadata`. Returns (lake, ckpt). */
  private def sinkLake(batches: Int): (String, String) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val lake = tmpDir("mlake")
    val ckpt = tmpDir("mlake-ckpt")
    val mem = MemoryStream[(Int, String, Int)]
    val q = mem.toDS().toDF("id", "payload", "p")
      .writeStream.format("parquet")
      .option("path", lake).option("checkpointLocation", ckpt)
      .partitionBy("p")
      .outputMode("append").start()
    try {
      (0 until batches).foreach { b =>
        mem.addData((1 to 10).map(i => (b * 100 + i, s"v$b-$i", i % 2)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    (lake, ckpt)
  }

  test("manifest lake compacts in place: identical reads, fewer files, manifest authoritative") {
    val (lake, _) = sinkLake(batches = 4)
    val before = spark.read.parquet(lake).collect().toSet
    val filesBefore = dataFiles(lake).size
    val report = LakeCompaction.compact(spark, lake, 512L * 1024, allowManifested = true)
    assert(report.binsRewritten >= 2, s"both partitions should compact: $report")
    assert(spark.read.parquet(lake).collect().toSet == before,
      "post-compaction reads must be identical")
    // vacuum reclaimed the originals — only the compacted files remain
    val remaining = dataFiles(lake)
    assert(remaining.size < filesBefore && remaining.size == report.binsRewritten,
      s"$filesBefore → ${remaining.size} files, expected ${report.binsRewritten}")
    assert(remaining.forall(_.getName.startsWith("compact-")))
    // readers go through the manifest, not directory listing: an alien
    // file dropped into a partition dir must stay invisible
    val alien = new Path(s"$lake/p=0/alien.parquet")
    val alienDir = tmpDir("alien-src")
    Seq((999, "alien", 0)).toDF("id", "payload", "p").drop("p")
      .coalesce(1).write.mode("overwrite").parquet(alienDir)
    val fs = alien.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(dataFiles(alienDir).head, alien)
    assert(spark.read.parquet(lake).collect().toSet == before,
      "manifest readers must not see unreferenced files")
    // a second run plans nothing (idempotence at the manifest level)
    val again = LakeCompaction.compact(spark, lake, 512L * 1024, allowManifested = true)
    assert(again.binsRewritten == 0, s"re-run must be a no-op: $again")
  }

  test("kill between data rename and manifest swap leaves the table on its originals; re-run completes") {
    val (lake, _) = sinkLake(batches = 3)
    val before = spark.read.parquet(lake).collect().toSet
    val filesBefore = dataFiles(lake).filterNot(_.getName.startsWith("compact-")).size
    LakeCompaction.testFailpointBeforeManifestCommit =
      () => throw new RuntimeException("injected kill before manifest commit")
    try {
      val killed = intercept[RuntimeException] {
        LakeCompaction.compact(spark, lake, 512L * 1024, allowManifested = true)
      }
      assert(killed.getMessage.contains("injected kill"))
    } finally LakeCompaction.testFailpointBeforeManifestCommit = () => ()
    // the compacted files exist on disk but the manifest never switched:
    // readers still see the ORIGINAL files, exactly once
    assert(dataFiles(lake).exists(_.getName.startsWith("compact-")),
      "the kill happened after the data renames")
    assert(spark.read.parquet(lake).collect().toSet == before,
      "a kill before the manifest swap must leave reads untouched")
    val originalsLeft = dataFiles(lake).filterNot(_.getName.startsWith("compact-")).size
    assert(originalsLeft == filesBefore, "no original may be deleted before the swap")
    // re-run: overwrites its own leftovers, commits, vacuums
    val report = LakeCompaction.compact(spark, lake, 512L * 1024, allowManifested = true)
    assert(report.binsRewritten >= 1)
    assert(spark.read.parquet(lake).collect().toSet == before)
    assert(dataFiles(lake).forall(_.getName.startsWith("compact-")),
      "after the commit the originals are vacuumed")
  }

  test("the sink resumes cleanly after a manifest compaction: next batch lands, nothing skipped") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.StructType
    // a file-arrival source (MemoryStream offsets don't survive a restart)
    val src = tmpDir("mlake-src")
    val lake = tmpDir("mlake2")
    val ckpt = tmpDir("mlake2-ckpt")
    val schema = StructType.fromDDL("id INT, payload STRING, p INT")
    def land(b: Int): Unit =
      (1 to 10).map(i => (b * 100 + i, s"v$b-$i", i % 2))
        .toDF("id", "payload", "p")
        .coalesce(1).write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1) // one source file per micro-batch
        .parquet(src)
        .writeStream.format("parquet")
        .option("path", lake).option("checkpointLocation", ckpt)
        .partitionBy("p")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    (0 until 3).foreach(land)
    runOnce()
    val before = spark.read.parquet(lake).collect().toSet
    LakeCompaction.compact(spark, lake, 512L * 1024, allowManifested = true)
    // resume with the same checkpoint: the manifest swap wrote AT the
    // log's latest batch id, never beyond it, so the sink's next addBatch
    // still exceeds the log's latest and the new rows are NOT skipped
    land(9)
    runOnce()
    val after = spark.read.parquet(lake).collect().toSet
    assert(after.size == before.size + 10,
      s"resumed batch must land: ${before.size} → ${after.size}")
    assert(before.subsetOf(after), "compacted history must survive the resume")
  }

  test("a lake whose sink already wrote its own compact files stays readable (interval repair)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    // force the sink to compact its log every 5 batches: 7 batches write
    // log files 0,1,2,3,4.compact,5,6. A graft snapshot at the latest
    // batch id (6) beside the sink's 4.compact is the POISON pair: Spark
    // derives its interval from the DIFFERENCE of the two newest compacts
    // (6−4 = 2), 7 % 2 ≠ 0 makes batch 6 an invalid compaction position,
    // and every subsequent allFiles() throws looking for a 5.compact that
    // never existed. The protocol must end with EXACTLY ONE compact file
    // and identical reads.
    spark.conf.set("spark.sql.streaming.fileSink.log.compactInterval", "5")
    val lake = tmpDir("mlake3")
    val ckpt = tmpDir("mlake3-ckpt")
    try {
      val mem = MemoryStream[(Int, String, Int)]
      val q = mem.toDS().toDF("id", "payload", "p")
        .writeStream.format("parquet")
        .option("path", lake).option("checkpointLocation", ckpt)
        .partitionBy("p")
        .outputMode("append").start()
      try {
        (0 until 7).foreach { b =>
          mem.addData((1 to 6).map(i => (b * 100 + i, s"v$b-$i", i % 2)): _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      val fs = new Path(lake).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val meta = new Path(lake, "_spark_metadata")
      def compacts() = fs.listStatus(meta).map(_.getPath.getName)
        .filter(_.endsWith(".compact")).sorted.toSeq
      assert(compacts().nonEmpty, "precondition: the sink compacted its own log")
      val before = spark.read.parquet(lake).collect().toSet
      val report = LakeCompaction.compact(spark, lake, 512L * 1024, allowManifested = true)
      assert(report.binsRewritten >= 1)
      // single-compact invariant restored at the latest batch id (6)
      assert(compacts() == Seq("6.compact"), s"compact files: ${compacts()}")
      assert(spark.read.parquet(lake).collect().toSet == before,
        "reads must be identical through the repaired manifest")
      // the sink log itself parses cleanly — this is the exact call that
      // throws IllegalStateException when a misaligned compact pair
      // corrupts the derived interval
      import org.apache.spark.sql.execution.streaming.sinks.FileStreamSinkLog
      val log = new FileStreamSinkLog(FileStreamSinkLog.VERSION, spark,
        meta.toString)
      assert(log.allFiles().nonEmpty) // not throwing IS the assertion
      assert(log.getLatestBatchId().contains(6L))
    } finally
      spark.conf.unset("spark.sql.streaming.fileSink.log.compactInterval")
  }

  test("compacting one partition dir of a manifest lake rewrites just that subtree") {
    val (lake, _) = sinkLake(batches = 3)
    val before = spark.read.parquet(lake).collect().toSet
    val p1Before = dataFiles(s"$lake/p=1").size
    val report = LakeCompaction.compact(spark, s"$lake/p=0", 512L * 1024, allowManifested = true)
    assert(report.binsRewritten == 1, s"one bin for the one partition: $report")
    assert(spark.read.parquet(lake).collect().toSet == before)
    assert(dataFiles(s"$lake/p=0").size == 1, "p=0 collapsed to one file")
    assert(dataFiles(s"$lake/p=1").size == p1Before, "p=1 untouched")
  }

  test("manifested compaction refuses without the allowManifested attestation") {
    val (lake, _) = sinkLake(batches = 2)
    val before = spark.read.parquet(lake).collect().toSet
    val filesBefore = dataFiles(lake).size
    val e = intercept[IllegalArgumentException] {
      LakeCompaction.compact(spark, lake, 512L * 1024)
    }
    assert(e.getMessage.contains("allowManifested"), e.getMessage)
    // fail-safe means NOTHING moved: same files, same reads
    assert(dataFiles(lake).size == filesBefore)
    assert(spark.read.parquet(lake).collect().toSet == before)
  }

  test("manifested compaction refuses while the sink is live, even with the flag") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val lake = tmpDir("mlake-live")
    val ckpt = tmpDir("mlake-live-ckpt")
    val mem = MemoryStream[(Int, String, Int)]
    val q = mem.toDS().toDF("id", "payload", "p")
      .writeStream.format("parquet")
      .option("path", lake).option("checkpointLocation", ckpt)
      .partitionBy("p")
      .outputMode("append").start()
    try {
      (0 until 2).foreach { b =>
        mem.addData((1 to 10).map(i => (b * 100 + i, s"v$b-$i", i % 2)): _*)
        q.processAllAvailable()
      }
      val e = intercept[IllegalArgumentException] {
        LakeCompaction.compact(spark, lake, 512L * 1024,
          allowManifested = true)
      }
      assert(e.getMessage.contains("actively writing"), e.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        LakeCompaction.vacuumUnreferenced(spark, lake)
      }
      assert(e2.getMessage.contains("actively writing"), e2.getMessage)
    } finally q.stop()
    // stopped sink: the same call goes through
    val report = LakeCompaction.compact(spark, lake, 512L * 1024,
      allowManifested = true)
    assert(report.binsRewritten >= 1, s"post-stop compaction must run: $report")
  }

  test("a healthy multi-compact sink log survives a no-op maintenance run untouched") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    // interval 3 over 8 batches → the sink's OWN compacts at 2.compact and
    // 5.compact, a perfectly healthy pair (difference = true interval)
    spark.conf.set("spark.sql.streaming.fileSink.log.compactInterval", "3")
    val lake = tmpDir("mlake-noop")
    val ckpt = tmpDir("mlake-noop-ckpt")
    try {
      val mem = MemoryStream[(Int, String, Int)]
      val q = mem.toDS().toDF("id", "payload", "p")
        .writeStream.format("parquet")
        .option("path", lake).option("checkpointLocation", ckpt)
        .partitionBy("p")
        .outputMode("append").start()
      try {
        (0 until 8).foreach { b =>
          mem.addData((1 to 6).map(i => (b * 100 + i, s"v$b-$i", i % 2)): _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      val fs = new Path(lake).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val meta = new Path(lake, "_spark_metadata")
      def compacts() = fs.listStatus(meta).map(_.getPath.getName)
        .filter(_.endsWith(".compact")).sorted.toSeq
      val healthy = compacts()
      assert(healthy.size >= 2, s"precondition: sink-written compacts: $healthy")
      // targetBytes = 1 → every bin degenerates to a single file → zero
      // bins planned → nominally read-only run
      val report = LakeCompaction.compact(spark, lake, 1L,
        allowManifested = true)
      assert(report.binsRewritten == 0 && !report.manifestRepaired, s"$report")
      assert(compacts() == healthy,
        "a no-op maintenance run must not rewrite the sink's log")
    } finally
      spark.conf.unset("spark.sql.streaming.fileSink.log.compactInterval")
  }

  test("a kill-stranded compact pair heals on demand and the Report says so") {
    val (lake, _) = sinkLake(batches = 4)
    val before = spark.read.parquet(lake).collect().toSet
    LakeCompaction.compact(spark, lake, 512L * 1024, allowManifested = true)
    val fs = new Path(lake).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = new Path(lake, "_spark_metadata")
    val snapshot = fs.listStatus(meta).map(_.getPath)
      .filter(_.getName.endsWith(".compact")).head
    // simulate the kill window between graft's snapshot rename and its
    // older-compact cleanup: an OLDER compact beside the snapshot whose
    // difference is a bogus interval (3.compact next to 3+?.compact)
    val stale = new Path(meta, "0.compact")
    org.apache.hadoop.fs.FileUtil.copy(fs, snapshot, fs, stale, false,
      spark.sparkContext.hadoopConfiguration)
    val report = LakeCompaction.compact(spark, lake, 512L * 1024,
      allowManifested = true)
    assert(report.manifestRepaired,
      s"the heal must be surfaced to the operator: $report")
    val left = fs.listStatus(meta).map(_.getPath.getName)
      .filter(_.endsWith(".compact")).toSeq
    assert(left == Seq(snapshot.getName), s"single-compact restored: $left")
    assert(spark.read.parquet(lake).collect().toSet == before,
      "reads must be identical through the healed manifest")
  }
}

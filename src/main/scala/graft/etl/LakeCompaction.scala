package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for the partitioned parquet lake the streaming
  * [[graft.streaming.FileSink]] produces (reference layout
  * `job_start=<epoch>/pickup_location=…/year=…/month=…`, one
  * `batch-<id>-<k>` file per touched partition per 60 s micro-batch —
  * ~1,440 files per partition per day at the reference checkpoint cadence,
  * the operational problem every long-running file sink accumulates).
  *
  * Shape: `plan` walks the lake with a plain `listStatus` recursion
  * (`listFiles(recursive)` resolves block locations per entry — an order
  * of magnitude slower on local/object filesystems, see FileSink.promote),
  * greedy-packs each partition's data files in name order into bins of
  * cumulative size ≤ `targetBytes`, and keeps only bins that actually
  * shrink the file count (≥ 2 files). `compact` rewrites every planned bin
  * concurrently — each bin is one small Spark job (scan just that bin's
  * files → one output file), submitted from a bounded thread pool so a
  * thousand-bin lake keeps the cluster busy without flooding the
  * scheduler — then commits per bin: rename the staged file to its
  * deterministic name, delete the originals, drop the staging dir.
  *
  * Determinism + idempotence: the output file is named
  * `compact-<md5 of the source-file names>`, so re-planning the same bin
  * rewrites the same target and a second `compact` run over an
  * already-compacted lake plans zero bins (every partition holds one
  * `compact-*` file per target-size bin). Partition columns live in the
  * directory names, not the files — reading explicit leaf files yields
  * data columns only, and the compacted file drops back into the same
  * partition dir, so table-root readers re-derive partition values
  * unchanged.
  *
  * Crash contract: the staged file is written under a dot-prefixed dir
  * (invisible to Spark readers); originals are deleted only AFTER the
  * rename succeeds. A crash between rename and deletes leaves duplicates
  * visible — run compaction only on partitions no longer being written
  * (e.g. closed `job_start=` runs or past-watermark dates), the same
  * quiescence every lake compactor (Delta OPTIMIZE, Iceberg rewrite)
  * requires without a table-format commit log. On object stores rename is
  * copy+delete, not atomic metadata — the window is wider, the contract
  * identical.
  */
object LakeCompaction {

  /** One rewrite unit: ≥ 2 data files in one partition dir whose combined
    * size fits `targetBytes` (a lone oversized file is already compact). */
  final case class Bin(partitionDir: String, files: Seq[String], bytes: Long) {
    /** Deterministic output name — a function of the inputs only. */
    def outputName: String = {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(files.map(f => new Path(f).getName).mkString("\n")
          .getBytes("UTF-8"))
      "compact-" + digest.take(6).map("%02x".format(_)).mkString + ".parquet"
    }
  }

  final case class Report(partitions: Int, binsRewritten: Int,
      filesBefore: Int, filesAfter: Int, bytesRewritten: Long)

  private def isDataFile(name: String): Boolean =
    !name.startsWith(".") && !name.startsWith("_") && name.endsWith(".parquet")

  /** Pure greedy sequential packing (in the given — name-sorted — order,
    * so bins group temporally-adjacent batch files and the result is
    * deterministic): cut a new bin when the next file would push past
    * `targetBytes`, keep only groups of ≥ 2 files (a lone file — small or
    * oversized — is already as compact as it can get). Invariants
    * (property-tested in LakeCompactionSpec): bins are disjoint,
    * order-preserving, each has ≥ 2 files, and each fits `targetBytes`. */
  private[etl] def packBins(files: Seq[(String, Long)],
      targetBytes: Long): Seq[Seq[(String, Long)]] = {
    val out = Seq.newBuilder[Seq[(String, Long)]]
    var cur = Vector.empty[(String, Long)]
    var curBytes = 0L
    def flush(): Unit = {
      if (cur.length >= 2) out += cur
      cur = Vector.empty; curBytes = 0L
    }
    files.foreach { case (name, len) =>
      if (cur.nonEmpty && curBytes + len > targetBytes) flush()
      cur :+= (name, len)
      curBytes += len
    }
    flush()
    out.result()
  }

  /** Walk `dir`, bin-pack each partition's parquet files. Pure planning —
    * no data is read. */
  def plan(spark: SparkSession, dir: String, targetBytes: Long): Seq[Bin] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bins = Seq.newBuilder[Bin]
    def walk(d: Path): Unit = {
      val entries = fs.listStatus(d)
      // skip dot AND underscore dirs symmetrically with isDataFile: a
      // crashed write leaves _temporary/.../part-*.parquet — descending
      // there would compact (and delete!) another job's uncommitted
      // task-attempt files
      entries.filter(_.isDirectory)
        .filterNot(st => st.getPath.getName.startsWith(".") ||
          st.getPath.getName.startsWith("_"))
        .foreach(st => walk(st.getPath))
      val files = entries
        .filter(st => st.isFile && isDataFile(st.getPath.getName))
        .sortBy(_.getPath.getName)
      packBins(files.map(st => st.getPath.toString -> st.getLen).toSeq,
        targetBytes)
        .foreach { group =>
          bins += Bin(d.toString, group.map(_._1), group.map(_._2).sum)
        }
    }
    walk(root)
    bins.result()
  }

  /** Rewrite every planned bin; returns what changed.
    *
    * `sortBy`: optional clustering — each rewritten file is sorted on
    * these columns (the OPTIMIZE…ZORDER-lite move): parquet writes row-group
    * min/max stats per column, so a later range/equality filter on a sort
    * column skips whole row groups of the compacted files. Sorting happens
    * inside the single-task bin rewrite, so it costs one in-memory sort of
    * `targetBytes` per bin and changes nothing else (content identity is
    * row-set identity; parquet row order is not part of the table
    * contract). */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
      maxConcurrentBins: Int = 8, sortBy: Seq[String] = Nil): Report = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a FileStreamSink lake (writeStream.format("parquet")) is read through
    // its _spark_metadata manifest, which pins the EXACT committed file
    // names — rewriting/deleting them in place corrupts the table (readers
    // FileNotFound on the manifest's entries). Refuse; the caller either
    // stops the query and drops the manifest (converting the lake to plain
    // directory listing, losing the sink's exactly-once file accounting)
    // or compacts into a NEW directory. graft's own FileSink commits via
    // deterministic renames with no manifest, so its lakes compact freely.
    // check the target AND every ancestor: compacting one partition dir of
    // a manifest-managed lake is just as corrupting as compacting its root
    var probe: Path = fs.makeQualified(root)
    while (probe != null) {
      if (fs.exists(new Path(probe, "_spark_metadata")))
        throw new IllegalStateException(
          s"$probe is (part of) a FileStreamSink table (_spark_metadata " +
            "manifest): in-place compaction would orphan the manifest's file " +
            "list. Drop the manifest (after stopping the query) or compact " +
            "into a new dir.")
      probe = probe.getParent
    }
    val bins = plan(spark, dir, targetBytes)
    val filesBefore = bins.map(_.files.size).sum
    if (bins.isEmpty) return Report(0, 0, 0, 0, 0L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(maxConcurrentBins, bins.size))
    try {
      val futures = bins.map { bin =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = rewrite(spark, fs, bin, sortBy)
        })
      }
      // await EVERY bin before reporting: bailing on the first failure would
      // return control to the caller while the remaining rewrites keep
      // deleting source files in the background. Completed bins stay
      // committed (each rewrite is individually atomic + idempotent);
      // failures are aggregated and rethrown together.
      val failures = futures.flatMap { f =>
        try { f.get(); None }
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Some(Option(e.getCause).getOrElse(e))
        }
      }
      failures match {
        case first +: rest =>
          rest.foreach(first.addSuppressed)
          throw first
        case _ =>
      }
    } finally pool.shutdown()
    Report(bins.map(_.partitionDir).distinct.size, bins.size,
      filesBefore, bins.size, bins.map(_.bytes).sum)
  }

  private def rewrite(spark: SparkSession, fs: FileSystem, bin: Bin,
      sortBy: Seq[String]): Unit = {
    val partDir = new Path(bin.partitionDir)
    val staging = new Path(partDir, s".compacting-${bin.outputName}")
    fs.delete(staging, true)
    // explicit leaf files → no partition inference: data columns only,
    // exactly what belongs inside a file of this partition dir.
    // mergeSchema ALWAYS: a bin can mix pre- and post-evolution files, and
    // without the union one file's footer would win — silently dropping the
    // newer columns' data before the originals are deleted
    val one = spark.read.option("mergeSchema", "true")
      .parquet(bin.files: _*).coalesce(1)
    val clustered =
      if (sortBy.isEmpty) one
      else one.sortWithinPartitions(sortBy.map(
        org.apache.spark.sql.functions.col): _*)
    clustered.write.mode("overwrite").parquet(staging.toString)
    val part = fs.listStatus(staging)
      .map(_.getPath).find(p => p.getName.startsWith("part-"))
      .getOrElse(throw new java.io.IOException(s"no staged file under $staging"))
    val dest = new Path(partDir, bin.outputName)
    fs.delete(dest, false) // idempotent re-run overwrites its own output
    if (!fs.rename(part, dest))
      throw new java.io.IOException(s"compaction rename failed: $part -> $dest")
    bin.files.foreach(f => fs.delete(new Path(f), false))
    fs.delete(staging, true)
  }
}

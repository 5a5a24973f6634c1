package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Crash protocol of [[IvfStorage.recenter]]'s in-lake staging
  * (`.recenter-staging/stage-*`, manifest = commit point):
  *  - an UNCOMMITTED stage (no manifest: the staged write died) never
  *    touches live cells, is invisible to readers, and ages out via
  *    [[IvfStorage.vacuumRecenterStaging]];
  *  - a COMMITTED stage replays idempotently: `staged` cells rename in
  *    (once), `emptied` cells delete, and a second replay is a no-op. */
class RecenterStagingSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def buildLake(): (String, Seq[Int]) = {
    val dir = tmpDir("ivf-stagerec")
    val e = Tables.embeddings(spark, sfDir)
    val cents = IvfStorage.labelCentroids(e)
    IvfStorage.writeCellPartitioned(e, cents, dir)
    val cells = fs.listStatus(new Path(dir)).filter(_.isDirectory)
      .map(_.getPath.getName.stripPrefix("cent_id=").toInt).sorted.toSeq
    (dir, cells)
  }

  test("uncommitted stage: reader-invisible, live untouched, ages out; young stays") {
    val (dir, _) = buildLake()
    val before = spark.read.parquet(dir).count()
    val stage = new Path(dir, ".recenter-staging/stage-dead")
    fs.mkdirs(stage)
    val out = fs.create(new Path(stage, "part-torn.parquet"), true)
    try out.write(Array[Byte](1, 2, 3)) finally out.close()
    // dot-prefixed staging is invisible to every parquet reader
    assert(spark.read.parquet(dir).count() == before)
    val now = System.currentTimeMillis()
    // younger than retention: left alone
    assert(IvfStorage.vacuumRecenterStaging(spark, dir, 3600L * 1000, now)
      .isEmpty)
    assert(fs.exists(stage))
    // aged out: deleted, staging root removed, live cells untouched
    val acted = IvfStorage.vacuumRecenterStaging(spark, dir, 3600L * 1000,
      now + 7200L * 1000)
    assert(acted == Seq("stage-dead"))
    assert(!fs.exists(new Path(dir, ".recenter-staging")))
    assert(spark.read.parquet(dir).count() == before)
  }

  test("committed stage replays idempotently: staged cell renames in, emptied cell deletes") {
    val (dir, cells) = buildLake()
    assert(cells.size >= 2, s"fixture needs >= 2 cells, got $cells")
    val (cSwap, cEmpty) = (cells.head, cells(1))
    val otherCount = spark.read.parquet(dir)
      .filter(!col("cent_id").isin(cSwap, cEmpty)).count()
    // fabricate a committed-but-interrupted recenter: cell cSwap has new
    // contents staged (half its rows, ids shifted to be recognizable);
    // cell cEmpty lost every member
    val stage = new Path(dir, ".recenter-staging/stage-crash")
    val newContent = spark.read.parquet(s"$dir/cent_id=$cSwap")
      .filter(col("vec_id") % 2 === 0)
      .withColumn("vec_id", col("vec_id") + 5000000L)
    newContent.write.parquet(s"$stage/cent_id=$cSwap")
    val stagedRows = newContent.count()
    val manifest = fs.create(new Path(stage, "_affected"), true)
    try manifest.write(s"$cSwap,staged\n$cEmpty,emptied\n".getBytes("UTF-8"))
    finally manifest.close()

    assert(IvfStorage.replayRecenterStaging(spark, dir) == 1)
    assert(!fs.exists(stage))
    val lake = spark.read.parquet(dir)
    assert(lake.filter(col("cent_id") === cEmpty).count() == 0L,
      "emptied cell must be deleted")
    val swapped = lake.filter(col("cent_id") === cSwap)
      .select("vec_id").as[Long].collect().toSeq
    assert(swapped.nonEmpty && swapped.forall(_ >= 5000000L),
      "staged contents must fully replace the live cell")
    assert(swapped.size == stagedRows)
    assert(lake.filter(!col("cent_id").isin(cSwap, cEmpty)).count()
      == otherCount, "unaffected cells must be untouched")
    // a second replay finds nothing to do
    assert(IvfStorage.replayRecenterStaging(spark, dir) == 0)
  }

  test("recenter end-to-end leaves no staging residue and heals prior commits first") {
    val (dir, cells) = buildLake()
    // plant a committed emptied-cell stage from a "previous crash"
    val victim = cells.last
    val stage = new Path(dir, ".recenter-staging/stage-old")
    fs.mkdirs(stage)
    val manifest = fs.create(new Path(stage, "_affected"), true)
    try manifest.write(s"$victim,emptied\n".getBytes("UTF-8"))
    finally manifest.close()
    val e = Tables.embeddings(spark, sfDir)
    val cents = IvfStorage.labelCentroids(e)
    val res = IvfStorage.recenter(spark, dir, cents, Seq(cells.head))
    // the planted commit was healed BEFORE the lake read...
    assert(spark.read.parquet(dir)
      .filter(col("cent_id") === victim).count() == 0L)
    // ...and the recenter itself left no staging behind
    assert(!fs.exists(new Path(dir, ".recenter-staging")))
    assert(res.centroids.count() == cents.count())
  }
}

package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A GenericDatumReader that counts every field DECODE (readField is
  * called once per reader-schema field per record; writer-only fields
  * are skipped inside the ResolvingDecoder and never reach it) — the
  * observation seam for pinning that a column projection prunes at the
  * Avro decode layer, not as a post-decode select.
  *
  * Runs with a PRIVATE GenericData whose FAST READER is disabled:
  * Avro 1.12's default fast reader compiles the (writer, reader)
  * resolution into a generated reader that bypasses readField entirely
  * (verified against the bundled 1.12.1 bytecode — read() routes
  * through FastReaderBuilder when isFastReaderEnabled). Both paths
  * implement the SAME schema-resolution contract (writer-only fields
  * skip), so counting on the classic path pins the resolution the fast
  * path also performs; the private instance keeps the singleton
  * GenericData.get() untouched for every other test. */
class CountingDatumReader(reader: org.apache.avro.Schema)
    extends org.apache.avro.generic.GenericDatumReader[
      org.apache.avro.generic.GenericRecord](
        null, reader, CountingDatumReader.slowData()) {
  AvroLakeSpec.instantiated.incrementAndGet()
  override protected def readField(record: AnyRef,
      field: org.apache.avro.Schema.Field, oldDatum: AnyRef,
      in: org.apache.avro.io.ResolvingDecoder, state: AnyRef): Unit = {
    AvroLakeSpec.decodedFields.incrementAndGet()
    super.readField(record, field, oldDatum, in, state)
  }
}

object CountingDatumReader {
  def slowData(): org.apache.avro.generic.GenericData = {
    val d = new org.apache.avro.generic.GenericData()
    d.setFastReaderEnabled(false)
    d
  }
}

object AvroLakeSpec {
  // static so local-mode executor threads and the driver share it
  val decodedFields = new java.util.concurrent.atomic.AtomicLong(0L)
  val instantiated = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** AvroLake: typed Avro container-file round trip on the public Avro
  * API (no spark-avro module in this distribution) — full scalar type
  * surface incl. binary, union(null,T) nullability, empty partitions,
  * multi-file parallel read, self-describing schema derivation,
  * reader-schema column pruning, attempt-commit crash invisibility. */
class AvroLakeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("i", IntegerType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("f", FloatType, nullable = true),
    StructField("b", BooleanType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("bin", BinaryType, nullable = true)))

  private val rows = Seq(
    Row(1L, 7, 1.5, 2.5f, true, "plain", Array[Byte](1, 2, 3)),
    Row(2L, -1, -7.25, -0.5f, false, "caf\u00e9 \u00f1", Array[Byte]()),
    Row(3L, null, null, null, null, null, null),
    Row(4L, 0, 0.0, 0.0f, true, "", Array[Byte](-128, 127, 0)),
    Row(5L, Int.MaxValue, Double.MinPositiveValue, Float.MaxValue, false,
      "line\nbreak\ttab", Array[Byte](42)))

  test("round trip preserves every scalar type, nulls, non-ASCII, binary, empty string vs null") {
    val dir = tmpDir("avrort")
    val df = spark.createDataFrame(rows.asJava, schema).repartition(3)
    AvroLake.write(df, dir)
    val back = AvroLake.read(spark, dir)
    // schema derived from the container header, not caller-supplied
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val got = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == rows.size)
    rows.foreach { exp =>
      val r = got(exp.getLong(0))
      (1 until schema.length).foreach { i =>
        (exp.get(i), r.get(i)) match {
          case (a: Array[Byte], b: Array[Byte]) =>
            assert(a.toSeq == b.toSeq, s"row ${exp.getLong(0)} col $i")
          case (a, b) =>
            assert(a == b, s"row ${exp.getLong(0)} col $i: $a != $b")
        }
      }
    }
    // null survived as null, empty string as empty — never conflated
    assert(got(3L).isNullAt(5) && got(4L).getString(5) == "")
  }

  test("multiple container files, empty partitions skipped, file-granular read") {
    val dir = tmpDir("avrofiles")
    // 40-way repartition of 10 rows: most partitions empty — they must
    // not produce empty container files or phantom rows
    val df = spark.range(10).select(col("id"),
      concat(lit("v"), col("id")).as("s"))
    AvroLake.write(df.repartition(40), dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.endsWith(".avro"))
    assert(files.length > 1 && files.length <= 10,
      s"expected >1 non-empty container files, got ${files.length}")
    val back = AvroLake.read(spark, dir)
    assert(back.rdd.getNumPartitions == files.length,
      "read parallelism must be file-granular")
    assert(back.select("id").as[Long].collect().sorted.toSeq ==
      (0L to 9L))
    assert(back.select("s").as[String].collect().sorted.toSeq ==
      (0 to 9).map(i => s"v$i").sorted)
  }

  test("sync-marker splitting: one oversized container fans out across tasks, every block read exactly once") {
    val dir = tmpDir("avrosplit")
    val n = 30000L
    // ONE container file with many small blocks (2 KB sync interval)
    val df = spark.range(n).select(col("id"),
      concat(lit("value-"), col("id")).as("s"))
    AvroLake.write(df.coalesce(1), dir, syncIntervalBytes = 2048)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.endsWith(".avro"))
    assert(files.length == 1)
    val len = files.head.getLen
    // split far below the file size: the avro-mapred sync contract must
    // hand every block to exactly one task
    val back = AvroLake.read(spark, dir, maxSplitBytes = 16 * 1024)
    val expectSplits = ((len + 16 * 1024 - 1) / (16 * 1024)).toInt
    assert(back.rdd.getNumPartitions == expectSplits && expectSplits > 4,
      s"file of $len bytes must read as $expectSplits splits, got ${back.rdd.getNumPartitions}")
    val ids = back.select("id").as[Long].collect()
    assert(ids.length == n && ids.toSet.size == n.toInt,
      s"split read lost or duplicated rows: ${ids.length} rows, ${ids.toSet.size} distinct")
    assert(back.filter(col("s") =!= concat(lit("value-"), col("id")))
      .count() == 0, "row content corrupted across a split boundary")
    // the default split size reads the same file as ONE task
    assert(AvroLake.read(spark, dir).rdd.getNumPartitions == 1)
  }

  test("reader-schema projection: only projected fields decode (counted), rows ≡ full read, requested column order") {
    val dir = tmpDir("avroproj")
    val df = spark.createDataFrame(rows.asJava, schema).repartition(3)
    AvroLake.write(df, dir)
    def countedRead(cols: Option[Seq[String]]) = {
      AvroLakeSpec.decodedFields.set(0L)
      val got = AvroLake.readWith(spark, dir, 128L << 20, cols,
        s => new CountingDatumReader(s)).collect()
      (got, AvroLakeSpec.decodedFields.get())
    }
    val (full, fullDecodes) = countedRead(None)
    assert(fullDecodes == rows.size.toLong * schema.length,
      s"full read must decode rows×fields = ${rows.size * schema.length}, counted $fullDecodes " +
        s"(readers instantiated: ${AvroLakeSpec.instantiated.get()}, rows back: ${full.length})")
    // project 2 of 7 columns, REVERSED relative to writer order
    val (pruned, prunedDecodes) = countedRead(Some(Seq("s", "id")))
    assert(prunedDecodes == rows.size.toLong * 2,
      s"pruned read must decode rows×2 = ${rows.size * 2} fields — " +
        s"counted $prunedDecodes (the other 5 must SKIP at the resolving decoder)")
    // identical values to the full read, in the REQUESTED column order
    val prunedDf = AvroLake.read(spark, dir, columns = Some(Seq("s", "id")))
    assert(prunedDf.schema.fieldNames.toSeq == Seq("s", "id"))
    assert(pruned.map(r => (r.getAs[String]("s"), r.getAs[Long]("id"))).toSet ==
      full.map(r => (r.getAs[String]("s"), r.getAs[Long]("id"))).toSet)
    // null under the projected union(null,string) column survives
    assert(pruned.count(_.isNullAt(0)) == 1)
    // a column the writer never had fails loudly at the driver
    val err = intercept[IllegalArgumentException] {
      AvroLake.read(spark, dir, columns = Some(Seq("nope")))
    }
    assert(err.getMessage.contains("nope"))
  }

  test("attempt-commit protocol: a crashed attempt's torn temp container is invisible; committed writes leave no debris") {
    val dir = tmpDir("avrocommit")
    val df = spark.createDataFrame(rows.asJava, schema).repartition(2)
    AvroLake.write(df, dir)
    val d = new java.io.File(dir)
    assert(d.listFiles().forall(f => !f.getName.endsWith(".tmp")),
      "a completed write must leave no attempt temps")
    // simulate an attempt that crashed mid-container: a torn dot-prefixed
    // temp (invalid Avro bytes) must never surface rows or fail the read
    val torn = new java.io.File(d, ".part-00007-dead.avro.tmp")
    java.nio.file.Files.write(torn.toPath,
      Array[Byte](Obj1Magic: _*) ++ Array.fill[Byte](64)(7))
    val back = AvroLake.read(spark, dir)
    assert(back.count() == rows.size.toLong,
      "torn attempt temp leaked rows into the read")
  }

  // the 4-byte Avro container magic, so the torn file LOOKS like a
  // container prefix (the worst case for a name-filter bug)
  private val Obj1Magic = Seq[Byte]('O', 'b', 'j', 1)

  test("rejects unsupported types loudly") {
    val df = spark.range(3).select(col("id"), array(col("id")).as("a"))
    intercept[IllegalArgumentException] {
      AvroLake.write(df, tmpDir("avrobad"))
    }
  }
}

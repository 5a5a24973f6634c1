package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file lake: typed read/write of `.avro` files built
  * directly on the PUBLIC Apache Avro 1.12 API bundled with this Spark
  * distribution — the `spark-avro` connector module is NOT part of the
  * distribution (checked: no spark-avro jar under the Spark jars), so
  * the at-rest format the reference actually serializes through
  * (StreamingEtl.java:219-226 writes Parquet VIA Avro records with
  * ParquetAvroWriters.forSpecificRecord; TripEvent IS an Avro
  * SpecificRecord) gets a first-class seam here instead of a
  * `format("avro")` call that would not resolve.
  *
  * Scope: flat records over the scalar lake types (long/int/double/
  * float/boolean/string/binary), nullable via Avro's standard
  * union(null, T) — the TripEvent shape and the whole testdata surface.
  * Nested records/arrays/maps are out of scope for this seam (the
  * reference's record is flat).
  *
  * Scale shape: the WRITE is one Avro container file per partition
  * (mapPartitions — embarrassingly parallel, no shuffle, the exact
  * per-subtask layout Flink's StreamingFileSink produces); the READ
  * splits every container on Avro SYNC MARKERS (the avro-mapred split
  * contract: a task owns the blocks whose sync lies inside its byte
  * range — `sync(start)` seeks to the first block after the split
  * start, `pastSync(end)` hands the tail to the next task), so one
  * oversized container still fans out across the cluster instead of
  * serializing on a single task; files below `maxSplitBytes` read as
  * one task each, exactly the writer's layout. A column projection
  * prunes at the DECODE layer via Avro schema resolution (a reader
  * schema naming only the projected fields — [[prunedReaderSchema]]),
  * so a 2-column read of a wide record skips the other fields instead
  * of materializing them (the parquet-pruning analogue; row-oriented
  * Avro still reads the bytes, but decode CPU and allocation scale
  * with projected fields only). Schemas travel as JSON strings
  * (avro.Schema is not serializable); the reader derives the
  * Spark schema from the FIRST file's embedded header —
  * self-describing files, the Avro contract. */
object AvroLake {

  private val SupportedTypes: Set[DataType] = Set(LongType, IntegerType,
    DoubleType, FloatType, BooleanType, StringType, BinaryType)

  /** The Avro record schema for a flat Spark schema: every field a
    * union(null, base) when nullable, base otherwise. */
  def avroSchema(st: StructType, record: String = "graft_record"): Schema = {
    val fields = st.fields.map { f =>
      require(SupportedTypes.contains(f.dataType),
        s"AvroLake: unsupported type ${f.dataType} for field ${f.name}")
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(other.toString)
      }
      val sch = if (f.nullable)
        Schema.createUnion(java.util.Arrays.asList(
          Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, sch, null, null)
    }
    Schema.createRecord(record, null, "graft", false, fields.toSeq.asJava)
  }

  /** The Spark schema a flat Avro record schema round-trips to. */
  def sparkSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"AvroLake: not a record schema: ${avro.getType}")
    StructType(avro.getFields.asScala.toSeq.map { f =>
      val (base, nullable) = f.schema().getType match {
        case Schema.Type.UNION =>
          val branches = f.schema().getTypes.asScala
          require(branches.size == 2 &&
            branches.exists(_.getType == Schema.Type.NULL),
            s"AvroLake: only union(null, T) unions supported: ${f.schema()}")
          (branches.find(_.getType != Schema.Type.NULL).get, true)
        case _ => (f.schema(), false)
      }
      val dt = base.getType match {
        case Schema.Type.LONG    => LongType
        case Schema.Type.INT     => IntegerType
        case Schema.Type.DOUBLE  => DoubleType
        case Schema.Type.FLOAT   => FloatType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.STRING  => StringType
        case Schema.Type.BYTES   => BinaryType
        case other => throw new IllegalArgumentException(
          s"AvroLake: unsupported avro type $other for field ${f.name}")
      }
      StructField(f.name, dt, nullable)
    })
  }

  /** Write `df` as one Avro container file per partition under `dir`
    * (deflate-compressed, the codec every Avro runtime bundles).
    * `syncIntervalBytes` is the approximate block size between sync
    * markers — the read-side split granularity (Avro's default 64 KB;
    * exposed so tests can force many blocks in a small file).
    *
    * Task-commit protocol (the ADVICE r19 finding): each attempt writes
    * an ATTEMPT-UNIQUE dot-prefixed temp (invisible to [[read]]'s name
    * filter) and renames it into the final `part-NNNNN.avro` name only
    * after its container closed cleanly — a speculative or retried
    * attempt can therefore never interleave bytes into a visible file,
    * and a crashed attempt leaves only invisible debris. Retried
    * attempts of one partition produce identical content (the partition
    * iterator is deterministic), so whichever rename lands — overwrite
    * on POSIX, first-wins on HDFS — the visible bytes are the same. */
  def write(df: DataFrame, dir: String,
      syncIntervalBytes: Int = 64 * 1024): Unit = {
    val spark = df.sparkSession
    val schemaJson = avroSchema(df.schema).toString
    val sparkSch = df.schema
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val bc = spark.sparkContext.broadcast(hconf)
    val base = new Path(dir)
    val fs0 = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs0.delete(base, true)
    fs0.mkdirs(base)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val fin = new Path(base, f"part-$pid%05d.avro")
        val tmp = new Path(base, f".part-$pid%05d-" +
          s"${java.util.UUID.randomUUID()}.avro.tmp")
        val fs = fin.getFileSystem(bc.value.value)
        val out = fs.create(tmp, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(CodecFactory.deflateCodec(6))
        w.setSyncInterval(syncIntervalBytes)
        w.create(schema, out)
        var n = 0L
        try rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < sparkSch.length) {
            val v = if (r.isNullAt(i)) null else sparkSch(i).dataType match {
              case BinaryType =>
                java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](i))
              case _ => r.get(i).asInstanceOf[AnyRef]
            }
            rec.put(i, v)
            i += 1
          }
          w.append(rec)
          n += 1
        } finally w.close()
        // commit: container complete — rename into place. A losing
        // rename against an already-committed final (HDFS first-wins)
        // just drops this attempt's identical bytes.
        if (!fs.rename(tmp, fin)) {
          if (fs.exists(fin)) fs.delete(tmp, false)
          else sys.error(s"AvroLake.write: commit rename of $tmp -> $fin " +
            "failed with no committed final present")
        }
        Iterator.single(n)
      }
    }.count()
  }

  /** The PRUNED reader schema for a column projection — Avro's native
    * schema-resolution read: a reader schema holding only the projected
    * fields makes the ResolvingDecoder SKIP every other writer field at
    * the decode layer (strings/bytes skip by length with no
    * materialization), the Avro analogue of parquet column pruning.
    * Fields come out in the REQUESTED order (resolution matches by
    * name), so the resulting DataFrame column order is the caller's. */
  private[sources] def prunedReaderSchema(writer: Schema,
      cols: Seq[String]): Schema = {
    require(cols.nonEmpty, "AvroLake: empty column projection")
    require(cols.distinct == cols, s"AvroLake: duplicate columns in $cols")
    val fields = cols.map { c =>
      val f = writer.getField(c)
      require(f != null,
        s"AvroLake: projected column '$c' not in writer schema " +
          s"${writer.getFields.asScala.map(_.name).mkString("[", ",", "]")}")
      new Schema.Field(f.name, f.schema, null, null)
    }
    Schema.createRecord(writer.getName, null, writer.getNamespace, false,
      fields.asJava)
  }

  /** Read an AvroLake directory back as a DataFrame: the schema comes
    * from the first container file's self-describing header; every
    * container is split on sync markers into tasks of at most
    * `maxSplitBytes` (files below it read as one task each).
    *
    * `columns` prunes the scan at the DECODE layer ([[prunedReaderSchema]]
    * — Avro schema resolution): only the projected fields are decoded and
    * materialized, every other writer field is skipped by the resolving
    * decoder (AvroLakeSpec counts field materializations to pin it — a
    * `.select` ABOVE this seam cannot prune, because the scan is an RDD
    * boundary Catalyst pushes nothing through, so the caller passes the
    * projection HERE). */
  def read(spark: SparkSession, dir: String,
      maxSplitBytes: Long = 128L << 20,
      columns: Option[Seq[String]] = None): DataFrame =
    readWith(spark, dir, maxSplitBytes, columns,
      s => new GenericDatumReader[GenericRecord](null, s))

  /** [[read]] with an injectable datum-reader factory (reader schema →
    * GenericDatumReader) — the decode observation seam AvroLakeSpec
    * counts per-field `readField` calls through; production reads use
    * the plain GenericDatumReader. */
  private[sources] def readWith(spark: SparkSession, dir: String,
      maxSplitBytes: Long, columns: Option[Seq[String]],
      mkDatumReader: Schema => GenericDatumReader[GenericRecord])
      : DataFrame = {
    require(maxSplitBytes > 0, s"maxSplitBytes=$maxSplitBytes")
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(base).toSeq
      .filter(st => st.getPath.getName.endsWith(".avro") &&
        !st.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
    require(files.nonEmpty, s"AvroLake.read: no .avro files under $dir")
    val header = {
      val in = fs.open(files.head.getPath)
      val s = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try s.getSchema finally s.close()
    }
    val readerSchema = columns match {
      case None => header
      case Some(cols) => prunedReaderSchema(header, cols)
    }
    val sch = sparkSchema(readerSchema)
    val schemaJson = readerSchema.toString
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val bc = spark.sparkContext.broadcast(hconf)
    // the avro-mapred split contract: a task reads the blocks whose
    // sync marker lies inside [start, end) — sync(start) seeks to the
    // first block boundary after start (position 0 lands on the first
    // block), pastSync(end) stops after the last owned block, so every
    // block is consumed by exactly one split regardless of where the
    // byte boundaries fall
    val splits: Seq[(String, Long, Long)] = files.flatMap { st =>
      val len = st.getLen
      (0L until len by maxSplitBytes).map { s =>
        (st.getPath.toString, s, math.min(s + maxSplitBytes, len))
      }
    }
    val rdd = spark.sparkContext
      .parallelize(splits, splits.length)
      .flatMap { case (f, start, end) =>
        val schema = new Schema.Parser().parse(schemaJson)
        val in = new org.apache.avro.mapred.FsInput(new Path(f),
          bc.value.value)
        // writer schema comes from each file's own header (openReader
        // calls setSchema); `schema` is the READER schema — identical to
        // the writer's for a full read, pruned under a projection, and
        // the resolving decoder skips what it doesn't name
        val reader = org.apache.avro.file.DataFileReader
          .openReader(in, mkDatumReader(schema))
        // a consumer that stops early (limit/take) or dies mid-read
        // never drains the iterator — close on task completion so the
        // handle cannot outlive the task (idempotent with the
        // exhaustion-driven close below)
        org.apache.spark.TaskContext.get().addTaskCompletionListener[Unit] {
          _ => reader.close()
        }
        reader.sync(start)
        new Iterator[Row] {
          private var closed = false
          def hasNext: Boolean = {
            if (!closed && (!reader.hasNext || reader.pastSync(end))) {
              closed = true
              reader.close()
            }
            !closed
          }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq((0 until schema.getFields.size()).map { i =>
              rec.get(i) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case b: java.nio.ByteBuffer =>
                  val a = new Array[Byte](b.remaining()); b.get(a); a
                case v => v
              }
            })
          }
        }
      }
    spark.createDataFrame(rdd, sch)
  }
}

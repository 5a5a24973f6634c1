package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The parquet bloom-filter layout option's data-skipping effect on a REAL
  * written lake — the point-lookup complement to the sort/curve layouts
  * (HilbertLayoutSpec's method: scan numOutputRows under row-group
  * filtering, measured A/B on identical data).
  *
  * The lake is 2M rows in 16 id-range-sorted files (one row group each)
  * carrying a high-cardinality column `h` the lake is NOT sorted by —
  * every file spans h's full range, so min/max stats admit everything and
  * a point lookup without blooms materializes the whole table. Dictionary
  * encoding is DISABLED on the probe column in both lakes: dictionary
  * pages also prune row groups exactly, but only below the 1 MB
  * dictionary-page ceiling — at 100 TB cardinalities the dictionary
  * overflows and blooms are the only skip, so this measures the honest
  * at-scale regime.
  *
  * Measured (deterministic fixture):
  *   point lookup on h   plain: 2,097,152 rows   bloom: ≤2 files' worth
  *   point lookup on id  both: 1 file's worth (min/max — blooms never
  *                       regress the sort column)
  *
  * Adopt/reject rule recorded in BASELINE.md: adopt
  * `LakeLayout.bloomOptions` for id-lookup lakes on non-sort keys; reject
  * for the sort column itself (min/max already skips for free, the bloom
  * would be pure write-side overhead). */
class BloomLakeSpec extends SparkSpec {
  import spark.implicits._

  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec =>
        f.metrics("numOutputRows").value }.get
  }

  test("bloom filters skip row groups on point lookups over a NON-sort column") {
    val n = 1L << 21 // 2M rows, 16 files → 1 row group per file
    val df = spark.range(n).select(col("id"),
      xxhash64(col("id")).as("h"))
    val noDict = Map("parquet.enable.dictionary" -> "false")
    val plainDir = tmpDir("bloom-plain")
    val bloomDir = tmpDir("bloom-on")
    def write(dir: String, opts: Map[String, String]): Unit =
      df.repartitionByRange(16, col("id"))
        .sortWithinPartitions("id")
        .write.mode("overwrite").options(opts).parquet(dir)
    write(plainDir, noDict)
    write(bloomDir,
      noDict ++ LakeLayout.bloomOptions("h", expectedNdv = n / 16))

    // probe value: the h of one known row (deterministic — xxhash64 is
    // seeded), living in exactly one file
    val probe = df.filter(col("id") === 777777L)
      .select("h").as[Long].head()
    def lookup(dir: String): DataFrame =
      spark.read.parquet(dir).filter(col("h") === probe)

    // correctness parity first
    assert(lookup(bloomDir).select("id").as[Long].collect().toSet ==
      lookup(plainDir).select("id").as[Long].collect().toSet)
    val plainRows = scannedRows(lookup(plainDir))
    val bloomRows = scannedRows(lookup(bloomDir))
    info(s"[bloom-lake] point lookup on h: plain=$plainRows bloom=$bloomRows of $n")
    // without blooms every row group spans h's range — (near-)full scan
    assert(plainRows >= n / 2, s"plain lake unexpectedly pruned: $plainRows")
    // with blooms only the containing group (+ rare 1%-FPP extras) reads
    assert(bloomRows <= n / 4,
      s"bloom lake did not skip: $bloomRows of $n rows materialized")
    assert(bloomRows < plainRows)

    // the sort column's min/max skipping is unaffected by the bloom option
    val idPlain = scannedRows(
      spark.read.parquet(plainDir).filter(col("id") === 123456L))
    val idBloom = scannedRows(
      spark.read.parquet(bloomDir).filter(col("id") === 123456L))
    info(s"[bloom-lake] point lookup on sort key id: plain=$idPlain bloom=$idBloom")
    assert(idPlain <= n / 8 && idBloom <= n / 8)
  }

  test("IN-list probes above the pushdown threshold STILL engage blooms (ADVICE r18 refuted by measurement)") {
    // ADVICE r18 claimed an IN above
    // spark.sql.parquet.pushdown.inFilterThreshold (default 10) degrades
    // to a [min,max] range that blooms cannot answer. MEASURED here:
    // Spark 4.1.2's threshold selects between an OR-of-equalities chain
    // (≤ threshold) and parquet's NATIVE `in(col, set)` predicate
    // (> threshold) — and parquet-mr's row-group bloom evaluator handles
    // BOTH, so q270's hundreds-of-values probe list keeps its skipping
    // either way. The regime that matters at scale: a ~dozen-value
    // request list against 64 row groups (tiny parquet.block.size) —
    // only the groups actually containing a probe value read, under
    // BOTH threshold settings, bit-identical results.
    val n = 1L << 20
    val dir = tmpDir("bloom-inlist")
    spark.range(n).select(col("id"), xxhash64(col("id")).as("h"))
      .repartitionByRange(8, col("id"))
      .sortWithinPartitions("id")
      .write.mode("overwrite")
      .options(Map("parquet.enable.dictionary" -> "false",
        "parquet.block.size" -> (256 * 1024).toString) ++
        LakeLayout.bloomOptions("h", expectedNdv = n / 8))
      .parquet(dir)
    val probes = spark.range(n).filter(col("id") % 87381 === 11)
      .select(xxhash64(col("id"))).as[Long].collect().toSeq
    assert(probes.length == 12, s"fixture drift: ${probes.length} probes")
    val key = "spark.sql.parquet.pushdown.inFilterThreshold"
    val session = spark.conf.get(key)
    def scanWith(threshold: String): (Long, Set[Long]) = {
      spark.conf.set(key, threshold)
      try {
        val q = spark.read.parquet(dir)
          .filter(col("h").isin(probes.map(Long.box): _*))
        val ids = q.select("id").as[Long].collect().toSet
        (scannedRows(q), ids)
      } finally spark.conf.set(key, session)
    }
    val (eqChain, idsA) = scanWith("100") // 12 ≤ 100: OR-of-equalities
    val (nativeIn, idsB) = scanWith("10") // 12 > 10: parquet native IN
    info(s"[bloom-lake] 12-probe IN over 64 groups: eq-chain=$eqChain native-in=$nativeIn of $n")
    assert(idsA == idsB && idsA.size == 12, "IN probe correctness parity")
    // both pushdown forms reach the blooms: only probe-bearing groups read
    assert(eqChain <= n / 4,
      s"eq-chain pushdown did not engage blooms: $eqChain of $n")
    assert(nativeIn <= n / 4,
      s"native-IN pushdown did not engage blooms: $nativeIn of $n")
  }

  test("q270's declared lake actually skips on its bloom column") {
    val dir = CorpusQueries.bloomLakeDir(spark, sfDir)
    val lake = spark.read.parquet(dir)
    val total = lake.count()
    val probe = lake.orderBy("doc_id").select("h").as[Long].head()
    val scanned = scannedRows(
      spark.read.parquet(dir).filter(col("h") === probe))
    info(s"[bloom-lake] q270 lake single-probe scan: $scanned of $total")
    // the lake is id-sorted, so every file spans h's range — without the
    // bloom filters this scan would materialize ALL rows
    assert(scanned <= total / 2, s"q270 lake did not skip: $scanned of $total")
  }

  test("LakeCompaction rewrite threads bloom options into the compacted files") {
    // a small-file lake compacted WITH bloom options must come out
    // point-lookup-skippable — the production path that retrofits blooms
    // onto an existing lake during its regular compaction pass
    val n = 1L << 19 // 512k rows in 32 small files
    val dir = tmpDir("bloom-compact")
    spark.range(n).select(col("id"), xxhash64(col("id")).as("h"))
      .repartitionByRange(32, col("id"))
      .sortWithinPartitions("id")
      .write.mode("overwrite")
      .option("parquet.enable.dictionary", "false").parquet(dir)
    // blooms are PER ROW GROUP: cap the row-group size so the compacted
    // (larger) files still contain several skippable groups — the same
    // lever a production compaction tunes alongside targetBytes
    val rep = graft.etl.LakeCompaction.compact(spark, dir,
      targetBytes = 8L << 20,
      writeOptions = Map(
        "parquet.enable.dictionary" -> "false",
        "parquet.block.size" -> (1L << 20).toString) ++
        LakeLayout.bloomOptions("h", expectedNdv = n / 8))
    assert(rep.binsRewritten > 0, s"compaction did nothing: $rep")
    val probe = spark.range(n).filter(col("id") === 123L)
      .select(xxhash64(col("id")).as("h")).as[Long].head()
    val scanned = scannedRows(
      spark.read.parquet(dir).filter(col("h") === probe))
    info(s"[bloom-lake] post-compaction lookup: $scanned of $n")
    assert(scanned < n / 2,
      s"compacted lake carries no working blooms: $scanned of $n")
  }
}

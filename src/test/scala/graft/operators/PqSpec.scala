package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Product quantization: the native encode kernel is pinned bit-equal to
  * the DataFrame reference (including tie and malformed-input edges), the
  * IVFADC probe is pinned against the exact ranking when nothing is
  * pruned, and the packed lake layout carries the m-bytes-per-vector
  * claim. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val m = 8
  private val dim = 64

  private def clean = Tables.embeddings(spark, sfDir)
    .filter(size(col("embedding")) === 64 &&
      !exists(col("embedding"), x => x.isNull))

  test("native pq_encode ≡ the explode/join/rank reference, row for row") {
    val e = clean
    val cb = PqStorage.labelCodebooks(e, m, dim)
    val kernel = PqStorage.encode(e, cb)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Int](r.fieldIndex("codes")).toList).toMap
    val ref = PqStorage.encodeReference(e, cb, m, dim)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Int](r.fieldIndex("codes")).toList).toMap
    assert(kernel.keySet == ref.keySet && kernel.keySet.nonEmpty)
    kernel.foreach { case (id, codes) =>
      assert(codes == ref(id), s"vec $id: $codes vs ${ref(id)}")
    }
  }

  test("encode ties break to the smallest code; malformed inputs yield null, not garbage") {
    // two identical codebook entries per subspace → tie → smaller code
    val e = Seq((1L, Array.fill(4)(1.0f))).toDF("vec_id", "embedding")
    val cb = Seq((0, 5, Array(1.0f, 1.0f)), (0, 7, Array(1.0f, 1.0f)),
      (1, 5, Array(0.0f, 0.0f)), (1, 7, Array(0.0f, 0.0f)))
      .toDF("sub", "code", "centroid")
    val codes = PqStorage.encode(e, cb).head().getSeq[Int](1).toList
    assert(codes == List(5, 5))
    // wrong-width embedding (codebook for 4 dims, vector has 6) → null
    val bad = Seq((2L, Array.fill(6)(1.0f))).toDF("vec_id", "embedding")
    assert(PqStorage.encode(bad, cb).head().isNullAt(1))
    // non-contiguous subs (0 and 2) → null
    val gappy = Seq((0, 1, Array(1.0f, 1.0f)), (2, 1, Array(1.0f, 1.0f)))
      .toDF("sub", "code", "centroid")
    assert(PqStorage.encode(e, gappy).head().isNullAt(1))
  }

  test("adc score kernel ≡ per-row table lookup fold; packed bytes identical") {
    val e = clean
    val cb = PqStorage.labelCodebooks(e, m, dim)
    val q = e.filter(col("vec_id") === 0).select("embedding")
      .as[Array[Float]].head()
    val withTable = PqStorage.encode(e, cb)
      .crossJoin(broadcast(PqStorage.adcTable(cb, q, m, dim)))
    val kernel = withTable
      .select(col("vec_id"),
        call_function("pq_adc_score", col("codes"), col("adc_table")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // interpreted reference: k from the table, lookup fold over subspaces
    val hof = withTable
      .select(col("vec_id"), expr(
        """aggregate(zip_with(codes, sequence(0, size(codes) - 1),
          |  (c, s) -> element_at(adc_table,
          |    s * CAST(size(adc_table) / size(codes) AS INT) + c + 1)),
          |  CAST(0 AS DOUBLE), (a, x) -> a + x)""".stripMargin).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kernel.nonEmpty && kernel == hof)
    // the binary (packed-lake) form scores identically
    val packed = withTable
      .select(col("vec_id"),
        call_function("pq_adc_score",
          call_function("int8_pack", col("codes")), col("adc_table")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(packed == kernel)
  }

  test("IVFADC probe: pruned scan, m bytes per vector, full-probe+full-preK ≡ exact top-k") {
    val e = clean
    val cents = IvfStorage.labelCentroids(e)
    val cb = PqStorage.labelCodebooks(e, m, dim)
    val dir = tmpDir("pq-lake")
    PqStorage.writePackedCellPartitioned(e, cents, cb, dir)
    // the stored code column is exactly m bytes per vector
    val lake = spark.read.parquet(dir)
    assert(lake.select(max(length(col("codes"))), min(length(col("codes"))))
      .as[(Int, Int)].head() == ((m, m)))
    val q = e.filter(col("vec_id") === 0).select("embedding")
      .as[Array[Float]].head()
    val nCells = cents.count().toInt
    val n = e.count().toInt
    // nothing pruned, shortlist covers the lake → exact brute-force top-k
    val full = PqStorage.probePacked(spark, dir, e, cents, cb, q,
      m, dim, nProbe = nCells, k = 10, preK = n)
      .select("vec_id").as[Long].collect().toSeq
    val brute = e.crossJoin(broadcast(
        e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.cosineNative(
          col("embedding"), col("q_emb")).as("cos"))
      .orderBy(col("cos").desc_nulls_last, col("vec_id"))
      .limit(10).select("vec_id").as[Long].collect().toSeq
    assert(full == brute, "uncut IVFADC must recover the exact ranking")
    // the default operating point prunes cells AND still finds neighbors
    val probed = PqStorage.probePacked(spark, dir, e, cents, cb, q, m, dim)
    val rows = probed.collect()
    assert(rows.length == 10)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cast(cent_id") ||
      plan.contains("PartitionFilters: [cent_id"), plan)
  }

  test("kmeansCodebooks: deterministic, one codebook per subspace, codes pack") {
    val e = clean.limit(200)
    val cb1 = PqStorage.kmeansCodebooks(e, m, dim, k = 4, iters = 2)
    val cb2 = PqStorage.kmeansCodebooks(e, m, dim, k = 4, iters = 2)
    assert(cb1.collect().map(_.toString).sorted
      .sameElements(cb2.collect().map(_.toString).sorted))
    val bySub = cb1.groupBy("sub").agg(count(lit(1)).as("n"),
      min("code").as("lo"), max("code").as("hi"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(bySub.keySet == (0 until m).toSet)
    bySub.values.foreach { case (n, lo, hi) =>
      assert(n == 4L && lo == 0 && hi == 3)
    }
    // trained codebooks drive the same encode/probe machinery
    val codes = PqStorage.encode(e, cb1)
    assert(codes.filter(col("codes").isNull).count() == 0)
  }
}

package graft.operators

import graft.functions.VectorFunctions.cosineNative
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for the vector lake — the compression step
  * past [[IvfStorage]]'s int8 scalar quantizer: the vector splits into m
  * contiguous subvectors and each stores only the id of its nearest
  * per-subspace codebook entry, so a 64-dim float vector (256 B) becomes
  * m = 8 BYTES on disk — 32× — while probes run asymmetric distance
  * computation (ADC): per query, one m×k lookup table of exact
  * query-to-codebook squared distances is built and broadcast, and every
  * scanned row costs m table lookups + adds (the native
  * [[graft.plans.PqAdcScore]] kernel — no decode, no per-row float
  * materialization). Combined with IVF cell partitioning this is the
  * IVFADC layout (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) that production vector stores (FAISS
  * `IVFx,PQm`) run at billion-vector scale: partition-pruned scan of m-byte
  * codes → ADC pre-rank → exact re-rank of a preK shortlist against the
  * float originals ([[IvfStorage.quantizedRerank]]'s contract, PQ flavor).
  *
  * Determinism mirrors the IVF family: codebooks are exact decimal means
  * ([[labelCodebooks]], the oracle-able instantiation — q107 recomputes the
  * whole encode in DuckDB) or the deterministic k-means of
  * [[IvfStorage.kmeansCentroids]] per subspace ([[kmeansCodebooks]], the
  * unlabeled production path); encode tie-breaks to the smallest code via
  * a strictly-smaller-distance scan, and all distance folds are sequential
  * doubles — bit-identical between the native kernel, the DataFrame
  * reference, and the SQL mirror.
  */
object PqStorage {

  /** Per-subspace codebooks from labels: the subvector means per label,
    * exact decimal sums (the [[IvfStorage.labelCentroids]] shape sliced m
    * ways). code = label. One pass; layout (sub, code, centroid). */
  def labelCodebooks(embeddings: DataFrame, m: Int, dim: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val w = dim / m
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), expr(s"CAST(pos div $w AS INT)").as("sub"),
        expr(s"CAST(pos % $w AS INT)").as("j"), col("v"))
      .groupBy("label", "sub", "j")
      .agg((sum(col("v").cast("decimal(18,9)")).cast("double") /
        count(lit(1))).as("c"))
      .groupBy("label", "sub")
      .agg(expr(
        "transform(array_sort(collect_list(struct(j, c))), s -> CAST(s.c AS FLOAT))")
        .as("centroid"))
      .select(col("sub"), col("label").as("code"), col("centroid"))
  }

  /** Label-free codebooks: [[IvfStorage.kmeansCentroids]] run per subspace
    * over the sliced corpus — m small deterministic k-means fits (the
    * standard PQ training), codes 0..k−1 per subspace. The driver loop is
    * over m (a constant), not the data. */
  def kmeansCodebooks(embeddings: DataFrame, m: Int, dim: Int, k: Int,
      iters: Int = 5): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    require(k <= 256, s"k=$k codes per subspace cannot pack into one byte")
    val w = dim / m
    (0 until m).map { s =>
      IvfStorage.kmeansCentroids(
        embeddings.select(col("vec_id"),
          slice(col("embedding"), s * w + 1, w).as("embedding")),
        k, iters)
        .select(lit(s).as("sub"), (col("cent_id") - 1).as("code"),
          col("centroid"))
    }.reduce(_ unionByName _)
  }

  /** The codebook table packed into the ONE broadcastable `cbs` row the
    * encode kernel consumes. Sort order (sub, code) is the kernel ABI —
    * every call site must build it here (the
    * [[IvfStorage.paramArray]] convention). */
  def codebookArray(codebooks: DataFrame): DataFrame =
    codebooks.agg(
      array_sort(collect_list(struct(col("sub"), col("code"), col("centroid"))))
        .as("cbs"))

  /** Encode a corpus → (vec_id, codes array<int>, one entry per subspace).
    * One broadcast projection, ZERO shuffle — the native `pq_encode`
    * kernel; [[encodeReference]] is the explode/join/rank formulation it
    * is spec-pinned against (and the shape the q107 oracle mirrors). */
  def encode(embeddings: DataFrame, codebooks: DataFrame): DataFrame =
    embeddings.crossJoin(broadcast(codebookArray(codebooks)))
      .select(col("vec_id"),
        call_function("pq_encode", col("embedding"), col("cbs")).as("codes"))

  /** [[encode]] through the DataFrame formulation — subvector explode,
    * broadcast codebook join, sequential-fold squared L2, rank window
    * (dist ASC, code ASC), reassemble. The semantic reference the kernel
    * is pinned against (PqSpec); shuffles m× the corpus rows twice, which
    * is why the kernel exists. */
  private[operators] def encodeReference(embeddings: DataFrame,
      codebooks: DataFrame, m: Int, dim: Int): DataFrame = {
    val w = dim / m
    val subs = embeddings.select(col("vec_id"),
      posexplode(expr(
        s"transform(sequence(0, $m - 1), s -> slice(embedding, s * $w + 1, $w))"))
        .as(Seq("sub", "svec")))
      .select(col("vec_id"), col("sub").cast("int").as("sub"), col("svec"))
    val dists = subs.join(broadcast(codebooks), "sub")
      .withColumn("dist", aggregate(
        zip_with(col("svec"), col("centroid"),
          (x, y) => (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        lit(0.0), (a, x) => a + x))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id", "sub")
      .orderBy(col("dist").asc, col("code").asc)
    dists.withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .groupBy("vec_id")
      .agg(expr(
        "transform(array_sort(collect_list(struct(sub, code))), s -> s.code)")
        .as("codes"))
  }

  /** One-time reorganization: the IVFADC lake — m-BYTE packed codes
    * ([[graft.plans.Int8Pack]], requires k ≤ 256 per subspace),
    * partitioned by coarse IVF cell so probes prune to nProbe cells. The
    * float lake stays separate for the re-rank, as in
    * [[IvfStorage.writeQuantizedCellPartitioned]]. */
  /** The IVFADC-lake row projection (vec_id, codes binary m bytes,
    * cent_id) — shared by the batch writer and
    * [[graft.streaming.VectorStream]]'s packed ingest so stream and
    * batch lakes are the same bytes. */
  def packedProjection(embeddings: DataFrame, centroids: DataFrame,
      codebooks: DataFrame): DataFrame =
    IvfStorage.assignCells(embeddings, centroids)
      .crossJoin(broadcast(codebookArray(codebooks)))
      .select(col("vec_id"),
        call_function("int8_pack",
          call_function("pq_encode", col("embedding"), col("cbs"))).as("codes"),
        col("cent_id"))

  def writePackedCellPartitioned(embeddings: DataFrame, centroids: DataFrame,
      codebooks: DataFrame, dir: String): Unit =
    packedProjection(embeddings, centroids, codebooks)
      .repartition(col("cent_id"))
      .write.mode("overwrite").partitionBy("cent_id").parquet(dir)

  /** The per-query ADC lookup table: exact squared L2 from the query's
    * subvectors to every codebook entry, flattened (sub-major, code-minor)
    * into ONE array<double> row — m·k doubles, broadcast into the probe
    * scan. Distances use the same sequential double fold as the encode. */
  def adcTable(codebooks: DataFrame, queryVec: Array[Float], m: Int,
      dim: Int): DataFrame = {
    val w = dim / m
    codebooks
      .withColumn("q_emb", typedLit(queryVec))
      .withColumn("qsub", expr(s"slice(q_emb, sub * $w + 1, $w)"))
      .withColumn("dist", aggregate(
        zip_with(col("qsub"), col("centroid"),
          (x, y) => (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        lit(0.0), (a, x) => a + x))
      .agg(expr(
        "transform(array_sort(collect_list(struct(sub, code, dist))), s -> s.dist)")
        .as("adc_table"))
  }

  /** IVFADC probe: prune to the nProbe cells nearest the query, ADC
    * pre-rank the packed codes (SMALLEST approximate distance first — the
    * kernel reads the broadcast table per row), shortlist preK, exact
    * cosine re-rank on the float originals by vec_id. preK is the recall
    * knob, as in [[IvfStorage.probeQuantized]]; ADC rank errors are
    * bounded by per-subspace quantization error, so a small multiple of k
    * recovers the quantizer's local reorderings. */
  def probePacked(spark: SparkSession, dir: String, floatLake: DataFrame,
      centroids: DataFrame, codebooks: DataFrame, queryVec: Array[Float],
      m: Int, dim: Int, nProbe: Int = 2, k: Int = 10,
      preK: Int = 40): DataFrame = {
    val qDf = spark.createDataFrame(Seq(Tuple1(queryVec))).toDF("q_emb")
    val cells = centroids.crossJoin(broadcast(qDf))
      .orderBy(cosineNative(col("centroid"), col("q_emb")).desc_nulls_last,
        col("cent_id"))
      .limit(nProbe)
      .select("cent_id").collect().map(_.get(0)).toSeq
    val shortlist = spark.read.parquet(dir)
      .filter(col("cent_id").isin(cells.map(lit): _*))
      .crossJoin(broadcast(adcTable(codebooks, queryVec, m, dim)))
      .select(col("vec_id"),
        call_function("pq_adc_score", col("codes"), col("adc_table"))
          .as("adc_dist"))
      .orderBy(col("adc_dist").asc_nulls_last, col("vec_id"))
      .limit(preK)
    shortlist.join(floatLake.select(col("vec_id"), col("embedding")),
        Seq("vec_id"))
      .crossJoin(broadcast(qDf))
      .select(col("vec_id"),
        cosineNative(col("embedding"), col("q_emb")).as("cos"))
      .orderBy(col("cos").desc_nulls_last, col("vec_id"))
      .limit(k)
  }
}

package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.IvfStorage
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The full streaming maintenance loop for the IVF vector lake — the piece
  * beyond VectorStreamSpec's ingest identities: the DRIFT SIGNAL a stream
  * publishes must actually FEED [[IvfStorage.recenter]].
  *
  * Scenario: wave 1 streams in-distribution vectors under frozen
  * centroids; wave 2 streams a DRIFTED batch (every coordinate shifted);
  * the per-batch observed metrics on the streaming query show the
  * assignment-cosine decay as it happens, [[IvfStorage.driftReport]] turns
  * it into flagged cells, and `recenter` over exactly those cells restores
  * quantizer health on the STREAM-BUILT lake — probes agree with a batch
  * rebuild of the same rows under the refreshed centroids.
  */
class StreamingVectorIngestSpec extends SparkSpec {

  test("streamed drift metrics feed driftReport → recenter; probes match a batch rebuild") {
    val src = tmpDir("svi-src"); val lake = tmpDir("svi-lake")
    val ckpt = tmpDir("svi-ckpt")
    val emb = Tables.embeddings(spark, sfDir)
      .filter(size(col("embedding")) === 64 &&
        !exists(col("embedding"), x => x.isNull))
      .select("vec_id", "embedding")
    val n = emb.count()
    val cents = IvfStorage.labelCentroids(
      Tables.embeddings(spark, sfDir)
        .filter(size(col("embedding")) === 64 &&
          !exists(col("embedding"), x => x.isNull)))
    def run() = {
      val q = VectorStream.startCellPartitioned(
        spark.readStream.schema(emb.schema).parquet(src), cents, lake, ckpt,
        Trigger.AvailableNow())
      q.awaitTermination(120000)
      q
    }
    // wave 1: in-distribution
    emb.write.mode("append").parquet(src)
    val q1 = run()
    def meanCos(q: org.apache.spark.sql.streaming.StreamingQuery): Double = {
      val obs = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("vector_ingest_drift")))
        .filter(_.getAs[Long]("rows") > 0)
      assert(obs.nonEmpty, "no drift metrics on progress")
      obs.map(_.getAs[Double]("mean_assign_cos")).min
    }
    val cos1 = meanCos(q1)

    // wave 2: drifted — every coordinate shifted by +0.5, new ids
    emb.select((col("vec_id") + n).as("vec_id"),
        expr("transform(embedding, x -> CAST(x + 0.5 AS FLOAT))")
          .as("embedding"))
      .write.mode("append").parquet(src)
    val q2 = run()
    val cos2 = meanCos(q2)
    // the STREAM's own observed metric shows the decay — this is the
    // monitoring signal that triggers maintenance
    assert(cos2 < cos1,
      s"drifted wave must decay the observed assign-cos: $cos1 -> $cos2")

    // maintenance: driftReport flags the unhealthy cells (mean member
    // cosine below wave-1's floor), recenter refits exactly those.
    // Everything derived from the PRE-swap lake is COLLECTED before the
    // recenter: the swap replaces cell directories, so pre-swap
    // DataFrames must not be re-executed afterwards (the recenter reader
    // contract). partitionColumnTypeInference is off session-wide, so
    // the cent_id partition column surfaces as string — normalize to Int.
    val reportRows = IvfStorage.driftReport(spark, lake, cents)
      .select("cent_id", "mean_cos").collect()
      .map(r => r.get(0).toString.toInt -> r.getDouble(1)).toMap
    val flagged = reportRows.filter(_._2 < cos1).keys.toSeq.sorted
    assert(flagged.nonEmpty, "drifted lake must flag cells")
    val before = flagged.map(reportRows).sum / flagged.size
    val res = IvfStorage.recenter(spark, lake, cents, flagged)
    assert(res.rewrittenCells.nonEmpty && res.movedRows >= 0)

    // the recentered stream-built lake: no rows lost, quantizer health
    // restored on the flagged cells
    val after = spark.read.parquet(lake)
    assert(after.count() == 2 * n, "recenter must not lose rows")
    val healedRows = IvfStorage.driftReport(spark, lake, res.centroids)
      .select("cent_id", "mean_cos").collect()
      .map(r => r.get(0).toString.toInt -> r.getDouble(1)).toMap
    val healed = flagged.flatMap(healedRows.get).sum / flagged.size
    assert(healed > before,
      s"refit must improve flagged-cell health: $before -> $healed")

    // probe identity: the maintained stream lake answers exactly like a
    // batch lake built from the same rows under the refreshed centroids
    val allRows = emb.unionByName(
      emb.select((col("vec_id") + n).as("vec_id"),
        expr("transform(embedding, x -> CAST(x + 0.5 AS FLOAT))")
          .as("embedding")))
    val batchLake = tmpDir("svi-batch-lake")
    IvfStorage.writeCellPartitioned(allRows, res.centroids, batchLake)
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val got = IvfStorage.probe(spark, lake, res.centroids, qv,
      nProbe = 2, k = 5).collect().toSeq
    val want = IvfStorage.probe(spark, batchLake, res.centroids, qv,
      nProbe = 2, k = 5).collect().toSeq
    assert(got == want)
  }
}

package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY §2B Q36–Q37 + the
  * ANN scale path).
  */
object VectorQueries extends QueryGroup {

  /** Q38: brute-force cosine top-10 vs a fixed query vector (the embedding of
    * vec_id=0). The 1-row query side is broadcast; the scan side streams —
    * this is the exact-baseline shape (at 100 TB you still want it for
    * re-ranking ANN candidates). */
  private val q38: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    e.crossJoin(broadcast(q))
      .select(col("vec_id"), cosineNative(col("embedding"), col("q_emb")).as("cos"))
      .orderBy(col("cos").desc_nulls_last, col("vec_id"))
      .limit(10)
  }

  /** Q39: pairwise near-neighbor join: same-label blocking, vec_id ordering,
    * cosine > 0.25. Blocking bounds the pair count (the all-pairs join is
    * O(n²) — label/LSH blocking is what survives scale; see Q43 for the
    * LSH-bucketed variant). */
  private val q39: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id").as("a_id"), col("label"),
      col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("label").as("b_label"),
      col("embedding").as("b_emb"))
    a.join(b, col("label") === col("b_label") && col("a_id") < col("b_id"))
      .withColumn("cos", cosineNative(col("a_emb"), col("b_emb")))
      .filter(col("cos") > 0.25)
      .select("a_id", "b_id", "cos")
      .orderBy("a_id", "b_id")
  }

  /** Q69: embedding-cosine near-dup RESOLUTION — the vector-space member of
    * the dedup family: same-label pairs with cosine ≥ τ (0.35 is the
    * near-dup regime on this synthetic corpus; semantic-dedup pipelines
    * tune τ per embedding model) feed connected components, and every
    * vector gets the min vec_id of its duplicate cluster as keeper. Same
    * resolution shape as q66; at scale the pair stage swaps to the q43/q51
    * ANN candidates with this exact-cosine filter as the re-rank. */
  private val q69: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id").as("a_id"), col("label"),
      col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("label").as("b_label"),
      col("embedding").as("b_emb"))
    val pairs = a.join(b, col("label") === col("b_label") && col("a_id") < col("b_id"))
      .filter(cosineNative(col("a_emb"), col("b_emb")) >= 0.35)
      .select(col("a_id").as("a"), col("b_id").as("b"))
    val comp = ConnectedComponents.run(pairs)
    e.select(col("vec_id"))
      .join(comp, col("vec_id") === col("node"), "left")
      .select(col("vec_id"),
        coalesce(col("component"), col("vec_id")).as("keeper"))
      .orderBy("vec_id")
  }

  /** Q43 ⚙: LSH-bucketed ANN — 6 deterministic pseudo-random hyperplanes give
    * a 6-bit signature; search the query's bucket plus Hamming<=2 probes
    * and rank by exact cosine. Engine-only: verified by ScalaTest for recall
    * against Q38's exact top-k. The signature is computed with codegen'd
    * higher-order functions; bucketing is one shuffle on the signature.
    */
  /** 6 deterministic pseudo-random hyperplanes → 6-bit bucket signature
    * (shared by q43's in-query bucketing and [[AnnStorage]]'s write-time
    * partitioning). Plane j component i = hash-derived value in [-0.5, 0.5).
    */
  def lshSigExpr(emb: String): String = {
    def planeBit(j: Int): String =
      s"""(aggregate(zip_with($emb, sequence(0, 63),
         |  (x, i) -> CAST(x AS DOUBLE) * ((CAST(pmod(xxhash64(concat('p$j#', i)), 1000) AS DOUBLE) / 1000.0) - 0.5)),
         |  CAST(0 AS DOUBLE), (a, x) -> a + x) > 0)""".stripMargin
    (0 until 6)
      .map(j => s"(CAST(${planeBit(j)} AS INT) * ${1 << j})")
      .mkString(" + ")
  }

  private val q43: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val sigged = e.withColumn("sig", expr(lshSigExpr("embedding")))
    val q = sigged.filter(col("vec_id") === 0)
      .select(col("sig").as("q_sig"), col("embedding").as("q_emb"))
    // multi-probe: exact bucket or Hamming distance 1
    sigged.crossJoin(broadcast(q))
      .filter(expr("bit_count(sig ^ q_sig) <= 2"))
      .select(col("vec_id"), cosineNative(col("embedding"), col("q_emb")).as("cos"))
      .orderBy(col("cos").desc_nulls_last, col("vec_id"))
      .limit(10)
  }

  /** Q51 ⚙: IVF-style ANN — coarse quantizer = per-label centroids; every
    * vector is assigned to its nearest centroid (one broadcast join over the
    * tiny centroid table); the query probes the nProbe nearest centroid
    * cells and ranks candidates by exact cosine. This is the structure that
    * scales: the full corpus is bucketed once (write-time partitioning at
    * 100 TB), per-query work is |cells probed| / |cells| of the data.
    */
  private val q51: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    // centroids: position-wise mean per label, re-assembled to arrays
    val cents = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg((sum(col("v").cast("decimal(18,9)")).cast("double") / count(lit(1))).as("c"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> CAST(s.c AS FLOAT))")
        .as("centroid"))
      .select(col("label").as("cent_id"), col("centroid"))
    // assign every vector to its nearest centroid cell: all centroids pack
    // into ONE broadcast row and the argmax is a per-row fold — no
    // crossJoin row expansion (corpus × n_centroids), no Window shuffle
    // over vec_id; ties break to the smallest cent_id (fold scans
    // cent_id-ascending, replaces only on strictly greater similarity)
    val centArr = cents
      .agg(array_sort(collect_list(struct(col("cent_id"), col("centroid")))).as("cents"))
    val best = aggregate(col("cents"),
      struct(lit(-2.0).as("sim"), lit(-1).as("cid")),
      (acc, c) => {
        val sim = cosineNative(col("embedding"), c.getField("centroid"))
        when(sim > acc.getField("sim"),
          struct(sim.as("sim"), c.getField("cent_id").as("cid"))).otherwise(acc)
      })
    val assigned = e.crossJoin(broadcast(centArr))
      .withColumn("cent_id", best.getField("cid"))
      .select(col("vec_id"), col("embedding"), col("cent_id"))
    // probe the 2 cells nearest to the query vector
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val probes = cents.crossJoin(broadcast(qv))
      .orderBy(cosineNative(col("centroid"), col("q_emb")).desc_nulls_last,
        col("cent_id"))
      .limit(2).select(col("cent_id").as("probe_id"))
    assigned.join(broadcast(probes), col("cent_id") === col("probe_id"))
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), cosineNative(col("embedding"), col("q_emb")).as("cos"))
      .orderBy(col("cos").desc_nulls_last, col("vec_id"))
      .limit(10)
  }

  val queries: Seq[(String, Q)] = Seq(
    "q38_sim_cosine_topk" -> q38,
    "q39_sim_neighbor_join" -> q39,
    "q69_dedup_embedding_cosine" -> q69,
    "q43_sim_ann_lsh" -> q43,
    "q51_sim_ann_ivf" -> q51,
  )

  val oracles: Map[String, String] = Map(
    "q38_sim_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, ${sqlCosine("embedding", "q_emb")} AS cos
         |FROM embeddings, q
         |ORDER BY cos DESC NULLS LAST, vec_id LIMIT 10""".stripMargin,

    "q39_sim_neighbor_join" ->
      s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  ${sqlCosine("a.embedding", "b.embedding")} AS cos
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${sqlCosine("a.embedding", "b.embedding")} > 0.25
         |ORDER BY a_id, b_id""".stripMargin,

    // q66's resolution oracle shape over cosine edges
    "q69_dedup_embedding_cosine" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT a.vec_id AS a, b.vec_id AS b
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${sqlCosine("a.embedding", "b.embedding")} >= 0.35),
         |sym AS (SELECT a AS n, b AS m FROM e UNION SELECT b AS n, a AS m FROM e),
         |reach(src, node) AS (
         |  SELECT n, n FROM (SELECT DISTINCT n FROM sym)
         |  UNION
         |  SELECT r.src, s.m FROM reach r JOIN sym s ON s.n = r.node),
         |comp AS (SELECT src, min(node) AS keeper FROM reach GROUP BY src)
         |SELECT v.vec_id, COALESCE(c.keeper, v.vec_id) AS keeper
         |FROM embeddings v LEFT JOIN comp c ON v.vec_id = c.src
         |ORDER BY vec_id""".stripMargin,
  )
}

package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
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
    * resolution shape as q66; at scale the pair stage swaps to the LSH
    * multi-probe candidates with the exact-cosine filter as the re-rank —
    * that variant exists as [[q70]] / [[annCosinePairs]]. */
  private val q69: Q = (s, d) =>
    cosineDedup(Tables.embeddings(s, d), collapseIdentical = true)

  /** q69 core. The components only READ the pair set, so exact-embedding
    * content groups collapse losslessly: a group is a clique (every
    * member-member cosine equals the group's self-cosine), so a STAR to
    * the group's min-id rep carries the same connectivity — star edges
    * are genuine graph edges (identical embeddings), emitted under the
    * SAME `cos ≥ τ` predicate the direct join applies — for a zero/NaN
    * embedding the self-cosine is NaN and Spark's NaN-is-greatest
    * ordering makes `NaN >= τ` TRUE, so BOTH paths connect zero-vector
    * groups identically (R17QuerySemanticsSpec pins it; do not "optimize"
    * the star filter away for NaN groups — it is what keeps grouped ≡
    * direct) — and cross-group reachability is decided entirely by REP
    * pairs, because cosine is a function of the embeddings alone. Pair
    * volume drops members² → groups² per label (the q157/q186 move on a
    * components consumer); grouped ≡ direct spec-pinned
    * (R17QuerySemanticsSpec, incl. the degenerate zero-vector edge). */
  private[graft] def cosineDedup(e: DataFrame,
      collapseIdentical: Boolean): DataFrame = {
    val pairs = if (!collapseIdentical) {
      // the uncollapsed reference: plain label-blocked pair join, bound
      // by measurement (the tiled variant measured slower at local
      // widths — SimilarityJoinSpec keeps the tiling's row-identity;
      // swap to tiledSelfPairs where few labels cap a 1000-way stage)
      val a = e.select(col("vec_id").as("a_id"), col("label"),
        col("embedding").as("a_emb"))
      val b = e.select(col("vec_id").as("b_id"), col("label").as("b_label"),
        col("embedding").as("b_emb"))
      a.join(b,
          col("label") === col("b_label") && col("a_id") < col("b_id"))
        .filter(cosineNative(col("a_emb"), col("b_emb")) >= 0.35)
        .select(col("a_id").as("a"), col("b_id").as("b"))
    } else {
      val gw = org.apache.spark.sql.expressions.Window
        .partitionBy("label", "embedding")
      val numbered = e.withColumn("grp_id", min("vec_id").over(gw))
      val star = numbered.filter(col("vec_id") =!= col("grp_id"))
        .filter(cosineNative(col("embedding"), col("embedding")) >= 0.35)
        .select(col("grp_id").as("a"), col("vec_id").as("b"))
      val reps = numbered.filter(col("vec_id") === col("grp_id"))
      val ra = reps.select(col("grp_id").as("a_id"), col("label"),
        col("embedding").as("a_emb"))
      val rb = reps.select(col("grp_id").as("b_id"),
        col("label").as("b_label"), col("embedding").as("b_emb"))
      val repPairs = ra.join(rb,
          col("label") === col("b_label") && col("a_id") < col("b_id"))
        .filter(cosineNative(col("a_emb"), col("b_emb")) >= 0.35)
        .select(col("a_id").as("a"), col("b_id").as("b"))
      star.unionByName(repPairs)
    }
    val comp = ConnectedComponents.run(pairs)
    e.select(col("vec_id"))
      .join(comp, col("vec_id") === col("node"), "left")
      .select(col("vec_id"),
        coalesce(col("component"), col("vec_id")).as("keeper"))
      .orderBy("vec_id")
  }

  /** ANN-backed pair stage for embedding-cosine dedup — the 100 TB variant
    * of [[q69]]'s per-label all-pairs join. Candidates are generated by LSH
    * multi-probe instead of exhaustive pairing: every vector gets the 6-bit
    * hyperplane signature ([[graft.plans.LshSignature]], shared with
    * q43/[[AnnStorage]]),
    * the probe side explodes each row to the signatures within Hamming
    * `radius` of its own (masks = [[AnnStorage.hammingBall]]), and the join
    * runs on (label, signature) — one shuffle whose volume is the bucket
    * collision count, observable via `ann_candidates`, NOT the per-label
    * quadratic. Survivors are re-ranked by EXACT cosine, so emitted pairs
    * are always a SUBSET of the exact join's (precision 1; recall is the
    * LSH trade, pinned by AnnCosineDedupSpec — `radius = 6` probes every
    * bucket and degenerates to the exact result). Each qualifying pair is
    * emitted exactly once: the mask linking a to b is uniquely a.sig^b.sig,
    * so no distinct pass is needed.
    *
    * Scale stability (measured, `ScaleBench ann`, BASELINE.md): the 6-bit /
    * Hamming≤2 parameters are corpus-size-INDEPENDENT — recall@10 vs the
    * exact top-k holds at 0.63–0.73 across a 10× corpus growth (radius 3:
    * 0.86–0.90, also flat), because signature buckets grow with the corpus
    * rather than multiplying. Contrast IvfStorage's nProbe, which must
    * scale with the cell count. Trade recall up with `radius` (probe cost
    * ×|ball|) or sharpen buckets with more planes, not with corpus size. */
  def annCosinePairs(e: DataFrame, tau: Double, radius: Int = 2,
      sigFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        lshSigNative): DataFrame = {
    val masks = AnnStorage.hammingBall(0, radius)
    val sigged = e.withColumn("sig", sigFn(col("embedding")))
    // explode the LITERAL mask array and xor after: the signature is never
    // referenced inside a lambda, so CollapseProject cannot inline its
    // computation into a per-mask re-evaluation — sig is computed once per
    // input row, the per-probe-row work is one integer xor
    val a = sigged.select(col("vec_id").as("a_id"), col("label"),
      col("embedding").as("a_emb"), col("sig"),
      explode(typedLit(masks)).as("m"))
      .select(col("a_id"), col("label"), col("a_emb"),
        col("sig").bitwiseXOR(col("m")).as("psig"))
    val b = sigged.select(col("vec_id").as("b_id"), col("label").as("b_label"),
      col("embedding").as("b_emb"), col("sig").as("b_sig"))
    a.join(b, col("label") === col("b_label") && col("psig") === col("b_sig") &&
        col("a_id") < col("b_id"))
      .observe("ann_candidates", count(lit(1)).as("candidates"))
      .filter(cosineNative(col("a_emb"), col("b_emb")) >= tau)
      .select(col("a_id").as("a"), col("b_id").as("b"))
  }

  /** Q70 ⚙: ANN-backed embedding-cosine near-dup resolution — q69's
    * resolution tail over [[annCosinePairs]] candidates instead of the
    * exact per-label quadratic. Engine-only (the pair stage is
    * approximate); recall vs the exact q69 pairs is spec-pinned. */
  private val q70: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val comp = ConnectedComponents.run(annCosinePairs(e, 0.35))
    e.select(col("vec_id"))
      .join(comp, col("vec_id") === col("node"), "left")
      .select(col("vec_id"),
        coalesce(col("component"), col("vec_id")).as("keeper"))
      .orderBy("vec_id")
  }

  /** Q70b: the DuckDB-oracled END-TO-END twin of [[q70]] — the ENTIRE
    * ANN-backed dedup pipeline (signature → Hamming-ball multi-probe
    * candidate join → exact-cosine filter → connected components → keeper
    * assignment) on the md5-plane signature ([[graft.plans.Md5LshSignature]],
    * the q43b convention) so every stage recomputes in SQL: the oracle
    * derives the same buckets, the same candidate pairs, the same edges,
    * and resolves components with the recursive-reachability CTE of the
    * q66/q69 oracles. Identical pipeline code to q70 — only the signature
    * kernel differs (`sigFn`). */
  private val q70b: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val comp = ConnectedComponents.run(
      annCosinePairs(e, 0.35, sigFn = md5LshSigNative))
    e.select(col("vec_id"))
      .join(comp, col("vec_id") === col("node"), "left")
      .select(col("vec_id"),
        coalesce(col("component"), col("vec_id")).as("keeper"))
      .orderBy("vec_id")
  }

  /** Q43 ⚙: LSH-bucketed ANN — 6 deterministic pseudo-random hyperplanes give
    * a 6-bit signature; search the query's bucket plus Hamming<=2 probes
    * and rank by exact cosine. Engine-only: verified by ScalaTest for recall
    * against Q38's exact top-k. The signature is the native codegen
    * [[graft.plans.LshSignature]] kernel; bucketing is one shuffle on the
    * signature.
    */
  /** SQL twin of the 6-bit hyperplane signature: plane j component i =
    * hash-derived value in [-0.5, 0.5). Retained as the SEMANTIC REFERENCE
    * for [[graft.plans.LshSignature]] (which q43/q70/[[AnnStorage]] actually
    * run) — parity is pinned by LshSignatureSpec; this formulation recomputes
    * the whole plane matrix per row in interpreted lambdas. */
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
    val sigged = e.withColumn("sig", lshSigNative(col("embedding")))
    val q = sigged.filter(col("vec_id") === 0)
      .select(col("sig").as("q_sig"), col("embedding").as("q_emb"))
    // multi-probe: exact bucket or Hamming distance 1
    sigged.crossJoin(broadcast(q))
      .filter(expr("bit_count(sig ^ q_sig) <= 2"))
      .select(col("vec_id"), cosineNative(col("embedding"), col("q_emb")).as("cos"))
      .orderBy(col("cos").desc_nulls_last, col("vec_id"))
      .limit(10)
  }

  /** Q43b: the DuckDB-oracled END-TO-END twin of [[q43]]'s LSH-ANN pipeline.
    * Identical structure — signature, broadcast of the query row, Hamming≤2
    * multi-probe bucket filter, exact-cosine re-rank, top-10 — but the
    * signature is [[graft.plans.Md5LshSignature]] (plane constants from md5,
    * the q41b/q42b convention) instead of the xxhash64-derived
    * [[graft.plans.LshSignature]], so DuckDB can recompute every stage:
    * plane matrix → signature → bucket candidates → cosine → top-k all
    * hash-match. The emitted (sig, hamming) columns pin the bucketing
    * itself, not just the final ranking. */
  private val q43b: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val sigged = e.withColumn("sig", md5LshSigNative(col("embedding")))
    val q = sigged.filter(col("vec_id") === 0)
      .select(col("sig").as("q_sig"), col("embedding").as("q_emb"))
    sigged.crossJoin(broadcast(q))
      .withColumn("hamming", expr("CAST(bit_count(sig ^ q_sig) AS BIGINT)"))
      .filter(col("hamming") <= 2)
      .select(col("vec_id"), col("sig").cast("long").as("sig"), col("hamming"),
        cosineNative(col("embedding"), col("q_emb")).as("cos"))
      .orderBy(col("cos").desc_nulls_last, col("vec_id"))
      .limit(10)
  }

  /** DuckDB fragment: bit j of the md5-plane signature — mirrors
    * [[graft.plans.Md5LshSignatureImpl]] exactly (plane value from the
    * first 15 md5 hex digits of `p<j>#<i>`, sequential left-fold dot,
    * 1-based list index i pairs with 0-based plane component i-1). */
  private def sqlMd5PlaneBit(j: Int): String =
    s"""(CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(range(1, least(len(embedding), 64) + 1),
       |      i -> CAST(embedding[i] AS DOUBLE) *
       |        ((CAST('0x' || substr(md5(concat('p$j#', i - 1)), 1, 15) AS BIGINT) % 1000) / 1000.0 - 0.5))),
       |    (acc, x) -> acc + x) > 0 THEN ${1 << j} ELSE 0 END)""".stripMargin

  /** Q51 ⚙: IVF-style ANN — coarse quantizer = per-label centroids; every
    * vector is assigned to its nearest centroid (one broadcast join over the
    * tiny centroid table); the query probes the nProbe nearest centroid
    * cells and ranks candidates by exact cosine. This is the structure that
    * scales: the full corpus is bucketed once (write-time partitioning at
    * 100 TB), per-query work is |cells probed| / |cells| of the data.
    */
  private val q51: Q = (s, d) => {
    // clean-vector precondition, explicit on BOTH engines: the oracle's
    // constant range(1, 65) unrolling would count phantom NULL positions
    // of a short vector into the centroid denominator, and an all-NULL
    // cosine row would fall to the smallest cent_id in SQL but to cell -1
    // in the fold — so malformed vectors are excluded up front rather
    // than left to diverge (the fixture is all-64-dim; TablesSchemaSpec
    // pins that, this pins the oracle against a fixture change)
    val e = Tables.embeddings(s, d)
      .filter(size(col("embedding")) === 64 &&
        !exists(col("embedding"), x => x.isNull))
    // centroids: position-wise mean per label, re-assembled to arrays;
    // assignment = broadcast fold, ties to the smallest cent_id — both
    // shared with the write-time layout (IvfStorage, the one-time 100 TB
    // shape whose probe is a partition-pruned scan)
    val cents = IvfStorage.labelCentroids(e)
    val assigned = IvfStorage.assignCells(e, cents)
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

  /** Q96: contrastive hard-negative mining — for each anchor vector
    * (vec_id < 20), the top-3 most cosine-similar vectors of a DIFFERENT
    * label: the exact negatives a contrastive/embedding trainer wants
    * (similar but wrong). The anchor set broadcasts (it is query-sized by
    * construction); the corpus side streams through one scan, and the
    * per-anchor top-k is a rank window partitioned by ANCHOR — parallelism
    * = number of anchors, never a global sort. At 100 TB the corpus side
    * swaps to the LSH/IVF candidate stages (q43/q51) with this exact
    * ranking as the re-rank, same as every ANN family member. Ties break
    * to the smaller candidate id, so the rank is total on both engines. */
  private val q96: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val anchors = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
        col("embedding").as("a_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("anchor_id")
      .orderBy(col("cos").desc, col("neg_id"))
    e.select(col("vec_id").as("neg_id"), col("label"), col("embedding"))
      .join(broadcast(anchors), col("label") =!= col("a_label"))
      .withColumn("cos", cosineNative(col("embedding"), col("a_emb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("anchor_id"), col("neg_id"), col("cos"), col("rank"))
      .orderBy("anchor_id", "rank")
  }

  /** Q101: int8 scalar quantization of the embedding lake
    * ([[IvfStorage.quantize]]) — per-dimension affine codes 0..255 plus
    * the per-vector worst integer-space reconstruction error. The whole
    * map runs in integer space (floor(x·10⁶) → BIGINT min/max → integer
    * div), so DuckDB reproduces it bit-exactly; see the quantization
    * section of [[IvfStorage]] for the determinism argument. This is the
    * write-time half of the quantized ANN path; the probe half
    * ([[IvfStorage.probeQuantized]]) is spec-pinned and recall-measured
    * (`ScaleBench ann`, BASELINE.md). */
  private val q101: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    IvfStorage.quantize(e, IvfStorage.quantizationParams(e))
      // hex(int8_pack(...)) is the lake's actual 1-byte/dim storage layout
      // surfaced as a scalar — declared-query outputs must be scalar
      // columns (the driver's canonicalizer cannot sort array cells)
      .select(col("vec_id"),
        hex(call_function("int8_pack", col("codes"))).as("codes_hex"),
        col("max_err"))
      .orderBy("vec_id")
  }

  /** Q236: IVF nprobe recall sweep — the TUNING TABLE behind every IVF
    * deployment knob: recall@1 as a function of how many cells a probe
    * visits (nprobe ∈ {1, 2, 4}), measured against the brute-force
    * ground truth on deterministic probes (every 50th vector). This is
    * the number that prices q51/q108's partition pruning: nprobe=1 reads
    * ~1/cells of the lake and misses whenever the true neighbor sits
    * across a cell boundary; the sweep says exactly how often. All three
    * settings are evaluated IN ONE PASS — the probe×cell rank table
    * (tiny) explodes against the nprobe spine, candidate pairs join once
    * and the per-(nprobe, probe) argmax is a rank-1 window; probes whose
    * visited cells hold no candidate count as misses via the spine left
    * join. recall_pm is an exact integer per-mille.
    *
    * Scale shape: ground truth is the declared brute-force baseline
    * (q38/q69 precedent); the swept side touches only vectors in visited
    * cells — at production scale that IS the probe cost being measured.
    * Candidates collapse to each exact-embedding content group's two
    * smallest ids (the q234 argument: every pick here is a rank-1 window
    * over (cos DESC, c_id ASC), and cell assignment is a function of the
    * embedding, so a non-representative member can never win either the
    * exact or the ANN argmax) — the replica-stress quadratic goes linear
    * (sf1: 52 → ~4 s) with the sf0.01 oracle unchanged;
    * R16QuerySemanticsSpec pins collapsed ≡ direct on a replicated
    * fixture. */
  private val q236: Q = (s, d) =>
    ivfNprobeSweep(s, Tables.embeddings(s, d), collapseIdentical = true)

  /** q236 core; `collapseIdentical` as in [[quantizationFidelity]]. */
  private[operators] def ivfNprobeSweep(
      s: org.apache.spark.sql.SparkSession, eAll: DataFrame,
      collapseIdentical: Boolean): DataFrame = {
    val e = eAll
      .filter(size(col("embedding")) === 64 &&
        !exists(col("embedding"), x => x.isNull))
    val cents = IvfStorage.labelCentroids(e)
    val asg = IvfStorage.assignCells(e, cents)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    RunScopedCache.releaseAfterRun(s, asg)
    val probes = asg.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
    val W = org.apache.spark.sql.expressions.Window
    val cand = if (collapseIdentical) {
      asg.withColumn("_crn", row_number().over(
          W.partitionBy("embedding").orderBy("vec_id")))
        .filter(col("_crn") <= 2).drop("_crn")
    } else asg
    val allp = cand
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("cent_id").as("c_cell"))
      .join(broadcast(probes), col("c_id") =!= col("p_id"))
      .withColumn("cos", cosineNative(col("p_emb"), col("c_emb")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    RunScopedCache.releaseAfterRun(s, allp)
    val g1 = allp.withColumn("rn", row_number().over(W.partitionBy("p_id")
        .orderBy(col("cos").desc_nulls_last, col("c_id"))))
      .filter(col("rn") === 1).select(col("p_id"), col("c_id").as("g_id"))
    val cr = probes.crossJoin(broadcast(cents))
      .withColumn("crk", row_number().over(W.partitionBy("p_id")
        .orderBy(cosineNative(col("centroid"), col("p_emb"))
          .desc_nulls_last, col("cent_id"))))
      .select(col("p_id"), col("cent_id").as("c_cell"), col("crk"),
        explode(lit(Array(1L, 2L, 4L))).as("nprobe"))
      .filter(col("crk") <= col("nprobe"))
    val a1 = allp.join(cr, Seq("p_id", "c_cell"))
      .withColumn("rn", row_number().over(
        W.partitionBy("nprobe", "p_id")
          .orderBy(col("cos").desc_nulls_last, col("c_id"))))
      .filter(col("rn") === 1)
      .select(col("nprobe"), col("p_id"), col("c_id").as("a_id"))
    probes.select(col("p_id"), explode(lit(Array(1L, 2L, 4L))).as("nprobe"))
      .join(g1, "p_id")
      .join(a1, Seq("nprobe", "p_id"), "left")
      .groupBy("nprobe")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("a_id") === col("g_id"), 1L).otherwise(0L))
          .as("hits"))
      .select(col("nprobe"), col("n_probes"), col("hits"),
        expr("(1000 * hits) div n_probes").as("recall_pm"))
      .orderBy("nprobe")
  }

  /** Q234: quantization retrieval-FIDELITY audit — the end-to-end question
    * q101's max_err and q216's distance-preservation only bound: does the
    * int8 lake return the SAME neighbors the float lake would? Every 50th
    * vector probes (deterministic id stride — the q58 hash-sample role
    * without the hash, since ids are already arbitrary): top-1 by exact
    * float cosine vs top-1 by CENTERED INTEGER code dot
    * Σ(2c_a−255)(2c_b−255) — the similarity an int8 engine actually
    * computes, exact BIGINT so ranking never wobbles — plus the float-cos
    * REGRET of the code choice (how much similarity the approximation
    * cost, not just whether ids match). Quantization runs UNFILTERED like
    * q101 (params see every row; the oracle core is shared), the audit
    * joins back to the well-formed 64-dim slice.
    *
    * Scale shape: the probe slice broadcasts against the candidate scan
    * (the q96/q113 broadcast-probe shape); per-probe argmaxes are rank-1
    * windows. Brute-force candidates are the VERIFICATION baseline by
    * design (the q38/q69 precedent) — a production run blocks candidates
    * by q104's cells first. */
  private val q234: Q = (s, d) =>
    quantizationFidelity(Tables.embeddings(s, d), collapseIdentical = true)

  /** q234 core. `collapseIdentical` cuts the probes × corpus product by
    * the corpus's duplication factor: candidates sharing an EXACT
    * (embedding, codes) content are interchangeable up to the id
    * tie-break, so only each content group's two smallest ids flow into
    * the pair join — two, not one, because a probe inside the group
    * excludes itself (`c_id =!= p_id`) and must still be able to see a
    * group member. Output-identical to the direct path by the argmax
    * tie-break argument: both rankings order (score DESC, c_id ASC), a
    * non-representative member has the same score as its rep but a
    * larger id, so it can never win — R16QuerySemanticsSpec pins the two
    * paths on a replicated fixture; the sf0.01 oracle recomputes brute
    * force from raw vectors and still hash-matches. */
  private[operators] def quantizationFidelity(eAll: DataFrame,
      collapseIdentical: Boolean): DataFrame = {
    val s = eAll.sparkSession
    val valid = eAll.filter(size(col("embedding")) === 64 &&
      !exists(col("embedding"), x => x.isNull))
    // NOT persisted: `coded` would only ever appear NESTED inside the
    // `sims` cache below, so the run-scoped release listener could never
    // see its InMemoryRelation in any final plan and it would pin for the
    // rest of the session (the round-11 nested-cache rule). Recomputing
    // the quantize projection twice inside the one `sims` materialization
    // (broadcast probes side + candidate scan side) is strictly cheaper.
    val coded = IvfStorage.quantize(eAll, IvfStorage.quantizationParams(eAll))
      .select(col("vec_id"), col("codes"))
      .join(valid.select("vec_id", "embedding"), "vec_id")
    val probes = coded.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"),
        col("codes").as("p_codes"))
    val candidates0 = if (collapseIdentical) {
      val candW = org.apache.spark.sql.expressions.Window
        .partitionBy("embedding", "codes").orderBy("vec_id")
      coded.withColumn("_crn", row_number().over(candW))
        .filter(col("_crn") <= 2).drop("_crn")
    } else coded
    // persisted: the pairwise similarity table feeds BOTH argmax branches,
    // and both branches read it DIRECTLY, so its IMR is visible in the
    // final join's executed plan and the release listener fires. The
    // centered integer dot is the NATIVE kernel — the interpreted
    // zip_with/aggregate twin of centered_int_dot was the dominant
    // per-pair cost of this audit (r16 sf1: 123 s, kernel+collapse: ~2 s).
    val sims = candidates0
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("codes").as("c_codes"))
      .join(broadcast(probes), col("c_id") =!= col("p_id"))
      .select(col("p_id"), col("c_id"),
        cosineNative(col("p_emb"), col("c_emb")).as("cos"),
        call_function("centered_int_dot", col("p_codes"), col("c_codes"))
          .as("idot"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    RunScopedCache.releaseAfterRun(s, sims)
    val wF = org.apache.spark.sql.expressions.Window.partitionBy("p_id")
      .orderBy(col("cos").desc_nulls_last, col("c_id"))
    val wC = org.apache.spark.sql.expressions.Window.partitionBy("p_id")
      .orderBy(col("idot").desc, col("c_id"))
    val f = sims.withColumn("rf", row_number().over(wF))
      .filter(col("rf") === 1)
      .select(col("p_id"), col("c_id").as("top1_float"),
        col("cos").as("cos_float_best"))
    val cc = sims.withColumn("rc", row_number().over(wC))
      .filter(col("rc") === 1)
      .select(col("p_id"), col("c_id").as("top1_code"),
        col("cos").as("cos_code_choice"), col("idot").as("idot_best"))
    f.join(cc, "p_id")
      .select(col("p_id").as("vec_id"), col("top1_float"),
        col("top1_code"),
        (col("top1_float") === col("top1_code")).as("agree"),
        col("cos_float_best"), col("cos_code_choice"),
        (col("cos_float_best") - col("cos_code_choice")).as("regret"),
        col("idot_best"))
      .orderBy("vec_id")
  }

  /** Q233: per-dimension Fisher separability of the quantized lake — the
    * embedding-health diagnostic between q199's per-vector outliers and
    * q183's temporal drift: per DIMENSION, the classic F-ratio
    * B_d / W_d (between-class over within-class scatter [Fisher 1936])
    * measured on the q101 int8 CODES, i.e. on the bytes the lake
    * actually stores — a dimension whose classes don't separate in code
    * space contributes nothing to quantized ANN or SemDeDup blocking and
    * is a candidate for the q216 projection to drop. Codes make every
    * power sum a BIGINT (Σc, Σc² per (label, dim)); the per-label
    * scatter terms are then FIXED double expressions over those integers
    * combined by a label-ordered SEQUENTIAL fold (the q136/q90
    * convention — never an unordered double sum), so DuckDB reproduces
    * every double bit-for-bit.
    *
    * Scale shape: one quantize scan, one (label, dim)-keyed partial agg
    * (labels × dims rows — tiny), folds over ≤ labels-sized arrays. */
  private val q233: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val codes = IvfStorage.quantize(e, IvfStorage.quantizationParams(e))
      .select(col("vec_id"), col("codes"))
      .join(e.select(col("vec_id"), col("label")), "vec_id")
      .select(col("label"), posexplode(col("codes")).as(Seq("pos", "code")))
    val st = codes.groupBy("label", "pos")
      .agg(count(lit(1)).as("n"),
        sum(col("code").cast("long")).as("sv"),
        sum((col("code") * col("code")).cast("long")).as("sv2"))
    val tot = st.groupBy("pos")
      .agg(sum("n").as("nt"), sum("sv").as("svt"))
    val tm = st.join(tot, "pos")
      .withColumn("term_w", col("sv2").cast("double") -
        col("sv").cast("double") * col("sv") / col("n"))
      .withColumn("dmu", col("sv").cast("double") / col("n") -
        col("svt").cast("double") / col("nt"))
      .withColumn("term_b",
        col("n").cast("double") * col("dmu") * col("dmu"))
    tm.groupBy("pos")
      .agg(count(lit(1)).as("n_labels"),
        aggregate(array_sort(collect_list(struct(col("label"),
            col("term_w").as("w")))),
          lit(0.0), (a, x) => a + x.getField("w")).as("w_scatter"),
        aggregate(array_sort(collect_list(struct(col("label"),
            col("term_b").as("b")))),
          lit(0.0), (a, x) => a + x.getField("b")).as("b_scatter"))
      .select(col("pos").cast("long").as("pos"),
        col("n_labels").cast("long").as("n_labels"),
        col("w_scatter"), col("b_scatter"),
        when(col("w_scatter") > 0,
          col("b_scatter") / col("w_scatter")).as("f_ratio"))
      .orderBy("pos")
  }

  /** Q216: Johnson–Lindenstrauss random projection of the int8-quantized
    * embedding lake ([Achlioptas 2003] ±1 signs — the database-friendly
    * JL family) with a distance-preservation audit: project every
    * 64-dim code vector to 16 dims through a FIXED md5-parity sign
    * matrix (data-independent, identical in both engines), then for the
    * deterministic (id, id+1 | id ≡ 0 mod 5) pair grid compare exact
    * squared distances before and after — distortion_pm is the integer
    * per-mille of the E[d²_proj] = K·d²_orig identity. This is the
    * dimension-reduction step in front of ANN at 100 TB: a 4× narrower
    * vector quarters every probe's bandwidth, and the audit prices what
    * that costs in geometry. All arithmetic is exact BIGINT (codes ≤
    * 255, projections ≤ 64·255 — squared-distance sums fit comfortably).
    *
    * Shape: quantization is the q101 map-only broadcast path; the
    * projection and both distance sums are literal-unrolled builtin
    * column algebra (64·16 terms — fully inside whole-stage codegen,
    * repeated element_at subtrees collapse under codegen subexpression
    * elimination; never a posexplode/join reassembly, which would
    * exchange 64× the lake); the pair stage is one equi-join on the
    * shifted id. */
  private val q216: Q = (s, d) => {
    val D = 64; val K = 16
    def md5p32(v: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        dig.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val signs = Array.tabulate(D, K)((i, j) =>
      if (md5p32(s"jl:$i:$j") % 2 == 0) 1L else -1L)
    val e = Tables.embeddings(s, d)
    val pr = IvfStorage.quantize(e, IvfStorage.quantizationParams(e))
      .select(col("vec_id"), col("codes"),
        array((0 until K).map { j =>
          (0 until D).map(i =>
            element_at(col("codes"), i + 1).cast("long") *
              lit(signs(i)(j))).reduce(_ + _)
        }: _*).as("proj"))
    val pairs = pr.as("a")
      .join(pr.as("b"),
        col("a.vec_id") % 5 === 0 &&
          col("b.vec_id") === col("a.vec_id") + 1)
    val d2o = (0 until D).map { i =>
      val diff = element_at(col("a.codes"), i + 1).cast("long") -
        element_at(col("b.codes"), i + 1)
      diff * diff
    }.reduce(_ + _)
    val d2p = (0 until K).map { j =>
      val diff = element_at(col("a.proj"), j + 1) -
        element_at(col("b.proj"), j + 1)
      diff * diff
    }.reduce(_ + _)
    pairs.select(col("a.vec_id").as("vec_id_a"),
        col("b.vec_id").as("vec_id_b"),
        d2o.as("d2_orig"), d2p.as("d2_proj"))
      .withColumn("distortion_pm",
        when(col("d2_orig") > 0,
          expr(s"(1000 * d2_proj) div (${K}L * d2_orig)")))
      .orderBy("vec_id_a")
  }

  /** Q104: SemDeDup-style semantic dedup over LEARNED clusters — the
    * published recipe (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): cluster the embedding
    * corpus with a k-means-family coarse quantizer, then deduplicate ONLY
    * within each cluster (cosine ≥ τ pairs → connected components → keep
    * the minimum id), so the pair stage is ∑|cell|² instead of n² and
    * needs no metadata. This is the blocking q69 gets from labels, derived
    * from the DATA — the variant a real corpus (no labels) actually runs,
    * with [[IvfStorage.kmeansCentroids]] as the production quantizer. The
    * declared query instantiates the quantizer as [[IvfStorage.labelCentroids]]
    * (exact decimal means — the q51 convention) so DuckDB recomputes the
    * ENTIRE pipeline: centroids → nearest-cell assignment → within-cell
    * cosine edges → component resolution → keeper flags. Assignment is the
    * native `nearest_centroid` kernel; note cells ≠ labels (a vector near
    * another label's centroid crosses over — the assignment is genuinely
    * geometric, which the oracle's rank-window mirror reproduces).
    *
    * Scale shape: one broadcast-assign scan, a cell-blocked pair join
    * (escalation path: [[SimilarityJoin.tiledSelfPairs]] when cells
    * outgrow a task, the q69-documented trade), CC over the survivor
    * edges, one join back. At 100 TB the cell count grows with the corpus
    * (constant cell size — IvfStorage's scaling rule), keeping per-cell
    * pair products bounded. */
  private val q104: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .filter(size(col("embedding")) === 64 &&
        !exists(col("embedding"), x => x.isNull))
    semanticDedup(e, tau = 0.35, collapseIdentical = true)
  }

  /** q104 core. `collapseIdentical` applies the [[DedupReport]] clique
    * argument at EXACT-embedding granularity: identical vectors in one
    * cell form a cos≈1 clique and pair identically to everything outside
    * it, so the pair join runs over (cell, embedding)-group REPRESENTATIVES
    * only and members inherit their rep's component — the rep-graph label
    * IS the cluster min because each group's min member is its rep.
    * Provably output-identical (R14QuerySemanticsSpec pins both paths on a
    * replicated fixture; the sf0.01 oracle recomputes from raw vectors and
    * still hash-matches); a duplicate-heavy corpus pays dup× less in the
    * quadratic stage — the sf1 identical-replica stress most of all. */
  private[operators] def semanticDedup(e: DataFrame, tau: Double,
      collapseIdentical: Boolean): DataFrame = {
    val s = e.sparkSession
    val cents = IvfStorage.labelCentroids(e)
    val grpW = org.apache.spark.sql.expressions.Window
      .partitionBy("cent_id", "embedding")
    // persisted: the assignment subtree (centroid agg + broadcast argmax
    // scan) feeds BOTH pair-join sides and the final keeper join — without
    // this it recomputes three times, once per consumer (q95 run-scoped
    // cache discipline)
    val assigned0 = IvfStorage.assignCells(e, cents)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
    // Degenerate-embedding guard: the clique argument needs cos(x, x) ≥ τ
    // for every collapsed member. A zero-norm or NaN-containing embedding
    // yields cos = NaN — Spark's NaN-greatest ordering happens to still
    // link those pairs, but that is an engine-ordering accident, not the
    // clique theorem; such rows stay UNCOLLAPSED (rep = self) and flow
    // through the pair join exactly like the direct path, so the two paths
    // agree by construction whatever the engine's NaN comparison does.
    // cos(x, x) is NaN exactly when x is zero-norm, carries a NaN, or
    // overflows to ±Inf — ONE codegen'd kernel pass, vs the r15 guard's
    // two interpreted HOF folds (exists(isnan) + sum-of-squares), which
    // measured ~+10% on q104's cache materialization. The Inf case is a
    // strict widening of the degenerate set: such rows also stay
    // uncollapsed, which keeps collapsed ≡ direct trivially.
    val degenerate = isnan(cosineNative(col("embedding"), col("embedding")))
    val assigned = (if (collapseIdentical)
        assigned0.withColumn("rep",
          when(degenerate, col("vec_id"))
            .otherwise(min("vec_id").over(grpW)))
      else assigned0.withColumn("rep", col("vec_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    RunScopedCache.releaseAfterRun(s, assigned)
    val repRows = assigned.filter(col("vec_id") === col("rep"))
    val a = repRows.select(col("vec_id").as("a_id"), col("cent_id"),
      col("embedding").as("a_emb"))
    val b = repRows.select(col("vec_id").as("b_id"),
      col("cent_id").as("b_cent"), col("embedding").as("b_emb"))
    // pairs persisted: runAdaptive's path-picking count and the resolution
    // itself both read them
    val pairs = a.join(b,
        col("cent_id") === col("b_cent") && col("a_id") < col("b_id"))
      .filter(cosineNative(col("a_emb"), col("b_emb")) >= tau)
      .select(col("a_id").as("a"), col("b_id").as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    RunScopedCache.releaseAfterRun(s, pairs)
    // near-dup cluster graphs at THIS corpus are driver-sized (~1k edges);
    // a 100 TB corpus' edge set exceeds driverMax and takes the
    // distributed min-label path unchanged
    val comp = ConnectedComponents.runAdaptive(pairs)
    assigned.select(col("vec_id"), col("cent_id"), col("rep"))
      .join(comp, col("rep") === col("node"), "left")
      .select(col("vec_id"), col("cent_id").cast("long").as("cell"),
        coalesce(col("component"), col("rep")).as("keeper"),
        (coalesce(col("component"), col("rep")) === col("vec_id"))
          .as("kept"))
      .orderBy("vec_id")
  }

  /** Q107: product-quantization encode of the embedding lake
    * ([[PqStorage.encode]] under [[PqStorage.labelCodebooks]], m = 8
    * subspaces over the 64 dims) — each vector's 256 float bytes reduce
    * to 8 subspace codes (the storage layout packs them to 8 BYTES,
    * [[PqStorage.writePackedCellPartitioned]]). The declared query is the
    * oracle-able instantiation: codebooks are exact decimal subvector
    * means, distances are sequential double folds, ties break to the
    * smaller code — so DuckDB recomputes codebook training AND encoding
    * end-to-end and the codes hash-match. The probe half (ADC lookup
    * tables + exact re-rank) is spec-pinned (PqSpec) and recall-measured
    * (`ScaleBench ann` pq rows, BASELINE.md). Same clean-vector
    * precondition as q51/q101's family. */
  private val q107: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .filter(size(col("embedding")) === 64 &&
        !exists(col("embedding"), x => x.isNull))
    PqStorage.encode(e, PqStorage.labelCodebooks(e, 8, 64))
      // the 8-byte packed storage layout as a scalar hex string (scalar
      // outputs only — the driver's canonicalizer cannot sort array cells)
      .select(col("vec_id"),
        hex(call_function("int8_pack", col("codes"))).as("codes_hex"))
      .orderBy("vec_id")
  }

  /** Q108: the IVFADC probe end-to-end — q107's encode feeding the full
    * [[PqStorage.probePacked]] pipeline expressed in-plan: coarse-cell
    * assignment (q51's machinery), 2-cell pruning, per-query ADC lookup
    * table (exact squared L2 from the query's subvectors to every
    * codebook entry), `pq_adc_score` pre-rank over the 8-byte codes,
    * top-40 shortlist, exact cosine re-rank to top-10. Every stage is
    * deterministic double arithmetic with sequential folds, so DuckDB
    * recomputes codebooks, codes, the ADC table, the shortlist AND the
    * final ranking — the emitted (adc_dist, cos) pair pins both scoring
    * layers, not just the final ids. This is the query-side proof that
    * the 32×-compressed lake returns the right neighbors; the storage
    * side (packed bytes, partition pruning) is PqSpec + the `ScaleBench
    * ann` pq rows. */
  private val q108: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .filter(size(col("embedding")) === 64 &&
        !exists(col("embedding"), x => x.isNull))
    val cents = IvfStorage.labelCentroids(e)
    val cb = PqStorage.labelCodebooks(e, 8, 64)
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val probes = cents.crossJoin(broadcast(qv))
      .orderBy(cosineNative(col("centroid"), col("q_emb")).desc_nulls_last,
        col("cent_id"))
      .limit(2).select(col("cent_id").as("probe_id"))
    val coded = IvfStorage.assignCells(e, cents)
      .crossJoin(broadcast(PqStorage.codebookArray(cb)))
      .select(col("vec_id"), col("cent_id"),
        call_function("pq_encode", col("embedding"), col("cbs")).as("codes"))
    val adc = cb.crossJoin(broadcast(qv))
      .withColumn("qsub", expr("slice(q_emb, sub * 8 + 1, 8)"))
      .withColumn("dist", aggregate(
        zip_with(col("qsub"), col("centroid"),
          (x, y) => (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        lit(0.0), (a, x) => a + x))
      .agg(expr(
        "transform(array_sort(collect_list(struct(sub, code, dist))), s -> s.dist)")
        .as("adc_table"))
    val pre = coded.join(broadcast(probes), col("cent_id") === col("probe_id"))
      .crossJoin(broadcast(adc))
      .select(col("vec_id"),
        call_function("pq_adc_score", col("codes"), col("adc_table"))
          .as("adc_dist"))
      .orderBy(col("adc_dist").asc_nulls_last, col("vec_id"))
      .limit(40)
    pre.join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("adc_dist"),
        cosineNative(col("embedding"), col("q_emb")).as("cos"))
      .orderBy(col("cos").desc_nulls_last, col("vec_id"))
      .limit(10)
  }

  /** Q157: cell-blocked kNN-graph construction — the neighborhood
    * structure SemDeDup-style diversity pruning, graph-based coreset
    * selection and label propagation over embeddings all start from.
    * For every vector: its top-3 same-cell neighbors by exact cosine
    * (rank ties broken by neighbor id), cells being q104's label-mean
    * coarse quantizer. Restricting candidates to the ASSIGNED cell is
    * the standard approximation (the q104 blocking argument: cells ∝ n
    * keeps per-cell pair products bounded, so graph build cost is
    * Σ|cell|² — sub-quadratic at any corpus size — while recall within
    * a semantic neighborhood stays high because near-duplicates share a
    * cell by construction). Docs alone in their cell emit no edges —
    * the honest readout, not a padded self-edge.
    *
    * Shape: one broadcast-argmax assignment scan (shared, persisted),
    * then the [[knnEdges]] grouped core: BOTH pair-join sides collapse to
    * exact-embedding content groups — candidates to each group's FOUR
    * smallest ids (k = 3 plus one for self-exclusion), probes to ONE
    * depth-4 ranking per group from which every member's top-3 is derived
    * by per-row self-exclusion list algebra (the q234/q236 clique
    * argument at list depth k, both directions). Pair volume is
    * ∝ groups·candidates per cell — the duplicate factor drops out of
    * BOTH sides, closing the last replica-quadratic (sf1: 20.7 → ~5 s).
    * The DuckDB oracle recomputes centroids → assignment → pairs → ranks
    * end-to-end; grouped ≡ direct spec-pinned. */
  private val q157: Q = (s, d) =>
    knnGraph(s, Tables.embeddings(s, d), collapseIdentical = true)

  /** q157 core; `collapseIdentical` as in [[quantizationFidelity]]. */
  private[operators] def knnGraph(
      s: org.apache.spark.sql.SparkSession, eAll: DataFrame,
      collapseIdentical: Boolean): DataFrame = {
    val e = eAll
      .filter(size(col("embedding")) === 64 &&
        !exists(col("embedding"), x => x.isNull))
    val cents = IvfStorage.labelCentroids(e)
    val assigned = IvfStorage.assignCells(e, cents)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    RunScopedCache.releaseAfterRun(s, assigned)
    val edges =
      if (collapseIdentical) knnEdges(assigned)
      else knnEdgesDirect(assigned)
    edges.select(col("src_id"), col("rk"), col("nbr_id"), col("cos"))
      .orderBy("src_id", "rk")
  }

  /** The uncollapsed reference plan: full within-cell pair join, one
    * ranking window PER MEMBER — quadratic in the duplicate factor on
    * both sides. Kept as the spec baseline the grouped plan must equal
    * (R16/R17QuerySemanticsSpec). */
  private def knnEdgesDirect(assigned: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val a = assigned.select(col("vec_id").as("src_id"), col("cent_id"),
      col("embedding").as("a_emb"))
    val b = assigned.select(col("vec_id").as("nbr_id"),
      col("cent_id").as("b_cent"), col("embedding").as("b_emb"))
    val w = W.partitionBy("src_id")
      .orderBy(col("cos").desc_nulls_last, col("nbr_id"))
    a.join(b, col("cent_id") === col("b_cent") &&
        col("src_id") =!= col("nbr_id"))
      .select(col("src_id"), col("cent_id"), col("nbr_id"),
        cosineNative(col("a_emb"), col("b_emb")).as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
  }

  /** Q252: INCREMENTAL kNN-graph maintenance — how a growing vector lake
    * keeps q157's neighborhood structure fresh without rebuilding it.
    * The quantizer is FROZEN at the base build (centroids fitted on the
    * pre-delta corpus — exactly how production IVF lakes work between
    * refits), so neighbor candidates live in the ASSIGNED cell only and
    * an arriving batch (vec_id ≡ 7 mod 11, the deterministic delta) can
    * change edges ONLY in cells that received a new vector. The
    * maintained graph is `stored edges of untouched cells ∪
    * recompute(touched cells)` — and the stored half is a GENUINE
    * pre-delta artifact: a session-memoized parquet of the base graph
    * (the q247 stored-view pattern) that this query SCANS, never
    * recomputes. Work ∝ |stored scan| + Σ|touched cell|², not corpus².
    * The ORACLE is the full-rebuild SQL over base ∪ delta under the same
    * frozen base centroids: the hash match IS the maintenance-
    * correctness equation. `touched` flags which edges the incremental
    * path actually recomputed.
    *
    * Scale shape: same cell-blocked grouped economics as q157, plus one
    * broadcast of the touched-cell id set; the untouched half is a
    * file-scan + anti-join, no pair work at all (PlanSpec pins the scan). */
  private val q252: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .filter(size(col("embedding")) === 64 &&
        !exists(col("embedding"), x => x.isNull))
    val e0 = e.filter(col("vec_id") % 11 =!= 7) // pre-delta base
    val cents = IvfStorage.labelCentroids(e0)   // frozen quantizer
    val assigned = IvfStorage.assignCells(e, cents)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    RunScopedCache.releaseAfterRun(s, assigned)
    val touched = assigned.filter(col("vec_id") % 11 === 7)
      .select(col("cent_id")).distinct()
    // untouched cells: the STORED base graph IS the fresh graph (no delta
    // vector landed there — scan it); touched cells: recompute over
    // base ∪ delta members of exactly those cells
    val untouchedG = knnBaseGraph(s, d)
      .join(broadcast(touched), Seq("cent_id"), "left_anti")
      .withColumn("touched", lit(false))
    val touchedG = knnEdges(
        assigned.join(broadcast(touched), Seq("cent_id"), "left_semi"))
      .withColumn("touched", lit(true))
    untouchedG.unionByName(touchedG)
      .select("src_id", "rk", "nbr_id", "cos", "touched")
      .orderBy("src_id", "rk")
  }

  // The pre-delta base kNN graph, materialized ONCE per (session, dir) as
  // a temp parquet — the stored artifact q252's incremental path reads
  // (the q247 ivmBaseView pattern). Built from base vectors only, under
  // the same frozen base-fitted centroids the delta assignment uses.
  private val knnBaseMemo =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.mutable.Map[String, String]]()

  private def knnBaseGraph(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val perSession = knnBaseMemo.synchronized {
      var m = knnBaseMemo.get(s)
      if (m == null) {
        m = scala.collection.mutable.Map.empty[String, String]
        knnBaseMemo.put(s, m)
      }
      m
    }
    val path = perSession.synchronized {
      perSession.getOrElseUpdate(d, {
        val e0 = Tables.embeddings(s, d)
          .filter(size(col("embedding")) === 64 &&
            !exists(col("embedding"), x => x.isNull))
          .filter(col("vec_id") % 11 =!= 7)
        val cents = IvfStorage.labelCentroids(e0)
        val assigned0 = IvfStorage.assignCells(e0, cents)
          .select(col("vec_id"), col("embedding"), col("cent_id"))
        val p = TempDirs.scoped("graft-knn-base")
        knnEdges(assigned0).write.mode("overwrite").parquet(p)
        p
      })
    }
    s.read.parquet(path)
  }

  /** Cell-blocked top-3 edges over an assigned frame, with BOTH sides
    * collapsed to exact-embedding content groups — q157/q252's pair+rank
    * core on an arbitrary vector subset.
    *
    * Candidates collapse to each group's 4 smallest ids (k = 3 plus one
    * for self-exclusion: a member beyond its group's 4 smallest can never
    * enter any top-3 list). Probes collapse to ONE ranking per group: a
    * member's cosine to any candidate is a function of its embedding
    * alone, so every member of a group sees the SAME (cos DESC, nbr_id)
    * candidate order — rank once per group to depth 4 WITHOUT
    * self-exclusion, then each member's top-3 is the group list minus
    * itself (removing one element shifts at most one entry in, so depth
    * k+1 = 4 is exact). The per-member step is per-row array algebra on a
    * ≤4-element list — no window, no pair join: the pair stage is
    * ∝ groups·candidates per cell, never members·candidates (the last
    * replica-quadratic holdout at sf1: 20.7 s → the q236 regime).
    * Grouped ≡ direct is spec-pinned on replicated fixtures
    * (R16/R17QuerySemanticsSpec). */
  private def knnEdges(assigned: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val gw = W.partitionBy("embedding")
    // pin stage width (the SimilarityJoin.pinPairWidth discipline): the
    // grouping/ranking stages here are compute-amplifying over small
    // input BYTES, so AQE coalesces them to ONE task and the whole
    // pair+rank core serializes (profiled on q252 at sf0.1: a 28-job
    // chain, every job single-task, 5.2 s wall; guide §2.5). An
    // explicitly-numbered repartition on the window keys is exempt from
    // AQE coalescing and the windows reuse it — no second exchange.
    val width = assigned.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val numbered = assigned.repartition(width, col("embedding"))
      .withColumn("_crn", row_number().over(gw.orderBy("vec_id")))
      .withColumn("grp_id", min("vec_id").over(gw))
    val cand = numbered.filter(col("_crn") <= 4)
      .select(col("vec_id").as("nbr_id"), col("cent_id").as("b_cent"),
        col("embedding").as("b_emb"))
    val reps = numbered.filter(col("_crn") === 1)
      .select(col("grp_id"), col("cent_id"), col("embedding").as("g_emb"))
    val rw = W.partitionBy("grp_id")
      .orderBy(col("cos").desc_nulls_last, col("nbr_id"))
    val lists = reps.join(cand, col("cent_id") === col("b_cent"))
      .select(col("grp_id"), col("cent_id"), col("nbr_id"),
        cosineNative(col("g_emb"), col("b_emb")).as("cos"))
      .repartition(width, col("grp_id")) // same pin for the rank window
      .withColumn("rk4", row_number().over(rw))
      .filter(col("rk4") <= 4)
      .groupBy("grp_id", "cent_id")
      .agg(expr("""transform(
          array_sort(collect_list(struct(rk4, nbr_id, cos))),
          s -> named_struct('nbr_id', s.nbr_id, 'cos', s.cos))""").as("lst"))
    numbered.select(col("vec_id").as("src_id"), col("grp_id"))
      .join(lists, "grp_id")
      .withColumn("lst",
        expr("slice(filter(lst, x -> x.nbr_id != src_id), 1, 3)"))
      .select(col("src_id"), col("cent_id"),
        posexplode(col("lst")).as(Seq("p", "x")))
      .select(col("src_id"), (col("p") + 1).cast("long").as("rk"),
        col("x.nbr_id").as("nbr_id"), col("x.cos").as("cos"),
        col("cent_id"))
  }

  /** Q166: hybrid retrieval with reciprocal-rank fusion — the modern
    * search-stack shape: a lexical leg (q105's BM25 over a 3-term query)
    * and a dense leg (q38's exact cosine against the query embedding)
    * each produce a top-20, fused by RRF [Cormack et al. SIGIR'09]:
    * score = Σ 1/(60 + rank) over the lists a doc appears in, top-10
    * out. RRF needs no score calibration between legs — exactly why
    * production hybrid search uses it — and its arithmetic here is two
    * single IEEE divisions + one add (engine-exact; the `1.0` literal is
    * cast explicitly in the oracle because DuckDB parses bare decimal
    * literals as DECIMAL, the q158 boundary trap).
    *
    * Shape: both legs are the proven q105/q38 plans (TakeOrdered top-20
    * each); fusion is a 20∪20-row full-outer join — driver-trivial at
    * any corpus size, because the legs bound it. doc_id ≡ vec_id by the
    * testdata's construction. */
  private val q166: Q = (s, d) => {
    import graft.functions.TextFunctions
    val w20 = org.apache.spark.sql.expressions.Window
    val terms = Seq("vector", "merge", "stream")
    val exploded = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
    val dl = exploded.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val tf = exploded.filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(dfc), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tok"),
        bm25Contrib(col("tf"), col("df"), col("dl"), col("n_docs"),
          col("avgdl")).as("contrib"))
    val bm = contrib.groupBy("doc_id")
      .agg(bm25Fold(col("tok"), col("contrib")).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(20)
      .select(col("doc_id"), row_number().over(
        w20.orderBy(col("score").desc, col("doc_id"))).cast("long").as("r_bm"))
    val e = Tables.embeddings(s, d)
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val cosTop = e.crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        cosineNative(col("embedding"), col("q_emb")).as("cos"))
      .orderBy(col("cos").desc_nulls_last, col("doc_id")).limit(20)
      .select(col("doc_id"), row_number().over(
        w20.orderBy(col("cos").desc_nulls_last, col("doc_id")))
        .cast("long").as("r_cos"))
    bm.join(cosTop, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + col("r_bm")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("r_cos")), lit(0.0)))
      .select(col("doc_id"), col("r_bm"), col("r_cos"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(10)
  }

  /** Q183: embedding distribution drift across ingest waves — the
    * unsupervised shift monitor that tells a vector lake WHEN to refit
    * its quantizer (the trigger for [[IvfStorage.driftReport]] /
    * `kmeansCentroids` refits): per wave (vec_id div 100) the exact-
    * decimal position-wise centroid (the q51 convention — decimal sums,
    * ONE double division per position), then the squared L2 shift
    * between consecutive wave centroids via a SEQUENTIAL position-
    * ordered fold (the q95/q47 contract — a parallel double sum would
    * be partitioning-dependent). Costs two grouped passes over
    * (wave, pos) — 64·waves rows — and a consecutive-wave self-join on
    * a wave-count-sized frame: the monitor is dimension-scale at any
    * corpus size. */
  private val q183: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .filter(size(col("embedding")) === 64 &&
        !exists(col("embedding"), x => x.isNull))
      .withColumn("wave", expr("vec_id div 100"))
    val cent = e
      .select(col("wave"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("wave", "pos")
      .agg((sum(col("v").cast("decimal(18,9)")).cast("double") /
        count(lit(1))).as("c"))
      .groupBy("wave")
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
        .as("centroid"))
    val n = e.groupBy("wave").agg(count(lit(1)).as("n_vecs"))
    val prev = cent.select((col("wave") + 1).as("wave"),
      col("centroid").as("prev_centroid"))
    cent.join(prev, "wave").join(n, "wave")
      .select(col("wave"), col("n_vecs"),
        expr("""aggregate(
          zip_with(centroid, prev_centroid, (x, y) -> (x - y) * (x - y)),
          CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""").as("shift_sq"))
      .orderBy("wave")
  }

  /** Q186: contrastive triplet mining — the pipeline stops ANALYZING the
    * corpus and EMITS training examples: per anchor, the most similar
    * same-label vector (the positive) and the hardest same-CELL
    * different-label vector (the negative — hard negatives live nearby
    * in embedding space, which is exactly what the q104/q157 cell
    * blocking finds), plus the triplet margin the loss will see.
    * Positives are label-blocked, negatives cell-blocked — both bounded
    * candidate sets, never an all-pairs mine (q96's broadcast-anchor
    * stage is the same argument for a query workload). Anchors whose
    * cell holds no other label produce no triplet (inner join): there is
    * no hard negative to mine there. Both argmaxes are rank-1 windows
    * ordered (cos DESC, id ASC) — the q157 total order.
    *
    * Round-14 collapse (the q187 set-function argument applied to an
    * ARGMAX): identical candidate embeddings in one block are
    * interchangeable except for the id tie-break and the self-exclusion,
    * so keeping the TWO smallest vec_ids per (block, embedding) group
    * provably preserves every winner — the group's min wins any tie it
    * participates in, and when the anchor IS the min its second stands
    * in. Candidate volume drops from block² to block × (distinct
    * embeddings · 2); a duplicate-heavy corpus (the sf1 replica stress:
    * 48 s) pays ~dup× less. Identity pinned in R14QuerySemanticsSpec on
    * a replicated fixture. */
  private val q186: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .filter(size(col("embedding")) === 64 &&
        !exists(col("embedding"), x => x.isNull))
    val asg = IvfStorage.assignCells(e, IvfStorage.labelCentroids(e))
      .select("vec_id", "label", "embedding", "cent_id")
    tripletMine(asg, collapseCandidates = true)
  }

  /** q186 core over any (vec_id, label, embedding, cent_id) assignment.
    * `collapseCandidates = false` is the direct per-pair reference the
    * spec compares against. */
  private[operators] def tripletMine(asg: DataFrame,
      collapseCandidates: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // top-2 smallest ids per (block key, embedding) candidate group: the
    // only group members any anchor's argmax can ever select
    def keep2(blockKeys: Seq[String]): DataFrame =
      if (!collapseCandidates) asg
      else asg.withColumn("grn", row_number().over(
          Window.partitionBy((blockKeys :+ "embedding").map(col): _*)
            .orderBy(col("vec_id"))))
        .filter(col("grn") <= 2).drop("grn")
    if (!collapseCandidates) {
      // the uncollapsed reference plan: per-ANCHOR argmax windows over
      // the full blocked pair joins — quadratic in the duplicate factor
      // on both sides; kept as the spec baseline (R17QuerySemanticsSpec)
      val x = asg.select(col("vec_id").as("a_id"), col("label").as("a_label"),
        col("embedding").as("a_emb"), col("cent_id").as("a_cell"))
      def top1(cand: DataFrame, idCol: String, cosCol: String): DataFrame =
        cand.withColumn("rn", row_number().over(
          Window.partitionBy("a_id")
            .orderBy(col(cosCol).desc_nulls_last, col(idCol))))
          .filter(col("rn") === 1).drop("rn")
      val pos = top1(
        x.join(keep2(Seq("label")), col("label") === col("a_label") &&
            col("vec_id") =!= col("a_id"))
          .select(col("a_id"),
            col("vec_id").as("pos_id"),
            cosineNative(col("a_emb"), col("embedding")).as("pos_cos")),
        "pos_id", "pos_cos")
      val neg = top1(
        x.join(keep2(Seq("cent_id", "label")),
            col("cent_id") === col("a_cell") &&
            col("label") =!= col("a_label"))
          .select(col("a_id"),
            col("vec_id").as("neg_id"),
            cosineNative(col("a_emb"), col("embedding")).as("neg_cos")),
        "neg_id", "neg_cos")
      return pos.join(neg, "a_id")
        .withColumn("margin", col("pos_cos") - col("neg_cos"))
        .orderBy("a_id")
    }
    // grouped probes (the q157 knnEdges move at argmax depth): anchors
    // sharing an exact (label, embedding) see identical candidate orders
    // (cent_id is a function of the embedding), so the POSITIVE argmax is
    // ranked ONCE per group to depth 2 without self-exclusion — each
    // member's pick is the list minus itself (removing one element shifts
    // at most one in) — and the NEGATIVE argmax (no self-exclusion: the
    // label differs) is computed once per group and INHERITED. Pair
    // volume drops from members×candidates to groups×candidates — the
    // duplicate factor leaves both argmax stages.
    val gw = Window.partitionBy("label", "embedding")
    // pin stage width (the knnEdges/pinPairWidth discipline): the grouped
    // argmax stages are compute-amplifying over small bytes, so AQE
    // coalesces them to single tasks and the chain serializes (profiled
    // at sf0.1: a 19-job near-single-task chain, 2.8 s warm)
    val width = asg.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val numbered = asg.repartition(width, col("label"), col("embedding"))
      .withColumn("_arn", row_number().over(gw.orderBy("vec_id")))
      .withColumn("grp_id", min("vec_id").over(gw))
    val reps = numbered.filter(col("_arn") === 1)
      .select(col("grp_id"), col("label").as("a_label"),
        col("embedding").as("a_emb"), col("cent_id").as("a_cell"))
    val members = numbered.select(col("vec_id").as("a_id"), col("grp_id"))
    val posLists = reps
      .join(keep2(Seq("label")), col("label") === col("a_label"))
      .select(col("grp_id"), col("vec_id").as("pos_id"),
        cosineNative(col("a_emb"), col("embedding")).as("pos_cos"))
      .repartition(width, col("grp_id")) // same pin for the rank window
      .withColumn("rn", row_number().over(Window.partitionBy("grp_id")
        .orderBy(col("pos_cos").desc_nulls_last, col("pos_id"))))
      .filter(col("rn") <= 2)
      .groupBy("grp_id")
      .agg(expr("""transform(
          array_sort(collect_list(struct(rn, pos_id, pos_cos))),
          s -> named_struct('pos_id', s.pos_id, 'pos_cos', s.pos_cos))""")
        .as("plst"))
    val pos = members.join(posLists, "grp_id")
      // get() is null on an emptied list (anchor alone under its label
      // after the self-exclusion) — ANSI element_at would throw there
      .withColumn("pick",
        expr("get(filter(plst, x -> x.pos_id != a_id), 0)"))
      .filter(col("pick").isNotNull)
      .select(col("a_id"), col("pick.pos_id").as("pos_id"),
        col("pick.pos_cos").as("pos_cos"))
    val negG = reps
      .join(keep2(Seq("cent_id", "label")),
        col("cent_id") === col("a_cell") && col("label") =!= col("a_label"))
      .select(col("grp_id"), col("vec_id").as("neg_id"),
        cosineNative(col("a_emb"), col("embedding")).as("neg_cos"))
      .repartition(width, col("grp_id")) // same pin for the rank window
      .withColumn("rn", row_number().over(Window.partitionBy("grp_id")
        .orderBy(col("neg_cos").desc_nulls_last, col("neg_id"))))
      .filter(col("rn") === 1).drop("rn")
    val neg = members.join(negG, "grp_id")
      .select(col("a_id"), col("neg_id"), col("neg_cos"))
    pos.join(neg, "a_id")
      .withColumn("margin", col("pos_cos") - col("neg_cos"))
      .orderBy("a_id")
  }

  /** Q199: embedding outlier flags — the vector-hygiene gate run before
    * an embedding lake feeds ANN indexing or semantic dedup: a vector
    * far from its own label's centroid is a mislabeled row, a corrupt
    * encode, or genuine distribution drift, and it poisons both the IVF
    * cell layout (q51) and SemDeDup blocking (q104). Per label, vectors
    * rank by ascending cosine-to-own-centroid (ties to the smaller
    * vec_id; explicit NULLS LAST both engines) and the bottom 3 flag as
    * outliers — a pure-rank rule, no threshold literal to diverge.
    * Centroids are the q51 exact-decimal means; the cosine is the
    * sequential-fold kernel whose DuckDB mirror is bit-identical.
    *
    * Shape: one centroid pass (label-bounded), broadcast join back, one
    * per-label rank window — no vector ever pairs with another vector. */
  private val q199: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .filter(size(col("embedding")) === 64 &&
        !exists(col("embedding"), x => x.isNull))
    val cents = IvfStorage.labelCentroids(e)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("label").orderBy(col("cos").asc_nulls_last, col("vec_id"))
    e.join(broadcast(cents), col("label") === col("cent_id"))
      .select(col("vec_id"), col("label"),
        cosineNative(col("embedding"), col("centroid")).as("cos"))
      .withColumn("cos_rank", row_number().over(w).cast("long"))
      .withColumn("is_outlier", col("cos_rank") <= 3)
      .orderBy("vec_id")
  }

  /** Q200: document↔embedding referential-integrity audit — the lake
    * consistency gate between the text corpus and its embedding table:
    * per source, how many documents have an embedding row and how many
    * are MISSING one (an ANN index built now would silently exclude
    * them), plus the global count of ORPHAN embeddings (vec_ids with no
    * document — a stale index that serves deleted/redacted content, the
    * q170 erasure concern) and duplicate vec_ids (double-encoded rows
    * that bias every centroid). All-integer counts.
    *
    * Shape: one doc↔vec-id equi-join (co-partitioned and shuffle-free
    * under the lake's id-bucketed layout, the q156 argument), one
    * anti-join, one duplicate groupBy bounded by the embedding table. */
  private val q200: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val vecIds = Tables.embeddings(s, d).select(col("vec_id")).distinct()
    val perSrc = docs
      .join(vecIds, col("doc_id") === col("vec_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("vec_id").isNotNull, 1L).otherwise(0L))
          .as("n_with_emb"))
      .withColumn("n_missing", col("n_docs") - col("n_with_emb"))
    val orphans = vecIds
      .join(docs.select("doc_id"), col("vec_id") === col("doc_id"),
        "left_anti")
      .agg(count(lit(1)).as("n_orphan_emb"))
    val dups = Tables.embeddings(s, d)
      .groupBy("vec_id").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(count(lit(1)).as("n_dup_vec_ids"))
    perSrc.crossJoin(broadcast(orphans)).crossJoin(broadcast(dups))
      .orderBy("source")
  }

  /** Q249: retrieval-quality evaluation of the IVF index — the report a
    * vector lake publishes before anyone trusts its ANN path: at a fixed
    * operating point (nprobe = 2), exact brute-force top-10 vs IVF top-10
    * per probe, aggregated to recall@10 and MRR@10. Determinism: recall
    * is pure integer (hits per-mille by `div`); MRR's reciprocal ranks
    * are summed EXACTLY as integer 2520ths (ranks ≤ 10, lcm(1..10) =
    * 2520 — a double Σ1/rank would round order-dependently) with the one
    * IEEE division at the very end, mirrored op-for-op. A true-NN absent
    * from the ANN list contributes rank-reciprocal 0.
    *
    * Scale shape: the IVF side touches only visited cells (that IS the
    * production probe cost); the exact side is the declared brute-force
    * baseline every eval needs once (q38/q236 precedent). Both lists are
    * WindowGroupLimit top-k per probe — k-bounded shuffles. */
  private val q249: Q = (s, d) => {
    val K = 10
    val e = Tables.embeddings(s, d)
      .filter(size(col("embedding")) === 64 &&
        !exists(col("embedding"), x => x.isNull))
    val cents = IvfStorage.labelCentroids(e)
    val asg = IvfStorage.assignCells(e, cents)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    RunScopedCache.releaseAfterRun(s, asg)
    val probes = asg.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
    val W = org.apache.spark.sql.expressions.Window
    val allp = asg
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("cent_id").as("c_cell"))
      .join(broadcast(probes), col("c_id") =!= col("p_id"))
      .withColumn("cos", cosineNative(col("p_emb"), col("c_emb")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    RunScopedCache.releaseAfterRun(s, allp)
    val g = allp.withColumn("rn", row_number().over(W.partitionBy("p_id")
        .orderBy(col("cos").desc_nulls_last, col("c_id"))))
      .filter(col("rn") <= K)
      .select(col("p_id"), col("c_id").as("g_id"), col("rn").as("g_rank"))
    val cr = probes.crossJoin(broadcast(cents))
      .withColumn("crk", row_number().over(W.partitionBy("p_id")
        .orderBy(cosineNative(col("centroid"), col("p_emb"))
          .desc_nulls_last, col("cent_id"))))
      .filter(col("crk") <= 2)
      .select(col("p_id"), col("cent_id").as("c_cell"))
    val a = allp.join(cr, Seq("p_id", "c_cell"))
      .withColumn("rn", row_number().over(W.partitionBy("p_id")
        .orderBy(col("cos").desc_nulls_last, col("c_id"))))
      .filter(col("rn") <= K)
      .select(col("p_id"), col("c_id").as("a_id"), col("rn").as("a_rank"))
    val inter = g.join(a,
        g("p_id") === a("p_id") && col("g_id") === col("a_id"))
      .groupBy(g("p_id").as("p_id"))
      .agg(count(lit(1)).as("hits"),
        coalesce(min(when(col("g_rank") === 1,
          expr("2520 div a_rank"))), lit(0L)).as("rr2520"))
    probes.select("p_id").join(inter, Seq("p_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("rr2520", coalesce(col("rr2520"), lit(0L)))
      .agg(count(lit(1)).as("n_probes"), sum(col("hits")).as("sum_hits"),
        sum(col("rr2520")).as("mrr_num"))
      .withColumn("recall_pm",
        expr("(1000 * sum_hits) div (10 * n_probes)"))
      .withColumn("mrr", col("mrr_num").cast("double") /
        (lit(2520.0) * col("n_probes").cast("double")))
      .select("n_probes", "sum_hits", "recall_pm", "mrr_num", "mrr")
  }

  val queries: Seq[(String, Q)] = Seq(
    "q199_embedding_outliers" -> q199,
    "q200_embedding_integrity" -> q200,
    "q38_sim_cosine_topk" -> q38,
    "q183_vec_drift_waves" -> q183,
    "q186_triplet_mining" -> q186,
    "q157_sim_knn_graph" -> q157,
    "q166_sim_hybrid_rrf" -> q166,
    "q39_sim_neighbor_join" -> q39,
    "q69_dedup_embedding_cosine" -> q69,
    "q70_dedup_embedding_ann" -> q70,
    "q70b_dedup_embedding_ann_md5" -> q70b,
    "q43_sim_ann_lsh" -> q43,
    "q43b_sim_ann_lsh_md5" -> q43b,
    "q51_sim_ann_ivf" -> q51,
    "q96_hard_negatives" -> q96,
    "q101_vec_quantize_int8" -> q101,
    "q233_embedding_separability" -> q233,
    "q234_quantization_fidelity" -> q234,
    "q236_ivf_nprobe_sweep" -> q236,
    "q249_retrieval_eval" -> q249,
    "q252_knn_incremental" -> q252,
    "q216_vec_jl_projection" -> q216,
    "q104_dedup_semantic_cells" -> q104,
    "q107_vec_pq_encode" -> q107,
    "q108_sim_ann_ivfadc" -> q108,
  )

  /** The q101 int8-quantization refit (ints → params → codes), shared by
    * the q101 and q216 oracles — ONE SQL definition so the storage layout
    * and anything computed over it can never disagree. Callers append
    * further CTEs (`", ..."`) and a final SELECT over `c`
    * (vec_id, pos, iv, mn, mx, code). */
  private val quantCodesOracleCore: String =
    """WITH ints AS (
      |  SELECT vec_id, pos,
      |    CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS iv
      |  FROM (SELECT vec_id,
      |      CAST(unnest(range(0, len(embedding))) AS INT) AS pos,
      |      unnest(embedding) AS v
      |    FROM embeddings)),
      |params AS (SELECT pos, min(iv) AS mn, max(iv) AS mx
      |  FROM ints GROUP BY pos),
      |c AS (
      |  SELECT vec_id, pos, iv, mn, mx,
      |    CASE WHEN mx = mn THEN 0
      |      ELSE GREATEST(0, LEAST(255,
      |        CAST(((iv - mn) * 255) // (mx - mn) AS INT))) END AS code
      |  FROM ints JOIN params USING (pos))""".stripMargin

  val oracles: Map[String, String] = Map(
    // outliers: the q51 centroid CTEs joined back on the vector's OWN
    // label, ranked ascending with explicit NULLS LAST + vec_id tiebreak
    "q199_embedding_outliers" ->
      s"""WITH emb AS (
         |  SELECT * FROM embeddings
         |  WHERE len(embedding) = 64
         |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         |pe AS (
         |  SELECT label, CAST(t.i - 1 AS INT) AS pos,
         |    embedding[CAST(t.i AS INT)] AS v
         |  FROM emb, range(1, 65) t(i)),
         |pc AS (
         |  SELECT label, pos,
         |    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS c
         |  FROM pe GROUP BY label, pos),
         |cents AS (
         |  SELECT label AS cent_id,
         |    list(CAST(c AS FLOAT) ORDER BY pos) AS centroid
         |  FROM pc GROUP BY label),
         |j AS (
         |  SELECT e.vec_id, e.label,
         |    ${sqlCosine("e.embedding", "c.centroid")} AS cos
         |  FROM emb e JOIN cents c ON e.label = c.cent_id),
         |r AS (
         |  SELECT vec_id, label, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY label
         |      ORDER BY cos ASC NULLS LAST, vec_id) AS BIGINT) AS cos_rank
         |  FROM j)
         |SELECT vec_id, label, cos, cos_rank, cos_rank <= 3 AS is_outlier
         |FROM r ORDER BY vec_id""".stripMargin,

    // integrity: distinct vec-id probe joined to docs, NOT EXISTS orphan
    // count, HAVING>1 duplicate count — all exact BIGINTs
    "q200_embedding_integrity" ->
      """WITH v AS (SELECT DISTINCT vec_id FROM embeddings),
        |p AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN v.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_with_emb
        |  FROM documents d LEFT JOIN v ON d.doc_id = v.vec_id
        |  GROUP BY d.source),
        |o AS (SELECT CAST(count(*) AS BIGINT) AS n_orphan_emb FROM v
        |  WHERE NOT EXISTS (SELECT 1 FROM documents d
        |    WHERE d.doc_id = v.vec_id)),
        |dup AS (SELECT CAST(count(*) AS BIGINT) AS n_dup_vec_ids FROM
        |  (SELECT vec_id FROM embeddings GROUP BY vec_id
        |   HAVING count(*) > 1))
        |SELECT p.source, p.n_docs, p.n_with_emb,
        |  p.n_docs - p.n_with_emb AS n_missing,
        |  o.n_orphan_emb, dup.n_dup_vec_ids
        |FROM p, o, dup ORDER BY p.source""".stripMargin,

    // triplet mining: q157's centroid/assignment CTEs, label-blocked
    // positives + cell-blocked hard negatives, rank-1 (cos DESC, id)
    "q186_triplet_mining" ->
      s"""WITH emb AS (
         |  SELECT * FROM embeddings
         |  WHERE len(embedding) = 64
         |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         |pe AS (
         |  SELECT label, CAST(t.i - 1 AS INT) AS pos,
         |    embedding[CAST(t.i AS INT)] AS v
         |  FROM emb, range(1, 65) t(i)),
         |pc AS (
         |  SELECT label, pos,
         |    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS c
         |  FROM pe GROUP BY label, pos),
         |cents AS (
         |  SELECT label AS cent_id,
         |    list(CAST(c AS FLOAT) ORDER BY pos) AS centroid
         |  FROM pc GROUP BY label),
         |ranked AS (
         |  SELECT e.vec_id, e.label, e.embedding, c.cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqlCosine("e.embedding", "c.centroid")} DESC NULLS LAST,
         |        c.cent_id) AS rn
         |  FROM emb e CROSS JOIN cents c),
         |assigned AS (SELECT vec_id, label, embedding, cent_id
         |  FROM ranked WHERE rn = 1),
         |posr AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS pos_id,
         |    ${sqlCosine("a.embedding", "b.embedding")} AS pos_cos,
         |    ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
         |      ${sqlCosine("a.embedding", "b.embedding")} DESC NULLS LAST,
         |      b.vec_id) AS rn
         |  FROM assigned a JOIN assigned b
         |    ON a.label = b.label AND a.vec_id <> b.vec_id),
         |negr AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS neg_id,
         |    ${sqlCosine("a.embedding", "b.embedding")} AS neg_cos,
         |    ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
         |      ${sqlCosine("a.embedding", "b.embedding")} DESC NULLS LAST,
         |      b.vec_id) AS rn
         |  FROM assigned a JOIN assigned b
         |    ON a.cent_id = b.cent_id AND a.label <> b.label)
         |SELECT p.a_id, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos,
         |  p.pos_cos - n.neg_cos AS margin
         |FROM (SELECT * FROM posr WHERE rn = 1) p
         |JOIN (SELECT * FROM negr WHERE rn = 1) n USING (a_id)
         |ORDER BY a_id""".stripMargin,

    // wave drift: zipped-unnest position explode (the q97 mirror),
    // decimal-exact per-position means, squared-L2 via a position-ordered
    // list_reduce fold (the q47 move) between consecutive wave centroids
    "q183_vec_drift_waves" ->
      """WITH e AS (SELECT vec_id, vec_id // 100 AS wave, embedding
        |  FROM embeddings WHERE len(embedding) = 64
        |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
        |p AS (SELECT wave, unnest(range(1, 65)) AS pos,
        |    unnest(embedding) AS v FROM e),
        |c AS (SELECT wave, pos,
        |    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS c
        |  FROM p GROUP BY wave, pos),
        |cent AS (SELECT wave, list(c ORDER BY pos) AS centroid
        |  FROM c GROUP BY wave),
        |n AS (SELECT wave, CAST(count(*) AS BIGINT) AS n_vecs
        |  FROM e GROUP BY wave)
        |SELECT a.wave, n.n_vecs,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(range(1, 65),
        |      i -> (a.centroid[CAST(i AS INT)] - b.centroid[CAST(i AS INT)])
        |        * (a.centroid[CAST(i AS INT)] - b.centroid[CAST(i AS INT)]))),
        |    (acc, v) -> acc + v) AS shift_sq
        |FROM cent a JOIN cent b ON a.wave = b.wave + 1
        |JOIN n ON n.wave = a.wave
        |ORDER BY a.wave""".stripMargin,

    // hybrid RRF: q105's BM25 CTEs + q38's cosine leg, ranks from the
    // same (score, id) orders, fusion with EXPLICIT double casts (a bare
    // 1.0 literal is DECIMAL in DuckDB — the q158 trap)
    "q166_sim_hybrid_rrf" ->
      s"""WITH e AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
         |  FROM documents WHERE text IS NOT NULL),
         |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
         |  FROM e GROUP BY doc_id),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM e
         |  WHERE tok IN ('vector', 'merge', 'stream') GROUP BY doc_id, tok),
         |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
         |c AS (
         |  SELECT tf.doc_id, tf.tok,
         |    (CAST(st.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) /
         |      (CAST(df.df AS DOUBLE) + 0.5) *
         |    ((CAST(tf.tf AS DOUBLE) * 2.2) /
         |      (CAST(tf.tf AS DOUBLE) +
         |        1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / st.avgdl)))) AS contrib
         |  FROM tf JOIN df USING (tok) JOIN dl ON tf.doc_id = dl.doc_id, st),
         |bs AS (SELECT doc_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(contrib ORDER BY tok)),
         |      (a, x) -> a + x) AS score
         |  FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20),
         |bm AS (SELECT doc_id, CAST(row_number() OVER (
         |    ORDER BY score DESC, doc_id) AS BIGINT) AS r_bm FROM bs),
         |q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |ct AS (SELECT vec_id AS doc_id,
         |    ${sqlCosine("embedding", "q_emb")} AS cos
         |  FROM embeddings, q ORDER BY cos DESC NULLS LAST, doc_id LIMIT 20),
         |cr AS (SELECT doc_id, CAST(row_number() OVER (
         |    ORDER BY cos DESC NULLS LAST, doc_id) AS BIGINT) AS r_cos FROM ct)
         |SELECT COALESCE(bm.doc_id, cr.doc_id) AS doc_id, bm.r_bm, cr.r_cos,
         |  COALESCE(CAST(1 AS DOUBLE) / (60 + bm.r_bm), CAST(0 AS DOUBLE)) +
         |  COALESCE(CAST(1 AS DOUBLE) / (60 + cr.r_cos), CAST(0 AS DOUBLE))
         |    AS rrf
         |FROM bm FULL JOIN cr ON bm.doc_id = cr.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    // kNN graph: q104's centroid/assignment CTEs, then per-vector top-3
    // same-cell neighbors by exact cosine (ties -> smaller neighbor id)
    // incremental kNN maintenance: the oracle is the FULL REBUILD over
    // base ∪ delta — under the FROZEN base-fitted centroids (pe reads the
    // pre-delta base only; ranked assigns everyone to those centroids) —
    // equality with the stored-untouched-∪-recomputed union is the
    // maintenance-correctness equation (q247's epistemics)
    "q252_knn_incremental" ->
      s"""WITH emb AS (
         |  SELECT * FROM embeddings
         |  WHERE len(embedding) = 64
         |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         |pe AS (
         |  SELECT label, CAST(t.i - 1 AS INT) AS pos,
         |    embedding[CAST(t.i AS INT)] AS v
         |  FROM emb, range(1, 65) t(i)
         |  WHERE emb.vec_id % 11 <> 7),
         |pc AS (
         |  SELECT label, pos,
         |    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
         |      / count(*) AS c
         |  FROM pe GROUP BY label, pos),
         |cents AS (
         |  SELECT label AS cent_id,
         |    list(CAST(c AS FLOAT) ORDER BY pos) AS centroid
         |  FROM pc GROUP BY label),
         |ranked AS (
         |  SELECT e.vec_id, e.embedding, c.cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqlCosine("e.embedding", "c.centroid")}
         |        DESC NULLS LAST, c.cent_id) AS rn
         |  FROM emb e CROSS JOIN cents c),
         |assigned AS (SELECT vec_id, embedding, cent_id
         |  FROM ranked WHERE rn = 1),
         |tc AS (SELECT DISTINCT cent_id FROM assigned
         |  WHERE vec_id % 11 = 7),
         |knn AS (
         |  SELECT a.vec_id AS src_id, b.vec_id AS nbr_id, a.cent_id,
         |    ${sqlCosine("a.embedding", "b.embedding")} AS cos
         |  FROM assigned a JOIN assigned b
         |    ON a.cent_id = b.cent_id AND a.vec_id <> b.vec_id),
         |rk AS (
         |  SELECT src_id, nbr_id, cos, cent_id, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY src_id ORDER BY cos DESC NULLS LAST, nbr_id)
         |    AS BIGINT) AS rk
         |  FROM knn)
         |SELECT rk.src_id, rk.rk, rk.nbr_id, rk.cos,
         |  rk.cent_id IN (SELECT cent_id FROM tc) AS touched
         |FROM rk WHERE rk.rk <= 3
         |ORDER BY rk.src_id, rk.rk""".stripMargin,

    "q157_sim_knn_graph" ->
      s"""WITH emb AS (
         |  SELECT * FROM embeddings
         |  WHERE len(embedding) = 64
         |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         |pe AS (
         |  SELECT label, CAST(t.i - 1 AS INT) AS pos,
         |    embedding[CAST(t.i AS INT)] AS v
         |  FROM emb, range(1, 65) t(i)),
         |pc AS (
         |  SELECT label, pos,
         |    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS c
         |  FROM pe GROUP BY label, pos),
         |cents AS (
         |  SELECT label AS cent_id,
         |    list(CAST(c AS FLOAT) ORDER BY pos) AS centroid
         |  FROM pc GROUP BY label),
         |ranked AS (
         |  SELECT e.vec_id, e.embedding, c.cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqlCosine("e.embedding", "c.centroid")} DESC NULLS LAST,
         |        c.cent_id) AS rn
         |  FROM emb e CROSS JOIN cents c),
         |assigned AS (SELECT vec_id, embedding, cent_id FROM ranked WHERE rn = 1),
         |knn AS (
         |  SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
         |    ${sqlCosine("a.embedding", "b.embedding")} AS cos
         |  FROM assigned a JOIN assigned b
         |    ON a.cent_id = b.cent_id AND a.vec_id <> b.vec_id),
         |rk AS (
         |  SELECT src_id, nbr_id, cos, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY src_id ORDER BY cos DESC NULLS LAST, nbr_id)
         |    AS BIGINT) AS rk
         |  FROM knn)
         |SELECT src_id, rk, nbr_id, cos FROM rk WHERE rk <= 3
         |ORDER BY src_id, rk""".stripMargin,

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

    // per-anchor top-3 different-label neighbors; rank mirrors
    // (cos DESC, neg_id ASC) — a total order on both engines
    "q96_hard_negatives" ->
      s"""WITH a AS (SELECT vec_id AS anchor_id, label AS a_label,
         |    embedding AS a_emb FROM embeddings WHERE vec_id < 20),
         |p AS (
         |  SELECT a.anchor_id, e.vec_id AS neg_id,
         |    ${sqlCosine("e.embedding", "a.a_emb")} AS cos
         |  FROM embeddings e JOIN a ON e.label != a.a_label),
         |r AS (SELECT anchor_id, neg_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY anchor_id
         |      ORDER BY cos DESC, neg_id) AS BIGINT) AS rank
         |  FROM p)
         |SELECT anchor_id, neg_id, cos, rank FROM r
         |WHERE rank <= 3 ORDER BY anchor_id, rank""".stripMargin,

    // the IVF pipeline recomputed end-to-end — no twin needed: the
    // centroid means are EXACT decimal sums (order-independent, and a
    // float can never tie at decimal(18,9)'s rounding boundary — a dyadic
    // rational would need a factor of 5^9), cast decimal→double→float is
    // correctly rounded in both engines, and the assignment/probe
    // tie-breaks (strictly-greater fold ≡ ORDER BY sim DESC, cent_id) are
    // mirrored by the window rank. Constant range(1, 65): DuckDB's range
    // takes no lateral column refs; the 64-dim pin lives in
    // TablesSchemaSpec (the sqlDot precedent).
    "q51_sim_ann_ivf" ->
      s"""WITH emb AS (
         |  SELECT * FROM embeddings
         |  WHERE len(embedding) = 64
         |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         |pe AS (
         |  SELECT label, CAST(t.i - 1 AS INT) AS pos,
         |    embedding[CAST(t.i AS INT)] AS v
         |  FROM emb, range(1, 65) t(i)),
         |pc AS (
         |  SELECT label, pos,
         |    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS c
         |  FROM pe GROUP BY label, pos),
         |cents AS (
         |  SELECT label AS cent_id,
         |    list(CAST(c AS FLOAT) ORDER BY pos) AS centroid
         |  FROM pc GROUP BY label),
         |q AS (SELECT embedding AS q_emb FROM emb WHERE vec_id = 0),
         |ranked AS (
         |  SELECT e.vec_id, e.embedding, c.cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqlCosine("e.embedding", "c.centroid")} DESC NULLS LAST,
         |        c.cent_id) AS rn
         |  FROM emb e CROSS JOIN cents c),
         |assigned AS (SELECT vec_id, embedding, cent_id FROM ranked WHERE rn = 1),
         |pr AS (
         |  SELECT c.cent_id FROM cents c CROSS JOIN q
         |  ORDER BY ${sqlCosine("c.centroid", "q.q_emb")} DESC NULLS LAST, c.cent_id
         |  LIMIT 2)
         |SELECT a.vec_id, ${sqlCosine("a.embedding", "q.q_emb")} AS cos
         |FROM assigned a JOIN pr ON a.cent_id = pr.cent_id CROSS JOIN q
         |ORDER BY cos DESC NULLS LAST, a.vec_id LIMIT 10""".stripMargin,

    // the md5-plane ANN pipeline recomputed end-to-end: plane matrix from
    // md5 hex prefixes, signature bits from sequential-fold dots, Hamming≤2
    // multi-probe, exact-cosine top-10 — mirrors Md5LshSignatureImpl +
    // q43b's bucket/re-rank stages stage for stage. The WHERE on the s CTE
    // mirrors Spark's NULL-sig contract (short vector / null element →
    // NULL sig → hamming NULL → filtered).
    "q43b_sim_ann_lsh_md5" ->
      s"""WITH s AS (
         |  SELECT vec_id, embedding,
         |    CAST(${(0 until 6).map(sqlMd5PlaneBit).mkString(" +\n       ")} AS BIGINT) AS sig
         |  FROM embeddings
         |  WHERE len(embedding) >= 64
         |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         |q AS (SELECT sig AS q_sig, embedding AS q_emb FROM s WHERE vec_id = 0)
         |SELECT s.vec_id, s.sig,
         |  CAST(bit_count(xor(s.sig, q.q_sig)) AS BIGINT) AS hamming,
         |  ${sqlCosine("s.embedding", "q.q_emb")} AS cos
         |FROM s, q
         |WHERE bit_count(xor(s.sig, q.q_sig)) <= 2
         |ORDER BY cos DESC NULLS LAST, s.vec_id LIMIT 10""".stripMargin,

    // the ANN-backed dedup pipeline recomputed end-to-end: md5-plane
    // signatures (q43b fragment), Hamming≤2 multi-probe candidate join
    // (mask m links a→b iff m = a.sig XOR b.sig, so each pair emits once),
    // exact-cosine edge filter, then the q66/q69 recursive-reachability
    // component resolution. Mirrors annCosinePairs + ConnectedComponents.
    "q70b_dedup_embedding_ann_md5" ->
      s"""WITH RECURSIVE s AS (
         |  SELECT vec_id, label, embedding,
         |    CAST(${(0 until 6).map(sqlMd5PlaneBit).mkString(" +\n       ")} AS BIGINT) AS sig
         |  FROM embeddings
         |  WHERE len(embedding) >= 64
         |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         |mk AS (SELECT CAST(t.m AS BIGINT) AS m
         |  FROM range(0, 64) t(m) WHERE bit_count(t.m) <= 2),
         |e AS (
         |  SELECT a.vec_id AS a, b.vec_id AS b
         |  FROM s a, mk, s b
         |  WHERE a.label = b.label AND xor(a.sig, mk.m) = b.sig
         |    AND a.vec_id < b.vec_id
         |    AND ${sqlCosine("a.embedding", "b.embedding")} >= 0.35),
         |sym AS (SELECT a AS n, b AS m FROM e UNION SELECT b AS n, a AS m FROM e),
         |reach(src, node) AS (
         |  SELECT n, n FROM (SELECT DISTINCT n FROM sym)
         |  UNION
         |  SELECT r.src, s2.m FROM reach r JOIN sym s2 ON s2.n = r.node),
         |comp AS (SELECT src, min(node) AS keeper FROM reach GROUP BY src)
         |SELECT v.vec_id, COALESCE(c.keeper, v.vec_id) AS keeper
         |FROM embeddings v LEFT JOIN comp c ON v.vec_id = c.src
         |ORDER BY vec_id""".stripMargin,

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

    // the whole SemDeDup pipeline recomputed: q51's centroid/assignment
    // CTEs (exact decimal means, rank-window nearest-cell mirror), then
    // within-cell cosine edges into the q66/q69 recursive-reachability
    // component resolution; keeper = component min, kept = self-keeper
    "q104_dedup_semantic_cells" ->
      s"""WITH RECURSIVE emb AS (
         |  SELECT * FROM embeddings
         |  WHERE len(embedding) = 64
         |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         |pe AS (
         |  SELECT label, CAST(t.i - 1 AS INT) AS pos,
         |    embedding[CAST(t.i AS INT)] AS v
         |  FROM emb, range(1, 65) t(i)),
         |pc AS (
         |  SELECT label, pos,
         |    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS c
         |  FROM pe GROUP BY label, pos),
         |cents AS (
         |  SELECT label AS cent_id,
         |    list(CAST(c AS FLOAT) ORDER BY pos) AS centroid
         |  FROM pc GROUP BY label),
         |ranked AS (
         |  SELECT e.vec_id, e.embedding, c.cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqlCosine("e.embedding", "c.centroid")} DESC NULLS LAST,
         |        c.cent_id) AS rn
         |  FROM emb e CROSS JOIN cents c),
         |assigned AS (SELECT vec_id, embedding, cent_id FROM ranked WHERE rn = 1),
         |ed AS (
         |  SELECT a.vec_id AS a, b.vec_id AS b
         |  FROM assigned a JOIN assigned b
         |    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
         |  WHERE ${sqlCosine("a.embedding", "b.embedding")} >= 0.35),
         |sym AS (SELECT a AS n, b AS m FROM ed UNION SELECT b AS n, a AS m FROM ed),
         |reach(src, node) AS (
         |  SELECT n, n FROM (SELECT DISTINCT n FROM sym)
         |  UNION
         |  SELECT r.src, s2.m FROM reach r JOIN sym s2 ON s2.n = r.node),
         |comp AS (SELECT src, min(node) AS keeper FROM reach GROUP BY src)
         |SELECT v.vec_id, CAST(v.cent_id AS BIGINT) AS cell,
         |  COALESCE(c.keeper, v.vec_id) AS keeper,
         |  COALESCE(c.keeper, v.vec_id) = v.vec_id AS kept
         |FROM assigned v LEFT JOIN comp c ON v.vec_id = c.src
         |ORDER BY vec_id""".stripMargin,

    // PQ codebook training + encode recomputed end-to-end: subvector
    // split by integer division on the flattened position (`//` ≡ Spark's
    // `div`), per-(label, sub) exact decimal means (the q51 centroid
    // argument applies per subspace), squared-L2 via the sequential
    // double fold, argmin as the (dist ASC, code ASC) rank window — the
    // kernel's strictly-smaller scan produces the identical winner
    "q107_vec_pq_encode" ->
      """WITH emb AS (
        |  SELECT * FROM embeddings
        |  WHERE len(embedding) = 64
        |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
        |pe AS (
        |  SELECT vec_id, label,
        |    CAST((t.i - 1) // 8 AS INT) AS sub,
        |    CAST((t.i - 1) % 8 AS INT) AS j,
        |    embedding[CAST(t.i AS INT)] AS v
        |  FROM emb, range(1, 65) t(i)),
        |cm AS (
        |  SELECT label, sub, j,
        |    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS c
        |  FROM pe GROUP BY label, sub, j),
        |cb AS (
        |  SELECT sub, label AS code, list(CAST(c AS FLOAT) ORDER BY j) AS cent
        |  FROM cm GROUP BY sub, label),
        |sv AS (
        |  SELECT vec_id, sub, list(v ORDER BY j) AS svec
        |  FROM pe GROUP BY vec_id, sub),
        |dists AS (
        |  SELECT sv.vec_id, sv.sub, cb.code,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(range(1, 9),
        |        i -> (CAST(svec[CAST(i AS INT)] AS DOUBLE) -
        |              CAST(cent[CAST(i AS INT)] AS DOUBLE)) *
        |             (CAST(svec[CAST(i AS INT)] AS DOUBLE) -
        |              CAST(cent[CAST(i AS INT)] AS DOUBLE)))),
        |      (a, x) -> a + x) AS dist
        |  FROM sv JOIN cb USING (sub)),
        |r AS (
        |  SELECT vec_id, sub, code,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id, sub
        |      ORDER BY dist ASC, code ASC) AS rn
        |  FROM dists)
        |SELECT vec_id,
        |  string_agg(lpad(to_hex(code), 2, '0'), '' ORDER BY sub) AS codes_hex
        |FROM r WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // the IVFADC probe recomputed end-to-end: q107's codebook/encode CTEs,
    // q51's coarse-cell assignment + 2-cell probe selection, the per-query
    // ADC table (squared L2 of query subvectors to every codebook entry),
    // the shortlist score as a SEQUENTIAL sub-ordered fold (≡ the kernel's
    // s=0..m−1 loop — never a free-order double sum), then the exact
    // cosine re-rank; ties everywhere break to the smaller id
    "q108_sim_ann_ivfadc" ->
      s"""WITH emb AS (
         |  SELECT * FROM embeddings
         |  WHERE len(embedding) = 64
         |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         |pe AS (
         |  SELECT vec_id, label,
         |    CAST((t.i - 1) // 8 AS INT) AS sub,
         |    CAST((t.i - 1) % 8 AS INT) AS j,
         |    embedding[CAST(t.i AS INT)] AS v
         |  FROM emb, range(1, 65) t(i)),
         |cm AS (
         |  SELECT label, sub, j,
         |    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS c
         |  FROM pe GROUP BY label, sub, j),
         |cb AS (
         |  SELECT sub, label AS code, list(CAST(c AS FLOAT) ORDER BY j) AS cent
         |  FROM cm GROUP BY sub, label),
         |sv AS (
         |  SELECT vec_id, sub, list(v ORDER BY j) AS svec
         |  FROM pe GROUP BY vec_id, sub),
         |dists AS (
         |  SELECT sv.vec_id, sv.sub, cb.code,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(range(1, 9),
         |        i -> (CAST(svec[CAST(i AS INT)] AS DOUBLE) -
         |              CAST(cent[CAST(i AS INT)] AS DOUBLE)) *
         |             (CAST(svec[CAST(i AS INT)] AS DOUBLE) -
         |              CAST(cent[CAST(i AS INT)] AS DOUBLE)))),
         |      (a, x) -> a + x) AS dist
         |  FROM sv JOIN cb USING (sub)),
         |codes AS (
         |  SELECT vec_id, sub, code FROM (
         |    SELECT vec_id, sub, code,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |        ORDER BY dist ASC, code ASC) AS rn
         |    FROM dists) WHERE rn = 1),
         |pcm AS (
         |  SELECT label, CAST(t.i - 1 AS INT) AS pos,
         |    embedding[CAST(t.i AS INT)] AS v
         |  FROM emb, range(1, 65) t(i)),
         |pcc AS (
         |  SELECT label, pos,
         |    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS c
         |  FROM pcm GROUP BY label, pos),
         |cents AS (
         |  SELECT label AS cent_id,
         |    list(CAST(c AS FLOAT) ORDER BY pos) AS centroid
         |  FROM pcc GROUP BY label),
         |q AS (SELECT embedding AS q_emb FROM emb WHERE vec_id = 0),
         |ranked AS (
         |  SELECT e.vec_id, c.cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqlCosine("e.embedding", "c.centroid")} DESC NULLS LAST,
         |        c.cent_id) AS rn
         |  FROM emb e CROSS JOIN cents c),
         |assigned AS (SELECT vec_id, cent_id FROM ranked WHERE rn = 1),
         |pr AS (
         |  SELECT c.cent_id FROM cents c CROSS JOIN q
         |  ORDER BY ${sqlCosine("c.centroid", "q.q_emb")} DESC NULLS LAST, c.cent_id
         |  LIMIT 2),
         |qsv AS (
         |  SELECT sub, list(v ORDER BY j) AS qsub
         |  FROM pe WHERE vec_id = 0 GROUP BY sub),
         |adist AS (
         |  SELECT cb.sub, cb.code,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(range(1, 9),
         |        i -> (CAST(qsub[CAST(i AS INT)] AS DOUBLE) -
         |              CAST(cent[CAST(i AS INT)] AS DOUBLE)) *
         |             (CAST(qsub[CAST(i AS INT)] AS DOUBLE) -
         |              CAST(cent[CAST(i AS INT)] AS DOUBLE)))),
         |      (a, x) -> a + x) AS qdist
         |  FROM qsv JOIN cb USING (sub)),
         |sc AS (
         |  SELECT c.vec_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list(a.qdist ORDER BY c.sub)), (x, y) -> x + y) AS adc_dist
         |  FROM codes c JOIN adist a ON c.sub = a.sub AND c.code = a.code
         |  GROUP BY c.vec_id),
         |pre AS (
         |  SELECT sc.vec_id, sc.adc_dist
         |  FROM sc JOIN assigned USING (vec_id)
         |    JOIN pr ON assigned.cent_id = pr.cent_id
         |  ORDER BY sc.adc_dist ASC, sc.vec_id LIMIT 40)
         |SELECT p.vec_id, p.adc_dist,
         |  ${sqlCosine("e.embedding", "q.q_emb")} AS cos
         |FROM pre p JOIN emb e ON p.vec_id = e.vec_id CROSS JOIN q
         |ORDER BY cos DESC NULLS LAST, p.vec_id LIMIT 10""".stripMargin,

    // nprobe sweep: the q104 centroid/assignment mirror, brute ground
    // truth, the same rank-1 windows per (nprobe, probe); misses via the
    // spine left join
    // retrieval eval at nprobe=2: exact vs IVF top-10, hits per-mille by
    // integer div, MRR summed as exact integer 2520ths (lcm of ranks 1..10)
    "q249_retrieval_eval" ->
      s"""WITH emb AS (
         |  SELECT * FROM embeddings
         |  WHERE len(embedding) = 64
         |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         |pe AS (
         |  SELECT label, CAST(t.i - 1 AS INT) AS pos,
         |    embedding[CAST(t.i AS INT)] AS v
         |  FROM emb, range(1, 65) t(i)),
         |pc AS (
         |  SELECT label, pos,
         |    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
         |      / count(*) AS c
         |  FROM pe GROUP BY label, pos),
         |cents AS (
         |  SELECT label AS cent_id,
         |    list(CAST(c AS FLOAT) ORDER BY pos) AS centroid
         |  FROM pc GROUP BY label),
         |ranked AS (
         |  SELECT e.vec_id, e.embedding, c.cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqlCosine("e.embedding", "c.centroid")}
         |        DESC NULLS LAST, c.cent_id) AS rn
         |  FROM emb e CROSS JOIN cents c),
         |assigned AS (SELECT vec_id, embedding, cent_id
         |  FROM ranked WHERE rn = 1),
         |pr AS (SELECT vec_id AS p_id, embedding AS p_emb
         |  FROM assigned WHERE vec_id % 50 = 0),
         |allp AS (SELECT pr.p_id, a.vec_id AS c_id, a.cent_id AS c_cell,
         |    ${sqlCosine("pr.p_emb", "a.embedding")} AS cos
         |  FROM pr JOIN assigned a ON a.vec_id <> pr.p_id),
         |g AS (SELECT p_id, c_id AS g_id, rn AS g_rank FROM (
         |    SELECT p_id, c_id, ROW_NUMBER() OVER (PARTITION BY p_id
         |      ORDER BY cos DESC NULLS LAST, c_id) AS rn FROM allp)
         |  WHERE rn <= 10),
         |cr AS (SELECT p_id, c_cell FROM (
         |    SELECT pr.p_id, c.cent_id AS c_cell,
         |      ROW_NUMBER() OVER (PARTITION BY pr.p_id
         |        ORDER BY ${sqlCosine("c.centroid", "pr.p_emb")}
         |          DESC NULLS LAST, c.cent_id) AS crk
         |    FROM pr CROSS JOIN cents c) WHERE crk <= 2),
         |a AS (SELECT p_id, c_id AS a_id, rn AS a_rank FROM (
         |    SELECT allp.p_id, allp.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY allp.p_id
         |        ORDER BY allp.cos DESC NULLS LAST, allp.c_id) AS rn
         |    FROM allp JOIN cr ON allp.p_id = cr.p_id
         |      AND allp.c_cell = cr.c_cell)
         |  WHERE rn <= 10),
         |inter AS (SELECT g.p_id, CAST(count(*) AS BIGINT) AS hits,
         |    CAST(coalesce(min(CASE WHEN g.g_rank = 1
         |      THEN 2520 // a.a_rank END), 0) AS BIGINT) AS rr2520
         |  FROM g JOIN a ON a.p_id = g.p_id AND a.a_id = g.g_id
         |  GROUP BY g.p_id),
         |per AS (SELECT pr.p_id, coalesce(i.hits, 0) AS hits,
         |    coalesce(i.rr2520, 0) AS rr2520
         |  FROM pr LEFT JOIN inter i USING (p_id))
         |SELECT CAST(count(*) AS BIGINT) AS n_probes,
         |  CAST(sum(hits) AS BIGINT) AS sum_hits,
         |  (1000 * CAST(sum(hits) AS BIGINT)) // (10 * count(*))
         |    AS recall_pm,
         |  CAST(sum(rr2520) AS BIGINT) AS mrr_num,
         |  CAST(CAST(sum(rr2520) AS BIGINT) AS DOUBLE)
         |    / (2520.0 * CAST(count(*) AS DOUBLE)) AS mrr
         |FROM per""".stripMargin,

    "q236_ivf_nprobe_sweep" ->
      s"""WITH emb AS (
         |  SELECT * FROM embeddings
         |  WHERE len(embedding) = 64
         |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         |pe AS (
         |  SELECT label, CAST(t.i - 1 AS INT) AS pos,
         |    embedding[CAST(t.i AS INT)] AS v
         |  FROM emb, range(1, 65) t(i)),
         |pc AS (
         |  SELECT label, pos,
         |    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
         |      / count(*) AS c
         |  FROM pe GROUP BY label, pos),
         |cents AS (
         |  SELECT label AS cent_id,
         |    list(CAST(c AS FLOAT) ORDER BY pos) AS centroid
         |  FROM pc GROUP BY label),
         |ranked AS (
         |  SELECT e.vec_id, e.embedding, c.cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqlCosine("e.embedding", "c.centroid")}
         |        DESC NULLS LAST, c.cent_id) AS rn
         |  FROM emb e CROSS JOIN cents c),
         |assigned AS (SELECT vec_id, embedding, cent_id
         |  FROM ranked WHERE rn = 1),
         |pr AS (SELECT vec_id AS p_id, embedding AS p_emb
         |  FROM assigned WHERE vec_id % 50 = 0),
         |allp AS (SELECT pr.p_id, a.vec_id AS c_id, a.cent_id AS c_cell,
         |    ${sqlCosine("pr.p_emb", "a.embedding")} AS cos
         |  FROM pr JOIN assigned a ON a.vec_id <> pr.p_id),
         |g1 AS (SELECT p_id, c_id AS g_id FROM (
         |    SELECT p_id, c_id, ROW_NUMBER() OVER (PARTITION BY p_id
         |      ORDER BY cos DESC NULLS LAST, c_id) AS rn FROM allp)
         |  WHERE rn = 1),
         |cr AS (SELECT pr.p_id, c.cent_id AS c_cell,
         |    ROW_NUMBER() OVER (PARTITION BY pr.p_id
         |      ORDER BY ${sqlCosine("c.centroid", "pr.p_emb")}
         |        DESC NULLS LAST, c.cent_id) AS crk
         |  FROM pr CROSS JOIN cents c),
         |np AS (SELECT CAST(unnest([1, 2, 4]) AS BIGINT) AS nprobe),
         |a1 AS (SELECT nprobe, p_id, c_id AS a_id FROM (
         |    SELECT np.nprobe, allp.p_id, allp.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY np.nprobe, allp.p_id
         |        ORDER BY allp.cos DESC NULLS LAST, allp.c_id) AS rn
         |    FROM allp JOIN cr ON allp.p_id = cr.p_id
         |        AND allp.c_cell = cr.c_cell
         |      CROSS JOIN np
         |    WHERE cr.crk <= np.nprobe)
         |  WHERE rn = 1),
         |sp AS (SELECT pr.p_id, np.nprobe FROM pr CROSS JOIN np)
         |SELECT sp.nprobe, CAST(count(*) AS BIGINT) AS n_probes,
         |  CAST(count(CASE WHEN a1.a_id = g1.g_id THEN 1 END) AS BIGINT)
         |    AS hits,
         |  (1000 * count(CASE WHEN a1.a_id = g1.g_id THEN 1 END))
         |    // count(*) AS recall_pm
         |FROM sp JOIN g1 USING (p_id)
         |  LEFT JOIN a1 ON a1.nprobe = sp.nprobe AND a1.p_id = sp.p_id
         |GROUP BY sp.nprobe ORDER BY sp.nprobe""".stripMargin,

    // quantization fidelity: the shared quant core's code lists vs exact
    // float cosine — integer centered dot (order-independent BIGINT sum),
    // rank-1 windows with the (value DESC, id) total order both sides
    "q234_quantization_fidelity" ->
      (quantCodesOracleCore + s""",
        |cl AS (SELECT vec_id, list(code ORDER BY pos) AS codes
        |  FROM c GROUP BY vec_id),
        |emb AS (SELECT e.vec_id, e.embedding, cl.codes
        |  FROM embeddings e JOIN cl USING (vec_id)
        |  WHERE len(e.embedding) = 64
        |    AND len(list_filter(e.embedding, x -> x IS NULL)) = 0),
        |pr AS (SELECT vec_id AS p_id, embedding AS p_emb,
        |    codes AS p_codes
        |  FROM emb WHERE vec_id % 50 = 0),
        |sims AS (SELECT pr.p_id, emb.vec_id AS c_id,
        |    ${sqlCosine("pr.p_emb", "emb.embedding")} AS cos,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 65),
        |        i -> CAST((2 * pr.p_codes[CAST(i AS INT)] - 255) *
        |          (2 * emb.codes[CAST(i AS INT)] - 255) AS BIGINT))),
        |      (a, x) -> a + x) AS idot
        |  FROM pr JOIN emb ON emb.vec_id <> pr.p_id),
        |rr AS (SELECT *,
        |    row_number() OVER (PARTITION BY p_id
        |      ORDER BY cos DESC NULLS LAST, c_id) AS rf,
        |    row_number() OVER (PARTITION BY p_id
        |      ORDER BY idot DESC, c_id) AS rc
        |  FROM sims),
        |f AS (SELECT p_id, c_id AS top1_float, cos AS cos_float_best
        |  FROM rr WHERE rf = 1),
        |cc AS (SELECT p_id, c_id AS top1_code, cos AS cos_code_choice,
        |    idot AS idot_best
        |  FROM rr WHERE rc = 1)
        |SELECT f.p_id AS vec_id, f.top1_float, cc.top1_code,
        |  f.top1_float = cc.top1_code AS agree,
        |  f.cos_float_best, cc.cos_code_choice,
        |  f.cos_float_best - cc.cos_code_choice AS regret, cc.idot_best
        |FROM f JOIN cc USING (p_id) ORDER BY vec_id""".stripMargin),

    // Fisher separability: the shared quant core's codes joined back to
    // labels; BIGINT power sums, fixed double scatter terms combined by
    // label-ordered list_reduce (≡ Spark's sorted aggregate fold)
    "q233_embedding_separability" ->
      (quantCodesOracleCore +
      """, lc AS (SELECT e.label, c.pos, c.code
        |  FROM c JOIN embeddings e USING (vec_id)),
        |st AS (SELECT label, pos, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(code) AS BIGINT) AS sv,
        |    CAST(sum(code * code) AS BIGINT) AS sv2
        |  FROM lc GROUP BY label, pos),
        |tot AS (SELECT pos, CAST(sum(n) AS BIGINT) AS nt,
        |    CAST(sum(sv) AS BIGINT) AS svt
        |  FROM st GROUP BY pos),
        |tm AS (SELECT st.pos, st.label,
        |    CAST(sv2 AS DOUBLE) - CAST(sv AS DOUBLE) * sv / n AS term_w,
        |    CAST(n AS DOUBLE) *
        |      (CAST(sv AS DOUBLE) / n - CAST(svt AS DOUBLE) / nt) *
        |      (CAST(sv AS DOUBLE) / n - CAST(svt AS DOUBLE) / nt) AS term_b
        |  FROM st JOIN tot USING (pos)),
        |ag AS (SELECT pos, CAST(count(*) AS BIGINT) AS n_labels,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(term_w ORDER BY label)), (a, x) -> a + x) AS w_scatter,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(term_b ORDER BY label)), (a, x) -> a + x) AS b_scatter
        |  FROM tm GROUP BY pos)
        |SELECT CAST(pos AS BIGINT) AS pos, n_labels, w_scatter, b_scatter,
        |  CASE WHEN w_scatter > 0 THEN b_scatter / w_scatter END AS f_ratio
        |FROM ag ORDER BY pos""".stripMargin),

    // int8 scalar quantization recomputed end-to-end in INTEGER space:
    // floor(x·10⁶)→BIGINT (exact in both engines), per-dimension BIGINT
    // min/max, pure integer-div codes and reconstruction — no float
    // rounding mode, no decimal-division scale rules, so the arrays
    // hash-match bit-for-bit. Two unnest()s zip row-wise (the q97
    // posexplode mirror); `//` ≡ Spark's `div` on the nonnegative
    // operands both sides produce.
    "q101_vec_quantize_int8" ->
      (quantCodesOracleCore +
      s""", r AS (SELECT vec_id, pos, code,
         |    abs(iv - (mn + (CAST(code AS BIGINT) * (mx - mn)) // 255)) AS err
         |  FROM c)
         |SELECT vec_id,
         |  string_agg(lpad(to_hex(code), 2, '0'), '' ORDER BY pos) AS codes_hex,
         |  max(err) AS max_err
         |FROM r GROUP BY vec_id ORDER BY vec_id""".stripMargin),

    // JL projection: the shared int8-code refit (quantCodesOracleCore =
    // the q101 chain), the identical md5-parity ±1 sign matrix, exact
    // BIGINT projections and squared distances; distortion in integer
    // per-mille of the E[d²_proj] = K·d²_orig identity
    "q216_vec_jl_projection" ->
      (quantCodesOracleCore +
      """, signs AS (SELECT CAST(ii.i AS INT) AS i, CAST(jj.j AS INT) AS j,
        |    CASE WHEN ('0x' || substr(md5('jl:' || ii.i || ':' || jj.j),
        |      1, 8))::BIGINT % 2 = 0 THEN 1 ELSE -1 END AS s
        |  FROM (SELECT unnest(range(0, 64)) AS i) ii,
        |       (SELECT unnest(range(0, 16)) AS j) jj),
        |proj AS (SELECT vec_id, j,
        |    CAST(sum(CAST(s AS BIGINT) * code) AS BIGINT) AS p
        |  FROM c JOIN signs ON signs.i = c.pos GROUP BY vec_id, j),
        |ids AS (SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM (SELECT DISTINCT vec_id FROM c) a
        |  JOIN (SELECT DISTINCT vec_id FROM c) b
        |    ON b.vec_id = a.vec_id + 1
        |  WHERE a.vec_id % 5 = 0),
        |d2o AS (SELECT ids.va, ids.vb,
        |    CAST(sum((CAST(ca.code AS BIGINT) - cb.code)
        |      * (CAST(ca.code AS BIGINT) - cb.code)) AS BIGINT) AS d2_orig
        |  FROM ids JOIN c ca ON ca.vec_id = ids.va
        |    JOIN c cb ON cb.vec_id = ids.vb AND cb.pos = ca.pos
        |  GROUP BY ids.va, ids.vb),
        |d2p AS (SELECT ids.va, ids.vb,
        |    CAST(sum((pa.p - pb.p) * (pa.p - pb.p)) AS BIGINT) AS d2_proj
        |  FROM ids JOIN proj pa ON pa.vec_id = ids.va
        |    JOIN proj pb ON pb.vec_id = ids.vb AND pb.j = pa.j
        |  GROUP BY ids.va, ids.vb)
        |SELECT d2o.va AS vec_id_a, d2o.vb AS vec_id_b,
        |  d2_orig, d2_proj,
        |  CASE WHEN d2_orig > 0
        |    THEN (1000 * d2_proj) // (16 * d2_orig) END AS distortion_pm
        |FROM d2o JOIN d2p ON d2o.va = d2p.va AND d2o.vb = d2p.vb
        |ORDER BY vec_id_a""".stripMargin),
  )
}

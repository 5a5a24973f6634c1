package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions.cosineNative
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-17 semantic pins.
  *
  *  - q157's grouped core now collapses BOTH pair-join sides: candidates
  *    to each exact-embedding group's 4 smallest ids AND probes to one
  *    depth-4 ranking per group (members derive their top-3 by
  *    self-exclusion list algebra). The pin runs grouped vs direct on a
  *    MIXED fixture — some vectors replicated 5× (groups deeper than the
  *    keep-4), some unique — so in-group lists, cross-group lists and the
  *    substitution edge (a member displacing exactly one entry) are all
  *    exercised.
  *  - q252's stored-base maintenance must satisfy the union equation
  *    against an independently-built full rebuild under the same FROZEN
  *    base centroids (the in-Spark twin of the DuckDB oracle).
  *  - q258's ±retraction maintenance must equal the full recompute over
  *    the CdcMerge-resolved table (count and exact-decimal sum are
  *    abelian — the equation is exact, not approximate).
  */
class R17QuerySemanticsSpec extends SparkSpec {

  test("q157: grouped probe+candidate collapse ≡ direct on a mixed-replication fixture") {
    val e0 = Tables.embeddings(spark, sfDir).limit(120)
    // replicate only ids ≡ 0 mod 3 (5 replicas), keep the rest unique:
    // groups of size 5 (> keep-4) coexist with singleton groups in the
    // same cells, so top-3 lists mix in-group and cross-group neighbors
    val rep = (1 until 5).map { r =>
      e0.filter(col("vec_id") % 3 === 0)
        .select((col("vec_id") + lit(r * 100000L)).as("vec_id"),
          col("embedding"), col("label"))
    }.reduce(_ unionByName _)
    val e = e0.unionByName(rep)
    val direct = VectorQueries.knnGraph(spark, e,
      collapseIdentical = false).collect().map(_.toSeq).toSeq
    val grouped = VectorQueries.knnGraph(spark, e,
      collapseIdentical = true).collect().map(_.toSeq).toSeq
    assert(direct.nonEmpty)
    assert(direct == grouped,
      s"grouped collapse changed the graph\n first diffs: ${
        direct.zip(grouped).filter(p => p._1 != p._2).take(3)}")
    // fixture sanity: replicated members beyond their group's 4 smallest
    // still get full 3-entry lists (they are probes, never candidates)
    val bySrc = grouped.groupBy(_.head.asInstanceOf[Long])
    val high = bySrc.keys.filter(_ >= 400000L)
    assert(high.nonEmpty && high.forall(u => bySrc(u).size == 3))
    // and unique vectors (singleton groups) are present with lists too
    val uniq = bySrc.keys.filter(k => k < 100000L && k % 3 != 0)
    assert(uniq.nonEmpty)
  }

  test("q186: grouped anchor collapse ≡ direct triplet mining on a mixed-replication fixture") {
    // same fixture discipline as the q157 pin: 5× replicas for ids ≡ 0
    // mod 3 (anchor groups deeper than keep-2), singletons elsewhere —
    // exercises the positive's self-exclusion substitution, the
    // negative's inheritance, and anchors whose positive list empties
    val e0 = Tables.embeddings(spark, sfDir).limit(120)
    val rep = (1 until 5).map { r =>
      e0.filter(col("vec_id") % 3 === 0)
        .select((col("vec_id") + lit(r * 100000L)).as("vec_id"),
          col("embedding"), col("label"))
    }.reduce(_ unionByName _)
    val e = e0.unionByName(rep)
      .filter(size(col("embedding")) === 64 &&
        !exists(col("embedding"), x => x.isNull))
    val asg = IvfStorage.assignCells(e, IvfStorage.labelCentroids(e))
      .select("vec_id", "label", "embedding", "cent_id")
    val direct = VectorQueries.tripletMine(asg, collapseCandidates = false)
      .collect().map(_.toSeq).toSeq
    val grouped = VectorQueries.tripletMine(asg, collapseCandidates = true)
      .collect().map(_.toSeq).toSeq
    assert(direct.nonEmpty && direct == grouped,
      s"grouped anchors changed the triplets\n first diffs: ${
        direct.zip(grouped).filter(p => p._1 != p._2).take(3)}")
    // replicated anchors beyond their group's keep-2 must still mine
    val ids = grouped.map(_.head.asInstanceOf[Long]).toSet
    assert(ids.exists(_ >= 400000L))
  }

  test("q69: star+rep-pair collapse ≡ direct cosine dedup, incl. the degenerate zero-vector edge") {
    val e0 = Tables.embeddings(spark, sfDir).limit(120)
    val rep = (1 until 5).map { r =>
      e0.filter(col("vec_id") % 3 === 0)
        .select((col("vec_id") + lit(r * 100000L)).as("vec_id"),
          col("embedding"), col("label"))
    }.reduce(_ unionByName _)
    // two IDENTICAL zero vectors in one label: their cosines are NaN,
    // and Spark's NaN-is-greatest comparison makes NaN ≥ τ TRUE — the
    // direct join therefore connects them (to each other AND to every
    // label-mate), and the star filter uses the very same predicate on
    // the self-cosine, so the grouped path must agree exactly
    val zeros = spark.range(2).select(
      (col("id") + 900000L).as("vec_id"),
      expr("transform(sequence(1, 64), i -> CAST(0.0 AS FLOAT))")
        .as("embedding"),
      lit(1).cast(e0.schema("label").dataType).as("label"))
    val e = e0.unionByName(rep).unionByName(zeros)
    val direct = VectorQueries.cosineDedup(e, collapseIdentical = false)
      .collect().map(_.toSeq).toSeq
    val grouped = VectorQueries.cosineDedup(e, collapseIdentical = true)
      .collect().map(_.toSeq).toSeq
    assert(direct.nonEmpty && direct == grouped,
      s"collapse changed components\n first diffs: ${
        direct.zip(grouped).filter(p => p._1 != p._2).take(3)}")
    val byId = grouped.map(r =>
      r.head.asInstanceOf[Long] -> r(1).asInstanceOf[Long]).toMap
    // NaN-as-greatest: the zero vectors join their label's component
    // (identically in both paths — the equality above is the real pin)
    assert(byId(900000L) == byId(900001L))
    // replicas collapse into their group's component
    assert(byId(400003L) == byId(3L))
  }

  test("q252: stored-untouched ∪ recomputed-touched ≡ full rebuild under frozen base centroids") {
    val out = graft.SparkEntry.queries("q252_knn_incremental")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    // independent full rebuild: frozen base-fitted centroids, every vector
    // assigned, plain within-cell pair join + per-member window (no
    // grouped collapse, no stored artifact — a from-scratch reference)
    val e = Tables.embeddings(spark, sfDir)
      .filter(size(col("embedding")) === 64 &&
        !exists(col("embedding"), x => x.isNull))
    val cents = IvfStorage.labelCentroids(e.filter(col("vec_id") % 11 =!= 7))
    val assigned = IvfStorage.assignCells(e, cents)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
    val touched = assigned.filter(col("vec_id") % 11 === 7)
      .select(col("cent_id")).distinct()
      .withColumn("is_touched", lit(true))
    val a = assigned.select(col("vec_id").as("src_id"), col("cent_id"),
      col("embedding").as("a_emb"))
    val b = assigned.select(col("vec_id").as("nbr_id"),
      col("cent_id").as("b_cent"), col("embedding").as("b_emb"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src_id")
      .orderBy(col("cos").desc_nulls_last, col("nbr_id"))
    val want = a.join(b, col("cent_id") === col("b_cent") &&
        col("src_id") =!= col("nbr_id"))
      .select(col("src_id"), col("cent_id"), col("nbr_id"),
        cosineNative(col("a_emb"), col("b_emb")).as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .join(touched, Seq("cent_id"), "left")
      .select(col("src_id"), col("rk"), col("nbr_id"), col("cos"),
        coalesce(col("is_touched"), lit(false)).as("touched"))
      .orderBy("src_id", "rk")
      .collect().map(_.toSeq).toSeq
    assert(want.nonEmpty && out == want)
    // at the spec's (tiny) scale the mod-11 delta may touch EVERY cell —
    // the stored half is then legitimately empty; when untouched cells
    // exist, both halves must appear (the driver-gate sf0.01 run and the
    // sf0.1 bench both have untouched cells)
    val flags = out.map(_.last.asInstanceOf[Boolean]).toSet
    assert(flags.contains(true))
    val wantFlags = want.map(_.last.asInstanceOf[Boolean]).toSet
    assert(flags == wantFlags)
  }

  test("q258: stored − old + new ≡ full recompute over the CdcMerge-resolved table") {
    val out = graft.SparkEntry.queries("q258_ivm_agg_retract")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val ch = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(
        when(col("o_orderkey") % 7 === 0, col("o_custkey") + 1000000000000L)
          .otherwise(col("o_custkey")).as("c_custkey"),
        concat(lit("cdc#"), col("o_orderkey").cast("string")).as("c_name"),
        col("o_totalprice").as("c_acctbal"),
        col("o_orderpriority").as("c_mktsegment"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 10 === 0, lit("D"))
          .otherwise(lit("U")).as("op"))
    val want = CdcMerge.apply(cust, ch, "c_custkey", "seq", "op")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("c_acctbal").cast(
          org.apache.spark.sql.types.DecimalType(18, 2))).as("s"))
      .select(col("c_mktsegment"), col("n_rows"),
        col("s").cast("double").as("total_bal"))
      .orderBy("c_mktsegment")
      .collect().map(_.toSeq).toSeq
    assert(want.nonEmpty && out == want)
    // the readout must mix SURVIVING base segments with upsert-created
    // ones — otherwise the retraction algebra wasn't really exercised
    // (a base segment fully emptied by retraction, e.g. BUILDING at some
    // scales, is itself the n>0 drop working — so require ANY survivor,
    // not one specific segment)
    val base = Set("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    val segs = out.map(_.head.asInstanceOf[String])
    assert(segs.exists(_.contains("URGENT")) && segs.exists(base.contains))
  }
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components: fixed-point
  * PageRank — the link-centrality signal web-scale corpus curation uses to
  * weight crawl frontiers and source quality (OPIC/harmonic-centrality
  * variants rank CommonCrawl hosts the same way).
  *
  * All rank arithmetic runs in BIGINT fixed-point (SCALE = 10¹²):
  * per-edge contributions are integer divisions `rank div outdeg`, the
  * damping step is `(15·SCALE) div (100·N) + (85·Σcontrib) div 100`, and
  * integer sums are order-independent — so unlike float PageRank the
  * result is bit-identical at any parallelism AND reproducible in DuckDB,
  * which mirrors the iteration as unrolled CTEs. Truncation loses at most
  * outdeg−1 rank units (10⁻¹² each) per node per round: immaterial for
  * ranking, priceless for determinism.
  */
object PageRank {

  val Scale = 1000000000000L // 10¹² rank units = 1.0

  /** `iterations` damped PageRank rounds over directed `edges` (src, dst).
    * Caller contract: the graph is symmetrized (every node appears as both
    * src and dst — [[GraphQueries]] unions both directions), so there are
    * no dangling nodes and no mass-leak correction is needed; nodes with
    * no in-edges are still kept (rank = the damping base) via the left
    * join.
    *
    * Scale shape: edges are pre-partitioned by src ONCE and persisted
    * (run-scoped) — every iteration's rank join reuses that exchange; the
    * per-iteration shuffles are the rank-by-src join and the groupBy dst,
    * both linear in |E|. Iteration count is fixed (the caller picks it),
    * so the plan is a bounded chain, no checkpointing needed below ~10
    * rounds. Returns (node, r) with r in fixed-point units. */
  def run(edges0: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 10,
      s"iterations must be in [1, 10] (bounded plan chain): $iterations")
    val spark = edges0.sparkSession
    val edges = edges0.select(col("src"), col("dst"))
      .repartition(spark.sparkContext.defaultParallelism, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    RunScopedCache.releaseAfterRun(spark, edges)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = deg.select(col("src").as("node"))
    val nTot = deg.agg(count(lit(1)).as("nn"))
    var ranks = nodes.crossJoin(broadcast(nTot))
      .select(col("node"), expr(s"$Scale div nn").as("r"))
    for (_ <- 1 to iterations) {
      val contribs = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst"), expr("r div outdeg").as("c"))
      val inbound = contribs.groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(inbound, col("node") === col("dst"), "left")
        .crossJoin(broadcast(nTot))
        .select(col("node"),
          expr(s"(15 * $Scale) div (nn * 100) + (85 * coalesce(s, 0L)) div 100")
            .as("r"))
    }
    ranks
  }
}

/** q129 — the iterative-graph query (SURVEY §2B graph-analytics family,
  * with q66's connected components).
  */
object GraphQueries extends QueryGroup {

  /** Q129: fixed-point PageRank over the purchase graph — customers and
    * suppliers as nodes, an (undirected → symmetrized) edge wherever a
    * customer's order shipped a supplier's part. 5 damped rounds, top-100
    * by rank (TakeOrderedAndProject — never a global sort). The oracle
    * unrolls the identical integer recurrence as chained CTEs, so model
    * fitting and every truncated division hash-match end-to-end. */
  private val q129: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val e0 = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c:"), col("o_custkey").cast("string")).as("a"),
        concat(lit("s:"), col("l_suppkey").cast("string")).as("b"))
      .distinct()
    val edges = e0.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e0.select(col("b").as("src"), col("a").as("dst")))
    PageRank.run(edges, 5)
      .select(col("node"), col("r").as("rank_fp"),
        (col("r").cast("double") / 1.0e12).as("rank"))
      .orderBy(col("rank_fp").desc, col("node"))
      .limit(100)
  }

  val queries: Seq[(String, Q)] = Seq(
    "q129_graph_pagerank" -> q129,
  )

  val oracles: Map[String, String] = Map(
    // the same integer recurrence, unrolled: i1..i5 each join the previous
    // ranks to the symmetrized edge list, divide by outdeg (BIGINT //),
    // regroup on dst. sum() is HUGEINT in DuckDB → CAST before the damping
    // arithmetic (the q91 rule). Every node has in-edges (symmetrized), so
    // the plain JOIN keeps the full node set, matching Spark's left join.
    "q129_graph_pagerank" ->
      """WITH e0 AS (
        |  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS a,
        |    's:' || CAST(l_suppkey AS VARCHAR) AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT a AS src, b AS dst FROM e0
        |      UNION ALL SELECT b AS src, a AS dst FROM e0),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
        |        FROM e GROUP BY src),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM deg),
        |i0 AS (SELECT src AS node, 1000000000000 // (SELECT nn FROM n) AS r
        |       FROM deg),
        |i1 AS (
        |  SELECT e.dst AS node,
        |    (15 * 1000000000000) // ((SELECT nn FROM n) * 100)
        |      + (85 * CAST(sum(pr.r // dg.outdeg) AS BIGINT)) // 100 AS r
        |  FROM e JOIN i0 pr ON e.src = pr.node
        |         JOIN deg dg ON dg.src = e.src
        |  GROUP BY e.dst),
        |i2 AS (
        |  SELECT e.dst AS node,
        |    (15 * 1000000000000) // ((SELECT nn FROM n) * 100)
        |      + (85 * CAST(sum(pr.r // dg.outdeg) AS BIGINT)) // 100 AS r
        |  FROM e JOIN i1 pr ON e.src = pr.node
        |         JOIN deg dg ON dg.src = e.src
        |  GROUP BY e.dst),
        |i3 AS (
        |  SELECT e.dst AS node,
        |    (15 * 1000000000000) // ((SELECT nn FROM n) * 100)
        |      + (85 * CAST(sum(pr.r // dg.outdeg) AS BIGINT)) // 100 AS r
        |  FROM e JOIN i2 pr ON e.src = pr.node
        |         JOIN deg dg ON dg.src = e.src
        |  GROUP BY e.dst),
        |i4 AS (
        |  SELECT e.dst AS node,
        |    (15 * 1000000000000) // ((SELECT nn FROM n) * 100)
        |      + (85 * CAST(sum(pr.r // dg.outdeg) AS BIGINT)) // 100 AS r
        |  FROM e JOIN i3 pr ON e.src = pr.node
        |         JOIN deg dg ON dg.src = e.src
        |  GROUP BY e.dst),
        |i5 AS (
        |  SELECT e.dst AS node,
        |    (15 * 1000000000000) // ((SELECT nn FROM n) * 100)
        |      + (85 * CAST(sum(pr.r // dg.outdeg) AS BIGINT)) // 100 AS r
        |  FROM e JOIN i4 pr ON e.src = pr.node
        |         JOIN deg dg ON dg.src = e.src
        |  GROUP BY e.dst)
        |SELECT node, r AS rank_fp,
        |  CAST(r AS DOUBLE) / 1000000000000.0 AS rank
        |FROM i5
        |ORDER BY rank_fp DESC, node LIMIT 100""".stripMargin,
  )
}

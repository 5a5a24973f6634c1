package graft.operators

import graft.Tables
import graft.functions.WeightedAvg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining §2B inventory: embedding centroids, sketch aggregation, and the
  * typed-Aggregator UDAF surface. */
object MlQueries extends QueryGroup {

  /** Q48: per-label embedding centroids (position-wise mean) — the
    * training-pipeline "class prototype" op and the building block for IVF
    * ANN. Shape: posexplode → one hash-agg on (label, pos); group sums are
    * small (rows-per-label), so plain double summation stays within the
    * 6 d.p. oracle tolerance. */
  private val q48: Q = (s, d) =>
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .groupBy(col("label"), (col("pos0") + 1).cast("long").as("pos"))
      .agg((sum(col("v").cast("decimal(18,9)")).cast("double") / count(lit(1))).as("c"))
      .orderBy("label", "pos")

  /** Q49 ⚙: HLL sketch aggregation (approx_count_distinct) next to exact —
    * engine-only (DuckDB's HLL differs); bounds-checked in ScalaTest. */
  private val q49: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_suppkey")).as("approx_supp"),
        countDistinct(col("l_suppkey")).as("exact_supp"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .orderBy("l_returnflag")

  /** Q50: weighted average via a typed Aggregator[IN, BUF, OUT] (UDAF
    * surface), deterministic under any merge order (exact µ-unit buffer). */
  private val q50: Q = (s, d) => {
    val wavg = udaf(WeightedAvg)
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"))
      .orderBy("l_returnflag")
  }

  /** Q52: exact percentiles (median / p90) — both engines use the standard
    * linear-interpolation definition over the sorted values. */
  private val q52: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("median_price"),
        expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
        expr("percentile(l_quantity, 0.25)").as("p25_qty"))
      .orderBy("l_returnflag")

  /** Q230: distributed EXACT median by value-domain refinement — the
    * 100 TB-true exact order statistic: q52's `percentile` buffers every
    * group's values in one aggregation buffer (exact but memory ∝ group
    * size — its documented caveat), and q128's mergeable histogram is
    * approximate; THIS is exact at any group size with bounded memory.
    * [selection lowered to value-domain refinement]: per group, narrow
    * the CENTS domain through 256-bucket histogram rounds — each round
    * ONE grouped histogram scan (map-side partials, a (groups × ≤257)-row
    * result to the driver), interval ÷256 per round so
    * ⌈log₂₅₆(range)⌉ ≈ 2 rounds for a cents domain, all groups searched
    * SIMULTANEOUSLY in the same scan and dropped from the probe as they
    * converge. Selection rank k = (n+1) div 2 (lower median) — a pure
    * integer rank, never a float percentile literal (the q158 rule).
    * Exactness: the domain is exact cents (the q224 DECIMAL(18,2) cast),
    * counts are BIGINTs — the result is THE k-th order statistic, not an
    * interpolation, so the oracle recomputes it with a plain
    * cumulative-count subquery.
    *
    * Scale shape: the driver holds (lo, hi) per GROUP (dimension-sized);
    * every pass is one partial-agg scan; no shuffle of raw rows, no
    * per-group buffering anywhere. The q137 MAD at raw-fact volume
    * composes from two of these searches. */
  private val q230: Q = (s, d) => {
    val cents = Tables.lineitem(s, d).select(col("l_returnflag").as("grp"),
      (col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long").as("v"))
    graft.functions.ExactSelect.medianByGroup(cents, "grp", "v")
      .orderBy("grp")
  }

  /** Q237: distributed EXACT p50/p95/p99 — [[graft.functions.ExactSelect
    * .ranksByGroup]], the arbitrary-rank generalization of q230's median
    * walk: every (group, percentile) probe refines its own (lo, hi, k')
    * interval but ALL probes share each round's single grouped histogram
    * scan (rows explode onto a per-group literal probe table), so
    * p50/p95/p99 over the cents domain still costs ~⌈log₂₅₆(range)⌉ ≈ 2
    * scans at ANY group size — the 100 TB replacement for q52's
    * group-buffering `percentile` and the exact companion to q87's
    * sketch. Rank k = (p·n + 99) div 100 (nearest-rank ceil) is pure
    * integer — never a float percentile literal (the q158 rule) — so the
    * oracle recomputes each order statistic with a rank subquery and must
    * land on exactly the same row. */
  private val q237: Q = (s, d) => {
    val cents = Tables.lineitem(s, d).select(col("l_returnflag").as("grp"),
      (col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long").as("v"))
    graft.functions.ExactSelect.ranksByGroup(cents, "grp", "v",
        Seq(50, 95, 99))
      .orderBy("grp", "pct")
  }

  /** Q53: pivot (wide aggregation) — explicit value list so the plan is a
    * single pass, no distinct-values pre-query. */
  private val q53: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .select(col("l_returnflag"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"))
      .orderBy("l_returnflag")

  /** Q85: unpivot (melt) — the inverse of q53's pivot: a wide per-group
    * aggregate turned into long (group, metric, value) rows via the native
    * `Dataset.unpivot` (Expand under the hood, one pass, no union-of-N
    * scans). Values go through exact decimal sums ([[graft.operators.dsum]])
    * so the melted doubles hash-match DuckDB's UNPIVOT. */
  private val q85: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_discount")).as("sum_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "metric", "value")
      .orderBy("l_returnflag", "metric")

  /** Q87 ⚙: approximate percentiles (t-digest-family sketch) — the
    * streaming/mergeable companion to q52's exact percentiles, the same
    * role q49's HLL plays for distinct counts: one pass, bounded memory,
    * partition-mergeable — the only percentile that works at 100 TB
    * without a full sort. `accuracy = 10000` bounds rank error at
    * 1/10000 of the rows; ApproxPercentileSpec pins the estimates inside
    * a value tolerance derived from the exact q52 answers. Engine-only:
    * the sketch's internal merge order is engine-specific, so no
    * cross-engine hash can exist (the q49 contract) — the ORACLED twin is
    * q257, whose md5-KMV-rank sketch is a pure function of the rows, the
    * same way q248 twins q49's HLL. */
  private val q87: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("median_price"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("p90_price"),
        expr("approx_percentile(l_quantity, 0.25, 10000)").as("p25_qty"))
      .orderBy("l_returnflag")

  /** Q257: approximate percentiles from a DETERMINISTIC mergeable KMV-rank
    * quantile sketch — the oracled twin of q87's engine-private
    * approx_percentile, built the q248 way (an md5-keyed sketch is a pure
    * function of the rows, so DuckDB replays it exactly): per group, the
    * 256 smallest DISTINCT packed (md5-hash, cents) keys form a uniform
    * row sample ([[graft.functions.KmvAgg]]'s bounded mergeable buffer —
    * the KMV merge theorem makes partials loss-free under ANY partitioning
    * or stream batching), and each percentile estimate is the
    * nearest-rank order statistic of the SAMPLE: r = (p·m + 99) div 100
    * (pure integer, the q158 rule — never a float percentile literal).
    * Packing h·2³² + cents into one BIGINT (h truncated to 30 bits so the
    * product stays far under 2⁶³; ANSI would throw on overflow) makes the
    * buffer a plain long array AND gives the (h, cents) tie-break for
    * free. The exact nearest-rank percentile ([[graft.functions
    * .ExactSelect.ranksByGroup]]'s value-domain refinement — no group
    * buffering) rides along as the error readout.
    *
    * Scale shape: one partial-agg pass to a ≤256-long buffer per group
    * (the stored mergeable artifact); estimates are per-row array algebra
    * on the buffer; the exact readout is the ~2-scan ExactSelect walk.
    * Rank error is ~1/√256 ≈ 6% — the abs_err_cents column reports the
    * realized value error against the exact statistic. The same sketch
    * maintained on a LIVE ingest is pinned stream ≡ batch (buffers AND
    * estimates) in StreamingSketchSpec. */
  private val q257: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .filter(col("l_extendedprice").isNotNull)
      .select(col("l_returnflag"),
        concat(col("l_orderkey").cast("string"), lit("#"),
          col("l_linenumber").cast("string")).as("key"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100)
          .cast("long").as("cents"))
    val packed = li.select(col("l_returnflag"),
      ((call_function("md5_prefix32", col("key")) % 1073741824L)
        * 4294967296L + col("cents")).as("pk"))
    val kmv = udaf(new graft.functions.KmvAgg(256))
    val est = packed.groupBy("l_returnflag").agg(kmv(col("pk")).as("buf"))
      .withColumn("cs", expr("array_sort(transform(buf, x -> x % 4294967296))"))
      .select(col("l_returnflag"),
        size(col("cs")).cast("long").as("m_sample"), col("cs"),
        explode(expr("array(50, 90)")).as("pct"))
      .withColumn("r_samp", expr("(pct * m_sample + 99) div 100"))
      .withColumn("est_cents",
        expr("element_at(cs, CAST(r_samp AS INT))"))
      .drop("cs")
    val exact = graft.functions.ExactSelect.ranksByGroup(
        li.select(col("l_returnflag").as("grp"), col("cents").as("v")),
        "grp", "v", Seq(50, 90))
      .select(col("grp"), col("pct").as("e_pct"),
        col("pval").as("exact_cents"))
    est.join(exact, est("l_returnflag") === exact("grp") &&
        est("pct") === exact("e_pct"))
      .select(est("l_returnflag"), est("pct"), col("m_sample"),
        col("r_samp"), col("est_cents"), col("exact_cents"),
        abs(col("est_cents") - col("exact_cents")).as("abs_err_cents"))
      .orderBy("l_returnflag", "pct")
  }

  /** Q89: bitwise aggregates — bit_and / bit_or / bit_xor over integer
    * keys, the flag-mask / set-reconciliation aggregation family (xor-sums
    * detect symmetric differences between replicas without sorting).
    * Order-independent by algebra, so the cross-engine hash match is
    * exact with no decimal detour. */
  private val q89: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(bit_and(col("l_partkey")).as("and_part"),
        bit_or(col("l_partkey")).as("or_part"),
        bit_xor(col("l_partkey")).as("xor_part"),
        bit_xor(col("l_orderkey")).as("xor_order"))
      .orderBy("l_returnflag")

  /** Q90: statistical moments — sample variance / stddev and Pearson
    * correlation per group. The BUILT-IN `stddev`/`corr` can never
    * hash-match across engines (their streaming merge accumulates doubles
    * in partition order), so the moments are computed from exact DECIMAL
    * power sums (Σx, Σx², Σxy — the [[graft.operators.dsum]] discipline)
    * and combined in ONE fixed double expression both engines evaluate
    * identically: var = (Σx² − (Σx)²/n)/(n−1). Same rows, same doubles,
    * any partitioning. The power sums' scaled values exceed 2⁵³, where
    * DuckDB's direct DECIMAL→DOUBLE cast double-rounds (~25% of values
    * one ulp off the correctly-rounded double Spark produces — measured),
    * so the oracle routes them through [[graft.operators.sqlDsumBig]]'s
    * exact text form. */
  private val q90: Q = (s, d) => {
    val n = count(lit(1)).cast("double")
    val sx = dsum(col("l_extendedprice"), 2)
    val sxx = dsum(col("l_extendedprice") * col("l_extendedprice"), 4)
    val sy = dsum(col("l_quantity"), 2)
    val syy = dsum(col("l_quantity") * col("l_quantity"), 4)
    val sxy = dsum(col("l_extendedprice") * col("l_quantity"), 4)
    // degenerate-group guards: cancellation can push the variance a hair
    // negative (clamp to 0); a zero-variance side yields NULL correlation
    // instead of a 0-division (DuckDB raises where Spark's double does not);
    // a single-row group makes (n-1) zero — 0/0 is NaN in Spark but NULL in
    // DuckDB, so sample variance is pinned to NULL on both engines there
    val variance = when(n <= 1, lit(null).cast("double"))
      .otherwise(greatest((sxx - sx * sx / n) / (n - 1), lit(0.0)))
    val den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(variance.as("var_price"),
        sqrt(variance).as("stddev_price"),
        when(den2 <= 0, lit(null).cast("double"))
          .otherwise((n * sxy - sx * sy) / sqrt(den2)).as("corr_price_qty"))
      .orderBy("l_returnflag")
  }

  /** Q54: nearest-centroid assignment — each vector classified to its most
    * cosine-similar label centroid (the IVF cell assignment, exposed as a
    * query).
    *
    * Scale shape: ALL centroids are packed into one array-of-structs row and
    * broadcast; the argmax is a per-row fold over that array. No crossJoin
    * row expansion (corpus × n_centroids) and no Window shuffle over vec_id —
    * the corpus partitioning is untouched. Ties break to the smallest
    * cent_id: the fold scans cent_id-ascending and replaces only on strictly
    * greater similarity.
    */
  private val q54: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val cents = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg((sum(col("v").cast("decimal(18,9)")).cast("double") / count(lit(1))).as("c"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
        .as("centroid"))
      .select(col("label").as("cent_id"), col("centroid"))
    val centArr = cents
      .agg(array_sort(collect_list(struct(col("cent_id"), col("centroid")))).as("cents"))
    val best = aggregate(col("cents"),
      struct(lit(-2.0).as("sim"), lit(-1).as("cid")),
      (acc, c) => {
        val cf = c.getField("centroid").cast("array<float>")
        val sim = graft.functions.VectorFunctions.dot(col("embedding"), cf) /
          (sqrt(graft.functions.VectorFunctions.norm2(col("embedding"))) *
            sqrt(graft.functions.VectorFunctions.norm2(cf)))
        when(sim > acc.getField("sim"),
          struct(sim.as("sim"), c.getField("cent_id").as("cid"))).otherwise(acc)
      })
    e.crossJoin(broadcast(centArr))
      .withColumn("best", best)
      .select(col("vec_id"), col("label"), col("best.cid").as("nearest_centroid"),
        (col("label") === col("best.cid")).as("self_match"))
      .orderBy("vec_id")
  }

  /** Q58: deterministic content-hash sampling — a reproducible ~1/16 sample
    * keyed on md5(key), the pattern for carving stable train/eval splits out
    * of a 100 TB corpus (same rows selected on any cluster, any partitioning,
    * any engine). */
  private val q58: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")

  /** Q63: deterministic stratified split — every document assigned to
    * train/val/test by a content-hash bucket (~10/16, 3/16, 3/16), reported
    * per language stratum. The assignment is engine- and partitioning-
    * independent (same property as q58): re-running anywhere reproduces the
    * exact same split, the requirement for stable training corpora. */
  private val q63: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("h", substring(md5(col("doc_id").cast("string")), 1, 1))
      .withColumn("split",
        when(col("h").between("0", "9"), "train")
          .when(col("h").isin("a", "b", "c"), "val")
          .otherwise("test"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "split")

  /** Q64: two-phase salted aggregation over deliberately hot keys (3 groups
    * across the whole table — the shape where one reducer would own a third
    * of a 100 TB scan). Phase 1 spreads each key over 16 salt buckets,
    * phase 2 combines; [[SkewTools]] guarantees result equality with the
    * direct groupBy, and the oracle checks it against the direct SQL. */
  private val q64: Q = (s, d) =>
    SkewTools.saltedCountSum(Tables.lineitem(s, d), Seq("l_returnflag"),
      "l_extendedprice", buckets = 16)
      .orderBy("l_returnflag")

  /** Q68: salted hot-key JOIN (SkewTools.saltedJoin) — 90% of lineitem on
    * one synthetic key, joined to a 3-key dimension (the 'R' group is
    * intentionally unmatched, so the inner-join semantics show in the
    * result). The oracle checks equality with the plain direct join; the
    * reducer-spread proof lives in SkewJoinSpec's task metrics. */
  private val q68: Q = (s, d) => {
    import s.implicits._
    val facts = Tables.lineitem(s, d).withColumn("k",
      when(col("l_orderkey") % 10 < 9, lit("HOT")).otherwise(col("l_returnflag")))
    val dim = Seq("HOT", "A", "N").toDF("k")
    SkewTools.saltedJoin(facts, dim, Seq("k"), buckets = 8)
      .groupBy("k")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("total_qty"))
      .orderBy("k")
  }

  /** Q112: z-order (Morton) lake clustering key — [[LakeLayout]] over the
    * events table: both dimensions (user_id, the 10⁶-scaled value) map
    * onto a 2¹⁶ grid by exact BIGINT affine math and interleave into one
    * z-value; `zbin = zv div 2²⁴` is the 256-bucket file assignment a
    * z-ordered write would range-partition on. The declared query emits
    * the whole key derivation so DuckDB recomputes grid → interleave →
    * bin bit-for-bit (the z-value is pure integer bit algebra). The
    * layout WIN — a 2-d box predicate materializing ~fx·fy of the rows
    * instead of a single-sort layout's min(fx,fy) — is measured in
    * ZOrderSpec via scan numOutputRows on the written files.
    *
    * Scale shape: per-row bit math + one 4-value global agg broadcast;
    * the real write adds one range exchange on zv ([[LakeLayout.writeZOrdered]]).
    * No shuffle beyond that at any corpus size. */
  private val q112: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("event_id"), col("user_id"),
      floor(col("value") * lit(1000000.0)).cast("long").as("sv"))
    val mm = e.agg(min("user_id").as("uxmin"), max("user_id").as("uxmax"),
      min("sv").as("svmin"), max("sv").as("svmax"))
    e.crossJoin(broadcast(mm))
      .select(col("event_id"),
        LakeLayout.gridCoord(col("user_id"), col("uxmin"), col("uxmax")).as("gx"),
        LakeLayout.gridCoord(col("sv"), col("svmin"), col("svmax")).as("gy"))
      .select(col("event_id"), col("gx"), col("gy"),
        LakeLayout.zValue(col("gx"), col("gy")).as("zv"))
      .withColumn("zbin", call_function("div", col("zv"), lit(16777216L)))
      .orderBy("event_id")
  }

  /** Q242: Hilbert-curve lake clustering key — q112's derivation with the
    * Morton interleave swapped for the [[graft.plans.HilbertIndex]] native
    * kernel (`hilbert_d`): both grid coordinates map onto the 2¹⁶ grid by
    * the same exact BIGINT affine math, then walk the order-16 Hilbert
    * rotate/reflect recursion to one index; `hbin = hv div 2²⁴` is the
    * 256-bucket file assignment a Hilbert-clustered write would
    * range-partition on. Hilbert beats z-order for pruning because
    * consecutive indices are always grid NEIGHBOURS — a contiguous index
    * range is a connected region, no diagonal seam jumps inflating file
    * bounding boxes (q243 measures the win). The ORACLE replays the
    * identical walk as a 16-step recursive CTE — pure integer bit algebra,
    * bit-for-bit across engines.
    *
    * Scale shape: per-row static-call kernel + one 4-value global agg
    * broadcast; the real write adds one range exchange on hv — identical
    * economics to q112. */
  private val q242: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("event_id"), col("user_id"),
      floor(col("value") * lit(1000000.0)).cast("long").as("sv"))
    val mm = e.agg(min("user_id").as("uxmin"), max("user_id").as("uxmax"),
      min("sv").as("svmin"), max("sv").as("svmax"))
    e.crossJoin(broadcast(mm))
      .select(col("event_id"),
        LakeLayout.gridCoord(col("user_id"), col("uxmin"), col("uxmax")).as("gx"),
        LakeLayout.gridCoord(col("sv"), col("svmin"), col("svmax")).as("gy"))
      .withColumn("hv", call_function("hilbert_d", col("gx"), col("gy")))
      .withColumn("hbin", call_function("div", col("hv"), lit(16777216L)))
      .orderBy("event_id")
  }

  /** Q243: layout pruning audit — the read-amplification readout that
    * decides WHICH clustering key a 100 TB lake should range-write on.
    * Every event row gets its q112/q242 grid point and a file id under
    * three candidate layouts (50 fixed-width key ranges each — 50
    * deliberately NOT a power of four: 4^k-aligned widths make Morton
    * and Hilbert files the same axis-aligned quadtree tiles and the
    * comparison vacuous; unaligned boundaries force files to span curve
    * runs crossing cell borders, exactly where Hilbert's
    * neighbours-only continuity shrinks the bounding box and Morton's
    * diagonal seam jumps inflate it), files reduce to min/max bounding
    * boxes + row counts — the
    * parquet footer stats a scan planner prunes on — and three box
    * predicates replay stats-based admission: a file is READ iff its
    * bbox intersects the box. Output per (layout, box): files present,
    * files read, rows scanned (Σ rows of admitted files) vs rows actually
    * matching — the scan-amplification evidence (linear layouts admit
    * everything for cross-dimension bands; Hilbert's connected ranges
    * admit the fewest). Pure integer bit algebra end to end; the ORACLE
    * recomputes both curves (32-term interleave + recursive-CTE Hilbert
    * walk) and the same admission joins.
    *
    * Scale shape: per-row key math, one groupBy into ≤ 3·64 file rows,
    * then broadcast joins against a 3-row box table — the audit never
    * shuffles row-level data more than once at any corpus size. */
  private val q243: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d).select(col("event_id"), col("user_id"),
      floor(col("value") * lit(1000000.0)).cast("long").as("sv"))
    val mm = e.agg(min("user_id").as("uxmin"), max("user_id").as("uxmax"),
      min("sv").as("svmin"), max("sv").as("svmax"))
    val keyed = e.crossJoin(broadcast(mm))
      .select(col("event_id"),
        LakeLayout.gridCoord(col("user_id"), col("uxmin"), col("uxmax")).as("gx"),
        LakeLayout.gridCoord(col("sv"), col("svmin"), col("svmax")).as("gy"))
      .select(col("gx"), col("gy"),
        LakeLayout.zValue(col("gx"), col("gy")).as("zv"),
        call_function("hilbert_d", col("gx"), col("gy")).as("hv"))
    val rows = keyed.select(col("gx"), col("gy"),
      call_function("div", col("gx"), lit(1311L)).as("f_linear"),
      call_function("div", col("zv"), lit(85899346L)).as("f_zorder"),
      call_function("div", col("hv"), lit(85899346L)).as("f_hilbert"))
    val lf = rows.select(lit("linear").as("layout"),
        col("f_linear").as("f"), col("gx"), col("gy"))
      .unionAll(rows.select(lit("zorder").as("layout"),
        col("f_zorder").as("f"), col("gx"), col("gy")))
      .unionAll(rows.select(lit("hilbert").as("layout"),
        col("f_hilbert").as("f"), col("gx"), col("gy")))
    val files = lf.groupBy("layout", "f").agg(
      min("gx").as("gx_min"), max("gx").as("gx_max"),
      min("gy").as("gy_min"), max("gy").as("gy_max"),
      count(lit(1)).as("n_rows"))
    val boxes = Seq(
      ("corner", 0L, 4095L, 0L, 4095L),
      ("band_y", 0L, 65535L, 32768L, 36863L),
      ("mid_box", 40960L, 49151L, 40960L, 49151L))
      .toDF("box", "bx_lo", "bx_hi", "by_lo", "by_hi")
    val audit = files.crossJoin(broadcast(boxes))
      .withColumn("admit",
        col("gx_min") <= col("bx_hi") && col("gx_max") >= col("bx_lo") &&
          col("gy_min") <= col("by_hi") && col("gy_max") >= col("by_lo"))
      .groupBy("layout", "box").agg(
        count(lit(1)).as("files_present"),
        sum(when(col("admit"), 1L).otherwise(0L)).as("files_read"),
        sum(when(col("admit"), col("n_rows")).otherwise(0L)).as("rows_scanned"))
    val matched = rows.crossJoin(broadcast(boxes))
      .filter(col("gx") >= col("bx_lo") && col("gx") <= col("bx_hi") &&
        col("gy") >= col("by_lo") && col("gy") <= col("by_hi"))
      .groupBy("box").agg(count(lit(1)).as("rows_matched"))
    audit.join(broadcast(matched), Seq("box"), "left")
      .withColumn("rows_matched", coalesce(col("rows_matched"), lit(0L)))
      .select("layout", "box", "files_present", "files_read",
        "rows_scanned", "rows_matched")
      .orderBy("layout", "box")
  }

  /** Q245: Bradley–Terry preference strengths — the pairwise-preference →
    * global-scale fit RLHF/DPO data curation runs before training a reward
    * model: which item (here: event type, standing in for model/source/
    * policy arms) is globally strongest given only noisy pairwise duels?
    * Duels are derived exactly: per user, type i beats type j iff the user
    * fired i more often (ties contribute nothing); duel counts aggregate
    * distributed (BIGINT), and [[graft.functions.BradleyTerry.solve]] runs
    * 20 MM steps [Hunter 2004] on the ≤ |types|² aggregate driver-side —
    * the ExactSelect discipline (cluster-size reduction, constant driver
    * state). Every double sum is a sequential sorted-order fold, so the
    * ORACLE replays the identical iteration with `list_reduce(list(...
    * ORDER BY j))` chains — bit-identical strengths, not approximately
    * equal ones.
    *
    * Scale shape: one groupBy(user, type) partial agg, a broadcast
    * type-domain densification, one pair-per-user self-join bounded by
    * |types|²·|users| tiny rows, then a 10-row collect. No corpus-sized
    * shuffle beyond the first aggregation at any event volume. */
  private val q245: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val cnt = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val users = ev.select("user_id").distinct()
    val types = ev.select("event_type").distinct()
    val dense = users.crossJoin(broadcast(types))
      .join(cnt, Seq("user_id", "event_type"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val a = dense.select(col("user_id"), col("event_type").as("ti"),
      col("c").as("ci"))
    val b = dense.select(col("user_id"), col("event_type").as("tj"),
      col("c").as("cj"))
    val duel = a.join(b, "user_id").filter(col("ti") < col("tj"))
      .groupBy("ti", "tj").agg(
        sum(when(col("ci") > col("cj"), 1L).otherwise(0L)).as("wi"),
        sum(when(col("cj") > col("ci"), 1L).otherwise(0L)).as("wj"))
      .collect()
    val games = duel.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2) + r.getLong(3))).toMap
    val wins = (duel.map(r => r.getString(0) -> r.getLong(2)) ++
        duel.map(r => r.getString(1) -> r.getLong(3)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
    val ts = duel.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.sorted.toSeq
    val p = graft.functions.BradleyTerry.solve(ts, games, wins, 20)
    val gamesPer = ts.map(i => i -> ts.filter(_ != i).map(j =>
      games.getOrElse((i, j), games.getOrElse((j, i), 0L))).sum).toMap
    val rank = ts.sortBy(i => (-p(i), i)).zipWithIndex
      .map { case (t, k) => t -> (k + 1) }.toMap
    ts.map(i => (i, wins.getOrElse(i, 0L), gamesPer(i), p(i), rank(i)))
      .toDF("event_type", "wins", "games", "strength", "rnk")
      .orderBy("event_type")
  }

  /** Q114: heavy hitters via a bounded-state Misra–Gries sketch —
    * [[graft.functions.FreqSketch.exactTopK]] over the corpus token
    * stream (k = 25, m = 4096). The sketch pass keeps ≤ m counters per
    * task and shuffles ≤ m·partitions rows regardless of vocabulary
    * size (a direct groupBy top-k shuffles every distinct token —
    * billions at web scale); nominated candidates are exactly recounted
    * and ranked, so the declared result is the EXACT top-k whenever the
    * k-th frequency exceeds n/m (Zipfian token streams at sane (k, m)
    * always are; the 25th token here is ~300× over the bound). The
    * oracle is the direct exact SQL — the equality IS the check, the
    * q41b-twin move applied to a sketch. MG/merge bounds pinned in
    * FreqSketchSpec. */
  private val q114: Q = (s, d) =>
    graft.functions.FreqSketch.exactTopK(
      Tables.documents(s, d).filter(col("text").isNotNull)
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("word")),
      "word", 25, 4096)

  /** Q117: per-group z-score anomaly flags — the monitoring/outlier gate
    * over the event stream: population moments per event_type from EXACT
    * decimal sums (the q90 machinery), then flag rows with
    * `(x − μ)² > 9·σ²` — the 3σ rule squared, so no sqrt and no division
    * enters the comparison; every double op (one μ division, the μ²/σ²
    * products) is mirrored op-for-op.
    *
    * Scale shape: one partial-agg stats pass (5 groups), broadcast join
    * back, per-row compare — two scans, no row-level shuffle at all.
    * Streaming twin: the same stats feed a stream-static join (the
    * CorpusStream gate pattern). */
  private val q117: Q = (s, d) => {
    val e = Tables.events(s, d).select(
      col("event_id"), col("event_type"), col("value"))
    val mu = col("sx") / col("n")
    val stats = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      dsum(col("value"), 2).as("sx"),
      dsum(col("value") * col("value"), 4).as("sxx"))
      .select(col("event_type"), mu.as("mu"),
        greatest(col("sxx") / col("n") - mu * mu, lit(0.0)).as("varp"))
    e.join(broadcast(stats), "event_type")
      .filter((col("value") - col("mu")) * (col("value") - col("mu")) >
        lit(9.0) * col("varp"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("mu"), col("varp"))
      .orderBy("event_id")
  }

  /** Q226: Benford first-digit audit [Benford 1938; Nigrini 2012] over
    * lineitem prices — the forensic data-quality screen for FABRICATED or
    * truncated numeric columns that the q117/q137/q224 moment family
    * cannot see (a generator that draws uniform prices has perfect
    * moments and a wildly non-Benford digit histogram — exactly what this
    * fixture shows). First digits come from the cents string (×100 shifts
    * the decimal point; the leading digit is unchanged) after one exact
    * DECIMAL(12,2) cast — 2-dp doubles never tie at 2 dp (the q224
    * argument). The expected law ships as integer per-mille LITERALS
    * (⌊1000·log10(1+1/d)⌉ — a runtime log10 would be libm-divergent, the
    * q95 rule; the rounded table is the shared constant both engines
    * read), so observed/expected deviations and the total-variation
    * distance stay exact: tvd_num = Σ_d |1000·c_d − p_d·n| over a 9-row
    * digit spine (zero-count digits still contribute p_d·n),
    * tvd_den = 2000·n, ONE double division. A uniform-histogram
    * comparison (TVD vs uniform 111‰) rides along to separate
    * "non-Benford because synthetic-uniform" from "non-Benford because
    * truncated".
    *
    * Scale shape: one map-side digit extraction + a 9-key partial-agg
    * groupBy; the spine join and window run over 9 rows. */
  private val q226: Q = (s, d) =>
    benfordAudit(Tables.lineitem(s, d)
      .select(expr("""cast(substr(cast(cast(cast(l_extendedprice
        as decimal(12,2)) * 100 as bigint) as string), 1, 1) as bigint)""")
        .as("digit")))

  /** q226 core over any single-column (digit ∈ 1..9) frame — separated so
    * the spec can pin the digit-SPINE contract: a digit absent from the
    * data still emits its row with c = 0 and still contributes p_d·n to
    * the TVD (dropping it would understate the distance exactly when the
    * data is most un-Benford). */
  private[operators] def benfordAudit(li: DataFrame): DataFrame = {
    val s = li.sparkSession
    val benford = Map(1 -> 301L, 2 -> 176L, 3 -> 125L, 4 -> 97L,
      5 -> 79L, 6 -> 67L, 7 -> 58L, 8 -> 51L, 9 -> 46L)
    val counts = li.groupBy("digit").agg(count(lit(1)).as("c"))
    val spine = s.range(1, 10).toDF("digit")
      .withColumn("exp_pm", element_at(
        map(benford.toSeq.sortBy(_._1).flatMap { case (k, v) =>
          Seq(lit(k.toLong), lit(v)) }: _*), col("digit")))
    val tot = counts.agg(sum("c").as("n"))
    val rows = spine.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"), col("c"),
        expr("(1000 * c) div n").as("obs_pm"), col("exp_pm"),
        expr("(1000 * c) div n - exp_pm").as("dev_pm"),
        abs(lit(1000L) * col("c") - col("exp_pm") * col("n"))
          .as("abs_dev_num"),
        // uniform-law deviation: p_d = 1/9 exactly → |9000·c − 1000·n|
        // over den 18000·n keeps the rational exact (⅑ has no finite
        // per-mille form, so the uniform leg scales by 9)
        abs(lit(9000L) * col("c") - lit(1000L) * col("n"))
          .as("abs_udev_num"))
    val w = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    rows
      .withColumn("tvd_num", sum(col("abs_dev_num")).over(w))
      .withColumn("tvd_den", lit(2000L) * col("n"))
      .withColumn("tvd",
        col("tvd_num").cast("double") / (lit(2000L) * col("n"))
          .cast("double"))
      .withColumn("utvd_num", sum(col("abs_udev_num")).over(w))
      .withColumn("utvd_den", lit(18000L) * col("n"))
      .withColumn("utvd",
        col("utvd_num").cast("double") / (lit(18000L) * col("n"))
          .cast("double"))
      .orderBy("digit")
  }

  /** Q137: robust MAD outlier report — the median-based twin of q117's
    * z-score flags for the heavy-tailed metrics where mean/σ are
    * themselves dragged by the outliers they should expose (median and
    * MAD have breakdown point 1/2; mean/σ have 0). Per event type:
    * med = median(value), MAD = median(|value − med|), outlier ⇔
    * |value − med| > 3·MAD. Determinism: the same linear-interpolation
    * percentile q52 pins cross-engine, IEEE subtract/abs/multiply in
    * written order — no new contract. Scale note: exact per-group
    * percentiles buffer group values (the q52 caveat); the stored-
    * summary path at raw-fact volume is the q128 mergeable histogram. */
  private val q137: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"), // constant per group
        max(col("mad")).as("mad"),
        count(when(col("dev") > col("mad") * 3.0, 1)).as("n_outliers"),
        max(col("dev")).as("max_dev"))
      .orderBy("event_type")
  }

  /** Q142: temporal + entity holdout split — the forecasting-correct
    * split q63/q106's hash splits don't give: train strictly BEFORE a
    * cutoff, test strictly after, AND no user appears in both (the
    * churn/recommendation leakage guard — a user's future events leak
    * their past behavior into any user-level feature). Cutoff = 3/4 of
    * the observed time span in exact epoch-µs integer math; the user
    * cohort is the q106 content-stable md5 split (20% test), so
    * membership never migrates as data grows. Events failing either
    * guard land in `discarded` — the split is a PARTITION, witnessed per
    * cell by exact counts and an additive Σ event_id checksum. */
  private val q142: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), epochUs(col("ts")).as("us"))
    val bounds = ev.agg(min(col("us")).as("us0"), max(col("us")).as("us1"))
    val tagged = ev.crossJoin(broadcast(bounds))
      .withColumn("cutoff", expr("us0 + ((us1 - us0) * 3) div 4"))
      .withColumn("test_user",
        pmod(call_function("md5_prefix32", col("user_id").cast("string")),
          lit(100L)) < 20)
      .withColumn("split",
        when(col("us") < col("cutoff") && !col("test_user"), lit("train"))
          .when(col("us") >= col("cutoff") && col("test_user"), lit("test"))
          .otherwise(lit("discarded")))
    tagged.groupBy("split", "event_type")
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_checksum"))
      .orderBy("split", "event_type")
  }

  /** Q143: sampled approximate aggregation — the BlinkDB move for
    * exploratory queries over a 100 TB fact table: aggregate a
    * deterministic 1% hash sample and scale up, reading 1% of the data.
    * The sample is md5-content-stable (pmod of the row key's hash), the
    * scaled estimate stays in exact-decimal space until ONE final double
    * conversion (sum(DECIMAL)·100 is exact), and the exact aggregate
    * rides along as the error readout — at real scale you'd skip it and
    * quote the CLT bound instead. */
  private val q143: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    val li = Tables.lineitem(s, d).select(col("l_returnflag"),
      col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val keyed = li.withColumn("bucket",
      pmod(call_function("md5_prefix32",
        concat(col("l_orderkey").cast("string"), lit("#"),
          col("l_linenumber").cast("string"))), lit(100L)))
    val sample = keyed.filter(col("bucket") === 0)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_sample"),
        (sum(col("l_extendedprice").cast(DecimalType(18, 2))) * 100)
          .cast("double").as("est_revenue"))
    val exact = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_total"), dsum(col("l_extendedprice")).as("exact_revenue"))
    sample.join(exact, "l_returnflag")
      .withColumn("rel_err",
        (col("est_revenue") - col("exact_revenue")) / col("exact_revenue"))
      .select(col("l_returnflag"), col("n_sample"), col("n_total"),
        col("est_revenue"), col("exact_revenue"), col("rel_err"))
      .orderBy("l_returnflag")
  }

  /** Q147: deterministic per-epoch training shuffle — the data-ordering
    * op a loader needs from a 100 TB corpus: for each epoch, a stable
    * pseudo-random permutation of the documents materialized as
    * (shard, position) assignments, reproducible bit-for-bit across
    * re-runs and engines. Epoch-salted md5 keys re-shuffle every epoch
    * without touching the source data; shard = the hash's top bits
    * (fixed-width range split of the 32-bit hash space — uniform hashing
    * balances shards with NO global sort or exchange-and-count pass),
    * position = rank within the shard.
    *
    * Shape: the only shuffle is the per-(epoch, shard) window — each
    * shard sorts independently in parallel, so the "global shuffle" never
    * materializes a global order (the thing that dies at 100 TB);
    * rewritten by Spark into a partial sort per hash partition. */
  private val q147: Q = (s, d) => {
    val nShards = 8
    val width = 4294967296L / nShards
    val docs = Tables.documents(s, d).select(col("doc_id"))
      .withColumn("epoch", explode(array(lit(0), lit(1), lit(2))))
      .withColumn("h", call_function("md5_prefix32",
        concat_ws(":", col("epoch"), col("doc_id"))))
      .withColumn("shard", expr(s"h div $width"))
    docs.withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("h"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("epoch"), col("shard"), col("h"),
        col("pos"))
      .orderBy("epoch", "shard", "pos")
  }

  /** Q160: curriculum training order — the staged data schedule
    * [Bengio et al. ICML'09] a loader builds when training warms up on
    * clean data before seeing everything: documents bin into quality
    * deciles (decile 1 = highest distinct-token ratio, the q83 integer-
    * division binning on the negated exact-ratio score), epoch e admits
    * deciles ≤ 3e + 4 (40% → 70% → all), and each epoch's admitted pool
    * gets q147's epoch-salted md5 shuffle (shard = top hash bits, pos =
    * rank within (epoch, shard) — reshuffled every epoch, NO global sort
    * or driver pass anywhere in the ordering). Composes the q83 + q147
    * machinery into the schedule a curriculum actually ships: (epoch,
    * shard, pos) is the read order, decile the admission evidence.
    *
    * The decile stage here is the window form ([[CorpusOps.decileBin]]);
    * at 100 TB it swaps for [[CorpusOps.decileBinDistributed]]
    * (range-partition + offset ranks, bit-identical output — the q83
    * contract), leaving this query's shape otherwise unchanged. */
  private val q160: Q = (s, d) => {
    val nShards = 8
    val width = 4294967296L / nShards
    val scored = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(array_distinct(split(lower(col("text")), " ")))
          .cast("long").as("uniq"),
        size(split(lower(col("text")), " ")).cast("long").as("tot"))
      .withColumn("q_ratio", expr("uniq * 1000000 div tot"))
    val binned = CorpusOps.decileBin(scored, expr("-q_ratio"), "doc_id")
      .select(col("doc_id"), col("q_ratio"), col("decile"))
    binned
      .withColumn("epoch", explode(array(lit(0L), lit(1L), lit(2L))))
      .filter(col("decile") <= col("epoch") * 3 + 4)
      .withColumn("h", call_function("md5_prefix32",
        concat_ws(":", col("epoch"), col("doc_id"))))
      .withColumn("shard", expr(s"h div $width"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("h"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("epoch"), col("decile"), col("shard"),
        col("pos"))
      .orderBy("epoch", "shard", "pos")
  }

  /** Q158: winsorized robust statistics — the outlier-CLIPPING companion
    * to q117/q137's outlier DETECTION (training-metadata tables clip at
    * P1/P99 before normalization so a single corrupt measurement cannot
    * dominate a scale factor). Per l_returnflag group over
    * l_extendedprice: the exact order-statistic bounds at integer ranks
    * klo = ⌈n/100⌉ and khi = n − klo + 1 (PURE INTEGER rank formulas —
    * a 0.01·n double/decimal product is engine-divergent at boundaries,
    * `(n + 99) div 100` is not), the out-of-range counts, and the
    * winsorized sum with every value clipped into [lo, hi] and summed
    * as exact DECIMAL (the dsum contract). Bounds are EXISTING data
    * values (no interpolation), so both engines pick bit-identical
    * doubles.
    *
    * Shape note: the rank window partitions by a 3-value group — fine
    * here, a skew hazard at 100 TB; at scale the bounds stage swaps to
    * the q83 `decileBinDistributed` range-partition/offset technique or
    * the q87 mergeable sketch, and the clip+sum pass (the data-sized
    * part) is unchanged map-side arithmetic. */
  private val q158: Q = (s, d) => {
    val g = Tables.lineitem(s, d).select(
      col("l_returnflag").as("grp"),
      col("l_extendedprice").as("x"),
      (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("id"))
    val counts = g.groupBy("grp").agg(count(lit(1)).as("n"))
    val ranked = g.withColumn("rn",
      row_number().over(Window.partitionBy("grp")
        .orderBy(col("x").asc, col("id").asc)).cast("long"))
    val bounds = ranked.join(broadcast(counts), "grp")
      .withColumn("klo", expr("(n + 99) div 100"))
      .withColumn("khi", col("n") - expr("(n + 99) div 100") + 1)
      .filter(col("rn") === col("klo") || col("rn") === col("khi"))
      .groupBy("grp")
      .agg(min(when(col("rn") === col("klo"), col("x"))).as("lo"),
        min(when(col("rn") === col("khi"), col("x"))).as("hi"))
    g.join(broadcast(bounds), "grp").join(broadcast(counts), "grp")
      .groupBy("grp", "n", "lo", "hi")
      .agg(sum((col("x") < col("lo")).cast("long")).as("n_below"),
        sum((col("x") > col("hi")).cast("long")).as("n_above"),
        dsum(greatest(col("lo"), least(col("hi"), col("x"))))
          .as("winsorized_sum"))
      .orderBy("grp")
  }

  /** Q173: EXACT order statistics without a row sort — the scale path the
    * q158 shape note promises, realized: for an integer-valued (or
    * bounded-cardinality) metric, group by VALUE first, then pick each
    * percentile as the least value whose cumulative count reaches the
    * integer target rank ⌈n·k/100⌉ (the pure-integer q158 rank contract —
    * never `0.01·n`). The shuffle carries one row per DISTINCT value per
    * group (here 3×50 rows from 60k; at 100 TB still ~the value domain),
    * and the only window runs over that tiny histogram — vs q158's
    * row_number over every row of the group. Skewed values are harmless:
    * they are exactly one histogram row regardless of multiplicity. */
  private val q173: Q = (s, d) => {
    val h = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("grp"),
        col("l_quantity").cast("long").as("v"))
      .groupBy("grp", "v").agg(count(lit(1)).as("c"))
    val cum = h
      .withColumn("cum", sum("c").over(
        Window.partitionBy("grp").orderBy("v")))
      .withColumn("n", sum("c").over(Window.partitionBy("grp")))
    def pick(k: Int) =
      min(when(col("cum") >= expr(s"(n * $k + 99) div 100"), col("v")))
        .as(s"p$k")
    cum.groupBy("grp")
      .agg(max("n").as("n_rows"), count(lit(1)).as("n_values"),
        pick(50), pick(90), pick(99))
      .orderBy("grp")
  }

  val queries: Seq[(String, Q)] = Seq(
    "q158_agg_winsorized" -> q158,
    "q173_quantile_value_histogram" -> q173,
    "q160_curriculum_order" -> q160,
    "q137_anomaly_mad" -> q137,
    "q142_split_temporal" -> q142,
    "q143_agg_sampled" -> q143,
    "q147_shuffle_epochs" -> q147,
    "q64_agg_salted_skew" -> q64,
    "q68_join_salted_skew" -> q68,
    "q63_ml_split" -> q63,
    "q58_ml_hash_sample" -> q58,
    "q54_ml_nearest_centroid" -> q54,
    "q48_ml_centroids" -> q48,
    "q53_agg_pivot" -> q53,
    "q85_fn_unpivot" -> q85,
    "q89_agg_bitwise" -> q89,
    "q90_agg_moments" -> q90,
    "q52_agg_percentile" -> q52,
    "q87_agg_approx_percentile" -> q87,
    "q257_approx_percentile_kmv" -> q257,
    "q49_agg_approx_distinct" -> q49,
    "q50_udaf_weighted_avg" -> q50,
    "q112_lake_zorder" -> q112,
    "q242_lake_hilbert" -> q242,
    "q243_layout_pruning" -> q243,
    "q245_bt_strength" -> q245,
    "q114_agg_heavy_hitters" -> q114,
    "q117_anomaly_zscore" -> q117,
    "q226_benford_audit" -> q226,
    "q230_exact_median_bisect" -> q230,
    "q237_exact_percentiles" -> q237,
  )

  // the 32 interleave terms of the 16-bit Morton code, generated once and
  // shared textually with the oracle (disjoint bits: + ≡ |)
  private val zTerms: String = (0 until 16).flatMap(i => Seq(
    s"(((gx >> $i) & 1) << ${2 * i})",
    s"(((gy >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")

  // The order-16 Hilbert xy2d walk as a recursive CTE over the `g`
  // (event_id, gx, gy) frame: 16 rotate/reflect steps, s = 2^15 … 1, the
  // exact integer recursion HilbertImpl.xy2d runs per row. Emits one row
  // per event at s = 0 carrying the final index d.
  private val hilbertWalk: String =
    """hw AS (
      |  SELECT event_id, gx, gy, gx AS x, gy AS y,
      |    CAST(32768 AS BIGINT) AS s, CAST(0 AS BIGINT) AS d FROM g
      |  UNION ALL
      |  SELECT event_id, gx, gy,
      |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN s - 1 - y ELSE y END
      |         ELSE x END AS x,
      |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN s - 1 - x ELSE x END
      |         ELSE y END AS y,
      |    s // 2 AS s,
      |    d + s * s * xor(3 * rx, ry) AS d
      |  FROM (SELECT event_id, gx, gy, x, y, s, d,
      |      CASE WHEN (x & s) > 0 THEN CAST(1 AS BIGINT)
      |           ELSE CAST(0 AS BIGINT) END AS rx,
      |      CASE WHEN (y & s) > 0 THEN CAST(1 AS BIGINT)
      |           ELSE CAST(0 AS BIGINT) END AS ry
      |    FROM hw WHERE s > 0) q
      |)""".stripMargin

  // q245's 20 Hunter-MM steps, unrolled: each iteration is (fold of
  // N_ij/(p_i+p_j) over opponents ORDERED BY j) → praw = W_i/s (0 when
  // s = 0, mirroring BradleyTerry.solve's no-games branch) → normalize by
  // the ORDERED-BY-i fold of praw. Sequential list_reduce folds make every
  // double sum order-pinned — bit-identical to the Scala solve.
  private val btIters: String = (1 to 20).map { k =>
    val prev = if (k == 1) "it0" else s"it${k - 1}"
    s"""it${k}s AS MATERIALIZED (SELECT nm.i,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(CAST(nm.n AS DOUBLE) / (pi.p + pj.p) ORDER BY nm.j)),
       |      (a, x) -> a + x) AS s
       |  FROM nm JOIN $prev pi ON pi.i = nm.i
       |    JOIN $prev pj ON pj.i = nm.j
       |  GROUP BY nm.i),
       |it${k}r AS MATERIALIZED (SELECT w.i,
       |    CASE WHEN s.s = 0 THEN CAST(0.0 AS DOUBLE)
       |         ELSE CAST(w.w AS DOUBLE) / s.s END AS praw
       |  FROM it${k}s s JOIN wt w ON w.i = s.i),
       |it$k AS MATERIALIZED (SELECT i, praw / (SELECT list_reduce(list_prepend(
       |      CAST(0.0 AS DOUBLE), list(praw ORDER BY i)), (a, x) -> a + x)
       |    FROM it${k}r) AS p
       |  FROM it${k}r)""".stripMargin
  }.mkString(",\n")

  // q112/q242/q243's shared grid derivation over events
  private val gridCte: String =
    """e AS (SELECT event_id, user_id,
      |    CAST(floor(value * 1000000.0) AS BIGINT) AS sv FROM events),
      |mm AS (SELECT min(user_id) AS uxmin, max(user_id) AS uxmax,
      |    min(sv) AS svmin, max(sv) AS svmax FROM e),
      |g AS (SELECT event_id,
      |    ((user_id - uxmin) * 65535) // greatest(uxmax - uxmin, 1) AS gx,
      |    ((sv - svmin) * 65535) // greatest(svmax - svmin, 1) AS gy
      |  FROM e, mm)""".stripMargin

  private val dotEC =
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len(e.embedding) + 1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(CAST(c.centroid[i] AS FLOAT) AS DOUBLE))), (a, x) -> a + x)"
  private val normE =
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, x) -> a + x)"
  private val normC =
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(c.centroid, x -> CAST(CAST(x AS FLOAT) AS DOUBLE) * CAST(CAST(x AS FLOAT) AS DOUBLE))), (a, x) -> a + x)"

  val oracles: Map[String, String] = Map(
    // exact median: the k-th order statistic (k = (n+1) div 2) recomputed
    // directly with a rank subquery — the bisection must land on exactly
    // this row or the hash mismatches
    "q230_exact_median_bisect" ->
      """WITH c AS (SELECT l_returnflag AS grp,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |s AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY grp),
        |r AS (SELECT grp, v,
        |    CAST(row_number() OVER (PARTITION BY grp ORDER BY v) AS BIGINT)
        |      AS rk
        |  FROM c)
        |SELECT s.grp, s.n, (s.n + 1) // 2 AS k, r.v AS median
        |FROM s JOIN r ON r.grp = s.grp AND r.rk = (s.n + 1) // 2
        |ORDER BY s.grp""".stripMargin,

    // exact p50/p95/p99: each nearest-rank order statistic
    // (k = (p·n + 99) div 100, pure integer) recomputed with the same
    // rank subquery, one row per (group, percentile)
    "q237_exact_percentiles" ->
      """WITH c AS (SELECT l_returnflag AS grp,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |s AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY grp),
        |p AS (SELECT CAST(unnest([50, 95, 99]) AS INTEGER) AS pct),
        |kk AS (SELECT s.grp, s.n, p.pct,
        |    (CAST(p.pct AS BIGINT) * s.n + 99) // 100 AS k
        |  FROM s CROSS JOIN p),
        |r AS (SELECT grp, v,
        |    CAST(row_number() OVER (PARTITION BY grp ORDER BY v) AS BIGINT)
        |      AS rk
        |  FROM c)
        |SELECT kk.grp, kk.n, kk.pct, CAST(kk.k AS BIGINT) AS k,
        |  r.v AS pval
        |FROM kk JOIN r ON r.grp = kk.grp AND r.rk = kk.k
        |ORDER BY kk.grp, kk.pct""".stripMargin,

    // KMV-rank quantile sketch replayed end-to-end: distinct packed
    // (30-bit md5 prefix)·2^32 + cents keys, k = 256 smallest per group,
    // nearest-rank (p·m + 99)//100 over the sample's cents, exact
    // nearest-rank over the full group as the error readout
    "q257_approx_percentile_kmv" ->
      """WITH c AS (SELECT l_returnflag,
        |    CAST(l_orderkey AS VARCHAR) || '#' ||
        |      CAST(l_linenumber AS VARCHAR) AS key,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |pk AS (SELECT DISTINCT l_returnflag,
        |    (('0x' || substr(md5(key), 1, 8))::BIGINT % 1073741824)
        |      * 4294967296 + cents AS pk
        |  FROM c),
        |rk AS (SELECT l_returnflag, pk, row_number() OVER (
        |    PARTITION BY l_returnflag ORDER BY pk) AS rn FROM pk),
        |samp AS (SELECT l_returnflag, pk % 4294967296 AS cents FROM rk
        |  WHERE rn <= 256),
        |m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS m_sample
        |  FROM samp GROUP BY 1),
        |sr AS (SELECT l_returnflag, cents, row_number() OVER (
        |    PARTITION BY l_returnflag ORDER BY cents) AS vr FROM samp),
        |p AS (SELECT CAST(unnest([50, 90]) AS INTEGER) AS pct),
        |est AS (SELECT m.l_returnflag, p.pct, m.m_sample,
        |    (CAST(p.pct AS BIGINT) * m.m_sample + 99) // 100 AS r_samp
        |  FROM m CROSS JOIN p),
        |e2 AS (SELECT est.*, sr.cents AS est_cents FROM est JOIN sr
        |  ON sr.l_returnflag = est.l_returnflag AND sr.vr = est.r_samp),
        |n AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n FROM c
        |  GROUP BY 1),
        |kk2 AS (SELECT n.l_returnflag, p.pct,
        |    (CAST(p.pct AS BIGINT) * n.n + 99) // 100 AS k
        |  FROM n CROSS JOIN p),
        |fr AS (SELECT l_returnflag, cents, row_number() OVER (
        |    PARTITION BY l_returnflag ORDER BY cents) AS rk FROM c),
        |ex AS (SELECT kk2.l_returnflag, kk2.pct, fr.cents AS exact_cents
        |  FROM kk2 JOIN fr ON fr.l_returnflag = kk2.l_returnflag
        |    AND fr.rk = kk2.k)
        |SELECT e2.l_returnflag, e2.pct, e2.m_sample,
        |  CAST(e2.r_samp AS BIGINT) AS r_samp, e2.est_cents,
        |  ex.exact_cents,
        |  CAST(abs(e2.est_cents - ex.exact_cents) AS BIGINT)
        |    AS abs_err_cents
        |FROM e2 JOIN ex ON ex.l_returnflag = e2.l_returnflag
        |  AND ex.pct = e2.pct
        |ORDER BY e2.l_returnflag, e2.pct""".stripMargin,

    // Benford audit: same cents-string digit extraction, the same shared
    // per-mille literal table, window sums cast back from HUGEINT (the
    // q91 gotcha), every integer column pinned BIGINT
    "q226_benford_audit" ->
      """WITH li AS (SELECT CAST(substr(CAST(CAST(CAST(l_extendedprice
        |      AS DECIMAL(12,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1)
        |    AS BIGINT) AS digit
        |  FROM lineitem),
        |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS c FROM li
        |  GROUP BY digit),
        |sp AS (SELECT unnest(range(1, 10)) AS digit),
        |ex AS (SELECT CAST(digit AS BIGINT) AS digit,
        |    CAST(exp_pm AS BIGINT) AS exp_pm
        |  FROM (VALUES (1, 301), (2, 176), (3, 125), (4, 97), (5, 79),
        |    (6, 67), (7, 58), (8, 51), (9, 46)) t(digit, exp_pm)),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
        |r AS (SELECT sp.digit, tot.n,
        |    CAST(coalesce(c.c, 0) AS BIGINT) AS c, ex.exp_pm
        |  FROM sp JOIN ex USING (digit) LEFT JOIN c USING (digit)
        |  CROSS JOIN tot),
        |f AS (SELECT digit, n, c, (1000 * c) // n AS obs_pm, exp_pm,
        |    (1000 * c) // n - exp_pm AS dev_pm,
        |    abs(1000 * c - exp_pm * n) AS abs_dev_num,
        |    abs(9000 * c - 1000 * n) AS abs_udev_num
        |  FROM r)
        |SELECT digit, n, c, obs_pm, exp_pm, dev_pm, abs_dev_num,
        |  abs_udev_num,
        |  CAST(sum(abs_dev_num) OVER () AS BIGINT) AS tvd_num,
        |  2000 * n AS tvd_den,
        |  CAST(CAST(sum(abs_dev_num) OVER () AS BIGINT) AS DOUBLE) /
        |    (2000 * n) AS tvd,
        |  CAST(sum(abs_udev_num) OVER () AS BIGINT) AS utvd_num,
        |  18000 * n AS utvd_den,
        |  CAST(CAST(sum(abs_udev_num) OVER () AS BIGINT) AS DOUBLE) /
        |    (18000 * n) AS utvd
        |FROM f ORDER BY digit""".stripMargin,

    // curriculum order: decile bin on the negated exact-ratio quality
    // (window rank + count-over), staged admission, q147's salted shuffle
    "q160_curriculum_order" ->
      """WITH s AS (SELECT doc_id,
        |    CAST(len(list_distinct(string_split(lower(text), ' ')))
        |      AS BIGINT) AS uniq,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tot
        |  FROM documents WHERE text IS NOT NULL),
        |q AS (SELECT doc_id, uniq * 1000000 // tot AS q_ratio FROM s),
        |r AS (SELECT doc_id, q_ratio,
        |    CAST(row_number() OVER (ORDER BY -q_ratio, doc_id) AS BIGINT)
        |      AS rn,
        |    CAST(count(*) OVER () AS BIGINT) AS n FROM q),
        |b AS (SELECT doc_id, q_ratio,
        |    1 + (10 * (rn - 1)) // n AS decile FROM r),
        |a AS (SELECT doc_id, q_ratio, decile, CAST(e.epoch AS BIGINT)
        |      AS epoch
        |  FROM b, (VALUES (0), (1), (2)) e(epoch)
        |  WHERE decile <= e.epoch * 3 + 4),
        |h0 AS (SELECT doc_id, epoch, decile,
        |    ('0x' || substr(md5(CAST(epoch AS VARCHAR) || ':' ||
        |      CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
        |  FROM a)
        |SELECT doc_id, epoch, decile, h // 536870912 AS shard,
        |  CAST(row_number() OVER (PARTITION BY epoch, h // 536870912
        |    ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM h0
        |ORDER BY epoch, shard, pos""".stripMargin,

    // winsorized stats: integer rank formulas, order-statistic bounds by
    // (x, id) row_number, clip into [lo, hi], exact-decimal sum (dsum)
    "q158_agg_winsorized" ->
      s"""WITH g AS (SELECT l_returnflag AS grp, l_extendedprice AS x,
        |    CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS id
        |  FROM lineitem),
        |n_ AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY grp),
        |r AS (SELECT grp, x, id, CAST(row_number() OVER (
        |    PARTITION BY grp ORDER BY x, id) AS BIGINT) AS rn FROM g),
        |b AS (SELECT r.grp,
        |    min(CASE WHEN r.rn = (n_.n + 99) // 100 THEN r.x END) AS lo,
        |    min(CASE WHEN r.rn = n_.n - (n_.n + 99) // 100 + 1
        |      THEN r.x END) AS hi
        |  FROM r JOIN n_ USING (grp)
        |  WHERE r.rn = (n_.n + 99) // 100
        |    OR r.rn = n_.n - (n_.n + 99) // 100 + 1
        |  GROUP BY r.grp)
        |SELECT g.grp, n_.n, b.lo, b.hi,
        |  CAST(sum(CASE WHEN g.x < b.lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_below,
        |  CAST(sum(CASE WHEN g.x > b.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_above,
        |  ${sqlDsum("greatest(b.lo, least(b.hi, g.x))")} AS winsorized_sum
        |FROM g JOIN b USING (grp) JOIN n_ USING (grp)
        |GROUP BY g.grp, n_.n, b.lo, b.hi
        |ORDER BY g.grp""".stripMargin,

    // exact quantiles from the value histogram: same grouped counts +
    // cumulative sums (HUGEINT window sums cast back, the q91 gotcha) +
    // pure-integer target ranks; CAST(l_quantity AS BIGINT) is exact on
    // this integral-valued column in both engines
    "q173_quantile_value_histogram" ->
      """WITH h AS (SELECT l_returnflag AS grp,
        |    CAST(l_quantity AS BIGINT) AS v, count(*) AS c
        |  FROM lineitem GROUP BY grp, v),
        |cum AS (SELECT grp, v, c,
        |    CAST(sum(c) OVER (PARTITION BY grp ORDER BY v) AS BIGINT)
        |      AS cum,
        |    CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS n
        |  FROM h)
        |SELECT grp, max(n) AS n_rows, CAST(count(*) AS BIGINT) AS n_values,
        |  min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50,
        |  min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN v END) AS p90,
        |  min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS p99
        |FROM cum GROUP BY grp ORDER BY grp""".stripMargin,

    // epoch shuffle: epoch-salted md5 keys, fixed-width hash-range shards
    // (2³²/8 = 536870912), rank within (epoch, shard)
    "q147_shuffle_epochs" ->
      """WITH d0 AS (SELECT doc_id, unnest([0, 1, 2]) AS epoch
        |  FROM documents),
        |h0 AS (SELECT doc_id, epoch,
        |    ('0x' || substr(md5(CAST(epoch AS VARCHAR) || ':' ||
        |      CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
        |  FROM d0)
        |SELECT doc_id, epoch, h // 536870912 AS shard, h,
        |  CAST(row_number() OVER (PARTITION BY epoch, h // 536870912
        |    ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM h0
        |ORDER BY epoch, shard, pos""".stripMargin,

    // temporal + entity split: exact integer cutoff at 3/4 span, md5
    // user cohort, three-way partition with counts + additive checksums
    "q142_split_temporal" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |    epoch_us(ts) AS us FROM events),
        |b AS (SELECT min(us) AS us0, max(us) AS us1 FROM ev),
        |t AS (SELECT ev.*, b.us0 + ((b.us1 - b.us0) * 3) // 4 AS cutoff,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 100 < 20 AS test_user
        |  FROM ev, b),
        |s AS (SELECT event_id, event_type,
        |    CASE WHEN us < cutoff AND NOT test_user THEN 'train'
        |         WHEN us >= cutoff AND test_user THEN 'test'
        |         ELSE 'discarded' END AS split
        |  FROM t)
        |SELECT split, event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum
        |FROM s GROUP BY split, event_type
        |ORDER BY split, event_type""".stripMargin,

    // sampled aggregation: md5-stable 1% sample, decimal-exact ×100
    // scale-up, one double conversion, error readout vs the exact dsum
    "q143_agg_sampled" ->
      """WITH li AS (SELECT l_returnflag, l_extendedprice,
        |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '#' ||
        |      CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT % 100
        |      AS bucket
        |  FROM lineitem),
        |sm AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_sample,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
        |      AS DOUBLE) AS est_revenue
        |  FROM li WHERE bucket = 0 GROUP BY l_returnflag),
        |ex AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS exact_revenue
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT sm.l_returnflag, sm.n_sample, ex.n_total, sm.est_revenue,
        |  ex.exact_revenue,
        |  (sm.est_revenue - ex.exact_revenue) / ex.exact_revenue AS rel_err
        |FROM sm JOIN ex USING (l_returnflag)
        |ORDER BY sm.l_returnflag""".stripMargin,

    // MAD outliers: the q52 percentile↔quantile_cont equivalence reused
    // twice (median, then median of absolute deviations), IEEE ops in
    // the same written order
    "q137_anomaly_mad" ->
      """WITH ev AS (SELECT event_type, value FROM events),
        |m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM ev GROUP BY event_type),
        |d AS (SELECT ev.event_type, abs(ev.value - m.med) AS dev
        |  FROM ev JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM d GROUP BY event_type)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |  max(m.med) AS med, max(md.mad) AS mad,
        |  CAST(count(CASE WHEN d.dev > md.mad * 3.0 THEN 1 END) AS BIGINT)
        |    AS n_outliers,
        |  max(d.dev) AS max_dev
        |FROM d JOIN m USING (event_type) JOIN md USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    // 3σ-squared anomaly rule over exact-decimal population moments; the
    // per-row compare repeats the stats expressions (correlated via JOIN)
    "q117_anomaly_zscore" -> {
      val n = "CAST(count(*) AS DOUBLE)"
      val sx = sqlDsum("value", 2)
      val sxx = sqlDsumBig("value * value", 4)
      s"""WITH st AS (
         |  SELECT event_type, $sx / $n AS mu,
         |    GREATEST($sxx / $n - ($sx / $n) * ($sx / $n), 0.0) AS varp
         |  FROM events GROUP BY event_type)
         |SELECT e.event_id, e.event_type, e.value, st.mu, st.varp
         |FROM events e JOIN st USING (event_type)
         |WHERE (e.value - st.mu) * (e.value - st.mu) > 9.0 * st.varp
         |ORDER BY e.event_id""".stripMargin
    },

    // exact top-25 tokens — the sketch path must EQUAL the direct
    // computation (its nondeterministic internals never reach the output)
    "q114_agg_heavy_hitters" ->
      """SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS word
        |  FROM documents WHERE text IS NOT NULL)
        |GROUP BY word ORDER BY cnt DESC, word LIMIT 25""".stripMargin,

    // Morton key derivation: exact BIGINT grid affine (// ≡ Spark div on
    // non-negative values), then the generated 32-term bit interleave
    "q112_lake_zorder" ->
      s"""WITH e AS (SELECT event_id, user_id,
         |    CAST(floor(value * 1000000.0) AS BIGINT) AS sv FROM events),
         |mm AS (SELECT min(user_id) AS uxmin, max(user_id) AS uxmax,
         |    min(sv) AS svmin, max(sv) AS svmax FROM e),
         |g AS (SELECT event_id,
         |    ((user_id - uxmin) * 65535) // greatest(uxmax - uxmin, 1) AS gx,
         |    ((sv - svmin) * 65535) // greatest(svmax - svmin, 1) AS gy
         |  FROM e, mm),
         |z AS (SELECT event_id, gx, gy, $zTerms AS zv FROM g)
         |SELECT event_id, gx, gy, zv, zv // 16777216 AS zbin
         |FROM z ORDER BY event_id""".stripMargin,

    // Bradley–Terry: exact duel counts from the dense (user × type) count
    // matrix, then the unrolled 20-step MM chain with order-pinned folds
    "q245_bt_strength" ->
      s"""WITH cnt AS MATERIALIZED (SELECT user_id, event_type,
         |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
         |ty AS (SELECT DISTINCT event_type FROM events),
         |us AS (SELECT DISTINCT user_id FROM events),
         |dense AS (SELECT u.user_id, t.event_type, coalesce(c.c, 0) AS c
         |  FROM us u CROSS JOIN ty t
         |  LEFT JOIN cnt c ON c.user_id = u.user_id
         |    AND c.event_type = t.event_type),
         |duel AS MATERIALIZED (SELECT a.event_type AS ti, b.event_type AS tj,
         |    CAST(sum(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS BIGINT)
         |      AS wi,
         |    CAST(sum(CASE WHEN b.c > a.c THEN 1 ELSE 0 END) AS BIGINT)
         |      AS wj
         |  FROM dense a JOIN dense b ON a.user_id = b.user_id
         |    AND a.event_type < b.event_type
         |  GROUP BY 1, 2),
         |nm AS MATERIALIZED (SELECT ti AS i, tj AS j, wi + wj AS n FROM duel
         |  UNION ALL SELECT tj, ti, wi + wj FROM duel),
         |wt AS MATERIALIZED (SELECT i, CAST(sum(w) AS BIGINT) AS w FROM (
         |    SELECT ti AS i, wi AS w FROM duel
         |    UNION ALL SELECT tj, wj FROM duel) GROUP BY i),
         |gm AS (SELECT i, CAST(sum(n) AS BIGINT) AS games FROM nm
         |  GROUP BY i),
         |it0 AS MATERIALIZED (SELECT event_type AS i, CAST(1.0 AS DOUBLE) AS p FROM ty),
         |$btIters
         |SELECT w.i AS event_type, w.w AS wins, gm.games AS games,
         |  it20.p AS strength,
         |  CAST(row_number() OVER (ORDER BY it20.p DESC, w.i) AS INT)
         |    AS rnk
         |FROM wt w JOIN gm ON gm.i = w.i JOIN it20 ON it20.i = w.i
         |ORDER BY event_type""".stripMargin,

    // Hilbert key derivation: the same exact-BIGINT grid affine, then the
    // order-16 rotate/reflect walk replayed as a 16-step recursive CTE
    "q242_lake_hilbert" ->
      s"""WITH RECURSIVE $gridCte,
         |$hilbertWalk
         |SELECT event_id, gx, gy, d AS hv, d // 16777216 AS hbin
         |FROM hw WHERE s = 0 ORDER BY event_id""".stripMargin,

    // layout pruning audit: both curves recomputed (32-term interleave +
    // recursive Hilbert walk), 50 fixed-width files per layout reduced to
    // min/max bboxes, stats-based admission against three box predicates
    "q243_layout_pruning" ->
      s"""WITH RECURSIVE $gridCte,
         |$hilbertWalk,
         |k AS (SELECT g.event_id, g.gx, g.gy, $zTerms AS zv, h.hv
         |  FROM g JOIN (SELECT event_id, d AS hv FROM hw WHERE s = 0) h
         |    USING (event_id)),
         |r AS (SELECT gx, gy, gx // 1311 AS f_linear,
         |    zv // 85899346 AS f_zorder, hv // 85899346 AS f_hilbert
         |  FROM k),
         |lf AS (SELECT 'linear' AS layout, f_linear AS f, gx, gy FROM r
         |  UNION ALL SELECT 'zorder', f_zorder, gx, gy FROM r
         |  UNION ALL SELECT 'hilbert', f_hilbert, gx, gy FROM r),
         |files AS (SELECT layout, f,
         |    min(gx) AS gx_min, max(gx) AS gx_max,
         |    min(gy) AS gy_min, max(gy) AS gy_max,
         |    CAST(count(*) AS BIGINT) AS n_rows
         |  FROM lf GROUP BY 1, 2),
         |boxes AS (SELECT * FROM (VALUES
         |    ('corner', 0, 4095, 0, 4095),
         |    ('band_y', 0, 65535, 32768, 36863),
         |    ('mid_box', 40960, 49151, 40960, 49151))
         |  b(box, bx_lo, bx_hi, by_lo, by_hi)),
         |audit AS (SELECT layout, box,
         |    CAST(count(*) AS BIGINT) AS files_present,
         |    CAST(sum(CASE WHEN gx_min <= bx_hi AND gx_max >= bx_lo
         |      AND gy_min <= by_hi AND gy_max >= by_lo
         |      THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
         |    CAST(sum(CASE WHEN gx_min <= bx_hi AND gx_max >= bx_lo
         |      AND gy_min <= by_hi AND gy_max >= by_lo
         |      THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
         |  FROM files, boxes GROUP BY 1, 2),
         |m AS (SELECT box, CAST(count(*) AS BIGINT) AS rows_matched
         |  FROM r, boxes
         |  WHERE gx BETWEEN bx_lo AND bx_hi AND gy BETWEEN by_lo AND by_hi
         |  GROUP BY box)
         |SELECT a.layout, a.box, a.files_present, a.files_read,
         |  a.rows_scanned,
         |  CAST(coalesce(m.rows_matched, 0) AS BIGINT) AS rows_matched
         |FROM audit a LEFT JOIN m USING (box)
         |ORDER BY layout, box""".stripMargin,

    "q64_agg_salted_skew" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the direct (unsalted) join — equality with the salted plan is the point
    "q68_join_salted_skew" ->
      s"""SELECT k, count(*) AS n, ${sqlDsum("l_quantity")} AS total_qty
         |FROM (SELECT CASE WHEN l_orderkey % 10 < 9 THEN 'HOT'
         |             ELSE l_returnflag END AS k, l_quantity FROM lineitem)
         |JOIN (VALUES ('HOT'), ('A'), ('N')) d(k) USING (k)
         |GROUP BY k ORDER BY k""".stripMargin,

    "q63_ml_split" ->
      """SELECT lang,
        |  CASE WHEN h BETWEEN '0' AND '9' THEN 'train'
        |       WHEN h IN ('a', 'b', 'c') THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n
        |FROM (SELECT lang, substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
        |      FROM documents)
        |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,

    "q58_ml_hash_sample" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
        |ORDER BY o_orderkey""".stripMargin,

    "q54_ml_nearest_centroid" ->
      s"""WITH cent AS (
         |  SELECT label AS cent_id, list(c ORDER BY pos) AS centroid FROM (
         |    SELECT label, g.pos AS pos,
         |      CAST(sum(CAST(CAST(embedding[CAST(g.pos AS INTEGER)] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS c
         |    FROM embeddings, generate_series(1, 64) g(pos)
         |    GROUP BY label, g.pos)
         |  GROUP BY label),
         |sims AS (
         |  SELECT e.vec_id, e.label, c.cent_id,
         |    $dotEC / (sqrt($normE) * sqrt($normC)) AS sim
         |  FROM embeddings e, cent c)
         |SELECT vec_id, label, cent_id AS nearest_centroid,
         |  label = cent_id AS self_match
         |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rk
         |      FROM sims)
         |WHERE rk = 1 ORDER BY vec_id""".stripMargin,

    "q53_agg_pivot" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (l_linestatus = 'F') AS f_cnt,
        |  count(*) FILTER (l_linestatus = 'O') AS o_cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // moments from exact power sums, combined in the SAME double expression
    // tree Spark evaluates — built-in stddev/corr merge doubles in
    // partition order and would never hash-match; power sums take the
    // sqlDsumBig text bridge (DuckDB's DECIMAL→DOUBLE double-rounds above
    // 2^53); GREATEST / NULLIF-style guards mirror the Spark side
    "q90_agg_moments" -> {
      val n = "CAST(count(*) AS DOUBLE)"
      val sx = sqlDsum("l_extendedprice")
      val sxx = sqlDsumBig("l_extendedprice * l_extendedprice", 4)
      val sy = sqlDsum("l_quantity")
      val syy = sqlDsumBig("l_quantity * l_quantity", 4)
      val sxy = sqlDsumBig("l_extendedprice * l_quantity", 4)
      val variance =
        s"CASE WHEN $n <= 1 THEN NULL ELSE GREATEST(($sxx - $sx * $sx / $n) / ($n - 1), 0.0) END"
      val den2 = s"(($n * $sxx - $sx * $sx) * ($n * $syy - $sy * $sy))"
      s"""SELECT l_returnflag,
        |  $variance AS var_price,
        |  sqrt($variance) AS stddev_price,
        |  CASE WHEN $den2 <= 0 THEN NULL
        |       ELSE ($n * $sxy - $sx * $sy) / sqrt($den2) END AS corr_price_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },

    "q89_agg_bitwise" ->
      """SELECT l_returnflag,
        |  bit_and(l_partkey) AS and_part,
        |  bit_or(l_partkey) AS or_part,
        |  bit_xor(l_partkey) AS xor_part,
        |  bit_xor(l_orderkey) AS xor_order
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q85_fn_unpivot" ->
      s"""WITH w AS (
        |  SELECT l_returnflag,
        |    ${sqlDsum("l_quantity")} AS sum_qty,
        |    ${sqlDsum("l_extendedprice")} AS sum_price,
        |    ${sqlDsum("l_discount")} AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value
        |FROM w UNPIVOT (value FOR metric IN (sum_qty, sum_price, sum_disc))
        |ORDER BY l_returnflag, metric""".stripMargin,

    "q52_agg_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS median_price,
        |  quantile_cont(l_extendedprice, 0.9) AS p90_price,
        |  quantile_cont(l_quantity, 0.25) AS p25_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q48_ml_centroids" ->
      """SELECT label, CAST(g.pos AS BIGINT) AS pos,
        |  CAST(sum(CAST(CAST(embedding[CAST(g.pos AS INTEGER)] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS c
        |FROM embeddings, generate_series(1, 64) g(pos)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "q50_udaf_weighted_avg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |    / CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}

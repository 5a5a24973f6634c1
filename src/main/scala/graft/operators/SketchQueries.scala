package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Mergeable-summary operators: distributed sketches whose PARTIAL form can
  * be stored per ingest partition (hour, month, shard) and merged later to
  * answer queries over any partition range without rescanning raw data —
  * the q124 incremental-rollup discipline extended beyond algebraic
  * aggregates to cardinality (KMV) and quantiles (fixed-bin histograms).
  *
  * Unlike HLL/t-digest, both summaries here are EXACTLY deterministic and
  * engine-independent (k-smallest md5 hashes; integer bin counts), so the
  * merged-sketch queries are DuckDB-oracled end-to-end: the declared query
  * computes through the partial→merge path while the oracle computes the
  * sketch directly from raw data — the hash match IS the proof that the
  * merge loses nothing. Spark's own Datasketches HLL surface
  * (`hll_sketch_agg`/`hll_union_agg`) is the binary-blob production
  * alternative and is pinned by spec (MergeableSketchSpec); its estimates
  * are engine-specific so it stays ⚙.
  */
object KmvSketch {

  /** K-minimum-values distinct sketch [Bar-Yossef et al. 2002]: per group,
    * the `k` smallest DISTINCT 32-bit hashes of the keys. Mergeable
    * exactly: the k smallest of a union of per-partition k-smallest sets
    * equal the k smallest over the union of the raw sets (any hash among
    * the global k smallest is among its own partition's k smallest), so
    * partial sketches stored per ingest partition answer distinct-count
    * queries over ANY partition range, loss-free vs a full rescan.
    *
    * Scale shape: one distinct shuffle over (group, hash) then a
    * rank-truncated sort per group — Spark 4 rewrites the `row_number ≤ k`
    * filter into WindowGroupLimit, so each map task forwards at most k
    * rows per group BEFORE the exchange: the shuffle after distinct is
    * k-bounded per group per task, never corpus-sized. Re-merging stored
    * partials touches k·partitions rows per group, independent of raw
    * data volume. */
  def partial(df: DataFrame, groupCols: Seq[String], hashCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // "rn" is a reserved working column: a group/hash column named "rn"
    // would be silently replaced then dropped
    require(!(groupCols :+ hashCol).contains("rn"),
      "KmvSketch.partial reserves working column name 'rn'")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(hashCol))
    df.select((groupCols :+ hashCol).map(col): _*).distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Pairwise set-operation estimates from per-group KMV sketches
    * [Beyer et al. SIGMOD'07]: for every unordered group pair (a < b),
    * build the k-smallest union sketch U_k from the two stored sketches
    * (correct by the same merge theorem as [[partial]]), then
    *
    *   est_union   = (k−1)·2³²/kth        (the [[stats]] estimator)
    *   est_jaccard = |U_k ∩ A ∩ B| / |U_k|
    *   est_inter   = est_jaccard · est_union
    *
    * When the union sketch holds fewer than k hashes it IS the exact
    * union, and the uniform formulas collapse to exact counts — no
    * special-casing. This answers "how much does source A overlap source
    * B" from k·|groups| stored rows, never rescanning or joining the raw
    * corpus: THE way to estimate cross-source overlap at 100 TB.
    *
    * Scale shape: the pair stage touches k-bounded sketches only —
    * |groups|²·k rows worst case, independent of raw volume. Membership
    * flags survive the union via max(), and the k-smallest truncation is
    * the same WindowGroupLimit-rewritten row_number as [[partial]]. */
  def setOps(sketch: DataFrame, groupCol: String, hashCol: String,
      k: Int): DataFrame = {
    require(k > 1, s"k must be > 1: $k")
    val tagged = sketch.select(col(groupCol).as("g"), col(hashCol).as("h"))
    val pairs = tagged.select(col("g").as("ta")).distinct()
      .join(tagged.select(col("g").as("tb")).distinct(),
        col("ta") < col("tb"))
    val u = pairs.join(tagged.withColumnRenamed("g", "ta"), "ta")
      .select(col("ta"), col("tb"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
      .unionAll(pairs.join(tagged.withColumnRenamed("g", "tb"), "tb")
        .select(col("ta"), col("tb"), col("h"),
          lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy("ta", "tb", "h")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("ta"), col("tb")).orderBy(col("h"))
    val uk = u.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
    val scaled = (k - 1).toLong * 4294967296L
    uk.groupBy("ta", "tb")
      .agg(count(lit(1)).as("n_union_sk"),
        max(col("h")).as("kth_hash"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("n_common"))
      .withColumn("est_union",
        when(col("n_union_sk") < k, col("n_union_sk").cast("double"))
          .otherwise(lit(scaled).cast("double") / col("kth_hash")))
      .withColumn("est_jaccard",
        col("n_common").cast("double") / col("n_union_sk"))
      .withColumn("est_inter",
        (col("n_common").cast("double") / col("n_union_sk")) *
          col("est_union"))
  }

  /** Collapse a (group, hash) sketch to per-group stats: sketch size, the
    * k-th minimum, and the standard KMV estimate (k−1)/U₍k₎ with
    * U₍k₎ = kth_hash/2³² — computed as the single IEEE division
    * ((k−1)·2³²)/kth on exact integer values, so the double is
    * reproducible bit-for-bit in any engine. Below k distinct hashes the
    * sketch IS the exact set and the estimate is the exact count. */
  def stats(sketch: DataFrame, groupCols: Seq[String], hashCol: String,
      k: Int): DataFrame = {
    // reserved output names — a group column reusing one would collide
    require(groupCols.intersect(
        Seq("n_hashes", "kth_hash", "est_distinct")).isEmpty,
      "KmvSketch.stats reserves columns n_hashes, kth_hash, est_distinct")
    val scaled = (k - 1).toLong * 4294967296L // (k−1)·2³², exact in double
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_hashes"), max(col(hashCol)).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_hashes") < k, col("n_hashes").cast("double"))
          .otherwise(lit(scaled).cast("double") / col("kth_hash")))
  }
}

/** Count-min sketch [Cormode & Muthukrishnan 2005]: a d×w counter matrix;
  * item x increments cell (r, h_r(x) mod w) for each of the d salted hash
  * rows, and the point estimate for x is the MIN over its d counters —
  * always ≥ the true count, within εN with probability 1−δ at
  * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. Counters ADD, so partials stored per ingest
  * partition merge loss-free (the q127/q128 discipline): a 100 TB stream
  * stores d·w integers per (hour, shard) and answers "how often did key x
  * appear in any hour range" without rescanning raw data. Pairs with q114's
  * Misra–Gries: MG NOMINATES the heavy keys, CM answers point queries for
  * ANY key (MG tracks only its m survivors).
  *
  * Hashes are salted md5 prefixes (`md5_prefix32(r || ':' || key)`), so the
  * whole sketch is deterministic and engine-independent — the oracle
  * recomputes it from raw data and the hash match proves count-addition
  * merging exact, the same move as [[KmvSketch]].
  */
object CmSketch {

  /** Per-(keyCols ∪ (r, c)) counter partials — the stored artifact.
    * Scale shape: the explode is a d× row amplification collapsed
    * immediately by a map-side partial count; the shuffle carries at most
    * keyCols-cardinality · d·w counter rows, never raw volume. */
  def partial(df: DataFrame, keyCols: Seq[String], itemCol: String,
      d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, s"d, w must be positive: $d, $w")
    // "r", "c", "cnt" are reserved working/output columns: withColumn
    // would silently REPLACE same-named input columns and corrupt the
    // sketch — fail fast instead
    require(df.columns.intersect(Seq("r", "c", "cnt")).isEmpty,
      "CmSketch.partial reserves column names r, c, cnt; rename the " +
        "colliding input columns")
    df.withColumn("r", explode(array((0 until d).map(lit): _*)))
      .withColumn("c",
        call_function("md5_prefix32",
          concat_ws(":", col("r"), col(itemCol))) % w)
      .groupBy((keyCols.map(col) :+ col("r") :+ col("c")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge partials down to one d×w matrix: counters add (the only
    * algebra); bounded at d·w rows regardless of partial count. */
  def merge(partials: DataFrame): DataFrame =
    partials.groupBy("r", "c").agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for `keys` (a driver-bounded key table): min over the
    * d salted counters; an absent cell reads 0 (the CM convention — min
    * with 0 yields 0, the exact answer for never-seen keys). Bounded:
    * |keys|·d probe rows against the d·w merged matrix. */
  def estimate(merged: DataFrame, keys: DataFrame, itemCol: String,
      d: Int, w: Int): DataFrame = {
    // same reserved-name contract as [[partial]]; est_cnt is the output.
    // NOTE: the final groupBy spans every column of `keys`, so duplicate
    // key rows collapse to one estimate row — pass a distinct key table.
    require(keys.columns.intersect(Seq("r", "c", "cnt", "est_cnt")).isEmpty,
      "CmSketch.estimate reserves column names r, c, cnt, est_cnt; " +
        "rename the colliding key columns")
    val probes = keys
      .withColumn("r", explode(array((0 until d).map(lit): _*)))
      .withColumn("c",
        call_function("md5_prefix32",
          concat_ws(":", col("r"), col(itemCol))) % w)
    val keyOut = keys.columns.map(col)
    probes.join(broadcast(merged), Seq("r", "c"), "left")
      .groupBy(keyOut: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }
}

/** Mergeable fixed-bin histogram: per group, integer counts over
  * equal-width value bins. Partials stored per ingest partition merge by
  * ADDING counts (the only algebra), and any quantile is answered from the
  * merged histogram with one pass over its (bounded) bins — the summary a
  * 100 TB pipeline stores per (group, day) to serve p50/p95/p99 dashboards
  * without rescanning raw data. Resolution is the bin width; the
  * interpolated estimate is exact when values are uniform within a bin and
  * off by at most one bin width otherwise.
  */
object MergeableHistogram {

  /** Per-(group ∪ partition) bin counts — the stored artifact. `binCol`
    * must already be the integer bin index. */
  def partial(df: DataFrame, keyCols: Seq[String], binCol: String): DataFrame =
    df.groupBy((keyCols :+ binCol).map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge partials down to `groupCols` granularity: counts add. */
  def merge(partials: DataFrame, groupCols: Seq[String], binCol: String): DataFrame =
    partials.groupBy((groupCols :+ binCol).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Percentile extraction from a merged histogram. For each percentile
    * p ∈ `percentiles` (integer, 0 < p ≤ 100) and group: the target rank
    * is ⌈p·N/100⌉ in exact integer arithmetic ((p·N + 99) div 100), the
    * containing bin is the first with cumulative count ≥ target, and the
    * estimate linearly interpolates inside it. Every arithmetic step is
    * integer or a single pinned IEEE double op, so results are
    * engine-reproducible.
    *
    * Scale shape: the window and join run over the MERGED histogram —
    * bins × groups rows, bounded regardless of raw data volume. */
  def percentiles(merged: DataFrame, groupCols: Seq[String], binCol: String,
      binWidth: Long, percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p > 0 && p <= 100),
      s"percentiles must be in (0, 100]: $percentiles")
    val grp = groupCols.map(col)
    val cumW = Window.partitionBy(grp: _*).orderBy(col(binCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = merged
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(grp: _*)))
      .withColumn("cum_below", col("cum") - col("cnt"))
    val targets = hist.select((grp :+ col("n")): _*).distinct()
      .select((grp :+ col("n") :+
        explode(array(percentiles.map(lit): _*)).as("p")): _*)
      .withColumn("target", expr("(p * n + 99) div 100"))
      .drop("n")
    targets.join(hist, groupCols)
      .filter(col("cum_below") < col("target") && col("cum") >= col("target"))
      .select((grp :+ col("p") :+ col("target") :+ col(binCol) :+
        col("cnt").as("bin_count") :+
        ((col(binCol) * binWidth).cast("double") +
          lit(binWidth.toDouble) *
            ((col("target") - col("cum_below")).cast("double") / col("cnt")))
          .as("est_scaled")): _*)
  }
}

/** Deterministic Bloom filter [Bloom 1970] over md5-derived bit positions —
  * the runtime-filter / semi-join-pruning sketch: build the bit array over
  * a small dimension-side key set once, probe the fact side map-only, and
  * only the (rare) Bloom-passing rows pay the real join. Membership has NO
  * false negatives, so the pass set is a superset of the true semi-join —
  * the audit this object's query runs quantifies the false-positive rate
  * that determines how much shuffle the prefilter actually saves.
  *
  * Determinism: position i of a key is md5_prefix32(key || "#b" || i) mod
  * mBits — exactly reproducible in DuckDB. The array packs 32 bits per
  * BIGINT word (bit 63 is unusable cross-engine: DuckDB raises on
  * `1::BIGINT << 63`, and 32-bit masks keep every word non-negative).
  */
object BloomPrefilter {

  val WordBits = 32

  private def positions(key: Column, mBits: Int, hashes: Int): Seq[Column] =
    (0 until hashes).map { i =>
      pmod(call_function("md5_prefix32",
        concat(key.cast("string"), lit(s"#b$i"))), lit(mBits.toLong))
    }

  /** The packed word array (mBits/32 longs) over the values of `keyCol`.
    * One small shuffle over the KEY side (partial bit_or collapses
    * map-side), then a bounded driver collect — the broadcast-literal
    * model discipline (q126: "model as a literal array — scan → score,
    * no join"). */
  def build(keys: DataFrame, keyCol: String, mBits: Int,
      hashes: Int): Array[Long] = {
    require(mBits % WordBits == 0, s"mBits must pack whole words: $mBits")
    val arr = new Array[Long](mBits / WordBits)
    keys
      .select(explode(array(
        positions(col(keyCol), mBits, hashes): _*)).as("p"))
      .select(expr(s"p div $WordBits").as("w"),
        expr(s"shiftleft(1L, cast(pmod(p, $WordBits) as int))").as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("bits"))
      .collect()
      .foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Membership test against the literal `words` — per-row builtin
    * column algebra only (md5 + element_at + bitwise AND), so the probe
    * stays inside whole-stage codegen with zero joins; the repeated md5
    * subtrees per hash collapse under codegen subexpression
    * elimination. */
  def memberCol(key: Column, words: Array[Long], mBits: Int,
      hashes: Int): Column =
    positions(key, mBits, hashes).map { p =>
      // word = p >> 5, bit = p & 31 — pure integer bitwise, no double
      // division anywhere; element_at is 1-based
      (element_at(lit(words), (shiftright(p, 5) + 1).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          p.bitwiseAND(lit(31L)).cast("int"))) =!= 0L)
    }.reduce(_ && _)
}

/** q127/q128 — the mergeable-summary queries (SURVEY §2B incremental
  * maintenance family, with q124's rollup).
  */
object SketchQueries extends QueryGroup {

  private val K = 64

  /** Q127: KMV distinct-count rollup over the event stream — per-HOUR
    * partial sketches of the distinct-user hash per event type (the stored
    * ingest artifact), merged down to one sketch per type, collapsed to
    * (size, kth-min, estimate) and joined with the exact distinct count
    * for the error readout. The ORACLE computes the sketch DIRECTLY from
    * raw events: the hash match proves the hourly partial→merge path is
    * loss-free (the KMV merge theorem, verified empirically on every
    * driver run). est_users is the one pinned IEEE division; everything
    * else is BIGINT. */
  private val q127: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val hashes = ev.select(col("event_type"),
      date_trunc("hour", col("ts")).as("hr"),
      call_function("md5_prefix32", col("user_id").cast("string")).as("h"))
    val hourly = KmvSketch.partial(hashes, Seq("event_type", "hr"), "h", K)
    val merged = KmvSketch.partial(hourly.select("event_type", "h"),
      Seq("event_type"), "h", K)
    val sk = KmvSketch.stats(merged, Seq("event_type"), "h", K)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    sk.join(broadcast(exact), "event_type")
      .select(col("event_type"), col("n_hashes"), col("kth_hash"),
        col("est_distinct").as("est_users"), col("exact_users"))
      .orderBy("event_type")
  }

  /** Q128: histogram percentile rollup over lineitem prices — per-MONTH
    * partial histograms of l_extendedprice in exact cents ($1000 bins) per
    * return flag (the stored artifact), merged by adding counts, then
    * p50/p95/p99 extracted with integer target ranks and one pinned
    * interpolation per percentile. The ORACLE histograms the raw table
    * directly: the hash match proves count-addition merging is exact. */
  private val q128: Q = (s, d) => {
    val width = 100000L // cents per bin = $1000
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag").as("flag"),
      date_trunc("month", col("l_shipdate")).as("mon"),
      (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("cents"))
    val binned = li.select(col("flag"), col("mon"),
      expr(s"cents div $width").as("bin"))
    val monthly = MergeableHistogram.partial(binned, Seq("flag", "mon"), "bin")
    val merged = MergeableHistogram.merge(monthly, Seq("flag"), "bin")
    MergeableHistogram.percentiles(merged, Seq("flag"), "bin",
        width, Seq(50, 95, 99))
      .select(col("flag"), col("p"), col("target"), col("bin"),
        col("bin_count"), (col("est_scaled") / 100.0).as("est_value"))
      .orderBy("flag", "p")
  }

  /** Q132: KMV set-operation estimates — audience overlap between every
    * pair of event types from the SAME per-type sketches q127 stores:
    * union/intersection/Jaccard estimates via [[KmvSketch.setOps]], plus
    * the exact pairwise intersection as the error readout (the q127
    * pattern: exact column exists only to exhibit the estimate's error;
    * at 100 TB you'd store just the k·|types| sketch rows and skip it).
    * The ORACLE recomputes sketches and set ops directly from raw events
    * — the hash match proves the stored-sketch pair algebra is loss-free. */
  private val q132: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val hashes = ev.select(col("event_type"),
      call_function("md5_prefix32", col("user_id").cast("string")).as("h"))
    val sk = KmvSketch.partial(hashes, Seq("event_type"), "h", K)
    val est = KmvSketch.setOps(sk, "event_type", "h", K)
    val ut = ev.select("event_type", "user_id").distinct()
    val ex = ut.as("p").join(ut.as("q"),
        col("p.user_id") === col("q.user_id") &&
          col("p.event_type") < col("q.event_type"))
      .select(col("p.event_type").as("ta"), col("q.event_type").as("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("exact_inter"))
    est.join(ex, Seq("ta", "tb"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .orderBy("ta", "tb")
  }

  /** Q140: sliding-window distinct users from MERGED hourly KMV sketches
    * — the dashboard primitive the mergeable-summary family exists for:
    * distinct counts over a 3-hour window sliding by 1 hour, answered
    * entirely from the stored per-hour partials (each hour's sketch
    * serves every window containing it — k·3 rows per window, raw data
    * never rescanned; COUNT DISTINCT is not algebraic, so without the
    * sketch every window needs its own pass over raw events). Hours are
    * integer epoch-hour ids (`epoch µs div 3600000000`, the NTZ
    * contract), so window membership is plain integer +offset. The
    * ORACLE recomputes hourly sketches AND window merges from raw
    * events; exact per-window counts ride along as the error readout
    * (q127's pattern). */
  private val q140: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("event_type"), col("user_id"),
        epochUs(col("ts")).as("us"))
      .withColumn("hr", expr("us div 3600000000"))
    val hashes = ev.select(col("event_type"), col("hr"),
      call_function("md5_prefix32", col("user_id").cast("string")).as("h"))
    val hourly = KmvSketch.partial(hashes, Seq("event_type", "hr"), "h", K)
    val member = hourly
      .withColumn("off", explode(array(lit(0L), lit(1L), lit(2L))))
      .withColumn("win_end", col("hr") + col("off"))
      .select("event_type", "win_end", "h")
    val merged = KmvSketch.partial(member, Seq("event_type", "win_end"), "h", K)
    val sk = KmvSketch.stats(merged, Seq("event_type", "win_end"), "h", K)
    val exact = ev
      .withColumn("off", explode(array(lit(0L), lit(1L), lit(2L))))
      .withColumn("win_end", col("hr") + col("off"))
      .groupBy("event_type", "win_end")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    sk.join(exact, Seq("event_type", "win_end"))
      .select(col("event_type"), col("win_end"), col("n_hashes"),
        col("kth_hash"), col("est_distinct").as("est_users"),
        col("exact_users"))
      .orderBy("event_type", "win_end")
  }

  /** Q144: count-min frequency rollup over the event stream — per-HOUR
    * partial d×w counter matrices of per-user event counts (the stored
    * ingest artifact), merged by adding counters, then point-estimated for
    * the 10 heaviest users (deterministic pick: exact count desc, user_id
    * asc — in production q114's Misra–Gries nominates) with the exact
    * count as the error readout. The ORACLE computes the matrix DIRECTLY
    * from raw events: the hash match proves counter-addition merging is
    * loss-free. All-integer end to end. d=4, w=512 (ε≈e/512, δ≈e⁻⁴). */
  private val q144: Q = (s, d) => {
    val dRows = 4
    val wCols = 512
    val ev = Tables.events(s, d).select(col("user_id"),
      date_trunc("hour", col("ts")).as("hr"))
    val hourly = CmSketch.partial(ev, Seq("hr"), "user_id", dRows, wCols)
    val merged = CmSketch.merge(hourly)
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
    val top = exact.orderBy(col("exact_cnt").desc, col("user_id")).limit(10)
    CmSketch.estimate(merged, top, "user_id", dRows, wCols)
      .select(col("user_id"), col("est_cnt"), col("exact_cnt"))
      .orderBy("user_id")
  }

  /** Q215: Bloom-prefilter audit — the runtime-filter question every
    * large fact⋈dim join at 100 TB turns on: build a 4096-bit / 3-hash
    * [[BloomPrefilter]] over the BUILDING-segment customer keys (the
    * small predicate side), probe every order MAP-ONLY against the
    * literal word array, and report exactly what the prefilter buys —
    * true semi-join matches (Bloom passes them ALL: no false negatives,
    * asserted by construction n_pass ≥ n_true), false positives among
    * the true-negative probes, and the realized fp per-mille against
    * the m/n/k design point. The dim side is one bounded build pass;
    * the fact side is a single scan with per-row builtin algebra plus
    * one broadcast hash join for the exact-truth flag (the comparison
    * baseline the audit exists to price). Integer counts, integer
    * per-mille, ONE double division (the q95 contract). */
  private val q215: Q = (s, d) => {
    val mBits = 4096; val nHash = 3
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val words = BloomPrefilter.build(cust, "c_custkey", mBits, nHash)
    val bitsSet = words.map(java.lang.Long.bitCount(_).toLong).sum
    val nKeys = cust.agg(count(lit(1)).as("n_keys"))
    Tables.orders(s, d).select(col("o_custkey"))
      .join(broadcast(cust.withColumn("dim_hit", lit(1))),
        col("o_custkey") === col("c_custkey"), "left")
      .select(col("o_custkey"), col("dim_hit").isNotNull.as("is_true"),
        BloomPrefilter.memberCol(col("o_custkey"), words, mBits, nHash)
          .as("pass"))
      .crossJoin(broadcast(nKeys))
      .groupBy("n_keys")
      .agg(count(lit(1)).as("n_probe"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("is_true"), 1L).otherwise(0L)).as("n_true"),
        sum(when(col("pass") && !col("is_true"), 1L).otherwise(0L))
          .as("n_false_pos"))
      .select(lit(mBits.toLong).as("m_bits"), lit(nHash).as("n_hashes"),
        col("n_keys"), lit(bitsSet).as("bits_set"),
        col("n_probe"), col("n_pass"), col("n_true"), col("n_false_pos"),
        when(col("n_probe") - col("n_true") > 0,
          expr("(1000 * n_false_pos) div (n_probe - n_true)")).as("fp_pm"),
        when(col("n_probe") - col("n_true") > 0,
          col("n_false_pos").cast("double") /
            (col("n_probe") - col("n_true"))).as("fp_rate"))
  }

  /** Q241: sketch-estimated JOIN CARDINALITY — the planner question the
    * KMV family answers before committing a 100 TB shuffle: how big is
    * A ⋈ B on this key? For every event-type pair, the k-smallest union
    * sketch of the two types' stored per-type KMV sketches (the q132
    * merge theorem) is read as a uniform without-replacement sample of
    * the DISTINCT join keys [Beyer et al. SIGMOD'07]; probing the exact
    * per-(type, key) frequencies for just those ≤ k sampled keys gives
    * the correlated-sampling estimator |A ⋈ B| ≈ D̂_union · Σ_sample
    * aᵤ·bᵤ / k [the min-hash join-size scheme of Vengerov et al.,
    * VLDB'15] — distinct-count estimator × mean per-sampled-key pair
    * product. When the union holds fewer than k hashes the sample IS the
    * key universe and the formula collapses to the exact join size.
    * Exact join cardinality rides along as the error readout (the q127
    * pattern: at 100 TB you'd store only the sketches and skip it).
    *
    * Determinism: hashes are md5 prefixes, the sample is a rank
    * truncation, every aggregate is BIGINT; the two IEEE divisions
    * (est_union, est_join) are mirrored op-for-op in the oracle.
    *
    * Scale shape: per-type sketches are k-row stored artifacts; the pair
    * stage touches |types|²·k sketch rows, and the frequency probe joins
    * ≤ k sampled keys per pair against the per-key count table — a
    * broadcast-sized probe, never a row-level shuffle of either input.
    * The exact column is the only corpus-sized join, and it exists only
    * to exhibit the estimate's error. */
  private val q241: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val cnt = ev.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("c"))
    val uh = ev.select("user_id").distinct()
      .withColumn("h",
        call_function("md5_prefix32", col("user_id").cast("string")))
    val tu = ev.select("event_type", "user_id").distinct().join(uh, "user_id")
    val sk = KmvSketch.partial(tu, Seq("event_type"), "h", K)
    val types = ev.select("event_type").distinct()
    val pairs = types.select(col("event_type").as("ta"))
      .join(types.select(col("event_type").as("tb")), col("ta") < col("tb"))
    val both = pairs.join(sk.withColumnRenamed("event_type", "ta"), "ta")
        .select("ta", "tb", "h")
      .unionAll(pairs.join(sk.withColumnRenamed("event_type", "tb"), "tb")
        .select("ta", "tb", "h"))
      .distinct()
    val w = Window.partitionBy("ta", "tb").orderBy("h")
    val uni = both.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K).drop("rn")
    val ust = uni.groupBy("ta", "tb")
      .agg(count(lit(1)).as("k_used"), max("h").as("kth_hash"))
    val dotS = uni.join(uh, "h")
      .join(cnt.select(col("event_type").as("ta"), col("user_id"),
        col("c").as("ca")), Seq("ta", "user_id"))
      .join(cnt.select(col("event_type").as("tb"), col("user_id"),
        col("c").as("cb")), Seq("tb", "user_id"))
      .groupBy("ta", "tb").agg(sum(col("ca") * col("cb")).as("sample_dot"))
    val exact = cnt.as("x").join(cnt.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("ta"), col("y.event_type").as("tb"))
      .agg(sum(col("x.c") * col("y.c")).as("exact_join"))
    val scaled = (K - 1).toLong * 4294967296L // (k−1)·2³², exact in double
    ust.join(dotS, Seq("ta", "tb"), "left")
      .join(exact, Seq("ta", "tb"), "left")
      .withColumn("sample_dot", coalesce(col("sample_dot"), lit(0L)))
      .withColumn("exact_join", coalesce(col("exact_join"), lit(0L)))
      .withColumn("est_union",
        when(col("k_used") < K, col("k_used").cast("double"))
          .otherwise(lit(scaled).cast("double") / col("kth_hash")))
      .withColumn("est_join",
        col("est_union") * col("sample_dot").cast("double") /
          col("k_used").cast("double"))
      .select("ta", "tb", "k_used", "kth_hash", "est_union", "sample_dot",
        "est_join", "exact_join")
      .orderBy("ta", "tb")
  }

  /** Q248: HyperLogLog distinct-count — the q41b move applied to HLL:
    * q49's built-in approx_count_distinct is ⚙ (its HLL++ register layout
    * is engine-private), but HyperLogLog ITSELF [Flajolet, Fusy, Gandouet,
    * Meunier 2007] is a pure function of the hashes, so an md5-keyed HLL
    * hash-matches DuckDB exactly. m = 256 registers: bucket = top 8 hash
    * bits, rank window w = low 24 bits; the register update and the
    * harmonic sum stay INTEGER — `term = roundUpPow2(w) = (w | w≫1 | w≫2 |
    * w≫4 | w≫8 | w≫16) + 1` is 2^(25−ρ) (w = 0 → 1, the ρ = 25 sentinel),
    * registers keep min(term) ≡ max ρ, and S = Σ_buckets term (empty
    * buckets contribute 2²⁵ ≡ ρ = 0) is ≤ 2³³ in BIGINT — so the ONE
    * IEEE step is the final α·m²·2²⁵/S, mirrored op-for-op. No
    * order-sensitive double sum anywhere (Σ2^−ρ has a 25-bit exponent
    * spread — summed as doubles it would round order-dependently; the
    * scaled-integer sum is the determinism trick). Raw estimate plus the
    * zero-register count V (the linear-counting branch input — ln is
    * libm-divergent, so the CORRECTION is left to the reader) and the
    * exact count as error readout.
    *
    * Scale shape: one partial-agg pass to 256·|groups| register rows (the
    * stored mergeable artifact — min() merges partials loss-free), one
    * 256→1 fold per group. The exact column is the only corpus-wide
    * distinct and exists as the readout. */
  private val q248: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val t = ev.select(col("event_type"),
        call_function("md5_prefix32", col("user_id").cast("string")).as("h"))
      .withColumn("bucket", expr("h div 16777216"))
      .withColumn("w", col("h") % lit(16777216L))
      .withColumn("term",
        expr("(w | (w >> 1) | (w >> 2) | (w >> 4) | (w >> 8) | (w >> 16)) + 1"))
    val reg = t.groupBy("event_type", "bucket").agg(min(col("term")).as("t"))
    val agg = reg.groupBy("event_type").agg(
        count(lit(1)).as("n_hit"), sum(col("t")).as("s_present"))
      .withColumn("v_zero", lit(256L) - col("n_hit"))
      .withColumn("s_scaled",
        col("s_present") + col("v_zero") * lit(33554432L))
      .withColumn("est_raw",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
          lit(2199023255552.0) / col("s_scaled").cast("double"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    agg.join(broadcast(exact), "event_type")
      .select("event_type", "n_hit", "v_zero", "s_scaled", "est_raw",
        "exact_users")
      .orderBy("event_type")
  }

  /** Q250: histogram-based selectivity estimation — the third leg of the
    * planner toolkit (q241 join sizes, q243 layout pruning, q215 runtime
    * filters): how many rows will a range predicate admit, answered from
    * a 64-bucket equi-width histogram (the stored column-stats artifact
    * every warehouse keeps) with uniform-within-bucket interpolation
    * [Selinger et al. SIGMOD'79's selectivity model, histogram form].
    * All integer: bucket width `w = span div 64 + 1`, per-bucket overlap
    * `max(0, min(hi, b_hi) − max(lo, b_lo) + 1)`, contribution
    * `cnt·overlap div w`; five derived range predicates (one empty —
    * outside the domain — pinning the zero edges) with actual counts and
    * the per-mille absolute error as readout.
    *
    * Scale shape: the histogram is one partial-agg pass stored as ≤ 65
    * rows; every estimate is arithmetic over histogram × 5 predicates —
    * no data rescans at plan time. The actual column is the declared
    * readout (one conditional-count pass, q165-style fold). */
  private val q250: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select(
      (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("c"))
    val mm = li.agg(min("c").as("mn"), max("c").as("mx"))
      .withColumn("w", expr("(mx - mn) div 64 + 1"))
    val hist = li.crossJoin(broadcast(mm))
      .select(expr("(c - mn) div w").as("b"), col("mn"), col("w"))
      .groupBy("b", "mn", "w").agg(count(lit(1)).as("cnt"))
      .select(col("b"), col("cnt"),
        (col("mn") + col("b") * col("w")).as("b_lo"),
        (col("mn") + (col("b") + 1) * col("w") - 1).as("b_hi"))
    // five predicates from the domain: four in-range eighths, one empty
    val preds = mm.select(
        explode(sequence(lit(1L), lit(5L))).as("pred_id"),
        col("mn"), col("mx"), (col("mx") - col("mn")).as("span"))
      .select(col("pred_id"),
        when(col("pred_id") === 5, col("mx") + 1)
          .otherwise(col("mn") +
            expr("(pred_id * span) div 8")).as("lo"),
        when(col("pred_id") === 5, col("mx") + 100)
          .otherwise(col("mn") +
            expr("((pred_id + 2) * span) div 8")).as("hi"))
    val est = hist.crossJoin(broadcast(preds))
      .withColumn("ov", greatest(lit(0L),
        least(col("hi"), col("b_hi")) - greatest(col("lo"), col("b_lo"))
          + 1))
      .groupBy("pred_id", "lo", "hi")
      .agg(sum(expr("(cnt * ov) div (b_hi - b_lo + 1)")).as("est_rows"))
    val actual = li.crossJoin(broadcast(preds))
      .groupBy("pred_id")
      .agg(sum(when(col("c") >= col("lo") && col("c") <= col("hi"), 1L)
        .otherwise(0L)).as("actual_rows"))
    est.join(actual, "pred_id")
      .withColumn("abs_err_pm",
        expr("(1000 * abs(est_rows - actual_rows)) div greatest(actual_rows, 1)"))
      .select("pred_id", "lo", "hi", "est_rows", "actual_rows",
        "abs_err_pm")
      .orderBy("pred_id")
  }

  /** Q251: sliding-window exact percentiles from MERGED hourly value
    * histograms — q128's percentile rollup composed with q140's window
    * membership: per-hour value histograms ($10 cent bins) are the stored
    * ingest artifact; each 3-hour window sliding by 1 merges its member
    * hours by COUNT ADDITION and reads p50/p95 off the merged histogram
    * with integer target ranks and one pinned interpolation per
    * percentile. The moving-percentile dashboard primitive: percentiles
    * are not algebraic, so without the histogram every window re-sorts
    * raw events; with it each window touches bins·3 rows and raw data is
    * never rescanned. The ORACLE recomputes hourly histograms AND window
    * merges from raw events — the hash match proves the rollup path
    * loss-free.
    *
    * Scale shape: one partial-agg pass to (hour × bin) rows, +0/1/2
    * integer window membership, cumulative windows over histogram-sized
    * frames only. */
  private val q251: Q = (s, d) => {
    val width = 1000L // cents per bin = $10
    val binned = Tables.events(s, d).select(
        epochUs(col("ts")).as("us"),
        (col("value").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .select(expr("us div 3600000000").as("hr"),
        expr(s"cents div $width").as("bin"))
    val hourly = MergeableHistogram.partial(binned, Seq("hr"), "bin")
    val member = hourly
      .withColumn("off", explode(array(lit(0L), lit(1L), lit(2L))))
      .withColumn("win_end", col("hr") + col("off"))
      .select("win_end", "bin", "cnt")
    val merged = MergeableHistogram.merge(member, Seq("win_end"), "bin")
    MergeableHistogram.percentiles(merged, Seq("win_end"), "bin",
        width, Seq(50, 95))
      .select(col("win_end"), col("p"), col("target"), col("bin"),
        col("bin_count"), (col("est_scaled") / 100.0).as("est_value"))
      .orderBy("win_end", "p")
  }

  val queries: Seq[(String, Q)] = Seq(
    "q127_distinct_kmv_rollup" -> q127,
    "q128_percentile_rollup" -> q128,
    "q132_distinct_set_ops" -> q132,
    "q140_distinct_sliding" -> q140,
    "q144_freq_cm_rollup" -> q144,
    "q215_bloom_prefilter" -> q215,
    "q241_join_size_estimate" -> q241,
    "q248_distinct_hll_md5" -> q248,
    "q250_selectivity_est" -> q250,
    "q251_sliding_percentiles" -> q251,
  )

  val oracles: Map[String, String] = Map(
    // Bloom prefilter: identical md5 positions ("key#b0..2" mod 8192),
    // 32-bit word packing via bit_or(1 << p%32) (bit 63 would raise in
    // DuckDB), probe via three LEFT JOINs onto the word table, truth
    // via a LEFT JOIN on the key set
    "q215_bloom_prefilter" ->
      """WITH keys AS (SELECT c_custkey FROM customer
        |  WHERE c_mktsegment = 'BUILDING'),
        |pos AS (SELECT c_custkey, unnest([
        |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '#b0'),
        |      1, 8))::BIGINT % 4096,
        |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '#b1'),
        |      1, 8))::BIGINT % 4096,
        |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '#b2'),
        |      1, 8))::BIGINT % 4096]) AS p
        |  FROM keys),
        |words AS (SELECT p // 32 AS w,
        |    CAST(bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS BIGINT)
        |      AS bits
        |  FROM pos GROUP BY 1),
        |bs AS (SELECT CAST(coalesce(sum(bit_count(bits)), 0) AS BIGINT)
        |    AS bits_set FROM words),
        |nk AS (SELECT CAST(count(*) AS BIGINT) AS n_keys FROM keys),
        |ph AS (SELECT o_custkey,
        |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || '#b0'),
        |      1, 8))::BIGINT % 4096 AS p0,
        |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || '#b1'),
        |      1, 8))::BIGINT % 4096 AS p1,
        |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || '#b2'),
        |      1, 8))::BIGINT % 4096 AS p2
        |  FROM orders),
        |pj AS (SELECT ph.o_custkey,
        |    k.c_custkey IS NOT NULL AS is_true,
        |    (coalesce(w0.bits, 0) &
        |      (1::BIGINT << CAST(ph.p0 % 32 AS INT))) <> 0
        |    AND (coalesce(w1.bits, 0) &
        |      (1::BIGINT << CAST(ph.p1 % 32 AS INT))) <> 0
        |    AND (coalesce(w2.bits, 0) &
        |      (1::BIGINT << CAST(ph.p2 % 32 AS INT))) <> 0 AS pass
        |  FROM ph
        |  LEFT JOIN keys k ON k.c_custkey = ph.o_custkey
        |  LEFT JOIN words w0 ON w0.w = ph.p0 // 32
        |  LEFT JOIN words w1 ON w1.w = ph.p1 // 32
        |  LEFT JOIN words w2 ON w2.w = ph.p2 // 32),
        |ag AS (SELECT n_keys,
        |    CAST(count(*) AS BIGINT) AS n_probe,
        |    CAST(count(CASE WHEN pass THEN 1 END) AS BIGINT) AS n_pass,
        |    CAST(count(CASE WHEN is_true THEN 1 END) AS BIGINT)
        |      AS n_true,
        |    CAST(count(CASE WHEN pass AND NOT is_true THEN 1 END)
        |      AS BIGINT) AS n_false_pos
        |  FROM pj, nk GROUP BY n_keys)
        |SELECT CAST(4096 AS BIGINT) AS m_bits, 3 AS n_hashes, n_keys,
        |  (SELECT bits_set FROM bs) AS bits_set,
        |  n_probe, n_pass, n_true, n_false_pos,
        |  CASE WHEN n_probe - n_true > 0
        |    THEN (1000 * n_false_pos) // (n_probe - n_true) END AS fp_pm,
        |  CASE WHEN n_probe - n_true > 0
        |    THEN CAST(n_false_pos AS DOUBLE) / (n_probe - n_true)
        |  END AS fp_rate
        |FROM ag""".stripMargin,

    // direct KMV sketch (no hourly stage): row_number over distinct
    // hashes per type, keep k, collapse — equality with the Spark-side
    // merged path is the merge-theorem check. (k−1)·2³² = 270582939648.
    "q127_distinct_kmv_rollup" ->
      """WITH dd AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |      AS h
        |  FROM events),
        |r AS (
        |  SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |  FROM dd),
        |sk AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hashes,
        |    max(h) AS kth_hash
        |  FROM r WHERE rn <= 64 GROUP BY event_type),
        |ex AS (
        |  SELECT event_type,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
        |  FROM events GROUP BY event_type)
        |SELECT sk.event_type, sk.n_hashes, sk.kth_hash,
        |  CASE WHEN sk.n_hashes < 64 THEN CAST(sk.n_hashes AS DOUBLE)
        |       ELSE CAST(270582939648 AS DOUBLE) / sk.kth_hash END
        |    AS est_users,
        |  ex.exact_users
        |FROM sk JOIN ex USING (event_type)
        |ORDER BY event_type""".stripMargin,


    // sliding percentiles: hourly histograms -> +0/1/2 window membership
    // -> count-addition merge -> q128's integer-rank percentile read
    "q251_sliding_percentiles" ->
      """WITH b AS (
        |  SELECT epoch_us(ts) // 3600000000 AS hr,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 1000
        |      AS bin
        |  FROM events),
        |h AS (SELECT hr, bin, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY 1, 2),
        |m AS (SELECT hr + off AS win_end, bin,
        |    CAST(sum(cnt) AS BIGINT) AS cnt
        |  FROM h, (SELECT unnest([0, 1, 2]) AS off) GROUP BY 1, 2),
        |c AS (SELECT win_end, bin, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY win_end ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY win_end) AS BIGINT) AS n
        |  FROM m),
        |c2 AS (SELECT *, cum - cnt AS cum_below FROM c),
        |t AS (SELECT DISTINCT win_end, n FROM c2),
        |tp AS (SELECT win_end, n, unnest([50, 95]) AS p FROM t),
        |tg AS (SELECT win_end, p, (p * n + 99) // 100 AS target FROM tp)
        |SELECT c2.win_end, tg.p, tg.target, c2.bin, c2.cnt AS bin_count,
        |  (CAST(c2.bin * 1000 AS DOUBLE) + 1000.0 *
        |    (CAST(tg.target - c2.cum_below AS DOUBLE) / c2.cnt)) / 100.0
        |    AS est_value
        |FROM tg JOIN c2 ON tg.win_end = c2.win_end
        |  AND c2.cum_below < tg.target AND c2.cum >= tg.target
        |ORDER BY c2.win_end, tg.p""".stripMargin,

    // selectivity estimation: 64-bucket equi-width histogram, integer
    // uniform-within-bucket interpolation, five derived predicates
    "q250_selectivity_est" ->
      """WITH li AS (SELECT
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS c
        |  FROM lineitem),
        |mm AS (SELECT min(c) AS mn, max(c) AS mx,
        |    (max(c) - min(c)) // 64 + 1 AS w,
        |    max(c) - min(c) AS span
        |  FROM li),
        |hist AS (SELECT b, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(max(mn) + b * max(w) AS BIGINT) AS b_lo,
        |    CAST(max(mn) + (b + 1) * max(w) - 1 AS BIGINT) AS b_hi
        |  FROM (SELECT (c - mn) // w AS b, mn, w FROM li, mm)
        |  GROUP BY b),
        |preds AS (SELECT pred_id,
        |    CASE WHEN pred_id = 5 THEN mx + 1
        |         ELSE mn + (pred_id * span) // 8 END AS lo,
        |    CASE WHEN pred_id = 5 THEN mx + 100
        |         ELSE mn + ((pred_id + 2) * span) // 8 END AS hi
        |  FROM (SELECT CAST(unnest([1, 2, 3, 4, 5]) AS BIGINT)
        |      AS pred_id), mm),
        |est AS (SELECT pred_id, lo, hi,
        |    CAST(sum((cnt * greatest(0,
        |      least(hi, b_hi) - greatest(lo, b_lo) + 1))
        |      // (b_hi - b_lo + 1)) AS BIGINT) AS est_rows
        |  FROM hist, preds GROUP BY 1, 2, 3),
        |act AS (SELECT pred_id,
        |    CAST(sum(CASE WHEN c >= lo AND c <= hi THEN 1 ELSE 0 END)
        |      AS BIGINT) AS actual_rows
        |  FROM li, preds GROUP BY 1)
        |SELECT e.pred_id, e.lo, e.hi, e.est_rows, a.actual_rows,
        |  (1000 * abs(e.est_rows - a.actual_rows))
        |    // greatest(a.actual_rows, 1) AS abs_err_pm
        |FROM est e JOIN act a USING (pred_id)
        |ORDER BY pred_id""".stripMargin,

    // HLL with scaled-integer harmonic sum: register term = round-up
    // power of two of the 24-bit rank window, min per bucket, one IEEE
    // division at the very end
    "q248_distinct_hll_md5" ->
      """WITH h AS (SELECT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |      AS h
        |  FROM events),
        |t AS (SELECT event_type, h // 16777216 AS bucket,
        |    h % 16777216 AS w FROM h),
        |t2 AS (SELECT event_type, bucket,
        |    ((w | (w >> 1) | (w >> 2) | (w >> 4) | (w >> 8) | (w >> 16))
        |      + 1) AS term
        |  FROM t),
        |reg AS (SELECT event_type, bucket, min(term) AS t FROM t2
        |  GROUP BY 1, 2),
        |agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hit,
        |    CAST(sum(t) AS BIGINT) AS s_present FROM reg GROUP BY 1),
        |ex AS (SELECT event_type,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
        |  FROM events GROUP BY 1)
        |SELECT a.event_type, a.n_hit,
        |  CAST(256 - a.n_hit AS BIGINT) AS v_zero,
        |  CAST(a.s_present + (256 - a.n_hit) * 33554432 AS BIGINT)
        |    AS s_scaled,
        |  0.7213 / (1.0 + 1.079 / 256.0) * 2199023255552.0
        |    / CAST(a.s_present + (256 - a.n_hit) * 33554432 AS DOUBLE)
        |    AS est_raw,
        |  ex.exact_users
        |FROM agg a JOIN ex USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // join-size estimate: per-type KMV sketches → pair union sketch (rank
    // truncation) → correlated-sampling Σ aᵤ·bᵤ over the ≤64 sampled keys,
    // scaled by the q127 distinct estimator; exact self-join as readout
    "q241_join_size_estimate" ->
      """WITH cnt AS (SELECT event_type, user_id,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |uh AS (SELECT user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |      AS h
        |  FROM (SELECT DISTINCT user_id FROM events)),
        |dd AS (SELECT DISTINCT t.event_type, u.h
        |  FROM (SELECT DISTINCT event_type, user_id FROM events) t
        |  JOIN uh u USING (user_id)),
        |sk AS (SELECT event_type, h FROM (
        |    SELECT event_type, h,
        |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |    FROM dd) WHERE rn <= 64),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |pairs AS (SELECT a.event_type AS ta, b.event_type AS tb
        |  FROM ty a JOIN ty b ON a.event_type < b.event_type),
        |bo AS (SELECT DISTINCT ta, tb, h FROM (
        |    SELECT p.ta, p.tb, s.h FROM pairs p
        |      JOIN sk s ON s.event_type = p.ta
        |    UNION ALL
        |    SELECT p.ta, p.tb, s.h FROM pairs p
        |      JOIN sk s ON s.event_type = p.tb)),
        |uni AS (SELECT ta, tb, h FROM (
        |    SELECT ta, tb, h,
        |      row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
        |    FROM bo) WHERE rn <= 64),
        |ust AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS k_used,
        |    max(h) AS kth_hash
        |  FROM uni GROUP BY 1, 2),
        |dt AS (SELECT u.ta, u.tb, CAST(sum(a.c * b.c) AS BIGINT)
        |      AS sample_dot
        |  FROM uni u JOIN uh x ON x.h = u.h
        |  JOIN cnt a ON a.event_type = u.ta AND a.user_id = x.user_id
        |  JOIN cnt b ON b.event_type = u.tb AND b.user_id = x.user_id
        |  GROUP BY 1, 2),
        |ex AS (SELECT x.event_type AS ta, y.event_type AS tb,
        |    CAST(sum(x.c * y.c) AS BIGINT) AS exact_join
        |  FROM cnt x JOIN cnt y ON x.user_id = y.user_id
        |    AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT u.ta, u.tb, u.k_used, u.kth_hash,
        |  CASE WHEN u.k_used < 64 THEN CAST(u.k_used AS DOUBLE)
        |       ELSE CAST(270582939648 AS DOUBLE) / u.kth_hash END
        |    AS est_union,
        |  CAST(coalesce(dt.sample_dot, 0) AS BIGINT) AS sample_dot,
        |  (CASE WHEN u.k_used < 64 THEN CAST(u.k_used AS DOUBLE)
        |        ELSE CAST(270582939648 AS DOUBLE) / u.kth_hash END)
        |    * CAST(coalesce(dt.sample_dot, 0) AS DOUBLE)
        |    / CAST(u.k_used AS DOUBLE) AS est_join,
        |  CAST(coalesce(ex.exact_join, 0) AS BIGINT) AS exact_join
        |FROM ust u LEFT JOIN dt USING (ta, tb) LEFT JOIN ex USING (ta, tb)
        |ORDER BY ta, tb""".stripMargin,

    // sliding distinct: hourly k-min sketches → +0/1/2 window membership
    // → re-sketch per window (the merge theorem again), exact countDistinct
    // readout over the same exploded membership
    "q140_distinct_sliding" ->
      """WITH ev AS (
        |  SELECT event_type, user_id,
        |    epoch_us(ts) // 3600000000 AS hr,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |      AS h
        |  FROM events),
        |dd AS (SELECT DISTINCT event_type, hr, h FROM ev),
        |r1 AS (SELECT event_type, hr, h, row_number() OVER (
        |    PARTITION BY event_type, hr ORDER BY h) AS rn FROM dd),
        |hourly AS (SELECT event_type, hr, h FROM r1 WHERE rn <= 64),
        |mem AS (SELECT event_type, hr + unnest([0, 1, 2]) AS win_end, h
        |  FROM hourly),
        |md AS (SELECT DISTINCT event_type, win_end, h FROM mem),
        |r2 AS (SELECT event_type, win_end, h, row_number() OVER (
        |    PARTITION BY event_type, win_end ORDER BY h) AS rn FROM md),
        |sk AS (SELECT event_type, win_end,
        |    CAST(count(*) AS BIGINT) AS n_hashes, max(h) AS kth_hash
        |  FROM r2 WHERE rn <= 64 GROUP BY event_type, win_end),
        |exm AS (SELECT DISTINCT event_type,
        |    hr + unnest([0, 1, 2]) AS win_end, user_id FROM ev),
        |ex AS (SELECT event_type, win_end,
        |    CAST(count(*) AS BIGINT) AS exact_users
        |  FROM exm GROUP BY event_type, win_end)
        |SELECT sk.event_type, sk.win_end, sk.n_hashes, sk.kth_hash,
        |  CASE WHEN sk.n_hashes < 64 THEN CAST(sk.n_hashes AS DOUBLE)
        |       ELSE CAST(270582939648 AS DOUBLE) / sk.kth_hash END
        |    AS est_users,
        |  ex.exact_users
        |FROM sk JOIN ex USING (event_type, win_end)
        |ORDER BY sk.event_type, sk.win_end""".stripMargin,

    // KMV set ops recomputed from raw events: per-type k-min sketches,
    // pairwise union with max()-merged membership flags, k-smallest
    // truncation, then the estimate arithmetic mirrored op-for-op
    // ((k−1)·2³² = 270582939648; division-then-multiply order preserved)
    "q132_distinct_set_ops" ->
      """WITH h0 AS (
        |  SELECT DISTINCT event_type AS g,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |      AS h
        |  FROM events),
        |r AS (SELECT g, h,
        |    row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h0),
        |sk AS (SELECT g, h FROM r WHERE rn <= 64),
        |tp AS (SELECT a.g AS ta, b.g AS tb
        |  FROM (SELECT DISTINCT g FROM sk) a
        |  JOIN (SELECT DISTINCT g FROM sk) b ON a.g < b.g),
        |u0 AS (
        |  SELECT tp.ta, tp.tb, sk.h, 1 AS in_a, 0 AS in_b
        |  FROM tp JOIN sk ON sk.g = tp.ta
        |  UNION ALL
        |  SELECT tp.ta, tp.tb, sk.h, 0 AS in_a, 1 AS in_b
        |  FROM tp JOIN sk ON sk.g = tp.tb),
        |u AS (SELECT ta, tb, h, max(in_a) AS in_a, max(in_b) AS in_b
        |  FROM u0 GROUP BY ta, tb, h),
        |uk AS (SELECT *, row_number() OVER (
        |    PARTITION BY ta, tb ORDER BY h) AS rn FROM u),
        |st AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_union_sk,
        |    max(h) AS kth_hash,
        |    CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_common
        |  FROM uk WHERE rn <= 64 GROUP BY ta, tb),
        |ud AS (SELECT DISTINCT event_type, user_id FROM events),
        |ex AS (SELECT p.event_type AS ta, q.event_type AS tb,
        |    CAST(count(*) AS BIGINT) AS exact_inter
        |  FROM ud p JOIN ud q ON p.user_id = q.user_id
        |    AND p.event_type < q.event_type
        |  GROUP BY p.event_type, q.event_type)
        |SELECT st.ta, st.tb, st.n_union_sk, st.kth_hash, st.n_common,
        |  CASE WHEN st.n_union_sk < 64 THEN CAST(st.n_union_sk AS DOUBLE)
        |       ELSE CAST(270582939648 AS DOUBLE) / st.kth_hash END
        |    AS est_union,
        |  CAST(st.n_common AS DOUBLE) / st.n_union_sk AS est_jaccard,
        |  (CAST(st.n_common AS DOUBLE) / st.n_union_sk) *
        |    (CASE WHEN st.n_union_sk < 64 THEN CAST(st.n_union_sk AS DOUBLE)
        |          ELSE CAST(270582939648 AS DOUBLE) / st.kth_hash END)
        |    AS est_inter,
        |  COALESCE(ex.exact_inter, 0) AS exact_inter
        |FROM st LEFT JOIN ex ON st.ta = ex.ta AND st.tb = ex.tb
        |ORDER BY st.ta, st.tb""".stripMargin,

    // count-min recomputed directly from raw events (no hourly stage —
    // counter addition is the merge): salted md5 row hashes, min over the
    // d probed counters with absent cells reading 0; top-10 keys by
    // (exact desc, user_id)
    "q144_freq_cm_rollup" ->
      """WITH cells AS (
        |  SELECT t.r,
        |    ('0x' || substr(md5(CAST(t.r AS VARCHAR) || ':' ||
        |      CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 512 AS c,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events CROSS JOIN range(0, 4) AS t(r)
        |  GROUP BY t.r, c),
        |ex AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
        |  FROM events GROUP BY user_id),
        |top AS (SELECT user_id, exact_cnt FROM ex
        |  ORDER BY exact_cnt DESC, user_id LIMIT 10),
        |probe AS (
        |  SELECT top.user_id, top.exact_cnt, u.r,
        |    ('0x' || substr(md5(CAST(u.r AS VARCHAR) || ':' ||
        |      CAST(top.user_id AS VARCHAR)), 1, 8))::BIGINT % 512 AS c
        |  FROM top CROSS JOIN range(0, 4) AS u(r))
        |SELECT p.user_id,
        |  min(COALESCE(cells.cnt, 0)) AS est_cnt, p.exact_cnt
        |FROM probe p LEFT JOIN cells ON cells.r = p.r AND cells.c = p.c
        |GROUP BY p.user_id, p.exact_cnt
        |ORDER BY p.user_id""".stripMargin,

    // direct histogram (no monthly stage): exact-cents bins, integer
    // target ranks ⌈p·N/100⌉, pinned interpolation mirrored paren-for-
    // paren; window sums CAST back from HUGEINT (the q91 rule)
    "q128_percentile_rollup" ->
      """WITH b AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      // 100000 AS bin
        |  FROM lineitem),
        |h AS (
        |  SELECT flag, bin, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY flag, bin),
        |c AS (
        |  SELECT flag, bin, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY flag) AS BIGINT) AS n
        |  FROM h),
        |c2 AS (
        |  SELECT flag, bin, cnt, cum, n, cum - cnt AS cum_below FROM c),
        |t AS (SELECT DISTINCT flag, n FROM c2),
        |tp AS (SELECT flag, n, unnest([50, 95, 99]) AS p FROM t),
        |tg AS (SELECT flag, p, (p * n + 99) // 100 AS target FROM tp)
        |SELECT c2.flag, tg.p, tg.target, c2.bin, c2.cnt AS bin_count,
        |  (CAST(c2.bin * 100000 AS DOUBLE)
        |    + 100000.0 * (CAST(tg.target - c2.cum_below AS DOUBLE) / c2.cnt))
        |    / 100.0 AS est_value
        |FROM tg JOIN c2 ON tg.flag = c2.flag
        |  AND c2.cum_below < tg.target AND c2.cum >= tg.target
        |ORDER BY c2.flag, tg.p""".stripMargin,
  )
}

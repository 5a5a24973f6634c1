package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING on Spark — the full loop whose
  * single first iteration is the oracled q99: repeatedly find the most
  * frequent adjacent symbol pair over the corpus and merge it, producing
  * the ordered merge table that IS a BPE tokenizer.
  *
  * Scale shape (the standard tokenizer-training decomposition):
  *  - the corpus is touched ONCE — everything folds to the distinct-word
  *    frequency table first (Heaps' law keeps it sublinear in corpus
  *    size), and every training iteration runs over that table only;
  *  - per iteration: one partial-agg pair count (adjacent-pair explode →
  *    groupBy → top-1 by (count DESC, pair ASC) — a deterministic total
  *    order) and one per-word kernel application
  *    ([[graft.plans.BpeMergePair]], native: left-to-right
  *    non-overlapping, the reference greedy semantics);
  *  - the evolving (word, freq, syms) state is eagerly local-checkpointed
  *    per generation (see the note in [[train]]: a plain persist leaves
  *    the logical lineage in place and the optimizer doubles the inlined
  *    merge-kernel tree per iteration), so the plan never nests;
  *    superseded generations are dropped by the ContextCleaner;
  *  - the merge table itself is driver-sized by definition (nMerges
  *    rows), like [[IvfStorage]]'s centroid table.
  *
  * [[tokenize]] is the matching ENCODE path: character-split then fold
  * the merge table in rank order — usable directly in token-counting /
  * vocab-coverage pipelines (q46/q94 shapes) with the trained vocabulary.
  * Training↔reference equivalence is spec-pinned (BpeTrainerSpec, vs an
  * independent Scala implementation on the classic low/lower/newest/widest
  * corpus); q99 stays the cross-engine ORACLE for the counting core.
  */
object BpeTrainer {

  /** Ordered merge table: merges(i) was learned at rank i. */
  final case class MergeTable(merges: Seq[(String, String)])

  private def charsOf(c: Column): Column =
    // empty-string guard: ANSI sequence(1, 0) DESCENDS to [1, 0] (the
    // TextFunctions.shingles gotcha) — an unguarded empty word would
    // char-split to two phantom "" symbols on the public tokenize path
    when(length(c) < 1, expr("array()").cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(c)), i => c.substr(i, lit(1))))

  /** Train `nMerges` merges over the corpus's whitespace words (the
    * [[TextFunctions.tokens]] convention, empty/1-char words carry no
    * pairs and drop out naturally). Stops early when no adjacent pair
    * occurs at least `minCount` times. */
  def train(docs: DataFrame, nMerges: Int, minCount: Long = 2L): MergeTable = {
    // localCheckpoint per generation, NOT persist: a persist keeps the
    // logical lineage, and the optimizer inlines each generation's
    // bpe_merge_pair into BOTH of the next generation's slice() references
    // (the CollapseProject duplication gotcha) — the expression tree
    // doubles per iteration and a 20-merge run OOMs building plan strings
    // before executing anything. Eager localCheckpoint truncates the plan
    // at materialized blocks; superseded generations are released by the
    // ContextCleaner as their references drop. A cluster deployment that
    // must survive executor loss swaps in reliable checkpoints, the same
    // trade [[ConnectedComponents.ReliableCheckpoints]] documents.
    var words = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 2)
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .select(col("freq"), charsOf(col("tok")).as("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var it = 0
    while (it < nMerges && !done) {
      // tie-break NOTE: (cnt DESC, l, r) compares l/r in Spark's UTF8String
      // order — byte-wise over UTF-8, i.e. CODE-POINT order. The spec's JVM
      // reference (BpeTrainerSpec sortBy on java.lang.String) compares
      // UTF-16 code UNITS; the two orders agree on all of the BMP but
      // diverge for supplementary-plane symbols (surrogate pairs sort
      // above U+E000..U+FFFF in UTF-16, below them in code-point order).
      // The engine's CONTRACT is byte-wise UTF-8; the spec corpus is ASCII
      // where both agree.
      val top = words
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getAs[Long]("cnt") < minCount) done = true
      else {
        val (l, r) = (top.head.getAs[String]("l"), top.head.getAs[String]("r"))
        merges += ((l, r))
        words = words.select(col("freq"),
            call_function("bpe_merge_pair", col("syms"), lit(l), lit(r))
              .as("syms"))
          .localCheckpoint(true)
        it += 1
      }
    }
    MergeTable(merges.result())
  }

  /** [[train]] with BATCHED passes: several merges learned per pair-count
    * job, EXACTLY reproducing the sequential merge table (spec-pinned on
    * the classic corpus and property-tested on randomized ones). `train`
    * costs 2 Spark jobs per merge — ~64k jobs for a real 32k-merge
    * vocabulary, days of scheduler overhead even with flat per-job cost;
    * this variant costs 2 jobs per PASS and typically learns tens of
    * merges per pass.
    *
    * Why a batch can be exact (the competitor argument): from one count
    * snapshot, take candidates in (cnt DESC, l, r) order — sequential's
    * total order — and keep a PREFIX p_1..p_m of mutually NON-INTERACTING
    * pairs (symmetric check over each side's symbols AND its product
    * string l||r). At sequential step i (p_1..p_{i-1} applied):
    *
    *  - p_i itself is frozen at c_i — none of its symbols were touched;
    *  - any pair q sharing no symbol/product with p_1..p_{i-1} is frozen
    *    too, and sits after p_i in the snapshot order, so it loses;
    *  - a pair q that DOES interact can have shrunk (consumed
    *    occurrences) or GROWN: merging (a,b)→ab creates occurrences of
    *    (x,ab)/(ab,y) — but every created adjacency maps injectively to a
    *    pre-merge adjacency ((x,a) resp. (b,y), or for product-product
    *    pairs (r_j,l_k) and mixed forms), so its post-count is bounded by
    *    the SNAPSHOT counts of those preimages plus its own.
    *
    * So p_i is still sequential's argmax as long as c_i strictly exceeds
    * every such computable ceiling; the selection stops at the first
    * candidate that interacts or whose count does not clear the current
    * ceiling (stopping, never skipping — an interactor's count may have
    * moved, so sequential might choose it next). Counts are collected to
    * the driver as the top `topN` rows; anything below that cutoff is
    * bounded by the cutoff count (ceilings use `cutoff` for unseen
    * lookups, and candidates must clear `4 × cutoff` — pre-existing +
    * up to three preimage terms — before uncollected pairs are ruled
    * out). Ceilings ignore the lex tie-break (a tie rejects), trading
    * batch size for safety, never exactness.
    *
    * `exact = true` (default) buys bit-identical tables at a measured
    * ~2× job reduction — tie-heavy count distributions keep provable
    * batches small. `exact = false` is the standard APPROXIMATE batched
    * variant public distributed-BPE implementations use: admit up to
    * `maxBatch` pairwise-non-interacting pairs per pass, SKIPPING
    * interactors instead of stopping at them and dropping the ceiling
    * check. The learned table can locally reorder relative to the
    * sequential one (a merge admitted from the snapshot when sequential
    * would first have taken a pair the batch just created), but every
    * merge still came from a real count snapshot with cnt ≥ minCount,
    * output is deterministic, and the job count drops to
    * ~2·nMerges/maxBatch — the regime that makes a 32k-merge vocabulary
    * ~1k jobs instead of 64k. */
  def trainBatched(docs: DataFrame, nMerges: Int, minCount: Long = 2L,
      maxBatch: Int = 64, topN: Int = 8192,
      exact: Boolean = true): MergeTable =
    trainBatchedWithStats(docs, nMerges, minCount, maxBatch, topN, exact)._1

  /** [[trainBatched]] plus the per-pass batch sizes (sum = merges
    * learned; length = passes = half the job count) for scale
    * accounting. */
  def trainBatchedWithStats(docs: DataFrame, nMerges: Int,
      minCount: Long = 2L, maxBatch: Int = 64,
      topN: Int = 8192, exact: Boolean = true): (MergeTable, Seq[Int]) = {
    require(maxBatch >= 1 && topN >= maxBatch,
      s"maxBatch=$maxBatch topN=$topN")
    var words = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 2)
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .select(col("freq"), charsOf(col("tok")).as("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    val batchSizes = Seq.newBuilder[Int]
    var learned = 0
    var done = false
    while (learned < nMerges && !done) {
      val top = words
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(topN).collect()
        .map(r => (r.getAs[String]("l"), r.getAs[String]("r"),
          r.getAs[Long]("cnt")))
      if (top.isEmpty || top.head._3 < minCount) done = true
      else {
        val cnt: Map[(String, String), Long] =
          top.map { case (l, r, c) => (l, r) -> c }.toMap
        // pairs below the collected horizon exist only if the collect
        // filled up; their counts are then bounded by the smallest
        // collected count
        val cutoff = if (top.length == topN) top.last._3 else 0L
        def lookup(l: String, r: String): Long =
          cnt.getOrElse((l, r), cutoff)
        val selected = scala.collection.mutable.ArrayBuffer
          .empty[(String, String)]
        // ceiling on the post-application count of every pair the batch
        // so far could have changed or created (see scaladoc); grows as
        // merges are admitted
        var ceiling = 4L * cutoff
        var stop = false
        var i = 0
        while (!stop && i < top.length &&
            selected.size < math.min(maxBatch, nMerges - learned)) {
          val (l, r, c) = top(i)
          val prod = l + r
          val interacts = selected.exists { case (sl, sr) =>
            val sSyms = Set(sl, sr, sl + sr)
            sSyms.contains(l) || sSyms.contains(r) || sSyms.contains(prod)
          }
          if (c < minCount) stop = true
          else if (interacts) {
            // exact: an interactor's count may have moved, so sequential
            // might choose it next — the provable prefix ends here.
            // approximate: skip it; the recount next pass reconsiders it
            if (exact) stop = true else i += 1
          } else if (exact && selected.nonEmpty && c <= ceiling)
            stop = true
          else if (!exact) {
            selected += ((l, r))
            i += 1
          } else {
            // threats opened by admitting (l, r): creations of (x, prod)
            // bounded by c(x, l) [+ any pre-existing (x, prod)], of
            // (prod, y) by c(r, y) [+ (prod, y)], and product-product
            // pairs with every earlier admitted merge
            var t = ceiling
            top.foreach { case (x, y, cxy) =>
              // q=(x, prod): preimages (x, l) and any pre-existing
              // (x, prod) — catch the threat from whichever side is
              // collected (the other side's lookup upper-bounds at the
              // cutoff); symmetrically for q=(prod, y)
              if (y == l) t = math.max(t, cxy + lookup(x, prod))
              if (y == prod) t = math.max(t, cxy + lookup(x, l))
              if (x == r) t = math.max(t, cxy + lookup(prod, y))
              if (x == prod) t = math.max(t, cxy + lookup(r, y))
            }
            selected.foreach { case (sl, sr) =>
              val sProd = sl + sr
              t = math.max(t, lookup(prod, sProd) + lookup(r, sl) +
                lookup(r, sProd) + lookup(prod, sl))
              t = math.max(t, lookup(sProd, prod) + lookup(sr, l) +
                lookup(sr, prod) + lookup(sProd, l))
            }
            t = math.max(t, lookup(prod, prod) + lookup(r, l) +
              lookup(r, prod) + lookup(prod, l))
            selected += ((l, r))
            ceiling = t
            i += 1
          }
        }
        merges ++= selected
        learned += selected.size
        batchSizes += selected.size
        words = words.select(col("freq"),
            selected.foldLeft(col("syms")) { case (sy, (l, r)) =>
              call_function("bpe_merge_pair", sy, lit(l), lit(r))
            }.as("syms"))
          .localCheckpoint(true)
      }
    }
    (MergeTable(merges.result()), batchSizes.result())
  }

  /** Encode: split a word column into characters and fold the merge table
    * in rank order — nMerges chained [[graft.plans.BpeMergePair]] calls,
    * each a native codegen kernel. Fine for SMALL tables (tests, the q100
    * fixed table); a real 32k-merge vocabulary means a 32k-deep expression
    * tree that breaks analysis/codegen long before it runs — corpus encode
    * at that scale goes through [[tokenizeViaDictionary]]. */
  def tokenize(word: Column, table: MergeTable): Column =
    table.merges.foldLeft(charsOf(word)) { case (c, (l, r)) =>
      call_function("bpe_merge_pair", c, lit(l), lit(r))
    }

  /** Fold the merge table over a `symsCol: array<string>` column in rank
    * order, `batch` kernel calls per GENERATION with an eager
    * localCheckpoint between generations — the plan never carries more
    * than `batch` chained [[graft.plans.BpeMergePair]] calls, so a 32k-
    * merge vocabulary is ~500 shallow generations instead of one 32k-deep
    * expression tree (which dies in analysis — and, per the [[train]]
    * note, would double under CollapseProject at any shared reference).
    * Exactly [[tokenize]]'s semantics: merge k is applied to the WHOLE
    * symbol sequence (left-to-right, non-overlapping) before merge k+1,
    * for ANY merge table — no consistency assumption. */
  def applyMerges(words: DataFrame, symsCol: String, table: MergeTable,
      batch: Int = 64): DataFrame = {
    require(batch >= 1, s"batch must be ≥ 1: $batch")
    val generations = table.merges.grouped(batch).toSeq
    generations.zipWithIndex.foldLeft(words) { case (df, (gen, i)) =>
      val applied = df.withColumn(symsCol,
        gen.foldLeft(col(symsCol)) { case (c, (l, r)) =>
          call_function("bpe_merge_pair", c, lit(l), lit(r))
        })
      // the LAST generation stays lazy — callers decide materialization
      if (i < generations.size - 1) applied.localCheckpoint(true) else applied
    }
  }

  /** Corpus ENCODE at vocabulary scale — the dictionary-join decomposition
    * (the same distinct-word collapse [[train]] and q99 use, Heaps' law
    * keeping the dictionary sublinear in corpus size):
    *
    *  1. distinct words → character split → [[applyMerges]] (bounded-depth
    *     batched fold), materialized ONCE as the (tok → syms) dictionary —
    *     per-word encode cost is paid per DISTINCT word, not per
    *     occurrence, and the checkpoint gives the join real size stats
    *     (a Heaps-sized dictionary broadcast-joins while it fits, falls
    *     back to shuffle when it outgrows the threshold — the optimizer
    *     decides from measured bytes, not a guess);
    *  2. posexplode the corpus's words (position kept), equi-join the
    *     dictionary on the word, and reassemble each document's symbol
    *     stream in order (array_sort on the (pos, syms) structs → flatten
    *     — the [[IvfStorage.labelCentroids]] collect_list shape).
    *
    * Input needs (doc_id, text); null-text rows are dropped (the q95
    * convention). Output: (doc_id, bpe: array<string>) — the document's
    * BPE token sequence under `table`, row-equal to folding [[tokenize]]
    * over every word in place (spec-pinned, BpeTrainerSpec) at a per-word
    * cost independent of document length. Oracled end-to-end as q100
    * against DuckDB's recursive-CTE merge fold. */
  def tokenizeViaDictionary(docs: DataFrame, table: MergeTable,
      batch: Int = 64): DataFrame = {
    val live = docs.filter(col("text").isNotNull)
    val dict = applyMerges(
      live.select(explode(TextFunctions.tokens(col("text"))).as("tok"))
        .distinct()
        .select(col("tok"), charsOf(col("tok")).as("syms")),
      "syms", table, batch)
      .localCheckpoint(true)
    live
      .select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
      .join(dict, "tok")
      .groupBy("doc_id")
      .agg(expr(
        "flatten(transform(array_sort(collect_list(struct(pos, syms))), s -> s.syms))")
        .as("bpe"))
  }
}

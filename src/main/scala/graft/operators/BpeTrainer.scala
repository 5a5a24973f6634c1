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

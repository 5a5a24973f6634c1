package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-snapshot INCREMENTAL duplicated-span removal — the ingest-path
  * complement to [[CorpusOps.removeDuplicatedSpans]] (q109, the Lee et
  * al. ExactSubstr rewrite): the corpus's k-shingle OWNERSHIP is stored
  * once as a lake (one row per distinct shingle: its min-doc_id owner),
  * and each new ingest wave cleans itself by PROBING that lake instead
  * of re-shingling history — the q82 no-recompute economics applied at
  * span granularity.
  *
  * Removal rule per new-doc shingle occurrence (exactly q109's min-id
  * ownership, factored across snapshots):
  *  - the shingle exists in the index → the corpus owns it; every new
  *    occurrence's k positions are cut;
  *  - else it is batch-only: the minimum new doc_id owns it, other new
  *    docs cut it (nd > 1 across distinct docs — within-doc repeats of a
  *    doc's own shingle survive, q109's rule).
  * Under monotonic doc_ids (appends always are), this is ROW-IDENTICAL
  * to running q109 over (corpus ∪ batch) and keeping the batch's rows —
  * spec-pinned in SpanIndexSpec, two waves deep.
  *
  * Scale shape: the probe joins the index lake against the BATCH's
  * shingles — the batch side is small and broadcastable, so the probe is
  * ONE map-side pass over the index (rows = distinct corpus shingles,
  * Heaps-sublinear in corpus text) and history text is never re-read,
  * vs q109's full re-shingle per run. [[extend]] appends only the
  * batch's genuinely-new shingles into the md5-bucketed layout (the
  * [[PostingsIndex]] write discipline — pure-function append, bucket
  * count frozen at creation; small per-wave files are
  * [[graft.etl.LakeCompaction]]'s case). The rebuild stage is q109's:
  * bounded ×k position explode, one anti-join, one per-doc regroup.
  */
object SpanIndex {

  private def shingled(docs: DataFrame, idCol: String, k: Int): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col(idCol), TextFunctions.tokens(col("text")).as("toks"))
      .select(col(idCol),
        posexplode(call_function("word_shingles", col("toks"), lit(k))))
      .select(col(idCol), (col("pos") + 1).as("pos"), col("col").as("sh"))

  /** The index DERIVATION: one row per distinct corpus k-shingle with
    * its min-`idCol` owner. (sh, owner). */
  def fromCorpus(docs: DataFrame, idCol: String, k: Int = 5): DataFrame =
    shingled(docs, idCol, k)
      .groupBy("sh").agg(min(col(idCol)).as("owner"))

  /** Materialize an index to `dir`, partitioned by md5 hash bucket
    * (frozen at creation — [[extend]] reuses it; the PostingsIndex
    * convention). */
  def write(index: DataFrame, dir: String, buckets: Int = 64): Unit = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    index
      .withColumn("bucket",
        pmod(call_function("md5_prefix32", col("sh")), lit(buckets.toLong))
          .cast("int"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).select("sh", "owner")

  /** Clean `newDocs` against an existing index (see the class-doc rule).
    * Output is q109's shape for the new docs only:
    * (idCol, n_tokens, n_removed, cleaned_text). */
  def cleanAgainst(index: DataFrame, newDocs: DataFrame, idCol: String,
      k: Int = 5): DataFrame = {
    val base = newDocs.filter(col("text").isNotNull)
      .select(col(idCol), TextFunctions.tokens(col("text")).as("toks"))
    val sh = base
      .select(col(idCol),
        posexplode(call_function("word_shingles", col("toks"), lit(k))))
      .select(col(idCol), (col("pos") + 1).as("pos"), col("col").as("sh"))
    // per-shingle verdict for THIS batch: corpus owner (if indexed) +
    // in-batch min-id owner and distinct-doc count
    val verdict = sh.groupBy("sh")
      .agg(min(col(idCol)).as("bowner"),
        count_distinct(col(idCol)).as("nd"))
      .join(index.select(col("sh"), col("owner")), Seq("sh"), "left")
    val dropPos = sh.join(verdict, "sh")
      .filter(col("owner").isNotNull ||
        (col("nd") > 1 && col(idCol) =!= col("bowner")))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tk"))
      .distinct()
    val toks = base
      .select(col(idCol), posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col(idCol), (col("p0") + 1).as("tk"), col("tok"))
    val rebuilt = toks.join(dropPos, Seq(idCol, "tk"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(tk, tok))), s -> s.tok)"))
          .as("cleaned"))
    base.select(col(idCol), size(col("toks")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned_text"))
  }

  /** The batch's contribution to the index: its distinct shingles that
    * are NOT yet indexed, owned by their min new doc_id. (Shingles the
    * corpus already owns keep their original owner — first writer wins,
    * which is what min-id ownership degenerates to under monotonic
    * ids.) */
  def delta(index: DataFrame, newDocs: DataFrame, idCol: String,
      k: Int = 5): DataFrame =
    fromCorpus(newDocs, idCol, k)
      .join(index.select("sh"), Seq("sh"), "left_anti")

  /** Append a new wave's [[delta]] into the stored layout. `buckets`
    * must equal the creation-time bucket count (frozen layout — the
    * PostingsIndex append contract). */
  def extend(spark: SparkSession, dir: String, newDocs: DataFrame,
      idCol: String, k: Int = 5, buckets: Int = 64): Unit =
    delta(read(spark, dir), newDocs, idCol, k)
      .withColumn("bucket",
        pmod(call_function("md5_prefix32", col("sh")), lit(buckets.toLong))
          .cast("int"))
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(dir)
}

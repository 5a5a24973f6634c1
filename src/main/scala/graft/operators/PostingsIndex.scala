package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-time inverted index for the retrieval family — the text twin of
  * [[AnnStorage]]/[[IvfStorage]]: q105 computes postings INLINE (explode
  * the whole corpus per query batch); a real retrieval deployment builds
  * the postings once and prunes the scan to the queried terms' partitions.
  *
  * Layout: `postings/` partitioned by `bucket = pmod(xxhash64(tok), nBuckets)`
  * with rows (tok, doc_id, tf) — term lookups touch only their hash
  * bucket's directory (PartitionFilters, measured in PostingsIndexSpec);
  * `doclen/` holds (doc_id, dl) and `stats/` the exact BIGINT corpus
  * totals (n_docs, sum_dl) — avgdl is DERIVED at query time with q105's
  * exact double-op order, never stored, so indexed scoring is
  * bit-identical to inline scoring.
  *
  * Scale shape: the build is one explode + one (doc_id, tok) partial-agg
  * groupBy — the same shuffle q105 pays ONCE, amortized over every later
  * query; the query side reads |terms| buckets (≈ |terms|/nBuckets of the
  * postings bytes), one broadcast of the per-term df counts, and one
  * doc-keyed join against doclen. Index maintenance under append follows
  * the [[AnnStorage.appendSigBucketed]] argument: bucket assignment is a
  * pure function of the term, so appended postings land in the same
  * directories a full rewrite would produce.
  */
object PostingsIndex {

  /** Build the index under `dir`: POSITIONAL postings (bucketed; tf plus
    * the sorted in-doc position list — phrase/proximity queries need
    * positions, and storing them costs one int per token occurrence,
    * the Lucene default), doclen, stats. */
  def write(docs: DataFrame, idCol: String, dir: String,
      nBuckets: Int = 64): Unit = {
    val exploded = docs.filter(col("text").isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
    val postings = exploded.groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(nBuckets.toLong)))
    postings.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/postings")
    val dl = exploded.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    dl.write.mode("overwrite").parquet(s"$dir/doclen")
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** The positional-alignment core shared by the inline q135 query and
    * the indexed [[phrase]] path: `pos` carries (doc_id, tok, positions
    * sorted); `q` the phrase as (tok, off) rows. Each term's positions
    * shift by −off; docs matching ALL offsets with a non-empty shifted
    * intersection contain the phrase, and the intersection size is the
    * occurrence count (overlapping occurrences count — the Lucene
    * PhraseQuery convention). */
  def alignPhrase(pos: DataFrame, q: DataFrame, phraseLen: Int): DataFrame = {
    val cand = pos.join(q, "tok")
      .select(col("doc_id"), col("off"),
        transform(col("positions"), p => p - col("off")).as("shifted"))
    cand.groupBy("doc_id")
      .agg(count(lit(1)).as("n_off"),
        aggregate(array_sort(collect_list(struct(col("off"), col("shifted")))),
          lit(null).cast("array<int>"),
          (acc, x) => when(acc.isNull, x.getField("shifted"))
            .otherwise(array_intersect(acc, x.getField("shifted"))))
          .as("aligned"))
      .filter(col("n_off") === phraseLen && size(col("aligned")) > 0)
      .select(col("doc_id"),
        size(col("aligned")).cast("long").as("phrase_tf"))
  }

  /** The proximity (NEAR) core shared by the inline q139 query and the
    * indexed [[proximity]] path: docs containing BOTH terms, with the
    * closest co-occurrence distance and the number of position pairs
    * within `w` tokens (any order — NEAR, not phrase). Per-doc cost is
    * |positions(a)|·|positions(b)| — tf-bounded, never corpus-quadratic. */
  def alignProximity(pos: DataFrame, termA: String, termB: String,
      w: Int): DataFrame = {
    val a = pos.filter(col("tok") === termA)
      .select(col("doc_id"), explode(col("positions")).as("pa"))
    val b = pos.filter(col("tok") === termB)
      .select(col("doc_id"), explode(col("positions")).as("pb"))
    a.join(b, "doc_id")
      .groupBy("doc_id")
      .agg(min(abs(col("pa") - col("pb"))).cast("long").as("min_dist"),
        count(when(abs(col("pa") - col("pb")) <= w, 1)).as("n_within"))
      .filter(col("min_dist") <= w)
  }

  /** Proximity lookup over the stored index (bucket-pruned, like
    * [[phrase]]): docs where `termA` and `termB` occur within `w`
    * tokens of each other. */
  def proximity(spark: SparkSession, dir: String, termA: String,
      termB: String, w: Int, nBuckets: Int = 64): DataFrame = {
    import spark.implicits._
    val terms = Seq(termA, termB).distinct
    val buckets = terms.toDF("tok")
      .select(pmod(xxhash64(col("tok")), lit(nBuckets.toLong)).as("b"))
      .collect().map(_.getLong(0)).distinct.toSeq
    val pos = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(buckets: _*) && col("tok").isin(terms: _*))
      .select("doc_id", "tok", "positions")
    alignProximity(pos, termA, termB, w)
  }

  /** Exact-phrase lookup over the stored index: bucket-pruned postings
    * read for the phrase's distinct terms, then [[alignPhrase]] —
    * row-identical to the inline q135 computation (PostingsIndexSpec). */
  def phrase(spark: SparkSession, dir: String, terms: Seq[String],
      nBuckets: Int = 64): DataFrame = {
    require(terms.nonEmpty, "need a non-empty phrase")
    import spark.implicits._
    val buckets = terms.distinct.toDF("tok")
      .select(pmod(xxhash64(col("tok")), lit(nBuckets.toLong)).as("b"))
      .collect().map(_.getLong(0)).distinct.toSeq
    val pos = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(buckets: _*) &&
        col("tok").isin(terms.distinct: _*))
      .select("doc_id", "tok", "positions")
    val q = terms.zipWithIndex.toDF("tok", "off")
    alignPhrase(pos, broadcast(q), terms.length)
  }

  /** BM25 top-k over the stored index — q105's exact formula and fold
    * order (sequential term-sorted contribution sum), with the corpus
    * scan replaced by a bucket-pruned postings read. */
  def bm25(spark: SparkSession, dir: String, terms: Seq[String],
      k: Int, nBuckets: Int = 64): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    import spark.implicits._
    // the terms' buckets, via the same engine hash the writer used (a
    // driver-sized mini-job: |terms| rows)
    val buckets = terms.toDF("tok")
      .select(pmod(xxhash64(col("tok")), lit(nBuckets.toLong)).as("b"))
      .collect().map(_.getLong(0)).distinct.toSeq
    val tf = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(buckets: _*) && col("tok").isin(terms: _*))
      .select("doc_id", "tok", "tf")
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val dl = spark.read.parquet(s"$dir/doclen")
    val stats = spark.read.parquet(s"$dir/stats")
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val contrib = tf.join(broadcast(df), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tok"),
        bm25Contrib(col("tf"), col("df"), col("dl"), col("n_docs"),
          col("avgdl")).as("contrib"))
    contrib.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        bm25Fold(col("tok"), col("contrib")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}

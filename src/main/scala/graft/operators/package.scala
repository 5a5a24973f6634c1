package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

package object operators {

  /** A declared query: (session, scale-factor dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** A group of declared queries plus their DuckDB oracle SQL (subset: ⚙
    * engine-only queries carry no oracle and get a rows-only check).
    */
  trait QueryGroup {
    def queries: Seq[(String, Q)]
    def oracles: Map[String, String]
  }

  /** Order-independent exact sum of a double column.
    *
    * Cross-engine double sums are NOT reproducible (addition order differs per
    * engine/partitioning), so every aggregated money/measure column is cast to
    * an exact DECIMAL first, summed exactly, and only then converted back to
    * double. Both Spark and DuckDB round the ~2-decimal doubles to the same
    * decimal value, and decimal→double conversion is correctly rounded in
    * both, so results are bit-identical regardless of parallelism. The oracle
    * SQL mirrors this: CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE).
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Deterministic mean via exact sum / count (mirrors oracle SQL). */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(c)

  /** Oracle-side fragment for [[dsum]]. */
  def sqlDsum(x: String, scale: Int = 2): String =
    s"CAST(sum(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** [[sqlDsum]] for sums whose SCALED integer value can exceed 2⁵³ (power
    * sums like Σx² in q90): DuckDB's direct DECIMAL→DOUBLE cast
    * double-rounds in that regime (measured: ~25% of values off by one
    * ulp vs the correctly-rounded result Spark's BigDecimal.doubleValue
    * produces), while its VARCHAR→DOUBLE parse is correctly rounded — so
    * the exact decimal goes through its text form. Spark needs no bridge. */
  def sqlDsumBig(x: String, scale: Int = 2): String =
    s"CAST(CAST(sum(CAST($x AS DECIMAL(18,$scale))) AS VARCHAR) AS DOUBLE)"

  /** Oracle-side fragment for [[davg]]. */
  def sqlDavg(x: String, scale: Int = 2): String =
    s"CAST(sum(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE) / count($x)"

  /** Oracle-side exact Jaccard over two DuckDB list expressions:
    * |a∩b| / (|a| + |b| − |a∩b|) on exact ints, divided as double — the
    * single source for the q37/q66/q67 pair-similarity oracles (the same
    * integer-intersection formula SimilarityJoin computes). */
  def sqlJaccard(a: String, b: String): String = {
    val inter = s"len(list_filter($a, x -> list_contains($b, x)))"
    s"CAST($inter AS DOUBLE) / (len($a) + len($b) - $inter)"
  }

  /** Epoch µs of an NTZ timestamp, interpreting it as UTC (session tz) —
    * exactly DuckDB's epoch_us of a naive timestamp. */
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** BM25 per-(doc, term) contribution at the shipped operating point
    * (k1 = 1.2, b = 0.75, rarity in the engine-exact raw-ratio form — no
    * log, the q95/q161 contract). ONE definition shared by q105, q166 and
    * `PostingsIndex.bm25`, so the operating point and the exact double
    * expression (which the oracles mirror operation-for-operation) change
    * in a single place. */
  def bm25Contrib(tf: Column, df: Column, dl: Column, nDocs: Column,
      avgdl: Column): Column =
    (nDocs.cast("double") - df.cast("double") + lit(0.5)) /
      (df.cast("double") + lit(0.5)) *
      ((tf.cast("double") * lit(2.2)) /
        (tf.cast("double") +
          lit(1.2) * (lit(0.25) + lit(0.75) * (dl.cast("double") / avgdl))))

  /** The order-fixed per-doc BM25 score: sequential fold over TERM-SORTED
    * (tok, contrib) structs — the field names and sort are part of the
    * cross-engine contract (DuckDB mirror: list_reduce over
    * list(contrib ORDER BY tok)). */
  def bm25Fold(tok: Column, contrib: Column): Column =
    aggregate(
      array_sort(collect_list(struct(tok.as("tok"), contrib.as("contrib")))),
      lit(0.0), (a, x) => a + x.getField("contrib"))
}

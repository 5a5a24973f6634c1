package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters summary as a typed `Aggregator` — bounded-state
  * frequent-item candidates for streams/corpora whose DISTINCT key count is
  * itself too large to shuffle.
  *
  * Guarantees (the classic MG bounds, preserved under the mergeable-summaries
  * merge of Agarwal et al., PODS'12): after summarizing n items with capacity
  * m, (1) every key with true frequency > n/m is present, and (2) each kept
  * key's counter undercounts its true frequency by at most n/m. The summary
  * CONTENT beyond those guarantees (which light keys survive, exact counter
  * values) depends on partition/merge order and is NOT deterministic — so
  * [[FreqSketch.exactTopK]] never emits sketch counters: the sketch only
  * nominates candidates, and a second exact pass (filtered to candidates —
  * a broadcast semi-join, map-side) recounts and ranks them. Result: the
  * EXACT top-k, computed with per-task state m and a shuffle of at most
  * m·partitions rows, where the direct groupBy top-k must shuffle every
  * distinct key (billions of distinct tokens at web scale). Correct whenever
  * the k-th true frequency exceeds n/m — the regime Zipfian token streams
  * are always in for sane (k, m); FreqSketchSpec pins both bounds and the
  * exact-equality property.
  */
class FreqSketch(m: Int) extends Aggregator[String,
    scala.collection.mutable.Map[String, Long], Map[String, Long]] {
  require(m >= 1, s"capacity must be positive: $m")

  override def zero: scala.collection.mutable.Map[String, Long] =
    scala.collection.mutable.Map.empty

  /** MG insert: known key +1; room → add at 1; full → decrement ALL by one
    * and drop zeros (amortized O(1): total decrement work ≤ total inserts). */
  override def reduce(b: scala.collection.mutable.Map[String, Long],
      tok: String): scala.collection.mutable.Map[String, Long] = {
    if (b.contains(tok)) b(tok) += 1L
    else if (b.size < m) b(tok) = 1L
    else {
      val dead = List.newBuilder[String]
      b.keysIterator.foreach { k =>
        val v = b(k) - 1L
        if (v <= 0L) dead += k else b(k) = v
      }
      dead.result().foreach(b.remove)
    }
    b
  }

  /** Mergeable-summaries merge: sum counts, then (if over capacity) subtract
    * the (m+1)-th largest value from every counter and drop non-positives —
    * keeps the n/m error bound additive across the merge tree. */
  override def merge(a: scala.collection.mutable.Map[String, Long],
      b: scala.collection.mutable.Map[String, Long]): scala.collection.mutable.Map[String, Long] = {
    b.foreach { case (k, v) => a(k) = a.getOrElse(k, 0L) + v }
    if (a.size > m) {
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(m)
      val dead = List.newBuilder[String]
      a.keysIterator.foreach { k =>
        val v = a(k) - cut
        if (v <= 0L) dead += k else a(k) = v
      }
      dead.result().foreach(a.remove)
    }
    a
  }

  override def finish(b: scala.collection.mutable.Map[String, Long]): Map[String, Long] =
    b.toMap

  // buffer is engine-internal → kryo; output must be a REAL map type (the
  // caller explodes map_keys), so it gets an ExpressionEncoder
  override def bufferEncoder: Encoder[scala.collection.mutable.Map[String, Long]] =
    Encoders.kryo[scala.collection.mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object FreqSketch {

  /** Exact top-k via sketch-nominated candidates: one bounded-state sketch
    * pass nominates ≤ m keys, a second pass recounts EXACTLY those (the
    * candidate list broadcasts) and ranks `(count desc, key)`. Equals the
    * direct groupBy top-k whenever the k-th frequency > n/m. */
  def exactTopK(keys: DataFrame, keyCol: String, k: Int, m: Int): DataFrame = {
    val sketch = udaf(new FreqSketch(m), Encoders.STRING)
    val cands = keys.select(col(keyCol).as("key")).na.drop()
      .agg(sketch(col("key")).as("mg"))
      .select(explode(map_keys(col("mg"))).as("key"))
    keys.select(col(keyCol).as("key")).na.drop()
      .join(broadcast(cands), "key")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(k)
      .withColumnRenamed("key", keyCol)
  }
}

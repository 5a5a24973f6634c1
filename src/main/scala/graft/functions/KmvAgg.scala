package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable k-minimum-values buffer as a typed [[Aggregator]]: the k
  * smallest DISTINCT hashes of the inputs, kept as a sorted array.
  *
  * This is the STREAMING form of `KmvSketch.partial` (q127's stored
  * artifact): Structured Streaming keeps one buffer per group and merges
  * partials across micro-batches and shuffle sides, and the KMV merge
  * theorem (the k smallest of a union of k-smallest sets equal the k
  * smallest of the union — Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07)
  * makes that merge loss-free, so a streaming aggregation with this UDAF
  * converges to EXACTLY the batch sketch over the same rows, regardless of
  * batch boundaries. StreamingSketchSpec pins stream ≡ batch; KmvAggSpec
  * pins the buffer algebra against a sort-distinct-take-k reference.
  *
  * Scale shape: per-group state is ≤ k longs and updates are O(log k)
  * lookups + O(k) inserts — the bounded-state discipline every 100 TB
  * streaming aggregation needs (contrast countDistinct, whose state grows
  * with the key universe).
  */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"k must be positive: $k")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert h into the sorted-distinct buffer, capped at the k smallest. */
  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present: DISTINCT semantics
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        // displaces the current maximum; capacity stays k
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf // h exceeds the kth minimum: not in the sketch
    }
  }

  /** Linear merge of two sorted-distinct buffers, capped at k — the KMV
    * merge theorem's operational form. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

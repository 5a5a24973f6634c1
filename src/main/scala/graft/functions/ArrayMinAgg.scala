package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Elementwise-minimum merge of fixed-length integer register arrays —
  * the HyperBall/HyperANF merge operator [Boldi & Vigna 2013] in packed
  * form: one row per node carrying all m registers, so an iteration
  * shuffles |E| array rows instead of |E|·m register rows (the 256×
  * row-count difference that made the exploded q254 formulation 51 s at
  * sf0.1). Min is commutative/associative/idempotent, so the merge is
  * deterministic under any partitioning or merge order.
  */
class ArrayMinAgg(m: Int) extends Aggregator[Array[Int], Array[Int], Array[Int]] {
  require(m > 0, s"m must be positive: $m")

  override def zero: Array[Int] = Array.emptyIntArray

  private def mergeInto(a: Array[Int], b: Array[Int]): Array[Int] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == m && b.length == m,
      s"register arrays must have length $m: ${a.length}, ${b.length}")
    val out = new Array[Int](m)
    var i = 0
    while (i < m) {
      out(i) = math.min(a(i), b(i))
      i += 1
    }
    out
  }

  override def reduce(buf: Array[Int], x: Array[Int]): Array[Int] =
    mergeInto(buf, x)
  override def merge(a: Array[Int], b: Array[Int]): Array[Int] =
    mergeInto(a, b)
  override def finish(r: Array[Int]): Array[Int] = r

  override def bufferEncoder: Encoder[Array[Int]] =
    ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Array[Int]] =
    ExpressionEncoder[Array[Int]]()
}

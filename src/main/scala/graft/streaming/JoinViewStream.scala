package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming JOIN-view IVM under RETRACTIONS — the q264 maintenance
  * algebra run live (the [[RollupStream]] pattern one rung up the IVM
  * ladder): a CDC feed on ONE join side carrying PRE- and POST-images
  * (the Debezium shape) maps each change to its ±signed rows — retract
  * the old image, add the new one — and each signed row stream-static
  * joins the OTHER side's latest stored state at JOIN granularity before
  * a plain streaming aggregation folds the signed join rows into the
  * maintained join+rollup view. Deletes retract every join row their
  * pre-image had; updates that MOVE a key between groups retract from one
  * and add to the other in the same batch; inserted keys that match no
  * right-side rows contribute nothing. Bootstrap is the base table
  * streamed as inserts — the same algebra covers initial build and
  * increments (exactly how the batch twin's stored view decomposes:
  * bootstrap ⋈ O₁ = V(C₀,O₀) + C₀⋈ΔO, deltas ⋈ O₁ = ΔC⋈O₀ + ΔC⋈ΔO).
  *
  * Scale shape: state is GROUP-domain-sized (two numbers per segment) —
  * the join itself is stateless stream-static, so no join state grows
  * with the stream; counts and exact-decimal sums are the abelian group
  * that makes retraction lossless. Groups whose count reaches zero
  * surface as n = 0 rows in complete/update mode; readers drop them (the
  * q258/q264 zero-row rule) — StreamingIvmSpec pins stream ≡ batch q264.
  */
object JoinViewStream {

  /** changes: (c_custkey, old_seg, new_seg) — old_seg null for inserts
    * (no pre-image), new_seg null for deletes (no post-image).
    * rightState: the join side's LATEST stored state as a STATIC frame —
    * (c_custkey, o_totalprice). Returns the running maintained view:
    * (c_mktsegment, n_rows, sum_price DECIMAL) — cast at the consumer. */
  def maintain(changes: DataFrame, rightState: DataFrame): DataFrame =
    changes
      .select(explode(array(
        struct(col("c_custkey"), col("old_seg").as("seg"),
          lit(-1L).as("sgn")),
        struct(col("c_custkey"), col("new_seg").as("seg"),
          lit(1L).as("sgn"))))
        .as("d"))
      .filter(col("d.seg").isNotNull)
      .select(col("d.c_custkey").as("c_custkey"), col("d.seg").as("seg"),
        col("d.sgn").as("sgn"))
      .join(rightState, Seq("c_custkey"))
      .groupBy(col("seg").as("c_mktsegment"))
      .agg(sum(col("sgn")).as("n_rows"),
        sum(col("sgn") * col("o_totalprice").cast(DecimalType(18, 2)))
          .as("sum_price"))
}

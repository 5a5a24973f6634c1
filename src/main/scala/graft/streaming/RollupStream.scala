package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming aggregate IVM under RETRACTIONS — the q258 maintenance
  * algebra run as a live Structured Streaming aggregation: a CDC feed
  * carrying PRE- and POST-images (the Debezium/change-feed shape) maps
  * each change to its ±delta contributions — retract the old image,
  * add the new one — and a plain streaming aggregation over those deltas
  * IS the maintained rollup: per-group state is the running (count,
  * exact-decimal sum) pair, counts and decimal sums being the abelian
  * group that makes subtraction lossless (double sums would not survive
  * a retraction). Updates that MOVE a key between groups retract from
  * one and add to the other in the same batch; deletes retract only;
  * inserts add only. Bootstrap is just the base table streamed as
  * inserts — the same algebra covers initial build and increments.
  *
  * Scale shape: state is GROUP-domain-sized (two numbers per segment),
  * never key-sized — the rollup a 100 TB dashboard actually keeps hot.
  * Groups whose count reaches zero surface as n = 0 rows in update mode;
  * readers drop them (the q258 zero-row rule) — StreamingIvmSpec pins
  * stream ≡ batch q258 including a fully-retracted group.
  */
object RollupStream {

  /** changes: (old_seg, old_bal, new_seg, new_bal) — old_* null for
    * inserts (no pre-image), new_* null for deletes (no post-image).
    * Returns the running per-segment rollup aggregation: (c_mktsegment,
    * n_rows, sum_bal DECIMAL) — cast/round at the consumer. */
  def maintain(changes: DataFrame): DataFrame =
    changes
      .select(explode(array(
        struct(col("old_seg").as("seg"), lit(-1L).as("dn"),
          (-col("old_bal").cast(DecimalType(18, 2))).as("ds")),
        struct(col("new_seg").as("seg"), lit(1L).as("dn"),
          col("new_bal").cast(DecimalType(18, 2)).as("ds"))))
        .as("d"))
      .filter(col("d.seg").isNotNull)
      .select(col("d.seg").as("c_mktsegment"), col("d.dn"), col("d.ds"))
      .groupBy("c_mktsegment")
      .agg(sum(col("dn")).as("n_rows"), sum(col("ds")).as("sum_bal"))

  /** The NON-abelian twin (batch q268): max/min have no inverse, so the
    * maintained state is the per-(group, value) COUNT — counts are
    * abelian, so the same ± algebra applies — and the reader recovers
    * min/max as the extreme value with a surviving positive count (a
    * retraction that kills the current max automatically surfaces the
    * runner-up). Values are exact integer cents; state is
    * value-domain-sized per group (bucket hierarchically past that —
    * the scaladoc on q268). Returns the running (c_mktsegment,
    * bal_cents, n) counts; the consumer filters n > 0 and folds. */
  def maintainValueCounts(changes: DataFrame): DataFrame =
    changes
      .select(explode(array(
        struct(col("old_seg").as("seg"),
          (col("old_bal").cast(DecimalType(18, 2)) * 100).cast("long")
            .as("bal_cents"),
          lit(-1L).as("dn")),
        struct(col("new_seg").as("seg"),
          (col("new_bal").cast(DecimalType(18, 2)) * 100).cast("long")
            .as("bal_cents"),
          lit(1L).as("dn"))))
        .as("d"))
      .filter(col("d.seg").isNotNull)
      .select(col("d.seg").as("c_mktsegment"), col("d.bal_cents"),
        col("d.dn"))
      .groupBy("c_mktsegment", "bal_cents")
      .agg(sum(col("dn")).as("n"))

  /** The WIDE-DOMAIN twin (batch q276): the same ± count algebra at
    * 2^`shift`-cent BUCKET granularity — state is |buckets| per group
    * regardless of the value domain (arithmetic shift = floor division,
    * exact for negative cents). The consumer locates the rank-holding
    * bucket from the streamed counts and drills into the LAKE for the
    * exact value (a batch read by design — the stream never holds base
    * data). Returns the running (c_mktsegment, bucket, n) counts. */
  /** [[maintainBucketCounts]] for LONG-valued WIDE domains — the q281
    * twin: changes carry (old_seg, old_v, new_seg, new_v) pre/post
    * images (seg null marks the absent image, as ever), state is counts
    * per (seg, v >> shift) bucket. At shift 40 the maintained state is
    * coarse-bucket-bounded at ANY domain width; the exact readout is
    * locate + the 256-ary in-bucket refinement
    * ([[graft.functions.ExactSelect.valuesAtRanks]]) against the stored
    * base — StreamingIvmSpec pins the streamed state + refinement ≡
    * batch q281 end to end. */
  def maintainWideBucketCounts(changes: DataFrame,
      shift: Int = 40): DataFrame =
    changes
      .select(explode(array(
        struct(col("old_seg").as("seg"),
          shiftright(col("old_v"), shift).as("bucket"),
          lit(-1L).as("dn")),
        struct(col("new_seg").as("seg"),
          shiftright(col("new_v"), shift).as("bucket"),
          lit(1L).as("dn"))))
        .as("d"))
      .filter(col("d.seg").isNotNull)
      .select(col("d.seg").as("seg"), col("d.bucket"), col("d.dn"))
      .groupBy("seg", "bucket")
      .agg(sum(col("dn")).as("n"))

  def maintainBucketCounts(changes: DataFrame, shift: Int = 13): DataFrame =
    changes
      .select(explode(array(
        struct(col("old_seg").as("seg"),
          shiftright((col("old_bal").cast(DecimalType(18, 2)) * 100)
            .cast("long"), shift).as("bucket"),
          lit(-1L).as("dn")),
        struct(col("new_seg").as("seg"),
          shiftright((col("new_bal").cast(DecimalType(18, 2)) * 100)
            .cast("long"), shift).as("bucket"),
          lit(1L).as("dn"))))
        .as("d"))
      .filter(col("d.seg").isNotNull)
      .select(col("d.seg").as("c_mktsegment"), col("d.bucket"),
        col("d.dn"))
      .groupBy("c_mktsegment", "bucket")
      .agg(sum(col("dn")).as("n"))
}

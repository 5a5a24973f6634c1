package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded interval-overlap self-join — the scale path for "which intervals
  * overlap" (segment alignment, in-transit windows, concurrent sessions)
  * that naive SQL writes as a per-key quadratic theta-join.
  *
  * Algorithm (the q11 band-join idea specialized to intervals): explode
  * each interval to the fixed-width bands it touches and join on
  * (key, band) with the exact overlap predicate applied in-band. Two
  * contracts make it exact and exactly-once:
  *  - `bandWidth` MUST exceed the maximum interval length, so an interval
  *    touches at most 2 bands (explode fan-out ≤ 2 — require()d below via
  *    the caller-supplied bound);
  *  - a pair is emitted ONLY in the band containing the LATER start (that
  *    band lies inside both intervals' spans, so each overlapping pair
  *    surfaces exactly once — no post-join distinct shuffle).
  *
  * Cost: shuffle linear in the interval count; in-band pair work is the
  * true overlap density, not the per-key quadratic the naive join walks —
  * at constant temporal density (history grows with the corpus) the
  * banded join stays linear while naive grows quadratically per key
  * (measured: `ScaleBench interval`, BASELINE.md).
  */
object IntervalJoin {

  /** Overlapping same-key pairs (closed intervals, integer coordinates).
    * Input columns: key, id (unique), start, end. Output: key, a_id, b_id
    * (a_id < b_id), overlap = min(ends) − max(starts) + 1 ≥ 1.
    *
    * @param maxLen caller-guaranteed bound on (end − start); bandWidth
    *               is max(maxLen + 1, requested) so the ≤2-band contract
    *               always holds. */
  def overlapPairs(iv: DataFrame, key: String, id: String, start: String,
      end: String, maxLen: Long, bandWidth: Long = 0L): DataFrame = {
    val w = math.max(maxLen + 1, bandWidth)
    val banded = iv.select(
        col(key).as("k"), col(id).as("i"),
        col(start).cast("long").as("s"), col(end).cast("long").as("e"))
      .withColumn("band", explode(expr(s"sequence(s div $w, e div $w)")))
    val a = banded.select(col("k"), col("band"), col("i").as("a_id"),
      col("s").as("a_start"), col("e").as("a_end"))
    val b = banded.select(col("k"), col("band"), col("i").as("b_id"),
      col("s").as("b_start"), col("e").as("b_end"))
    a.join(b, Seq("k", "band"))
      .filter(col("a_id") < col("b_id") &&
        col("a_start") <= col("b_end") && col("b_start") <= col("a_end") &&
        col("band") === expr(s"greatest(a_start, b_start) div $w"))
      .select(col("k").as(key), col("a_id"), col("b_id"),
        (least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start")) + 1).as("overlap"))
  }

  /** Point-in-interval enrichment (the attribution/window-lookup join):
    * every (point, interval) pair with the same key and
    * start ≤ t ≤ end. Exactly-once without any dedup: a point has ONE
    * band, and containment puts that band inside the interval's band
    * span. The interval side explodes (fan-out len/W + 1); the point
    * side stays one row — so with a broadcast-sized interval table this
    * is a stateless map-side enrich, usable verbatim on a STREAMING
    * point side (no state store, no watermark requirement).
    *
    * Inputs: points(key, id, t), intervals(key, id, start, end); output
    * key, point_id, interval_id, plus the caller joins evidence back by
    * id. */
  def pointInIntervals(points: DataFrame, intervals: DataFrame,
      key: String, pointId: String, t: String,
      intervalId: String, start: String, end: String,
      maxLen: Long, bandWidth: Long = 0L): DataFrame = {
    val w = math.max(maxLen + 1, bandWidth)
    val iv = intervals.select(col(key).as("k"), col(intervalId).as("interval_id"),
        col(start).cast("long").as("s"), col(end).cast("long").as("e"))
      .withColumn("band", explode(expr(s"sequence(s div $w, e div $w)")))
    val pt = points.select(col(key).as("k"), col(pointId).as("point_id"),
        col(t).cast("long").as("t"))
      .withColumn("band", expr(s"t div $w"))
    pt.join(iv, Seq("k", "band"))
      .filter(col("s") <= col("t") && col("t") <= col("e"))
      .select(col("k").as(key), col("point_id"), col("interval_id"),
        col("t"), col("s"), col("e"))
  }

  /** The naive per-key theta-join (the oracle/correctness reference —
    * quadratic per key, only for measurement and small inputs). */
  def overlapPairsNaive(iv: DataFrame, key: String, id: String,
      start: String, end: String): DataFrame = {
    val a = iv.select(col(key).as("k"), col(id).as("a_id"),
      col(start).cast("long").as("a_start"), col(end).cast("long").as("a_end"))
    val b = iv.select(col(key).as("kb"), col(id).as("b_id"),
      col(start).cast("long").as("b_start"), col(end).cast("long").as("b_end"))
    a.join(b, col("k") === col("kb") && col("a_id") < col("b_id") &&
        col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select(col("k").as(key), col("a_id"), col("b_id"),
        (least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start")) + 1).as("overlap"))
  }
}

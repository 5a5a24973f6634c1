package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 maintenance — the warehouse-side
  * versioned-upsert every dimension table needs: applying an update batch
  * closes the current version of each CHANGED row (`valid_to` = effective
  * date, `is_current` = false) and opens a new one, while no-op updates
  * (attributes identical) create NO version — the invariant that keeps
  * dimension history meaningful under replayed/duplicate feeds.
  *
  * Change detection hashes the tracked columns (md5 over a \u0001-joined
  * canonical string with a \u0002 null sentinel — the q36 fingerprint
  * move), so adding tracked columns never rewrites the operator. History
  * rows (is_current = false) pass through untouched.
  *
  * Scale shape: one key-keyed join of the update batch against CURRENT
  * rows only (history is filtered out before the join), one union —
  * O(batch + current), never O(history). Update batches are typically
  * broadcastable; the join inherits that choice from the optimizer.
  */
object ScdMerge {

  private def trackedHash(tracked: Seq[String]): Column =
    md5(concat_ws("\u0001",
      tracked.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*))

  /** Apply `updates` (key + tracked attribute columns) to an SCD2 table
    * `current` (key + tracked + valid_from/valid_to/is_current) at
    * `effective`. Returns the full new SCD2 table. */
  def apply2(current: DataFrame, updates: DataFrame, key: String,
      tracked: Seq[String], effective: Column): DataFrame = {
    val cols = Seq(key) ++ tracked ++ Seq("valid_from", "valid_to", "is_current")
    val cur = current.withColumn("_h", trackedHash(tracked))
    val upd = updates.withColumn("_uh", trackedHash(tracked))
    val live = cur.filter(col("is_current"))
    // changed = update rows whose tracked hash differs from the live row's
    val changed = upd.join(live.select(col(key), col("_h")), key)
      .filter(col("_uh") =!= col("_h"))
    val closed = changed
      .select(col(key))
      .join(live, key)
      .select((Seq(key, "valid_from") ++ tracked).map(col): _*)
      .withColumn("valid_to", effective.cast("string"))
      .withColumn("is_current", lit(false))
      .select(cols.map(col): _*)
    val opened = changed
      .withColumn("valid_from", effective.cast("string"))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))
      .select(cols.map(col): _*)
    val untouched = cur
      .join(changed.select(col(key)), Seq(key), "left_anti")
      .select(cols.map(col): _*)
    val history = cur.filter(!col("is_current"))
      .join(changed.select(col(key)), Seq(key), "left_semi")
      .select(cols.map(col): _*)
    untouched.unionByName(history).unionByName(closed).unionByName(opened)
  }
}

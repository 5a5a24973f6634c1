package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming MATCH_RECOGNIZE (the q246 twin): the V N* P pattern
  * ("purchase preceded by a view with no error in between") evaluated as
  * per-key RUNNING STATE under Structured Streaming — exactly the state
  * q246's batch windows materialize per row, kept instead as one constant-
  * size record per user in `mapGroupsWithState`.
  *
  * State per user: (events seen, last view position, last error position,
  * purchases, clean conversions, first match position). Each micro-batch's
  * rows for a user are folded in (event-time, event_id) order; positions
  * are global per-user ordinals, so as long as batches arrive in event-time
  * order per user (the replay/backfill contract; watermarked sources give
  * it), the final state is IDENTICAL to the batch q246 aggregate —
  * StreamingMatchSpec pins stream ≡ batch on time-split micro-batches.
  *
  * Scale shape: constant state per key (6 longs), no window buffers, no
  * shuffle beyond the keyed state exchange — the MATCH_RECOGNIZE shape
  * that survives unbounded streams.
  */
object SequenceMatch {

  /** (events, lastViewPos, lastErrorPos, purchases, clean, firstMatchPos)
    * — positions are 1-based; 0 = none. */
  type MatchState = (Long, Long, Long, Long, Long, Long)

  case class MatchResult(user_id: Long, n_purchases: Long,
      n_clean_conversions: Long, first_match_pos: Long)

  private def fold(st: MatchState,
      rows: Seq[(Long, Long, String)]): MatchState = {
    var (pos, lv, le, np, nc, first) = st
    // (us, event_id) order inside the batch — the q246 total order
    rows.sortBy(r => (r._1, r._2)).foreach { case (_, _, tpe) =>
      pos += 1
      tpe match {
        case "purchase" =>
          np += 1
          if (lv > 0 && lv > le) {
            nc += 1
            if (first == 0) first = pos
          }
        case "view" => lv = pos
        case "error" => le = pos
        case _ =>
      }
    }
    (pos, lv, le, np, nc, first)
  }

  // ------- quantified pattern: V C+ P (the q260 twin) -------------------

  /** (pos, phase, runLen, vPos, nMatches, clicksConsumed, firstStart,
    * maxRun) — phase: 0 = IDLE, 1 = just saw a view, 2 = inside a click
    * run opened by a view. Positions 1-based; firstStart 0 = none. */
  type QuantState = (Long, Long, Long, Long, Long, Long, Long, Long)

  case class QuantResult(user_id: Long, n_matches: Long,
      n_clicks_consumed: Long, first_match_start: Long, max_run_len: Long)

  /** The V C+ P recognizer as a per-event automaton — exactly the
    * gaps-and-islands evaluation q260 runs batch-side, folded event by
    * event: a view arms the machine, consecutive clicks extend the
    * quantified run, a purchase closing a non-empty run emits a match
    * (greedy ≡ reluctant here: the terminator is disjoint from the
    * quantified symbol); anything else disarms. Constant state per key —
    * 8 longs — regardless of run length: the quantifier consumes rows,
    * never buffers them. */
  private def foldQuant(st: QuantState,
      rows: Seq[(Long, Long, String)]): QuantState = {
    var (pos, phase, runLen, vPos, nm, cc, first, maxRun) = st
    rows.sortBy(r => (r._1, r._2)).foreach { case (_, _, tpe) =>
      pos += 1
      tpe match {
        case "view" => phase = 1; vPos = pos
        case "click" =>
          if (phase == 1) { phase = 2; runLen = 1 }
          else if (phase == 2) runLen += 1
        // phase 0: a click with no arming view cannot start a match
        case "purchase" =>
          if (phase == 2) {
            nm += 1; cc += runLen
            if (first == 0) first = vPos
            if (runLen > maxRun) maxRun = runLen
          }
          phase = 0
        case _ => phase = 0
      }
    }
    (pos, phase, runLen, vPos, nm, cc, first, maxRun)
  }

  /** events: (user_id, us, event_id, event_type). Update-mode output of
    * the current per-user quantified-match aggregate after each
    * micro-batch — StreamingMatchSpec pins convergence to batch q260. */
  def quantified(events: DataFrame): Dataset[QuantResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("us").cast("long"),
        col("event_id").cast("long"), col("event_type").cast("string"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[QuantState, QuantResult](
        GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, String)],
            state: GroupState[QuantState]) =>
          val prev = state.getOption
            .getOrElse((0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
          val next = foldQuant(prev, it.map(r => (r._2, r._3, r._4)).toSeq)
          state.update(next)
          // -1 = no match yet, the q260 output convention
          QuantResult(user, next._5, next._6,
            if (next._7 == 0L) -1L else next._7, next._8)
      }
  }

  // ------- predicate-defined pattern: STRT DOWN+ UP+ (the q261 twin) ----

  /** (pos, prevCents, hasPrev, curDir, runLen, peak, trough, nV,
    * totalDrop, maxDrop, maxDownLen) — curDir: 0 = none/flat, 1 = in a
    * down run, 2 = after an up step. The V fires on the FIRST up step
    * closing a down run (the match's readouts — down length and drop —
    * are down-side measures, so later up steps extend the up run without
    * changing anything; AFTER MATCH SKIP TO LAST UP exactly as batch
    * q261's gaps-and-islands). */
  type VState = (Long, Long, Boolean, Long, Long, Long, Long, Long, Long,
    Long, Long)

  case class VResult(user_id: Long, n_vshapes: Long, total_drop_cents: Long,
      max_drop_cents: Long, max_down_len: Long)

  private def foldV(st: VState,
      rows: Seq[(Long, Long, Long)]): VState = {
    var (pos, prev, hasPrev, dir, runLen, peak, trough, nv, tot, mx,
      mxLen) = st
    rows.sortBy(r => (r._1, r._2)).foreach { case (_, _, cents) =>
      pos += 1
      if (!hasPrev) { hasPrev = true; dir = 0L }
      else if (cents < prev) {
        if (dir == 1L) { runLen += 1 } // extend the down run
        else { peak = prev; runLen = 1L } // open a down run off the peak
        dir = 1L; trough = cents
      } else if (cents > prev) {
        if (dir == 1L) { // first up step closes the V
          nv += 1
          val drop = peak - trough
          tot += drop
          if (drop > mx) mx = drop
          if (runLen > mxLen) mxLen = runLen
        }
        dir = 2L
      } else dir = 0L // flat breaks both runs
      prev = cents
    }
    (pos, prev, hasPrev, dir, runLen, peak, trough, nv, tot, mx, mxLen)
  }

  /** events: (user_id, us, event_id, cents). Update-mode output of the
    * current per-user V-shape aggregate after each micro-batch —
    * StreamingMatchSpec pins convergence to batch q261. Constant
    * 11-field state per key: the value series is consumed, never
    * buffered. */
  def vshapes(events: DataFrame): Dataset[VResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("us").cast("long"),
        col("event_id").cast("long"), col("cents").cast("long"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[VState, VResult](GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, Long)],
            state: GroupState[VState]) =>
          val prev = state.getOption.getOrElse(
            (0L, 0L, false, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
          val next = foldV(prev, it.map(r => (r._2, r._3, r._4)).toSeq)
          state.update(next)
          // -1 = no V yet, the q261 output convention
          VResult(user, next._8, next._9,
            if (next._8 == 0L) -1L else next._10, next._11)
      }
  }

  /** events: (user_id, us, event_id, event_type). Update-mode output of
    * the current per-user aggregate after each micro-batch. */
  def matches(events: DataFrame): Dataset[MatchResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("us").cast("long"),
        col("event_id").cast("long"), col("event_type").cast("string"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[MatchState, MatchResult](
        GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, String)],
            state: GroupState[MatchState]) =>
          val prev = state.getOption.getOrElse((0L, 0L, 0L, 0L, 0L, 0L))
          val next = fold(prev, it.map(r => (r._2, r._3, r._4)).toSeq)
          state.update(next)
          // -1 = no match yet, the q246 output convention
          MatchResult(user, next._4, next._5,
            if (next._6 == 0L) -1L else next._6)
      }
  }
}

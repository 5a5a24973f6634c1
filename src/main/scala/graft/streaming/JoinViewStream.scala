package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, MapState, OutputMode, StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues}
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

  /** One signed changelog event on either join side: `side` "L" (customer:
    * `seg` set, `cents` 0) or "R" (order: `cents` = exact price cents,
    * `seg` null), `sgn` +1 insert / −1 retract; `k` the join key. */
  final case class BiEvent(k: Long, side: String, sgn: Long, seg: String,
      cents: Long)

  /** Per-key state: the signed MULTISET of live rows on each side
    * (segment → count; price-cents → count) — exactly the state a
    * changelog stream-stream join keeps per key (the Materialize/Flink
    * shape): bounded by the number of live rows per key on each side,
    * independent of stream length — and by LIVE KEYS, not keys ever
    * touched: a key whose last live row retracts on both sides has its
    * state row REMOVED (state.remove), so key churn (the CDC norm —
    * entities created and deleted over a stream's lifetime) cannot grow
    * state beyond the currently-live key set. Counts may pass through
    * negative values when a retraction's micro-batch overtakes its
    * insertion — the join is bilinear over signed multisets, so the SUM
    * of emitted deltas is exact regardless of arrival interleaving (a
    * key overdrawn to a negative count keeps its state row until the
    * matching insertion arrives and cancels it back to empty). */
  final case class BiState(lefts: Map[String, Long],
      rights: Map[Long, Long])

  /** TWO-side changelog JOIN-view maintenance — the full
    * stream-stream rung above [[maintain]]'s stream-static form: both
    * join sides arrive as signed changelogs, per-key state holds each
    * side's live multiset, and every event emits the signed join-row
    * deltas it creates against the OTHER side's current state
    * (`sgn × count` per partner row, values in exact integer cents).
    * The emitted delta stream is the view's changelog; a consumer folds
    * it per group (the [[RollupStream]] readout pattern) and the fold
    * equals the batch-maintained view — StreamingIvmSpec pins it against
    * batch q264 end-to-end over uneven interleaved waves.
    *
    * Scale shape: state is per-join-key and row-bounded (never
    * stream-length-bounded); each event does O(partner rows for its key)
    * work — the changelog join's inherent cost; emitted deltas are
    * pre-aggregated per (key batch, segment) so the downstream fold is
    * group-domain-sized. Exactly-once folds come from the memory/agg
    * layer the consumer chooses, as with every changelog source. */
  def biChangelog(events: Dataset[BiEvent]): DataFrame = {
    import events.sparkSession.implicits._
    events.groupByKey(_.k)
      .flatMapGroupsWithState[BiState, (String, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[BiEvent], state: GroupState[BiState]) =>
          var st = state.getOption.getOrElse(
            BiState(Map.empty, Map.empty))
          val acc = scala.collection.mutable.Map
            .empty[String, (Long, Long)]
          def emit(seg: String, dn: Long, dc: Long): Unit = {
            val (n0, c0) = acc.getOrElse(seg, (0L, 0L))
            acc(seg) = (n0 + dn, c0 + dc)
          }
          it.foreach { e =>
            if (e.side == "L") {
              st.rights.foreach { case (cents, m) =>
                if (m != 0L) emit(e.seg, e.sgn * m, e.sgn * m * cents)
              }
              val n = st.lefts.getOrElse(e.seg, 0L) + e.sgn
              st = st.copy(lefts =
                if (n == 0L) st.lefts - e.seg
                else st.lefts.updated(e.seg, n))
            } else {
              st.lefts.foreach { case (seg, m) =>
                if (m != 0L) emit(seg, e.sgn * m, e.sgn * m * e.cents)
              }
              val n = st.rights.getOrElse(e.cents, 0L) + e.sgn
              st = st.copy(rights =
                if (n == 0L) st.rights - e.cents
                else st.rights.updated(e.cents, n))
            }
          }
          // dead-key eviction: both multisets empty ⇒ this key holds no
          // live row on either side and every future event re-derives
          // from the empty state — keeping the row would grow state with
          // keys EVER SEEN instead of keys LIVE (the CDC churn leak)
          if (st.lefts.isEmpty && st.rights.isEmpty) state.remove()
          else state.update(st)
          acc.iterator.collect {
            case (seg, (dn, dc)) if dn != 0L || dc != 0L => (seg, dn, dc)
          }
      }
      .toDF("c_mktsegment", "dn", "dcents")
  }

  /** The per-key live multisets as two MAP states (Spark 4's
    * transformWithState + MapState, RocksDB-backed): one state-store
    * entry PER MULTISET ELEMENT, so an event's bookkeeping is a point
    * read + a point write of the one touched (element → count) entry —
    * where [[biChangelog]]'s flatMapGroupsWithState must deserialize and
    * re-serialize the key's ENTIRE BiState blob on every event, a
    * rewrite that grows with live rows per key (the hot-key tax at
    * scale). Dead elements are removeKey'd at count zero, so state rows
    * = Σ live multiset elements across keys — element-granular, pinned
    * by StreamingIvmSpec against a driver-side fold. The emitted join
    * deltas are identical to [[biChangelog]] by construction; the spec
    * pins both ≡ batch q264 on the same mis-ordered waves. */
  private class BiJoinProcessor
      extends StatefulProcessor[Long, BiEvent, (String, Long, Long)] {
    @transient private var lefts: MapState[String, Long] = _
    @transient private var rights: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lefts = getHandle.getMapState[String, Long]("lefts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      rights = getHandle.getMapState[Long, Long]("rights",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[BiEvent],
        timerValues: TimerValues): Iterator[(String, Long, Long)] =
      applyEvents(lefts, rights, rows)
  }

  // the shared MapState event algebra of both transformWithState forms
  private def applyEvents(lefts: MapState[String, Long],
      rights: MapState[Long, Long], rows: Iterator[BiEvent])
      : Iterator[(String, Long, Long)] = {
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def emit(seg: String, dn: Long, dc: Long): Unit = {
      val (n0, c0) = acc.getOrElse(seg, (0L, 0L))
      acc(seg) = (n0 + dn, c0 + dc)
    }
    rows.foreach { e =>
      if (e.side == "L") {
        rights.iterator().foreach { case (cents, m) =>
          if (m != 0L) emit(e.seg, e.sgn * m, e.sgn * m * cents)
        }
        val n = (if (lefts.containsKey(e.seg)) lefts.getValue(e.seg)
          else 0L) + e.sgn
        if (n == 0L) lefts.removeKey(e.seg)
        else lefts.updateValue(e.seg, n)
      } else {
        lefts.iterator().foreach { case (seg, m) =>
          if (m != 0L) emit(seg, e.sgn * m, e.sgn * m * e.cents)
        }
        val n = (if (rights.containsKey(e.cents))
          rights.getValue(e.cents) else 0L) + e.sgn
        if (n == 0L) rights.removeKey(e.cents)
        else rights.updateValue(e.cents, n)
      }
    }
    acc.iterator.collect {
      case (seg, (dn, dc)) if dn != 0L || dc != 0L => (seg, dn, dc)
    }
  }

  /** One key's live multisets from the STORED base — the initial state
    * of a [[biChangelogTwsFrom]] cold start. */
  final case class BiInit(k: Long, lefts: Map[String, Long],
      rights: Map[Long, Long])

  /** DERIVE the cold-start initial state from the stored base tables —
    * the production shape (VERDICT r19 item 5): `lefts` is one row per
    * live LEFT base row as (key, segment), `rights` one row per live
    * RIGHT base row as (key, cents), and each side folds to its per-key
    * live multiset with ONE grouped aggregation (count per element,
    * then elements collected into the map — two map-side-combining
    * shuffles on the join key), full-outer-merged so a key live on only
    * one side still seeds. No driver fold, no replay of the base
    * through the changelog: at corpus scale the seed is a distributed
    * job whose output is (live keys) rows, loaded straight into
    * [[biChangelogTwsFrom]]'s MapStates. StreamingIvmSpec pins this
    * frame element-for-element against the reference fold and runs the
    * cold start from it. */
  def initialStateFrom(lefts: DataFrame, rights: DataFrame)
      : Dataset[BiInit] = {
    import lefts.sparkSession.implicits._
    val l = lefts.toDF("k", "seg")
      .groupBy("k", "seg").agg(count(lit(1)).as("n"))
      .groupBy("k")
      .agg(map_from_entries(collect_list(struct(col("seg"), col("n"))))
        .as("lefts"))
    val r = rights.toDF("k", "cents")
      .groupBy("k", "cents").agg(count(lit(1)).as("n"))
      .groupBy("k")
      .agg(map_from_entries(collect_list(struct(col("cents"), col("n"))))
        .as("rights"))
    l.join(r, Seq("k"), "full_outer")
      .select(col("k").cast("long").as("k"),
        coalesce(col("lefts"), typedLit(Map.empty[String, Long]))
          .as("lefts"),
        coalesce(col("rights"), typedLit(Map.empty[Long, Long]))
          .as("rights"))
      .as[BiInit]
  }

  private class BiJoinInitProcessor
      extends StatefulProcessorWithInitialState[Long, BiEvent,
        (String, Long, Long), BiInit] {
    @transient private var lefts: MapState[String, Long] = _
    @transient private var rights: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lefts = getHandle.getMapState[String, Long]("lefts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      rights = getHandle.getMapState[Long, Long]("rights",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInitialState(key: Long, initial: BiInit,
        timerValues: TimerValues): Unit = {
      // seed WITHOUT emitting: the stored batch view already accounts
      // for every bootstrap join row — emitting here would double-count
      initial.lefts.foreach { case (s, n) =>
        if (n != 0L) lefts.updateValue(s, n) }
      initial.rights.foreach { case (c, n) =>
        if (n != 0L) rights.updateValue(c, n) }
    }

    override def handleInputRows(key: Long, rows: Iterator[BiEvent],
        timerValues: TimerValues): Iterator[(String, Long, Long)] =
      applyEvents(lefts, rights, rows)
  }

  /** IVM COLD START on [[biChangelogTws]]'s state (Spark 4's
    * StatefulProcessorWithInitialState): the per-key live multisets are
    * SEEDED from the stored base — one BiInit row per key, loaded into
    * the MapStates before the first micro-batch, emitting NOTHING (the
    * stored batch view already holds every bootstrap join row) — and
    * only DELTAS stream. This is the production refresh equation:
    *
    *   stored V(C₀, O₀) + fold(emitted deltas) = V(C₁, O₁)
    *
    * — no corpus replay through the stream (the [[biChangelog]] forms
    * bootstrap by streaming the whole base as inserts, which at corpus
    * scale means replaying 100 TB through the changelog just to warm
    * state). StreamingIvmSpec pins the equation against batch q264 with
    * delta-only waves. RocksDB provider required, as for every
    * transformWithState form. */
  def biChangelogTwsFrom(events: Dataset[BiEvent],
      initial: Dataset[BiInit]): DataFrame = {
    import events.sparkSession.implicits._
    events.groupByKey(_.k)
      .transformWithState[(String, Long, Long), BiInit](
        new BiJoinInitProcessor(),
        TimeMode.None(), OutputMode.Update(),
        initial.groupByKey(_.k))
      .toDF("c_mktsegment", "dn", "dcents")
  }

  /** [[biChangelog]] re-expressed on transformWithState (see
    * [[BiJoinProcessor]] for why the MapState form scales past the
    * GroupState blob). Requires the RocksDB state store provider —
    * Spark's constraint for transformWithState; the caller sets
    * `spark.sql.streaming.stateStore.providerClass`. */
  def biChangelogTws(events: Dataset[BiEvent]): DataFrame = {
    import events.sparkSession.implicits._
    events.groupByKey(_.k)
      .transformWithState[(String, Long, Long)](new BiJoinProcessor(),
        TimeMode.None(), OutputMode.Update())
      .toDF("c_mktsegment", "dn", "dcents")
  }
}

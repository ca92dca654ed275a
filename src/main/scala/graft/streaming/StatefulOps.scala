package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import EventStream.EventRow

/** Custom stateful operators over `flatMapGroupsWithState` — the pieces
  * Structured Streaming lacks natively (SURVEY §7.4 "custom" rows):
  *
  *  - count windows (reference `KeyedStream.countWindow`,
  *    `KeyedStream.java:403`): fixed-size per-key windows by arrival count;
  *  - streaming OVER aggregation (reference `DataStreamOverAggregate`,
  *    `DataStreamOverAggregate.scala:45`, runtime `RowTimeUnboundedOver`):
  *    per-row running aggregates in event-time order.
  *
  * Determinism contract: within each micro-batch, a key's new events are
  * sorted by (ts, event_id) before entering the state machine; results equal
  * the batch computation when input batches arrive in event-time order (or
  * in a single batch). State is O(1) per key for OVER (running counters) and
  * O(window) for count windows — spillable-safe at scale.
  */
object StatefulOps {

  /** User-defined aggregate with RETRACTION (reference
    * `flink-table/.../functions/AggregateFunction.java` —
    * createAccumulator/accumulate/retract/getValue; `retract` is what the
    * bounded-OVER and retract-stream runtimes demand of a UDAGG). The
    * contract: retraction must be exact under add-then-subtract, so
    * accumulator state should be integer/decimal, never floats. The
    * accumulator never crosses a micro-batch boundary — runtimes rebuild
    * it from the persisted frame contents — so implementations need no
    * Spark Encoder. */
  trait RetractableAggregateFunction[In, Acc, Out] extends Serializable {
    def createAccumulator(): Acc
    def accumulate(acc: Acc, in: In): Acc
    def retract(acc: Acc, in: In): Acc
    def getValue(acc: Acc): Out
  }

  /** (count, sum) over integer cents — the instance backing the built-in
    * RANGE frame (reference CountAggFunction + SumAggFunction pairing in
    * `RowTimeBoundedRangeOver`). */
  object CountSumCents
    extends RetractableAggregateFunction[Long, (Long, Long), (Long, Long)] {
    override def createAccumulator(): (Long, Long) = (0L, 0L)
    override def accumulate(acc: (Long, Long), c: Long): (Long, Long) =
      (acc._1 + 1, acc._2 + c)
    override def retract(acc: (Long, Long), c: Long): (Long, Long) =
      (acc._1 - 1, acc._2 - c)
    override def getValue(acc: (Long, Long)): (Long, Long) = acc
  }

  // ---- count windows ------------------------------------------------------

  /** Per-key buffer of not-yet-complete window events + windows emitted. */
  case class CountWindowState(pendingTs: List[Long], pendingCents: List[Long],
                              emitted: Long)
  case class CountWindowOut(user_id: Long, win_idx: Long, n_events: Int,
                            sum_cents: Long)

  /** Pre-aggregation window evictors (reference `windowing/evictors/` —
    * `Evictor.java`, `TimeEvictor.java`, `CountEvictor.java`,
    * `DeltaEvictor.java`): run before the window function and shrink what
    * it sees; window ASSIGNMENT is unchanged — exactly the reference
    * contract. Elements are the window's (event-time ms, integer cents). */
  sealed trait Evictor extends Serializable {
    def evict(win: Seq[(Long, Long)]): Seq[(Long, Long)]
  }

  /** Drop elements older than (window max timestamp − maxAge). */
  final case class TimeEvictor(maxAgeMs: Long) extends Evictor {
    override def evict(win: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      val cutoff = win.map(_._1).max - maxAgeMs
      win.filter(_._1 >= cutoff)
    }
  }

  /** Keep only the LAST maxCount elements (reference CountEvictor keeps
    * from the end of the buffer). */
  final case class CountEvictor(maxCount: Int) extends Evictor {
    override def evict(win: Seq[(Long, Long)]): Seq[(Long, Long)] =
      win.takeRight(maxCount)
  }

  /** Evict elements whose |value delta| from the window's last element
    * reaches the threshold (reference DeltaEvictor: evicts where
    * deltaFunction(element, last) >= threshold). */
  final case class DeltaEvictor(thresholdCents: Long) extends Evictor {
    override def evict(win: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      val last = win.last._2
      win.filter(e => (e._2 - last).abs < thresholdCents)
    }
  }

  /** Tumbling count windows of `size` events per key; only complete windows
    * are emitted (Flink countWindow semantics). The optional [[Evictor]]
    * runs before the window aggregate, so the emitted aggregate may cover
    * fewer than `size` elements. */
  def countWindows(events: Dataset[EventRow], size: Int,
                   evictor: Option[Evictor] = None): Dataset[CountWindowOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[CountWindowState]) =>
          val prev = state.getOption.getOrElse(CountWindowState(Nil, Nil, 0L))
          val fresh = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var ts = prev.pendingTs ++ fresh.map(_.ts.getTime)
          var cents = prev.pendingCents ++
            fresh.map(e => math.round(e.value * 100))
          val out = scala.collection.mutable.ArrayBuffer[CountWindowOut]()
          var emitted = prev.emitted
          while (ts.length >= size) {
            val (wTs, restTs) = ts.splitAt(size)
            val (wCents, restCents) = cents.splitAt(size)
            val (keptTs, keptCents) = evictor match {
              case Some(ev) => ev.evict(wTs.zip(wCents)).unzip
              case None     => (wTs, wCents)
            }
            out += CountWindowOut(key, emitted, keptTs.length, keptCents.sum)
            emitted += 1
            ts = restTs; cents = restCents
          }
          state.update(CountWindowState(ts.toList, cents.toList, emitted))
          out.iterator
      }
  }

  /** Per-element trigger decisions (reference `windowing/triggers/
    * Trigger.java` → `TriggerResult.java`: CONTINUE / FIRE /
    * FIRE_AND_PURGE / PURGE). `onElement` sees the window contents with
    * the new element already appended, exactly the reference's
    * element-then-decide order. */
  sealed trait TriggerResult
  case object Continue extends TriggerResult
  case object Fire extends TriggerResult
  case object FireAndPurge extends TriggerResult
  case object Purge extends TriggerResult

  trait WindowTrigger extends Serializable {
    def onElement(win: Seq[(Long, Long)]): TriggerResult
  }

  /** reference `CountTrigger.java` — fire every n-th element: the
    * reference keeps a ReducingState arrival counter that CLEARS on fire
    * while the window contents stay (GlobalWindows + CountTrigger grows
    * unboundedly). Purged windows restart the count at the purge, so the
    * window length IS the since-last-fire counter in both modes —
    * `length % n == 0` reproduces the counter-clear exactly. */
  final case class CountFireTrigger(n: Int, purge: Boolean = true)
    extends WindowTrigger {
    override def onElement(win: Seq[(Long, Long)]): TriggerResult =
      if (win.length >= n && win.length % n == 0) {
        if (purge) FireAndPurge else Fire
      } else Continue
  }

  /** reference `DeltaTrigger.java` — fire when the arriving element's
    * value deviates from the window's first element by at least the
    * threshold (pinned anchor: the window head — deterministic and
    * state-free, where the reference anchors on its stored last-fired
    * element). */
  final case class DeltaFireTrigger(thresholdCents: Long)
    extends WindowTrigger {
    override def onElement(win: Seq[(Long, Long)]): TriggerResult =
      if ((win.last._2 - win.head._2).abs >= thresholdCents) FireAndPurge
      else Continue
  }

  /** GlobalWindows + custom [[WindowTrigger]] (+ optional [[Evictor]]) —
    * the reference's fully-custom windowing triple
    * (`GlobalWindows.java` assigner, `Trigger.java`, `Evictor.java`):
    * elements accumulate per key until the trigger fires; FIRE emits the
    * (evicted) window aggregate and keeps the contents, FIRE_AND_PURGE
    * emits and clears, PURGE clears silently. Per-element decisions are
    * arrival-order-defined, so this is spec-verified under controlled
    * MemoryStream batches like the proc-time operators. State is the
    * window contents + firing counter. */
  def triggeredGlobalWindows(events: Dataset[EventRow],
                             trigger: WindowTrigger,
                             evictor: Option[Evictor] = None)
      : Dataset[CountWindowOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[CountWindowState]) =>
          val prev = state.getOption.getOrElse(CountWindowState(Nil, Nil, 0L))
          var win = prev.pendingTs.zip(prev.pendingCents)
          var fired = prev.emitted
          val out = scala.collection.mutable.ArrayBuffer[CountWindowOut]()
          def emit(): Unit = {
            val kept = evictor.map(_.evict(win)).getOrElse(win)
            out += CountWindowOut(key, fired, kept.length, kept.map(_._2).sum)
            fired += 1
          }
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            win = win :+ (e.ts.getTime -> math.round(e.value * 100))
            trigger.onElement(win) match {
              case Continue     =>
              case Purge        => win = Nil
              case Fire         => emit()
              case FireAndPurge => emit(); win = Nil
            }
          }
          state.update(CountWindowState(win.map(_._1).toList,
            win.map(_._2).toList, fired))
          out.iterator
      }
  }

  /** Sliding count windows (reference `KeyedStream.countWindow(size,
    * slide)` `KeyedStream.java:425` = GlobalWindows + CountTrigger(slide)
    * + CountEvictor(size)): every `slide` arrivals per key, emit the
    * aggregate of the last min(size, seen) elements. State = the last
    * `size` elements + the arrival counter — O(size) per key. */
  def slidingCountWindows(events: Dataset[EventRow], size: Int,
                          slide: Int): Dataset[CountWindowOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[CountWindowState]) =>
          val prev = state.getOption.getOrElse(CountWindowState(Nil, Nil, 0L))
          var bufTs = prev.pendingTs
          var bufCents = prev.pendingCents
          var seen = prev.emitted // reuse the counter slot: arrivals seen
          val out = scala.collection.mutable.ArrayBuffer[CountWindowOut]()
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            bufTs = (bufTs :+ e.ts.getTime).takeRight(size)
            bufCents = (bufCents :+ math.round(e.value * 100)).takeRight(size)
            seen += 1
            if (seen % slide == 0)
              out += CountWindowOut(key, seen / slide - 1,
                bufCents.length, bufCents.sum)
          }
          state.update(CountWindowState(bufTs, bufCents, seen))
          out.iterator
      }
  }

  // ---- streaming OVER (unbounded preceding, event-time rows) --------------

  case class OverState(cnt: Long, cents: Long)
  case class OverOut(event_id: Long, user_id: Long, run_cnt: Long,
                     run_cents: Long)

  /** Per-row running count + sum over everything seen so far for the key, in
    * event-time order — the RowTimeUnboundedOver subset. State is two
    * counters per key. */
  def overRowsUnbounded(events: Dataset[EventRow]): Dataset[OverOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[OverState]) =>
          var s = state.getOption.getOrElse(OverState(0L, 0L))
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            s = OverState(s.cnt + 1, s.cents + math.round(e.value * 100))
            OverOut(e.event_id, key, s.cnt, s.cents)
          }
          state.update(s)
          out.iterator
      }
  }

  // ---- streaming OVER, bounded ROWS frame ---------------------------------

  case class BoundedOverState(window: List[Long], cnt: Long)
  case class BoundedOverOut(event_id: Long, user_id: Long, run_cnt: Long,
                            win_cents: Long)

  /** Per-row sum over the last `frame` rows (inclusive) per key in
    * event-time order — the RowTimeBoundedRowsOver subset
    * (`flink-table/.../runtime/aggregate/RowTimeBoundedRowsOver`). State is
    * the sliding frame contents: O(frame) per key. */
  def overRowsBounded(events: Dataset[EventRow], frame: Int): Dataset[BoundedOverOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[BoundedOverState]) =>
          var s = state.getOption.getOrElse(BoundedOverState(Nil, 0L))
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            val w = (s.window :+ math.round(e.value * 100)).takeRight(frame)
            s = BoundedOverState(w, s.cnt + 1)
            BoundedOverOut(e.event_id, key, s.cnt, w.sum)
          }
          state.update(s)
          out.iterator
      }
  }

  // ---- streaming OVER, time-bounded RANGE frame ---------------------------

  case class RangeOverState(winTs: List[Long], winCents: List[Long])
  case class RangeOverOut(event_id: Long, user_id: Long, win_cnt: Long,
                          win_cents: Long)

  /** Per-row count + sum over events within [ts − rangeMs, ts] per key in
    * event-time order — the RowTimeBoundedRangeOver subset
    * (`flink-table/.../runtime/aggregate/RowTimeBoundedRangeOver.scala`).
    *
    * RANGE-frame peer semantics: all rows sharing a timestamp get the SAME
    * aggregate, including one another (standard SQL RANGE CURRENT ROW =
    * current peer group; the reference emits per-timestamp too). Rows are
    * therefore processed one timestamp at a time.
    *
    * The accumulator is RETRACTABLE (reference `AggregateFunction
    * .retract`, used by exactly these bounded-OVER runtimes): entering
    * rows `accumulate` into the running (count, sum), rows leaving the
    * frame `retract` — integer arithmetic, so add-then-subtract is exact.
    * Per-emission cost is O(evicted), not O(frame). State is the frame
    * contents: O(rows in range) per key. */
  def overRangeBounded(events: Dataset[EventRow], rangeMs: Long): Dataset[RangeOverOut] = {
    import events.sparkSession.implicits._
    overRangeBoundedAgg(events, rangeMs, CountSumCents) {
      (e, key, v) => RangeOverOut(e.event_id, key, v._1, v._2)
    }
  }

  /** RANGE frame over an arbitrary [[RetractableAggregateFunction]] — the
    * user-facing UDAGG-with-retract surface. The accumulator is rebuilt
    * from the persisted frame once per batch, then maintained
    * incrementally: entering rows `accumulate`, rows leaving the frame
    * `retract` — per-emission cost O(evicted), not O(frame). */
  def overRangeBoundedAgg[Acc, Out, R: org.apache.spark.sql.Encoder](
      events: Dataset[EventRow], rangeMs: Long,
      agg: RetractableAggregateFunction[Long, Acc, Out])(
      emit: (EventRow, Long, Out) => R): Dataset[R] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[RangeOverState]) =>
          var s = state.getOption.getOrElse(RangeOverState(Nil, Nil))
          // accumulator rebuilt from the frame once per batch, then
          // maintained incrementally (accumulate/retract) per timestamp
          var acc = s.winCents.foldLeft(agg.createAccumulator())(agg.accumulate)
          val out = scala.collection.mutable.ArrayBuffer[R]()
          val byTs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            .groupBy(_.ts.getTime).toSeq.sortBy(_._1)
          byTs.foreach { case (ts, peers) =>
            val entering = peers.map(e => math.round(e.value * 100))
            entering.foreach(c => acc = agg.accumulate(acc, c))
            val wTs = s.winTs ++ peers.map(_ => ts)
            val wCents = s.winCents ++ entering
            val (evict, keep) = wTs.zip(wCents).span(_._1 < ts - rangeMs)
            evict.foreach { case (_, c) => acc = agg.retract(acc, c) }
            s = RangeOverState(keep.map(_._1), keep.map(_._2))
            peers.foreach(e => out += emit(e, key, agg.getValue(acc)))
          }
          state.update(s)
          out.iterator
      }
  }

  case class RangeUnbState(cnt: Long, cents: Long)

  /** Per-row running count + sum over ALL prior events per key in event-time
    * order, with RANGE peer semantics: rows sharing a timestamp receive the
    * SAME aggregate, each including all of its peers — the
    * RowTimeUnboundedRangeOver runtime (`flink-table/.../runtime/aggregate/
    * RowTimeUnboundedOver.scala` RANGE variant; completes the row-time
    * {Rows,Range} × {Bounded,Unbounded} matrix). O(1) state per key: only
    * the running accumulator survives, no frame buffer — the unbounded
    * frame never retracts. */
  def overRangeUnbounded(events: Dataset[EventRow]): Dataset[RangeOverOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[RangeUnbState]) =>
          var s = state.getOption.getOrElse(RangeUnbState(0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer[RangeOverOut]()
          val byTs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            .groupBy(_.ts.getTime).toSeq.sortBy(_._1)
          byTs.foreach { case (_, peers) =>
            s = RangeUnbState(s.cnt + peers.size,
              s.cents + peers.map(e => math.round(e.value * 100)).sum)
            peers.foreach(e => out += RangeOverOut(e.event_id, key, s.cnt, s.cents))
          }
          state.update(s)
          out.iterator
      }
  }

  // ---- streaming OVER, processing-time rows -------------------------------

  /** Per-row running count + sum in ARRIVAL order — the ProcTimeUnboundedOver
    * subset (`flink-table/.../runtime/aggregate/ProcTimeUnboundedOver.scala`).
    * Processing-time results depend on arrival order by definition, so this
    * is spec-verified with controlled MemoryStream batches rather than the
    * value oracle. */
  def overRowsProcTime(events: Dataset[EventRow]): Dataset[OverOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[OverState]) =>
          var s = state.getOption.getOrElse(OverState(0L, 0L))
          val out = it.map { e =>
            s = OverState(s.cnt + 1, s.cents + math.round(e.value * 100))
            OverOut(e.event_id, key, s.cnt, s.cents)
          }.toVector
          state.update(s)
          out.iterator
      }
  }

  /** Last-`frame` rows in ARRIVAL order per key — the ProcTimeBoundedRowsOver
    * runtime (`flink-table/.../runtime/aggregate/ProcTimeBoundedRowsOver
    * .scala`). Completes the proc-time ROWS column of the OVER matrix; like
    * [[overRowsProcTime]], results are arrival-order-defined (verified by
    * spec under a controlled MemoryStream, not by the value oracle). State
    * is the O(frame) sliding window per key. */
  def overRowsProcTimeBounded(events: Dataset[EventRow],
                              frame: Int): Dataset[BoundedOverOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[BoundedOverState]) =>
          var s = state.getOption.getOrElse(BoundedOverState(Nil, 0L))
          val out = it.map { e =>
            val w = (s.window :+ math.round(e.value * 100)).takeRight(frame)
            s = BoundedOverState(w, s.cnt + 1)
            BoundedOverOut(e.event_id, key, s.cnt, w.sum)
          }.toVector
          state.update(s)
          out.iterator
      }
  }

  case class ProcRangeState(batchNo: Long, winBatch: List[Long],
                            winCents: List[Long])

  /** Count + sum over rows that ARRIVED within the last `rangeBatches`
    * per-key micro-batches (inclusive) — the ProcTimeBoundedRangeOver
    * runtime (`flink-table/.../runtime/aggregate/ProcTimeBoundedRangeOver
    * .scala`) under the micro-batch model, completing the reference's
    * {Rows,Range} × {Bounded,Unbounded} × {row-time,proc-time} matrix.
    *
    * Pinned processing-time model: a key's processing time is its
    * micro-batch sequence number, so all rows of one batch are PEERS —
    * they receive the same aggregate, including one another (the
    * reference registers one timer per proctime value and emits that
    * timestamp's rows together). The accumulator is RETRACTABLE: entering
    * rows `accumulate`, rows older than the range `retract` — per-batch
    * cost O(entering + evicted), state O(rows in range). The per-key
    * clock advances only when the key receives data; aging quiet keys
    * needs a processing-time timeout (the reference's timer service).
    * Arrival-order-defined, so spec-verified under controlled MemoryStream
    * batches like the proc-time ROWS pair. */
  def overRangeProcTimeBounded(events: Dataset[EventRow],
                               rangeBatches: Long): Dataset[RangeOverOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[ProcRangeState]) =>
          val prev = state.getOption.getOrElse(ProcRangeState(-1L, Nil, Nil))
          val now = prev.batchNo + 1
          var acc = prev.winCents
            .foldLeft(CountSumCents.createAccumulator())(CountSumCents.accumulate)
          // deterministic order within the batch for the emitted rows
          val entering = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val cents = entering.map(e => math.round(e.value * 100))
          cents.foreach(c => acc = CountSumCents.accumulate(acc, c))
          val wBatch = prev.winBatch ++ entering.map(_ => now)
          val wCents = prev.winCents ++ cents
          val (evict, keep) = wBatch.zip(wCents).span(_._1 < now - rangeBatches + 1)
          evict.foreach { case (_, c) => acc = CountSumCents.retract(acc, c) }
          state.update(ProcRangeState(now, keep.map(_._1), keep.map(_._2)))
          val v = CountSumCents.getValue(acc)
          entering.iterator.map(e => RangeOverOut(e.event_id, key, v._1, v._2))
      }
  }

  // ---- punctuated watermarks ----------------------------------------------

  case class PunctOut(event_id: Long, user_id: Long, ts_ms: Long,
                      wm_ms: Long, is_late: Boolean)

  /** Punctuated watermarks (reference `AssignerWithPunctuatedWatermarks` /
    * `TimestampsAndPunctuatedWatermarksOperator.java`): `punct` inspects
    * every record and may emit a watermark; the watermark only advances
    * (max), and — as in the reference, where the watermark is emitted
    * AFTER the element — a record is judged against the watermark
    * established by the records BEFORE it. Spark's own watermark stays
    * the derived global bound; what it cannot express is exactly this
    * per-record decision, reproduced here as a per-key state machine
    * (O(1) state: the current watermark). Records are processed in
    * arrival order within each micro-batch, so results are
    * arrival-order-defined and spec-verified under controlled
    * MemoryStream batches, like the proc-time operators. */
  def punctuatedLateTag(events: Dataset[EventRow])
                       (punct: EventRow => Option[Long]): Dataset[PunctOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[Long]) =>
          var wm = state.getOption.getOrElse(Long.MinValue)
          val out = it.map { e =>
            val row = PunctOut(e.event_id, key, e.ts.getTime, wm,
              e.ts.getTime < wm)
            punct(e).foreach(w => wm = math.max(wm, w))
            row
          }.toVector
          state.update(wm)
          out.iterator
      }
  }

  case class PunctTagOut(event_id: Long, user_id: Long, wm_ms: Option[Long],
                         is_late: Boolean)

  /** Value-oracle-able variant of [[punctuatedLateTag]]: per-key processing
    * order is pinned to (ts, event_id) — the same deterministic order every
    * other oracled count/trigger operator uses — so the watermark each
    * record is judged against (the max over marker records strictly BEFORE
    * it) is a pure function of the data, stateable as a SQL window with an
    * exclusive upper frame bound. `wm_ms` is None until the first marker
    * (the reference starts at Long.MIN_VALUE: nothing is late). */
  def punctuatedLateTagOrdered(events: Dataset[EventRow])
                              (punct: EventRow => Option[Long]): Dataset[PunctTagOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[Long]) =>
          var wm = state.getOption.getOrElse(Long.MinValue)
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            val row = PunctTagOut(e.event_id, key,
              if (wm == Long.MinValue) None else Some(wm),
              wm != Long.MinValue && e.ts.getTime < wm)
            punct(e).foreach(w => wm = math.max(wm, w))
            row
          }
          state.update(wm)
          out.iterator
      }
  }

  // ---- queryable state ----------------------------------------------------

  /** Point-in-time external view of a stateful query's keyed state — the
    * reference's `asQueryableState` (`KeyedStream.java:294`: expose keyed
    * state to out-of-band readers). Spark's analog is the state-store
    * DATA SOURCE: any stateful query that ran with a checkpoint location
    * exposes its per-key state as a batch DataFrame, readable while the
    * query runs or after it stops — reads go to the checkpoint files, so
    * they never contend with the hot path (the reference's queryable-state
    * server proxies live state instead; same contract, different
    * freshness: here the view is as-of the last committed batch). */
  def queryableState(spark: org.apache.spark.sql.SparkSession,
                     checkpointDir: String,
                     batchId: Option[Long] = None): DataFrame = {
    val r = spark.read.format("statestore")
    batchId.foreach(b => r.option("batchId", b))
    r.load(checkpointDir)
  }

  // ---- connected streams / CoProcessFunction ------------------------------

  /** Tagged element of a two-typed connected stream. */
  case class CoEvent[A, B](key: Long, ts: Long, seq: Long,
                           left: Option[A], right: Option[B])

  /** Connect two keyed streams and run a CoProcessFunction-style handler
    * with shared per-key state (reference `ConnectedStreams.java:58`,
    * `CoProcessFunction.java:48`). Implementation: tag-union the streams,
    * key by the shared key, and fold both element kinds through one
    * `flatMapGroupsWithState` machine in (ts, seq) order. */
  def coProcess[A, B, S, O](left: Dataset[CoEvent[A, B]],
                            right: Dataset[CoEvent[A, B]],
                            zero: S)
                           (onLeft: (S, A) => (S, Iterator[O]),
                            onRight: (S, B) => (S, Iterator[O]))
                           (implicit se: org.apache.spark.sql.Encoder[S],
                            oe: org.apache.spark.sql.Encoder[O],
                            ce: org.apache.spark.sql.Encoder[CoEvent[A, B]],
                            ke: org.apache.spark.sql.Encoder[Long]): Dataset[O] = {
    left.union(right)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[CoEvent[A, B]], state: GroupState[S]) =>
          var s = state.getOption.getOrElse(zero)
          val out = scala.collection.mutable.ArrayBuffer[O]()
          it.toSeq.sortBy(e => (e.ts, e.seq)).foreach { e =>
            val (s2, os) = (e.left, e.right) match {
              case (Some(a), _) => onLeft(s, a)
              case (_, Some(b)) => onRight(s, b)
              case _ => (s, Iterator.empty)
            }
            s = s2
            out ++= os
          }
          state.update(s)
          out.iterator
      }
  }

  // ---- event-time sorted emit (DataStreamSort subset) ---------------------

  case class SortedOut(user_id: Long, seq_no: Long, event_id: Long)
  case class SortBufState(ts: List[Long], ids: List[Long], emitted: Long)

  /** Ordered emission per key with WATERMARK hold-back (reference
    * DataStreamSort / `RowTimeSortProcessFunction`): rows buffer in state
    * and emit — with contiguous per-key sequence numbers — only once the
    * watermark passes their event time, so cross-batch out-of-order input
    * (within the watermark delay) is sequenced correctly.
    *
    * Mechanics: the batch-N watermark is computed from batch N−1, so rows
    * always buffer at least one micro-batch; an event-time timeout at
    * watermark+1 forces a callback when the watermark advances (including
    * the no-data batch AvailableNow runs before terminating, which with
    * `delay = 0 seconds` flushes everything — making the end-of-stream
    * result oracle-comparable). Requires `withWatermark` upstream. */
  def sortedEmit(events: Dataset[EventRow], delay: String = "0 seconds"): Dataset[SortedOut] =
    sortedEmitBy(events, delay)(_.user_id)

  /** GLOBAL time-ordered emit — the full DataStreamSort shape (`ORDER BY
    * rowtime, tiebreak` over the whole stream): the same hold-back
    * machinery with one synthetic key. A global total order has no
    * parallel form — the reference's sort runtime is parallelism-1 for
    * the same reason — so this is throughput-bounded by one state
    * partition BY THE SEMANTICS; prefer the keyed [[sortedEmit]] whenever
    * a key exists. Output key column is the constant 0. */
  def sortedEmitGlobal(events: Dataset[EventRow],
                       delay: String = "0 seconds"): Dataset[SortedOut] =
    sortedEmitBy(events, delay)(_ => 0L)

  private def sortedEmitBy(events: Dataset[EventRow], delay: String)
                          (keyFn: EventRow => Long): Dataset[SortedOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", delay)
      .groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[SortBufState]) =>
          val prev = state.getOption.getOrElse(SortBufState(Nil, Nil, 0L))
          val wm = state.getCurrentWatermarkMs()
          val all = (prev.ts.zip(prev.ids) ++
            it.map(e => (e.ts.getTime, e.event_id))).sorted
          val (ready, hold) = all.partition { case (t, _) => t <= wm }
          val out = ready.zipWithIndex.map { case ((_, id), i) =>
            SortedOut(key, prev.emitted + i + 1, id)
          }
          state.update(SortBufState(hold.map(_._1), hold.map(_._2),
            prev.emitted + ready.length))
          if (hold.nonEmpty) state.setTimeoutTimestamp(wm + 1)
          out.iterator
      }
  }

  case class TaggedEvent(event_id: Long, user_id: Long, is_late: Boolean)

  /** Late-data side output (reference `WindowedStream.sideOutputLateData`,
    * `flink-streaming-java/.../datastream/WindowedStream.java:184`): rows
    * whose event time is already behind the watermark when they arrive are
    * TAGGED instead of silently dropped — Flink's side output becomes a
    * boolean route column, demuxed by `filter` (exactly how split/select
    * maps too). Spark exposes the running watermark to stateful operators
    * (`GroupState.getCurrentWatermarkMs`), which is all the mechanism the
    * semantics needs; downstream windowed aggs see only the on-time rows.
    * State: none (the decision is per-row against the global watermark). */
  def withLateTag(events: Dataset[EventRow]): Dataset[TaggedEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[Long]) =>
          val wm = state.getCurrentWatermarkMs()
          it.map(e => TaggedEvent(e.event_id, key, e.ts.getTime < wm)).toVector
            .iterator
      }
  }
}

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

  // ---- count windows ------------------------------------------------------

  /** Per-key buffer of not-yet-complete window events + windows emitted. */
  case class CountWindowState(pendingTs: List[Long], pendingCents: List[Long],
                              emitted: Long)
  case class CountWindowOut(user_id: Long, win_idx: Long, n_events: Int,
                            sum_cents: Long)

  /** Tumbling count windows of `size` events per key; only complete windows
    * are emitted (Flink countWindow semantics). */
  def countWindows(events: Dataset[EventRow], size: Int): Dataset[CountWindowOut] = {
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
            out += CountWindowOut(key, emitted, wTs.length, wCents.sum)
            emitted += 1
            ts = restTs; cents = restCents
          }
          state.update(CountWindowState(ts.toList, cents.toList, emitted))
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

  /** Ordered emission per key: assigns a contiguous event-time sequence
    * number (reference DataStreamSort / RowTimeSortProcessFunction). */
  def sortedEmit(events: Dataset[EventRow]): Dataset[SortedOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EventRow], state: GroupState[OverState]) =>
          var s = state.getOption.getOrElse(OverState(0L, 0L))
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            s = OverState(s.cnt + 1, s.cents)
            SortedOut(key, s.cnt, e.event_id)
          }
          state.update(s)
          out.iterator
      }
  }
}

package graft.cep

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** NFA-style matcher + Spark application of CEP patterns (reference
  * `CEP.pattern` `CEP.java:38`, `PatternStream.select` `PatternStream.java:92`,
  * NFA engine `flink-libraries/flink-cep/src/main/java/.../cep/nfa/`).
  *
  * The matcher runs per key over the event-time-ordered sequence; every
  * start index that completes the pattern yields a match (subject to the
  * per-quantifier overlap rules documented on [[Pattern]]).
  *
  * Batch: `groupByKey.flatMapGroups`. Streaming:
  * `flatMapGroupsWithState` with an ordered per-key buffer; matches are
  * emitted once their start index can no longer begin a NEW different match
  * result (buffer replay is idempotent because already-emitted start indexes
  * are tracked in state).
  */
object Cep {

  /** Pure sequential matcher: all matches over an ordered event sequence. */
  def matchAll[T](events: IndexedSeq[T], pattern: Pattern[T],
                  timeOf: T => Long): Iterator[PatternMatch[T]] = {
    val n = events.length

    def runFrom(i0: Int): Option[PatternMatch[T]] = {
      var bindings = Vector.empty[(String, Vector[T])]
      var pos = i0
      var firstTs = -1L
      for (s <- pattern.stages) {
        // negative lookahead: succeed iff the next event is absent or
        // non-matching; bind nothing, stay in place
        if (s.contiguity == StrictNot) {
          if (pos < n && s.predicate(events(pos))) return None
          bindings :+= (s.name -> Vector.empty[T])
        } else {
        // anchor: first stage at i0; strict: current pos; relaxed: scan ahead
        val anchor: Int = s.contiguity match {
          case _ if bindings.isEmpty => if (pos < n && s.predicate(events(pos))) pos else return None
          case Strict => if (pos < n && s.predicate(events(pos))) pos else return None
          case _ =>
            var j = pos
            while (j < n && !s.predicate(events(j))) j += 1
            if (j >= n) return None else j
        }
        val bound: Vector[T] = s.quantifier match {
          case Once => Vector(events(anchor))
          case Times(k) =>
            if (anchor + k > n) return None
            val w = (anchor until anchor + k).map(events)
            if (!w.forall(s.predicate)) return None
            w.toVector
          case OneOrMore =>
            var j = anchor
            while (j < n && s.predicate(events(j))) j += 1
            (anchor until j).map(events).toVector
        }
        if (firstTs < 0) firstTs = timeOf(bound.head)
        pattern.withinMs.foreach { w =>
          if (timeOf(bound.last) - firstTs > w) return None
        }
        bindings :+= (s.name -> bound)
        pos = anchor + bound.length
        }
      }
      Some(PatternMatch(bindings))
    }

    val headStage = pattern.stages.head
    (0 until n).iterator.flatMap { i0 =>
      val runStartOk = headStage.quantifier match {
        // PAST_LAST_EVENT: only maximal-run starts spawn oneOrMore matches
        case OneOrMore => i0 == 0 || !headStage.predicate(events(i0 - 1))
        case _ => true
      }
      if (runStartOk && headStage.predicate(events(i0))) runFrom(i0) else None
    }
  }

  /** Batch application: key the dataset, sort each group by (time, tiebreak),
    * run the matcher, map matches to an output row. */
  def batch[T, K, O: Encoder](ds: Dataset[T], keyFn: T => K,
                              orderFn: T => (Long, Long),
                              pattern: Pattern[T])
                             (select: (K, PatternMatch[T]) => O)
                             (implicit ke: Encoder[K]): Dataset[O] = {
    ds.groupByKey(keyFn).flatMapGroups { (k: K, it: Iterator[T]) =>
      val sorted = it.toVector.sortBy(orderFn)
      matchAll(sorted, pattern, (t: T) => orderFn(t)._1).map(m => select(k, m))
    }
  }

  /** Per-key streaming state: the ordered event buffer plus the start keys
    * of matches already emitted (a start index yields at most one match, so
    * the first bound event's order tuple identifies a match). */
  case class CepState[T](buffer: Vector[T], emitted: Vector[(Long, Long)])

  /** Streaming application: per-key ordered buffer in state; each batch
    * re-matches the buffer and emits matches whose start key is new
    * (exactly-once per match under in-order arrival).
    *
    * Greedy `oneOrMore` runs are held back while they touch the buffer tail
    * (the run could still extend) and emitted once a later event closes
    * them. With `within(w)`, events older than maxTs − w are evicted — the
    * state bound production deployments rely on. */
  def streaming[T, K, O: Encoder](ds: Dataset[T], keyFn: T => K,
                                  orderFn: T => (Long, Long),
                                  pattern: Pattern[T])
                                 (select: (K, PatternMatch[T]) => O)
                                 (implicit ke: Encoder[K],
                                  se: Encoder[CepState[T]]): Dataset[O] = {
    val hasOneOrMore = pattern.stages.exists(_.quantifier == OneOrMore)
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: K, it: Iterator[T], state: GroupState[CepState[T]]) =>
          val prev = state.getOption.getOrElse(CepState[T](Vector.empty, Vector.empty))
          val buf = (prev.buffer ++ it).sortBy(orderFn)
          val all = matchAll(buf, pattern, (t: T) => orderFn(t)._1).toVector
          val lastOrd = buf.lastOption.map(orderFn)
          val closed = all.filter { m =>
            !hasOneOrMore ||
              lastOrd.exists(lo => orderFn(m.bindings.last._2.last) != lo)
          }
          val seen = prev.emitted.toSet
          val fresh = closed.filterNot(m =>
            seen(orderFn(m.bindings.head._2.head)))
          val keep = pattern.withinMs match {
            case Some(w) if buf.nonEmpty =>
              val maxTs = orderFn(buf.last)._1
              buf.filter(e => orderFn(e)._1 >= maxTs - w)
            case _ => buf
          }
          state.update(CepState(keep,
            prev.emitted ++ fresh.map(m => orderFn(m.bindings.head._2.head))))
          fresh.iterator.map(m => select(k, m))
      }
  }
}

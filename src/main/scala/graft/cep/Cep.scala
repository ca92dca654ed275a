package graft.cep

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.util.hashing.MurmurHash3

/** NFA-style matcher + Spark application of CEP patterns (reference
  * `CEP.pattern` `CEP.java:38`, `PatternStream.select` `PatternStream.java:92`,
  * NFA engine `flink-libraries/flink-cep/src/main/java/.../cep/nfa/`).
  *
  * The matcher runs per key over the event-time-ordered sequence as a
  * depth-first expansion: branching stages (`followedByAny`, `optional`,
  * non-greedy `times(from,to)`, `allowCombinations`) each contribute one
  * candidate continuation, so a single start index can yield several
  * matches (reference NFA shared-buffer behavior, bounded to the pinned
  * semantics documented on [[Pattern]]).
  *
  * Batch: `groupByKey.flatMapGroups`. Streaming:
  * `flatMapGroupsWithState` with an ordered per-key buffer; matches are
  * emitted once they can no longer grow, and replay is idempotent because
  * emitted match signatures are tracked in state.
  */
object Cep {

  /** Pure sequential matcher: all matches over an ordered event sequence. */
  def matchAll[T](events: IndexedSeq[T], pattern: Pattern[T],
                  timeOf: T => Long): Iterator[PatternMatch[T]] =
    matchAllIdx(events, pattern, timeOf).map(_._2)

  /** As [[matchAll]], also yielding each match's start index. */
  private def matchAllIdx[T](events: IndexedSeq[T], pattern: Pattern[T],
                             timeOf: T => Long): Iterator[(Int, PatternMatch[T])] = {
    val n = events.length
    val stages = pattern.stages
    require(stages.last.contiguity != RelaxedNot,
      "notFollowedBy cannot be the final pattern stage (reference Pattern.java:298)")

    // Length of the consecutive matching run from `from`, stopping at the
    // first until-event (which is not consumed — reference until contract).
    def runLen(s: Stage[T], from: Int): Int = {
      var j = from
      while (j < n && s.predicate(events(j)) && !s.until.exists(_(events(j)))) j += 1
      j - from
    }

    // Pending notFollowedBy predicates: no event in [from, to) may match any.
    def negOk(pend: List[T => Boolean], from: Int, to: Int): Boolean =
      pend.forall(p => !(from until to).exists(j => p(events(j))))

    def expand(si: Int, pos: Int, pend: List[T => Boolean],
               bindings: Vector[(String, Vector[T])],
               firstTs: Long): Iterator[PatternMatch[T]] = {
      if (si == stages.length) Iterator.single(PatternMatch(bindings))
      else {
        val s = stages(si)
        s.contiguity match {
          case StrictNot =>
            if (pos < n && s.predicate(events(pos))) Iterator.empty
            else expand(si + 1, pos, pend,
              bindings :+ (s.name -> Vector.empty[T]), firstTs)
          case RelaxedNot =>
            expand(si + 1, pos, s.predicate :: pend,
              bindings :+ (s.name -> Vector.empty[T]), firstTs)
          case _ =>
            // branch 1: optional stage skipped entirely (binds nothing)
            val skipped: Iterator[PatternMatch[T]] =
              if (s.optional)
                expand(si + 1, pos, pend,
                  bindings :+ (s.name -> Vector.empty[T]), firstTs)
              else Iterator.empty
            // anchor choice: the pattern's first positive binding is pinned
            // to the start index (the caller iterates starts); Strict must
            // match in place; Relaxed takes the earliest later match;
            // RelaxedAny branches over every later match
            val anchoredStart = !bindings.exists(_._2.nonEmpty)
            val anchors: Iterator[Int] =
              if (anchoredStart || s.contiguity == Strict) {
                if (pos < n && s.predicate(events(pos))) Iterator.single(pos)
                else Iterator.empty
              } else if (s.contiguity == RelaxedAny) {
                (pos until n).iterator.filter(j => s.predicate(events(j)))
              } else {
                var j = pos
                while (j < n && !s.predicate(events(j))) j += 1
                if (j >= n) Iterator.empty else Iterator.single(j)
              }
            val bound = anchors.flatMap { a =>
              if (!negOk(pend, pos, a)) Iterator.empty
              else {
                val ks: Iterator[Int] = s.quantifier match {
                  case Once => Iterator.single(1)
                  case TimesRange(min, max, greedy) =>
                    val feasible = math.min(runLen(s, a), max)
                    if (feasible < min) Iterator.empty
                    else if (greedy) Iterator.single(feasible)
                    else (min to feasible).iterator
                  case AtLeast(min, combinations) =>
                    val len = runLen(s, a)
                    if (len < min) Iterator.empty
                    else if (combinations) (min to len).iterator
                    else Iterator.single(len)
                }
                ks.flatMap { k =>
                  val b = (a until a + k).map(events).toVector
                  val ft = if (firstTs < 0) timeOf(b.head) else firstTs
                  if (pattern.withinMs.exists(w => timeOf(b.last) - ft > w))
                    Iterator.empty
                  else expand(si + 1, a + k, Nil,
                    bindings :+ (s.name -> b), ft)
                }
              }
            }
            skipped ++ bound
        }
      }
    }

    val headStage = stages.head
    (0 until n).iterator.flatMap { i0 =>
      val runStartOk = headStage.quantifier match {
        // PAST_LAST_EVENT: only maximal-run starts spawn loop matches
        case AtLeast(_, _) => i0 == 0 || !headStage.predicate(events(i0 - 1))
        case _             => true
      }
      if (runStartOk && headStage.predicate(events(i0)))
        expand(0, i0, Nil, Vector.empty, -1L).map(m => (i0, m))
      else Iterator.empty
    }
  }

  /** Apply the pattern's [[SkipStrategy]] to enumerated matches (reference
    * `AfterMatchSkipStrategy.java`): process in ascending (start, end)
    * order; a match starting before the pruning horizon is discarded; each
    * emitted match advances the horizon per the strategy. `horizon0`
    * carries the horizon across streaming micro-batches. Returns the kept
    * matches and the final horizon. */
  private[graft] def applySkip[T, M](ms: Vector[M], get: M => PatternMatch[T],
                                     orderFn: T => (Long, Long),
                                     skip: SkipStrategy,
                                     horizon0: (Long, Long) = (Long.MinValue, Long.MinValue))
      : (Vector[M], (Long, Long)) = skip match {
    case NoSkip => (ms, horizon0)
    case _ =>
      val ord = Ordering.Tuple2(Ordering.Long, Ordering.Long)
      def key(o: Option[T]): (Long, Long) =
        o.map(orderFn).getOrElse((Long.MaxValue, Long.MaxValue))
      def stageKey(m: PatternMatch[T], stage: String, last: Boolean): Option[(Long, Long)] =
        m.bindings.collectFirst { case (n, es) if n == stage && es.nonEmpty =>
          orderFn(if (last) es.last else es.head)
        }
      val strictPast = skip == SkipPastLastEvent
      val sorted = ms.sortBy(m => (key(get(m).firstBound), key(get(m).lastBound)))(
        Ordering.Tuple2(ord, ord))
      var horizon = horizon0
      val out = Vector.newBuilder[M]
      for (m <- sorted) {
        val pm = get(m)
        val sk = key(pm.firstBound)
        val keepIt = if (strictPast) ord.gt(sk, horizon) else ord.gteq(sk, horizon)
        if (keepIt) {
          out += m
          val h = skip match {
            case SkipPastLastEvent => key(pm.lastBound)
            case SkipToFirst(st)   => stageKey(pm, st, last = false).getOrElse(sk)
            case SkipToLast(st)    => stageKey(pm, st, last = true).getOrElse(sk)
            case NoSkip            => horizon
          }
          if (ord.gt(h, horizon)) horizon = h
        }
      }
      (out.result(), horizon)
  }

  /** Timed-out partial matches (reference `PatternStream.select` with a
    * timeout handler, `PatternStream.java:301`): starts whose head stage
    * matched but where no full match completed before the `within` window
    * provably closed (an observed event lies past start + within). The
    * partial binding is the greedy longest prefix: earliest anchors,
    * maximal counts — the single path the reference NFA would have kept
    * alive longest. Requires `within`. */
  def timedOut[T](events: IndexedSeq[T], pattern: Pattern[T],
                  timeOf: T => Long): Iterator[PatternMatch[T]] = {
    val n = events.length
    val stages = pattern.stages
    val w = pattern.withinMs.getOrElse(
      throw new IllegalArgumentException("timedOut requires Pattern.within"))
    val maxTs = if (n == 0) Long.MinValue else timeOf(events(n - 1))

    def runLen(s: Stage[T], from: Int): Int = {
      var j = from
      while (j < n && s.predicate(events(j)) && !s.until.exists(_(events(j)))) j += 1
      j - from
    }

    // Greedy single-path walk; returns bound prefix and whether it completed.
    def walk(i0: Int): (Vector[(String, Vector[T])], Boolean) = {
      var bindings = Vector.empty[(String, Vector[T])]
      var pos = i0
      var firstTs = -1L
      var pend: List[T => Boolean] = Nil
      for (s <- stages) {
        s.contiguity match {
          case StrictNot =>
            if (pos < n && s.predicate(events(pos))) return (bindings, false)
            bindings :+= (s.name -> Vector.empty[T])
          case RelaxedNot =>
            pend ::= s.predicate
            bindings :+= (s.name -> Vector.empty[T])
          case _ =>
            val anchor: Int =
              if (bindings.forall(_._2.isEmpty) || s.contiguity == Strict) {
                if (pos < n && s.predicate(events(pos))) pos
                else return (bindings, false)
              } else {
                var j = pos
                while (j < n && !s.predicate(events(j))) j += 1
                if (j >= n) return (bindings, false) else j
              }
            if (!pend.forall(p => !(pos until anchor).exists(j => p(events(j)))))
              return (bindings, false)
            pend = Nil
            val k = s.quantifier match {
              case Once => 1
              case TimesRange(min, max, _) =>
                val f = math.min(runLen(s, anchor), max)
                if (f < min) return (bindings, false) else f
              case AtLeast(min, _) =>
                val len = runLen(s, anchor)
                if (len < min) return (bindings, false) else len
            }
            val b = (anchor until anchor + k).map(events).toVector
            if (firstTs < 0) firstTs = timeOf(b.head)
            if (timeOf(b.last) - firstTs > w) return (bindings, false)
            bindings :+= (s.name -> b)
            pos = anchor + k
        }
      }
      (bindings, true)
    }

    val matchedStarts =
      matchAllIdx(events, pattern, timeOf).map(_._1).toSet
    val headStage = stages.head
    (0 until n).iterator.flatMap { i0 =>
      if (!headStage.predicate(events(i0))) Iterator.empty
      else if (maxTs - timeOf(events(i0)) <= w) Iterator.empty // window still open
      else if (matchedStarts(i0)) Iterator.empty
      else {
        val (prefix, completed) = walk(i0)
        if (completed || prefix.forall(_._2.isEmpty)) Iterator.empty
        else Iterator.single(PatternMatch(prefix))
      }
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
      val all = matchAll(sorted, pattern, (t: T) => orderFn(t)._1).toVector
      applySkip[T, PatternMatch[T]](all, identity, orderFn, pattern.skip)
        ._1.iterator.map(m => select(k, m))
    }
  }

  /** Batch application with a timeout side output (reference
    * `PatternStream.select(timeoutHandler, selectHandler)`
    * `PatternStream.java:301`): completed matches map through `select`,
    * timed-out partial matches through `timeoutSelect`, unioned. */
  def batchWithTimeout[T, K, O: Encoder](ds: Dataset[T], keyFn: T => K,
                                         orderFn: T => (Long, Long),
                                         pattern: Pattern[T])
                                        (select: (K, PatternMatch[T]) => O)
                                        (timeoutSelect: (K, PatternMatch[T]) => O)
                                        (implicit ke: Encoder[K]): Dataset[O] = {
    ds.groupByKey(keyFn).flatMapGroups { (k: K, it: Iterator[T]) =>
      val sorted = it.toVector.sortBy(orderFn)
      val t = (x: T) => orderFn(x)._1
      val all = matchAll(sorted, pattern, t).toVector
      applySkip[T, PatternMatch[T]](all, identity, orderFn, pattern.skip)
        ._1.iterator.map(m => select(k, m)) ++
        timedOut(sorted, pattern, t).map(m => timeoutSelect(k, m))
    }
  }

  /** Per-key streaming state: the ordered event buffer plus signatures of
    * matches already emitted. Each signature is (startTs, 64-bit hash of
    * every bound event's order key) — branching quantifiers can yield
    * several distinct matches from one start index, so the full binding
    * identifies a match, not just its start. */
  case class CepState[T](buffer: Vector[T], emitted: Vector[(Long, Long)],
                         skipHorizon: (Long, Long) = (Long.MinValue, Long.MinValue))

  private def matchSig[T](m: PatternMatch[T], orderFn: T => (Long, Long)): (Long, Long) = {
    val keys = m.bindings.flatMap(_._2).map(orderFn)
    val h1 = MurmurHash3.orderedHash(keys, 0x9747b28c)
    val h2 = MurmurHash3.orderedHash(keys, 0x85ebca6b)
    val startTs = m.firstBound.map(e => orderFn(e)._1).getOrElse(Long.MinValue)
    (startTs, (h1.toLong << 32) | (h2.toLong & 0xffffffffL))
  }

  /** Streaming application: per-key ordered buffer in state; each batch
    * re-matches the buffer and emits matches whose signature is new
    * (exactly-once per match under in-order arrival).
    *
    * Matches whose last bound event is the buffer tail are held back while
    * the pattern has a loop that could still extend them, and emitted once
    * a later event closes the run.
    *
    * State hygiene (reference `StreamQueryConfig.withIdleStateRetentionTime`
    * `queryConfig.scala:67`): events older than maxTs − horizon are evicted,
    * where horizon = `within(ms)` if set, else `retentionMs`. Emitted
    * signatures whose start event left the buffer are pruned with them —
    * an evicted start can never be re-derived, so the signature is dead
    * weight. Without either bound the buffer is unbounded (matching the
    * reference's default of no idle-state cleanup) — production streams
    * should set one. */
  /** One micro-batch transition of the per-key state machine — pure, so
    * the spec can drive it over many batches and assert the state bound
    * directly. Returns (next state, fresh matches, timed-out partials).
    *
    * Timeout emission is final exactly when it happens: a start times out
    * when maxTs − startTs > within, which is precisely the eviction
    * condition (horizon = within), so the start leaves the buffer in the
    * same transition and can never re-emit — cumulative streaming timeout
    * output equals [[timedOut]] over the whole stream under in-order
    * arrival (every event a timed-out prefix could bind is ≤ start+within
    * and therefore still buffered when the decision is made). */
  private[graft] def step[T](prev: CepState[T], incoming: Seq[T],
                           pattern: Pattern[T], orderFn: T => (Long, Long),
                           retentionMs: Option[Long]): (CepState[T], Vector[PatternMatch[T]], Vector[PatternMatch[T]]) = {
    // hold back matches still decidable by FUTURE events: a loop ending at
    // the tail could extend, and a trailing notNext evaluated AT the tail
    // is provisional — the negation is only proven once a later event
    // exists (emitting early would be retracted when an adjacent negative
    // event arrives in the next batch)
    val holdBackTail = pattern.hasExtendableLoop ||
      pattern.stages.last.contiguity == StrictNot
    val horizonMs = pattern.withinMs.orElse(retentionMs)
    val buf = (prev.buffer ++ incoming).sortBy(orderFn)
    val all = matchAll(buf, pattern, (t: T) => orderFn(t)._1).toVector
    val lastOrd = buf.lastOption.map(orderFn)
    val closed = all.filter { m =>
      !holdBackTail || m.lastBound.forall(b => !lastOrd.contains(orderFn(b)))
    }
    val seen = prev.emitted.toSet
    // skip pruning runs AFTER the seen-filter: matches emitted in earlier
    // batches already advanced the persisted horizon, so re-derivations are
    // dropped by signature and fresh ones race only against each other
    val (freshPairs, newSkipHorizon) = applySkip[T, (PatternMatch[T], (Long, Long))](
      closed.map(m => (m, matchSig(m, orderFn)))
        .filterNot { case (_, sig) => seen(sig) },
      _._1, orderFn, pattern.skip, prev.skipHorizon)
    val keep = horizonMs match {
      case Some(h) if buf.nonEmpty =>
        val maxTs = orderFn(buf.last)._1
        buf.filter(e => orderFn(e)._1 >= maxTs - h)
      case _ => buf
    }
    // signatures whose start event left the buffer can never be re-derived
    val minRetainedTs =
      keep.headOption.map(e => orderFn(e)._1).getOrElse(Long.MaxValue)
    val emitted = (prev.emitted ++ freshPairs.map(_._2))
      .filter(_._1 >= minRetainedTs)
    val timeouts =
      if (pattern.withinMs.isDefined && buf.nonEmpty)
        timedOut(buf, pattern, (t: T) => orderFn(t)._1).toVector
      else Vector.empty
    (CepState(keep, emitted, newSkipHorizon), freshPairs.map(_._1), timeouts)
  }

  def streaming[T, K, O: Encoder](ds: Dataset[T], keyFn: T => K,
                                  orderFn: T => (Long, Long),
                                  pattern: Pattern[T],
                                  retentionMs: Option[Long] = None)
                                 (select: (K, PatternMatch[T]) => O)
                                 (implicit ke: Encoder[K],
                                  se: Encoder[CepState[T]]): Dataset[O] = {
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: K, it: Iterator[T], state: GroupState[CepState[T]]) =>
          val prev = state.getOption.getOrElse(CepState[T](Vector.empty, Vector.empty))
          val (next, fresh, _) = step(prev, it.toSeq, pattern, orderFn, retentionMs)
          state.update(next)
          fresh.iterator.map(m => select(k, m))
      }
  }

  /** Streaming application with a timeout side output (reference
    * `PatternStream.flatSelect(timeoutHandler, selectHandler)`
    * `PatternStream.java:301` on streams): completed matches map through
    * `select`, and starts whose `within` window provably closed without a
    * match map through `timeoutSelect` in the micro-batch that evicts
    * them. Cumulative end-of-stream output equals [[batchWithTimeout]]
    * under in-order arrival (see [[step]]). Requires `Pattern.within`. */
  def streamingWithTimeout[T, K, O: Encoder](ds: Dataset[T], keyFn: T => K,
                                             orderFn: T => (Long, Long),
                                             pattern: Pattern[T])
                                            (select: (K, PatternMatch[T]) => O)
                                            (timeoutSelect: (K, PatternMatch[T]) => O)
                                            (implicit ke: Encoder[K],
                                             se: Encoder[CepState[T]]): Dataset[O] = {
    require(pattern.withinMs.isDefined, "streamingWithTimeout requires Pattern.within")
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: K, it: Iterator[T], state: GroupState[CepState[T]]) =>
          val prev = state.getOption.getOrElse(CepState[T](Vector.empty, Vector.empty))
          val (next, fresh, timeouts) = step(prev, it.toSeq, pattern, orderFn, None)
          state.update(next)
          fresh.iterator.map(m => select(k, m)) ++
            timeouts.iterator.map(m => timeoutSelect(k, m))
      }
  }
}

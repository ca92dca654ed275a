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

  /** Head-loop (oneOrMore/timesOrMore) run segmentation: each run owns
    * every matching event from its start until its stop (until-event,
    * within-window edge, or — under `consecutive()` — the first
    * non-matching event); the next run starts at the first matching event
    * after that. Returns each run as (start index, last bound index).
    * [[step]] uses the starts for PAST_LAST pruning and, when it evicts a
    * run's START, persists the run's last bound key as the start floor:
    * after eviction the buffer no longer proves whether its oldest
    * matching events belonged to an earlier run, so starts at or below
    * the floor are barred (`validStart`). */
  private def headLoopSegments[T](events: IndexedSeq[T], pattern: Pattern[T],
                                  timeOf: T => Long,
                                  validStart: Int => Boolean)
      : Vector[(Int, Int)] = {
    val head = pattern.stages.head
    val n = events.length
    val runs = Vector.newBuilder[(Int, Int)]
    var j = 0
    while (j < n) {
      val ev = events(j)
      if (validStart(j) && head.predicate(ev) && !head.until.exists(_(ev))) {
        val (idxs, _, stopPos) =
          loopScan(events, head, j, timeOf(ev), pattern.withinMs, timeOf)
        runs += ((j, idxs.last)) // idxs is non-empty: the start event binds
        j = math.max(stopPos, j + 1)
      } else j += 1
    }
    runs.result()
  }

  // Why a loop run stopped scanning. EndOfBuffer is the one "open" reason:
  // a future appended event could still extend the run, so a streaming
  // emission of a greedy-maximal binding must be held back (see [[step]]).
  private final val StopEnd = 0      // ran out of events
  private final val StopUntil = 1    // until-event (not consumed)
  private final val StopWindow = 2   // event past firstTs + within
  private final val StopNonMatch = 3 // strict inner contiguity break

  /** The one loop-run scan — [[headLoopSegments]], the matcher's run
    * binding, and [[timedOut]]'s greedy walk all derive runs from here, so
    * streaming emission, PAST_LAST pruning, and timeout partials cannot
    * disagree on what a run is. From `from`: bind every matching event,
    * skipping non-matching ones under relaxed inner contiguity (the
    * reference default) or stopping at the first under `consecutive()`;
    * every run stops at the first until-event (not consumed) and at the
    * first event past `firstTs + within`. Returns (bound indices, stop
    * reason, index of the stopping event — `events.length` at
    * end-of-buffer). */
  private def loopScan[T](events: IndexedSeq[T], s: Stage[T], from: Int,
                          firstTs: Long, withinMs: Option[Long],
                          timeOf: T => Long): (Vector[Int], Int, Int) = {
    val n = events.length
    val out = Vector.newBuilder[Int]
    var j = from
    var stop = StopEnd
    var done = false
    while (j < n && !done) {
      val ev = events(j)
      if (s.until.exists(_(ev))) { stop = StopUntil; done = true }
      else if (withinMs.exists(w => timeOf(ev) - firstTs > w)) {
        stop = StopWindow; done = true
      } else if (s.predicate(ev)) { out += j; j += 1 }
      else if (s.strictInner) { stop = StopNonMatch; done = true }
      else j += 1
    }
    (out.result(), stop, j)
  }

  /** As [[matchAll]], also yielding each match's start index and whether
    * the match is still OPEN — i.e. an event appended later (in order)
    * could change its binding: a greedy-maximal loop run that reached the
    * end of the buffer, or a trailing `notNext` evaluated with no following
    * event yet. Batch consumers ignore the flag (a batch is complete data);
    * the streaming [[step]] holds open matches back. */
  private def matchAllIdx[T](events: IndexedSeq[T], pattern: Pattern[T],
                             timeOf: T => Long,
                             validStart: Int => Boolean = _ => true)
      : Iterator[(Int, PatternMatch[T], Boolean)] = {
    val n = events.length
    val stages = pattern.stages
    require(stages.last.contiguity != RelaxedNot,
      "notFollowedBy cannot be the final pattern stage (reference Pattern.java:298)")

    // Pending notFollowedBy predicates: no event in [from, to) may match
    // any. Events SKIPPED inside a relaxed run are not re-checked — the
    // pinned gap is between the previous stage's last bound event and the
    // next stage's first bound event.
    def negOk(pend: List[T => Boolean], from: Int, to: Int): Boolean =
      pend.forall(p => !(from until to).exists(j => p(events(j))))

    def expand(si: Int, pos: Int, pend: List[T => Boolean],
               bindings: Vector[(String, Vector[T])],
               firstTs: Long, open: Boolean): Iterator[(PatternMatch[T], Boolean)] = {
      if (si == stages.length) Iterator.single((PatternMatch(bindings), open))
      else {
        val s = stages(si)
        s.contiguity match {
          case StrictNot =>
            if (pos < n && s.predicate(events(pos))) Iterator.empty
            else expand(si + 1, pos, pend,
              bindings :+ (s.name -> Vector.empty[T]), firstTs,
              // negation at the buffer horizon is provisional: the proving
              // event does not exist yet
              open || pos == n)
          case RelaxedNot =>
            expand(si + 1, pos, s.predicate :: pend,
              bindings :+ (s.name -> Vector.empty[T]), firstTs, open)
          case _ =>
            // branch 1: optional stage skipped entirely (binds nothing)
            val skipped: Iterator[(PatternMatch[T], Boolean)] =
              if (s.optional)
                expand(si + 1, pos, pend,
                  bindings :+ (s.name -> Vector.empty[T]), firstTs, open)
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
              else s.quantifier match {
                case Once =>
                  val b = Vector(events(a))
                  val ft = if (firstTs < 0) timeOf(b.head) else firstTs
                  if (pattern.withinMs.exists(w => timeOf(b.last) - ft > w))
                    Iterator.empty
                  else expand(si + 1, a + 1, Nil,
                    bindings :+ (s.name -> b), ft, open)
                case q =>
                  val ft0 = if (firstTs < 0) timeOf(events(a)) else firstTs
                  val (runIdx, stopReason, _) =
                    loopScan(events, s, a, ft0, pattern.withinMs, timeOf)
                  val len = runIdx.length
                  // (bound indices, binding still open?) choices. Only
                  // greedy-MAXIMAL bindings are unstable under append: a
                  // non-maximal prefix (or subset) of the run never
                  // changes once derived — a later event yields NEW
                  // supersets, not mutations of emitted ones.
                  val picks: Iterator[(Vector[Int], Boolean)] = q match {
                    case TimesRange(min, max, greedy) =>
                      val feasible = math.min(len, max)
                      if (feasible < min) Iterator.empty
                      else if (greedy) Iterator.single(
                        (runIdx.take(feasible),
                          feasible == len && feasible < max &&
                            stopReason == StopEnd))
                      else (min to feasible).iterator
                        .map(k => (runIdx.take(k), false))
                    case AtLeast(min, combinations, exactCap) =>
                      if (len < min) Iterator.empty
                      else if (combinations && exactCap > 0 &&
                               len <= exactCap)
                        // EXACT reference semantics (NFA TAKE/IGNORE
                        // branching, Pattern.java:435): every
                        // order-preserving subset of the run containing
                        // its anchor, size >= min — 2^(len-1) candidates,
                        // reachable only behind the opt-in cap
                        (0 until (1 << (len - 1))).iterator
                          .map { mask =>
                            runIdx.head +: (1 until len).collect {
                              case i if (mask & (1 << (i - 1))) != 0 =>
                                runIdx(i)
                            }.toVector
                          }
                          .filter(_.length >= min)
                          .map(sel => (sel, false))
                      else if (combinations)
                        (min to len).iterator
                          .map(k => (runIdx.take(k), false))
                      else Iterator.single((runIdx, stopReason == StopEnd))
                    case Once => Iterator.empty // unreachable
                  }
                  picks.flatMap { case (idxs, kOpen) =>
                    val b = idxs.map(events)
                    expand(si + 1, idxs.last + 1, Nil,
                      bindings :+ (s.name -> b), ft0, open || kOpen)
                  }
              }
            }
            skipped ++ bound
        }
      }
    }

    val headStage = stages.head
    // PAST_LAST_EVENT start pruning for head loops: only run-starts spawn
    // oneOrMore/timesOrMore matches (see [[headLoopSegments]]).
    lazy val headStarts: Set[Int] =
      headLoopSegments(events, pattern, timeOf, validStart).map(_._1).toSet
    (0 until n).iterator.flatMap { i0 =>
      val runStartOk = headStage.quantifier match {
        case _: AtLeast    => headStarts(i0)
        case _             => true
      }
      if (runStartOk && headStage.predicate(events(i0)))
        expand(0, i0, Nil, Vector.empty, -1L, open = false)
          .map { case (m, o) => (i0, m, o) }
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

    // Greedy run indices — the shared scan (until, window, strict-inner
    // break, end of buffer; relaxed skips non-matching).
    def runIdx(s: Stage[T], from: Int, firstTs: Long): Vector[Int] =
      loopScan(events, s, from, firstTs, pattern.withinMs, timeOf)._1

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
            val ft = if (firstTs < 0) timeOf(events(anchor)) else firstTs
            val idxs: Vector[Int] = s.quantifier match {
              case Once => Vector(anchor)
              case TimesRange(min, max, _) =>
                val run = runIdx(s, anchor, ft)
                val f = math.min(run.length, max)
                if (f < min) return (bindings, false) else run.take(f)
              case AtLeast(min, _, _) =>
                val run = runIdx(s, anchor, ft)
                if (run.length < min) return (bindings, false) else run
            }
            val b = idxs.map(events)
            if (firstTs < 0) firstTs = timeOf(b.head)
            if (timeOf(b.last) - firstTs > w) return (bindings, false)
            bindings :+= (s.name -> b)
            pos = idxs.last + 1
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
                         skipHorizon: (Long, Long) = (Long.MinValue, Long.MinValue),
                         headFloor: (Long, Long) = (Long.MinValue, Long.MinValue))

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
    * weight. Without either bound the buffer is unbounded — [[streaming]]
    * fails fast on that combination unless explicitly opted into. */
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
    // hold back matches still decidable by FUTURE events — the matcher
    // flags them OPEN: a greedy-maximal loop run that reached the buffer
    // horizon (relaxed runs can extend past interior non-matching events,
    // so tail position alone is not the criterion), or a trailing notNext
    // whose proving event does not exist yet. Open matches re-derive — and
    // emit — once an until-event, the within window, or a strict-inner
    // break closes them.
    val horizonMs = pattern.withinMs.orElse(retentionMs)
    val buf = (prev.buffer ++ incoming).sortBy(orderFn)
    val tOf = (t: T) => orderFn(t)._1
    // head-loop start floor: after eviction the buffer's oldest matching
    // events may be the tail of a run whose START was evicted — a
    // buffer-local segmentation would mint a false start there. When a
    // run's start is evicted (below), the run's last bound key becomes the
    // floor and starts at or below it are barred. The floor only ever
    // covers evicted starts, so pending matches from retained starts
    // (e.g. a closed run still waiting on a later stage) stay derivable.
    val ord2 = Ordering.Tuple2(Ordering.Long, Ordering.Long)
    val isHeadLoop = pattern.stages.head.quantifier match {
      case _: AtLeast    => true
      case _             => false
    }
    val validStart: Int => Boolean =
      if (isHeadLoop) (i: Int) => ord2.gt(orderFn(buf(i)), prev.headFloor)
      else _ => true
    val closed = matchAllIdx(buf, pattern, tOf, validStart)
      .collect { case (_, m, open) if !open => m }.toVector
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
    // buf is sorted, so eviction drops a prefix; runs whose START is in
    // that prefix advance the floor to their last bound key
    val evictedCount = buf.length - keep.length
    val newHeadFloor =
      if (isHeadLoop && evictedCount > 0)
        headLoopSegments(buf, pattern, tOf, validStart)
          .filter(_._1 < evictedCount)
          .map(r => orderFn(buf(r._2)))
          .foldLeft(prev.headFloor)((a, b) => if (ord2.gt(b, a)) b else a)
      else prev.headFloor
    // signatures whose start event left the buffer can never be re-derived
    val minRetainedTs =
      keep.headOption.map(e => orderFn(e)._1).getOrElse(Long.MaxValue)
    val emitted = (prev.emitted ++ freshPairs.map(_._2))
      .filter(_._1 >= minRetainedTs)
    val timeouts =
      if (pattern.withinMs.isDefined && buf.nonEmpty)
        timedOut(buf, pattern, (t: T) => orderFn(t)._1).toVector
      else Vector.empty
    (CepState(keep, emitted, newSkipHorizon, newHeadFloor),
      freshPairs.map(_._1), timeouts)
  }

  /** @param retentionMs idle-state horizon when the pattern has no
    *   `within` (reference `StreamQueryConfig.withIdleStateRetentionTime`).
    *   Without either bound the per-key buffer grows with the stream, so
    *   construction FAILS FAST unless `unboundedState = true` explicitly
    *   accepts that (e.g. a bounded replay of a finite fixture). */
  def streaming[T, K, O: Encoder](ds: Dataset[T], keyFn: T => K,
                                  orderFn: T => (Long, Long),
                                  pattern: Pattern[T],
                                  retentionMs: Option[Long] = None,
                                  unboundedState: Boolean = false)
                                 (select: (K, PatternMatch[T]) => O)
                                 (implicit ke: Encoder[K],
                                  se: Encoder[CepState[T]]): Dataset[O] = {
    require(pattern.withinMs.isDefined || retentionMs.isDefined || unboundedState,
      "unbounded CEP state: set Pattern.within or retentionMs (or pass " +
        "unboundedState = true to accept per-key buffers that grow with the stream)")
    // retention alone cannot bound a greedy relaxed loop with no stop
    // condition: its runs are held OPEN forever (any future matching event
    // could extend them), so idle-state eviction would discard every run
    // UNEMITTED — the query would silently produce zero matches. Reject the
    // combination at construction instead of emitting nothing at runtime.
    require(retentionMs.isEmpty || pattern.unclosableLoopStages.isEmpty,
      s"retentionMs would silently drop every match: greedy loop stage(s) " +
        s"${pattern.unclosableLoopStages.mkString("'", "', '", "'")} can never " +
        "provably close — add Pattern.within or until(...) (or consecutive) " +
        "so runs can finish, or drop retentionMs and accept unbounded state " +
        "with unboundedState = true")
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

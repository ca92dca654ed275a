package graft.cep

import scala.reflect.ClassTag

/** CEP pattern AST — the reference's fluent Pattern API
  * (`flink-libraries/flink-cep/.../pattern/Pattern.java`: begin :123,
  * where :150, or :172, subtype :193, until :214, within :239, next :256,
  * notNext :267, followedBy :285, notFollowedBy :298, followedByAny :316,
  * optional :327, greedy :361, times :380/:394, timesOrMore :414,
  * oneOrMore :352, consecutive :474, allowCombinations :435).
  *
  * Match semantics (pinned so the DuckDB oracle can express them):
  *  - `next` (strict): the stage must match the immediately following event
  *    in the key's event-time order;
  *  - `followedBy` (relaxed): the stage binds to the EARLIEST later matching
  *    event;
  *  - `followedByAny`: the stage binds to EVERY later matching event — one
  *    candidate match per choice (reference relaxed-non-deterministic
  *    contiguity);
  *  - `notNext`: the immediately following event must NOT match; binds
  *    nothing, position does not advance;
  *  - `notFollowedBy`: no matching event may occur between the previous
  *    stage's last bound event and the next stage's bound event; binds
  *    nothing. Cannot be the final stage (same contract as the reference);
  *  - loop inner contiguity: by default a looping stage is RELAXED — its
  *    run binds every matching event from the anchor onward, SKIPPING
  *    non-matching events (the reference's default; `Pattern.java:352`,
  *    behavior in `flink-cep/.../nfa/NFAITCase.java`). `consecutive()`
  *    opts into strict inner contiguity (the run stops at the first
  *    non-matching event), exactly as in the reference (`Pattern.java:474`).
  *    A run always stops at the first `until`-event and at the first event
  *    outside the `within` window (events past the window can never join a
  *    partial match — this is also what makes the run decidable on a
  *    stream);
  *  - `times(n)` / `times(from,to)`: n (resp. each k in [from,to]) events
  *    bound from the run; candidate matches may overlap (AfterMatchSkip =
  *    NO_SKIP). With `greedy`, only the maximal feasible k is emitted;
  *  - `oneOrMore` / `timesOrMore(n)`: greedy maximal run (≥ 1 resp. ≥ n);
  *    when the looping stage is the pattern head, only run-starts spawn a
  *    match (AfterMatchSkip = PAST_LAST_EVENT), so runs never overlap —
  *    the pinned, oracle-expressible emission bound over the reference's
  *    all-prefix default (use `allowCombinations` for prefix emission);
  *  - `allowCombinations`: the loop additionally emits every PREFIX of the
  *    maximal run (length min..len). This is the deterministic, bounded
  *    subset of the reference's combination semantics (which enumerates
  *    non-contiguous subsets — exponential and not oracle-expressible);
  *  - `optional`: the stage may bind zero events (branching: one candidate
  *    match with the stage skipped, plus the bound candidates). Not allowed
  *    on the pattern head;
  *  - `until(p)`: stops a looping stage's run at the first event matching
  *    `p` (the until-event itself is not consumed);
  *  - `within(ms)`: last bound event's time minus first bound event's time
  *    must be ≤ the bound.
  *
  * Quantifier/optional/until modifiers on a negative stage (`notNext` /
  * `notFollowedBy`) are rejected at construction time — the reference
  * throws `MalformedPatternException` for the same combinations
  * (`Quantifier.java` checks).
  */
sealed trait Quantifier
case object Once extends Quantifier
/** `times(min,max)`; greedy = only the maximal feasible count. */
final case class TimesRange(min: Int, max: Int, greedy: Boolean) extends Quantifier
/** `oneOrMore` (min=1) / `timesOrMore(min)`; combinations = also emit
  * prefixes of the maximal run. `exactCap > 0` additionally opts into the
  * reference's EXACT non-contiguous subset enumeration (NFA TAKE/IGNORE
  * branching) for runs of length <= exactCap — 2^(len-1) candidates, so
  * the cap bounds the blow-up; longer runs fall back to prefixes. */
final case class AtLeast(min: Int, combinations: Boolean,
                         exactCap: Int = 0) extends Quantifier

object Times {
  /** times(n) — exact count, overlapping candidates (NO_SKIP). */
  def apply(n: Int): TimesRange = TimesRange(n, n, greedy = false)
}

/** After-match pruning (reference `AfterMatchSkipStrategy.java:121`):
  * candidate matches are processed in ascending (start, end) order with a
  * pruning horizon that advances as matches are emitted; a match starting
  * before the horizon is discarded — exactly the reference's partial-match
  * pruning, restated over the enumerated match stream.
  *  - [[NoSkip]]: emit every match (default);
  *  - [[SkipPastLastEvent]]: the next match must start strictly after the
  *    emitted match's last event;
  *  - [[SkipToFirst]] / [[SkipToLast]]: the next match must start at or
  *    after the first/last event the named stage bound in the emitted
  *    match (unbound stage → falls back to the match start: no pruning,
  *    the reference's non-throwing behavior). */
sealed trait SkipStrategy
case object NoSkip extends SkipStrategy
case object SkipPastLastEvent extends SkipStrategy
final case class SkipToFirst(stage: String) extends SkipStrategy
final case class SkipToLast(stage: String) extends SkipStrategy

sealed trait Contiguity
case object Strict extends Contiguity      // next
case object Relaxed extends Contiguity     // followedBy
case object RelaxedAny extends Contiguity  // followedByAny
case object StrictNot extends Contiguity   // notNext (negative lookahead)
case object RelaxedNot extends Contiguity  // notFollowedBy (negative gap)

final case class Stage[T](name: String, predicate: T => Boolean,
                          contiguity: Contiguity, quantifier: Quantifier,
                          optional: Boolean = false,
                          until: Option[T => Boolean] = None,
                          strictInner: Boolean = false) {
  def isNegative: Boolean =
    contiguity == StrictNot || contiguity == RelaxedNot
  def isLoop: Boolean = quantifier match {
    case Once => false
    case _    => true
  }
}

final case class Pattern[T](stages: Vector[Stage[T]],
                            withinMs: Option[Long] = None,
                            skip: SkipStrategy = NoSkip) {

  def next(name: String)(pred: T => Boolean): Pattern[T] =
    copy(stages = stages :+ Stage(name, pred, Strict, Once))

  def followedBy(name: String)(pred: T => Boolean): Pattern[T] =
    copy(stages = stages :+ Stage(name, pred, Relaxed, Once))

  /** Binds every later matching event, not just the earliest (reference
    * `followedByAny` `Pattern.java:316`). */
  def followedByAny(name: String)(pred: T => Boolean): Pattern[T] =
    copy(stages = stages :+ Stage(name, pred, RelaxedAny, Once))

  /** Negative lookahead (reference `Pattern.notNext` `Pattern.java:267`). */
  def notNext(name: String)(pred: T => Boolean): Pattern[T] =
    copy(stages = stages :+ Stage(name, pred, StrictNot, Once))

  /** Negative gap condition (reference `notFollowedBy` `Pattern.java:298`):
    * no matching event between the surrounding positive stages. */
  def notFollowedBy(name: String)(pred: T => Boolean): Pattern[T] =
    copy(stages = stages :+ Stage(name, pred, RelaxedNot, Once))

  /** Exactly n consecutive events (reference `times(n)` `Pattern.java:380`). */
  def times(n: Int): Pattern[T] = {
    require(n >= 1, "times(n) requires n >= 1")
    modLoopable("times")(_.copy(quantifier = Times(n)))
  }

  /** Each count in [from,to] consecutive events (reference `times(from,to)`
    * `Pattern.java:394`) — one candidate match per feasible count. */
  def times(from: Int, to: Int): Pattern[T] = {
    require(from >= 1 && to >= from, "times(from,to) requires 1 <= from <= to")
    modLoopable("times")(_.copy(quantifier = TimesRange(from, to, greedy = false)))
  }

  /** At least n consecutive events, greedy maximal (reference `timesOrMore`
    * `Pattern.java:414`). */
  def timesOrMore(n: Int): Pattern[T] = {
    require(n >= 1, "timesOrMore(n) requires n >= 1")
    modLoopable("timesOrMore")(_.copy(quantifier = AtLeast(n, combinations = false)))
  }

  def oneOrMore: Pattern[T] =
    modLoopable("oneOrMore")(_.copy(quantifier = AtLeast(1, combinations = false)))

  /** Only the maximal feasible count for a `times(from,to)` stage
    * (reference `greedy` `Pattern.java:361`). */
  def greedy: Pattern[T] = modLast { s =>
    s.quantifier match {
      case TimesRange(lo, hi, _) => s.copy(quantifier = TimesRange(lo, hi, greedy = true))
      case _: AtLeast            => s // already greedy-maximal by pinned semantics
      case Once =>
        throw new IllegalArgumentException("greedy requires a looping quantifier")
    }
  }

  /** Strict inner contiguity for the last looping stage: the run stops at
    * the first non-matching event instead of skipping it (reference
    * `consecutive` `Pattern.java:474`; relaxed is the default, as there). */
  def consecutive: Pattern[T] = modLast { s =>
    require(s.isLoop, "consecutive requires a looping quantifier")
    // the EXACT combinations enumeration emits bindings that skip events
    // inside the run, which contradicts strict contiguity (the reference
    // treats them as mutually exclusive consumption modes). The pinned
    // prefix approximation is contiguous, so plain allowCombinations +
    // consecutive stays coherent (oracle row cep_combinations).
    require(s.quantifier match {
      case AtLeast(_, _, cap) => cap == 0
      case _                  => true
    }, "consecutive contradicts allowCombinationsExact on the same stage")
    s.copy(strictInner = true)
  }

  /** Additionally emit every prefix of the maximal run (bounded pinned
    * subset of reference `allowCombinations` `Pattern.java:435`). */
  def allowCombinations: Pattern[T] = modLast { s =>
    s.quantifier match {
      case AtLeast(min, _, cap) =>
        s.copy(quantifier = AtLeast(min, combinations = true, cap))
      case _ =>
        throw new IllegalArgumentException("allowCombinations requires oneOrMore/timesOrMore")
    }
  }

  /** EXACT `allowCombinations` (reference `Pattern.java:435`, NFA
    * TAKE/IGNORE branching): for runs of up to `cap` events, emit every
    * order-preserving subset of the run that contains its first event —
    * the reference's full non-contiguous enumeration, 2^(len-1)
    * candidates per run. Opt-in capped because the enumeration is
    * exponential; runs longer than `cap` fall back to the prefix
    * approximation (the pinned default). */
  def allowCombinationsExact(cap: Int = 15): Pattern[T] = modLast { s =>
    require(cap >= 1 && cap <= 24,
      s"allowCombinationsExact cap must be in [1, 24] (2^(cap-1) candidates); got $cap")
    require(!s.strictInner,
      "allowCombinationsExact contradicts consecutive on the same stage")
    s.quantifier match {
      case AtLeast(min, _, _) =>
        s.copy(quantifier = AtLeast(min, combinations = true, exactCap = cap))
      case _ =>
        throw new IllegalArgumentException("allowCombinationsExact requires oneOrMore/timesOrMore")
    }
  }

  /** The stage may bind zero events (reference `optional` `Pattern.java:327`). */
  def optional: Pattern[T] = modLast { s =>
    require(!s.isNegative, "optional cannot apply to a negative stage")
    require(stages.length > 1, "optional cannot apply to the pattern head")
    s.copy(optional = true)
  }

  /** Stop condition for a looping stage (reference `until` `Pattern.java:214`). */
  def until(pred: T => Boolean): Pattern[T] = modLast { s =>
    require(s.isLoop, "until requires a looping quantifier")
    s.copy(until = Some(pred))
  }

  /** Conjunctive refinement of the last stage's condition (reference
    * `Pattern.where` `Pattern.java:150` — multiple wheres AND together). */
  def where(pred: T => Boolean): Pattern[T] =
    modLast(s => s.copy(predicate = (t: T) => s.predicate(t) && pred(t)))

  /** Disjunctive extension of the last stage's condition (reference
    * `Pattern.or` `Pattern.java:172`). */
  def or(pred: T => Boolean): Pattern[T] =
    modLast(s => s.copy(predicate = (t: T) => s.predicate(t) || pred(t)))

  /** Restrict the last stage to a subtype (reference `subtype`
    * `Pattern.java:193`) — ANDs an instance-of check into the condition. */
  def subtype[S <: T](implicit ct: ClassTag[S]): Pattern[T] =
    where(t => ct.runtimeClass.isInstance(t))

  def within(ms: Long): Pattern[T] = copy(withinMs = Some(ms))

  /** Stages whose greedy loop runs can NEVER provably close without a
    * `within` window: relaxed inner contiguity (no strict-inner break),
    * no `until` stop condition, and a greedy-maximal quantifier (AtLeast,
    * or a greedy TimesRange) — ANY future matching event could still
    * extend such a run, so the streaming matcher holds it OPEN forever.
    * Empty when `within` is set (the window closes every run). */
  def unclosableLoopStages: Vector[String] =
    if (withinMs.isDefined) Vector.empty
    else stages.collect {
      case s if s.isLoop && !s.isNegative && !s.strictInner &&
        s.until.isEmpty && (s.quantifier match {
          case _: AtLeast               => true
          case TimesRange(_, _, greedy) => greedy
          case _                        => false
        }) => s.name
    }

  /** Attach an after-match skip strategy (reference passes it to
    * `Pattern.begin(name, skipStrategy)`; fluent here). */
  def afterMatchSkip(s: SkipStrategy): Pattern[T] = copy(skip = s)

  private def modLast(f: Stage[T] => Stage[T]): Pattern[T] =
    copy(stages = stages.init :+ f(stages.last))

  /** Quantifier modifiers fail fast on negative stages — the matcher's
    * negative branches never consult the quantifier, so silently accepting
    * one would change nothing (reference throws MalformedPatternException). */
  private def modLoopable(op: String)(f: Stage[T] => Stage[T]): Pattern[T] = {
    require(!stages.last.isNegative,
      s"$op cannot apply to a negative stage (notNext/notFollowedBy)")
    modLast(f)
  }
}

object Pattern {
  def begin[T](name: String)(pred: T => Boolean): Pattern[T] =
    Pattern(Vector(Stage(name, pred, Relaxed, Once)))
}

/** One successful match: stage name → the bound events, in order. */
final case class PatternMatch[T](bindings: Vector[(String, Vector[T])]) {
  def apply(stage: String): Vector[T] =
    bindings.collectFirst { case (n, es) if n == stage => es }.get
  def first(stage: String): T = apply(stage).head
  def last(stage: String): T = apply(stage).last
  /** Last bound event across all stages — negative/optional stages bind
    * nothing, so this walks back to the last non-empty binding. */
  def lastBound: Option[T] =
    bindings.reverseIterator.map(_._2).collectFirst { case v if v.nonEmpty => v.last }
  def firstBound: Option[T] =
    bindings.iterator.map(_._2).collectFirst { case v if v.nonEmpty => v.head }
}

package graft.cep

/** CEP pattern AST — the reference's fluent Pattern API subset
  * (`flink-libraries/flink-cep/.../pattern/Pattern.java`: begin :123,
  * where :150, next :256, followedBy :285, within :239, times / oneOrMore
  * via `pattern/Quantifier.java`).
  *
  * Match semantics (pinned, so the DuckDB oracle can express them):
  *  - `next` (strict contiguity): the stage must match the immediately
  *    following event in the key's event-time order;
  *  - `followedBy` (relaxed contiguity): the stage binds to the EARLIEST
  *    later event that matches;
  *  - `times(n)`: n consecutive events all matching; candidate matches may
  *    overlap (AfterMatchSkip = NO_SKIP);
  *  - `oneOrMore`: greedy maximal consecutive run; only run-starts spawn a
  *    match (AfterMatchSkip = PAST_LAST_EVENT), so runs never overlap;
  *  - `within(ms)`: last bound event's time minus first bound event's time
  *    must be ≤ the bound (reference Pattern.within).
  */
sealed trait Quantifier
case object Once extends Quantifier
final case class Times(n: Int) extends Quantifier
case object OneOrMore extends Quantifier

sealed trait Contiguity
case object Strict extends Contiguity    // next
case object Relaxed extends Contiguity   // followedBy
case object StrictNot extends Contiguity // notNext (negative lookahead)

final case class Stage[T](name: String, predicate: T => Boolean,
                          contiguity: Contiguity, quantifier: Quantifier)

final case class Pattern[T](stages: Vector[Stage[T]],
                            withinMs: Option[Long] = None) {

  def next(name: String)(pred: T => Boolean): Pattern[T] =
    copy(stages = stages :+ Stage(name, pred, Strict, Once))

  def followedBy(name: String)(pred: T => Boolean): Pattern[T] =
    copy(stages = stages :+ Stage(name, pred, Relaxed, Once))

  /** Negative lookahead (reference `Pattern.notNext` `Pattern.java:267`):
    * the immediately following event must NOT match; nothing is bound and
    * the position does not advance. */
  def notNext(name: String)(pred: T => Boolean): Pattern[T] =
    copy(stages = stages :+ Stage(name, pred, StrictNot, Once))

  /** Applies to the LAST stage added. */
  def times(n: Int): Pattern[T] = {
    require(n >= 1); modLast(_.copy(quantifier = Times(n)))
  }
  def oneOrMore: Pattern[T] = modLast(_.copy(quantifier = OneOrMore))

  /** Conjunctive refinement of the last stage's condition (reference
    * `Pattern.where` `Pattern.java:150` — multiple wheres AND together). */
  def where(pred: T => Boolean): Pattern[T] =
    modLast(s => s.copy(predicate = (t: T) => s.predicate(t) && pred(t)))

  /** Disjunctive extension of the last stage's condition (reference
    * `Pattern.or` `Pattern.java:172`). */
  def or(pred: T => Boolean): Pattern[T] =
    modLast(s => s.copy(predicate = (t: T) => s.predicate(t) || pred(t)))

  def within(ms: Long): Pattern[T] = copy(withinMs = Some(ms))

  private def modLast(f: Stage[T] => Stage[T]): Pattern[T] =
    copy(stages = stages.init :+ f(stages.last))
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
}

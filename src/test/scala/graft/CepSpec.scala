package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.cep.{Cep, Pattern, PatternMatch}
import graft.streaming.EventStream.EventRow

/** CEP matcher semantics (pure) + streaming application across batches. */
class CepSpec extends SparkSpecBase {

  private def e(id: Long, t: Long, typ: String): EventRow =
    EventRow(id, new Timestamp(t * 1000L), 1L, typ, 1.0, "{}")

  private def ids(m: PatternMatch[EventRow], stage: String): Seq[Long] =
    m(stage).map(_.event_id)

  private def run(events: Seq[EventRow], p: Pattern[EventRow]) =
    Cep.matchAll(events.toIndexedSeq, p, (x: EventRow) => x.ts.getTime).toVector

  test("strict next only matches adjacent events") {
    val evs = Seq(e(1, 10, "a"), e(2, 20, "x"), e(3, 30, "a"), e(4, 40, "b"))
    val p = Pattern.begin[EventRow]("s")(_.event_type == "a")
      .next("t")(_.event_type == "b")
    val ms = run(evs, p)
    assert(ms.map(m => (ids(m, "s").head, ids(m, "t").head)) == Vector((3L, 4L)))
  }

  test("followedBy skips non-matching and binds the earliest candidate") {
    val evs = Seq(e(1, 10, "a"), e(2, 20, "x"), e(3, 30, "b"), e(4, 40, "b"))
    val p = Pattern.begin[EventRow]("s")(_.event_type == "a")
      .followedBy("t")(_.event_type == "b")
    val ms = run(evs, p)
    assert(ms.map(m => ids(m, "t").head) == Vector(3L))
  }

  test("within rejects matches wider than the bound") {
    val evs = Seq(e(1, 0, "a"), e(2, 100, "b"))
    val p = Pattern.begin[EventRow]("s")(_.event_type == "a")
      .followedBy("t")(_.event_type == "b")
    assert(run(evs, p.within(50 * 1000L)).isEmpty)
    assert(run(evs, p.within(150 * 1000L)).size == 1)
  }

  test("times(k) matches overlapping consecutive windows") {
    val evs = Seq(e(1, 1, "r"), e(2, 2, "r"), e(3, 3, "r"), e(4, 4, "r"))
    val p = Pattern.begin[EventRow]("r")(_.event_type == "r").times(3)
    val ms = run(evs, p)
    assert(ms.map(m => ids(m, "r")) ==
      Vector(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)))
  }

  test("oneOrMore binds the maximal RELAXED run, skipping non-matching events") {
    val evs = Seq(e(1, 1, "v"), e(2, 2, "v"), e(3, 3, "x"), e(4, 4, "v"))
    // reference default (Pattern.java:352): relaxed inner contiguity — the
    // run skips x and binds every v
    val p = Pattern.begin[EventRow]("v")(_.event_type == "v").oneOrMore
    assert(run(evs, p).map(m => ids(m, "v")) == Vector(Seq(1L, 2L, 4L)))
    // consecutive() opts into strict inner contiguity: runs break at x
    val c = Pattern.begin[EventRow]("v")(_.event_type == "v").oneOrMore.consecutive
    assert(run(evs, c).map(m => ids(m, "v")) == Vector(Seq(1L, 2L), Seq(4L)))
  }

  test("where ANDs and or ORs into the last stage's condition") {
    val evs = Seq(e(1, 1, "a"), e(2, 2, "b"), e(3, 3, "c"))
    val base = Pattern.begin[EventRow]("x")(_.event_type == "a")
    // or: a|c matches ids 1 and 3
    assert(run(evs, base.or(_.event_type == "c"))
      .map(m => ids(m, "x").head) == Vector(1L, 3L))
    // where: a AND id>1 matches nothing
    assert(run(evs, base.where(_.event_id > 1)).isEmpty)
  }

  test("notNext succeeds only when the following event does not match") {
    val evs = Seq(e(1, 1, "a"), e(2, 2, "x"), e(3, 3, "a"), e(4, 4, "b"))
    val p = Pattern.begin[EventRow]("s")(_.event_type == "a")
      .notNext("no_b")(_.event_type == "b")
    // id 1 (followed by x) matches; id 3 (followed by b) does not
    assert(run(evs, p).map(m => ids(m, "s").head) == Vector(1L))
    // negative stage binds nothing
    assert(run(evs, p).head("no_b").isEmpty)
  }

  test("notFollowedBy rejects matches with an intervening negative event") {
    val evs = Seq(e(1, 1, "a"), e(2, 2, "x"), e(3, 3, "b"),
                  e(4, 4, "a"), e(5, 5, "n"), e(6, 6, "b"))
    val p = Pattern.begin[EventRow]("s")(_.event_type == "a")
      .notFollowedBy("no_n")(_.event_type == "n")
      .followedBy("t")(_.event_type == "b")
    // start 1: gap {x} clean → match; start 4: gap {n} → rejected
    assert(run(evs, p).map(m => ids(m, "s").head) == Vector(1L))
  }

  test("notFollowedBy cannot be the final stage") {
    val p = Pattern.begin[EventRow]("s")(_.event_type == "a")
      .notFollowedBy("n")(_.event_type == "b")
    intercept[IllegalArgumentException] { run(Seq(e(1, 1, "a")), p) }
  }

  test("followedByAny binds every later candidate, not just the earliest") {
    val evs = Seq(e(1, 10, "a"), e(2, 20, "x"), e(3, 30, "b"), e(4, 40, "b"))
    val p = Pattern.begin[EventRow]("s")(_.event_type == "a")
      .followedByAny("t")(_.event_type == "b")
    assert(run(evs, p).map(m => ids(m, "t").head) == Vector(3L, 4L))
  }

  test("times(from,to) emits one candidate per feasible count; greedy only the max") {
    val evs = Seq(e(1, 1, "r"), e(2, 2, "r"), e(3, 3, "r"), e(4, 4, "x"))
    val p = Pattern.begin[EventRow]("r")(_.event_type == "r").times(2, 4)
    // anchor 1: k=2,3; anchor 2: k=2 (run caps at event 3)
    assert(run(evs, p).map(m => ids(m, "r")) ==
      Vector(Seq(1L, 2L), Seq(1L, 2L, 3L), Seq(2L, 3L)))
    val g = Pattern.begin[EventRow]("r")(_.event_type == "r").times(2, 4).greedy
    assert(run(evs, g).map(m => ids(m, "r")) ==
      Vector(Seq(1L, 2L, 3L), Seq(2L, 3L)))
  }

  test("timesOrMore(n) binds the greedy maximal run of at least n") {
    val evs = Seq(e(1, 1, "r"), e(2, 2, "r"), e(3, 3, "r"), e(4, 4, "x"), e(5, 5, "r"))
    // relaxed default: the run continues past x to r5
    val p = Pattern.begin[EventRow]("r")(_.event_type == "r").timesOrMore(2)
    assert(run(evs, p).map(m => ids(m, "r")) == Vector(Seq(1L, 2L, 3L, 5L)))
    // consecutive(): the run stops at x
    val c = Pattern.begin[EventRow]("r")(_.event_type == "r")
      .timesOrMore(2).consecutive
    assert(run(evs, c).map(m => ids(m, "r")) == Vector(Seq(1L, 2L, 3L)))
  }

  test("a loop run stops at the within-window edge instead of dying") {
    val evs = Seq(e(1, 0, "v"), e(2, 5, "v"), e(3, 100, "v"))
    val p = Pattern.begin[EventRow]("v")(_.event_type == "v")
      .oneOrMore.within(10 * 1000L)
    // run from v1 takes v2 and stops at v3 (outside the window); v3 then
    // starts its own run
    assert(run(evs, p).map(m => ids(m, "v")) == Vector(Seq(1L, 2L), Seq(3L)))
  }

  test("optional stage branches into skipped and bound candidates") {
    val evs = Seq(e(1, 1, "a"), e(2, 2, "v"), e(3, 3, "b"))
    val p = Pattern.begin[EventRow]("s")(_.event_type == "a")
      .followedBy("v")(_.event_type == "v").optional
      .followedBy("t")(_.event_type == "b")
    val ms = run(evs, p)
    assert(ms.map(m => (ids(m, "v"), ids(m, "t").head)).toSet ==
      Set((Seq.empty[Long], 3L), (Seq(2L), 3L)))
  }

  test("until stops a loop at the first matching event without consuming it") {
    val evs = Seq(e(1, 1, "v"), e(2, 2, "v"), e(3, 3, "v"), e(4, 4, "x"))
    val p = Pattern.begin[EventRow]("v")(_.event_type == "v")
      .oneOrMore.until(_.event_id == 3)
    assert(run(evs, p).map(m => ids(m, "v")) == Vector(Seq(1L, 2L)))
  }

  test("allowCombinations emits every prefix of the maximal run") {
    val evs = Seq(e(1, 1, "v"), e(2, 2, "v"), e(3, 3, "v"), e(4, 4, "x"))
    val p = Pattern.begin[EventRow]("v")(_.event_type == "v")
      .oneOrMore.allowCombinations
    assert(run(evs, p).map(m => ids(m, "v")) ==
      Vector(Seq(1L), Seq(1L, 2L), Seq(1L, 2L, 3L)))
  }

  test("allowCombinationsExact enumerates every anchored subset of the run") {
    val evs = Seq(e(1, 1, "v"), e(2, 2, "v"), e(3, 3, "v"), e(4, 4, "x"))
    val p = Pattern.begin[EventRow]("v")(_.event_type == "v")
      .oneOrMore.allowCombinationsExact()
    // reference NFA TAKE/IGNORE semantics: every order-preserving subset
    // of the run [1,2,3] that contains its anchor 1 — a strict superset
    // of the prefix approximation
    val got = run(evs, p).map(m => ids(m, "v")).toSet
    assert(got == Set(Seq(1L), Seq(1L, 2L), Seq(1L, 3L), Seq(1L, 2L, 3L)))
    val prefixes = run(evs,
      Pattern.begin[EventRow]("v")(_.event_type == "v")
        .oneOrMore.allowCombinations).map(m => ids(m, "v")).toSet
    assert(prefixes.subsetOf(got) && got.size == 1 << 2)
  }

  test("EXACT combinations and consecutive reject each other; prefix mode composes") {
    val base = Pattern.begin[EventRow]("v")(_.event_type == "v").oneOrMore
    // exact enumeration skips events inside the run — contradictory
    intercept[IllegalArgumentException](base.consecutive.allowCombinationsExact())
    intercept[IllegalArgumentException](base.allowCombinationsExact().consecutive)
    // the pinned prefix approximation is contiguous — composes both ways
    // (the cep_combinations oracle row runs consecutive.allowCombinations)
    base.consecutive.allowCombinations
    base.allowCombinations.consecutive
  }

  test("allowCombinationsExact: subsets feed later stages from the last taken event") {
    val evs = Seq(e(1, 1, "v"), e(2, 2, "v"), e(3, 3, "v"), e(4, 4, "b"))
    val p = Pattern.begin[EventRow]("v")(_.event_type == "v")
      .oneOrMore.allowCombinationsExact()
      .followedBy("t")(_.event_type == "b")
    val ms = run(evs, p)
    assert(ms.map(m => (ids(m, "v"), ids(m, "t").head)).toSet ==
      Set((Seq(1L), 4L), (Seq(1L, 2L), 4L), (Seq(1L, 3L), 4L),
        (Seq(1L, 2L, 3L), 4L)))
    // min bound applies to the subset size, not the run length
    val p2 = Pattern.begin[EventRow]("v")(_.event_type == "v")
      .timesOrMore(2).allowCombinationsExact()
    assert(run(evs, p2).map(m => ids(m, "v")).toSet ==
      Set(Seq(1L, 2L), Seq(1L, 3L), Seq(1L, 2L, 3L)))
  }

  test("allowCombinationsExact falls back to prefixes past the cap") {
    val evs = (1 to 6).map(i => e(i, i, "v")) :+ e(7, 7, "x")
    val exact = Pattern.begin[EventRow]("v")(_.event_type == "v")
      .oneOrMore.allowCombinationsExact(cap = 4)
    // run length 6 > cap 4: prefix approximation
    assert(run(evs, exact).map(m => ids(m, "v")) ==
      (1 to 6).map(k => (1L to k.toLong)).toVector)
    val inCap = Pattern.begin[EventRow]("v")(_.event_type == "v")
      .oneOrMore.allowCombinationsExact(cap = 6)
    assert(run(evs, inCap).size == 1 << 5)
    intercept[IllegalArgumentException] {
      Pattern.begin[EventRow]("v")(_.event_type == "v")
        .oneOrMore.allowCombinationsExact(cap = 30)
    }
  }

  test("subtype restricts the stage to instances of the subtype") {
    sealed trait Ev { def t: Long }
    case class Click(t: Long) extends Ev
    case class View(t: Long) extends Ev
    val evs: IndexedSeq[Ev] = Vector(Click(1), View(2), Click(3))
    val p = Pattern.begin[Ev]("s")(_ => true).subtype[Click]
    val ms = Cep.matchAll(evs, p, (x: Ev) => x.t).toVector
    assert(ms.map(_.first("s").t) == Vector(1L, 3L))
  }

  test("quantifier and loop modifiers fail fast on negative stages") {
    val base = Pattern.begin[EventRow]("s")(_.event_type == "a")
      .notNext("n")(_.event_type == "b")
    intercept[IllegalArgumentException] { base.times(2) }
    intercept[IllegalArgumentException] { base.oneOrMore }
    intercept[IllegalArgumentException] { base.timesOrMore(2) }
    intercept[IllegalArgumentException] { base.optional }
    intercept[IllegalArgumentException] {
      Pattern.begin[EventRow]("s")(_ => true).optional
    }
  }

  test("oneOrMore followed by notNext does not crash and matches closed runs") {
    val evs = Seq(e(1, 1, "v"), e(2, 2, "v"), e(3, 3, "b"),
                  e(4, 4, "v"), e(5, 5, "x"))
    // relaxed default: ONE run {1,2,4} (skips b), followed by x → match
    val p = Pattern.begin[EventRow]("v")(_.event_type == "v")
      .oneOrMore.notNext("no_b")(_.event_type == "b")
    assert(run(evs, p).map(m => ids(m, "v")) == Vector(Seq(1L, 2L, 4L)))
    // consecutive: run (1,2) is followed by b → rejected; run (4) → match
    val c = Pattern.begin[EventRow]("v")(_.event_type == "v")
      .oneOrMore.consecutive.notNext("no_b")(_.event_type == "b")
    assert(run(evs, c).map(m => ids(m, "v")) == Vector(Seq(4L)))
  }

  test("timedOut yields partial prefixes for starts whose window closed") {
    val w = 10 * 1000L
    val evs = Seq(e(1, 0, "a"), e(2, 5, "b"),      // completes in window
                  e(3, 20, "a"),                    // no b before window closes
                  e(4, 40, "a"))                    // window still open at end
    val p = Pattern.begin[EventRow]("s")(_.event_type == "a")
      .followedBy("t")(_.event_type == "b").within(w)
    val outs = Cep.timedOut(evs.toIndexedSeq, p,
      (x: EventRow) => x.ts.getTime).toVector
    assert(outs.map(m => ids(m, "s").head) == Vector(3L))
    assert(outs.head.bindings.map(_._1) == Vector("s"))
  }

  test("skipPastLastEvent keeps only non-overlapping pairs, left-greedy") {
    import graft.cep.SkipPastLastEvent
    // run of 5 errors: NO_SKIP pairs start at 1,2,3,4; skip keeps 1-2, 3-4
    val evs = (1L to 5L).map(i => e(i, i, "r"))
    val p = Pattern.begin[EventRow]("r")(_.event_type == "r").times(2)
    assert(run(evs, p).size == 4)
    val ms = runBatch(evs, p.afterMatchSkip(SkipPastLastEvent))
    assert(ms == Vector("r:1,2", "r:3,4"), s"$ms")
  }

  test("skipToLast prunes the k=3 extension but keeps every adjacent pair") {
    import graft.cep.SkipToLast
    val evs = (1L to 4L).map(i => e(i, i, "r"))
    val p = Pattern.begin[EventRow]("r")(_.event_type == "r").times(2, 3)
    assert(run(evs, p).size == 5) // (1,2) (1,2,3) (2,3) (2,3,4) (3,4)
    val ms = runBatch(evs, p.afterMatchSkip(SkipToLast("r")))
    assert(ms == Vector("r:1,2", "r:2,3", "r:3,4"), s"$ms")
  }

  test("skipToFirst of a later stage prunes matches starting before it") {
    import graft.cep.SkipToFirst
    // a a b: followedBy binds earliest b for both starts; skipToFirst(t)
    // emits the a1 match (horizon -> b at 30), then prunes the a2 match
    val evs = Seq(e(1, 10, "a"), e(2, 20, "a"), e(3, 30, "b"))
    val p = Pattern.begin[EventRow]("s")(_.event_type == "a")
      .followedBy("t")(_.event_type == "b")
    assert(run(evs, p).size == 2)
    val ms = runBatch(evs, p.afterMatchSkip(SkipToFirst("t")))
    assert(ms == Vector("s:1;t:3"), s"$ms")
  }

  test("streaming step persists the skip horizon across batches") {
    import graft.cep.{Cep, SkipPastLastEvent}
    import graft.cep.Cep.CepState
    val p = Pattern.begin[EventRow]("r")(_.event_type == "r").times(2)
      .afterMatchSkip(SkipPastLastEvent)
    val ordFn = (x: EventRow) => (x.ts.getTime, x.event_id)
    var st = CepState[EventRow](Vector.empty, Vector.empty)
    var got = Vector.empty[Seq[Long]]
    // errors 1..5 arrive one per batch: pairs (1,2) and (3,4) only — the
    // (2,3) pair would be fresh in batch 3 but starts before the horizon
    for (i <- 1 to 5) {
      val (next, fresh, _) = Cep.step(st, Seq(e(i.toLong, i.toLong, "r")), p,
        ordFn, None)
      st = next
      got ++= fresh.map(m => ids(m, "r"))
    }
    assert(got == Vector(Seq(1L, 2L), Seq(3L, 4L)), s"$got")
  }

  /** Run the skip-aware batch path on a local one-key dataset; each match
    * serializes its non-empty bindings as "stage:id,id;stage:id". */
  private def runBatch(events: Seq[EventRow], p: Pattern[EventRow]): Vector[String] = {
    import spark.implicits._
    Cep.batch(events.toDS(), (x: EventRow) => x.user_id,
      (x: EventRow) => (x.ts.getTime, x.event_id), p) { (_, m) =>
      m.bindings.filter(_._2.nonEmpty)
        .map { case (n, es) => n + ":" + es.map(_.event_id).mkString(",") }
        .mkString(";")
    }.collect().toVector.sorted
  }

  test("streaming step emits each timed-out start exactly once") {
    import graft.cep.Cep.CepState
    val w = 10 * 1000L
    val p = Pattern.begin[EventRow]("a")(_.event_type == "click")
      .followedBy("b")(_.event_type == "purchase").within(w)
    val ordFn = (x: EventRow) => (x.ts.getTime, x.event_id)
    val st0 = CepState[EventRow](Vector.empty, Vector.empty)
    // lone click at t=0; window still open while maxTs ≤ 10s
    val (s1, f1, t1) = Cep.step(st0, Seq(e(1, 0, "click")), p, ordFn, None)
    assert(f1.isEmpty && t1.isEmpty)
    val (s2, _, t2) = Cep.step(s1, Seq(e(2, 5, "view")), p, ordFn, None)
    assert(t2.isEmpty)
    // t=11 closes the window: timeout fires AND the start is evicted
    val (s3, _, t3) = Cep.step(s2, Seq(e(3, 11, "view")), p, ordFn, None)
    assert(t3.map(_.first("a").event_id) == Vector(1L), s"$t3")
    assert(!s3.buffer.exists(_.event_id == 1L))
    // later batches cannot re-emit the evicted start
    val (_, _, t4) = Cep.step(s3, Seq(e(4, 12, "view")), p, ordFn, None)
    assert(t4.isEmpty)
  }

  test("streaming step keeps buffer and emitted signatures bounded") {
    import graft.cep.Cep.CepState
    val w = 10 * 1000L
    val p = Pattern.begin[EventRow]("s")(_.event_type == "a")
      .next("t")(_.event_type == "b").within(w)
    val ordFn = (x: EventRow) => (x.ts.getTime, x.event_id)
    var st = CepState[EventRow](Vector.empty, Vector.empty)
    var total = 0
    // 200 batches of an a→b pair each, marching forward in time
    for (i <- 0 until 200) {
      val t0 = i * 60L
      val (next, fresh, _) = Cep.step(st,
        Seq(e(2L * i, t0, "a"), e(2L * i + 1, t0 + 1, "b")), p, ordFn, None)
      st = next
      total += fresh.size
    }
    assert(total == 200)
    // within(10s) horizon: only the most recent events/signatures survive
    assert(st.buffer.size <= 4, s"buffer grew to ${st.buffer.size}")
    assert(st.emitted.size <= 4, s"emitted grew to ${st.emitted.size}")
  }

  test("streaming step with retentionMs bounds state when within is absent") {
    import graft.cep.Cep.CepState
    val p = Pattern.begin[EventRow]("s")(_.event_type == "a")
      .next("t")(_.event_type == "b")
    val ordFn = (x: EventRow) => (x.ts.getTime, x.event_id)
    var st = CepState[EventRow](Vector.empty, Vector.empty)
    for (i <- 0 until 100) {
      val t0 = i * 60L
      val (next, _, _) = Cep.step(st,
        Seq(e(2L * i, t0, "a"), e(2L * i + 1, t0 + 1, "b")), p, ordFn,
        retentionMs = Some(120 * 1000L))
      st = next
    }
    assert(st.buffer.size <= 8, s"buffer grew to ${st.buffer.size}")
    assert(st.emitted.size <= 8, s"emitted grew to ${st.emitted.size}")
  }

  test("streaming holds an open relaxed run and emits once the window closes") {
    import graft.cep.Cep.CepState
    val p = Pattern.begin[EventRow]("v")(_.event_type == "v")
      .oneOrMore.within(10 * 1000L)
    val ordFn = (x: EventRow) => (x.ts.getTime, x.event_id)
    val (s1, f1, _) = Cep.step(CepState[EventRow](Vector.empty, Vector.empty),
      Seq(e(1, 0, "v"), e(2, 2, "x"), e(3, 4, "v")), p, ordFn, None)
    assert(f1.isEmpty, s"open run must be held: $f1") // a later v could extend it
    val (s2, f2, _) = Cep.step(s1, Seq(e(4, 8, "v")), p, ordFn, None)
    assert(f2.isEmpty)
    // t=20 closes the window → the maximal relaxed run {1,3,4} emits
    val (s3, f3, _) = Cep.step(s2, Seq(e(5, 20, "x")), p, ordFn, None)
    assert(f3.map(m => ids(m, "v")) == Vector(Seq(1L, 3L, 4L)), s"$f3")
    // the head floor bars the evicted run's surviving events from minting
    // a false start after eviction
    val (_, f4, _) = Cep.step(s3, Seq(e(6, 40, "x")), p, ordFn, None)
    assert(f4.isEmpty, s"false start after eviction: $f4")
  }

  test("head floor prevents false run starts when eviction drops a run prefix") {
    import graft.cep.Cep.CepState
    val p = Pattern.begin[EventRow]("v")(_.event_type == "v")
      .oneOrMore.within(8 * 1000L)
    val ordFn = (x: EventRow) => (x.ts.getTime, x.event_id)
    var st = CepState[EventRow](Vector.empty, Vector.empty)
    var fresh = Vector.empty[Seq[Long]]
    // v@0 v@7 then x@14: the run {1,2} window-closes and emits; eviction
    // keeps only ts ≥ 6 — v@7 survives but must NOT become a new start
    // (without the floor it would re-emit as a false single-element run)
    for (batch <- Seq(Seq(e(1, 0, "v")), Seq(e(2, 7, "v")), Seq(e(3, 14, "x")),
                      Seq(e(4, 30, "x")))) {
      val (next, f, _) = Cep.step(st, batch, p, ordFn, None)
      st = next
      fresh ++= f.map(m => ids(m, "v"))
    }
    assert(fresh == Vector(Seq(1L, 2L)), s"$fresh")
  }

  test("streaming without within or retention fails fast unless opted out") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val p = Pattern.begin[EventRow]("a")(_.event_type == "click")
      .next("b")(_.event_type == "purchase")
    val ordFn = (x: EventRow) => (x.ts.getTime, x.event_id)
    intercept[IllegalArgumentException] {
      Cep.streaming(input.toDS(), (x: EventRow) => x.user_id, ordFn, p) {
        (k, m) => (k, m.first("a").event_id)
      }
    }
    // any one bound (within / retention / explicit opt-out) constructs
    Cep.streaming(input.toDS(), (x: EventRow) => x.user_id, ordFn,
      p.within(60 * 1000L)) { (k, m) => (k, m.first("a").event_id) }
    Cep.streaming(input.toDS(), (x: EventRow) => x.user_id, ordFn, p,
      retentionMs = Some(60 * 1000L)) { (k, m) => (k, m.first("a").event_id) }
    Cep.streaming(input.toDS(), (x: EventRow) => x.user_id, ordFn, p,
      unboundedState = true) { (k, m) => (k, m.first("a").event_id) }
  }

  test("retention + unclosable greedy loop is rejected at construction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val ordFn = (x: EventRow) => (x.ts.getTime, x.event_id)
    // a relaxed greedy loop with neither within nor until never closes a
    // run; with retentionMs eviction would silently drop every OPEN run —
    // the query would emit zero matches forever. Must fail fast instead.
    val loop = Pattern.begin[EventRow]("v")(_.event_type == "click").oneOrMore
    val ex = intercept[IllegalArgumentException] {
      Cep.streaming(input.toDS(), (x: EventRow) => x.user_id, ordFn, loop,
        retentionMs = Some(60 * 1000L)) { (k, m) => (k, m.first("v").event_id) }
    }
    assert(ex.getMessage.contains("'v'"), ex.getMessage)
    // each closing mechanism individually makes the same loop acceptable
    Cep.streaming(input.toDS(), (x: EventRow) => x.user_id, ordFn,
      loop.within(60 * 1000L)) { (k, m) => (k, m.first("v").event_id) }
    Cep.streaming(input.toDS(), (x: EventRow) => x.user_id, ordFn,
      loop.until(_.event_type == "purchase"), retentionMs = Some(60 * 1000L)) {
      (k, m) => (k, m.first("v").event_id) }
    Cep.streaming(input.toDS(), (x: EventRow) => x.user_id, ordFn,
      loop.consecutive, retentionMs = Some(60 * 1000L)) {
      (k, m) => (k, m.first("v").event_id) }
    Cep.streaming(input.toDS(), (x: EventRow) => x.user_id, ordFn, loop,
      unboundedState = true) { (k, m) => (k, m.first("v").event_id) }
    // greedy TimesRange can also stall open below its cap — same rejection
    val greedyRange = Pattern.begin[EventRow]("r")(_.event_type == "click")
      .times(2, 5).greedy
    intercept[IllegalArgumentException] {
      Cep.streaming(input.toDS(), (x: EventRow) => x.user_id, ordFn,
        greedyRange, retentionMs = Some(60 * 1000L)) {
        (k, m) => (k, m.first("r").event_id) }
    }
  }

  test("streaming CEP matches across micro-batch boundaries exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val p = Pattern.begin[EventRow]("a")(_.event_type == "click")
      .next("b")(_.event_type == "purchase")
    val out = Cep.streaming(input.toDS(), (x: EventRow) => x.user_id,
      (x: EventRow) => (x.ts.getTime, x.event_id), p, unboundedState = true) {
      (k, m) => (k, m.first("a").event_id, m.first("b").event_id)
    }
    val q = out.toDF("user_id", "a_id", "b_id").writeStream
      .format("memory").queryName("cep_stream").outputMode("append").start()
    try {
      def evt(id: Long, sec: Long, typ: String) =
        EventRow(id, new Timestamp(sec * 1000), 1L, typ, 1.0, "{}")
      input.addData(evt(1, 10, "click"))           // pending: needs next event
      q.processAllAvailable()
      assert(spark.table("cep_stream").count() == 0)
      input.addData(evt(2, 20, "purchase"))        // completes the match
      q.processAllAvailable()
      assert(spark.table("cep_stream").count() == 1)
      input.addData(evt(3, 30, "view"))            // replay must not re-emit
      q.processAllAvailable()
      val rows = spark.table("cep_stream").collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(1) == 1L && rows.head.getLong(2) == 2L)
    } finally q.stop()
  }
}

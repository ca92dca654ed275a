package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.cep.{Cep, NoSkip, Pattern, PatternMatch, SkipPastLastEvent, SkipToFirst, SkipToLast}
import graft.cep.Cep.CepState
import graft.streaming.EventStream.EventRow

/** Seeded randomized equivalence properties for the CEP engine (pure
  * matcher — no Spark session needed). The load-bearing property: feeding
  * the SAME in-order event sequence through `Cep.step` under ARBITRARY
  * micro-batch splits must emit exactly the batch matcher's output — this
  * is what makes the streaming path's oracle (the batch SQL) sound for any
  * trigger cadence the driver happens to produce. */
class CepFuzzSpec extends AnyFunSuite {

  private def e(id: Long, t: Long, typ: String): EventRow =
    EventRow(id, new Timestamp(t * 1000L), 1L, typ, 1.0, "{}")

  private val ord = (x: EventRow) => (x.ts.getTime, x.event_id)
  private val tOf = (x: EventRow) => x.ts.getTime

  private def sig(m: PatternMatch[EventRow]): String =
    m.bindings.map { case (n, es) => n + ":" + es.map(_.event_id).mkString(",") }
      .mkString(";")

  /** Random in-order event sequence over types a/b/c with 1–4 s gaps. */
  private def randomEvents(rnd: scala.util.Random, n: Int): Vector[EventRow] = {
    var t = 0L
    (0 until n).map { i =>
      t += 1 + rnd.nextInt(4)
      e(i.toLong, t, Seq("a", "b", "c")(rnd.nextInt(3)))
    }.toVector
  }

  /** Split a sequence into random contiguous chunks (in order). */
  private def randomChunks(rnd: scala.util.Random,
                           evs: Vector[EventRow]): Vector[Vector[EventRow]] = {
    if (evs.isEmpty) Vector.empty
    else {
      val cuts = (0 until evs.length - 1).filter(_ => rnd.nextBoolean()).toSet
      val out = Vector.newBuilder[Vector[EventRow]]
      var cur = Vector.newBuilder[EventRow]
      evs.zipWithIndex.foreach { case (ev, i) =>
        cur += ev
        if (cuts(i)) { out += cur.result(); cur = Vector.newBuilder }
      }
      out += cur.result()
      out.result()
    }
  }

  /** A fuzzable pattern plus the sentinel that CLOSES its held matches by
    * the end of the stream: `closerType` is appended `closerGapSec` after
    * the last event. Non-loop patterns only need a non-matching event to
    * decide a trailing notNext; loop patterns need their run stop — an
    * until-event, or any event past the within window (gap > within). */
  private case class FuzzCase(p: Pattern[EventRow],
                              closerType: String, closerGapSec: Long)

  private def cases: Seq[FuzzCase] = Seq(
    FuzzCase(Pattern.begin[EventRow]("s")(_.event_type == "a")
      .followedBy("t")(_.event_type == "b").within(8 * 1000L), "z", 1),
    FuzzCase(Pattern.begin[EventRow]("s")(_.event_type == "a")
      .next("t")(_.event_type == "b"), "z", 1),
    // relaxed inner contiguity (the default): times(2) binds the first two
    // a's, skipping b/c between them
    FuzzCase(Pattern.begin[EventRow]("r")(_.event_type == "a").times(2), "z", 1),
    FuzzCase(Pattern.begin[EventRow]("s")(_.event_type == "a")
      .notFollowedBy("n")(_.event_type == "c")
      .followedBy("t")(_.event_type == "b"), "z", 1),
    FuzzCase(Pattern.begin[EventRow]("s")(_.event_type == "a")
      .followedByAny("t")(_.event_type == "b").within(10 * 1000L), "z", 1),
    FuzzCase(Pattern.begin[EventRow]("s")(_.event_type == "a")
      .notNext("n")(_.event_type == "b"), "z", 1),
    // loop cases — relaxed runs closed by until-events ('c' closer), and
    // strict (consecutive) runs closed by any non-matching event
    FuzzCase(Pattern.begin[EventRow]("v")(_.event_type == "b")
      .oneOrMore.until(_.event_type == "c"), "c", 1),
    FuzzCase(Pattern.begin[EventRow]("v")(_.event_type == "b")
      .oneOrMore.consecutive, "z", 1),
    FuzzCase(Pattern.begin[EventRow]("r")(_.event_type == "a")
      .times(2, 4).greedy.until(_.event_type == "c"), "c", 1),
    FuzzCase(Pattern.begin[EventRow]("v")(_.event_type == "b")
      .timesOrMore(2).until(_.event_type == "c"), "c", 1),
    // relaxed head loop + a following stage
    FuzzCase(Pattern.begin[EventRow]("v")(_.event_type == "a")
      .oneOrMore.until(_.event_type == "c")
      .followedBy("t")(_.event_type == "b"), "c", 1),
    // afterMatchSkip × relaxed loop × within co-variation: skip pruning
    // must commute with arbitrary micro-batch splits when runs are closed
    // by the window (gap 12 > within 10 guarantees end-of-stream closure)
    FuzzCase(Pattern.begin[EventRow]("v")(_.event_type == "b")
      .oneOrMore.within(10 * 1000L)
      .afterMatchSkip(SkipPastLastEvent), "z", 12),
    FuzzCase(Pattern.begin[EventRow]("v")(_.event_type == "b")
      .oneOrMore.within(10 * 1000L)
      .afterMatchSkip(SkipToLast("v")), "z", 12),
    FuzzCase(Pattern.begin[EventRow]("s")(_.event_type == "a")
      .followedBy("v")(_.event_type == "b").oneOrMore
      .within(10 * 1000L).afterMatchSkip(SkipPastLastEvent), "z", 12),
    FuzzCase(Pattern.begin[EventRow]("r")(_.event_type == "a")
      .times(2, 3).greedy.within(8 * 1000L)
      .afterMatchSkip(SkipToFirst("r")), "z", 10),
    // combinations modes: chunked replay must reproduce the prefix set and
    // the full anchored-subset enumeration regardless of batch splits
    FuzzCase(Pattern.begin[EventRow]("v")(_.event_type == "b")
      .oneOrMore.until(_.event_type == "c").allowCombinations, "c", 1),
    FuzzCase(Pattern.begin[EventRow]("v")(_.event_type == "b")
      .oneOrMore.until(_.event_type == "c").allowCombinationsExact(), "c", 1))

  test("chunked streaming emission equals the batch matcher (600 random runs)") {
    val rnd = new scala.util.Random(0xC0FFEE)
    for (iter <- 1 to 600) {
      val base = randomEvents(rnd, rnd.nextInt(30))
      val fc = cases(rnd.nextInt(cases.length))
      val evs =
        if (base.isEmpty) base
        else base :+ e(9999L, tOf(base.last) / 1000L + fc.closerGapSec, fc.closerType)
      // the batch reference = matchAll + the pattern's after-match skip,
      // exactly what Cep.batch does (skip is a no-op under NoSkip)
      val all = Cep.matchAll(evs, fc.p, tOf).toVector
      val expect = Cep.applySkip[EventRow, PatternMatch[EventRow]](
        all, identity, ord, fc.p.skip)._1.map(sig).sorted
      var st = CepState[EventRow](Vector.empty, Vector.empty)
      val got = Vector.newBuilder[String]
      randomChunks(rnd, evs).foreach { chunk =>
        val (next, fresh, _) = Cep.step(st, chunk, fc.p, ord, None)
        st = next
        got ++= fresh.map(sig)
      }
      assert(got.result().sorted == expect,
        s"iter $iter: events=${evs.map(x => x.event_id -> x.event_type)}")
    }
  }

  test("cumulative streaming timeouts equal the batch timedOut (200 random runs)") {
    val rnd = new scala.util.Random(0xBEEF)
    val p = Pattern.begin[EventRow]("s")(_.event_type == "a")
      .followedBy("t")(_.event_type == "b").within(6 * 1000L)
    for (iter <- 1 to 200) {
      val evs = randomEvents(rnd, rnd.nextInt(30))
      val expect = Cep.timedOut(evs, p, tOf).toVector.map(sig).sorted
      var st = CepState[EventRow](Vector.empty, Vector.empty)
      val got = Vector.newBuilder[String]
      randomChunks(rnd, evs).foreach { chunk =>
        val (next, _, timeouts) = Cep.step(st, chunk, p, ord, None)
        st = next
        got ++= timeouts.map(sig)
      }
      assert(got.result().sorted == expect,
        s"iter $iter: events=${evs.map(x => x.event_id -> x.event_type)}")
    }
  }

  test("skip strategies prune to a subset; PAST_LAST output never overlaps") {
    val rnd = new scala.util.Random(0xFACADE)
    for (_ <- 1 to 200) {
      val evs = randomEvents(rnd, rnd.nextInt(30))
      val p = Pattern.begin[EventRow]("r")(_.event_type == "a").times(2)
      val all = Cep.matchAll(evs, p, tOf).toVector
      val (kept, _) = Cep.applySkip[EventRow, PatternMatch[EventRow]](
        all, identity, ord, SkipPastLastEvent)
      val (noskip, _) = Cep.applySkip[EventRow, PatternMatch[EventRow]](
        all, identity, ord, NoSkip)
      assert(noskip == all)
      assert(kept.map(sig).toSet.subsetOf(all.map(sig).toSet))
      // non-overlap: sorted by start, each match starts after the previous ends
      val spans = kept.map(m =>
        (ord(m.firstBound.get), ord(m.lastBound.get))).sortBy(_._1)
      spans.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) =>
          assert(Ordering[(Long, Long)].lt(e1, s2), s"$spans")
        case _ =>
      }
    }
  }
}

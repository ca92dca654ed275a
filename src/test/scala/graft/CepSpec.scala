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

  test("oneOrMore emits only maximal runs") {
    val evs = Seq(e(1, 1, "v"), e(2, 2, "v"), e(3, 3, "x"), e(4, 4, "v"))
    val p = Pattern.begin[EventRow]("v")(_.event_type == "v").oneOrMore
    val ms = run(evs, p)
    assert(ms.map(m => ids(m, "v")) == Vector(Seq(1L, 2L), Seq(4L)))
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

  test("streaming CEP matches across micro-batch boundaries exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val p = Pattern.begin[EventRow]("a")(_.event_type == "click")
      .next("b")(_.event_type == "purchase")
    val out = Cep.streaming(input.toDS(), (x: EventRow) => x.user_id,
      (x: EventRow) => (x.ts.getTime, x.event_id), p) {
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

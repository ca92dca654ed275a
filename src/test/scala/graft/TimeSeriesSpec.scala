package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import graft.operators.TimeSeriesOps

/** Differential check for the SAX motif pipeline: seeded random event
  * series mirrored by plain-Scala PAA/symbol arithmetic, plus a planted
  * identical shape across two keys that MUST collide on one word. */
class TimeSeriesSpec extends SparkSpecBase {

  private val breaks = Seq(1500L, 3500L, 7000L)

  private def symbol(m: Long): Int = breaks.indexWhere(m < _) match {
    case -1 => breaks.size
    case i  => i
  }

  test("sax motifs equal the local PAA mirror (seeded random series)") {
    val rnd = new scala.util.Random(0x5A77)
    // 6 users x ~30 readings, values 2-dp in [0, 100); users 50 and 51 get
    // the SAME planted 8-reading shape appended (identical word, distinct keys)
    val planted = Vector(12.34, 13.57, 48.2, 47.9, 71.11, 69.4, 5.0, 6.25)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double)]()
    var id = 0L
    (0 until 6).foreach { u =>
      var t = 0L
      (0 until 25 + rnd.nextInt(10)).foreach { _ =>
        t += 1 + rnd.nextInt(5)
        rows += ((id, t, u.toLong, (rnd.nextInt(10000) / 100.0)))
        id += 1
      }
    }
    Seq(50L, 51L).foreach { u =>
      var t = 1000L
      planted.foreach { v => rows += ((id, t, u, v)); id += 1; t += 2 }
    }
    import spark.implicits._
    val df = rows.toVector
      .map { case (i, t, u, v) => (i, new Timestamp(t * 1000L), u, v) }
      .toDF("event_id", "ts", "user_id", "value")
    val got = TimeSeriesOps.saxMotifs(df)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

    // local mirror
    val words = rows.toVector.groupBy(_._3).toVector.flatMap { case (u, es) =>
      val vq = es.sortBy(e => (e._2, e._1))
        .map(e => math.round(e._4 * 100))
      vq.sliding(8).filter(_.size == 8).map { w =>
        u -> (0 until 4).map { s =>
          symbol((w(2 * s) + w(2 * s + 1)) / 2) }.mkString("")
      }
    }
    val expect = words.groupBy(_._2)
      .map { case (wd, xs) =>
        wd -> ((xs.size.toLong, xs.map(_._1).distinct.size.toLong)) }
      .filter(_._2._1 >= 2L)
    assert(got == expect)
    // the planted cross-key shape must surface as a >= 2-key motif
    val plantedWord = (0 until 4).map { s =>
      val q = planted.map(v => math.round(v * 100))
      symbol((q(2 * s) + q(2 * s + 1)) / 2)
    }.mkString("")
    assert(got.contains(plantedWord) && got(plantedWord)._2 >= 2L,
      s"planted word $plantedWord not found as a cross-key motif: $got")

    // words (and hence motifs) must not depend on the physical layout:
    // the per-key row_number sort order is (ts, event_id), total per key
    val w1 = TimeSeriesOps.saxWords(df.repartition(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val w7 = TimeSeriesOps.saxWords(df.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(w1 == w7 && w1.nonEmpty,
      "SAX words changed under a different partition count")
  }
}

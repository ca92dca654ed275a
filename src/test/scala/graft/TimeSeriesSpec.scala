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

  // exact-rational mirror of TimeSeriesOps.saxWordsZNorm's integer z-score
  private def znWord(w: Seq[Long]): String = {
    val s = w.sum; val ss = w.map(x => x * x).sum
    val v = BigInt(8) * ss - BigInt(s) * s
    (0 until 4).map { seg =>
      val t = w(2 * seg) + w(2 * seg + 1)
      val d = BigInt(8) * t - BigInt(2) * s
      val d2e8 = d * d * BigInt(100000000L)
      val rhs = BigInt(181980100L) * v
      if (v == 0) 2
      else if (d < 0 && d2e8 > rhs) 0
      else if (d < 0) 1
      else if (d2e8 < rhs) 2
      else 3
    }.mkString("")
  }

  test("z-normalized sax words: exact mirror, affine invariance, V=0 convention") {
    val rnd = new scala.util.Random(0x21A7)
    // 5 users x ~28 readings (2-dp values), plus: users 60/61 carry the
    // SAME shape under an affine transform (y = 2x + 3.00) — z-normalized
    // words MUST collide where the quantized-absolute words must differ —
    // and user 70 carries a constant run (V = 0 windows → all-'2' word)
    val shape = Vector(12.34, 13.57, 48.2, 47.9, 71.11, 69.4, 5.0, 6.25)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double)]()
    var id = 0L
    (0 until 5).foreach { u =>
      var t = 0L
      (0 until 25 + rnd.nextInt(8)).foreach { _ =>
        t += 1 + rnd.nextInt(5)
        rows += ((id, t, u.toLong, (rnd.nextInt(10000) / 100.0)))
        id += 1
      }
    }
    Seq[(Long, Double => Double)](
      (60L, x => x), (61L, x => 2 * x + 3.00)).foreach { case (u, f) =>
      var t = 2000L
      shape.foreach { v => rows += ((id, t, u, f(v))); id += 1; t += 2 }
    }
    locally {
      var t = 3000L
      (0 until 10).foreach { _ => rows += ((id, t, 70L, 42.42)); id += 1; t += 2 }
    }
    import spark.implicits._
    val df = rows.toVector
      .map { case (i, t, u, v) => (i, new Timestamp(t * 1000L), u, v) }
      .toDF("event_id", "ts", "user_id", "value")

    val got = TimeSeriesOps.saxWordsZNorm(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    val expect = rows.toVector.groupBy(_._3).toVector.flatMap { case (u, es) =>
      val vq = es.sortBy(e => (e._2, e._1)).map(e => math.round(e._4 * 100))
      vq.sliding(8).filter(_.size == 8).zipWithIndex.map { case (w, i) =>
        (u, i.toLong + 1L, znWord(w)) }
    }.toSet
    assert(got == expect)

    // affine invariance: the transformed copy z-normalizes to the SAME word
    def wordOf(u: Long) = got.collect { case (k, 1L, wd) if k == u => wd }.head
    assert(wordOf(60L) == wordOf(61L),
      "z-normalized words must be affine-invariant")
    // ... where the quantized-absolute variant distinguishes the two
    val absW = TimeSeriesOps.saxWords(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    def absWordOf(u: Long) = absW.collect { case (k, 1L, wd) if k == u => wd }.head
    assert(absWordOf(60L) != absWordOf(61L),
      "the absolute variant should see the affine copy as a different word")
    // constant windows: no z-score exists — mid-symbol convention
    assert(got.collect { case (70L, _, wd) => wd }.forall(_ == "2222"))

    // layout independence, same as the absolute variant
    val z1 = TimeSeriesOps.saxWordsZNorm(df.repartition(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val z7 = TimeSeriesOps.saxWordsZNorm(df.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(z1 == z7 && z1 == got,
      "z-normalized SAX words changed under a different partition count")
  }

  test("z-norm sax wideValues: decimal path exact past the long domain") {
    // values to 200,000.00 put |E| far past the long-path bound (~950.00
    // at the default shape) yet inside the window-sum domain (|vq| ≤
    // 3.8e8): wideValues = true must agree with the BigInt mirror
    // exactly, and the default long path must FAULT (ANSI overflow)
    // rather than silently wrap
    val rnd = new scala.util.Random(0xB16)
    val rows = (0 until 24).map { i =>
      (i.toLong, new Timestamp((1000L + 2 * i) * 1000L), 90L,
        rnd.nextInt(20000000) / 100.0)
    }
    import spark.implicits._
    val df = rows.toDF("event_id", "ts", "user_id", "value")
    val got = TimeSeriesOps.saxWordsZNorm(df, wideValues = true)
      .collect().map(r => (r.getLong(1), r.getString(2))).toMap
    val vq = rows.sortBy(e => (e._2.getTime, e._1))
      .map(e => math.round(e._4 * 100)).toVector
    val expect = vq.sliding(8).filter(_.size == 8).zipWithIndex
      .map { case (w8, i) => (i.toLong + 1L, znWord(w8)) }.toMap
    assert(got == expect)
    val thrown = intercept[Throwable] {
      TimeSeriesOps.saxWordsZNorm(df).collect()
    }
    assert(Iterator.iterate(thrown)(_.getCause).takeWhile(_ != null).take(5)
        .exists(_.isInstanceOf[ArithmeticException]),
      s"expected an ANSI overflow fault, got $thrown")
  }
}

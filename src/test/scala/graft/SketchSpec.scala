package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchOps

/** Bloom membership sketch properties the value oracle cannot state
  * directly: the no-false-negative contract, a sane false-positive rate
  * for the chosen (m, k), and mergeability of the filter words. */
class SketchSpec extends SparkSpecBase {

  private def keysDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("k")
  }

  test("bloom probe: no false negatives; false positives bounded") {
    val members = (0L until 100L).map(_ * 7 + 3)
    val nonMembers = (1000L until 2000L)
    val probe = keysDf(members ++ nonMembers)
    val out = SketchOps.bloomProbe(keysDf(members), col("k"), probe, col("k"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    members.foreach { m =>
      assert(out(m), s"false negative for member $m")
    }
    val fp = nonMembers.count(out(_))
    // m=1024, k=4, n=100: theoretical fp ≈ 1%; 10% is a loose determinism-
    // friendly ceiling (the hash family is fixed, so this never flakes)
    assert(fp < 100, s"false-positive rate too high: $fp / 1000")
  }

  test("count-min: est >= true for every value; sketch merges cell-wise") {
    import spark.implicits._
    // skewed stream: value i appears i times, plus collision pressure from
    // a small width so overcounts actually occur
    val rows = (1L to 60L).flatMap(i => Seq.fill(i.toInt)(i)).toDF("k")
    val hh = SketchOps.cmsHeavyHitters(rows, col("k"), minEst = 0L,
        depth = 4, width = 32L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hh.length == 60)
    hh.foreach { case (v, truth, est) =>
      assert(est >= truth, s"undercount for $v: est=$est < true=$truth")
    }
    // with width 32 and 60 distinct values some cell MUST be shared — the
    // overcount side of the contract is exercised, not vacuous
    assert(hh.exists { case (_, truth, est) => est > truth },
      "no collisions at width 32 / 60 values — test not exercising overcount")
    // merge algebra: sketch(A ++ B) = cell-wise sum of the halves
    val (a, b) = ((1L to 60L).flatMap(i => Seq.fill(i.toInt)(i)).splitAt(900))
    def cells(df: org.apache.spark.sql.DataFrame) =
      SketchOps.countMin(df, col("k"), depth = 4, width = 32L)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (cells(a.toDF("k")).toSeq ++ cells(b.toDF("k")).toSeq)
      .groupMapReduce(_._1)(_._2)(_ + _)
    assert(merged == cells(rows), "cell-wise sum of split sketches != whole")
  }

  test("bloom build merges: filter(A ∪ B) = filter(A) | filter(B)") {
    val a = (0L until 50L).map(_ * 3)
    val b = (500L until 550L)
    val fa = SketchOps.bloomBuild(keysDf(a), col("k"))
    val fb = SketchOps.bloomBuild(keysDf(b), col("k"))
    val fu = SketchOps.bloomBuild(keysDf(a ++ b), col("k"))
    assert(fa.zip(fb).map { case (x, y) => x | y } == fu,
      "word-wise OR of the two filters must equal the union's filter")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ml.MLOps

/** Iterative spark.ml façade behavior (seed-dependent/float-iterative — not
  * oracle-comparable; pinned by properties instead). */
class MLSpec extends SparkSpecBase {

  test("linear regression recovers an exact planted linear relation") {
    import spark.implicits._
    val df = (1 to 200).map { i =>
      val x1 = i.toDouble; val x2 = (i % 7).toDouble
      (x1, x2, 3.0 * x1 - 2.0 * x2 + 5.0)
    }.toDF("x1", "x2", "y")
    val Array(c1, c2, intercept) =
      MLOps.fitLinearRegression(df, Seq("x1", "x2"), "y")
    assert(math.abs(c1 - 3.0) < 1e-6)
    assert(math.abs(c2 + 2.0) < 1e-6)
    assert(math.abs(intercept - 5.0) < 1e-4)
  }

  test("kmeans assigns every embedding to one of k clusters") {
    val embs = Tables.load(spark, sfDir, "embeddings")
    val out = MLOps.kmeansAssign(embs, "embedding", k = 5)
    assert(out.count() == embs.count())
    val clusters = out.select(col("cluster")).distinct().count()
    assert(clusters == 5)
    // deterministic under a fixed seed
    val again = MLOps.kmeansAssign(embs, "embedding", k = 5)
    assert(out.select("vec_id", "cluster")
      .exceptAll(again.select("vec_id", "cluster")).isEmpty)
  }

  test("min-max scaling lands in [0,1] with both extremes present") {
    val out = MLOps.minMaxScale(Tables.load(spark, sfDir, "customer"),
      "c_acctbal", col("c_mktsegment"))
    val stats = out.groupBy(col("c_mktsegment"))
      .agg(min(col("scaled")).as("lo"), max(col("scaled")).as("hi"))
      .collect()
    stats.foreach { r =>
      assert(r.getAs[Double]("lo") == 0.0 && r.getAs[Double]("hi") == 1.0)
    }
  }

  test("z-scores have ~zero mean and ~unit variance per group") {
    val out = MLOps.standardScaleCents(Tables.load(spark, sfDir, "customer"),
      "c_acctbal", col("c_mktsegment"))
    out.groupBy(col("c_mktsegment"))
      .agg(avg(col("z")).as("m"), stddev_pop(col("z")).as("s"))
      .collect().foreach { r =>
        assert(math.abs(r.getAs[Double]("m")) < 1e-9)
        assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-9)
      }
  }
}

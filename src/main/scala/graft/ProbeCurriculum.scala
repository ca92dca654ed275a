package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused shard-count ladder for [[graft.operators.SamplingOps
  * .curriculumOrder]] (r11 verdict item 5): times the operator over a
  * fixture at several `shards` settings so the derived default can be set
  * from measurement instead of prose. Usage:
  *
  *   runMain graft.ProbeCurriculum <dir> [shardsCsv] [reps]
  *
  * Prints per-setting best-of-reps wall seconds. The r11 100× ladder
  * showed 8.3× growth at fixed shards=8; this probe answers how much of
  * that the shard knob actually recovers (the per-(phase, shard) window
  * tails) vs how much is the histogram/join base cost.
  */
object ProbeCurriculum {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse("bench-data/sf10")
    val shardsList = (if (args.length > 1) args(1) else "8,16,32,64")
      .split(",").map(_.trim.toInt).toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.GraftFunctions.tokens
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    docs.write.format("noop").mode("overwrite").save() // page-cache warm
    val n = docs.count()
    println(s"[curriculum] dir=$dir rows=$n")
    for (sh <- shardsList) {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.SamplingOps.curriculumOrder(docs,
          size(tokens(col("text"))).cast("long"), "doc_id",
          phases = 4, shards = sh, rowCount = Some(n)).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[curriculum] shards=$sh%-4d best=${ts.min}%.2fs reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

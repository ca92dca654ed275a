package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one registered query and print its physical plan.
  * Usage: runMain graft.Probe <queryName> [sfDir] [explain|noexplain]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.length <= 2 || args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // time the construction separately: streaming queries run to completion
    // inside the query function (runToTable awaits termination), so their
    // cost lands in build, not count
    val tb = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val buildS = (System.nanoTime() - tb) / 1e9
    if (doExplain) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[probe] $name rows=$n build=$buildS%.2fs count=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated fixture tables (TESTDATA.md).
  *
  * All tables are parquet; schemas in FIXTURES.md. `events.ts` is written as
  * parquet INT64 TIMESTAMP(NANOS) which Spark cannot read natively — we read
  * it via `spark.sql.legacy.parquet.nanosAsLong` and truncate to microsecond
  * timestamps, matching DuckDB's own ns→µs truncation so oracle comparisons
  * line up.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table. `dir` is e.g. /root/testdata/sf0.01 */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftExtensions.install(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** events.ts arrives as LongType nanos (via nanosAsLong) — convert to a
    * proper TimestampType truncated to micros. If a future fixture writes µs
    * directly the column is already a timestamp and we pass it through. */
  private def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division — (ts / 1000) via Double loses ulps at ~1.7e18 ns
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }

  /** Register every fixture table as a temp view named after the file. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

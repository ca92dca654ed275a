package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY §2.7).
  *
  * Reference coverage → Spark mapping:
  *  - CSV with quoted fields, comment lines, lenient parsing
  *    (`GenericCsvInputFormat.java:40`, `CsvInputFormat.java:37`) →
  *    `spark.read.csv` options (quote/comment/mode);
  *  - text (`readTextFile`) → `spark.read.text`;
  *  - ORC (`OrcRowInputFormat`) → native `orc` format;
  *  - JSON table sources (`KafkaJsonTableSource`) → native `json` format;
  *  - JDBC (`JDBCInputFormat`/`JDBCOutputFormat`) → `spark.read.jdbc` /
  *    `write.jdbc`, exercised end-to-end against the embedded Derby engine
  *    that ships on the Spark classpath (JdbcSpec round trip);
  *  - Avro (`AvroInputFormat`) / Kafka connectors: the spark-avro and
  *    spark-sql-kafka modules are not on this classpath — API documented,
  *    not exercised;
  *  - partitioned/bucketed sinks (filesystem bucketing sink) →
  *    `write.partitionBy` / `bucketBy`.
  */
object IoOps {

  /** Reference-parity CSV reader: quoted fields (quote char), comment-line
    * skipping, and lenient mode (DROPMALFORMED ≈ the reference's
    * `lenient=true` which skips corrupted lines). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              delimiter: String = ",", quote: String = "\"",
              comment: String = "#", lenient: Boolean = false,
              header: Boolean = false,
              escape: String = "\\"): DataFrame =
    spark.read.schema(schema)
      .option("sep", delimiter).option("quote", quote)
      .option("comment", comment).option("header", header)
      .option("escape", escape)
      .option("mode", if (lenient) "DROPMALFORMED" else "FAILFAST")
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = false): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Hive-style partitioned parquet sink — the 100 TB layout primitive
    * (partition pruning on read). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Scratch dir helper for deterministic round-trip fixtures. */
  def scratch(name: String): String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft-io", name)
    p.toString
  }

  /** JDBC source (reference `JDBCInputFormat`): a single-partition read of
    * `table` (a table name or a `(subquery) alias`). For parallel reads at
    * scale pass partitioning bounds via [[readJdbcPartitioned]]. */
  def readJdbc(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new java.util.Properties)

  /** Parallel JDBC read split on a numeric column — the scale path: each of
    * `numPartitions` tasks reads one stride of `[lower, upper]`. */
  def readJdbcPartitioned(spark: SparkSession, url: String, table: String,
                          partitionCol: String, lower: Long, upper: Long,
                          numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions,
      new java.util.Properties)

  /** JDBC sink (reference `JDBCOutputFormat`): batched inserts per
    * partition. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).jdbc(url, table, new java.util.Properties)
}

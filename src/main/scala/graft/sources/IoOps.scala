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
  *  - Avro (`AvroInputFormat`/`AvroOutputFormat`) → container-file round
  *    trip via the avro-mapred Hadoop formats that DO ship on the Spark
  *    classpath (`readAvro`/`writeAvro` below; the spark-avro DataSource
  *    module is absent from this zero-egress build, so the mapping layer
  *    is ours);
  *  - Kafka connectors: the spark-sql-kafka module and any broker are
  *    absent — API documented, not exercised;
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

  // ---- Avro container files (reference AvroInputFormat/AvroOutputFormat) --

  /** Avro record schema for a flat Spark schema (long/int/double/string/
    * boolean, nullable as [null, T] unions). */
  def avroSchemaFor(st: StructType): org.apache.avro.Schema = {
    import org.apache.avro.Schema
    import org.apache.spark.sql.types._
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case other =>
          throw new IllegalArgumentException(s"unsupported Avro mapping: $other")
      }
      val t = if (f.nullable)
        Schema.createUnion(java.util.Arrays.asList(
          Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, t, null,
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord("row", null, "graft", false,
      java.util.Arrays.asList(fields: _*))
  }

  /** Write a flat DataFrame as Avro container files — one file per
    * partition through `AvroKeyOutputFormat`, the distributed-write shape
    * of the reference's `AvroOutputFormat`. */
  def writeAvro(df: DataFrame, path: String): Unit = {
    import org.apache.avro.generic.{GenericData, GenericRecord}
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.{AvroJob, AvroKeyOutputFormat}
    import org.apache.hadoop.io.NullWritable
    val schemaJson = avroSchemaFor(df.schema).toString
    val names = df.schema.fieldNames
    val job = org.apache.hadoop.mapreduce.Job
      .getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job,
      new org.apache.avro.Schema.Parser().parse(schemaJson))
    df.rdd.mapPartitions { it =>
      val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
      it.map { r =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < names.length) { rec.put(names(i), r.get(i)); i += 1 }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  /** Read Avro container files written by [[writeAvro]] (or any writer of
    * the given flat schema) back into a DataFrame. */
  def readAvro(spark: SparkSession, path: String,
               sparkSchema: StructType): DataFrame = {
    import org.apache.avro.generic.GenericRecord
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat}
    import org.apache.hadoop.io.NullWritable
    val names = sparkSchema.fieldNames
    val job = org.apache.hadoop.mapreduce.Job
      .getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, avroSchemaFor(sparkSchema))
    val rows = spark.sparkContext.newAPIHadoopFile(path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable],
        job.getConfiguration)
      .map { case (k, _) =>
        val rec = k.datum()
        // extract values eagerly — the input format reuses record objects
        org.apache.spark.sql.Row.fromSeq(names.toIndexedSeq.map { n =>
          rec.get(n) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case v => v
          }
        })
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.operators.MultimodalOps
import graft.sources.IoOps

/** Source/sink + multimodal inventory (SURVEY §2.7 + north-star media ops).
  * Round-trip queries push a fixture table through a real on-disk format and
  * read it back — the oracle compares against the original table, so format
  * fidelity (types, quoting, nulls) is what's tested.
  */
object IoQueries extends QuerySet {

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CSV round trip with quoting (values contain the delimiter)
    "io_csv_roundtrip" -> ((s, dir) => {
      val path = IoOps.scratch("nation_csv")
      val n = Tables.load(s, dir, "nation")
        .withColumn("tricky", concat(col("n_name"), lit(",x\"y")))
      IoOps.writeCsv(n, path)
      IoOps.readCsv(s, path,
        nationSchema.add(StructField("tricky", StringType)))
    }),

    // JDBC sink + partitioned source round trip (reference
    // `flink-jdbc/.../JDBCOutputFormat` batched inserts +
    // `JDBCInputFormat` parallel range scan) against the embedded Derby
    // engine on the Spark classpath — the real spark.read/write.jdbc
    // machinery, no network. The read back is the PARALLEL form (4 range
    // partitions on the key), so the value oracle also pins that the
    // range split neither drops nor duplicates rows.
    "io_jdbc_roundtrip" -> ((s, dir) => {
      val db = java.nio.file.Paths.get(IoOps.scratch("derby"),
        java.util.UUID.randomUUID.toString.take(8)).toString
      // explicit territory: Derby derives the new database's locale from
      // the JVM default, and rejects Locale.ROOT (empty language) — which
      // is exactly what Bench sets for its JSON decimal contract
      val url = s"jdbc:derby:$db;create=true;territory=en_US"
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_mktsegment"))
      IoOps.writeJdbc(cust, url, "CUST_JD")
      val hi = cust.agg(max(col("c_custkey"))).head.getLong(0)
      val back = IoOps.readJdbcPartitioned(s, url, "CUST_JD", "C_CUSTKEY",
        1L, hi, numPartitions = 4)
      // Derby folds unquoted identifiers to upper case on the way in
      back.select(back.columns.toSeq.map(c => col(c).as(c.toLowerCase)): _*)
    }),

    // z-order-clustered write + read back: lineitem is Morton-interleaved
    // on (l_partkey, l_suppkey) so every output file covers a tight
    // rectangle of BOTH dimensions (footer min/max stats then prune
    // two-dimensional filters — the 100 TB data-skipping layout).
    // The oracle pins the Morton values AND the write/read round trip;
    // LayoutSpec asserts the bounding-box tightening itself.
    "io_zorder_layout" -> ((s, dir) => {
      val path = IoOps.scratch("lineitem_zorder")
      graft.operators.LayoutOps.zorderWrite(
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")),
        path, col("l_partkey"), col("l_suppkey"), nFiles = 8)
      val back = s.read.parquet(path)
      back.select(col("l_orderkey"), col("l_linenumber"),
        graft.operators.LayoutOps.zorderValue(
          col("l_partkey"), col("l_suppkey")).as("zval"))
    }),

    // small-files compaction: fragment orders into 64 shards, compact to
    // ~byte-sized target, read back — content identical (the oracle),
    // file count bounded (LayoutSpec)
    "io_compact_roundtrip" -> ((s, dir) => {
      val frag = IoOps.scratch("orders_frag")
      val dst = IoOps.scratch("orders_compact")
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(64)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(frag)
      graft.operators.LayoutOps.compactFiles(s, frag, dst,
        targetFileBytes = 8L * 1024 * 1024)
      s.read.parquet(dst)
    }),

    // CSV parsing options: comments + lenient (malformed rows dropped)
    "io_csv_options" -> ((s, dir) => {
      val path = IoOps.scratch("csv_options") + "/data.csv"
      val content = Seq(
        "# comment line to skip",
        "1,\"alpha, with comma\",10",
        "2,\"quoted \"\"inner\"\" text\",20",
        "not_an_int,broken,row",
        "3,plain,30").mkString("\n")
      val p = java.nio.file.Paths.get(path)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, content)
      // RFC-4180 doubled quotes need escape == quote char
      IoOps.readCsv(s, path, StructType(Seq(
        StructField("id", IntegerType),
        StructField("name", StringType),
        StructField("v", IntegerType))), lenient = true, escape = "\"")
    }),

    // text round trip (reference writeAsText/readTextFile): one line per
    // record, parsed back with split
    "io_text_roundtrip" -> ((s, dir) => {
      val path = IoOps.scratch("docs_text")
      Tables.load(s, dir, "documents")
        .select(concat(col("doc_id"), lit("|"), col("n_chars")).as("value"))
        .write.mode("overwrite").text(path)
      s.read.text(path)
        .select(split(col("value"), "\\|").as("p"))
        .select(element_at(col("p"), 1).cast("long").as("doc_id"),
          element_at(col("p"), 2).cast("long").as("n_chars"))
    }),

    // JSON round trip (nested-capable format; types preserved via schema)
    "io_json_roundtrip" -> ((s, dir) => {
      val path = IoOps.scratch("orders_json")
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      IoOps.writeJson(o, path)
      IoOps.readJson(s, path, StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_totalprice", DoubleType),
        StructField("o_orderstatus", StringType))))
    }),

    // ORC round trip
    "io_orc_roundtrip" -> ((s, dir) => {
      val path = IoOps.scratch("supplier_orc")
      IoOps.writeOrc(Tables.load(s, dir, "supplier"), path)
      IoOps.readOrc(s, path)
    }),

    // Avro container-file round trip through the avro-mapred Hadoop
    // formats (reference AvroInputFormat/AvroOutputFormat)
    "io_avro_roundtrip" -> ((s, dir) => {
      val path = IoOps.scratch("nation_avro") + "_" + System.nanoTime()
      val nation = Tables.load(s, dir, "nation")
        .select(org.apache.spark.sql.functions.col("n_nationkey"),
          org.apache.spark.sql.functions.col("n_name"),
          org.apache.spark.sql.functions.col("n_regionkey"))
      IoOps.writeAvro(nation, path)
      IoOps.readAvro(s, path, nation.schema)
    }),

    // partitioned sink: write partitioned by key, read back one partition —
    // partition pruning must reconstruct the column from the path
    "io_partitioned_read" -> ((s, dir) => {
      val path = IoOps.scratch("customer_part")
      IoOps.writePartitioned(
        Tables.load(s, dir, "customer"), path, "c_mktsegment")
      s.read.parquet(path)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    }),

    // multimodal: binary media features with stubbed decode
    "media_features" -> ((s, dir) =>
      MultimodalOps.extractFeatures(
        MultimodalOps.asMediaTable(Tables.load(s, dir, "documents")))),

    // multimodal: deterministic frame sampling of video payloads
    "media_frame_sample" -> ((s, dir) =>
      MultimodalOps.sampleFrames(
        MultimodalOps.asMediaTable(Tables.load(s, dir, "documents")),
        frames = 4)),

    // multimodal: aspect-fit resize plan for image rows (integer math)
    "media_resize" -> ((s, dir) =>
      MultimodalOps.resizePlan(
        MultimodalOps.asMediaTable(Tables.load(s, dir, "documents")),
        targetW = 320, targetH = 180)),

    // multimodal: fixed-length audio window slicing (variable count)
    "media_audio_windows" -> ((s, dir) =>
      MultimodalOps.sampleAudioWindows(
        MultimodalOps.asMediaTable(Tables.load(s, dir, "documents")),
        winLen = 100)),

    // multimodal: average-hash shape perceptual fingerprint (16 sampled
    // bytes thresholded at their mean; a real decoder swaps pixels in)
    "media_phash" -> ((s, dir) =>
      MultimodalOps.perceptualHash(
        MultimodalOps.asMediaTable(Tables.load(s, dir, "documents")))),

    // multimodal: REAL codec round trip — each row synthesizes a w×h PNG
    // (JDK ImageIO, real DEFLATE-compressed image bytes) and realDecode
    // reads the dimensions back out of the binary payload; the oracle
    // pins decoded dims == constructed dims. UDFs are the sanctioned
    // shape here (codec work is per-row imperative by nature); both are
    // narrow maps that pipeline inside the scan with no shuffle.
    "media_decode_real" -> ((s, dir) => {
      val enc = udf((w: Int, h: Int) => MultimodalOps.encodePng(w, h))
      val dec = udf((b: Array[Byte]) => MultimodalOps.realDecode(b))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          enc((col("doc_id") % 64 + 1).cast("int"),
            (col("doc_id") % 37 + 1).cast("int")).as("bytes"))
        .select(col("doc_id"), dec(col("bytes")).as("d"))
        .select(col("doc_id"), col("d._1").as("width"),
          col("d._2").as("height"))
    }),

    // multimodal: near-duplicate media via phash chunk blocking + hamming
    "media_phash_pairs" -> ((s, dir) =>
      MultimodalOps.perceptualHashPairs(
        MultimodalOps.asMediaTable(Tables.load(s, dir, "documents"))))
  )

  override def oracle: Map[String, String] = Map(
    "io_jdbc_roundtrip" ->
      "SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer",

    // identical Morton interleave: x bits to odd positions, y to even
    "io_zorder_layout" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(list_aggregate(list_transform(range(16), i ->
        |    ((l_partkey // (CAST(1 AS BIGINT) << i)) % 2)
        |      * (CAST(1 AS BIGINT) << (2 * i + 1))
        |    + ((l_suppkey // (CAST(1 AS BIGINT) << i)) % 2)
        |      * (CAST(1 AS BIGINT) << (2 * i))), 'sum') AS BIGINT) AS zval
        |FROM lineitem""".stripMargin,

    // compaction is pure layout: content identical to the source table
    "io_compact_roundtrip" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders",

    // decoded dims must equal the dims the PNGs were synthesized with
    "media_decode_real" ->
      """SELECT doc_id, CAST(doc_id % 64 + 1 AS INT) AS width,
        |  CAST(doc_id % 37 + 1 AS INT) AS height FROM documents""".stripMargin,

    "io_csv_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |  n_name || ',x"y' AS tricky FROM nation""".stripMargin,

    "io_csv_options" ->
      """SELECT * FROM (VALUES
        |  (1, 'alpha, with comma', 10),
        |  (2, 'quoted "inner" text', 20),
        |  (3, 'plain', 30)) t(id, name, v)""".stripMargin,

    "io_text_roundtrip" ->
      "SELECT doc_id, n_chars FROM documents",

    "io_json_roundtrip" ->
      "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders",

    "io_orc_roundtrip" ->
      "SELECT * FROM supplier",

    "io_avro_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",

    "io_partitioned_read" ->
      """SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin,

    "media_features" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(length(text) AS INT) AS n_bytes,
        |  md5(text) AS digest,
        |  CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 1280 + 1
        |    AS width,
        |  CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 720 + 1
        |    AS height
        |FROM documents""".stripMargin,

    "media_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, text,
        |    (length(text) + 3) // 4 AS flen
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT media_id,
        |    CAST(unnest(range(4)) AS INT) AS frame_idx,
        |    unnest(list_transform(range(4),
        |      i -> substr(text, CAST(i * flen + 1 AS INT), CAST(flen AS INT))))
        |      AS frame
        |  FROM v)
        |SELECT media_id, frame_idx,
        |  CAST(length(frame) AS INT) AS frame_len,
        |  md5(frame) AS frame_digest
        |FROM f WHERE length(frame) > 0""".stripMargin,

    "media_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 1280 + 1
        |      AS width,
        |    CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 720 + 1
        |      AS height
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT media_id, width, height,
        |  CAST(CASE WHEN width * 180 >= height * 320 THEN 320
        |    ELSE greatest(1, (width * 180) // height) END AS BIGINT) AS out_w,
        |  CAST(CASE WHEN width * 180 >= height * 320
        |    THEN greatest(1, (height * 320) // width)
        |    ELSE 180 END AS BIGINT) AS out_h
        |FROM m""".stripMargin,

    "media_audio_windows" ->
      """WITH a AS (
        |  SELECT doc_id AS media_id, text,
        |    (length(text) + 99) // 100 AS n_win
        |  FROM documents WHERE doc_id % 3 = 1),
        |f AS (
        |  SELECT media_id,
        |    CAST(unnest(range(n_win)) AS INT) AS win_idx,
        |    unnest(list_transform(range(n_win),
        |      i -> substr(text, CAST(i * 100 + 1 AS INT), 100))) AS w
        |  FROM a)
        |SELECT media_id, win_idx,
        |  CAST(length(w) AS INT) AS win_len, md5(w) AS win_digest
        |FROM f""".stripMargin,

    "media_phash" ->
      """WITH s AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
        |      AS media_type,
        |    list_transform(range(16), i ->
        |      ord(substr(text, CAST((i * length(text)) // 16 AS INT) + 1, 1)))
        |      AS v
        |  FROM documents),
        |t AS (SELECT media_id, media_type, v,
        |        list_aggregate(v, 'sum') AS vsum FROM s)
        |SELECT media_id, media_type,
        |  CAST(list_aggregate(list_transform(range(16), i ->
        |    CASE WHEN v[i+1] * 16 > vsum
        |      THEN (CAST(1 AS BIGINT) << CAST(15 - i AS INT))
        |      ELSE 0 END), 'sum') AS BIGINT) AS phash
        |FROM t""".stripMargin,

    "media_phash_pairs" ->
      """WITH s AS (
        |  SELECT doc_id AS media_id,
        |    list_transform(range(16), i ->
        |      ord(substr(text, CAST((i * length(text)) // 16 AS INT) + 1, 1)))
        |      AS v
        |  FROM documents),
        |t AS (SELECT media_id, v, list_aggregate(v, 'sum') AS vsum FROM s),
        |ph AS (
        |  SELECT media_id,
        |    CAST(list_aggregate(list_transform(range(16), i ->
        |      CASE WHEN v[i+1] * 16 > vsum
        |        THEN (CAST(1 AS BIGINT) << CAST(15 - i AS INT))
        |        ELSE 0 END), 'sum') AS BIGINT) AS phash
        |  FROM t),
        |chunked AS (
        |  SELECT media_id, phash,
        |    CAST(unnest(range(4)) AS INT) AS chunk,
        |    unnest(list_transform(range(4), c -> (phash >> (c*4)) % 16))
        |      AS cval
        |  FROM ph)
        |SELECT DISTINCT a.media_id AS id1, b.media_id AS id2,
        |  bit_count(xor(a.phash, b.phash)) AS hamming
        |FROM chunked a JOIN chunked b
        |  ON a.chunk = b.chunk AND a.cval = b.cval
        | AND a.media_id < b.media_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 2""".stripMargin
  )
}

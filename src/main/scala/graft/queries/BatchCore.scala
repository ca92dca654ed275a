package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions._
import Exact._

/** Remaining batch DataSet-core inventory (SURVEY §2.1): global sort with
  * limit/offset (DataSetSort, `DataSetSort.scala:38`), deterministic
  * sampling (`DataSetUtils.java:89`), zipWithIndex (`DataSetUtils.java:121`),
  * scalar/IN/EXISTS subqueries (`DataSetSingleRowJoin.scala:42` +
  * `SubQueryRemoveRule`, `FlinkRuleSets.scala:36-38`), and the plain-SQL
  * entry point (`TableEnvironment.sqlQuery:555`).
  */
object BatchCore extends QuerySet {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // count()/collect() as ACTIONS (reference DataSet.count/collect,
    // DataSet.java:397/413 — driver-side materialization, not the COUNT
    // aggregate): the result row is BUILT on the driver from the two
    // action results, so the oracle pins the actions themselves. Scale
    // note: collect() is deliberately on the bounded dimension table —
    // the reference's own collect contract (driver must hold the result).
    "batch_count_collect" -> ((s, dir) => {
      import s.implicits._
      val n = t(s, dir, "region").count()
      val names = t(s, dir, "region").select(col("r_name"))
        .collect().map(_.getString(0)).sorted.mkString(",")
      Seq((n, names)).toDF("n_regions", "region_names")
    }),
    // MERGE INTO emulation (LLM-pipeline extension — refreshed-crawl
    // reconciliation): matched keys take the source's values, new keys
    // insert, unmatched target rows persist; one full outer join
    "merge_upsert" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      graft.operators.MergeOps.upsert(
        o.filter(col("o_orderkey") % 3 =!= 0),
        o.filter(col("o_orderkey") % 2 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 10.0),
        "o_orderkey", Seq("o_custkey", "o_totalprice"))
    }),

    // CDC changelog apply: an ordered I/U/D stream folds into the
    // snapshot via ONE keyed max_by aggregation (last-writer-wins,
    // tombstones drop) — each key moves once however many times it
    // changed. The changelog is derived deterministically from the
    // fixture: seq 1 updates (%5==1 balances +100, %11==0 new keys
    // insert), seq 2 deletes (%7==3) — a key hit by both update and
    // delete ends deleted, proving the per-key seq order is honored.
    "merge_cdc_apply" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), dec2(col("c_acctbal")).as("c_acctbal"),
          col("c_mktsegment"))
      val updates = c.filter(col("c_custkey") % 5 === 1)
        .select(col("c_custkey"), lit(1L).as("seq"), lit("U").as("op"),
          (col("c_acctbal") + lit(100).cast("decimal(12,2)"))
            .cast("decimal(12,2)").as("c_acctbal"),
          col("c_mktsegment"))
      // insert keys are -(k+1): strictly negative, disjoint from the
      // non-negative TPC-H key space at EVERY scale factor (a +1000000
      // offset would collide with real keys past sf≈7 and silently
      // diverge from the UNION ALL oracle; plain -k collides at k=0)
      val inserts = c.filter(col("c_custkey") % 11 === 0)
        .select((-(col("c_custkey") + 1)).as("c_custkey"),
          lit(1L).as("seq"), lit("I").as("op"),
          lit(0).cast("decimal(12,2)").as("c_acctbal"),
          lit("NEW").as("c_mktsegment"))
      val deletes = c.filter(col("c_custkey") % 7 === 3)
        .select(col("c_custkey"), lit(2L).as("seq"), lit("D").as("op"),
          col("c_acctbal"), col("c_mktsegment"))
      graft.operators.MergeOps.applyChangelog(
          c, updates.unionByName(inserts).unionByName(deletes),
          "c_custkey", Seq("c_acctbal", "c_mktsegment"))
        .select(col("c_custkey"),
          col("c_acctbal").cast("double").as("acctbal"),
          col("c_mktsegment"))
    }),

    // SCD type-2 merge: changed payloads close the current version and
    // open a new one at the effective date; unchanged matches, absent
    // keys, and closed history rows pass through untouched — the
    // point-in-time-reproducible metadata shape
    "merge_scd2" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
      val current = c.select(col("c_custkey"), col("c_acctbal"),
        to_date(lit("2023-01-01")).as("valid_from"),
        lit(null).cast("date").as("valid_to"))
      val history = c.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), (col("c_acctbal") - 50.0).as("c_acctbal"),
          to_date(lit("2022-01-01")).as("valid_from"),
          to_date(lit("2023-01-01")).as("valid_to"))
      val source = c.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey"), (col("c_acctbal") + 100.0).as("c_acctbal"))
        .unionByName(c.filter(col("c_custkey") % 7 === 3 &&
            col("c_custkey") % 5 =!= 0)
          .select(col("c_custkey"), col("c_acctbal")))
        .unionByName(c.filter(col("c_custkey") % 11 === 0)
          // -(k+1): strictly negative, disjoint at every scale factor
          .select((-(col("c_custkey") + 1)).as("c_custkey"),
            col("c_acctbal")))
      // open rows surface the standard 9999-12-31 sentinel instead of
      // NULL, and validity bounds surface as ISO strings: the oracle's
      // pandas normalization renders NULL dates differently per engine,
      // and year 9999 overflows the ns-epoch on the parquet read-back
      graft.operators.MergeOps.scd2Merge(
          current.unionByName(history), source, "c_custkey",
          Seq("c_acctbal"), to_date(lit("2024-01-01")))
        .withColumn("valid_to",
          coalesce(col("valid_to"), to_date(lit("9999-12-31"))))
        .withColumn("valid_from", date_format(col("valid_from"), "yyyy-MM-dd"))
        .withColumn("valid_to", date_format(col("valid_to"), "yyyy-MM-dd"))
    }),

    // global sort + offset/fetch — total order pinned by unique key suffix
    "sort_limit_offset" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(20).limit(100)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // generateSequence source (reference ExecutionEnvironment
    // .generateSequence): spark.range is a parallel sequence source
    "sequence_source" -> ((s, _) =>
      s.range(1, 1001)
        .select(col("id"),
          (col("id") * col("id") % 97).as("sq_mod"))),

    // deterministic Bernoulli sample: hash-mod filter — reproducible on any
    // engine/partitioning, unlike rng-based sample()
    "sample_hash" -> ((s, dir) =>
      t(s, dir, "customer")
        .filter(stableHash(col("c_custkey").cast("string")) % 100 < 10)
        .select(col("c_custkey"), col("c_acctbal"))),

    // zipWithIndex: contiguous 0-based ids in a pinned total order
    "zip_with_index" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          (row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("doc_id"))) - 1).cast("long").as("idx"))),

    // scalar subquery (single-row join): orders above the exact global mean
    "sub_scalar" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(s"""SELECT o_orderkey, o_totalprice FROM orders
               |WHERE o_totalprice > (
               |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               |         / COUNT(*) FROM orders)""".stripMargin)
    }),

    // IN subquery
    "sub_in" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
              |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
              |""".stripMargin)
    }),

    // correlated EXISTS / NOT EXISTS
    "sub_exists" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT c_custkey, c_name FROM customer c
              |WHERE NOT EXISTS (
              |  SELECT 1 FROM orders o
              |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
              |""".stripMargin)
    }),

    // correlated scalar subquery: each customer's orders above their own mean
    "sub_correlated_scalar" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(s"""SELECT o_orderkey, o_custkey FROM orders o1
               |WHERE o_totalprice > (
               |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               |         / COUNT(*)
               |  FROM orders o2 WHERE o2.o_custkey = o1.o_custkey)""".stripMargin)
    }),

    // manual skew mitigation: two-phase salted aggregation must equal the
    // direct groupBy (the hot-key spreading pattern at 100 TB)
    "salted_aggregate" -> ((s, dir) => {
      graft.operators.PartitionOps.saltedAggregate(
          t(s, dir, "lineitem"), col("l_returnflag"), 8,
          Seq((sum(dec2(col("l_quantity"))), "sum"),
            (count(lit(1)), "sum")))
        .select(col("__key").as("l_returnflag"),
          col("agg0").cast("double").as("sum_qty"),
          col("agg1").as("n"))
    }),

    // partitionCustom + sortPartition + mapPartition with partition
    // provenance: routing is the user function o_orderkey % 8, so the
    // physical layout (which partition, which position) is a pure
    // function of the data and the oracle states it exactly — upgrades
    // the partitioning directives from layout-spec to value-oracle
    "partition_custom_sorted" -> ((s, dir) =>
      graft.operators.PartitionOps.customPartitionSorted(
        t(s, dir, "orders"), "o_orderkey", 8)),

    // rebalance (round-robin redistribution) as a VALUE oracle: the
    // round-robin start offset is engine-internal, but from a single
    // upstream partition the multiset of partition SIZES is exact —
    // ⌈n/32⌉ × (n mod 32) partitions and ⌊n/32⌋ × the rest — so the
    // (cnt, n_parts) histogram is oracle-stateable. The repartition(1)
    // staging exists only to pin that single-upstream shape (checkpointed
    // so CollapseRepartition cannot fuse it away); production rebalance
    // runs PartitionOps.rebalance directly on any input.
    "partition_rebalance" -> ((s, dir) => {
      val one = t(s, dir, "lineitem").select(col("l_orderkey"))
        .repartition(1).localCheckpoint()
      graft.operators.PartitionOps.rebalance(one, 32)
        .groupBy(spark_partition_id().as("pid"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("cnt")).agg(count(lit(1)).as("n_parts"))
    }),

    // SQL entry surface: HAVING + IN over grouped subquery (TPC-H Q18 shape)
    "sql_having_in" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(s"""SELECT c.c_name, o.o_orderkey, o.o_totalprice
               |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
               |WHERE o.o_orderkey IN (
               |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
               |  HAVING ${sqlDsum("l_quantity")} > 250)""".stripMargin)
    }),

    // per-stratum deterministic Bernoulli (corpus-curation mix control):
    // urgent orders kept at 20%, high at 10%, the rest at 2%
    "sample_stratified" -> ((s, dir) =>
      graft.operators.SamplingOps.stratified(
          t(s, dir, "orders"), "o_orderpriority", "o_orderkey",
          Map("1-URGENT" -> 0.20, "2-HIGH" -> 0.10), defaultRate = 0.02)
        .select(col("o_orderkey"), col("o_orderpriority"))),

    // exactly k per stratum by smallest hash — deterministic reservoir
    "sample_bottomk" -> ((s, dir) =>
      graft.operators.SamplingOps.bottomK(
          t(s, dir, "customer"), "c_mktsegment", "c_custkey", 20)
        .select(col("c_custkey"), col("c_mktsegment"))),

    // manual skew-join: salted lineitem⋈orders must equal the plain join
    "salted_join" -> ((s, dir) =>
      graft.operators.PartitionOps.saltedJoin(
          t(s, dir, "lineitem")
            .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
          t(s, dir, "orders")
            .filter(col("o_totalprice") > 450000)
            .select(col("o_orderkey"), col("o_orderpriority")),
          "o_orderkey", saltBuckets = 8)
        .select(col("o_orderkey"), col("l_quantity"), col("o_orderpriority"))),

    // skew EVIDENCE row (r4 verdict #5): the fixture keys are near-uniform,
    // so this derives a genuinely hot distribution — ~30 % of all events
    // remapped onto one user — and proves the salted join still equals the
    // plain equi-join there. PartitionOpsSpec pins the fan-out (the hot
    // key's rows spread across all salt buckets); DESIGN.md records the
    // measured skew delta.
    "salted_join_skewed" -> ((s, dir) => {
      val skewed = t(s, dir, "events")
        .select(when(col("event_id") % 10 < 3, lit(1L))
            .otherwise(col("user_id")).as("user_id"),
          col("event_id"), col("event_type"))
      val build = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.operators.PartitionOps.saltedJoin(skewed, build, "user_id",
          saltBuckets = 8)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("c_mktsegment"))
    })
  )

  override def oracle: Map[String, String] = Map(
    // exact size histogram of a 32-way round-robin spread of n rows fed
    // from one upstream partition: (⌈n/32⌉, n mod 32) ∪ (⌊n/32⌋, rest) —
    // zero-size partitions produce no groupBy row, hence the c//32 > 0 guard
    "partition_rebalance" ->
      """WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM lineitem)
        |SELECT CAST(c // 32 + 1 AS BIGINT) AS cnt,
        |  CAST(c % 32 AS BIGINT) AS n_parts
        |FROM n WHERE c % 32 <> 0
        |UNION ALL
        |SELECT CAST(c // 32 AS BIGINT) AS cnt,
        |  CAST(32 - (c % 32) AS BIGINT) AS n_parts
        |FROM n WHERE c // 32 > 0""".stripMargin,

    "partition_custom_sorted" ->
      """SELECT CAST(o_orderkey % 8 AS INT) AS partition_id,
        |  row_number() OVER (PARTITION BY o_orderkey % 8
        |    ORDER BY o_orderkey) AS pos,
        |  o_orderkey
        |FROM orders""".stripMargin,

    "batch_count_collect" ->
      """SELECT COUNT(*) AS n_regions,
        |  string_agg(r_name, ',' ORDER BY r_name) AS region_names
        |FROM region""".stripMargin,
    "merge_upsert" ->
      """WITH t AS (SELECT o_orderkey, o_custkey, o_totalprice
        |           FROM orders WHERE o_orderkey % 3 <> 0),
        |s AS (SELECT o_orderkey, o_custkey, o_totalprice + 10.0 AS o_totalprice
        |      FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
        |       ELSE t.o_custkey END AS o_custkey,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
        |       ELSE t.o_totalprice END AS o_totalprice
        |FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey""".stripMargin,

    "merge_cdc_apply" ->
      """WITH c AS (SELECT c_custkey,
        |    CAST(c_acctbal AS DECIMAL(12,2)) AS bal, c_mktsegment
        |  FROM customer),
        |kept AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 1
        |      THEN CAST(bal + 100 AS DECIMAL(12,2)) ELSE bal END AS bal,
        |    c_mktsegment
        |  FROM c WHERE c_custkey % 7 <> 3),
        |ins AS (
        |  SELECT -(c_custkey + 1) AS c_custkey,
        |    CAST(0 AS DECIMAL(12,2)) AS bal, 'NEW' AS c_mktsegment
        |  FROM c WHERE c_custkey % 11 = 0)
        |SELECT c_custkey, CAST(bal AS DOUBLE) AS acctbal, c_mktsegment
        |FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)""".stripMargin,

    "merge_scd2" ->
      """WITH c AS (SELECT c_custkey, c_acctbal FROM customer),
        |tgt AS (
        |  SELECT c_custkey, c_acctbal, DATE '2023-01-01' AS valid_from,
        |    CAST(NULL AS DATE) AS valid_to FROM c
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal - 50.0, DATE '2022-01-01',
        |    DATE '2023-01-01' FROM c WHERE c_custkey % 10 = 0),
        |src AS (
        |  SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal FROM c
        |  WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal FROM c
        |  WHERE c_custkey % 7 = 3 AND c_custkey % 5 <> 0
        |  UNION ALL
        |  SELECT -(c_custkey + 1), c_acctbal FROM c
        |  WHERE c_custkey % 11 = 0),
        |keep AS (
        |  SELECT t.c_custkey, t.c_acctbal, t.valid_from, t.valid_to
        |  FROM tgt t LEFT JOIN src s ON t.c_custkey = s.c_custkey
        |  WHERE t.valid_to IS NOT NULL OR s.c_custkey IS NULL
        |     OR t.c_acctbal IS NOT DISTINCT FROM s.c_acctbal),
        |closed AS (
        |  SELECT t.c_custkey, t.c_acctbal, t.valid_from,
        |    DATE '2024-01-01' AS valid_to
        |  FROM tgt t JOIN src s ON t.c_custkey = s.c_custkey
        |  WHERE t.valid_to IS NULL
        |    AND t.c_acctbal IS DISTINCT FROM s.c_acctbal),
        |opened AS (
        |  SELECT s.c_custkey, s.c_acctbal, DATE '2024-01-01' AS valid_from,
        |    CAST(NULL AS DATE) AS valid_to
        |  FROM src s LEFT JOIN (SELECT * FROM tgt WHERE valid_to IS NULL) cu
        |    ON s.c_custkey = cu.c_custkey
        |  WHERE cu.c_custkey IS NULL
        |     OR cu.c_acctbal IS DISTINCT FROM s.c_acctbal)
        |SELECT c_custkey, c_acctbal,
        |  CAST(valid_from AS VARCHAR) AS valid_from,
        |  CAST(COALESCE(valid_to, DATE '9999-12-31') AS VARCHAR)
        |    AS valid_to
        |FROM (SELECT * FROM keep UNION ALL SELECT * FROM closed
        |      UNION ALL SELECT * FROM opened)""".stripMargin,

    "sort_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100 OFFSET 20""".stripMargin,

    "sequence_source" ->
      """SELECT range AS id, range * range % 97 AS sq_mod
        |FROM range(1, 1001)""".stripMargin,

    "sample_hash" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 100 < 10""".stripMargin,

    "zip_with_index" ->
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY doc_id) - 1 AS idx
        |FROM documents""".stripMargin,

    "sub_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |         / COUNT(*) FROM orders)""".stripMargin,

    "sub_in" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)""".stripMargin,

    "sub_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin,

    "sub_correlated_scalar" ->
      """SELECT o_orderkey, o_custkey FROM orders o1
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |         / COUNT(*)
        |  FROM orders o2 WHERE o2.o_custkey = o1.o_custkey)""".stripMargin,

    "salted_aggregate" ->
      s"""SELECT l_returnflag, ${sqlDsum("l_quantity")} AS sum_qty,
         |  COUNT(*) AS n
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "sql_having_in" ->
      s"""SELECT c.c_name, o.o_orderkey, o.o_totalprice
         |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
         |WHERE o.o_orderkey IN (
         |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
         |  HAVING ${sqlDsum("l_quantity")} > 250)""".stripMargin,

    "sample_stratified" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
        |        AS BIGINT) % 1000000
        |  < CAST(CASE o_orderpriority WHEN '1-URGENT' THEN 0.20
        |         WHEN '2-HIGH' THEN 0.10 ELSE 0.02 END * 1000000 AS BIGINT)""".stripMargin,

    "sample_bottomk" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |QUALIFY row_number() OVER (PARTITION BY c_mktsegment
        |  ORDER BY CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
        |             AS BIGINT) ASC, c_custkey ASC) <= 20""".stripMargin,

    "salted_join" ->
      """SELECT l_orderkey AS o_orderkey, l_quantity, o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 450000""".stripMargin,

    "salted_join_skewed" ->
      """SELECT e.event_id,
        |  CASE WHEN e.event_id % 10 < 3 THEN 1 ELSE e.user_id END AS user_id,
        |  e.event_type, c.c_mktsegment
        |FROM events e JOIN customer c
        |  ON (CASE WHEN e.event_id % 10 < 3 THEN 1 ELSE e.user_id END)
        |     = c.c_custkey""".stripMargin
  )
}

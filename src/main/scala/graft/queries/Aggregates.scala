package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** Aggregation inventory (SURVEY §2.1 aggregate/minBy/maxBy, §2.5 built-in
  * aggregate functions, §2.4 DataSetAggregate / GROUPING SETS).
  *
  * Reference: `AggregateUtil.transformToAggregateFunctions`
  * (`flink-table/.../runtime/aggregate/AggregateUtil.scala:1120-1360`) —
  * COUNT/SUM/AVG/MIN/MAX/COLLECT + STDDEV/VAR rewritten to SUM/COUNT
  * arithmetic by Calcite's `AggregateReduceFunctionsRule`
  * (`FlinkRuleSets.scala:95`). We apply the same rewrite explicitly for
  * STDDEV/VAR so the result is decimal-exact and engine-independent (float
  * accumulation order would otherwise break oracle hash parity).
  * GROUPING SETS: `DecomposeGroupingSetRule` (`FlinkRuleSets.scala:153`) →
  * Spark `Expand` via SQL GROUPING SETS / DataFrame cube/rollup.
  */
object Aggregates extends QuerySet {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // count/min/max/countDistinct — exact types, no float accumulation
    "agg_basic" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          countDistinct(col("l_suppkey")).as("n_supp"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          max(col("l_extendedprice")).as("max_price"),
          min(col("l_shipdate")).as("first_ship"))),

    // minBy/maxBy (reference DataSet.minBy/maxBy): arg-min/max with a
    // composite double key making the winner unique (price, then orderkey)
    "agg_minmax_by" -> ((s, dir) => {
      val key = col("l_extendedprice") + col("l_orderkey") * lit(1e-9)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(max_by(col("l_orderkey"), key).as("max_price_order"),
             min_by(col("l_orderkey"), key).as("min_price_order"))
    }),

    // STDDEV/VAR via the reference's own SUM/COUNT decomposition, exact
    "agg_stats_exact" -> ((s, dir) => {
      val d = dec2(col("l_quantity"))
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(col("l_quantity")).as("n"),
             sum(d).cast("double").as("s1"),
             sum(d * d).cast("double").as("s2"))
        .select(col("l_returnflag"), col("n"),
          ((col("s2") - col("s1") * col("s1") / col("n")) / col("n"))
            .as("var_pop"),
          ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
            .as("var_samp"),
          sqrt((col("s2") - col("s1") * col("s1") / col("n")) / col("n"))
            .as("stddev_pop"))
    }),

    // COLLECT (reference CollectAggFunction → multiset): sorted, then joined
    // to a canonical string — the driver's pandas differ cannot sort
    // array-typed columns, so the multiset is surfaced as its canonical
    // scalar serialization on BOTH engines
    "agg_collect_sorted" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          array_join(sort_array(collect_set(col("l_linestatus"))), ",")
            .as("statuses"),
          array_join(
            sort_array(collect_set(col("l_suppkey"))).cast("array<string>"),
            ",").as("suppliers"))),

    // string_agg analog: ordered concatenation of grouped values
    "agg_string_concat" -> ((s, dir) =>
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
          .as("nations"))),

    // median (percentile-cont semantics, linear interpolation in both engines)
    "agg_median" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(median(col("l_quantity")).as("med_qty"))),

    // boolean aggregates (SQL EVERY/ANY) + conditional count
    "agg_bool" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_discount") > 0.05).as("any_big_disc"),
          count_if(col("l_tax") > 0.03).as("n_taxed"))),

    // KMV distinct sketch: deterministic md5 order statistics, so even the
    // ESTIMATE hash-matches DuckDB (unlike HLL); O(k) mergeable state
    "sketch_kmv_distinct" -> ((s, dir) =>
      graft.operators.SketchOps.kmvDistinct(t(s, dir, "lineitem"),
        col("l_returnflag"), col("l_partkey"), k = 64)),

    // KMV sketch ALGEBRA: union + intersection estimates from the two
    // sides' k-min sketches alone (no raw-data rescan — the point of
    // sketches at scale)
    "sketch_kmv_setops" -> ((s, dir) =>
      graft.operators.SketchOps.kmvSetEstimate(
        t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
        t(s, dir, "lineitem").filter(col("l_returnflag") === "A"),
        col("l_partkey"), k = 64)),

    // HyperLogLog distinct sketch with a PINNED register layout (md5
    // stableHash), so registers AND estimate are engine-reproducible —
    // documents.text lands in the small-range linear-counting branch,
    // lineitem.l_orderkey in the raw-estimate branch, covering both
    // paths of the standard estimator
    "sketch_hll_distinct" -> ((s, dir) =>
      graft.operators.SketchOps.hllSummary(Seq(
        ("documents", Tables.load(s, dir, "documents"), col("text")),
        ("lineitem", t(s, dir, "lineitem"), col("l_orderkey"))))),

    // Count-Min heavy hitters over the corpus token stream: one-pass
    // mergeable d×w counter grid (broadcastable), candidates probe it
    // with min-over-rows point estimates. est >= true always (collisions
    // only overcount) — the row carries both so the contract is visible
    // in the oracle, like bloom's is_member.
    "sketch_countmin_tokens" -> ((s, dir) =>
      graft.operators.SketchOps.cmsHeavyHitters(
        Tables.load(s, dir, "documents")
          .select(explode(graft.functions.GraftFunctions.tokens(col("text")))
            .as("tok")),
        col("tok"), minEst = 200L)),

    // Bloom membership sketch: 1024-bit / 4-hash filter built over one
    // nation band's customers (bit_or words — partial+final mergeable),
    // probed by every customer. All-integer md5 bit positions, so the
    // filter WORDS and verdicts hash-match DuckDB; is_member alongside
    // demonstrates the contract (no false negatives, some false positives)
    "sketch_bloom_membership" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      graft.operators.SketchOps.bloomProbe(
          cust.filter(col("c_nationkey") < 5), col("c_custkey"),
          cust, col("c_custkey"))
        .select(col("c_custkey"), col("bloom_maybe"),
          (col("c_nationkey") < 5).as("is_member"))
    }),

    // FILTER-style conditional aggregation (pivot-shaped output)
    "agg_conditional" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "view", 1)).as("n_view"),
          sum(when(col("event_type") === "purchase", dec2(col("value"))))
            .cast("double").as("purchase_value"))),

    // GROUPING SETS through the SQL entry point (Spark Expand)
    "agg_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               |  ${sqlDsum("l_quantity")} AS sum_qty,
               |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
               |FROM lineitem
               |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
               |                        (l_returnflag), ())""".stripMargin)
    }),

    // ROLLUP via the DataFrame API
    "agg_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))),

    // CUBE via the DataFrame API
    "agg_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))),

    // equi-width histogram: one partial-aggregated shuffle over bucket ids
    // (floor division, engine-portable — no width_bucket dialect)
    "agg_histogram" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 25000).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"))),

    // exact equi-DEPTH histogram: decile boundaries via NTILE over a pinned
    // total order. The global sort is the price of exactness — at corpus
    // scale swap for per-partition quantile sketches; this is the exact
    // reference surface those approximate
    "agg_decile_bounds" -> ((s, dir) =>
      t(s, dir, "orders")
        .withColumn("decile", ntile(10).over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("o_totalprice"), col("o_orderkey"))))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))),

    // exact heavy hitters: corpus-wide top-20 tokens. Two-phase aggregation
    // (map-side combine) then a 20-row ordered take — the exact form of the
    // count-min/space-saving question, chosen because corpus vocabulary is
    // bounded; at open vocab swap the final take for SketchOps
    "agg_top_tokens" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(explode(graft.functions.GraftFunctions.tokens(col("text")))
          .as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc)
        .limit(20))
  )

  override def oracle: Map[String, String] = Map(
    "agg_basic" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  COUNT(DISTINCT l_suppkey) AS n_supp,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  MAX(l_extendedprice) AS max_price, MIN(l_shipdate) AS first_ship
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "agg_minmax_by" ->
      """SELECT l_returnflag,
        |  arg_max(l_orderkey, l_extendedprice + l_orderkey * 1e-9) AS max_price_order,
        |  arg_min(l_orderkey, l_extendedprice + l_orderkey * 1e-9) AS min_price_order
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "agg_stats_exact" ->
      s"""WITH s AS (
         |  SELECT l_returnflag, COUNT(l_quantity) AS n,
         |    CAST(SUM(${sqlDec2("l_quantity")}) AS DOUBLE) AS s1,
         |    CAST(SUM(${sqlDec2("l_quantity")} * ${sqlDec2("l_quantity")}) AS DOUBLE) AS s2
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         |  (s2 - s1 * s1 / n) / n AS var_pop,
         |  (s2 - s1 * s1 / n) / (n - 1) AS var_samp,
         |  SQRT((s2 - s1 * s1 / n) / n) AS stddev_pop
         |FROM s""".stripMargin,
    "agg_collect_sorted" ->
      """SELECT l_returnflag,
        |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
        |  array_to_string(list_sort(list(DISTINCT l_suppkey)), ',') AS suppliers
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "agg_string_concat" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey""".stripMargin,
    "agg_median" ->
      """SELECT l_returnflag, median(l_quantity) AS med_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "agg_bool" ->
      """SELECT l_returnflag, bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_discount > 0.05) AS any_big_disc,
        |  COUNT(*) FILTER (WHERE l_tax > 0.03) AS n_taxed
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // kth-smallest md5 hash per group: identical order statistics → the
    // same KMV estimate, computed relationally
    "sketch_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag AS grp,
        |    CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
        |      AS BIGINT) AS hv
        |  FROM lineitem),
        |r AS (
        |  SELECT grp, hv,
        |    row_number() OVER (PARTITION BY grp ORDER BY hv) AS rk,
        |    COUNT(*) OVER (PARTITION BY grp) AS nd
        |  FROM h)
        |SELECT grp, CAST(least(nd, 64) AS INT) AS nd_capped,
        |  round(CASE WHEN nd < 64 THEN CAST(least(nd, 64) AS DOUBLE)
        |    ELSE 63.0 * 1152921504606846976.0 /
        |      CAST(max(CASE WHEN rk = 64 THEN hv END) AS DOUBLE)
        |    END, 4) AS est
        |FROM r GROUP BY grp, nd""".stripMargin,

    // identical md5-pinned register layout: bucket = h mod 1024, rank =
    // 51 − bit-length of the 50-bit window; denominator in exact integer
    // shifts; estimate rounded to a whole count so a last-ulp libm ln()
    // difference cannot surface
    "sketch_hll_distinct" ->
      """WITH src AS (
        |  SELECT 'documents' AS src, text AS v FROM documents
        |  UNION ALL
        |  SELECT 'lineitem', CAST(l_orderkey AS VARCHAR) FROM lineitem),
        |h AS (
        |  SELECT src,
        |    CAST(concat('0x', substr(md5(v), 1, 15)) AS BIGINT) AS hv
        |  FROM src),
        |rk AS (
        |  SELECT src, hv % 1024 AS bucket,
        |    CASE WHEN hv // 1024 > 0 THEN 51 - length(bin(hv // 1024))
        |         ELSE 51 END AS rank
        |  FROM h),
        |regs AS (SELECT src, bucket, max(rank) AS r FROM rk GROUP BY 1, 2),
        |summ AS (
        |  SELECT src, COUNT(*) AS nonzero,
        |    CAST(SUM(CAST(1 AS BIGINT) << (51 - r)) +
        |      (1024 - COUNT(*)) * (CAST(1 AS BIGINT) << 51) AS BIGINT)
        |      AS denom_scaled
        |  FROM regs GROUP BY src),
        |est AS (
        |  SELECT src, nonzero, denom_scaled, 1024 - nonzero AS zeros,
        |    (0.7213 / (1 + 1.079 / 1024)) * 1024 * 1024
        |      * 2251799813685248.0 / CAST(denom_scaled AS DOUBLE) AS est_raw
        |  FROM summ)
        |SELECT src, nonzero, denom_scaled,
        |  CAST(round(CASE WHEN est_raw <= 2.5 * 1024 AND zeros > 0
        |    THEN 1024 * ln(1024 / CAST(zeros AS DOUBLE))
        |    ELSE est_raw END) AS BIGINT) AS est
        |FROM est""".stripMargin,

    // identical md5 grid cells + min-over-rows point estimates
    "sketch_countmin_tokens" ->
      raw"""WITH tok AS (
           |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS v
           |  FROM documents),
           |rows_ AS (SELECT unnest(range(4)) AS r),
           |cells AS (
           |  SELECT r,
           |    CAST(concat('0x', substr(md5(v || '#' || r), 1, 15)) AS BIGINT)
           |      % 1024 AS b,
           |    COUNT(*) AS c
           |  FROM tok CROSS JOIN rows_ GROUP BY 1, 2),
           |cand AS (SELECT v, COUNT(*) AS true_count FROM tok GROUP BY v)
           |SELECT cand.v, cand.true_count, MIN(cells.c) AS est_count
           |FROM cand CROSS JOIN rows_
           |JOIN cells ON cells.r = rows_.r
           |  AND cells.b = CAST(concat('0x',
           |    substr(md5(cand.v || '#' || rows_.r), 1, 15)) AS BIGINT) % 1024
           |GROUP BY 1, 2
           |HAVING MIN(cells.c) >= 200""".stripMargin,

    // identical md5 bit positions + bit_or words + per-hash bit tests;
    // empty filter words are absent from the aggregate → COALESCE to 0
    "sketch_bloom_membership" ->
      """WITH pos AS (
        |  SELECT c_custkey AS k, i,
        |    CAST(CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)
        |      || '#' || i), 1, 15)) AS BIGINT) % 1024 AS INT) AS p
        |  FROM customer CROSS JOIN (SELECT unnest(range(4)) AS i)
        |  WHERE c_nationkey < 5),
        |words AS (
        |  SELECT p // 32 AS w,
        |    bit_or(CAST(1 AS BIGINT) << (p % 32)) AS word
        |  FROM pos GROUP BY 1),
        |probe AS (
        |  SELECT c_custkey, c_nationkey, i,
        |    CAST(CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)
        |      || '#' || i), 1, 15)) AS BIGINT) % 1024 AS INT) AS p
        |  FROM customer CROSS JOIN (SELECT unnest(range(4)) AS i)),
        |checks AS (
        |  SELECT c_custkey, c_nationkey,
        |    bool_and(((COALESCE(word, 0) >> (p % 32)) & 1) = 1) AS maybe
        |  FROM probe LEFT JOIN words ON words.w = p // 32
        |  GROUP BY 1, 2)
        |SELECT c_custkey, maybe AS bloom_maybe,
        |  c_nationkey < 5 AS is_member
        |FROM checks""".stripMargin,

    "sketch_kmv_setops" ->
      """WITH ha AS (
        |  SELECT list_sort(list_distinct(list(
        |    CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
        |      AS BIGINT)))) AS l
        |  FROM lineitem WHERE l_returnflag = 'R'),
        |hb AS (
        |  SELECT list_sort(list_distinct(list(
        |    CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
        |      AS BIGINT)))) AS l
        |  FROM lineitem WHERE l_returnflag = 'A'),
        |s AS (SELECT ha.l[1:64] AS ma, hb.l[1:64] AS mb FROM ha, hb),
        |m AS (SELECT ma, mb,
        |        list_sort(list_distinct(flatten([ma, mb])))[1:64] AS mu
        |      FROM s)
        |SELECT CAST(len(mu) AS INT) AS n_union_capped,
        |  round(CASE WHEN len(mu) < 64 THEN CAST(len(mu) AS DOUBLE)
        |    ELSE 63.0 * 1152921504606846976.0 / CAST(mu[64] AS DOUBLE)
        |    END, 4) AS est_union,
        |  CAST(len(list_filter(mu, x -> list_contains(ma, x)
        |    AND list_contains(mb, x))) AS INT) AS n_both,
        |  round(CASE WHEN len(mu) < 64
        |    THEN CAST(len(list_filter(ma, x -> list_contains(mb, x)))
        |      AS DOUBLE)
        |    ELSE CAST(len(list_filter(mu, x -> list_contains(ma, x)
        |        AND list_contains(mb, x))) AS DOUBLE) / 64
        |      * (63.0 * 1152921504606846976.0 / CAST(mu[64] AS DOUBLE))
        |    END, 4) AS est_intersection
        |FROM m""".stripMargin,
    "agg_conditional" ->
      s"""SELECT user_id,
         |  COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
         |  COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
         |  CAST(SUM(${sqlDec2("value")}) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value
         |FROM events GROUP BY user_id""".stripMargin,
    "agg_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
         |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
         |                        (l_returnflag), ())""".stripMargin,
    "agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
         |  ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "agg_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "agg_histogram" ->
      s"""SELECT CAST(floor(o_totalprice / 25000) AS INT) AS bucket,
         |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1""".stripMargin,

    "agg_decile_bounds" ->
      """SELECT decile, COUNT(*) AS n, MIN(o_totalprice) AS lo,
        |  MAX(o_totalprice) AS hi
        |FROM (SELECT o_totalprice, ntile(10) OVER (
        |        ORDER BY o_totalprice, o_orderkey) AS decile
        |      FROM orders)
        |GROUP BY decile""".stripMargin,

    "agg_top_tokens" ->
      raw"""SELECT tok, COUNT(*) AS n
           |FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
           |      FROM documents)
           |GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20""".stripMargin
  )
}

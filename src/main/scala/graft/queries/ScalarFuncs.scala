package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Scalar function inventory (SURVEY §2.6 — reference FunctionCatalog,
  * `flink-table/.../validate/FunctionCatalog.scala:150-252`, plus SQL-only
  * CONCAT/CONCAT_WS/LOG in `functions/sql/ScalarSqlFunctions.scala:36-53`).
  *
  * Every reference scalar maps to a built-in Catalyst expression; the oracle
  * side re-expresses the few DuckDB gaps (initcap, overlay, conv,
  * get_json_object) as ANSI compositions. Transcendentals are rounded to 6 dp
  * on BOTH sides: libm results differ in the last ulp across engines, and the
  * hash compare is exact.
  */
object ScalarFuncs extends QuerySet {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // string functions over nation (25 rows, deterministic)
    "scalar_string" -> ((s, dir) =>
      t(s, dir, "nation").select(
        col("n_nationkey"),
        length(col("n_name")).as("len"),
        lower(col("n_name")).as("lo"),
        upper(lower(col("n_name"))).as("up"),
        initcap(lower(col("n_name"))).as("ic"),
        substring(col("n_name"), 1, 6).as("sub"),
        concat(col("n_name"), lit("_"), col("n_regionkey")).as("cat"),
        concat_ws("-", col("n_name"), col("n_regionkey"), lit("x")).as("catws"),
        lpad(col("n_nationkey"), 4, "0").as("pad"),
        rpad(col("n_name"), 12, ".").as("rpadded"),
        trim(lit("  x  ")).as("trimmed"),
        replace(col("n_name"), lit("_"), lit("-")).as("repl"),
        locate("_", col("n_name")).as("pos"),
        reverse(col("n_name")).as("rev"),
        repeat(lit("ab"), 2).as("rep"),
        translate(col("n_name"), "NATIO", "natio").as("tr"),
        overlay(col("n_name"), lit("XX"), lit(2), lit(3)).as("ovl"),
        col("n_name").like("NATION_1%").as("lk"),
        regexp_replace(col("n_name"), "[0-9]+", "#").as("rx"),
        regexp_extract(col("n_name"), "([0-9]+)", 1).as("rxe"),
        split_part(col("n_name"), lit("_"), lit(2)).as("sp"))),

    // math functions over a lineitem projection
    "scalar_math" -> ((s, dir) =>
      t(s, dir, "lineitem").filter(col("l_linenumber") === 1)
        .select(
          col("l_orderkey"),
          abs(col("l_quantity") - 25).as("absv"),
          ceil(col("l_extendedprice")).cast("double").as("ceilv"),
          floor(col("l_extendedprice")).cast("double").as("floorv"),
          round(col("l_extendedprice"), 1).as("roundv"),
          sqrt(col("l_quantity")).as("sqrtv"),
          round(exp(col("l_discount")), 6).as("expv"),
          round(log(col("l_extendedprice")), 6).as("lnv"),
          round(log10(col("l_extendedprice")), 6).as("log10v"),
          round(pow(col("l_quantity"), 2), 6).as("powv"),
          (col("l_orderkey") % 7).as("modv"),
          signum(col("l_discount") - 0.05).cast("double").as("signv"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("greatestv"),
          least(col("l_tax"), col("l_discount")).as("leastv"),
          round(degrees(col("l_discount")), 6).as("degv"),
          round(radians(col("l_quantity")), 6).as("radv"),
          round(sin(col("l_discount")), 6).as("sinv"),
          round(cos(col("l_discount")), 6).as("cosv"),
          round(atan(col("l_discount")), 6).as("atanv"))),

    // temporal functions over orders + the OVERLAPS predicate
    "scalar_temporal" -> ((s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") % 100 === 0)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yy"),
          quarter(col("o_orderdate")).as("qq"),
          month(col("o_orderdate")).as("mm"),
          dayofmonth(col("o_orderdate")).as("dd"),
          (dayofweek(col("o_orderdate")) - 1).as("dow"),
          dayofyear(col("o_orderdate")).as("doy"),
          hour(col("o_orderdate")).as("hh"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          date_trunc("month", col("o_orderdate")).as("mstart"),
          last_day(col("o_orderdate")).cast("timestamp").as("mend"),
          datediff(lit("1998-01-01").cast("date"),
                   col("o_orderdate").cast("date")).as("days_to_98"),
          (col("o_orderdate") + expr("INTERVAL '3' MONTH")).as("plus3m"),
          (col("o_orderdate") - expr("INTERVAL '90' DAY")).as("minus90d"),
          GraftFunctions.temporalOverlaps(
            col("o_orderdate"), col("o_orderdate") + expr("INTERVAL '30' DAY"),
            lit("1997-01-01").cast("timestamp"), lit("1997-03-01").cast("timestamp")
          ).as("overlaps97q1"))),

    // conditional / null handling
    "scalar_conditional" -> ((s, dir) =>
      t(s, dir, "customer").filter(col("c_custkey") % 10 === 0)
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("band"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
                   lit("(bldg)")).as("seg"),
          col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY").as("is_auto_mach"),
          col("c_acctbal").between(1000, 2000).as("in_band"),
          isnull(nullif(col("c_nationkey"), lit(3))).as("is_n3"),
          (col("c_acctbal") > 9000 || col("c_nationkey") === 0).as("either"),
          (!col("c_mktsegment").startsWith("B")).as("not_b"))),

    // cast matrix
    "scalar_cast" -> ((s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") % 200 === 0)
        .select(
          col("o_orderkey"),
          // decimal surfaced as its canonical string: a DECIMAL output column
          // reaches pandas as Decimal-vs-float and never hash-matches
          col("o_totalprice").cast("decimal(12,2)").cast("string").as("dec"),
          col("o_totalprice").cast("int").as("toint"),
          col("o_totalprice").cast("bigint").as("tolong"),
          col("o_totalprice").cast("string").as("tostr"),
          col("o_orderkey").cast("double").as("todouble"),
          // surfaced as timestamp: a DATE output column reaches the driver's
          // pandas compare as date-vs-datetime64 and never matches
          col("o_orderdate").cast("date").cast("timestamp").as("todate"),
          col("o_orderdate").cast("date").cast("string").as("datestr"),
          lit("123").cast("int").as("strint"),
          lit("12.5").cast("double").as("strdouble"),
          (col("o_orderkey") % 2 === 0).cast("int").as("booltoint"))),

    // arrays, maps, JSON extraction (reference array/map constructors +
    // cardinality/ITEM, FunctionCatalog.scala:241-244; props JSON in events).
    // Array-typed outputs are surfaced as canonical joined strings: the
    // driver's pandas differ cannot sort array columns. Doubles inside the
    // sorted array go through DECIMAL(12,2) so the string form matches the
    // oracle digit-for-digit.
    "scalar_array_map" -> ((s, dir) =>
      t(s, dir, "events").filter(col("event_id") % 50 === 0)
        .select(
          col("event_id"),
          array_join(array(col("user_id"), col("event_id"))
            .cast("array<string>"), ",").as("arr"),
          size(array(col("user_id"), col("event_id"), lit(7L))).as("card"),
          // ITEM on an inline array. getItem (GetArrayItem, 0-based), not
          // element_at: Spark 4.1.2's ElementAt doGenCode on an inline
          // non-null array emits a null-check referencing a variable that
          // Janino rejects ("isNull_N is not an rvalue"), which silently
          // drops the WHOLE projection — all 9 columns — out of codegen
          // into interpreted mode. Identical value for in-bounds literal
          // indices; the other element_at call sites (real array columns)
          // codegen fine.
          array(col("user_id"), col("event_id")).getItem(1).as("at2"),
          array_contains(array(lit("click"), lit("view")), col("event_type"))
            .as("is_cv"),
          array_join(
            sort_array(array(Exact.dec2(col("value")),
                             Exact.dec2(col("value") * 2),
                             lit(0).cast("decimal(12,2)")))
              .cast("array<string>"), ",").as("sorted"),
          array_join(slice(sequence(lit(1), lit(6)), 2, 3)
            .cast("array<string>"), ",").as("sliced"),
          element_at(
            map(lit("t"), col("event_type"), lit("u"),
                col("user_id").cast("string")), "t").as("mapval"),
          get_json_object(col("props"), "$.k").cast("int").as("json_k")))
  )

  override def oracle: Map[String, String] = Map(
    "scalar_string" ->
      """SELECT n_nationkey, length(n_name) AS len, lower(n_name) AS lo,
        |  upper(lower(n_name)) AS up,
        |  upper(substr(lower(n_name),1,1)) || substr(lower(n_name),2) AS ic,
        |  substr(n_name, 1, 6) AS sub,
        |  n_name || '_' || CAST(n_regionkey AS VARCHAR) AS cat,
        |  concat_ws('-', n_name, CAST(n_regionkey AS VARCHAR), 'x') AS catws,
        |  lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS pad,
        |  rpad(n_name, 12, '.') AS rpadded,
        |  trim('  x  ') AS trimmed,
        |  replace(n_name, '_', '-') AS repl,
        |  strpos(n_name, '_') AS pos,
        |  reverse(n_name) AS rev,
        |  repeat('ab', 2) AS rep,
        |  translate(n_name, 'NATIO', 'natio') AS tr,
        |  substr(n_name,1,1) || 'XX' || substr(n_name,5) AS ovl,
        |  n_name LIKE 'NATION_1%' AS lk,
        |  regexp_replace(n_name, '[0-9]+', '#', 'g') AS rx,
        |  coalesce(regexp_extract(n_name, '([0-9]+)', 1), '') AS rxe,
        |  split_part(n_name, '_', 2) AS sp
        |FROM nation""".stripMargin,

    "scalar_math" ->
      """SELECT l_orderkey,
        |  abs(l_quantity - 25) AS absv,
        |  CAST(ceil(l_extendedprice) AS DOUBLE) AS ceilv,
        |  CAST(floor(l_extendedprice) AS DOUBLE) AS floorv,
        |  round(l_extendedprice, 1) AS roundv,
        |  sqrt(l_quantity) AS sqrtv,
        |  round(exp(l_discount), 6) AS expv,
        |  round(ln(l_extendedprice), 6) AS lnv,
        |  round(log10(l_extendedprice), 6) AS log10v,
        |  round(pow(l_quantity, 2), 6) AS powv,
        |  l_orderkey % 7 AS modv,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS signv,
        |  greatest(l_quantity, l_discount * 100) AS greatestv,
        |  least(l_tax, l_discount) AS leastv,
        |  round(degrees(l_discount), 6) AS degv,
        |  round(radians(l_quantity), 6) AS radv,
        |  round(sin(l_discount), 6) AS sinv,
        |  round(cos(l_discount), 6) AS cosv,
        |  round(atan(l_discount), 6) AS atanv
        |FROM lineitem WHERE l_linenumber = 1""".stripMargin,

    "scalar_temporal" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yy, quarter(o_orderdate) AS qq,
        |  month(o_orderdate) AS mm, day(o_orderdate) AS dd,
        |  dayofweek(o_orderdate) AS dow, dayofyear(o_orderdate) AS doy,
        |  hour(o_orderdate) AS hh,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  date_trunc('month', o_orderdate) AS mstart,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS mend,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
        |    AS days_to_98,
        |  o_orderdate + INTERVAL 3 MONTH AS plus3m,
        |  o_orderdate - INTERVAL 90 DAY AS minus90d,
        |  (o_orderdate <= TIMESTAMP '1997-03-01 00:00:00'
        |   AND TIMESTAMP '1997-01-01 00:00:00'
        |       <= o_orderdate + INTERVAL 30 DAY) AS overlaps97q1
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,

    "scalar_conditional" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg'
        |       WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS band,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(bldg)') AS seg,
        |  c_mktsegment IN ('AUTOMOBILE', 'MACHINERY') AS is_auto_mach,
        |  c_acctbal BETWEEN 1000 AND 2000 AS in_band,
        |  nullif(c_nationkey, 3) IS NULL AS is_n3,
        |  (c_acctbal > 9000 OR c_nationkey = 0) AS either,
        |  NOT (c_mktsegment LIKE 'B%') AS not_b
        |FROM customer WHERE c_custkey % 10 = 0""".stripMargin,

    "scalar_cast" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS dec,
        |  CAST(trunc(o_totalprice) AS INT) AS toint,
        |  CAST(trunc(o_totalprice) AS BIGINT) AS tolong,
        |  CAST(o_totalprice AS VARCHAR) AS tostr,
        |  CAST(o_orderkey AS DOUBLE) AS todouble,
        |  CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS todate,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS datestr,
        |  CAST('123' AS INT) AS strint,
        |  CAST('12.5' AS DOUBLE) AS strdouble,
        |  CAST(o_orderkey % 2 = 0 AS INT) AS booltoint
        |FROM orders WHERE o_orderkey % 200 = 0""".stripMargin,

    "scalar_array_map" ->
      """SELECT event_id,
        |  array_to_string([user_id, event_id], ',') AS arr,
        |  len([user_id, event_id, 7]) AS card,
        |  [user_id, event_id][2] AS at2,
        |  list_contains(['click', 'view'], event_type) AS is_cv,
        |  array_to_string(list_transform(
        |    list_sort([CAST(value AS DECIMAL(12,2)),
        |               CAST(value * 2 AS DECIMAL(12,2)),
        |               CAST(0 AS DECIMAL(12,2))]),
        |    x -> CAST(x AS VARCHAR)), ',') AS sorted,
        |  array_to_string(generate_series(1,6)[2:4], ',') AS sliced,
        |  map(['t','u'], [event_type, CAST(user_id AS VARCHAR)])['t'][1] AS mapval,
        |  CAST(json_extract(props, '$.k') AS INT) AS json_k
        |FROM events WHERE event_id % 50 = 0""".stripMargin
  )
}

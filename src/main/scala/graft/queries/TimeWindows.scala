package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** Group-window inventory on the event-time column (SURVEY §2.2 window
  * assigners, §2.3 group windows `Tumble/Slide/Session`, §2.4
  * DataSetWindowAggregate / DataStreamGroupWindowAggregate).
  *
  * Batch semantics here (same window functions drive the streaming suite —
  * `F.window`/`F.session_window` are identical in `readStream` plans; the
  * streaming side is exercised in StreamingSpec with watermarks). Oracles
  * reproduce Spark's epoch-aligned window math in DuckDB arithmetic.
  */
object TimeWindows extends QuerySet {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling 1h windows: per-window traffic + exact value sum
    "window_tumble" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("event_type"), col("n"), col("sum_value"))),

    // sliding 1h windows every 15min: each event lands in 4 windows
    "window_slide" -> ((s, dir) =>
      t(s, dir, "events").filter(col("event_type") === "purchase")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("n"), col("sum_value"))),

    // session windows per user, 30min inactivity gap
    "window_session" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("session_window.start").as("w_start"),
          col("session_window.end").as("w_end"),
          col("user_id"), col("n"), col("sum_value"))),

    // tumbling window + per-window ranking (window agg feeding OVER)
    "window_tumble_topusers" -> ((s, dir) => {
      val perUser = t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("user_id"), col("n"))
      val byDay = org.apache.spark.sql.expressions.Window
        .partitionBy(col("w_start")).orderBy(col("n").desc, col("user_id"))
      perUser.withColumn("rk", row_number().over(byDay)).filter(col("rk") <= 3)
    }),

    // SAX motif discovery over per-user value series (integer PAA + fixed
    // breakpoints — see TimeSeriesOps; sensor-series analytics was the
    // PROTEUS project's own application domain)
    "ts_sax_motifs" -> ((s, dir) =>
      graft.operators.TimeSeriesOps.saxMotifs(t(s, dir, "events"))),

    // classic per-window z-normalized SAX (Lin et al. 2003 §3.1) — the
    // opt-in variant closing the round-8 pinned deviation; the z-score
    // symbol compare is integer cross-multiplication (decimal(38,0) /
    // HUGEINT), so the word is value-oracle-exact despite normalizing
    "ts_sax_motifs_znorm" -> ((s, dir) =>
      graft.operators.TimeSeriesOps.saxMotifsZNorm(t(s, dir, "events")))
  )

  // DuckDB mirrors of Spark's epoch-aligned window arithmetic.
  private val tumble1h =
    "to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT))::TIMESTAMP"
  private val tumble1d =
    "to_timestamp(CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT))::TIMESTAMP"

  // z-normalized SAX symbol for segment difference `d` (= w·T_s − segLen·S)
  // against w²·variance `v`: the sign-split + squared compare from
  // TimeSeriesOps.saxWordsZNorm, in HUGEINT (181980100 = 6745² · segLen²,
  // segLen = 2; 10⁸ clears the (6745/10⁴)² denominator)
  private def znSym(d: String): String =
    s"""CAST(CASE WHEN v = 0 THEN 2
       |  WHEN $d < 0 AND CAST($d AS HUGEINT)*$d*100000000
       |    > CAST(181980100 AS HUGEINT)*v THEN 0
       |  WHEN $d < 0 THEN 1
       |  WHEN CAST($d AS HUGEINT)*$d*100000000
       |    < CAST(181980100 AS HUGEINT)*v THEN 2
       |  ELSE 3 END AS VARCHAR)""".stripMargin

  override def oracle: Map[String, String] = Map(
    // classic z-normalized SAX: same 8-lead window build as ts_sax_motifs,
    // then exact integer z-score symbols (see znSym above)
    "ts_sax_motifs_znorm" ->
      s"""WITH e AS (
         |  SELECT user_id AS k, CAST(round(value * 100) AS BIGINT) AS vq,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS pos
         |  FROM events),
         |win AS (
         |  SELECT k, pos, vq AS v0,
         |    lead(vq, 1) OVER w AS v1, lead(vq, 2) OVER w AS v2,
         |    lead(vq, 3) OVER w AS v3, lead(vq, 4) OVER w AS v4,
         |    lead(vq, 5) OVER w AS v5, lead(vq, 6) OVER w AS v6,
         |    lead(vq, 7) OVER w AS v7
         |  FROM e WINDOW w AS (PARTITION BY k ORDER BY pos)),
         |agg AS (
         |  SELECT k, v0+v1+v2+v3+v4+v5+v6+v7 AS s,
         |    v0*v0+v1*v1+v2*v2+v3*v3+v4*v4+v5*v5+v6*v6+v7*v7 AS ss,
         |    v0+v1 AS t0, v2+v3 AS t1, v4+v5 AS t2, v6+v7 AS t3
         |  FROM win WHERE v7 IS NOT NULL),
         |d AS (
         |  SELECT k, 8*ss - s*s AS v, 8*t0 - 2*s AS d0, 8*t1 - 2*s AS d1,
         |    8*t2 - 2*s AS d2, 8*t3 - 2*s AS d3
         |  FROM agg),
         |words AS (
         |  SELECT k, ${znSym("d0")} || ${znSym("d1")} ||
         |    ${znSym("d2")} || ${znSym("d3")} AS word
         |  FROM d)
         |SELECT word, CAST(COUNT(*) AS BIGINT) AS n_windows,
         |  CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys
         |FROM words GROUP BY word HAVING COUNT(*) >= 2""".stripMargin,

    // 8-reading windows, PAA segments of 2, symbols on fixed centi-unit
    // breakpoints 1500/3500/7000; // is integer floor division like the
    // Spark side's exact floor (all sums non-negative)
    "ts_sax_motifs" ->
      """WITH e AS (
        |  SELECT user_id AS k, CAST(round(value * 100) AS BIGINT) AS vq,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS pos
        |  FROM events),
        |win AS (
        |  SELECT k, pos, vq AS v0,
        |    lead(vq, 1) OVER w AS v1, lead(vq, 2) OVER w AS v2,
        |    lead(vq, 3) OVER w AS v3, lead(vq, 4) OVER w AS v4,
        |    lead(vq, 5) OVER w AS v5, lead(vq, 6) OVER w AS v6,
        |    lead(vq, 7) OVER w AS v7
        |  FROM e WINDOW w AS (PARTITION BY k ORDER BY pos)),
        |sym AS (
        |  SELECT k, (v0+v1)//2 AS m0, (v2+v3)//2 AS m1,
        |    (v4+v5)//2 AS m2, (v6+v7)//2 AS m3
        |  FROM win WHERE v7 IS NOT NULL),
        |words AS (
        |  SELECT k,
        |    CAST(CASE WHEN m0<1500 THEN 0 WHEN m0<3500 THEN 1
        |      WHEN m0<7000 THEN 2 ELSE 3 END AS VARCHAR) ||
        |    CAST(CASE WHEN m1<1500 THEN 0 WHEN m1<3500 THEN 1
        |      WHEN m1<7000 THEN 2 ELSE 3 END AS VARCHAR) ||
        |    CAST(CASE WHEN m2<1500 THEN 0 WHEN m2<3500 THEN 1
        |      WHEN m2<7000 THEN 2 ELSE 3 END AS VARCHAR) ||
        |    CAST(CASE WHEN m3<1500 THEN 0 WHEN m3<3500 THEN 1
        |      WHEN m3<7000 THEN 2 ELSE 3 END AS VARCHAR) AS word
        |  FROM sym)
        |SELECT word, CAST(COUNT(*) AS BIGINT) AS n_windows,
        |  CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys
        |FROM words GROUP BY word HAVING COUNT(*) >= 2""".stripMargin,

    "window_tumble" ->
      s"""SELECT $tumble1h AS w_start,
         |  $tumble1h + INTERVAL 1 HOUR AS w_end,
         |  event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "window_slide" ->
      s"""WITH slid AS (
         |  SELECT to_timestamp(CAST(floor(epoch(ts) / 900) * 900
         |           - g.i * 900 AS BIGINT))::TIMESTAMP AS w_start, value, ts
         |  FROM events, generate_series(0, 3) g(i)
         |  WHERE event_type = 'purchase')
         |SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM slid
         |WHERE ts < w_start + INTERVAL 1 HOUR AND ts >= w_start
         |GROUP BY 1, 2""".stripMargin,

    // gaps-and-islands: session = maximal run with gap < 30min; Spark's
    // session end = last event + gap
    "window_session" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
         |              >= INTERVAL 30 MINUTE
         |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM events),
         |sessions AS (
         |  SELECT user_id, ts, value,
         |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM marked)
         |SELECT MIN(ts) AS w_start, MAX(ts) + INTERVAL 30 MINUTE AS w_end,
         |  user_id, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM sessions GROUP BY user_id, sid""".stripMargin,

    "window_tumble_topusers" ->
      s"""WITH per_user AS (
         |  SELECT $tumble1d AS w_start, user_id, COUNT(*) AS n
         |  FROM events GROUP BY 1, 2),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY w_start
         |    ORDER BY n DESC, user_id) AS rk
         |  FROM per_user)
         |SELECT w_start, user_id, n, rk FROM ranked WHERE rk <= 3""".stripMargin
  )
}

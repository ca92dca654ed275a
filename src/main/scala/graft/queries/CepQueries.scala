package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.cep.{Cep, Pattern}
import graft.streaming.EventStream.EventRow

/** CEP inventory (SURVEY §2.8): the Pattern API subset over the events
  * table, driver-verified because each pinned match semantic is expressible
  * as window SQL in DuckDB. Keyed by user_id, ordered by (ts, event_id).
  */
object CepQueries extends QuerySet {

  private def events(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.load(s, dir, "events").as[EventRow]
  }

  private def ord(e: EventRow): (Long, Long) = (e.ts.getTime, e.event_id)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // strict contiguity: click immediately followed by purchase
    "cep_strict_next" -> ((s, dir) => {
      import s.implicits._
      val p = Pattern.begin[EventRow]("a")(_.event_type == "click")
        .next("b")(_.event_type == "purchase")
      Cep.batch(events(s, dir), (e: EventRow) => e.user_id, ord, p) {
        (k, m) => (k, m.first("a").event_id, m.first("b").event_id)
      }.toDF("user_id", "a_id", "b_id")
    }),

    // relaxed contiguity + within: earliest purchase ≤ 30 min after a click
    "cep_followed_by_within" -> ((s, dir) => {
      import s.implicits._
      val p = Pattern.begin[EventRow]("a")(_.event_type == "click")
        .followedBy("b")(_.event_type == "purchase")
        .within(30 * 60 * 1000L)
      Cep.batch(events(s, dir), (e: EventRow) => e.user_id, ord, p) {
        (k, m) => (k, m.first("a").event_id, m.first("b").event_id)
      }.toDF("user_id", "a_id", "b_id")
    }),

    // times(3): three consecutive errors (overlapping candidates allowed)
    "cep_times_consecutive" -> ((s, dir) => {
      import s.implicits._
      val p = Pattern.begin[EventRow]("e")(_.event_type == "error").times(3)
      Cep.batch(events(s, dir), (e: EventRow) => e.user_id, ord, p) {
        (k, m) => (k, m.first("e").event_id, m.last("e").event_id)
      }.toDF("user_id", "first_id", "last_id")
    }),

    // oneOrMore: greedy maximal consecutive view-runs of length ≥ 2
    "cep_one_or_more_runs" -> ((s, dir) => {
      import s.implicits._
      val p = Pattern.begin[EventRow]("v")(_.event_type == "view").oneOrMore
      Cep.batch(events(s, dir), (e: EventRow) => e.user_id, ord, p) {
        (k, m) => (k, m("v").length.toLong,
          m.first("v").event_id, m.last("v").event_id)
      }.toDF("user_id", "run_len", "first_id", "last_id")
        .filter(org.apache.spark.sql.functions.col("run_len") >= 2)
    })
  )

  override def oracle: Map[String, String] = Map(
    "cep_strict_next" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |    lead(event_type) OVER w AS nxt_type,
        |    lead(event_id) OVER w AS nxt_id
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id AS a_id, nxt_id AS b_id
        |FROM seq WHERE event_type = 'click' AND nxt_type = 'purchase'""".stripMargin,

    "cep_followed_by_within" ->
      """WITH pairs AS (
        |  SELECT c.user_id, c.event_id AS a_id, p.event_id AS b_id,
        |    row_number() OVER (PARTITION BY c.user_id, c.event_id
        |      ORDER BY p.ts, p.event_id) AS rn
        |  FROM events c JOIN events p
        |    ON c.user_id = p.user_id
        |   AND c.event_type = 'click' AND p.event_type = 'purchase'
        |   AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
        |   AND p.ts <= c.ts + INTERVAL 30 MINUTE)
        |SELECT user_id, a_id, b_id FROM pairs WHERE rn = 1""".stripMargin,

    "cep_times_consecutive" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |    lead(event_type, 1) OVER w AS t1, lead(event_id, 1) OVER w AS i1,
        |    lead(event_type, 2) OVER w AS t2, lead(event_id, 2) OVER w AS i2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id AS first_id, i2 AS last_id
        |FROM seq
        |WHERE event_type = 'error' AND t1 = 'error' AND t2 = 'error'""".stripMargin,

    "cep_one_or_more_runs" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_v,
        |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) = 'view' THEN 1 ELSE 0 END AS prev_v
        |  FROM events),
        |grp AS (
        |  SELECT user_id, event_id, ts, is_v,
        |    SUM(CASE WHEN is_v = 1 AND prev_v = 0 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
        |  FROM seq),
        |runs AS (
        |  SELECT DISTINCT user_id, gid,
        |    CAST(COUNT(*) OVER pw AS BIGINT) AS run_len,
        |    first_value(event_id) OVER pw AS first_id,
        |    last_value(event_id) OVER pw AS last_id
        |  FROM grp WHERE is_v = 1
        |  WINDOW pw AS (PARTITION BY user_id, gid ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, run_len, first_id, last_id
        |FROM runs WHERE run_len >= 2""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.AsyncOps
import graft.streaming.EventStream.EventRow

import scala.concurrent.Future

/** Async-enrichment + routing inventory (SURVEY §2.2 AsyncDataStream,
  * split/select). The async function is a deterministic local computation
  * standing in for an external lookup — the Future plumbing (bounded
  * in-flight window per partition) is the part under test.
  */
object AsyncQueries extends QuerySet {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "async_ordered_enrich" -> ((s, dir) => {
      import s.implicits._
      val ds = Tables.load(s, dir, "events").as[EventRow]
      AsyncOps.orderedWait(ds, capacity = 32) { (e, ec) =>
        Future {
          (e.event_id, e.user_id * 1000 + e.event_type.length.toLong)
        }(ec)
      }.toDF("event_id", "enriched")
    }),

    "async_unordered_enrich" -> ((s, dir) => {
      import s.implicits._
      val ds = Tables.load(s, dir, "events").as[EventRow]
      AsyncOps.unorderedWait(ds, capacity = 32) { (e, ec) =>
        Future {
          (e.event_id, math.round(e.value * 100))
        }(ec)
      }.toDF("event_id", "cents")
    }),

    // split/select: route by type, recombine two named routes
    "split_select" -> ((s, dir) => {
      val routes = AsyncOps.split(Tables.load(s, dir, "events"),
        "clicks" -> (col("event_type") === "click"),
        "big" -> (col("value") > 9.0))
      routes("clicks").select(col("event_id"), lit("clicks").as("route"))
        .union(routes("big").select(col("event_id"), lit("big").as("route")))
    })
  )

  override def oracle: Map[String, String] = Map(
    "async_ordered_enrich" ->
      """SELECT event_id,
        |  user_id * 1000 + length(event_type) AS enriched
        |FROM events""".stripMargin,

    "async_unordered_enrich" ->
      """SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
        |FROM events""".stripMargin,

    "split_select" ->
      """SELECT event_id, 'clicks' AS route FROM events
        |WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, 'big' AS route FROM events WHERE value > 9.0""".stripMargin
  )
}

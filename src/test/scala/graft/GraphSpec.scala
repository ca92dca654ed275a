package graft

import org.apache.spark.sql.functions._
import graft.graph.{Graph, GraphAlgorithms}

/** Graph algorithms on hand-checkable graphs. */
class GraphSpec extends SparkSpecBase {

  private def g(es: Seq[(Long, Long, Long)], vs: Seq[Long]): Graph = {
    import spark.implicits._
    Graph(vs.toDF("vid"), es.toDF("src", "dst", "weight"))
  }

  test("connected components: two components, min label wins") {
    val graph = g(Seq((1L, 2L, 1L), (2L, 3L, 1L), (10L, 11L, 1L)),
      Seq(1L, 2L, 3L, 10L, 11L, 99L))
    val cc = GraphAlgorithms.connectedComponents(graph).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      99L -> 99L))
  }

  test("shortest paths: relaxation beats the direct edge") {
    // 1→2 (5), 1→3 (1), 3→2 (1): dist(2) = 2 via 3, not 5
    val graph = g(Seq((1L, 2L, 5L), (1L, 3L, 1L), (3L, 2L, 1L)),
      Seq(1L, 2L, 3L, 4L))
    import spark.implicits._
    val dist = GraphAlgorithms.shortestPaths(graph, Seq(1L).toDF("vid"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(dist(1L).contains(0L))
    assert(dist(2L).contains(2L))
    assert(dist(3L).contains(1L))
    assert(dist(4L).isEmpty) // unreachable
  }

  test("pagerank matches an independent local computation") {
    // A=1 → B,C ; B=2 → C ; C=3 → A
    val graph = g(Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)),
      Seq(1L, 2L, 3L))
    val iters = 10; val d = 0.85; val n = 3
    // independent reference computation
    var r = Map(1L -> 1.0 / n, 2L -> 1.0 / n, 3L -> 1.0 / n)
    for (_ <- 1 to iters) {
      val c2 = r(1L) / 2
      val c3 = r(1L) / 2 + r(2L) / 1
      val c1 = r(3L) / 1
      r = Map(
        1L -> ((1 - d) / n + d * c1),
        2L -> ((1 - d) / n + d * c2),
        3L -> ((1 - d) / n + d * c3))
    }
    val got = GraphAlgorithms.pageRank(graph, iters, d).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-12, s"$k") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("subgraph keeps only edges between surviving vertices") {
    val graph = g(Seq((1L, 2L, 1L), (2L, 3L, 1L)), Seq(1L, 2L, 3L))
    val sub = graph.subgraph(col("vid") <= 2)
    assert(sub.vertices.count() == 2 && sub.edges.count() == 1)
  }
}

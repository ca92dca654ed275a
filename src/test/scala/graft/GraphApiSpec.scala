package graft

import org.apache.spark.sql.functions._
import graft.graph.Graph

/** Graph transformation surface (reference Graph.java API; SURVEY §2.8). */
class GraphApiSpec extends SparkSpecBase {

  private def g(es: Seq[(Long, Long, Long)], vs: Seq[Long]): Graph = {
    import spark.implicits._
    Graph(vs.toDF("vid"), es.toDF("src", "dst", "weight"))
  }

  private val base = Seq((1L, 2L, 10L), (2L, 3L, 20L), (3L, 1L, 30L))

  test("mapVertices / mapEdges rewrite the value columns") {
    val graph = g(base, Seq(1L, 2L, 3L))
    val mv = graph.mapVertices(col("vid") * 100)
    assert(mv.vertices.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 100L), (2L, 200L), (3L, 300L)))
    val me = graph.mapEdges(col("weight") + 1)
    assert(me.edges.select(sum("weight")).head.getLong(0) == 63L)
  }

  test("degrees: in, out, and total (isolated vertex scores zero)") {
    val graph = g(base, Seq(1L, 2L, 3L, 9L))
    val out = graph.outDegrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val in = graph.inDegrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tot = graph.degrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(in == Map(2L -> 1L, 3L -> 1L, 1L -> 1L))
    assert(tot == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 9L -> 0L))
  }

  test("triplets join endpoint attributes onto each edge") {
    import spark.implicits._
    val graph = Graph(
      Seq((1L, "a"), (2L, "b")).toDF("vid", "tag"),
      Seq((1L, 2L, 5L)).toDF("src", "dst", "weight"))
    val t = graph.triplets.collect().head
    assert(t.getAs[String]("src_tag") == "a")
    assert(t.getAs[String]("dst_tag") == "b")
    assert(t.getAs[Long]("weight") == 5L)
  }

  test("joinWithVertices attaches columns; filterOnEdges keeps vertices") {
    import spark.implicits._
    val graph = g(base, Seq(1L, 2L, 3L))
    val joined = graph.joinWithVertices(Seq((1L, "x")).toDF("vid", "note"))
    assert(joined.vertices.filter(col("note").isNotNull).count() == 1)
    val fe = graph.filterOnEdges(col("weight") >= 20)
    assert(fe.edges.count() == 2 && fe.vertices.count() == 3)
  }

  test("addVertices keeps existing rows; removeVertices drops incident edges") {
    import spark.implicits._
    val graph = g(base, Seq(1L, 2L, 3L))
    val added = graph.addVertices(Seq(3L, 4L).toDF("vid"))
    assert(added.vertices.count() == 4) // 3 deduped, 4 added
    val removed = graph.removeVertices(Seq(3L).toDF("vid"))
    assert(removed.vertices.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(removed.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L))) // 2→3 and 3→1 dropped with vertex 3
  }

  test("addEdges / removeEdges by (src,dst) pair") {
    import spark.implicits._
    val graph = g(base, Seq(1L, 2L, 3L))
    assert(graph.addEdges(Seq((1L, 3L, 7L)).toDF("src", "dst", "weight"))
      .edges.count() == 4)
    val re = graph.removeEdges(Seq((2L, 3L)).toDF("src", "dst"))
    assert(re.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (3L, 1L)))
  }

  test("union dedups vertices but retains duplicate edges (Gelly contract)") {
    val g1 = g(Seq((1L, 2L, 1L)), Seq(1L, 2L))
    val g2 = g(Seq((1L, 2L, 1L), (2L, 3L, 1L)), Seq(2L, 3L))
    val u = g1.union(g2)
    assert(u.vertices.count() == 3)
    assert(u.edges.count() == 3) // the duplicate 1→2 is kept
  }

  test("difference removes the other graph's vertices and incident edges") {
    val g1 = g(base, Seq(1L, 2L, 3L))
    val g2 = g(Seq.empty, Seq(3L))
    val d = g1.difference(g2)
    assert(d.vertices.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(d.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)))
  }

  test("intersect: distinct pairs vs multiplicity pairing") {
    val g1 = g(Seq((1L, 2L, 1L), (1L, 2L, 1L), (2L, 3L, 1L)), Seq(1L, 2L, 3L))
    val g2 = g(Seq((1L, 2L, 9L), (1L, 2L, 9L), (9L, 9L, 9L)), Seq(1L, 2L, 9L))
    assert(g1.intersect(g2).edges.count() == 1)
    assert(g1.intersect(g2, distinctEdges = false).edges.count() == 2)
    assert(g1.intersect(g2).vertices.collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L))
  }

  test("validate detects dangling edge endpoints") {
    assert(g(base, Seq(1L, 2L, 3L)).validate)
    assert(!g(base, Seq(1L, 2L)).validate)
  }

  test("translateGraphIds rewrites vertex and edge ids consistently") {
    val t = g(base, Seq(1L, 2L, 3L)).translateGraphIds(c => c + 1000L)
    assert(t.vertices.collect().map(_.getLong(0)).toSet == Set(1001L, 1002L, 1003L))
    assert(t.validate)
  }

  test("runScatterGatherIteration re-derives connected components") {
    import graft.graph.GraphAlgorithms
    val und = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L),
      (10L, 11L, 1L), (11L, 10L, 1L))
    val graph = g(und, Seq(1L, 2L, 3L, 10L, 11L, 99L))
    val init = graph.vertices.select(col("vid"), col("vid").as("comp"))
    val viaApi = graph.runScatterGatherIteration(init, maxIter = 6) {
      triplets => triplets.select(col("dst").as("vid"), col("comp"))
    } { (cur, msgs) =>
      cur.select(col("vid"), col("comp")).unionByName(msgs)
        .groupBy("vid").agg(min(col("comp")).as("comp"))
    }
    val viaLibrary = GraphAlgorithms
      .connectedComponents(g(Seq((1L, 2L, 1L), (2L, 3L, 1L), (10L, 11L, 1L)),
        Seq(1L, 2L, 3L, 10L, 11L, 99L)))
    assert(viaApi.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      viaLibrary.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("runGatherSumApplyIteration computes multi-source min-distance") {
    // gather = dist + weight per edge, sum = min, apply = elementwise min
    val graph = g(Seq((1L, 2L, 5L), (1L, 3L, 1L), (3L, 2L, 1L)),
      Seq(1L, 2L, 3L))
    val init = graph.vertices.select(col("vid"),
      when(col("vid") === 1L, 0L).otherwise(Long.MaxValue).as("dist"))
    val out = graph.runGatherSumApplyIteration(init, maxIter = 4,
      gatherExpr = when(col("dist") =!= Long.MaxValue,
        col("dist") + col("weight")).otherwise(Long.MaxValue),
      sumExpr = c => min(c)) { (cur, folded) =>
      cur.join(folded, Seq("vid"), "left")
        .select(col("vid"),
          least(col("dist"), coalesce(col("m"), col("dist"))).as("dist"))
    }
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 1L), s"$got")
  }
}

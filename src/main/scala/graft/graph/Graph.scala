package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Iterate

/** Gelly-style property graph over DataFrames (reference `Graph<K,VV,EV>`,
  * `flink-libraries/flink-gelly/.../graph/Graph.java`; SURVEY §2.8).
  *
  * vertices: (vid [, attrs…]);  edges: (src, dst [, weight]).
  * Algorithms are Pregel-style driver loops over joins (Iterate.bulk/delta)
  * — at scale both frames should be pre-partitioned on the join keys; each
  * superstep is then a co-partitioned join + map-side-combining min/sum
  * aggregation, the same shuffle profile as Gelly's scatter-gather.
  */
final case class Graph(vertices: DataFrame, edges: DataFrame) {

  def reverse: Graph = copy(edges = edges
    .withColumnRenamed("src", "tmp").withColumnRenamed("dst", "src")
    .withColumnRenamed("tmp", "dst"))

  /** Treat every edge as bidirectional. */
  def undirectedEdges: DataFrame =
    edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))

  def outDegrees: DataFrame =
    edges.groupBy(col("src").as("vid")).agg(count(lit(1)).as("deg"))

  def subgraph(vpred: Column): Graph = {
    val vs = vertices.filter(vpred)
    val keep = vs.select(col("vid"))
    Graph(vs, edges
      .join(keep.withColumnRenamed("vid", "src"), "src")
      .join(keep.withColumnRenamed("vid", "dst"), "dst"))
  }
}

object GraphAlgorithms {

  /** Connected components by iterative min-label propagation (reference
    * `graph/library/ConnectedComponents.java`). Converges once no label
    * changes; each superstep = one co-partitioned join + min-agg. */
  def connectedComponents(g: Graph, maxIter: Int = 50): DataFrame = {
    // restrict edge endpoints to the vertex set ONCE, outside the loop:
    // src is restricted naturally by the per-superstep inner join against
    // the solution set, but a dst absent from vertices would inject a
    // phantom result row (Gelly keys results to the vertex set)
    val und = g.undirectedEdges
      .join(g.vertices.select(col("vid").as("dst")), "dst", "left_semi")
      .localCheckpoint()
    val init = g.vertices.select(col("vid"), col("vid").as("comp"))
    Iterate.bulk(init, maxIter,
      converged = (old, next) =>
        old.join(next, "vid")
          .filter(old("comp") =!= next("comp")).isEmpty) { cur =>
      val candidates = und
        .join(cur.withColumnRenamed("vid", "src"), "src")
        .select(col("dst").as("vid"), col("comp"))
        .union(cur)
      candidates.groupBy("vid").agg(min(col("comp")).as("comp"))
    }
  }

  /** Multi-source shortest paths (reference `graph/library/SingleSourceShortestPaths`)
    * by Bellman-Ford delta iteration: the workset holds vertices whose
    * distance improved last round. */
  def shortestPaths(g: Graph, sources: DataFrame, maxIter: Int = 50): DataFrame = {
    val e = g.edges.select(col("src"), col("dst"), col("weight"))
      .localCheckpoint()
    val init = g.vertices
      .join(sources.withColumn("is_src", lit(true)), Seq("vid"), "left")
      .select(col("vid"),
        when(col("is_src"), lit(0L)).otherwise(lit(Long.MaxValue)).as("dist"))
    var solution = init.localCheckpoint()
    var workset = solution.filter(col("dist") === 0L).localCheckpoint()
    var i = 0
    while (i < maxIter && !workset.isEmpty) {
      val relaxed = e
        .join(workset.withColumnRenamed("vid", "src"), "src")
        .select(col("dst").as("vid"), (col("dist") + col("weight")).as("cand"))
        .groupBy("vid").agg(min(col("cand")).as("cand"))
      val joined = solution.join(relaxed, Seq("vid"), "left")
        .select(col("vid"), col("dist"), col("cand"))
      val next = joined.select(col("vid"),
        when(col("cand").isNotNull && col("cand") < col("dist"), col("cand"))
          .otherwise(col("dist")).as("dist"))
      workset = joined
        .filter(col("cand").isNotNull && col("cand") < col("dist"))
        .select(col("vid"), col("cand").as("dist"))
        .localCheckpoint()
      solution = if ((i + 1) % 5 == 0) next.localCheckpoint() else next
      i += 1
    }
    solution.select(col("vid"),
      when(col("dist") === Long.MaxValue, lit(null).cast("long"))
        .otherwise(col("dist")).as("dist"))
  }

  /** Triangle enumeration (reference `library/TriangleEnumerator`): orient
    * edges low→high, build wedges by joining on the middle vertex, close
    * each wedge against the oriented edge set. Two equi-joins on vertex
    * ids — the standard distributed formulation; skew mitigation at scale
    * = AQE skew-join on hub vertices. */
  def triangles(g: Graph): DataFrame = {
    val oriented = g.undirectedEdges
      .filter(col("src") < col("dst")).distinct().localCheckpoint()
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"),
        col("e2.dst").as("c"))
    wedges.join(oriented.as("e3"),
        col("a") === col("e3.src") && col("c") === col("e3.dst"), "left_semi")
      .select(col("a"), col("b"), col("c"))
  }

  /** PageRank, fixed-iteration (reference `library/linkanalysis/PageRank`).
    * Double-precision sums shuffle in nondeterministic order, so exact
    * cross-engine hashes are not defined for this op — correctness is pinned
    * by GraphSpec against hand-computed values instead of the SQL oracle. */
  def pageRank(g: Graph, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val n = g.vertices.count()
    val deg = g.outDegrees.localCheckpoint()
    val e = g.edges.select(col("src"), col("dst")).localCheckpoint()
    val init = g.vertices.select(col("vid"), lit(1.0 / n).as("rank"))
    Iterate.bulk(init, iters) { cur =>
      val contribs = e
        .join(cur.withColumnRenamed("vid", "src"), "src")
        .join(deg.withColumnRenamed("vid", "src"), "src")
        .select(col("dst").as("vid"), (col("rank") / col("deg")).as("c"))
        .groupBy("vid").agg(sum(col("c")).as("c"))
      g.vertices.select(col("vid"))
        .join(contribs, Seq("vid"), "left")
        .select(col("vid"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
    }
  }
}

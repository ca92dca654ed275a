package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bipartite property graph (reference `graph/bipartite/BipartiteGraph
  * .java:54`): disjoint top and bottom vertex sets, edges (top, bottom
  * [, weight]).
  *
  * The simple projections (`projectionTopSimple` :127,
  * `projectionBottomSimple` :171) connect two same-side vertices once PER
  * shared neighbor — a wedge self-join on the opposite endpoint, emitting
  * both ordered pairs with the two original edge values carried as
  * (w1, w2), exactly Gelly's contract (duplicate pairs from different
  * shared neighbors are retained). The self-join shuffles on the shared
  * endpoint — the inverted-index shape; a hub endpoint with k incident
  * edges emits k² wedges, so at 100 TB hot endpoints are the AQE-skew or
  * df-cap case, same as the dedup joins. */
final case class BipartiteGraph(topVertices: DataFrame,
                                bottomVertices: DataFrame,
                                edges: DataFrame) {

  def projectionTopSimple: Graph = {
    val a = edges.select(col("top").as("src"), col("bottom").as("b"),
      col("weight").as("w1"))
    val b = edges.select(col("top").as("dst"), col("bottom").as("b"),
      col("weight").as("w2"))
    Graph(topVertices,
      a.join(b, "b").filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"), col("w1"), col("w2")))
  }

  def projectionBottomSimple: Graph = {
    val a = edges.select(col("bottom").as("src"), col("top").as("t"),
      col("weight").as("w1"))
    val b = edges.select(col("bottom").as("dst"), col("top").as("t"),
      col("weight").as("w2"))
    Graph(bottomVertices,
      a.join(b, "t").filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"), col("w1"), col("w2")))
  }
}

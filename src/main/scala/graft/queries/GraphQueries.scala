package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph.{Graph, GraphAlgorithms}

/** Graph inventory (SURVEY §2.8 Gelly): deterministic fixture-derived graphs
  * whose algorithm results have independent closed forms the DuckDB oracle
  * can state directly — the oracle is ground truth, not a re-run of the
  * algorithm.
  *
  *  - chain graph: documents 0..N linked i→i+1 within blocks of 10
  *    (components and in-block prefix distances are closed-form);
  *  - bipartite graph: customers ↔ nation hubs (components = nations).
  */
object GraphQueries extends QuerySet {

  /** doc chain: edges i→i+1 unless i ends a 10-block; weight (i%3)+1. */
  private def chainGraph(s: SparkSession, dir: String): Graph = {
    val docs = Tables.load(s, dir, "documents").select(col("doc_id").as("vid"))
    val edges = docs.filter(col("vid") % 10 =!= 9)
      .select(col("vid").as("src"), (col("vid") + 1).as("dst"),
        (col("vid") % 3 + 1).cast("long").as("weight"))
    Graph(docs, edges)
  }

  /** customers ↔ nation hub vertices (hub vid = 1000000 + nationkey). */
  private def bipartiteGraph(s: SparkSession, dir: String): Graph = {
    val cust = Tables.load(s, dir, "customer")
    val vertices = cust.select(col("c_custkey").as("vid"))
      .union(cust.select((col("c_nationkey") + 1000000L).as("vid")).distinct())
    val edges = cust.select(col("c_custkey").as("src"),
      (col("c_nationkey") + 1000000L).as("dst"))
    Graph(vertices, edges)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // min-label propagation down 10-chains: needs the full iteration depth
    "graph_cc_chain" -> ((s, dir) =>
      GraphAlgorithms.connectedComponents(chainGraph(s, dir), maxIter = 15)),

    // star components around nation hubs
    "graph_cc_bipartite" -> ((s, dir) =>
      GraphAlgorithms.connectedComponents(bipartiteGraph(s, dir), maxIter = 5)),

    // multi-source SSSP from every block head
    "graph_sssp_chain" -> ((s, dir) => {
      val g = chainGraph(s, dir)
      val sources = g.vertices.filter(col("vid") % 10 === 0)
      GraphAlgorithms.shortestPaths(g, sources, maxIter = 15)
    }),

    // PageRank on the chain graph — no SQL-expressible oracle (floating
    // sums over shuffles); driver records the weaker rows-only check and
    // GraphSpec pins exact values on a hand-computed graph
    "graph_pagerank" -> ((s, dir) =>
      GraphAlgorithms.pageRank(chainGraph(s, dir), iters = 5)
        .select(col("vid"), round(col("rank"), 9).as("rank"))),

    // degree statistics of the undirected chain graph
    "graph_degrees" -> ((s, dir) => {
      val g = chainGraph(s, dir)
      g.undirectedEdges.groupBy(col("src").as("vid"))
        .agg(count(lit(1)).as("degree"))
    }),

    // triangle enumeration on chain + skip-2 edges (closed-form triangles
    // (i, i+1, i+2) inside each 10-block)
    "graph_triangles" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select(col("doc_id").as("vid"))
      val e1 = docs.filter(col("vid") % 10 =!= 9)
        .select(col("vid").as("src"), (col("vid") + 1).as("dst"))
      val e2 = docs.filter(col("vid") % 10 <= 7)
        .select(col("vid").as("src"), (col("vid") + 2).as("dst"))
      GraphAlgorithms.triangles(Graph(docs, e1.union(e2)))
    })
  )

  override def oracle: Map[String, String] = Map(
    // component = block head (min label in the chain)
    "graph_cc_chain" ->
      """SELECT doc_id AS vid, doc_id - doc_id % 10 AS comp
        |FROM documents""".stripMargin,

    // component = min customer key of the nation (customer keys < 1e6)
    "graph_cc_bipartite" ->
      """WITH comp AS (
        |  SELECT c_nationkey, MIN(c_custkey) AS comp
        |  FROM customer GROUP BY c_nationkey)
        |SELECT c.c_custkey AS vid, comp.comp AS comp
        |FROM customer c JOIN comp ON c.c_nationkey = comp.c_nationkey
        |UNION ALL
        |SELECT DISTINCT c.c_nationkey + 1000000 AS vid, comp.comp AS comp
        |FROM customer c JOIN comp ON c.c_nationkey = comp.c_nationkey""".stripMargin,

    // undirected chain degree: interior vertices 2, block boundaries 1
    "graph_degrees" ->
      """SELECT doc_id AS vid,
        |  CAST(CASE WHEN doc_id % 10 = 0 OR doc_id % 10 = 9 THEN 1 ELSE 2 END
        |    AS BIGINT) AS degree
        |FROM documents""".stripMargin,

    // triangles (i, i+1, i+2) require both chain edges and the skip edge —
    // i%10 <= 7 keeps all three vertices inside one block
    "graph_triangles" ->
      """SELECT doc_id AS a, doc_id + 1 AS b, doc_id + 2 AS c
        |FROM documents
        |WHERE doc_id % 10 <= 7
        |  AND doc_id + 2 <= (SELECT MAX(doc_id) FROM documents)""".stripMargin,

    // distance = prefix sum of (i%3)+1 weights from the block head
    "graph_sssp_chain" ->
      """SELECT doc_id AS vid,
        |  CAST(coalesce(SUM(doc_id % 3 + 1) OVER (
        |    PARTITION BY doc_id // 10 ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS dist
        |FROM documents""".stripMargin
  )
}

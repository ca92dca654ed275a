package graft

import org.apache.spark.sql.functions._
import graft.table._
import graft.streaming.AsyncOps
import graft.streaming.EventStream.EventRow

import scala.concurrent.Future

/** Façade/API-surface behavior: ProteusTable composes to the same results
  * as direct DataFrame code; async enrichment preserves or relaxes order as
  * specified. */
class TableApiSpec extends SparkSpecBase {

  private def env: TableEnv = {
    Tables.registerAll(spark, sfDir)
    new TableEnv(spark)
  }

  test("façade pipeline equals direct DataFrame pipeline") {
    val t = env
    val viaFacade = t.scan("customer")
      .filter(col("c_acctbal") > 0)
      .groupBy(col("c_nationkey"))
      .select(count(lit(1)).as("n"))
      .toDF
    val direct = Tables.load(spark, sfDir, "customer")
      .filter(col("c_acctbal") > 0)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
    assert(viaFacade.exceptAll(direct).isEmpty && direct.exceptAll(viaFacade).isEmpty)
  }

  test("union is distinct, unionAll keeps duplicates (reference semantics)") {
    val t = env
    val n = t.scan("nation").select(col("n_regionkey"))
    assert(n.unionAll(n).toDF.count() == 50)
    assert(n.union(n).toDF.count() == 5)
  }

  test("window DSL produces start/end columns") {
    val t = env.fromDataFrame(Tables.load(spark, sfDir, "events"))
      .window(Tumble over "1 hour" on "ts" as "w")
      .groupBy("w")
      .select(count(lit(1)).as("n"))
      .toDF
    assert(t.columns.toSet == Set("n", "w_start", "w_end"))
    assert(t.count() > 0)
  }

  test("sqlQuery passthrough returns a ProteusTable") {
    val t = env.sqlQuery("SELECT COUNT(*) AS n FROM nation")
    assert(t.toDF.collect().head.getLong(0) == 25)
  }

  test("insertInto appends to a saved table") {
    val t = env
    t.scan("nation").select(col("n_nationkey"), col("n_name"))
      .toDF.write.mode("overwrite").saveAsTable("ins_target")
    t.scan("nation").filter(col("n_nationkey") < 5)
      .select(col("n_nationkey"), col("n_name"))
      .insertInto("ins_target")
    assert(spark.table("ins_target").count() == 30)
  }

  test("joinLateral correlates a table function; leftOuter keeps empty rows") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "")).toDF("id", "text")
    val tokenize = split(trim(col("text")), " ")
    // inner correlate: row 2 generates "" → filter blanks as the UDTF would
    val inner = ProteusTable(docs)
      .joinLateral(filter(tokenize, t => length(t) > 0), "tok")
      .toDF
    assert(inner.count() == 3)
    assert(inner.select("id").distinct().as[Long].collect().toSet == Set(1L))
    // left outer correlate: row 2 survives with a null token
    val louter = ProteusTable(docs)
      .leftOuterJoinLateral(filter(tokenize, t => length(t) > 0), "tok")
      .toDF
    assert(louter.count() == 4)
    assert(louter.filter(col("id") === 2 && col("tok").isNull).count() == 1)
  }

  test("orderedWait preserves input order within partitions") {
    import spark.implicits._
    val ds = spark.range(0, 1000, 1, 4).map(_.toLong)
    val out = AsyncOps.orderedWait(ds, capacity = 16) { (x, ec) =>
      Future { x }(ec)
    }
    // per-partition order preserved => sortWithinPartitions is a no-op
    val parts = out.mapPartitions(it => Iterator.single(it.toSeq))
      .collect()
    parts.foreach(p => assert(p == p.sorted))
    assert(parts.map(_.size).sum == 1000)
  }
}

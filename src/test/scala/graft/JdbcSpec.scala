package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.IoOps

/** JDBC source/sink round trip (SURVEY §2.7 JDBC) against the embedded
  * Derby engine that ships on the Spark classpath — the real
  * `spark.read.jdbc` / `write.jdbc` scan, pushdown, and batched-insert
  * machinery, no network.
  */
class JdbcSpec extends SparkSpecBase {

  private lazy val url = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  test("jdbc write + read round trip preserves rows and schema") {
    val nation = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    IoOps.writeJdbc(nation, url, "NATION_RT")
    val back = IoOps.readJdbc(spark, url, "NATION_RT")
    assert(back.count() == nation.count())
    assert(back.columns.map(_.toLowerCase).sorted.toSeq ==
      nation.columns.map(_.toLowerCase).sorted.toSeq)
    assert(back.select(sum(col("n_nationkey"))).head.getLong(0) ==
      nation.select(sum(col("n_nationkey"))).head.getLong(0))
  }

  test("partitioned jdbc read splits the key range across tasks") {
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    IoOps.writeJdbc(cust, url, "CUST_RT")
    val hi = cust.select(max(col("c_custkey"))).head.getLong(0)
    val back = IoOps.readJdbcPartitioned(spark, url, "CUST_RT",
      "C_CUSTKEY", 1L, hi, numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == cust.count())
  }

  test("jdbc append mode accumulates batches") {
    val r = Tables.load(spark, sfDir, "region").select(col("r_regionkey"))
    IoOps.writeJdbc(r, url, "REGION_RT")
    IoOps.writeJdbc(r, url, "REGION_RT", SaveMode.Append)
    assert(IoOps.readJdbc(spark, url, "REGION_RT").count() == 2 * r.count())
  }
}

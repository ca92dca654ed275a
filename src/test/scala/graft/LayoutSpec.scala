package graft

import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

/** Layout assertions for the lake-maintenance primitives — content
  * identity is the value oracle's job (`io_zorder_layout`,
  * `io_compact_roundtrip`); these specs measure the LAYOUT effect the
  * operators exist for. */
class LayoutSpec extends SparkSpecBase {

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet"))

  test("zorderValue: interleave is exact on known bit patterns") {
    import spark.implicits._
    // x=0b101 (bits to odd positions -> 0b10001x pattern), y=0b11
    val rows = Seq((5L, 3L), (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L))
      .toDF("x", "y")
      .select(LayoutOps.zorderValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i + 1)) |
        (((y >> i) & 1L) << (2 * i))).sum
    assert(rows == Seq(morton(5, 3), 0L, 2L, 1L, morton(65535, 65535)))
    assert(morton(1, 0) == 2L && morton(0, 1) == 1L)
  }

  test("zorderWrite: second-dimension spans per file shrink vs a linear sort") {
    // two independent well-spread 8-bit dimensions: a single-dimension
    // sort leaves every file spanning the FULL y domain (a y filter then
    // prunes nothing), while the Morton layout gives every file a
    // bounded y window — the reason z-order exists
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_partkey") % 256).as("x"), (col("l_orderkey") % 256).as("y"))
    val zdir = sources.IoOps.scratch("spec_zorder")
    val ldir = sources.IoOps.scratch("spec_linear")
    // 16 files = 4 fixed Morton prefix bits = interior y windows of 64
    LayoutOps.zorderWrite(li, zdir, col("x"), col("y"), 16)
    li.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(ldir)
    def avgYSpan(dir: String): Double = {
      // per-FILE y bounding span — what footer min/max stats prune a
      // y-filter on; input_file_name groups rows by physical file
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max(col("y")) - min(col("y")) + 1).as("span"))
        .agg(avg(col("span"))).collect()(0)
      spans.getDouble(0)
    }
    val (zs, ls) = (avgYSpan(zdir), avgYSpan(ldir))
    assert(zs < 0.5 * ls,
      f"z-order avg y-span $zs%.0f not tighter than linear $ls%.0f")
    // content identity
    val back = spark.read.parquet(zdir)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("compactFiles: bounded file count, identical content") {
    val o = Tables.load(spark, sfDir, "orders").select(col("o_orderkey"))
    val frag = sources.IoOps.scratch("spec_frag")
    val dst = sources.IoOps.scratch("spec_compact")
    o.repartition(48).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(frag)
    assert(parquetFiles(frag).size == 48)
    LayoutOps.compactFiles(spark, frag, dst, targetFileBytes = 64L * 1024 * 1024)
    // tiny fixture → everything fits one target file
    assert(parquetFiles(dst).size == 1, s"${parquetFiles(dst).size} files")
    val back = spark.read.parquet(dst)
    assert(back.count() == o.count())
    assert(back.exceptAll(o).isEmpty && o.exceptAll(back).isEmpty)
  }
}

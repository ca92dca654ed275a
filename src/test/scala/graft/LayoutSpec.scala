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

  test("applySplitToLake rewrites ONLY flagged cells' partitions; unflagged files are byte-identical and untouched") {
    val embs = Tables.load(spark, sfDir, "embeddings")
    val dir = sources.IoOps.scratch("spec_split_lake")
    LayoutOps.writeIvfBucketed(embs, cells = 8, dir)
    def partFiles(): Map[String, Seq[(String, Long, Long)]] =
      new java.io.File(dir).listFiles().toSeq
        .filter(_.getName.startsWith("cell="))
        .map(d => d.getName -> d.listFiles().toSeq
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length(), f.lastModified()))
          .sortBy(_._1))
        .toMap
    val before = partFiles()
    // near-uniform fixture: 103% of mean flags the densest cells without
    // flagging everything (the spec exercises partial rewrite)
    val cents = LayoutOps.applySplitToLake(spark, dir, splitIters = 1,
      splitThresholdPct = 103)
    val after = partFiles()
    val lake = spark.read.parquet(dir)
      .select(col("nid"), col("cell").cast("long").as("cell"))
      .localCheckpoint()
    val flaggedTwins = after.keySet.diff(before.keySet) // cell=<c+8> dirs
    assert(flaggedTwins.nonEmpty, "103% must flag on the fixture")
    val flaggedIds = flaggedTwins
      .map(_.stripPrefix("cell=").toLong - 8L)
    // unflagged partitions: same file names, sizes, AND mtimes — the
    // dynamic overwrite never opened them
    val untouched = before.keySet
      .filterNot(d => flaggedIds.contains(d.stripPrefix("cell=").toLong))
    assert(untouched.nonEmpty)
    untouched.foreach(d => assert(before(d) == after(d),
      s"unflagged partition $d was rewritten"))
    // content conservation: every vector still present exactly once
    assert(lake.count() == embs.count())
    assert(lake.select(col("nid")).distinct().count() == embs.count())
    // the returned centroid table covers every live cell id exactly once
    val live = lake.select(col("cell")).distinct().collect()
      .map(_.getLong(0)).toSet
    val centIds = cents.collect().map(_.getLong(0)).toSet
    assert(centIds == live,
      s"centroid ids $centIds != live cells $live")
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

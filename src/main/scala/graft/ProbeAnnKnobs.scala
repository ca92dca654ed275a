package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Two focused ANN-knob ladders the round-12 recall work raised:
  *
  *  - `recallm`: recall@3 vs cost of the composed IVF×JL member as the
  *    shortlist width `m` grows — quantifies the scaladoc claim "recall
  *    recovers with m" with the same exact hit-count idiom as the
  *    `sim_recall_*` rows.
  *  - `knnbits`: the k-NN graph's LSH blocking knob — pair volume is
  *    ~n²/2^bits, so `bits` trades build cost against blocking recall
  *    (edges found); the r12 sf10 cell measured 679 s at bits=4, this
  *    ladder fills the 6/8 columns plus the edge/mutual counts that show
  *    what the cheaper blocking loses.
  *
  * Usage: runMain graft.ProbeAnnKnobs <recallm|knnbits> <dir> [csv-knob]
  */
object ProbeAnnKnobs {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val mode = args.headOption.getOrElse("recallm")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = Tables.load(spark, dir, "embeddings")
    embs.write.format("noop").mode("overwrite").save()
    val qs = embs.filter(col("vec_id") % 100 === 0)
    mode match {
      case "recallm" =>
        val ms = (if (args.length > 2) args(2) else "10,25,50,100,200")
          .split(",").map(_.trim.toInt).toSeq
        val bf = SimilarityOps.topKBruteForce(embs, qs, 3)
          .select(col("qid"), col("nid")).localCheckpoint()
        for (m <- ms) {
          val t0 = System.nanoTime()
          val approx = SimilarityOps.ivfProjectedTopK(embs, qs, k = 3,
              cells = 16, nprobe = 4, sprobe = 2, m = m)
            .select(col("qid"), col("nid"))
          val rec = SimilarityOps.recallAtK(approx, bf)
            .agg(avg(col("recall_micro"))).collect()(0).getDouble(0) / 1e6
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[recallm] m=$m%-5d recall@3=$rec%.3f wall=$dt%.2fs")
        }
      case "knnbits" =>
        val bits = (if (args.length > 2) args(2) else "4,6,8")
          .split(",").map(_.trim.toInt).toSeq
        for (b <- bits) {
          val t0 = System.nanoTime()
          val g = SimilarityOps.knnGraph(embs, k = 3, bits = b)
            .localCheckpoint()
          val dt = (System.nanoTime() - t0) / 1e9
          val edges = g.count()
          val mutual = g.filter(col("mutual")).count()
          println(f"[knnbits] bits=$b%-3d build=$dt%.1fs edges=$edges mutual=$mutual")
        }
      case "cellkernel" =>
        // centroid-placement cell ladder (r12 verdict item 2): the
        // array-of-structs array_min literal vs the native graft_cell
        // kernel at growing cell counts — where does the struct form's
        // expression tree drop the projection out of codegen, and what
        // does the kernel's flat literal cost there instead. Values are
        // asserted equal per run (the spec's differential at probe scale).
        import graft.functions.GraftFunctions.{cellArgmin, lld2, quantize}
        val cellsList = (if (args.length > 2) args(2) else "16,256,4096")
          .split(",").map(_.trim.toInt).toSeq
        val n = embs.count()
        for (cells <- cellsList) {
          // deterministic synthetic centroid grid (hash-seeded, like the
          // GenScale vectors) so the ladder does not depend on corpus size
          val cents: Seq[(Long, Seq[Long])] = (0 until cells).map { c =>
            c.toLong -> (0 until 64).map { d =>
              val h = java.security.MessageDigest.getInstance("MD5")
                .digest(s"cell-$c-$d".getBytes("UTF-8"))
              (java.nio.ByteBuffer.wrap(h).getLong % 1000000L)
            }.toSeq
          }
          val qv = quantize(col("embedding"))
          def timeIt(label: String, placed: org.apache.spark.sql.Column): Long = {
            val t0 = System.nanoTime()
            val s = embs.select(placed.as("cell"))
              .agg(sum(col("cell"))).collect()(0).getLong(0)
            println(f"[cellkernel] cells=$cells%-5d $label%-8s " +
              f"${(System.nanoTime() - t0) / 1e9}%6.2fs checksum=$s n=$n")
            s
          }
          val kernel = timeIt("kernel", element_at(typedLit(cents.map(_._1)),
            (cellArgmin(qv, typedLit(cents.map(_._2))) + 1L).cast("int")))
          // the struct-array form at high cells builds a >100k-node tree;
          // guard with a size cap so the ladder reports "form unusable"
          // instead of dying in Janino at the top rung
          if (cells <= 1024) {
            val structForm = array_min(array(cents.map { case (cid, cq) =>
              struct(lld2(qv, lit(cq.toArray)).as("d2"), lit(cid).as("cid"))
            }: _*)).getField("cid")
            val sv = timeIt("struct", structForm)
            require(sv == kernel, s"kernel/struct disagree at cells=$cells")
          } else println(f"[cellkernel] cells=$cells%-5d struct   SKIPPED " +
            "(literal tree beyond plan-size sanity)")
        }
      case "recallsampled" =>
        // sampled-recall production mode (r12 verdict item 7): the full
        // audit (all vec_id%100 queries, embedded ground truth) vs
        // recallAtKSampled panels — estimate drift and wall-clock cost
        val mods = (if (args.length > 2) args(2) else "1,4,10")
          .split(",").map(_.trim.toLong).toSeq
        def member(q: org.apache.spark.sql.DataFrame) =
          SimilarityOps.topKIvfProbe(embs, q, 3, cells = 16, nprobe = 4)
            .select(col("qid"), col("nid"))
        for (m <- mods) {
          val t0 = System.nanoTime()
          val r = SimilarityOps.recallAtKSampled(embs, qs, m)(member)
            .agg(avg(col("recall_micro")), count(lit(1))).collect()(0)
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[recallsampled] mod=$m%-4d queries=${r.getLong(1)}%-6d " +
            f"recall@3=${r.getDouble(0) / 1e6}%.3f wall=$dt%.2fs")
        }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up fixture generator: replicates the driver fixture
  * N× (default 10×, sf0.1 → "sf1") with disjoint key spaces per copy, so
  * every join/group cardinality scales the way a genuinely larger dataset
  * would. Used only for the DESIGN.md scaling-evidence runs ([[BenchScale]]);
  * correctness stays on the driver fixtures + DuckDB oracle.
  *
  * Shape decisions (why this is a fair 10× and not a degenerate one):
  *   - Every key column shifts by `copy * STRIDE` (STRIDE > any fixture key),
  *     so per-copy join fan-outs are preserved exactly: lineitem⋈orders stays
  *     4 rows/order, orders⋈customer stays 10/customer, etc.
  *   - `documents.text` gets a per-copy token suffix (`_c<i>`), so shingle
  *     and token spaces are disjoint across copies. Without this every doc
  *     would have 9 verbatim twins and each dup cluster would grow 10×
  *     (LSH bucket pair counts ×100) — that measures a data pathology, not
  *     engine scaling. Real 10× corpora add mostly-new text.
  *   - `embeddings.embedding` gets a small per-copy per-dimension
  *     deterministic perturbation (±2.5% of the component, hash-seeded), so
  *     cross-copy vectors are near but not identical in direction — LSH
  *     bucket occupancy scales ~linearly instead of packing 10 exact
  *     duplicates into every bucket.
  *   - `events.user_id`/`ts` shift per copy (user cardinality ×10; time
  *     unchanged → window density ×10, which is what a bigger stream does).
  *   - nation/region are fixed dimensions in TPC-H and stay single-copy.
  *
  * Replication is one scan per table via `explode(sequence(0, n-1))` — no
  * driver-side loops, no collect; the same plan works at any multiplier.
  */
object GenScale {

  /** Larger than every key in the driver fixtures (max observed 149,999 at
    * sf0.1), so shifted copies can never collide. */
  val Stride = 10000000L

  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val fixedDims = Set("nation", "region")

  def replicate(df: DataFrame, table: String, copies: Int): DataFrame = {
    if (fixedDims(table) || copies == 1) return df
    val keys = keyCols.getOrElse(table, Seq.empty)
    require(keys.nonEmpty, s"no key columns mapped for table $table")
    keys.foreach { k =>
      // cast + null-check first: an empty table (or int-typed key) must
      // report itself as such, not surface as an NPE/ClassCastException
      // dressed up as a stride failure
      val row = df.agg(max(col(k).cast("long"))).collect()(0)
      require(!row.isNullAt(0),
        s"$table.$k has no non-null values — cannot validate replication stride")
      val mx = row.getLong(0)
      require(mx < Stride, s"$table.$k max $mx >= stride $Stride")
    }
    val exploded = df.withColumn("graft_copy",
      explode(sequence(lit(0L), lit(copies - 1L))))
    val shifted = keys.foldLeft(exploded) { (d, k) =>
      d.withColumn(k, col(k) + col("graft_copy") * Stride)
    }
    val perturbed = table match {
      case "documents" =>
        // token-suffix every word on copies > 0: shingle/token spaces become
        // disjoint across copies while within-copy near-dup structure is
        // preserved verbatim (both sides of a planted pair transform alike)
        shifted.withColumn("text",
          when(col("graft_copy") === 0, col("text")).otherwise(
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1_c"), col("graft_copy").cast("string")))))
      case "embeddings" =>
        // copies > 0 get FRESH hash-random vectors (uniform in [-1,1] per
        // dim, seeded by the shifted vec_id + dim). Multiplicative jitter
        // was tried first and measured: it keeps cross-copy cosine ≈ 1, so
        // every LSH bucket packs 10 near-twins and pair volume grows ×100 —
        // a data pathology, not engine scaling (dedup_embedding_lsh went
        // 1.98 s → 84 s). Random high-dim vectors are ~orthogonal
        // (|cos| ≲ 0.4 ≪ thresholds), so bucket occupancy scales linearly
        // while copy 0 keeps the real corpus and its planted-dup structure.
        shifted.withColumn("embedding",
          when(col("graft_copy") === 0, col("embedding")).otherwise(
            transform(col("embedding"), (_, j) =>
              ((pmod(hash(col("vec_id"), j), lit(2001)).cast("float")
                - lit(1000.0f)) / lit(1000.0f)))))
      case _ => shifted
    }
    perturbed.drop("graft_copy")
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "bench-data/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    // optional table filter: the sf10 ladder replicates only the
    // documents/embeddings families (TPC-H at x100 would measure disk, not
    // plans the text ladder is for)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.filter(t => only.forall(_.contains(t))).foreach { t =>
      val raw = spark.read.parquet(s"$src/$t.parquet")
      val scaled = replicate(raw, t, copies)
      scaled.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[genscale] $t -> ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}

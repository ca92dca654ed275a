package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{stableHash, stableHashMod}

/** Deterministic distinct-count sketching (the "novel sketch" custom
  * aggregate of the LLM-pipeline extension; no reference counterpart —
  * the reference has no sketch library).
  *
  * K-minimum-values (KMV): keep the k smallest DISTINCT 60-bit stable
  * hashes of the input; with the hash domain [0, 2^60), the estimator is
  * (k−1)·2^60 / kth_min, exact when fewer than k distinct values exist.
  * Because the hash is md5-derived and the state is exact integers, the
  * ESTIMATE itself is reproducible on any engine — unlike HLL sketches,
  * whose register layouts differ per implementation, KMV results can sit
  * in the value oracle.
  *
  * Scale shape: the aggregation buffer is a bounded sorted vector —
  * O(k) state, associatively mergeable, so Spark runs it as partial +
  * final aggregation with map-side combine like any built-in. */
object SketchOps {

  /** Typed aggregate keeping the k smallest distinct hash values. */
  final class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], h: Long): Seq[Long] =
      if (b.contains(h)) b
      else if (b.length < k) (b :+ h).sorted
      else if (h < b.last) (b.init :+ h).sorted
      else b
    override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
      (x ++ y).distinct.sorted.take(k)
    override def finish(b: Seq[Long]): Seq[Long] = b
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** KMV sketch algebra: union and intersection cardinality estimates from
    * the two sides' sketches ALONE — the reason sketches exist at 100 TB
    * (combine per-partition/per-day sketches without touching raw data).
    * Union: merge the two k-min vectors, keep k smallest, apply the same
    * estimator. Intersection: the fraction ρ of the merged sketch present
    * in BOTH input sketches estimates Jaccard, and |A∩B| ≈ ρ·|A∪B|. Below
    * k the sketch holds the whole union and both results are exact. All
    * sketch state is exact integers, so the estimates hash-match any
    * engine that hashes the same way. */
  def kmvSetEstimate(a: DataFrame, b: DataFrame, valueCol: Column,
                     k: Int = 64): DataFrame = {
    val kmv = udaf(new KmvAgg(k))
    val sa = a.select(stableHash(valueCol.cast("string")).as("h"))
      .agg(kmv(col("h")).as("ma"))
    val sb = b.select(stableHash(valueCol.cast("string")).as("h"))
      .agg(kmv(col("h")).as("mb"))
    val estOf = (mu: Column) =>
      when(size(mu) < k, size(mu).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0) /
          element_at(mu, k).cast("double"))
    sa.crossJoin(sb)
      .select(col("ma"), col("mb"),
        slice(array_sort(array_distinct(concat(col("ma"), col("mb")))), 1, k)
          .as("mu"))
      .select(
        size(col("mu")).as("n_union_capped"),
        round(estOf(col("mu")), 4).as("est_union"),
        size(array_intersect(array_intersect(col("mu"), col("ma")), col("mb")))
          .as("n_both"),
        round(when(size(col("mu")) < k,
          size(array_intersect(col("ma"), col("mb"))).cast("double"))
          .otherwise(
            size(array_intersect(array_intersect(col("mu"), col("ma")),
              col("mb"))).cast("double") / k * estOf(col("mu"))), 4)
          .as("est_intersection"))
  }

  /** Grouped distinct estimate: one row per group with the capped distinct
    * observation count and the KMV estimate (exact below k). */
  def kmvDistinct(df: DataFrame, groupCol: Column, valueCol: Column,
                  k: Int = 64): DataFrame = {
    val kmv = udaf(new KmvAgg(k))
    df.select(groupCol.as("grp"),
        stableHash(valueCol.cast("string")).as("h"))
      .groupBy(col("grp")).agg(kmv(col("h")).as("mins"))
      .select(col("grp"), size(col("mins")).as("nd_capped"),
        round(when(size(col("mins")) < k, size(col("mins")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0) /
            element_at(col("mins"), k).cast("double")), 4).as("est"))
  }

  // ---- HyperLogLog ---------------------------------------------------------

  /** HLL precision: p=10 → m=1024 registers. The 60-bit stableHash splits
    * as bucket = h mod m (low p bits) and a 50-bit rank window w = h div m;
    * rank = leading-zero count of w within the window + 1
    * (w = 0 → 51). */
  val HllP = 10
  val HllM = 1 << HllP

  /** Deterministic HyperLogLog distinct-count summary — the
    * industry-standard mergeable cardinality sketch (Flajolet et al.;
    * what production engines' approx_count_distinct runs). Register
    * layout is usually implementation-private, which is why the KMV
    * sketch above argues it can't sit in a value oracle — but THIS
    * implementation pins the layout to the md5-derived [[stableHash]],
    * making registers AND estimate engine-reproducible:
    *
    *  - registers: groupBy(bucket).max(rank) — exact integers, mergeable
    *    by max, O(m) state;
    *  - harmonic denominator: Σ 2^(51−rank) as a BIGINT (integer shifts,
    *    exact — no float accumulation ordering anywhere);
    *  - estimate: αm·m²·2^51 / denom, with the standard small-range
    *    linear-counting correction m·ln(m/zeros) when est ≤ 2.5m and
    *    empty registers exist; rounded to a whole count, so a last-ulp
    *    libm difference cannot surface.
    *
    * One summary row per labeled input: at 100 TB the registers travel as
    * 1024 small integers per partition/day/shard and merge by max —
    * distinct counts over any shard combination without rescanning. */
  def hllSummary(inputs: Seq[(String, DataFrame, Column)]): DataFrame = {
    val perSrc = inputs.map { case (label, df, valueCol) =>
      df.select(stableHash(valueCol.cast("string")).as("h"))
        .select(pmod(col("h"), lit(HllM.toLong)).as("bucket"),
          expr(s"h div $HllM").as("w"))
        .select(col("bucket"),
          when(col("w") > 0, lit(51) - length(expr("bin(w)")))
            .otherwise(lit(51)).cast("int").as("rank"))
        .groupBy(col("bucket")).agg(max(col("rank")).as("r"))
        .agg(
          count(lit(1)).as("nonzero"),
          // coalesce: an EMPTY input yields nonzero=0 and a NULL sum,
          // which would poison denom_scaled → est = NULL; with 0 the
          // linear-counting branch correctly returns est = 0
          coalesce(sum(expr("shiftleft(CAST(1 AS BIGINT), 51 - r)")),
            lit(0L)).as("denom_used"))
        .select(lit(label).as("src"), col("nonzero"),
          (col("denom_used") +
            (lit(HllM.toLong) - col("nonzero")) * lit(1L << 51))
            .as("denom_scaled"))
    }
    val alphaM2 = 0.7213 / (1 + 1.079 / HllM) * HllM * HllM
    perSrc.reduce(_ unionAll _)
      .withColumn("est_raw",
        lit(alphaM2) * lit((1L << 51).toDouble) /
          col("denom_scaled").cast("double"))
      .withColumn("zeros", lit(HllM.toLong) - col("nonzero"))
      .select(col("src"), col("nonzero"), col("denom_scaled"),
        expr(s"CAST(round(CASE WHEN est_raw <= 2.5 * $HllM AND zeros > 0 " +
          s"THEN $HllM * ln($HllM / CAST(zeros AS DOUBLE)) " +
          "ELSE est_raw END) AS BIGINT)").as("est"))
  }

  // ---- Bloom filter membership sketch -------------------------------------

  /** Bloom parameters: m bits packed 32 per long (shift counts stay ≤ 31 —
    * engines that overflow-check `1 << 63` on BIGINT, like DuckDB, can
    * then mirror the words exactly), h hash functions per key (position i
    * = stableHash(key + "#i") mod m). All integer md5 arithmetic, so the
    * FILTER WORDS themselves — not just the verdicts — are
    * engine-reproducible and can sit in the value oracle. */
  val BloomBits = 1024
  val BloomBitsPerWord = 32
  val BloomWords = BloomBits / BloomBitsPerWord
  val BloomHashes = 4

  /** Attach the h integer hash-bit positions of `key` as columns
    * `_p0.._p{h-1}` (each in [0, BloomBits)). */
  private def withPositions(df: DataFrame, key: Column): DataFrame =
    (0 until BloomHashes).foldLeft(df)((d, i) =>
      d.withColumn(s"_p$i",
        (stableHash(concat(key.cast("string"), lit(s"#$i"))) % BloomBits)
          .cast("int")))

  /** Build the filter over `keyCol` of `build`: per-row bitmap words
    * (word w = OR of the key's hash bits landing in [32w, 32w+32))
    * aggregated with `bit_or` — associative, so Spark runs it partial +
    * final with map-side combine like any built-in. Returns the
    * `BloomWords` filter words: ONE tiny row, broadcastable at any scale. */
  def bloomBuild(build: DataFrame, keyCol: Column): Seq[Long] = {
    val rowWords = (0 until BloomWords).map { w =>
      expr((0 until BloomHashes).map(i =>
        s"CASE WHEN _p$i div $BloomBitsPerWord = $w " +
          s"THEN shiftleft(CAST(1 AS BIGINT), _p$i % $BloomBitsPerWord) " +
          "ELSE CAST(0 AS BIGINT) END").mkString("(", " | ", ")")).as(s"w$w")
    }
    val r = withPositions(build, keyCol)
      .select(rowWords: _*)
      .agg(bit_or(col("w0")).as("w0"),
        (1 until BloomWords).map(i => bit_or(col(s"w$i")).as(s"w$i")): _*)
      .head()
    // bit_or over zero rows is NULL per word — the empty build side's
    // filter is all zeroes (nothing was ever inserted)
    (0 until BloomWords).map(i => if (r.isNullAt(i)) 0L else r.getLong(i))
  }

  /** Membership pre-filter (the reason a Bloom filter exists at 100 TB:
    * a 128-byte broadcast that skips an expensive join/anti-join for most
    * rows). Probes `probeCol` against a filter built from `keyCol`:
    * `bloom_maybe` is true iff every hash bit is set — false negatives
    * impossible, false positives possible, which the oracle row
    * demonstrates against true membership. The probe is a narrow
    * codegen'd map, no shuffle. */
  def bloomProbe(build: DataFrame, keyCol: Column,
                 probe: DataFrame, probeCol: Column): DataFrame = {
    val filter = bloomBuild(build, keyCol)
    // the filter is a 32-element constant: index it with element_at
    // (1-based) rather than a 32-arm CASE chain per hash function
    val words = filter.map(w => s"CAST($w AS BIGINT)")
      .mkString("array(", ",", ")")
    val verdict = (0 until BloomHashes).map { i =>
      expr(s"(shiftright(element_at($words, " +
        s"CAST((_p$i div $BloomBitsPerWord) + 1 AS INT)), " +
        s"_p$i % $BloomBitsPerWord) & 1) = 1")
    }.reduce(_ && _)
    withPositions(probe, probeCol)
      .withColumn("bloom_maybe", verdict)
      .drop((0 until BloomHashes).map(i => s"_p$i"): _*)
  }

  // ---- Count-Min sketch ---------------------------------------------------

  /** Count-Min sketch of a value column: a depth×width counter grid where
    * cell (r, b) counts rows with stableHash(value + "#" + r) mod width
    * == b. Built with one narrow map + ONE aggregation into depth×width
    * cells — O(d·w) state regardless of input size, mergeable by
    * cell-wise SUM (per-day / per-partition sketches combine without
    * touching raw data, same algebra as KMV). All-integer md5 hashing,
    * so the CELLS themselves are engine-reproducible and oracle-able. */
  def countMin(df: DataFrame, value: Column,
               depth: Int = 4, width: Long = 1024L): DataFrame =
    df.select(value.cast("string").as("v"))
      .select(col("v"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"),
        stableHashMod(concat(col("v"), lit("#"), col("r")), width).as("b"))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))

  /** Heavy hitters via Count-Min + candidate probe: estimate(v) = min over
    * rows r of cell(r, h_r(v)) — an OVERcount (hash collisions only add),
    * never an undercount, which the output demonstrates by carrying the
    * exact count alongside (`est_count >= true_count` always; SketchSpec
    * pins the invariant and the merge algebra). The sketch is d·w rows —
    * broadcast to the candidate probe, so candidates never shuffle
    * against it. Candidates here are the distinct values themselves; at
    * open vocabulary a tracked candidate stream or sample plays that
    * role and the sketch answers point queries the same way. */
  def cmsHeavyHitters(df: DataFrame, value: Column, minEst: Long,
                      depth: Int = 4, width: Long = 1024L): DataFrame = {
    // pre-aggregate BEFORE hashing: the sketch cell (r, b) holds the sum
    // of occurrence counts of the values hashing there — identical to
    // counting occurrences directly, but the d md5's are paid per
    // DISTINCT value instead of per occurrence, and one aggregated table
    // feeds both the sketch build and the candidate probe (one corpus
    // scan, not two). At open vocabulary the same shape holds: the
    // pre-aggregation is the map-side combine the sketch exists to bound.
    val counts = df.select(value.cast("string").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("true_count"))
      .localCheckpoint()
    val hashed = counts
      .select(col("v"), col("true_count"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("b",
        stableHashMod(concat(col("v"), lit("#"), col("r")), width))
    val sketch = hashed.groupBy(col("r"), col("b"))
      .agg(sum(col("true_count")).as("c"))
    hashed
      .join(broadcast(sketch), Seq("r", "b"))
      .groupBy(col("v"), col("true_count")).agg(min(col("c")).as("est_count"))
      .filter(col("est_count") >= minEst)
  }
}

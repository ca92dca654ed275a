package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.stableHash

/** Deterministic sampling for corpus curation (LLM-pipeline extension).
  *
  * Every sampler here is a pure function of the data — md5-hash thresholds
  * instead of RNG draws — so a sample is reproducible across engines,
  * partitionings, and re-runs (the property the reference's rng-seeded
  * `DataSet.sample`, `flink-java/.../utils/DataSetUtils.java:177`, only has
  * per fixed topology). That is the version a 100 TB curation pipeline
  * wants anyway: re-running a stage must not reshuffle the sample.
  */
object SamplingOps {

  private val Denom = 1000000L

  /** Per-stratum Bernoulli: keep a row iff hash(key) mod 1e6 falls under the
    * stratum's rate. Narrow (no shuffle) — the filter composes into the scan. */
  def stratified(df: DataFrame, strataCol: String, keyCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    // round(), not cast-truncate: a rate whose double product lands just
    // below the integer (0.3 * 1e6 = 299999.999...) would otherwise use a
    // threshold one lower than an oracle computing it in exact decimal,
    // flipping boundary rows
    df.filter(stableHash(col(keyCol).cast("string")) % Denom <
      round(rate * Denom).cast("long"))
  }

  /** Exactly k rows per stratum: the k smallest by hash(key) — a
    * deterministic equivalent of per-stratum reservoir sampling (each subset
    * of size k is equally likely under the hash's uniformity). One shuffle on
    * the stratum; rank-k selection is top-k per group, which Spark executes
    * with partial per-partition top-k before the exchange. */
  def bottomK(df: DataFrame, strataCol: String, keyCol: String,
              k: Int): DataFrame = {
    val h = stableHash(col(keyCol).cast("string"))
    val w = Window.partitionBy(col(strataCol)).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Per-group cap with a LABELED survivor flag — the RefinedWeb-style
    * per-domain document cap: at most k rows per group survive, chosen by
    * md5 rank (a uniform deterministic lottery, so over-represented domains
    * are downsampled without order bias). Where [[bottomK]] filters, this
    * labels every row, which is what a curation report wants (kept + dropped
    * counts per domain fall out of one groupBy); a pipeline that only needs
    * the survivors filters on `kept`, and the rank predicate then executes
    * as a WindowGroupLimit per-partition prune before the exchange. One
    * shuffle on the group key; a mega-domain fans to its own rows only,
    * never a join. */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int): DataFrame = {
    require(k >= 1, s"cap must be >= 1: $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    // explicit group-key repartition: on a single-file (1-partition) input
    // the window's clustered distribution is trivially satisfied and the
    // whole pass would run serially (the ivfAssign hazard); the window
    // then REUSES this exchange, so a multi-partition input pays nothing
    // beyond the shuffle the window needed anyway
    df.repartition(col(groupCol))
      .withColumn("_rk", row_number().over(w))
      .withColumn("kept", col("_rk") <= k)
      .drop("_rk")
  }

  /** Temperature-flattened source sampling (τ = 2, the multilingual-mixing
    * rule of XLM-R / mT5): each group's keep probability is √(its corpus
    * share), so over-represented sources are downsampled ∝ 1/√share while
    * tiny sources are kept near-whole — the smooth alternative to
    * [[capPerGroup]]'s hard cutoff. Per-row decision is the md5 lottery
    * against the group's integer micro-rate; the rate itself is
    * round(√(n_g/N)·10⁶) — ONE IEEE division, one correctly-rounded sqrt,
    * one round, so the rate (and therefore every keep decision) is
    * bit-identical on any engine. Cost: one grouped count (tiny result,
    * broadcast back) + a narrow per-row filter — the corpus itself never
    * shuffles. */
  def temperatureSample(df: DataFrame, groupCol: String,
                        keyCol: String): DataFrame = {
    // spread a single-file input across cores before the grouped count and
    // the per-row lottery (serial-scan hazard, see capPerGroup); the
    // grouped count's final agg exchanges off this layout
    val spread = df.repartition(col(keyCol))
    val counts = spread.groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
    // global total via an unpartitioned window over the COUNTS table —
    // group-count-sized, not corpus-sized, so the single partition is fine
    val ratesW = counts
      .withColumn("_n", sum(col("n_g")).over(Window.partitionBy(lit(1))))
      .select(col(groupCol), col("n_g"),
        round(sqrt(col("n_g").cast("double") / col("_n").cast("double"))
          * 1000000L).cast("long").as("w_micro"))
    spread.join(broadcast(ratesW), groupCol)
      .withColumn("kept",
        stableHash(col(keyCol).cast("string")) % Denom < col("w_micro"))
  }

  /** Curriculum ordering for training (easy→hard scheduling): assign every
    * row a difficulty PHASE by exact quantile over an integer difficulty
    * measure, a deterministic SHARD, and a within-(phase, shard) order —
    * the write layout a curriculum-scheduled training run consumes
    * phase-by-phase with shards interleaved.
    *
    * Scale shape: the quantile boundaries come from the exact grouped
    * histogram of the difficulty value — a DISTINCT-VALUES-sized table
    * (thousands of rows for token counts, never corpus-sized), cumulated
    * under one tiny unpartitioned window and broadcast back, so the corpus
    * itself never sorts globally. Every row with the SAME difficulty value
    * lands in the same phase (boundaries are on values, not row ranks), so
    * the assignment is layout- and engine-independent. The within-shard
    * order is a window partitioned by (phase, shard) — parallelism =
    * phases × shards. `shards = 0` (the default) DERIVES the shard count
    * from the corpus as max(8, rows / 2M) — the r11 100× ladder showed the
    * per-(phase, shard) window tails grow 8.3× when a fixed shards=8 rides
    * a 100× corpus, and the scaladoc advice "raise shards with volume"
    * belongs in code (the CC-parallelism precedent). Deriving needs the
    * corpus row count, and it must come from the CALLER (`rowCount`) — an
    * implicit `df.count()` at operator-construction time would silently
    * re-execute the full upstream plan for derived frames (only a bare
    * parquet scan counts from metadata) and silently change shard counts
    * (hence output ordering) past 16M rows, so shards = 0 without a
    * rowCount fails loud instead. Shard ids stay a pure hash of the key,
    * so the ORDER within any given (phase, shard) is engine-exact for
    * whatever shard count is chosen, and fixture-scale results
    * (rows ≤ 16M) are byte-identical to the old shards=8 default.
    *
    * Null difficulty fails LOUD in-plan (raise_error with the offending
    * key): the equi-join on `_d` would silently drop null-key rows,
    * breaking the "every row gets a phase" contract — a null difficulty is
    * upstream data corruption, not a schedulable value (the SqCodes
    * fail-loud convention).
    *
    * phase(v) = min(phases−1, (C(v)−1)·phases / N) with C(v) the cumulative
    * row count through value v — pure non-negative integer arithmetic,
    * identical in any engine. */
  def curriculumOrder(df: DataFrame, difficulty: Column, keyCol: String,
                      phases: Int = 4, shards: Int = 0,
                      rowCount: Option[Long] = None): DataFrame = {
    require(phases >= 1, s"phases must be >= 1: $phases")
    require(shards >= 0, s"shards must be >= 0 (0 = derive): $shards")
    require(shards > 0 || rowCount.nonEmpty,
      "curriculumOrder: shards = 0 (derive) needs an explicit rowCount — " +
        "an implicit df.count() here would re-execute the upstream plan " +
        "and silently change output ordering past 16M rows; pass the " +
        "corpus count (cheap on a bare scan) or a fixed shards value")
    val nShards =
      if (shards > 0) shards
      else math.max(8L, rowCount.get / 2000000L).toInt
    val spread = df.withColumn("_d",
        when(difficulty.cast("long").isNotNull, difficulty.cast("long"))
          .otherwise(raise_error(concat(
            lit("curriculumOrder: null difficulty for key "),
            col(keyCol).cast("string")))))
      .repartition(col(keyCol))
    val hist = spread.groupBy(col("_d")).agg(count(lit(1)).as("_c"))
    // cumulative over the value histogram — distinct-values-sized, the
    // single-partition window is deliberate (same reasoning as the
    // temperatureSample total)
    val cum = hist
      .withColumn("_cum", sum(col("_c")).over(
        Window.partitionBy(lit(1)).orderBy(col("_d"))))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(lit(1))))
      .select(col("_d"),
        least(lit(phases - 1).cast("long"),
          expr(s"((_cum - 1) * $phases) div _n"))
          .cast("int").as("phase"))
    spread.join(broadcast(cum), "_d")
      .withColumn("shard",
        (stableHash(col(keyCol).cast("string")) % nShards).cast("int"))
      .withColumn("phase_order", row_number().over(
        Window.partitionBy(col("phase"), col("shard"))
          .orderBy(md5(col(keyCol).cast("string")), col(keyCol))))
      .withColumnRenamed("_d", "difficulty")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series motif discovery over keyed event series — SAX (Lin et al.
  * 2003, "A Symbolic Representation of Time Series"): per-key sliding
  * windows of `w` consecutive readings → piecewise aggregate approximation
  * (segment means) → fixed-breakpoint symbols → a SAX word per window;
  * windows sharing a word are motif candidates. Sensor-series analytics is
  * the reference project's own domain (PROTEUS targeted hot-strip-mill
  * time series; the reference has no library for it — LLM/analytics
  * extension like TextOps).
  *
  * Exactness: values quantize to centi-units (the fixtures carry 2-dp
  * doubles, so this is lossless), PAA means are integer DIV, and the
  * breakpoints are fixed constants — every symbol is reproducible on any
  * engine and any partitioning; no float mean/stddev enters the word.
  * (Classic SAX z-normalizes per window; the quantized-absolute variant
  * keeps the pipeline oracle-exact — a deployment wanting z-normalized
  * words swaps the quantize for a per-window integer-scaled z-score.)
  *
  * Scale shape: one keyed window (the per-key sort Spark needs for ANY
  * per-key sequence op) builds all sliding windows via `lead`, the word
  * is a pure per-row expression, and the motif roll-up is one
  * map-side-combined groupBy on the word — no self-join, no all-pairs;
  * candidate verification joins only within word buckets, like the LSH
  * families. */
object TimeSeriesOps {

  /** One row per complete sliding window: (k, pos, word). */
  def saxWords(events: DataFrame, valueCol: String = "value",
               keyCol: String = "user_id", tsCol: String = "ts",
               idCol: String = "event_id", w: Int = 8, segments: Int = 4,
               breaks: Seq[Long] = Seq(1500L, 3500L, 7000L)): DataFrame = {
    require(w % segments == 0, s"w must divide into segments: $w/$segments")
    require(breaks == breaks.sorted, "breakpoints must be ascending")
    val segLen = w / segments
    val byKey = Window.partitionBy(col("k")).orderBy(col("pos"))
    val base = events.repartition(col(keyCol))
      .select(col(keyCol).as("k"),
        expr(s"CAST(round($valueCol * 100) AS BIGINT)").as("vq"),
        row_number().over(Window.partitionBy(col(keyCol))
          .orderBy(col(tsCol), col(idCol))).cast("long").as("pos"))
    val leads: Seq[Column] =
      col("vq") +: (1 until w).map(i => lead(col("vq"), i).over(byKey))
    def symbol(m: Column): Column =
      breaks.zipWithIndex.foldRight(lit(breaks.size): Column) {
        case ((b, i), rest) => when(m < b, i).otherwise(rest)
      }
    val word = concat_ws("", (0 until segments).map { s =>
      // floor division ≡ DuckDB's integer // here (sums are non-negative
      // and far below 2^53, so the double floor is exact)
      val m = floor(leads.slice(s * segLen, (s + 1) * segLen)
        .reduce(_ + _) / lit(segLen)).cast("long")
      symbol(m)
    }: _*)
    base
      .select(col("k"), col("pos"), word.as("word"),
        leads.last.isNotNull.as("complete"))
      .filter(col("complete"))
      .select(col("k"), col("pos"), col("word"))
  }

  /** Motif roll-up: SAX words occurring in ≥ `minCount` windows, with the
    * number of windows and of distinct keys exhibiting them. */
  def saxMotifs(events: DataFrame, valueCol: String = "value",
                keyCol: String = "user_id", tsCol: String = "ts",
                idCol: String = "event_id", w: Int = 8, segments: Int = 4,
                minCount: Long = 2L): DataFrame =
    saxWords(events, valueCol, keyCol, tsCol, idCol, w, segments)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_windows"),
        countDistinct(col("k")).as("n_keys"))
      .filter(col("n_windows") >= minCount)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-reconciliation operators (LLM-pipeline extension; no
  * reference counterpart — Flink 1.4 has no MERGE). A corpus that
  * re-crawls/refreshes needs two merge shapes:
  *
  *  - [[upsert]] (MERGE INTO semantics): matched rows take the source's
  *    values, unmatched source rows insert, unmatched target rows
  *    persist. One full outer join on the key — at scale both sides
  *    arrive bucketed on the key and the join is co-located.
  *  - [[scd2Merge]] (slowly-changing-dimension type 2): history is
  *    preserved — a changed row CLOSES the current version (valid_to =
  *    effective date) and opens a new one; unchanged keys pass through
  *    untouched. The standard point-in-time-reproducible metadata shape
  *    (which crawl snapshot was this doc's text taken from?).
  *
  * Both are single-join plans over explicit column lists, so Catalyst
  * sees plain equi-joins (broadcast/SMJ/bucketed as statistics dictate).
  */
object MergeOps {

  /** MERGE INTO emulation: source wins on matched keys, inserts on new
    * keys, target rows without a match persist. `cols` is the shared
    * payload column list. */
  def upsert(target: DataFrame, source: DataFrame, key: String,
             cols: Seq[String]): DataFrame = {
    val t = target.as("t")
    val s = source.as("s")
    t.join(s, col(s"t.$key") === col(s"s.$key"), "full_outer")
      .select(
        coalesce(col(s"s.$key"), col(s"t.$key")).as(key) +:
          cols.map(c => coalesce(col(s"s.$c"), col(s"t.$c")).as(c)): _*)
  }

  /** CDC changelog apply: fold an ordered change stream into a snapshot.
    * `changes` carries (key, seq, op, cols...) with op ∈ I/U/D and `seq`
    * strictly increasing per key; the result is last-writer-wins per key
    * with D as a tombstone. Shape: snapshot rows enter as seq = -1
    * pseudo-inserts, one union + ONE keyed aggregation (`max_by` on seq)
    * resolves every key — a single shuffle, partial-aggregated map-side,
    * so applying a day's changelog to a 100 TB snapshot moves each key
    * once regardless of how many times it changed. */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame, key: String,
                     cols: Seq[String], seqCol: String = "seq",
                     opCol: String = "op"): DataFrame = {
    val snap = snapshot.select(
      col(key) +: lit(-1L).as(seqCol) +: lit("I").as(opCol) +:
        cols.map(col): _*)
    val all = snap.unionByName(
      changes.select(col(key) +: col(seqCol).cast("long").as(seqCol) +:
        col(opCol) +: cols.map(col): _*))
    all.groupBy(col(key))
      .agg(max_by(struct((opCol +: cols).map(col): _*), col(seqCol)).as("w"))
      .filter(col(s"w.$opCol") =!= "D")
      .select(col(key) +: cols.map(c => col(s"w.$c").as(c)): _*)
  }

  /** SCD type-2 merge: `target` rows carry (key, cols..., valid_from,
    * valid_to — null = current); `source` rows carry (key, cols...) and
    * take effect at `effectiveDate`. A current target row whose key
    * appears in the source with a CHANGED payload closes
    * (valid_to = effectiveDate) and the source row opens
    * (valid_from = effectiveDate, valid_to = null). Unchanged-payload
    * matches and absent keys pass through; already-closed history rows
    * are never touched. */
  def scd2Merge(target: DataFrame, source: DataFrame, key: String,
                cols: Seq[String], effectiveDate: Column): DataFrame = {
    val payloadChanged: Column = cols
      .map(c => !(col(s"t.$c") <=> col(s"s.$c")))
      .reduce(_ || _)
    val t = target.as("t")
    val s = source.as("s")
    // current target rows joined to their (possible) source replacement
    val joined = t.join(s, col(s"t.$key") === col(s"s.$key"), "left_outer")
    val keep = joined
      .filter(col("t.valid_to").isNotNull || // closed history: untouched
        col(s"s.$key").isNull ||             // no source row: untouched
        !payloadChanged)                     // same payload: untouched
      .select(col(s"t.$key").as(key) +: cols.map(c => col(s"t.$c").as(c)) :+
        col("t.valid_from").as("valid_from") :+
        col("t.valid_to").as("valid_to"): _*)
    val closed = joined
      .filter(col("t.valid_to").isNull && col(s"s.$key").isNotNull &&
        payloadChanged)
      .select(col(s"t.$key").as(key) +: cols.map(c => col(s"t.$c").as(c)) :+
        col("t.valid_from").as("valid_from") :+
        effectiveDate.as("valid_to"): _*)
    // source rows that open a new version: changed payload, or brand-new key
    val current = t.filter(col("valid_to").isNull)
    val opened = s
      .join(current.as("c"), col(s"s.$key") === col(s"c.$key"), "left_outer")
      .filter(col(s"c.$key").isNull ||
        cols.map(c => !(col(s"c.$c") <=> col(s"s.$c"))).reduce(_ || _))
      .select(col(s"s.$key").as(key) +: cols.map(c => col(s"s.$c").as(c)) :+
        effectiveDate.as("valid_from") :+
        lit(null).cast("date").as("valid_to"): _*)
    keep.unionByName(closed).unionByName(opened)
  }
}

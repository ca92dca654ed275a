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
    // whole-ROW source-wins, not per-column coalesce: a matched source row
    // carrying NULL in a payload column must null that column (MERGE INTO
    // "update set col = s.col"), not resurrect the target's stale value —
    // and a per-column mix of source and target would be a row that
    // existed in neither input
    val matched = col(s"s.$key").isNotNull
    t.join(s, col(s"t.$key") === col(s"s.$key"), "full_outer")
      .select(
        coalesce(col(s"s.$key"), col(s"t.$key")).as(key) +:
          cols.map(c =>
            when(matched, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)): _*)
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
    // ordering key is (seq, isChange), not a seq sentinel: the snapshot
    // enters at (MinValue, 0) and a change at (seq, 1), so a change beats
    // the snapshot at ANY seq — including a changelog whose per-key
    // sequence legitimately starts negative — with no nondeterministic
    // max_by tie possible (per-key change seqs are strictly increasing by
    // contract, and the snapshot holds one row per key)
    val snap = snapshot.select(
      col(key) +: lit(Long.MinValue).as(seqCol) +: lit(0).as("__src") +:
        lit("I").as(opCol) +: cols.map(col): _*)
    // fail-fast on contract-violating changes: a NULL op would silently
    // drop its key (`op =!= 'D'` evaluates NULL → filtered), and a NULL
    // seq makes the max_by ordering undefined — malformed changelogs must
    // error, not vanish. The seq guard checks the CAST value (the one the
    // ordering uses): a non-numeric seq casts to NULL under non-ANSI mode
    // and would otherwise slip past a pre-cast null check. The guard wraps
    // the op VALUE, so column pruning cannot optimize it away.
    val opChecked = when(
      col(opCol).isin("I", "U", "D") &&
        col(seqCol).cast("long").isNotNull, col(opCol))
      .otherwise(raise_error(concat(
        lit(s"applyChangelog: malformed change row ($opCol="),
        coalesce(col(opCol).cast("string"), lit("NULL")),
        lit(s", $seqCol="),
        coalesce(col(seqCol).cast("string"), lit("NULL")), lit(")"))))
    val all = snap.unionByName(
      changes.select(col(key) +: col(seqCol).cast("long").as(seqCol) +:
        lit(1).as("__src") +: opChecked.as(opCol) +: cols.map(col): _*))
    all.groupBy(col(key))
      .agg(max_by(struct((opCol +: cols).map(col): _*),
        struct(col(seqCol), col("__src"))).as("w"))
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
    // already-closed history rows are never touched — pass them through
    // WITHOUT joining; the one full-outer join is current-vs-source and
    // feeds all three live branches, so the (100 TB) target is joined
    // once, not twice, and the changed-payload predicate exists once
    val payloadChanged: Column = cols
      .map(c => !(col(s"t.$c") <=> col(s"s.$c")))
      .reduce(_ || _)
    val closedHistory = target.filter(col("valid_to").isNotNull)
    val t = target.filter(col("valid_to").isNull).as("t")
    val s = source.as("s")
    val j = t.join(s, col(s"t.$key") === col(s"s.$key"), "full_outer")
    val tPresent = col(s"t.$key").isNotNull
    val sPresent = col(s"s.$key").isNotNull
    val keep = j
      .filter(tPresent && (!sPresent || !payloadChanged))
      .select(col(s"t.$key").as(key) +: cols.map(c => col(s"t.$c").as(c)) :+
        col("t.valid_from").as("valid_from") :+
        col("t.valid_to").as("valid_to"): _*)
    val closed = j
      .filter(tPresent && sPresent && payloadChanged)
      .select(col(s"t.$key").as(key) +: cols.map(c => col(s"t.$c").as(c)) :+
        col("t.valid_from").as("valid_from") :+
        effectiveDate.as("valid_to"): _*)
    // source rows that open a new version: changed payload, or no current
    // version (brand-new key, or a key whose history is fully closed)
    val opened = j
      .filter(sPresent && (!tPresent || payloadChanged))
      .select(col(s"s.$key").as(key) +: cols.map(c => col(s"s.$c").as(c)) :+
        effectiveDate.as("valid_from") :+
        lit(null).cast("date").as("valid_to"): _*)
    closedHistory.select(
        col(key) +: cols.map(col) :+ col("valid_from") :+ col("valid_to"): _*)
      .unionByName(keep).unionByName(closed).unionByName(opened)
  }
}

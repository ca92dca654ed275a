package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window => SWindow, WindowSpec}
import org.apache.spark.sql.functions._

/** Table-API façade (SURVEY §2.3 / §7.1(a)): the reference's fluent
  * relational surface (`flink-table/.../api/table.scala`, 1182 LoC) on a
  * DataFrame core. Every method delegates 1:1 to a Catalyst-optimized
  * DataFrame operation — the façade adds API parity, not execution machinery.
  *
  * Reference line map: select :116 · as :168 · filter/where :224-267 ·
  * groupBy :281 · distinct :309 · join :326-358 · left/right/fullOuterJoin
  * :393-495 · minus/minusAll/union/unionAll/intersect/intersectAll :561-673 ·
  * orderBy :692 · limit/offset/fetch :733-798 · window(groupWindow) :913 ·
  * over windows :942.
  */
final case class ProteusTable(df: DataFrame) {

  // ---- projection / filtering --------------------------------------------
  def select(cols: Column*): ProteusTable = ProteusTable(df.select(cols: _*))
  def as(names: String*): ProteusTable = ProteusTable(df.toDF(names: _*))
  def filter(cond: Column): ProteusTable = ProteusTable(df.filter(cond))
  def where(cond: Column): ProteusTable = filter(cond)

  // ---- grouping -----------------------------------------------------------
  def groupBy(cols: Column*): GroupedProteusTable =
    GroupedProteusTable(df, cols)
  def distinct: ProteusTable = ProteusTable(df.distinct())

  // ---- joins (reference: equi-required for outer; inner may be theta) -----
  def join(other: ProteusTable, cond: Column): ProteusTable =
    ProteusTable(df.join(other.df, cond, "inner"))
  def leftOuterJoin(other: ProteusTable, cond: Column): ProteusTable =
    ProteusTable(df.join(other.df, cond, "left_outer"))
  def rightOuterJoin(other: ProteusTable, cond: Column): ProteusTable =
    ProteusTable(df.join(other.df, cond, "right_outer"))
  def fullOuterJoin(other: ProteusTable, cond: Column): ProteusTable =
    ProteusTable(df.join(other.df, cond, "full_outer"))

  // ---- set operations -----------------------------------------------------
  def union(other: ProteusTable): ProteusTable =
    ProteusTable(df.union(other.df).distinct())
  def unionAll(other: ProteusTable): ProteusTable =
    ProteusTable(df.union(other.df))
  def intersect(other: ProteusTable): ProteusTable =
    ProteusTable(df.intersect(other.df))
  def intersectAll(other: ProteusTable): ProteusTable =
    ProteusTable(df.intersectAll(other.df))
  def minus(other: ProteusTable): ProteusTable =
    ProteusTable(df.except(other.df))
  def minusAll(other: ProteusTable): ProteusTable =
    ProteusTable(df.exceptAll(other.df))

  // ---- ordering / pagination ---------------------------------------------
  def orderBy(cols: Column*): ProteusTable = ProteusTable(df.orderBy(cols: _*))
  def limit(n: Int): ProteusTable = ProteusTable(df.limit(n))
  /** reference fetch = limit after offset */
  def offset(n: Int): ProteusTable = ProteusTable(df.offset(n))
  def fetch(n: Int): ProteusTable = limit(n)

  // ---- group windows ------------------------------------------------------
  /** `table.window(Tumble over 1.hour on 'ts as 'w).groupBy('w, 'k).select(…)` */
  def window(w: GroupWindow): WindowedProteusTable = WindowedProteusTable(df, w)

  // ---- over windows -------------------------------------------------------
  /** `table.overWindow(Over partitionBy 'k orderBy 'ts preceding N)(aggs…)` */
  def overWindow(spec: WindowSpec)(cols: (Column, WindowSpec => Column)*): ProteusTable =
    ProteusTable(df.select(
      (df.columns.map(col).toSeq ++ cols.map { case (_, f) => f(spec) }): _*))

  // ---- UDTF (table function) joins ---------------------------------------
  /** Inner correlate against a table-function expression (reference
    * `Table.join(udtfCall)` `table.scala:366-398`): one output row per
    * element the function generates for the row; rows generating nothing
    * are dropped. The function call is any Column yielding an array —
    * including a registered UDTF-style function — and the element binds to
    * `alias` (select fields off it when the element is a struct). */
  def joinLateral(udtfCall: Column, alias: String): ProteusTable =
    ProteusTable(df.select(
      df.columns.map(col).toIndexedSeq :+ explode(udtfCall).as(alias): _*))

  /** Left-outer correlate (reference `Table.leftOuterJoin(udtfCall)`
    * `table.scala:400-427`): rows generating nothing survive with a null
    * element. */
  def leftOuterJoinLateral(udtfCall: Column, alias: String): ProteusTable =
    ProteusTable(df.select(
      df.columns.map(col).toIndexedSeq :+ explode_outer(udtfCall).as(alias): _*))

  /** Append into a saved table (reference `Table.insertInto :876`). */
  def insertInto(tableName: String): Unit =
    df.write.insertInto(tableName)

  def toDF: DataFrame = df
}

final case class GroupedProteusTable(df: DataFrame, keys: Seq[Column]) {
  def select(aggs: Column*): ProteusTable =
    ProteusTable(df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*))
}

// ---- group-window DSL: Tumble / Slide / Session ---------------------------

sealed trait GroupWindow { def timeCol: String; def alias: String }
final case class TumbleWindow(size: String, timeCol: String, alias: String)
  extends GroupWindow
final case class SlideWindow(size: String, slide: String, timeCol: String,
                             alias: String) extends GroupWindow
final case class SessionWindow(gap: String, timeCol: String, alias: String)
  extends GroupWindow

/** `Tumble over "1 hour" on "ts" as "w"` (reference
  * `flink-table/.../api/java/windows.scala:29`). */
object Tumble {
  def over(size: String): TumbleBuilder = TumbleBuilder(size)
  final case class TumbleBuilder(size: String) {
    def on(timeCol: String): TumbleBuilder2 = TumbleBuilder2(size, timeCol)
  }
  final case class TumbleBuilder2(size: String, timeCol: String) {
    def as(alias: String): TumbleWindow = TumbleWindow(size, timeCol, alias)
  }
}

/** `Slide over "1 hour" every "15 minutes" on "ts" as "w"` (windows.scala:51). */
object Slide {
  def over(size: String): SlideBuilder = SlideBuilder(size)
  final case class SlideBuilder(size: String) {
    def every(slide: String): SlideBuilder2 = SlideBuilder2(size, slide)
  }
  final case class SlideBuilder2(size: String, slide: String) {
    def on(timeCol: String): SlideBuilder3 = SlideBuilder3(size, slide, timeCol)
  }
  final case class SlideBuilder3(size: String, slide: String, timeCol: String) {
    def as(alias: String): SlideWindow = SlideWindow(size, slide, timeCol, alias)
  }
}

/** `Session withGap "30 minutes" on "ts" as "w"` (windows.scala:73). */
object Session {
  def withGap(gap: String): SessionBuilder = SessionBuilder(gap)
  final case class SessionBuilder(gap: String) {
    def on(timeCol: String): SessionBuilder2 = SessionBuilder2(gap, timeCol)
  }
  final case class SessionBuilder2(gap: String, timeCol: String) {
    def as(alias: String): SessionWindow = SessionWindow(gap, timeCol, alias)
  }
}

final case class WindowedProteusTable(df: DataFrame, w: GroupWindow) {
  /** groupBy(windowAlias, keys…) — the window alias column groups by the
    * underlying time window; `'w.start` / `'w.end` surface as
    * `<alias>_start` / `<alias>_end` in select. */
  def groupBy(cols: String*): WindowGroupedProteusTable = {
    require(cols.contains(w.alias), s"group must include window alias ${w.alias}")
    WindowGroupedProteusTable(df, w, cols.filterNot(_ == w.alias))
  }
}

final case class WindowGroupedProteusTable(df: DataFrame, w: GroupWindow,
                                           keys: Seq[String]) {
  def select(aggs: Column*): ProteusTable = {
    val winCol = w match {
      case TumbleWindow(size, t, _) => window(col(t), size)
      case SlideWindow(size, slide, t, _) => window(col(t), size, slide)
      case SessionWindow(gap, t, _) => session_window(col(t), gap)
    }
    val grouped = df.groupBy((winCol.as(w.alias) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
    // surface window bounds as scalar columns (reference 'w.start / 'w.end)
    ProteusTable(grouped
      .withColumn(s"${w.alias}_start", col(s"${w.alias}.start"))
      .withColumn(s"${w.alias}_end", col(s"${w.alias}.end"))
      .drop(w.alias))
  }
}

/** Over-window builder (reference `Over partitionBy 'k orderBy 'rowtime
  * preceding N.rows`, api/windows.scala:29). */
object Over {
  def partitionBy(cols: Column*): OverBuilder = OverBuilder(cols)
  final case class OverBuilder(parts: Seq[Column]) {
    def orderBy(cols: Column*): WindowSpec =
      SWindow.partitionBy(parts: _*).orderBy(cols: _*)
  }
}

/** TableEnvironment façade (reference `TableEnvironment.scala`:
  * registerTable :405, scan :484, sqlQuery :555). */
final class TableEnv(spark: SparkSession) {
  def registerTable(name: String, t: ProteusTable): Unit =
    t.df.createOrReplaceTempView(name)
  def scan(name: String): ProteusTable = ProteusTable(spark.table(name))
  def sqlQuery(sql: String): ProteusTable = ProteusTable(spark.sql(sql))
  def fromDataFrame(df: DataFrame): ProteusTable = ProteusTable(df)
}

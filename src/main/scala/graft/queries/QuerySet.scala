package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named group of driver-verifiable queries.
  *
  * Each entry pairs a Spark implementation with (optionally) an equivalent
  * ANSI SQL text the driver runs in DuckDB over the same parquet tables.
  * Column names of the Spark result and the oracle result MUST match: the
  * driver sorts columns by name before hashing values.
  */
trait QuerySet {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}

/** Cross-engine determinism helpers.
  *
  * Float aggregation is order-dependent, so a straight `sum(double)` will not
  * hash-match DuckDB. All fixture monetary/quantity columns carry at most two
  * decimal places, so casting to DECIMAL before aggregating is lossless and
  * makes the sum exact + associative in BOTH engines; the final cast to DOUBLE
  * is then a deterministic nearest-double conversion. The same expressions are
  * used (as SQL text) in the DuckDB oracles.
  */
object Exact {
  /** Lossless 2-dp decimal view of a monetary/quantity column. */
  def dec2(c: Column): Column = c.cast("decimal(12,2)")
  /** Small-range decimal view for rates (discount/tax in [0,1]). */
  def rate(c: Column): Column = c.cast("decimal(5,2)")
  /** (1 - rate) renormalized to keep downstream decimal precision bounded. */
  def oneMinus(c: Column): Column = (lit(1) - rate(c)).cast("decimal(5,2)")
  /** (1 + rate) renormalized likewise. */
  def onePlus(c: Column): Column = (lit(1) + rate(c)).cast("decimal(5,2)")
  /** Exact sum of a 2-dp column, surfaced as DOUBLE. */
  def dsum(c: Column): Column = sum(dec2(c)).cast("double")
  /** Exact mean of a 2-dp column, surfaced as DOUBLE (double/long division
    * is IEEE-identical across engines). */
  def davg(c: Column): Column = sum(dec2(c)).cast("double") / count(c)

  // SQL-side mirrors (DuckDB + any ANSI engine)
  def sqlDec2(e: String): String = s"CAST($e AS DECIMAL(12,2))"
  def sqlRate(e: String): String = s"CAST($e AS DECIMAL(5,2))"
  def sqlOneMinus(e: String): String = s"CAST(1 - CAST($e AS DECIMAL(5,2)) AS DECIMAL(5,2))"
  def sqlOnePlus(e: String): String = s"CAST(1 + CAST($e AS DECIMAL(5,2)) AS DECIMAL(5,2))"
  def sqlDsum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(12,2))) AS DOUBLE)"
  def sqlDavg(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(12,2))) AS DOUBLE) / COUNT($e)"
  /** Exact revenue term: price * (1 - discount). */
  def sqlRevenueSum(price: String, disc: String): String =
    s"CAST(SUM(${sqlDec2(price)} * ${sqlOneMinus(disc)}) AS DOUBLE)"
}

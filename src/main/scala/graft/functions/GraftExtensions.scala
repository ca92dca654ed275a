package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Registration of graft's native Catalyst expressions.
  *
  * Two entry points:
  *  - `GraftSparkExtensions` for `spark.sql.extensions=` config (the standard
  *    SparkSessionExtensions route — works on any cluster without code
  *    changes);
  *  - `GraftExtensions.install(spark)` for programmatic installs (idempotent;
  *    called from Tables.load so every query path has the functions).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("graft_dot"), DotProduct.info,
        (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_iqdot"), IntQuantDot.info,
        (children: Seq[Expression]) => IntQuantDot(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_lldot"), LongDot.info,
        (children: Seq[Expression]) => LongDot(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_lld2"), LongSqDist.info,
        (children: Seq[Expression]) => LongSqDist(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_adc"), AdcLookupSum.info,
        (children: Seq[Expression]) => AdcLookupSum(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_lsh_bands"), LshBandBuckets.info,
        GraftExtensions.buildLshBands _))
    ext.injectFunction(
      (FunctionIdentifier("graft_sqcodes"), SqCodes.info,
        GraftExtensions.buildSqCodes _))
    ext.injectFunction(
      (FunctionIdentifier("graft_jl"), SignedProject.info,
        (children: Seq[Expression]) => SignedProject(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_cell"), ArgminCell.info,
        (children: Seq[Expression]) => ArgminCell(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_pqmin"), PqArgmin.info,
        (children: Seq[Expression]) => PqArgmin(children(0), children(1))))
  }
}

object GraftExtensions {

  /** graft_lsh_bands(vec, bands, bits, dim) — the shape parameters must be
    * int literals: they size the driver-computed plane-weight table. */
  private[functions] def buildLshBands(children: Seq[Expression]): LshBandBuckets = {
    def intLit(e: Expression, name: String): Int = e match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_lsh_bands: $name must be an int literal, got $other")
    }
    LshBandBuckets(children(0), intLit(children(1), "bands"),
      intLit(children(2), "bits"), intLit(children(3), "dim"))
  }

  /** graft_sqcodes(vec, scale) — scale must be a POSITIVE int literal
    * (baked into the generated loop; scale <= 0 would silently yield
    * all-zero or order-inverted codes). */
  private[functions] def buildSqCodes(children: Seq[Expression]): SqCodes = {
    if (children.size != 2) throw new IllegalArgumentException(
      s"graft_sqcodes expects (array<double> vec, int scale), got " +
        s"${children.size} argument(s)")
    children(1) match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) if v > 0 =>
        SqCodes(children(0), v)
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) =>
        throw new IllegalArgumentException(
          s"graft_sqcodes: scale must be > 0, got $v")
      case other => throw new IllegalArgumentException(
        s"graft_sqcodes: scale must be an int literal, got $other")
    }
  }

  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val dotId = FunctionIdentifier("graft_dot")
    if (!reg.functionExists(dotId)) {
      reg.registerFunction(dotId, DotProduct.info,
        (children: Seq[Expression]) => DotProduct(children(0), children(1)))
    }
    val iqId = FunctionIdentifier("graft_iqdot")
    if (!reg.functionExists(iqId)) {
      reg.registerFunction(iqId, IntQuantDot.info,
        (children: Seq[Expression]) => IntQuantDot(children(0), children(1)))
    }
    val llId = FunctionIdentifier("graft_lldot")
    if (!reg.functionExists(llId)) {
      reg.registerFunction(llId, LongDot.info,
        (children: Seq[Expression]) => LongDot(children(0), children(1)))
    }
    val d2Id = FunctionIdentifier("graft_lld2")
    if (!reg.functionExists(d2Id)) {
      reg.registerFunction(d2Id, LongSqDist.info,
        (children: Seq[Expression]) => LongSqDist(children(0), children(1)))
    }
    val adcId = FunctionIdentifier("graft_adc")
    if (!reg.functionExists(adcId)) {
      reg.registerFunction(adcId, AdcLookupSum.info,
        (children: Seq[Expression]) => AdcLookupSum(children(0), children(1)))
    }
    val lshId = FunctionIdentifier("graft_lsh_bands")
    if (!reg.functionExists(lshId)) {
      reg.registerFunction(lshId, LshBandBuckets.info, buildLshBands _)
    }
    val sqId = FunctionIdentifier("graft_sqcodes")
    if (!reg.functionExists(sqId)) {
      reg.registerFunction(sqId, SqCodes.info, buildSqCodes _)
    }
    val jlId = FunctionIdentifier("graft_jl")
    if (!reg.functionExists(jlId)) {
      reg.registerFunction(jlId, SignedProject.info,
        (children: Seq[Expression]) => SignedProject(children(0), children(1)))
    }
    val cellId = FunctionIdentifier("graft_cell")
    if (!reg.functionExists(cellId)) {
      reg.registerFunction(cellId, ArgminCell.info,
        (children: Seq[Expression]) => ArgminCell(children(0), children(1)))
    }
    val pqId = FunctionIdentifier("graft_pqmin")
    if (!reg.functionExists(pqId)) {
      reg.registerFunction(pqId, PqArgmin.info,
        (children: Seq[Expression]) => PqArgmin(children(0), children(1)))
    }
  }
}

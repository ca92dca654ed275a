package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

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
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          DotProduct(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_iqdot"), IntQuantDot.info,
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          IntQuantDot(children(0), children(1))))
  }
}

object GraftExtensions {
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val dotId = FunctionIdentifier("graft_dot")
    if (!reg.functionExists(dotId)) {
      reg.registerFunction(dotId, DotProduct.info,
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          DotProduct(children(0), children(1)))
    }
    val iqId = FunctionIdentifier("graft_iqdot")
    if (!reg.functionExists(iqId)) {
      reg.registerFunction(iqId, IntQuantDot.info,
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          IntQuantDot(children(0), children(1)))
    }
  }
}

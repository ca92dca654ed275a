package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native scalar-quantization codes over an `array<double>` vector:
  * code_i = floor(x_i / ‖x‖ · scale) as `bigint` (all-zero for the zero
  * vector) — the exact semantics of the HOF form
  * `when(nrm > 0, transform(v, x => floor(x / nrm * scale)))` that
  * [[graft.operators.SimilarityOps]] hoists out of every pair loop.
  *
  * Why native (SURVEY §7.4 escalation (b), same story as graft_dot /
  * graft_lldot): the HOF form is TWO interpreted folds per vector
  * (aggregate for the norm + transform for the codes, each allocating per
  * element) — measured ~200 µs/vector, 40 s of pure per-row overhead on a
  * 200 k-vector knn-graph build at sf10. The counted loop runs inside
  * whole-stage codegen.
  *
  * Determinism: ascending-index norm fold (IEEE-identical to the HOF fold
  * and DuckDB's list_aggregate), and the same (x / nrm) * scale evaluation
  * order before floor. Null elements are not supported (embedding columns
  * carry none) and FAIL LOUDLY if encountered — never silently read as
  * 0.0; a null ARRAY is null like any unary expression.
  */
case class SqCodes(child: Expression, scale: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull = true is accepted (parquet float-list schemas declare
    // nullable elements even when none occur), but an ACTUAL null element
    // fails loudly at eval instead of silently reading as 0.0 — see the
    // isNullAt guard in both eval paths
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sqcodes expects array<double>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sqcodes"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) throw new IllegalArgumentException(
        s"graft_sqcodes: null element at index $i (null elements unsupported)")
      val v = x.getDouble(i); s += v * v; i += 1
    }
    val nrm = math.sqrt(s)
    val out = new Array[Long](n)
    if (nrm > 0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(x.getDouble(i) / nrm * scale).toLong
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "graft_sqcodes: null element at index " + $i +
         |      " (null elements unsupported)");
         |  }
         |  double v = $a.getDouble($i);
         |  $s += v * v;
         |}
         |double $nrm = java.lang.Math.sqrt($s);
         |long[] $out = new long[$n];
         |if ($nrm > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (long) java.lang.Math.floor(
         |      $a.getDouble($i) / $nrm * $scale);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SqCodes =
    copy(child = newChild)
}

object SqCodes {
  val info = new ExpressionInfo(classOf[SqCodes].getName, "graft_sqcodes")
}

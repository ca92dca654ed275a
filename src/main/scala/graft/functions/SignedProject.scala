package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Signed projection of an integer vector by a row-major sign matrix:
  * out[j] = Σ_i signs[j][i] · vec[i] over (`array<bigint>` vec,
  * `array<array<bigint>>` signs), result `array<bigint>`.
  *
  * THE Johnson–Lindenstrauss projection inner step. The plan-time form it
  * replaces — outDims (16) summation chains of 64 `element_at`/negate
  * terms each, >1000 expression nodes per projection site — is the
  * [[DotProduct]] failure mode at expression scale: the generated method
  * body blows past Janino/HotSpot method limits, so the stage drops out
  * of whole-stage codegen and evaluates interpreted (measured: the two
  * ivf-projected rows were the bench's slowest at ~4.8 s on a 2k-row
  * fixture, dominated by that tree, not data). One nested counted loop
  * instead: JIT-hot, codegen-resident, and the sign matrix travels as a
  * small literal (outDims×64 longs).
  *
  * Determinism: ascending-i integer summation — associative BIGINT adds,
  * identical to the unrolled chain and to the DuckDB oracle's
  * `list_transform(range(16), j -> list_aggregate(...))` form. */
case class SignedProject(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jl expects (array<bigint> vec, array<array<bigint>> signs), " +
          s"got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_jl"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val signs = b.asInstanceOf[ArrayData]
    val m = signs.numElements()
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      val row = signs.getArray(j)
      val n = math.min(vec.numElements(), row.numElements())
      var s = 0L
      var i = 0
      while (i < n) { s += row.getLong(i) * vec.getLong(i); i += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val out = ctx.freshName("out")
      s"""
         |int $m = $b.numElements();
         |long[] $out = new long[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($j);
         |  int $n = java.lang.Math.min($a.numElements(), $row.numElements());
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $row.getLong($i) * $a.getLong($i);
         |  }
         |  $out[$j] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignedProject =
    copy(left = newLeft, right = newRight)
}

object SignedProject {
  val info = new ExpressionInfo(classOf[SignedProject].getName, "graft_jl")
}

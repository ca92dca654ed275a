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
  * `list_transform(range(16), j -> list_aggregate(...))` form.
  *
  * Null/length semantics MIRROR the unrolled `element_at` chain (not a
  * silent truncation): component j is NULL when the sign row j is null,
  * when its length differs from the vector's (an out-of-range
  * `element_at` yields NULL and poisons the sum), or when any element of
  * the vector or of row j is null. The all-non-null equal-length case —
  * the entire hot path — stays a primitive long[] with zero boxing. */
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
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_jl"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val signs = b.asInstanceOf[ArrayData]
    val vlen = vec.numElements()
    var vecHasNull = false
    var v = 0
    while (v < vlen && !vecHasNull) {
      if (vec.isNullAt(v)) vecHasNull = true; v += 1
    }
    val m = signs.numElements()
    val out = new Array[Long](m)
    val nulls = new Array[Boolean](m)
    var anyNull = false
    var j = 0
    while (j < m) {
      if (signs.isNullAt(j) || vecHasNull) { nulls(j) = true; anyNull = true }
      else {
        val row = signs.getArray(j)
        val n = row.numElements()
        if (n != vlen) { nulls(j) = true; anyNull = true }
        else {
          var s = 0L
          var i = 0
          var ok = true
          while (i < n && ok) {
            if (row.isNullAt(i)) ok = false
            else { s += row.getLong(i) * vec.getLong(i); i += 1 }
          }
          if (ok) out(j) = s else { nulls(j) = true; anyNull = true }
        }
      }
      j += 1
    }
    if (!anyNull) new GenericArrayData(out)
    else new GenericArrayData(
      (0 until m).map(i => if (nulls(i)) null
                           else java.lang.Long.valueOf(out(i))).toArray[Any])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val ok = ctx.freshName("ok")
      val row = ctx.freshName("row")
      val out = ctx.freshName("out")
      val nulls = ctx.freshName("nulls")
      val anyNull = ctx.freshName("anyNull")
      val vlen = ctx.freshName("vlen")
      val vecHasNull = ctx.freshName("vecHasNull")
      val boxed = ctx.freshName("boxed")
      s"""
         |int $vlen = $a.numElements();
         |boolean $vecHasNull = false;
         |for (int $v = 0; $v < $vlen && !$vecHasNull; $v++) {
         |  if ($a.isNullAt($v)) $vecHasNull = true;
         |}
         |int $m = $b.numElements();
         |long[] $out = new long[$m];
         |boolean[] $nulls = new boolean[$m];
         |boolean $anyNull = false;
         |for (int $j = 0; $j < $m; $j++) {
         |  if ($b.isNullAt($j) || $vecHasNull) { $nulls[$j] = true; $anyNull = true; continue; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($j);
         |  int $n = $row.numElements();
         |  if ($n != $vlen) { $nulls[$j] = true; $anyNull = true; continue; }
         |  long $s = 0L;
         |  boolean $ok = true;
         |  for (int $i = 0; $i < $n && $ok; $i++) {
         |    if ($row.isNullAt($i)) { $ok = false; }
         |    else { $s += $row.getLong($i) * $a.getLong($i); }
         |  }
         |  if ($ok) { $out[$j] = $s; } else { $nulls[$j] = true; $anyNull = true; }
         |}
         |if (!$anyNull) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |} else {
         |  Object[] $boxed = new Object[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    if (!$nulls[$j]) $boxed[$j] = java.lang.Long.valueOf($out[$j]);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignedProject =
    copy(left = newLeft, right = newRight)
}

object SignedProject {
  val info = new ExpressionInfo(classOf[SignedProject].getName, "graft_jl")
}

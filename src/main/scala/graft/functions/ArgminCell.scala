package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Argmin-cell over a centroid matrix: the 0-based index of the centroid
  * row minimizing Σ (c[i]−v[i])² over (`array<bigint>` vec,
  * `array<array<bigint>>` centroids), result `bigint`. Ties break to the
  * FIRST minimal row (strict `<` while scanning ascending) — with
  * centroid rows ordered by ascending cell id this IS the (d², cid)
  * lexicographic argmin every assignment path here uses.
  *
  * THE centroid-placement inner step for literal-centroid paths
  * ([[graft.streaming.VecIngest]]'s stateless stream placement). The
  * plan-time form it replaces — `array_min` over a cells-sized
  * array-of-structs literal, one `graft_lld2` call per centroid — grows
  * the expression tree linearly with the cell count: at production cell
  * counts (√n ⇒ thousands) the projection blows the Janino/JIT generated-
  * method limits and the stage drops out of whole-stage codegen, exactly
  * the [[SignedProject]] failure mode this kernel family exists to kill.
  * One codegen'd nested loop instead; the centroid matrix travels as a
  * small literal (cells×d longs — the broadcast-equivalent).
  *
  * Null/shape semantics (the graft_jl convention): the result is NULL when
  * the centroid matrix is empty, when any centroid row is null or has a
  * length differing from the vector's, or when any element of the vector
  * or of a centroid row is null — a malformed centroid set must poison the
  * placement visibly, never skew it silently. All-non-null equal-length
  * inputs — the entire hot path — run a branch-light primitive loop. */
case class ArgminCell(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cell expects (array<bigint> vec, array<array<bigint>> " +
          s"centroids), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cell"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val vlen = vec.numElements()
    val m = cents.numElements()
    if (m == 0) return null
    var v = 0
    while (v < vlen) {
      if (vec.isNullAt(v)) return null; v += 1
    }
    var best = Long.MaxValue
    var bestJ = -1L
    var j = 0
    while (j < m) {
      if (cents.isNullAt(j)) return null
      val row = cents.getArray(j)
      if (row.numElements() != vlen) return null
      var s = 0L
      var i = 0
      while (i < vlen) {
        if (row.isNullAt(i)) return null
        val d = row.getLong(i) - vec.getLong(i)
        s += d * d
        i += 1
      }
      if (s < best) { best = s; bestJ = j.toLong }
      j += 1
    }
    bestJ
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val v = ctx.freshName("v")
      val row = ctx.freshName("row")
      val vlen = ctx.freshName("vlen")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      val bad = ctx.freshName("bad")
      s"""
         |int $vlen = $a.numElements();
         |int $m = $b.numElements();
         |boolean $bad = ($m == 0);
         |for (int $v = 0; $v < $vlen && !$bad; $v++) {
         |  if ($a.isNullAt($v)) $bad = true;
         |}
         |long $best = Long.MAX_VALUE;
         |long $bestJ = -1L;
         |for (int $j = 0; $j < $m && !$bad; $j++) {
         |  if ($b.isNullAt($j)) { $bad = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($j);
         |  if ($row.numElements() != $vlen) { $bad = true; break; }
         |  long $s = 0L;
         |  for (int $i = 0; $i < $vlen; $i++) {
         |    if ($row.isNullAt($i)) { $bad = true; break; }
         |    long $d = $row.getLong($i) - $a.getLong($i);
         |    $s += $d * $d;
         |  }
         |  if ($bad) break;
         |  if ($s < $best) { $best = $s; $bestJ = (long) $j; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $bestJ;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgminCell =
    copy(left = newLeft, right = newRight)
}

object ArgminCell {
  val info = new ExpressionInfo(classOf[ArgminCell].getName, "graft_cell")
}

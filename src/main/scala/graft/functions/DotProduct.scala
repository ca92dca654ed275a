package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native dot product over two `array<double>` columns.
  *
  * Why a custom Catalyst expression (SURVEY §7.4 escalation path (b)):
  *  - `aggregate`/`zip_with` higher-order functions are CodegenFallback —
  *    interpreted per row;
  *  - a statically unrolled 64-term `Add` chain generates a method past
  *    HotSpot's HugeMethodLimit, so the JIT refuses it and the whole join
  *    stage runs in the bytecode interpreter (measured 80 s for a 12.5M-pair
  *    nested-loop join at sf0.1).
  * `doGenCode` emits a compact counted loop instead: JIT-hot, fully inside
  * whole-stage codegen.
  *
  * Determinism: ascending-index summation == the left fold used by the
  * DuckDB oracles (`list_aggregate(..., 'sum')`) — IEEE-identical results.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val info = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")
}

/** Pure long dot product over two `array<bigint>` columns, result `bigint`.
  *
  * The exact-integer counterpart of [[DotProduct]] for already-quantized
  * vectors (projected components, LSH weights, PQ partials): associative,
  * partition-order-free, cross-engine exact — and codegen'd as a counted
  * loop where the `aggregate(zip_with(...))` HOF form is interpreted per
  * row (measured 1.6× on the projected-prefilter pair scan at sf10, where
  * the fold ran 400M times).
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_lldot expects (array<bigint>, array<bigint>), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lldot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

object LongDot {
  val info = new ExpressionInfo(classOf[LongDot].getName, "graft_lldot")
}

/** Squared L2 distance over two `array<bigint>` columns, result `bigint`:
  * Σ (a[i]−b[i])². The IVF/SemDeDup assignment inner loop — it runs
  * n×cells times per assignment pass, where the `aggregate(zip_with(...))`
  * HOF form is interpreted per evaluation (the measured dominant term of
  * the r10 cells-sizing tables). Codegen'd counted loop; exact associative
  * integer arithmetic, so assignments are partition-order-free and
  * cross-engine exact like the fold they replace.
  */
case class LongSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_lld2 expects (array<bigint>, array<bigint>), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lld2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i); s += d * d; i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongSqDist =
    copy(left = newLeft, right = newRight)
}

object LongSqDist {
  val info = new ExpressionInfo(classOf[LongSqDist].getName, "graft_lld2")
}

/** ADC lookup sum: Σ_s table[s][codes[s]] over a PQ code row and a
  * per-query distance table (`array<bigint>` codes × `array<array<bigint>>`
  * table, result `bigint`). THE hot loop of asymmetric-distance search —
  * it runs once per (query, corpus-vector) pair, and the
  * `aggregate(zip_with(sequence, codes, (s, c) -> t[s][c]))` HOF form it
  * replaces is interpreted per evaluation. Codegen'd counted loop with the
  * same null-free fixture contract as the fold (codes and tables are
  * constructed, never null). Out-of-range codes sum as 0 (the fold's
  * null-element behavior is never reachable for valid codebooks — both
  * sides derive their code range from the same PqK).
  */
case class AdcLookupSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_adc expects (array<bigint>, array<array<bigint>>), " +
          s"got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), table.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val row = table.getArray(i)
      val c = codes.getLong(i).toInt
      if (c >= 0 && c < row.numElements()) s += row.getLong(c)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($i);
         |  int $c = (int) $a.getLong($i);
         |  if ($c >= 0 && $c < $row.numElements()) $s += $row.getLong($c);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookupSum =
    copy(left = newLeft, right = newRight)
}

object AdcLookupSum {
  val info = new ExpressionInfo(classOf[AdcLookupSum].getName, "graft_adc")
}

/** Integer-quantized dot product: Σ round(a[i]·1e6) · w[i] over
  * (`array<double>`, `array<bigint>`), result `bigint`.
  *
  * Used for LSH hyperplane sign tests: the quantization makes the sum pure
  * integer arithmetic — associative, partition-order-free, cross-engine
  * exact. Rounding is half-away-from-zero, matching both Spark's `round`
  * and DuckDB's `round` for doubles.
  */
case class IntQuantDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_iqdot expects (array<double>, array<bigint>), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_iqdot"

  @inline private def q(v: Double): Long =
    if (v < 0) -Math.floor(-v * 1000000.0 + 0.5).toLong
    else Math.floor(v * 1000000.0 + 0.5).toLong

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += q(x.getDouble(i)) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i) * 1000000.0d;
         |  long q = $v < 0 ? -(long) java.lang.Math.floor(-$v + 0.5d)
         |                  : (long) java.lang.Math.floor($v + 0.5d);
         |  $s += q * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntQuantDot =
    copy(left = newLeft, right = newRight)
}

object IntQuantDot {
  val info = new ExpressionInfo(classOf[IntQuantDot].getName, "graft_iqdot")
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All `bands` hyperplane-LSH bucket ids of a vector in ONE pass — result
  * `array<bigint>` of length `bands`, element b identical to
  * `SimilarityOps.lshBucketBand(vec, b, bits)`.
  *
  * Why a custom Catalyst expression (SURVEY §7.4 escalation path (b)):
  * building the 8-band banding as 64 separate `graft_iqdot` calls (each
  * with its own 64-element literal weight array) generates a projection
  * past HotSpot's method limits — measured 12.8 s for a 20 k-row banding at
  * sf1 versus 0.20 s for a single 8-plane bucket, i.e. ~64× the work of
  * one plane instead of 8×. This expression quantizes each element ONCE
  * and runs all bands·bits plane sums in a tight counted loop over a
  * shared flat weight table (one `addReferenceObj`, no per-plane
  * literals), keeping the whole banding inside whole-stage codegen.
  *
  * Semantics are pinned to the md5-derived plane family
  * ([[graft.operators.SimilarityOps.planeWeightValue]]) and the
  * half-away-from-zero 1e6 quantization of [[IntQuantDot]], so bucket ids
  * stay integer-exact and cross-engine reproducible (the DuckDB oracles
  * re-derive the same planes).
  */
case class LshBandBuckets(child: Expression, bands: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  // bits is the documented scale-up knob — validate it here (the single
  // construction choke point for SQL, Column and programmatic callers):
  // bits > 64 would silently wrap the Java shift (1L << k uses k mod 64)
  // and emit COLLIDING bucket ids; non-positive shapes allocate invalid
  // weight tables
  require(bands >= 1, s"graft_lsh_bands: bands must be >= 1, got $bands")
  require(bits >= 1 && bits <= 64,
    s"graft_lsh_bands: bits must be in [1, 64] (bucket id is one long), got $bits")
  require(dim >= 1, s"graft_lsh_bands: dim must be >= 1, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bands expects array<double>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_bands"

  /** Flat plane-weight table: plane p (= band·bits + j), dimension d at
    * index p·dim + d. Computed once per expression instance on the driver,
    * shipped as a codegen reference object. */
  @transient lazy val weights: Array[Long] = {
    val w = new Array[Long](bands * bits * dim)
    var p = 0
    while (p < bands * bits) {
      var d = 0
      while (d < dim) {
        w(p * dim + d) = graft.operators.SimilarityOps.planeWeightValue(p, d)
        d += 1
      }
      p += 1
    }
    w
  }

  @inline private def q(v: Double): Long =
    if (v < 0) -Math.floor(-v * 1000000.0 + 0.5).toLong
    else Math.floor(v * 1000000.0 + 0.5).toLong

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val qv = new Array[Long](n)
    var i = 0
    while (i < n) { qv(i) = q(x.getDouble(i)); i += 1 }
    val out = new Array[Long](bands)
    var band = 0
    while (band < bands) {
      var acc = 0L
      var j = 0
      while (j < bits) {
        val base = (band * bits + j) * dim
        var s = 0L
        var i2 = 0
        while (i2 < n) { s += qv(i2) * weights(base + i2); i2 += 1 }
        if (s > 0) acc |= 1L << (bits - 1 - j)
        j += 1
      }
      out(band) = acc
      band += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("lshWeights", weights, "long[]")
      val n = ctx.freshName("n")
      val qv = ctx.freshName("qv")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val band = ctx.freshName("band")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long[] $qv = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i) * 1000000.0d;
         |  $qv[$i] = $v < 0 ? -(long) java.lang.Math.floor(-$v + 0.5d)
         |                   : (long) java.lang.Math.floor($v + 0.5d);
         |}
         |long[] $out = new long[$bands];
         |for (int $band = 0; $band < $bands; $band++) {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $base = ($band * $bits + $j) * $dim;
         |    long $s = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $qv[$i] * $w[$base + $i];
         |    }
         |    if ($s > 0) $acc |= 1L << ($bits - 1 - $j);
         |  }
         |  $out[$band] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBandBuckets =
    copy(child = newChild)
}

object LshBandBuckets {
  val info = new ExpressionInfo(classOf[LshBandBuckets].getName, "graft_lsh_bands")
}

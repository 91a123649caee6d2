package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd vector arithmetic over `array<float>` embedding columns
  * (SURVEY.md §4 "potentially-custom pieces": the dot-product Expression
  * that replaces the interpreted higher-order-function form once
  * similarity ops are hot — Spark's lambda functions don't participate in
  * whole-stage codegen, so `aggregate(zip_with(...))` costs a closure call
  * per element; these compile to a tight primitive loop instead).
  *
  * Math contract: identical operation order to the HOF form (ascending
  * index, double accumulate) so results are bit-identical and the DuckDB
  * oracles keep matching.
  *
  * Null contract: null input array → null; elements are assumed non-null
  * (embedding vectors), matching the HOF behavior on such data.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs two array<float> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // length mismatch -> null, matching aggregate(zip_with(...)) where the
    // shorter side null-pads and poisons the sum (the documented contract)
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
          }
          ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of an array<float>, same double-accumulate order as the HOF
  * form. */
case class VectorNorm(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_norm needs array<float>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
        int $n = $a.numElements();
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $v = (double) $a.getFloat($i);
          $acc += $v * $v;
        }
        ${ev.value} = java.lang.Math.sqrt($acc);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

/** Per-row int8-quantization statistics in ONE pass over the vector:
  * struct(scale = max|x|/127, q_sum = Σ round(x·127/mx), q_sqsum = Σ round²).
  * The HOF formulation (aggregate over transform) costs two interpreted
  * closure calls per ELEMENT; this is one eval per ROW (CodegenFallback —
  * the loop itself is compiled JVM code). Rounding is BigDecimal HALF_UP,
  * bit-identical to Spark's `round` (and DuckDB's away-from-zero for these
  * magnitudes). Zero/empty vectors → null, matching the guarded-division
  * HOF form. */
case class VectorQuantStats(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("scale", DoubleType),
    org.apache.spark.sql.types.StructField("q_sum", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("q_sqsum", org.apache.spark.sql.types.LongType)))

  // returns null for zero/degenerate vectors even when the input column is
  // non-nullable — without this override Catalyst would trust
  // child.nullable and elide the null checks downstream
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_quant_stats needs array<float>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      // null or non-finite elements make the quantization undefined —
      // null out the row (the HOF form null-propagates the same inputs)
      if (x.isNullAt(i)) return null
      val v = math.abs(x.getFloat(i).toDouble)
      if (!java.lang.Double.isFinite(v)) return null
      if (v > mx) mx = v
      i += 1
    }
    if (mx == 0.0) return null
    var qs = 0L
    var qq = 0L
    i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble * 127.0 / mx
      val q = java.math.BigDecimal.valueOf(v)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      qs += q
      qq += q * q
      i += 1
    }
    InternalRow(mx / 127.0, qs, qq)
  }

  override protected def withNewChildInternal(newChild: Expression): VectorQuantStats =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API for the codegen'd expressions. */
  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(VectorDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def vecNorm(a: Column): Column =
    GraftSqlBridge.column(VectorNorm(GraftSqlBridge.expression(a)))

  /** cosine(a,b) = dot/(|a||b|) — same formula/order as Similarity.cosine. */
  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** struct(scale, q_sum, q_sqsum) int8-quantization stats, one pass. */
  def vecQuantStats(a: Column): Column =
    GraftSqlBridge.column(VectorQuantStats(GraftSqlBridge.expression(a)))
}

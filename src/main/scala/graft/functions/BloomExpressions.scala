package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast Bloom-filter membership probe as a NATIVE codegen'd
  * expression: the scala-udf formulation forces every corpus row out of
  * whole-stage codegen (boxing + an interpreted closure call on the hot
  * scan), which is exactly the overhead a map-side prefilter exists to
  * avoid. This stays inside the generated loop: the broadcast handle
  * rides the serialized expression (the FILTER ships once per executor,
  * not per task binary), `.value()` resolves once at partition init into
  * a mutable-state field, and the per-row work is one
  * `mightContainBinary` over the UTF8String's bytes —
  * `BloomFilter.putString`'s own encoding, so results are identical to
  * `mightContainString(s.toString)` without the String decode.
  *
  * Null input → null (the enclosing Filter drops it, matching the old
  * udf's `s != null && ...`).
  */
case class BloomMightContain(bloom: Broadcast[BloomFilter], child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs a string input, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    bloom.value.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[_]].getName)
    // resolve the broadcast ONCE per codegen instance, not per row
    val filterVar = ctx.addMutableState(
      classOf[BloomFilter].getName, "bloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $filterVar.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomFunctions {
  /** `bloomMightContain(bc, col("s"))` — codegen'd broadcast Bloom probe. */
  def bloomMightContain(bloom: Broadcast[BloomFilter], s: Column): Column =
    GraftSqlBridge.column(BloomMightContain(bloom, GraftSqlBridge.expression(s)))
}

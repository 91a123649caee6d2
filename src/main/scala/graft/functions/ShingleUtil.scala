package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling as one compiled call per row (via StaticInvoke,
  * which whole-stage codegen inlines as a plain static method call). The
  * higher-order-function formulation (transform+slice+concat_ws over a
  * position sequence) runs interpreted per ELEMENT — ~20x slower on the
  * documents fixture.
  *
  * Semantics identical to the HOF form: lowercase, split on `\s+`,
  * n-grams joined by a single space, distinct (insertion order). */
object ShingleUtil {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  def shingles(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return null
    val words = ws.split(text.toString.toLowerCase, -1)
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** As [[shingles]] but keeping every occurrence (no distinct) — the
    * repetition-scoring input, where multiplicity IS the signal. */
  def shinglesAll(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return null
    val words = ws.split(text.toString.toLowerCase, -1)
    val count = math.max(words.length - n + 1, 0)
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Expression-level constructor (SQL function registration path). */
  def shingleExpr(method: String,
      text: org.apache.spark.sql.catalyst.expressions.Expression,
      n: Int): org.apache.spark.sql.catalyst.expressions.Expression = {
    require(n > 0, s"shingle size must be positive, got $n")
    StaticInvoke(
      ShingleUtil.getClass,
      ArrayType(StringType, containsNull = false),
      method,
      Seq(text, Literal(n, IntegerType)),
      inputTypes = Seq(StringType, IntegerType),
      propagateNull = true,
      returnNullable = true)
  }

  private def invoke(method: String, text: Column, n: Int): Column =
    GraftSqlBridge.column(
      shingleExpr(method, GraftSqlBridge.expression(text), n))

  /** Column wrapper: `shingleCol(col("text"), 3)`. */
  def shingleCol(text: Column, n: Int): Column = invoke("shingles", text, n)

  /** Column wrapper for [[shinglesAll]]. */
  def shingleAllCol(text: Column, n: Int): Column = invoke("shinglesAll", text, n)
}

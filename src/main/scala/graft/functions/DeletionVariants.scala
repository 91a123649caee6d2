package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deletion neighborhood of a string: every DISTINCT string obtainable by
  * deleting up to `d` characters (k = 0 included — the string itself).
  * The blocking key set of the FastSS / SymSpell family of edit-distance
  * joins: if lev(a, b) ≤ d then a and b share at least one common
  * deletion variant (delete from each side the ≤ d characters its
  * optimal alignment edits — both sides land on the aligned common
  * subsequence). See [[graft.operators.FuzzyJoin.deletionFuzzyJoin]] for
  * why this beats q-gram blocking on low-entropy keys.
  *
  * Distinctness matters beyond output size: runs of a repeated character
  * collapse (deleting any '0' of a zero-run yields the SAME variant), so
  * zero-padded serials — the q-gram scheme's worst case — produce FEWER
  * variants, not more.
  *
  * Size is C(L,0)+…+C(L,d) before dedup; `maxLen` bounds it LOUDLY (an
  * over-long string throws with the offending length rather than
  * silently exploding a task). Compiled per-row call via StaticInvoke
  * (the [[ShingleUtil]] discipline): one static method inside
  * whole-stage codegen, no per-element HOF interpretation.
  */
object DeletionVariants {

  def variants(s: UTF8String, d: Int, maxLen: Int): ArrayData = {
    if (s == null) return null
    val str = s.toString
    if (str.length > maxLen)
      throw new IllegalArgumentException(
        s"deletion-variant blocking got a ${str.length}-char string " +
          s"(maxLen $maxLen); raise maxLen or use qgramFuzzyJoin for long strings")
    // BFS over deletion depth with global dedup: frontier k -> k+1
    val seen = new java.util.LinkedHashSet[String]
    seen.add(str)
    var frontier: java.util.ArrayList[String] = new java.util.ArrayList[String]
    frontier.add(str)
    var k = 0
    while (k < d) {
      val next = new java.util.ArrayList[String]
      var i = 0
      while (i < frontier.size) {
        val cur = frontier.get(i)
        var j = 0
        while (j < cur.length) {
          val v = new java.lang.StringBuilder(cur.length - 1)
            .append(cur, 0, j).append(cur, j + 1, cur.length).toString
          if (seen.add(v)) next.add(v)
          j += 1
        }
        i += 1
      }
      frontier = next
      k += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }

  /** Column wrapper: `variantsCol(col("name"), 1, 64)`. */
  def variantsCol(s: Column, d: Int, maxLen: Int): Column = {
    require(d >= 0, s"d must be >= 0, got $d")
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    GraftSqlBridge.column(StaticInvoke(
      DeletionVariants.getClass,
      ArrayType(StringType, containsNull = false),
      "variants",
      Seq(GraftSqlBridge.expression(s),
        Literal(d, IntegerType), Literal(maxLen, IntegerType)),
      inputTypes = Seq(StringType, IntegerType, IntegerType),
      propagateNull = true,
      returnNullable = true))
  }
}

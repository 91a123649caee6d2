package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy of the word distribution of a document — a quality
  * signal complementing q_text_repetition: low entropy = boilerplate /
  * keyword-stuffed / generated text, high entropy = diverse vocabulary.
  *
  * One compiled static call per row (StaticInvoke, inlined by whole-stage
  * codegen): O(len) with a per-row hash map, no explode → groupBy → join
  * round-trip through two shuffles, which is what the naive formulation
  * costs over a 100 TB corpus.
  *
  * Definition: words = `\s+`-split tokens, empties dropped, case
  * preserved; H = log2(n) − Σ c·log2(c) / n over word counts c (0.0 for
  * n = 0). Equals `-Σ p·log2(p)`, but the count form keeps every term an
  * exact integer log until the final division.
  */
object TextEntropy {

  private val ws = java.util.regex.Pattern.compile("\\s+")
  private val log2 = math.log(2.0)

  def wordEntropy(text: UTF8String): Double = {
    if (text == null) return 0.0
    val counts = new java.util.HashMap[String, Int]()
    var n = 0
    val words = ws.split(text.toString, -1)
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        counts.merge(words(i), 1, Integer.sum)
        n += 1
      }
      i += 1
    }
    if (n == 0) return 0.0
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      acc += c * (math.log(c) / log2)
    }
    math.log(n.toDouble) / log2 - acc / n
  }

  /** The catalyst expression form (shared by the Column wrapper and the
    * SQL registration in [[graft.GraftExtensions]]). */
  def wordEntropyExpr(
      text: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    StaticInvoke(
      TextEntropy.getClass,
      DoubleType,
      "wordEntropy",
      Seq(text),
      inputTypes = Seq(StringType),
      propagateNull = false,
      returnNullable = false)

  /** Column wrapper: `wordEntropyCol(col("text"))`. Null text → 0.0 (an
    * empty document has zero vocabulary diversity; keeping the score
    * non-null lets quality filters threshold without null handling). */
  def wordEntropyCol(text: Column): Column =
    GraftSqlBridge.column(wordEntropyExpr(GraftSqlBridge.expression(text)))
}

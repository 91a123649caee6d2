package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity, bit-compatible with DuckDB's
  * `jaro_winkler_similarity` so scores replay EXACTLY in an external SQL
  * oracle (verified bitwise on 3,000 random pairs): greedy windowed
  * matching (window = max(|a|,|b|)/2 - 1), transpositions halved by
  * integer division, jaro = (m/|a| + m/|b| + (m-t)/m) / 3 in exactly
  * that association order, Winkler boost `jaro + p·0.1·(1-jaro)` only
  * when jaro > 0.7, common prefix capped at 4. Empty-vs-anything is 0
  * (including empty-vs-empty — the DuckDB convention). Matching is per
  * UTF-16 code unit; identical to byte/codepoint semantics on ASCII
  * keys (the ER domain) — non-BMP input is outside the replay contract.
  *
  * Compiled per-row call via StaticInvoke (the [[ShingleUtil]]
  * discipline): one static method inside whole-stage codegen.
  */
object JaroWinkler {

  def jaroWinkler(u1: UTF8String, u2: UTF8String): Double =
    jw(u1.toString, u2.toString)

  private def jw(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var matched = false
      while (j <= hi && !matched) {
        if (!bm(j) && b.charAt(j) == a.charAt(i)) {
          am(i) = true; bm(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val maxP = math.min(4, math.min(la, lb))
      var p = 0
      while (p < maxP && a.charAt(p) == b.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Column wrapper: `jaroWinklerCol(col("a"), col("b"))`. */
  def jaroWinklerCol(a: Column, b: Column): Column =
    GraftSqlBridge.column(StaticInvoke(
      JaroWinkler.getClass,
      DoubleType,
      "jaroWinkler",
      Seq(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)),
      inputTypes = Seq(StringType, StringType),
      propagateNull = true,
      returnNullable = true))
}

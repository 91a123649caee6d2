package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-feature linear classifier scoring — fastText-style quality
  * filtering as pure inference at corpus scale: the "model" is a
  * `buckets`-sized weight vector, features are `\s+` word unigrams hashed
  * into buckets, and the document score is
  * `bias + Σ_tokens w[bucket(token)] / 1e6 / max(n_tokens, 1)`.
  *
  * Built for engine-neutral replay (the [[NeutralHash]] story): buckets
  * come from md5-lower64 (`md5_number_lower(token) & (buckets-1)` in
  * DuckDB), and the weights are INTEGER micro-units derived from the same
  * md5 stream (`(lower64("clf:seed:j") & 0xFFFFF) - 524288`, i.e.
  * ±0.524288 after the 1e6 scale) — integer partial sums are exact under
  * any accumulation order, so the per-doc weight sum replays bit-for-bit
  * in an external SQL engine with the weight list as a literal. A real
  * deployment swaps [[weightsInt]] for trained weights quantized the same
  * way; nothing else changes.
  *
  * Execution shape (100 TB story): ONE compiled static call per row
  * (StaticInvoke inlined by whole-stage codegen, the [[TextEntropy]]
  * pattern) — O(len) with zero shuffle, vs the relational formulation's
  * explode → groupBy → join round-trip. The weight table is rebuilt once
  * per (seed, buckets) per executor and cached.
  */
object TextClassifier {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int), Array[Long]]()

  /** Deterministic pseudo-trained weights in integer micro-units.
    * `buckets` must be a power of two (bucket = hash & (buckets-1), the
    * form DuckDB's unsigned md5 integers mask identically). */
  def weightsInt(seed: Long, buckets: Int): Array[Long] = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    cache.computeIfAbsent((seed, buckets), { case (sd, b) =>
      Array.tabulate(b)(j =>
        (NeutralHash.lower64(s"clf:$sd:$j") & 0xFFFFFL) - 524288L)
    })
  }

  /** Σ over word-unigram tokens of the token's bucket weight (integer
    * micro-units). Tokenization matches the repo-wide `\s+`-split with
    * empties dropped; case handling is the CALLER's (pass pre-lowered
    * text so Spark's own `lower` semantics apply). */
  def hashedWeightSum(text: UTF8String, seed: Long, buckets: Int): Long = {
    val w = weightsInt(seed, buckets)
    val mask = buckets - 1
    var acc = 0L
    val words = ws.split(text.toString, -1)
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty)
        acc += w((NeutralHash.lower64(words(i)) & mask).toInt)
      i += 1
    }
    acc
  }

  /** The catalyst expression form (shared by the Column wrapper and the
    * SQL registration in [[graft.GraftExtensions]]). */
  def hashedWeightSumExpr(
      text: org.apache.spark.sql.catalyst.expressions.Expression,
      seed: org.apache.spark.sql.catalyst.expressions.Expression,
      buckets: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    StaticInvoke(
      TextClassifier.getClass,
      LongType,
      "hashedWeightSum",
      Seq(text, seed, buckets),
      inputTypes = Seq(StringType, LongType, IntegerType),
      propagateNull = true,
      returnNullable = true)

  /** Column form of [[hashedWeightSum]]: null text → null (coalesce at
    * the call site to keep empty docs scoreable at the bias). */
  def hashedWeightSumCol(text: Column, seed: Long, buckets: Int): Column =
    GraftSqlBridge.column(hashedWeightSumExpr(
      GraftSqlBridge.expression(text),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(seed)),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(buckets))))

  /** The weight list rendered for an external SQL oracle (a literal
    * bracketed integer list). */
  def weightsSqlLiteral(seed: Long, buckets: Int): String =
    weightsInt(seed, buckets).mkString("[", ", ", "]")
}

package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{KmvDistinctAgg, KmvSketchAgg, MinHashAgg, SimHashAgg, TopKAgg, VectorDot, VectorNorm, VectorQuantStats}

/** SparkSessionExtensions entry point: makes graft's custom expressions
  * callable from SQL (`SELECT vec_dot(a.embedding, b.embedding) ...`).
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`; on an already-running session
  * use [[GraftExtensions.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<float>"),
      (args: Seq[Expression]) => {
        arity(args, 2, "vec_dot"); VectorDot(args(0), args(1)) }),
    (FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - L2 norm of an array<float>"),
      (args: Seq[Expression]) => {
        arity(args, 1, "vec_norm"); VectorNorm(args(0)) }),
    (FunctionIdentifier("vec_quant_stats"),
      info("vec_quant_stats",
        "vec_quant_stats(a) - int8 quantization struct(scale, q_sum, q_sqsum)"),
      (args: Seq[Expression]) => {
        arity(args, 1, "vec_quant_stats"); VectorQuantStats(args(0)) }),
    (FunctionIdentifier("topk_agg"),
      info("topk_agg",
        "topk_agg(score, id, k) - per-group top-k array<struct<score,id>> " +
          "by (score desc, id asc), bounded-heap aggregate"),
      (args: Seq[Expression]) => {
        arity(args, 3, "topk_agg")
        TopKAgg(args(0), args(1), litInt(args(2), "k")) }),
    (FunctionIdentifier("minhash_agg"),
      info("minhash_agg",
        "minhash_agg(shingle, numHashes) - one-pass minhash signature"),
      (args: Seq[Expression]) => {
        arity(args, 2, "minhash_agg")
        MinHashAgg(args(0), litInt(args(1), "numHashes")) }),
    (FunctionIdentifier("simhash_agg"),
      info("simhash_agg", "simhash_agg(word) - 64-bit simhash bit-vote"),
      (args: Seq[Expression]) => {
        arity(args, 1, "simhash_agg"); SimHashAgg(args(0)) }),
    (FunctionIdentifier("kmv_distinct"),
      info("kmv_distinct",
        "kmv_distinct(value, k) - engine-neutral approximate distinct " +
          "count (k-minimum-values over md5; exact below k)"),
      (args: Seq[Expression]) => {
        arity(args, 2, "kmv_distinct")
        KmvDistinctAgg(args(0), litInt(args(1), "k")) }),
    (FunctionIdentifier("kmv_sketch"),
      info("kmv_sketch",
        "kmv_sketch(value, k) - the KMV sketch itself (k smallest " +
          "distinct md5 hashes, ascending DECIMAL(20,0)) for " +
          "cross-segment union/intersection/Jaccard set algebra"),
      (args: Seq[Expression]) => {
        arity(args, 2, "kmv_sketch")
        KmvSketchAgg(args(0), litInt(args(1), "k")) }),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(text, n) - distinct lowercase word n-grams"),
      (args: Seq[Expression]) => {
        arity(args, 2, "word_shingles")
        graft.functions.ShingleUtil.shingleExpr("shingles", args(0),
          litInt(args(1), "n")) }),
    (FunctionIdentifier("word_shingles_all"),
      info("word_shingles_all",
        "word_shingles_all(text, n) - word n-grams with multiplicity"),
      (args: Seq[Expression]) => {
        arity(args, 2, "word_shingles_all")
        graft.functions.ShingleUtil.shingleExpr("shinglesAll", args(0),
          litInt(args(1), "n")) }),
    (FunctionIdentifier("word_entropy"),
      info("word_entropy",
        "word_entropy(text) - Shannon entropy of the word distribution " +
          "(0.0 for null/empty)"),
      (args: Seq[Expression]) => {
        arity(args, 1, "word_entropy")
        graft.functions.TextEntropy.wordEntropyExpr(args(0)) }),
    (FunctionIdentifier("clf_weight_sum"),
      info("clf_weight_sum",
        "clf_weight_sum(text, seed, buckets) - hashed-unigram linear " +
          "classifier weight sum in integer micro-units (md5 buckets, " +
          "engine-replayable)"),
      (args: Seq[Expression]) => {
        arity(args, 3, "clf_weight_sum")
        // SQL integer literals arrive as INT; the static call wants
        // (long seed, int buckets) — cast here, StaticInvoke does not
        // implicit-cast its inputs
        graft.functions.TextClassifier.hashedWeightSumExpr(
          args(0),
          org.apache.spark.sql.catalyst.expressions.Cast(args(1),
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.catalyst.expressions.Cast(args(2),
            org.apache.spark.sql.types.IntegerType)) }),
  )

  private def arity(args: Seq[Expression], n: Int, name: String): Seq[Expression] = {
    if (args.length != n) throw new IllegalArgumentException(
      s"$name takes $n arguments, got ${args.length}")
    args
  }

  private def litInt(e: Expression, name: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  /** Imperative registration for an existing session. */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

package graft.functions

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Typed Aggregator surface: one-pass stats equal the DataFrame
  * formulation, nulls and empty inputs behave, merges exercised across
  * partitions. */
class TypedAggregatorsSpec extends SparkTestBase {

  test("textStats equals the DataFrame aggregation on the fixture corpus") {
    import spark.implicits._
    val docs = Tables.load(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .repartition(7) // force real partial buffers + merges
    val typed = docs.select(TypedAggregators.textStats.toColumn).head()
    val toks = coalesce(size(graft.operators.TextAnalysis.tokens(col("text"))), lit(0))
      .cast("long")
    val viaDf = Tables.load(spark, sf(), "documents").agg(
      count(lit(1)).as("n"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("nn"),
      sum(when(col("text").isNull, 0L).otherwise(toks)).as("tot"),
      min(when(col("text").isNull, lit(null)).otherwise(toks)).as("mn"),
      max(when(col("text").isNull, lit(null)).otherwise(toks)).as("mx")).head()
    assert(typed.nDocs == viaDf.getLong(0))
    assert(typed.nNull == viaDf.getLong(1))
    assert(typed.totTokens == viaDf.getLong(2))
    assert(typed.minTokens == viaDf.getLong(3))
    assert(typed.maxTokens == viaDf.getLong(4))
    assert(typed.avgTokens == typed.totTokens.toDouble / (typed.nDocs - typed.nNull))
  }

  test("textStats: null docs counted but excluded from token stats; empty input normalized") {
    import spark.implicits._
    val mixed = Seq((1L, "one two three"), (2L, null.asInstanceOf[String]),
      (3L, "  spaced   out  ")).toDS()
    val s = mixed.select(TypedAggregators.textStats.toColumn).head()
    assert(s == TypedAggregators.TextStats(3L, 1L, 5L, 2L, 3L))
    // tokenization matches the repo's \s+ convention, NOT
    // Character.isWhitespace: U+2007 (figure space) is not regex \s, so
    // "a<U+2007>b" is ONE token, same as split("\\s+")
    val uni = Seq((1L, "a\u2007b c")).toDS()
      .select(TypedAggregators.textStats.toColumn).head()
    assert(uni.totTokens == 2L, s"unicode-space tokenization diverged: $uni")
    val empty = spark.emptyDataset[(Long, String)]
      .select(TypedAggregators.textStats.toColumn).head()
    assert(empty == TypedAggregators.TextStats(0L, 0L, 0L, 0L, 0L))
    assert(empty.avgTokens == 0.0)
  }
}

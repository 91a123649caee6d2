package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Word-distribution Shannon entropy: pinned values on tiny vocabularies,
  * null/empty contract, and agreement between the static kernel and the
  * column wrapper through codegen. */
class TextEntropySpec extends SparkTestBase {

  private def h(rows: Seq[(Long, String)]): Map[Long, Double] = {
    import spark.implicits._
    rows.toDF("id", "text")
      .select(col("id"), TextEntropy.wordEntropyCol(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("pinned entropies: uniform, degenerate, empty, null") {
    val out = h(Seq(
      1L -> "a b c d",        // 4 distinct of 4 -> log2(4) = 2
      2L -> "a a a a",        // single word -> 0
      3L -> "a a b b",        // two equiprobable -> 1
      4L -> "a  a\tb\nb",     // same, through mixed whitespace
      5L -> "",               // no words -> 0
      6L -> null,             // null text -> 0 by contract
      7L -> "a a a b"))       // H(1/4) = 2 - 3/4*log2(3) computed below
    assert(out(1L) == 2.0)
    assert(out(2L) == 0.0)
    assert(out(3L) == 1.0)
    assert(out(4L) == 1.0)
    assert(out(5L) == 0.0)
    assert(out(6L) == 0.0)
    val expected7 = math.log(4.0) / math.log(2.0) -
      (3.0 * (math.log(3.0) / math.log(2.0))) / 4.0
    assert(math.abs(out(7L) - expected7) < 1e-12)
  }

  test("entropy is case-sensitive and order-invariant") {
    val out = h(Seq(1L -> "Word word", 2L -> "word Word", 3L -> "word word"))
    assert(out(1L) == 1.0)     // distinct by case
    assert(out(1L) == out(2L)) // order irrelevant
    assert(out(3L) == 0.0)
  }
}

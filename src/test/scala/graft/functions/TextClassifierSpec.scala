package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The hashed-linear-classifier contract q_text_classify rests on:
  * deterministic md5-derived weights, mask bucketing, and the compiled
  * StaticInvoke column agreeing with a plain driver-side fold. */
class TextClassifierSpec extends SparkTestBase {

  private val seed = 11L
  private val buckets = 64

  test("weights: deterministic, bounded, power-of-two gate") {
    val w = TextClassifier.weightsInt(seed, buckets)
    assert(w.length == buckets)
    assert(w.forall(v => v >= -524288L && v <= 524287L))
    assert(w.sameElements(TextClassifier.weightsInt(seed, buckets)))
    // different seed → different model
    assert(!w.sameElements(TextClassifier.weightsInt(seed + 1, buckets)))
    assertThrows[IllegalArgumentException](TextClassifier.weightsInt(seed, 48))
    // the SQL literal renders every weight in order
    val lit0 = TextClassifier.weightsSqlLiteral(seed, buckets)
    assert(lit0.startsWith("[") && lit0.endsWith("]"))
    assert(lit0.split(",").length == buckets)
  }

  test("hashedWeightSum equals a driver-side fold over tokens") {
    val w = TextClassifier.weightsInt(seed, buckets)
    def expected(text: String): Long =
      text.split("\\s+").filter(_.nonEmpty)
        .map(t => w((NeutralHash.lower64(t) & 63L).toInt)).sum
    for (t <- Seq("the quick brown fox", "  padded   spaces  ", "one", "",
        "repeated repeated repeated"))
      assert(TextClassifier.hashedWeightSum(UTF8String.fromString(t), seed, buckets)
        == expected(t), s"text: '$t'")
  }

  test("column form: compiled scoring matches, null propagates") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox"), (2L, ""), (3L, null))
      .toDF("id", "text")
    val out = df.select(col("id"),
        TextClassifier.hashedWeightSumCol(lower(col("text")), seed, buckets).as("s"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(TextClassifier.hashedWeightSum(
      UTF8String.fromString("the quick brown fox"), seed, buckets)))
    assert(out(2L).contains(0L))
    assert(out(3L).isEmpty) // propagateNull
    // case handling is the caller's: lower() applied above means mixed
    // case scores like lowercase
    val mixed = Seq((1L, "The QUICK brown Fox")).toDF("id", "text")
      .select(TextClassifier.hashedWeightSumCol(lower(col("text")), seed, buckets))
      .head().getLong(0)
    assert(mixed == TextClassifier.hashedWeightSum(
      UTF8String.fromString("the quick brown fox"), seed, buckets))
  }
}

package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UnicodeNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  test("NFC composes combining sequences and keeps precomposed forms") {
    val df = Seq(
      (1L, "cafe\u0301"),          // decomposed -> must compose
      (2L, "caf\u00e9"),           // precomposed -> unchanged
      (3L, "plain ascii"),          // fast path: already normalized
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val out = df.select(col("id"), UnicodeNormalize.nfcCol(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "caf\u00e9")
    assert(out(2L) == "caf\u00e9")
    assert(out(1L).length == 4 && "cafe\u0301".length == 5)
    assert(out(3L) == "plain ascii")
    assert(out(4L) == null)
    // the content-hash identity this exists for: both forms now collide
    val hashes = df.filter(col("id") <= 2)
      .select(md5(UnicodeNormalize.nfcCol(col("t")))).distinct().count()
    assert(hashes == 1)
  }

  test("NFKC folds compatibility forms NFC leaves alone") {
    val df = Seq(
      (1L, "o\uFB03ce"),           // ffi ligature -> "office"
      (2L, "\uFF28\uFF49"),        // full-width "Hi" -> "Hi"
      (3L, "x\u00b2")              // superscript two -> "x2"
    ).toDF("id", "t")
    val out = df.select(col("id"),
        UnicodeNormalize.nfcCol(col("t")).as("nfc"),
        UnicodeNormalize.nfkcCol(col("t")).as("nfkc"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L) == (("o\uFB03ce", "office")))
    assert(out(2L) == (("\uFF28\uFF49", "Hi")))
    assert(out(3L) == (("x\u00b2", "x2")))
  }

  test("normalization stays inside whole-stage codegen") {
    // a range source (not a LocalRelation, which constant-folds the
    // whole projection away) so the executed plan is representative
    val df = spark.range(10)
      .select(UnicodeNormalize.nfcCol(
        concat(lit("cafe\u0301"), col("id").cast("string"))).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the whole-stage-codegen marker in the simple plan form
    assert(plan.contains("*(1) Project"), s"plan not codegen'd:\n$plan")
    assert(df.collect().forall(_.getString(0).startsWith("caf\u00e9")))
  }
}

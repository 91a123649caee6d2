package graft.functions

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The fused sign-projection expression must be bit-identical to the
  * composed formulation it replaced (nBits `when(dot >= 0)` folds) —
  * same ascending-index double accumulation, same >= 0 threshold. */
class SignProjectionSpec extends SparkTestBase {

  private lazy val emb = Tables.load(spark, sf(), "embeddings")

  test("signProjection equals the composed when(dot>=0) fold bit-for-bit") {
    val planes = graft.operators.Similarity.signPlanes(dim = 64, nBits = 12,
      seed = 99L)
    val composed = planes.zipWithIndex.map { case (p, i) =>
      when(VectorFunctions.vecDot(col("embedding"), typedLit(p.toSeq)) >= 0d,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val rows = emb.filter(col("embedding").isNotNull).select(
        col("vec_id"),
        VectorFunctions.signProjection(col("embedding"), planes).as("fused"),
        composed.as("composed"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"vec ${r.getLong(0)}: fused ${r.getLong(1)} != composed ${r.getLong(2)}"))
  }

  test("signProjection nulls out missing and mismatched-dimension vectors") {
    import spark.implicits._
    val planes = Seq(Array(1f, -1f), Array(-1f, 1f))
    val df = Seq(
      (1L, Some(Seq(0.5f, -0.25f))),
      (2L, Some(Seq(0.5f))), // wrong dim
      (3L, None)) // null vector
      .toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val out = df.select(col("id"),
        VectorFunctions.signProjection(col("v"), planes).as("sig"))
      .orderBy("id").collect()
    // dot(v, [1,-1]) = 0.75 >= 0 -> bit 0; dot(v, [-1,1]) = -0.75 -> no bit 1
    assert(out(0).getLong(1) == 1L)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }
}

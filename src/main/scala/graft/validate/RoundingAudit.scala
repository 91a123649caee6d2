package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rounding-boundary distance audit for the "residual rounding class"
  * (BASELINE.md): values that are ROUNDED and then used inside a
  * comparison or a selection (cosine-vs-threshold filters, quantile bin
  * boundaries) cannot be decimal-bridged layer by layer — their
  * cross-engine safety instead rests on every value sitting FAR from a
  * round-half boundary, so that the ≤ last-ulp arithmetic differences
  * between engines (different summation order in a dot product,
  * different interpolation arithmetic in a percentile) can never flip
  * which side of the boundary the value rounds to.
  *
  * This object makes that tolerance MEASURABLE: the distance of each
  * value, scaled by 10^dp, to its nearest x.5 boundary (where HALF_UP
  * and a binary-arithmetic round can disagree). Engine deltas are
  * ≲ 1e-13 in scaled units for O(100)-term double sums; a minimum
  * audited distance ≥ 1e-5 scaled leaves ≥ 8 orders of magnitude of
  * headroom. Specs pin the fixture minimums; the same aggregate can run
  * at any sf dir to re-certify a new scale point (the audit is one scan
  * and one min — corpus-sized data, sketch-sized result).
  */
object RoundingAudit {

  /** Distance of `c · 10^dp` to the nearest half-integer boundary —
    * 0 means "rounds differently under HALF_UP vs binary-multiply
    * rounding with a one-ulp nudge"; 0.5 is the safest possible. */
  def halfBoundaryDistance(c: Column, dp: Int): Column = {
    val scaled = c * pow(lit(10.0), lit(dp))
    abs(scaled - floor(scaled) - lit(0.5))
  }

  /** Minimum half-boundary distance over a column (nulls ignored):
    * the one number that certifies a whole value population. */
  def minHalfBoundaryDistance(df: DataFrame, c: Column, dp: Int): Double =
    df.agg(min(halfBoundaryDistance(c, dp))).head().getDouble(0)

  /** The pre-round pairwise-cosine population of an embedding table —
    * the values whose 6-dp rounds gate q_dedup_embed / q_dedup_semantic
    * and surface in the sim_topk family. All id<id pairs; audit-scale
    * only (the audit is quadratic by construction — it certifies the
    * fixture, not the corpus path). */
  def pairwiseCosines(embeddings: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val withNorm = embeddings.select(col(idCol), col(vecCol),
      graft.operators.Similarity.l2Norm(col(vecCol)).as("_nrm"))
    val a = withNorm.select(col(idCol).as("_ia"), col(vecCol).as("_va"),
      col("_nrm").as("_na"))
    val b = withNorm.select(col(idCol).as("_ib"), col(vecCol).as("_vb"),
      col("_nrm").as("_nb"))
    a.join(b, col("_ia") < col("_ib"))
      .select((graft.operators.Similarity.dot(col("_va"), col("_vb")) /
        (col("_na") * col("_nb"))).as("cos"))
  }
}

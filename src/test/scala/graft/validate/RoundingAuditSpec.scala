package graft.validate

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The residual rounding class (BASELINE.md): rounds nested inside
  * comparisons/selections can't be decimal-bridged, so their
  * cross-engine safety is a MEASURED margin — every pre-round fixture
  * value must sit far enough from a round-half boundary that last-ulp
  * arithmetic differences between engines cannot flip the round. These
  * specs pin the margins on the driver-gate fixtures. Engine deltas for
  * the audited computations are ≲ 1e-7 in scaled (·10^6) units (a
  * 64-term double dot product differs across summation orders by
  * ≲ 1e-13 in value units); the asserted floors sit ≥ 10× above that.
  */
class RoundingAuditSpec extends SparkTestBase {

  test("halfBoundaryDistance: exact half → 0, integer scaled → 0.5") {
    import spark.implicits._
    val df = Seq(0.1234565, 0.123456, 0.9999995).toDF("v")
    val d = df.select(
      RoundingAudit.halfBoundaryDistance(col("v"), 6).as("d"))
      .as[Double].collect()
    assert(d(0) < 1e-6, s"x.xxxxxx5 must measure ~0, got ${d(0)}")
    assert(math.abs(d(1) - 0.5) < 1e-6, s"6-dp-exact must measure ~0.5, got ${d(1)}")
    assert(d(2) < 1e-6)
  }

  test("embed near-dup cosines sit clear of every 6-dp half boundary (sf0.001 + sf0.01)") {
    // the values whose rounds actually SURFACE: pairs at/above the 0.45
    // dedup threshold output round(cos, 6) in q_dedup_embed and feed
    // q_dedup_semantic's edge set, and pairs within a round-width of the
    // threshold decide the filter itself. Pairs far below the threshold
    // never show their round anywhere — auditing them would only measure
    // the birthday-paradox floor of an irrelevant population.
    for (dir <- Seq("sf0.001", "sf0.01")) {
      val emb = spark.read.parquet(s"${sf(dir)}/embeddings.parquet")
      val cosines = RoundingAudit.pairwiseCosines(emb, "vec_id", "embedding")
        .filter(col("cos") >= 0.45 - 1e-6)
      val minD = RoundingAudit.minHalfBoundaryDistance(cosines, col("cos"), 6)
      info(f"$dir min scaled half-boundary distance = $minD%.3e")
      // the threshold comparison itself runs on ROUNDED values in both
      // engines (round(cos,6) >= 0.45), so raw-value proximity to 0.45
      // is harmless — the ONLY flip risk is a raw value inside the
      // engine-delta band around a round-half boundary, which this floor
      // excludes by ≥ 10× (engine deltas ≲ 1e-7 scaled)
      assert(minD >= 1e-6,
        f"$dir: a surfaced cosine sits $minD%.3e from a 6-dp half boundary " +
          "— inside the cross-engine flip range; re-derive the fixture or bridge")
    }
  }

  test("quantileBins quality boundaries sit clear of 6-dp half boundaries") {
    // the three quartile boundaries of q_sample_quality_bins, pre-round:
    // rounded to 6 dp then used in `quality <= boundary` comparisons —
    // the exact shape the bridge cannot reach
    for (dir <- Seq("sf0.001", "sf0.01")) {
      val docs = spark.read.parquet(s"${sf(dir)}/documents.parquet")
      val scores = graft.operators.TextAnalysis
        .qualityScore(docs, "doc_id", "text").select("quality")
      val bounds = scores
        .agg(expr("percentile(quality, array(0.25D, 0.5D, 0.75D))").as("qb"))
        .select(explode(col("qb")).as("b"))
      val minD = RoundingAudit.minHalfBoundaryDistance(bounds, col("b"), 6)
      info(f"$dir min scaled boundary distance = $minD%.3e")
      assert(minD >= 1e-3,
        f"$dir: a quartile boundary sits $minD%.3e from a 6-dp half boundary")
    }
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.operators.RecordLinkage._

class RecordLinkageSpec extends SparkTestBase {
  import spark.implicits._

  private val comps = Seq(
    FsExact("a", "la", "ra", m = 0.9, u = 0.1),
    FsExact("b", "lb", "rb", m = 0.8, u = 0.2))

  test("fsScorePairs: hand-computed weights for agree/disagree/null") {
    val left = Seq((1L, "x", "p", "blk"), (2L, "x", "p", "blk"),
      (3L, "x", null.asInstanceOf[String], "blk")).toDF("lid", "la", "lb", "lk")
    val right = Seq((10L, "x", "p", "blk"), (20L, "y", "q", "blk"))
      .toDF("rid", "ra", "rb", "rk")
    val out = fsScorePairs(left, right, "lid", "rid",
        Seq(("lk", "rk")), comps, lambda = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("match_weight"), r.getAs[Double]("match_probability")))
      .toMap
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    // λ=0.5 → zero prior; both agree: log2(9) + log2(4)
    val wAgree = lg2(0.9 / 0.1) + lg2(0.8 / 0.2)
    assert(math.abs(out((1L, 10L))._1 - wAgree) < 1e-12)
    // both disagree: log2(1/9) + log2(1/4)
    val wDis = lg2(0.1 / 0.9) + lg2(0.2 / 0.8)
    assert(math.abs(out((1L, 20L))._1 - wDis) < 1e-12)
    // null field contributes exactly 0 (row 3 lb is null)
    val wNull = lg2(0.9 / 0.1)
    assert(math.abs(out((3L, 10L))._1 - wNull) < 1e-12)
    // probability is the logistic of the weight in log2 space
    out.values.foreach { case (w, p) =>
      val expP = math.pow(2, w) / (1 + math.pow(2, w))
      assert(math.abs(p - expP) < 1e-12)
    }
    // 3 left × 2 right in one block = 6 pairs at minWeight = -inf
    assert(out.size == 6)
  }

  test("fsScorePairs: minWeight filters on the raw weight; prior shifts it") {
    val left = Seq((1L, "x", "p", "k")).toDF("lid", "la", "lb", "lk")
    val right = Seq((10L, "x", "p", "k")).toDF("rid", "ra", "rb", "rk")
    val w0 = fsScorePairs(left, right, "lid", "rid", Seq(("lk", "rk")),
      comps, lambda = 0.5).collect()(0).getAs[Double]("match_weight")
    val w1 = fsScorePairs(left, right, "lid", "rid", Seq(("lk", "rk")),
      comps, lambda = 0.1).collect()(0).getAs[Double]("match_weight")
    assert(math.abs((w0 - w1) - (math.log(0.5 / 0.5) - math.log(0.1 / 0.9))
      / math.log(2.0)) < 1e-12)
    val kept = fsScorePairs(left, right, "lid", "rid", Seq(("lk", "rk")),
      comps, lambda = 0.5, minWeight = w0 + 0.001).count()
    assert(kept == 0)
  }

  test("fsAgreementVectors: null block keys never pair (SQL equality)") {
    val left = Seq((1L, "x", "p", null.asInstanceOf[String]))
      .toDF("lid", "la", "lb", "lk")
    val right = Seq((10L, "x", "p", null.asInstanceOf[String]))
      .toDF("rid", "ra", "rb", "rk")
    assert(fsAgreementVectors(left, right, "lid", "rid",
      Seq(("lk", "rk")), comps).count() == 0)
  }

  // deterministic md5-derived uniform in [0,1) — the repo-wide
  // content-hash randomness discipline (no Math.random in specs)
  private def u01(idCol: org.apache.spark.sql.Column, salt: String) =
    conv(substring(md5(concat(lit(salt), idCol.cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0

  test("fsEmEstimate recovers planted parameters from agreement vectors") {
    val trueLambda = 0.15
    val mTrue = Seq(0.95, 0.9, 0.8)
    val uTrue = Seq(0.05, 0.1, 0.2)
    val ids = spark.range(0, 60000).select(col("id"))
    val isMatch = u01(col("id"), "match") < trueLambda
    val gs = mTrue.indices.map { i =>
      val coin = u01(col("id"), s"f$i")
      // ~4% of field-0 observations are missing (null-handling path)
      val g = when(isMatch, coin < mTrue(i)).otherwise(coin < uTrue(i))
        .cast("int")
      (if (i == 0) when(u01(col("id"), "null0") < 0.04, lit(null)).otherwise(g)
       else g).as(s"g_f$i")
    }
    val gammas = ids.select(gs: _*)
    val emComps = mTrue.indices.map(i =>
      FsExact(s"f$i", s"l$i", s"r$i", m = 0.9, u = 0.15))
    val fit = fsEmEstimate(gammas, emComps, lambda0 = 0.3,
      maxIterations = 60, tol = 1e-8)
    assert(math.abs(fit.lambda - trueLambda) < 0.02,
      s"lambda ${fit.lambda} vs $trueLambda")
    mTrue.indices.foreach { i =>
      assert(math.abs(fit.m(s"f$i") - mTrue(i)) < 0.03,
        s"m$i ${fit.m(s"f$i")} vs ${mTrue(i)}")
      assert(math.abs(fit.u(s"f$i") - uTrue(i)) < 0.03,
        s"u$i ${fit.u(s"f$i")} vs ${uTrue(i)}")
    }
    // EM monotonicity: more iterations never decrease the likelihood
    val early = fsEmEstimate(gammas, emComps, lambda0 = 0.3,
      maxIterations = 3, tol = 0.0)
    assert(fit.logLikelihood >= early.logLikelihood - 1e-6)
    // withParams rebinds every comparison to the fitted values
    val rebound = withParams(emComps, fit)
    assert(rebound.map(_.m) == mTrue.indices.map(i => fit.m(s"f$i")))
    assert(rebound.map(_.u) == mTrue.indices.map(i => fit.u(s"f$i")))
  }

  test("guarded scoring: hot blocking key refused and re-blocked, uniform scored directly (r8)") {
    // hot fixture: 2000×2000 rows share ONE surname block ("smith") —
    // the classic ER blow-up (4M pairs); each row also carries a finer
    // (surname, zip) key with ~200 rows per block (~2000·200 pairs
    // via 20 zips... actually 2000/20=100 per zip → 100·100·20 = 200k)
    val hotL = (1L to 2000L).map(i => (i, "smith", s"z${i % 20}", s"fn$i"))
      .toDF("lid", "la", "lzip", "lname")
    val hotR = (1L to 2000L).map(i => (i + 10000L, "smith", s"z${i % 20}", s"fn$i"))
      .toDF("rid", "ra", "rzip", "rname")
    val cmp = Seq(FsExact("name", "lname", "rname", m = 0.9, u = 0.01))
    val (decisions, scored) = fsScorePairsGuarded(
      hotL, hotR, "lid", "rid",
      blockOn = Seq(("la", "ra")), comparisons = cmp,
      maxPairs = 1000000L,
      fallbackBlockOn = Seq(Seq(("la", "ra"), ("lzip", "rzip"))))
    // primary estimated ≥ true 4M (over-estimate only) and refused
    assert(decisions.head.blockOn == Seq(("la", "ra")))
    assert(!decisions.head.accepted && decisions.head.estPairs >= 4000000L,
      s"hot block must be refused: ${decisions.head}")
    // fallback accepted and actually scored: pair count = Σ_zip 100·100
    assert(decisions(1).accepted && decisions(1).estPairs >= 200000L,
      s"finer blocking must be accepted: ${decisions(1)}")
    assert(scored.count() == 200000L)
    // uniform fixture: distinct keys → primary accepted first try
    val uniL = (1L to 500L).map(i => (i, s"k$i", s"fn$i")).toDF("lid", "la", "lname")
    val uniR = (1L to 500L).map(i => (i + 9000L, s"k$i", s"fn$i")).toDF("rid", "ra", "rname")
    val (uniDec, uniScored) = fsScorePairsGuarded(uniL, uniR, "lid", "rid",
      Seq(("la", "ra")), cmp, maxPairs = 10000L)
    assert(uniDec.size == 1 && uniDec.head.accepted)
    assert(uniScored.count() == 500L)
    // every candidate refused → loud refusal, never an |L|·|R| launch
    val err = intercept[IllegalArgumentException] {
      fsScorePairsGuarded(hotL, hotR, "lid", "rid",
        Seq(("la", "ra")), cmp, maxPairs = 10L)
    }
    assert(err.getMessage.contains("finer blocking"), err.getMessage)
  }

  test("blockingPairsEstimate: over-estimates only, exact on clean buckets, null blocks excluded (r8)") {
    val l = Seq((1L, "a", "x"), (2L, "a", "x"), (3L, "b", "x"),
      (4L, null.asInstanceOf[String], "x")).toDF("lid", "lk", "lv")
    val r = Seq((10L, "a", "x"), (11L, "b", "x"), (12L, "b", "x"),
      (13L, null.asInstanceOf[String], "x")).toDF("rid", "rk", "rv")
    // true pairs: a: 2·1 + b: 1·2 = 4; nulls never pair
    val est = blockingPairsEstimate(l, r, Seq(("lk", "rk")))
    assert(est >= 4L, s"sketch must never under-estimate: $est")
    val truth = fsAgreementVectors(l, r, "lid", "rid", Seq(("lk", "rk")),
      Seq(FsExact("v", "lv", "rv", 0.9, 0.1))).count()
    assert(truth == 4L)
    // tiny key space, wide sketch → collision-free, exact
    assert(est == 4L, s"clean buckets should be exact: $est")
  }

  test("FsJaroWinkler / FsLevenshtein agreement semantics") {
    val left = Seq((1L, "Customer#000000021", "k"))
      .toDF("lid", "la", "lk")
    val right = Seq((10L, "Customer#0000X0021", "k"),
      (20L, "120000000#remotsuC", "k")).toDF("rid", "ra", "rk")
    val jw = fsAgreementVectors(left, right, "lid", "rid", Seq(("lk", "rk")),
        Seq(FsJaroWinkler("n", "la", "ra", 0.95, 0.9, 0.1)))
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(jw(10L) == 1 && jw(20L) == 0)
    val lev = fsAgreementVectors(left, right, "lid", "rid", Seq(("lk", "rk")),
        Seq(FsLevenshtein("n", "la", "ra", maxDist = 1, 0.9, 0.1)))
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(lev(10L) == 1 && lev(20L) == 0)
  }
}

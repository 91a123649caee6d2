package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.JaroWinkler

/** Probabilistic record linkage — the Fellegi–Sunter model (EXTENSION,
  * SURVEY.md §2.K; the scoring layer the blocked fuzzy joins feed).
  * Splink-class functionality re-expressed Spark-first.
  *
  * Each candidate pair (produced by equality blocking) is compared on k
  * fields; field i has match probability m_i = P(agree | same entity)
  * and non-match probability u_i = P(agree | different entities). The
  * pair's match weight is the log₂ Bayes factor
  *
  *   w = log₂(λ/(1−λ)) + Σ_i [ γ_i · log₂(m_i/u_i)
  *                           + (1−γ_i) · log₂((1−m_i)/(1−u_i)) ]
  *
  * where γ_i is the field-i agreement indicator and λ the match prior;
  * P(match | γ) = 2^w / (1 + 2^w). A NULL field (either side) is
  * non-informative and contributes 0 — the standard FS treatment.
  *
  * Scale shape: ONE equi-join on the blocking key (both sides shuffle
  * on it once — skew on a hot block is the q_profile_skew / SkewJoin
  * story), every comparison and the weight sum codegen'd map-side
  * (log₂ constants are computed once on the driver and ride as
  * literals), and the weight threshold filters before anything wide.
  * Never |L|·|R|; never a driver loop over pairs.
  *
  * Parameter estimation ([[fsEmEstimate]]) is the unsupervised EM of
  * Winkler (1988): the E-step responsibility is a map-side expression
  * over the persisted agreement vectors with current params as
  * broadcast literals, the M-step is ONE aggregation row collected to
  * the driver — k·4+2 doubles per iteration, independent of pair
  * count. At 100 TB estimate on a deterministic md5 sample of pairs
  * (the repo-wide content-hash sampling discipline) and score the full
  * set with the fitted constants.
  */
object RecordLinkage {

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  /** One field comparison in the model. `agree` must be null-safe in
    * the FS sense: return NULL when either side is NULL (the field then
    * contributes no evidence), true/false otherwise. */
  sealed trait FsComparison {
    def name: String
    def m: Double
    def u: Double
    require(m > 0 && m < 1 && u > 0 && u < 1, s"$name: m/u must be in (0,1)")
    private[operators] def agree(l: Column, r: Column): Column
    def leftCol: String
    def rightCol: String
    /** log₂ Bayes factor when the field agrees. */
    final def agreeWeight: Double = log2(m / u)
    /** log₂ Bayes factor when the field disagrees (negative). */
    final def disagreeWeight: Double = log2((1 - m) / (1 - u))
  }

  /** Exact equality (after whatever normalization the caller baked into
    * the column). */
  final case class FsExact(name: String, leftCol: String, rightCol: String,
      m: Double, u: Double) extends FsComparison {
    private[operators] def agree(l: Column, r: Column): Column =
      when(l.isNull || r.isNull, lit(null)).otherwise(l === r)
  }

  /** Jaro–Winkler similarity at a threshold — the classic name matcher
    * (graft.functions.JaroWinkler is bit-compatible with DuckDB's
    * jaro_winkler_similarity, so oracle replays are exact). */
  final case class FsJaroWinkler(name: String, leftCol: String,
      rightCol: String, minSim: Double, m: Double, u: Double)
      extends FsComparison {
    private[operators] def agree(l: Column, r: Column): Column =
      when(l.isNull || r.isNull, lit(null))
        .otherwise(JaroWinkler.jaroWinklerCol(l, r) >= minSim)
  }

  /** Levenshtein distance at a cap (Spark's codegen'd `levenshtein`;
    * DuckDB's `levenshtein` computes the same classic distance). */
  final case class FsLevenshtein(name: String, leftCol: String,
      rightCol: String, maxDist: Int, m: Double, u: Double)
      extends FsComparison {
    private[operators] def agree(l: Column, r: Column): Column =
      when(l.isNull || r.isNull, lit(null))
        .otherwise(levenshtein(l, r) <= maxDist)
  }

  /** Blocked candidate pairs with per-field agreement indicators.
    * Output: (id_l, id_r, g_<name>... Int 1/0/null). Block keys join by
    * EQUALITY (null block keys never match, as in SQL). Rows are unique
    * per (id_l, id_r) only if the blocking keys are — pass distinct
    * blocks or dedup downstream if a pair can meet in two blocks. */
  def fsAgreementVectors(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      blockOn: Seq[(String, String)],
      comparisons: Seq[FsComparison]): DataFrame = {
    require(blockOn.nonEmpty, "blocking keys required — unblocked FS is |L|·|R|")
    val l = left.alias("l")
    val r = right.alias("r")
    val cond = blockOn.map { case (lb, rb) => col(s"l.$lb") === col(s"r.$rb") }
      .reduce(_ && _)
    val gammas = comparisons.map { c =>
      c.agree(col(s"l.${c.leftCol}"), col(s"r.${c.rightCol}"))
        .cast("int").as(s"g_${c.name}")
    }
    l.join(r, cond, "inner")
      .select(Seq(col(s"l.$leftId").as("id_l"), col(s"r.$rightId").as("id_r"))
        ++ gammas: _*)
  }

  /** Score blocked pairs under the FS model: match weight (log₂ Bayes
    * factor including the λ prior) and posterior match probability.
    * Keeps pairs with weight ≥ `minWeight`. All log₂ constants are
    * driver-computed literals, so the per-pair cost is a codegen'd
    * conditional sum. */
  def fsScorePairs(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      blockOn: Seq[(String, String)],
      comparisons: Seq[FsComparison],
      lambda: Double = 0.5,
      minWeight: Double = Double.NegativeInfinity): DataFrame = {
    require(lambda > 0 && lambda < 1, "lambda must be in (0,1)")
    val g = fsAgreementVectors(left, right, leftId, rightId, blockOn, comparisons)
    val prior = log2(lambda / (1 - lambda))
    // fixed fold order (prior, then fields in caller order) so the
    // float sum is reproducible across engines replaying the same order
    val weight = comparisons.foldLeft(lit(prior)) { (acc, c) =>
      acc + when(col(s"g_${c.name}").isNull, lit(0.0))
        .when(col(s"g_${c.name}") === 1, lit(c.agreeWeight))
        .otherwise(lit(c.disagreeWeight))
    }
    g.withColumn("match_weight", weight)
      .filter(col("match_weight") >= minWeight)
      .withColumn("match_probability",
        pow(lit(2.0), col("match_weight"))
          / (pow(lit(2.0), col("match_weight")) + lit(1.0)))
  }

  /** Outcome of the pre-blocking size check: the sketch-estimated pair
    * count for a candidate blocking, the bound it was judged against,
    * and whether it was accepted. */
  final case class BlockingDecision(blockOn: Seq[(String, String)],
      estPairs: Long, maxPairs: Long, accepted: Boolean)

  /** Sketch-estimate the blocked-pair count for `blockOn` WITHOUT
    * materializing a single pair: two count–min grids over the combined
    * blocking key (one map-side scan per side, O(depth·width) state) and
    * the [[Profiling.cmsJoinSizeEstimate]] inner product. Over-estimates
    * only (bucket collisions add non-negative cross terms), so an
    * accepted blocking really is within the bound. Rows with a NULL in
    * any blocking column match nothing in [[fsAgreementVectors]] and are
    * excluded from the sketch the same way. */
  def blockingPairsEstimate(left: DataFrame, right: DataFrame,
      blockOn: Seq[(String, String)], depth: Int = 4,
      width: Int = 1024): Long = {
    require(blockOn.nonEmpty, "blocking keys required")
    def key(side: DataFrame, pick: ((String, String)) => String): Column =
      when(blockOn.map(b => col(pick(b)).isNull).reduce(_ || _), lit(null))
        .otherwise(concat_ws("\u0001",
          blockOn.map(b => col(pick(b)).cast("string")): _*))
    val cL = Profiling.cmsCounters(left, key(left, _._1), depth, width)
    val cR = Profiling.cmsCounters(right, key(right, _._2), depth, width)
    Profiling.cmsJoinSizeEstimate(cL, cR).head(1) match {
      case Array(row) if !row.isNullAt(0) => row.getLong(0)
      case _ => 0L // no shared buckets — the join is provably empty
    }
  }

  /** [[fsScorePairs]] behind a size guard — the [[SkewJoin.decide]]
    * profile-then-decide discipline composed with the count–min join-size
    * estimator: a skewed blocking key (everyone blocked on "smith", a
    * default country code...) is the classic ER blow-up, and the
    * estimate answers "will this blocking explode?" for O(depth·width)
    * state BEFORE any pair materializes. The primary blocking is scored
    * only if its estimated pair count is ≤ `maxPairs`; past the bound,
    * each `fallbackBlockOn` candidate (typically finer keys — more
    * columns, a added prefix) is estimated in order and the first
    * acceptable one scores instead; if none fits, the call REFUSES with
    * the estimates in the message rather than launching an |L|·|R|-class
    * join. Returns the decision trail alongside the scored pairs so
    * pipelines can log which blocking actually ran. */
  def fsScorePairsGuarded(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      blockOn: Seq[(String, String)],
      comparisons: Seq[FsComparison],
      maxPairs: Long,
      fallbackBlockOn: Seq[Seq[(String, String)]] = Nil,
      lambda: Double = 0.5,
      minWeight: Double = Double.NegativeInfinity,
      depth: Int = 4, width: Int = 1024): (Seq[BlockingDecision], DataFrame) = {
    require(maxPairs > 0, s"maxPairs must be positive, got $maxPairs")
    val decisions = scala.collection.mutable.ArrayBuffer.empty[BlockingDecision]
    (blockOn +: fallbackBlockOn).foreach { candidate =>
      if (!decisions.exists(_.accepted)) {
        val est = blockingPairsEstimate(left, right, candidate, depth, width)
        decisions += BlockingDecision(candidate, est, maxPairs, est <= maxPairs)
      }
    }
    decisions.find(_.accepted) match {
      case Some(d) =>
        (decisions.toSeq, fsScorePairs(left, right, leftId, rightId,
          d.blockOn, comparisons, lambda, minWeight))
      case None => throw new IllegalArgumentException(
        "fsScorePairsGuarded: every candidate blocking exceeds maxPairs=" +
          s"$maxPairs — ${decisions.map(d => s"${d.blockOn.map(_._1).mkString("+")}≈${d.estPairs}")
            .mkString(", ")}; supply a finer blocking (more columns, key " +
          "prefixes) instead of launching the pair join")
    }
  }

  /** Fitted FS parameters. `m`/`u` are keyed by comparison name. */
  final case class FsParams(lambda: Double, m: Map[String, Double],
      u: Map[String, Double], iterations: Int, logLikelihood: Double)

  /** Unsupervised EM estimation of (λ, m_i, u_i) from agreement vectors
    * (the [[fsAgreementVectors]] output, or any frame with g_<name>
    * Int 1/0/null columns). Per iteration: the E-step responsibility
    *   r = λ·Π p(γ_i|M) / (λ·Π p(γ_i|M) + (1−λ)·Π p(γ_i|U))
    * is ONE map-side expression (null γ → factor 1 on both sides), and
    * the M-step collects a single aggregation row:
    *   λ' = mean(r);  m_i' = Σ_{γ_i≠null} r·γ_i / Σ_{γ_i≠null} r
    *   (u_i' analogous with 1−r). Parameters clamp to [1e-6, 1−1e-6].
    * Converges when max |Δparam| < tol. The input is persisted for the
    * iteration loop and unpersisted before returning. */
  def fsEmEstimate(gammas: DataFrame, comparisons: Seq[FsComparison],
      lambda0: Double = 0.1, maxIterations: Int = 50,
      tol: Double = 1e-6): FsParams = {
    val names = comparisons.map(_.name)
    val cached = gammas.persist()
    try {
      var lambda = lambda0
      var m = names.map(n => n -> comparisons.find(_.name == n).get.m).toMap
      var u = names.map(n => n -> comparisons.find(_.name == n).get.u).toMap
      var iter = 0
      var delta = Double.MaxValue
      var ll = 0.0
      while (iter < maxIterations && delta > tol) {
        // E-step responsibility as a literal-parameterized expression
        val pM = names.map { n =>
          val gc = col(s"g_$n")
          when(gc.isNull, lit(1.0)).when(gc === 1, lit(m(n)))
            .otherwise(lit(1.0 - m(n)))
        }.reduce(_ * _) * lit(lambda)
        val pU = names.map { n =>
          val gc = col(s"g_$n")
          when(gc.isNull, lit(1.0)).when(gc === 1, lit(u(n)))
            .otherwise(lit(1.0 - u(n)))
        }.reduce(_ * _) * lit(1.0 - lambda)
        val r = pM / (pM + pU)
        val aggs = Seq(count(lit(1)).as("n"), sum(r).as("sr"),
            sum(log(pM + pU)).as("ll")) ++
          names.flatMap { n =>
            val gc = col(s"g_$n")
            Seq(
              sum(when(gc.isNotNull, r)).as(s"rm_den_$n"),
              sum(when(gc === 1, r)).as(s"rm_num_$n"),
              sum(when(gc.isNotNull, lit(1.0) - r)).as(s"ru_den_$n"),
              sum(when(gc === 1, lit(1.0) - r)).as(s"ru_num_$n"))
          }
        val row = cached.agg(aggs.head, aggs.tail: _*).collect()(0)
        val n = row.getAs[Long]("n").toDouble
        require(n > 0, "fsEmEstimate: empty pair frame")
        def clamp(x: Double) = math.min(1 - 1e-6, math.max(1e-6, x))
        val lambdaN = clamp(row.getAs[Double]("sr") / n)
        val mN = names.map { nm =>
          val den = row.getAs[Double](s"rm_den_$nm")
          nm -> (if (den > 0) clamp(row.getAs[Double](s"rm_num_$nm") / den)
                 else m(nm))
        }.toMap
        val uN = names.map { nm =>
          val den = row.getAs[Double](s"ru_den_$nm")
          nm -> (if (den > 0) clamp(row.getAs[Double](s"ru_num_$nm") / den)
                 else u(nm))
        }.toMap
        ll = row.getAs[Double]("ll")
        delta = (math.abs(lambdaN - lambda) +:
          names.map(nm => math.max(math.abs(mN(nm) - m(nm)),
            math.abs(uN(nm) - u(nm))))).max
        lambda = lambdaN; m = mN; u = uN; iter += 1
      }
      FsParams(lambda, m, u, iter, ll)
    } finally { cached.unpersist() }
  }

  /** Rebind comparisons to EM-fitted parameters (same comparison logic,
    * new m/u), for a fit-then-score pipeline. */
  def withParams(comparisons: Seq[FsComparison], params: FsParams): Seq[FsComparison] =
    comparisons.map {
      case c: FsExact => c.copy(m = params.m(c.name), u = params.u(c.name))
      case c: FsJaroWinkler => c.copy(m = params.m(c.name), u = params.u(c.name))
      case c: FsLevenshtein => c.copy(m = params.m(c.name), u = params.u(c.name))
    }
}

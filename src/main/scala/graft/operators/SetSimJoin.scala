package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join: every document pair whose token-set
  * Jaccard meets a threshold, WITHOUT the all-pairs comparison and
  * WITHOUT the approximation of MinHash banding ([[Dedup.minHashBands]]
  * trades recall for speed; this operator is exact in both directions).
  *
  * EXTENSION operator (SURVEY §2.K): the reference's dedup surface is
  * hash-exact only; this closes the "exact near-dup join" gap between
  * [[Dedup.exactDedup]] and the probabilistic MinHash family.
  *
  * THREE exact strategies — plus a SIZE-STRATIFIED hybrid of the first
  * two (r11) — chosen by a profile-then-decide probe (the
  * [[SkewJoin.advise]] discipline applied to candidate generation),
  * because each degenerates exactly where another shines. The hybrid
  * exists because one tiny doc used to veto partitioning (D ≤ szMin)
  * and push a hot-token corpus onto the degenerate prefix path: the
  * size-ratio bound (J ≥ t ⟹ |small| ≥ ceil(t·|large|)) confines every
  * pair touching the sub-D stratum to a narrow band, so partitioning
  * over sz ≥ D plus deletion over the band (worst-case budget ≤ 1 by
  * construction, or the hybrid is not chosen) with the overlap deduped
  * by size is the complete exact answer:
  *
  *   - [[jaccardJoinDeletion]] (FastSS deletion neighborhoods — the
  *     [[FuzzyJoin]] edit-distance discipline lifted to sets): at high
  *     thresholds each side of a qualifying pair misses at most
  *     k = sz − ceil(t·sz) tokens of the intersection, so hashing every
  *     drop-≤k subset of each doc's sorted token array and equi-joining
  *     on the hash finds EXACTLY the near-dup candidates — candidate
  *     volume tracks the true output, never token frequencies. Data
  *     amplification is Σ_{j≤k} C(sz, j) per doc, so this path is gated
  *     to kMax ≤ 1 (amplification sz+1) where it is unbeatable — and
  *     crucially it is IMMUNE to hot tokens (a stop-word-dense corpus
  *     with a tiny vocabulary breaks any token-blocked join; measured:
  *     the sf0.1 documents fixture has a 31-token vocabulary and the
  *     prefix path produced 13.4 M candidates for a ~200 k-pair answer,
  *     49 s — the deletion path generates candidates only where near-dup
  *     structure exists).
  *   - [[jaccardJoinPartition]] (universe partitioning, Deng et al.
  *     PVLDB 2016): the mid-threshold regime — k ≥ 2 so deletion
  *     explodes combinatorially, but Δmax (the largest symmetric
  *     difference a qualifying pair can have) is still small. The
  *     VOCABULARY is hashed into D = Δmax+1 groups; a qualifying pair's
  *     ≤ Δmax differing tokens leave at least one group diff-free, so
  *     the pair shares that group's exact projection — amplification is
  *     a fixed D rows/doc, candidates track near-dup structure, and hot
  *     tokens cannot explode the join (measured: 250 k GenData docs over
  *     a 401-token vocabulary — prefix ground past 20 min; partition
  *     finishes in seconds). Gated to D ≤ szMin so per-group projections
  *     stay occupied (docs smaller than D have guaranteed-empty groups,
  *     which match universally — the scheme's degenerate stratum).
  *   - [[jaccardJoinPrefix]] (AllPairs/PPJoin prefix filtering, Bayardo
  *     et al. WWW 2007; Xiao et al. WWW 2008): at lower thresholds k
  *     grows and deletion neighborhoods explode combinatorially, while
  *     the prefix bound stays linear in sz: tokens sorted by a RARE-FIRST
  *     global order (df asc, tok asc), each doc keeps the prefix of
  *     length sz − ceil(t·sz) + 1, and the pigeonhole argument makes the
  *     prefix equi-join lossless: a qualifying pair (overlap ≥
  *     ceil(t·max(|a|,|b|))) sharing NO prefix token could overlap at
  *     most ceil(t·sz) − 1 tokens — contradiction.
  *
  * All paths verify candidates EXACTLY (array_intersect of the full
  * token arrays) with the threshold gate in CLEARED-DENOMINATOR integers
  * (ix·tDen ≥ tNum·(|a|+|b|−ix)) — no float rounding can flip a boundary
  * pair (the q_tpch17 discipline), and all prefix/deletion/partition
  * arithmetic is integral (ceil via `div` — a double divide rounds past
  * 2^53 and would silently LOSE pairs). Verified: SetSimJoinSpec
  * falsifies EVERY strategy against [[jaccardJoinBrute]] (corpus + an
  * adversarial exact-boundary fixture whose shared tokens are the most
  * frequent), and the registered q_join_setsim's DuckDB oracle replays
  * brute force at 19/20 — the gate itself certifies no-loss every round.
  *
  * 100 TB story: every stage is a keyed shuffle (tokenize, df count /
  * signature explode, candidate equi-join, verify join-back) — no pair
  * materialization beyond candidates, no broadcast of anything
  * corpus-sized. The threshold is a rational (tNum/tDen), never a
  * double, so the strategy gate, the prefix length and the verify gate
  * are exact at any scale.
  */
object SetSimJoin {

  /** Whitespace token set, lowercased, empties dropped — mirrors the
    * [[Dedup]] tokenizer and the DuckDB
    * `string_split_regex(lower(text), '\s+')` oracle replay. */
  private def tokenSet(textCol: Column): Column =
    array_distinct(filter(split(lower(textCol), "\\s+"), t => t =!= ""))

  /** ceil(sz·tNum/tDen) in exact integers (sz a LongType column). */
  private def ceilMul(sz: String, tNum: Int, tDen: Int): Column =
    expr(s"($sz * $tNum + ${tDen - 1}) div $tDen")

  /** (doc_id, toks sorted lexicographically, sz) — the shared base of
    * both strategies and the verify stage. Lexicographic order is
    * enough everywhere except the prefix path, which re-sorts by df. */
  private def tokenFrames(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    // widen the tokenize (r12, [[Parallelism.widen]]): the sort+distinct
    // per row dwarfs the scan bytes, and a single-row-group corpus file
    // pins the stage to one task (measured 2.3 s single-task at sf0.1)
    Parallelism.widen(docs, col(idCol))
      .select(col(idCol).as("doc_id"), tokenSet(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), array_sort(col("toks")).as("toks"),
        size(col("toks")).cast("long").as("sz"))

  /** Exact verification of candidate (id_a, id_b) pairs + the output
    * projection shared by every strategy: join the full token arrays
    * back (the sets frame is doc-count-sized — far smaller than the
    * candidate set — so Catalyst broadcasts it while it fits),
    * intersect, gate in integers, emit the 6-dp similarity. */
  private def verifyPairs(cand: DataFrame, sets: DataFrame,
      tNum: Int, tDen: Int): DataFrame = {
    val ix = size(array_intersect(col("ta"), col("tb"))).cast("long")
    // pin the verify stage's parallelism (guide §2.5 "synthetic keys" /
    // §1.2 per-task work): the candidate frame is BYTES-tiny (two ids a
    // row) but each row pays two array_intersect evaluations, so AQE's
    // byte-based coalescing squeezes the verify into a handful of tasks
    // (measured at sf0.1: 2-6 tasks on 32 cores, the stage 3-5 s).
    // A REPARTITION_BY_NUM exchange on id_a (the next join's key) costs
    // a candidate-count-sized shuffle of id pairs and holds the session's
    // configured reducer count — scale-adaptive: the cluster sets
    // spark.sql.shuffle.partitions; at real sizes AQE would not have
    // coalesced anyway, and both join-backs below broadcast `sets`, so
    // no downstream exchange is added.
    val n = Parallelism.sessionShufflePartitions(cand.sparkSession)
    cand.repartition(n, col("id_a"))
      .join(sets.select(col("doc_id").as("id_a"), col("toks").as("ta"),
        col("sz").as("sz_a")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("toks").as("tb"),
        col("sz").as("sz_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), ix.as("ix"), col("sz_a"), col("sz_b"))
      // exact integer gate — never a float comparison
      .filter(col("ix") * tDen >= lit(tNum.toLong) *
        (col("sz_a") + col("sz_b") - col("ix")))
      .select(col("id_a"), col("id_b"), col("ix"), col("sz_a"), col("sz_b"),
        round(col("ix").cast("double") /
          (col("sz_a") + col("sz_b") - col("ix")), 6).as("jaccard"))
  }

  /** All pairs (id_a < id_b) with token-set Jaccard ≥ tNum/tDen, with
    * the exact similarity. Output: (id_a, id_b, ix, sz_a, sz_b,
    * jaccard = round(ix/(sz_a+sz_b−ix), 6)).
    *
    * Strategy dispatch from ONE metadata-sized aggregate (kMax, szMax,
    * szMin): kMax ≤ 1 → deletion neighborhoods; else D = Δmax+1 ≤ szMin
    * → universe partitioning; else prefix filtering. Each choice is the
    * regime where the other two degenerate (see object doc). */
  def jaccardJoin(docs: DataFrame, idCol: String, textCol: String,
      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be a rational in (0,1]: $tNum/$tDen")
    // pin the tokenized frame ONCE: the profile aggregate, the chosen
    // strategy's signature stage and verifyPairs' two join-backs all
    // consume it — unpinned, each reference would re-run the full
    // tokenize scan (4 corpus parses per call)
    val sets = tokenFrames(docs, idCol, textCol).localCheckpoint()
    val p = profileFrom(sets, tNum, tDen)
    p.strategy match {
      case "deletion" => jaccardJoinDeletionFrom(sets, tNum, tDen)
      case "partition" =>
        jaccardJoinPartitionFrom(sets, tNum, tDen, p.d, p.szMax)
      case "stratified" =>
        // size-stratified hybrid (see profileFrom): partitioning over
        // the main stratum (sz ≥ D), deletion over the small band, and
        // pairs with BOTH sides ≥ D dropped from the band term (the
        // overlap both joins find — kept from the partition term)
        jaccardJoinPartitionFrom(
            sets.filter(col("sz") >= p.d), tNum, tDen, p.d, p.szMax)
          .unionByName(
            jaccardJoinDeletionFrom(
                sets.filter(col("sz") <= p.bandBound), tNum, tDen)
              .filter(col("sz_a") < p.d || col("sz_b") < p.d))
      case _ => jaccardJoinPrefixFrom(sets, tNum, tDen)
    }
  }

  /** The profile [[jaccardJoin]] dispatches on, plus the chosen strategy
    * name ("deletion" | "partition" | "stratified" | "prefix"). The
    * dispatch is data-dependent, so a registered query certifying one
    * strategy can silently start certifying another if the fixture
    * drifts — [[dispatchProfile]] exposes the decision so specs PIN
    * which strategy each registered gate actually runs
    * (SetSimJoinSpec). `bandBound` = ⌊(d−1)·tDen/tNum⌋, the largest
    * size a doc can have and still pair with a sub-D doc (size-ratio
    * bound: J ≥ t forces |small| ≥ ceil(t·|large|)). */
  final case class DispatchProfile(kMax: Long, szMax: Long, szMin: Long,
      d: Int, bandBound: Long, strategy: String)

  /** Compute the dispatch decision for a corpus + threshold WITHOUT
    * running the join — same tokenizer, same aggregate, same rules as
    * [[jaccardJoin]] (both call [[profileFrom]]). */
  def dispatchProfile(docs: DataFrame, idCol: String, textCol: String,
      tNum: Int, tDen: Int): DispatchProfile =
    profileFrom(tokenFrames(docs, idCol, textCol), tNum, tDen)

  private def profileFrom(sets: DataFrame,
      tNum: Int, tDen: Int): DispatchProfile = {
    // profile-then-decide: one cheap aggregate over the token-set frame
    // (docs-count rows; at 100 TB a column-pruned scan + a 1-row agg)
    val prof = sets.agg(
      max(col("sz") - ceilMul("sz", tNum, tDen)).as("kMax"),
      max(col("sz")).as("szMax"), min(col("sz")).as("szMin")).head()
    // empty corpus (no docs, or all-whitespace text): null aggregates —
    // any strategy returns the correct empty frame; pick prefix (lazy)
    if (prof.isNullAt(0)) return DispatchProfile(0L, 0L, 0L, 1, 0L, "prefix")
    val (kMax, szMax, szMin) =
      (prof.getLong(0), prof.getLong(1), prof.getLong(2))
    // universe-partition group count: a qualifying pair's symmetric
    // difference is Δ ≤ (1−t)(|a|+|b|)/(1+t) ≤ 2·szMax·(tDen−tNum)/
    // (tDen+tNum); D = ⌊Δmax⌋+1 groups pigeonhole one group diff-free
    val d = (2L * szMax * (tDen - tNum) / (tDen + tNum)).toInt + 1
    // band bound: a doc with sz < D can only qualify against docs of
    // size ≤ ⌊(D−1)·tDen/tNum⌋ (Jaccard ≥ t forces the size ratio ≥ t),
    // so ALL pairs touching the sub-D stratum live inside this band
    val bandBound = (d - 1).toLong * tDen / tNum
    // analytic worst-case deletion budget inside the band (k monotone
    // in sz): if ≤ 1, deletion covers the whole band exactly
    val kBand = bandBound - (bandBound * tNum + tDen - 1) / tDen
    val strategy =
      if (kMax <= 1L) "deletion"
      // D ≤ szMin keeps expected per-group projections non-empty (docs
      // smaller than D have guaranteed-empty groups, and empty matches
      // empty universally — the scheme's degenerate stratum)
      else if (d <= szMin) "partition"
      // SIZE-STRATIFIED hybrid: one tiny doc must not force the whole
      // corpus onto the prefix path (on a hot-token corpus the prefix
      // join degenerates — the 20-minute GenData grind). Partitioning
      // stays exact over the sz ≥ D stratum; every pair touching the
      // sub-D stratum lives in the band, and when the band's worst-case
      // deletion budget is ≤ 1 the deletion join covers it exactly —
      // the union (overlap deduped by size) is the full answer.
      else if (kBand <= 1L) "stratified"
      else "prefix"
    DispatchProfile(kMax, szMax, szMin, d, bandBound, strategy)
  }

  /** Universe-partitioning strategy (exact; Deng et al., PVLDB 2016):
    * the VOCABULARY is hashed into D = Δmax+1 groups; each doc emits,
    * per group, a 64-bit hash of its sorted projection onto that group.
    * A qualifying pair has ≤ Δmax differing tokens, which occupy at most
    * Δmax < D groups — so at least one group holds NO difference and the
    * two projections there are identical (same tokens, same sorted
    * order). The equi-join on (group, projection-hash) therefore finds
    * every qualifying pair; exact verification prunes the rest.
    *
    * This is the mid-threshold answer where BOTH other strategies
    * degenerate: deletion neighborhoods explode combinatorially at
    * k ≥ 2, and the prefix filter explodes when every token is frequent
    * (a 250 k-doc corpus over a 401-token vocabulary produced
    * candidates ≈ 700 M under prefix; projections agree only where
    * near-dup structure exists, so the partition join's candidates
    * track the answer). Data amplification is exactly D rows per doc —
    * fixed, never combinatorial. */
  private[operators] def jaccardJoinPartition(docs: DataFrame, idCol: String,
      textCol: String, tNum: Int, tDen: Int, d: Int,
      hotCluster: Long = HotCluster): DataFrame =
    jaccardJoinPartitionFrom(tokenFrames(docs, idCol, textCol), tNum, tDen, d,
      hotCluster = hotCluster)

  private def jaccardJoinPartitionFrom(sets: DataFrame,
      tNum: Int, tDen: Int, d: Int, szMaxHint: Long = -1L,
      hotCluster: Long = HotCluster): DataFrame = {
    require(d >= 1, s"universe partitioning needs >= 1 group, got $d")
    val n = Parallelism.sessionShufflePartitions(sets.sparkSession)
    // SIZE-BANDED join key (r11): with a small vocabulary, equal
    // per-group projections are common across docs of very different
    // sizes, and candidates per (group, sig) key grow ~n²/keys — the
    // measured 4.8×-at-2×-data bend at 1 M docs. The size constraint
    // (J ≥ t ⟹ sides within ratio t ⟹ gap ≤ (1−t)·szMax < W) moves
    // from a post-join filter INTO the equi-key: bands of width
    // W = ⌊szMax·(tDen−tNum)/tDen⌋+1; each doc emits its band and
    // band+1, so the (≤ W−1)-apart sides of any qualifying pair share
    // at least one emitted band — exactness preserved (falsified vs
    // brute in SetSimJoinSpec), key space multiplied by the number of
    // occupied bands. 2× row amplification, quadratic term divided by
    // size diversity.
    // the dispatch already profiled szMax — reuse it (szMaxHint) rather
    // than re-running the aggregate; direct strategy calls pay it once
    val szMax =
      if (szMaxHint > 0) szMaxHint
      else {
        val szMaxRow = sets.agg(max(col("sz"))).head()
        if (szMaxRow.isNullAt(0)) return verifyPairs(
          sets.limit(0).select(col("doc_id").as("id_a"), col("doc_id").as("id_b")),
          sets, tNum, tDen)
        szMaxRow.getLong(0)
      }
    val w = szMax * (tDen - tNum) / tDen + 1L
    // per-group projection keeps the sorted order (filter is stable), so
    // equal projections hash equal; the group id is hashed in so an
    // empty projection in group 3 never matches one in group 5.
    // d >= Δmax+1 is ENFORCED per row: a pair's symmetric difference is
    // bounded by the larger side's 2·sz·(1−t)/(1+t), so if every doc
    // passes its own bound check, every qualifying pair is pigeonholed —
    // an undersized d would silently lose pairs otherwise. The guard
    // rides inside the explode bound (assert_true nulls on pass; a
    // separate unused column would be pruned away by Catalyst).
    val rowBound =
      expr(s"(2 * sz * ${tDen - tNum}) div ${tDen + tNum}").cast("int")
    val guarded = when(
      assert_true(rowBound + 1 <= d, lit("jaccardJoinPartition: d is " +
        "smaller than this corpus's Δmax+1 — qualifying pairs would be " +
        "lost; use jaccardJoin (auto-dispatch)")).isNull,
      lit(d - 1))
    // toks ride THROUGH the window on purpose (measured, r11): a
    // drop-toks-then-rejoin variant (slim window sort, hot branch
    // re-fetching toks from `sets` by doc_id) lost ~25 % at 1 M docs
    // (40.7 → 49.9 s) — the extra doc_id shuffle costs more than the
    // wider sort saves on short-document corpora.
    val sigs = sets
      .select(col("doc_id"), col("sz"),
        explode(sequence(lit(0), guarded)).as("g"),
        col("toks"))
      .select(col("doc_id"), col("sz"), col("g"), col("toks"),
        xxhash64(col("g"),
          expr(s"filter(toks, x -> pmod(xxhash64(x), $d) = g)")).as("sig"))
      .select(col("doc_id"), col("sz"), col("g"), col("toks"), col("sig"),
        // integer division on purpose ("/" on two longs is double in
        // Spark SQL — float bands would mis-bucket near boundaries)
        explode(array(expr(s"sz div $w"), expr(s"sz div $w + 1"))).as("band"))
    // HOT-CLUSTER REFINEMENT (r11; DYNAMIC DEPTH since r12): on a small
    // vocabulary most candidates come from huge equal-projection
    // clusters — above all the EMPTY projection, which every doc
    // missing group g shares (measured at 1 M GenData docs: 266 M
    // candidate pairs, 92 % from empty projections; enumeration is ~n²
    // in the cluster size). A cluster of size ≤ hotCluster enumerates
    // pairs directly; a hotter cluster re-keys its members by a
    // NEXT-level partition of the still-unkeyed tokens (those outside
    // every previous level's chosen group, partitioned by a fresh
    // independent hash into the same d groups). Exactness, by induction
    // on levels: every qualifying pair has ≥ 1 level-1 group with
    // GENUINELY equal projections (pigeonhole; hash collisions only
    // ever ADD candidates elsewhere); within a cluster of genuine
    // agreement on levels 1..k, the pair's ≤ Δmax differences all lie
    // outside the keyed tokens, so ≥ 1 of the d level-(k+1) groups is
    // diff-free and the pair shares (g_{k+1}, sig_{k+1}).
    //
    // The depth is DYNAMIC (r12 — the r11 fixed HotLevels = 3 left a
    // residual the 1 M-doc census showed re-quadrupling per corpus
    // doubling). Per level, two shapes leave the recursion:
    //
    //  - EXHAUSTED rows (no unkeyed token left on this chain) enumerate
    //    against their WHOLE cluster now. Under genuine agreement an
    //    exhausted row's full token set equals the cluster's shared
    //    keyed projection, so it is a SUBSET of every clustermate's set
    //    — a size-gated candidate (t·|b| ≤ |a|) therefore has
    //    J = |a|/|b| ≥ t: every candidate is an output pair, so this
    //    enumeration is OUTPUT-BOUND (collision clusters can only add
    //    exactly-verified extras).
    //  - The remaining (continuing) rows recurse only while each level
    //    at least HALVES the residual enumeration cost
    //    Σ_clusters c·(c−1)/2 — the quantity the refinement exists to
    //    reduce. When a level fails to halve it, the PREVIOUS level's
    //    continuing clusters are enumerated whole (exact; their pairs
    //    are a superset of anything deeper levels could route).
    //
    // Why a progress guard and not the tempting "recurse until
    // exclusions exhaust the token set": exhaustion-only termination is
    // UNSOUND — a chain may choose a group no unkeyed token hashes to,
    // keying nothing (the empty-on-empty chain), so a cluster of more
    // than hotCluster IDENTICAL docs would recurse forever while its
    // rows multiply ×d per level. The halving guard bounds depth at
    // log₂(initial residual), stops exactly where refinement provably
    // stopped paying (the enumerated residual is within 2× of the best
    // any deeper level achieved), and the measured ~5× division per
    // level on real corpora clears it with room. Falsified vs brute
    // (identical-doc clique, empty-projection singletons, deep-chain
    // fixtures at a lowered cap) in SetSimJoinSpec.
    def pairJoin(side: DataFrame, key: Seq[String]): DataFrame = {
      val a = side.select(
        col("doc_id").as("id_a") +: col("sz").as("pa_sz") +:
          key.map(k => col(k).as(s"${k}_a")): _*)
      val b = side.select(
        col("doc_id").as("id_b") +: col("sz").as("pb_sz") +:
          key.map(k => col(k).as(s"${k}_b")): _*)
      a.join(b,
          key.map(k => col(s"${k}_a") === col(s"${k}_b")).reduce(_ && _) &&
            col("id_a") < col("id_b") &&
            // exact size filter: J ≥ t forces t·|a| ≤ |b| and t·|b| ≤ |a|
            // (the band key is the coarse version; this stays the gate)
            col("pb_sz") * tDen >= col("pa_sz") * tNum &&
            col("pa_sz") * tDen >= col("pb_sz") * tNum)
        .select("id_a", "id_b")
    }
    // exhausted rows × their whole cluster (both orders collapse to
    // id_a < id_b): the output-bound leg of the recursion's exit
    def pairJoinMixed(exh: DataFrame, all: DataFrame,
        key: Seq[String]): DataFrame = {
      val a = exh.select(
        col("doc_id").as("id_a") +: col("sz").as("pa_sz") +:
          key.map(k => col(k).as(s"${k}_a")): _*)
      val b = all.select(
        col("doc_id").as("id_b") +: col("sz").as("pb_sz") +:
          key.map(k => col(k).as(s"${k}_b")): _*)
      a.join(b,
          key.map(k => col(s"${k}_a") === col(s"${k}_b")).reduce(_ && _) &&
            col("id_a") =!= col("id_b") &&
            col("pb_sz") * tDen >= col("pa_sz") * tNum &&
            col("pa_sz") * tDen >= col("pb_sz") * tNum)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
    }
    // tokens outside every chosen group of levels 1..level (independent
    // hash per level — seeds 0, 7, 14, ...)
    def exclPred(level: Int): String = (1 to level).map { k =>
      val seed = if (k == 1) "xxhash64(x)" else s"xxhash64(x, ${(k - 1) * 7}L)"
      val gCol = if (k == 1) "g" else s"g$k"
      s"pmod($seed, $d) != $gCol"
    }.mkString(" AND ")
    var cur = sigs
    var keyCols = Seq("g", "band", "sig")
    var level = 1
    var candTerms = Seq.empty[DataFrame]
    // the previous level's continuing clusters + their enumeration cost
    // — kept so the guard can enumerate THEM (cost prevResid, the chain
    // minimum) instead of the level that failed to halve
    var prevResid = Long.MaxValue
    var prevContinuing: DataFrame = null
    var prevKeyCols: Seq[String] = null
    var done = false
    while (!done) {
      // pin the window stage's parallelism (r12): the signature frame's
      // rows carry toks, and the cluster-count window over them is the
      // level's CPU-heavy stage — repartitioning by the window's own
      // partition keys at the session's shuffle-partition count
      // satisfies the window's required distribution exactly (ONE
      // pinned exchange, none added) while keeping AQE's byte-based
      // coalescing from starving it (measured at sf0.1: 5 tasks on 32
      // cores). Same posture as the candidate joins below.
      //
      // MEASURED REJECTION (r13, r12 VERDICT item 3): replacing this
      // window with groupBy(keyCols).count + a SHUFFLE_HASH join-back on
      // the same pinned exchange removes the window's per-partition sort
      // but reads the toks-carrying shuffle TWICE (once to build counts,
      // once to probe) — deserializing the token arrays again costs more
      // than the sort saves. Back-to-back JobProbe A/B at sf0.1, 5 reps:
      // steady wall 4.5-4.7 s (window) vs 5.1-5.6 s (agg+join), task
      // time 63-67 s vs 81-85 s; q_join_setsim_stratified likewise
      // 3.4-4.1 s vs 4.4-5.4 s. The window's sort is pointer-swaps over
      // already-shuffled rows; the second shuffle read is not. Kept the
      // window.
      val counted = cur
        .repartition(n, keyCols.map(col): _*)
        .withColumn("kc",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(keyCols.map(col): _*)))
      // pin ONLY the hot subset (clusters past the cap — the recursion's
      // whole input): the exhausted term, the residual census and the
      // next level's re-key all consume it, and it shrinks per level.
      // The cold majority stays a lazy plan consumed once in the final
      // candidate union — pinning it too was measured at 195 s for the
      // 2 M-doc corpus (a ~12 GB toks-carrying materialization per
      // level) vs re-running the level-1 window once more. The pin is
      // lazy; the residual census below is the action that fills it.
      val hot = counted.filter(col("kc") > hotCluster).drop("kc")
        .withColumn("unk",
          expr(s"size(filter(toks, x -> ${exclPred(level)}))"))
        .localCheckpoint(eager = false)
      val continuing = hot.filter(col("unk") > 0)
      // residual enumeration cost if the recursion stopped here (one
      // metadata-sized agg over the pinned, shrinking hot subset)
      val residRow = continuing.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) div 2"))).head()
      val resid = if (residRow.isNullAt(0)) 0L else residRow.getLong(0)
      // census telemetry for scale probes (-Dgraft.setsim.census): the
      // per-level residual IS the number the refinement exists to shrink
      if (sys.props.contains("graft.setsim.census"))
        println(s"setsim-census level=$level residual_pairs=$resid" +
          (if (level > 1 && resid * 2 > prevResid) " (guard fires: enumerate previous level)" else ""))
      if (level > 1 && resid * 2 > prevResid) {
        // refinement stopped paying: enumerate the previous level's
        // continuing clusters whole — exact (a superset of every pair
        // deeper levels could find) and the cheapest point on the chain
        candTerms :+= pairJoin(prevContinuing.drop("toks", "unk"), prevKeyCols)
        done = true
      } else {
        candTerms :+= pairJoin(
          counted.filter(col("kc") <= hotCluster).drop("kc", "toks"), keyCols)
        candTerms :+= pairJoinMixed(
          hot.filter(col("unk") === 0).drop("toks", "unk"),
          hot.drop("toks", "unk"), keyCols)
        if (resid == 0L) done = true
        else {
          prevResid = resid
          prevContinuing = continuing
          prevKeyCols = keyCols
          val gNext = s"g${level + 1}"
          val sigNext = s"sig${level + 1}"
          val nextHash = s"xxhash64(x, ${level * 7}L)"
          cur = continuing.drop("unk")
            .withColumn(gNext, explode(sequence(lit(0), guarded)))
            .withColumn(sigNext, xxhash64(col(gNext),
              expr(s"filter(toks, x -> ${exclPred(level)} AND " +
                s"pmod($nextHash, $d) = $gNext)")))
          keyCols = keyCols ++ Seq(gNext, sigNext)
          level += 1
        }
      }
    }
    val cand = candTerms.reduce(_.unionByName(_)).distinct()
    verifyPairs(cand, sets, tNum, tDen)
  }

  /** Equal-projection cluster size past which the partition join stops
    * enumerating a cluster's pairs directly and re-keys the cluster by
    * a next-level complement partition (see the refinement comment in
    * [[jaccardJoinPartitionFrom]]): direct enumeration of a cluster of
    * c members costs c·(c−1)/2 candidate rows, so the cap bounds the
    * per-key quadratic term at ~32 k rows while refined keys split the
    * true monsters (empty projections) by actual content. */
  private final val HotCluster = 256L

  /** Deletion-neighborhood strategy (exact; requires every doc's
    * k = sz − ceil(t·sz) ≤ 1, enforced): each doc emits a 64-bit hash of
    * its full sorted token array plus, when k = 1, of every drop-one
    * subset. A qualifying pair has |a∖b| ≤ k_a and |b∖a| ≤ k_b (from
    * overlap ≥ ceil(t·sz) per side), so BOTH sides emit the signature of
    * a∩b — the equi-join on signatures finds every qualifying pair, and
    * hash collisions only ever ADD candidates (verification is exact).
    * Candidate volume tracks actual near-dup structure, not token
    * frequencies — the path a stop-word-dense corpus needs. */
  private[operators] def jaccardJoinDeletion(docs: DataFrame, idCol: String,
      textCol: String, tNum: Int, tDen: Int): DataFrame =
    jaccardJoinDeletionFrom(tokenFrames(docs, idCol, textCol), tNum, tDen)

  private def jaccardJoinDeletionFrom(sets: DataFrame,
      tNum: Int, tDen: Int): DataFrame = {
    // p = 0 keeps the full set; p in 1..sz drops position p — EVERY
    // position, because the side's one surplus token can sit anywhere
    // in the sorted order (docs with k = 0 emit only p = 0). xxhash64
    // over the array is order-stable because toks is sorted; signatures
    // never leave the stage, so a collision costs one extra verified
    // candidate, never a wrong answer. The k <= 1 precondition is
    // ENFORCED per row (assert_true rides the stage for free): emitting
    // only single-drop subsets for a k >= 2 doc would silently lose
    // qualifying pairs — the one failure mode an exact operator must
    // turn into an error.
    // the guard rides INSIDE the explode bound (assert_true is null on
    // pass, so the `when` falls through to the real bound) — a separate
    // unused guard column would be column-pruned away by Catalyst
    val k = (col("sz") - ceilMul("sz", tNum, tDen)).cast("int")
    val guarded = when(
      assert_true(k <= 1, lit("jaccardJoinDeletion requires every doc's " +
        "k = sz - ceil(t*sz) <= 1; use jaccardJoin (auto-dispatch) or " +
        "jaccardJoinPartition/Prefix for lower thresholds")).isNull,
      when(k >= 1, col("sz").cast("int")).otherwise(lit(0)))
    val sigs = sets
      .select(col("doc_id"), col("sz"), col("toks"),
        explode(sequence(lit(0), guarded)).as("p"))
      .select(col("doc_id"), col("sz"),
        xxhash64(when(col("p") === 0, col("toks"))
          .otherwise(expr("filter(toks, (x, i) -> i != p - 1)"))).as("sig"))
    // the candidate self-join explodes ~sz× from bytes-tiny signature
    // rows: pin both sides' parallelism (REPARTITION_BY_NUM is exempt
    // from AQE coalescing) and keep the join shuffled (SHUFFLE_HASH) —
    // AQE's broadcast conversion would collapse the explosion back onto
    // the probe side's few coalesced map partitions (measured at sf0.1:
    // 2 tasks × ~2.5 s each on 32 cores). SHJ build-side contract: a
    // signature is shared only by docs within one deletion of the same
    // token set, so key groups track actual near-dup structure (the
    // operator's own precondition k <= 1), never token frequency.
    val n = Parallelism.sessionShufflePartitions(sets.sparkSession)
    val a = sigs.select(col("doc_id").as("id_a"), col("sz").as("pa_sz"),
      col("sig").as("sig_a")).repartition(n, col("sig_a"))
    val b = sigs.select(col("doc_id").as("id_b"), col("sz").as("pb_sz"),
      col("sig").as("sig_b")).repartition(n, col("sig_b"))
    val cand = a.hint("SHUFFLE_HASH").join(b,
        col("sig_a") === col("sig_b") && col("id_a") < col("id_b") &&
          // size filter: J ≥ t forces t·|a| ≤ |b| and t·|b| ≤ |a|
          col("pb_sz") * tDen >= col("pa_sz") * tNum &&
          col("pa_sz") * tDen >= col("pb_sz") * tNum)
      .select("id_a", "id_b").distinct()
    verifyPairs(cand, sets, tNum, tDen)
  }

  /** Prefix-filtering strategy (exact at ANY threshold): rare-first
    * global token order, per-doc prefix of length sz − ceil(t·sz) + 1,
    * prefix equi-join + size filter, exact verify. The pigeonhole bound
    * (see object scaladoc) makes the prefix join lossless. */
  private[operators] def jaccardJoinPrefix(docs: DataFrame, idCol: String,
      textCol: String, tNum: Int, tDen: Int): DataFrame =
    jaccardJoinPrefixFrom(tokenFrames(docs, idCol, textCol), tNum, tDen)

  private def jaccardJoinPrefixFrom(sets: DataFrame,
      tNum: Int, tDen: Int): DataFrame = {
    val toks = sets.select(col("doc_id"), explode(col("toks")).as("tok"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    // (df, tok) struct sort = the global rare-first order; transform
    // strips the df after sorting so the arrays stay token-typed
    val sorted = toks.join(dfreq, "tok")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ts"))
      .select(col("doc_id"),
        expr("transform(ts, x -> x.tok)").as("toks"),
        size(col("ts")).cast("long").as("sz"))
    // prefixLen = sz − ceil(sz·tNum/tDen) + 1, ceil via INTEGRAL div —
    // a double division would round past 2^53 and a rounded-up quotient
    // shortens the prefix, which silently LOSES qualifying pairs
    val prefixLen =
      (col("sz") - ceilMul("sz", tNum, tDen) + 1).cast("int")
    val pref = sorted.select(col("doc_id"), col("sz"),
      explode(slice(col("toks"), lit(1), prefixLen)).as("tok"))
    // same pin + shuffled-hash discipline as the deletion path's
    // signature join (see jaccardJoinDeletionFrom): prefix-token rows are
    // bytes-tiny and the join fans out per shared token, so AQE's
    // byte-based coalescing starved the stage (measured at sf0.1: the
    // candidate join and its distinct ran 1 task each, 1.5 + 1.7 s of
    // the query's 4.5 s wall).
    //
    // SKEW BOUND (r13, r12 VERDICT item 4). Unlike the deletion path,
    // prefix tokens are frequency-skewed by construction, and the
    // REPARTITION_BY_NUM pin opts this exchange out of AQE skew-split
    // (which only rewrites ENSURE_REQUIREMENTS-origin shuffles — and
    // could not help anyway: one hot KEY is unsplittable, and its c²/2
    // candidate output is what ANY exact algorithm must enumerate, so
    // salting cannot reduce it either). The working bound is PPJoin's:
    // the prefix keeps each doc's sz−⌈t·sz⌉+1 GLOBALLY RAREST tokens
    // (rare-first order above), so a token of df D enters a doc's
    // prefix only when that doc has almost nothing rarer — prefix
    // frequency tracks near-dup structure, not corpus frequency. The
    // residual hot case (a clique of near-identical docs sharing one
    // rare token, falsified in SetSimJoinSpec's hot-prefix spec) yields
    // a per-task SHJ build of df_prefix(tok)·~24 B rows and a c²/2
    // enumeration on one task — when a corpus is known to carry such
    // cliques, the documented fallback is jaccardJoinPartition (the
    // auto-dispatch route), whose hot-cluster refinement SPLITS hot keys
    // by content instead of enumerating them on one task.
    val n = Parallelism.sessionShufflePartitions(sets.sparkSession)
    val a = pref.select(col("doc_id").as("id_a"), col("sz").as("pa_sz"),
      col("tok").as("tok_a")).repartition(n, col("tok_a"))
    val b = pref.select(col("doc_id").as("id_b"), col("sz").as("pb_sz"),
      col("tok").as("tok_b")).repartition(n, col("tok_b"))
    val cand = a.hint("SHUFFLE_HASH").join(b,
        col("tok_a") === col("tok_b") && col("id_a") < col("id_b") &&
          // size filter: J ≥ t forces t·|a| ≤ |b| and t·|b| ≤ |a|
          col("pb_sz") * tDen >= col("pa_sz") * tNum &&
          col("pa_sz") * tDen >= col("pb_sz") * tNum)
      .select("id_a", "id_b").distinct()
    // verify against the lexicographically-sorted frame (same sets —
    // array_intersect is order-indifferent)
    verifyPairs(cand, sets, tNum, tDen)
  }

  /** The unfiltered brute-force twin — O(n²) pair verification with the
    * SAME tokenizer and gate; exists so SetSimJoinSpec can falsify both
    * strategies' no-loss claims on small fixtures (q_join_setsim's
    * DuckDB oracle is this query in SQL form). Not registered. */
  def jaccardJoinBrute(docs: DataFrame, idCol: String, textCol: String,
      tNum: Int, tDen: Int): DataFrame = {
    val sets = docs.select(col(idCol).as("doc_id"),
      tokenSet(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
    val a = sets.select(col("doc_id").as("id_a"), col("toks").as("ta"))
    val b = sets.select(col("doc_id").as("id_b"), col("toks").as("tb"))
    val ix = size(array_intersect(col("ta"), col("tb"))).cast("long")
    val szA = size(col("ta")).cast("long")
    val szB = size(col("tb")).cast("long")
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), ix.as("ix"), szA.as("sz_a"),
        szB.as("sz_b"))
      .filter(col("ix") * tDen >= lit(tNum.toLong) *
        (col("sz_a") + col("sz_b") - col("ix")))
      .select(col("id_a"), col("id_b"), col("ix"), col("sz_a"), col("sz_b"),
        round(col("ix").cast("double") /
          (col("sz_a") + col("sz_b") - col("ix")), 6).as("jaccard"))
  }
}

package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Falsifies the PPJoin prefix-filter bound against brute force — the
  * operator's whole value is "exact, unlike MinHash", so the spec's job
  * is to break the pigeonhole argument and fail. Three attack surfaces:
  * the real corpus fixture at several thresholds, an ADVERSARIAL fixture
  * whose qualifying pairs sit exactly AT the threshold and share only
  * their most-frequent tokens (the worst case for a rare-first prefix:
  * the shared evidence sorts to the very END of each doc's token order,
  * so the prefix keeps the least possible of it), and the plan itself
  * (no cartesian product anywhere in the filtered path). */
class SetSimJoinSpec extends SparkTestBase {

  private def pairs(df: DataFrame): Seq[(Long, Long, Long, Long, Long, Double)] =
    df.orderBy("id_a", "id_b").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toSeq

  test("dispatched join == brute force on the corpus fixture, several thresholds") {
    // 19/20 on this corpus has kMax = 1 → the dispatcher takes the
    // deletion path; 4/5 and 1/2 have kMax ≥ 2 → prefix path. All three
    // must equal brute force exactly.
    val docs = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").filter(col("doc_id") < 200)
    // dispatch coverage on this fixture (sz 9..30): 19/20 → deletion
    // (kMax = 1), 17/20 and 4/5 → universe partitioning (kMax >= 2,
    // D = 5 resp. 6 <= szMin = 9), 1/2 → prefix (D = 21 > szMin)
    for ((tn, td) <- Seq((19, 20), (17, 20), (4, 5), (1, 2))) {
      val fast = pairs(SetSimJoin.jaccardJoin(docs, "doc_id", "text", tn, td))
      val brute = pairs(SetSimJoin.jaccardJoinBrute(docs, "doc_id", "text", tn, td))
      assert(brute.nonEmpty, s"fixture must qualify pairs at $tn/$td")
      assert(fast == brute,
        s"$tn/$td: lost ${brute.diff(fast).take(3)}, invented ${fast.diff(brute).take(3)}")
    }
  }

  test("ALL strategies independently == brute force where each is valid") {
    // at 19/20 every doc's k = sz - ceil(t*sz) is <= 1 on this corpus,
    // so the deletion path's precondition holds; the partition path is
    // valid for any D >= Δmax+1 (larger D only adds groups); the prefix
    // path is valid at any threshold — all must agree with brute force
    val docs = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").filter(col("doc_id") < 200)
    val brute = pairs(SetSimJoin.jaccardJoinBrute(docs, "doc_id", "text", 19, 20))
    val del = pairs(SetSimJoin.jaccardJoinDeletion(docs, "doc_id", "text", 19, 20))
    val pre = pairs(SetSimJoin.jaccardJoinPrefix(docs, "doc_id", "text", 19, 20))
    // Δmax at 19/20 with szMax = 31 is (2*31*1) div 39 = 1 → D = 2; also
    // try a deliberately larger D (extra groups never lose pairs)
    val par2 = pairs(SetSimJoin.jaccardJoinPartition(docs, "doc_id", "text", 19, 20, 2))
    val par5 = pairs(SetSimJoin.jaccardJoinPartition(docs, "doc_id", "text", 19, 20, 5))
    assert(brute.nonEmpty)
    assert(del == brute, s"deletion lost ${brute.diff(del).take(3)}, " +
      s"invented ${del.diff(brute).take(3)}")
    assert(pre == brute, s"prefix lost ${brute.diff(pre).take(3)}, " +
      s"invented ${pre.diff(brute).take(3)}")
    assert(par2 == brute, s"partition(D=2) lost ${brute.diff(par2).take(3)}")
    assert(par5 == brute, s"partition(D=5) lost ${brute.diff(par5).take(3)}")
  }

  test("deletion path finds the exact-boundary subset pair (J = t with k_b = 0)") {
    import spark.implicits._
    // t = 9/10: a has 10 tokens, b has the 9-token SUBSET — J = 9/10
    // exactly, and b's own deletion budget is ZERO (k_b = 9 - ceil(8.1)
    // = 0), so the match only exists because a drops its extra token
    // down to b's full set: the asymmetric case a symmetric-k
    // implementation would lose
    val fixture = (Seq(
      1L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9 extra",
      2L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9",
      3L -> "t1 t2 t3 t4 t5 t6 t7 u1 u2"        // J(2,3) = 7/11 < 9/10
    ) ++ (10L until 30L).map(i => (i, s"f$i g$i h$i k$i m$i n$i o$i p$i q$i")))
      .toDF("doc_id", "text")
    val brute = pairs(SetSimJoin.jaccardJoinBrute(fixture, "doc_id", "text", 9, 10))
    val fast = pairs(SetSimJoin.jaccardJoin(fixture, "doc_id", "text", 9, 10))
    assert(fast == brute, s"boundary subset pair: $fast vs $brute")
    assert(fast.exists(p => p._1 == 1L && p._2 == 2L && p._6 == 0.9),
      s"the J = 9/10 subset pair must qualify exactly: $fast")
    assert(!fast.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("boundary pairs at exactly J = t survive, even when shared tokens are the most frequent") {
    import spark.implicits._
    // threshold 2/3; docs a=1, b=2 have 5 tokens each sharing exactly 4
    // -> J = 4/(5+5-4) = 2/3, EXACTLY the threshold. The shared tokens
    // (c1..c4) are planted in every filler doc so their df is maximal:
    // the rare-first order pushes them to the END of a's and b's sorted
    // arrays, and the prefix (len = 5 - ceil(10/3) + 1 = 2) keeps each
    // doc's UNIQUE token plus only ONE shared token — the minimum the
    // pigeonhole bound allows. A one-token-shorter prefix would lose the
    // pair; this spec is the falsifier for exactly that off-by-one.
    val filler = (10L until 40L).map(i => (i, s"c1 c2 c3 c4 f$i g$i h$i"))
    val fixture = (Seq(
      1L -> "c1 c2 c3 c4 onlya",
      2L -> "c1 c2 c3 c4 onlyb",   // J(1,2) = 4/6 = 2/3 boundary
      3L -> "c1 c2 c3 zc wc vc",   // J(1,3) = 3/8 < 2/3: must NOT appear
      4L -> "onlya c2 c3 c4 c1"    // J(1,4) = 1 (same set, order scrambled)
    ) ++ filler).toDF("doc_id", "text")
    val fast = pairs(SetSimJoin.jaccardJoin(fixture, "doc_id", "text", 2, 3))
    val brute = pairs(SetSimJoin.jaccardJoinBrute(fixture, "doc_id", "text", 2, 3))
    assert(fast == brute, s"boundary falsifier: $fast vs $brute")
    val boundary = fast.find(p => p._1 == 1L && p._2 == 2L)
    assert(boundary.isDefined, "the exact-boundary pair (1,2) must qualify")
    assert(boundary.get._6 == 0.666667, "J must round to 6 dp of 2/3")
    assert(fast.exists(p => p._1 == 1L && p._2 == 4L && p._6 == 1.0),
      "identical sets under different token order must score 1.0")
    assert(!fast.exists(p => p._1 == 1L && p._2 == 3L),
      "a below-threshold pair must not qualify")
  }

  test("strategy preconditions FAIL LOUDLY instead of silently losing pairs; empty corpus is empty") {
    import spark.implicits._
    val docs = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").filter(col("doc_id") < 50)
    // deletion at 1/2 → k >= 2 for every doc: single-drop signatures
    // would silently lose pairs, so the per-row guard must raise
    val eDel = intercept[Exception] {
      SetSimJoin.jaccardJoinDeletion(docs, "doc_id", "text", 1, 2).count()
    }
    assert(eDel.getMessage != null && eDel.getMessage.contains("k = sz - ceil"),
      s"deletion guard must name its precondition: ${eDel.getMessage}")
    // partition with an undersized d (Δmax+1 > 1 at 1/2) must raise too
    val ePar = intercept[Exception] {
      SetSimJoin.jaccardJoinPartition(docs, "doc_id", "text", 1, 2, d = 1).count()
    }
    assert(ePar.getMessage != null && ePar.getMessage.contains("Δmax"),
      s"partition guard must name its precondition: ${ePar.getMessage}")
    // empty corpus (all-whitespace text): empty result, no NPE from the
    // eager strategy profile
    val blank = Seq((1L, "   "), (2L, "")).toDF("doc_id", "text")
    assert(SetSimJoin.jaccardJoin(blank, "doc_id", "text", 19, 20).count() == 0)
  }

  test("size-stratified hybrid == brute force; one tiny doc no longer forces the prefix path") {
    import spark.implicits._
    // t = 4/5 over sizes {3, 7, 30}: kMax = 6 rules out deletion, the
    // 3-token docs push szMin under D = 7 ruling out plain partitioning
    // — pre-r11 this fell to the prefix path (degenerate on hot-token
    // corpora); the band bound ⌊6·5/4⌋ = 7 has deletion budget
    // 7 − ceil(28/5) = 1, so the stratified hybrid applies. The fixture
    // plants a qualifying pair in EACH region: the 30-token boundary
    // pair (large stratum, J = 27/33), an identical 3-token pair (band),
    // and an identical 7-token pair sitting exactly in the OVERLAP
    // (found by both joins — the size dedup must emit it once).
    val base = (0 until 30).map(i => s"w$i")
    val fixture = (Seq(
      1L -> base.take(27).concat(Seq("a1", "a2", "a3")).mkString(" "),
      2L -> base.take(27).concat(Seq("b1", "b2", "b3")).mkString(" "),
      100L -> "o1 o2 o3 o4 o5 o6 o7",
      101L -> "o1 o2 o3 o4 o5 o6 o7",
      200L -> "t1 t2 t3",
      201L -> "t1 t2 t3"
    ) ++ (300L until 340L).map(i =>
      (i, (0 until (3 + (i % 28)).toInt).map(j => s"f${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
    val p = SetSimJoin.dispatchProfile(fixture, "doc_id", "text", 4, 5)
    assert(p.strategy == "stratified",
      s"fixture must land in the stratified regime: $p")
    val fast = pairs(SetSimJoin.jaccardJoin(fixture, "doc_id", "text", 4, 5))
    val brute = pairs(SetSimJoin.jaccardJoinBrute(fixture, "doc_id", "text", 4, 5))
    assert(fast == brute,
      s"stratified lost ${brute.diff(fast).take(3)}, invented ${fast.diff(brute).take(3)}")
    for (pair <- Seq((1L, 2L), (100L, 101L), (200L, 201L)))
      assert(brute.exists(x => (x._1, x._2) == pair),
        s"fixture must qualify the planted pair $pair")
    // the overlap pair must appear exactly once (the dedup filter)
    assert(fast.count(x => (x._1, x._2) == ((100L, 101L))) == 1)
  }

  test("hot-cluster refinement: clusters past the cap re-key exactly (== brute force)") {
    import spark.implicits._
    // two monster clusters, both past the 256 cap: (a) 280 IDENTICAL
    // 10-token docs — every group's projection cluster has 280 members
    // and C(280,2) = 39 060 genuinely-qualifying pairs that must ALL
    // survive the level-2 re-key; (b) 400 single-token docs with
    // pairwise-distinct tokens — each group's EMPTY projection cluster
    // holds ~5/6 of them (the measured 92 %-of-candidates monster at
    // 1 M docs) and contributes ZERO qualifying pairs, which the
    // refinement must discover without enumerating the ~80 k-pair
    // cluster. d = 4 is valid: per-row Δ bound (2·10·1/9 = 2) + 1 ≤ 4.
    val fixture = (
      (0L until 280L).map(i => (i, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")) ++
      (1000L until 1400L).map(i => (i, s"u$i"))
    ).toDF("doc_id", "text")
    val fast = pairs(SetSimJoin.jaccardJoinPartition(
      fixture, "doc_id", "text", 4, 5, d = 4))
    val brute = pairs(SetSimJoin.jaccardJoinBrute(fixture, "doc_id", "text", 4, 5))
    assert(brute.size == 280 * 279 / 2, s"expected the full clique, got ${brute.size}")
    assert(fast == brute,
      s"hot refinement lost ${brute.diff(fast).take(3)}, invented ${fast.diff(brute).take(3)}")
  }

  test("dynamic refinement: deep chains at a lowered cap descend multiple levels and stay exact") {
    import spark.implicits._
    // hotCluster = 8 makes modest clusters hot, so a 12-token vocabulary
    // over 6-token docs drives the recursion through SEVERAL levels
    // (each level keys ~1/d of the remaining vocab; identical-projection
    // clusters stay hot until content genuinely splits them — the
    // deep-chain shape the fixed depth-3 could only terminate by
    // brute-enumerating). Planted near-dup pairs must survive every
    // level's re-key; the fixture's random-ish docs must not invent any.
    val vocab = (0 until 12).map(i => s"v$i")
    val fixture = ((0L until 120L).map { i =>
      val toks = (0 until 6).map(j => vocab(((i * 7 + j * 5 + j * j) % 12).toInt))
      (i, toks.distinct.mkString(" "))
    } ++ Seq(
      1000L -> "v0 v1 v2 v3 v4 v5",
      1001L -> "v0 v1 v2 v3 v4 v5",     // identical pair (J = 1)
      2000L -> "v6 v7 v8 v9 v10 v0",
      2001L -> "v6 v7 v8 v9 v10 v1"     // J = 5/7 < 4/5: must NOT appear
    )).toDF("doc_id", "text")
    val fast = pairs(SetSimJoin.jaccardJoinPartition(
      fixture, "doc_id", "text", 4, 5, d = 3, hotCluster = 8L))
    val brute = pairs(SetSimJoin.jaccardJoinBrute(fixture, "doc_id", "text", 4, 5))
    assert(brute.exists(p => (p._1, p._2) == ((1000L, 1001L))))
    assert(fast == brute,
      s"deep-chain lost ${brute.diff(fast).take(3)}, invented ${fast.diff(brute).take(3)}")
  }

  test("progress guard terminates the shared-core monster (residual grows per level) exactly") {
    import spark.implicits._
    // 120 docs sharing a 25-token core plus one unique token each: every
    // pair qualifies at 9/10 (J = 25/27), and the refinement CANNOT
    // split the cluster faster than the unique token's hash spreads —
    // the residual grows ~d·((d−1)/d)² ≈ 1.33× per level, so pure
    // exhaustion-termination would recurse unboundedly while rows
    // multiply ×d. The halving guard must fire, enumerate the previous
    // level's clusters whole, and still equal brute force (the clique
    // makes that enumeration output-bound).
    val core = (0 until 25).map(i => s"c$i")
    val fixture = (0L until 120L).map { i =>
      (i, (core :+ s"uniq$i").mkString(" "))
    }.toDF("doc_id", "text")
    val fast = pairs(SetSimJoin.jaccardJoinPartition(
      fixture, "doc_id", "text", 9, 10, d = 3, hotCluster = 8L))
    val brute = pairs(SetSimJoin.jaccardJoinBrute(fixture, "doc_id", "text", 9, 10))
    assert(brute.size == 120 * 119 / 2, s"expected the full clique, got ${brute.size}")
    assert(fast == brute,
      s"guard path lost ${brute.diff(fast).take(3)}, invented ${fast.diff(brute).take(3)}")
  }

  test("registered driver gates pin their dispatch strategy at every fixture SF") {
    // the three q_join_setsim* gates certify one strategy EACH, but the
    // dispatch is data-dependent — a regenerated fixture could silently
    // swap which path the CORRECTNESS row certifies. This pins the
    // decision for the exact (corpus, threshold) each registered query
    // uses, at the spec SF, the driver-gate SF (sf0.01) AND the bench
    // SF (sf0.1) — the profile is a tokenize + 1-row aggregate, cheap
    // even at the bench SF.
    for (dir <- Seq(sf(), sf("sf0.01"), sf("sf0.1"))) {
      val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
      val pDel = SetSimJoin.dispatchProfile(docs, "doc_id", "text", 19, 20)
      assert(pDel.strategy == "deletion",
        s"q_join_setsim ($dir) must certify the deletion path: $pDel")
      val pPar = SetSimJoin.dispatchProfile(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", 17, 20)
      assert(pPar.strategy == "partition",
        s"q_join_setsim_partition ($dir) must certify universe partitioning: $pPar")
      val slice = docs.filter(col("doc_id") % 10 === 0)
      val pPre = SetSimJoin.dispatchProfile(slice, "doc_id", "text", 3, 5)
      assert(pPre.strategy == "prefix",
        s"q_join_setsim_prefix ($dir) must certify prefix filtering: $pPre")
      import spark.implicits._
      val stratCorpus = docs.filter(col("doc_id") % 3 === 1)
        .unionByName(Seq((-1L, "aardvark zyzzyva")).toDF("doc_id", "text"))
      val pStrat = SetSimJoin.dispatchProfile(stratCorpus, "doc_id", "text", 9, 10)
      assert(pStrat.strategy == "stratified",
        s"q_join_setsim_stratified ($dir) must certify the hybrid: $pStrat")
    }
  }

  test("hot-prefix skew falsifier: a clique sharing one prefix-hot token stays exact; partition fallback splits it") {
    import spark.implicits._
    // r12 VERDICT item 4: the prefix path's pinned SHUFFLE_HASH join is
    // outside AQE skew-split, and prefix tokens are frequency-skewed by
    // construction — so plant the worst case deliberately. Every clique
    // doc is "hot1 hot2 u_i v_i": sz = 4 at t = 1/2 keeps a 3-token
    // prefix, the two unique tokens (df = 1) sort first in the
    // rare-first order, and hot1 (df = clique size) takes the third
    // slot — ONE join key owning a c·(c−1)/2 candidate enumeration
    // (1770 pairs from 60 docs), none of which qualify (J = 2/6 < 1/2).
    // Planted qualifying pairs: (100, 101) rides ordinary rare keys, and
    // (200, 201) — "hot1 hot2 xx1" vs "hot1 hot2 yy1", J = 2/4 exactly
    // at threshold — shares NO prefix token except hot1 (sz = 3 keeps a
    // 2-token prefix: [unique, hot1]), so a skew-mishandled hot key
    // loses real output, not just time.
    val clique = (0L until 60L).map(i => (i, s"hot1 hot2 u$i v$i"))
    val nearDups = Seq(
      100L -> "hot1 hot2 w1 w2",
      101L -> "hot1 hot2 w1 w2 w3", // J = 4/5 >= 1/2
      200L -> "hot1 hot2 xx1",
      201L -> "hot1 hot2 yy1")      // J = 2/4, found ONLY via hot1
    val docs = (clique ++ nearDups).toDF("doc_id", "text")
    // the planted skew is real: hot1's corpus df is the whole fixture
    val dfHot = docs.select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") === "hot1").count()
    assert(dfHot == 64L, s"fixture must make hot1 corpus-hot, df = $dfHot")
    val brute = pairs(SetSimJoin.jaccardJoinBrute(docs, "doc_id", "text", 1, 2))
    assert(brute.map(p => (p._1, p._2)) == Seq((100L, 101L), (200L, 201L)),
      s"exactly the planted near-dup pairs must qualify: $brute")
    // exactness under the hot key (candidate volume is output-bound for
    // any exact algorithm; the prefix path must enumerate and survive it)
    val pre = pairs(SetSimJoin.jaccardJoinPrefix(docs, "doc_id", "text", 1, 2))
    assert(pre == brute, s"hot prefix key lost pairs: $pre vs $brute")
    // the documented fallback for known-hot corpora: the partition path's
    // hot-cluster refinement splits hot keys by content instead of
    // enumerating them on one task — same exact answer (cap lowered so
    // the 60-doc clique actually crosses the refinement threshold)
    // d >= Δmax+1 = (2·5·1 div 3)+1 = 4 for the sz = 5 doc at t = 1/2
    val par = pairs(SetSimJoin.jaccardJoinPartition(
      docs, "doc_id", "text", 1, 2, d = 5, hotCluster = 8L))
    assert(par == brute, s"partition fallback lost pairs: $par vs $brute")
  }

  test("no strategy's plan is a cartesian product; brute is quarantined to specs") {
    import spark.implicits._
    val docs = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").filter(col("doc_id") < 50)
    // a stratified-dispatch fixture (tiny docs force the hybrid at 4/5)
    val strat = docs.unionByName(
      Seq((9001L, "z1 z2 z3"), (9002L, "z1 z2 z3")).toDF("doc_id", "text"))
    for (df <- Seq(
        SetSimJoin.jaccardJoinDeletion(docs, "doc_id", "text", 19, 20),
        SetSimJoin.jaccardJoinPrefix(docs, "doc_id", "text", 19, 20),
        SetSimJoin.jaccardJoinPartition(docs, "doc_id", "text", 17, 20, d = 6),
        SetSimJoin.jaccardJoin(strat, "doc_id", "text", 4, 5))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"candidate generation must stay an equi-join:\n$plan")
    }
  }
}

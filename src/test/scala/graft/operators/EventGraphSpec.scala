package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Falsifiable hand-computed contracts for the r6 event-analytics and
  * link-graph operators (the oracle checks them on the fixture; these
  * pin the SEMANTICS on adversarial micro-inputs — strictness of the
  * funnel cascade, dangling PageRank mass, retention offsets, exact
  * z-scores, bigram smoothing arithmetic). */
class EventGraphSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel is strictly ordered: same-ts and out-of-order events do not convert") {
    val events = Seq(
      // user 1: clean signup -> view -> purchase
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "view"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 2: view AT the signup instant (not strictly after) and a
      // view BEFORE signup — neither converts step 2
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-01 10:00:00"), "signup"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // user 3: signup then purchase with NO view — stops at step 1
      (3L, ts("2024-01-01 10:00:00"), "signup"),
      (3L, ts("2024-01-01 11:00:00"), "purchase"),
      // user 4: no signup at all — never enters
      (4L, ts("2024-01-01 10:00:00"), "view"),
    ).toDF("user_id", "ts", "event_type")
    val frames = EventAnalytics.funnelUsers(events, "user_id", "ts", "event_type",
      Seq("signup", "view", "purchase"))
    assert(frames.map(_.select("user_id").as[Long].collect().toSet) ==
      Seq(Set(1L, 2L, 3L), Set(1L), Set(1L)))
    val summary = EventAnalytics.funnelSummary(events, "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"))
      .orderBy("step_idx")
      .select("n_users", "avg_secs_to_reach").as[(Long, Double)].collect()
    assert(summary.toSeq == Seq((3L, 0.0), (1L, 3600.0), (1L, 7200.0)))
  }

  test("timeWeightedAvg: carry-to-midnight weights, hand arithmetic, tie pairing") {
    val ev = Seq(
      // user 1: value 10 holds 6h, value 20 holds 18h -> twap 17.5
      (1L, 1L, ts("2024-01-02 00:00:00"), 10.0),
      (2L, 1L, ts("2024-01-02 06:00:00"), 20.0),
      // user 2: same-ts tie — event_id order pairs v=5 with dt 0 and
      // v=7 with the full remaining day -> twap 7.0
      (3L, 2L, ts("2024-01-02 12:00:00"), 5.0),
      (4L, 2L, ts("2024-01-02 12:00:00"), 7.0),
    ).toDF("event_id", "user_id", "ts", "value")
    val out = EventAnalytics.timeWeightedAvg(ev, "user_id", "ts", "value", "event_id")
      .orderBy("user_id")
      .as[(Long, java.sql.Date, Double, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._3, r._4)) == Seq(
      (1L, 17.5, 86400000000L), (2L, 7.0, 43200000000L)))
  }

  test("windowed funnel: boundary gap kept, over-window dropped, greedy from earliest") {
    val ev = Seq(
      // user 1: signup t10, view t70 — gap 60 == window exactly -> converts
      (1L, 1L, ts("2024-01-01 00:00:10"), "signup"),
      (2L, 1L, ts("2024-01-01 00:01:10"), "view"),
      // user 2: signup t10, view t71 — gap 61 > window -> does NOT convert
      (3L, 2L, ts("2024-01-01 00:00:10"), "signup"),
      (4L, 2L, ts("2024-01-01 00:01:11"), "view"),
      // user 3: GREEDY subtlety — signups at t10 and t100, view at t120.
      // From the EARLIEST signup (t10) the gap is 110 > window; the later
      // signup would convert, but greedy semantics do not re-anchor
      (5L, 3L, ts("2024-01-01 00:00:10"), "signup"),
      (6L, 3L, ts("2024-01-01 00:01:40"), "signup"),
      (7L, 3L, ts("2024-01-01 00:02:00"), "view"),
    ).toDF("event_id", "user_id", "ts", "event_type")
    val frames = EventAnalytics.funnelUsers(ev, "user_id", "ts", "event_type",
      Seq("signup", "view"), maxStepGapUs = 60L * 1000000)
    assert(frames.head.count() == 3)
    val converted = frames(1).select("user_id").as[Long].collect().toSet
    assert(converted == Set(1L), s"only the boundary-gap user converts: $converted")
  }

  test("funnel picks the EARLIEST qualifying timestamp per step") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 09:00:00"), "view"),  // before signup: skipped
      (1L, ts("2024-01-01 11:00:00"), "view"),  // chosen
      (1L, ts("2024-01-01 13:00:00"), "view"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"), // after chosen view
    ).toDF("user_id", "ts", "event_type")
    val last = EventAnalytics.funnelUsers(events, "user_id", "ts", "event_type",
      Seq("signup", "view", "purchase")).last
    val r = last.select("ts_1", "ts_2", "ts_3").collect().head
    assert(r.getTimestamp(0) == ts("2024-01-01 10:00:00"))
    assert(r.getTimestamp(1) == ts("2024-01-01 11:00:00"))
    assert(r.getTimestamp(2) == ts("2024-01-01 12:00:00"))
  }

  test("weeklyRetention: cohort week is the Monday, offsets count full weeks from first event") {
    // 2024-01-03 is a Wednesday; its Monday is 2024-01-01
    val events = Seq(
      (1L, ts("2024-01-03 10:00:00")), // first seen Wed
      (1L, ts("2024-01-09 10:00:00")), // 6 days later -> offset 0
      (1L, ts("2024-01-10 10:00:00")), // 7 days later -> offset 1
      (2L, ts("2024-01-03 12:00:00")), // same cohort, week 0 only
    ).toDF("user_id", "ts").withColumn("event_type", lit("view"))
    val r = EventAnalytics.weeklyRetention(events, "user_id", "ts")
      .orderBy("week_offset")
      .select("cohort_week", "week_offset", "n_users", "retention")
      .as[(java.sql.Date, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      (java.sql.Date.valueOf("2024-01-01"), 0L, 2L, 1.0),
      (java.sql.Date.valueOf("2024-01-01"), 1L, 1L, 0.5)))
  }

  test("dailyVolumeAnomaly z-scores match exact-sum statistics") {
    // 4 days of counts 10,10,10,22 -> mean 13, var (300+484-4*169)/3 = 36, sd 6
    val events = (1 to 10).map(i => ("click", ts(s"2024-01-01 0$i:00:00"))) ++
      (1 to 10).map(i => ("click", ts(s"2024-01-02 0$i:00:00"))) ++
      (1 to 10).map(i => ("click", ts(s"2024-01-03 0$i:00:00"))) ++
      (1 to 22).map(i => ("click", ts(s"2024-01-04 ${10 + i % 12}:0${i % 6}:00")))
    val df = events.toDF("event_type", "ts")
    val r = EventAnalytics.dailyVolumeAnomaly(df, "event_type", "ts", 2.0)
      .orderBy("day").select("n", "z", "is_anomaly")
      .as[(Long, Double, Boolean)].collect().toSeq
    assert(r == Seq((10L, -0.5, false), (10L, -0.5, false), (10L, -0.5, false),
      (22L, 1.5, false)))
    // tighter threshold flips the outlier day
    val r2 = EventAnalytics.dailyVolumeAnomaly(df, "event_type", "ts", 1.5)
      .filter(col("is_anomaly")).select("n").as[Long].collect().toSeq
    assert(r2 == Seq(22L))
  }

  test("pageRank: hand-checked update, dangling mass evaporates, edges dedup") {
    // a -> b, b -> a, a -> c (duplicated edge must collapse); c dangling
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("a", "c"))
      .toDF("src", "dst")
    val r1 = LinkGraph.pageRank(edges, "src", "dst", iterations = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // n=3, start 1/3; teleport (1-.85)/3 = .05
    // a gets b's full 1/3; b and c get a's 1/3 / outdeg 2 = 1/6
    assert(math.abs(r1("a") - (0.05 + 0.85 / 3)) < 1e-12)
    assert(math.abs(r1("b") - (0.05 + 0.85 / 6)) < 1e-12)
    assert(math.abs(r1("c") - (0.05 + 0.85 / 6)) < 1e-12)
    // dangling c absorbed mass it never redistributes: total < 1 and shrinking
    val r3 = LinkGraph.pageRank(edges, "src", "dst", iterations = 3)
      .agg(sum("rank")).as[Double].collect().head
    assert(r3 < r1.values.sum && r1.values.sum < 1.0 + 1e-12)
  }

  test("gapFillDaily: missing days appear with n=0 and carried value, per key") {
    val events = Seq(
      ("A", ts("2024-01-01 10:00:00"), 10.0),
      ("A", ts("2024-01-04 10:00:00"), 20.0),
      ("B", ts("2024-01-02 10:00:00"), 5.0),
    ).toDF("event_type", "ts", "value")
    val r = EventAnalytics.gapFillDaily(events, "event_type", "ts", "value")
      .orderBy("event_type", "day")
      .select("event_type", "day", "n", "ffill_value")
      .as[(String, java.sql.Date, Long, Double)].collect().toSeq
    def d(s: String) = java.sql.Date.valueOf(s)
    assert(r == Seq(
      ("A", d("2024-01-01"), 1L, 10.0),
      ("A", d("2024-01-02"), 0L, 10.0),
      ("A", d("2024-01-03"), 0L, 10.0),
      ("A", d("2024-01-04"), 1L, 20.0),
      ("B", d("2024-01-02"), 1L, 5.0)))
  }

  test("rollingActiveUsers: trailing window counts distinct users, capped at the last day") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-03 10:00:00")),
    ).toDF("user_id", "ts")
    val r = EventAnalytics.rollingActiveUsers(events, "user_id", "ts", windowDays = 2)
      .orderBy("day").select("day", "active_2d")
      .as[(java.sql.Date, Long)].collect().toSeq
    def d(s: String) = java.sql.Date.valueOf(s)
    // day1: {1,2}; day2 window {d1,d2}: {1,2}; day3 window {d2,d3}: {2}
    assert(r == Seq((d("2024-01-01"), 2L), (d("2024-01-02"), 2L), (d("2024-01-03"), 1L)))
  }

  test("triangleCount: hand graphs — K4, closed star, dups and self-loops tolerated") {
    // K4 = 4 triangles, 6 edges, 4 nodes
    val k4 = (for { i <- 1L to 4L; j <- 1L to 4L if i < j } yield (i, j))
      .toDF("a", "b")
    val r1 = LinkGraph.triangleCount(k4, "a", "b")
      .as[(Long, Long, Long)].head()
    assert(r1 == ((4L, 6L, 4L)))
    // hub star 0-{1..5} (degree skew) + one closing edge 1-2 → 1 triangle;
    // reversed dups and a self-loop must not change anything
    val star = Seq((0L, 1L), (1L, 0L), (0L, 2L), (0L, 3L), (0L, 4L),
      (0L, 5L), (1L, 2L), (3L, 3L)).toDF("a", "b")
    val r2 = LinkGraph.triangleCount(star, "a", "b")
      .as[(Long, Long, Long)].head()
    assert(r2 == ((6L, 6L, 1L)))
  }

  test("interpolateDaily: straight-line gap values, edge clamping, observed rows untouched") {
    val ev = Seq(
      ("a", "2024-01-01 10:00:00", 4.0), ("a", "2024-01-01 11:00:00", 6.0),
      ("a", "2024-01-04 09:00:00", 40.0),
      ("a", "2024-01-06 09:00:00", 10.0),
      ("b", "2024-01-02 00:00:00", 7.0))
      .toDF("k", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val got = EventAnalytics.interpolateDaily(ev, "k", "ts", "v")
      .orderBy("k", "day")
      .as[(String, java.sql.Date, Long, Double)].collect().toList
      .map { case (k, d, n, v) => (k, d.toString, n, v) }
    assert(got == List(
      ("a", "2024-01-01", 2L, 10.0),            // observed (4+6)
      ("a", "2024-01-02", 0L, 20.0),            // 10 + 30·(1/3)
      ("a", "2024-01-03", 0L, 30.0),            // 10 + 30·(2/3)
      ("a", "2024-01-04", 1L, 40.0),            // observed
      ("a", "2024-01-05", 0L, 25.0),            // 40 + (10-40)·(1/2)
      ("a", "2024-01-06", 1L, 10.0),            // observed
      ("b", "2024-01-02", 1L, 7.0)))            // single-point key
  }

  test("jaccardNeighbors: hand bipartite graph, hub cap, minCommon floor") {
    // suppliers 1,2,3 over parts: 1→{a,b,c}, 2→{b,c,d}, 3→{c,d,e,f}
    // J(1,2) = 2/4, J(2,3) = 2/5, J(1,3) = 1/6 (< minCommon=2 → dropped)
    val edges = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "b"), (2L, "c"), (2L, "d"),
      (3L, "c"), (3L, "d"), (3L, "e"), (3L, "f"),
      (2L, "c") // duplicate edge must not double-count
    ).toDF("s", "p")
    val got = LinkGraph.jaccardNeighbors(edges, "s", "p",
        maxNeighborDegree = 100, minCommon = 2)
      .orderBy("node_a", "node_b")
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(got == List((1L, 2L, 2L, 4L, 0.5), (2L, 3L, 2L, 5L, 0.4)))

    // a hub part shared by everyone (cap=2) is dropped BEFORE the wedge
    // join: degrees shrink too — J(1,2) recomputes over the capped
    // universe as 1/3 ({b} of {a,b} ∪ {b,d})
    val withHub = edges.union(Seq((1L, "hub"), (2L, "hub"), (3L, "hub"))
      .toDF("s", "p"))
    val capped = LinkGraph.jaccardNeighbors(withHub, "s", "p",
        maxNeighborDegree = 2, minCommon = 1)
      .orderBy("node_a", "node_b")
      .as[(Long, Long, Long, Long, Double)].collect().toList
    // kept parts: those with <=2 suppliers → a(1), b(1,2), d(2,3), e(3), f(3)
    // ... c and hub dropped. 1:{a,b} 2:{b,d} 3:{d,e,f}
    assert(capped == List(
      (1L, 2L, 1L, 3L, 1.0 / 3), (2L, 3L, 1L, 4L, 0.25)))
  }

  test("jaccard hub cap BINDS: a planted hub would explode the pair set; the cap removes it") {
    // FALSIFIER for the maxNeighborDegree knob (the q_graph_jaccard scale
    // guard): 400 suppliers all share one hub part (degree 400 = 8× the
    // cap), plus a sparse normal layer (each supplier i also ships parts
    // pi and p(i+1) — a chain, so consecutive suppliers share exactly one
    // normal part). Uncapped, the hub alone manufactures C(400,2) =
    // 79,800 wedge pairs; capped at 50 the hub is dropped BEFORE the
    // self-join and only the chain's 399 one-common pairs remain — the
    // d² blow-up is real on this fixture and the knob demonstrably
    // removes it (cost AND semantics, since degrees recount over the
    // capped universe).
    val n = 400L
    val hub = spark.range(n).select(col("id").as("s"), lit("hub").as("p"))
    val chain = spark.range(n)
      .select(col("id").as("s"), concat(lit("p"), col("id")).as("p"))
      .union(spark.range(n)
        .select(col("id").as("s"), concat(lit("p"), col("id") + 1).as("p")))
    val edges = hub.union(chain)
    val uncapped = LinkGraph.jaccardNeighbors(edges, "s", "p",
      maxNeighborDegree = 1000000, minCommon = 1)
    val capped = LinkGraph.jaccardNeighbors(edges, "s", "p",
      maxNeighborDegree = 50, minCommon = 1)
    val nUncapped = uncapped.count()
    val nCapped = capped.count()
    // uncapped: every supplier pair shares the hub → the full quadratic set
    assert(nUncapped == n * (n - 1) / 2,
      s"planted hub must produce the all-pairs set, got $nUncapped")
    // capped: only the 399 chain adjacencies survive — superlinear drop
    assert(nCapped == n - 1, s"capped pair set should be the chain, got $nCapped")
    assert(nCapped * 100 < nUncapped,
      "the cap must cut the pair set by >100x on a planted hub")
    // and the top-k bound composes: ≤ k rows per canonical left node
    val topk = LinkGraph.jaccardNeighborsTopK(edges, "s", "p",
      maxNeighborDegree = 1000000, minCommon = 1, k = 3)
    val perNode = topk.groupBy("node_a").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(perNode <= 3, s"topK must bound per-node output at k, got $perNode")
    assert(topk.count() <= 3 * n, "topK output must be <= k * |nodes|")
    // rank order inside a node: jaccard desc, node_b asc
    val r0 = topk.filter(col("node_a") === 0L).orderBy("rank")
      .select("rank", "node_b", "jaccard").collect()
    assert(r0.map(_.getLong(0)).toSeq == (1 to r0.length).map(_.toLong),
      "ranks must be 1..k")
    val jacs = r0.map(_.getDouble(2)).toSeq
    assert(jacs == jacs.sorted.reverse, "ranking must be jaccard descending")
  }

  test("sparsified triangle estimator: 64x sample estimate lands within the σ band") {
    // q_graph_triangles runs the EXACT operator on a deterministic
    // 1/4-node sample (partkey ≡ 0 mod 4) and scales by 1/p³ = 64 — the
    // standard unbiased node-sparsification estimator (every triangle
    // survives iff all 3 nodes survive: p³). Its sampling σ under the
    // independent-triangle approximation is sqrt(T·(1/p³ − 1)) =
    // sqrt(63·T); triangles sharing sampled nodes are positively
    // correlated, so the honest band is a few multiples of that. This
    // spec pins the fixture estimate inside 3σ of the exact full-graph
    // count — the minhash_est ~2σ discipline applied to the graph family.
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    def edges(df: org.apache.spark.sql.DataFrame) = {
      val a = df.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
      val b = df.select(col("l_orderkey").as("ok"), col("l_partkey").as("pb"))
      a.join(b, Seq("ok")).filter(col("pa") < col("pb")).select("pa", "pb")
    }
    val exact = LinkGraph.triangleCount(edges(li), "pa", "pb")
      .as[(Long, Long, Long)].head()._3
    val sampled = LinkGraph.triangleCount(
        edges(li.filter(col("l_partkey") % 4 === 0)), "pa", "pb")
      .as[(Long, Long, Long)].head()._3
    val est = 64.0 * sampled
    val sigma = math.sqrt(63.0 * exact)
    info(f"exact=$exact est=$est%.0f sigma=$sigma%.1f dev=${(est - exact) / sigma}%.2f sigma")
    assert(math.abs(est - exact) <= 3 * sigma,
      f"estimate $est%.0f vs exact $exact — outside 3σ ($sigma%.1f)")
  }

  test("topPaths: first-k order, tie-break by event_id, top-N tie order") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1: a -> b -> c, then a 4th event that must NOT appear
      (1L, 1L, ts(1), "a"), (2L, 1L, ts(2), "b"),
      (3L, 1L, ts(3), "c"), (4L, 1L, ts(4), "z"),
      // user 2: same-ts tie at minute 1 -> event_id decides (5 before 6)
      (5L, 2L, ts(1), "a"), (6L, 2L, ts(1), "b"), (7L, 2L, ts(3), "c"),
      // user 3: only two events -> short path
      (8L, 3L, ts(1), "x"), (9L, 3L, ts(2), "y"),
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = EventAnalytics.topPaths(ev, "user_id", "ts", "event_id",
        "event_type", pathLen = 3, topN = 10)
      .as[(String, Long)].collect().toSeq
    // two users share path a>b>c (tie at ts resolved by event_id), one x>y
    assert(out == Seq(("a>b>c", 2L), ("x>y", 1L)))
  }

  test("eventTransitions: counts, probabilities, and deterministic tie order") {
    val events = Seq(
      // user 1: A -> B -> A  (ordered by ts)
      (1L, 10L, ts("2024-01-01 10:00:00"), "A"),
      (1L, 11L, ts("2024-01-01 11:00:00"), "B"),
      (1L, 12L, ts("2024-01-01 12:00:00"), "A"),
      // user 2: A -> A, where the two events TIE on ts and order falls
      // to event_id (20 before 21); then C
      (2L, 21L, ts("2024-01-01 10:00:00"), "A"),
      (2L, 20L, ts("2024-01-01 10:00:00"), "A"),
      (2L, 22L, ts("2024-01-01 11:00:00"), "C"),
    ).toDF("user_id", "event_id", "ts", "event_type")
    val r = EventAnalytics.eventTransitions(events, "user_id", "event_type",
        Seq("ts", "event_id"))
      .orderBy("from_type", "to_type")
      .select("from_type", "to_type", "n", "p")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(r == Seq(
      ("A", "A", 1L, 0.333333), ("A", "B", 1L, 0.333333), ("A", "C", 1L, 0.333333),
      ("B", "A", 1L, 1.0)))
  }

  test("weightedSample: E-S winners match the pow formulation, bad weights filtered") {
    val docs = (1L to 400L).map(i => (i, (i % 37 + 1).toDouble)).toDF("doc_id", "w")
    val got = Sampling.weightedSample(docs, "doc_id", col("w"), n = 50)
      .select("doc_id").as[Long].collect().toSet
    // reference: classic u^(1/w) ranking computed directly
    val expected = (1L to 400L).map { i =>
      val u = (graft.functions.NeutralHash.lower64(i.toString) >>> 11).toDouble /
        9007199254740992.0
      (math.pow(u, 1.0 / (i % 37 + 1)), i)
    }.sortBy { case (k, i) => (-k, i) }.take(50).map(_._2).toSet
    assert(got == expected)
    // n beyond the frame returns everything; non-positive weights drop
    val tiny = Seq((1L, 2.0), (2L, 0.0), (3L, -1.0)).toDF("doc_id", "w")
    val all = Sampling.weightedSample(tiny, "doc_id", col("w"), n = 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(all == Seq(1L))
  }

  test("bigramLogProbAgainst: three backoff tiers score by hand") {
    val corpus = Seq((0L, "a b a b")).toDF("doc_id", "text")
    // model: c(a,b)=2, c(b,a)=1; c_w1: a->2, b->1; V = |{a,b}| = 2
    val probes = Seq(
      (1L, "a b c"), // (a,b) seen: ln(3/4); (b,c) unseen pair: ln(1/(1+2))
      (3L, "x y"),   // (x,y) unknown w1: ln(1/2)
      (5L, "solo"),  // < 2 tokens
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bigramLogProbAgainst(corpus, probes, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_bigrams", "n_unseen", "avg_logp")
      .as[(Long, Long, Option[Double])].collect().toSeq
    def rd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0) == ((2L, 1L, Some(rd((math.log(3.0 / 4.0) + math.log(1.0 / 3.0)) / 2)))))
    assert(r(1) == ((1L, 1L, Some(rd(math.log(1.0 / 2.0))))))
    assert(r(2) == ((0L, 0L, None)))
  }

  test("bigramLogProb: add-one arithmetic on a two-doc corpus, short docs null out") {
    val docs = Seq(
      (1L, "a b a b"),   // bigrams: (a,b)x2, (b,a)x1
      (2L, "a b"),       // bigram (a,b)
      (3L, "solo"),      // < 2 tokens -> null score
      (4L, "A b"),       // lowercases into (a,b)
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_bigrams", "avg_logp").as[(Long, Option[Double])].collect().toSeq
    // model: c(a,b)=4, c(b,a)=1; c_w1: a->4, b->1; V=3 (a, b, solo)
    val pab = math.log(5.0 / 7.0)  // (4+1)/(4+3)
    val pba = math.log(2.0 / 4.0)  // (1+1)/(1+3)
    def rd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0) == ((3L, Some(rd((2 * pab + pba) / 3)))))
    assert(r(1) == ((1L, Some(rd(pab)))))
    assert(r(2) == ((0L, None)))
    assert(r(3) == ((1L, Some(rd(pab)))))
  }
}

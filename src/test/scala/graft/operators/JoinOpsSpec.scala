package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class JoinOpsSpec extends SparkTestBase {

  import spark.implicits._

  test("asofBackward: latest right value at-or-before each left row, per key") {
    val trades = Seq((1L, "a", 10L), (2L, "a", 25L), (3L, "b", 5L), (4L, "a", 7L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("a", 8L, 100.0), ("a", 20L, 110.0), ("b", 9L, 50.0))
      .toDF("sym", "t", "px")
    val out = AsOfJoin.asofBackward(trades, quotes, "sym", "t", "t",
        Map("px" -> "px"))
      .orderBy("trade_id").collect()
    assert(out.map(r => Option(r.get(3))).toSeq ==
      Seq(Some(100.0), Some(110.0), None, None))
    // left row count preserved exactly
    assert(out.length == 4)
  }

  test("asofBackward: tie on timestamp is inclusive (right at equal ts wins)") {
    val l = Seq((1L, "k", 10L)).toDF("id", "k", "t")
    val r = Seq(("k", 10L, 7L)).toDF("k", "t", "v")
    val out = AsOfJoin.asofBackward(l, r, "k", "t", "t", Map("v" -> "v")).collect()
    assert(out(0).getLong(3) == 7L)
  }

  test("asofBackwardWithin: stale matches null out, exact-boundary gap kept") {
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val l = Seq((1L, "k", ts(100)), (2L, "k", ts(200)), (3L, "k", ts(50)))
      .toDF("id", "k", "t")
    val r = Seq(("k", ts(95), 7L), ("k", ts(10), 9L)).toDF("k", "t", "v")
    // tolerance 5 s: id1's match is exactly 5 s back (boundary — kept);
    // id2's latest match is 105 s stale; id3's is 40 s stale
    val out = AsOfJoin.asofBackwardWithin(l, r, "k", "t", "t",
        Map("v" -> "v"), toleranceUs = 5000000L)
      .orderBy("id").collect()
    assert(out.map(x => Option(x.get(3))).toSeq == Seq(Some(7L), None, None))
    assert(out.length == 3) // left rows preserved, like the unbounded form
  }

  test("saltedInnerJoin equals the plain join, with salted partitioning") {
    val skewed = (1 to 2000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "cold"), (30L, "cold")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
    val salted = SkewJoin.saltedInnerJoin(skewed, dim, "k", saltFactor = 8)
      .select("k", "v", "name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("autoSalted consumes the skew profile: salts the hot key, not the uniform key (r7)") {
    // hot fixture: one key holds 80% of the rows — decide() must read
    // that share from the keySkewTopK numbers and choose salting
    val hot = (1 to 1000).map(i => (if (i <= 800) 1L else i.toLong, i))
      .toDF("k", "v")
    val dim = (1L to 1000L).map(k => (k, s"n$k")).toDF("k", "name")
    val dHot = SkewJoin.decide(hot, "k", topShareThreshold = 0.2)
    assert(dHot.salted && math.abs(dHot.topKeyShare - 0.8) < 1e-9,
      s"hot key share must be 0.8 and trigger salting: $dHot")
    // uniform fixture: top share 1/1000 — plain join
    val uni = (1 to 1000).map(i => (i.toLong, i)).toDF("k", "v")
    val dUni = SkewJoin.decide(uni, "k", topShareThreshold = 0.2)
    assert(!dUni.salted && dUni.topKeyShare == 0.001, s"uniform must stay plain: $dUni")
    // same rows on both physical shapes
    val plainHot = hot.join(dim, Seq("k")).select("k", "v", "name")
    val auto = SkewJoin.autoSalted(hot, dim, "k", topShareThreshold = 0.2)
      .select("k", "v", "name")
    assert(auto.exceptAll(plainHot).isEmpty && plainHot.exceptAll(auto).isEmpty)
    // and the salted path really engaged: the join key carries the salt
    assert(auto.queryExecution.analyzed.toString.contains("_salt"),
      "hot-side autoSalted must route through the salted join")
    assert(!SkewJoin.autoSalted(uni, dim, "k", topShareThreshold = 0.2)
      .queryExecution.analyzed.toString.contains("_salt"),
      "uniform-side autoSalted must stay a plain equi-join")
  }

  test("pointInTimeFeatures: per-table staleness bounds, no leakage, independent folds (r8)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val spine = Seq((1L, ts("2024-01-10 00:00:00"), 100L))
      .toDF("user_id", "label_ts", "label_id")
    // view history: one fresh (inside 3d), one future (leakage bait)
    val views = Seq(
      (1L, ts("2024-01-08 00:00:00"), 5.0),
      (1L, ts("2024-01-11 00:00:00"), 99.0)) // AFTER the label — must not leak
      .toDF("user_id", "ts", "f_view")
    // click history: latest is 2 days old — OUTSIDE the 1-day bound
    val clicks = Seq((1L, ts("2024-01-08 00:00:00"), 7.0))
      .toDF("user_id", "ts", "f_click")
    val out = AsOfJoin.pointInTimeFeatures(spine, "user_id", "label_ts", Seq(
        (views, "ts", Map("f_view" -> "f_view"), 3L * 86400000000L),
        (clicks, "ts", Map("f_click" -> "f_click"), 86400000000L)))
      .select("label_id", "f_view", "f_click")
      .as[(Long, Option[Double], Option[Double])].head()
    assert(out == ((100L, Some(5.0), None)),
      s"fresh view carried, future view ignored, stale click nulled: $out")
  }

  test("advise recommends broadcast / salted / shuffle from the planted profiles (r8)") {
    val smallDim = (1L to 50L).map(k => (k, s"n$k")).toDF("k", "name")
    val bigDim = (1L to 2000L).map(k => (k, s"n$k")).toDF("k", "name")
    val hot = (1 to 1000).map(i => (if (i <= 800) 1L else i.toLong, i)).toDF("k", "v")
    val uni = (1 to 1000).map(i => (i.toLong, i)).toDF("k", "v")
    def strat(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      SkewJoin.advise(l, "k", r, "k",
          broadcastMaxRows = 100, topShareThreshold = 0.2)
        .select("strategy", "top_key_share", "est_join_rows", "n_common_keys")
        .as[(String, Double, Long, Long)].head()
    val b = strat(uni, smallDim)
    assert(b._1 == "broadcast" && b._4 == 50, s"small dim must broadcast: $b")
    val sa = strat(hot, bigDim)
    assert(sa._1 == "salted" && math.abs(sa._2 - 0.8) < 1e-9,
      s"hot key past the share threshold must salt: $sa")
    val sh = strat(uni, bigDim)
    assert(sh._1 == "shuffle" && sh._2 == 0.001, s"uniform big join shuffles: $sh")
    // the CMS estimate keeps its over-estimate-only contract: the real
    // join size is |uni ⋈ bigDim| = 1000
    assert(sh._3 >= 1000L, s"est_join_rows must over-estimate: ${sh._3}")
  }

  test("decide on an empty or all-null-key left side: share 0, no salting (r8)") {
    val dim = Seq((1L, "x")).toDF("k", "name")
    val empty = Seq.empty[(Long, Int)].toDF("k", "v")
    val dEmpty = SkewJoin.decide(empty, "k")
    assert(dEmpty == SkewJoin.SaltDecision(0L, 0L, 0.0, salted = false, 16),
      s"empty left must decide share 0 without throwing: $dEmpty")
    // all-null keys: keySkewTopK has no key to count — same no-salt outcome
    val nulls = Seq((null.asInstanceOf[java.lang.Long], 1),
      (null.asInstanceOf[java.lang.Long], 2)).toDF("k", "v")
    val dNull = SkewJoin.decide(nulls, "k")
    assert(!dNull.salted && dNull.topKeyShare == 0.0,
      s"all-null keys must decide share 0: $dNull")
    // and autoSalted on the empty side still produces the (empty) join
    assert(SkewJoin.autoSalted(empty, dim, "k").count() == 0)
  }

  test("binnedRangeJoinCapped equals the row_number-window formulation, including ties") {
    import org.apache.spark.sql.expressions.Window
    // 40 left rows x dense right side: windows overlap, duplicate right
    // timestamps force tie-breaks through the non-ts right columns
    val left = (1 to 40).map(i => (i.toLong, s"u${i % 5}",
      java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 50}%02d:00")))
      .toDF("p_event", "p_user", "p_ts")
    val right = (1 to 300).map(j => (j.toLong, s"v${j % 7}",
      java.sql.Timestamp.valueOf(f"2024-01-01 00:${(j * 3) % 55}%02d:${(j % 2) * 30}%02d")))
      .toDF("s_event", "s_user", "s_ts")
    val k = 4
    val capped = RangeJoin.binnedRangeJoinCapped(left, right, "p_ts", "s_ts",
      lowerSec = 0L, upperSec = 600L, leftKey = Seq("p_event"), k = k)
    val w = Window.partitionBy("p_event")
      .orderBy(col("s_ts").asc, col("s_event").asc, col("s_user").asc)
    val windowed = RangeJoin.binnedRangeJoin(left, right, "p_ts", "s_ts", 0L, 600L)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
    assert(capped.exceptAll(windowed).isEmpty && windowed.exceptAll(capped).isEmpty)
    assert(capped.count() == windowed.count())
    // groups smaller than k keep everything; none exceeds k
    val sizes = capped.groupBy("p_event").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= k) && sizes.nonEmpty)
  }

  test("binnedRangeJoinCapped keeps the k EARLIEST right rows deterministically") {
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "lts")
    // three rows share ts=00:01:00 — the tie-break on (v asc) decides
    val right = Seq(
      ("c", java.sql.Timestamp.valueOf("2024-01-01 00:01:00")),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:01:00")),
      ("b", java.sql.Timestamp.valueOf("2024-01-01 00:01:00")),
      ("z", java.sql.Timestamp.valueOf("2024-01-01 00:00:30")),
      ("x", java.sql.Timestamp.valueOf("2024-01-01 00:05:00")))
      .toDF("v", "rts")
    val out = RangeJoin.binnedRangeJoinCapped(left, right, "lts", "rts",
        0L, 3600L, Seq("id"), k = 3)
      .select("v").collect().map(_.getString(0)).sorted.toSeq
    // earliest is z@00:00:30, then the 00:01:00 tie resolves a < b < c
    assert(out == Seq("a", "b", "z"))
  }

  test("intervalOverlapJoinCapped equals the row_number-window formulation, largest overlaps kept (r8)") {
    import org.apache.spark.sql.expressions.Window
    // dense interval fixture: variable lengths both sides, many overlaps
    // per left interval, equal-overlap ties forcing the right-column
    // tie-break path
    val a = (1 to 40).map(i => (i.toLong, i * 50L, i * 50L + (i % 9 + 1) * 100L))
      .toDF("a_id", "a_s", "a_e")
    val b = (1 to 300).map(j => (j.toLong, j * 7L, j * 7L + (j % 5 + 1) * 60L))
      .toDF("b_id", "b_s", "b_e")
    val k = 3
    val capped = RangeJoin.intervalOverlapJoinCapped(a, b,
      "a_s", "a_e", "b_s", "b_e", binUnits = 200L, leftKey = Seq("a_id"), k = k)
    // replay: overlap DESC, then right columns by NAME asc (b_e, b_id, b_s)
    val w = Window.partitionBy("a_id")
      .orderBy(col("overlap_us").desc, col("b_e").asc, col("b_id").asc, col("b_s").asc)
    val windowed = RangeJoin.intervalOverlapJoin(a, b,
        "a_s", "a_e", "b_s", "b_e", binUnits = 200L)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
    assert(capped.exceptAll(windowed).isEmpty && windowed.exceptAll(capped).isEmpty,
      "capped interval join diverged from the row_number replay")
    assert(capped.count() == windowed.count() && capped.count() > 0)
    // the bound binds: no left interval exceeds k matches; short groups keep all
    val sizes = capped.groupBy("a_id").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= k) && sizes.nonEmpty)
    // output columns preserved: left, right, overlap_us
    assert(capped.columns.toSeq ==
      Seq("a_id", "a_s", "a_e", "b_id", "b_s", "b_e", "overlap_us"))
  }

  test("intervalOverlapJoin: containment, touching endpoints, disjoint — closed semantics") {
    val a = Seq((1L, 100L, 200L), (2L, 300L, 400L), (3L, 500L, 500L))
      .toDF("a_id", "a_s", "a_e")
    val b = Seq(
      (10L, 150L, 160L),  // contained in a1
      (11L, 200L, 250L),  // touches a1's end exactly -> overlap_us = 0
      (12L, 401L, 450L),  // just past a2: disjoint
      (13L, 490L, 500L),  // touches the point-interval a3
    ).toDF("b_id", "b_s", "b_e")
    val out = RangeJoin.intervalOverlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", 50L)
      .select("a_id", "b_id", "overlap_us")
      .orderBy("a_id", "b_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 10L, 10L), (1L, 11L, 0L), (3L, 13L, 0L)))
  }

  test("intervalOverlapJoin emits each pair EXACTLY once across shared bins") {
    // both intervals span many bins together: without the canonical-bin
    // rule this pair would appear once per shared bin
    val a = Seq((1L, 0L, 1000L)).toDF("a_id", "a_s", "a_e")
    val b = Seq((2L, 10L, 990L)).toDF("b_id", "b_s", "b_e")
    val out = RangeJoin.intervalOverlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", 100L)
    assert(out.count() == 1L)
    assert(out.select("overlap_us").as[Long].head() == 980L)
  }

  test("intervalOverlapJoin equals the brute theta join on fixture-derived intervals") {
    val ev = graft.sources.Tables.load(spark, sf(), "events")
    val a = ev.filter(col("event_type") === "view").select(
      col("event_id").as("a_id"), unix_micros(col("ts")).as("a_s"),
      (unix_micros(col("ts")) + (col("event_id") % 7 + 1) * 60000000L).as("a_e"))
    val b = ev.filter(col("event_type") === "purchase").select(
      col("event_id").as("b_id"), unix_micros(col("ts")).as("b_s"),
      (unix_micros(col("ts")) + (col("event_id") % 5 + 1) * 60000000L).as("b_e"))
    val fast = RangeJoin.intervalOverlapJoin(a, b, "a_s", "a_e", "b_s", "b_e",
        binUnits = 600L * 1000000L)
      .select("a_id", "b_id", "overlap_us").orderBy("a_id", "b_id")
      .as[(Long, Long, Long)].collect().toSeq
    val brute = a.join(b, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(col("a_id"), col("b_id"),
        (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s"))).as("o"))
      .orderBy("a_id", "b_id").as[(Long, Long, Long)].collect().toSeq
    assert(fast.nonEmpty && fast == brute)
  }

  test("keySkewTopK: exact heavy hitters, rank ties by key, integer totals") {
    val df = Seq(7L, 7L, 7L, 3L, 3L, 9L, 9L, 1L).toDF("k")
    val out = Profiling.keySkewTopK(df, "k", 3)
      .orderBy("rk")
      .select("k", "cnt", "rk", "n_keys", "n_rows")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // counts: 7->3, 3->2, 9->2, 1->1; tie between 3 and 9 breaks by key asc
    assert(out == Seq(
      (7L, 3L, 1L, 4L, 8L),
      (3L, 2L, 2L, 4L, 8L),
      (9L, 2L, 3L, 4L, 8L)))
  }

  test("vec_dot on length-mismatched vectors is null, like the HOF form") {
    val d = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val r = d.select(graft.functions.VectorFunctions.vecDot($"a", $"b").as("d"))
      .collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getDouble(0) == 11.0)
  }

  test("GraftExtensions: custom expressions callable from SQL") {
    GraftExtensions.register(spark)
    graft.sources.Tables.load(spark, sf(), "embeddings")
      .createOrReplaceTempView("ext_emb")
    val r = spark.sql(
      """SELECT vec_dot(embedding, embedding) AS d, vec_norm(embedding) AS n
        |FROM ext_emb WHERE vec_id = 0""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - r.getDouble(1) * r.getDouble(1)) < 1e-9)
    // word_entropy from SQL matches the Column form and the null contract
    val h = spark.sql(
      "SELECT word_entropy('a b c d'), word_entropy(''), word_entropy(NULL)").head()
    assert(h.getDouble(0) == 2.0 && h.getDouble(1) == 0.0 && h.getDouble(2) == 0.0)
    // clf_weight_sum from SQL matches the static form (INT literals cast)
    val c = spark.sql(
      "SELECT clf_weight_sum('the quick fox', 11, 64), clf_weight_sum(NULL, 11, 64)").head()
    assert(c.getLong(0) == graft.functions.TextClassifier.hashedWeightSum(
      org.apache.spark.unsafe.types.UTF8String.fromString("the quick fox"), 11L, 64))
    assert(c.isNullAt(1))
  }

  test("GraftExtensions: quantization and aggregates callable from SQL") {
    GraftExtensions.register(spark)
    graft.sources.Tables.load(spark, sf(), "embeddings")
      .createOrReplaceTempView("ext_emb2")
    val q = spark.sql(
      "SELECT vec_quant_stats(embedding).q_sum FROM ext_emb2 WHERE vec_id = 0").head()
    assert(!q.isNullAt(0))
    val top = spark.sql(
      """SELECT label, topk_agg(cast(vec_id AS DOUBLE), vec_id, 2) AS t
        |FROM ext_emb2 GROUP BY label""".stripMargin).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      val arr = r.getSeq[org.apache.spark.sql.Row](1)
      assert(arr.size <= 2)
      // top-2 by score desc = the two largest vec_ids of the label
      assert(arr.map(_.getDouble(0)).sorted.reverse == arr.map(_.getDouble(0)))
    }
    val mh = spark.sql(
      """SELECT doc_id, minhash_agg(sh, 16) AS sig FROM (
        |  SELECT 1L AS doc_id, explode(array('a','b','c')) AS sh)
        |GROUP BY doc_id""".stripMargin).head()
    assert(mh.getSeq[Long](1).size == 16)
    val badK = intercept[Exception](spark.sql(
      "SELECT topk_agg(cast(vec_id AS DOUBLE), vec_id, vec_id) FROM ext_emb2"))
    assert(badK.getMessage.contains("integer literal"))
    // mistyped aggregate inputs fail ANALYSIS, not executors
    val badType = intercept[Exception](spark.sql(
      "SELECT minhash_agg(vec_id, 16) FROM ext_emb2").collect())
    assert(badType.getMessage.contains("string"), badType.getMessage)
    // shingling callable from SQL, both distinct and multiplicity forms
    val sh = spark.sql(
      "SELECT word_shingles('a b a b', 2) AS d, word_shingles_all('a b a b', 2) AS m").head()
    assert(sh.getSeq[String](0) == Seq("a b", "b a"))
    assert(sh.getSeq[String](1) == Seq("a b", "b a", "a b"))
  }

  private def GraftExtensions = graft.GraftExtensions
}

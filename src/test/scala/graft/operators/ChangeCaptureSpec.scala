package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Falsifiable hand-computed contracts for the CDC / profiling /
  * retrieval additions: diff classification incl. null-valued updates
  * and all-NULL-vs-absent rows, the apply(base, diff) == next round
  * trip, SCD2 run collapsing + tie order, sessionize's strict-gap
  * boundary, exact profiling stats, and BM25 equality with the brute
  * window formulation. */
class ChangeCaptureSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // ------------------------------------------------------------ snapshotDiff

  test("snapshotDiff classifies insert/delete/update and drops unchanged") {
    val base = Seq(
      (1L, Some("a"), Some(10.0)), // unchanged
      (2L, Some("b"), Some(20.0)), // value update
      (3L, Some("c"), Some(30.0)), // delete
      (4L, None, None),            // all-NULL attrs, unchanged: NOT a diff row
      (5L, Some("e"), Some(50.0)), // -> NULL update
    ).toDF("k", "s", "v")
    val next = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), Some(21.0)),
      (4L, None, None),
      (5L, None, Some(50.0)),
      (6L, Some("f"), Some(60.0)), // insert
    ).toDF("k", "s", "v")
    val out = ChangeCapture.snapshotDiff(base, next, Seq("k"), Seq("s", "v"))
      .orderBy("k")
      .select("k", "change_type")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq(2L -> "update", 3L -> "delete", 5L -> "update", 6L -> "insert"))
  }

  test("snapshotDiff carries old/new values, null on the absent side") {
    val base = Seq((1L, 10.0)).toDF("k", "v")
    val next = Seq((2L, 20.0)).toDF("k", "v")
    val rows = ChangeCapture.snapshotDiff(base, next, Seq("k"), Seq("v"))
      .orderBy("k")
      .select("k", "change_type", "old_v", "new_v")
      .as[(Long, String, Option[Double], Option[Double])].collect().toSeq
    assert(rows == Seq(
      (1L, "delete", Some(10.0), None),
      (2L, "insert", None, Some(20.0))))
  }

  // ------------------------------------------------------------ applyChanges

  test("applyChanges(base, diff(base, next)) reproduces next exactly") {
    val base = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v")
    val next = Seq(
      (1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0)).toDF("k", "s", "v")
    val diff = ChangeCapture.snapshotDiff(base, next, Seq("k"), Seq("s", "v"))
    val changes = diff.select(col("k"),
      col("new_s").as("s"), col("new_v").as("v"),
      when(col("change_type") === "insert", "I")
        .when(col("change_type") === "delete", "D")
        .otherwise("U").as("op"))
    val merged = ChangeCapture.applyChanges(base, changes, Seq("k"), "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(merged == Seq((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0)))
  }

  test("applyChanges delete removes, insert appends, untouched passes through") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val changes = Seq((2L, "ignored", "D"), (3L, "c", "I")).toDF("k", "s", "op")
    val out = ChangeCapture.applyChanges(base, changes, Seq("k"), "op")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq(1L -> "a", 3L -> "c"))
  }

  // ------------------------------------------------------------ scd2FromLog

  test("scd2 collapses equal runs, versions per entity, and flags current") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "bronze"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "bronze"), // same value: collapses
      (1L, ts("2024-01-03 00:00:00"), 3L, "silver"),
      (1L, ts("2024-01-04 00:00:00"), 4L, "bronze"), // back again: NEW version
      (2L, ts("2024-01-01 00:00:00"), 5L, "gold"),
    ).toDF("k", "ts", "seq", "tier")
    val out = ChangeCapture.scd2FromLog(log, "k", "ts", "tier", Seq("seq"))
      .orderBy("k", "version")
      .select("k", "tier", "version", "valid_to", "is_current")
      .as[(Long, String, Long, Option[java.sql.Timestamp], Boolean)]
      .collect().toSeq
    assert(out == Seq(
      (1L, "bronze", 1L, Some(ts("2024-01-03 00:00:00")), false),
      (1L, "silver", 2L, Some(ts("2024-01-04 00:00:00")), false),
      (1L, "bronze", 3L, None, true),
      (2L, "gold", 1L, None, true)))
  }

  test("scd2 null-safe compare: NULL->NULL is no change, x->NULL is a change") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Some("a")),
      (1L, ts("2024-01-02 00:00:00"), 2L, None),
      (1L, ts("2024-01-03 00:00:00"), 3L, None), // collapses into version 2
    ).toDF("k", "ts", "seq", "tier")
    val out = ChangeCapture.scd2FromLog(log, "k", "ts", "tier", Seq("seq"))
      .orderBy("version").select("tier", "version")
      .as[(Option[String], Long)].collect().toSeq
    assert(out == Seq(Some("a") -> 1L, None -> 2L))
  }

  test("scd2 same-ts rows break ties on the tiebreak column") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"), // seq 1 sorts first
    ).toDF("k", "ts", "seq", "tier")
    val out = ChangeCapture.scd2FromLog(log, "k", "ts", "tier", Seq("seq"))
      .orderBy("version").select("tier").as[String].collect().toSeq
    assert(out == Seq("a", "b"))
  }

  // ------------------------------------------------------------ sessionize

  test("sessionize: gap STRICTLY over threshold opens a session; exact boundary stays") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:30:00"), 2L), // exactly 1800s later: SAME session
      (1L, ts("2024-01-01 11:00:01"), 3L), // 1801s later: new session
      (2L, ts("2024-01-01 09:00:00"), 4L),
    ).toDF("user_id", "ts", "event_id")
    val out = ChangeCapture.sessionize(ev, "user_id", "ts", 1800L, Seq("event_id"))
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 2L, 1800L * 1000000L),
      (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L)))
  }

  // ------------------------------------------------------------ profiling

  test("profileColumns: exact nulls/distincts/min-max on a hand frame") {
    val df = Seq(
      (Some(1L), Some("b")), (Some(3L), Some("a")),
      (None, Some("a")), (Some(3L), None),
    ).toDF("n", "s")
    val out = Profiling.profileColumns(df, Seq("n", "s"))
      .orderBy("column_name")
      .select("column_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str")
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String])]
      .collect().toSeq
    assert(out == Seq(
      ("n", 4L, 1L, 2L, Some(1.0), Some(3.0), None, None),
      ("s", 4L, 1L, 2L, None, None, Some("a"), Some("b"))))
  }

  test("profileColumns approxDistinct stays within HLL error on the fixture") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val exact = Profiling.profileColumns(orders, Seq("o_custkey"))
      .select("n_distinct").as[Long].head()
    val approx = Profiling.profileColumns(orders, Seq("o_custkey"), approxDistinct = true)
      .select("n_distinct").as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  // ------------------------------------------------------- count-min sketch

  test("cms estimates are exact without collisions and NEVER undercount") {
    val data = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val df = data.toDF("k")
    val counters = Profiling.cmsCounters(df, col("k"), depth = 4, width = 256)
    // counter mass per depth row = total rows (every row lands once per j)
    val perRow = counters.groupBy("j").agg(sum("cnt").as("m"))
      .select("m").as[Long].collect().toSeq
    assert(perRow == Seq.fill(4)(11L))
    val probes = Seq("a", "b", "c", "never-seen").toDF("k")
    val est = Profiling.cmsEstimates(counters, probes, "k", depth = 4, width = 256)
      .orderBy("k").as[(String, Long)].collect().toMap
    // 3 keys in 4x256 buckets: no collisions -> exact; absent key -> 0
    assert(est == Map("a" -> 7L, "b" -> 3L, "c" -> 1L, "never-seen" -> 0L))
  }

  test("cms overestimates only, even when width forces collisions") {
    // width=2: heavy collisions guaranteed; estimate >= true for EVERY key
    val data = (0 until 200).map(i => s"k${i % 20}")
    val df = data.toDF("k")
    val counters = Profiling.cmsCounters(df, col("k"), depth = 4, width = 2)
    val probes = (0 until 20).map(i => s"k$i").toDF("k")
    val est = Profiling.cmsEstimates(counters, probes, "k", depth = 4, width = 2)
      .as[(String, Long)].collect().toMap
    (0 until 20).foreach { i =>
      assert(est(s"k$i") >= 10L, s"k$i undercounted: ${est(s"k$i")}")
    }
  }

  test("cms rejects non-power-of-two widths loudly") {
    val df = Seq("a").toDF("k")
    intercept[IllegalArgumentException] {
      Profiling.cmsCounters(df, col("k"), depth = 4, width = 100)
    }
  }

  // --------------------------------------------------- outliers & chi-square

  test("iqrOutliers: type-1 quartiles, fences, per-side counts, nulls ignored") {
    // group g: values 1..11 and an outlier 100; n=12, q1 = rank ceil(3)=3
    // -> value 3, q3 = rank 9 -> value 9, iqr 6, lo = -6, hi = 18
    val df = (Seq.range(1, 12).map(v => ("g", Some(v.toDouble))) :+
      (("g", Some(100.0))) :+ (("g", None: Option[Double])))
      .toDF("grp", "v")
    val out = Profiling.iqrOutliers(df, "v", "grp")
      .as[(String, Long, Double, Double, Long, Long)].head()
    assert(out == (("g", 12L, 3.0, 9.0, 0L, 1L)))
  }

  test("iqrOutliers: a NULL group key is a real group, not silently dropped") {
    val df = (Seq.range(1, 12).map(v => (None: Option[String], Some(v.toDouble))) :+
      ((None: Option[String], Some(100.0))) :+ ((Some("g"), Some(1.0))))
      .toDF("grp", "v")
    val out = Profiling.iqrOutliers(df, "v", "grp")
      .orderBy(asc_nulls_first("grp"))
      .as[(Option[String], Long, Double, Double, Long, Long)].collect().toSeq
    assert(out == Seq(
      (None, 12L, 3.0, 9.0, 0L, 1L),
      (Some("g"), 1L, 1.0, 1.0, 0L, 0L)))
  }

  test("madOutliers: hand-checked median/MAD/fence, zero-MAD flags nothing") {
    // 1..9 + 100: n=10, type-1 median = 5; deviations sorted (ties by v)
    // put rank-5 at d=2 -> MAD 2; only d=95 beats 0.6745*d > 3.5*2
    val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ (("g", 100.0)))
      .toDF("grp", "v")
    val out = Profiling.madOutliers(df, "v", "grp")
      .as[(String, Long, Double, Double, Long)].head()
    assert(out == (("g", 10L, 5.0, 2.0, 1L)))
    // constant group: MAD 0, strict inequality flags nothing
    val const = Seq.fill(6)(("c", 7.0)).toDF("grp", "v")
    val out2 = Profiling.madOutliers(const, "v", "grp")
      .as[(String, Long, Double, Double, Long)].head()
    assert(out2 == (("c", 6L, 7.0, 0.0, 0L)))
  }

  test("chiSquare: zero for an exactly independent 2x2, dof counts null levels") {
    // perfectly independent: o(a,b) = ra*cb/n for every cell -> chi2 = 0
    val ind = Seq.fill(4)(("x", "u")) ++ Seq.fill(4)(("y", "u")) ++
      Seq.fill(2)(("x", "v")) ++ Seq.fill(2)(("y", "v"))
    val r = Profiling.chiSquare(ind.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Double)].head()
    assert(r == ((12L, 1L, 0.0)))
    // a NULL category is a level: 3 a-levels (x, y, null) x 2 b-levels
    val withNull = ind ++ Seq((null.asInstanceOf[String], "u"))
    val r2 = Profiling.chiSquare(withNull.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Double)].head()
    assert(r2._1 == 13L && r2._2 == 2L && r2._3 > 0.0)
  }

  test("tfIdfCosinePairs: identical docs score 1.0, disjoint docs never pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "zeta eta theta iota"),
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.tfIdfCosinePairs(
        docs, "doc_id", "text", threshold = 0.5, maxTermDf = 100L)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq((1L, 2L)))
    assert(math.abs(out.head._3 - 1.0) < 1e-12)
  }

  test("tf-idf plan construction is LAZY — no Spark job at build time (r7)") {
    // pre-r7 both tf-idf operators ran an eager docs.count() per CALL —
    // one duplicate corpus scan every time the operator composed into a
    // pipeline. N now rides as a broadcast one-row frame, so building
    // the plan must launch zero jobs.
    // 3 docs so the shared term's idf ln(N/df) = ln(3/2) is nonzero
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"), (3L, "delta eps"))
      .toDF("doc_id", "text")
    val tracker = spark.sparkContext.statusTracker
    val before = tracker.getJobIdsForGroup(null).length
    val pairs = graft.operators.TextAnalysis.tfIdfCosinePairs(
      docs, "doc_id", "text", threshold = 0.1, maxTermDf = 100L)
    val top = graft.operators.TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text")
    assert(tracker.getJobIdsForGroup(null).length == before,
      "plan construction must not run jobs")
    // and the plans still evaluate correctly once an action runs
    assert(pairs.count() == 1L)
    assert(top.count() == 6L)
  }

  // --------------------------------------------------------- join key stats

  test("joinKeyStats: orphans, overlap and fanout on a hand frame with nulls") {
    val left = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None)
      .toDF("lk")
    val right = Seq(Some(1L), Some(1L), Some(3L), None, None)
      .toDF("rk")
    val out = Profiling.joinKeyStats(left, "lk", right, "rk")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    // (n_left_rows, n_left_keys, n_right_rows, n_right_keys,
    //  n_common_keys, left_orphan_rows, right_orphan_rows, max_key_fanout)
    // left: {1:3, 2:1, null:1}; right: {1:2, 3:1, null:2}
    // common = {1}; left orphans = key2(1) + null(1) = 2;
    // right orphans = key3(1) + null(2) = 3; fanout = 3*2 = 6
    assert(out == ((5L, 2L, 5L, 2L, 1L, 2L, 3L, 6L)))
  }

  test("joinKeyStats on the fixture: every order has a customer, not vice versa") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val customer = spark.read.parquet(s"${sf()}/customer.parquet")
    val out = Profiling.joinKeyStats(orders, "o_custkey", customer, "c_custkey")
    val r = out.select("n_left_rows", "left_orphan_rows", "n_right_keys",
      "n_common_keys").as[(Long, Long, Long, Long)].head()
    assert(r._1 > 0 && r._2 == 0L, "orders referencing missing customers")
    assert(r._4 <= r._3)
  }

  // ------------------------------------------------------------ BM25

  test("bm25TopDocs equals the brute window formulation on the fixture") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val fast = TextAnalysis.bm25TopDocs(docs, "doc_id", "text",
        nTerms = 2, minTermLen = 6, topK = 5)
      .orderBy("term", "rk")
      .select("term", "rk", "doc_id")
      .as[(String, Long, Long)].collect().toSeq

    // brute: same tf/dl/df arithmetic, per-term full sort via row_number
    val toks = docs.select(col("doc_id"),
      explode(filter(split(lower(col("text")), "\\s+"), t => t =!= "")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val consts = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val probes = dft.filter(length(col("term")) >= 6)
      .orderBy(col("df").desc, col("term")).limit(2)
    val scored = tf.join(probes, Seq("term")).join(dl, Seq("doc_id"))
      .crossJoin(consts)
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs").cast("double") - col("df") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("score", col("idf") * (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") + lit(1.2) * (lit(0.25) +
          lit(0.75) * col("dl").cast("double") *
            (col("n_docs").cast("double") / col("sum_dl").cast("double")))))
    val w = Window.partitionBy("term").orderBy(col("score").desc, col("doc_id"))
    val brute = scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5).orderBy("term", "rk")
      .select("term", "rk", "doc_id")
      .as[(String, Long, Long)].collect().toSeq

    assert(fast == brute)
  }

  test("bm25 plan: probe join broadcasts and the engine path has no Window") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val plan = TextAnalysis.bm25TopDocs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "bm25 top-k must be the bounded-heap agg, not a window")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "probe terms / consts should broadcast")
  }

  test("cmsJoinSizeEstimate: exact on collision-free hand data, over-estimates only, near-exact on the fixture (r7)") {
    import spark.implicits._
    // hand data: keys {1:3 rows, 2:1} x {1:2, 3:5} -> exact join = 3*2 = 6;
    // 3 distinct keys in 256 buckets ~ collision-free -> estimate == 6
    val a = Seq(1L, 1L, 1L, 2L).toDF("k")
    val b = Seq(1L, 1L, 3L, 3L, 3L, 3L, 3L).toDF("k")
    val est = Profiling.cmsJoinSizeEstimate(
      Profiling.cmsCounters(a, col("k")), Profiling.cmsCounters(b, col("k")))
      .head().getLong(0)
    assert(est == 6L, s"collision-free estimate must be exact: $est")
    // fixture: orders x customer on custkey — over-estimate-only, and at
    // 1500 keys over 4x256 counters the collision inflation stays small
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val customer = spark.read.parquet(s"${sf()}/customer.parquet")
    val fEst = Profiling.cmsJoinSizeEstimate(
      Profiling.cmsCounters(orders, col("o_custkey")),
      Profiling.cmsCounters(customer, col("c_custkey")))
      .head().getLong(0)
    val exact = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
    assert(fEst >= exact, s"CM inner product must over-estimate: $fEst vs $exact")
    assert(fEst <= exact * 3,
      s"estimate too loose for the fixture's cardinality: $fEst vs $exact")
  }

  test("vocabDrift: stable head is flat, a planted term shifts, one-sided terms get zero counts (r7)") {
    import spark.implicits._
    val oldDocs = Seq((1L, "alpha beta gamma alpha"), (2L, "alpha beta delta"))
      .toDF("doc_id", "text")
    val newDocs = Seq((3L, "alpha beta gamma NOVEL"), (4L, "alpha beta NOVEL"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabDrift(oldDocs, newDocs, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byTerm = out.map(t => t._1 -> t).toMap
    // totals: old 7 tokens, new 7 tokens
    assert(byTerm("alpha") == (("alpha", 3L, 2L, math.rint((2.0/7 - 3.0/7)*1e6)/1e6)))
    assert(byTerm("novel")._2 == 0L && byTerm("novel")._3 == 2L,
      s"one-sided term must get a zero old count: ${byTerm("novel")}")
    assert(byTerm("delta")._3 == 0L)
    assert(byTerm("beta")._4 == 0.0, "stable term must shift 0")
    // ordering: highest combined count first, ties by term ascending
    assert(out.head._1 == "alpha" && out(1)._1 == "beta")
  }

  test("tombstone delete: exact visibility immediately, compaction ≡ rebuild over survivors (r7)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val idx = java.nio.file.Files.createTempDirectory("txtidx_del").toString
    TextAnalysis.buildTextIndex(docs, "doc_id", "text", idx, nBuckets = 8)
    val deleted = docs.filter(col("doc_id") % 7 === 0)
    val survivors = docs.filter(col("doc_id") % 7 =!= 0)
    TextAnalysis.deleteFromTextIndex(deleted.select("doc_id"), "doc_id", idx)
    // visibility is exact BEFORE compaction: no deleted doc ever returned
    val deletedIds = deleted.select("doc_id").collect().map(_.getLong(0)).toSet
    val preCompact = TextAnalysis.bm25TopDocsIndexed(spark, idx, nTerms = 3, topK = 10)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(preCompact.nonEmpty && preCompact.forall(!deletedIds.contains(_)),
      "tombstoned docs must never surface in probe results")
    // compaction restores exact stats: index ≡ a rebuild over survivors
    TextAnalysis.compactTextIndex(spark, idx)
    val rebuilt = java.nio.file.Files.createTempDirectory("txtidx_ref").toString
    TextAnalysis.buildTextIndex(survivors, "doc_id", "text", rebuilt, nBuckets = 8)
    def rows(p: String, cols: String*): Set[Seq[Any]] =
      spark.read.parquet(p).select(cols.map(col): _*)
        .collect().map(_.toSeq).toSet
    assert(rows(s"$idx/postings", "doc_id", "term", "tf", "dl", "bucket")
      == rows(s"$rebuilt/postings", "doc_id", "term", "tf", "dl", "bucket"))
    assert(rows(s"$idx/terms", "term", "df", "bucket")
      == rows(s"$rebuilt/terms", "term", "df", "bucket"))
    assert(rows(s"$idx/consts", "n_docs", "sum_dl")
      == rows(s"$rebuilt/consts", "n_docs", "sum_dl"))
    assert(TextAnalysis.bm25TopDocsIndexed(spark, idx, nTerms = 3, topK = 10)
        .orderBy("term", "rk").collect().toSeq
      == TextAnalysis.bm25TopDocsIndexed(spark, rebuilt, nTerms = 3, topK = 10)
        .orderBy("term", "rk").collect().toSeq)
    // tombstones cleared by the compaction
    assert(!new java.io.File(s"$idx/tombstones").exists())
  }

  test("refreshTextIndex ≡ rebuild over old ∪ new: postings, terms, consts, probes") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val full = java.nio.file.Files.createTempDirectory("txtidx_full").toString
    val inc = java.nio.file.Files.createTempDirectory("txtidx_inc").toString
    TextAnalysis.buildTextIndex(docs, "doc_id", "text", full, nBuckets = 8)
    TextAnalysis.buildTextIndex(
      docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", inc, nBuckets = 8)
    TextAnalysis.refreshTextIndex(
      docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", inc)

    def rows(p: String, cols: String*): Set[Seq[Any]] =
      spark.read.parquet(p).select(cols.map(col): _*)
        .collect().map(_.toSeq).toSet
    assert(rows(s"$inc/postings", "doc_id", "term", "tf", "dl", "bucket")
      == rows(s"$full/postings", "doc_id", "term", "tf", "dl", "bucket"))
    assert(rows(s"$inc/terms", "term", "df", "bucket")
      == rows(s"$full/terms", "term", "df", "bucket"))
    assert(rows(s"$inc/consts", "n_docs", "sum_dl")
      == rows(s"$full/consts", "n_docs", "sum_dl"))
    // and a probe against the refreshed index is bit-identical
    val a = TextAnalysis.bm25TopDocsIndexed(spark, full, nTerms = 2, topK = 5)
      .orderBy("term", "rk").collect().toSeq
    val b = TextAnalysis.bm25TopDocsIndexed(spark, inc, nTerms = 2, topK = 5)
      .orderBy("term", "rk").collect().toSeq
    assert(a == b && a.nonEmpty)
    // the disjointness guard catches a re-ingest
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.refreshTextIndex(
        docs.limit(1), "doc_id", "text", inc, checkDisjoint = true)
    }
    assert(e.getMessage.contains("already indexed"))
  }
}

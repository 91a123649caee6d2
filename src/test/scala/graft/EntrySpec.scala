package graft

/** Driver-contract smoke: entry() returns rows on sf0.001; every declared
  * query runs; every query key with an oracle is consistent. */
class EntrySpec extends SparkTestBase {

  test("entry: full-stack flagship query returns rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSeq.sorted == rows.map(_.getString(0)).toSeq)
  }

  test("every oracle key has a query impl") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q_agg_collect: joined-string form equals the raw array form") {
    // the inventory query emits a joined string (the driver's pandas hasher
    // cannot hash array cells); this spec keeps the true array semantics
    import org.apache.spark.sql.functions._
    val arrays = spark.read.parquet(s"${sf()}/customer.parquet")
      .groupBy("c_nationkey")
      .agg(sort_array(collect_list("c_mktsegment")).as("segments"))
      .collect().map(r => r.getAs[Number](0).longValue -> r.getSeq[String](1)).toMap
    val joined = SparkEntry.queries("q_agg_collect")(spark, sf())
      .collect().map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    assert(arrays.keySet == joined.keySet)
    arrays.foreach { case (k, segs) =>
      assert(segs.mkString("|") == joined(k), s"nation $k")
    }
  }

  test("every query runs on sf0.001 and is non-empty unless legitimately empty") {
    val allowedEmpty = Set("q_join_anti", "q_except", "q_agg_having", "q_check_pk")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf()).count()
      assert(allowedEmpty.contains(name) || n > 0, s"$name returned 0 rows")
    }
  }

  test("sharedStages names only registered queries") {
    val unknown = Queries.sharedStages.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"sharedStages entries without queries: $unknown")
  }

  test("selectedQueries: subset filter selects exactly; unknown names fail fast") {
    val all = SparkEntry.selectedQueries(None).map(_._1).toSet
    assert(all == SparkEntry.queries.keySet)
    // blank / whitespace-only filter = no filter (not zero queries)
    assert(SparkEntry.selectedQueries(Some(" , ")).map(_._1).toSet == all)
    val two = SparkEntry.selectedQueries(Some("q_scan_all, q_agg_group"))
    assert(two.map(_._1).toSet == Set("q_scan_all", "q_agg_group"))
    // a typo must be a hard error, never an empty-but-clean run
    val e = intercept[IllegalArgumentException] {
      SparkEntry.selectedQueries(Some("q_scan_all,q_typo_nope"))
    }
    assert(e.getMessage.contains("q_typo_nope"))
  }

  test("bench reports a broken query as an error, never as a fast time") {
    import org.apache.spark.sql.functions._
    val ok: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => s.range(10).toDF("id")
    // fails at ACTION time (noop write), not at declaration — the shape
    // the old swallow-everything catch recorded as a fast success
    val broken: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => s.range(10).toDF("id")
        .withColumn("boom", udf((x: Long) => {
          throw new RuntimeException("deliberate bench failure"); x
        }).apply(col("id")))
    val (results, _) = Bench.runQueries(spark, sf(),
      Seq("q_ok" -> ok, "z_broken" -> broken))
    assert(results.find(_.name == "q_ok").get.err.isEmpty)
    val b = results.find(_.name == "z_broken").get
    assert(b.err.isDefined, "broken query did not surface an error")
    val json = Bench.renderJson(results, sf())
    assert(json.contains(""""errors":1"""), json)
    assert(json.contains(""""z_broken":{"sec":"""), json)
    // warm-stage flags: first shared-stage query cold, second warm
    val (flagged, _) = Bench.runQueries(spark, sf(),
      Seq("q_dedup_spans" -> SparkEntry.queries("q_dedup_spans"),
        "q_dedup_spans_strip" -> SparkEntry.queries("q_dedup_spans_strip")))
    assert(flagged.map(r => (r.name, r.shared, r.warm)) ==
      Seq(("q_dedup_spans", true, false), ("q_dedup_spans_strip", true, true)))
    val fjson = Bench.renderJson(flagged, sf())
    assert(fjson.contains(""""q_dedup_spans":false""") &&
      fjson.contains(""""q_dedup_spans_strip":true"""), fjson)
  }

  test("bench charges ANN index builds separately from the probe queries") {
    val (results, builds) = Bench.runQueries(spark, sf(),
      Seq("q_sim_ivf_indexed" -> SparkEntry.queries("q_sim_ivf_indexed"),
        "q_sim_lsh_indexed" -> SparkEntry.queries("q_sim_lsh_indexed")))
    assert(results.forall(_.err.isEmpty), results.flatMap(_.err).mkString("; "))
    // builds pre-ran (possibly as cache hits from earlier specs — then
    // near-zero seconds, still reported), probes flagged warm
    assert(builds.map(_._1).toSet == Set("ivf_index", "lsh_index"))
    assert(results.forall(_.warm), "probe queries should ride the pre-built index")
    val json = Bench.renderJson(results, sf(), builds)
    assert(json.contains(""""index_build":{"ivf_index":"""), json)
  }
}

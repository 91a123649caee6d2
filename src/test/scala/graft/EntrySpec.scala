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
}

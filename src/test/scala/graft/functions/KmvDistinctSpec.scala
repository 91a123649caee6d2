package graft.functions

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** KMV distinct-count sketch properties: exact below k, bounded error
  * above it, SQL-registered form equals the Column form. */
class KmvDistinctSpec extends SparkTestBase {

  test("kmv is EXACT when the group has fewer than k distinct values") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 7, s"v${i % 40}")).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(SketchAggregates.kmvDistinct(col("v"), 64).as("est"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // 40 distinct values < k=64 -> the sketch IS the exact count
    val exact = df.groupBy("g").agg(countDistinct("v").as("d"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, d) => assert(out(g) == d.toDouble, s"group $g") }
  }

  test("kmv estimate lands within the expected error band on real data") {
    val orders = Tables.load(spark, sf("sf0.01"), "orders")
    val est = orders.groupBy("o_orderstatus")
      .agg(SketchAggregates.kmvDistinct(col("o_custkey").cast("string"), 64)
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = orders.groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (st, d) =>
      val rel = math.abs(est(st) - d) / d.toDouble
      // KMV std error ~ 1/sqrt(k-2) ~ 12.7%; 4 sigma bound (seeded
      // md5 stream -> the outcome is pinned, this guards regressions)
      assert(rel < 0.51, s"status $st: est ${est(st)} vs exact $d (rel $rel)")
    }
  }

  test("kmv SKETCH: sorted k smallest distinct hashes; set algebra exact below k") {
    import spark.implicits._
    // two overlapping segments, both under k=64 distinct -> every sketch
    // is the exhaustive value set, so union/intersection/Jaccard from the
    // sketches must be EXACT, and the arrays sorted ascending
    val df = ((0 until 40).map(i => ("a", s"v$i")) ++
      (20 until 50).map(i => ("b", s"v$i"))).toDF("seg", "v")
    val sk = df.groupBy("seg")
      .agg(SketchAggregates.kmvSketch(col("v"), 64).as("sk"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[java.math.BigDecimal](1).map(_.toBigInteger)).toMap
    assert(sk("a").size == 40 && sk("b").size == 30)
    assert(sk("a") == sk("a").sorted, "ascending")
    assert(sk("b") == sk("b").sorted, "ascending")
    val inter = sk("a").toSet.intersect(sk("b").toSet)
    // md5 is injective on this tiny domain in practice; the 20-value
    // overlap must survive as exactly 20 shared hashes
    assert(inter.size == 20)
    assert(sk("a").toSet.union(sk("b").toSet).size == 50)
  }

  test("kmv SKETCH saturates at k and equals the k smallest of the exact hash set") {
    import spark.implicits._
    val df = (0 until 500).map(i => s"x$i").toDF("v")
    val got = df.agg(SketchAggregates.kmvSketch(col("v"), 64).as("sk"))
      .collect()(0).getSeq[java.math.BigDecimal](0).map(_.toBigInteger)
    val all = (0 until 500).map { i =>
      new java.math.BigInteger(java.lang.Long.toUnsignedString(
        NeutralHash.lower64(s"x$i")))
    }.distinct.sorted.take(64)
    assert(got.toList == all.toList)
  }

  test("kmv_sketch via SQL registration equals the Column form") {
    graft.GraftExtensions.register(spark)
    val docs = Tables.load(spark, sf(), "documents")
    docs.createOrReplaceTempView("kmvsk_docs")
    val viaSql = spark.sql(
      "SELECT lang, kmv_sketch(source, 16) AS sk FROM kmvsk_docs GROUP BY lang")
      .collect().map(r => r.getString(0) ->
        r.getSeq[java.math.BigDecimal](1).toList).toMap
    val viaCol = docs.groupBy("lang")
      .agg(SketchAggregates.kmvSketch(col("source"), 16).as("sk"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[java.math.BigDecimal](1).toList).toMap
    assert(viaSql == viaCol)
  }

  test("kmv via SQL registration equals the Column form") {
    graft.GraftExtensions.register(spark)
    val docs = Tables.load(spark, sf(), "documents")
    docs.createOrReplaceTempView("kmv_docs")
    val viaSql = spark.sql(
      "SELECT lang, kmv_distinct(source, 16) AS est FROM kmv_docs GROUP BY lang")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaCol = docs.groupBy("lang")
      .agg(SketchAggregates.kmvDistinct(col("source"), 16).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaCol)
  }
}

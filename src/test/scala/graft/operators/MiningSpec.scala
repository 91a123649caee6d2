package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand checks for the round-8 mining batch: association rules,
  * merged histogram quantiles, Zipf fit. */
class MiningSpec extends SparkTestBase {
  import spark.implicits._

  test("pairRules: hand support/confidence/lift; duplicates collapse; floor binds") {
    // baskets: 1:{a,b,c} 2:{a,b} 3:{a,b} 4:{b,c} 5:{a}  (N=5)
    // c(a)=4 c(b)=4 c(c)=2; c(a,b)=3 c(b,c)=2 c(a,c)=1
    val b = Seq(
      (1, "a"), (1, "b"), (1, "c"),
      (2, "a"), (2, "b"), (2, "b"), // duplicate line item must not inflate
      (3, "a"), (3, "b"),
      (4, "b"), (4, "c"),
      (5, "a")).toDF("bk", "i")
    val r = MarketBasket.pairRules(b, "bk", "i", minSupport = 2)
      .orderBy("item_a", "item_b")
      .as[(String, String, Long, Double, Double)].collect().toList
    assert(r == List(
      ("a", "b", 3L, 3.0 / 4, 3.0 * 5 / (4 * 4)),
      ("b", "c", 2L, 2.0 / 4, 2.0 * 5 / (4 * 2))))
    // minSupport=2 dropped (a,c) with support 1
    assert(!r.exists(x => x._1 == "a" && x._2 == "c"))
  }

  test("itemRecommendations: symmetric lists, lift-desc order, heap cut binds") {
    // baskets make (a,b) support 3, (b,c) 2, (a,c) 2; with N=5 baskets:
    // lift(a,b) = 3·5/(4·4) = 0.9375, lift(b,c) = 2·5/(4·2) = 1.25,
    // lift(a,c) = 2·5/(4·2) = 1.25
    val b = Seq(
      (1, "a"), (1, "b"), (1, "c"),
      (2, "a"), (2, "b"), (2, "c"),
      (3, "a"), (3, "b"),
      (4, "b"), (4, "c"), // (b,c) 3rd co-occurrence? no: (b,c) in 1,2,4 = 3
      (5, "a")).toDF("bk", "i")
    // recompute by hand: c(a)=4 c(b)=4 c(c)=3; (a,b)=3 (a,c)=2 (b,c)=3
    // lift(a,b)=3·5/16=0.9375  lift(a,c)=2·5/12≈0.8333  lift(b,c)=3·5/12=1.25
    val got = MarketBasket.itemRecommendations(b, "bk", "i",
        minSupport = 2, topN = 1)
      .orderBy("item")
      .as[(String, Long, String, Long, Double)].collect().toList
    // top-1 per item: a→b (0.9375 > 0.8333), b→c (1.25), c→b (1.25)
    assert(got.map(r => (r._1, r._3)) == List(("a", "b"), ("b", "c"), ("c", "b")))
    assert(got.forall(_._2 == 1L))
    // full lists respect lift-desc, partner-asc within each item
    val full = MarketBasket.itemRecommendations(b, "bk", "i",
        minSupport = 2, topN = 5)
      .orderBy("item", "rk")
      .as[(String, Long, String, Long, Double)].collect().toList
    val aList = full.filter(_._1 == "a").map(_._3)
    assert(aList == List("b", "c"))
  }

  test("mergedHistogramQuantiles equals the unsharded histogramQuantiles") {
    val orders = graft.sources.Tables.load(spark, sf(), "orders")
    val merged = Sampling.mergedHistogramQuantiles(
        orders, col("o_custkey") % 4, "o_totalprice",
        binWidth = 10000.0, probs = Seq(0.5, 0.9, 0.99))
      .as[(Double, Double, Double)].head()
    val direct = Sampling.histogramQuantiles(
        orders.withColumn("g", lit(1)), "g", "o_totalprice",
        binWidth = 10000.0, probs = Seq(0.5, 0.9, 0.99))
      .select("p50", "p90", "p99")
      .as[(Double, Double, Double)].head()
    assert(merged == direct)
    // shard choice is irrelevant: any partition of the rows merges to
    // the same counters
    val other = Sampling.mergedHistogramQuantiles(
        orders, col("o_orderkey") % 7, "o_totalprice",
        binWidth = 10000.0, probs = Seq(0.5, 0.9, 0.99))
      .as[(Double, Double, Double)].head()
    assert(other == direct)
  }

  test("zipfFit: exact power-law counts recover slope -1; flat counts give slope 0") {
    // term t_r appears round(1000/r) times for r = 1..20 → ln-ln slope ≈ -1.
    // Build the corpus as repeated single-token docs.
    val docs = (1 to 20).flatMap { r =>
      val n = math.round(1000.0 / r).toInt
      Seq.fill(n)(f"term$r%02d")
    }.toDF("text")
    val fit = TextAnalysis.zipfFit(docs, "text", topN = 20)
      .as[(Long, Double, Double)].head()
    assert(fit._1 == 20L)
    assert(math.abs(fit._2 + 1.0) < 0.01, s"slope ${fit._2} should be ~ -1")
    // a uniform vocabulary is maximally non-Zipf: slope 0
    val flat = (1 to 20).flatMap(r => Seq.fill(50)(f"term$r%02d")).toDF("text")
    val f2 = TextAnalysis.zipfFit(flat, "text", topN = 20)
      .as[(Long, Double, Double)].head()
    assert(math.abs(f2._2) < 1e-12, s"flat corpus slope ${f2._2} should be 0")
  }
}

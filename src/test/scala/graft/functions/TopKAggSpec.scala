package graft.functions

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** TopKAgg: bounded-heap per-group top-k vs the window-sort formulation. */
class TopKAggSpec extends SparkTestBase {

  test("heap semantics: ranks by score desc with id asc tiebreak, k-bounded") {
    val buf = new TopKBuffer(3)
    // ties on 5.0 → smaller id kept first; 1.0 evicted once full
    Seq((1.0, 10L), (5.0, 7L), (3.0, 2L), (5.0, 4L), (2.0, 9L)).foreach {
      case (s, id) => buf.add(s, id)
    }
    assert(buf.sortedPairs.toSeq == Seq((5.0, 4L), (5.0, 7L), (3.0, 2L)))
    // k larger than the input keeps everything
    val small = new TopKBuffer(10)
    Seq((1.0, 1L), (2.0, 2L)).foreach { case (s, id) => small.add(s, id) }
    assert(small.sortedPairs.toSeq == Seq((2.0, 2L), (1.0, 1L)))
  }

  test("heap equals the sort-based reference on randomized inputs") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 200) {
      val k = 1 + rng.nextInt(8)
      val n = rng.nextInt(60)
      // small value domain to force plenty of score ties
      val xs = Seq.fill(n)((rng.nextInt(6).toDouble, rng.nextInt(40).toLong))
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, id) => buf.add(s, id) }
      val expected = xs.sortBy { case (s, id) => (-s, id) }.take(k)
      val got = buf.sortedPairs.toSeq
      assert(got == expected, s"trial $trial k=$k: $got vs $expected")
    }
  }

  test("merge order does not change the result") {
    val rng = new scala.util.Random(7)
    val xs = Seq.fill(100)((rng.nextInt(5).toDouble, rng.nextInt(50).toLong))
    val (l, r) = xs.splitAt(37)
    val whole = new TopKBuffer(6); xs.foreach { case (s, id) => whole.add(s, id) }
    val a = new TopKBuffer(6); l.foreach { case (s, id) => a.add(s, id) }
    val b = new TopKBuffer(6); r.foreach { case (s, id) => b.add(s, id) }
    var i = 0
    while (i < b.size) { a.add(b.scores(i), b.ids(i)); i += 1 }
    assert(a.sortedPairs.toSeq == whole.sortedPairs.toSeq)
  }

  test("agg equals the window row_number formulation on real data") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.load(spark, sf(), "orders")
    val viaAgg = orders.groupBy("o_orderpriority")
      .agg(SketchAggregates.topKAgg(
        col("o_totalprice").cast("double"), col("o_orderkey"), 5).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rk"),
        col("col.score").as("s"), col("col.id").as("id"))
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("o_orderpriority"), col("rk"),
        col("o_totalprice").cast("double").as("s"), col("o_orderkey").as("id"))
    val a = viaAgg.orderBy("o_orderpriority", "rk").collect().toSeq
    val b = viaWindow.orderBy("o_orderpriority", "rk").collect().toSeq
    assert(a == b)
  }

  test("the plan is a partial-merge aggregate, not a window sort") {
    val orders = Tables.load(spark, sf(), "orders")
    val plan = orders.groupBy("o_orderpriority")
      .agg(SketchAggregates.topKAgg(
        col("o_totalprice").cast("double"), col("o_orderkey"), 3).as("top"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window found in:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"no aggregate operator in:\n$plan")
    assert(plan.contains("partial_topkagg") || plan.toLowerCase.contains("partial"),
      s"no partial (map-side) aggregation in:\n$plan")
  }
}

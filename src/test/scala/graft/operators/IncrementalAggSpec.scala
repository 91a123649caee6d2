package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Self-maintainability contract of [[IncrementalAgg]]:
  * merge(state(a), state(b)) == state(a ∪ b) EXACTLY (decimal sums are
  * order-independent), merging is associative, and finish derives the
  * same averages as a from-scratch aggregate. */
class IncrementalAggSpec extends SparkTestBase {

  private val keys = Seq("l_returnflag", "l_linestatus")
  private val measures = Seq("l_quantity", "l_extendedprice")

  private def li: DataFrame = Tables.load(spark, sf(), "lineitem")

  private def canon(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("merge of split states equals the from-scratch state, row for row") {
    val full = IncrementalAgg.state(li, keys, measures)
    val a = IncrementalAgg.state(li.filter(col("l_orderkey") % 3 === 0), keys, measures)
    val b = IncrementalAgg.state(li.filter(col("l_orderkey") % 3 =!= 0), keys, measures)
    val merged = IncrementalAgg.merge(keys, measures, a, b)
    assert(merged.schema == full.schema, "state and merged-state schemas must agree")
    assert(canon(merged) == canon(full))
  }

  test("merge is associative: fold order cannot change a single bit") {
    val parts = (0 until 3).map(i =>
      IncrementalAgg.state(li.filter(col("l_orderkey") % 3 === i), keys, measures))
    val leftFold = IncrementalAgg.merge(keys, measures,
      IncrementalAgg.merge(keys, measures, parts(0), parts(1)), parts(2))
    val rightFold = IncrementalAgg.merge(keys, measures,
      parts(0), IncrementalAgg.merge(keys, measures, parts(1), parts(2)))
    assert(canon(leftFold) == canon(rightFold))
  }

  test("finish derives averages identical to a from-scratch aggregate") {
    val viaState = IncrementalAgg.finish(
      IncrementalAgg.merge(keys, measures,
        IncrementalAgg.state(li.filter(col("l_linenumber") <= 2), keys, measures),
        IncrementalAgg.state(li.filter(col("l_linenumber") > 2), keys, measures)),
      keys, measures)
    val scratch = li.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(28,4)")).cast("double").as("sum_l_quantity"),
        round(sum(col("l_quantity").cast("decimal(28,4)")).cast("double") /
          count(col("l_quantity")), 6).as("avg_l_quantity"),
        min(col("l_quantity").cast("decimal(28,4)")).cast("double").as("min_l_quantity"),
        max(col("l_quantity").cast("decimal(28,4)")).cast("double").as("max_l_quantity"),
        sum(col("l_extendedprice").cast("decimal(28,4)")).cast("double").as("sum_l_extendedprice"),
        round(sum(col("l_extendedprice").cast("decimal(28,4)")).cast("double") /
          count(col("l_extendedprice")), 6).as("avg_l_extendedprice"),
        min(col("l_extendedprice").cast("decimal(28,4)")).cast("double").as("min_l_extendedprice"),
        max(col("l_extendedprice").cast("decimal(28,4)")).cast("double").as("max_l_extendedprice"))
      .select(viaState.columns.map(col): _*)
    assert(canon(viaState) == canon(scratch))
  }

  test("groups present in only one delta survive the merge intact") {
    import spark.implicits._
    val a = Seq(("A", "x", 1.0, 10.0), ("B", "y", 2.0, 20.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    val b = Seq(("C", "z", 3.0, 30.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    val merged = IncrementalAgg.merge(keys, measures,
      IncrementalAgg.state(a, keys, measures),
      IncrementalAgg.state(b, keys, measures))
    val full = IncrementalAgg.state(a.unionByName(b), keys, measures)
    assert(canon(merged) == canon(full))
    assert(merged.count() == 3)
  }
}

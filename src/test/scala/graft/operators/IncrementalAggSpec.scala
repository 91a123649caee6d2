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

  test("applyCdc == from-scratch state over the post-change snapshot (real data)") {
    val base = li
    val deletes = base.filter(col("l_orderkey") % 10 === 0)
    val inserts = base.filter(col("l_orderkey") % 7 === 0)
      .withColumn("l_orderkey", col("l_orderkey") + lit(3000000000L))
      .withColumn("l_quantity", col("l_quantity") + lit(100.0))
    val snapshot = base.filter(col("l_orderkey") % 10 =!= 0).unionByName(inserts)
    val maintained = IncrementalAgg.applyCdc(
      IncrementalAgg.state(base, keys, measures),
      keys, measures, inserts, deletes, snapshot)
    val scratch = IncrementalAgg.state(snapshot, keys, measures)
    assert(canon(maintained) == canon(scratch))
  }

  test("applyCdc: deleting THE boundary row forces the min recompute — a skipped recompute is falsified") {
    import spark.implicits._
    val mk = (rows: Seq[(String, String, Double, Double)]) =>
      rows.toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    // group (A,x): min quantity 1.0 lives on exactly ONE row; runner-up 5.0
    val base = mk(Seq(("A", "x", 1.0, 10.0), ("A", "x", 5.0, 20.0),
      ("A", "x", 9.0, 30.0)))
    val deletes = mk(Seq(("A", "x", 1.0, 10.0)))
    val snapshot = mk(Seq(("A", "x", 5.0, 20.0), ("A", "x", 9.0, 30.0)))
    val out = IncrementalAgg.applyCdc(
      IncrementalAgg.state(base, keys, measures), keys, measures,
      inserts = snapshot.limit(0), deletes = deletes, snapshot = snapshot)
    val row = IncrementalAgg.finish(out, keys, measures)
      .select("n_rows", "min_l_quantity", "max_l_quantity").as[(Long, Double, Double)].head()
    // the candidate (stale) min would be 1.0; correct is the runner-up 5.0
    assert(row == ((2L, 5.0, 9.0)))
  }

  test("applyCdc: fully-deleted groups vanish; insert-only groups appear") {
    import spark.implicits._
    val mk = (rows: Seq[(String, String, Double, Double)]) =>
      rows.toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    val base = mk(Seq(("A", "x", 1.0, 1.0), ("B", "y", 2.0, 2.0)))
    val deletes = mk(Seq(("B", "y", 2.0, 2.0)))
    val inserts = mk(Seq(("C", "z", 3.0, 3.0)))
    val snapshot = mk(Seq(("A", "x", 1.0, 1.0), ("C", "z", 3.0, 3.0)))
    val out = IncrementalAgg.applyCdc(
      IncrementalAgg.state(base, keys, measures), keys, measures,
      inserts, deletes, snapshot)
    assert(canon(out) == canon(IncrementalAgg.state(snapshot, keys, measures)))
    val groups = out.select("l_returnflag").as[String].collect().toSet
    assert(groups == Set("A", "C"))
  }

  test("applyCdc: a NULL group key is ONE group — null-safe state joins, dirty recompute reachable") {
    import spark.implicits._
    // NULL keys are legitimate groups (a LEFT-join view's null-extended
    // rows under a B-side agg key): the three state frames must merge
    // the NULL group null-safely (plain equality would split it into
    // duplicate partial rows), and a boundary delete in the NULL group
    // must reach the snapshot's NULL rows through the dirty semi-scan.
    val s0 = Seq((Some("g1"), 10.0), (None, 5.0), (None, 1.0), (None, 9.0))
      .toDF("k", "v")
    val ins = Seq((Option.empty[String], 4.0), (Some("g2"), 7.0)).toDF("k", "v")
    // delete the NULL group's MIN row (1.0): min is not retractable, so
    // a recompute that cannot see NULL-key snapshot rows returns a
    // wrong boundary or a split group
    val del = Seq((Option.empty[String], 1.0)).toDF("k", "v")
    val snap = Seq((Some("g1"), 10.0), (None, 5.0), (None, 9.0), (None, 4.0),
      (Some("g2"), 7.0)).toDF("k", "v")
    val got = IncrementalAgg.applyCdc(
      IncrementalAgg.state(s0, Seq("k"), Seq("v")),
      Seq("k"), Seq("v"), ins, del, snap)
    val want = IncrementalAgg.state(snap, Seq("k"), Seq("v"))
    assert(canon(got.select(want.columns.map(col): _*)) == canon(want),
      "NULL-key group must fold exactly (one row, recomputed min 4.0)")
    assert(got.filter(col("k").isNull).count() == 1,
      "the NULL group must not split into duplicate partial rows")
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

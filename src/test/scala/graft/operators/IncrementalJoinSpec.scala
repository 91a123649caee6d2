package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maintenance identity of [[IncrementalJoin]]:
  * applyCdc(joinState(A,B), Δ…) == joinState(A',B') EXACTLY, including
  * the planted traps — new-A × new-B pairs (the double-count), join-key
  * updates (a row MOVES between groups), fan-out keys (many-to-many),
  * and boundary deletes. */
class IncrementalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  // A side: (a_id unique, jk join key, a_val payload)
  private def mkA(rows: (Long, Int, String)*): DataFrame =
    rows.toDF("a_id", "jk", "a_val")
  // B side: (b_id unique, jk join key, b_val payload)
  private def mkB(rows: (Long, Int, String)*): DataFrame =
    rows.toDF("b_id", "jk", "b_val")

  private def maintain(a0: DataFrame, b0: DataFrame,
      aIns: DataFrame, aDelIds: Seq[Long],
      bIns: DataFrame, bDelIds: Seq[Long]): (DataFrame, DataFrame) = {
    val aDel = aDelIds.toDF("a_id")
    val bDel = bDelIds.toDF("b_id")
    val aNew = a0.join(aDel, Seq("a_id"), "left_anti")
      .join(aIns.select("a_id"), Seq("a_id"), "left_anti").unionByName(aIns)
    val bNew = b0.join(bDel, Seq("b_id"), "left_anti")
      .join(bIns.select("b_id"), Seq("b_id"), "left_anti").unionByName(bIns)
    val maintained = IncrementalJoin.applyCdc(
      IncrementalJoin.joinState(a0, b0, Seq("jk")),
      "a_id", "b_id", Seq("jk"),
      aIns, aDel, bIns, bDel, aNew, bNew)
    (maintained, IncrementalJoin.joinState(aNew, bNew, Seq("jk")))
  }

  test("new-A x new-B pairs on a shared join key are counted exactly once") {
    val a0 = mkA((1L, 10, "a1"))
    val b0 = mkB((1L, 10, "b1"))
    // both inserts land on the SAME fresh join key 20 — the pair (2,2)
    // appears in deltaA x B' AND would appear in A' x deltaB without the
    // exclusion; a double-count produces a duplicate row here
    val (got, want) = maintain(a0, b0,
      aIns = mkA((2L, 20, "a2")), aDelIds = Nil,
      bIns = mkB((2L, 20, "b2")), bDelIds = Nil)
    assert(canon(got) == canon(want))
    assert(got.filter($"a_id" === 2L && $"b_id" === 2L).count() == 1L)
  }

  test("join-key update moves a row's pairs between groups") {
    val a0 = mkA((1L, 10, "a1"), (2L, 20, "a2"))
    val b0 = mkB((1L, 10, "b1"), (2L, 20, "b2"), (3L, 20, "b3"))
    // a_id=1 moves from jk 10 to jk 20: loses the (1,1) pair, gains
    // (1,2) and (1,3)
    val (got, want) = maintain(a0, b0,
      aIns = mkA((1L, 20, "a1-moved")), aDelIds = Seq(1L),
      bIns = mkB(), bDelIds = Nil)
    assert(canon(got) == canon(want))
    assert(got.filter($"a_id" === 1L).count() == 2L)
    assert(got.filter($"b_id" === 1L).count() == 0L)
  }

  test("payload update (delete+insert, same key) refreshes every pair it touches") {
    val a0 = mkA((1L, 10, "old"))
    val b0 = mkB((1L, 10, "b1"), (2L, 10, "b2"))
    val (got, want) = maintain(a0, b0,
      aIns = mkA((1L, 10, "new")), aDelIds = Seq(1L),
      bIns = mkB(), bDelIds = Nil)
    assert(canon(got) == canon(want))
    assert(got.filter($"a_val" === "new").count() == 2L)
    assert(got.filter($"a_val" === "old").count() == 0L)
  }

  test("deletes on both sides remove exactly the touched pairs") {
    val a0 = mkA((1L, 10, "a1"), (2L, 10, "a2"), (3L, 30, "a3"))
    val b0 = mkB((1L, 10, "b1"), (2L, 30, "b2"))
    val (got, want) = maintain(a0, b0,
      aIns = mkA(), aDelIds = Seq(2L),
      bIns = mkB(), bDelIds = Seq(2L))
    assert(canon(got) == canon(want))
    // survivors: (1,10)x(1,10) only — a3's partner b2 is gone
    assert(canon(got) == canon(IncrementalJoin.joinState(
      mkA((1L, 10, "a1")), mkB((1L, 10, "b1")), Seq("jk"))))
  }

  test("fan-out join keys stay exact through mixed per-side changes") {
    val a0 = mkA((1L, 10, "a1"), (2L, 10, "a2"), (3L, 20, "a3"), (4L, 30, "a4"))
    val b0 = mkB((1L, 10, "b1"), (2L, 10, "b2"), (3L, 20, "b3"), (4L, 40, "b4"))
    val (got, want) = maintain(a0, b0,
      aIns = mkA((5L, 10, "a5"), (3L, 40, "a3-moved")), aDelIds = Seq(3L, 4L),
      bIns = mkB((5L, 30, "b5"), (1L, 10, "b1-upd")), bDelIds = Seq(1L, 3L))
    assert(canon(got) == canon(want))
  }

  test("empty deltas return the view unchanged, row for row") {
    val a0 = mkA((1L, 10, "a1"), (2L, 20, "a2"))
    val b0 = mkB((1L, 10, "b1"))
    val (got, want) = maintain(a0, b0, mkA(), Nil, mkB(), Nil)
    assert(canon(got) == canon(want))
    assert(got.columns.toSeq ==
      IncrementalJoin.joinState(a0, b0, Seq("jk")).columns.toSeq)
  }

  test("insert-free B side: aSnapshot may be an empty frame (the streaming-CDC shape)") {
    val a0 = mkA((1L, 10, "a1"))
    val b0 = mkB((1L, 10, "b1"), (2L, 20, "b2"))
    val aIns = mkA((2L, 20, "a2"))
    val maintained = IncrementalJoin.applyCdc(
      IncrementalJoin.joinState(a0, b0, Seq("jk")),
      "a_id", "b_id", Seq("jk"),
      aIns, mkA().select("a_id"), mkB(), mkB().select("b_id"),
      aSnapshot = mkA(), bSnapshot = b0)
    val want = IncrementalJoin.joinState(a0.unionByName(aIns), b0, Seq("jk"))
    assert(canon(maintained) == canon(want))
  }

  test("real tables: customer x supplier on nationkey, all change classes at once") {
    val cust = Tables.load(spark, sf(), "customer")
      .select($"c_custkey", $"c_nationkey".as("nationkey"), $"c_acctbal")
    val supp = Tables.load(spark, sf(), "supplier")
      .select($"s_suppkey", $"s_nationkey".as("nationkey"), $"s_acctbal")
    val cDel = cust.filter($"c_custkey" % 13 === 0).select("c_custkey")
      .unionByName(cust.filter($"c_custkey" % 17 === 0).select("c_custkey"))
    val cIns = cust.filter($"c_custkey" % 11 === 0)
      .withColumn("c_custkey", $"c_custkey" + 9000000L)
      .withColumn("nationkey", ($"nationkey" + 7) % 25)
      .unionByName(cust.filter($"c_custkey" % 17 === 0)
        .withColumn("c_acctbal", $"c_acctbal" + 100.0))
    val sDel = supp.filter($"s_suppkey" % 5 === 0).select("s_suppkey")
    val sIns = supp.filter($"s_suppkey" % 3 === 0)
      .withColumn("s_suppkey", $"s_suppkey" + 9000000L)
      .withColumn("nationkey", ($"nationkey" + 3) % 25)
    val cNew = cust.join(cDel, Seq("c_custkey"), "left_anti").unionByName(cIns)
    val sNew = supp.join(sDel, Seq("s_suppkey"), "left_anti").unionByName(sIns)
    val maintained = IncrementalJoin.applyCdc(
      IncrementalJoin.joinState(cust, supp, Seq("nationkey")),
      "c_custkey", "s_suppkey", Seq("nationkey"),
      cIns, cDel, sIns, sDel, cNew, sNew)
    val scratch = IncrementalJoin.joinState(cNew, sNew, Seq("nationkey"))
    assert(maintained.count() == scratch.count())
    assert(canon(maintained) == canon(scratch))
  }

  test("applyCdcWithDelta: deleted ∪ retained == old view, inserted ∪ retained == new view") {
    val a0 = mkA((1L, 10, "a1"), (2L, 10, "a2"), (3L, 20, "a3"))
    val b0 = mkB((1L, 10, "b1"), (2L, 20, "b2"), (3L, 20, "b3"))
    val aIns = mkA((1L, 20, "a1-moved"), (4L, 10, "a4"))
    val aDel = Seq(1L).toDF("a_id")
    val bIns = mkB((4L, 10, "b4"))
    val bDel = Seq(3L).toDF("b_id")
    val aNew = a0.join(aDel, Seq("a_id"), "left_anti")
      .join(aIns.select("a_id"), Seq("a_id"), "left_anti").unionByName(aIns)
    val bNew = b0.join(bDel, Seq("b_id"), "left_anti")
      .join(bIns.select("b_id"), Seq("b_id"), "left_anti").unionByName(bIns)
    val v0 = IncrementalJoin.joinState(a0, b0, Seq("jk"))
    val d = IncrementalJoin.applyCdcWithDelta(v0, "a_id", "b_id", Seq("jk"),
      aIns, aDel, bIns, bDel, aNew, bNew)
    // the delta partitions the old view and rebuilds the new one exactly
    val retained = d.view.exceptAll(d.inserted)
    assert(canon(retained.unionByName(d.deleted)) == canon(v0),
      "retained + deleted must reassemble the OLD view row-multiset")
    assert(canon(d.view) ==
      canon(IncrementalJoin.joinState(aNew, bNew, Seq("jk"))))
    // an update's old pairs are retracted, its new pairs inserted
    // (a_id=1 moves jk 10 → 20, where only b2 survives — b3 is deleted)
    assert(d.deleted.filter($"a_id" === 1L).count() == 1L)
    assert(d.inserted.filter($"a_id" === 1L).count() == 1L)
    assert(d.inserted.filter($"a_id" === 1L && $"b_id" === 2L).count() == 1L)
  }

  test("cascade: join delta feeds IncrementalAgg — agg-on-join view == from-scratch") {
    import graft.operators.IncrementalAgg
    val cust = Tables.load(spark, sf(), "customer")
      .select($"c_custkey", $"c_nationkey".as("nationkey"), $"c_acctbal")
    val supp = Tables.load(spark, sf(), "supplier")
      .select($"s_suppkey", $"s_nationkey".as("nationkey"), $"s_acctbal")
    val cDel = cust.filter($"c_custkey" % 13 === 0).select("c_custkey")
    val cIns = cust.filter($"c_custkey" % 11 === 0)
      .withColumn("c_custkey", $"c_custkey" + 9000000L)
      .withColumn("nationkey", ($"nationkey" + 7) % 25)
    val sDel = supp.filter($"s_suppkey" % 5 === 0).select("s_suppkey")
    val sIns = supp.filter($"s_suppkey" % 3 === 0)
      .withColumn("s_suppkey", $"s_suppkey" + 9000000L)
      .withColumn("nationkey", ($"nationkey" + 3) % 25)
    val cNew = cust.join(cDel, Seq("c_custkey"), "left_anti").unionByName(cIns)
    val sNew = supp.join(sDel, Seq("s_suppkey"), "left_anti").unionByName(sIns)
    val keys = Seq("nationkey")
    val measures = Seq("c_acctbal", "s_acctbal")
    val v0 = IncrementalJoin.joinState(cust, supp, Seq("nationkey"))
    val delta = IncrementalJoin.applyCdcWithDelta(v0,
      "c_custkey", "s_suppkey", Seq("nationkey"),
      cIns, cDel, sIns, sDel, cNew, sNew)
    val maintained = IncrementalAgg.finish(
      IncrementalAgg.applyCdc(IncrementalAgg.state(v0, keys, measures),
        keys, measures, delta.inserted, delta.deleted, delta.view),
      keys, measures)
    val scratch = IncrementalAgg.finish(
      IncrementalAgg.state(
        IncrementalJoin.joinState(cNew, sNew, Seq("nationkey")),
        keys, measures),
      keys, measures)
    assert(canon(maintained) == canon(scratch))
    assert(maintained.count() > 0)
  }

  test("snowflake: the first fold's delta drives a second fold — key-move and double-count at level 2") {
    // (A ⋈ B) ⋈ C with the level-1 delta as level-2's A-side CDC and the
    // MAINTAINED V1′ as its A snapshot (bases never re-joined). Traps:
    //  - level-2 key-move: a_id=1 moves jk 10 → 20, so its V2 rows must
    //    leave C group 10 and re-enter group 20 (which also gains a
    //    SECOND C row — fan-out on the moved-to group);
    //  - level-2 double-count: fresh V1 pairs on jk 30 AND a fresh C row
    //    on 30 — the (new-V1 × new-C) rows must appear exactly once;
    //  - C delete empties group 10 entirely.
    val a0 = mkA((1L, 10, "a1"), (2L, 20, "a2"))
    val b0 = mkB((1L, 10, "b1"), (2L, 20, "b2"))
    val c0 = Seq((1L, 10, "c1"), (2L, 20, "c2")).toDF("c_id", "jk", "c_val")
    val aIns = mkA((1L, 20, "a1-moved"), (3L, 30, "a3"))
    val aDel = Seq(1L).toDF("a_id")
    val bIns = mkB((3L, 30, "b3"))
    val bDel = Seq.empty[Long].toDF("b_id")
    val cIns = Seq((3L, 30, "c3"), (4L, 20, "c4")).toDF("c_id", "jk", "c_val")
    val cDel = Seq(1L).toDF("c_id")
    val aNew = a0.join(aDel, Seq("a_id"), "left_anti").unionByName(aIns)
    val bNew = b0.unionByName(bIns)
    val cNew = c0.join(cDel, Seq("c_id"), "left_anti").unionByName(cIns)
    val abKey = struct($"a_id", $"b_id").as("ab_key")
    val v1 = IncrementalJoin.joinState(a0, b0, Seq("jk"))
    val vd1 = IncrementalJoin.applyCdcWithDelta(v1, "a_id", "b_id", Seq("jk"),
      aIns, aDel, bIns, bDel, aNew, bNew)
    val v2 = IncrementalJoin.applyCdc(
      IncrementalJoin.joinState(v1.select(abKey, col("*")), c0, Seq("jk")),
      "ab_key", "c_id", Seq("jk"),
      vd1.inserted.select(abKey, col("*")), vd1.deleted.select(abKey),
      cIns, cDel,
      vd1.view.select(abKey, col("*")), cNew)
    val want = IncrementalJoin.joinState(
      IncrementalJoin.joinState(aNew, bNew, Seq("jk")).select(abKey, col("*")),
      cNew, Seq("jk"))
    assert(canon(v2.select(want.columns.map(col): _*)) == canon(want))
    // the traps genuinely fired: group 10 is empty, the moved row pairs
    // with BOTH C rows of group 20, the jk-30 clique appears once
    assert(v2.filter($"jk" === 10).count() == 0)
    assert(v2.filter($"a_id" === 1L).count() == 2)
    assert(v2.filter($"jk" === 30).count() == 1)
  }

  test("applyCdcLeftWithDelta: delta partitions the old view, zero-crossings included") {
    val a0 = mkA((1L, 10, "a1"), (2L, 10, "a2"), (3L, 20, "a3"), (4L, 30, "a4"))
    val b0 = mkB((1L, 10, "b-last"), (2L, 20, "b2"))
    // bDel kills key 10's LAST row (a1,a2 flip to null-extended);
    // bIns gives key 30 its FIRST row (a4 flips to matched);
    // aIns lands matched on 20; aDel removes a matched row
    val aIns = mkA((5L, 20, "a5"))
    val aDel = Seq(3L).toDF("a_id")
    val bIns = mkB((3L, 30, "b3"))
    val bDel = Seq(1L).toDF("b_id")
    val aNew = a0.join(aDel, Seq("a_id"), "left_anti").unionByName(aIns)
    val bNew = b0.join(bDel, Seq("b_id"), "left_anti").unionByName(bIns)
    val v0 = IncrementalJoin.joinStateLeft(a0, b0, Seq("jk"))
    val d = IncrementalJoin.applyCdcLeftWithDelta(v0, "a_id", "b_id", Seq("jk"),
      aIns, aDel, bIns, bDel, aNew, bNew)
    val retained = d.view.exceptAll(d.inserted)
    assert(canon(retained.unionByName(d.deleted)) == canon(v0),
      "retained + deleted must reassemble the OLD left view row-multiset")
    assert(canon(d.view) ==
      canon(IncrementalJoin.joinStateLeft(aNew, bNew, Seq("jk"))))
    // dead-key crossing: a1/a2's matched rows retract, null-extended insert
    assert(d.deleted.filter($"a_id".isin(1L, 2L) && $"b_id".isNotNull).count() == 2)
    assert(d.inserted.filter($"a_id".isin(1L, 2L) && $"b_id".isNull).count() == 2)
    // first-insert crossing: a4's null-extended row retracts, matched inserts
    assert(d.deleted.filter($"a_id" === 4L && $"b_id".isNull).count() == 1)
    assert(d.inserted.filter($"a_id" === 4L && $"b_id" === 3L).count() == 1)
  }

  test("left cascade: left-join delta feeds IncrementalAgg (null measures retract exactly)") {
    import graft.operators.IncrementalAgg
    val cust = Tables.load(spark, sf(), "customer")
      .select($"c_custkey", $"c_nationkey".as("nationkey"), $"c_acctbal")
    // only a third of the nations have suppliers — the null-extended
    // slice is live, and supplier churn fires both zero-crossings
    val supp = Tables.load(spark, sf(), "supplier")
      .filter($"s_nationkey" % 3 === 0)
      .select($"s_suppkey", $"s_nationkey".as("nationkey"), $"s_acctbal")
    val cDel = cust.filter($"c_custkey" % 13 === 0).select("c_custkey")
    val cIns = cust.filter($"c_custkey" % 11 === 0)
      .withColumn("c_custkey", $"c_custkey" + 9000000L)
      .withColumn("nationkey", ($"nationkey" + 7) % 25)
    val sDel = supp.filter($"s_suppkey" % 2 === 0).select("s_suppkey")
    val sIns = supp.filter($"s_suppkey" % 5 === 0)
      .withColumn("s_suppkey", $"s_suppkey" + 9000000L)
      .withColumn("nationkey", ($"nationkey" + 1) % 25)   // first rows for +1 keys
    val cNew = cust.join(cDel, Seq("c_custkey"), "left_anti").unionByName(cIns)
    val sNew = supp.join(sDel, Seq("s_suppkey"), "left_anti").unionByName(sIns)
    val keys = Seq("nationkey")
    val measures = Seq("c_acctbal", "s_acctbal")
    val v0 = IncrementalJoin.joinStateLeft(cust, supp, Seq("nationkey"))
    val delta = IncrementalJoin.applyCdcLeftWithDelta(v0,
      "c_custkey", "s_suppkey", Seq("nationkey"),
      cIns, cDel, sIns, sDel, cNew, sNew)
    val maintained = IncrementalAgg.finish(
      IncrementalAgg.applyCdc(IncrementalAgg.state(v0, keys, measures),
        keys, measures, delta.inserted, delta.deleted, delta.view),
      keys, measures)
    val scratch = IncrementalAgg.finish(
      IncrementalAgg.state(
        IncrementalJoin.joinStateLeft(cNew, sNew, Seq("nationkey")),
        keys, measures),
      keys, measures)
    assert(canon(maintained) == canon(scratch))
    assert(delta.view.filter($"s_suppkey".isNull).count() > 0,
      "fixture must exercise null-measure rows through the agg fold")
  }

  private def maintainLeft(a0: DataFrame, b0: DataFrame,
      aIns: DataFrame, aDelIds: Seq[Long],
      bIns: DataFrame, bDelIds: Seq[Long]): (DataFrame, DataFrame) = {
    val aDel = aDelIds.toDF("a_id")
    val bDel = bDelIds.toDF("b_id")
    val aNew = a0.join(aDel, Seq("a_id"), "left_anti")
      .join(aIns.select("a_id"), Seq("a_id"), "left_anti").unionByName(aIns)
    val bNew = b0.join(bDel, Seq("b_id"), "left_anti")
      .join(bIns.select("b_id"), Seq("b_id"), "left_anti").unionByName(bIns)
    val maintained = IncrementalJoin.applyCdcLeft(
      IncrementalJoin.joinStateLeft(a0, b0, Seq("jk")),
      "a_id", "b_id", Seq("jk"),
      aIns, aDel, bIns, bDel, aNew, bNew)
    (maintained, IncrementalJoin.joinStateLeft(aNew, bNew, Seq("jk")))
  }

  test("left: deleting a key's LAST B row null-extends its untouched A rows") {
    val a0 = mkA((1L, 10, "a1"), (2L, 10, "a2"), (3L, 20, "a3"))
    val b0 = mkB((1L, 10, "b-last"), (2L, 20, "b2"))
    val (got, want) = maintainLeft(a0, b0,
      aIns = mkA(), aDelIds = Nil, bIns = mkB(), bDelIds = Seq(1L))
    assert(canon(got) == canon(want))
    // the zero-crossing actually fired: a1 and a2 survive null-extended
    val nulled = got.filter($"b_id".isNull)
    assert(nulled.count() == 2L, "both jk=10 rows must survive null-extended")
    assert(got.count() == 3L, "no A row may vanish from a LEFT view")
  }

  test("left: a key's FIRST B row re-matches its null-extended A rows") {
    val a0 = mkA((1L, 10, "a1"), (2L, 10, "a2"), (3L, 20, "a3"))
    val b0 = mkB((1L, 20, "b1"))     // jk=10 starts B-less
    val (got, want) = maintainLeft(a0, b0,
      aIns = mkA(), aDelIds = Nil,
      bIns = mkB((2L, 10, "b-first"), (3L, 10, "b-second")), bDelIds = Nil)
    assert(canon(got) == canon(want))
    // stale null-extended rows left; matched pairs arrived (2 A × 2 B)
    assert(got.filter($"jk" === 10 && $"b_id".isNull).count() == 0L)
    assert(got.filter($"jk" === 10).count() == 4L)
  }

  test("left: B update that MOVES a row's join key fires both crossings at once") {
    val a0 = mkA((1L, 10, "a1"), (2L, 20, "a2"))
    val b0 = mkB((1L, 10, "b1"))     // jk=20 starts B-less
    // b1 moves jk 10 → 20: a1 null-extends, a2 matches
    val (got, want) = maintainLeft(a0, b0,
      aIns = mkA(), aDelIds = Nil,
      bIns = mkB((1L, 20, "b1-moved")), bDelIds = Seq(1L))
    assert(canon(got) == canon(want))
    assert(got.filter($"a_id" === 1L && $"b_id".isNull).count() == 1L)
    assert(got.filter($"a_id" === 2L && $"b_val" === "b1-moved").count() == 1L)
  }

  test("left: inserted A rows with no partner land null-extended; NULL join keys never match") {
    val a0 = Seq((1L, Some(10), "a1")).toDF("a_id", "jk", "a_val")
    val b0 = mkB((1L, 10, "b1"), (2L, 30, "b3"))
    val aIns = Seq((2L, Some(99), "a-orphan"), (3L, Option.empty[Int], "a-nullkey"))
      .toDF("a_id", "jk", "a_val")
    val aNew = a0.unionByName(aIns)
    val maintained = IncrementalJoin.applyCdcLeft(
      IncrementalJoin.joinStateLeft(a0, b0, Seq("jk")),
      "a_id", "b_id", Seq("jk"),
      aIns, Seq.empty[Long].toDF("a_id"), mkB(), Seq.empty[Long].toDF("b_id"),
      aNew, b0)
    val want = IncrementalJoin.joinStateLeft(aNew, b0, Seq("jk"))
    assert(canon(maintained) == canon(want))
    assert(maintained.filter($"a_id" === 2L && $"b_id".isNull).count() == 1L)
    assert(maintained.filter($"a_id" === 3L && $"b_id".isNull).count() == 1L)

    // and a later B churn on other keys leaves the null-keyed row alone
    val bIns2 = mkB((9L, 99, "b-late"))
    val b2 = b0.unionByName(bIns2)
    val step2 = IncrementalJoin.applyCdcLeft(maintained,
      "a_id", "b_id", Seq("jk"),
      aIns.limit(0), Seq.empty[Long].toDF("a_id"), bIns2, Seq.empty[Long].toDF("b_id"),
      aNew, b2)
    assert(canon(step2) == canon(IncrementalJoin.joinStateLeft(aNew, b2, Seq("jk"))))
    assert(step2.filter($"a_id" === 3L && $"b_id".isNull).count() == 1L)
    assert(step2.filter($"a_id" === 2L && $"b_val" === "b-late").count() == 1L)
  }

  test("left: real tables, all change classes at once — maintained == full LEFT re-join") {
    val cust = Tables.load(spark, sf(), "customer")
      .select($"c_custkey", $"c_nationkey".as("nationkey"), $"c_acctbal")
    // only 2 suppliers at sf0.001 after the %2 cut: most nations are
    // B-less, so the null-extended slice genuinely dominates
    val supp = Tables.load(spark, sf(), "supplier")
      .filter($"s_suppkey" % 2 === 0)
      .select($"s_suppkey", $"s_nationkey".as("nationkey"), $"s_acctbal")
    val cDel = cust.filter($"c_custkey" % 13 === 0).select("c_custkey")
    val cIns = cust.filter($"c_custkey" % 11 === 0)
      .withColumn("c_custkey", $"c_custkey" + 9000000L)
      .withColumn("nationkey", ($"nationkey" + 7) % 25)
    val sDel = supp.filter($"s_suppkey" % 4 === 0).select("s_suppkey")
    val sIns = supp.filter($"s_suppkey" % 3 === 0)
      .withColumn("s_suppkey", $"s_suppkey" + 9000000L)
      .withColumn("nationkey", ($"nationkey" + 3) % 25)
    val cNew = cust.join(cDel, Seq("c_custkey"), "left_anti").unionByName(cIns)
    val sNew = supp.join(sDel, Seq("s_suppkey"), "left_anti").unionByName(sIns)
    val maintained = IncrementalJoin.applyCdcLeft(
      IncrementalJoin.joinStateLeft(cust, supp, Seq("nationkey")),
      "c_custkey", "s_suppkey", Seq("nationkey"),
      cIns, cDel, sIns, sDel, cNew, sNew)
    val scratch = IncrementalJoin.joinStateLeft(cNew, sNew, Seq("nationkey"))
    assert(canon(maintained) == canon(scratch))
    assert(maintained.filter($"s_suppkey".isNull).count() > 0,
      "fixture must exercise the null-extended slice")
  }

  test("deltaHint: a wide-string-key delta past 64 MB REAL bytes is never hinted") {
    // 40 k rows × ~2 KB string keys ≈ 80 MB of real payload — the
    // retired defaultSize estimate scored this at 40 k × 36 B ≈ 1.4 MB
    // and hinted it straight into a driver-OOM-class broadcast (URLs /
    // composite natural keys are standard CDC join-key shapes). The
    // measured-bytes census must withhold the hint; with no stats on
    // the pinned derived frame the planner then keeps sort-merge.
    // the hint decision is asserted on the ANALYZED plan (ResolvedHint):
    // in this synthetic shape the planner's own propagated pre-pin stats
    // can still broadcast a hintless frame, but the fold's real probe
    // frames are stats-less derived plans where the hint IS the decision
    val wide = spark.range(40000).select(
      concat(col("id").cast("string"), lit("_"), lit("x" * 2048)).as("k"))
    val probe = spark.range(100000).select(
      concat(col("id").cast("string"), lit("_"), lit("x" * 16)).as("k"),
      col("id").as("v"))
    def hintCount(df: DataFrame): Int =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.size
    assert(hintCount(probe.join(IncrementalJoin.deltaHint(wide),
        Seq("k"), "left_semi")) == 0,
      "an ~80 MB-real delta must not be broadcast-hinted")
    // control — same row count, narrow keys (~1 MB real): hinted, and
    // the hint carries through to a broadcast join in the physical plan
    val narrow = spark.range(40000).select(col("id").cast("string").as("k"))
    val narrowJoin = probe.join(IncrementalJoin.deltaHint(narrow),
      Seq("k"), "left_semi")
    assert(hintCount(narrowJoin) == 1,
      "a 1 MB-real delta must keep its broadcast hint")
    assert(narrowJoin.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
      "the hinted narrow delta must plan as a broadcast join")
  }

  test("joinState rejects clashing non-key columns") {
    val a = Seq((1L, 10, "x")).toDF("a_id", "jk", "v")
    val b = Seq((1L, 10, "y")).toDF("b_id", "jk", "v")
    val e = intercept[IllegalArgumentException](
      IncrementalJoin.joinState(a, b, Seq("jk")))
    assert(e.getMessage.contains("v"))
  }
}

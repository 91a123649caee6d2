package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkTestBase {

  test("kAnonymityAudit reports exactly the classes below k; size-k " +
      "classes are anonymous (boundary)") {
    import spark.implicits._
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "x"), // size 3 = k -> anonymous
      ("a", "y"), ("a", "y"),             // size 2 -> violates
      ("b", "x")                          // size 1 -> violates, riskiest
    ).toDF("g1", "g2")
    val out = Privacy.kAnonymityAudit(df, Seq("g1", "g2"), k = 3).collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("b", "x", 1L), ("a", "y", 2L)), "smallest class first")
  }

  test("lDiversityAudit: class below l reported; null sensitive values " +
      "carry no diversity credit") {
    import spark.implicits._
    val df = Seq(
      ("a", Some("s1")), ("a", Some("s2")),          // 2 distinct = l -> ok
      ("b", Some("s1")), ("b", Some("s1")),          // 1 distinct -> violates
      ("c", Some("s1")), ("c", None)                 // null not distinct -> 1
    ).toDF("g", "s")
    val out = Privacy.lDiversityAudit(df, Seq("g"), "s", l = 2).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("b", 1L, 2L), ("c", 1L, 2L)))
  }

  test("generalizationLadder: hand-checked rungs; nested widths make " +
      "suppressed mass monotone; negatives band consistently") {
    import spark.implicits._
    // one QI group, values chosen so width=10 fragments and width=50 heals
    val df = Seq.tabulate(10)(i => ("g", i * 10.0))      // 0,10,...,90
      .++(Seq(("g", -5.0)))                              // negative band
      .toDF("seg", "v")
    val out = Privacy.generalizationLadder(df, Seq("seg"), "v",
      widths = Seq(10L, 50L), k = 3).collect()
    val byW = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // width=10: every value its own class (incl. bucket -10 for -5.0)
    assert(byW(10L) == ((11L, 11L, 1L, 11L)), s"width10: ${byW(10L)}")
    // width=50: buckets -50 (1 row), 0 (5 rows), 50 (5 rows)
    assert(byW(50L) == ((3L, 1L, 1L, 1L)), s"width50: ${byW(50L)}")
    // widths are nested (50 = 5*10): coarser classes are unions of finer
    // ones, so suppression can only shrink up the ladder
    assert(byW(50L)._4 <= byW(10L)._4)
  }

  test("generalizationLadder evaluates ALL widths in one scan of the " +
      "input — no join, no repeated read") {
    import spark.implicits._
    val df = Seq(("g", 1.0), ("g", 2.0)).toDF("seg", "v")
    val plan = Privacy.generalizationLadder(df, Seq("seg"), "v",
      widths = Seq(10L, 100L), k = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"ladder must not join:\n$plan")
    // one Generate (the width explode) over one source, partials before
    // the exchange
    assert("Generate explode".r.findAllIn(plan).size == 1,
      s"expected exactly one explode:\n$plan")
  }

  test("pseudonymize: deterministic, null-preserving, join-preserving, salt-sensitive") {
    import spark.implicits._
    val left = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "payload")
    val right = Seq((1L, 10.0), (1L, 11.0), (3L, 30.0), (4L, 40.0)).toDF("k", "v")
    val joinBefore = left.join(right, Seq("k")).count()
    val pl = Privacy.pseudonymize(left, Seq("k"), salt = "s")
    val pr = Privacy.pseudonymize(right, Seq("k"), salt = "s")
    // joins survive: same (salt, value) -> same token across frames
    assert(pl.join(pr, Seq("k")).count() == joinBefore)
    // tokens are sha-256 hex, not the raw key (md5 rejected: collision-
    // broken hashes could merge two identities into one token)
    val toks = pl.select("k").as[String].collect()
    assert(toks.forall(t => t.matches("[0-9a-f]{64}")))
    assert(toks.distinct.length == 3, "distinct inputs keep distinct tokens")
    // determinism: rebuilding yields the same tokens
    assert(Privacy.pseudonymize(left, Seq("k"), "s").select("k")
      .as[String].collect().toSeq == toks.toSeq)
    // a different salt produces a disjoint token space
    val other = Privacy.pseudonymize(left, Seq("k"), "t")
      .select("k").as[String].collect().toSet
    assert(toks.toSet.intersect(other).isEmpty)
    // NULL stays NULL (no constant sha256(salt) token leaking null-ness)
    val withNull = Seq((Some(1L), "x"), (None, "y"))
      .toDF("k", "payload")
    val pn = Privacy.pseudonymize(withNull, Seq("k"), "s")
    assert(pn.filter(col("k").isNull).count() == 1)
    // untouched columns pass through
    assert(pn.select("payload").as[String].collect().toSet == Set("x", "y"))
    // pure projection: no shuffle, no UDF in the plan
    val plan = pn.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"pseudonymize must not shuffle:\n$plan")
  }

  test("audits validate their floors") {
    import spark.implicits._
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityAudit(df, Seq("g"), k = 1) }
    intercept[IllegalArgumentException] {
      Privacy.lDiversityAudit(df, Seq("g"), "v", l = 1) }
    intercept[IllegalArgumentException] {
      Privacy.generalizationLadder(df, Seq("g"), "v", Seq(), k = 2) }
    intercept[IllegalArgumentException] {
      Privacy.generalizationLadder(df, Seq("g"), "v", Seq(-5L), k = 2) }
  }
}

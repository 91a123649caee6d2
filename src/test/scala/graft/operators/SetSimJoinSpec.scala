package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Falsifies the PPJoin prefix-filter bound against brute force — the
  * operator's whole value is "exact, unlike MinHash", so the spec's job
  * is to break the pigeonhole argument and fail. Three attack surfaces:
  * the real corpus fixture at several thresholds, an ADVERSARIAL fixture
  * whose qualifying pairs sit exactly AT the threshold and share only
  * their most-frequent tokens (the worst case for a rare-first prefix:
  * the shared evidence sorts to the very END of each doc's token order,
  * so the prefix keeps the least possible of it), and the plan itself
  * (no cartesian product anywhere in the filtered path). */
class SetSimJoinSpec extends SparkTestBase {

  private def pairs(df: DataFrame): Seq[(Long, Long, Long, Long, Long, Double)] =
    df.orderBy("id_a", "id_b").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toSeq

  test("prefix-filtered join == brute force on the corpus fixture, several thresholds") {
    val docs = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").filter(col("doc_id") < 200)
    for ((tn, td) <- Seq((19, 20), (4, 5), (1, 2))) {
      val fast = pairs(SetSimJoin.jaccardJoin(docs, "doc_id", "text", tn, td))
      val brute = pairs(SetSimJoin.jaccardJoinBrute(docs, "doc_id", "text", tn, td))
      assert(brute.nonEmpty, s"fixture must qualify pairs at $tn/$td")
      assert(fast == brute,
        s"$tn/$td: lost ${brute.diff(fast).take(3)}, invented ${fast.diff(brute).take(3)}")
    }
  }

  test("boundary pairs at exactly J = t survive, even when shared tokens are the most frequent") {
    import spark.implicits._
    // threshold 2/3; docs a=1, b=2 have 5 tokens each sharing exactly 4
    // -> J = 4/(5+5-4) = 2/3, EXACTLY the threshold. The shared tokens
    // (c1..c4) are planted in every filler doc so their df is maximal:
    // the rare-first order pushes them to the END of a's and b's sorted
    // arrays, and the prefix (len = 5 - ceil(10/3) + 1 = 2) keeps each
    // doc's UNIQUE token plus only ONE shared token — the minimum the
    // pigeonhole bound allows. A one-token-shorter prefix would lose the
    // pair; this spec is the falsifier for exactly that off-by-one.
    val filler = (10L until 40L).map(i => (i, s"c1 c2 c3 c4 f$i g$i h$i"))
    val fixture = (Seq(
      1L -> "c1 c2 c3 c4 onlya",
      2L -> "c1 c2 c3 c4 onlyb",   // J(1,2) = 4/6 = 2/3 boundary
      3L -> "c1 c2 c3 zc wc vc",   // J(1,3) = 3/8 < 2/3: must NOT appear
      4L -> "onlya c2 c3 c4 c1"    // J(1,4) = 1 (same set, order scrambled)
    ) ++ filler).toDF("doc_id", "text")
    val fast = pairs(SetSimJoin.jaccardJoin(fixture, "doc_id", "text", 2, 3))
    val brute = pairs(SetSimJoin.jaccardJoinBrute(fixture, "doc_id", "text", 2, 3))
    assert(fast == brute, s"boundary falsifier: $fast vs $brute")
    val boundary = fast.find(p => p._1 == 1L && p._2 == 2L)
    assert(boundary.isDefined, "the exact-boundary pair (1,2) must qualify")
    assert(boundary.get._6 == 0.666667, "J must round to 6 dp of 2/3")
    assert(fast.exists(p => p._1 == 1L && p._2 == 4L && p._6 == 1.0),
      "identical sets under different token order must score 1.0")
    assert(!fast.exists(p => p._1 == 1L && p._2 == 3L),
      "a below-threshold pair must not qualify")
  }

  test("the filtered plan is never a cartesian product; brute is quarantined to specs") {
    val docs = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").filter(col("doc_id") < 50)
    val plan = SetSimJoin.jaccardJoin(docs, "doc_id", "text", 19, 20)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"prefix filtering must keep the join an equi-join:\n$plan")
  }
}

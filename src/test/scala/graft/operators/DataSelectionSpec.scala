package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._
import graft.operators.DataSelection._

class DataSelectionSpec extends SparkTestBase {
  import spark.implicits._

  test("planted fixture: target-vocabulary docs outrank off-vocabulary docs") {
    // target speaks {alpha beta gamma}; raw docs 1-2 share that
    // vocabulary, raw docs 3-4 speak a disjoint one
    val docs = Seq(
      (0L, "alpha beta gamma alpha beta", true),
      (1L, "alpha beta gamma", false),
      (2L, "beta gamma alpha beta", false),
      (3L, "xx yy zz xx yy", false),
      (4L, "zz zz yy", false)
    ).toDF("doc_id", "text", "tgt")
    val w = dsirLogWeights(docs, "doc_id", "text", col("tgt"), nBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L), "target doc must be excluded")
    // absolute sign is smoothing-dominated at toy counts; the invariant
    // the operator sells is the RANKING: every in-vocabulary doc beats
    // every off-vocabulary doc
    assert(math.min(w(1L), w(2L)) > math.max(w(3L), w(4L)), s"ranking broke: $w")
  }

  test("weights match an exact driver replay of the smoothed log-ratio") {
    val docs = Seq(
      (0L, "a b a", true),
      (1L, "a b", false),
      (2L, "c c", false)
    ).toDF("doc_id", "text", "tgt")
    val B = 32
    def bucket(w: String): Long =
      (graft.functions.NeutralHash.lower64(w) >>> 32) % B
    val all = Seq((0L, "a b a", true), (1L, "a b", false), (2L, "c c", false))
    val occ = all.flatMap { case (id, t, tgt) =>
      t.split("\\s+").map(w => (id, tgt, bucket(w))) }
    val ct = occ.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cr = occ.filterNot(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val (nt, nr) = (ct.values.sum.toDouble, cr.values.sum.toDouble)
    def lr(b: Long): Double =
      math.log((ct.getOrElse(b, 0L) + 1.0) / (nt + B)) -
        math.log((cr.getOrElse(b, 0L) + 1.0) / (nr + B))
    val expected = occ.filterNot(_._2).groupBy(_._1).view.mapValues { os =>
      val s = os.groupBy(_._3).map { case (b, g) =>
        BigDecimal(g.size.toDouble * lr(b)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = dsirLogWeights(docs, "doc_id", "text", col("tgt"), nBuckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    expected.foreach { case (id, e) =>
      assert(math.abs(got(id) - e) < 2e-6, s"doc $id: got ${got(id)}, want $e")
    }
  }

  test("empty raw doc scores exactly 0 and survives the left join") {
    val docs = Seq(
      (0L, "a b", true), (1L, "a", false), (2L, "", false)
    ).toDF("doc_id", "text", "tgt")
    val w = dsirLogWeights(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(2L) == 0.0)
    assert(w.keySet == Set(1L, 2L))
  }

  test("selection is deterministic across partitionings; fixture run sane") {
    val docs = Tables.load(spark, sf(), "documents")
    val a = dsirSelect(docs, "doc_id", "text", col("lang") === "en", k = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = dsirSelect(docs.repartition(7), "doc_id", "text",
        col("lang") === "en", k = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b, "selection must not depend on partitioning")
    assert(a.size == 50)
    // ordering contract: weight desc, id asc on ties
    assert(a.sliding(2).forall { case Seq((i1, w1), (i2, w2)) =>
      w1 > w2 || (w1 == w2 && i1 < i2) })
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.operators.ClassifierTrain._

class ClassifierTrainSpec extends SparkTestBase {
  import spark.implicits._

  test("separable fixture: disjoint vocabularies reach perfect held-out accuracy") {
    // class true speaks {good nice fine}, class false {bad ugly worse};
    // 4 GD steps must separate them completely
    val mk = (i: Long, pos: Boolean) =>
      (i, if (pos) "good nice fine good" else "bad ugly worse bad", pos)
    val docs = (0L until 40L).map(i => mk(i, i % 2 == 0)).toDF("doc_id", "text", "y")
    val w = trainQuantized(docs.filter(col("doc_id") < 20), "doc_id", "text",
      col("y"), buckets = 64, iterations = 4, lr = 1000.0)
    val conf = confusion(docs.filter(col("doc_id") >= 20), "doc_id", "text",
        col("y"), w, buckets = 64)
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(conf.getOrElse((true, true), 0L) == 10L, s"confusion: $conf")
    assert(conf.getOrElse((false, false), 0L) == 10L, s"confusion: $conf")
    assert(!conf.contains((true, false)) && !conf.contains((false, true)))
  }

  test("weights match an exact driver replay of the quantized GD loop") {
    val fixture = Seq(
      (0L, "a b a", true), (1L, "a b", true),
      (2L, "c d c", false), (3L, "c d", false))
    val docs = fixture.toDF("doc_id", "text", "y")
    val B = 32
    def bucket(w: String): Long = graft.functions.NeutralHash.lower64(w) & (B - 1)
    val bags = fixture.map { case (id, t, y) =>
      val ws = t.split("\\s+").filter(_.nonEmpty)
      (id, y, ws.groupBy(bucket).view.mapValues(_.length.toLong).toMap, ws.length.toLong)
    }
    val nD = bags.size
    var w = Map.empty[Long, Long]
    for (_ <- 0 until 3) {
      val grads = scala.collection.mutable.Map.empty[Long, BigDecimal]
      bags.foreach { case (_, y, bag, n) =>
        val m = bag.map { case (b, c) => c * w.getOrElse(b, 0L) }.sum
        val p = 1.0 / (1.0 + math.exp(-(m.toDouble / (n * 1e6))))
        bag.foreach { case (b, c) =>
          val term = BigDecimal((if (y) 1.0 else 0.0) - p) * c / n / nD
          grads(b) = grads.getOrElse(b, BigDecimal(0)) +
            term.setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
      }
      w = (w.keySet ++ grads.keySet).map { b =>
        b -> (w.getOrElse(b, 0L) +
          math.round(1000.0 * grads.getOrElse(b, BigDecimal(0)).toDouble * 1e6))
      }.toMap
    }
    val got = trainQuantized(docs, "doc_id", "text", col("y"),
        buckets = B, iterations = 3, lr = 1000.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == w.keySet)
    w.foreach { case (b, exp) =>
      // driver replay bridges terms per-occurrence-group like the engine;
      // tolerate only the +-1 micro-unit a mid-sum rounding split allows
      assert(math.abs(got(b) - exp) <= 1L, s"bucket $b: got ${got(b)}, want $exp")
    }
  }

  test("training is deterministic across partitionings") {
    val docs = (0L until 30L)
      .map(i => (i, if (i % 3 == 0) "x y z" else "p q r p", i % 3 == 0))
      .toDF("doc_id", "text", "y")
    val a = trainQuantized(docs, "doc_id", "text", col("y"), buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = trainQuantized(docs.repartition(7), "doc_id", "text", col("y"),
        buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("token-less docs are excluded; power-of-two bucket contract enforced") {
    val docs = Seq((0L, "a b", true), (1L, "", false), (2L, "   ", false))
      .toDF("doc_id", "text", "y")
    val w = trainQuantized(docs, "doc_id", "text", col("y"), buckets = 16)
    assert(w.count() > 0)
    intercept[IllegalArgumentException] {
      trainQuantized(docs, "doc_id", "text", col("y"), buckets = 100)
    }
  }
}

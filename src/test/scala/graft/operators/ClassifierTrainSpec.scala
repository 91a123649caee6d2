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

  test("compact and frame training paths produce bit-identical integer weights (r9)") {
    // the compact path (per-doc sparse maps + driver-held weights) and
    // the frame path (model as a DataFrame, two joins per iteration)
    // must quantize to the SAME model: margins are exact integer sums,
    // gradient terms ride DECIMAL(38,12), and the compact path's
    // HALF_UP driver round replicates Spark's round(double) exactly —
    // a real corpus slice (messy token mix) exercises negative
    // gradients and half-point rounds the toy fixtures miss
    val docs = graft.sources.Tables.load(spark, sf(), "documents")
      .filter(col("doc_id") < 300)
    val label = size(filter(split(lower(col("text")), "\\s+"),
      w => w === "join")) >
      size(filter(split(lower(col("text")), "\\s+"), w => w === "scan"))
    def collectW(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val compact = collectW(ClassifierTrain.trainQuantizedCompact(
      docs, "doc_id", "text", label, buckets = 256, iterations = 3, lr = 1000.0))
    val frames = collectW(ClassifierTrain.trainQuantizedFrames(
      docs, "doc_id", "text", label, buckets = 256, iterations = 3, lr = 1000.0))
    assert(compact.nonEmpty, "fixture must observe at least one bucket")
    assert(compact == frames,
      s"paths diverged: ${compact.diff(frames).take(3)} vs ${frames.diff(compact).take(3)}")
  }

  test("small-model and frame-join scoring agree on malformed external weight frames (r10)") {
    // scoreQuantized is a public API accepting ARBITRARY weight frames:
    // the collected small-model path must normalize to the frame-join
    // semantics — null _w scores 0 (the join's coalesce), duplicate _b
    // rows ADD (a join duplicates the bag row per weight row), null _b
    // matches nothing — instead of NPE-ing or silently deduping
    import spark.implicits._
    val docs = Seq((1L, "alpha beta beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val buckets = 256
    // messy model: a null weight, a duplicated bucket, a null bucket
    val bucketed = ClassifierTrain.hashedBags(docs, "doc_id", "text",
      lit(false), buckets).select("_b").distinct()
      .as[Long].collect().sorted
    val messy = Seq(
      (Option(bucketed(0)), Option(5L)),
      (Option(bucketed(0)), Option(7L)),   // duplicate _b: contributions add
      (Option(bucketed(1)), Option.empty[Long]), // null _w: scores 0
      (Option.empty[Long], Option(99L))    // null _b: matches nothing
    ).toDF("_b", "_w")
    // ground truth = the equi-join semantics, replayed driver-side over
    // the bag frame: null _b never matches, null _w coalesces to 0,
    // duplicate _b rows each contribute (so weights add per bucket)
    val wSum = Map(bucketed(0) -> (5L + 7L), bucketed(1) -> 0L)
    val expect = ClassifierTrain.hashedBags(docs, "doc_id", "text",
        lit(false), buckets)
      .select("doc_id", "_b", "_c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map { case (_, b, c) => c * wSum.getOrElse(b, 0L) }.sum)
      .toMap
    val small = ClassifierTrain.scoreQuantized(docs, "doc_id", "text",
        messy, buckets)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(small.nonEmpty)
    small.foreach { case (id, m) =>
      assert(m == expect(id),
        s"doc $id: small-model margin $m != join-semantics ${expect(id)}")
    }
  }

  test("calibration: bins partition the corpus; the separable fixture is sharp at both ends (r8)") {
    val mk = (i: Long, pos: Boolean) =>
      (i, if (pos) "good nice fine good" else "bad ugly worse bad", pos)
    val docs = (0L until 40L).map(i => mk(i, i % 2 == 0)).toDF("doc_id", "text", "y")
    val w = trainQuantized(docs.filter(col("doc_id") < 20), "doc_id", "text",
      col("y"), buckets = 64, iterations = 4, lr = 1000.0)
    val cal = calibration(docs, "doc_id", "text", col("y"), w, buckets = 64)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(cal.map(_._2).sum == 40L, "bins must partition every scored doc")
    cal.foreach { case (bin, _, _, meanP, rate) =>
      assert(meanP >= bin / 10.0 - 1e-9 && meanP <= (bin + 1) / 10.0 + 1e-9,
        s"mean_p $meanP outside bin $bin")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // perfectly separable: the occupied extreme bins are pure
    val lo = cal.head; val hi = cal.last
    assert(lo._5 == 0.0, s"lowest occupied bin must be all-negative: $lo")
    assert(hi._5 == 1.0, s"highest occupied bin must be all-positive: $hi")
  }

  test("semantic quality gate: held-out accuracy and AUC floors; a negated lr fails them (r8)") {
    // planted signal under shared filler noise: ~1/3 of each doc's tokens
    // are class-indicative, the rest draw from a shared 20-word filler
    // vocabulary — unlike the disjoint-vocabulary fixture this is not
    // trivially separable, so a useless-but-replayable training change
    // (sign flip, lr typo) cannot hide behind a symmetric oracle
    val posWords = Vector("good", "nice", "fine", "great", "solid")
    val negWords = Vector("bad", "ugly", "worse", "awful", "poor")
    val filler = (0 until 20).map(k => s"fill$k").toVector
    def h(i: Long, j: Int): Int =
      math.abs(scala.util.hashing.MurmurHash3.stringHash(s"$i:$j"))
    def doc(i: Long): (Long, String, Boolean) = {
      val pos = i % 2 == 0
      val toks = (0 until 12).map { j =>
        if (h(i, j) % 3 == 0) {
          val cls = if (pos) posWords else negWords
          cls(h(i, j + 100) % cls.size)
        } else filler(h(i, j + 200) % filler.size)
      }
      (i, toks.mkString(" "), pos)
    }
    val docs = (0L until 400L).map(doc).toDF("doc_id", "text", "y")
    val train = docs.filter(col("doc_id") < 300)
    val test = docs.filter(col("doc_id") >= 300)
    val w = trainQuantized(train, "doc_id", "text", col("y"),
      buckets = 256, iterations = 4, lr = 1000.0)
    def accuracy(weights: org.apache.spark.sql.DataFrame): Double = {
      val conf = confusion(test, "doc_id", "text", col("y"), weights, 256)
        .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
      val correct = conf.getOrElse((true, true), 0L) + conf.getOrElse((false, false), 0L)
      correct.toDouble / conf.values.sum
    }
    val acc = accuracy(w)
    assert(acc >= 0.9, s"held-out accuracy gate: $acc < 0.9")
    // AUC from per-doc integer margins (hashedBags ⋈ weights — the same
    // inference the confusion uses, kept visible for ranking quality)
    val margins = hashedBags(test, "doc_id", "text", col("y"), 256)
      .join(w, Seq("_b"), "left")
      .groupBy("doc_id", "_y")
      .agg(sum(col("_c") * coalesce(col("_w"), lit(0L))).as("m"))
      .collect().map(r => (r.getBoolean(1), r.getLong(2)))
    val posM = margins.filter(_._1).map(_._2)
    val negM = margins.filter(!_._1).map(_._2)
    val auc = posM.flatMap(p => negM.map(n =>
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0)).sum / (posM.length * negM.length)
    assert(auc >= 0.9, s"held-out AUC gate: $auc < 0.9")
    // FALSIFIER: a sign-flipped learning rate replays numerically but
    // trains an anti-classifier — the gate must catch it
    val wBad = trainQuantized(train, "doc_id", "text", col("y"),
      buckets = 256, iterations = 4, lr = -1000.0)
    val accBad = accuracy(wBad)
    assert(accBad < 0.9, s"negated-lr model must fail the gate: $accBad")
    assert(accBad <= 0.5, s"anti-classifier should be at or below chance: $accBad")
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

package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkTestBase {

  private lazy val docs = Tables.load(spark, sf(), "documents")
  private lazy val emb = Tables.load(spark, sf(), "embeddings")

  test("hybridRrf: fused score is exactly the two rank reciprocals") {
    val out = Retrieval.hybridRrf(docs, "doc_id", "text",
      emb, "vec_id", "embedding", probeId = 0L,
      poolK = 20, rrfK = 60, topK = 10).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val vec = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val expect = lex.map(k => 1.0 / (60.0 + k)).getOrElse(0.0) +
        vec.map(k => 1.0 / (60.0 + k)).getOrElse(0.0)
      assert(r.getDouble(3) == expect) // bit-exact, not approx
      assert(lex.isDefined || vec.isDefined)
    }
    // fused order is non-increasing with id tiebreak
    val scores = out.map(r => (r.getDouble(3), r.getLong(0)))
    assert(scores.sameElements(scores.sortBy { case (s, id) => (-s, id) }))
  }

  test("hybridRrf: probe doc appears in neither ranking") {
    val out = Retrieval.hybridRrf(docs, "doc_id", "text",
      emb, "vec_id", "embedding", probeId = 0L).collect()
    assert(!out.exists(_.getLong(0) == 0L))
  }

  test("hybridRrf: a doc ranked by both lists beats the same ranks split " +
      "across two docs (fusion actually fuses)") {
    val out = Retrieval.hybridRrf(docs, "doc_id", "text",
      emb, "vec_id", "embedding", probeId = 0L, poolK = 20, topK = 20)
      .collect()
    val both = out.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    // fixture sanity: the corpus embeds its own text, so at least one
    // doc should surface on both rankers; if this ever fails the
    // fixture changed and the test needs a planted overlap instead
    assert(both.nonEmpty, "expected at least one doc present in both rankings")
  }

  test("hybridRrfIndexed equals the scan form on an index built over " +
      "corpus-minus-probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hybrid-idx").toString
    TextAnalysis.buildTextIndex(
      docs.filter(col("doc_id") =!= 0L), "doc_id", "text", dir, nBuckets = 16)
    val scan = Retrieval.hybridRrf(docs, "doc_id", "text",
      emb, "vec_id", "embedding", probeId = 0L)
      .orderBy("doc_id").collect()
    val indexed = Retrieval.hybridRrfIndexed(spark, dir,
      emb, "vec_id", "embedding", probeId = 0L)
      .orderBy("doc_id").collect()
    assert(scan.toSeq == indexed.toSeq)
  }

  test("searchEval: hits/precision/MRR match an independent re-derivation " +
      "from the component rankings (zero-hit branch live for lexical)") {
    val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    val out = Retrieval.searchEval(docs, "doc_id", "text",
      emb, "vec_id", "embedding", probeId = 0L, centroids = centroids,
      nprobe = 2, poolK = 20, rrfK = 60, k = 10).head()
    val probe = emb.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).toArray
    val ideal = Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", probe, k = 10)
      .collect().map(_.getLong(0)).toSet
    // independent metric re-derivation per ranking (ordered id lists)
    def expect(ranked: Seq[Long]): (Long, Double, Double) = {
      val hits = ranked.count(ideal)
      val first = ranked.zipWithIndex.collectFirst {
        case (id, i) if ideal(id) => i + 1 }
      (hits.toLong, hits / 10.0, first.map(1.0 / _).getOrElse(0.0))
    }
    val lexIds = TextAnalysis.bm25TopDocs(
        docs.filter(col("doc_id") =!= 0L), "doc_id", "text",
        nTerms = 1, minTermLen = 6, topK = 10)
      .orderBy("rk").collect().map(_.getAs[Long]("doc_id")).toSeq
    val ivfIds = Similarity.ivfTopK(emb.filter(col("vec_id") =!= 0),
        "vec_id", "embedding", centroids, probe, k = 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq
    val rrfIds = Retrieval.hybridRrf(docs, "doc_id", "text",
        emb, "vec_id", "embedding", probeId = 0L, poolK = 20, topK = 10)
      .orderBy(col("rrf").desc, col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    for ((name, ids) <- Seq("lex" -> lexIds, "ivf" -> ivfIds, "rrf" -> rrfIds)) {
      val (hits, prec, mrr) = expect(ids)
      assert(out.getAs[Long](s"hits_$name") == hits, s"hits_$name")
      assert(out.getAs[Double](s"prec_$name") == prec, s"prec_$name")
      assert(out.getAs[Double](s"mrr_$name") == mrr, s"mrr_$name")
    }
    // fixture property this audit exists to surface: the synthetic
    // embeddings are NOT text-derived, so lexical and dense disagree
    // completely — which also keeps the zero-hit MRR branch live
    assert(out.getAs[Long]("hits_lex") == 0L)
    assert(out.getAs[Double]("mrr_lex") == 0.0)
    assert(out.getAs[Long]("hits_ivf") > 0L)
  }

  test("mmrRerank: step 1 is the nearest neighbour; later steps trade " +
      "relevance for diversity") {
    val out = Retrieval.mmrRerank(emb, "vec_id", "embedding",
      probeId = 0L, lambda = 0.7, poolK = 20, topK = 5).orderBy("rk").collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // step 1 must be the plain top-1 by relevance
    val top1 = Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0),
      "vec_id", "embedding",
      emb.filter(col("vec_id") === 0).select("embedding").head.getSeq[Float](0).toArray,
      k = 1).head().getLong(0)
    assert(out.head.getLong(1) == top1)
    // no doc selected twice
    assert(out.map(_.getLong(1)).distinct.length == 5)
  }

  test("mmrRerank: lambda=1 degenerates to plain relevance order") {
    val mmr = Retrieval.mmrRerank(emb, "vec_id", "embedding",
      probeId = 0L, lambda = 1.0, poolK = 20, topK = 5)
      .orderBy("rk").collect().map(_.getLong(1)).toSeq
    val probeVec = emb.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).toArray
    val plain = Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", probeVec, k = 5).collect().map(_.getLong(0)).toSeq
    assert(mmr == plain)
  }

  test("mmrRerank: low lambda picks a MORE diverse set than plain top-k " +
      "(falsifier: if the penalty term were dead, these would be equal)") {
    val mmrSel = Retrieval.mmrRerank(emb, "vec_id", "embedding",
      probeId = 0L, lambda = 0.3, poolK = 20, topK = 5)
      .collect().map(_.getLong(1)).toSet
    val probeVec = emb.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).toArray
    val plainSel = Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", probeVec, k = 5).collect().map(_.getLong(0)).toSet
    def avgPairSim(ids: Set[Long]): Double = {
      val rows: Map[Long, Array[Double]] =
        emb.filter(col("vec_id").isin(ids.toSeq: _*))
          .select("vec_id", "embedding").collect()
          .map(r => r.getLong(0) ->
            r.getSeq[Float](1).map(_.toDouble).toArray).toMap
      val pairs: Seq[Double] = for {
        a <- ids.toSeq; b <- ids.toSeq if a < b
      } yield {
        val (va, vb) = (rows(a), rows(b))
        val dot = va.zip(vb).map { case (x, y) => x * y }.sum
        dot / (math.sqrt(va.map(x => x * x).sum) *
          math.sqrt(vb.map(x => x * x).sum))
      }
      pairs.sum / pairs.length
    }
    assert(mmrSel != plainSel, "λ=0.3 should reorder the selection")
    assert(avgPairSim(mmrSel) < avgPairSim(plainSel),
      "MMR selection should have lower average pairwise similarity")
  }
}

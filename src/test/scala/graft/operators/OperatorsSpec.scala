package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** §2.K operator properties that the DuckDB oracle cannot check:
  * LSH recall vs the exact method, approximate-vs-exact containment,
  * multimodal plumbing shapes. */
class OperatorsSpec extends SparkTestBase {

  private lazy val docs = Tables.load(spark, sf(), "documents")
  private lazy val emb = Tables.load(spark, sf(), "embeddings")

  test("exactDedup keeps one min-id row per distinct text") {
    val dd = Dedup.exactDedup(docs, "doc_id", "text")
    assert(dd.count() == docs.select("text").distinct().count())
  }

  test("minhash LSH candidates recall the exact-Jaccard near-dup pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val cand = Dedup.minHashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(cand.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (missed ${exact -- cand})")
    // precision sanity: candidates shouldn't explode to all pairs
    val nDocs = docs.count()
    assert(cand.size < nDocs * (nDocs - 1) / 4, "candidate set degenerated")
  }

  test("minHashJaccardEstimates track exact Jaccard on the candidate pairs") {
    val shingled = Dedup.shingleExplode(docs, "doc_id", "text")
    val est = Dedup.minHashJaccardEstimates(shingled)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est.nonEmpty, "no candidate pairs on the fixture")
    // exact Jaccard with no df cap for the same pairs
    val exact = Dedup.ngramJaccardPairsFrom(shingled, threshold = 0.0,
        maxShingleDf = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    est.foreach { case (pair, e) =>
      val x = exact.getOrElse(pair, 0.0)
      assert(math.abs(e - x) <= 0.25,
        s"estimate $e vs exact $x for $pair — 64-slot MinHash should be within ~2σ")
      assert(e >= 0.0 && e <= 1.0)
    }
    // estimates are exact multiples of 1/64 (the exact-double contract)
    est.values.foreach(e => assert((e * 64) == math.rint(e * 64)))
  }

  test("incremental LSH vs a persisted band index recalls cross-set near-dups") {
    val existing = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
    // persist the corpus index once (signatures+bands, no text)
    val idxDir = java.nio.file.Files.createTempDirectory("lshidx").toString + "/bands"
    Dedup.minHashBands(Dedup.minHashSignatures(existing, "doc_id", "text"))
      .write.parquet(idxDir)
    val cand = Dedup.minHashCandidatesAgainst(
        Dedup.minHashBands(Dedup.minHashSignatures(fresh, "doc_id", "text")),
        spark.read.parquet(idxDir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: exact cross-set Jaccard pairs (new odd, old even)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        if (a % 2 == 1 && b % 2 == 0) Some((a, b))
        else if (b % 2 == 1 && a % 2 == 0) Some((b, a))
        else None
      }.toSet
    assert(exact.nonEmpty, "fixture should contain cross-set near-dups")
    val recall = exact.count(cand.contains).toDouble / exact.size
    assert(recall >= 0.9, s"incremental LSH recall $recall (missed ${exact -- cand})")
    // and a doc never matches itself or its own half
    assert(cand.forall { case (n, o) => n % 2 == 1 && o % 2 == 0 })
  }

  test("containment catches a doc embedded in a longer one that Jaccard misses") {
    import spark.implicits._
    val prefix = "the quick brown fox jumps over the lazy dog near the river bank today"
    val tail = (0 until 60).map(i => s"filler$i word$i extra$i").mkString(" ")
    val frame = Seq(
      (1L, prefix),                 // short doc
      (2L, s"$prefix $tail"),       // long doc containing it verbatim
      (3L, "completely unrelated text about ships and sails and wind"),
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(frame, "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleDf = 100L)
      .as[(Long, Long, Double)].collect().toSeq
    // every shingle of 1 occurs in 2 -> containment(1->2) = 1.0;
    // the reverse direction is tiny; Jaccard misses the pair entirely
    assert(cont == Seq((1L, 2L, 1.0)))
    val jac = Dedup.ngramJaccardPairs(frame, "doc_id", "text", 3, 0.8, 100L)
    assert(jac.count() == 0, "Jaccard should NOT see the embedded doc")
  }

  test("containment emits both directions against each side's own size") {
    import spark.implicits._
    // two docs sharing their first half: containment differs per side
    val shared = (0 until 20).map(i => s"common$i").mkString(" ")
    val frame = Seq(
      (1L, shared),                                              // 18 shingles, all shared
      (2L, shared + " " + (0 until 20).map(i => s"own$i").mkString(" ")),
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(frame, "doc_id", "text",
        n = 3, threshold = 0.1, maxShingleDf = 100L)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(cont.map(r => (r._1, r._2)) == Seq((1L, 2L), (2L, 1L)))
    val c12 = cont.find(_._1 == 1L).get._3
    val c21 = cont.find(_._1 == 2L).get._3
    assert(c12 == 1.0, s"short side fully contained, got $c12")
    assert(c21 < 0.6 && c21 > 0.3, s"long side partial, got $c21")
  }

  test("simhash: near-dup docs land within small hamming distance") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dists = exact.toSeq.map { case (a, b) =>
      java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    }
    // planted near-dups differ in a few words -> hamming far below random (~32)
    assert(dists.nonEmpty && dists.forall(_ <= 16),
      s"near-dup hamming distances too large: $dists")
  }

  test("ivf top-k recalls most of brute-force top-k, scanning fewer rows") {
    val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    val probe = emb.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    val brute = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", probe, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        centroids, probe, 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.subsetOf(brute) || (ivf intersect brute).size >= 3,
      s"ivf overlap with brute too low: ${(ivf intersect brute).size}")
  }

  test("lsh top-k: self-retrieval, exact rerank, determinism, near-dup recall, pruning") {
    val probe = emb.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    // the probe's own vector shares every sign bit with itself in every
    // table: vec 0 must come back first with cosine 1
    val self = Similarity.lshTopK(emb, "vec_id", "embedding", probe, 5)
    val selfRows = self.collect()
    assert(selfRows.head.getLong(0) == 0L && selfRows.head.getDouble(1) == 1.0)
    // deterministic: seeded planes, no RNG at query time
    assert(self.collect().toSeq == selfRows.toSeq)
    // rerank is EXACT cosine: every returned score equals the brute score
    val bruteScores = emb.select(col("vec_id"),
        round(Similarity.cosine(col("embedding"),
          typedLit(probe.toSeq)), 6).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Similarity.lshTopK(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", probe, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(lsh.forall { case (id, cos) => bruteScores(id) == cos })
    // near-dup retrieval at the default (6 bits x 12 tables): probing
    // with one side of each >=0.45-cosine planted pair must find the
    // partner for most pairs, while scanning a fraction of the corpus.
    // Theory: recall per pair = 1-(1-(1-theta/pi)^6)^12 ~ 0.68 at
    // cos 0.45; the seeded outcome on this fixture is pinned exact.
    val pairs = Similarity.bruteNearDupPairsJoin(emb, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length >= 5, s"fixture lost its planted near-dups: ${pairs.length}")
    val n = emb.count()
    var found = 0; var candTotal = 0L
    pairs.foreach { case (a, b) =>
      val pv = emb.filter(col("vec_id") === a).head().getSeq[Float](1).toArray
      val rest = emb.filter(col("vec_id") =!= a)
      candTotal += Similarity.lshCandidates(rest, "embedding", pv).count()
      val top = Similarity.lshTopK(rest, "vec_id", "embedding", pv, 10)
        .collect().map(_.getLong(0)).toSet
      if (top.contains(b)) found += 1
    }
    assert(found * 2 >= pairs.length,
      s"near-dup recall too low: $found of ${pairs.length}")
    assert(candTotal < pairs.length * n / 4,
      s"candidate set too large: $candTotal over ${pairs.length} probes of $n rows")
  }

  test("materialized LSH index: probed buckets only, equal to the scan form") {
    val probe = emb.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString + "/idx"
    Similarity.buildLshIndex(emb, "vec_id", "embedding", dir)
    // the index fans out over table dirs (one per hash table)
    val tDirs = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val nTables = try tDirs.iterator().asScala
      .count(_.getFileName.toString.startsWith("table=")) finally tDirs.close()
    assert(nTables == 12, s"expected 12 table partitions, got $nTables")
    val indexed = Similarity.lshTopKIndexed(
      spark, dir, "vec_id", "embedding", probe, 10)
    // identical results to the scan-everything formulation
    val direct = Similarity.lshTopK(emb, "vec_id", "embedding", probe, 10)
    assert(indexed.collect().toSeq == direct.collect().toSeq)
    // the probe predicate reaches PARTITION pruning, not a row filter:
    // require a NON-EMPTY PartitionFilters list naming the bucket column
    // (every scan prints "PartitionFilters: [...]", even when empty, and
    // "bucket" appears in the output schema — bare contains() is vacuous)
    val scan = indexed.queryExecution.executedPlan.collectLeaves().head.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(scan).isDefined,
      s"bucket predicate did not reach partition pruning:\n$scan")
  }

  test("nearDupAgainstCorpus: cross-set only, exact cosines, finds planted pairs") {
    val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    val newSide = emb.filter(col("vec_id") % 2 === 1)
    val oldSide = emb.filter(col("vec_id") % 2 === 0)
    val pairs = Similarity.nearDupAgainstCorpus(
        newSide, oldSide, "vec_id", "embedding", centroids, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // strictly new x existing — no within-side pair can appear
    assert(pairs.forall { case (n, o, _) => n % 2 == 1 && o % 2 == 0 })
    // every returned cosine equals the exact brute value
    val brute = Similarity.bruteNearDupPairsJoin(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    pairs.foreach { case (n, o, c) =>
      val key = if (n < o) (n, o) else (o, n)
      assert(brute.get(key).contains(c), s"pair ($n,$o) cos $c not in brute set")
    }
    // exact expected set, computed independently: same-cell cross-parity
    // brute pairs (assignCells is the blocking both paths share)
    val cells = Similarity.assignCells(emb, "embedding", centroids)
      .select("vec_id", "cell_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = brute.keySet.filter { case (a, b) =>
      (a + b) % 2 == 1 && cells(a) == cells(b)
    }.map { case (a, b) => if (a % 2 == 1) (a, b) else (b, a) }
    assert(pairs.map(p => (p._1, p._2)).toSet == expected,
      s"blocked pair set mismatch: got ${pairs.toSeq.sorted}, want $expected")
  }

  test("lshTopKIndexed rejects probe params that mismatch the stored index metadata") {
    val probe = emb.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    val dir = java.nio.file.Files.createTempDirectory("lshmeta").toString + "/idx"
    Similarity.buildLshIndex(emb, "vec_id", "embedding", dir)
    // wrong seed regenerates planes that silently miss every stored
    // signature — the metadata check must turn that into an error
    val e = intercept[IllegalArgumentException] {
      Similarity.lshTopKIndexed(spark, dir, "vec_id", "embedding", probe,
        k = 10, seed = 99L)
    }
    assert(e.getMessage.contains("seed"), e.getMessage)
    // matching params still probe fine
    assert(Similarity.lshTopKIndexed(spark, dir, "vec_id", "embedding", probe,
      k = 10).count() > 0)
  }

  test("vecQuantStats equals the HOF quantizeInt8 formulation") {
    val viaExpr = emb.select(col("vec_id"),
        graft.functions.VectorFunctions.vecQuantStats(col("embedding")).as("st"))
      .select(col("vec_id"), col("st.scale"), col("st.q_sum"), col("st.q_sqsum"))
      .orderBy("vec_id").collect().toSeq
    val viaHof = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .select(col("vec_id"), col("scale"),
        aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long")).as("q_sum"),
        aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long") * x.cast("long"))
          .as("q_sqsum"))
      .orderBy("vec_id").collect().toSeq
    assert(viaExpr == viaHof)
  }

  test("fitCentroids: deterministic, and tighter cells than the sampled init") {
    val init = emb.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(8).select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    val fitted = Similarity.fitCentroids(emb, "vec_id", "embedding", 8, iterations = 3)
    val again = Similarity.fitCentroids(emb, "vec_id", "embedding", 8, iterations = 3)
    assert(fitted.map(_.toSeq) == again.map(_.toSeq), "fit must be deterministic")
    val before = Similarity.meanAssignedCosine(emb, "embedding", init)
    val after = Similarity.meanAssignedCosine(emb, "embedding", fitted)
    assert(after >= before - 1e-9,
      s"fitting degraded assignment tightness: $before -> $after")
  }

  test("materialized IVF index: probes prune to the probed cells' files only") {
    val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    val probe = emb.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/idx"
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", centroids, dir)
    // every cell is a directory of the index
    val cellDirs = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val nCells = try cellDirs.iterator().asScala
      .count(_.getFileName.toString.startsWith("cell_id=")) finally cellDirs.close()
    assert(nCells >= 4, s"index should fan out over cells, got $nCells dirs")
    val indexed = Similarity.ivfTopKIndexed(
      spark, dir, "vec_id", "embedding", centroids, probe, 10, nprobe = 2)
    // identical results to the scan-everything formulation
    val direct = Similarity.ivfTopK(
      emb, "vec_id", "embedding", centroids, probe, 10, nprobe = 2)
    assert(indexed.collect().toSeq == direct.collect().toSeq)
    // and the scan proves the file-prune: cell_id must appear INSIDE a
    // non-empty PartitionFilters list (bare contains() is vacuous — every
    // scan prints the header and the output schema names the column)
    val scan = indexed.queryExecution.executedPlan.collectLeaves().head.toString
    assert("PartitionFilters: \\[[^\\]]*cell_id".r.findFirstIn(scan).isDefined,
      s"cell_id filter did not reach partition pruning:\n$scan")
  }

  test("assignCells is deterministic and total") {
    val centroids = emb.filter(col("vec_id") < 4).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    val cells = Similarity.assignCells(emb, "embedding", centroids)
    assert(cells.count() == emb.count())
    val distinctCells = cells.select("cell_id").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(distinctCells.forall(c => c >= 0 && c < 4))
  }

  test("sketch aggregates match their column-wise formulations bit-for-bit") {
    import graft.functions.NeutralHash
    // MinHashAgg vs 64 separate unsigned-min columns over the two-hash
    // neutral scheme (slot i = lower64 + i*upper64, Java wrap-around);
    // unsigned min via the sign-flip trick (x ^ MinValue preserves
    // unsigned order under signed comparison)
    val slotH = udf((s: String, i: Int) =>
      (NeutralHash.lower64(s) + i.toLong * NeutralHash.upper64(s)) ^ Long.MinValue)
    val sh = docs.limit(50).select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 3)).as("sh"))
    val mins = (0 until 64).map(i =>
      min(slotH(col("sh"), lit(i))).as(s"h$i"))
    val colWise = sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until 64).map(i =>
        col(s"h$i").bitwiseXOR(lit(Long.MinValue))): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = Dedup.minHashSignatures(docs.limit(50), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(agg == colWise)

    // SimHashAgg vs 64 sum(when(bit, 1, -1)) columns over md5-lower64
    val wordH = udf((s: String) => NeutralHash.lower64(s))
    val words = docs.limit(50).select(col("doc_id"),
      explode(array_distinct(split(lower(col("text")), "\\s+"))).as("w"))
      .filter(col("w") =!= "").withColumn("h", wordH(col("w")))
    val bitSums = (0 until 64).map(i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0L, 1).otherwise(-1)).as(s"b$i"))
    val simColWise = words.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val simAgg = Dedup.simHash(docs.limit(50), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(simAgg == simColWise)
  }

  test("cleanCorpus: survivors are exact-unique, cluster-min, above quality floor") {
    val cleaned = CorpusPipeline.cleanCorpus(docs, minQuality = 0.2)
    val ids = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty && ids.size < docs.count())
    // no surviving near-dup pair: every Jaccard pair has lost its non-min id
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8, 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(!(ids.contains(a) && ids.contains(b)),
        s"near-dup pair ($a,$b) fully survived") }
    // quality floor holds
    val qs = cleaned.select("quality").collect().map(_.getDouble(0))
    assert(qs.forall(_ >= 0.2))
  }

  test("cleanCorpus via the shared shingle stage equals the self-shingling form") {
    val shared = Dedup.shingleExplode(docs, "doc_id", "text", 3)
    val self = CorpusPipeline.cleanCorpus(docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val viaShared = CorpusPipeline.cleanCorpus(docs, corpusShingles = Some(shared))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(self == viaShared)
  }

  test("semanticDedup keeps exactly one representative per cosine component") {
    val kept = Similarity.semanticDedup(emb, "vec_id", "embedding", 0.45)
    val dropped = emb.count() - kept.count()
    assert(dropped > 0, "fixture should contain planted embedding near-dups")
    // roots of distinct components share no edge, so survivors must be
    // pairwise below the threshold — the defining SemDeDup invariant
    assert(Similarity.bruteNearDupPairsJoin(kept, "vec_id", "embedding", 0.45)
      .count() == 0)
    // and nothing outside a near-dup component was dropped
    val inComponent = Similarity.bruteNearDupPairsJoin(emb, "vec_id", "embedding", 0.45)
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct().count()
    assert(dropped < inComponent)
  }

  test("stratifiedSample: rate 1 keeps all, rate 0 drops all, fractions subset") {
    val byRate = (r: Double) => Sampling.stratifiedSample(
      docs, "source", col("text"), rates = Map.empty, defaultRate = r)
    val n = docs.count()
    assert(byRate(1.0).count() == n)
    assert(byRate(0.0).count() == 0)
    val halfIds = byRate(0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    val quarterIds = byRate(0.25).select("doc_id").collect().map(_.getLong(0)).toSet
    // monotone thresholds: the 1/4 sample is a subset of the 1/2 sample,
    // and both are in the right ballpark of their target rate
    assert(quarterIds.subsetOf(halfIds))
    assert(math.abs(halfIds.size.toDouble / n - 0.5) < 0.1)
    // per-group rates apply to their group only
    val mixed = Sampling.stratifiedSample(docs, "source", col("text"),
      rates = Map("src0" -> 0.0), defaultRate = 1.0)
    assert(mixed.filter(col("source") === "src0").count() == 0)
    assert(mixed.count() == docs.filter(col("source") =!= "src0").count())
  }

  test("sampling edge cases: null keys, h8 collision, micro-rate, zero-token group") {
    import spark.implicits._
    // null hash keys get a deterministic assignment (hash of ""), so
    // rate 1 really keeps everything, null text included
    val withNull = Seq(("a", "some text"), ("a", null))
      .toDF("src", "text")
    assert(Sampling.stratifiedSample(withNull, "src", col("text"),
      rates = Map.empty, defaultRate = 1.0).count() == 2)
    // a pre-existing h8 column is an explicit error, not a silent overwrite
    val clash = withNull.withColumn("h8", lit("x"))
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(clash, "src", col("text"), Map.empty)
    }
    // a tiny-but-positive rate must stay representable, not floor to
    // drop-all: 1e-6 (the smallest 6-dp mixtureWeights rate) maps to a
    // positive threshold at 1/2^32 granularity
    assert(Sampling.thresholdHex(1e-6) > "00000000")
    // zero-token group: weight/sample_rate/epochs are null, not Infinity
    val empty = Seq(("a", ""), ("b", "one two")).toDF("src", "text")
    val row = Sampling.mixtureWeights(empty, "src", "text",
        targetShares = Map("a" -> 0.5, "b" -> 0.5), budgetTokens = 10L)
      .filter(col("src") === "a").collect().head
    assert(row.getLong(2) == 0L)
    assert(row.isNullAt(5) && row.isNullAt(6) && row.isNullAt(7))
    // rate = nextDown(1.0): the double product rounds up to exactly 2^32 —
    // the clamp must render the max 8-hex threshold, not a truncated
    // '10000000' (~6% keep)
    assert(Sampling.thresholdHex(math.nextDown(1.0)) == "ffffffff")
  }

  test("capPerGroup handles integral and string id columns (generic API)") {
    import spark.implicits._
    val longIds = docs.select(col("source"), col("doc_id"))
    val expected = Sampling.capPerGroup(docs, "source", "doc_id", 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // int ids: same selection, schema preserved (int out, not long)
    val intDf = longIds.withColumn("doc_id", col("doc_id").cast("int"))
    val viaInt = Sampling.capPerGroup(intDf, "source", "doc_id", 7)
    assert(viaInt.schema("doc_id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(viaInt.collect().map(r => (r.getString(0), r.getInt(1).toLong))
      .toSet == expected)
    // string ids: the hash-join recovery path. CAST(doc_id AS STRING)
    // hashes identically to the long path, so the same rows win.
    val strDf = longIds.withColumn("doc_id", col("doc_id").cast("string"))
    val viaStr = Sampling.capPerGroup(strDf, "source", "doc_id", 7)
      .collect().map(r => (r.getString(0), r.getString(1).toLong)).toSet
    assert(viaStr == expected)
  }

  test("mixtureWeights arithmetic on a known tiny mix") {
    import spark.implicits._
    // 10-token docs: a has 2 docs (20 tokens), b has 1 (10 tokens)
    val ten = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    val d = Seq(("a", ten), ("a", ten), ("b", ten)).toDF("src", "text")
    val w = Sampling.mixtureWeights(d, "src", "text",
        targetShares = Map("a" -> 0.25, "b" -> 0.75), budgetTokens = 40L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    // a: target 10 of 20 actual -> weight 0.5, downsample; b: target 30 of
    // 10 actual -> weight 3.0, 3 epochs
    assert(w("a") == ((2L, 20L, 0.25, 10L, 0.5, 0.5, 1.0)))
    assert(w("b") == ((1L, 10L, 0.75, 30L, 3.0, 1.0, 3.0)))
  }

  test("tokenBudgetSample: greedy fill, boundary doc kept, nulls excluded") {
    import spark.implicits._
    // priority order: id1(5 tok) -> id2(4) -> id3(3, tie with id2 broken
    // by id) -> id4(10). budget 10: id3 starts at 9 (< 10, the boundary-
    // crossing doc is KEPT), id4 starts at 12 (dropped). A null-priority
    // row has no place in the order; a null token count costs 0.
    val scored = Seq(
      (1L, Some(3.0), Some(5L)), (2L, Some(2.0), Some(4L)),
      (3L, Some(2.0), Some(3L)), (4L, Some(1.0), Some(10L)),
      (5L, None: Option[Double], Some(2L)), (6L, Some(0.5), None: Option[Long]))
      .toDF("id", "prio", "n_tok")
    // partitions=7 forces the multi-partition two-phase path (most
    // partitions empty or fully-skipped — the offsets must still line up)
    val out = Sampling.tokenBudgetSample(scored, "id", "prio", "n_tok",
        budgetTokens = 10L, partitions = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 0L, 2L -> 5L, 3L -> 9L))
    // the zero-cost doc rides free once the order reaches it
    val big = Sampling.tokenBudgetSample(scored, "id", "prio", "n_tok",
        budgetTokens = 23L, partitions = 3)
      .collect().map(_.getLong(0)).toSet
    assert(big == Set(1L, 2L, 3L, 4L, 6L)) // null-prio id5 still excluded
  }

  test("tokenBudgetSample two-phase prefix == the window formulation") {
    // the falsifier the oracle leans on: the distributed two-phase prefix
    // sum must select EXACTLY the rows a global window cumsum selects
    val scored = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"),
        coalesce(size(TextAnalysis.tokens(col("text"))), lit(0))
          .cast("long").as("n_tok")), Seq("doc_id"))
    val budget = 2000L
    val viaPrefix = Sampling.tokenBudgetSample(
        scored, "doc_id", "quality", "n_tok", budget, partitions = 8)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality").desc, col("doc_id").asc)
    val viaWindow = scored.filter(col("quality").isNotNull)
      .withColumn("start", sum("n_tok").over(w) - col("n_tok"))
      .filter(col("start") < budget)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start"))).toSet
    assert(viaPrefix == viaWindow)
    assert(viaPrefix.nonEmpty)
    // the budget binds: kept mass reaches it (the pool is larger)
    val kept = viaPrefix.toSeq.map(_._2).max
    assert(kept < budget)
  }

  test("mixtureWeightsTemperature: alpha=1 proportional, alpha<1 flattens") {
    import spark.implicits._
    val ten = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    val d = Seq(("a", ten), ("a", ten), ("b", ten), ("c", ""))
      .toDF("src", "text")
    def shares(alpha: Double) =
      Sampling.mixtureWeightsTemperature(d, "src", "text", alpha, 30L)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val prop = shares(1.0)
    // alpha=1 is plain proportional: a 20/30, b 10/30, zero-token c 0
    assert(math.abs(prop("a") - 0.666667) < 1e-9)
    assert(math.abs(prop("b") - 0.333333) < 1e-9)
    assert(prop("c") == 0.0)
    val flat = shares(0.5)
    // temperature flattening: the low-resource group gains share, the
    // high-resource one loses it; shares still sum to ~1
    assert(flat("b") > prop("b") && flat("a") < prop("a"))
    assert(math.abs(flat("a") + flat("b") - 1.0) < 2e-6)
    // zero-token group: share 0 and the mixtureWeights null contract
    val cRow = Sampling.mixtureWeightsTemperature(d, "src", "text", 0.5, 30L)
      .filter(col("src") === "c").collect().head
    assert(cRow.getDouble(3) == 0.0 && cRow.isNullAt(5) && cRow.isNullAt(6)
      && cRow.isNullAt(7))
    // derived columns follow the mixtureWeights arithmetic exactly
    val a1 = Sampling.mixtureWeightsTemperature(d, "src", "text", 1.0, 30L)
      .filter(col("src") === "a").collect().head
    assert(a1.getLong(4) == 20L && a1.getDouble(5) == 1.0) // floor(.666667*30)
  }

  test("applyMixtureEpochs: whole copies, fractional copy, applyMixture degenerate") {
    import spark.implicits._
    val ten = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    // a: 1 doc / 10 tokens; b: 20 docs / 200 tokens; c absent from the
    // shares (weight 0); d zero-token (weight null)
    val d = (Seq(("a", "a0", ten)) ++
        (0 until 20).map(i => ("b", s"b$i", ten + s" x$i")) ++
        Seq(("c", "c0", ten), ("d", "d0", "")))
      .toDF("src", "id", "text")
    // budget 40, shares a=0.75, b=0.25: a weight = 30/10 = 3.0 (exactly
    // three whole epochs, frac 0 — no fourth row), b weight = 10/220 ≈
    // 0.045455 (zero whole copies, fractional threshold only)
    val out = Sampling.applyMixtureEpochs(d, "src", "text",
        targetShares = Map("a" -> 0.75, "b" -> 0.25), budgetTokens = 40L)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(r.fieldIndex("epoch"))))
    assert(out.filter(_._1 == "a").map(_._3).sorted.toSeq == Seq(0L, 1L, 2L))
    assert(out.filter(_._1 == "b").forall(_._3 == 0L))
    // share-0 and zero-token groups emit nothing
    assert(!out.exists(r => r._1 == "c" || r._1 == "d"))
    // weight < 1 degenerates to applyMixture's exact selection
    val viaEpochs = out.filter(_._1 == "b").map(_._2).toSet
    val viaRate = Sampling.applyMixture(d, "src", "text",
        targetShares = Map("a" -> 0.75, "b" -> 0.25), budgetTokens = 40L)
      .filter(col("src") === "b").collect().map(_.getString(1)).toSet
    assert(viaEpochs == viaRate)
  }

  test("contaminationHits counts distinct shared shingles vs the eval set") {
    import spark.implicits._
    // "quick brown fox" appears in BOTH eval docs: the eval-side distinct
    // must still count it once per corpus doc. Doc 2 shares nothing and
    // must be absent, not zero.
    val corpus = Seq((1L, "the quick brown fox jumps"),
      (2L, "totally unrelated text right here")).toDF("doc_id", "text")
    val evalSet = Seq((100L, "quick brown fox trots home"),
      (101L, "a quick brown fox again appears")).toDF("doc_id", "text")
    val hits = Dedup.contaminationHits(
        Dedup.shingleExplode(corpus, "doc_id", "text"),
        Dedup.shingleExplode(evalSet, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((1L, 1L)))
  }

  test("gopherRules: every rule falsifiable, 0.8 boundary kept, null text fails") {
    import spark.implicits._
    val toy = Seq(
      (1L, "alpha beta gamma delta epsil"),       // 5 words, mwl 5 -> pass
      (2L, "a b c d e"),                          // mwl 1 -> ok_mwl false
      (3L, "overwhelmingly incomprehensible"
        + " extraordinarily disproportionate"),   // mwl > 10 -> ok_mwl false
      (4L, "123 456 789 000 111"),                // alpha_frac 0 -> ok_alpha false
      (5L, "123 two2 three wordy words"),         // 4 alpha of 5 = 0.8 -> KEPT (paper boundary)
      (6L, "one two"),                            // below minWords -> ok_words false
      (7L, null.asInstanceOf[String]))            // null -> (0, fail), not SQL-null
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(toy, "doc_id", "text",
        minWords = 3L, maxWords = 10L)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6), r.getBoolean(7)))).toMap
    assert(out(1L) == ((true, true, true, true)))
    assert(out(2L) == ((true, false, true, false)))
    assert(out(3L)._2 == false && out(3L)._4 == false)
    assert(out(4L) == ((true, true, false, false)))
    assert(out(5L)._3 == true, "alpha_frac exactly 0.8 must be kept")
    assert(out(6L) == ((false, true, true, false)))
    assert(out(7L) == ((false, false, false, false)))
  }

  test("contaminationHitsBloom matches the exact path (FPs die in the confirm join)") {
    import spark.implicits._
    // enough docs that the bloom prefilter has real work: 40 corpus docs,
    // every 4th one sharing a 3-gram with the eval set
    val corpus = (1L to 40L).map { i =>
      val tail = if (i % 4 == 0) "shared eval marker phrase" else s"unique body $i text"
      (i, s"document number $i says $tail")
    }.toDF("doc_id", "text")
    val evalSet = Seq((100L, "the shared eval marker phrase here")).toDF("doc_id", "text")
    val cs = Dedup.shingleExplode(corpus, "doc_id", "text")
    val es = Dedup.shingleExplode(evalSet, "doc_id", "text")
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = key(Dedup.contaminationHits(cs, es))
    assert(exact.nonEmpty)
    assert(key(Dedup.contaminationHitsBloom(cs, es)) == exact)
    // an aggressive fpp still agrees: false positives only cost shuffle
    assert(key(Dedup.contaminationHitsBloom(cs, es, fpp = 0.5)) == exact)
  }

  test("dedupClusters: chained pairs collapse into one component") {
    import spark.implicits._
    // 1-2, 2-3 chain plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    // driver union-find fast path
    val fast = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == expected)
    // distributed label-propagation path (threshold 0 forces it)
    val dist = Dedup.dedupClusters(pairs, driverUnionFindThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == expected)
  }

  test("dedupClusters: 1000-node chain converges in O(log diameter) distributed rounds") {
    import spark.implicits._
    // worst-case shape for pure min-label propagation (rounds = 999):
    // a recrawl-series chain 1~2~3~...~1000. Pointer jumping must close
    // it in ~log2(1000) rounds.
    val chain = (1L until 1000L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.dedupClusters(chain, driverUnionFindThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 1000)
    assert(labels.forall(_._2 == 1L),
      s"chain must collapse to min id 1, got labels ${labels.filter(_._2 != 1L).take(5).toSeq}")
    assert(Dedup.lastDistributedRounds <= 16,
      s"expected O(log 1000) ~ <=16 rounds, took ${Dedup.lastDistributedRounds}")
  }

  test("duplicatedSpans flags cross-doc spans, merges overlaps, ignores within-doc repeats") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "a b c d e f"),            // shares "a b c d e" with doc 2
      (2L, "x a b c d e y"),
      (3L, "p q r s t u"),            // clean
      (4L, "h i j k l m n"),          // identical to doc 5: full coverage
      (5L, "h i j k l m n"),
      (6L, "m n o p q z m n o p q")   // within-doc repeat only: NOT flagged
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(fixture, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

    assert(out(1L) == ((6L, 1L, 5L, 5.0 / 6)))   // one hit at pos 0
    assert(out(2L) == ((7L, 1L, 5L, 5.0 / 7)))   // one hit at pos 1
    assert(out(3L) == ((6L, 0L, 0L, 0.0)))
    // docs 4/5: spans at pos 0,1,2 all duplicated; union [0,7) = 7 tokens
    // (15 without the interval merge), so frac is exactly 1.0
    assert(out(4L) == ((7L, 3L, 7L, 1.0)))
    assert(out(5L) == ((7L, 3L, 7L, 1.0)))
    // "m n o p q" repeats only inside doc 6 → cross-doc df = 1, no flag
    assert(out(6L) == ((11L, 0L, 0L, 0.0)))
  }

  test("duplicatedSpans: null text yields null token count and zero hits") {
    import spark.implicits._
    val fixture = Seq((1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val rows = Dedup.duplicatedSpans(fixture, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(3L).isNullAt(1) && rows(3L).getLong(2) == 0L)
    assert(rows(1L).getLong(3) == 6L && rows(2L).getLong(3) == 6L)
  }

  test("stripDuplicatedSpans cuts flagged tokens, keeps order, empties full dups") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "a b c d e f"),            // "a b c d e" shared with doc 2 → keeps "f"
      (2L, "x a b c d e y"),          // keeps "x" and "y"
      (3L, "p q r s t u"),            // untouched (lowercased join only)
      (4L, "h i j k l m n"),          // identical to doc 5 → fully cut
      (5L, "h i j k l m n"),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.stripDuplicatedSpans(fixture, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "f" && out(1L).getLong(3) == 1L)
    assert(out(2L).getString(1) == "x y" && out(2L).getLong(3) == 2L)
    assert(out(3L).getString(1) == "p q r s t u" && out(3L).getLong(3) == 6L)
    assert(out(4L).getString(1) == "" && out(4L).getLong(3) == 0L)
    assert(out(5L).getString(1) == "")
    assert(out(6L).isNullAt(1) && out(6L).isNullAt(2))
  }

  test("leakageSafeSplit: near-dup clusters never straddle a split boundary") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
    val clusters = Dedup.dedupClusters(pairs)
    val split = Sampling.leakageSafeSplit(docs, "doc_id", clusters,
      Seq("test" -> 0.04, "val" -> 0.08))
    // the leakage invariant: one split per cluster
    val straddles = split.join(clusters, Seq("doc_id"))
      .groupBy("cluster_id").agg(countDistinct("split").as("n"))
      .filter(col("n") > 1).count()
    assert(straddles == 0)
    assert(clusters.count() > 0, "fixture should contain near-dup clusters")
    // singletons root at their own id
    val single = split.join(clusters, Seq("doc_id"), "left_anti")
      .filter(col("split_root") =!= col("doc_id")).count()
    assert(single == 0)
    // every input row is assigned exactly once
    assert(split.count() == docs.count())
    // non-cumulative bounds are refused
    intercept[IllegalArgumentException] {
      Sampling.leakageSafeSplit(docs, "doc_id", clusters,
        Seq("test" -> 0.08, "val" -> 0.04))
    }
  }

  test("semanticContaminationHits equals the brute cross-join formulation") {
    val corpus = emb.filter(col("vec_id") >= 50)
    val evalSet = emb.filter(col("vec_id") < 50)
    val got = Similarity.semanticContaminationHits(
        corpus, evalSet, "vec_id", "embedding", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute reference: unbroadcast cross join + the same rounded cosine
    val brute = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(evalSet.select(col("embedding").as("_e")))
      .withColumn("_c", round(Similarity.cosine(col("embedding"), col("_e")), 6))
      .filter(col("_c") >= 0.35)
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n"), max(col("_c")).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute)
    assert(got.nonEmpty, "fixture split should contain contamination hits")
    // null eval vectors are excluded, not propagated as null cosines
    val withNull = evalSet.select(col("vec_id"),
      when(col("vec_id") === 0, lit(null)).otherwise(col("embedding")).as("embedding"))
    val gotNull = Similarity.semanticContaminationHits(
        corpus, withNull, "vec_id", "embedding", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gotNull.subsetOf(got))
  }

  test("broadcast brute pairs equal the join-based formulation exactly") {
    val a = Similarity.bruteNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Similarity.bruteNearDupPairsJoin(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("nearDupPairsAuto: exact under the broadcast budget, cell-blocked past it") {
    val exact = Similarity.bruteNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // default budget: small table -> identical to the exact kernel
    val auto = Similarity.nearDupPairsAuto(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto == exact)
    // 0-byte budget forces the cell-blocked path: approximate (same-cell
    // pairs only) — a subset of the exact pairs, with identical scores
    val blocked = Similarity.nearDupPairsAuto(emb, "vec_id", "embedding", 0.4,
        broadcastBudgetBytes = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(blocked.subsetOf(exact))
    assert(blocked.nonEmpty)
  }

  test("rolling hash: deterministic, order-sensitive") {
    import spark.implicits._
    val d = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("id", "t")
    val h = d.select(col("id"), TextAnalysis.rollingHash(col("t")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(3L))
    assert(h(1L) != h(2L))
  }

  test("multimodal: batched feature extraction has the contract shape") {
    val media = Multimodal.mediaFromDocuments(docs.limit(100))
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val feats = Multimodal.extractFeatures(media, batchSize = 16)
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.getSeq[Float](1).length == Multimodal.featureDim))
    // deterministic: same payload -> same features
    val again = Multimodal.extractFeatures(media, batchSize = 7).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getSeq[Float](1)))
  }

  test("packing: two-phase prefix sum equals the single-task window, in parallel") {
    import org.apache.spark.sql.expressions.Window
    val packed = Packing.packChunks(docs, "doc_id", "text", budget = 512L,
      partitions = 4)
    assert(packed.rdd.getNumPartitions == 4, "packing collapsed to fewer partitions")
    val viaWindow = docs.select(col("doc_id").cast("long").as("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start_offset",
        coalesce(sum("n_tokens").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        (col("start_offset") / 512L).cast("long").as("pack_id"),
        (col("start_offset") % 512L).as("offset_in_pack"))
    assert(packed.orderBy("doc_id").collect().toSeq ==
      viaWindow.orderBy("doc_id").collect().toSeq)
  }

  test("chunkDocs: window starts, short tails, overlap content, empty docs") {
    import spark.implicits._
    val toy = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than one chunk
      (3L, ""),                                       // no chunks
      (4L, null.asInstanceOf[String]))                // no chunks
      .toDF("doc_id", "text")
    val out = Packing.chunkDocs(toy, "doc_id", "text",
        chunkTokens = 4, strideTokens = 3)
      .orderBy("doc_id", "chunk_id").collect()
    // doc 1: starts 0,3,6,9 -> sizes 4,4,4,1; doc 2: one short chunk
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L), (1L, 3L, 9L, 1L),
        (2L, 0L, 0L, 3L)))
    // overlap windows carry the right tokens: chunk 1 of doc 1 = w4..w7
    val md5w4to7 = java.security.MessageDigest.getInstance("MD5")
      .digest("w4 w5 w6 w7".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(1).getString(4) == md5w4to7)
    // map-side contract: no exchange in the plan
    val p = Packing.chunkDocs(toy, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking introduced a shuffle:\n$p")
  }

  test("multimodal: resize rewrites payload dims and meta, deterministically") {
    val media = Multimodal.mediaFromDocuments(docs.limit(50))
    val resized = Multimodal.resizeMedia(media, 8, 4)
    val rows = resized.orderBy("media_id").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("payload").length == 8 * 4)
      val meta = r.getStruct(2)
      assert(meta.getInt(1) == 8 && meta.getInt(2) == 4)
      assert(meta.getString(0) == "text/plain") // mime preserved
    }
    val again = Multimodal.resizeMedia(media, 8, 4).orderBy("media_id").collect()
    assert(rows.map(_.getAs[Array[Byte]]("payload").toSeq).toSeq ==
      again.map(_.getAs[Array[Byte]]("payload").toSeq).toSeq)
  }

  test("multimodal: REAL image decode end-to-end — info, grid features, pixel resize") {
    import spark.implicits._
    def encode(fmt: String, w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    // 32x16 PNG, left half black / right half white; 20x20 JPEG gradient
    val halfPng = encode("png", 32, 16)((x, _) => if (x < 16) 0x000000 else 0xFFFFFF)
    val gradJpg = encode("jpg", 20, 20) { (x, _) =>
      val v = x * 255 / 19; (v << 16) | (v << 8) | v
    }
    val textBytes = "definitely not an image payload".getBytes("UTF-8")
    val media = Seq(
      (1L, halfPng, ("image/png", 32, 16, 1)),
      (2L, gradJpg, ("image/jpeg", 20, 20, 1)),
      (3L, textBytes, ("text/plain", textBytes.length, 1, 1)))
      .toDF("media_id", "payload", "meta")

    // imageInfo: real codecs claim the PNG and JPEG, not the text
    val info = Multimodal.imageInfo(media).orderBy("media_id").collect()
    assert(info(0).getInt(1) == 32 && info(0).getInt(2) == 16 &&
      info(0).getInt(3) == 3 && info(0).getBoolean(4))
    assert(info(1).getInt(1) == 20 && info(1).getInt(2) == 20 &&
      info(1).getBoolean(4))
    assert(info(2).isNullAt(1) && !info(2).getBoolean(4))

    // grid features on the half/half PNG: left grid columns exactly 0,
    // right exactly 1 (black lum 0, white lum 255 -> 255/255)
    val feats = Multimodal.extractFeatures(media, batchSize = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for (g <- 0 until 4) {
      assert(feats(1L)(g * 4) == 0f && feats(1L)(g * 4 + 1) == 0f,
        s"left cells of grid row $g not black: ${feats(1L)}")
      assert(feats(1L)(g * 4 + 2) == 1f && feats(1L)(g * 4 + 3) == 1f,
        s"right cells of grid row $g not white: ${feats(1L)}")
    }
    // non-image payload falls back to the byte-stat stand-in
    assert(feats(3L) == Multimodal.byteStatFeatures(textBytes).toSeq)

    // pixel resize: the PNG comes back as a REAL decodable 10x8 PNG with
    // halves preserved; the text payload rides the raw-byte fallback
    val resized = Multimodal.resizeMedia(media, 10, 8).orderBy("media_id").collect()
    val m1 = resized(0)
    assert(m1.getStruct(2).getString(0) == "image/png" &&
      m1.getStruct(2).getInt(1) == 10 && m1.getStruct(2).getInt(2) == 8)
    val decoded = Multimodal.decodeImage(m1.getAs[Array[Byte]](1))
    assert(decoded.isDefined && decoded.get.width == 10 && decoded.get.height == 8)
    val g = decoded.get.gray
    assert((g(0) & 0xFF) == 0 && (g(9) & 0xFF) == 255,
      s"resize lost the half/half pattern: ${g.map(_ & 0xFF).mkString(",")}")
    val m3 = resized(2)
    assert(m3.getStruct(2).getString(0) == "text/plain" &&
      m3.getAs[Array[Byte]](1).length == 10 * 8)

    // deterministic across batch sizes
    val again = Multimodal.extractFeatures(media, batchSize = 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(again == feats)
  }

  test("multimodal: frame sampling slices chunk-aligned frames") {
    val media = Multimodal.mediaFromDocuments(docs.limit(10))
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
    val byDoc = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lens = media.select(col("media_id"), length(col("payload")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.foreach { case (id, n) =>
      val expected = (0 until lens(id) / 16 by 2).size
      assert(n == expected, s"doc $id: $n frames vs $expected")
    }
    assert(frames.select("frame").head().getAs[Array[Byte]](0).length == 16)
  }

  // ------------------------------------------------- product quantization

  private def pqFixture: (Seq[Array[Float]], Seq[Seq[Array[Float]]]) = {
    val rows = emb.filter(col("vec_id") < 16).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    (rows, Similarity.pqCodebooksFromRows(rows, numSub = 8))
  }

  test("pqCodes: codebook rows self-code, codes in range, deterministic") {
    val (_, codebooks) = pqFixture
    val codes = Similarity.pqCodes(emb, "vec_id", "embedding", codebooks)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(codes.size == emb.count() * 8)
    assert(codes.values.forall(c => c >= 0 && c < 16))
    // |c−v|² = 0 is the strict minimum, so every codebook row's slice
    // assigns to its own index (no duplicate sub-slices in the fixture)
    for (j <- 0 until 16; m <- 0 until 8)
      assert(codes((j.toLong, m)) == j, s"vec $j subspace $m")
    val again = Similarity.pqCodes(emb, "vec_id", "embedding", codebooks)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(again == codes)
  }

  test("adcTopK: codebook-row vectors reconstruct exactly, so ADC ≈ true dot") {
    val (rows, codebooks) = pqFixture
    val probe = rows.head // vec_id 0
    val adc = Similarity.adcTopK(emb.filter(col("vec_id") < 16 && col("vec_id") =!= 0),
        "vec_id", "embedding", codebooks, probe, k = 15)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(adc.size == 15)
    // a codebook-row vector's PQ reconstruction is ITSELF, so its ADC
    // score is the true dot up to 8 half-up micro-unit roundings (≤4e-6)
    def dotL(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
      d
    }
    (1 until 16).foreach { j =>
      val exact = dotL(probe, rows(j))
      assert(math.abs(adc(j.toLong) - exact) <= 5e-6,
        s"vec $j: adc ${adc(j.toLong)} vs exact $exact")
    }
  }

  test("fitPqCodebooks: deterministic, and tighter codes than the untrained baseline") {
    val (rows, baseline) = pqFixture
    val fitted = Similarity.fitPqCodebooks(emb, "vec_id", "embedding",
      numSub = 8, k = 16, iterations = 3)
    assert(fitted.size == 8 && fitted.forall(_.size == 16))
    val again = Similarity.fitPqCodebooks(emb, "vec_id", "embedding",
      numSub = 8, k = 16, iterations = 3)
    assert(fitted.map(_.map(_.toSeq)) == again.map(_.map(_.toSeq)))
    // Lloyd's must not be worse than its own init (the first-16-rows
    // codebook IS a valid init of the same size); on the fixture it is
    // strictly tighter
    val mseBase = Similarity.pqQuantizationError(emb, "embedding", baseline)
    val mseFit = Similarity.pqQuantizationError(emb, "embedding", fitted)
    assert(mseFit < mseBase, s"fitted mse $mseFit !< baseline $mseBase")
    assert(rows.nonEmpty)
  }

  test("adcTopKFromCodes over a materialized code table equals the re-deriving form") {
    val (rows, codebooks) = pqFixture
    val probe = rows.head
    val corpus = emb.filter(col("vec_id") =!= 0)
    val direct = Similarity.adcTopK(corpus, "vec_id", "embedding",
      codebooks, probe, k = 12).collect().toSeq
    val packed = Similarity.pqPackedCodes(corpus, "vec_id", "embedding", codebooks)
    val viaCodes = Similarity.adcTopKFromCodes(packed, "vec_id", "codes",
      codebooks, probe, k = 12).collect().toSeq
    assert(viaCodes == direct)
    // the code table is numSub ints per row — the 32x-IO claim's shape
    assert(packed.schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, containsNull = false))
  }

  test("buildPqIndex + adcTopKIndexed equals the scan form; mismatched codebooks error") {
    val (rows, codebooks) = pqFixture
    val probe = rows.head
    val corpus = emb.filter(col("vec_id") =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("pq_idx_spec")
    try {
      val path = dir.resolve("index").toString
      Similarity.buildPqIndex(corpus, "vec_id", "embedding", codebooks, path)
      val direct = Similarity.adcTopK(corpus, "vec_id", "embedding",
        codebooks, probe, k = 12).collect().toSeq
      val indexed = Similarity.adcTopKIndexed(spark, path, "vec_id",
        codebooks, probe, k = 12).collect().toSeq
      assert(indexed == direct)
      // probing with codebooks OTHER than the ones that assigned the
      // stored codes must error, not silently score wrong neighbors
      val other = codebooks.map(_.map(_.map(_ + 1.0f)))
      val err = intercept[IllegalArgumentException] {
        Similarity.adcTopKIndexed(spark, path, "vec_id", other, probe, k = 12)
      }
      assert(err.getMessage.contains("fingerprint"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("embeddingDrift: identical snapshots shift 0, a planted offset surfaces exactly (r7)") {
    import spark.implicits._
    val base = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(3.0f, 2.0f, 1.0f)),
      (3L, Array(2.0f, 2.0f, 2.0f)), (4L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "vec")
    val same = Similarity.embeddingDrift(base, base, "vec")
      .orderBy("dim").collect()
    assert(same.length == 3, "null vectors must be skipped, 3 dims profiled")
    assert(same.forall(r => r.getDouble(5) == 0.0),
      s"identical snapshots must shift 0: ${same.toSeq}")
    assert(same.forall(r => r.getLong(1) == 3 && r.getLong(2) == 3))
    // plant +0.5 on dimension 1 only
    val shifted = base.filter(col("vec").isNotNull).select(col("id"),
      transform(col("vec"), (x, i) =>
        when(i === 1, x + 0.5f).otherwise(x)).as("vec"))
    val drift = Similarity.embeddingDrift(base, shifted, "vec")
      .orderBy("dim").collect()
    assert(drift.map(_.getDouble(5)).toSeq == Seq(0.0, 0.5, 0.0),
      s"planted +0.5 on dim 1 must surface exactly: ${drift.toSeq}")
  }

  test("ANN index refresh ≡ rebuild (lsh/ivf/pq): append-only, same probes, meta-guarded") {
    // the refreshTextIndex discipline applied to the ANN family: build on
    // a 2/3 stratum, refresh with the held-out 1/3, and the index must be
    // row-identical to one built over everything (per-row-independent
    // assignments make this exact, not approximate)
    val oldE = emb.filter(col("vec_id") % 3 =!= 0)
    val newE = emb.filter(col("vec_id") % 3 === 0)
    val root = java.nio.file.Files.createTempDirectory("ann_refresh")
    // readAnnIndex = visible rows (main ∪ unfolded _delta, minus
    // tombstones) — a plain parquet read misses unfolded refreshes
    def rows(p: String, cols: String*): Set[Seq[Any]] =
      Similarity.readAnnIndex(spark, p, "vec_id").select(cols.map(col): _*)
        .collect().map(_.toSeq).toSet
    try {
      // ---- LSH
      val lshFull = root.resolve("lsh_full").toString
      val lshInc = root.resolve("lsh_inc").toString
      Similarity.buildLshIndex(emb, "vec_id", "embedding", lshFull)
      Similarity.buildLshIndex(oldE, "vec_id", "embedding", lshInc)
      Similarity.refreshLshIndex(newE, "vec_id", "embedding", lshInc)
      assert(rows(lshInc, "vec_id", "table", "bucket")
        == rows(lshFull, "vec_id", "table", "bucket"))
      val probe = emb.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
      assert(Similarity.lshTopKIndexed(spark, lshInc, "vec_id", "embedding",
          probe, 10).collect().toSeq
        == Similarity.lshTopKIndexed(spark, lshFull, "vec_id", "embedding",
          probe, 10).collect().toSeq)
      // ---- IVF (centroids persisted bit-exactly in the sidecar)
      val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
        .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
      val ivfFull = root.resolve("ivf_full").toString
      val ivfInc = root.resolve("ivf_inc").toString
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", centroids, ivfFull)
      assert(Similarity.readIvfCentroids(spark, ivfFull).get
        .map(_.toSeq) == centroids.map(_.toSeq), "sidecar must round-trip bit-exactly")
      Similarity.buildIvfIndex(oldE, "vec_id", "embedding", centroids, ivfInc)
      Similarity.refreshIvfIndex(newE, "vec_id", "embedding", ivfInc)
      assert(rows(ivfInc, "vec_id", "cell_id") == rows(ivfFull, "vec_id", "cell_id"))
      assert(Similarity.ivfTopKIndexed(spark, ivfInc, "vec_id", "embedding",
          centroids, probe, 10, nprobe = 2).collect().toSeq
        == Similarity.ivfTopKIndexed(spark, ivfFull, "vec_id", "embedding",
          centroids, probe, 10, nprobe = 2).collect().toSeq)
      // ---- PQ (fingerprint REQUIRED on refresh — foreign codes corrupt)
      val (_, codebooks) = pqFixture
      val pqFull = root.resolve("pq_full").toString
      val pqInc = root.resolve("pq_inc").toString
      Similarity.buildPqIndex(emb, "vec_id", "embedding", codebooks, pqFull)
      Similarity.buildPqIndex(oldE, "vec_id", "embedding", codebooks, pqInc)
      Similarity.refreshPqIndex(newE, "vec_id", "embedding", codebooks, pqInc)
      assert(rows(pqInc, "vec_id", "codes") == rows(pqFull, "vec_id", "codes"))
      val foreign = codebooks.map(_.map(_.map(_ + 1.0f)))
      assert(intercept[IllegalArgumentException] {
        Similarity.refreshPqIndex(newE, "vec_id", "embedding", foreign, pqInc)
      }.getMessage.contains("fingerprint"))
      // ---- pre-metadata layouts refuse to refresh rather than guess
      val bare = root.resolve("bare").toString
      newE.select("vec_id", "embedding").write.parquet(bare)
      assert(intercept[IllegalArgumentException] {
        Similarity.refreshIvfIndex(newE, "vec_id", "embedding", bare)
      }.getMessage.contains("rebuild instead"))
      assert(intercept[IllegalArgumentException] {
        Similarity.refreshLshIndex(newE, "vec_id", "embedding", bare)
      }.getMessage.contains("rebuild instead"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("drift-triggered IVF refit: stable batch keeps centroids, planted offset refits and restores recall (r8)") {
    import spark.implicits._
    val dim = 8
    // hash-based noise: genuinely independent per (id, dim) — a phase-
    // parameterized sin would make near neighbors share EVERY dim's
    // noise, including the cell-deciding ones, and hide the scatter
    def noise(i: Long, d: Int, tag: Int, a: Double): Double =
      (scala.util.hashing.MurmurHash3.stringHash(s"$i:$d:$tag").toDouble /
        Int.MaxValue) * a
    // base population: 4 axis-aligned clusters (e0..e3)
    def baseVec(i: Long): Array[Float] = {
      val c = (i % 4).toInt
      Array.tabulate(dim)(d =>
        ((if (d == c) 1.0 else 0.0) + noise(i, d, 1, 0.3)).toFloat)
    }
    // planted offset: clusters move to dims 4..7 (orthogonal to every
    // stale centroid), 4x the base mass. Similarity between new vectors
    // is carried by the STRONG dims (unit axis + 0.5 noise on 4..7)
    // while the stale-cell argmax is decided by the tiny independent
    // noise on dims 0..3 — so a probe's true neighbors scatter across
    // stale cells and nprobe=1 recall collapses, the silent decay mode
    // refitDecide exists to catch
    def shiftVec(i: Long): Array[Float] = {
      val c = (i % 4).toInt
      Array.tabulate(dim)(d =>
        ((if (d == 4 + c) 1.0 else 0.0) +
          (if (d < 4) noise(i, d, 2, 0.05) else noise(i, d, 2, 0.5))).toFloat)
    }
    val base = (0L until 400L).map(i => (i, baseVec(i)))
      .toDF("vec_id", "embedding")
    val stable = (1000L until 1200L).map(i => (i, baseVec(i)))
      .toDF("vec_id", "embedding")
    val shifted = (2000L until 3600L).map(i => (i, shiftVec(i)))
      .toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("ivf_refit")
    // exact axis centroids (a perfectly-fitted base): zero residual in
    // dims 4..7, so the stale assignment of a shifted vector is decided
    // ONLY by its independent weak-dim noise — the scatter under test
    val cents0: Seq[Array[Float]] =
      (0 until 4).map(c => Array.tabulate(dim)(d => if (d == c) 1f else 0f))

    // ---- keep branch: same distribution → cheap refresh, centroids untouched
    val keepIdx = root.resolve("keep").toString
    Similarity.buildIvfIndex(base, "vec_id", "embedding", cents0, keepIdx)
    val dKeep = Similarity.refreshIvfIndexAuto(stable, "vec_id", "embedding",
      keepIdx, shiftThreshold = 0.1)
    assert(!dKeep.refit && dKeep.maxAbsShift < 0.1,
      s"stable batch must keep the stored centroids: $dKeep")
    assert(Similarity.readIvfCentroids(spark, keepIdx).get.map(_.toSeq)
      == cents0.map(_.toSeq), "keep branch must not touch the sidecar")
    // visible rows span main + the unfolded _delta refresh segment
    assert(Similarity.readAnnIndex(spark, keepIdx, "vec_id").count() == 600)

    // ---- refit branch: planted offset → decision fires, index rebuilt
    val staleIdx = root.resolve("stale").toString
    val autoIdx = root.resolve("auto").toString
    Similarity.buildIvfIndex(base, "vec_id", "embedding", cents0, staleIdx)
    Similarity.buildIvfIndex(base, "vec_id", "embedding", cents0, autoIdx)
    Similarity.refreshIvfIndex(shifted, "vec_id", "embedding", staleIdx) // forced stale
    val dShift = Similarity.refreshIvfIndexAuto(shifted, "vec_id", "embedding",
      autoIdx, shiftThreshold = 0.1)
    assert(dShift.refit && dShift.maxAbsShift >= 0.1,
      s"planted offset must trigger a refit: $dShift")
    val centsAuto = Similarity.readIvfCentroids(spark, autoIdx).get
    assert(centsAuto.map(_.toSeq) != cents0.map(_.toSeq),
      "refit must re-fit the centroids")
    assert(spark.read.parquet(autoIdx).count() == 2000,
      "refit index must cover old ∪ new")

    // ---- recall@10 from the NEW population: stale cells scatter its
    // clusters, the refit co-locates them (the recall_report derivation:
    // |ann ∩ brute| / 10 against the exact baseline)
    val all = base.unionByName(shifted)
    val probes = Seq(2003L, 2106L, 2209L, 2312L, 2415L).map(i => shiftVec(i))
    def recall(idxPath: String, cents: Seq[Array[Float]]): Double =
      probes.map { p =>
        val truth = Similarity.bruteForceTopK(all, "vec_id", "embedding", p, 10)
          .collect().map(_.getLong(0)).toSet
        val got = Similarity.ivfTopKIndexed(spark, idxPath, "vec_id",
          "embedding", cents, p, k = 10, nprobe = 1)
          .collect().map(_.getLong(0)).toSet
        (truth intersect got).size / 10.0
      }.sum / probes.size
    val rStale = recall(staleIdx, cents0)
    val rRefit = recall(autoIdx, centsAuto)
    assert(rRefit > rStale + 0.2,
      s"refit must restore recall: stale $rStale vs refit $rRefit")
    assert(rRefit >= 0.8, s"post-refit recall@10 too low: $rRefit")
  }

  test("ANN tombstone delete: exact visibility now, compaction ≡ rebuild over survivors (r7)") {
    val keep = emb.filter(col("vec_id") % 5 =!= 2)
    val drop = emb.filter(col("vec_id") % 5 === 2)
    val dropIds = drop.select("vec_id").collect().map(_.getLong(0)).toSet
    val probe = emb.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    val root = java.nio.file.Files.createTempDirectory("ann_del")
    // readAnnIndex = visible rows (main ∪ unfolded _delta, minus
    // tombstones) — a plain parquet read misses unfolded refreshes
    def rows(p: String, cols: String*): Set[Seq[Any]] =
      Similarity.readAnnIndex(spark, p, "vec_id").select(cols.map(col): _*)
        .collect().map(_.toSeq).toSet
    try {
      // ---- LSH
      val lsh = root.resolve("lsh").toString
      val lshRef = root.resolve("lsh_ref").toString
      Similarity.buildLshIndex(emb, "vec_id", "embedding", lsh)
      Similarity.deleteFromAnnIndex(drop.select("vec_id"), "vec_id", lsh)
      val pre = Similarity.lshTopKIndexed(spark, lsh, "vec_id", "embedding",
        probe, 20).collect().map(_.getLong(0))
      assert(pre.nonEmpty && pre.forall(!dropIds.contains(_)),
        "tombstoned vectors must never surface")
      Similarity.compactAnnIndex(spark, lsh, "vec_id", Seq("table", "bucket"))
      Similarity.buildLshIndex(keep, "vec_id", "embedding", lshRef)
      assert(rows(lsh, "vec_id", "table", "bucket")
        == rows(lshRef, "vec_id", "table", "bucket"))
      // meta survived the swap: probes still run (and match the rebuild)
      assert(Similarity.lshTopKIndexed(spark, lsh, "vec_id", "embedding",
          probe, 10).collect().toSeq
        == Similarity.lshTopKIndexed(spark, lshRef, "vec_id", "embedding",
          probe, 10).collect().toSeq)
      // ---- IVF
      val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
        .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
      val ivf = root.resolve("ivf").toString
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", centroids, ivf)
      Similarity.deleteFromAnnIndex(drop.select("vec_id"), "vec_id", ivf)
      Similarity.compactAnnIndex(spark, ivf, "vec_id", Seq("cell_id"))
      val ivfRef = root.resolve("ivf_ref").toString
      Similarity.buildIvfIndex(keep, "vec_id", "embedding", centroids, ivfRef)
      assert(rows(ivf, "vec_id", "cell_id") == rows(ivfRef, "vec_id", "cell_id"))
      assert(Similarity.readIvfCentroids(spark, ivf).isDefined,
        "the centroid sidecar must survive compaction")
      // ---- PQ (unpartitioned code table)
      val (_, codebooks) = pqFixture
      val pq = root.resolve("pq").toString
      Similarity.buildPqIndex(emb, "vec_id", "embedding", codebooks, pq)
      Similarity.deleteFromAnnIndex(drop.select("vec_id"), "vec_id", pq)
      val prePq = Similarity.adcTopKIndexed(spark, pq, "vec_id", codebooks,
        probe, 20).collect().map(_.getLong(0))
      assert(prePq.nonEmpty && prePq.forall(!dropIds.contains(_)))
      Similarity.compactAnnIndex(spark, pq, "vec_id", Seq.empty)
      val pqRef = root.resolve("pq_ref").toString
      Similarity.buildPqIndex(keep, "vec_id", "embedding", codebooks, pqRef)
      assert(rows(pq, "vec_id", "codes") == rows(pqRef, "vec_id", "codes"))
      assert(Similarity.adcTopKIndexed(spark, pq, "vec_id", codebooks,
          probe, 10).collect().toSeq
        == Similarity.adcTopKIndexed(spark, pqRef, "vec_id", codebooks,
          probe, 10).collect().toSeq,
        "the fingerprint meta must survive compaction and probes match")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("fused PqAssign equals the composed per-subspace reference form") {
    val (_, codebooks) = pqFixture
    val subDim = codebooks.head.head.length
    // the composed expression tree IS the pinned semantics (and the shape
    // the DuckDB oracle replays); the fused loop must match it bit-for-bit
    val composed = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id") +: codebooks.indices.map(m =>
        Similarity.pqCodeExpr(col("embedding"), codebooks(m), m, subDim)
          .as(s"c$m")): _*)
      .collect().map(r => r.getLong(0) -> (1 to codebooks.size).map(r.getInt)).toMap
    val fused = Similarity.pqPackedCodes(emb, "vec_id", "embedding", codebooks)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(fused.keySet == composed.keySet)
    fused.foreach { case (id, codes) =>
      assert(codes == composed(id), s"vec $id: fused $codes != composed ${composed(id)}")
    }
  }

  test("stripHtml: blocks, tags, entities, whitespace, null") {
    val rows = Seq(
      (1L, "<html><head><script>var x = '<p>';</script><style>a{b}</style></head>" +
        "<body><!-- note --><h1>Title</h1><p>Hello   <b>world</b></p></body></html>"),
      (2L, "plain text stays"),
      (3L, "&amp;lt; decodes one level; &quot;q&quot; &#39;s&#39;&nbsp;x &gt; &lt;"),
      (4L, null))
    val df = spark.createDataFrame(rows).toDF("id", "html")
    val out = df.select(col("id"), TextAnalysis.stripHtml(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Title Hello world")
    assert(out(2L) == "plain text stays")
    // &amp;lt; -> &lt; (one decode level, amp last); entities decode
    assert(out(3L) == "&lt; decodes one level; \"q\" 's' x > <")
    assert(out(4L) == null)
  }

  test("sharding: stable assignment, balanced-ish deal, sorted shard dirs round-trip") {
    val n = 8
    val assigned = Sharding.assignShards(docs, "doc_id", n)
    // in-range, deterministic (same rows on re-evaluation), no shuffle op
    val shards = assigned.select("shard").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(shards.forall(s => s >= 0 && s < n))
    assert(shards.length == n, s"fixture should touch all $n shards, got ${shards.length}")
    // every doc appears exactly once across shard dirs, each dir pure
    val outDir = java.nio.file.Files.createTempDirectory("shards").toString
    Sharding.writeShards(docs, "doc_id", n, outDir)
    val back = spark.read.parquet(outDir)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    val impure = back
      .withColumn("expect", Sharding.shardId(col("doc_id"), n))
      .filter(col("shard") =!= col("expect")).count()
    assert(impure == 0, s"$impure rows landed in the wrong shard dir")
    // shard dirs exist as partition directories
    val dirs = new java.io.File(outDir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.length == n)
    // within one shard file, rows come back in shard_rank order (the
    // loader's no-sort stream contract)
    val one = spark.read.parquet(outDir + "/shard=" + shards.head)
      .select("shard_rank").collect().map(_.getLong(0))
    assert(one.sameElements(one.sorted), "shard file not sorted by shard_rank")
  }

  test("keepBestPerCluster: best quality wins, ties break to min id, singletons survive") {
    import spark.implicits._
    val ds = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val scores = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (4L, 0.1),
      (5L, 0.7), (6L, 0.7)).toDF("id", "score")
    val out = Dedup.keepBestPerCluster(ds, pairs, scores, "id", "score")
      .orderBy("cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 0.9, 3L),   // chained cluster {1,2,3}: 2 has best quality
      (4L, 4L, 0.1, 1L),   // singleton keeps itself
      (5L, 5L, 0.7, 2L)))  // tie {5,6}: min id wins
  }

  test("quantileBins: quartile labels, boundary goes low, null score gets null bin") {
    import spark.implicits._
    val scores = ((1 to 100).map(i => (i.toLong, Some(i / 100.0))) :+
      (101L, Option.empty[Double])).toDF("id", "s")
    val out = Sampling.quantileBins(scores, "s", Seq(0.25, 0.5, 0.75))
    val byBin = out.groupBy("bin").count().collect()
      .map(r => (if (r.isNullAt(0)) -1 else r.getInt(0)) -> r.getLong(1)).toMap
    // quartile boundaries of 1..100/100 interpolate to .2575/.505/.7525,
    // so the four bins split exactly 25/25/25/25
    assert(byBin(-1) == 1, "null score must land in the null bin")
    assert(byBin.view.filterKeys(_ >= 0).values.sum == 100)
    assert(byBin(0) == 25 && byBin(3) == 25)
    // the boundary value itself bins LOW (<=)
    val b = out.filter(col("id") === 25).select("bin").head().getInt(0)
    assert(b == 0)
  }

  test("hardNegatives: top-k by cosine among different-label vectors only") {
    val probes = emb.filter(col("vec_id") < 8)
    val corpus = emb.filter(col("vec_id") >= 8)
    val negs = Similarity.hardNegatives(
        corpus, "vec_id", "embedding", "label",
        probes, "vec_id", "embedding", "label", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(negs.nonEmpty)
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    // a negative NEVER shares its probe's label
    negs.foreach { case (p, n, _) =>
      assert(labelOf(p) != labelOf(n), s"probe $p got same-label negative $n")
    }
    // and equals the brute filtered ranking: for one probe, the top-5
    // different-label cosines from batchTopK's unfiltered output
    val p0 = negs.map(_._1).min
    val brute = Similarity.batchTopK(
        corpus, "vec_id", "embedding",
        probes.filter(col("vec_id") === p0), "vec_id", "embedding",
        k = corpus.count().toInt)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
      .filter { case (n, _) => labelOf(n) != labelOf(p0) }
      .sortBy { case (n, c) => (-c, n) }.take(5).toSeq
    val mine = negs.filter(_._1 == p0).map { case (_, n, c) => (n, c) }.toSeq
    assert(mine == brute, s"probe $p0: $mine != brute $brute")
  }

  test("stripBoilerplateLines: df-hot lines drop, order survives, all-hot doc empties") {
    import spark.implicits._
    val ds = Seq(
      (1L, "unique one\nFOOTER\nbody a"),
      (2L, "body b\nFOOTER"),
      (3L, "FOOTER\nbody c"),
      (4L, "FOOTER"),                    // nothing but boilerplate
      (5L, null: String))                // null text -> one "" line, kept
      .toDF("id", "text")
    val out = TextAnalysis.stripBoilerplateLines(ds, "id", "text", minDocs = 2L)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "unique one\nbody a", 2L, 1L),  // FOOTER (df=4) cut, order kept
      (2L, "body b", 1L, 1L),
      (3L, "body c", 1L, 1L),
      (4L, "", 0L, 1L),                    // fully-boilerplate doc -> empty
      (5L, "", 1L, 0L)))                   // "" line df=1: kept
  }

  test("stripBoilerplateLines: blank lines are paragraph structure, never boilerplate") {
    import spark.implicits._
    // every doc contains a blank separator line (df=3 >= minDocs=2); the
    // pre-fix DF aggregate would flag '' hot and flatten every paragraph
    val ds = Seq(
      (1L, "para one\n\npara two\nFOOTER"),
      (2L, "intro\n\nbody\nFOOTER"),
      (3L, "solo\n\nend"))
      .toDF("id", "text")
    val out = TextAnalysis.stripBoilerplateLines(ds, "id", "text", minDocs = 2L)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "para one\n\npara two", 3L, 1L),
      (2L, "intro\n\nbody", 3L, 1L),
      (3L, "solo\n\nend", 3L, 0L)))
  }

  test("stripBoilerplateLines: shuffled-join fallback (budget 0) equals the broadcast path") {
    import spark.implicits._
    val ds = (1L to 30L).map(i =>
        (i, s"unique head $i\nSHARED FOOTER\nbody $i" + (if (i % 3 == 0) "\nSUB FOOTER" else "")))
      .toDF("id", "text")
    val broadcasted = TextAnalysis.stripBoilerplateLines(ds, "id", "text", minDocs = 2L)
    val shuffled = TextAnalysis.stripBoilerplateLines(ds, "id", "text", minDocs = 2L,
      broadcastBudgetBytes = 0L)
    assert(broadcasted.exceptAll(shuffled).isEmpty
      && shuffled.exceptAll(broadcasted).isEmpty)
    // and the fallback genuinely forces the shuffled join — checkpoint
    // stats would otherwise still read tiny and tempt a broadcast
    val p = shuffled.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin") && !p.contains("BroadcastHashJoin"),
      s"budget 0 must force the shuffled flagging join:\n$p")
  }

  test("deterministicSample: exactly n rows, identical set under any partitioning") {
    import spark.implicits._
    val df = (1L to 5000L).map(i => (i, s"v$i")).toDF("id", "v")
    val a = Sampling.deterministicSample(df, col("id"), 100)
    assert(a.count() == 100)
    assert(a.columns.toSeq == Seq("id", "v"), "temp hash column leaked")
    val b = Sampling.deterministicSample(df.repartition(17), col("id"), 100)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "sample must not depend on partitioning")
    // n larger than the table keeps everything
    assert(Sampling.deterministicSample(df.limit(7), col("id"), 100).count() == 7)
  }

  test("histogramQuantiles: estimates hit the bin upper edges, nulls ignored") {
    import spark.implicits._
    // group g: values 1..100, width 10 → bin0 holds 1..9 (9 rows),
    // bins 1..9 hold 10 each, bin10 holds {100}. cum first reaches 50 at
    // bin5 (cum 59) → p50 = upper edge 60.0 (the bin holding the true
    // median 50.5); cum first reaches 90 at bin9 (cum 99) → p90 = 100.0
    val df = ((1 to 100).map(i => ("g", Some(i.toDouble))) :+
      (("g", Option.empty[Double]))).toDF("grp", "x")
    val out = Sampling.histogramQuantiles(df, "grp", "x", 10.0, Seq(0.5, 0.9))
      .collect()
    assert(out.length == 1)
    assert(out(0).getDouble(1) == 60.0 && out(0).getDouble(2) == 100.0,
      s"got ${out(0)}")
    intercept[IllegalArgumentException] {
      Sampling.histogramQuantiles(df, "grp", "x", 0.0, Seq(0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.histogramQuantiles(df, "grp", "x", 10.0, Seq(0.5, 0.5))
    }
  }

  test("quantileBins rejects duplicate probs and reserved column names") {
    import spark.implicits._
    val df = Seq((1L, 0.5)).toDF("id", "s")
    intercept[IllegalArgumentException] {
      Sampling.quantileBins(df, "s", Seq(0.25, 0.25, 0.75))
    }
    intercept[IllegalArgumentException] {
      Sampling.quantileBins(df.withColumn("__qb", lit(1)), "s", Seq(0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.quantileBins(df.withColumn("__b0", lit(1)), "s", Seq(0.5))
    }
  }

  test("keepBestFromLabels: a doc without a score row fails loudly, not silently") {
    import spark.implicits._
    val ds = Seq(1L, 2L, 3L).toDF("id")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 0.2), (2L, 0.9)).toDF("id", "score") // 3 unscored
    val ex = intercept[Exception] {
      Dedup.keepBestFromLabels(ds, labels, scores, "id", "score").collect()
    }
    val messages = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("no score row"),
      s"expected the missing-score raise, got: $messages")
    // and the labels shape contract is checked up front
    intercept[IllegalArgumentException] {
      Dedup.keepBestFromLabels(ds, labels.withColumnRenamed("doc_id", "id"),
        scores, "id", "score")
    }
  }
}

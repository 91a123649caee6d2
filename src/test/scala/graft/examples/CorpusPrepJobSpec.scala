package graft.examples

import java.nio.file.Files
import graft.SparkTestBase
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class CorpusPrepJobSpec extends SparkTestBase {

  test("corpus prep: cleaned, packed, indexed — and increments dedup against it") {
    val docs = Tables.load(spark, sf(), "documents")
    val out = Files.createTempDirectory("corpusprep").toString
    val training = CorpusPrepJob.run(spark, docs, out, contextTokens = 512L,
      chunkTokens = 64, chunkStride = 48)

    // survivors are exact-unique and above the quality floor
    assert(training.count() > 0)
    assert(training.select("text").distinct().count() == training.count())
    assert(training.filter(col("quality") < 0.3).isEmpty)
    // pack ids agree with the chunking law: pack = start // budget, where
    // start is the exclusive running token total in doc_id order.
    // (contiguity is NOT asserted — a doc longer than the budget legally
    // spans windows no document starts in)
    import org.apache.spark.sql.expressions.Window
    val lawViolations = training
      .withColumn("start", coalesce(sum("n_tokens").over(Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("pack_id") =!= (col("start") / 512L).cast("long"))
      .count()
    assert(lawViolations == 0, s"pack law violated for $lawViolations docs")
    val packs = training.select("pack_id").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(packs.head == 0)
    // the training set is partitioned by pack on disk
    val dirs = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$out/training_set"))
    val nPackDirs = try dirs.iterator().asScala
      .count(_.getFileName.toString.startsWith("pack_id=")) finally dirs.close()
    assert(nPackDirs == packs.length)

    // a future increment dedups against the persisted band index alone
    val bands = spark.read.parquet(s"$out/lsh_bands")
    val increment = docs.limit(20) // resend of already-ingested docs
    val cand = Dedup.minHashCandidatesAgainst(
      Dedup.minHashBands(Dedup.minHashSignatures(increment, "doc_id", "text")),
      bands)
    // every resent doc that SURVIVED cleaning must hit the index
    val survivors = training.select("doc_id")
      .join(increment.select("doc_id"), Seq("doc_id"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    val hit = cand.select("id_new").distinct().collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(hit),
      s"index missed resent survivors: ${survivors -- hit}")

    // the optional chunk output covers exactly the training survivors
    val chunks = spark.read.parquet(s"$out/chunks")
    assert(chunks.count() > 0)
    assert(chunks.join(training.select("doc_id"), Seq("doc_id"), "left_anti")
      .isEmpty, "chunks exist for docs outside the training set")
    assert(training.filter(col("n_tokens") > 0)
      .join(chunks.select("doc_id"), Seq("doc_id"), "left_anti")
      .isEmpty, "a non-empty training doc has no chunks")
  }

  test("corpus prep: decontamination and stratified sampling compose") {
    val docs = Tables.load(spark, sf(), "documents")
    // the eval set is drawn from the corpus itself, so decontamination
    // must remove at least those members (and their shingle-sharers)
    val eval_ = docs.filter(col("doc_id") % 101 === 0)
      .select("doc_id", "text")
    val out = Files.createTempDirectory("corpusprep2").toString
    val training = CorpusPrepJob.run(spark, docs, out, contextTokens = 512L,
      evalDocs = Some(eval_), sampleRates = Map("src0" -> 0.0))
    assert(training.count() > 0)
    // no surviving doc shares any 3-gram with the eval set
    val hits = Dedup.contaminationHits(
      Dedup.shingleExplode(training, "doc_id", "text"),
      Dedup.shingleExplode(eval_, "doc_id", "text"))
    assert(hits.isEmpty, "contaminated docs survived decontamination")
    // src0 was sampled out entirely
    val src0Survivors = training
      .join(docs.filter(col("source") === "src0").select("doc_id"),
        Seq("doc_id"), "left_semi")
    assert(src0Survivors.isEmpty, "rate-0 source leaked into the training set")
    // the band index matches the training set, not the pre-sampling
    // corpus (docs too short to shingle legitimately have no signature)
    val bands = spark.read.parquet(s"$out/lsh_bands")
    assert(bands.select("doc_id").distinct().count() ==
      Dedup.shingleExplode(training, "doc_id", "text")
        .select("doc_id").distinct().count())
  }

  test("corpus prep: span strip cuts cross-doc boilerplate from the training text") {
    val docs = Tables.load(spark, sf(), "documents")
    val out = Files.createTempDirectory("corpusprep3").toString
    val training = CorpusPrepJob.run(spark, docs, out, contextTokens = 512L,
      stripSpans = true, spanK = 5)
    assert(training.count() > 0)
    // re-running the detector on the output finds nothing. Strictly a
    // single pass only guarantees FLAGGED spans are gone (cut edges can
    // rejoin into new shared 5-grams in principle); on the deterministic
    // fixture the single pass is empirically residue-free, so assert the
    // stronger property — if the fixture changes and this trips, relax to
    // the flagged-spans-only invariant
    val residue = Dedup.duplicatedSpans(training, "doc_id", "text", k = 5)
      .filter(col("dup_spans") > 0)
    assert(residue.isEmpty, "duplicated spans survived the strip stage")
    // nothing empty got packed, and n_tokens reflects the STRIPPED text
    assert(training.filter(col("text") === "").isEmpty)
    assert(training.filter(
      col("n_tokens") =!= size(split(col("text"), "\\s+", -1))).isEmpty,
      "n_tokens disagrees with the stripped text")
  }

  test("corpus prep: boilerplate-line strip and shard deal compose end-to-end") {
    import spark.implicits._
    val docs = Tables.load(spark, sf(), "documents")
      // salt a universal footer line onto every doc so the stage has
      // something real to cut
      .withColumn("text", concat(col("text"), lit("\nCopyright Example Corp")))
    val out = Files.createTempDirectory("corpusprep4").toString
    val training = CorpusPrepJob.run(spark, docs, out, contextTokens = 512L,
      boilerplateMinDocs = 10L, nShards = 4)
    assert(training.count() > 0)
    // the footer line is gone from every surviving text
    assert(training.filter(col("text").contains("Copyright Example Corp")).isEmpty,
      "boilerplate line survived the strip stage")
    // shard dirs exist, cover the training set exactly, and each is pure
    val shards = spark.read.parquet(s"$out/shards")
    assert(shards.count() == training.count())
    assert(shards.select("doc_id").except(training.select("doc_id")).isEmpty)
    val impure = shards
      .withColumn("expect", graft.operators.Sharding.shardId(col("doc_id"), 4))
      .filter(col("shard") =!= col("expect")).count()
    assert(impure == 0, s"$impure training rows landed in the wrong shard")
  }

  test("corpus prep: LM-perplexity gate drops the low-probability tail") {
    import spark.implicits._
    val docs = Tables.load(spark, sf(), "documents")
    val out = Files.createTempDirectory("corpusprep5").toString
    // ungated run establishes the survivor set; the gated run at a floor
    // chosen INSIDE the survivors' score range must drop someone and
    // keep exactly the docs at-or-above the floor
    val ungated = CorpusPrepJob.run(spark, docs, out, contextTokens = 512L)
    val scores = graft.operators.TextAnalysis
      .bigramLogProb(ungated.select("doc_id", "text"), "doc_id", "text")
    val floor = scores.agg(
      org.apache.spark.sql.functions.expr("percentile(avg_logp, 0.2)"))
      .head().getDouble(0)
    val out2 = Files.createTempDirectory("corpusprep6").toString
    val gated = CorpusPrepJob.run(spark, docs, out2, contextTokens = 512L,
      lmFloorLogProb = Some(floor))
    assert(gated.count() > 0 && gated.count() < ungated.count(),
      s"gate dropped nobody (floor=$floor)")
    // nobody below the floor survives — re-scoring the gated survivors'
    // ids against the UNGATED model reproduces the gate decision
    val kept = gated.select("doc_id")
    val below = scores.filter(col("avg_logp") < floor || col("avg_logp").isNull)
      .select("doc_id")
    assert(kept.intersect(below).isEmpty,
      "a below-floor doc survived the LM gate")
  }
}

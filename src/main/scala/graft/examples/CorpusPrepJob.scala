package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, Dedup, Packing, Sampling}

/** End-to-end training-corpus preparation — the §2.K operators composed
  * the way a pretraining data job uses them:
  *
  *  0. decontaminate (optional): drop every document sharing a word
  *     3-gram with the held-out eval set ([[Dedup.contaminationHits]],
  *     eval side broadcast);
  *  1. clean: exact dedup → near-dup cluster collapse → quality floor
  *     ([[CorpusPipeline.cleanCorpus]], one shared shingle stage);
  *  1b. strip boilerplate lines (optional): drop lines appearing in
  *     >= boilerplateMinDocs distinct survivors — cookie banners,
  *     footers ([[graft.operators.TextAnalysis.stripBoilerplateLines]]);
  *  1c. strip spans (optional): cut cross-document duplicated k-word
  *     substrings from the survivors' text and drop docs left empty
  *     ([[Dedup.stripDuplicatedSpans]], the cut-the-substring policy);
  *  1d. LM gate (optional): fit the corpus bigram model on the
  *     survivors and drop documents whose mean bigram log-probability
  *     falls below the floor — the CCNet-style perplexity filter
  *     ([[graft.operators.TextAnalysis.bigramLogProb]]); docs too short
  *     to score (< 2 tokens) are dropped with them;
  *  2. sample (optional): per-group deterministic downsampling to the
  *     target mixture ([[Sampling.stratifiedSample]], map-side filter);
  *  3. pack: concatenate-and-chunk context-window assignment
  *     ([[Packing.packChunks]], two-phase distributed prefix sum);
  *  4. index: persist the MinHash band index future increments dedup
  *     against ([[Dedup.minHashBands]]) without re-reading this corpus;
  *  5. chunk (optional): overlapping token-window chunks of the sampled
  *     survivors for retrieval/long-doc training ([[Packing.chunkDocs]],
  *     map-only) written next to the packed set;
  *  6. shard (optional): deal the training set into nShards
  *     deterministic hash-ordered shard dirs a loader streams without
  *     its own shuffle ([[graft.operators.Sharding.writeShards]]).
  *
  * Returns the packed training set; writes it and the band index under
  * `outDir`. Every stage is a keyed shuffle or map-only pass — nothing
  * corpus-sized ever reaches the driver.
  */
object CorpusPrepJob {

  def run(spark: SparkSession, docs: DataFrame, outDir: String,
      contextTokens: Long = 2048L, minQuality: Double = 0.3,
      evalDocs: Option[DataFrame] = None, maxEvalHits: Long = 0L,
      sampleRates: Map[String, Double] = Map.empty,
      sampleGroupCol: String = "source",
      defaultSampleRate: Double = 1.0,
      stripSpans: Boolean = false, spanK: Int = 5,
      boilerplateMinDocs: Long = 0L,
      lmFloorLogProb: Option[Double] = None,
      chunkTokens: Int = 0, chunkStride: Int = 0,
      nShards: Int = 0): DataFrame = {
    require(nShards >= 0, s"nShards must be >= 0, got $nShards")
    require(boilerplateMinDocs == 0L || boilerplateMinDocs >= 2L,
      s"boilerplateMinDocs must be 0 (off) or >= 2, got $boilerplateMinDocs")
    // fail rate errors at the boundary, not only on the code path that
    // happens to reach stratifiedSample (an out-of-range default with an
    // empty rate map must not silently no-op)
    require(defaultSampleRate >= 0.0 && defaultSampleRate <= 1.0,
      s"defaultSampleRate must be in [0,1], got $defaultSampleRate")
    // chunking args validate HERE, not when chunkDocs finally runs after
    // the cleaning/packing/writes — an hours-long pipeline must not fail
    // on an argument typo at its last stage
    require(chunkTokens >= 0, s"chunkTokens must be >= 0, got $chunkTokens")
    require(chunkStride >= 0 && (chunkTokens == 0 || chunkStride <= chunkTokens),
      s"chunkStride must be in [0, chunkTokens], got $chunkStride")
    // a stride without a chunk size is the forgot-one-arg typo: rejecting
    // it here beats silently skipping the chunks output hours later
    require(chunkTokens > 0 || chunkStride == 0,
      s"chunkStride=$chunkStride requires chunkTokens > 0")
    val shingled0 = Dedup.shingleExplode(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // decontamination filters BOTH the docs and their already-computed
    // shingles, so the cleaning stage below sees shingles that exactly
    // cover its input (a superset would also satisfy today's consumers,
    // but exact coverage keeps the invariant simple). dropIds is tiny
    // (contaminated ids only) and consumed by several downstream actions
    // — persist it so the corpus-wide contamination aggregate runs once.
    val dropIds = evalDocs.map { ev =>
      Dedup.contaminationHits(shingled0,
          Dedup.shingleExplode(ev, "doc_id", "text"))
        .filter(col("n_hits") > maxEvalHits)
        .select("doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val (docsIn, shingled) = dropIds match {
      case Some(drop) =>
        (docs.join(drop, Seq("doc_id"), "left_anti"),
          shingled0.join(drop, Seq("doc_id"), "left_anti"))
      case None => (docs, shingled0)
    }
    // three consumers below (packing, the training-set join, the index
    // semi-join) — materialize the cleaning once at the fan-out point;
    // persist (not localCheckpoint) so the finally can RELEASE the blocks:
    // repeated runs in a long-lived app must not accumulate corpus-sized
    // cache entries
    val cleaned = CorpusPipeline.cleanCorpus(docsIn,
        minQuality = minQuality, corpusShingles = Some(shingled))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // span strip runs on the SURVIVORS (exact/near dups are already
      // gone, so flagged spans are genuine cross-doc boilerplate); docs
      // cut down to nothing are dropped by the inner join
      // boilerplate lines strip FIRST (structural furniture), then span
      // strip (residual repeated substrings) — each on the previous
      // stage's survivors; docs reduced to nothing drop at each stage
      val deBoiled =
        if (boilerplateMinDocs == 0L) cleaned
        else cleaned.drop("text").join(
          graft.operators.TextAnalysis.stripBoilerplateLines(
              cleaned, "doc_id", "text", boilerplateMinDocs)
            .filter(col("n_kept") > 0)
            .select(col("doc_id"), col("clean_text").as("text")),
          Seq("doc_id"))
      val boiled =
        if (!stripSpans) deBoiled
        else deBoiled.drop("text").join(
          Dedup.stripDuplicatedSpans(deBoiled, "doc_id", "text", k = spanK)
            .filter(col("kept_tokens") > 0)
            .select(col("doc_id"), col("clean_text").as("text")),
          Seq("doc_id"))
      // LM gate on the fully-cleaned text (dup furniture is gone, so the
      // model fits on what training would actually see); null-scored
      // docs (< 2 tokens) fail the >= floor filter and drop with the low
      // scorers
      val lmGated = lmFloorLogProb match {
        case None => boiled
        case Some(floor) =>
          boiled.join(
            graft.operators.TextAnalysis.bigramLogProb(boiled, "doc_id", "text")
              .filter(col("avg_logp") >= floor)
              .select("doc_id"),
            Seq("doc_id"), "left_semi")
      }
      val sampled =
        if (sampleRates.isEmpty && defaultSampleRate >= 1.0) lmGated
        else Sampling.stratifiedSample(lmGated, sampleGroupCol, col("text"),
          sampleRates, defaultSampleRate).drop("h8")
      val packed = Packing.packChunks(sampled, "doc_id", "text", contextTokens)
      val trainingSet = sampled
        .join(packed.select("doc_id", "n_tokens", "pack_id", "offset_in_pack"),
          Seq("doc_id"))
        .select("doc_id", "text", "quality", "n_tokens", "pack_id", "offset_in_pack")
      trainingSet.write.mode("overwrite")
        .partitionBy("pack_id") // training readers pull whole packs
        .parquet(s"$outDir/training_set")

      // the training set's signatures only — the increment index never
      // includes documents this run rejected or sampled out
      Dedup.minHashBands(Dedup.minHashSignaturesFrom(
          shingled.join(sampled.select("doc_id"), Seq("doc_id"), "left_semi")))
        .write.mode("overwrite").parquet(s"$outDir/lsh_bands")

      // optional retrieval chunks over the same survivors (map-only)
      if (chunkTokens > 0)
        Packing.chunkDocs(sampled, "doc_id", "text", chunkTokens,
            if (chunkStride > 0) chunkStride else chunkTokens)
          .write.mode("overwrite").parquet(s"$outDir/chunks")

      // optional deterministic shard deal of the SAME training rows:
      // shard dirs are what a multi-host loader streams (one shard set
      // per host, hash order within) — one extra shuffle, no global sort
      if (nShards > 0)
        graft.operators.Sharding.writeShards(
          trainingSet, "doc_id", nShards, s"$outDir/shards")

      // re-read what was written, restored to trainingSet's declared
      // schema (partitionBy infers pack_id as int and reorders it last)
      spark.read.parquet(s"$outDir/training_set")
        .select(col("doc_id"), col("text"), col("quality"), col("n_tokens"),
          col("pack_id").cast("long").as("pack_id"), col("offset_in_pack"))
    } finally {
      shingled0.unpersist(blocking = false)
      dropIds.foreach(_.unpersist(blocking = false))
      cleaned.unpersist(blocking = false)
    }
  }
}

package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten erasure across the corpus and every derived
  * artifact: data files swapped, dedup sidecars scrubbed (re-submitted
  * content is NEW, not deduped against a ghost), indexes physically
  * compacted. */
class ForgetSpec extends SparkTestBase {

  test("forgetDocuments erases corpus, hash sidecar, BM25 postings and IVF rows") {
    val root = java.nio.file.Files.createTempDirectory("graft-forget")
    val corpusDir = s"$root/corpus"
    val textIdx = s"$root/textidx"
    val ivfIdx = s"$root/ivfidx"

    // range-clustered multi-file layout so the file-pruned rewrite has
    // untouched files to preserve (ids 2/3/7 all land low); doc 900 is a
    // PLANTED exact duplicate of doc 2 — forgetting 2 while 900 survives
    // exercises the shared-content hash-scrub guard
    import spark.implicits._
    val fixture = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").filter(col("doc_id") < 40)
    val doc2Text = fixture.filter(col("doc_id") === 2)
      .select("text").as[String].collect().head
    val docs = fixture.union(Seq((900L, doc2Text)).toDF("doc_id", "text"))
    docs.repartitionByRange(4, col("doc_id")).write.parquet(corpusDir)
    // the streaming ingester's hash sidecar
    spark.read.parquet(corpusDir)
      .select(md5(col("text")).as("corpus_content_hash"))
      .write.parquet(s"$corpusDir/_hash_index")
    TextAnalysis.buildTextIndex(docs, "doc_id", "text", textIdx, nBuckets = 8)
    val emb = Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .filter(col("doc_id") < 40)
    val centroids = Similarity.fitCentroids(emb, "doc_id", "embedding",
      k = 4, iterations = 2)
    Similarity.buildIvfIndex(emb, "doc_id", "embedding", centroids, ivfIdx)

    val goneIds = Seq(2L, 3L, 7L).toDF("doc_id")
    val uniqueForgotten = docs.filter(col("doc_id") === 3)
      .select("text").as[String].collect().head
    val sharedForgotten = doc2Text
    val nBefore = spark.read.parquet(corpusDir).count()

    def dataFiles() = new java.io.File(corpusDir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    val filesBefore = dataFiles()

    val n = CorpusPipeline.forgetDocuments(spark, goneIds, "doc_id",
      corpusDir, "text", textIndexDir = Some(textIdx),
      annIndexes = Seq((ivfIdx, Seq("cell_id"))))
    assert(n == 3)

    // 1. corpus: rows gone, everything else intact
    val after = spark.read.parquet(corpusDir)
    assert(after.count() == nBefore - 3)
    assert(after.join(goneIds, Seq("doc_id"), "left_semi").count() == 0)

    // 1b. FILE-PRUNED: files without forgotten ids survive byte-untouched
    //     (same name, same mtime); at least one file was rewritten
    val filesAfter = dataFiles()
    val untouched = filesBefore.keySet.intersect(filesAfter.keySet)
    assert(untouched.nonEmpty, "range layout should leave unaffected files")
    untouched.foreach { f =>
      assert(filesBefore(f) == filesAfter(f), s"unaffected file $f was rewritten")
    }
    assert(filesAfter.keySet.exists(_.startsWith("forget-")),
      "the affected files' survivors must come back under staged names")

    // 2. hash sidecar scrubbed: a re-submission of forgotten CONTENT
    //    passes the exact-dedup gate as brand-new
    val resub = Seq((1000L, uniqueForgotten)).toDF("doc_id", "text")
    val surviving = Dedup.exactAgainstHashes(resub,
      spark.read.parquet(s"$corpusDir/_hash_index"), "text")
    assert(surviving.count() == 1,
      "forgotten content must re-ingest as new, not dedup against a ghost")
    // while still-present content stays deduped
    val dupOfLive = after.select("text").limit(1).as[String].collect()
    val resubLive = Seq((1001L, dupOfLive.head)).toDF("doc_id", "text")
    assert(Dedup.exactAgainstHashes(resubLive,
      spark.read.parquet(s"$corpusDir/_hash_index"), "text").count() == 0)
    // 2b. forgotten doc 2's text ALSO lives in surviving doc 900: its hash
    //     must SURVIVE the scrub — still-present content stays deduped
    //     even when a duplicate holder was erased
    val resubShared = Seq((1002L, sharedForgotten)).toDF("doc_id", "text")
    assert(Dedup.exactAgainstHashes(resubShared,
        spark.read.parquet(s"$corpusDir/_hash_index"), "text").count() == 0,
      "content shared with a surviving doc must keep its dedup protection")

    // 3. BM25 index physically compacted: no forgotten postings, no
    //    tombstones left behind, probes still serve
    val postings = spark.read.parquet(s"$textIdx/postings")
    assert(postings.join(goneIds, Seq("doc_id"), "left_semi").count() == 0)
    assert(!new java.io.File(s"$textIdx/tombstones").exists())
    assert(TextAnalysis.bm25TopDocsIndexed(spark, textIdx, nTerms = 1,
      minTermLen = 4, topK = 5).count() > 0)

    // 4. IVF layout compacted the same way
    val ivfRows = spark.read.parquet(ivfIdx)
    assert(ivfRows.join(goneIds, Seq("doc_id"), "left_semi").count() == 0)
    assert(ivfRows.count() == emb.count() - 3)
  }

  /** The OTHER crash window — sidecar scrub completed, corpus swap not
    * yet run. Under the r10 ordering (derived artifacts first, corpus
    * last) a re-run recomputes the same scrub sets from the UNCHANGED
    * corpus, so each scrub replays as an idempotent anti-join and the
    * corpus swap completes; the reverse order would have found no gone
    * rows, an empty goneHashes, and left the hash sidecar permanently
    * ghost-deduping forgotten content. */
  test("crash between sidecar scrub and corpus swap: re-run completes, guards intact") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-forget-order")
    val corpusDir = s"$root/corpus"
    val fixture = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").filter(col("doc_id") < 40)
    val doc2Text = fixture.filter(col("doc_id") === 2)
      .select("text").as[String].collect().head
    val docs = fixture.union(Seq((900L, doc2Text)).toDF("doc_id", "text"))
    docs.repartitionByRange(4, col("doc_id")).write.parquet(corpusDir)
    spark.read.parquet(corpusDir)
      .select(md5(col("text")).as("corpus_content_hash"))
      .write.parquet(s"$corpusDir/_hash_index")
    val gone = Seq(2L, 3L, 7L).toDF("doc_id")
    val nBefore = spark.read.parquet(corpusDir).count()

    // simulate the crashed first run: hash sidecar scrubbed exactly as
    // the operator would (gone hashes minus survivor-shared), corpus
    // UNTOUCHED
    val hashes = spark.read.parquet(corpusDir)
      .select(col("doc_id"), md5(col("text")).as("corpus_content_hash"))
    val goneH = hashes.join(gone, Seq("doc_id"), "left_semi")
      .select("corpus_content_hash").distinct()
    val keptDup = hashes.join(gone, Seq("doc_id"), "left_anti")
      .join(goneH, Seq("corpus_content_hash"), "left_semi")
      .select("corpus_content_hash").distinct()
    val scrubbed = spark.read.parquet(s"$corpusDir/_hash_index")
      .join(goneH.join(keptDup, Seq("corpus_content_hash"), "left_anti"),
        Seq("corpus_content_hash"), "left_anti")
      .localCheckpoint()
    scrubbed.write.mode("overwrite").parquet(s"$corpusDir/_hash_index")

    // the re-run: must swap the corpus AND leave the sidecar consistent
    val n = CorpusPipeline.forgetDocuments(spark, gone, "doc_id",
      corpusDir, "text")
    assert(n == 3)
    val after = spark.read.parquet(corpusDir)
    assert(after.count() == nBefore - 3)
    assert(after.join(gone, Seq("doc_id"), "left_semi").count() == 0)
    // unique forgotten content re-ingests as NEW (scrub held through the
    // idempotent replay)…
    val uniqueForgotten = docs.filter(col("doc_id") === 3)
      .select("text").as[String].collect().head
    assert(Dedup.exactAgainstHashes(
      Seq((1000L, uniqueForgotten)).toDF("doc_id", "text"),
      spark.read.parquet(s"$corpusDir/_hash_index"), "text").count() == 1)
    // …while content shared with surviving doc 900 stays deduped
    assert(Dedup.exactAgainstHashes(
      Seq((1001L, doc2Text)).toDF("doc_id", "text"),
      spark.read.parquet(s"$corpusDir/_hash_index"), "text").count() == 0)
  }

  /** Fabricate the exact crash state the manifest exists for — staged
    * survivors written, manifest persisted, renames partially (or fully)
    * done, originals NOT yet deleted — and prove a re-run replays the
    * swap to completion instead of permanently duplicating the crashed
    * run's survivor rows (the pre-manifest failure mode: the re-run's
    * file-pruned scan only finds files still holding forgotten ids, so
    * orphaned forget-* files were invisible to it). */
  test("forgetDocuments replays a crashed swap window without duplicating survivors") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val fixture = Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").filter(col("doc_id") < 40)

    // crashPoint = how many of the staged renames completed before the
    // "crash": 1 = mid-rename, Int.MaxValue = all renamed, deletes not run
    for ((crashPoint, tag) <- Seq(1 -> "mid-rename", Int.MaxValue -> "pre-delete")) {
      val root = java.nio.file.Files.createTempDirectory(s"graft-forget-crash")
      val corpusDir = s"$root/corpus"
      fixture.repartitionByRange(4, col("doc_id")).write.parquet(corpusDir)
      val fs = new Path(corpusDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val gone = Seq(2L, 3L, 7L).toDF("doc_id")
      val nBefore = spark.read.parquet(corpusDir).count()

      // fabricate the crashed run, step for step with the operator
      val withFile = spark.read.parquet(corpusDir)
        .withColumn("__file", input_file_name())
      val affected = withFile.join(gone, Seq("doc_id"), "left_semi")
        .select("__file").distinct().as[String].collect().toSeq
      assert(affected.nonEmpty && affected.size < 4,
        "range layout must localize the forgotten ids to a strict file subset")
      val survivors = withFile.filter(col("__file").isin(affected: _*))
        .join(gone, Seq("doc_id"), "left_anti").drop("__file")
        .localCheckpoint()
      val staging = new Path(s"${corpusDir}_forgetting")
      survivors.write.mode("overwrite").parquet(staging.toString)
      val staged = fs.listStatus(staging)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.getName).toSeq
      val renames = staged.map(n => n -> s"forget-$n")
      CorpusPipeline.writeSwapManifest(fs, new Path(corpusDir), staging,
        renames, affected.map(u => new Path(new java.net.URI(u)).toUri.toString))
      renames.take(crashPoint).foreach { case (src, tgt) =>
        assert(fs.rename(new Path(staging, src), new Path(corpusDir, tgt)))
      }
      // crash here: originals all still present, manifest on disk

      // the re-run must first replay the manifest (finish renames, delete
      // the recorded originals), then find nothing left to forget
      val n = CorpusPipeline.forgetDocuments(spark, gone, "doc_id",
        corpusDir, "text")
      assert(n == 0, s"[$tag] replay should erase the ids before the scan")
      val after = spark.read.parquet(corpusDir)
      assert(after.count() == nBefore - 3,
        s"[$tag] corpus must end at exactly nBefore-3 rows, no duplicates")
      assert(after.select("doc_id").distinct().count() == after.count(),
        s"[$tag] crashed run's survivor files must not duplicate rows")
      assert(after.join(gone, Seq("doc_id"), "left_semi").count() == 0)
      assert(!fs.exists(new Path(corpusDir, "_forget_manifest")),
        s"[$tag] replay must clear the manifest")
      assert(!fs.exists(staging), s"[$tag] replay must clear staging")
    }
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composite training-corpus cleaning pipeline (the user story the
  * §2.K extensions exist for): exact dedup → near-dup cluster collapse →
  * quality floor → optional language allowlist. Returns the surviving
  * rows of `docs` with provenance columns describing why each doc was
  * kept.
  *
  * Scale shape: every stage is a keyed shuffle or projection over
  * (doc_id, small-payload) frames; full documents are only carried in the
  * final semi-join back onto the input. */
object CorpusPipeline {

  /** @param jaccardThreshold near-dup cutoff for the n-gram stage
    * @param minQuality keep docs with TextAnalysis quality >= this
    * @param languages  keep docs whose predicted language is in this set
    *                   (empty = no language filter)
    * @param corpusShingles optional precomputed FULL-corpus
    *                   `Dedup.shingleExplode` frame (the dedup family's
    *                   shared stage): the exact survivors' shingles are a
    *                   semi-join of it, so a caller that already persisted
    *                   it skips a second parse+shingle pass over the text */
  def cleanCorpus(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      jaccardThreshold: Double = 0.8,
      minQuality: Double = 0.3,
      languages: Set[String] = Set.empty,
      corpusShingles: Option[DataFrame] = None): DataFrame = {

    // 1. exact dedup: min-id survivor per distinct text — materialized
    //    once, since the near-dup, quality and language stages all consume
    //    it (otherwise each stage re-runs the dedup shuffle)
    val exact = Dedup.exactDedup(docs, idCol, textCol).localCheckpoint()

    // 2. near-dup clusters over the exact survivors; keep each cluster's
    //    min id (cluster_id IS the min by construction). A survivor's
    //    shingles equal its row in the full-corpus explosion, so the shared
    //    stage (when supplied) substitutes for re-shingling.
    val shingled = corpusShingles match {
      case Some(sh) => sh.join(
        exact.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_semi")
      case None => Dedup.shingleExplode(exact, idCol, textCol, n = 3)
    }
    val pairs = Dedup.ngramJaccardPairsFrom(shingled,
      threshold = jaccardThreshold, maxShingleDf = 100L)
    val clusters = Dedup.dedupClusters(pairs)
    val nearDupLosers = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    val deduped = exact.join(nearDupLosers,
      exact(idCol) === nearDupLosers("doc_id"), "left_anti")

    // 3. quality floor
    val quality = TextAnalysis.qualityScore(deduped, idCol, textCol)
      .select(col(idCol), col("quality"))
    val qualified = deduped.join(
      quality.filter(col("quality") >= minQuality).select(idCol), Seq(idCol))

    // 4. language allowlist
    val kept =
      if (languages.isEmpty) qualified
      else {
        val lang = TextAnalysis.languageId(qualified, idCol, textCol)
          .select(col(idCol), col("lang_pred"))
        qualified.join(
          lang.filter(col("lang_pred").isin(languages.toSeq: _*)).select(idCol),
          Seq(idCol))
      }

    kept.join(quality, Seq(idCol), "left")
  }

  import org.apache.hadoop.fs.{FileSystem, Path}

  private def manifestPath(dir: Path) = new Path(dir, "_forget_manifest")

  /** Persist the swap plan BEFORE any destructive step: staging dir, the
    * staged→target rename pairs, and the original files to delete — so a
    * crash anywhere in the rename/delete window is REPLAYABLE, not just
    * detectable. Written to a temp name then renamed in (atomic on local
    * fs/HDFS); underscore-prefixed so corpus readers never see it. */
  private[operators] def writeSwapManifest(fs: FileSystem, dir: Path,
      staging: Path, renames: Seq[(String, String)],
      deletes: Seq[String]): Unit = {
    val body = new StringBuilder
    body ++= s"staging\t${staging.toUri}\n"
    renames.foreach { case (src, tgt) => body ++= s"rename\t$src\t$tgt\n" }
    deletes.foreach { uri => body ++= s"delete\t$uri\n" }
    val tmp = new Path(dir, "_forget_manifest.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val mf = manifestPath(dir)
    if (fs.exists(mf)) fs.delete(mf, false)
    if (!fs.rename(tmp, mf))
      throw new java.io.IOException(s"forgetDocuments: manifest rename failed: $mf")
  }

  /** Replay a crashed swap recorded in `dir/_forget_manifest` to
    * COMPLETION: finish outstanding renames from the recorded staging dir,
    * delete the recorded originals that still exist, drop staging and the
    * manifest. Idempotent (every step checks current state first); called
    * at forgetDocuments entry for the corpus and each sidecar BEFORE any
    * read, so the crash window can never leak duplicate survivor rows
    * into a re-run's input. */
  private[operators] def completePendingSwap(fs: FileSystem, dir: Path): Unit = {
    val mf = manifestPath(dir)
    if (!fs.exists(mf)) return
    val in = fs.open(mf)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val staging = lines.collectFirst {
      case l if l.startsWith("staging\t") =>
        new Path(new java.net.URI(l.stripPrefix("staging\t")))
    }.getOrElse(throw new java.io.IOException(
      s"forgetDocuments: manifest $mf has no staging line"))
    lines.foreach { l =>
      l.split('\t') match {
        case Array("rename", src, tgt) =>
          val target = new Path(dir, tgt)
          if (!fs.exists(target)) {
            val source = new Path(staging, src)
            if (!fs.exists(source))
              throw new java.io.IOException(
                s"forgetDocuments: manifest replay lost $src (neither $target nor $source exists)")
            if (!fs.rename(source, target))
              throw new java.io.IOException(
                s"forgetDocuments: manifest replay rename failed: $source")
          }
        case Array("delete", uri) =>
          val p = new Path(new java.net.URI(uri))
          if (fs.exists(p) && !fs.delete(p, false))
            throw new java.io.IOException(
              s"forgetDocuments: manifest replay delete failed: $p")
        case _ => // staging line / blank
      }
    }
    if (fs.exists(staging)) fs.delete(staging, true)
    fs.delete(mf, false)
  }

  /** The one swap primitive: manifest first, then rename survivors in
    * under collision-free `forget-` names, then delete the replaced
    * originals, then drop staging + manifest. A crash at ANY point is
    * replayed to completion by [[completePendingSwap]] on the next run. */
  private def manifestedSwap(fs: FileSystem, dir: Path, staging: Path,
      originals: Seq[Path]): Unit = {
    val staged = fs.listStatus(staging)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSeq
    val renames = staged.map(n => n -> s"forget-$n")
    writeSwapManifest(fs, dir, staging, renames,
      originals.map(_.toUri.toString))
    renames.foreach { case (src, tgt) =>
      if (!fs.rename(new Path(staging, src), new Path(dir, tgt)))
        throw new java.io.IOException(
          s"forgetDocuments: swap rename failed for $staging/$src")
    }
    originals.foreach { p =>
      if (!fs.delete(p, false))
        throw new java.io.IOException(s"forgetDocuments: delete failed: $p")
    }
    fs.delete(staging, true)
    fs.delete(manifestPath(dir), false)
  }

  /** Right-to-be-forgotten erasure across a corpus AND every derived
    * artifact — the composed maintenance surface a data-subject request
    * actually needs (the reference's `delete_data_in_database` removes
    * table data, `/root/reference/etl_manager/meta.py:769-791`; this
    * extends that contract to the indexes the data leaked into):
    *
    *   1. corpus parquet: FILE-PRUNED rewrite — a column-pruned id scan
    *      locates the data files that actually hold a forgotten row,
    *      only those files' survivors are staged, verified and swapped
    *      in, and every other data file (and underscore sidecar dir)
    *      is left untouched on disk;
    *   2. `_hash_index` / `_minhash_sigs` / `_minhash_bands` sidecars
    *      (the streaming-ingest dedup indexes): forgotten docs' hashes
    *      and signatures removed, so a re-submission of forgotten
    *      CONTENT is treated as brand new — "forgotten" means as if
    *      never ingested, not silently deduped against a ghost. A hash
    *      whose content ALSO lives in a surviving document is kept:
    *      still-present content stays deduped;
    *   3. BM25 inverted index: tombstone + compact (physical removal —
    *      a tombstone alone would leave the forgotten text recoverable
    *      from its postings);
    *   4. ANN layouts: tombstone + compact, same argument.
    *
    * Everything derives distributively; the one eager materialization
    * is the survivor frame (its lineage reads the files the swap
    * replaces — the refreshByPath lesson applied at design time).
    *
    * @param annIndexes (path, partitionCols) per ANN layout — cell_id
    *        for IVF, table/bucket for LSH, empty for PQ
    * @return number of corpus rows erased */
  def forgetDocuments(spark: org.apache.spark.sql.SparkSession,
      ids: DataFrame, idCol: String, corpusDir: String,
      textCol: String = "text",
      textIndexDir: Option[String] = None,
      annIndexes: Seq[(String, Seq[String])] = Nil): Long = {
    val fs = new Path(corpusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hashDir = s"$corpusDir/_hash_index"
    val sigDirs = Seq(s"$corpusDir/_minhash_sigs", s"$corpusDir/_minhash_bands")
    // FIRST: replay any crashed swap (this run's or a predecessor's) to
    // completion, so every read below sees exactly one copy of each row —
    // a crash between rename-in and the originals' delete would otherwise
    // leave the crashed run's forget-* survivor files duplicating the
    // originals, and a naive re-run would re-stage those survivors a
    // second time (the duplicates would become permanent)
    (corpusDir +: hashDir +: sigDirs).foreach { d =>
      val p = new Path(d)
      if (fs.exists(p)) completePendingSwap(fs, p)
    }
    def hasParquet(dir: String): Boolean = {
      val p = new Path(dir)
      fs.exists(p) && fs.listStatus(p).exists(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
    }
    /** Replace a dir's parquet data files with `rows`, staged + verified
      * first; sidecar subdirectories inside `dir` are left untouched.
      * Swap order is manifest → rename-in (`forget-` prefixed, collision-
      * free vs the kept originals) → delete originals; a crash anywhere
      * in that window is REPLAYED to completion at the next
      * forgetDocuments entry via the persisted manifest. */
    def swapIn(rows: DataFrame, dir: String, expected: Long): Unit = {
      val staging = s"${dir.stripSuffix("/")}_forgetting"
      rows.write.mode("overwrite").parquet(staging)
      val got = spark.read.parquet(staging).count()
      require(got == expected,
        s"forgetDocuments: staged $staging has $got rows, expected $expected")
      val dirPath = new Path(dir)
      // capture the replaced originals BEFORE renaming survivors in
      val originals = fs.listStatus(dirPath).filter(_.isFile).map(_.getPath).toSeq
      manifestedSwap(fs, dirPath, new Path(staging), originals)
    }
    val gone = ids.select(col(idCol)).distinct().localCheckpoint()
    val corpus = spark.read.parquet(corpusDir)
    // forgotten docs' content hashes — read BEFORE the corpus rewrite
    val corpusHashes = corpus
      .select(col(idCol), md5(col(textCol)).as("corpus_content_hash"))
    val goneHashes = corpusHashes.join(gone, Seq(idCol), "left_semi")
      .select("corpus_content_hash").distinct().localCheckpoint()
    // hashes whose content ALSO lives in a surviving document must stay
    // in the hash index: "forgotten" erases the subject's rows, but
    // still-present identical content keeps its exact-dedup protection —
    // scrubbing it would let a re-submission re-ingest a duplicate
    val keptDupHashes = corpusHashes.join(gone, Seq(idCol), "left_anti")
      .join(goneHashes, Seq("corpus_content_hash"), "left_semi")
      .select("corpus_content_hash").distinct().localCheckpoint()
    val nGone = corpus.join(gone, Seq(idCol), "left_semi").count()

    // ORDER: derived artifacts FIRST, corpus swap LAST. Every sidecar/
    // index scrub derives from the PRE-SWAP corpus (gone ids + content
    // hashes, all localCheckpointed above), so a crash after any scrub
    // but before the corpus swap leaves a re-run that recomputes the
    // SAME scrub sets from the unchanged corpus — each scrub is an
    // idempotent anti-join, and the corpus swap still completes. The
    // reverse order had an unrecoverable window: corpus swapped, crash,
    // re-run finds no gone rows, goneHashes comes back empty, and the
    // forgotten content's hash would ghost-dedup re-submissions forever.
    if (hasParquet(hashDir)) {
      val scrub = goneHashes
        .join(keptDupHashes, Seq("corpus_content_hash"), "left_anti")
      val hashes = spark.read.parquet(hashDir)
      val keep = hashes.join(scrub, Seq("corpus_content_hash"), "left_anti")
        .localCheckpoint()
      swapIn(keep, hashDir, keep.count())
    }
    sigDirs.foreach { d =>
      if (hasParquet(d)) {
        val rows = spark.read.parquet(d)
        val keep = rows.join(gone.select(col(idCol).as("doc_id")),
          Seq("doc_id"), "left_anti").localCheckpoint()
        swapIn(keep, d, keep.count())
      }
    }
    textIndexDir.foreach { idx =>
      TextAnalysis.deleteFromTextIndex(gone.select(col(idCol).as("doc_id")),
        "doc_id", idx)
      TextAnalysis.compactTextIndex(spark, idx)
    }
    annIndexes.foreach { case (path, partitionCols) =>
      Similarity.deleteFromAnnIndex(gone, idCol, path)
      Similarity.compactAnnIndex(spark, path, idCol, partitionCols)
    }
    // FILE-PRUNED corpus rewrite: locate the files that actually hold a
    // forgotten row (a column-pruned id scan), rewrite ONLY those files'
    // survivors, and leave every other data file untouched on disk — at
    // 100 TB erasing k documents costs the id scan plus the affected
    // files' rewrite, never a corpus-wide rewrite. Staged file names are
    // prefixed so they cannot collide with the kept originals.
    val withFile = corpus.withColumn("__file", input_file_name())
    val affected = withFile.join(gone, Seq(idCol), "left_semi")
      .select("__file").distinct()
      .collect().map(_.getString(0)).toSet // file-list-sized, metadata
    if (affected.nonEmpty) {
      val affectedRows = withFile
        .filter(col("__file").isin(affected.toSeq: _*))
      val expected = affectedRows.count() - nGone
      // pin survivors: their lineage lists the files being deleted
      val survivors = affectedRows.join(gone, Seq(idCol), "left_anti")
        .drop("__file").localCheckpoint()
      val staging = s"${corpusDir.stripSuffix("/")}_forgetting"
      survivors.write.mode("overwrite").parquet(staging)
      require(spark.read.parquet(staging).count() == expected,
        s"forgetDocuments: staged survivor count mismatch under $staging")
      // manifest → rename-in (forget- prefix, collision-free vs the kept
      // originals) → delete the affected originals: a crash anywhere in
      // that window is replayed to completion from the persisted manifest
      // at the next forgetDocuments entry — never silently-missing rows,
      // never permanently-duplicated survivors
      manifestedSwap(fs, new Path(corpusDir), new Path(staging),
        affected.toSeq.map(uri => new Path(new java.net.URI(uri))))
    }

    nGone
  }
}

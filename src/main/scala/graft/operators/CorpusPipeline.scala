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
}

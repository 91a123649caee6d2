package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) join — entity resolution / record
  * linkage (EXTENSION, SURVEY.md §2.K): pair left and right rows whose
  * string keys are within Levenshtein distance `maxDist`. The naive
  * formulation is a theta join computing |L|·|R| edit distances — the
  * classic record-linkage scale killer. This implementation uses q-gram
  * prefix blocking with a correctness GUARANTEE (no false negatives):
  *
  *   one edit (sub/ins/del) changes at most `q` of a string's q-gram
  *   types, so if dist(A, B) ≤ d then at most q·d gram types of A are
  *   absent from B — hence among ANY q·d+1 distinct grams of A, at
  *   least one occurs in B.
  *
  * Each left string therefore probes with only q·d+1 of its grams
  * (chosen RAREST-first by right-side document frequency — any choice
  * is correct, the rare choice is what kills the hot shared-prefix
  * grams that would otherwise make blocking quadratic on real-world
  * keys like "Customer#0000..."), the equi-join on the gram id meets
  * the right side's full distinct-gram index, candidate pairs dedup,
  * and the exact Levenshtein filter runs only on candidates. Shapes:
  * one gram-df aggregate (broadcast — gram vocabulary is tiny next to
  * the data), a per-left-row array sort over ~|string| grams
  * (map-side), one equi-join on rare grams, one pair-dedup shuffle, and
  * two keyed joins to re-attach the strings. Never |L|·|R|.
  */
object FuzzyJoin {

  /** Distinct q-grams of `s` (strings shorter than q contribute the
    * whole string), as an array column. */
  private def qgrams(s: Column, q: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(s) - (q - 1), lit(1))),
      i => substring(s, i, lit(q))))

  /** @param left    rows with `lId` (unique) and the string `lStr`
    * @param right   rows with `rId` (unique) and the string `rStr`
    * @param maxDist inclusive Levenshtein bound (≥ 0)
    * @param q       gram width (default 3)
    * @return (lId, rId, dist) for every pair with dist ≤ maxDist */
  def qgramFuzzyJoin(left: DataFrame, right: DataFrame,
      lId: String, lStr: String, rId: String, rStr: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    require(lId != rId, "left and right id columns must have distinct names")
    val prefixLen = q * maxDist + 1

    val rGrams = right.select(col(rId), explode(qgrams(col(rStr), q)).as("_g"))
    // right-side gram document frequency: the rarity ranking. Tiny next
    // to the corpus (gram space ≤ distinct substrings), broadcast back.
    val df = rGrams.groupBy("_g").agg(count(lit(1)).as("_df"))

    // per-left-row rare-gram prefix: join the row's grams with df (left
    // join: unseen grams get df 0 — they are the rarest of all), sort by
    // (df, gram) and keep the first q·d+1. The per-row list is O(|s|),
    // so sort+slice is a map-side array op, not a shuffle.
    val lGrams = left.select(col(lId), explode(qgrams(col(lStr), q)).as("_g"))
      .join(broadcast(df), Seq("_g"), "left")
      .na.fill(0L, Seq("_df"))
    val lPrefix = lGrams
      .groupBy(col(lId))
      .agg(slice(array_sort(collect_list(struct(col("_df"), col("_g")))),
        1, prefixLen).as("_pre"))
      .select(col(lId), explode(col("_pre")).as("_p"))
      .select(col(lId), col("_p._g").as("_g"))

    val candidates = lPrefix.join(rGrams, Seq("_g"))
      .select(col(lId), col(rId)).distinct()

    candidates
      .join(left.select(col(lId), col(lStr)), Seq(lId))
      .join(right.select(col(rId), col(rStr)), Seq(rId))
      .withColumn("dist", levenshtein(col(lStr), col(rStr)).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col(lId), col(rId), col("dist"))
  }
}

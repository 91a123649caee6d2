package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer induction at corpus scale (EXTENSION, SURVEY.md §2.K) —
  * the tokenizer-training half of an LLM data pipeline (Sennrich et al.
  * 2016, the fastBPE / HF-tokenizers training discipline).
  *
  * The scale insight every production BPE trainer uses: merges depend on
  * the corpus ONLY through the word-frequency table. So the corpus is
  * scanned ONCE (map-side tokenize → partial-agg word counts), the
  * Zipf-bounded vocabulary (top `maxVocab` by frequency, deterministic
  * word tie-break) comes to the driver, and the merge loop runs over
  * the VOCABULARY weighted by frequency — O(V·L̄) per merge, independent
  * of corpus size. A 100 TB corpus and a 100 GB corpus train at the
  * same driver cost after the one distributed scan.
  *
  * Encoding inverts the same split: each DISTINCT word is encoded once
  * (vocab-sized work, plain Scala on a tiny frame), and the corpus-sized
  * pass is a codegen'd tokenize → broadcast join against the
  * (word → n_tokens) dictionary → keyed sum. The hot path never runs
  * the merge loop per row.
  *
  * Pretokenization is whitespace + lowercase (the repo-wide
  * `TextAnalysis.tokens` convention); merges never cross word
  * boundaries, so no end-of-word marker is needed (the GPT-2-style
  * choice — word boundaries come from pretokenization, not a sentinel).
  */
object BpeTokenizer {

  /** A trained BPE model: `merges` in rank order (earlier = higher
    * priority). Encoding applies the standard greedy rule: repeatedly
    * merge the present pair with the LOWEST rank until none remains. */
  final case class BpeModel(merges: Seq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    def encodeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      var syms = codepointSyms(word)
      var done = false
      while (!done && syms.length > 1) {
        var best = Int.MaxValue
        var at = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) { best = r; at = i }
          i += 1
        }
        if (at < 0) done = true
        else {
          // merge EVERY occurrence of the chosen pair left-to-right
          val (a, b) = (syms(at), syms(at + 1))
          val out = Array.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += a + b; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
        }
      }
      syms.toSeq
    }
  }

  private def words(textCol: Column): Column =
    filter(split(lower(textCol), "\\s+"), w => w =!= "")

  /** Initial symbol array: one symbol per Unicode CODEPOINT, matching the
    * codepoint semantics of the engine-side `substr`/`length` ([[pairCounts]]
    * and the [[tokenCounts]] fallback) — splitting on UTF-16 chars would
    * halve supplementary-plane characters (emoji, rare CJK) into surrogate
    * pairs and diverge driver training from the distributed oracle. */
  private def codepointSyms(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Corpus word-frequency table — the ONE distributed scan BPE training
    * needs. Map-side tokenize + partial aggregation; output is
    * vocabulary-sized. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** First-iteration weighted adjacent-character pair counts — the
    * quantity the first BPE merge maximizes, exposed as a queryable
    * frame (and the oracle surface for the driver gate: pure
    * tokenize/substr/sum, engine-neutral). */
  def pairCounts(docs: DataFrame, textCol: String): DataFrame =
    wordCounts(docs, textCol)
      // single-char words have no pairs; the guard matters because
      // sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty
      .where(length(col("word")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))"))
        .as("pair"), col("freq"))
      .groupBy("pair").agg(sum("freq").as("n"))

  /** Train `nMerges` BPE merges. The distributed part is [[wordCounts]];
    * the merge loop runs on the driver over the top-`maxVocab` words
    * (frequency desc, word asc — deterministic). Ties between pairs
    * break lexicographically, so training is reproducible bit-for-bit
    * across runs and partitionings. */
  def bpeTrain(docs: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 65536): BpeModel = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    val vocab: Array[(Array[String], Long)] =
      wordCounts(docs, textCol)
        .orderBy(col("freq").desc, col("word"))
        .limit(maxVocab)
        .collect()
        .map(r => (codepointSyms(r.getString(0)), r.getLong(1)))
    val merges = Seq.newBuilder[(String, String)]
    val work = vocab.map { case (s, f) => (scala.collection.mutable.ArrayBuffer(s: _*), f) }
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]
      work.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), f, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max count, lexicographic pair tie-break — deterministic
        var best: (String, String) = null
        var bestN = -1L
        counts.forEach { (p, n) =>
          if (n > bestN || (n == bestN &&
              (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2))))
            { best = p; bestN = n }
        }
        merges += best
        val (a, b) = best
        work.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == a && syms(i + 1) == b) {
              syms(i) = a + b
              syms.remove(i + 1)
            } else i += 1
          }
        }
        k += 1
      }
    }
    BpeModel(merges.result())
  }

  /** Corpus token HISTOGRAM under `model` — the encoded-corpus surface
    * (vocab utilization, fertility, OOV mass are all derived from it).
    * Same split as [[tokenCounts]]: the corpus contributes one
    * distributed word-count scan; encoding runs once per DISTINCT word
    * over the vocab-sized frame, and the histogram is a keyed sum of
    * that tiny frame — nothing corpus-sized is re-touched. Output:
    * (token, n) where n is occurrence count weighted by word frequency.
    *
    * Replayability note (the property the driver oracle leans on): for
    * a [[bpeTrain]]-learned model, greedy lowest-rank-first encoding
    * ([[BpeModel.encodeWord]]) is equivalent to applying the merges in
    * rank order, each exhaustively — a later merge can only create
    * pairs involving its product string, and no earlier merge refers to
    * a later product unless the product STRING collides with a
    * pre-existing symbol. [[mergesAreReplayOrderSafe]] checks exactly
    * that collision, and the spec pins it for the fixture corpora. */
  def tokenHistogram(docs: DataFrame, textCol: String,
      model: BpeModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    wordCounts(docs, textCol).as[(String, Long)]
      .flatMap { case (w, f) => model.encodeWord(w).map(t => (t, f)) }
      .toDF("token", "freq")
      .groupBy("token").agg(sum("freq").as("n"))
  }

  /** True iff no merge's product string equals an operand of an
    * EARLIER-rank merge — the condition under which greedy
    * lowest-rank-first encoding and rank-order-exhaustive replay (what
    * a SQL replace chain expresses) coincide. O(M²) over the merge
    * list (M ≤ nMerges, driver-sized). */
  def mergesAreReplayOrderSafe(model: BpeModel): Boolean =
    model.merges.zipWithIndex.forall { case ((a, b), j) =>
      val product = a + b
      model.merges.take(j).forall { case (ak, bk) =>
        ak != product && bk != product
      }
    }

  /** Per-document BPE token counts under `model`. Corpus-sized work is
    * all codegen'd (tokenize → broadcast dictionary join → keyed sum);
    * the merge loop runs once per DISTINCT word on the vocab-sized
    * frame. Words beyond the dictionary fall back to their character
    * count (the untrained-symbol floor). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dict = wordCounts(docs, textCol).select("word").as[String]
      .map(w => (w, model.encodeWord(w).length))
      .toDF("word", "n_tok")
    docs.select(col(idCol), explode(words(col(textCol))).as("word"))
      .join(broadcast(dict), Seq("word"), "left")
      .groupBy(idCol)
      .agg(sum(coalesce(col("n_tok"), length(col("word")))).as("n_tokens"))
  }
}

package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._
import graft.operators.BpeTokenizer._

class BpeTokenizerSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf(), "documents")

  test("bpeTrain learns the textbook merges on the Sennrich-style corpus") {
    // 'ab' is the most frequent pair (appears in every word, weight 9),
    // then 'abc' (weight 5 via the merged symbol)
    val corpus = Seq(
      "abc abc abc abc abc",
      "abd abd abd",
      "abe").toDF("text")
    val model = bpeTrain(corpus, "text", nMerges = 2)
    assert(model.merges == Seq(("a", "b"), ("ab", "c")))
    assert(model.encodeWord("abc") == Seq("abc"))
    assert(model.encodeWord("abd") == Seq("ab", "d"))
    assert(model.encodeWord("abx") == Seq("ab", "x"))
    assert(model.encodeWord("zq") == Seq("z", "q"))
  }

  test("merge exhaustion stops early; zero merges = character split") {
    val corpus = Seq("aa aa").toDF("text")
    // only one pair exists; asking for 5 merges yields 1 then exhausts
    assert(bpeTrain(corpus, "text", 5).merges == Seq(("a", "a")))
    assert(bpeTrain(corpus, "text", 0).encodeWord("ab") == Seq("a", "b"))
  }

  test("tie-break is lexicographic, so training is deterministic") {
    // "ab" and "cd" both have weight 2 -> "ab" must win round one
    val corpus = Seq("ab ab cd cd").toDF("text")
    assert(bpeTrain(corpus, "text", 1).merges == Seq(("a", "b")))
  }

  test("encodeWord round-trips: concatenated tokens equal the word") {
    val model = bpeTrain(docs, "text", nMerges = 200, maxVocab = 5000)
    // the synthetic fixture's vocabulary is small: training may exhaust
    // (every word fully merged) before 200 — that's the early-stop path
    assert(model.merges.nonEmpty && model.merges.size <= 200)
    val vocab = wordCounts(docs, "text").orderBy(col("freq").desc, col("word"))
      .limit(500).select("word").as[String].collect()
    vocab.foreach { w =>
      val toks = model.encodeWord(w)
      assert(toks.mkString("") == w, s"round-trip broke for '$w': $toks")
      assert(toks.nonEmpty && toks.size <= w.length)
    }
    // frequent words compress below character count after 200 merges
    val compressed = vocab.take(50).count(w =>
      w.length > 1 && model.encodeWord(w).size < w.length)
    assert(compressed > 25, s"only $compressed/50 head words compressed")
  }

  test("supplementary-plane text splits by CODEPOINT, matching engine substr/length semantics (r8)") {
    // U+1F600 is a surrogate PAIR in UTF-16: a char-based split would
    // halve it and diverge from the engine's codepoint-based substr/length
    val emoji = "😀" // 😀
    assert(BpeModel(Seq.empty).encodeWord(s"${emoji}ab") ==
      Seq(emoji, "a", "b"), "zero-merge split must be by codepoint")
    // training: the hottest pair must be (😀, a) — codepoint-adjacent —
    // never a surrogate half; and the engine-side pairCounts agrees
    val corpus = Seq(s"${emoji}a ${emoji}a ${emoji}a xy").toDF("text")
    val model = bpeTrain(corpus, "text", nMerges = 1)
    assert(model.merges == Seq((emoji, "a")), s"got ${model.merges}")
    val enginePairs = pairCounts(corpus, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(enginePairs(s"${emoji}a") == 3L,
      s"engine pairCounts must count the codepoint pair: $enginePairs")
    assert(model.encodeWord(s"${emoji}a${emoji}a") ==
      Seq(s"${emoji}a", s"${emoji}a"))
    // tokenCounts fallback (length = codepoints) agrees with the driver
    val tc = tokenCounts(corpus.withColumn("doc_id", lit(1L)),
      "doc_id", "text", model).collect()
    assert(tc.head.getLong(1) == 3L + 2L, // 3×merged "😀a" + "x","y"
      s"tokenCounts diverged on non-BMP text: ${tc.toSeq}")
  }

  test("tokenCounts: per-doc sums match a driver replay on a sample") {
    val model = bpeTrain(docs, "text", nMerges = 100, maxVocab = 5000)
    val got = tokenCounts(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sample = docs.orderBy("doc_id").limit(20)
      .select("doc_id", "text").collect()
    sample.foreach { r =>
      val expected = r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(w => model.encodeWord(w).length.toLong).sum
      assert(got(r.getLong(0)) == expected, s"doc ${r.getLong(0)}")
    }
    assert(got.size == docs.count())
  }

  test("tokenHistogram: mass conservation + driver replay; trained merges are replay-order safe (r8)") {
    val model = bpeTrain(docs, "text", nMerges = 8)
    // the q_text_bpe_encode oracle replays the merges as a rank-order
    // replace chain — valid iff no later product collides with an
    // earlier operand. Pin the property for the fixture corpus.
    assert(mergesAreReplayOrderSafe(model),
      s"rank-order replay unsafe for ${model.merges}")
    val hist = tokenHistogram(docs, "text", model)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // mass conservation: total characters across tokens = total corpus
    // characters (tokens partition every word)
    val tokChars = hist.map { case (t, n) => t.length.toLong * n }.sum
    val corpusChars = docs.select(
        sum(length(concat_ws("", filter(split(lower(col("text")), "\\s+"),
          w => w =!= "")))))
      .head().getLong(0)
    assert(tokChars == corpusChars,
      s"token mass $tokChars != corpus mass $corpusChars")
    // driver replay over the full (tiny) vocabulary
    val wc = wordCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val expected = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, f) =>
      model.encodeWord(w).foreach(t =>
        expected(t) = expected.getOrElse(t, 0L) + f)
    }
    assert(hist == expected.toMap)
    // and every learned merge's product actually surfaces as a token
    val present = model.merges.count { case (a, b) => hist.contains(a + b) }
    assert(present >= model.merges.size / 2,
      s"only $present/${model.merges.size} merged tokens appear — merges not applied?")
  }
}

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
}

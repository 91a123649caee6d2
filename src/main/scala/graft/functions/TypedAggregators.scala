package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The typed `Aggregator[IN, BUF, OUT]` surface (SURVEY.md §2.L): where
  * the sketch aggregates (MinHashAgg etc.) are Catalyst
  * TypedImperativeAggregates for SQL/DataFrame use, this is the
  * Dataset-API-native shape — case-class buffers with product encoders,
  * usable as `ds.select(TypedAggregators.textStats.toColumn)`.
  * Spark runs it with map-side partial aggregation (reduce) + a merge
  * phase, exactly like a built-in aggregate.
  */
object TypedAggregators {

  /** One-pass corpus text summary. min/max are kept as sentinels while
    * the buffer is empty and normalized in finish. */
  case class TextStats(nDocs: Long, nNull: Long, totTokens: Long,
      minTokens: Long, maxTokens: Long) {
    def avgTokens: Double =
      if (nDocs - nNull == 0) 0.0 else totTokens.toDouble / (nDocs - nNull)
  }

  // the exact character class of Java regex \s — NOT Character.isWhitespace,
  // which also matches U+2000-range Unicode spaces and would make these
  // stats disagree with every other tokenizer in the repo (TextAnalysis.
  // tokens, ShingleUtil, TextEntropy all split on \s+)
  private def isRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def tokenCount(text: String): Long = {
    var n = 0L; var inTok = false; var i = 0
    while (i < text.length) {
      val ws = isRegexWs(text.charAt(i))
      if (!ws && !inTok) { n += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    n
  }

  /** Typed one-pass stats over `Dataset[(id, text)]`: doc/null counts and
    * token min/avg/max, null text counted but excluded from token stats. */
  val textStats: Aggregator[(Long, String), TextStats, TextStats] =
    new Aggregator[(Long, String), TextStats, TextStats] {
      def zero: TextStats = TextStats(0L, 0L, 0L, Long.MaxValue, Long.MinValue)
      def reduce(b: TextStats, in: (Long, String)): TextStats =
        if (in._2 == null) b.copy(nDocs = b.nDocs + 1, nNull = b.nNull + 1)
        else {
          val n = tokenCount(in._2)
          TextStats(b.nDocs + 1, b.nNull, b.totTokens + n,
            math.min(b.minTokens, n), math.max(b.maxTokens, n))
        }
      def merge(x: TextStats, y: TextStats): TextStats =
        TextStats(x.nDocs + y.nDocs, x.nNull + y.nNull,
          x.totTokens + y.totTokens,
          math.min(x.minTokens, y.minTokens),
          math.max(x.maxTokens, y.maxTokens))
      def finish(b: TextStats): TextStats =
        // all-null (or empty) input: normalize the sentinels away
        if (b.nDocs - b.nNull == 0) b.copy(minTokens = 0L, maxTokens = 0L)
        else b
      def bufferEncoder: Encoder[TextStats] = Encoders.product[TextStats]
      def outputEncoder: Encoder[TextStats] = Encoders.product[TextStats]
    }
}

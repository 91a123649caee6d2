package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for pretraining batches (EXTENSION, SURVEY §2.K): the
  * concatenate-and-chunk assignment — documents are laid end to end in
  * doc_id order and the token stream is cut into fixed `budget`-token
  * context windows; each document gets the pack (window) its first token
  * lands in and its offset within that pack.
  *
  * Scale note: this needs a GLOBAL running token total in a deterministic
  * order — the one thing a plain window (`ORDER BY doc_id` with no
  * partition) serializes into a single task. Instead: two-phase prefix
  * sum. Range-repartition by doc_id (so partition k holds a contiguous
  * id range), per-partition token sums come back to the driver (ONE row
  * per partition — scalar-sized at any corpus size), their prefix offsets
  * broadcast back, and each partition emits its running totals locally.
  * Every phase is parallel; the sequential dependency is carried by the
  * partition-count-sized offset array, not the data.
  */
object Packing {

  /** @param budget tokens per pack (context window size)
    * @return (doc_id, n_tokens, start_offset, pack_id, offset_in_pack) */
  def packChunks(docs: DataFrame, idCol: String, textCol: String,
      budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    val nPart =
      if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    // localCheckpoint freezes the range-partition layout so phase 1's
    // per-partition sums and phase 2's emit see the SAME partitions
    // null text counts as 0 tokens (ANSI size(null) is null, which would
    // NPE the primitive getLong phases below)
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        coalesce(size(TextAnalysis.tokens(col(textCol))), lit(0))
          .cast("long").as("n_tokens"))
      .repartitionByRange(nPart, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .localCheckpoint()

    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("start_offset", LongType, nullable = false),
      StructField("pack_id", LongType, nullable = false),
      StructField("offset_in_pack", LongType, nullable = false)))

    // phase 1: one (partitionIndex, tokenSum) row per partition
    val partSums = toks.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(1))
      Iterator.single((i, s))
    }.collect().sortBy(_._1)
    // driver-side exclusive prefix over the (tiny) per-partition sums
    val offsets = new Array[Long](partSums.length + 1)
    partSums.foreach { case (i, s) => offsets(i + 1) = s }
    var i = 1
    while (i < offsets.length) { offsets(i) += offsets(i - 1); i += 1 }
    val bc = spark.sparkContext.broadcast(offsets)

    // phase 2: local running sum + the partition's global offset. The
    // offset index is the RDD's INTRINSIC partition index, not
    // TaskContext.getPartitionId — the latter is stage-local and
    // renumbers when a consumer unions two such frames into one stage
    // (the bug the multi-pass SNM rank surfaced in FuzzyJoin)
    val packed = toks.rdd.mapPartitionsWithIndex { (pid, it) =>
      var running = bc.value(pid)
      it.map { r =>
        val start = running
        running += r.getLong(1)
        Row(r.getLong(0), r.getLong(1), start, start / budget, start % budget)
      }
    }
    spark.createDataFrame(packed, outSchema)
  }

  /** Overlapping fixed-size token-window chunking (RAG / long-doc
    * pretraining prep): windows of `chunkTokens` tokens starting every
    * `strideTokens` tokens while a window still begins inside the
    * document (the final window may be short). Unlike [[packChunks]]'s
    * global stream, chunking is per-document — a pure map-side
    * tokenize + sequence-explode + slice with NO shuffle at any corpus
    * size (ordering the output is the caller's concern).
    *
    * @return (doc_id, chunk_id, start_tok, n_tok, chunk_md5) */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(strideTokens > 0 && strideTokens <= chunkTokens,
      s"strideTokens must be in [1, chunkTokens], got $strideTokens")
    val chunk = slice(col("toks"), col("start_tok") + 1, lit(chunkTokens))
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      // empty/null docs produce no chunks (coalesce: ANSI size(null)=null)
      .filter(coalesce(size(col("toks")), lit(0)) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), (size(col("toks")) - 1).cast("long"),
          lit(strideTokens.toLong))).as("start_tok"))
      .select(col("doc_id"),
        (col("start_tok") / strideTokens).cast("long").as("chunk_id"),
        col("start_tok"),
        size(chunk).cast("long").as("n_tok"),
        md5(array_join(chunk, " ")).as("chunk_md5"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering — the
  * AllPairs/PPJoin discipline (Bayardo et al., WWW 2007; Xiao et al.,
  * WWW 2008): find every document pair whose token-set Jaccard meets a
  * threshold, WITHOUT the all-pairs comparison and WITHOUT the
  * approximation of MinHash banding ([[Dedup.minHashBands]] trades
  * recall for speed; this operator is exact in both directions).
  *
  * EXTENSION operator (SURVEY §2.K): the reference's dedup surface is
  * hash-exact only; this closes the "exact near-dup join" gap between
  * [[Dedup.exactDedup]] and the probabilistic MinHash family.
  *
  * Plan shape (all declarative — Catalyst owns the join strategies):
  *   1. one tokenize scan → distinct (doc, token) pairs;
  *   2. global document-frequency count → a rare-first total order on
  *      tokens (df asc, token asc — deterministic, no hash tiebreak);
  *   3. per doc: tokens sorted by that order, keep only the PREFIX of
  *      length sz − ceil(t·sz) + 1. Pigeonhole: a qualifying pair
  *      (Jaccard ≥ t ⟹ overlap ≥ t·max(|a|,|b|)) that shared NO prefix
  *      token could overlap at most ceil(t·sz) − 1 < ceil(t·sz) tokens —
  *      contradiction — so the prefix join loses nothing. Verified two
  *      ways: SetSimJoinSpec falsifies against [[jaccardJoinBrute]] on
  *      the corpus fixture AND an adversarial fixture whose boundary
  *      pairs (J exactly = t) share only their most-frequent tokens, and
  *      the registered q_join_setsim's DuckDB oracle replays brute force
  *      at 19/20, so the gate itself certifies no-loss every round;
  *   4. equi-join prefixes on token (id_a < id_b, plus the size filter
  *      t·|a| ≤ |b| ≤ |a|/t both ways) → DISTINCT candidate pairs;
  *   5. verify candidates exactly: array_intersect of the full token
  *      arrays; the threshold gate runs with CLEARED DENOMINATORS
  *      (ix·tDen ≥ tNum·(|a|+|b|−ix)) in pure integers, so no float
  *      rounding can flip a boundary pair — the q_tpch17 discipline.
  *
  * 100 TB story: the only shuffles are the token df count, the per-doc
  * sort-collect, and the prefix equi-join — all keyed, no pair
  * materialization beyond candidates. Rare-first ordering makes prefix
  * tokens the LOW-df ones, so candidate fan-out per token is small by
  * construction; the brute quadratic path is unreachable. The threshold
  * is a rational (tNum/tDen) rather than a double so the gate (and the
  * prefix length arithmetic) is exact at any scale.
  */
object SetSimJoin {

  /** Whitespace token set, lowercased, empties dropped — mirrors the
    * [[Dedup]] tokenizer and the DuckDB
    * `string_split_regex(lower(text), '\s+')` oracle replay. */
  private def tokenSet(textCol: Column): Column =
    array_distinct(filter(split(lower(textCol), "\\s+"), t => t =!= ""))

  /** All pairs (id_a < id_b) with token-set Jaccard ≥ tNum/tDen, with
    * the exact similarity. Output: (id_a, id_b, ix, sz_a, sz_b,
    * jaccard = round(ix/(sz_a+sz_b−ix), 6)). */
  def jaccardJoin(docs: DataFrame, idCol: String, textCol: String,
      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be a rational in (0,1]: $tNum/$tDen")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokenSet(col(textCol))).as("tok"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    // (df, tok) struct sort = the global rare-first order; transform
    // strips the df after sorting so the arrays stay token-typed
    val sorted = toks.join(dfreq, "tok")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ts"))
      .select(col("doc_id"),
        expr("transform(ts, x -> x.tok)").as("toks"),
        size(col("ts")).cast("long").as("sz"))
    // prefixLen = sz − ceil(sz·tNum/tDen) + 1, ceil via INTEGRAL div —
    // a double division would round past 2^53 and a rounded-up quotient
    // shortens the prefix, which silently LOSES qualifying pairs
    val prefixLen =
      (col("sz") - expr(s"(sz * $tNum + ${tDen - 1}) div $tDen") + 1)
        .cast("int")
    val pref = sorted.select(col("doc_id"), col("sz"),
      explode(slice(col("toks"), lit(1), prefixLen)).as("tok"))
    val a = pref.select(col("doc_id").as("id_a"), col("sz").as("pa_sz"),
      col("tok").as("tok_a"))
    val b = pref.select(col("doc_id").as("id_b"), col("sz").as("pb_sz"),
      col("tok").as("tok_b"))
    val cand = a.join(b,
        col("tok_a") === col("tok_b") && col("id_a") < col("id_b") &&
          // size filter: J ≥ t forces t·|a| ≤ |b| and t·|b| ≤ |a|
          col("pb_sz") * tDen >= col("pa_sz") * tNum &&
          col("pa_sz") * tDen >= col("pb_sz") * tNum)
      .select("id_a", "id_b").distinct()
    val ix = size(array_intersect(col("ta"), col("tb"))).cast("long")
    cand
      .join(sorted.select(col("doc_id").as("id_a"), col("toks").as("ta"),
        col("sz").as("sz_a")), Seq("id_a"))
      .join(sorted.select(col("doc_id").as("id_b"), col("toks").as("tb"),
        col("sz").as("sz_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), ix.as("ix"), col("sz_a"), col("sz_b"))
      // exact integer gate — never a float comparison
      .filter(col("ix") * tDen >= lit(tNum.toLong) *
        (col("sz_a") + col("sz_b") - col("ix")))
      .select(col("id_a"), col("id_b"), col("ix"), col("sz_a"), col("sz_b"),
        round(col("ix").cast("double") /
          (col("sz_a") + col("sz_b") - col("ix")), 6).as("jaccard"))
  }

  /** The unfiltered brute-force twin — O(n²) pair verification with the
    * SAME tokenizer and gate; exists so SetSimJoinSpec can falsify the
    * prefix filter's no-loss claim on small fixtures (q_join_setsim's
    * DuckDB oracle is this query in SQL form). Not registered. */
  def jaccardJoinBrute(docs: DataFrame, idCol: String, textCol: String,
      tNum: Int, tDen: Int): DataFrame = {
    val sets = docs.select(col(idCol).as("doc_id"),
      tokenSet(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
    val a = sets.select(col("doc_id").as("id_a"), col("toks").as("ta"))
    val b = sets.select(col("doc_id").as("id_b"), col("toks").as("tb"))
    val ix = size(array_intersect(col("ta"), col("tb"))).cast("long")
    val szA = size(col("ta")).cast("long")
    val szB = size(col("tb")).cast("long")
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), ix.as("ix"), szA.as("sz_a"),
        szB.as("sz_b"))
      .filter(col("ix") * tDen >= lit(tNum.toLong) *
        (col("sz_a") + col("sz_b") - col("ix")))
      .select(col("id_a"), col("id_b"), col("ix"), col("sz_a"), col("sz_b"),
        round(col("ix").cast("double") /
          (col("sz_a") + col("sz_b") - col("ix")), 6).as("jaccard"))
  }
}

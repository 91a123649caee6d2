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

  /** The pigeonhole guarantee above is really an OCCURRENCE argument: d
    * edits alter at most q·d gram occurrences, and destroying a gram
    * TYPE costs at least one altered occurrence per type — so among any
    * q·d+1 distinct types one survives, and when a string has FEWER
    * distinct types than that, all of them can vanish only if its total
    * occurrence count len-q+1 is ≤ q·d, i.e. len ≤ q·(d+1)-1. Gram
    * blocking alone would silently drop true pairs exactly for those
    * SHORT left strings (e.g. 'abcde' vs 'abde' at q=3, d=1 share no
    * gram); long low-entropy strings are safe — repeated grams make
    * their types expensive to destroy. Short left rows route through a
    * SECOND guaranteed block — the deletion-neighborhood scheme
    * ([[deletionFuzzyJoin]]) against the right rows short enough to be
    * within distance d of them (length ≤ q·(d+1)-1+d) — so the combined
    * join keeps the no-false-negative guarantee at EVERY length. The
    * fallback's variant cost is bounded by that length cap, and the two
    * paths partition the left side, so no pair is found twice.
    *
    * Null contract: rows whose string is NULL are excluded from both
    * paths (a NULL key has no well-defined edit distance, and `explode`
    * of a NULL gram array emits nothing) — same exclusion the brute
    * theta join's `levenshtein(a,b) <= d` predicate makes, so oracles
    * replay it for free.
    *
    * @param left    rows with `lId` (unique) and the string `lStr`
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

    // left split by LENGTH: strings longer than q·(d+1)-1 carry more
    // than q·d gram occurrences, so the occurrence pigeonhole holds;
    // at or below it the whole gram set can be edited away
    val lenCap = q * (maxDist + 1) - 1
    val lOk = left.filter(length(col(lStr)) > lenCap)
    val shortPairs = if (maxDist == 0) None else {
      // d = 0 has no short set (equal strings share every gram);
      // otherwise: deletion blocking over the length-capped short strata
      Some(deletionFuzzyJoin(
        left.filter(length(col(lStr)) <= lenCap),
        right.filter(length(col(rStr)) <= lenCap + maxDist),
        lId, lStr, rId, rStr, maxDist, maxLen = lenCap + maxDist))
    }

    val rGrams = right.select(col(rId), explode(qgrams(col(rStr), q)).as("_g"))
    // right-side gram document frequency: the rarity ranking. Tiny next
    // to the corpus (gram space ≤ distinct substrings), broadcast back.
    val df = rGrams.groupBy("_g").agg(count(lit(1)).as("_df"))

    // per-left-row rare-gram prefix: join the row's grams with df (left
    // join: unseen grams get df 0 — they are the rarest of all), sort by
    // (df, gram) and keep the first q·d+1. The per-row list is O(|s|),
    // so sort+slice is a map-side array op, not a shuffle.
    val lGrams = lOk.select(col(lId), explode(qgrams(col(lStr), q)).as("_g"))
      .join(broadcast(df), Seq("_g"), "left")
      .na.fill(0L, Seq("_df"))
    val lPrefix = lGrams
      .groupBy(col(lId))
      .agg(slice(array_sort(collect_list(struct(col("_df"), col("_g")))),
        1, prefixLen).as("_pre"))
      .select(col(lId), explode(col("_pre")).as("_p"))
      .select(col(lId), col("_p._g").as("_g"))

    // pin the candidate join's and the levenshtein verify's parallelism
    // (r12, guide §2.5/§1.2): gram/candidate rows are bytes-tiny but the
    // join fans out per shared gram and the verify pays a levenshtein
    // per pair, so AQE's byte-based coalescing starves both stages at
    // bench scale (measured: whole query on 1 task). REPARTITION_BY_NUM
    // holds the session's shuffle-partition count.
    val nPar = Parallelism.sessionShufflePartitions(left.sparkSession)
    // sort-merge, NOT shuffled-hash (measured): grams are corpus-hot by
    // nature (the low-entropy-key caveat below), and SHJ probes a
    // long-chained hash map per hot gram where SMJ iterates the sorted
    // run — the r12 A/B read 1.80 s SMJ vs 2.63 s SHJ steady at sf0.1
    // (task time 6-12 s vs 12-24 s), so the hint that paid off on the
    // deletion-variant and SNM joins is deliberately absent here
    val candidates = lPrefix.repartition(nPar, col("_g"))
      .join(rGrams.repartition(nPar, col("_g")), Seq("_g"))
      .select(col(lId), col(rId)).distinct()

    val gramPairs = candidates.repartition(nPar, col(lId))
      .join(left.select(col(lId), col(lStr)), Seq(lId))
      .join(right.select(col(rId), col(rStr)), Seq(rId))
      .withColumn("dist", levenshtein(col(lStr), col(rStr)).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col(lId), col(rId), col("dist"))
    shortPairs.fold(gramPairs)(gramPairs.unionByName(_))
  }

  /** Deletion-neighborhood fuzzy join (the FastSS / SymSpell scheme):
    * block on shared deletion variants instead of shared q-grams. If
    * lev(a, b) ≤ d, deleting from each string the ≤ d characters its
    * optimal alignment edits lands both on the SAME common subsequence —
    * so a and b share a variant in their ≤ d-deletion neighborhoods
    * ([[graft.functions.DeletionVariants]]), and the equi-join on
    * variants has NO false negatives.
    *
    * Why a second blocking scheme: q-gram prefix blocking degrades to
    * near-quadratic on LOW-ENTROPY keys — zero-padded serials, shared
    * prefixes, fixed templates — because even the rarest grams of such a
    * string are corpus-hot (measured: the sf0.1 customer-name join spent
    * 299 s generating ~10⁸ gram-blocked candidates). Deletion variants
    * invert that: a variant is (almost) the whole string, so a bucket
    * only holds strings within edit distance ≤ 2d of each other, and
    * repeated-character runs COLLAPSE variants (deleting any '0' of a
    * zero-run yields one variant) — the uniform-key adversary makes the
    * blocking cheaper. Same join re-measured: < 3 s. The trade is
    * variant count C(len, ≤ d): linear in length for d = 1, quadratic
    * for d = 2 — right for ER-sized KEYS (names, addresses, serials ≤
    * `maxLen`); for long strings or large d, [[qgramFuzzyJoin]] remains
    * the blocking of choice (gram count is always linear). A string
    * longer than `maxLen` throws loudly rather than silently exploding
    * its task.
    *
    * Shapes: two map-side variant explodes (≤ C(len, ≤ d) rows each,
    * shuffled as 8-byte xxhash64 keys), one equi-join on the variant
    * hash, pair dedup, and the exact Levenshtein verify on candidates
    * only — never |L|·|R|.
    *
    * Null contract: rows whose string is NULL are excluded (NULL has no
    * deletion neighborhood and no well-defined edit distance; `explode`
    * of the NULL variant array emits nothing) — identical to the brute
    * theta join's `levenshtein(a,b) <= d` predicate, which is never true
    * on NULL, so brute-force oracles replay the exclusion exactly.
    *
    * @return (lId, rId, dist) for every pair with dist ≤ maxDist */
  def deletionFuzzyJoin(left: DataFrame, right: DataFrame,
      lId: String, lStr: String, rId: String, rStr: String,
      maxDist: Int, maxLen: Int = 64): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(lId != rId, "left and right id columns must have distinct names")
    val lv = left.select(col(lId),
      explode(graft.functions.DeletionVariants.variantsCol(
        col(lStr), maxDist, maxLen)).as("_v"))
      .select(col(lId), xxhash64(col("_v")).as("_vh"))
    val rv = right.select(col(rId),
      explode(graft.functions.DeletionVariants.variantsCol(
        col(rStr), maxDist, maxLen)).as("_v"))
      .select(col(rId), xxhash64(col("_v")).as("_vh"))
    // same parallelism pins as the q-gram path (see the note there).
    // SHJ is safe HERE, unlike the q-gram join: a deletion variant is
    // shared only by strings within maxDist edits of each other, so a
    // key's group tracks actual near-dup structure (never corpus-hot
    // the way grams are), and build rows are (long, long).
    val nPar = Parallelism.sessionShufflePartitions(left.sparkSession)
    val candidates = lv.repartition(nPar, col("_vh"))
      .hint("shuffle_hash")
      .join(rv.repartition(nPar, col("_vh")), Seq("_vh"))
      .select(col(lId), col(rId)).distinct()
    candidates.repartition(nPar, col(lId))
      .join(left.select(col(lId), col(lStr)), Seq(lId))
      .join(right.select(col(rId), col(rStr)), Seq(rId))
      .withColumn("dist", levenshtein(col(lStr), col(rStr)).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col(lId), col(rId), col("dist"))
  }

  /** Sorted-neighborhood method (SNM) — the other classic blocking
    * scheme for entity resolution: impose ONE total order (`sortKey`,
    * then `idCol` as the deterministic tie-break), and compare each row
    * only with the `window - 1` rows that follow it in that order. Where
    * q-gram blocking recalls by shared substrings, SNM recalls by sort
    * locality — cheap, order-tunable, and (unlike q-grams) bounded at
    * exactly (window-1)·n candidate pairs regardless of how pathological
    * the string distribution is.
    *
    * Scale shape: the global order is materialized WITHOUT a global
    * window. Rows range-repartition on (key, id) — Spark samples split
    * points, so ranges balance — then a two-phase distributed rank (the
    * [[Packing.packChunks]] prefix-sum discipline: one count per
    * partition to the driver, offsets broadcast back, ranks assigned
    * map-side). Candidate pairing is an EQUI-join on rank: each row
    * replicates to its window-1 successor positions (bounded map-side
    * explode), meets the successor by rank, and only candidates pay the
    * exact Levenshtein verify. Every stage is parallel at any n; nothing
    * ever sorts or windows the full data in one task.
    *
    * Returns (id_a, id_b, dist) where id_a precedes id_b in sort order
    * and dist ≤ maxDist. Rows with a NULL sort key or id are excluded
    * up front (a null key has no well-defined neighborhood; the count
    * is the caller's concern — mirror of shardStats' isNotNull guard).
    *
    * @param sortKey blocking sort key expression (choose one that lands
    *                likely matches adjacently, e.g. a normalized name;
    *                multi-pass SNM = union of runs with different keys)
    * @param window  neighborhood width w ≥ 2: positions j pairs with
    *                j+1 … j+w-1 */
  def sortedNeighborhoodJoin(df: DataFrame, idCol: String, strCol: String,
      sortKey: Column, window: Int, maxDist: Int,
      partitions: Int = 0): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    sortedNeighborhoodPairs(df, idCol, strCol, sortKey, window, partitions)
      .withColumn("dist", levenshtein(col("_sa"), col("_sb")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** The SNM candidate core shared by every verify metric: raw window
    * pairs (id_a, id_b, _sa, _sb) with id_a preceding id_b in the
    * (sortKey, id) total order. See [[sortedNeighborhoodJoin]] for the
    * blocking semantics and the distributed-rank shape. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, strCol: String,
      sortKey: Column, window: Int, partitions: Int = 0): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val spark = df.sparkSession
    val nPart =
      if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    // the id stays in its ORIGINAL type end-to-end: the rank pipeline only
    // needs it as an opaque payload plus a deterministic tie-break, and a
    // cast("long") here would silently turn a non-numeric string id
    // (common in ER) into all-NULLs and exclude every row
    val idType = df.schema(idCol).dataType
    // localCheckpoint freezes the layout so the count phase and the
    // rank-emit phase see the SAME partitions (Packing discipline)
    val sel = df
      .select(col(idCol).as("_id"), col(strCol).as("_s"),
        sortKey.cast("string").as("_k"))
      .filter(col("_k").isNotNull && col("_id").isNotNull)
      .repartitionByRange(nPart, col("_k"), col("_id"))
      .sortWithinPartitions("_k", "_id")
      .localCheckpoint()

    // phase 1: ONE (partition, rowCount) pair per partition to the driver
    val partCounts = sel.rdd.mapPartitionsWithIndex { (i, it) =>
      var n = 0L; it.foreach(_ => n += 1); Iterator.single((i, n))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](partCounts.length + 1)
    partCounts.foreach { case (i, n) => offsets(i + 1) = n }
    var i = 1
    while (i < offsets.length) { offsets(i) += offsets(i - 1); i += 1 }
    val bc = spark.sparkContext.broadcast(offsets)

    // phase 2: global rank = partition offset + local position
    val rankedSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_id", idType, nullable = false),
      org.apache.spark.sql.types.StructField("_s",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("_rank",
        org.apache.spark.sql.types.LongType, nullable = false)))
    // rank via the RDD's INTRINSIC partition index, not
    // TaskContext.getPartitionId: the latter is stage-local, and when two
    // ranked frames union into one stage (multi-pass SNM) the second
    // frame's partitions renumber past its offsets array
    val rankedRdd = sel.rdd.mapPartitionsWithIndex { (pid, it) =>
      var rank = bc.value(pid)
      it.map { r =>
        val out = org.apache.spark.sql.Row(r.get(0), r.getString(1), rank)
        rank += 1
        out
      }
    }
    val ranked = df.sparkSession.createDataFrame(rankedRdd, rankedSchema)

    // candidates: row at rank j meets rows at ranks j+1 … j+w-1 via a
    // bounded explode + equi-join on the dense rank — never a full sort
    val a = ranked.select(
        explode(sequence(col("_rank") + 1, col("_rank") + lit(window - 1)))
          .as("_t"),
        col("_id").as("id_a"), col("_s").as("_sa"))
    val b = ranked.select(col("_rank").as("_t"),
      col("_id").as("id_b"), col("_s").as("_sb"))
    // window-candidate join: same bytes-tiny/CPU-heavy shape (callers
    // score each pair) — pin its parallelism (see deletionFuzzyJoin).
    // SHJ build side = the 1-row-per-rank b side: every key holds
    // EXACTLY one build row by construction (rank is unique), the
    // hardest bound in the family.
    val nPar = Parallelism.sessionShufflePartitions(df.sparkSession)
    a.repartition(nPar, col("_t"))
      .join(b.repartition(nPar, col("_t")).hint("shuffle_hash"), Seq("_t"))
      .select(col("id_a"), col("id_b"), col("_sa"), col("_sb"))
  }

  /** Multi-pass SNM — the standard recall fix for single-key sorted
    * neighborhoods: a pair far apart under one sort key (typo in the
    * leading character) is usually adjacent under another (e.g. the
    * REVERSED string), so run one pass per key and union. Pairs
    * canonicalize to (min id, max id) before the dedup so the same pair
    * found in different passes (possibly in opposite rank order) counts
    * once. Cost is exactly #passes × the single-pass bound ((w-1)·n
    * candidates each) — still never a global window or product. */
  def sortedNeighborhoodMultiPass(df: DataFrame, idCol: String,
      strCol: String, sortKeys: Seq[Column], window: Int, maxDist: Int,
      partitions: Int = 0): DataFrame = {
    require(sortKeys.nonEmpty, "need at least one sort key")
    sortKeys.map { k =>
      sortedNeighborhoodJoin(df, idCol, strCol, k, window, maxDist, partitions)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"), col("dist"))
    }.reduce(_ unionByName _)
      .groupBy("id_a", "id_b")
      // dist is pair-intrinsic — min() is just the dedup fold
      .agg(min(col("dist")).as("dist"))
  }

  /** SNM pairing verified by Jaro–Winkler instead of Levenshtein — the
    * classic name-matching combination (JW weighs shared prefixes, the
    * usual surname/typo signal; SNM supplies bounded candidates since JW
    * has no edit-bound blocking guarantee to exploit). Scores come from
    * [[graft.functions.JaroWinkler]], bit-compatible with DuckDB's
    * `jaro_winkler_similarity`, so thresholds and output replay exactly.
    *
    * @return (id_a, id_b, jw) for window pairs with jw ≥ minSim */
  def sortedNeighborhoodJaroWinkler(df: DataFrame, idCol: String,
      strCol: String, sortKey: Column, window: Int, minSim: Double,
      partitions: Int = 0): DataFrame = {
    require(minSim >= 0.0 && minSim <= 1.0, s"minSim must be in [0,1], got $minSim")
    sortedNeighborhoodPairs(df, idCol, strCol, sortKey, window, partitions)
      .withColumn("jw",
        graft.functions.JaroWinkler.jaroWinklerCol(col("_sa"), col("_sb")))
      .filter(col("jw") >= minSim)
      .select(col("id_a"), col("id_b"), col("jw"))
  }
}

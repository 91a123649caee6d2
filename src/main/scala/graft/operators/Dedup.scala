package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators (EXTENSION per repo:BASELINE.json
  * north star; SURVEY.md §2.K). All distributed-by-construction: shuffles
  * are keyed on content hashes / shingles / band buckets, never on whole
  * documents, and every aggregation is partial+final.
  *
  * Scale notes (100 TB): exact dedup is one hash-shuffle of (hash, id);
  * shingle/minhash ops explode to (feature, id) pairs whose skew is
  * bounded by `maxShingleDf` (drop-stopword-shingles, the standard guard
  * against quadratic bucket blowup on hot shingles).
  */
object Dedup {

  /** Exact dedup on a content hash: deterministic — keeps the MIN id per
    * duplicate group (dropDuplicates keeps an arbitrary row, which is not
    * oracle-stable). One shuffle on the 128-bit md5. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Exact-dedup survivors: min-id row per distinct text. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val groups = exactGroups(docs, idCol, textCol)
    docs.join(groups.select(col("keep_id")), col(idCol) === col("keep_id"), "left_semi")
  }

  /** Word n-gram shingles per doc, lowercased, distinct — a compiled
    * per-row call (graft.functions.ShingleUtil), not per-element HOFs. */
  def shingles(textCol: Column, n: Int): Column =
    graft.functions.ShingleUtil.shingleCol(textCol, n)

  /** The (doc_id, sh_str) shingle explosion — THE shared stage of the
    * dedup family: ngram-Jaccard, MinHash, and cluster building all start
    * here. Callers running several dedup ops over the same corpus should
    * compute this once, `persist` it, and feed the `*From` variants below
    * (the inventory layer in [[graft.SparkEntry]] does exactly that). */
  def shingleExplode(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    // widen the shingle parse (r12, [[Parallelism.widen]]): per-row
    // n-gram assembly dwarfs the scan bytes, and a single-row-group
    // corpus file pins the stage to one task
    Parallelism.widen(docs, col(idCol))
      .select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol), n)).as("sh_str"))

  /** Exact n-gram Jaccard near-dup pairs: explode (shingle, id), self-join
    * per shingle bucket, |∩| via count, |∪| via sizes. `maxShingleDf` drops
    * shingles appearing in more than that many docs (skew guard — MUST be
    * mirrored by any oracle).
    *
    * Scale: the only wide op is the groupBy on (id_a, id_b); hot shingles
    * are removed before the pair explosion, bounding each bucket at
    * maxShingleDf² pairs. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      maxShingleDf: Long = 1000L): DataFrame =
    ngramJaccardPairsFrom(shingleExplode(docs, idCol, textCol, n),
      threshold, maxShingleDf)

  /** [[ngramJaccardPairs]] from a precomputed [[shingleExplode]] frame. */
  def ngramJaccardPairsFrom(shingled: DataFrame, threshold: Double,
      maxShingleDf: Long): DataFrame = {
    // shingles shuffle as 8-byte xxhash64 keys, not strings: same pair
    // counts (collisions are ~#shingles²/2^64), far cheaper to shuffle,
    // hash-join and sort at scale
    val sh = shingled.select(col("doc_id"), xxhash64(col("sh_str")).as("sh"))
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf && col("df") >= 2)
    // pin the pair join's parallelism (r12, guide §2.5/§1.2): shingle-id
    // rows are bytes-tiny but the self-join emits df² rows per shingle,
    // so AQE's byte-based coalescing starves the stage at bench scale;
    // REPARTITION_BY_NUM on the join key (reused by both sides) holds
    // the session's shuffle-partition count.
    val n = Parallelism.sessionShufflePartitions(shingled.sparkSession)
    val shRare = sh.join(rare.select("sh"), Seq("sh")).repartition(n, col("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))

    val a = shRare.select(col("sh"), col("doc_id").as("id_a"))
    val b = shRare.select(col("sh"), col("doc_id").as("id_b"))
    // shuffled-hash, not sort-merge: the sides share the pinned exchange,
    // so SMJ's only addition is two per-task sorts of the shingle set.
    // SHJ build-side contract (no spill): rows are (long, long) and every
    // key's group is <= maxShingleDf by the `rare` filter above, so no
    // single key can blow the per-task map.
    val common = a.hint("shuffle_hash").join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_common"))

    common
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "sz_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "sz_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Directed n-gram containment pairs: containment(a→b) =
    * |shingles(a) ∩ shingles(b)| / |shingles(a)|. The asymmetric
    * complement of [[ngramJaccardPairsFrom]] — a short document embedded
    * verbatim inside a much longer one has containment ≈ 1 while its
    * Jaccard stays far below any dedup threshold (the union is dominated
    * by the long side), so quote/excerpt/subset duplication is invisible
    * to symmetric scoring. Emits BOTH directions of each intersecting
    * pair; a row (id_a, id_b, c) reads "c of id_a's shingles also occur
    * in id_b".
    *
    * Same scale shape as Jaccard: intersection counts ride the one
    * (id_a, id_b) keyed shuffle over rare-shingle buckets (df ≤
    * `maxShingleDf` — the skew guard any oracle must mirror); the
    * direction flip is a projection of the counted pairs, not a second
    * pair join; sizes join back per ordered pair. */
  def containmentPairsFrom(shingled: DataFrame, threshold: Double,
      maxShingleDf: Long): DataFrame = {
    // same 8-byte-key shuffle discipline as ngramJaccardPairsFrom
    val sh = shingled.select(col("doc_id"), xxhash64(col("sh_str")).as("sh"))
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf && col("df") >= 2)
    // same parallelism pin as ngramJaccardPairsFrom (see the note there)
    val n = Parallelism.sessionShufflePartitions(shingled.sparkSession)
    val shRare = sh.join(rare.select("sh"), Seq("sh")).repartition(n, col("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))

    val a = shRare.select(col("sh"), col("doc_id").as("id_a"))
    val b = shRare.select(col("sh"), col("doc_id").as("id_b"))
    // shuffled-hash, not sort-merge: the sides share the pinned exchange,
    // so SMJ's only addition is two per-task sorts of the shingle set
    // (same df-capped build-side contract as ngramJaccardPairsFrom)
    val common = a.hint("shuffle_hash").join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_common"))
    // n_common is symmetric: materialize each unordered pair once, then
    // emit both directions before dividing by the direction's own size
    val directed = common.unionByName(common.select(
      col("id_b").as("id_a"), col("id_a").as("id_b"), col("n_common")))

    directed
      .join(sizes.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("n_sh", "sz_a"), Seq("id_a"))
      .withColumn("containment",
        col("n_common").cast("double") / col("sz_a").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** [[containmentPairsFrom]] with the shingle stage inlined. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      maxShingleDf: Long = 1000L): DataFrame =
    containmentPairsFrom(shingleExplode(docs, idCol, textCol, n),
      threshold, maxShingleDf)

  /** MinHash signatures: k hash slots derived from one md5 digest per
    * shingle (`lower64 + i*upper64`, [[graft.functions.NeutralHash]]) —
    * fully deterministic, no fitted model, and replayable by an external
    * SQL engine. Returns (id, signature array); slots compare UNSIGNED. */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 64): DataFrame =
    minHashSignaturesFrom(shingleExplode(docs, idCol, textCol, n), numHashes)

  /** [[minHashSignatures]] from a precomputed [[shingleExplode]] frame. */
  def minHashSignaturesFrom(shingled: DataFrame, numHashes: Int = 64): DataFrame =
    // single-buffer sketch aggregate (one hash pass per shingle, one
    // Array[Long] buffer per doc) — bit-identical to 64 separate
    // min(xxhash64(lit(seed), sh)) columns, ~4x faster
    shingled.groupBy("doc_id").agg(
      graft.functions.SketchAggregates.minhashAgg(col("sh_str"), numHashes)
        .as("signature"))

  /** MinHash-LSH candidate pairs: band the signature (bands × rowsPerBand),
    * hash each band, bucket-join. Docs sharing ≥1 band bucket become
    * candidates; refine with exact Jaccard on demand.
    *
    * Scale: candidates come from groupBy(band_hash) buckets, never a full
    * cross join; band count tunes recall vs bucket size. */
  def minHashCandidates(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame =
    minHashCandidatesFrom(shingleExplode(docs, idCol, textCol, n), numHashes, bands)

  /** (doc_id, band, bucket) LSH banding of a (doc_id, signature) frame —
    * the derived index an incremental pipeline PERSISTS for its corpus
    * (signatures + bands are a few hundred bytes/doc; the text never needs
    * to be re-read).
    *
    * HASH-VERSION NOTE: bucket values are md5-derived
    * ([[graft.functions.NeutralHash]]); any band index persisted by a
    * pre-NeutralHash (xxhash64) build has DISJOINT bucket values —
    * probing it with current-code bands silently yields zero candidates,
    * so such an index must be rebuilt (the schema is identical, which is
    * why no automatic check can catch this; cf. the `_lsh_index_meta`
    * validation the embedding-LSH index performs). */
  def minHashBands(sigs: DataFrame, numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // bucket = md5-lower64 of "band|slot,slot,..." with slots rendered as
    // UNSIGNED decimal — 8-byte shuffle keys (not the concat string), and
    // an external engine replays the key as
    // md5_number_lower(band || '|' || string_agg(slot::VARCHAR, ','))
    sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => graft.functions.NeutralHash.lower64Col(concat(
          b.cast("string"), lit("|"),
          concat_ws(",", transform(slice(col("signature"), b * rows + 1, lit(rows)),
            v => graft.functions.NeutralHash.unsignedStringCol(v))))))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bucket"))
  }

  /** [[minHashCandidates]] from a precomputed [[shingleExplode]] frame. */
  def minHashCandidatesFrom(shingled: DataFrame, numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    val banded = minHashBands(minHashSignaturesFrom(shingled, numHashes),
      numHashes, bands)
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Jaccard ESTIMATES for the LSH candidate pairs from their MinHash
    * signatures alone — the sketch-only refine step: est = fraction of
    * agreeing slots (an unbiased estimator of Jaccard), computed without
    * ever touching the shingle sets again. At 100 TB this is the point
    * of carrying signatures: candidate scoring is a signature join +
    * one map-side array comparison, not a second shingle shuffle.
    * Because numHashes is a power of two, agree/numHashes is an EXACT
    * double — estimates replay bit-equal in any engine.
    *
    * @return (id_a, id_b, est_jaccard) for every banded candidate pair */
  def minHashJaccardEstimates(shingled: DataFrame, numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    require(numHashes >= 1 && (numHashes & (numHashes - 1)) == 0,
      s"numHashes must be a power of two for exact-double estimates, got $numHashes")
    val sigs = minHashSignaturesFrom(shingled, numHashes)
    val cands = minHashCandidatesFrom(shingled, numHashes, bands)
    val agree = aggregate(
      zip_with(col("_sa"), col("_sb"), (x, y) => (x === y).cast("int")),
      lit(0), (acc, v) => acc + v)
    cands
      .join(sigs.select(col("doc_id").as("id_a"), col("signature").as("_sa")),
        Seq("id_a"))
      .join(sigs.select(col("doc_id").as("id_b"), col("signature").as("_sb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (agree.cast("double") / lit(numHashes.toDouble)).as("est_jaccard"))
  }

  /** Incremental LSH: near-dup CANDIDATES of new docs vs an existing
    * corpus represented ONLY by its banded signature index
    * ([[minHashBands]] output, typically persisted) — the corpus text is
    * never touched and existing×existing is never joined. Refine
    * candidates with exact Jaccard (or drop outright at high bands). */
  def minHashCandidatesAgainst(newBands: DataFrame,
      existingBands: DataFrame): DataFrame = {
    val nw = newBands.select(col("band"), col("bucket"), col("doc_id").as("id_new"))
    val old = existingBands.select(col("band"), col("bucket"), col("doc_id").as("id_old"))
    nw.join(old, Seq("band", "bucket"))
      .select("id_new", "id_old").distinct()
  }

  /** 64-bit SimHash from word hashes: per-bit majority vote of
    * md5-lower64(word) ([[graft.functions.NeutralHash]] — replayable as
    * DuckDB `md5_number_lower`). Implemented as a sum over signed bit
    * contributions — one narrow agg, no UDF. */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(split(lower(col(textCol)), "\\s+"))).as("w"))
      .filter(col("w") =!= "")
    // single-buffer bit-vote aggregate (64 signed counters per doc, one
    // md5 per word) — same signature as the 64-column sum(when) form
    words.groupBy("doc_id").agg(
      graft.functions.SketchAggregates.simhashAgg(col("w")).as("simhash"))
  }

  /** Connected components over near-dup pairs: iterative min-label
    * propagation (each node takes the min of its own and its neighbors'
    * labels) PLUS a pointer-jump per round (each node then takes its
    * label's label — the Shiloach–Vishkin shortcut), until fixpoint.
    * This is how pairwise near-dup hits become removable duplicate
    * GROUPS — removing id_b of every pair over-deletes when clusters
    * chain (a~b, b~c: b and c both vanish even though c survives b's
    * removal).
    *
    * Scale: each iteration is one edge join + one agg + one label
    * self-join, all keyed on doc_id. Propagation alone needs
    * O(diameter) rounds — a chain-shaped near-dup graph (recrawl
    * series: v1~v2, v2~v3, …) makes that rounds = chain length; the
    * jump doubles the distance the min label covers each round, so
    * convergence is O(log diameter) and maxIterations = 20 covers any
    * graph a corpus can produce (2^20-hop chains). Non-convergence
    * raises rather than returning silently-wrong labels. */
  def dedupClusters(pairs: DataFrame, maxIterations: Int = 20,
      driverUnionFindThreshold: Long = -1L): DataFrame = {
    val parallelism = pairs.sparkSession.sparkContext.defaultParallelism
    // auto threshold: a collected edge costs ~100 bytes in the driver
    // union-find hashmap PLUS ~200 bytes of external-Row overhead while
    // the collect is in flight (GenericRow + backing array + two boxed
    // longs); budget ~5% of the driver heap at ~300 B/edge so the fast
    // path grows with the driver instead of a hardcoded constant
    val ufThreshold =
      if (driverUnionFindThreshold >= 0L) driverUnionFindThreshold
      else Runtime.getRuntime.maxMemory / 20L / 300L

    // small-graph fast path FIRST: near-dup graphs are typically tiny
    // relative to the corpus, and a driver union-find beats paying Spark
    // job overhead per propagation round (same min-id result). The
    // UPSTREAM pair frame (not a limit() of it) is persisted, so take()
    // keeps its incremental CollectLimit behavior — a few partitions
    // first, escalating only if needed — while every retried or re-read
    // partition rides the cache instead of re-running the expensive
    // pair-generation lineage; a limit().persist() would instead plan a
    // GlobalLimit (every partition + an extra shuffle) just to probe the
    // budget. One extra row proves the graph is over budget, and the
    // over-budget distributed path reuses the SAME cached frame for both
    // mirrored-edge branches before unpersisting. Duplicate pairs are
    // harmless to union-find, direction is mirrored driver-side.
    val maxFetch = math.min(ufThreshold, Int.MaxValue - 1L).toInt
    val base = pairs.select(col("id_a"), col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val fetched = base.take(maxFetch + 1)
      if (fetched.length <= maxFetch) {
        val spark = pairs.sparkSession
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        fetched.foreach { row =>
          val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
          if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
        }
        val nodes = parent.keySet ++ parent.values
        val out = nodes.toSeq.map(n => (n, find(n))).sorted
        import spark.implicits._
        return out.toDF("doc_id", "cluster_id")
      }

      // distributed path: materialize the mirrored edge list ONCE — without
      // this every iteration's join re-executes the full upstream
      // pair-generation lineage (shingling, joins); the iteration cost must
      // be proportional to the graph, not to the corpus. Candidate graphs
      // are orders smaller than the corpus, so use a fraction of the
      // cluster's parallelism (chunky tasks), never a literal width. The
      // localCheckpoint materializes both unionByName reads of the cached
      // base frame, after which the finally unpersists it.
      val edges = base.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionByName(base.select(col("id_b").as("u"), col("id_a").as("v")))
        .distinct()
        .repartition(math.max(parallelism / 4, 8))
        .localCheckpoint()

      var labels = edges.select(col("u").as("doc_id"))
        .distinct()
        .withColumn("cluster_id", col("doc_id"))
      var iter = 0
      var converged = false
      while (iter < maxIterations && !converged) {
        val neighborMin = edges
          .join(labels.withColumnRenamed("doc_id", "v")
            .withColumnRenamed("cluster_id", "v_label"), Seq("v"))
          .groupBy(col("u").as("doc_id"))
          .agg(min(col("v_label")).as("n_label"))
        val prop = labels.join(neighborMin, Seq("doc_id"), "left")
          .select(col("doc_id"), col("cluster_id").as("old"),
            least(col("cluster_id"), coalesce(col("n_label"), col("cluster_id")))
              .as("mid"))
        // pointer jump: label := label(label). Labels are always node ids
        // (initialized from the node set, only ever lowered to another
        // label), so the self-join always resolves; least() keeps the
        // lowering monotone. This is what turns rounds = diameter into
        // rounds = log(diameter) on chains. Carry the old label through
        // one checkpointed frame so the convergence check is a count on
        // materialized data, not a re-join.
        val parents = prop
          .select(col("doc_id").as("p_id"), col("mid").as("p_label"))
        val step = prop.join(parents, col("mid") === col("p_id"), "left")
          .select(col("doc_id"), col("old"),
            least(col("mid"), coalesce(col("p_label"), col("mid")))
              .as("cluster_id"))
          .localCheckpoint() // also truncates the iterative lineage
        converged = step.filter(col("cluster_id") =!= col("old")).isEmpty
        labels = step.drop("old")
        iter += 1
        lastDistributedRounds = iter
      }
      if (!converged) throw new IllegalStateException(
        s"dedupClusters did not converge in $maxIterations rounds — " +
          "with pointer jumping that needs a graph of diameter > " +
          s"2^$maxIterations; raise maxIterations")
      labels
    } finally base.unpersist(blocking = false)
  }

  /** Rounds the LAST distributed [[dedupClusters]] run took — test/debug
    * observability for the O(log diameter) convergence claim (the driver
    * union-find fast path does not touch it). */
  @volatile private[operators] var lastDistributedRounds: Int = 0

  /** Cluster-collapse with quality-aware survivor choice: given the full
    * corpus, near-dup `pairs` (id_a, id_b), and a per-doc score frame
    * (idCol, scoreCol), label every document with its connected-component
    * cluster ([[dedupClusters]]; unpaired docs are their own singleton
    * cluster) and keep the HIGHEST-scoring member per cluster, ties
    * broken by lowest id. This is the production form of near-dup
    * removal: min-id survivor choice keeps an arbitrary member, while a
    * trained pipeline wants the best-quality copy of each duplicated
    * document (the cleanest extraction among crawl variants).
    *
    * Returns one row per cluster: cluster_id, keep_id, best_<score>,
    * n_members.
    *
    * Scale (100 TB): the cluster label frame is proportional to the
    * near-dup GRAPH, not the corpus — the left join onto the corpus
    * broadcasts under AQE in the common case. Survivor choice is two
    * keyed aggs (max score per cluster, then min id among the maximal)
    * rather than a per-cluster window sort, so no cluster — however hot —
    * ever becomes one giant sort task. */
  def keepBestPerCluster(docs: DataFrame, pairs: DataFrame, scores: DataFrame,
      idCol: String, scoreCol: String): DataFrame =
    keepBestFromLabels(docs, dedupClusters(pairs), scores, idCol, scoreCol)

  /** [[keepBestPerCluster]] over an already-computed label frame
    * (doc_id, cluster_id) — the form a pipeline uses when the cluster
    * labels are shared with a plain min-id collapse (one label
    * propagation, two consumers).
    *
    * Contracts (enforced, not assumed): `labels` must expose
    * (doc_id, cluster_id) — the [[dedupClusters]] output shape — and
    * `scores` must cover EVERY doc in `docs`. A doc without a score row
    * cannot be ranked; silently inner-joining it away would shrink
    * n_members and could flip the survivor, so a missing score raises at
    * execution instead (a row-local check — no extra pass, no shuffle).
    * A null score VALUE is rejected the same way: an unrankable member. */
  def keepBestFromLabels(docs: DataFrame, labels: DataFrame, scores: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    require(labels.columns.contains("doc_id") && labels.columns.contains("cluster_id"),
      s"labels must expose (doc_id, cluster_id), got ${labels.columns.mkString(", ")}")
    val clusters = labels.withColumnRenamed("doc_id", idCol)
    val labeled = docs.select(col(idCol))
      .join(clusters, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .join(scores.select(col(idCol), col(scoreCol)), Seq(idCol), "left")
      .withColumn(scoreCol, when(col(scoreCol).isNull,
          raise_error(concat(lit("keepBestFromLabels: no score row for id "),
            col(idCol).cast("string"))))
        .otherwise(col(scoreCol)))
    // ONE keyed aggregation pass: survivor = the k=1 bounded heap under
    // (score DESC, id ASC) — via MinKByAgg on (-score, id) — computed
    // alongside max/count in the same groupBy. The previous shape (max
    // agg, then join the labeled frame back to filter score == best) ran
    // the docs⋈labels⋈scores join TWICE (DAG branches recompute) and
    // shuffled the full labeled frame a second time for the join; this
    // shuffles ≤ 1 heap row + 2 counters per cluster per mapper, once.
    labeled.groupBy("cluster_id")
      .agg(
        max(col(scoreCol)).as(s"best_$scoreCol"),
        count(lit(1)).as("n_members"),
        graft.functions.MinKByAgg.minKByAgg(
          struct((-col(scoreCol).cast("double")).as("ns"), col(idCol).as("i")),
          struct(col(idCol).as("keep_id")), k = 1).as("__kb"))
      .select(col("cluster_id"),
        element_at(col("__kb"), 1).getField("keep_id").as("keep_id"),
        col(s"best_$scoreCol"), col("n_members"))
  }

  /** Incremental dedup: filter NEW documents against an EXISTING corpus —
    * the "don't re-ingest what the training set already has" operator.
    * A new doc is dropped when (a) its exact content hash exists in the
    * corpus, or (b) it has n-gram Jaccard ≥ `threshold` with any existing
    * doc. Returns the surviving new docs.
    *
    * Scale shape: this is deliberately NOT dedupClusters over new∪existing
    * — the existing×existing quadrant (the overwhelming bulk at 100 TB) is
    * never compared. Exact = one anti-join on md5; near-dup = shingle
    * bucket join restricted to new×existing pairs. The existing side's
    * shingle explosion can be a precomputed/persisted table, so daily
    * increments pay O(|new|) shingling plus keyed joins only.
    * New-vs-new duplicates are kept (run [[exactDedup]]/clusters within
    * the increment first if that matters). */
  /** New docs whose EXACT content does not appear in the corpus: anti-join
    * on md5. Null-SAFE equality (`<=>`) so null-text rows match each other
    * — with plain equality a null hash compares unknown and every batch's
    * null-text row would survive the anti-join forever. */
  def exactAgainstCorpus(newDocs: DataFrame, existingDocs: DataFrame,
      textCol: String): DataFrame =
    exactAgainstHashes(newDocs,
      existingDocs.select(md5(col(textCol)).as("corpus_content_hash")).distinct(),
      textCol)

  /** [[exactAgainstCorpus]] against a PRE-MATERIALIZED hash frame (one
    * `corpus_content_hash` column) — the steady-state ingest shape: a
    * maintained hash index costs a narrow column scan per batch where
    * re-hashing the corpus text costs the full text scan
    * ([[graft.streaming.CorpusIngest]] maintains one). Same null-safe
    * semantics. */
  def exactAgainstHashes(newDocs: DataFrame, hashes: DataFrame,
      textCol: String): DataFrame =
    newDocs.join(hashes,
      md5(newDocs(textCol)) <=> hashes("corpus_content_hash"),
      "left_anti")

  def dedupAgainstCorpus(newDocs: DataFrame, existingDocs: DataFrame,
      idCol: String, textCol: String, n: Int = 3, threshold: Double = 0.8,
      maxShingleDf: Long = 1000L,
      existingShingles: Option[DataFrame] = None): DataFrame = {
    // (a) exact: anti-join on the 128-bit content hash
    val exactSurvivors = exactAgainstCorpus(newDocs, existingDocs, textCol)

    // (b) near-dup vs existing only: shingles keyed by xxhash64; the df cap
    // is computed over the existing corpus (its hot shingles are the ones
    // that explode buckets). The existing side is consumed by THREE
    // subtrees (df cap, bucket join, sizes), so pass `existingShingles` —
    // the persisted per-corpus [[shingleExplode]] table — on real
    // increments; without one, localCheckpoint materializes the explosion
    // once instead of re-parsing the corpus per subtree.
    val shNew = shingleExplode(exactSurvivors, idCol, textCol, n)
      .select(col("doc_id").as("id_new"), xxhash64(col("sh_str")).as("sh"))
    val shOld = existingShingles
      .getOrElse(shingleExplode(existingDocs, idCol, textCol, n).localCheckpoint())
      .select(col("doc_id").as("id_old"), xxhash64(col("sh_str")).as("sh"))
    val rareOld = shOld.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf)
    val shOldRare = shOld.join(rareOld.select("sh"), Seq("sh"))

    val sizesNew = shNew.groupBy("id_new").agg(count(lit(1)).as("sz_new"))
    val sizesOld = shOld.groupBy("id_old").agg(count(lit(1)).as("sz_old"))
    val common = shNew.join(shOldRare, Seq("sh"))
      .groupBy("id_new", "id_old").agg(count(lit(1)).as("n_common"))
    val nearDupNew = common
      .join(sizesNew, Seq("id_new")).join(sizesOld, Seq("id_old"))
      .filter(col("n_common").cast("double") /
        (col("sz_new") + col("sz_old") - col("n_common")).cast("double") >= threshold)
      .select(col("id_new")).distinct()

    exactSurvivors.join(nearDupNew,
      exactSurvivors(idCol) === nearDupNew("id_new"), "left_anti")
  }

  /** Benchmark-contamination check: for each corpus doc, the number of
    * distinct n-gram shingles it shares with an eval/benchmark set
    * (the pre-training decontamination pass — drop or flag training docs
    * that contain verbatim benchmark n-grams).
    *
    * Both inputs are (doc_id, sh_str) shingle tables as produced by
    * [[shingleExplode]] (distinct per doc by construction, so the count
    * IS the distinct-shingle hit count).
    *
    * Scale (100 TB): benchmarks are MBs even when the corpus is 100 TB,
    * so the eval side is deduped and broadcast — the corpus side stays a
    * streaming scan + broadcast hash join + partial count, with no
    * shuffle of corpus shingles. If the eval set ever outgrows the
    * broadcast threshold, drop the hint and Spark falls back to a
    * shuffled join with the same semantics. */
  def contaminationHits(corpusShingles: DataFrame,
      evalShingles: DataFrame): DataFrame =
    corpusShingles
      .join(broadcast(evalShingles.select("sh_str").distinct()), Seq("sh_str"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))

  /** [[contaminationHits]] with a Bloom-filter semi-join reduction — the
    * formulation for when the eval shingle set outgrows an exact
    * broadcast. A Bloom filter at `fpp` costs ~10 bits/shingle versus
    * hundreds for the exact string set, so it stays broadcastable long
    * after the distinct-shingle frame does not; the map-side
    * might-contain filter drops the ~all of the corpus shingle stream
    * that cannot match BEFORE the join, so only candidate rows shuffle.
    * The exact join then removes Bloom false positives — results are
    * identical to [[contaminationHits]], only the data volume reaching
    * the join changes. No broadcast hint on the confirm join: at small
    * eval sizes AQE picks broadcast-hash anyway, past the threshold it
    * degrades to a shuffled join fed by the pre-reduced stream.
    *
    * @param expectedItems sizing for the filter; pass the (approximate)
    *   distinct eval-shingle count at scale to avoid the sizing count job
    * @param fpp false-positive rate — tune against shuffle savings
    * @param preparedEval an already-distinct, already-persisted
    *   (sh_str) eval frame whose LIFECYCLE THE CALLER OWNS — pass it when
    *   probing several eval sets in one session: the default path
    *   persists its distinct frame with no unpersist (CacheManager keys
    *   by plan, so repeated calls over the SAME eval set share one entry,
    *   but each DIFFERENT eval set adds a session-lifetime cache entry) */
  def contaminationHitsBloom(corpusShingles: DataFrame,
      evalShingles: DataFrame, expectedItems: Long = 0L,
      fpp: Double = 0.01, preparedEval: Option[DataFrame] = None): DataFrame = {
    val spark = corpusShingles.sparkSession
    // materialize the distinct eval shingles ONCE (it is small by
    // premise): without this the distinct shuffle runs for the sizing
    // count, again inside the bloomFilter aggregate, and a third time as
    // the confirm-join build side. persist, NOT localCheckpoint: the
    // returned frame is lazy, and checkpoint blocks lost with an
    // executor have no recompute path — a persisted frame just
    // recomputes the small distinct.
    val eval = preparedEval.getOrElse(
      evalShingles.select("sh_str").distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val items =
      if (expectedItems > 0L) expectedItems else math.max(eval.count(), 1L)
    val bloom = eval.stat.bloomFilter("sh_str", items, fpp)
    // the broadcast must outlive the returned (lazy) frame — its
    // lifecycle is the standard one: ContextCleaner drops the executor
    // blocks once the frame (and the expression holding bc) is GC'd,
    // exactly as for a broadcast-hash-join build side. The probe is a
    // native codegen'd expression (graft.functions.BloomMightContain) —
    // the corpus-side scan stays inside whole-stage codegen instead of
    // detouring through an interpreted scala udf per row.
    val bc = spark.sparkContext.broadcast(bloom)
    corpusShingles
      .filter(graft.functions.BloomFunctions.bloomMightContain(bc, col("sh_str")))
      .join(eval, Seq("sh_str"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The (doc_id, pos, sh) positional span explosion — the shared stage of
    * the span-dedup pair ([[duplicatedSpans]], [[stripDuplicatedSpans]]):
    * start position plus the xxhash64 of the k-word span at it
    * (multiplicity kept, unlike [[shingleExplode]]'s distinct shingles).
    * Callers running both operators should compute this once, `persist`
    * it, and pass it via their `spanFrame` parameter (the inventory layer
    * in [[graft.SparkEntry]] does exactly that) — it also feeds both
    * sides of each operator's own semi-join, so even a single call
    * benefits from a materialized copy. */
  def spanExplode(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"span size must be positive, got $k")
    // widen the span parse (r12, [[Parallelism.widen]]) — same
    // single-row-group-scan starvation as shingleExplode above
    Parallelism.widen(docs, col(idCol))
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.ShingleUtil.shingleAllCol(col(textCol), k)))
      .select(col("doc_id"), col("pos"), xxhash64(col("col")).as("sh"))
  }

  /** Span occurrences whose span appears in >= minDocs distinct docs;
    * two-level agg keeps the distinct partial (per (sh, doc) first, then
    * per sh). */
  private def flaggedSpanHits(spans: DataFrame, minDocs: Long): DataFrame = {
    val shared = spans.select("sh", "doc_id").distinct()
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select("sh")
    spans.join(shared, Seq("sh"), "left_semi")
  }

  /** Exact substring (span) dedup signal, Lee et al. "Deduplicating
    * Training Data Makes Language Models Better" style: flag every k-word
    * span that appears verbatim in at least `minDocs` DISTINCT documents,
    * then report per document how much of it is covered by such spans —
    * `dup_spans` (flagged span occurrences), `dup_tokens` (tokens under
    * the union of flagged [pos, pos+k) intervals) and `dup_frac`.
    * Within-document repetition deliberately does NOT count (that signal
    * is [[TextAnalysis.repetitionScore]]); this is the cross-document
    * boilerplate/contamination detector.
    *
    * Scale (100 TB): no pair join anywhere — unlike Jaccard dedup this is
    * linear in corpus size. One narrow span explode, one (span, doc)
    * distinct + count to find shared spans, one semi-join back keyed on
    * the span hash, then a window + aggregate both keyed on doc_id (the
    * same shuffle). Hot boilerplate spans are exactly the signal, and the
    * semi-join probe side never amplifies rows.
    *
    * @param spanFrame optional precomputed [[spanExplode]] frame (MUST be
    *                  built with the same `k`), typically persisted and
    *                  shared with [[stripDuplicatedSpans]] */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, minDocs: Long = 2L,
      spanFrame: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"span size must be positive, got $k")
    val hits = flaggedSpanHits(
      spanFrame.getOrElse(spanExplode(docs, idCol, textCol, k)), minDocs)

    // union of overlapping [pos, pos+k) intervals per doc: sorted by pos,
    // each span contributes the tokens past the running max end
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevEnd = coalesce(max(col("pos") + lit(k)).over(w), lit(0))
    val perDoc = hits
      .withColumn("add",
        greatest(lit(0), col("pos") + lit(k) - greatest(prevEnd, col("pos"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("dup_spans"), sum(col("add")).cast("long").as("dup_tokens"))

    // every doc appears in the output (zero-hit docs with zeros); token
    // count mirrors the shingle tokenizer (lowercase, \s+ split, -1 limit)
    val base = docs.select(col(idCol).as("doc_id"),
      size(split(lower(col(textCol)), "\\s+", -1)).cast("long").as("n_tokens"))
    base.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          greatest(col("n_tokens"), lit(1L)).cast("double")).as("dup_frac"))
  }

  /** The removal half of [[duplicatedSpans]]: rewrite each document with
    * every token under a flagged span removed (the Lee-et-al. policy of
    * cutting the duplicated substring itself rather than dropping the
    * document). Returns (doc_id, clean_text, n_tokens, kept_tokens);
    * clean_text preserves surviving-token order, single-space joined,
    * lowercase (the tokenizer's casing).
    *
    * Scale: flagged hit intervals explode to k rows each (hits only, not
    * the corpus), distinct to covered positions, anti-join against the
    * token explosion keyed on (doc_id, pos), then one doc-keyed
    * sort_array(collect_list) reassembly — linear, no pair joins, and the
    * final aggregate shuffles only surviving tokens.
    *
    * @param spanFrame optional precomputed [[spanExplode]] frame (MUST be
    *                  built with the same `k`), typically persisted and
    *                  shared with [[duplicatedSpans]] */
  def stripDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, minDocs: Long = 2L,
      spanFrame: Option[DataFrame] = None): DataFrame = {
    require(k > 0, s"span size must be positive, got $k")
    // covered token positions: each flagged hit spreads to [pos, pos+k)
    val covered = flaggedSpanHits(
        spanFrame.getOrElse(spanExplode(docs, idCol, textCol, k)), minDocs)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("tpos"))
      .distinct()
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), "\\s+", -1)))
      .select(col("doc_id"), col("pos").as("tpos"), col("col").as("w"))
    val kept = toks.join(covered, Seq("doc_id", "tpos"), "left_anti")
    val rebuilt = kept.groupBy("doc_id").agg(
      concat_ws(" ", transform(sort_array(collect_list(struct(col("tpos"), col("w")))),
        e => e.getField("w"))).as("clean_text"),
      count(lit(1)).as("kept_tokens"))
    docs.select(col(idCol).as("doc_id"),
        size(split(lower(col(textCol)), "\\s+", -1)).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        // fully-covered docs lose every token: empty text, not null
        when(col("n_tokens").isNotNull,
          coalesce(col("clean_text"), lit(""))).as("clean_text"),
        col("n_tokens"),
        when(col("n_tokens").isNotNull,
          coalesce(col("kept_tokens"), lit(0L))).as("kept_tokens"))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidate pairs within a hamming radius, blocked by
    * 16-bit chunks (a pair within distance 3 shares at least one of 4
    * chunks — pigeonhole; avoids the quadratic all-pairs compare). */
  def simHashCandidates(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = simHash(docs, idCol, textCol)
    // chunk key = the 16 bits EXTRACTED (shift-then-mask), not masked in
    // place: `(sig >> 16i) & 0xFFFF` is plain integer arithmetic any SQL
    // engine reproduces, where `0xFFFF << 48` overflows engines that
    // error on shift overflow
    val chunked = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .select(col("doc_id"), col("simhash"), col("pos").as("chunk"), col("col").as("ckey"))
    val a = chunked.select(col("chunk"), col("ckey"),
      col("doc_id").as("id_a"), col("simhash").as("sig_a"))
    val b = chunked.select(col("chunk"), col("ckey"),
      col("doc_id").as("id_b"), col("simhash").as("sig_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .filter(hamming(col("sig_a"), col("sig_b")) <= maxHamming)
      .select("id_a", "id_b").distinct()
  }
}

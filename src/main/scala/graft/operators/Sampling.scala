package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and data-mixture weighting (EXTENSION,
  * SURVEY.md §2.K) — the "balance the training mix" half of a corpus
  * pipeline, next to q_sample_split's uniform hash split.
  *
  * Both ops are content-hash / pure-arithmetic, so results are
  * reproducible across engines, runs, and partitionings — unlike
  * TABLESAMPLE or rand()-based sampling, which a DuckDB oracle could
  * never replay.
  */
object Sampling {

  /** Lowercase-hex keep threshold for `rate`: a row survives when the
    * first eight md5 hex chars of its content key compare strictly below
    * this string (granularity 1/2^32 — fine enough that the 6-dp
    * sample_rates [[mixtureWeights]] emits for huge groups never floor to
    * drop-all). rate>=1 maps to "g", which sorts above every hex string,
    * so everything survives; rate=0 maps to "00000000", below-or-equal
    * to everything, so nothing does. The floored product clamps to
    * 2^32-1: for rate = nextDown(1.0) the double product rounds up to
    * exactly 2^32, whose 9-hex rendering would otherwise truncate to a
    * near-zero threshold (%08x pads, never truncates, but the column
    * twin's lpad does — both clamp so the forms stay identical). */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    if (rate >= 1.0) "g"
    else f"${math.min(math.floor(rate * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** Per-group deterministic downsampling: keep a row iff
    * `substr(md5(hashKey), 1, 8) < thresholdHex(rate(group))`, with
    * `defaultRate` for groups absent from `rates`.
    *
    * Scale (100 TB): the rate table compiles into a CASE expression, so
    * this is a map-side projection + filter — NO join, NO shuffle, and
    * the filter sits directly on the scan regardless of corpus size.
    * Rows keep an `h8` column so downstream stages (and the oracle) can
    * audit the assignment. */
  def stratifiedSample(df: DataFrame, groupCol: String, hashKey: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require(!df.columns.contains("h8"),
      "input already has an h8 column; rename it before stratifiedSample")
    val thr = caseOver(col(groupCol), rates.view.mapValues(thresholdHex).toMap,
      thresholdHex(defaultRate))
    // null keys hash like the empty string so every row gets a
    // deterministic assignment (a null h8 would compare null and silently
    // drop the row even at rate 1)
    df.withColumn("h8", substring(md5(coalesce(hashKey, lit(""))), 1, 8))
      .filter(col("h8") < thr)
  }

  /** Leakage-safe train/val/test split: near-duplicate documents NEVER
    * straddle a split boundary. A plain content-hash split ([[graft]]'s
    * q_sample_split) leaks — a paraphrase lands in train while its twin
    * lands in test, and the eval silently measures memorization. Here
    * each row's split is decided by the hash of its dedup-CLUSTER ROOT
    * (the `Dedup.dedupClusters` min-id label; rows absent from the
    * label frame are singletons rooted at their own id), so whole
    * near-dup clusters move together. `bounds` are cumulative
    * fractions in split order, e.g. `("test" → 0.04, "val" → 0.08)`
    * puts h8 < 4 % in test, [4 %, 8 %) in val, the rest in `restName`.
    *
    * Scale (100 TB): the cluster-label frame is proportional to the
    * CLUSTERED rows only (near-dup graphs are tiny next to the corpus),
    * so the join broadcasts or, past that, shuffles both sides once on
    * the id; the md5 CASE is map-side. Output keeps root + h8 so the
    * assignment is auditable. */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
      bounds: Seq[(String, Double)], restName: String = "train"): DataFrame = {
    require(bounds.nonEmpty, "at least one split bound required")
    require(bounds.map(_._2) == bounds.map(_._2).sorted,
      s"bounds must be cumulative (non-decreasing): $bounds")
    val labels = clusters.select(col("doc_id").as(idCol),
      col("cluster_id").as("_root"))
    val rooted = df.join(labels, Seq(idCol), "left")
      .withColumn("split_root", coalesce(col("_root"), col(idCol)))
      .drop("_root")
      .withColumn("h8", substring(md5(col("split_root").cast("string")), 1, 8))
    val split = bounds.foldRight(lit(restName): Column) { case ((name, frac), rest) =>
      when(col("h8") < thresholdHex(frac), name).otherwise(rest)
    }
    rooted.withColumn("split", split)
  }

  /** The mixture loop closed end-to-end: compute [[mixtureWeights]] and
    * APPLY each group's `sample_rate` as the same deterministic md5-prefix
    * rule [[stratifiedSample]] uses, in one distributed pass. The
    * |groups|-row weights frame broadcast-joins onto the corpus and the
    * keep threshold derives from `sample_rate` per row — no driver
    * collect, no CASE compile, so an unbounded group count works: the
    * 100 TB plan is scan → broadcast hash join → codegen'd filter.
    * Zero-token / excluded groups (null or 0 rate) keep nothing;
    * upsampled groups (epochs > 1) keep everything — epoch replication
    * is the training loader's job, not the sampler's. */
  def applyMixture(docs: DataFrame, groupCol: String, textCol: String,
      targetShares: Map[String, Double], budgetTokens: Long): DataFrame = {
    require(!docs.columns.contains("h8"),
      "input already has an h8 column; rename it before applyMixture")
    val w = mixtureWeights(docs, groupCol, textCol, targetShares, budgetTokens)
      .select(col(groupCol).as("__mix_group"), col("sample_rate"))
    // thresholdHex as a column: lower(hex(..)) + lpad replays the f"%08x"
    // rendering exactly (verified against DuckDB's lpad(lower(hex(..)))).
    // least(.., 2^32-1) mirrors thresholdHex's clamp — without it a rate
    // of nextDown(1.0) rounds the product up to 2^32 and lpad TRUNCATES
    // the 9-digit hex to '10000000' (~6% keep instead of ~100%)
    val thr = when(col("sample_rate").isNull, lit("00000000"))
      .when(col("sample_rate") >= 1.0, lit("g"))
      .otherwise(lpad(lower(hex(least(
        floor(col("sample_rate") * 4294967296.0).cast("long"),
        lit(4294967295L)))), 8, "0"))
    docs.join(broadcast(w), col(groupCol) === col("__mix_group"))
      .withColumn("h8", substring(md5(coalesce(col(textCol), lit(""))), 1, 8))
      .filter(col("h8") < thr)
      .drop("__mix_group", "sample_rate")
  }

  /** The mixture loop closed in BOTH directions: [[applyMixture]] can only
    * downsample (it thresholds each doc once by `sample_rate`), but an
    * under-represented group's weight > 1 means the mix wants the group
    * REPEATED — `epochs` passes over it. This twin materializes the full
    * prescription from `weight` alone: every doc gets `floor(weight)`
    * whole copies (epoch 0..floor−1) plus one more iff its h8 clears the
    * threshold for the FRACTIONAL part (the [[thresholdHex]] keep rule on
    * weight − floor(weight)), so expected token mass per group lands on
    * `weight × actual` exactly — and for weight < 1 the zero whole copies
    * + fractional threshold reduce to [[applyMixture]]'s selection, one
    * rule for both directions. Zero-token groups (null weight) and
    * share-0 groups (weight 0) emit nothing.
    *
    * Determinism: the copy count and the fractional threshold derive from
    * the 6-dp `weight`; `weight − floor(weight)` is an exact double op,
    * so the whole selection replays bit-equal in an external engine.
    *
    * Scale (100 TB): weights broadcast-join onto the corpus (group-count
    * sized), the explode emits `floor(weight)+1` rows per doc map-side —
    * output-bound by the epochs the caller asked for, no shuffle, no
    * driver collect. Output: input columns + `epoch` (0-based copy
    * index) + `h8`. */
  def applyMixtureEpochs(docs: DataFrame, groupCol: String, textCol: String,
      targetShares: Map[String, Double], budgetTokens: Long): DataFrame = {
    require(!docs.columns.contains("h8"),
      "input already has an h8 column; rename it before applyMixtureEpochs")
    require(!docs.columns.contains("epoch"),
      "input already has an epoch column; rename it before applyMixtureEpochs")
    val w = mixtureWeights(docs, groupCol, textCol, targetShares, budgetTokens)
      .select(col(groupCol).as("__mix_group"), col("weight"))
      .filter(col("weight").isNotNull)
    val copies = floor(col("weight")).cast("long")
    val frac = col("weight") - floor(col("weight"))
    // same clamp-and-render as applyMixture's thr (frac < 1 by
    // construction, but the 2^32-1 clamp keeps the rendering total)
    val thrFrac = when(frac <= 0.0, lit("00000000"))
      .otherwise(lpad(lower(hex(least(
        floor(frac * 4294967296.0).cast("long"),
        lit(4294967295L)))), 8, "0"))
    docs.join(broadcast(w), col(groupCol) === col("__mix_group"))
      .withColumn("h8", substring(md5(coalesce(col(textCol), lit(""))), 1, 8))
      .withColumn("__copies", copies)
      .withColumn("__thr", thrFrac)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies"))))
      .filter(col("epoch") < col("__copies") || col("h8") < col("__thr"))
      .drop("__mix_group", "weight", "__copies", "__thr")
  }

  /** Per-group cap: keep at most `k` rows per group, chosen by descending
    * engine-neutral hash rank of `idCol` (ties broken by ascending id) — a
    * deterministic, seed-free uniform sample. The "at most N docs per
    * domain" guard that stops one hot domain from flooding a training mix.
    *
    * Scale (100 TB): a bounded-heap TopKAgg, NOT a window row_number — the
    * window formulation must shuffle and FULLY SORT every group's rows
    * (one giant sort task per hot domain); the heap keeps k entries per
    * group with map-side partial aggregation, so the shuffle carries at
    * most k rows per group per mapper. The rank key is the top 53 bits of
    * the md5-derived [[graft.functions.NeutralHash]] (`>>> 11`): exact as
    * a Double here and exact as `UBIGINT >> 11` in an external oracle, so
    * the selection replays bit-for-bit with no float edge cases.
    *
    * Any id type works (ids are assumed unique per group). Integral ids
    * ride the heap directly (cast long, cast back — schema preserved);
    * other types keep the zero-extra-shuffle heap by carrying the 64-bit
    * hash and joining the k·|groups| winning hashes back to recover the
    * id (AQE broadcasts the winner side when small). For non-integral
    * ids, rank ties (same top 53 hash bits) break by the hash's
    * remaining bits rather than the raw id. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val hash = graft.functions.NeutralHash.lower64Col(col(idCol).cast("string"))
    val hrank = shiftrightunsigned(hash, 11).cast("double")
    val base = df.filter(col(idCol).isNotNull)
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        base.select(col(groupCol), col(idCol).cast("long").as("__cap_id"),
            hrank.as("hrank"))
          .groupBy(groupCol)
          .agg(graft.functions.SketchAggregates.topKAgg(
            col("hrank"), col("__cap_id"), k).as("top"))
          .select(col(groupCol), explode(col("top.id")).as(idCol))
          .select(col(groupCol),
            col(idCol).cast(df.schema(idCol).dataType).as(idCol))
      case _ =>
        val hashed = base.select(col(groupCol), col(idCol), hash.as("__cap_nh"))
        val winners = hashed
          .select(col(groupCol),
            shiftrightunsigned(col("__cap_nh"), 11).cast("double").as("hrank"),
            col("__cap_nh"))
          .groupBy(groupCol)
          .agg(graft.functions.SketchAggregates.topKAgg(
            col("hrank"), col("__cap_nh"), k).as("top"))
          .select(col(groupCol), explode(col("top.id")).as("__cap_nh"))
        hashed.join(winners, Seq(groupCol, "__cap_nh"))
          .select(groupCol, idCol)
    }
  }

  /** Quantile (curriculum) binning: label every row with the quantile
    * bin of `scoreCol` — bin i of n when the score falls in
    * (boundary(i-1), boundary(i)], where the boundaries are the exact
    * interpolated quantiles at probs (e.g. quartiles for
    * probs = [0.25, 0.5, 0.75] → bins 0..3). The curriculum-sampling
    * primitive: "train on the top quality quartile first" / "mix bins
    * 60/30/10" both start from this label.
    *
    * Boundaries are rounded to 6 dp before comparing so the label
    * replays in an external engine computing the same Hive p·(n-1)
    * interpolation with possibly different last-ulp arithmetic.
    *
    * Scale (100 TB): the boundary computation is ONE exact percentile
    * aggregate (single reduce to a 1-row frame — no global sort; the
    * value→count buffer is bounded by score cardinality, here 4-dp
    * scores ≤ 10^4 distinct values); the 1-row boundary frame
    * broadcast-joins back and the bin label itself is a map-side CASE.
    * An ntile() window — the textbook formulation — would instead
    * globally sort the corpus on one task. */
  def quantileBins(df: DataFrame, scoreCol: String,
      probs: Seq[Double]): DataFrame = {
    // distinct == sorted ⇒ strictly increasing: a duplicated prob would
    // create an unreachable bin (two equal boundaries, nothing lands
    // strictly between them) — reject it instead of silently mislabeling
    require(probs.nonEmpty && probs == probs.sorted &&
        probs.distinct == probs && probs.forall(p => p > 0 && p < 1),
      s"probs must be strictly increasing inside (0,1), got $probs")
    // temp names too: an input __qb/__b<i> column would be silently
    // shadowed by the boundary frame and dropped on the way out
    val reserved = "bin" +: "__qb" +: probs.indices.map(i => s"__b$i")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"quantileBins reserves column names ${clash.mkString(", ")}; rename before calling")
    val probsSql = probs.map(p => s"${p}D").mkString(", ")
    val bounds = df.agg(
      expr(s"percentile($scoreCol, array($probsSql))").as("__qb"))
    val boundCols = probs.indices.map(i =>
      round(col("__qb")(i), 6).as(s"__b$i"))
    val withBounds = df.crossJoin(broadcast(bounds.select(boundCols: _*)))
    val bin = probs.indices.foldLeft(lit(probs.size)) { (acc, i) =>
      // evaluated right-to-left: the FIRST boundary the score is <= wins,
      // so fold from the last boundary down wrapping the accumulator
      when(col(scoreCol) <= col(s"__b${probs.size - 1 - i}"),
        lit(probs.size - 1 - i)).otherwise(acc)
    }
    withBounds
      // a null score belongs to no bin (not the top one, which is where
      // the null-propagating CASE fallthrough would land it)
      .withColumn("bin",
        when(col(scoreCol).isNull, lit(null)).otherwise(bin).cast("int"))
      .drop(probs.indices.map(i => s"__b$i"): _*)
  }

  /** Deterministic uniform sample of EXACTLY `n` rows: the n smallest
    * md5(hashKey) values, ties broken by the hash string itself being
    * (effectively) unique. "Give me exactly 100k docs, reproducibly" —
    * rand()-based sampling can't promise the count OR replay across
    * engines/partitionings.
    *
    * Scale (100 TB): `orderBy(hash).limit(n)` plans as
    * TakeOrderedAndProject — each task keeps an n-element heap and only
    * n rows per partition reach the driver-side merge; the corpus is
    * never globally sorted (PlanQualitySpec asserts no Sort+Exchange).
    * The md5 hex string doubles as the audit column. */
  def deterministicSample(df: DataFrame, hashKey: Column, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(!df.columns.contains("__ds_h"),
      "input already has a __ds_h column; rename it before deterministicSample")
    df.withColumn("__ds_h", md5(coalesce(hashKey.cast("string"), lit(""))))
      .orderBy(col("__ds_h"))
      .limit(n)
      .drop("__ds_h")
  }

  /** Histogram-sketch approximate quantiles per group: the engine-neutral
    * scale answer to "p50/p90 of a 100 TB column". Exact `percentile`
    * keeps a value→count buffer bounded by VALUE CARDINALITY — fine for
    * 4-dp scores, unbounded for raw doubles; this keeps one counter per
    * fixed-width bin (`binWidth`), so aggregate state is
    * ceil(range/binWidth) counters per group NO MATTER the cardinality,
    * with ordinary partial+final merge (counters add). The estimate for
    * prob p is the upper edge of the first bin whose cumulative count
    * reaches p·total — deterministic integer arithmetic, replayable
    * bit-for-bit in any SQL engine (unlike t-digest/KLL layouts), the
    * [[graft.functions.SketchAggregates]] KMV discipline applied to
    * quantiles.
    *
    * Scale: one partial+final groupBy((group, bin)) over the scan, then
    * per-group cumulative selection over the |groups|·|bins| histogram
    * frame — post-aggregation scalar work, windowed over bins only,
    * never over rows. */
  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      binWidth: Double, probs: Seq[Double]): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(probs.nonEmpty && probs == probs.sorted && probs.distinct == probs
        && probs.forall(p => p > 0 && p < 1),
      s"probs must be strictly increasing inside (0,1), got $probs")
    import org.apache.spark.sql.expressions.Window
    // bin id via exact long floor-div of the scaled value: floor(v/w) as
    // plain double floor is exact while |v/w| < 2^53 — the fixture and
    // any realistic score range sit far below that
    val bin = floor(col(valueCol).cast("double") / lit(binWidth)).cast("long")
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), bin.as("__hb"))
      .agg(count(lit(1)).as("__hn"))
    val w = Window.partitionBy(groupCol).orderBy("__hb")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("__hcum", sum(col("__hn")).over(w))
      .withColumn("__htot", sum(col("__hn")).over(Window.partitionBy(groupCol)))
    // estimate = upper bin edge of the first bin reaching p·total;
    // p·total compares as a DOUBLE product of exact longs — identical
    // in any engine
    val aggs = probs.zipWithIndex.map { case (p, i) =>
      min(when(col("__hcum").cast("double") >= col("__htot") * p,
        (col("__hb") + 1L).cast("double") * binWidth)).as(s"p${(p * 100).round}")
    }
    cum.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
  }

  /** The MERGEABILITY half of [[histogramQuantiles]]: per-SHARD bin
    * counters (the form a fleet persists per shard/day/partition) merged
    * by plain per-bin addition, then the same first-bin-reaching-p·total
    * selection — proving histogram sketches compose like any algebraic
    * state ([[IncrementalAgg]]'s contract, applied to quantiles). A
    * 100 TB pipeline stores each day's counters (range/binWidth rows,
    * metadata-sized) and answers global quantiles over any day span by
    * summing counters — no value-level rescan. The windows here run over
    * BIN-cardinality rows (bounded by range/binWidth by contract, same
    * as histogramQuantiles' per-group window), never over values.
    *
    * @return ONE row with a `p<NN>` column per requested prob */
  def mergedHistogramQuantiles(df: DataFrame, shardCol: Column,
      valueCol: String, binWidth: Double, probs: Seq[Double]): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(probs.nonEmpty && probs == probs.sorted && probs.distinct == probs
        && probs.forall(p => p > 0 && p < 1),
      s"probs must be strictly increasing inside (0,1), got $probs")
    import org.apache.spark.sql.expressions.Window
    val bin = floor(col(valueCol).cast("double") / lit(binWidth)).cast("long")
    val perShard = df.filter(col(valueCol).isNotNull)
      .groupBy(shardCol.as("__shard"), bin.as("__hb"))
      .agg(count(lit(1)).as("__hn"))
    // the merge: per-bin addition of shard counters
    val merged = perShard.groupBy("__hb").agg(sum(col("__hn")).as("__hn"))
    val w = Window.orderBy("__hb").rowsBetween(Window.unboundedPreceding, 0)
    val cum = merged
      .withColumn("__hcum", sum(col("__hn")).over(w))
      .withColumn("__htot", sum(col("__hn")).over(
        Window.partitionBy(lit(1))))
    val aggs = probs.map { p =>
      min(when(col("__hcum").cast("double") >= col("__htot") * p,
        (col("__hb") + 1L).cast("double") * binWidth)).as(s"p${(p * 100).round}")
    }
    cum.agg(aggs.head, aggs.tail: _*)
  }

  /** CASE group WHEN k1 THEN v1 ... ELSE default END, empty-map safe
    * (collapses to the default literal). */
  private def caseOver[T](group: Column, entries: Map[String, T],
      default: T): Column =
    entries.toSeq.sortBy(_._1)
      .foldLeft(Option.empty[Column]) { case (acc, (g, v)) =>
        Some(acc.fold(when(group === g, v))(_.when(group === g, v)))
      }
      .fold(lit(default))(_.otherwise(default))

  /** Data-mixture weighting: per-group document/token counts plus the
    * sampling rate (downsample) or epoch count (upsample) needed to hit
    * `targetShares` of a `budgetTokens` training budget. Groups absent
    * from `targetShares` get share 0 (excluded from the mix).
    *
    * Output per group: n_docs, tokens, target_share, target_tokens
    * (floor of share*budget), weight (target/actual, 6 dp),
    * sample_rate = min(weight, 1), epochs = max(weight, 1); all three are
    * null for a zero-token group (no defined weight).
    *
    * Scale (100 TB): one groupBy on a low-cardinality key with partial
    * (map-side) aggregation — the token counting runs inside the scan
    * projection, and only |groups| rows ever shuffle. */
  def mixtureWeights(docs: DataFrame, groupCol: String, textCol: String,
      targetShares: Map[String, Double], budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val share = caseOver(col(groupCol), targetShares, 0.0)
    docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.bpeishTokenCount(col(textCol))).as("tokens"))
      .withColumn("target_share", share)
      .withColumn("target_tokens",
        floor(col("target_share") * budgetTokens).cast("long"))
      // a zero-token group has no defined weight: null, not Infinity (and
      // least/greatest skip nulls, so sample_rate/epochs must null out
      // explicitly rather than inherit a bogus 1.0)
      .withColumn("weight", when(col("tokens") === 0, lit(null).cast("double"))
        .otherwise(round(col("target_tokens").cast("double") / col("tokens"), 6)))
      .withColumn("sample_rate",
        when(col("tokens") === 0, lit(null).cast("double"))
          .otherwise(least(col("weight"), lit(1.0))))
      .withColumn("epochs",
        when(col("tokens") === 0, lit(null).cast("double"))
          .otherwise(greatest(col("weight"), lit(1.0))))
  }

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis): each row gets key `ln(u)/w` — the monotone
    * log transform of the classic `u^(1/w)`, so the same n rows win
    * without a cross-engine `pow` — where `u` is the top-53-bit
    * NeutralHash uniform in [0,1) (seedless, content-addressed: the
    * sample is reproducible across engines and runs, and the oracle
    * replays the exact key). Rows with larger weight win
    * proportionally more often, exactly the inclusion law weighted
    * curriculum sampling wants.
    *
    * Plans as TakeOrderedAndProject: an n-element heap per task, never a
    * global sort — the [[deterministicSample]] shape with a weight in
    * the key. Contract: weights must be > 0 (non-positive rows are
    * filtered out — for ln(u) < 0 a negative weight would INVERT the
    * key's meaning, silently preferring the lowest-weight rows);
    * `u = 0` (probability 2^-53 per row) yields -Infinity and simply
    * never wins.
    *
    * @return the n sampled rows plus their `wkey` (rounded to 6 dp),
    *         ordered by idCol. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(!df.columns.contains("__wkey"), "weightedSample reserves __wkey")
    val u = shiftrightunsigned(
      graft.functions.NeutralHash.lower64Col(col(idCol).cast("string")), 11)
      .cast("double") / lit(9007199254740992.0) // 2^53: exact division
    val key = log(u) / weight
    df.filter(col(idCol).isNotNull && weight > 0)
      .select(col("*"), key.as("__wkey"))
      .orderBy(col("__wkey").desc, col(idCol))
      .limit(n)
      .select(col(idCol), round(col("__wkey"), 6).as("wkey"))
      .orderBy(idCol)
  }

  /** Per-group Efraimidis–Spirakis weighted sampling without
    * replacement: [[weightedSample]]'s deterministic ln(u)/w key, but
    * the n winners come from a bounded-heap TopKAgg PER GROUP — ≤ n
    * rows per group per mapper cross the exchange, never a global sort
    * or a per-group window. The stratified form of the same sampler:
    * one aggregate selects every stratum's sample in a single pass. */
  def weightedSamplePerGroup(df: DataFrame, idCol: String, groupCol: String,
      weight: Column, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val u = shiftrightunsigned(
      graft.functions.NeutralHash.lower64Col(col(idCol).cast("string")), 11)
      .cast("double") / lit(9007199254740992.0) // 2^53: exact division
    val key = log(u) / weight
    df.filter(col(idCol).isNotNull && weight > 0)
      .select(col(groupCol).as("grp"), col(idCol).as("_id"), key.as("_k"))
      .groupBy("grp")
      .agg(graft.functions.SketchAggregates.topKAgg(
        col("_k"), col("_id"), n).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), col("col.id").as(idCol),
        round(col("col.score"), 6).as("wkey"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** Greedy token-budget selection: take rows in (`priorityCol` DESC,
    * `idCol` ASC) order — best first, id-tiebroken so the order is total —
    * until the running token count reaches `budgetTokens`; the row that
    * CROSSES the boundary is kept (classic budget fill: the selection
    * always reaches the budget when the pool can), everything after it is
    * dropped. This is the "spend a fixed token budget on the best data"
    * step every curated pretraining mix ends with — priority can be a
    * quality score, a DSIR log-weight, or a hash (budget-capped shuffle).
    *
    * Scale (100 TB): a global running total in a deterministic order is
    * the one thing a plain `ORDER BY` window serializes into a single
    * task — so this is [[Packing.packChunks]]'s two-phase prefix sum on
    * the (priority, id) key instead: range-repartition (partition k holds
    * a contiguous slice of the priority order), per-partition token sums
    * come back to the driver (ONE row per partition), their exclusive
    * prefix broadcasts back, and each partition emits its local running
    * totals plus its offset. Partitions whose offset already exceeds the
    * budget return without consuming their input — only the winning
    * prefix of the corpus does row work.
    *
    * Contract: `idCol` must be castable to long and unique; rows with a
    * NULL priority or id are excluded (they have no place in the order);
    * a NULL token count reads as 0 (a zero-length doc costs nothing).
    *
    * @return (idCol, priorityCol, n_tokens, start_offset) for the kept
    *         rows — start_offset is the tokens spent BEFORE this row, so
    *         `start_offset < budgetTokens` is the keep rule an external
    *         engine replays with a window cumsum. */
  def tokenBudgetSample(scored: DataFrame, idCol: String, priorityCol: String,
      tokenCol: String, budgetTokens: Long, partitions: Int = 0): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val spark = scored.sparkSession
    val nPart =
      if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    // localCheckpoint freezes the range layout so phase 1's sums and
    // phase 2's emit see the SAME partitions (the packChunks discipline)
    val base = scored
      .filter(col(priorityCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("_id"),
        col(priorityCol).cast("double").as("_p"),
        coalesce(col(tokenCol).cast("long"), lit(0L)).as("_n"))
      .repartitionByRange(nPart, col("_p").desc, col("_id").asc)
      .sortWithinPartitions(col("_p").desc, col("_id").asc)
      .localCheckpoint()
    val partSums = base.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(2))
      Iterator.single((i, s))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](partSums.length + 1)
    partSums.foreach { case (i, s) => offsets(i + 1) = s }
    var i = 1
    while (i < offsets.length) { offsets(i) += offsets(i - 1); i += 1 }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("_p",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("start_offset",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val kept = base.rdd.mapPartitionsWithIndex { (pid, it) =>
      var running = bc.value(pid)
      if (running >= budgetTokens) Iterator.empty // past the budget: skip
      else it.map { r =>
        val start = running
        running += r.getLong(2)
        org.apache.spark.sql.Row(r.getLong(0), r.getDouble(1), r.getLong(2), start)
      }.takeWhile(_.getLong(3) < budgetTokens)
    }
    spark.createDataFrame(kept, outSchema)
      .withColumnRenamed("_id", idCol)
      .withColumnRenamed("_p", priorityCol)
  }

  /** Temperature-scaled mixture weighting (the multilingual-sampling
    * move: share_g ∝ tokens_g^alpha, alpha < 1 flattens the distribution
    * toward low-resource groups, alpha = 1 is proportional, alpha → 0
    * approaches uniform) — [[mixtureWeights]] with the target shares
    * DERIVED from the corpus itself instead of caller-supplied. Output
    * columns match [[mixtureWeights]] exactly, so the same
    * [[applyMixture]]-style consumers read either.
    *
    * Determinism: target_share is rounded to 6 dp BEFORE target_tokens =
    * floor(share · budget), so with a power-of-ten budget the product is
    * an exact integer-valued double and the floor replays bit-equal in
    * any engine; weight/sample_rate/epochs are then ratios of exact
    * integers, the [[mixtureWeights]] contract.
    *
    * Scale: one low-cardinality groupBy with map-side partial agg; the
    * normalizing total is a one-row broadcast (the scalar crossJoin
    * pattern), nothing corpus-sized moves. */
  def mixtureWeightsTemperature(docs: DataFrame, groupCol: String,
      textCol: String, alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val grouped = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.bpeishTokenCount(col(textCol))).as("tokens"))
      .withColumn("_pw", pow(col("tokens").cast("double"), lit(alpha)))
    val tot = grouped.agg(sum("_pw").as("_tot"))
    grouped.crossJoin(broadcast(tot))
      // an all-empty corpus has no defined shares: 0, not NaN
      .withColumn("target_share",
        when(col("_tot") === 0.0, lit(0.0))
          .otherwise(round(col("_pw") / col("_tot"), 6)))
      .withColumn("target_tokens",
        floor(col("target_share") * budgetTokens).cast("long"))
      .withColumn("weight", when(col("tokens") === 0, lit(null).cast("double"))
        .otherwise(round(col("target_tokens").cast("double") / col("tokens"), 6)))
      .withColumn("sample_rate",
        when(col("tokens") === 0, lit(null).cast("double"))
          .otherwise(least(col("weight"), lit(1.0))))
      .withColumn("epochs",
        when(col("tokens") === 0, lit(null).cast("double"))
          .otherwise(greatest(col("weight"), lit(1.0))))
      .drop("_pw", "_tot")
  }
}

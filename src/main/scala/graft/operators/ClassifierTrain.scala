package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.NeutralHash

/** Distributed training of a hashed-feature linear quality classifier
  * (EXTENSION, SURVEY.md §2.K) — the missing twin of
  * [[graft.functions.TextClassifier]], whose scaladoc promises "a real
  * deployment swaps [[TextClassifier.weightsInt]] for trained weights
  * quantized the same way". This operator produces those weights: a
  * fastText/CCNet-style binary quality filter (target vs raw) fit by
  * full-batch gradient descent on md5-hashed word-unigram features,
  * with the model QUANTIZED to integer micro-units after every step.
  *
  * Scale shape (100 TB): gradients are per-bucket keyed sums — the
  * parameter-server-free Spark formulation — over a persisted per-doc
  * feature stage built once. For practical hash spaces (<= 2^16
  * buckets) the model rides each iteration as a broadcast map literal
  * against per-doc sparse feature maps: one map-side projection + one
  * `buckets`-group partial aggregate per step, no joins. For 2^20+
  * buckets the model stays a DataFrame (bucket → weight) end to end —
  * never a driver-side vector — at the cost of two keyed joins per
  * iteration. Both paths produce bit-identical integer weights.
  *
  * Determinism / engine-neutral replay: weights are integers at every
  * iteration boundary, so margins `Σ c·w` are EXACT integer sums under
  * any accumulation order; the only floats are `sigmoid(margin/1e6/n)`
  * (identical rationals into `exp` on both engines) and the gradient
  * terms, which ride the DECIMAL(38,12) bridge before summation. The
  * entire T-iteration loop unrolls as chained SQL CTEs — see
  * q_ml_logreg_train's oracle.
  */
object ClassifierTrain {

  private val Micro = 1e6

  private def words(textCol: Column): Column =
    filter(split(lower(textCol), "\\s+"), w => w =!= "")

  /** The (id, label, bucket, count) token shuffle — the corpus-sized
    * stage under both bag forms (map-side combined by the groupBy).
    * The label is evaluated in its OWN projection before the explode:
    * folded into the explode-select, Catalyst places it after the
    * Generate and re-evaluates the (potentially text-scanning) label
    * expression once per TOKEN row instead of once per document —
    * measured 11× on the fixture corpus. */
  private def bag(docs: DataFrame, idCol: String, textCol: String,
      label: Column, buckets: Int): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    // widen the parse (r12): per-token hashing dwarfs the scan bytes,
    // and a single-row-group corpus file pins the stage to one task
    Parallelism.widen(docs, col(idCol))
      .select(col(idCol), label.cast("boolean").as("_y"), col(textCol))
      .select(col(idCol), col("_y"), explode(words(col(textCol))).as("_w"))
      .select(col(idCol), col("_y"),
        (NeutralHash.lower64Col(col("_w"))
          .bitwiseAND(lit((buckets - 1).toLong))).as("_b"))
      .groupBy(col(idCol), col("_y"), col("_b"))
      .agg(count(lit(1)).as("_c"))
  }

  /** Per-doc hashed-unigram bag (id, label, bucket, count, n_tok) —
    * the one corpus-sized stage, shared by every iteration. `buckets`
    * must be a power of two (bucket = md5lower64 & (buckets-1), the
    * [[graft.functions.TextClassifier]] masking convention, so trained
    * weights drop straight into its inference path). Token-less docs
    * carry no features and are excluded. */
  def hashedBags(docs: DataFrame, idCol: String, textCol: String,
      label: Column, buckets: Int): DataFrame = {
    val b = bag(docs, idCol, textCol, label, buckets)
    val nTok = b.groupBy(col(idCol)).agg(sum("_c").as("_n"))
    b.join(nTok, Seq(idCol))
  }

  /** Per-doc integer margin `Σ c·w` under the quantized `weights`
    * frame (_b, _w): exact at any accumulation order. Docs whose
    * buckets all miss the weight table score 0. */
  private def margins(bags: DataFrame, idCol: String,
      weights: DataFrame): DataFrame =
    bags.join(weights, Seq("_b"), "left")
      .groupBy(col(idCol), col("_y"), col("_n"))
      .agg(sum(col("_c") * coalesce(col("_w"), lit(0L))).as("_m"))

  /** The model collected for the join-free margin path, when small
    * enough ([[CompactMaxBuckets]]); None → frame-join path. The COLLECT
    * is limit-bounded (an oversized model never blows up the driver);
    * the normalizing groupBy underneath it is one aggregation of the
    * weights frame — O(buckets) rows on every internal path, and the
    * price of semantic parity on arbitrary external frames.
    *
    * Normalized to the FRAME-JOIN semantics first, because public APIs
    * (scoreQuantized / calibration / confusion) accept arbitrary weight
    * frames: a null `_w` contributes 0 (the join path's
    * `coalesce(_w, 0)`), duplicate `_b` rows SUM (an equi-join
    * duplicates the bag row per weight row, so contributions add), and
    * a null `_b` matches nothing (null never equi-joins). */
  private def smallModel(weights: DataFrame): Option[Map[Long, Long]] = {
    val head = weights
      .filter(col("_b").isNotNull)
      .groupBy(col("_b"))
      .agg(sum(coalesce(col("_w"), lit(0L))).as("_w"))
      .limit(CompactMaxBuckets + 1).collect()
    if (head.length > CompactMaxBuckets) None
    else Some(head.map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  /** Dense 1-based weight lookup array for `element_at` — O(1) per
    * lookup where a map literal scans linearly; unobserved buckets
    * weigh 0, keys outside [0, buckets) cannot occur (bucket =
    * hash & (buckets−1)) and are dropped. */
  private def weightArrayLit(w: Map[Long, Long], buckets: Int): Column =
    typedLit((0 until buckets).map(b => w.getOrElse(b.toLong, 0L)))

  /** Per-doc (id, _y, _n, _m) under `weights`, choosing the cheapest
    * margin plan: a small model folds into the bag aggregation itself as
    * a broadcast dense-array literal — margin, label and token count all
    * come out of the ONE corpus shuffle, no nTok join, no weight join.
    * Margin stays an exact integer sum either way, so both plans are
    * bit-equal. */
  private def marginsAny(docs: DataFrame, idCol: String, textCol: String,
      label: Column, buckets: Int, weights: DataFrame): DataFrame =
    (if (buckets <= CompactMaxBuckets) smallModel(weights) else None) match {
      case Some(m) =>
        val warr = weightArrayLit(m, buckets)
        bag(docs, idCol, textCol, label, buckets)
          .groupBy(col(idCol))
          .agg(max(col("_y")).as("_y"), sum(col("_c")).as("_n"),
            sum(col("_c") * element_at(warr, (col("_b") + 1).cast("int")))
              .as("_m"))
          .select(col(idCol), col("_y"), col("_n"), col("_m"))
      case None =>
        margins(hashedBags(docs, idCol, textCol, label, buckets),
          idCol, weights)
          .select(col(idCol), col("_y"), col("_n"), col("_m"))
    }

  /** Bucket-count ceiling for the compact training path: the model is
    * collected per iteration (8 B/bucket → 512 KB at the ceiling), far
    * under any driver budget, while 2^20+ hash spaces stay on the
    * frame-join path. */
  private val CompactMaxBuckets = 1 << 16

  /** Spark's `round(double)` (HALF_UP on the shortest decimal form),
    * replicated exactly so the compact path's driver-side weight update
    * is bit-equal to the frame path's `round(...).cast("long")`. */
  private def roundHalfUp(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  /** Train `iterations` full-batch GD steps; returns the quantized
    * model as (_b, _w) integer micro-unit weights over every observed
    * bucket. `lr` is the learning rate on the mean-normalized feature
    * scale (margin/1e6/n_tok).
    *
    * Two equivalent execution paths (same integer weights — margins are
    * exact integer sums, gradient terms ride per-term DECIMAL(38,12)
    * casts, the quantizing round is HALF_UP in both):
    *   - buckets <= 2^16: ONE corpus pass builds a per-doc sparse
    *     feature map; each iteration is then a single map-side projection
    *     over that cached frame (margin = fold over the map against the
    *     broadcast weight literal — no join) + a `buckets`-group partial
    *     aggregate + an O(buckets) collect. The O(T·corpus) join/shuffle
    *     chain of the naive loop collapses to T scans of a one-row-per-
    *     doc frame.
    *   - larger hash spaces: the model stays a DataFrame end to end
    *     (never driver-side), two keyed joins + two aggregations per
    *     iteration over the persisted bag stage. */
  def trainQuantized(docs: DataFrame, idCol: String, textCol: String,
      label: Column, buckets: Int = 256, iterations: Int = 4,
      lr: Double = 1000.0): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    if (buckets <= CompactMaxBuckets)
      trainQuantizedCompact(docs, idCol, textCol, label, buckets, iterations, lr)
    else
      trainQuantizedFrames(docs, idCol, textCol, label, buckets, iterations, lr)
  }

  /** Compact path: per-doc sparse feature maps + a driver-held integer
    * weight vector (bounded by [[CompactMaxBuckets]]). */
  private[operators] def trainQuantizedCompact(docs: DataFrame, idCol: String,
      textCol: String, label: Column, buckets: Int, iterations: Int,
      lr: Double): DataFrame = {
    val spark = docs.sparkSession
    // ONE corpus-sized stage: (doc, y, {bucket -> count}, n_tok) — one
    // row per doc, shared by every iteration; n_tok folds out of the
    // same aggregation (no nTok join)
    val compact = bag(docs, idCol, textCol, label, buckets)
      .groupBy(col(idCol))
      .agg(max(col("_y")).as("_y"),
        map_from_entries(collect_list(struct(col("_b"), col("_c")))).as("_f"),
        sum(col("_c")).as("_n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nd = compact.count() // training-doc count (the mean-grad divisor)
    var w = Map.empty[Long, Long]
    for (_ <- 0 until iterations) {
      // DENSE weight array literal: element_at on an array is O(1) where
      // a map literal lookup scans its entries linearly — per-token cost,
      // so the linear form multiplies into the whole corpus
      val warr = weightArrayLit(w, buckets)
      // per-doc integer margin: fold the sparse map against the
      // broadcast weight literal — exact at any fold order, no join
      val mExpr = aggregate(map_entries(col("_f")), lit(0L),
        (acc, e) => acc + e.getField("value") *
          element_at(warr, e.getField("key").cast("int") + 1))
      val p = lit(1.0) / (lit(1.0) +
        exp(-(mExpr.cast("double") / (col("_n") * lit(Micro)))))
      // p gets its OWN projection before the explode (the bag() label
      // lesson): folded into the explode-select, Catalyst re-evaluates
      // the O(|doc map|) margin fold once per map ENTRY instead of once
      // per doc — measured 14× on the generated sf5 corpus
      val scored = compact.select(col("_y"), col("_n"), col("_f"), p.as("_p"))
      // grad[b] = Σ_docs (y − p)·c/n/N — same term shape and DECIMAL
      // bridge as the frame path; map-side partials collapse the shuffle
      // to <= `buckets` rows per mapper
      val grad = scored
        .select(col("_y"), col("_n"), col("_p"),
          explode(map_entries(col("_f"))).as("_e"))
        .select(col("_e.key").as("_b"),
          ((when(col("_y"), lit(1.0)).otherwise(lit(0.0)) - col("_p"))
            * col("_e.value") / col("_n") / lit(nd))
            .cast("decimal(38,12)").as("_t"))
        .groupBy(col("_b"))
        .agg(sum(col("_t")).as("_g"))
        .collect()
      w = w ++ grad.map { r =>
        val b = r.getLong(0)
        val g = Option(r.getDecimal(1)).map(_.doubleValue).getOrElse(0.0)
        b -> (w.getOrElse(b, 0L) + roundHalfUp(lr * g * Micro))
      }
    }
    compact.unpersist()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_b",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("_w",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rows = w.toSeq.sortBy(_._1).map { case (b, wt) =>
      org.apache.spark.sql.Row(b, wt): org.apache.spark.sql.Row
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
  }

  /** Frame path: the model lives as a DataFrame (bucket -> weight) end
    * to end — the 2^20+-bucket form where collecting per iteration would
    * put the hash space on the driver. */
  private[operators] def trainQuantizedFrames(docs: DataFrame, idCol: String,
      textCol: String, label: Column, buckets: Int, iterations: Int,
      lr: Double): DataFrame = {
    val bags = hashedBags(docs, idCol, textCol, label, buckets)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // MEAN gradient (÷ training-doc count) makes `lr` scale-free: the
    // same rate trains identically at sf0.01 and at 100 TB. The count
    // rides as a one-row broadcast frame, not a driver scalar.
    val nd = bags.groupBy().agg(countDistinct(col(idCol)).as("_nd"))
    // w=0 start: the empty frame makes iteration 1's margins exactly 0
    // (sigmoid(0)=0.5 bit-exact — no libm involved on step one)
    var w: DataFrame = bags.sparkSession.emptyDataFrame
      .withColumn("_b", lit(0L)).withColumn("_w", lit(0L))
      .limit(0).select("_b", "_w")
    for (_ <- 0 until iterations) {
      val m = margins(bags, idCol, w)
        .select(col(idCol),
          (lit(1.0) / (lit(1.0) + exp(-(col("_m").cast("double") /
            (col("_n") * lit(Micro)))))).as("_p"))
      // grad[b] = Σ_docs (y − p)·c/n/N — DECIMAL-bridged term sums
      val grad = bags.join(m, Seq(idCol))
        .crossJoin(broadcast(nd))
        .groupBy(col("_b"))
        .agg(sum(((when(col("_y"), lit(1.0)).otherwise(lit(0.0)) - col("_p"))
          * col("_c") / col("_n") / col("_nd")).cast("decimal(38,12)")).as("_g"))
      val next = w.join(grad, Seq("_b"), "full_outer")
        .select(col("_b"),
          (coalesce(col("_w"), lit(0L)) +
            round(lit(lr) * coalesce(col("_g").cast("double"), lit(0.0))
              * lit(Micro)).cast("long")).as("_w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize: O(buckets) rows, keeps lineage O(1)
      w.unpersist()
      w = next
    }
    // the model is O(buckets) — pin it via localCheckpoint (lineage cut to
    // materialized blocks, released when the frame is GC'd) so the
    // corpus-sized bag stage can be unpersisted HERE instead of leaking
    // cached blocks into a long-lived session with no handle to release
    val out = w.localCheckpoint()
    w.unpersist()
    bags.unpersist()
    out
  }

  /** Score `docs` under the quantized model — the DEPLOYMENT surface
    * (train once, filter the whole corpus): per-doc integer micro-unit
    * margin `Σ c·w`, exact under any accumulation order, so ranking and
    * thresholding replay bit-equal in any engine. One corpus-sized
    * hashed-bag pass + a keyed join against the O(buckets) model frame
    * (auto-broadcast while small) + a keyed sum — the classifier is
    * never a driver-side vector here either. Token-less docs carry no
    * features and are excluded (the [[hashedBags]] contract). */
  def scoreQuantized(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int): DataFrame =
    marginsAny(docs, idCol, textCol, lit(false), buckets, weights)
      .select(col(idCol), col("_m").as("margin_micro"))

  /** Reliability (calibration) report — the deployment question the
    * confusion matrix doesn't answer: when the model says 0.8, is it
    * right 80 % of the time? Predicted probability
    * p = σ(margin / (n_tok · 1e6)) bins into `nBins` equal widths; each
    * bin reports its count, mean prediction and empirical positive
    * rate. One scoring pass + an nBins-cardinality aggregate; mean-p
    * sums ride per-term DECIMAL(38,12) casts (order-independent), and
    * σ's exp keeps every rounded value off half-points — the same
    * determinism arguments as the training loop itself. */
  def calibration(docs: DataFrame, idCol: String, textCol: String,
      label: Column, weights: DataFrame, buckets: Int,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"calibration needs nBins >= 2, got $nBins")
    val m = marginsAny(docs, idCol, textCol, label, buckets, weights)
    val p = lit(1.0) / (lit(1.0) +
      exp(-(col("_m").cast("double") / (col("_n") * lit(1000000.0)))))
    m.select(col("_y").as("y"), p.as("p"))
      .withColumn("bin",
        least(floor(col("p") * nBins), lit(nBins - 1L)).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("y").cast("long")).as("n_pos"),
        sum(col("p").cast("decimal(38,12)")).as("_sp"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("_sp").cast("double") / col("n"), 6).as("mean_p"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"))
  }

  /** Confusion counts of the quantized model on `docs` (predict
    * positive when the integer margin > 0): one row per
    * (label, prediction) cell with its count — all integers, exact. */
  def confusion(docs: DataFrame, idCol: String, textCol: String,
      label: Column, weights: DataFrame, buckets: Int): DataFrame =
    marginsAny(docs, idCol, textCol, label, buckets, weights)
      .select(col("_y").as("label"), (col("_m") > 0L).as("pred"))
      .groupBy("label", "pred").agg(count(lit(1)).as("n"))
}

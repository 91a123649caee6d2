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
  * Scale shape (100 TB): the model lives as a DataFrame (bucket →
  * weight) — never a driver-side vector — so `buckets` can be 2^20+
  * without touching driver memory; Spark auto-broadcasts it while it is
  * small. Each iteration is two keyed joins + two aggregations over the
  * persisted per-doc bag stage (doc, bucket, count), which is
  * pre-aggregated map-side so a document contributes at most its
  * distinct-bucket count per iteration. Gradients are per-bucket keyed
  * sums — the parameter-server-free Spark formulation.
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

  /** Per-doc hashed-unigram bag (id, label, bucket, count, n_tok) —
    * the one corpus-sized stage, shared by every iteration. `buckets`
    * must be a power of two (bucket = md5lower64 & (buckets-1), the
    * [[graft.functions.TextClassifier]] masking convention, so trained
    * weights drop straight into its inference path). Token-less docs
    * carry no features and are excluded. */
  def hashedBags(docs: DataFrame, idCol: String, textCol: String,
      label: Column, buckets: Int): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val bag = docs
      .select(col(idCol), label.cast("boolean").as("_y"),
        explode(words(col(textCol))).as("_w"))
      .select(col(idCol), col("_y"),
        (NeutralHash.lower64Col(col("_w"))
          .bitwiseAND(lit((buckets - 1).toLong))).as("_b"))
      .groupBy(col(idCol), col("_y"), col("_b"))
      .agg(count(lit(1)).as("_c"))
    val nTok = bag.groupBy(col(idCol)).agg(sum("_c").as("_n"))
    bag.join(nTok, Seq(idCol))
  }

  /** Per-doc integer margin `Σ c·w` under the quantized `weights`
    * frame (_b, _w): exact at any accumulation order. Docs whose
    * buckets all miss the weight table score 0. */
  private def margins(bags: DataFrame, idCol: String,
      weights: DataFrame): DataFrame =
    bags.join(weights, Seq("_b"), "left")
      .groupBy(col(idCol), col("_y"), col("_n"))
      .agg(sum(col("_c") * coalesce(col("_w"), lit(0L))).as("_m"))

  /** Train `iterations` full-batch GD steps; returns the quantized
    * model as (_b, _w) integer micro-unit weights over every observed
    * bucket. `lr` is the learning rate on the mean-normalized feature
    * scale (margin/1e6/n_tok). */
  def trainQuantized(docs: DataFrame, idCol: String, textCol: String,
      label: Column, buckets: Int = 256, iterations: Int = 4,
      lr: Double = 1000.0): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
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
    margins(hashedBags(docs, idCol, textCol, lit(false), buckets),
      idCol, weights)
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
    val m = margins(hashedBags(docs, idCol, textCol, label, buckets),
      idCol, weights)
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
    margins(hashedBags(docs, idCol, textCol, label, buckets), idCol, weights)
      .select(col("_y").as("label"), (col("_m") > 0L).as("pred"))
      .groupBy("label", "pred").agg(count(lit(1)).as("n"))
}

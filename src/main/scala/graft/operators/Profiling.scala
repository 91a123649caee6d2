package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling (EXTENSION, SURVEY.md §2.K): the per-column
  * statistics a crawler/metadata tool derives before registering a
  * table — row count, null count, exact distinct count, min/max. The
  * reference stores exactly this kind of column metadata by hand
  * (`etl_manager/meta.py:30-53` column specs, nullable/enum
  * declarations); profiling computes the ground truth those
  * declarations make claims about, so a user can VALIDATE a declared
  * schema against the data it describes ([[graft.validate.Validate]]
  * enforces; this measures).
  *
  * Shape: ONE aggregate over one scan — every per-column stat is an
  * aggregate expression in the same `agg()`, so the table is read once.
  * Multiple exact `count(DISTINCT)`s plan as a single Expand-based
  * aggregate (rows replicate ×|profiled columns| map-side, then one
  * shuffle). That is the right exactness/IO trade until the table is
  * huge; past that, `approxDistinct = true` swaps in HLL
  * `approx_count_distinct` and the Expand disappears — one plain
  * partial+final agg over 100 TB. The tall output (one row per column)
  * is produced by exploding a literal-built struct array AFTER the
  * aggregate — a 1-row driver-free pivot, never a per-column scan.
  */
object Profiling {

  /** Profile `cols` of `df`. Output columns: `column_name`, `n_rows`,
    * `n_nulls`, `n_distinct`, `min_num`/`max_num` (DOUBLE, numeric
    * columns only), `min_str`/`max_str` (strings only; NULL for the
    * other family). Timestamp/date columns are profiled via their
    * numeric epoch; complex types are rejected — profile a projection
    * of them instead.
    */
  def profileColumns(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profileColumns missing columns: ${missing.mkString(", ")}")

    def isNumeric(dt: DataType): Boolean = dt match {
      case _: NumericType | _: TimestampType | _: DateType => true
      case _ => false
    }
    val kinds: Seq[(String, Boolean)] = cols.map { c =>
      val dt = df.schema(c).dataType
      require(isNumeric(dt) || dt == StringType || dt == BooleanType,
        s"profileColumns supports numeric/string/boolean columns; $c is $dt")
      (c, isNumeric(dt) || dt == BooleanType)
    }

    def numView(c: String): Column = df.schema(c).dataType match {
      case _: TimestampType => unix_micros(col(c)).cast("double")
      case _: DateType => datediff(col(c), lit("1970-01-01").cast("date")).cast("double")
      case BooleanType => col(c).cast("int").cast("double")
      case _ => col(c).cast("double")
    }

    // string min/max live in a SEPARATE keyless aggregate on the exact
    // path: a string-typed min/max buffer is immutable, which forces the
    // WHOLE aggregate to SortAggregate — and the exact multi-distinct
    // rewrite keys its partial on (values..., gid), so that choice
    // inserts a full sort of the ×|cols|-expanded row set (measured at
    // sf0.1: 24.6 s of task time sorting 750 k expanded rows). With the
    // string min/max moved out, every buffer in the Expand pipeline is a
    // mutable primitive and it plans as HashAggregate; the side
    // aggregate has NO grouping keys, so its SortAggregate inserts no
    // sort, and its one row broadcast-joins back. Price: one extra
    // column-pruned scan of the string columns — on the 100 TB path
    // (approxDistinct, no Expand) nothing splits and the table is still
    // read once.
    val splitStrMinMax = !approxDistinct && kinds.exists(!_._2)
    val aggs: Seq[Column] = Seq(count(lit(1)).as("__n")) ++ kinds.flatMap {
      case (c, numeric) =>
        val distinctAgg =
          if (approxDistinct) approx_count_distinct(col(c)).as(s"__d_$c")
          else countDistinct(col(c)).as(s"__d_$c")
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
          distinctAgg) ++ (
          if (numeric)
            Seq(min(numView(c)).as(s"__mn_$c"), max(numView(c)).as(s"__mx_$c"))
          else if (splitStrMinMax) Nil
          else Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    }

    // widen the aggregate's input (r12, [[Parallelism.widen]]): the
    // one-row agg fuses exact countDistinct Expands per column into the
    // scan stage, which a single-row-group file pins to one task
    // (A/B at sf0.1: 2.05 -> 1.76 s)
    val main = Parallelism.widen(df.select(cols.map(col): _*), col(cols.head))
      .agg(aggs.head, aggs.tail: _*)
    val one =
      if (!splitStrMinMax) main
      else {
        val strAggs = kinds.filterNot(_._2).flatMap { case (c, _) =>
          Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")) }
        main.crossJoin(broadcast(
          df.agg(strAggs.head, strAggs.tail: _*)))
      }
    val rows: Seq[Column] = kinds.map { case (c, numeric) =>
      struct(
        lit(c).as("column_name"),
        col("__n").as("n_rows"),
        coalesce(col(s"__nn_$c"), lit(0L)).as("n_nulls"),
        col(s"__d_$c").cast("long").as("n_distinct"),
        (if (numeric) col(s"__mn_$c") else lit(null).cast("double")).as("min_num"),
        (if (numeric) col(s"__mx_$c") else lit(null).cast("double")).as("max_num"),
        (if (numeric) lit(null).cast("string") else col(s"__mn_$c")).as("min_str"),
        (if (numeric) lit(null).cast("string") else col(s"__mx_$c")).as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Key-distribution skew profile for a (join/partition) key: the `k`
    * heaviest keys with their counts and rank, alongside the global key
    * and row totals — the numbers that decide whether a key needs the
    * [[SkewJoin]] salting treatment or AQE skew handling before a big
    * join. All-integer output, so it replays bit-equal anywhere.
    *
    * Shape: one partial+final count per key (the only corpus-sized
    * shuffle), then the heavy hitters come from a GLOBAL bounded-heap
    * [[graft.functions.TopKAgg]] over the per-key counts — ≤ k rows per
    * mapper cross the wire, never a sort of the key histogram — and the
    * two global totals broadcast back as a one-row frame. Ties break by
    * key ascending (deterministic, window-replayable).
    */
  def keySkewTopK(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"))
    counts
      .agg(graft.functions.SketchAggregates.topKAgg(
        col("cnt").cast("double"), col(keyCol), k).as("top"))
      .select(posexplode(col("top")))
      .select(col("col.id").as(keyCol),
        col("col.score").cast("long").as("cnt"),
        (col("pos") + 1).cast("long").as("rk"))
      .crossJoin(broadcast(totals))
  }

  /** Count–min sketch counters over a key column: a `depth` × `width`
    * grid of counters where row j counts keys by hash_j(key) =
    * (md5_lower64 + j·md5_upper64) & (width-1) — the same one-digest
    * Carter–Wegman derivation as the MinHash slots
    * ([[graft.functions.NeutralHash]]), so the WHOLE sketch replays
    * bit-equal in an external SQL engine.
    *
    * This is the bounded-state frequency structure: state is O(depth ×
    * width) counters no matter how many distinct keys the data holds —
    * at 100 TB the counters still fit in one broadcast, where an exact
    * per-key histogram is itself corpus-sized. Point estimates
    * ([[cmsEstimates]]) then cost a broadcast lookup, never a full-key
    * aggregation; estimates over-count only (min over depth rows of
    * colliding counters ≥ true count, never below).
    *
    * Shape: map-side hash + a partial+final count into ≤ depth·width
    * groups — the shuffle carries at most the grid, not the keys. Width
    * must be a power of two (bucket = low bits of the wrapped 64-bit
    * hash, identical in any engine's modular arithmetic). Null keys are
    * skipped (md5 of NULL is NULL — no bucket). */
  def cmsCounters(df: DataFrame, keyCol: Column,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two >= 2, got $width")
    val k = keyCol.cast("string")
    df.select(graft.functions.NeutralHash.lower64Col(k).as("_lo"),
        graft.functions.NeutralHash.upper64Col(k).as("_hi"))
      .filter(col("_lo").isNotNull)
      .select(explode(sequence(lit(0L), lit(depth - 1L))).as("j"),
        col("_lo"), col("_hi"))
      // wrapping (lo + j*hi) lives in a compiled JVM call (ANSI Column
      // arithmetic is overflow-checked); low bits equal any engine's
      // ((lo + j*hi) mod 2^64) mod width for power-of-two widths
      .select(col("j"),
        graft.functions.NeutralHash.cwSlotCol(col("_lo"), col("_hi"), col("j"))
          .bitwiseAND(lit(width - 1L)).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `probes` (a frame with key column
    * `probeKeyCol`) against a [[cmsCounters]] grid built with the same
    * depth/width: est(key) = min over j of counter[j][hash_j(key)],
    * missing buckets counting 0. The counters frame broadcasts (≤
    * depth·width rows by construction); the probe side stays
    * distributed, so estimating ANY number of probe keys is map-side.
    *
    * Null contract: a NULL probe key estimates 0 — the sketch never
    * counts nulls ([[cmsCounters]] skips them: md5 of NULL is NULL, no
    * bucket), so 0 is the sketch-consistent answer, matching the
    * over-count-only guarantee (0 ≥ the true null count of 0 ingested).
    * Callers tracking null keys should count them separately. */
  def cmsEstimates(counters: DataFrame, probes: DataFrame,
      probeKeyCol: String, depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2 && (width & (width - 1)) == 0,
      s"bad depth/width: $depth/$width")
    val k = col(probeKeyCol).cast("string")
    probes
      .select(col(probeKeyCol),
        graft.functions.NeutralHash.lower64Col(k).as("_lo"),
        graft.functions.NeutralHash.upper64Col(k).as("_hi"))
      .select(col(probeKeyCol),
        explode(sequence(lit(0L), lit(depth - 1L))).as("j"),
        col("_lo"), col("_hi"))
      .select(col(probeKeyCol), col("j"),
        graft.functions.NeutralHash.cwSlotCol(col("_lo"), col("_hi"), col("j"))
          .bitwiseAND(lit(width - 1L)).as("bucket"))
      .join(broadcast(counters), Seq("j", "bucket"), "left")
      .groupBy(col(probeKeyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Equi-join OUTPUT-SIZE estimate from two [[cmsCounters]] grids built
    * with the same depth/width: |A ⋈ B| = Σ_k fA(k)·fB(k), estimated by
    * the count–min inner product min_j Σ_b A[j][b]·B[j][b] (AMS/CM
    * sketch join-size estimation — over-estimates only, like the point
    * estimates: colliding buckets add non-negative cross terms). This
    * is the O(d·w)-state alternative to [[joinKeyStats]]' exact
    * histograms: at 100 TB the exact diagnostic costs a full keyed
    * shuffle of BOTH sides, while two sketch scans + this grid-sized
    * join answer "is this join going to explode?" before any plan
    * commits. Fully deterministic — the whole estimate replays in SQL.
    *
    * Null keys: never sketched ([[cmsCounters]] skips them), matching
    * equi-join semantics (null joins nothing). */
  def cmsJoinSizeEstimate(countersA: DataFrame,
      countersB: DataFrame): DataFrame = {
    val a = countersA.select(col("j"), col("bucket"), col("cnt").as("_ca"))
    val b = countersB.select(col("j"), col("bucket"), col("cnt").as("_cb"))
    a.join(b, Seq("j", "bucket"))
      .groupBy("j").agg(sum(col("_ca") * col("_cb")).as("_ip"))
      .agg(min(col("_ip")).as("est_join_rows"))
  }

  /** Pre-join key diagnostics between `left.lKey` and `right.rKey`: the
    * one-row report that decides join strategy BEFORE paying for the
    * join — distinct key counts each side, the key overlap, per-side
    * orphan rows (rows whose key has no match across), and the maximum
    * per-key fanout product (the worst-case row multiplication a join
    * on these keys can produce). All-integer output.
    *
    * Shape: each side collapses to its key histogram first (one keyed
    * partial+final count — the only data-sized shuffles), then the two
    * HISTOGRAMS full-outer join on key (key-cardinality-sized, not
    * row-sized) and a single global aggregate folds the report row.
    * Null keys never match in an equi-join, so they are counted as
    * orphans on their side. */
  /** Per-group IQR (Tukey-fence) outlier profile: type-1 (discrete)
    * quartiles — the value at rank ceil(p·n), a DATA value, never an
    * interpolated double — so the fences are exact arithmetic on exact
    * inputs and the outlier COUNTS replay bit-equal in any engine (an
    * interpolated quartile's low bits could flip a boundary comparison).
    * Output per group: n, q1, q3, fences, outlier counts per side.
    *
    * Shape: one rank window per group (the keyed exchange), quartile
    * rows selected by position, fences broadcast back onto the same
    * frame. Exact per-group quantiles need the per-group sort at any
    * scale; the approx swap is [[Sampling.histogramQuantiles]] (bounded
    * state), same as profileColumns' HLL swap. Null values are ignored
    * (no rank, not counted). */
  def iqrOutliers(df: DataFrame, valueCol: String, byCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(byCol).as("grp"), col(valueCol).cast("double").as("v"))
    val w = Window.partitionBy("grp").orderBy("v")
    val ranked = vals
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
    val quarts = ranked
      .filter(col("rn") === ceil(col("n") * 0.25) ||
        col("rn") === ceil(col("n") * 0.75))
      .groupBy("grp")
      .agg(min(when(col("rn") === ceil(col("n") * 0.25), col("v"))).as("q1"),
        min(when(col("rn") === ceil(col("n") * 0.75), col("v"))).as("q3"),
        max(col("n")).as("n"))
      .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
      .withColumnRenamed("grp", "_qgrp")
    // null-safe: a NULL group key is a real group (its window ranked it);
    // a plain equi-join would silently drop the whole group here
    vals.join(broadcast(quarts), col("grp") <=> col("_qgrp"))
      .groupBy(col("grp"))
      .agg(max(col("n")).as("n"),
        max(col("q1")).as("q1"), max(col("q3")).as("q3"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_high"))
  }

  /** Per-group robust (MAD) outlier profile — the Iglewicz–Hoaglin
    * modified z-score: a point is an outlier when
    * 0.6745·|v − median| > zCut·MAD, with both the median and the MAD
    * taken as TYPE-1 (discrete) quantiles so every fence input is a
    * data value (or an exact double difference of two data values) and
    * the boundary comparisons replay bit-equal — the [[iqrOutliers]]
    * discipline applied to the estimator that tolerates 50% gross
    * contamination where Tukey fences tolerate 25%. MAD = 0 (a majority
    * of identical values) flags nothing — strict inequality, the
    * textbook convention. Null values are ignored.
    *
    * Shape: two group-keyed rank windows (values, then absolute
    * deviations — deviation ties break by value then rank stays total),
    * fences broadcast back. Exact per-group medians need the per-group
    * sort; [[graft.operators.Sampling.histogramQuantiles]] is the
    * bounded-state approx swap. */
  def madOutliers(df: DataFrame, valueCol: String, byCol: String,
      zCut: Double = 3.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(zCut > 0, s"zCut must be positive, got $zCut")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(byCol).as("grp"), col(valueCol).cast("double").as("v"))
    val wv = Window.partitionBy("grp").orderBy("v")
    val med = vals
      .withColumn("rn", row_number().over(wv))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
      .filter(col("rn") === ceil(col("n") * 0.5))
      .groupBy("grp").agg(min(col("v")).as("med"), max(col("n")).as("n"))
      .withColumnRenamed("grp", "_mgrp")
    val devs = vals.join(broadcast(med), col("grp") <=> col("_mgrp"))
      .withColumn("d", abs(col("v") - col("med")))
    val wd = Window.partitionBy("grp").orderBy(col("d"), col("v"))
    val mad = devs
      .withColumn("rn", row_number().over(wd))
      .filter(col("rn") === ceil(col("n") * 0.5))
      .groupBy("grp").agg(min(col("d")).as("mad"))
      .withColumnRenamed("grp", "_dgrp")
    devs.join(broadcast(mad), col("grp") <=> col("_dgrp"))
      .groupBy(col("grp"))
      .agg(max(col("n")).as("n"),
        max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum(when(lit(0.6745) * col("d") > lit(zCut) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Chi-square test of independence between two categorical columns:
    * observed grid (one keyed count — the only data-sized shuffle), row
    * and column totals as aggregates OF the grid, the FULL expected grid
    * (row × column totals, so zero-observed cells contribute their
    * expected mass, the textbook statistic), and the statistic summed
    * through the VARCHAR→DECIMAL bridge so the ≤|a|·|b|-term double sum
    * is order-independent and replays exactly (the q_tpch1 discipline).
    * Output: one row (n, dof, chi2 at 6 dp). Null categories count as
    * their own level on both axes. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = obs.groupBy("a").agg(sum(col("o")).as("ra"))
    val cb = obs.groupBy("b").agg(sum(col("o")).as("cb"))
    val tot = obs.agg(sum(col("o")).as("t"))
    val e = col("ra").cast("double") * col("cb") / col("t")
    val contrib = (coalesce(col("o"), lit(0L)).cast("double") - e) *
      (coalesce(col("o"), lit(0L)).cast("double") - e) / e
    ra.crossJoin(broadcast(cb)).crossJoin(broadcast(tot))
      .join(obs, Seq("a", "b"), "left")
      // struct-wrapped distincts so a NULL category counts as a level
      .agg(max(col("t")).as("n"),
        ((countDistinct(struct(col("a"))) - 1) *
          (countDistinct(struct(col("b"))) - 1)).as("dof"),
        round(sum(contrib.cast("decimal(38,18)")), 6).cast("double").as("chi2"))
  }

  /** Equi-width histogram of a numeric column — the CBO-style
    * distribution profile behind ANALYZE-histogram statistics (the stats
    * [[graft.catalog.GraftCatalog]]'s ANALYZE row says the optimizer
    * wants) and the human one behind "is this column skewed?". Two scans:
    * one for the exact [min, max] envelope (a one-row broadcast), one
    * map-side binning pass feeding a nBins-cardinality aggregate —
    * nothing row-cardinality-sized shuffles at any table size. Bin edges
    * and assignments are pure double arithmetic with one fixed
    * expression shape, so an external engine replays every count
    * exactly. A constant column collapses to bin 0 (width 0 guard).
    * Empty bins are simply absent — the caller can spine-join them in.
    *
    * @return (bin, lo, hi, n): bin ∈ [0, nBins), lo/hi 4-dp edges */
  def histogramEquiWidth(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, s"histogram needs nBins >= 1, got $nBins")
    val v = col(valueCol).cast("double")
    val mm = df.where(v.isNotNull).agg(min(v).as("_mn"), max(v).as("_mx"))
    val width = (col("_mx") - col("_mn")) / lit(nBins)
    df.select(v.as("_v")).where(col("_v").isNotNull)
      .crossJoin(broadcast(mm))
      .select(
        when(col("_mx") === col("_mn"), lit(0L))
          .otherwise(least(floor((col("_v") - col("_mn")) / width),
            lit(nBins - 1L))).as("bin"),
        col("_mn"), col("_mx"))
      .groupBy("bin", "_mn", "_mx").agg(count(lit(1)).as("n"))
      .select(col("bin"),
        round(col("_mn") + col("bin") * width, 4).as("lo"),
        round(col("_mn") + (col("bin") + 1) * width, 4).as("hi"),
        col("n"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic — the whole-distribution
    * drift monitor completing the family (embeddingDrift = per-dimension
    * means, vocabDrift = head terms; this = ANY shape change in a numeric
    * column between two populations): D = sup_x |F_a(x) − F_b(x)|,
    * evaluated right-continuously at the pooled sample points.
    *
    * Scale shape: each side collapses to its VALUE HISTOGRAM (one keyed
    * count, map-side combined), the histograms merge on value, and the
    * running CDFs come from the [[Packing]] two-phase prefix sum —
    * range-repartition by value, per-partition subtotal rows to the
    * driver (ONE row per partition), offsets broadcast back, local
    * running sums. No global-window single-task sort at any cardinality;
    * the sequential dependency rides the partition-count-sized offset
    * array. D and its location are exact integer-count arithmetic plus
    * one fixed double expression, so the oracle replays them bit-equal.
    *
    * @return one row: (n_a, n_b, d_stat, d_at) — d_stat 6-dp, d_at =
    *         smallest value attaining the supremum */
  def ksTwoSample(a: DataFrame, b: DataFrame, valueCol: String): DataFrame =
    ksFromHistograms(valueHistogram(a, valueCol), valueHistogram(b, valueCol))

  /** The (value, count) histogram a population collapses to before any
    * distribution test — also the PERSISTABLE reference form for the
    * streaming drift monitor (store the histogram once, compare every
    * arriving batch against it without re-reading the reference data). */
  def valueHistogram(df: DataFrame, valueCol: String): DataFrame = df
    .select(col(valueCol).cast("double").as("v"))
    .where(col("v").isNotNull)
    .groupBy("v").agg(count(lit(1)).as("cnt"))

  /** Window-free cume_dist at corpus scale: the percentile-rank feature
    * transform (quality-score → percentile is the standard
    * curriculum/filter input) computed WITHOUT the single-task global
    * window that `cume_dist() OVER (ORDER BY v)` plans into. Shape: the
    * value histogram (one keyed count), running counts via the same
    * two-phase prefix sum as [[ksTwoSample]], then one value-keyed join
    * back onto the rows — every stage partition-parallel. Identical
    * semantics to SQL cume_dist: count(x ≤ v) / n.
    *
    * @return input rows + `cume_dist` (unrounded double) */
  def cumeDistBy(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val hist = valueHistogram(df, valueCol)
    val nPart = math.max(1, spark.sparkContext.defaultParallelism)
    val sorted = hist.repartitionByRange(nPart, col("v"))
      .sortWithinPartitions("v")
      .select(col("v"), col("cnt").cast("long").as("cnt"))
      .localCheckpoint()
    val partSums = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(1))
      Iterator.single((i, s))
    }.collect().sortBy(_._1)
    val off = new Array[Long](partSums.length + 1)
    partSums.foreach { case (i, s) => off(i + 1) = s }
    var i = 1
    while (i < off.length) { off(i) += off(i - 1); i += 1 }
    val n = off.last
    val bc = spark.sparkContext.broadcast(off)
    val cdf = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bc.value(pid)
      it.map { r => run += r.getLong(1); Row(r.getDouble(0), run) }
    }
    // internal names prefixed so an input column called "v" can't
    // collide with the CDF frame's join key
    val cdfDf = spark.createDataFrame(cdf, StructType(Seq(
      StructField("__cdf_v", DoubleType, nullable = false),
      StructField("__cum", LongType, nullable = false))))
    df.withColumn("__v", col(valueCol).cast("double"))
      .join(cdfDf, col("__v") === col("__cdf_v"), "left")
      .withColumn("cume_dist",
        when(col("__v").isNull, lit(null).cast("double"))
          .otherwise(col("__cum").cast("double") / lit(n)))
      .drop("__v", "__cdf_v", "__cum")
  }

  /** KS over two pre-collapsed (v, cnt) histograms — the mergeable-state
    * half of [[ksTwoSample]], exposed so references can be persisted. */
  def ksFromHistograms(ha: DataFrame, hb: DataFrame): DataFrame = {
    val spark = ha.sparkSession
    val merged = ha.select(col("v"), col("cnt").as("ca"), lit(0L).as("cb"))
      .unionByName(hb.select(col("v"), lit(0L).as("ca"), col("cnt").as("cb")))
      .groupBy("v").agg(sum("ca").as("ca"), sum("cb").as("cb"))
    val nPart = math.max(1, spark.sparkContext.defaultParallelism)
    // freeze the range layout so both phases see the same partitions
    val sorted = merged.repartitionByRange(nPart, col("v"))
      .sortWithinPartitions("v")
      .select(col("v"), col("ca").cast("long").as("ca"),
        col("cb").cast("long").as("cb"))
      .localCheckpoint()
    // phase 1: one (partition, Σca, Σcb) row each
    val partSums = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var sa = 0L; var sb = 0L
      it.foreach { r => sa += r.getLong(1); sb += r.getLong(2) }
      Iterator.single((i, sa, sb))
    }.collect().sortBy(_._1)
    val offA = new Array[Long](partSums.length + 1)
    val offB = new Array[Long](partSums.length + 1)
    partSums.foreach { case (i, sa, sb) => offA(i + 1) = sa; offB(i + 1) = sb }
    var i = 1
    while (i < offA.length) { offA(i) += offA(i - 1); offB(i) += offB(i - 1); i += 1 }
    val nA = offA.last
    val nB = offB.last
    require(nA > 0 && nB > 0, "ksTwoSample needs non-empty sides")
    val bcA = spark.sparkContext.broadcast(offA)
    val bcB = spark.sparkContext.broadcast(offB)
    // phase 2: local running sums + the partition's global offset
    val cdf = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var ra = bcA.value(pid); var rb = bcB.value(pid)
      it.map { r =>
        ra += r.getLong(1); rb += r.getLong(2)
        Row(r.getDouble(0), ra, rb)
      }
    }
    val cdfDf = spark.createDataFrame(cdf, StructType(Seq(
        StructField("v", DoubleType, nullable = false),
        StructField("cuma", LongType, nullable = false),
        StructField("cumb", LongType, nullable = false))))
      .select(col("v"),
        abs(col("cuma").cast("double") / lit(nA) -
          col("cumb").cast("double") / lit(nB)).as("dd"))
    val dmax = cdfDf.agg(max(col("dd")).as("dmax"))
    cdfDf.crossJoin(broadcast(dmax))
      .filter(col("dd") === col("dmax"))
      .agg(min(col("v")).as("d_at"), max(col("dd")).as("_d"))
      .select(lit(nA).as("n_a"), lit(nB).as("n_b"),
        round(col("_d"), 6).as("d_stat"), col("d_at"))
  }

  def joinKeyStats(left: DataFrame, lKey: String,
      right: DataFrame, rKey: String): DataFrame = {
    val lh = left.groupBy(col(lKey).as("_lk")).agg(count(lit(1)).as("_lc"))
    val rh = right.groupBy(col(rKey).as("_rk")).agg(count(lit(1)).as("_rc"))
    // plain (non-null-safe) equality: null keys match nothing in the
    // join being diagnosed, so their histogram rows surface as orphans
    lh.join(rh, col("_lk") === col("_rk"), "full")
      .agg(
        coalesce(sum(col("_lc")), lit(0L)).as("n_left_rows"),
        count(when(col("_lk").isNotNull, 1)).as("n_left_keys"),
        coalesce(sum(col("_rc")), lit(0L)).as("n_right_rows"),
        count(when(col("_rk").isNotNull, 1)).as("n_right_keys"),
        count(when(col("_lk").isNotNull && col("_rk").isNotNull, 1))
          .as("n_common_keys"),
        coalesce(sum(when(col("_rk").isNull, col("_lc"))), lit(0L))
          .as("left_orphan_rows"),
        coalesce(sum(when(col("_lk").isNull, col("_rc"))), lit(0L))
          .as("right_orphan_rows"),
        coalesce(max(col("_lc") * col("_rc")), lit(0L)).as("max_key_fanout"))
  }

  /** Per-group OLS trend fit — slope / intercept / R² of `yCol` against
    * `xCol` within each group: the drift-TREND counterpart of the
    * point-in-time drift tests (q_stat_ks detects "these two windows
    * differ"; a trend fit answers "which way and how fast is this metric
    * moving"), the standard corpus-health signal over ingestion time.
    *
    * Replayability design (why not `regr_slope`): engines disagree in the
    * last ulp when they accumulate co-moments in floating point with
    * different orders. Here every co-moment (Σx, Σy, Σxy, Σx², Σy²) is an
    * EXACT decimal sum — associative and commutative, so partition order
    * can never change a bit — each sum is converted to double once
    * (correctly rounded), and the closed-form chain
    * `slope = (n·Σxy − ΣxΣy) / (n·Σx² − (Σx)²)` runs in IEEE doubles in a
    * FIXED operation order that any engine replays bit-equally (the
    * DuckDB oracle writes the identical chain). Groups with zero x-
    * variance (n = 1, constant x) yield NULL slope/intercept; R² is
    * additionally NULL when y is constant. Degeneracy is decided on the
    * EXACT decimals (min == max within the group), never on the double
    * denominator — a fractional constant x like 0.10 has a double
    * denominator of ~1e-18, not 0, and a `denx == 0` test alone would
    * emit confident garbage instead of NULL.
    *
    * Exactness premise: the casts to `xType`/`yType` must be lossless for
    * the data (defaults fit integer day-numbers and 2-decimal money);
    * widen the scales at the call site for finer-grained inputs. A value
    * that OVERFLOWS its decimal type raises per row (the loud-guard
    * discipline — a silent NULL would drop the row from the sums while n
    * still counted it); scale truncation (more fractional digits than
    * the type holds) remains the caller's premise. The default
    * precisions keep every product ≤ 38 digits in BOTH Spark and DuckDB
    * multiplication rules.
    *
    * Scale shape: one scan, one keyed aggregate with map-side partials —
    * the same plan as any groupBy.agg; nothing iterative, nothing
    * collected. 100 TB of history fits the same plan because state is one
    * row of five decimals per group.
    */
  def trendFit(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String, xType: String = "decimal(12,2)",
      yType: String = "decimal(19,4)"): DataFrame = {
    require(groupCols.nonEmpty, "trendFit needs at least one group column")
    // loud overflow guard: a non-null source that casts to NULL overflowed
    // the declared decimal type — raising beats silently dropping the row
    // from the sums while count(*) still includes it. Under Spark's
    // default ANSI mode the cast itself throws first; this guard is the
    // backstop for ansi.enabled=false deployments, where the cast nulls.
    def losslessCast(src: String, typ: String): Column = {
      val c = col(src).cast(typ)
      when(col(src).isNotNull && c.isNull,
        raise_error(concat(
          lit(s"trendFit: $src value "), col(src).cast("string"),
          lit(s" overflows $typ — widen the type at the call site"))))
        .otherwise(c)
    }
    val x = losslessCast(xCol, xType)
    val y = losslessCast(yCol, yType)
    val sums = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("_sx"),
        sum(y).cast("double").as("_sy"),
        sum(x * y).cast("double").as("_sxy"),
        sum(x * x).cast("double").as("_sxx"),
        sum(y * y).cast("double").as("_syy"),
        // degeneracy witnesses: EXACT decimal extrema, compared exactly
        min(x).as("_xmn"), max(x).as("_xmx"),
        min(y).as("_ymn"), max(y).as("_ymx"),
        // PRODUCT-overflow witnesses (non-ANSI only — ANSI throws in the
        // multiply itself): x,y are non-null post filter, so a product
        // count below n means a precision-capped product nulled out and
        // sum() would silently skip rows that count(*) still counts
        count(x * y).as("_cxy"), count(x * x).as("_cxx"),
        count(y * y).as("_cyy"))
    // the fixed-order IEEE chain — keep textually in sync with the
    // q_stat_trend oracle SQL
    val nD = col("n").cast("double")
    val productOverflow =
      col("_cxy") =!= col("n") || col("_cxx") =!= col("n") ||
        col("_cyy") =!= col("n")
    // the AGGREGATED sums can overflow too: decimal precision is capped
    // at 38, and under ansi.enabled=false an overflowed sum() returns
    // NULL — which downstream would be indistinguishable from a
    // degenerate group. Every group here has n ≥ 1 non-null x,y (the
    // filter above), so a NULL sum can ONLY mean sum overflow.
    val sumOverflow =
      col("_sx").isNull || col("_sy").isNull || col("_sxy").isNull ||
        col("_sxx").isNull || col("_syy").isNull
    val withMoments = sums
      // the loud-overflow discipline extended to the PRODUCTS: under
      // ansi.enabled=false an overflowing x*y nulls and sum() skips it
      // while n still counts the row — a silently skewed fit
      .withColumn("_guard", when(productOverflow,
        raise_error(lit("trendFit: a decimal product overflowed its " +
          "precision-capped type — widen xType/yType headroom")))
        .when(sumOverflow,
          raise_error(lit("trendFit: an aggregated co-moment sum " +
            "overflowed decimal(38) — widen xType/yType headroom or " +
            "pre-scale the inputs"))))
      .withColumn("_cnum",
        when(col("_guard").isNull,
          nD * col("_sxy") - col("_sx") * col("_sy")))
      .withColumn("_denx", nD * col("_sxx") - col("_sx") * col("_sx"))
      .withColumn("_deny", nD * col("_syy") - col("_sy") * col("_sy"))
    // exact-decimal degeneracy first; the `=== 0.0` legs are the belt for
    // catastrophic cancellation landing on exactly 0.0 with distinct
    // extrema (keep textually in sync with the oracle's CASE conditions)
    val xDeg = col("_xmn") === col("_xmx") || col("_denx") === 0.0
    val yDeg = col("_ymn") === col("_ymx") || col("_deny") === 0.0
    withMoments.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        when(xDeg, lit(null).cast("double"))
          .otherwise(col("_cnum") / col("_denx")).as("slope"),
        when(xDeg, lit(null).cast("double"))
          .otherwise((col("_sy") - (col("_cnum") / col("_denx")) * col("_sx")) / nD)
          .as("intercept"),
        when(xDeg || yDeg, lit(null).cast("double"))
          .otherwise((col("_cnum") * col("_cnum")) / (col("_denx") * col("_deny")))
          .as("r2")): _*)
  }
}

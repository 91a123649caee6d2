package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large-scale event-stream analytics (EXTENSION, SURVEY.md §2.K): the
  * conversion-funnel / cohort-retention / volume-anomaly trio every
  * event warehouse runs daily. The reference's `events`-shaped data is
  * exactly what its users query through Athena; these are the native
  * Spark formulations.
  *
  * Scale design shared by all three: everything is keyed aggregation —
  * no windows over the raw event stream, no driver-side state. The only
  * per-user work is a groupBy on the user key, so a 100 TB event table
  * shuffles each relevant event ONCE per operator (and the post-agg
  * frames are |users| or |days·types| rows — broadcastable for the
  * follow-up joins).
  */
object EventAnalytics {

  /** Ordered conversion funnel: for each user, the earliest occurrence
    * of step 1, then the earliest occurrence of step 2 STRICTLY AFTER
    * that, and so on (the "strict windowless funnel" — every step must
    * happen after the previous step's chosen timestamp, not merely
    * after any earlier event).
    *
    * Returns one row per user that completed at least step 1, with
    * columns `ts_1 .. ts_k` (k = steps reached; users drop out of later
    * frames — see [[funnelSummary]] for the per-step counts).
    *
    * Shape: k keyed min-aggregations cascaded by an equi-join on the
    * user key. Each stage's right side is ≤ |users reaching the stage|
    * rows (monotonically shrinking), so stages 2..k are
    * broadcast-or-co-partitioned joins against the (already filtered)
    * event scan — never an event×event join, never a per-user sort.
    * A window/collect_list formulation would sort every user's full
    * event history; this never materializes more than one timestamp per
    * user per step.
    */
  def funnelUsers(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxStepGapUs: Long = Long.MaxValue): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"funnel steps must be distinct: $steps")
    require(maxStepGapUs > 0, s"maxStepGapUs must be positive, got $maxStepGapUs")
    val reserved = (1 to steps.size).map(i => s"ts_$i").toSet + "_t"
    require(!events.columns.exists(reserved), s"funnelUsers reserves ${reserved.mkString(", ")}")
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("ts_1"))
    val frames = scala.collection.mutable.ArrayBuffer(cur)
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      val k = i + 2
      val nxt = events.filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol).as("_t"))
      // conversion-window bound (GREEDY semantics, consistent with the
      // unbounded form: each step converts from the PREVIOUS step's
      // chosen — earliest — timestamp; a user who would only convert via
      // a later step occurrence does not count)
      val inWindow =
        if (maxStepGapUs == Long.MaxValue) lit(true)
        else unix_micros(col("_t")) -
          unix_micros(col(s"ts_${k - 1}")) <= maxStepGapUs
      // carried ts_j are functionally dependent on the user key; max()
      // re-exposes them through the groupBy without widening the key
      val carried = (1 until k).map(j => max(col(s"ts_$j")).as(s"ts_$j"))
      cur = nxt.join(cur, Seq(userCol))
        .filter(col("_t") > col(s"ts_${k - 1}") && inWindow)
        .groupBy(col(userCol))
        .agg(carried.head, (carried.tail :+ min(col("_t")).as(s"ts_$k")): _*)
      frames += cur
    }
    frames.toSeq
  }

  /** Per-step funnel summary: step index/name, users reaching it, and
    * the mean seconds from the user's step-1 timestamp (exact integer
    * microsecond sums — `sum(long)/count` — so the mean is
    * order-independent and engine-replayable; a double `avg` would sum
    * in arrival order).
    */
  def funnelSummary(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxStepGapUs: Long = Long.MaxValue): DataFrame = {
    val frames =
      funnelUsers(events, userCol, tsCol, typeCol, steps, maxStepGapUs)
    frames.zipWithIndex.map { case (f, i) =>
      val k = i + 1
      f.agg(
        count(lit(1)).as("n_users"),
        sum(unix_micros(col(s"ts_$k")) - unix_micros(col("ts_1"))).as("_us"))
        .select(
          lit(k).as("step_idx"), lit(steps(i)).as("step"), col("n_users"),
          round(col("_us").cast("double") / col("n_users") / 1e6, 4)
            .as("avg_secs_to_reach"))
    }.reduce(_ unionByName _)
  }

  /** Weekly cohort retention: cohort = Monday of the week of the user's
    * FIRST event; week_offset = full weeks elapsed since that first
    * event; one row per (cohort_week, week_offset) with distinct active
    * users and the retention ratio vs the cohort's week-0 size.
    *
    * Two keyed shuffles over the events at any scale: the first-seen
    * aggregation (user key) and the join back (same user key —
    * co-partitioned), then the distinct-count aggregation on the tiny
    * (cohort, offset) key. Week-0 sizes rejoin as a broadcast (one row
    * per cohort week).
    *
    * Contract: rows with a null user key or null timestamp drop out (the
    * keyed joins discard null keys) — normalize upstream if those rows
    * must count.
    */
  def weeklyRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstSeen = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("_first_day"))
    val activity = events
      .select(col(userCol), to_date(col(tsCol)).as("_day"))
      .join(firstSeen, Seq(userCol))
      .select(
        col(userCol),
        trunc(col("_first_day"), "week").as("cohort_week"),
        // floor(int/7) == integer division for the non-negative diffs here;
        // Spark's `/` on integers is DOUBLE division, hence the floor
        floor(datediff(col("_day"), col("_first_day")) / 7).as("week_offset"))
      .distinct()
    val counts = activity.groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
    val base = counts.filter(col("week_offset") === 0L)
      .select(col("cohort_week"), col("n_users").as("_cohort_size"))
    counts.join(broadcast(base), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        round(col("n_users").cast("double") / col("_cohort_size"), 6)
          .as("retention"))
  }

  /** Calendar gap-fill + forward-fill: one row per (series key, day)
    * over each key's [first, last] day span, with missing days filled —
    * counts as 0, the carried metric forward-filled from the last
    * observed day (the resample/ffill of time-series warehouses).
    *
    * The day spine generates per KEY via `sequence()` (map-side explode
    * bounded by that key's own span — never a global calendar cross
    * join); the observed frame joins back on (key, day) — co-partitioned
    * with the spine's key — and the forward-fill is a last(ignoreNulls)
    * window per key ordered by day, i.e. a per-key sort of DAYS (36,500
    * rows per key per century), not of events.
    */
  def gapFillDaily(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val observed = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("day_value"))
    val span = observed.groupBy(col(keyCol))
      .agg(min("day").as("_d0"), max("day").as("_d1"))
    val spine = span.select(col(keyCol),
      explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(observed, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("day_value"), ignoreNulls = true).over(w).as("ffill_value"))
  }

  /** Daily series with LINEAR interpolation across gaps — the numeric
    * upgrade of [[gapFillDaily]]'s forward-fill: missing days take the
    * value on the straight line between the nearest observed days on
    * each side; leading/trailing gaps clamp to the nearest observation
    * (no extrapolation). Shape: one keyed daily aggregate (map-side
    * combined), a per-key calendar spine (sequence + explode, bounded by
    * the key's own span), and two frame-bounded window passes (previous /
    * next non-null observation) — |keys|·|days| rows, one shuffle on the
    * key, nothing driver-side. Values aggregate in DECIMAL first so both
    * engines interpolate from bit-identical endpoints.
    *
    * @return (key, day, n, value): n = observed event count that day
    *         (0 for filled rows), value = observed or interpolated daily
    *         sum — raw double; round at the consumption site */
  def interpolateDaily(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val observed = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("v"))
    val spine = observed.groupBy(col(keyCol))
      .agg(min("day").as("_d0"), max("day").as("_d1"))
      .select(col(keyCol), explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wNext = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val obsDay = when(col("v").isNotNull, col("day"))
    spine.join(observed, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        coalesce(col("n"), lit(0L)).as("n"), col("v"),
        last(col("v"), ignoreNulls = true).over(wPrev).as("pv"),
        last(obsDay, ignoreNulls = true).over(wPrev).as("pd"),
        first(col("v"), ignoreNulls = true).over(wNext).as("nv"),
        first(obsDay, ignoreNulls = true).over(wNext).as("nd"))
      .select(col(keyCol), col("day"), col("n"),
        when(col("v").isNotNull, col("v"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (datediff(col("day"), col("pd")).cast("double") /
              datediff(col("nd"), col("pd")).cast("double")))
          .as("value"))
  }

  /** Rolling 7-day distinct active users per day (the DAU/WAU family):
    * the (user, day) distinct frame — ONE shuffle of the events, then
    * |users|·|days| rows at most — replicates each activity day onto the
    * ≤ 7 calendar days whose trailing window contains it (map-side
    * explode, bounded ×7), and a countDistinct per day finishes it. No
    * window over the event stream, no per-day self-join chain.
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val userDays = events
      .select(col(userCol), to_date(col(tsCol)).as("_aday"))
      .distinct()
    val bounds = events.agg(
      min(to_date(col(tsCol))).as("_first"),
      max(to_date(col(tsCol))).as("_last"))
    userDays.crossJoin(broadcast(bounds))
      .select(col(userCol),
        explode(sequence(col("_aday"),
          least(date_add(col("_aday"), windowDays - 1), col("_last"))))
          .as("day"))
      .groupBy("day")
      .agg(countDistinct(col(userCol)).as(s"active_${windowDays}d"))
  }

  /** Markov transition matrix between consecutive event types per user
    * (path analysis: "what do users do after X"). Adjacency is
    * inherently order-dependent, so the minimal shape is a lead() window
    * partitioned by the user key — each partition is ONE user's history
    * (bounded, sorts locally; this is the one event-analytics operator
    * where a per-user sort is irreducible). Everything after is a tiny
    * (from,to) aggregation; row probabilities come from exact counts
    * joined back as a broadcast.
    *
    * @param orderCols total order within a user (e.g. ts then event_id
    *                  to break timestamp ties deterministically) */
  def eventTransitions(events: DataFrame, userCol: String, typeCol: String,
      orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must define the event order")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(orderCols.map(col): _*)
    val tr = events
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = tr.groupBy("from_type").agg(sum("n").as("_t"))
    tr.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("_t"), 6).as("p"))
  }

  /** Per-(user, day) time-weighted average of `valueCol` — each
    * observation holds until the user's next event that day, the last
    * until midnight (the standard TWAP carry convention). Weights are
    * EXACT integer microseconds; the weighted sum goes through a
    * DECIMAL(38,12) cast per term so it adds order-independently and
    * the final double division replays bit-equal in an external engine
    * (the chi-square bridge discipline — a plain double sum would
    * depend on partitioning).
    *
    * Shape: one (user, day)-keyed window for the lead timestamp (the
    * only exchange — high-cardinality key, spreads at any scale), then
    * an ordinary partial+final agg. Null values/timestamps drop out. */
  def timeWeightedAvg(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, tieBreakCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("day"),
        col(tsCol).as("_ts"), col(tieBreakCol).as("_tb"),
        col(valueCol).cast("double").as("_v"))
    // same-ts ties pair each value with ITS dt by the total order —
    // without the tie-break the lead() pairing is nondeterministic
    val w = Window.partitionBy("user_id", "day").orderBy("_ts", "_tb")
    val dayEnd = unix_micros(
      date_add(col("day"), 1).cast("timestamp"))
    val dt = coalesce(unix_micros(lead(col("_ts"), 1).over(w)), dayEnd) -
      unix_micros(col("_ts"))
    base
      .withColumn("_dt", dt)
      .groupBy("user_id", "day")
      .agg(
        sum((col("_v") * col("_dt").cast("double")).cast("decimal(38,12)"))
          .as("_wsum"),
        sum(col("_dt")).as("sum_dt"))
      .select(col("user_id"), col("day"),
        round(col("_wsum").cast("double") / col("sum_dt").cast("double"), 6)
          .as("twap"),
        col("sum_dt"))
  }

  /** Top user-journey prefixes: each user's first `pathLen` events (by
    * `tsCol`, then `idCol` as the total-order tie-break) concatenated
    * into a path string "a>b>c", counted across users, top `topN` paths
    * by user count (ties by path ascending — deterministic).
    *
    * Null contract: a NULL event type renders as the literal sentinel
    * `(null)` in the path — WITHOUT it, array_join silently skips null
    * elements and "a>NULL>c" collapses to the indistinguishable "a>c".
    * SQL replay: `string_agg(coalesce(type, '(null)'), '>')`.
    *
    * Scale shape: the per-user "first k" is ONE bounded-heap
    * [[graft.functions.MinKByAgg.minKRowsAgg]] — ≤ pathLen rows per user
    * per mapper cross the user exchange, never a per-user window sort of
    * the whole event stream (the row_number formulation shuffles and
    * sorts EVERY event). Path counting is an ordinary partial+final agg
    * on the path string, and the final top-N is TakeOrdered (heap at the
    * driver over per-partition heaps), not a global sort. */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String,
      pathLen: Int = 3, topN: Int = 20): DataFrame = {
    require(pathLen >= 1, s"pathLen must be >= 1, got $pathLen")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    events
      .groupBy(col(userCol).as("user_id"))
      .agg(graft.functions.MinKByAgg.minKRowsAgg(
        struct(col(tsCol).as("ts"), col(idCol).as("eid"),
          col(typeCol).as("t")), pathLen).as("_seq"))
      // minKRowsAgg emits ascending (ts, eid) — already journey order
      .select(array_join(transform(col("_seq"), e => e("t")), ">", "(null)")
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(topN)
  }

  /** Daily-volume anomaly detection per event type: day counts, then a
    * z-score against the type's own daily distribution. Mean/variance
    * come from EXACT integer sums (`sum(n)`, `sum(n*n)` over bigint) so
    * the statistics are order-independent — `stddev_samp`'s double
    * accumulation would differ in the low bits across engines and
    * partitionings. The post-agg frame is |types|·|days| rows; the
    * per-type stats join back as a broadcast.
    */
  def dailyVolumeAnomaly(events: DataFrame, typeCol: String, tsCol: String,
      zThreshold: Double): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).as("_days"),
      sum(col("n")).as("_s"),
      sum(col("n") * col("n")).as("_ss"))
    val mean = col("_s").cast("double") / col("_days")
    val variance = (col("_ss").cast("double") - col("_s").cast("double") * mean) /
      (col("_days") - 1)
    val z = (col("n").cast("double") - mean) / sqrt(variance)
    daily.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("day"), col("n"),
        round(z, 4).as("z"),
        (abs(z) >= zThreshold).as("is_anomaly"))
  }
}

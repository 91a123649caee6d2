package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (EXTENSION, SURVEY.md §2.K) — the
  * materialized-view / rollup-table discipline: keep a PARTIAL-aggregate
  * state table (algebraic accumulators per group), fold each arriving
  * delta into it with a state-sized merge, and derive the presentable
  * aggregates (averages) only at read time. The reference's pipelines
  * recompute summary tables from scratch per run
  * (`/root/reference/etl_manager/etl.py` re-runs the full job); at 100 TB
  * the whole point is to NEVER rescan history: each maintenance cycle
  * scans only the delta (O(|delta|)), and the merge shuffles only
  * group-cardinality-sized state rows — the classic self-maintainable
  * view result for distributive/algebraic aggregates (Gupta & Mumick,
  * "Maintenance of Materialized Views", IEEE DE Bulletin 1995).
  *
  * Exactness contract: counts are longs, sums run in DECIMAL(28,4)
  * (associative and commutative under ANY accumulation order — merge
  * order can never change a bit), min/max are idempotent lattice ops.
  * Consequently `merge(state(a), state(b)) == state(a ∪ b)` EXACTLY, not
  * approximately, which the spec and the DuckDB oracle both pin.
  *
  * State schema by convention: keys ++ `n_rows` ++ per measure m:
  * `sum_m` DECIMAL, `cnt_m` (non-null count), `min_m`, `max_m`. AVG is
  * deliberately NOT in the state — it is not self-maintainable; it
  * derives as sum/cnt in [[finish]].
  */
object IncrementalAgg {

  private def dec(c: String): Column = col(c).cast("decimal(28,4)")

  /** Collapse `df` to its partial-aggregate state: one row per key group,
    * algebraic accumulators only. One scan, map-side partial agg. */
  def state(df: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty, "state needs keys and measures")
    val aggs = count(lit(1)).as("n_rows") +: measures.flatMap { m =>
      Seq(
        // pin the accumulator type so state and merged-state schemas are
        // identical (sum() would otherwise widen to DECIMAL(38,4))
        sum(dec(m)).cast("decimal(28,4)").as(s"sum_$m"),
        count(col(m)).as(s"cnt_$m"),
        min(dec(m)).as(s"min_$m"),
        max(dec(m)).as(s"max_$m"))
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge state frames (any number, any split of the underlying data):
    * union + one keyed re-aggregation over state-sized inputs. Fully
    * associative/commutative — re-merging merged states is valid, so a
    * maintenance pipeline can fold daily states into monthly into yearly
    * without ever touching row-level data again. */
  def merge(keys: Seq[String], measures: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    val stateCols = (keys :+ "n_rows") ++
      measures.flatMap(m => Seq(s"sum_$m", s"cnt_$m", s"min_$m", s"max_$m"))
    val u = states.map(_.select(stateCols.map(col): _*)).reduce(_ unionByName _)
    // coalesce pins the counts back to NOT NULL (sum() is nullable in
    // the abstract; a group only exists here because some state row has
    // it) so state and merged-state schemas are bit-identical
    val aggs = coalesce(sum(col("n_rows")), lit(0L)).as("n_rows") +:
      measures.flatMap { m =>
      Seq(
        // re-sum at the STATE's own type (already decimal) — exact
        sum(col(s"sum_$m")).cast("decimal(28,4)").as(s"sum_$m"),
        coalesce(sum(col(s"cnt_$m")), lit(0L)).as(s"cnt_$m"),
        min(col(s"min_$m")).as(s"min_$m"),
        max(col(s"max_$m")).as(s"max_$m"))
    }
    u.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** CDC-aware maintenance — the HARD half of view maintenance: deletes
    * and updates, not just appends. Counts and sums are groups under
    * retraction (subtract exactly, in the same DECIMAL), so they
    * maintain from the changeset alone; min/max are NOT retractable —
    * deleting the boundary value gives the state no way to know the
    * runner-up. The standard production answer (and ours): detect the
    * groups whose deleted values TOUCH the current boundary and
    * recompute min/max for exactly those groups from the post-change
    * snapshot — a semi-join-pruned scan proportional to the dirty
    * groups' data, not the table. Updates are modeled as delete(old) +
    * insert(new), the CDC-native decomposition.
    *
    * Exactness: merge arithmetic is all longs and decimals, the dirty
    * test is conservative (any delete at or beyond the candidate
    * boundary triggers recompute — duplicates of the boundary value are
    * handled by construction), and groups whose row count reaches zero
    * drop out. `applyCdc(state(S), ins, del, S') == state(S')` exactly,
    * which the spec pins with a planted boundary deletion that would
    * falsify any skipped recompute.
    *
    * @param snapshot the POST-change table (the maintenance job always
    *        has it — it is what the view describes); read only for the
    *        dirty groups via a semi-join */
  def applyCdc(state: DataFrame, keys: Seq[String], measures: Seq[String],
      inserts: DataFrame, deletes: DataFrame, snapshot: DataFrame): DataFrame = {
    // a NULL group key is a legitimate group (groupBy keeps it — the
    // live case: a LEFT-join view's null-extended rows under a B-side
    // agg key), so every state-frame join below must be NULL-SAFE. The
    // r11 form joined on per-key <=> conditions; Spark plans those as
    // equi-joins on coalesce(k, default)/isnull(k) key pairs, which no
    // child partitioning satisfies — every join side paid its own
    // exchange (+ sort), state-sized shuffles on every maintenance
    // trigger (measured: 4 extra Exchanges per fold in the
    // q_cdc_incremental_agg plan). Instead, key EVERYTHING on ONE
    // struct-of-keys column: struct equality is field-wise null-safe
    // (the q_cdc_snowflake row-key discipline), it is a plain equi-join
    // key, and aggregating the delta states BY the struct makes their
    // output partitioning satisfy the merge joins directly — the two
    // full-outers and the recompute left join add no exchange beyond
    // the three aggregates' own.
    // reject __gk in EVERY input frame, not just keys++measures: the
    // snapshot's withColumn("__gk", ...) below would silently overwrite a
    // caller's pre-existing __gk column (and the delta aggregates would
    // shadow one), masking a caller bug instead of rejecting it loudly —
    // the IncrementalJoin __tag/__bytes guard discipline (r12 ADVICE)
    val reserved = Set("__gk")
    require(!(keys ++ measures).exists(reserved.contains),
      "applyCdc: column name __gk is reserved by the merge bookkeeping")
    Seq("state" -> state, "inserts" -> inserts, "deletes" -> deletes,
        "snapshot" -> snapshot).foreach { case (which, df) =>
      require(!df.columns.exists(reserved.contains),
        s"applyCdc: the $which frame carries a column named __gk, which " +
          "is reserved by the merge bookkeeping and would be shadowed")
    }
    val gk = struct(keys.map(col): _*).as("__gk")
    def stateByGk(df: DataFrame): DataFrame = {
      val aggs = count(lit(1)).as("n_rows") +: measures.flatMap { m =>
        Seq(
          sum(dec(m)).cast("decimal(28,4)").as(s"sum_$m"),
          count(col(m)).as(s"cnt_$m"),
          min(dec(m)).as(s"min_$m"),
          max(dec(m)).as(s"max_$m"))
      }
      df.groupBy(gk).agg(aggs.head, aggs.tail: _*)
    }
    val insState = stateByGk(inserts)
    val delState = stateByGk(deletes)
    def sfxAll(df: DataFrame, suffix: String) =
      df.columns.foldLeft(df)((d, c) =>
        if (c == "__gk") d else d.withColumnRenamed(c, c + suffix))
    val stateCols = "n_rows" +: measures.flatMap(m =>
      Seq(s"sum_$m", s"cnt_$m", s"min_$m", s"max_$m"))
    val joined = state.select(gk +: stateCols.map(col): _*)
      .join(sfxAll(insState, "_i"), Seq("__gk"), "full_outer")
      .join(sfxAll(delState, "_d"), Seq("__gk"), "full_outer")
    val zeroDec = lit(java.math.BigDecimal.ZERO).cast("decimal(28,4)")
    val nRows = coalesce(col("n_rows"), lit(0L)) +
      coalesce(col("n_rows_i"), lit(0L)) - coalesce(col("n_rows_d"), lit(0L))
    // null-safe least/greatest over (state, inserts)
    def nsLeast(a: Column, b: Column) = coalesce(least(a, b), a, b)
    def nsGreatest(a: Column, b: Column) = coalesce(greatest(a, b), a, b)
    val withCand = joined
      .withColumn("n_rows__new", nRows)
      .filter(col("n_rows__new") > 0)
    val candCols = measures.foldLeft(withCand) { (d, m) =>
      d.withColumn(s"cnt_${m}__new",
          coalesce(col(s"cnt_$m"), lit(0L)) + coalesce(col(s"cnt_${m}_i"), lit(0L))
            - coalesce(col(s"cnt_${m}_d"), lit(0L)))
        // sum over ZERO values is NULL, not 0 (SQL semantics — and the
        // exactness contract: state(S') has a NULL sum for a group whose
        // measure is all-null, the live case in a LEFT-join view's
        // null-extended groups)
        .withColumn(s"sum_${m}__new",
          when(col(s"cnt_${m}__new") > 0,
            (coalesce(col(s"sum_$m"), zeroDec) + coalesce(col(s"sum_${m}_i"), zeroDec)
              - coalesce(col(s"sum_${m}_d"), zeroDec)).cast("decimal(28,4)")))
        .withColumn(s"min_${m}__cand", nsLeast(col(s"min_$m"), col(s"min_${m}_i")))
        .withColumn(s"max_${m}__cand", nsGreatest(col(s"max_$m"), col(s"max_${m}_i")))
        // dirty: a deleted value sits at or beyond the candidate boundary
        // (or the candidate itself is gone) — the runner-up is unknown
        .withColumn(s"__dirty_$m",
          col(s"cnt_${m}_d").isNotNull && (
            col(s"min_${m}__cand").isNull ||
            col(s"min_${m}_d") <= col(s"min_${m}__cand") ||
            col(s"max_${m}_d") >= col(s"max_${m}__cand")))
    }
    val dirty = candCols
      .filter(measures.map(m => col(s"__dirty_$m")).reduce(_ || _))
      .select(col("__gk"))
    // recompute min/max ONLY for dirty groups, from the new snapshot —
    // the struct semi key is field-wise null-safe, so a dirty NULL-key
    // group's rows are reachable
    val snapDirty = snapshot.withColumn("__gk", struct(keys.map(col): _*))
      .join(dirty, Seq("__gk"), "left_semi")
    val recomputed = sfxAll(stateByGk(snapDirty.drop("__gk")), "_r")
    val finalCols = keys.map(k => col("__gk").getField(k).as(k)) ++
      Seq(col("n_rows__new").as("n_rows")) ++
      measures.flatMap { m =>
        Seq(
          col(s"sum_${m}__new").as(s"sum_$m"),
          col(s"cnt_${m}__new").as(s"cnt_$m"),
          when(col(s"__dirty_$m"), col(s"min_${m}_r"))
            .otherwise(col(s"min_${m}__cand")).as(s"min_$m"),
          when(col(s"__dirty_$m"), col(s"max_${m}_r"))
            .otherwise(col(s"max_${m}__cand")).as(s"max_$m"))
      }
    candCols.join(recomputed, Seq("__gk"), "left").select(finalCols: _*)
  }

  /** Read-time projection: exact decimal accumulators to stable DOUBLEs
    * plus the derived averages (sum/cnt — NOT maintained in state). */
  def finish(state: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    val cols = keys.map(col) ++ Seq(col("n_rows")) ++ measures.flatMap { m =>
      Seq(
        col(s"sum_$m").cast("double").as(s"sum_$m"),
        // avg of zero values is NULL, not a division error: a LEFT-join
        // view's null-extended groups legitimately carry cnt = 0 for the
        // B-side measures (ANSI mode raises on 0-divide otherwise)
        when(col(s"cnt_$m") > 0,
          round(col(s"sum_$m").cast("double") / col(s"cnt_$m"), 6))
          .as(s"avg_$m"),
        col(s"min_$m").cast("double").as(s"min_$m"),
        col(s"max_$m").cast("double").as(s"max_$m"))
    }
    state.select(cols: _*)
  }
}

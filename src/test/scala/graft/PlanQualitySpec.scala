package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Plan-shape assertions: the properties that make these operators hold at
  * 1000-executor scale — filters reach the parquet scan, projections prune
  * the read schema, small dims broadcast instead of shuffling, and custom
  * expressions stay inside whole-stage codegen. */
class PlanQualitySpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString

  test("q_filter pushes predicates into the parquet scan") {
    val p = plan("q_filter")
    assert(p.contains("PushedFilters:"), "no pushed filters section")
    assert(p.contains("GreaterThanOrEqual(l_quantity,10.0)")
      || p.contains("l_quantity"), s"quantity filter not pushed:\n$p")
    // only the 3 projected columns are read
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_extendedprice"), "column pruning failed: extra column read")
  }

  test("q_project reads only the projected columns") {
    val p = plan("q_project")
    assert(p.contains("o_orderkey") && p.contains("o_totalprice"))
    assert(!p.contains("o_orderdate"), "pruning failed: o_orderdate read")
  }

  test("q_join_multi broadcasts the dimension tables — no shuffle join") {
    val p = plan("q_join_multi")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), "dims fell back to SMJ")
  }

  test("q_join_inner picks broadcast for the filtered small side at test scale") {
    val p = plan("q_join_inner")
    assert(p.contains("Join"), "no join in plan")
  }

  test("q_agg_group does partial aggregation before the shuffle") {
    val p = plan("q_agg_group")
    assert(p.contains("HashAggregate"), "no hash aggregate")
    // partial + final pair: two HashAggregate levels around the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial agg")
  }

  test("vector dot product runs inside whole-stage codegen") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val df = emb.select(
      graft.functions.VectorFunctions.vecDot(col("embedding"), col("embedding")).as("d"))
    // `*(n)` prefixes mark operators fused into a WholeStageCodegen stage
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project [vectordot"),
      s"vector dot not fused into codegen:\n$p")
  }

  test("q_topk window does not do a global sort before ranking") {
    val p = plan("q_topk")
    assert(p.contains("Window"), "no window operator")
  }

  test("events scan prunes to the columns the query needs") {
    val p = plan("q_fn_json")
    // q_fn_json needs event_id + props only; ts/user_id/value must be pruned
    assert(!p.contains("user_id"), s"events pruning failed:\n$p")
  }

  test("q_agg_approx_distinct_kmv sketches partially before the shuffle") {
    val p = plan("q_agg_approx_distinct_kmv")
    // KmvDistinctAgg is a TypedImperativeAggregate: ObjectHashAggregate
    // partial+final around the exchange means only k-sized sketch buffers
    // cross the wire, never raw keys
    assert(p.contains("ObjectHashAggregate"), s"no object hash aggregate:\n$p")
    assert(p.toLowerCase.contains("partial"), s"no map-side partial sketch:\n$p")
    // orders has 9 columns; the scan must read only the group key + hashed key
    assert(!p.contains("o_totalprice") && !p.contains("o_orderdate"),
      s"orders scan not pruned to (o_orderstatus, o_custkey):\n$p")
  }

  test("q_scan_partition_prune prunes at the DIRECTORY level — status filter is a PartitionFilter") {
    val p = plan("q_scan_partition_prune")
    // the o_orderstatus predicate must prune partitions (directory listing),
    // not run as a data filter over every file
    assert("PartitionFilters: \\[[^\\]]*o_orderstatus".r.findFirstIn(p).isDefined,
      s"status filter did not reach PartitionFilters:\n$p")
    // and the residual price predicate still pushes into the parquet scan
    assert(p.contains("PushedFilters:") && p.contains("o_totalprice"),
      s"price filter not pushed down:\n$p")
  }

  test("q_sample_exact_n takes the n smallest hashes via heap — no global sort of the corpus") {
    val p = plan("q_sample_exact_n")
    assert(p.contains("TakeOrderedAndProject"),
      s"exact-n sample regressed to a global sort + limit:\n$p")
    // the text column must never be read for a (doc_id, lang, source) sample
    assert(!p.contains("ReadSchema") || !p.contains("text"),
      s"documents scan not pruned:\n$p")
  }

  test("q_agg_approx_percentile_hist aggregates the histogram partially before the shuffle") {
    val p = plan("q_agg_approx_percentile_hist")
    assert(p.contains("HashAggregate"), s"no hash aggregate:\n$p")
    assert(p.toLowerCase.contains("partial"),
      s"histogram counters must combine map-side:\n$p")
  }

  test("q_join_range_capped caps via heap aggregate — candidate pairs never shuffle through a window") {
    val p = plan("q_join_range_capped")
    assert(!p.contains("Window"),
      s"capped range join regressed to a row_number window over all candidate pairs:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"no bounded-heap aggregate:\n$p")
    assert(p.toLowerCase.contains("partial"),
      s"no map-side partial cap — every candidate pair crosses the exchange:\n$p")
  }

  test("q_join_interval_capped caps via heap aggregate — no window over the ~sf² pair set (r8)") {
    val p = plan("q_join_interval_capped")
    assert(!p.contains("Window"),
      s"capped interval join regressed to a row_number window over all overlap pairs:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"no bounded-heap aggregate:\n$p")
    assert(p.toLowerCase.contains("partial"),
      s"no map-side partial cap — every overlap pair crosses the exchange:\n$p")
  }

  test("q_sample_cap_source caps via heap aggregate — no window, text column pruned") {
    val p = plan("q_sample_cap_source")
    assert(!p.contains("Window"), s"window row_number snuck into the cap plan:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"no heap aggregate:\n$p")
    assert(p.toLowerCase.contains("partial"), s"no map-side partial agg:\n$p")
    // the documents scan must not read the (large) text column for a cap
    // that only needs (source, doc_id)
    assert(!p.contains("text"), s"documents scan not pruned to (source, doc_id):\n$p")
  }

  test("q_corpus_mix_apply broadcast-joins the weights — corpus never shuffles for the join") {
    val p = plan("q_corpus_mix_apply")
    assert(p.contains("BroadcastHashJoin"), s"weights not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for the |groups|-row join:\n$p")
  }

  test("q_topk_grouped aggregates partially with no window or global sort of the input") {
    val p = plan("q_topk_grouped")
    assert(!p.contains("Window"), s"window snuck into the TopKAgg plan:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"no typed aggregate:\n$p")
    assert(p.toLowerCase.contains("partial"), s"no map-side partial agg:\n$p")
  }

  test("q_embed_quantize is a pure projection over a pruned scan") {
    val p = plan("q_embed_quantize")
    // only the final ORDER BY may exchange — any hash-partitioned shuffle
    // means the projection regressed into a wide operation
    assert(!p.contains("hashpartitioning"),
      s"quantize introduced a non-sort shuffle:\n$p")
    assert(!p.contains("label"), "embeddings pruning failed: label column read")
  }

  test("q_text_repetition partial-aggregates the bigram counts") {
    val p = plan("q_text_repetition")
    assert("HashAggregate|ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"no partial+final aggregation:\n$p")
  }

  test("q_decontaminate broadcasts the eval shingles — corpus side never shuffles pre-agg") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"eval side not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"contamination join fell back to SMJ:\n$p")
  }

  test("q_sample_stratified is a map-side filter with no join or shuffle") {
    val p = plan("q_sample_stratified")
    assert(!p.contains("Join"), s"rate map regressed into a join:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"stratified sampling introduced a non-sort shuffle:\n$p")
  }

  test("q_corpus_mix partial-aggregates and reads only lang+text") {
    val p = plan("q_corpus_mix")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    assert(!p.contains("doc_id"), "documents pruning failed: doc_id read")
  }

  test("q_dedup_spans is pair-join-free: keyed joins only, no cartesian") {
    val p = plan("q_dedup_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"span dedup degenerated to a product:\n$p")
    // linear pipeline: the shared-span lookup is a semi join on the hash
    assert(p.contains("LeftSemi"), s"expected a semi join on sh:\n$p")
    // the (sh, doc) distinct aggregates map-side before its shuffle
    // (partial + final = two HashAggregates keyed on exactly (sh, doc_id))
    assert("HashAggregate\\(keys=\\[sh#\\d+L, doc_id#\\d+L\\]".r
      .findAllIn(p).size >= 2, s"span distinct lost its partial agg:\n$p")
    // and the df count combines partially too
    assert(p.contains("partial_count"), s"df count lost its partial agg:\n$p")
  }

  test("q_dedup_spans_strip anti-joins covered positions — no product, no resort") {
    val p = plan("q_dedup_spans_strip")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"strip degenerated to a product:\n$p")
    assert(p.contains("LeftAnti"), s"expected an anti join on (doc_id, tpos):\n$p")
  }

  test("q_join_range is an equi-join on the time bin — never a nested loop") {
    val p = plan("q_join_range")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"range join degenerated to a product:\n$p")
    // a keyed join whose key IS the bin column — any join without _lbin
    // in the plan means the binning regressed away
    assert(p.contains("Join"), s"no join in plan:\n$p")
    assert(p.contains("_lbin"), s"bin key missing from the join:\n$p")
  }

  test("q_join_skew joins on (key, salt) with no nested loop") {
    val p = plan("q_join_skew")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"salted join degenerated:\n$p")
    assert(p.contains("_salt"), s"salt column missing from the join:\n$p")
  }

  test("q_dedup_url groups in one shuffle over a pruned scan") {
    val p = plan("q_dedup_url")
    // canonicalization is pure projection: exactly one hash shuffle (the
    // groupBy), with map-side partial aggregation
    assert("hashpartitioning".r.findAllIn(p).size <= 1,
      s"url dedup shuffled more than the groupBy:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    assert(!p.contains("text#") || !p.contains("lang"),
      s"documents pruning failed:\n$p")
  }

  test("q_decontaminate_bloom prefilters map-side in codegen before the confirm join") {
    val p = plan("q_decontaminate_bloom")
    // the bloom might-contain expression must be present (the doc_id %
    // filters alone would satisfy a bare "Filter" check) ...
    assert(p.contains("bloommightcontain"),
      s"bloom might-contain filter missing:\n$p")
    // ... as a NATIVE expression, not an interpreted scala udf escape
    // hatch out of whole-stage codegen
    assert(!p.contains("UDF"), s"bloom probe regressed to a scala udf:\n$p")
    // ... and must sit UNDER the confirm join: plans print top-down, so
    // the join operator's line must come before the probe filter's line
    val joinAt = "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r
      .findFirstMatchIn(p).map(_.start).getOrElse(-1)
    assert(joinAt >= 0, s"no keyed confirm join:\n$p")
    assert(p.indexOf("bloommightcontain") > joinAt,
      s"bloom prefilter not under the confirm join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"confirm join degenerated:\n$p")
  }

  test("q_sim_topk_batch: broadcast probes, heap aggregate, no window or global sort of scored rows") {
    val p = plan("q_sim_topk_batch")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"probe set is not broadcast:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"heap top-k aggregate missing:\n$p")
    assert(!p.contains("Window"), s"batch top-k regressed to a window sort:\n$p")
    // the only Sort allowed is the final tiny ORDER BY over ≤40 result
    // rows — it must sit ABOVE the aggregate, not under it
    val aggAt = p.indexOf("ObjectHashAggregate")
    val lastSort = p.lastIndexOf("Sort ")
    assert(lastSort < 0 || lastSort < aggAt,
      s"scored stream is sorted below the aggregate:\n$p")
  }

  test("q_dedup_embed_incremental is a cell-keyed equi-join — no cartesian pair explosion") {
    val p = plan("q_dedup_embed_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"incremental embed dedup degenerated to an all-pairs product:\n$p")
    assert(p.contains("cell_id"), s"cell blocking missing from the join:\n$p")
  }

  test("q_sim_ivf_indexed probes prune at the FILE level (cell_id partition filter)") {
    val p = SparkEntry.queries("q_sim_ivf_indexed")(spark, sf())
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert("PartitionFilters: \\[[^\\]]*cell_id".r.findFirstIn(p).isDefined,
      s"cell_id predicate did not reach partition pruning on the registered path:\n$p")
  }

  test("q_sim_lsh_indexed probes prune at the FILE level (table+bucket partition filter)") {
    val p = SparkEntry.queries("q_sim_lsh_indexed")(spark, sf())
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(p).isDefined,
      s"bucket predicate did not reach partition pruning on the registered path:\n$p")
  }

  test("q_text_entropy is one StaticInvoke projection — no explode, no join") {
    val p = plan("q_text_entropy")
    assert(!p.contains("Generate") && !p.contains("Join"),
      s"entropy regressed into explode/join:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"entropy introduced a non-sort shuffle:\n$p")
  }

  test("q_embed_pq assigns codes map-side — no join, no non-sort shuffle") {
    val p = plan("q_embed_pq")
    // codes come from broadcast-sized codebook LITERALS: any join means
    // the codebook regressed into a table, any hash shuffle means the
    // assignment stopped being a projection
    assert(!p.contains("Join"), s"PQ assignment regressed into a join:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"PQ assignment introduced a non-sort shuffle:\n$p")
    assert(!p.contains("label"), "embeddings pruning failed: label column read")
    // the assignment must be the ONE fused expression — the composed
    // numSub×K tree (array_min/array_position over 128 inlined dots)
    // blows Janino's method limit and silently goes interpreted
    assert(p.contains("pqassign"), s"fused PqAssign missing from plan:\n$p")
    assert(!p.contains("array_min"), s"composed PQ tree leaked into the plan:\n$p")
  }

  test("PqAssign projection runs inside whole-stage codegen") {
    // the query plan hides codegen markers behind a non-final
    // AdaptiveSparkPlan, so assert fusion on the bare projection (the
    // vecDot convention): `*(n)` prefixes mark fused stages
    val emb = Tables.load(spark, sf(), "embeddings")
    val cb = graft.operators.Similarity.pqCodebooksFromRows(
      emb.orderBy("vec_id").limit(16).collect()
        .map(_.getSeq[Float](1).toArray).toSeq, 8)
    val df = graft.operators.Similarity.pqPackedCodes(emb, "vec_id", "embedding", cb)
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[[^\n]*pqassign""".r.findFirstIn(p).isDefined,
      s"PqAssign projection not fused into codegen:\n${p.take(4000)}")
  }

  test("q_sim_pq scores via TakeOrdered — no global sort, no window, no join") {
    val p = plan("q_sim_pq")
    assert(p.contains("TakeOrderedAndProject"),
      s"ADC top-k lost its TakeOrdered plan:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"ADC scoring regressed into a join/window:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"ADC scoring introduced a non-sort shuffle:\n$p")
    assert(p.contains("pqassign") && !p.contains("array_min"),
      s"ADC code derivation not the fused PqAssign:\n$p")
  }

  test("q_sim_pq_indexed probes ONLY the materialized code table") {
    val p = plan("q_sim_pq_indexed")
    // the 32×-compression claim made literal: the probe plan reads the
    // numSub-ints-per-row index, never the embedding vectors
    assert(!p.contains("embeddings.parquet"),
      s"indexed ADC probe still scans the embedding table:\n$p")
    assert(p.contains("graft_pq_idx"), s"code-table scan missing:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"indexed ADC lost its TakeOrdered plan:\n$p")
    assert(!p.contains("Join") && !p.contains("hashpartitioning"),
      s"indexed ADC probe regressed into a join/shuffle:\n$p")
  }

  test("q_text_strip_html is a pure projection — no shuffle beyond the final sort") {
    val p = plan("q_text_strip_html")
    assert(!p.contains("Join") && !p.contains("Generate"),
      s"html strip regressed into a join/explode:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"html strip introduced a non-sort shuffle:\n$p")
  }

  test("q_text_classify scores in one compiled call per row — no explode/groupBy round-trip") {
    val p = plan("q_text_classify")
    assert(!p.contains("Generate") && !p.contains("Join"),
      s"classifier inference regressed into explode/join:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"classifier inference introduced a non-sort shuffle:\n$p")
    assert(!p.contains("UDF"), s"classifier regressed to a scala udf:\n$p")
  }

  test("q_corpus_shard: map-side assignment, one partial-agg shuffle, no sort before agg") {
    val p = plan("q_corpus_shard")
    assert(!p.contains("Join"), s"shard assignment regressed into a join:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"shard audit lost its map-side partial agg:\n$p")
    assert(!p.contains("Window"), s"shard audit sorted through a window:\n$p")
  }

  test("q_sample_quality_bins: percentile reduce + broadcast bounds, no window/ntile") {
    val p = plan("q_sample_quality_bins")
    assert(!p.contains("Window"),
      s"quantile binning regressed to an ntile-style window sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"boundary frame is not broadcast:\n$p")
    // the percentile agg reduces to a single row: partial + final pair
    assert(p.contains("percentile"), s"exact percentile agg missing:\n$p")
  }

  test("q_dedup_keep_best: keyed aggs only — no per-cluster window sort") {
    val p = plan("q_dedup_keep_best")
    assert(!p.contains("Window"),
      s"survivor choice regressed to a window rank:\n$p")
    assert("HashAggregate|ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected the two-stage max/min-agg survivor choice:\n$p")
  }

  test("q_text_strip_boilerplate: bounded explodes, keyed aggs, no per-doc window sort") {
    val p = plan("q_text_strip_boilerplate")
    // the line explode appears once per consumer (hot-line build side +
    // flagging side) — never more
    assert("Generate".r.findAllIn(p).size <= 2,
      s"line explode duplicated beyond the two consumers:\n$p")
    assert(!p.contains("Window"),
      s"line reassembly regressed to a window sort:\n$p")
    assert("HashAggregate|ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected hot-line df agg + per-doc reassembly agg:\n$p")
  }

  test("q_dedup_url_latest: ONE keyed agg pass — no window, no join-back, canonicalize once") {
    val p = plan("q_dedup_url_latest")
    assert(!p.contains("Window"),
      s"latest-capture choice regressed to a window rank:\n$p")
    // the r6 single-pass shape: max/count/k=1-heap in one ObjectHashAggregate
    // (partial+final); the old form joined the canon frame back, running
    // the regex canonicalization twice over the corpus
    assert(p.contains("ObjectHashAggregate"), s"no heap aggregate:\n$p")
    assert(p.toLowerCase.contains("partial"), s"no map-side partial agg:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"survivor selection joined the corpus back:\n$p")
  }

  test("q_sim_hard_negatives: broadcast probes, map-side label filter, heap agg, no window") {
    val p = plan("q_sim_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"probe set is not broadcast:\n$p")
    assert(!p.contains("Window"), s"negative mining regressed to a window sort:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"bounded-heap TopKAgg missing:\n$p")
    assert(!p.contains("SortMergeJoin"), s"label filter became a shuffle join:\n$p")
  }

  test("q_corpus_report is one partial+final aggregate over the scan — no sort, no join") {
    val p = plan("q_corpus_report")
    assert(!p.contains("Join"), s"corpus report regressed into a join:\n$p")
    assert(!p.contains("Window"), s"corpus report sorted through a window:\n$p")
    assert("HashAggregate|ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"report lost partial aggregation:\n$p")
  }

  test("q_text_extract_links: one Generate off the scan, partial-agg link counts") {
    val p = plan("q_text_extract_links")
    assert("Generate".r.findAllIn(p).size == 1,
      s"expected exactly one explode of the href array:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"link counts lost map-side partial aggregation:\n$p")
    assert(!p.contains("Join"), s"outlink extraction regressed into a join:\n$p")
  }

  test("q_events_funnel: cascaded keyed aggregations, never a per-user Window or collect of history") {
    val p = plan("q_events_funnel")
    assert(!p.contains("Window"),
      s"funnel regressed to a window over the event stream:\n$p")
    assert(!p.contains("collect_list"),
      s"funnel regressed to collecting per-user event history:\n$p")
    assert(p.toLowerCase.contains("partial"),
      s"funnel min-aggregations lost map-side partials:\n$p")
  }

  test("q_sample_weighted takes the top keys via heap — no global sort, only id+weight read") {
    val p = plan("q_sample_weighted")
    assert(p.contains("TakeOrderedAndProject"),
      s"weighted sample regressed to a global sort + limit:\n$p")
    assert(!p.contains("text"),
      s"documents scan not pruned to (doc_id, n_chars):\n$p")
  }

  test("q_events_rolling_active replicates map-side — no window over the stream, no nested loop") {
    val p = plan("q_events_rolling_active")
    assert(!p.contains("Window"),
      s"rolling actives regressed to a window over the event stream:\n$p")
    assert(!p.contains("BroadcastNestedLoop") || p.contains("BuildRight, Cross"),
      s"unexpected nested loop (only the 1-row bounds cross join is allowed):\n$p")
    assert(p.contains("Generate"),
      s"expected the sequence() day replication explode:\n$p")
  }

  test("q_events_gapfill: per-key spine join stays an equi-join, ffill window partitions by key") {
    val p = plan("q_events_gapfill")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"gapfill's spine join must be keyed, not a product:\n$p")
    assert(p.contains("Generate"),
      s"expected the per-key sequence() spine explode:\n$p")
  }

  test("q_events_anomaly broadcasts the per-type stats back onto the daily frame") {
    val p = plan("q_events_anomaly")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"per-type stats joined without broadcast:\n$p")
    assert(!p.contains("Window"), s"anomaly z-scores took a window detour:\n$p")
  }

  test("q_cdc_diff is ONE keyed join — no window, no product, snapshots shuffle once") {
    val p = plan("q_cdc_diff")
    assert(!p.contains("Window"), s"snapshot diff must not window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"snapshot diff must be an equi-join:\n$p")
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size == 1,
      s"expected exactly one shuffled full-outer join:\n$p")
  }

  test("q_cdc_apply sheds changed keys via anti-join — no window, keyed joins only") {
    val p = plan("q_cdc_apply")
    assert(!p.contains("Window"), s"changeset apply must not window:\n$p")
    assert(!p.contains("CartesianProduct"), s"changeset apply must stay keyed:\n$p")
    assert(p.contains("LeftAnti"), s"expected the base-side anti-join:\n$p")
    assert(p.contains("Union"), s"expected the survivors union:\n$p")
  }

  test("q_cdc_scd2 runs both window passes over ONE user-keyed exchange") {
    val p = plan("q_cdc_scd2")
    // final presentation sort pays one range exchange; the two windows must
    // share the single hash exchange on user_id
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"scd2's two windows should reuse one user-keyed shuffle:\n$p")
  }

  test("q_events_sessionize: lag+running-sum share the user exchange, then one keyed agg") {
    val p = plan("q_events_sessionize")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"sessionize should shuffle at most twice (user window, session agg):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"sessionize must not join at all:\n$p")
  }

  test("q_profile_columns: hash-aggregated Expand + keyless string side agg") {
    val p = plan("q_profile_columns")
    assert(!p.contains("Window"),
      s"profiling must not window:\n$p")
    assert(p.contains("Expand"),
      s"exact multi-column distincts should plan as one Expand aggregate:\n$p")
    // the string min/max ride a KEYLESS side aggregate whose one row
    // broadcast-cross-joins back (r12): with them out of the Expand
    // pipeline every buffer there is a mutable primitive, so every KEYED
    // aggregate must be HashAggregate — a keyed SortAggregate means the
    // immutable-buffer regression is back, sorting the x|cols|-expanded
    // rows (measured 24.6 s of task time at sf0.1)
    assert(!"""SortAggregate\(key=\[[^\]]""".r.findFirstIn(p).isDefined,
      s"a KEYED SortAggregate sorts the Expand — keep string min/max in the side agg:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"the only join allowed is the 1-row broadcast cross of the side agg:\n$p")
  }

  test("q_join_interval is an equi-join on the bin id — never a nested loop") {
    val p = plan("q_join_interval")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval overlap must bin to an equi-join:\n$p")
    assert(p.contains("Generate"),
      s"expected the bin sequence() explode on both sides:\n$p")
    assert(!p.contains("Window"), s"no window belongs in an interval join:\n$p")
  }

  test("q_profile_skew: heavy hitters via global heap agg, totals broadcast — no window") {
    val p = plan("q_profile_skew")
    assert(!p.contains("Window"),
      s"skew top-k must be the bounded-heap aggregate, not row_number:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the one-row totals frame should broadcast:\n$p")
    assert(!p.contains("l_quantity") && !p.contains("l_extendedprice"),
      s"lineitem scan not pruned to the key column:\n$p")
  }

  test("q_layout_zorder: bit interleave + one keyed agg — no join, no window") {
    val p = plan("q_layout_zorder")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"zorder stats must be projection + aggregate:\n$p")
    assert(p.contains("partial"), s"bucket counts should partial-aggregate:\n$p")
    assert(!p.contains("l_quantity"),
      s"lineitem scan not pruned to (partkey, suppkey):\n$p")
  }

  test("q_compact_plan windows over the INVENTORY (post-agg), never the table") {
    val p = plan("q_compact_plan")
    // the Window's child must be the month aggregate, so the running sum
    // sees |months| rows, not |lineitem|
    val wIdx = p.indexOf("Window")
    assert(wIdx >= 0, s"expected the running-total window:\n$p")
    assert(p.indexOf("HashAggregate", wIdx) >= 0,
      s"window must consume the aggregated inventory:\n$p")
    assert(!p.contains("Join"), s"no join belongs in the plan:\n$p")
  }

  test("q_join_fuzzy: deletion-variant blocking — equi-joins only, never quadratic") {
    val p = plan("q_join_fuzzy")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must never go quadratic:\n$p")
    // the variant explode is map-side; pairing is an equi-join on the
    // xxhash64'd variant (any join flavor), then keyed re-attach joins
    assert(p.contains("Join"), s"expected the variant equi-join:\n$p")
    assert(p.contains("xxhash64"), s"variants should shuffle as 8-byte hashes:\n$p")
  }

  test("q_join_sorted_neighborhood: no window, no cartesian — rank equi-join only") {
    val p = plan("q_join_sorted_neighborhood")
    assert(!p.contains("Window"),
      s"SNM rank must be the two-phase prefix sum, not a global window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"SNM pairing must stay an equi-join on rank:\n$p")
  }

  test("q_join_bucketed: SMJ over bucketed scans with NO exchange on the join keys") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the bucketed co-location is what avoids the
      // shuffle (at fixture scale the small side would otherwise broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val p = plan("q_join_bucketed")
      assert(p.contains("SortMergeJoin"), s"expected sort-merge over buckets:\n$p")
      assert(p.contains("SelectedBucketsCount"),
        s"scans are not bucket-aware:\n$p")
      assert(!p.contains("hashpartitioning(o_custkey")
        && !p.contains("hashpartitioning(c_custkey#"),
        s"join keys re-shuffled — bucketing not exploited:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_tpch21_bucketed: both self-joins and the orders join exchange-free over buckets") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // keep supplier/nation broadcasts (they carry explicit hints) but
      // stop the planner broadcasting the order-key joins at fixture
      // scale — the bucketed co-location must be what kills the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val p = plan("q_tpch21_bucketed")
      assert(p.contains("SortMergeJoin"), s"expected sort-merge over buckets:\n$p")
      assert(p.contains("SelectedBucketsCount"), s"scans are not bucket-aware:\n$p")
      assert(!p.contains("hashpartitioning(l_orderkey")
        && !p.contains("hashpartitioning(o_orderkey"),
        s"order-key join re-shuffled — bucketing not exploited:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_sketch_cms: grid-sized partial agg, counters broadcast onto probes") {
    val p = plan("q_sketch_cms")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"counter grid should aggregate partially before its (tiny) shuffle:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the estimate lookup should broadcast the counter grid:\n$p")
    assert(!p.contains("Window"), s"no window belongs in a sketch:\n$p")
  }

  test("q_events_paths: bounded-heap first-k per user, TakeOrdered top-N — no window") {
    val p = plan("q_events_paths")
    assert(!p.contains("Window"),
      s"first-k per user must be the min-k-rows heap, not a window:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"expected the MinKByAgg object-hash aggregate:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-N should be TakeOrdered, not a global sort:\n$p")
  }

  test("q_agg_mode: two keyed aggs, never a per-group window sort") {
    val p = plan("q_agg_mode")
    assert(!p.contains("Window"), s"mode must not window:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregation:\n$p")
  }

  test("q_profile_joinstats: only key HISTOGRAMS join — no row-level join") {
    val p = plan("q_profile_joinstats")
    // both scans must aggregate (to their key histogram) BEFORE the one
    // full-outer join; a row-level join would put the join under 2 aggs
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"),
      s"expected the histogram full-outer join:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"each side should collapse to its histogram pre-join:\n$p")
  }

  test("q_sample_weighted_grouped: one heap aggregate per stratum — no window") {
    val p = plan("q_sample_weighted_grouped")
    assert(!p.contains("Window"),
      s"per-group sampling must be the TopKAgg heap, not a window:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"no heap aggregate:\n$p")
    assert(p.toLowerCase.contains("partial"), s"no map-side partial heaps:\n$p")
  }

  test("q_graph_triangles: keyed equi-joins only — never a cartesian wedge product") {
    val p = plan("q_graph_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"triangle counting must stay on equi-joins:\n$p")
  }

  test("q_join_nullsafe: null-safe equality plans as a hash/merge equi-join") {
    val p = plan("q_join_nullsafe")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"<=> must be a join KEY, not a post-product filter:\n$p")
  }

  test("q_text_tfidf_pairs: inverted self-join on terms — no cartesian, df prefilter aggregates") {
    val p = plan("q_text_tfidf_pairs")
    assert(!p.contains("CartesianProduct"),
      s"sparse cosine must pair via the term index:\n$p")
    // r7: N rides as a lazily-built one-row broadcast INSIDE the
    // persisted shared weight stage (replacing the former eager
    // docs.count()), so the join tree OUTSIDE the cached stage must be
    // pure equi-joins — tree-walk the executed plan (string counting
    // would see the one cached BNLJ re-printed per InMemoryTableScan)
    val exec = SparkEntry.queries("q_text_tfidf_pairs")(spark, sf())
      .queryExecution.executedPlan
    val outerBnlj = exec.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(outerBnlj.isEmpty,
      s"pair/norm joins must be equi-joins; nested loops belong only in the cached N stage:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"the shared weight stage must be persisted (4 consumers):\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"tf/df aggregates should combine partially:\n$p")
  }

  test("q_profile_outliers: windows are GROUP-keyed — no single-partition sort of the table") {
    val p = plan("q_profile_outliers")
    assert(p.contains("Window"), s"expected the per-group rank window:\n$p")
    assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id")
      || p.indexOf("Window") < p.indexOf("Exchange SinglePartition"),
      s"rank window collapsed to one partition:\n$p")
  }

  test("q_text_bm25_indexed probes prune at the FILE level (term-bucket partition filter)") {
    val p = SparkEntry.queries("q_text_bm25_indexed")(spark, sf())
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(p).isDefined,
      s"probed term buckets did not reach partition pruning:\n$p")
  }

  test("q_multimodal_frames: map-side slicing — no join, no pre-sort shuffle") {
    val p = plan("q_multimodal_frames")
    assert(!p.contains("Join"), s"frame sampling must not join:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"frame explosion introduced a non-sort shuffle:\n$p")
  }

  test("q_text_bm25: heap top-k (no window), probe terms broadcast onto tf") {
    val p = plan("q_text_bm25")
    assert(!p.contains("Window"),
      s"bm25 top-k must be the bounded-heap aggregate:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"probe-term join should broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject") || p.contains("ObjectHashAggregate"),
      s"expected the TopKAgg object-hash aggregate:\n$p")
  }

  test("q_tpch21 decorrelates to semi + anti equi-joins on the order key — " +
      "no nested loop over the lineitem self-join (r8)") {
    val p = plan("q_tpch21")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$p")
    // the inequality (suppkey <>, shipdate >) must ride the equi-join's
    // condition, never force a nested-loop pair scan
    assert(!p.contains("CartesianProduct"), s"pair scan leaked:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"self-join fell back to nested loop:\n$p")
  }

  test("q_tpch4's correlated EXISTS is a semi join with the lateness " +
      "predicate in the condition — orders scan prunes to 3 columns (r8)") {
    val p = plan("q_tpch4")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"decorrelation failed:\n$p")
    assert(!p.contains("o_totalprice"), "orders column pruning failed")
  }

  test("q_tpch22: one-row avg broadcasts as the scalar threshold; recent " +
      "orders anti-join on the customer key (r8)") {
    val p = plan("q_tpch22")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"the one-row avg should broadcast, not shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), s"scalar join degenerated:\n$p")
  }

  test("q_tpch2: the correlated scalar MIN decorrelates to a per-part " +
      "aggregate joined back on price equality — no window, no pair scan (r8)") {
    val p = plan("q_tpch2")
    assert(!p.contains("Window"),
      s"per-part min must be an aggregate, not a window:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"decorrelation failed:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the dim joins (supplier/nation/region/part) should broadcast:\n$p")
  }

  test("q_tpch16: NOT IN over non-null supplier keys plans as a broadcast " +
      "anti join; distinct suppliers via two-phase aggregate, no window (r8)") {
    val p = plan("q_tpch16")
    assert(p.contains("LeftAnti"), s"NOT IN must plan as an anti join:\n$p")
    assert(!p.contains("Window"), s"count-distinct must not window:\n$p")
    assert(!p.contains("CartesianProduct"), s"pair scan leaked:\n$p")
  }

  test("q_tpch17: the correlated avg threshold joins the per-part " +
      "aggregate — exact decimal compare, no division, no window (r8)") {
    val p = plan("q_tpch17")
    assert(!p.contains("Window"), s"threshold must come from an agg join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"decorrelation failed:\n$p")
  }

  test("q_tpch20: the nested-IN chain is semi joins end to end — the pair " +
      "aggregate feeds probe and mean without a cartesian (r8)") {
    val p = plan("q_tpch20")
    assert(p.contains("LeftSemi"), s"IN chains must plan as semi joins:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"decorrelation failed:\n$p")
    assert(!p.contains("Window"), s"threshold must come from an agg join:\n$p")
  }

  test("q_search_hybrid_rrf: both rankers heap-aggregate; the dense probe " +
      "broadcasts; no window over anything corpus-sized (r8)") {
    val p = plan("q_search_hybrid_rrf")
    assert(p.contains("ObjectHashAggregate"),
      s"expected the TopKAgg bounded heap on the dense side:\n$p")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"probe vector / probe term should broadcast:\n$p")
    // the only Window is none at all: ranks come from heap positions
    assert(!p.contains("Window"),
      s"corpus-sized window leaked into the fusion plan:\n$p")
  }

  test("q_fn_percentile_rank: the whole point — NO window anywhere in the plan (r8)") {
    // ORDER BY on the output is a Sort, fine; a WindowExec would mean the
    // operator regressed to the single-task global cume_dist it replaces
    val p = plan("q_fn_percentile_rank")
    assert(!p.contains("Window"),
      s"window-free cume_dist regressed to a global window:\n$p")
  }

  test("q_graph_jaccard: hub cap join + wedge count partial-aggregate; no cartesian (r8)") {
    val p = plan("q_graph_jaccard")
    assert(!p.contains("CartesianProduct"),
      s"wedge join must stay an equi-join on the shared neighbor:\n$p")
    assert(p.toLowerCase.contains("partial"),
      s"wedge counts must combine map-side before the exchange:\n$p")
  }

  test("q_search_prf: seeds/expansions ride broadcasts; top-k cuts are heaps; " +
      "the one window is candidate-sized (r8)") {
    val p = plan("q_search_prf")
    assert(p.contains("BroadcastHashJoin"),
      s"seed/expansion term frames must broadcast onto tf:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"expected TopKAgg bounded heaps for the feedback and final cuts:\n$p")
  }

  test("q_sketch_kmv_setops: sketches partial-aggregate; pairing is sketch-sized (r8)") {
    val p = plan("q_sketch_kmv_setops")
    assert(p.contains("ObjectHashAggregate") && p.toLowerCase.contains("partial"),
      s"KmvSketchAgg must combine map-side before the exchange:\n$p")
  }

  test("q_agg_incremental_merge: both delta states partial-aggregate; " +
      "merge is a keyed re-agg, no window (r8)") {
    val p = plan("q_agg_incremental_merge")
    assert(!p.contains("Window"), s"state merge must stay aggregate-shaped:\n$p")
    assert(p.toLowerCase.contains("partial"),
      s"delta states must combine map-side:\n$p")
  }

  test("q_events_interpolate windows are PARTITIONED by the series key (r8)") {
    val p = plan("q_events_interpolate")
    // a global (unpartitioned) window prints an empty partition spec;
    // the series windows must carry the key
    assert(p.contains("Window"), s"expected the prev/next observation windows:\n$p")
    assert(p.contains("windowspecdefinition(event_type"),
      s"interpolation window lost its partition key:\n$p")
  }

}

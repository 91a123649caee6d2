package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Association-rule mining over baskets (EXTENSION, SURVEY.md §2.K) —
  * the Apriori support/confidence/lift surface for pairs, the form that
  * actually runs at warehouse scale (longer itemsets explode
  * combinatorially and pair rules carry most of the actionable signal).
  *
  * Scale shape: baskets are deduped to DISTINCT (basket, item) once;
  * the pair generator is a self-join keyed on the BASKET id, so each
  * basket contributes C(|basket|, 2) wedge rows — bounded by the basket
  * size contract (a retail order has a handful of line items), never by
  * the catalog or basket count. Pair counts, item counts and the basket
  * total are all map-side-combined keyed aggregates; the rule metrics
  * are pure integer-count arithmetic finished with two IEEE divisions,
  * so an external engine replays every rule exactly.
  */
object MarketBasket {

  /** Pair association rules with support ≥ `minSupport` baskets.
    *
    * @return (item_a, item_b, n_both, conf_a_to_b, lift) — one row per
    *         unordered pair (a < b); confidence is directional (P(b|a)),
    *         lift symmetric; both left unrounded for the caller */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val items = baskets
      .select(col(basketCol).as("b"), col(itemCol).as("i"))
      .where(col("b").isNotNull && col("i").isNotNull)
      .distinct()
    val nBaskets = items.agg(countDistinct(col("b")).as("n_baskets"))
    val itemCounts = items.groupBy("i").agg(count(lit(1)).as("ci"))
    // pin the basket self-join's parallelism (r12, guide §2.5/§1.2): the
    // (basket, item) rows are bytes-tiny but the join emits C(|basket|,2)
    // rows per basket, so AQE's byte-based coalescing starves the stage
    // at bench scale; REPARTITION_BY_NUM on the join key (reused by both
    // sides) holds the session's shuffle-partition count.
    val n = Parallelism.sessionShufflePartitions(baskets.sparkSession)
    val itemsN = items.repartition(n, col("b"))
    // shuffled-hash, not sort-merge: both sides already share the pinned
    // exchange, so SMJ's only extra is two per-task sorts of the full
    // (basket, item) set — the hash build side is the same tiny rows.
    // SHJ build-side contract (no spill): per-key rows = one basket's
    // distinct items (real baskets are bounded); per-task memory is the
    // partition's (basket, item) slice at ~24 B/row.
    val pairs = itemsN.select(col("b"), col("i").as("item_a"))
      .hint("shuffle_hash")
      .join(itemsN.select(col("b"), col("i").as("item_b")), Seq("b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
    pairs
      .join(itemCounts.select(col("i").as("item_a"), col("ci").as("ca")), Seq("item_a"))
      .join(itemCounts.select(col("i").as("item_b"), col("ci").as("cb")), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_both"),
        (col("n_both").cast("double") / col("ca")).as("conf_a_to_b"),
        (col("n_both").cast("double") * col("n_baskets") /
          (col("ca") * col("cb"))).as("lift"))
  }

  /** Item-item collaborative filtering over [[pairRules]]: each item's
    * top `topN` co-purchase recommendations by lift — the classic
    * "customers who bought X also bought" surface (Linden et al., IEEE
    * Internet Computing 2003: item-item scales where user-user cannot,
    * because the pair statistics are exactly the basket-bounded wedge
    * counts above). The per-item cut is a bounded heap, never a window
    * over the full rule set; ties break on lift desc, then partner asc.
    *
    * @return (item, rk, rec_item, n_both, lift) — lift unrounded */
  def itemRecommendations(baskets: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val rules = pairRules(baskets, basketCol, itemCol, minSupport)
    // symmetrize: a recommendation list exists for BOTH pair members
    val directed = rules.select(col("item_a").as("item"),
        col("item_b").as("rec_item"), col("n_both"), col("lift"))
      .unionByName(rules.select(col("item_b").as("item"),
        col("item_a").as("rec_item"), col("n_both"), col("lift")))
    directed
      .groupBy("item")
      .agg(graft.functions.MinKByAgg.minKRowsAgg(
        struct(
          (-col("lift")).as("s0"), col("rec_item").as("s1"),
          col("n_both").as("p0"), col("lift").as("p1")),
        topN).as("top"))
      .select(col("item"), posexplode(col("top")))
      .select(col("item"), (col("pos") + 1).cast("long").as("rk"),
        col("col.s1").as("rec_item"), col("col.p0").as("n_both"),
        col("col.p1").as("lift"))
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The t2 query inventory (SURVEY.md §2.C–K): every operator is a pure
  * DataFrame declaration so Catalyst owns pushdown/pruning/join selection;
  * every query ends in ORDER BY for a stable oracle hash; aggregates over
  * doubles are rounded in BOTH engines (SURVEY §7 gotchas).
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** queries + matching DuckDB oracle, built side by side so names/aliases
    * can't drift apart. */
  private val registry = scala.collection.mutable.LinkedHashMap[String, (Q, Option[String])]()

  private def q(name: String, oracle: String)(fn: Q): Unit =
    registry(name) = (fn, Some(oracle))

  private def qNoOracle(name: String)(fn: Q): Unit =
    registry(name) = (fn, None)

  /** Shared stage for the dedup family: the (doc_id, sh_str) shingle
    * explosion over `documents`, persisted once per (session, dir) so
    * q_dedup_ngram / q_dedup_clusters / q_dedup_minhash don't each redo the
    * parse+shingle scan when a suite (Verify, Bench, a user pipeline) runs
    * them together. At 100 TB this is the "materialize the common prefix"
    * pattern — MEMORY_AND_DISK, spillable, evicted when the corpus dir
    * changes. Single-query use pays one persist and loses nothing.
    *
    * Keyed WEAKLY on the actual session object (not an identity hash — a
    * GC'd session's hash can be reused, which would hand out a DataFrame
    * bound to a stopped SparkContext), so dead sessions' entries vanish
    * with the session. Snapshot semantics: a corpus dir rewritten
    * in-session keeps serving the persisted snapshot, like any Spark
    * cache. */
  private val sharedShingleCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]())

  /** The one shared accessor for every weak-session cache in this file
    * (sharedFrame AND annIndexPath ride it): lock the cache, resolve the
    * per-session map, run `f` under the lock. Concurrency-sensitive —
    * keep the single copy. */
  private def withSessionMap[V, T](
      cache: java.util.Map[SparkSession, scala.collection.mutable.Map[String, V]],
      s: SparkSession)(f: scala.collection.mutable.Map[String, V] => T): T =
    cache.synchronized {
      val m = cache.get(s)
      val perSession = if (m != null) m else {
        val m2 = scala.collection.mutable.Map.empty[String, V]
        cache.put(s, m2)
        m2
      }
      f(perSession)
    }

  private def sharedFrame(
      cache: java.util.Map[SparkSession, scala.collection.mutable.Map[String, DataFrame]],
      s: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    def withMap[T](f: scala.collection.mutable.Map[String, DataFrame] => T): T =
      withSessionMap(cache, s)(f)
    val cached = withMap { m =>
      // keep at most one corpus cached per session
      m.filterInPlace { (d, df) =>
        val keep = d == dir
        if (!keep) df.unpersist(blocking = false)
        keep
      }
      m.get(dir)
    }
    cached.getOrElse {
      // build OUTSIDE the lock: some builders run eager Spark jobs
      // (nearDupPairsAuto counts, fits centroids, may collect under its
      // broadcast budget) and must not serialize unrelated sessions/dirs
      // behind a global monitor. Two threads racing the same (s, dir)
      // both build; only the winner of the put persists. The loser must
      // NOT persist-then-unpersist its copy: CacheManager keys cache
      // entries by logical-plan equality, and both racers build equal
      // plans, so the loser's unpersist would evict the winner's entry
      // too and the "shared" stage would silently recompute.
      val built = build
      withMap { m =>
        m.get(dir) match {
          case Some(winner) => winner
          case None =>
            val p = built.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            m.put(dir, p)
            p
        }
      }
    }
  }

  private def sharedShingles(s: SparkSession, dir: String): DataFrame =
    sharedFrame(sharedShingleCache, s, dir)(
      graft.operators.Dedup.shingleExplode(t(s, dir, "documents"), "doc_id", "text", n = 3))

  /** The even-doc_id-trained quality-filter model shared by the ML
    * DEPLOYMENT family (q_ml_logreg_confusion / _apply /
    * q_ml_calibration) — same caching contract as [[sharedShingles]]:
    * the 4-iteration GD loop is the expensive common prefix, and the
    * model itself is a 256-row frame. q_ml_logreg_train deliberately
    * keeps its own fit (different fixture: the FULL corpus). */
  private val sharedModelCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]())

  private def sharedLogregModel(s: SparkSession, dir: String): DataFrame =
    sharedFrame(sharedModelCache, s, dir)(
      graft.operators.ClassifierTrain.trainQuantized(
        t(s, dir, "documents").filter(col("doc_id") % 2 === 0), "doc_id",
        "text", joinGtScan, buckets = 256, iterations = 4, lr = 1000.0))

  /** The positional 5-word span explosion shared by the span-dedup pair
    * (q_dedup_spans / q_dedup_spans_strip) — same caching contract as
    * [[sharedShingles]]; each operator also consumes it on both sides of
    * its own semi-join, so the persist pays off even for a single query. */
  private val sharedSpanCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]())

  private def sharedSpans(s: SparkSession, dir: String): DataFrame =
    sharedFrame(sharedSpanCache, s, dir)(
      graft.operators.Dedup.spanExplode(t(s, dir, "documents"), "doc_id", "text", k = 5))

  /** The cosine near-dup pair set at the inventory's 0.45 threshold —
    * shared by q_dedup_embed and q_dedup_semantic (same caching contract
    * as [[sharedShingles]]: the pair generation is the expensive common
    * prefix of the embedding-dedup family).
    *
    * Retention note: under the brute path the cached frame's closure pins
    * its vector broadcast (≤ the kernel's 128 MB budget) until eviction;
    * the cache keeps at most ONE dir per session, so that retention is
    * bounded at a single broadcast and released on dir switch or session
    * GC. */
  private val sharedEmbedPairCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]())

  private def sharedEmbedPairs(s: SparkSession, dir: String): DataFrame =
    sharedFrame(sharedEmbedPairCache, s, dir)(
      graft.operators.Similarity.nearDupPairsAuto(
        t(s, dir, "embeddings"), "vec_id", "embedding", threshold = 0.45))

  /** The connected-component labels over the inventory's 0.8/df100
    * ngram-Jaccard pairs — the expensive common prefix of
    * q_dedup_clusters AND q_dedup_keep_best (same caching contract as
    * [[sharedShingles]]). The label frame is proportional to the
    * near-dup graph, so the persisted footprint is tiny; what the cache
    * saves is re-running pair generation + label propagation per
    * consumer. */
  private val sharedClusterCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]())

  private def sharedClusterLabels(s: SparkSession, dir: String): DataFrame =
    sharedFrame(sharedClusterCache, s, dir)(
      graft.operators.Dedup.dedupClusters(
        graft.operators.Dedup.ngramJaccardPairsFrom(
          sharedShingles(s, dir), threshold = 0.8, maxShingleDf = 100L)))

  // ------------------------------------------------------------ §2.C scans/filters

  q("q_scan_all",
    "SELECT * FROM region ORDER BY r_regionkey") { (s, d) =>
    t(s, d, "region").orderBy("r_regionkey")
  }

  q("q_project",
    """SELECT o_orderkey, o_totalprice, o_totalprice * 0.1 AS fee
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        (col("o_totalprice") * 0.1).as("fee"))
      .orderBy("o_orderkey")
  }

  q("q_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_quantity").between(10, 20) && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
  }

  q("q_filter_compound",
    """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
      |WHERE (o_orderstatus = 'F' OR o_totalprice > 100000)
      |  AND NOT o_orderpriority LIKE '1-%'
      |  AND o_custkey IN (1,2,3,5,8,13,21)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .filter((col("o_orderstatus") === "F" || col("o_totalprice") > 100000)
        && !col("o_orderpriority").like("1-%")
        && col("o_custkey").isin(1, 2, 3, 5, 8, 13, 21))
      .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  // ------------------------------------------------------------ §2.D joins

  q("q_join_inner",
    """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |WHERE o.o_totalprice > 200000
      |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer")
    val o = t(s, d, "orders").filter(col("o_totalprice") > 200000)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .select(c("c_custkey"), c("c_name"), o("o_orderkey"), o("o_totalprice"))
      .orderBy("c_custkey", "o_orderkey")
  }

  q("q_join_left",
    """SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer")
    val o = t(s, d, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")
  }

  q("q_join_right",
    """SELECT n.n_name, s.s_suppkey FROM supplier s
      |RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
      |ORDER BY n.n_name, s.s_suppkey""".stripMargin) { (s, d) =>
    val sup = t(s, d, "supplier")
    val n = t(s, d, "nation")
    sup.join(n, sup("s_nationkey") === n("n_nationkey"), "right")
      .select(n("n_name"), sup("s_suppkey"))
      .orderBy(col("n_name"), col("s_suppkey"))
  }

  q("q_join_full",
    """SELECT coalesce(a.k, b.k) AS k, a.cnt_c, b.cnt_s FROM
      |  (SELECT c_nationkey AS k, count(*) AS cnt_c FROM customer GROUP BY 1) a
      |FULL JOIN
      |  (SELECT s_nationkey AS k, count(*) AS cnt_s FROM supplier GROUP BY 1) b
      |ON a.k = b.k ORDER BY k""".stripMargin) { (s, d) =>
    val a = t(s, d, "customer").groupBy(col("c_nationkey").as("k"))
      .agg(count(lit(1)).as("cnt_c"))
    val b = t(s, d, "supplier").groupBy(col("s_nationkey").as("k"))
      .agg(count(lit(1)).as("cnt_s"))
    a.join(b, a("k") === b("k"), "full")
      .select(coalesce(a("k"), b("k")).as("k"), col("cnt_c"), col("cnt_s"))
      .orderBy("k")
  }

  q("q_join_semi",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |              AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer")
    val o = t(s, d, "orders").filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  q("q_join_anti",
    // customers with NO premium (>400k) order — the 400k floor keeps the
    // gate NON-VACUOUS at every fixture SF (every sf0.01 customer has at
    // least one order, so the unfiltered form returned 0 rows and its
    // hash match was 0==0: a gate that could never fail)
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer")
    val o = t(s, d, "orders").filter(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  q("q_join_cross",
    """SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
      |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, d) =>
    t(s, d, "region").crossJoin(t(s, d, "nation"))
      .select("r_name", "n_name").orderBy("r_name", "n_name")
  }

  q("q_join_theta",
    """SELECT p.p_partkey, p.p_size, b.band FROM part p
      |JOIN (SELECT 1 AS band, 0 AS lo, 10 AS hi
      |      UNION ALL SELECT 2, 10, 25 UNION ALL SELECT 3, 25, 51) b
      |  ON p.p_size > b.lo AND p.p_size <= b.hi
      |ORDER BY p.p_partkey, b.band""".stripMargin) { (s, d) =>
    import s.implicits._
    val bands = Seq((1, 0, 10), (2, 10, 25), (3, 25, 51)).toDF("band", "lo", "hi")
    // tiny build side → BroadcastNestedLoopJoin, no shuffle of `part`
    t(s, d, "part").join(broadcast(bands),
        col("p_size") > col("lo") && col("p_size") <= col("hi"))
      .select("p_partkey", "p_size", "band")
      .orderBy("p_partkey", "band")
  }

  q("q_join_multi",
    """SELECT r.r_name, n.n_name, round(sum(c.c_acctbal), 2) AS total_bal
      |FROM region r
      |JOIN nation n ON n.n_regionkey = r.r_regionkey
      |JOIN customer c ON c.c_nationkey = n.n_nationkey
      |GROUP BY r.r_name, n.n_name
      |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, d) =>
    val r = t(s, d, "region")
    val n = t(s, d, "nation")
    val c = t(s, d, "customer")
    // dims are tiny → broadcast both; the only shuffle is the final group
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name"), n("n_name"))
      .agg(round(sum(c("c_acctbal")), 2).as("total_bal"))
      .orderBy("r_name", "n_name")
  }

  q("q_join_asof",
    // backward as-of join: each purchase matched to the user's latest
    // signup at-or-before it (DuckDB's native ASOF LEFT JOIN is the oracle)
    """SELECT p.event_id, p.user_id, p.ts, s.event_id AS signup_event
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      |  ON p.user_id = s.user_id AND p.ts >= s.ts
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val ev = t(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_event"))
    graft.operators.AsOfJoin.asofBackward(
        purchases, signups, "user_id", "ts", "ts",
        Map("signup_event" -> "signup_event"))
      .orderBy("event_id")
  }

  q("q_join_pit",
    // point-in-time multi-table feature assembly (the feature-store
    // join): each purchase picks up the user's latest VIEW value within
    // 3 days AND latest CLICK value within 1 day — per-table staleness
    // bounds, no feature leakage (feature_ts <= label_ts by
    // construction). Engine folds asofBackwardWithin once per feature
    // table; the oracle chains DuckDB ASOF LEFT JOINs with the same
    // tolerance CASEs
    """WITH spine AS (
      |  SELECT event_id AS label_id, user_id, ts AS label_ts
      |  FROM events WHERE event_type = 'purchase'),
      |v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
      |c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
      |j1 AS (
      |  SELECT s.label_id, s.user_id, s.label_ts,
      |    CASE WHEN s.label_ts - v.ts <= INTERVAL 3 DAY THEN v.value END AS f_view_value
      |  FROM spine s ASOF LEFT JOIN v
      |    ON s.user_id = v.user_id AND s.label_ts >= v.ts),
      |j2 AS (
      |  SELECT j1.label_id, j1.user_id, j1.f_view_value,
      |    CASE WHEN j1.label_ts - c.ts <= INTERVAL 1 DAY THEN c.value END AS f_click_value
      |  FROM j1 ASOF LEFT JOIN c
      |    ON j1.user_id = c.user_id AND j1.label_ts >= c.ts)
      |SELECT label_id, user_id, f_view_value, f_click_value
      |FROM j2 ORDER BY label_id""".stripMargin) { (s, d) =>
    val ev = t(s, d, "events")
    val spine = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("label_id"), col("user_id"),
        col("ts").as("label_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value").as("f_view_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("f_click_value"))
    graft.operators.AsOfJoin.pointInTimeFeatures(
        spine, "user_id", "label_ts", Seq(
          (views, "ts", Map("f_view_value" -> "f_view_value"), 3L * 86400000000L),
          (clicks, "ts", Map("f_click_value" -> "f_click_value"), 86400000000L)))
      .select("label_id", "user_id", "f_view_value", "f_click_value")
      .orderBy("label_id")
  }

  q("q_feature_latest",
    // the feature-store STATE table (the online twin of q_join_pit's
    // offline assembly): each user's latest view-event feature tuple.
    // Engine = one keyed max over the (ts, value, event_id) struct — a
    // total order, so the oracle replays it as the rk=1 window; the
    // streaming maintenance (FeatureStore.maintainLatest) folds into
    // exactly this state per trigger, spec-pinned
    """WITH v AS (
      |  SELECT user_id, ts, value, event_id FROM events
      |  WHERE event_type = 'view' AND ts IS NOT NULL),
      |r AS (SELECT user_id, ts, value, event_id,
      |        row_number() OVER (PARTITION BY user_id
      |          ORDER BY ts DESC, value DESC, event_id DESC) AS rk
      |      FROM v)
      |SELECT user_id, ts AS feature_ts, value AS f_value,
      |  event_id AS f_event
      |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
    val views = t(s, d, "events").filter(col("event_type") === "view")
      .select("user_id", "ts", "value", "event_id")
    graft.streaming.FeatureStore.latestState(
        views, Seq("user_id"), "ts", Seq("value", "event_id"))
      .select(col("user_id"), col("ts").as("feature_ts"),
        col("value").as("f_value"), col("event_id").as("f_event"))
      .orderBy("user_id")
  }

  q("q_join_asof_tolerance",
    // tolerance-bounded as-of: latest signup at-or-before the purchase
    // AND within 7 days — a stale match is no match (the ASOF TOLERANCE
    // refinement). Same carry-forward plan + one map-side gap predicate;
    // the oracle nulls the carried value past the interval
    """SELECT p.event_id, p.user_id, p.ts,
      |  CASE WHEN p.ts - s.ts <= INTERVAL 7 DAY THEN s.event_id END AS signup_event
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      |  ON p.user_id = s.user_id AND p.ts >= s.ts
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val ev = t(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_event"))
    graft.operators.AsOfJoin.asofBackwardWithin(
        purchases, signups, "user_id", "ts", "ts",
        Map("signup_event" -> "signup_event"),
        toleranceUs = 7L * 24 * 3600 * 1000000)
      .orderBy("event_id")
  }

  q("q_join_asof_forward",
    // forward as-of: each purchase matched to the user's NEXT error
    // at-or-after it (incident attribution). Same union+carry shape as
    // the backward form with the per-key scan reversed
    """SELECT p.event_id, p.user_id, p.ts, e.event_id AS next_error
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id AND p.ts <= e.ts
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val ev = t(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id").as("next_error"))
    graft.operators.AsOfJoin.asofForward(
        purchases, errors, "user_id", "ts", "ts",
        Map("next_error" -> "next_error"))
      .orderBy("event_id")
  }

  q("q_join_range",
    // keyless time-range join: every signup landing within the hour after
    // a purchase. The naive theta join is BroadcastNestedLoop (O(L·R));
    // binnedRangeJoin turns it into a shuffled equi-join on a time-bin
    // key with bounded left replication — the shape that survives when
    // both sides are unbroadcastable event streams.
    """SELECT p.event_id AS p_event, p.user_id AS p_user,
      |       s.event_id AS s_event, s.user_id AS s_user
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
      |  ON s.ts >= p.ts AND s.ts < p.ts + INTERVAL 1 HOUR
      |ORDER BY p_event, s_event""".stripMargin) { (s, d) =>
    val ev = t(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_event"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
    graft.operators.RangeJoin.binnedRangeJoin(
        purchases, signups, "p_ts", "s_ts", lowerSec = 0L, upperSec = 3600L)
      .select("p_event", "p_user", "s_event", "s_user")
      .orderBy("p_event", "s_event")
  }

  q("q_join_range_capped",
    // the bounded-output form: first 3 signups within the hour after each
    // purchase. Output-bound growth is the range join's only super-linear
    // term (BASELINE.md); the cap keeps it linear in |purchases| at any
    // scale. Selection is deterministic (earliest s_ts, ties by remaining
    // right columns) so the oracle replays it with the same window.
    """WITH j AS (
      |  SELECT p.event_id AS p_event, p.user_id AS p_user,
      |         s.event_id AS s_event, s.user_id AS s_user,
      |         row_number() OVER (PARTITION BY p.event_id
      |           ORDER BY s.ts, s.event_id, s.user_id) AS rn
      |  FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      |  JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
      |    ON s.ts >= p.ts AND s.ts < p.ts + INTERVAL 1 HOUR)
      |SELECT p_event, p_user, s_event, s_user FROM j WHERE rn <= 3
      |ORDER BY p_event, s_event""".stripMargin) { (s, d) =>
    val ev = t(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_event"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
    graft.operators.RangeJoin.binnedRangeJoinCapped(
        purchases, signups, "p_ts", "s_ts", lowerSec = 0L, upperSec = 3600L,
        leftKey = Seq("p_event"), k = 3)
      .select("p_event", "p_user", "s_event", "s_user")
      .orderBy("p_event", "s_event")
  }

  q("q_join_advisor",
    // profile-then-decide composed end to end: ONE row of pre-join
    // diagnostics (key histograms, hottest-key share via the k=1 heap,
    // CM-sketch join-size over-estimate) plus the strategy a planner
    // would act on — broadcast under the row budget, salted past the
    // hot-key share threshold, shuffle otherwise. Every input is a
    // distributively-computed integer, the decision a CASE over them,
    // so the oracle replays the whole recommendation including the
    // sketch arithmetic
    """WITH lh AS (SELECT o_custkey AS k, count(*) AS lc FROM orders GROUP BY 1),
      |rh AS (SELECT c_custkey AS k, count(*) AS rc FROM customer GROUP BY 1),
      |j AS (SELECT lh.k AS lk, lc, rh.k AS rk, rc
      |      FROM lh FULL JOIN rh ON lh.k = rh.k),
      |stats AS (SELECT
      |    CAST(coalesce(sum(lc), 0) AS BIGINT) AS n_left_rows,
      |    CAST(coalesce(sum(rc), 0) AS BIGINT) AS n_right_rows,
      |    count(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL THEN 1 END) AS n_common_keys,
      |    CAST(coalesce(max(lc * rc), 0) AS BIGINT) AS max_key_fanout
      |  FROM j),
      |top AS (SELECT coalesce(max(c), 0) AS topc
      |        FROM (SELECT count(*) AS c FROM orders GROUP BY o_custkey)),
      |ho AS (
      |  SELECT md5_number_lower(CAST(o_custkey AS VARCHAR))::HUGEINT AS lo,
      |         md5_number_upper(CAST(o_custkey AS VARCHAR))::HUGEINT AS hi
      |  FROM orders WHERE o_custkey IS NOT NULL),
      |hc AS (
      |  SELECT md5_number_lower(CAST(c_custkey AS VARCHAR))::HUGEINT AS lo,
      |         md5_number_upper(CAST(c_custkey AS VARCHAR))::HUGEINT AS hi
      |  FROM customer WHERE c_custkey IS NOT NULL),
      |co AS (SELECT j, ((lo + j*hi) % 18446744073709551616::HUGEINT) % 256 AS b,
      |         count(*) AS ca
      |       FROM ho, range(4) t(j) GROUP BY 1, 2),
      |cc AS (SELECT j, ((lo + j*hi) % 18446744073709551616::HUGEINT) % 256 AS b,
      |         count(*) AS cb
      |       FROM hc, range(4) t(j) GROUP BY 1, 2),
      |ip AS (SELECT co.j, sum(ca * cb) AS ip
      |       FROM co JOIN cc ON co.j = cc.j AND co.b = cc.b GROUP BY co.j),
      |est AS (SELECT CAST(min(ip) AS BIGINT) AS est_join_rows FROM ip)
      |SELECT s.n_left_rows, s.n_right_rows, s.n_common_keys, s.max_key_fanout,
      |  CASE WHEN s.n_left_rows = 0 THEN 0.0
      |       ELSE CAST(t.topc AS DOUBLE) / s.n_left_rows END AS top_key_share,
      |  e.est_join_rows,
      |  CASE WHEN s.n_right_rows <= 10000 THEN 'broadcast'
      |       WHEN (CASE WHEN s.n_left_rows = 0 THEN 0.0
      |             ELSE CAST(t.topc AS DOUBLE) / s.n_left_rows END) >= 0.2
      |         THEN 'salted'
      |       ELSE 'shuffle' END AS strategy
      |FROM stats s CROSS JOIN top t CROSS JOIN est e""".stripMargin) { (s, d) =>
    graft.operators.SkewJoin.advise(
      t(s, d, "orders"), "o_custkey", t(s, d, "customer"), "c_custkey",
      broadcastMaxRows = 10000, topShareThreshold = 0.2)
  }

  q("q_join_skew",
    // explicit salted join for hot keys AQE can't split (a single key
    // overwhelming one reducer): left rows get a content-hash salt in
    // [0,8), the dim side replicates 8x, the join key becomes (key,salt).
    // Semantically identical to the plain equi-join — which is exactly
    // what the oracle runs.
    """SELECT p.p_brand, count(*) AS n,
      |       round(sum(l.l_quantity), 2) AS qty
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin) { (s, d) =>
    val li = t(s, d, "lineitem")
      .select(col("l_partkey").as("p_partkey"), col("l_quantity"))
    val part = t(s, d, "part").select("p_partkey", "p_brand")
    graft.operators.SkewJoin.saltedInnerJoin(li, part, "p_partkey", saltFactor = 8)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .orderBy("p_brand")
  }

  // ------------------------------------------------------------ §2.E aggregations

  q("q_agg_global",
    """SELECT count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
      |       round(avg(l_extendedprice), 2) AS avg_price,
      |       min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
      |FROM lineitem""".stripMargin) { (s, d) =>
    t(s, d, "lineitem").agg(
      count(lit(1)).as("n"),
      round(sum("l_quantity"), 2).as("sum_qty"),
      round(avg("l_extendedprice"), 2).as("avg_price"),
      min("l_shipdate").as("min_ship"),
      max("l_shipdate").as("max_ship"))
  }

  q("q_agg_group",
    // TPC-H Q1 shape (SURVEY §2.E)
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  q("q_agg_distinct",
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    t(s, d, "orders").groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("n_cust"))
      .orderBy("o_orderstatus")
  }

  q("q_agg_having",
    """SELECT o_custkey, count(*) AS n FROM orders
      |GROUP BY o_custkey HAVING count(*) >= 12 ORDER BY o_custkey""".stripMargin) { (s, d) =>
    t(s, d, "orders").groupBy("o_custkey")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 12)
      .orderBy("o_custkey")
  }

  q("q_agg_rollup",
    """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  q("q_agg_cube",
    """SELECT l_returnflag, l_linestatus, count(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  q("q_agg_stats",
    """SELECT l_returnflag,
      |  round(stddev_samp(l_quantity), 4) AS sd_qty,
      |  round(var_samp(l_quantity), 4) AS var_qty,
      |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    t(s, d, "lineitem").groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"))
      .orderBy("l_returnflag")
  }

  q("q_agg_incremental_merge",
    // incremental aggregate maintenance (materialized-view discipline):
    // the engine side NEVER aggregates the full table — it builds two
    // partial-aggregate STATES (history: shipdate < 1997; delta: the
    // rest, nulls included) and folds them with a state-sized merge
    // (IncrementalAgg.merge: union + keyed re-agg of algebraic
    // accumulators). The oracle is the FULL RECOMPUTE over the whole
    // table — passing proves merge(state(a), state(b)) == state(a ∪ b)
    // exactly, the self-maintainability contract that lets a 100 TB
    // pipeline maintain rollups by scanning only each day's delta.
    // Sums run in DECIMAL(28,4) (order-independent); the sum/avg bridge
    // via VARCHAR follows the q_tpch1 lesson (DuckDB's direct
    // DECIMAL→DOUBLE double-rounds past 2^53)
    """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
      |  cast(cast(sum(cast(l_quantity AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sum_l_quantity,
      |  round(cast(cast(sum(cast(l_quantity AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) / count(l_quantity), 6) AS avg_l_quantity,
      |  cast(min(cast(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS min_l_quantity,
      |  cast(max(cast(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS max_l_quantity,
      |  cast(cast(sum(cast(l_extendedprice AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sum_l_extendedprice,
      |  round(cast(cast(sum(cast(l_extendedprice AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) / count(l_extendedprice), 6) AS avg_l_extendedprice,
      |  cast(min(cast(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS min_l_extendedprice,
      |  cast(max(cast(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS max_l_extendedprice
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    import graft.operators.IncrementalAgg
    val keys = Seq("l_returnflag", "l_linestatus")
    val measures = Seq("l_quantity", "l_extendedprice")
    val li = t(s, d, "lineitem")
    val cut = lit("1997-01-01").cast("date")
    val history = li.filter(col("l_shipdate") < cut)
    // complement INCLUDING null shipdates — the two states must
    // partition the table exactly
    val delta = li.filter(!coalesce(col("l_shipdate") < cut, lit(false)))
    val merged = IncrementalAgg.merge(keys, measures,
      IncrementalAgg.state(history, keys, measures),
      IncrementalAgg.state(delta, keys, measures))
    IncrementalAgg.finish(merged, keys, measures)
      .orderBy("l_returnflag", "l_linestatus")
  }

  q("q_agg_gsets",
    """SELECT l_returnflag, l_linestatus, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    // Dataset.groupingSets (Spark 4) — no session-global temp-view
    // registration inside what is otherwise a pure-function inventory
    t(s, d, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  q("q_agg_approx_distinct",
    // HLL register layouts differ across engines, so the estimate itself
    // can never hash-match — SURVEY §2.E prescribes the tolerance compare
    // instead: the oracle replays the EXACT distinct (so the exact side
    // is fully DuckDB-checked) plus the literal band verdict TRUE; the
    // engine must land its HLL++ estimate inside 3·rsd of that exact
    // count (rsd 0.05 → ±15 %, comfortably wide for bias-corrected
    // HLL++ yet a real check — a broken sketch is orders off) or the
    // boolean hash-fails. Deterministic per dataset: approx_count_distinct
    // is a pure function of the input set.
    """SELECT o_orderstatus,
      |  count(DISTINCT o_custkey) AS exact_cust,
      |  TRUE AS within_band
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    t(s, d, "orders").groupBy("o_orderstatus")
      .agg(
        countDistinct(col("o_custkey")).as("exact_cust"),
        approx_count_distinct(col("o_custkey"), rsd = 0.05).as("__approx"))
      .select(col("o_orderstatus"), col("exact_cust"),
        (abs(col("__approx") - col("exact_cust")) <=
          col("exact_cust") * lit(3 * 0.05)).as("within_band"))
      .orderBy("o_orderstatus")
  }

  q("q_agg_approx_distinct_kmv",
    // the ENGINE-NEUTRAL approximate distinct: KMV over md5 — the k
    // smallest distinct hashes are a deterministic function of the input
    // set, so the whole estimate replays in SQL (unlike any HLL register
    // layout). Exact when the group has < k distinct values; otherwise
    // (k-1) * 2^64 / kth-min, both engines converting the SAME u64 with
    // one correctly-rounded step.
    // group membership comes from the FULL table (not the non-null-key
    // subset): the engine's groupBy emits every o_orderstatus group, and
    // KmvDistinctAgg skips nulls so an all-null-key group yields an empty
    // sketch = 0.0 — the LEFT JOIN + coalesce(0) replays exactly that
    """WITH g AS (SELECT DISTINCT o_orderstatus FROM orders),
      |h AS (
      |  SELECT DISTINCT o_orderstatus,
      |         md5_number_lower(CAST(o_custkey AS VARCHAR)) AS hv
      |  FROM orders WHERE o_custkey IS NOT NULL),
      |r AS (SELECT o_orderstatus, hv,
      |        row_number() OVER (PARTITION BY o_orderstatus ORDER BY hv) AS rn,
      |        count(*) OVER (PARTITION BY o_orderstatus) AS d
      |      FROM h),
      |e AS (SELECT o_orderstatus,
      |        round(CASE WHEN max(d) < 64 THEN CAST(max(d) AS DOUBLE)
      |              ELSE 63 * 18446744073709551616.0 /
      |                   CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE) END,
      |          4) AS approx_cust
      |      FROM r GROUP BY o_orderstatus)
      |SELECT g.o_orderstatus, coalesce(e.approx_cust, 0.0) AS approx_cust
      |FROM g LEFT JOIN e ON g.o_orderstatus IS NOT DISTINCT FROM e.o_orderstatus
      |ORDER BY g.o_orderstatus""".stripMargin) { (s, d) =>
    t(s, d, "orders").groupBy("o_orderstatus")
      .agg(round(graft.functions.SketchAggregates.kmvDistinct(
        col("o_custkey").cast("string"), 64), 4).as("approx_cust"))
      .orderBy("o_orderstatus")
  }

  q("q_agg_percentile",
    // exact interpolated percentiles: Spark percentile() and DuckDB
    // quantile_cont share the Hive p*(n-1) interpolation
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
      |  round(quantile_cont(l_quantity, 0.9), 4) AS p90,
      |  round(median(l_extendedprice), 4) AS med_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    t(s, d, "lineitem").groupBy("l_returnflag")
      .agg(
        // one value→count buffer serves both quantiles (array form)
        // instead of two independent percentile aggregates per group
        expr("percentile(l_quantity, array(0.5D, 0.9D))").as("ps"),
        expr("median(l_extendedprice)").as("mp"))
      .select(col("l_returnflag"),
        round(col("ps")(0), 4).as("p50"),
        round(col("ps")(1), 4).as("p90"),
        round(col("mp"), 4).as("med_price"))
      .orderBy("l_returnflag")
  }

  q("q_agg_collect",
    // order-insensitive list aggregation (collect_list incl. duplicates).
    // The list is sorted then joined to a string: the driver's pandas hasher
    // cannot hash a raw array column (numpy.ndarray is unhashable), so the
    // canonical form is the joined string; QueriesSpec keeps the array form.
    """SELECT c_nationkey, array_to_string(list_sort(array_agg(c_mktsegment)), '|') AS segments
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
    t(s, d, "customer").groupBy("c_nationkey")
      .agg(array_join(sort_array(collect_list("c_mktsegment")), "|").as("segments"))
      .orderBy("c_nationkey")
  }

  q("q_agg_string",
    """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, d) =>
    t(s, d, "nation").groupBy("n_regionkey")
      .agg(array_join(sort_array(collect_list("n_name")), ",").as("names"))
      .orderBy("n_regionkey")
  }

  // ------------------------------------------------------------ §2.F windows/sort/set

  q("q_win_value",
    // value-position window family: first/last/nth over an explicit
    // full-partition frame (the default frame stops at CURRENT ROW, which
    // makes last_value a no-op), plus ntile bucketing; per-customer
    // partitions with a unique (date, key) order for determinism
    """SELECT o_orderkey, o_custkey,
      |  first_value(o_totalprice) OVER w AS first_price,
      |  last_value(o_totalprice) OVER w AS last_price,
      |  nth_value(o_totalprice, 2) OVER w AS second_price,
      |  ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      first(col("o_totalprice")).over(full).as("first_price"),
      last(col("o_totalprice")).over(full).as("last_price"),
      nth_value(col("o_totalprice"), 2).over(full).as("second_price"),
      ntile(4).over(w).as("quartile"))
      .orderBy("o_orderkey")
  }

  q("q_fn_percentile_rank",
    // WINDOW-FREE cume_dist at corpus scale (the percentile-rank
    // feature transform: quality score → percentile for curriculum /
    // filtering): value histogram + the two-phase prefix sum + one
    // value-keyed join-back — semantics identical to SQL cume_dist
    // (count(x ≤ v)/n) without the single-task global window its plan
    // degenerates to. The oracle IS that window form, so the hash match
    // proves the distributed plan computes the textbook function
    """SELECT o_orderkey,
      |  round(cume_dist() OVER (ORDER BY CAST(o_totalprice AS DOUBLE)), 6) AS pct
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    graft.operators.Profiling.cumeDistBy(t(s, d, "orders"), "o_totalprice")
      .select(col("o_orderkey"), round(col("cume_dist"), 6).as("pct"))
      .orderBy("o_orderkey")
  }

  q("q_win_distribution",
    // partitioned by o_custkey (high cardinality): at 100 TB this spreads
    // across the cluster, unlike the 3-value o_orderstatus key which would
    // put the whole table into 3 window tasks
    """SELECT o_orderkey,
      |  ntile(4) OVER w AS quartile,
      |  CAST(round(CAST(CAST((percent_rank() OVER w) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS pr,
      |  CAST(round(CAST(CAST((cume_dist() OVER w) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, d, "orders").select(
      col("o_orderkey"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pr"),
      round(cume_dist().over(w), 6).as("cd"))
      .orderBy("o_orderkey")
  }

  q("q_win_range",
    // RANGE frame over an integer ordering key; the sum runs in DECIMAL
    // (exact under any accumulation order) and only the final projection is
    // cast to DOUBLE so both engines hash the same physical type.
    // Partition key is o_custkey (high cardinality) — a RANGE frame over the
    // same key degenerates to per-partition totals, which is exactly the
    // "running neighbourhood" semantics but with a scale-safe key (the old
    // 3-value o_orderstatus key meant 3 window tasks at 100 TB).
    """SELECT o_custkey, o_orderkey,
      |  cast(sum(cast(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // INTERVAL range frame in pure DataFrame form: order the window by
    // epoch MICROS with a [-30 days, 0] micros range — the identical
    // peer set to the oracle's RANGE INTERVAL 30 DAY at ANY timestamp
    // granularity (a day-granular key would lump all same-day rows into
    // every frame) — and no temp-view registration
    val w = Window.partitionBy("o_custkey")
      // NTZ→LTZ cast is wall-clock identity under the fixed UTC session
      .orderBy(unix_micros(col("o_orderdate").cast("timestamp")))
      .rangeBetween(-30L * 86400 * 1000000, 0)
    t(s, d, "orders").select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("near_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  q("q_win_rank",
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  q("q_win_agg",
    // Cast the INPUT to decimal and accumulate the window aggregates in
    // decimal: double accumulation order differs between engines (segment
    // trees vs sequential) and round()/avg() ties then disagree; decimal sums
    // are exact and associate freely. Only the FINAL projection is cast to
    // DOUBLE (exact at these magnitudes) so both engines hash the same
    // physical type — Spark widens sum(DECIMAL(18,2)) to (28,2), DuckDB to
    // (38,2), and the driver's hasher distinguishes those.
    """SELECT o_custkey, o_orderkey,
      |  cast(sum(cast(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      |  cast(sum(cast(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val base = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val dec = col("o_totalprice").cast("decimal(18,2)")
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec).over(
          base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"),
        sum(dec).over(base.rowsBetween(-2, 0)).cast("double").as("moving_sum3"))
      .orderBy("o_custkey", "o_orderkey")
  }

  q("q_win_lead_lag",
    """SELECT o_custkey, o_orderkey,
      |  lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
      |  lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        lead("o_totalprice", 1).over(w).as("next_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  q("q_topk",
    """SELECT * FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
      |         rank() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rk
      |  FROM lineitem) WHERE rk <= 2
      |ORDER BY l_suppkey, rk, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    t(s, d, "lineitem")
      .withColumn("rk", rank().over(w))
      .filter(col("rk") <= 2)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "rk")
      .orderBy("l_suppkey", "rk", "l_orderkey", "l_linenumber")
  }

  q("q_sort",
    """SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
      |ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey""".stripMargin) { (s, d) =>
    t(s, d, "customer")
      .select("c_custkey", "c_acctbal", "c_mktsegment")
      .orderBy(col("c_mktsegment").asc, col("c_acctbal").desc, col("c_custkey"))
  }

  q("q_limit",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
  }

  q("q_union_all",
    """SELECT c_nationkey AS nk, 'customer' AS side FROM customer
      |UNION ALL SELECT s_nationkey, 'supplier' FROM supplier
      |ORDER BY nk, side""".stripMargin) { (s, d) =>
    t(s, d, "customer").select(col("c_nationkey").as("nk"), lit("customer").as("side"))
      .unionAll(t(s, d, "supplier").select(col("s_nationkey").as("nk"), lit("supplier").as("side")))
      .orderBy("nk", "side")
  }

  q("q_union",
    """SELECT c_nationkey AS nk FROM customer
      |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin) { (s, d) =>
    t(s, d, "customer").select(col("c_nationkey").as("nk"))
      .union(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")
  }

  q("q_intersect",
    """SELECT c_nationkey AS nk FROM customer
      |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin) { (s, d) =>
    t(s, d, "customer").select(col("c_nationkey").as("nk"))
      .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
      .orderBy("nk")
  }

  q("q_except",
    // custkeys that never placed a >300k order — suppliers cover every
    // nation at sf>=0.01, so the old nationkey form returned 0 rows and
    // its hash match was vacuous; this difference is non-empty at every
    // fixture SF (3 / 30 / 308 rows)
    """SELECT c_custkey AS ck FROM customer
      |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 300000
      |ORDER BY ck""".stripMargin) { (s, d) =>
    t(s, d, "customer").select(col("c_custkey").as("ck"))
      .except(t(s, d, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("ck")))
      .orderBy("ck")
  }

  q("q_limit_offset",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 5""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(5).limit(20)
  }

  q("q_pivot",
    // pivot = conditional aggregation (the portable formulation is the oracle)
    """SELECT l_returnflag,
      |  round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0), 2) AS qty_f,
      |  round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0), 2) AS qty_o
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum("l_quantity"))
      .select(col("l_returnflag"),
        round(coalesce(col("F"), lit(0)), 2).as("qty_f"),
        round(coalesce(col("O"), lit(0)), 2).as("qty_o"))
      .orderBy("l_returnflag")
  }

  q("q_unpivot",
    """SELECT p_partkey, metric, val FROM (
      |  SELECT p_partkey, p_size::DOUBLE AS size, p_retailprice AS price FROM part)
      |UNPIVOT (val FOR metric IN (size, price))
      |ORDER BY p_partkey, metric""".stripMargin) { (s, d) =>
    t(s, d, "part")
      .select(col("p_partkey"), col("p_size").cast("double").as("size"),
        col("p_retailprice").as("price"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("price")),
        "metric", "val")
      .orderBy("p_partkey", "metric")
  }

  q("q_subquery_scalar",
    // 1.9x, not 2x: the fixture's max/avg price ratio sits just under 2
    // at sf>=0.01, so the 2x form returned 0 rows and the gate was
    // vacuous; 1.9x selects 74 / 713 / 7351 rows across the fixture SFs
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "orders").createOrReplaceTempView("subq_orders")
    s.sql("""SELECT o_orderkey, o_totalprice FROM subq_orders
             WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM subq_orders)
             ORDER BY o_orderkey""")
  }

  q("q_subquery_in",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    t(s, d, "customer").createOrReplaceTempView("subq_customer")
    t(s, d, "nation").createOrReplaceTempView("subq_nation")
    s.sql("""SELECT c_custkey, c_name FROM subq_customer
             WHERE c_nationkey IN (SELECT n_nationkey FROM subq_nation WHERE n_regionkey = 0)
             ORDER BY c_custkey""")
  }

  q("q_cte",
    // top-20 via ORDER BY + LIMIT instead of a global rank() window: the
    // (n DESC, o_custkey) sort key is unique, so the two are equivalent, and
    // Spark plans LIMIT as TakeOrderedAndProject (per-partition top-20 then a
    // single 20-row merge) where an unpartitioned window would funnel every
    // row through one task at scale.
    """WITH cust_orders AS (
      |  SELECT o_custkey, count(*) AS n, max(o_totalprice) AS max_price
      |  FROM orders GROUP BY o_custkey),
      |top20 AS (
      |  SELECT o_custkey, n, max_price FROM cust_orders
      |  ORDER BY n DESC, o_custkey LIMIT 20)
      |SELECT o_custkey, n, max_price FROM top20
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    t(s, d, "orders").createOrReplaceTempView("cte_orders")
    s.sql("""WITH cust_orders AS (
               SELECT o_custkey, count(*) AS n, max(o_totalprice) AS max_price
               FROM cte_orders GROUP BY o_custkey),
             top20 AS (
               SELECT o_custkey, n, max_price FROM cust_orders
               ORDER BY n DESC, o_custkey LIMIT 20)
             SELECT o_custkey, n, max_price FROM top20
             ORDER BY o_custkey""")
  }

  q("q_cte_recursive",
    // recursive CTE (Spark 4 WITH RECURSIVE): running date dimension
    """WITH RECURSIVE nums(n) AS (
      |  SELECT 1 UNION ALL SELECT n + 1 FROM nums WHERE n < 50)
      |SELECT n, n * n AS sq FROM nums ORDER BY n""".stripMargin) { (s, d) =>
    s.sql("""WITH RECURSIVE nums(n) AS (
               SELECT 1 UNION ALL SELECT n + 1 FROM nums WHERE n < 50)
             SELECT n, n * n AS sq FROM nums ORDER BY n""")
  }

  q("q_intersect_all",
    """SELECT c_nationkey AS nk FROM customer
      |INTERSECT ALL SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin) { (s, d) =>
    t(s, d, "customer").select(col("c_nationkey").as("nk"))
      .intersectAll(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
      .orderBy("nk")
  }

  q("q_except_all",
    """SELECT c_nationkey AS nk FROM customer
      |EXCEPT ALL SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin) { (s, d) =>
    t(s, d, "customer").select(col("c_nationkey").as("nk"))
      .exceptAll(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
      .orderBy("nk")
  }

  // --------------------------------------------------- TPC-H classic shapes

  q("q_tpch1",
    // TPC-H Q1 pricing summary: sums/averages run in DECIMAL internally
    // (exact under any accumulation order), final projection to DOUBLE for
    // a hash-stable physical type (round-1 lesson); avg = sum/count so
    // both engines divide the same exact decimal. The two product sums
    // (scale 6/4) go through a VARCHAR bridge: DuckDB's direct
    // DECIMAL→DOUBLE computes double(hugeint)/double(10^scale) — TWO
    // roundings, off by an ulp from Spark's correctly-rounded
    // BigDecimal.doubleValue once the scaled integer exceeds 2^53 (seen
    // at sf1: sums ~2.7e10 at scale 6) — while VARCHAR→DOUBLE parses
    // correctly rounded in both engines.
    """SELECT l_returnflag, l_linestatus,
      |  cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  cast(cast(sum(cast(l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l_discount AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  cast(cast(sum(cast(l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l_discount AS DECIMAL(18,2))) * (1 + cast(l_tax AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  round(cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
      |  round(cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
      |  round(cast(sum(cast(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= DATE '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    val l = t(s, d, "lineitem").filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
    def dec(c: String) = col(c).cast("decimal(18,2)")
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("double").as("sum_disc_price"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")) * (lit(1) + dec("l_tax"))).cast("double").as("sum_charge"),
        round(sum(dec("l_quantity")).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(dec("l_extendedprice")).cast("double") / count(lit(1)), 6).as("avg_price"),
        round(sum(dec("l_discount")).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  q("q_tpch3",
    // shipping-priority (Q3 shape): 3-way join + group + top-10 by revenue
    """SELECT l.l_orderkey,
      |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
      |  o.o_orderdate, o.o_orderpriority
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l.l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, d, "orders").filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val l = t(s, d, "lineitem").filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, l("l_orderkey") === o("o_orderkey"))
      .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
      .agg(round(sum(l("l_extendedprice") * (lit(1) - l("l_discount"))), 2).as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  q("q_tpch5",
    // local-supplier volume (Q5 shape): 6-way star join, dims broadcast
    """SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |GROUP BY n.n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer"); val o = t(s, d, "orders")
    val l = t(s, d, "lineitem"); val sup = t(s, d, "supplier")
    val n = t(s, d, "nation")
    val r = t(s, d, "region").filter(col("r_name") === "ASIA")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup),
        l("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(n("n_name"))
      .agg(round(sum(l("l_extendedprice") * (lit(1) - l("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  q("q_tpch10",
    // returned-item reporting (Q10 shape): top-20 customers by lost revenue
    """SELECT c.c_custkey, c.c_name,
      |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
      |  n.n_name
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE l.l_returnflag = 'R'
      |GROUP BY c.c_custkey, c.c_name, n.n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer"); val o = t(s, d, "orders")
    val n = t(s, d, "nation")
    val l = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(c("c_custkey"), c("c_name"), n("n_name"))
      .agg(round(sum(l("l_extendedprice") * (lit(1) - l("l_discount"))), 2).as("revenue"))
      .select("c_custkey", "c_name", "revenue", "n_name")
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  q("q_tpch14",
    // promotion effect (Q14 shape): conditional revenue share inside one
    // partial-aggregated pass over the date-pruned scan; part broadcasts
    """SELECT round(100.0 *
      |    sum(CASE WHEN p.p_type = 'PROMO'
      |        THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
      |    / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_shipdate >= DATE '1996-01-01'
      |  AND l.l_shipdate < DATE '1996-04-01'""".stripMargin) { (s, d) =>
    val l = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate") < lit("1996-04-01").cast("date"))
    val p = t(s, d, "part")
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(0)) / sum(rev), 4)
        .as("promo_share"))
  }

  q("q_tpch18",
    // large-volume customers (Q18 shape): the agg-subquery semi-join —
    // qualifying orderkeys come from a HAVING aggregate, then the
    // three-way join re-aggregates per (customer, order)
    """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
      |       o.o_totalprice, sum(l.l_quantity) AS total_qty
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE o.o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(l_quantity) > 300)
      |GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
      |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer"); val o = t(s, d, "orders")
    val l = t(s, d, "lineitem")
    // fresh load for the HAVING side: the same Dataset on both sides of
    // the semi-join trips the ambiguous-self-join analyzer check
    val big = t(s, d, "lineitem")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      .filter(col("q") > 300).select(col("l_orderkey").as("bigkey"))
    o.join(big, o("o_orderkey") === col("bigkey"), "left_semi")
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(c("c_name"), c("c_custkey"), o("o_orderkey"), o("o_orderdate"),
        o("o_totalprice"))
      .agg(sum(l("l_quantity")).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  q("q_tpch19",
    // discounted-revenue (Q19 shape): disjunctive brand/size/quantity
    // bands — the OR-of-conjunctions predicate Catalyst must evaluate
    // post-join while still pruning both scans to the referenced columns
    """SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
      |       AND l.l_quantity BETWEEN 1 AND 11)
      |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
      |       AND l.l_quantity BETWEEN 10 AND 20)
      |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
      |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
    val l = t(s, d, "lineitem"); val p = t(s, d, "part")
    def band(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    l.join(broadcast(p), col("p_partkey") === col("l_partkey"))
      .filter(band("Brand#12", 15, 1, 11) || band("Brand#23", 25, 10, 20) ||
        band("Brand#34", 35, 20, 30))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }

  // The fixture carries no l_commitdate/l_receiptdate/l_shipmode/c_phone
  // and no partsupp table, so the Q4/Q12/Q13/Q21/Q22 SHAPES below keep
  // their decorrelation structure (EXISTS semi, NOT EXISTS anti,
  // conditional case-sums, left-join histogram, scalar-avg subquery)
  // with lateness re-expressed as shipdate-vs-orderdate and country
  // code as a nationkey residue. The Catalyst paths exercised —
  // ExistenceJoin rewrite, null-aware anti, outer-join aggregation —
  // are the point, not the literal TPC-H constants. The r8 batch below
  // (Q2/6/7/8/9/11/15/16/17/20 shapes) completes all 22: partsupp-based
  // predicates re-express over lineitem's (partkey, suppkey) pairs, and
  // ps_supplycost as a retailprice fraction. Comparisons that gate rows
  // (Q11 HAVING, Q15 max, Q17/Q20 correlated thresholds) run in exact
  // DECIMAL with integer scaling instead of division, so no float
  // boundary can flip membership between the engines.

  q("q_tpch4",
    // order-priority checking (Q4 shape): correlated EXISTS — at least
    // one line shipped > 30 days after the order date. Catalyst must
    // decorrelate to a left-semi with the datediff predicate in the
    // join condition, never a per-order subquery
    """SELECT o.o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND date_diff('day', o.o_orderdate, l.l_shipdate) > 30)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val o = t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val l = t(s, d, "lineitem").select("l_orderkey", "l_shipdate")
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
        datediff(l("l_shipdate"), o("o_orderdate")) > 30, "leftsemi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  q("q_tpch12",
    // shipping-mode priority split (Q12 shape): one join feeding two
    // conditional counts — map-side partial aggregation of both sums in
    // a single pass, returnflag standing in for shipmode
    """SELECT l.l_returnflag,
      |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val o = t(s, d, "orders").select("o_orderkey", "o_orderpriority")
    val l = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_returnflag")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy("l_returnflag")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  q("q_tpch13",
    // customer order-count distribution (Q13 shape): LEFT join with the
    // filter INSIDE the join condition (a WHERE would drop the
    // zero-order customers the histogram exists to count), then a
    // second aggregation over the first's output
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |    AND o.o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY c.c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer").select("c_custkey")
    val o = t(s, d, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    c.join(o, c("c_custkey") === o("o_custkey") &&
        o("o_orderpriority") =!= "4-NOT SPECIFIED", "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  q("q_tpch21",
    // waiting-supplier (Q21 shape): the inventory's heaviest
    // decorrelation — EXISTS (another supplier on the order) AND NOT
    // EXISTS (another supplier shipped later): l1 is the order's
    // LAST-shipping line and the order is genuinely multi-supplier.
    // Catalyst plans semi + anti joins on the same key; the anti's
    // extra inequality rides in the join condition
    """SELECT s.s_name, count(*) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE o.o_orderstatus = 'F' AND n.n_nationkey < 13
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s.s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin) { (s, d) =>
    val li = t(s, d, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    val l1 = li.as("l1"); val l2 = li.as("l2"); val l3 = li.as("l3")
    val waited = l1
      .join(l2, col("l1.l_orderkey") === col("l2.l_orderkey") &&
        col("l1.l_suppkey") =!= col("l2.l_suppkey"), "leftsemi")
      .join(l3, col("l1.l_orderkey") === col("l3.l_orderkey") &&
        col("l1.l_suppkey") =!= col("l3.l_suppkey") &&
        col("l3.l_shipdate") > col("l1.l_shipdate"), "leftanti")
    val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      .select("o_orderkey")
    val sup = t(s, d, "supplier")
    val n = t(s, d, "nation").filter(col("n_nationkey") < 13)
    waited.join(o, col("l1.l_orderkey") === o("o_orderkey"))
      .join(broadcast(sup), col("l1.l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  q("q_tpch21_bucketed",
    // Q21 over the BUCKETED fact tables: lineitem and orders both
    // pre-bucketed (32 buckets, sorted) on the order key, so the two
    // lineitem self-joins AND the orders join are exchange-free
    // sort-merge joins over co-located buckets — the repeated-join
    // mechanism at 100 TB (write-time shuffle amortized over every
    // later Q21-shaped query; PlanQualitySpec asserts the no-exchange
    // plan). Same rows as q_tpch21 by definition; the oracle replays
    // on the flat fixture
    """SELECT s.s_name, count(*) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE o.o_orderstatus = 'F' AND n.n_nationkey < 13
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s.s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin) { (s, d) =>
    val (li, ob) = bucketedLineitemOrders(s, d)
    val l1 = li.as("l1"); val l2 = li.as("l2"); val l3 = li.as("l3")
    val waited = l1
      .join(l2, col("l1.l_orderkey") === col("l2.l_orderkey") &&
        col("l1.l_suppkey") =!= col("l2.l_suppkey"), "leftsemi")
      .join(l3, col("l1.l_orderkey") === col("l3.l_orderkey") &&
        col("l1.l_suppkey") =!= col("l3.l_suppkey") &&
        col("l3.l_shipdate") > col("l1.l_shipdate"), "leftanti")
    val o = ob.filter(col("o_orderstatus") === "F").select("o_orderkey")
    val sup = t(s, d, "supplier")
    val n = t(s, d, "nation").filter(col("n_nationkey") < 13)
    waited.join(o, col("l1.l_orderkey") === o("o_orderkey"))
      .join(broadcast(sup), col("l1.l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  q("q_tpch22",
    // lapsed high-balance customers (Q22 shape): scalar AVG subquery as
    // the threshold (2-dp bridge-rounded so the engines' summation
    // orders cannot flip a boundary customer) + NOT EXISTS recent
    // orders as a null-free anti join; country code = nationkey mod 5
    """WITH avgbal AS (
      |  SELECT round(avg(c_acctbal), 2) AS a FROM customer
      |  WHERE c_acctbal > 0.0 AND c_nationkey % 5 IN (0, 1, 2))
      |SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal FROM (
      |  SELECT c.c_nationkey % 5 AS cntrycode, c.c_acctbal
      |  FROM customer c
      |  WHERE c.c_nationkey % 5 IN (0, 1, 2)
      |    AND c.c_acctbal > (SELECT a FROM avgbal)
      |    AND NOT EXISTS (SELECT 1 FROM orders o
      |                    WHERE o.o_custkey = c.c_custkey
      |                      AND o.o_orderdate >= TIMESTAMP '1999-01-01'))
      |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer")
      .filter((col("c_nationkey") % 5).isin(0, 1, 2))
    val avgbal = c.filter(col("c_acctbal") > 0.0)
      .agg(round(avg(col("c_acctbal")), 2).as("__avgbal"))
    val recent = t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select("o_custkey")
    c.crossJoin(broadcast(avgbal)) // one-row scalar broadcast
      .filter(col("c_acctbal") > col("__avgbal"))
      .join(recent, col("c_custkey") === recent("o_custkey"), "leftanti")
      .select((col("c_nationkey") % 5).as("cntrycode"), col("c_acctbal"))
      .groupBy("cntrycode")
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy("cntrycode")
  }

  q("q_tpch6",
    // forecast-revenue change (Q6): the pure scan-side query — every
    // predicate pushes to the parquet reader, the aggregate is one
    // map-side partial + one-row final. Sum runs in DECIMAL (exact
    // under any accumulation order); the discount band compares the
    // stored doubles against the same parsed literals in both engines
    """SELECT cast(round(sum(cast(l_extendedprice AS DECIMAL(18,2))
      |                      * cast(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(18,2)")), 2)
        .cast("double").as("revenue"))
  }

  q("q_tpch7",
    // volume shipping (Q7): the symmetric nation-pair join — both
    // directions of (supp_nation, cust_nation) ride ONE plan with the
    // disjunctive pair predicate evaluated after the two broadcast
    // nation joins; revenue per (pair, ship year)
    """SELECT supp_nation, cust_nation, l_year,
      |       cast(round(sum(volume), 2) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |         year(l.l_shipdate) AS l_year,
      |         cast(l.l_extendedprice AS DECIMAL(18,2))
      |           * (1 - cast(l.l_discount AS DECIMAL(18,2))) AS volume
      |  FROM supplier s
      |  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3'))
      |    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l.l_shipdate < TIMESTAMP '1998-01-01')
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
    val l = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val o = t(s, d, "orders").select("o_orderkey", "o_custkey")
    val c = t(s, d, "customer").select("c_custkey", "c_nationkey")
    val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
    val n1 = t(s, d, "nation")
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = t(s, d, "nation")
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n1), sup("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), c("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))), 2)
        .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  q("q_tpch8",
    // national market share (Q8): one nation's share of a region's
    // import volume per order year — the conditional-sum-over-sum ratio
    // computed inside ONE aggregation pass over the 7-way star join
    // (both sums in exact DECIMAL, divided once as doubles at the end)
    """SELECT o_year,
      |  round(cast(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
      |        / cast(sum(volume) AS DOUBLE), 6) AS mkt_share
      |FROM (
      |  SELECT year(o.o_orderdate) AS o_year,
      |         cast(l.l_extendedprice AS DECIMAL(18,2))
      |           * (1 - cast(l.l_discount AS DECIMAL(18,2))) AS volume,
      |         n2.n_name AS nation
      |  FROM part p
      |  JOIN lineitem l ON p.p_partkey = l.l_partkey
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      |  JOIN region r ON n1.n_regionkey = r.r_regionkey
      |  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      |  WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY')
      |GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, d) =>
    val p = t(s, d, "part").filter(col("p_type") === "ECONOMY")
      .select("p_partkey")
    val l = t(s, d, "lineitem")
      .select("l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount")
    val o = t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    val c = t(s, d, "customer").select("c_custkey", "c_nationkey")
    val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
    val n1 = t(s, d, "nation")
      .select(col("n_nationkey").as("n1_key"), col("n_regionkey"))
    val n2 = t(s, d, "nation")
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
    val r = t(s, d, "region").filter(col("r_name") === "EUROPE")
    val vol = (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("volume")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n1), c("c_nationkey") === col("n1_key"))
      .join(broadcast(r), col("n_regionkey") === r("r_regionkey"))
      .join(broadcast(n2), sup("s_nationkey") === col("n2_key"))
      .select(year(col("o_orderdate")).as("o_year"), vol, col("nation"))
      .groupBy("o_year")
      .agg(round(
        sum(when(col("nation") === "NATION_3", col("volume"))
          .otherwise(lit("0.00").cast("decimal(18,2)"))).cast("double") /
          sum(col("volume")).cast("double"), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  q("q_tpch9",
    // product-type profit (Q9 shape): profit per supplier nation × order
    // year over the '%bolt%' part family; ps_supplycost (no partsupp in
    // the fixture) re-expressed as a fixed retail-price fraction, rounded
    // to cents BEFORE the decimal bridge so the per-unit cost is the
    // identical exact decimal in both engines
    """SELECT nation, o_year, cast(round(sum(amount), 2) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
      |    cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))
      |      - cast(round(p.p_retailprice * 0.1, 2) AS DECIMAL(18,2)) * cast(l.l_quantity AS DECIMAL(18,2)) AS amount
      |  FROM part p
      |  JOIN lineitem l ON p.p_partkey = l.l_partkey
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  WHERE p.p_name LIKE '%bolt%')
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
    val p = t(s, d, "part").filter(col("p_name").like("%bolt%"))
      .select("p_partkey", "p_retailprice")
    val l = t(s, d, "lineitem")
    val o = t(s, d, "orders").select("o_orderkey", "o_orderdate")
    val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
    val n = t(s, d, "nation")
    val amount =
      (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))) -
      (round(col("p_retailprice") * 0.1, 2).cast("decimal(18,2)") *
        col("l_quantity").cast("decimal(18,2)"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === o("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .select(n("n_name").as("nation"), year(o("o_orderdate")).as("o_year"),
        amount.as("amount"))
      .groupBy("nation", "o_year")
      .agg(round(sum(col("amount")), 2).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  q("q_tpch2",
    // min-cost supplier (Q2 shape): the correlated scalar-MIN subquery —
    // for each size-15 part, the EUROPE suppliers whose line price equals
    // the part's EUROPE-wide minimum. Catalyst decorrelates to a
    // per-part min aggregate joined back on (partkey, price-equality);
    // equality is between stored doubles (min returns a member of the
    // set), so no rounding can split the engines. DISTINCT because one
    // (part, supplier) pair can hit the minimum on several lines
    """SELECT DISTINCT p.p_partkey, p.p_brand, s.s_name,
      |       l.l_extendedprice AS price
      |FROM part p
      |JOIN lineitem l ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
      |  AND l.l_extendedprice = (
      |    SELECT min(l2.l_extendedprice)
      |    FROM lineitem l2
      |    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
      |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY p_partkey, s_name""".stripMargin) { (s, d) =>
    val p = t(s, d, "part").filter(col("p_size") === 15)
      .select("p_partkey", "p_brand")
    val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey", "s_name")
    val n = t(s, d, "nation").select("n_nationkey", "n_regionkey")
    val r = t(s, d, "region").filter(col("r_name") === "EUROPE")
      .select("r_regionkey")
    // one shared EUROPE-restricted line view; the min aggregates it per
    // part, the outer joins back on price equality — the decorrelated plan
    def euroLines = t(s, d, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    val minp = euroLines.groupBy(col("l_partkey").as("mp_partkey"))
      .agg(min("l_extendedprice").as("min_price"))
    euroLines
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(minp, col("p_partkey") === col("mp_partkey") &&
        col("l_extendedprice") === col("min_price"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"),
        col("l_extendedprice").as("price"))
      .distinct()
      .orderBy("p_partkey", "s_name")
  }

  q("q_tpch11",
    // important-stock (Q11 shape, partsupp value re-expressed as shipped
    // line value from ASIA suppliers): per-part value sums kept only when
    // above 1/1000 of the REGION TOTAL — the scalar-aggregate HAVING.
    // The threshold compares exact decimals via integer scaling
    // (sum*1000 > total), never a divided float
    """WITH v AS (
      |  SELECT l.l_partkey AS partkey,
      |         cast(l.l_extendedprice AS DECIMAL(18,2))
      |           * (1 - cast(l.l_discount AS DECIMAL(18,2))) AS val
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  WHERE r.r_name = 'ASIA')
      |SELECT partkey, cast(round(sum(val), 2) AS DOUBLE) AS part_value
      |FROM v GROUP BY partkey
      |HAVING sum(val) * 1000 > (SELECT sum(val) FROM v)
      |ORDER BY part_value DESC, partkey""".stripMargin) { (s, d) =>
    val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
    val n = t(s, d, "nation").select("n_nationkey", "n_regionkey")
    val r = t(s, d, "region").filter(col("r_name") === "ASIA")
      .select("r_regionkey")
    val v = t(s, d, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("l_partkey").as("partkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("val"))
    // v feeds both the total and the per-part sums inside ONE plan —
    // identical subtrees, so AQE reuses the exchange rather than
    // rescanning; no persist (a cached block here would leak across a
    // long-lived session, the ClassifierTrain lesson)
    val total = v.agg(sum("val").as("__total"))
    val out = v.groupBy("partkey").agg(sum("val").as("sval"))
      .crossJoin(broadcast(total)) // one-row scalar broadcast
      .filter(col("sval") * 1000 > col("__total"))
      .select(col("partkey"), round(col("sval"), 2).cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("partkey"))
    out
  }

  q("q_tpch15",
    // top supplier (Q15): revenue view over one quarter, suppliers whose
    // revenue EQUALS the view's max — the scalar-max-over-aggregate
    // shape; equality is between exact decimal sums, so ties (the reason
    // Q15 is specified with = not LIMIT 1) surface identically
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         sum(cast(l_extendedprice AS DECIMAL(18,2))
      |             * (1 - cast(l_discount AS DECIMAL(18,2)))) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name,
      |       cast(round(r.total_revenue, 2) AS DOUBLE) AS total_revenue
      |FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
      |WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val rev = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("total_revenue"))
    // rev feeds the max and the equality probe in ONE plan (identical
    // agg subtrees -> exchange reuse); persist would leak cached blocks
    val mx = rev.agg(max("total_revenue").as("__max_rev"))
    rev.crossJoin(broadcast(mx)) // one-row scalar broadcast
      .filter(col("total_revenue") === col("__max_rev"))
      .join(t(s, d, "supplier"), col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("total_revenue"), 2).cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  q("q_tpch16",
    // parts/supplier relationship (Q16 shape over lineitem pairs): count
    // DISTINCT suppliers per (brand, type, size) bucket, excluding
    // negative-balance suppliers via NOT IN — the null-free anti join —
    // with the IN-list size filter pushed to the part scan
    """SELECT p.p_brand, p.p_type, p.p_size,
      |       count(DISTINCT l.l_suppkey) AS supplier_cnt
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand <> 'Brand#45'
      |  AND p.p_type NOT IN ('PROMO', 'LARGE')
      |  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND l.l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p.p_brand, p.p_type, p.p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, d) =>
    val p = t(s, d, "part")
      .filter(col("p_brand") =!= "Brand#45" &&
        !col("p_type").isin("PROMO", "LARGE") &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val bad = t(s, d, "supplier").filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey").as("bad_suppkey"))
    t(s, d, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("l_suppkey") === col("bad_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  q("q_tpch17",
    // small-quantity-order revenue (Q17): the correlated scalar-AVG
    // threshold — lines under 20% of their part's mean quantity. The
    // comparison clears denominators (qty*5*count < sum) so it runs in
    // exact integer-valued decimals; only the final /7.0 is float
    """SELECT round(cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#23' AND p.p_type = 'MEDIUM'
      |  AND cast(l.l_quantity AS DECIMAL(18,2)) * 5
      |      * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
      |    < (SELECT sum(cast(l3.l_quantity AS DECIMAL(18,2)))
      |       FROM lineitem l3 WHERE l3.l_partkey = p.p_partkey)""".stripMargin) { (s, d) =>
    val p = t(s, d, "part")
      .filter(col("p_brand") === "Brand#23" && col("p_type") === "MEDIUM")
      .select("p_partkey")
    val perPart = t(s, d, "lineitem")
      .groupBy(col("l_partkey").as("pp_partkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        count(lit(1)).as("cnt"))
    t(s, d, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(perPart, col("p_partkey") === col("pp_partkey"))
      .filter(col("l_quantity").cast("decimal(18,2)") * 5 * col("cnt")
        < col("sum_qty"))
      .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double") / 7.0, 2).as("avg_yearly"))
  }

  q("q_tpch20",
    // potential-promotion suppliers (Q20 shape): the nested-IN chain —
    // suppliers (regions 1-3) whose 1997 shipped quantity of some 'small%'
    // part exceeds TWICE the mean per-supplier quantity of that part
    // (sq·npairs > 2·total — denominators cleared so the comparison is
    // exact integer-valued decimals, and the 2×-mean criterion keeps a
    // stable ~3% tail at EVERY sf, unlike a fixed volume share that
    // dilutes as suppliers-per-part grows). partsupp availability
    // becomes the (suppkey, partkey) pair aggregate; the correlated
    // threshold is an aggregate OVER the grouped subquery — Catalyst
    // plans semi(semi(agg join agg)) with no per-row subquery
    """SELECT s.s_name, s.s_suppkey
      |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE n.n_regionkey IN (1, 2, 3)
      |  AND s.s_suppkey IN (
      |    SELECT sp.l_suppkey FROM (
      |      SELECT l.l_suppkey, l.l_partkey,
      |             sum(cast(l.l_quantity AS DECIMAL(18,2))) AS sq
      |      FROM lineitem l
      |      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      |        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      |        AND l.l_partkey IN (
      |          SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      |      GROUP BY l.l_suppkey, l.l_partkey) sp
      |    JOIN (
      |      SELECT l_partkey, sum(sq2) AS tq, count(*) AS np FROM (
      |        SELECT l.l_partkey, l.l_suppkey,
      |               sum(cast(l.l_quantity AS DECIMAL(18,2))) AS sq2
      |        FROM lineitem l
      |        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      |          AND l.l_shipdate < TIMESTAMP '1998-01-01'
      |          AND l.l_partkey IN (
      |            SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      |        GROUP BY 1, 2)
      |      GROUP BY l_partkey) tot ON sp.l_partkey = tot.l_partkey
      |    WHERE sp.sq * tot.np > 2 * tot.tq)
      |ORDER BY s_name, s_suppkey""".stripMargin) { (s, d) =>
    val smallParts = t(s, d, "part").filter(col("p_name").like("small%"))
      .select("p_partkey")
    val pairs = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq"))
    // aggregate OF the pair aggregate — both consumers share the identical
    // pair subtree inside one plan, so the shuffle is reused, not recomputed
    val totals = pairs
      .groupBy(col("l_partkey").as("tp_partkey"))
      .agg(sum(col("sq")).as("tq"), count(lit(1)).as("np"))
    val qualifying = pairs
      .join(totals, col("l_partkey") === col("tp_partkey"))
      .filter(col("sq") * col("np") > col("tq") * 2)
      .select(col("l_suppkey").as("q_suppkey")).distinct()
    val n = t(s, d, "nation").filter(col("n_regionkey").isin(1, 2, 3))
      .select("n_nationkey")
    t(s, d, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(qualifying, col("s_suppkey") === col("q_suppkey"), "left_semi")
      .select("s_name", "s_suppkey")
      .orderBy("s_name", "s_suppkey")
  }

  q("q_fn_bitwise",
    """SELECT o_orderkey,
      |  o_orderkey & 255 AS band,
      |  o_orderkey | 1 AS orr,
      |  xor(o_orderkey, 5) AS oxor,
      |  o_orderkey << 2 AS shl,
      |  o_orderkey >> 1 AS shr
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "orders").select(
      col("o_orderkey"),
      col("o_orderkey").bitwiseAND(255).as("band"),
      col("o_orderkey").bitwiseOR(1).as("orr"),
      col("o_orderkey").bitwiseXOR(5).as("oxor"),
      expr("shiftleft(o_orderkey, 2)").as("shl"),
      expr("shiftright(o_orderkey, 1)").as("shr"))
      .orderBy("o_orderkey")
  }

  // ------------------------------------------------------------ §2.G scalar functions

  q("q_fn_string",
    """SELECT p_partkey, upper(p_brand) AS brand_u, lower(p_name) AS name_l,
      |  length(p_name) AS name_len, substr(p_type, 1, 5) AS type5,
      |  concat(p_brand, '#', cast(p_size AS VARCHAR)) AS brand_size,
      |  replace(p_type, ' ', '_') AS type_u, trim(p_name) AS name_t
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    t(s, d, "part").select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      lower(col("p_name")).as("name_l"),
      length(col("p_name")).as("name_len"),
      substring(col("p_type"), 1, 5).as("type5"),
      concat(col("p_brand"), lit("#"), col("p_size").cast("string")).as("brand_size"),
      regexp_replace(col("p_type"), " ", "_").as("type_u"),
      trim(col("p_name")).as("name_t"))
      .orderBy("p_partkey")
  }

  q("q_fn_string2",
    """SELECT p_partkey,
      |  lpad(cast(p_size AS VARCHAR), 4, '0') AS size_pad,
      |  rpad(p_brand, 12, '.') AS brand_pad,
      |  reverse(p_brand) AS brand_rev,
      |  repeat('ab', 3) AS rep,
      |  left(p_name, 3) AS l3, right(p_name, 3) AS r3,
      |  strpos(p_type, 'ED') AS pos_ed,
      |  translate(p_brand, '#', '-') AS brand_t
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    t(s, d, "part").select(
      col("p_partkey"),
      lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
      rpad(col("p_brand"), 12, ".").as("brand_pad"),
      reverse(col("p_brand")).as("brand_rev"),
      lit("ab" * 3).as("rep"),
      substring(col("p_name"), 1, 3).as("l3"),
      expr("right(p_name, 3)").as("r3"),
      expr("instr(p_type, 'ED')").as("pos_ed"),
      translate(col("p_brand"), "#", "-").as("brand_t"))
      .orderBy("p_partkey")
  }

  q("q_fn_regex",
    """SELECT p_partkey, p_type,
      |  regexp_extract(p_type, '^(\w+)', 1) AS first_word,
      |  CASE WHEN regexp_matches(p_type, 'BRUSHED|POLISHED') THEN 1 ELSE 0 END AS finished
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    t(s, d, "part").select(
      col("p_partkey"), col("p_type"),
      regexp_extract(col("p_type"), "^(\\w+)", 1).as("first_word"),
      when(col("p_type").rlike("BRUSHED|POLISHED"), 1).otherwise(0).as("finished"))
      .orderBy("p_partkey")
  }

  q("q_fn_date",
    """SELECT o_orderkey,
      |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS dom,
      |  cast(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  date_diff('day', cast(o_orderdate AS DATE), DATE '2026-01-01') AS days_to_2026,
      |  cast(o_orderdate AS DATE) + 30 AS plus30
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dom"),
      date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
      datediff(lit("2026-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2026"),
      date_add(col("o_orderdate").cast("date"), 30).as("plus30"))
      .orderBy("o_orderkey")
  }

  q("q_fn_math",
    """SELECT l_orderkey, l_linenumber,
      |  round(l_extendedprice, 1) AS p_round, abs(l_discount - 0.05) AS d_abs,
      |  cast(ceil(l_quantity) AS BIGINT) AS q_ceil,
      |  cast(floor(l_quantity) AS BIGINT) AS q_floor,
      |  round(power(l_tax + 1, 2), 6) AS tax_sq,
      |  round(ln(l_extendedprice), 6) AS p_ln,
      |  cast(cast(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS p_dec
      |FROM lineitem WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    t(s, d, "lineitem").filter(col("l_orderkey") < 100).select(
      col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice"), 1).as("p_round"),
      abs(col("l_discount") - 0.05).as("d_abs"),
      ceil(col("l_quantity")).as("q_ceil"),
      floor(col("l_quantity")).as("q_floor"),
      round(pow(col("l_tax") + 1, 2), 6).as("tax_sq"),
      round(log(col("l_extendedprice")), 6).as("p_ln"),
      // decimal rounding exercised, then back to DOUBLE for a hash-stable
      // physical type (engines disagree on decimal widening/serialization)
      col("l_extendedprice").cast("decimal(18,2)").cast("double").as("p_dec"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  q("q_fn_cast",
    """SELECT o_orderkey,
      |  cast(floor(o_totalprice) AS BIGINT) AS price_long,
      |  cast(cast(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec,
      |  cast(cast(o_orderdate AS DATE) AS VARCHAR) AS date_str,
      |  cast(o_orderkey AS DOUBLE) AS key_dbl,
      |  cast('42' AS INT) AS s2i
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "orders").select(
      col("o_orderkey"),
      // floor first: DuckDB's double→bigint cast rounds, Spark's truncates
      floor(col("o_totalprice")).cast("bigint").as("price_long"),
      // string form pins the 2-dp decimal rendering ("123.40") in both
      // engines; a raw decimal column hashes differently across engines
      col("o_totalprice").cast("decimal(18,2)").cast("string").as("price_dec"),
      col("o_orderdate").cast("date").cast("string").as("date_str"),
      col("o_orderkey").cast("double").as("key_dbl"),
      lit("42").cast("int").as("s2i"))
      .orderBy("o_orderkey")
  }

  q("q_fn_cond",
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 250000 THEN 'high'
      |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket,
      |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_x
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "orders").select(
      col("o_orderkey"),
      when(col("o_totalprice") > 250000, "high")
        .when(col("o_totalprice") > 100000, "mid")
        .otherwise("low").as("bucket"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_x"))
      .orderBy("o_orderkey")
  }

  q("q_fn_json",
    // from_json with an explicit schema parses each document ONCE into a
    // struct (get_json_object re-parses per extracted key — the wrong
    // idiom as soon as a second key is ever pulled)
    """SELECT event_id, cast(json_extract(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    // the field parses as STRING then casts: a LongType field would
    // PERMISSIVE-null a string-encoded number ({"k": "12"}) where the
    // oracle's json_extract::BIGINT still yields 12 — string-then-cast
    // accepts both encodings identically in both engines
    t(s, d, "events").select(
      col("event_id"),
      from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType))))
        .getField("k").cast("bigint").as("k"))
      .orderBy("event_id")
  }

  q("q_fn_map",
    // MAP-type surface: construct from arrays, element access, size,
    // key listing — scalars out so both engines hash identically
    // (map_extract returns a LIST in DuckDB; [1] takes the element)
    """WITH m AS (
      |  SELECT o_orderkey,
      |    MAP(['key', 'cust'], [o_orderkey, o_custkey]) AS mp
      |  FROM orders)
      |SELECT o_orderkey,
      |  CAST(map_extract(mp, 'key')[1] AS BIGINT) AS v_key,
      |  CAST(map_extract(mp, 'cust')[1] AS BIGINT) AS v_cust,
      |  CAST(cardinality(mp) AS BIGINT) AS m_size,
      |  array_to_string(map_keys(mp), ',') AS m_keys
      |FROM m ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val mp = map_from_arrays(
      array(lit("key"), lit("cust")),
      array(col("o_orderkey"), col("o_custkey")))
    t(s, d, "orders").select(
      col("o_orderkey"),
      element_at(mp, "key").as("v_key"),
      element_at(mp, "cust").as("v_cust"),
      size(mp).cast("long").as("m_size"),
      array_join(map_keys(mp), ",").as("m_keys"))
      .orderBy("o_orderkey")
  }

  q("q_fn_array",
    // split -> array ops -> explode; word histogram is fully deterministic
    """SELECT w.word, count(*) AS n
      |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part) w
      |WHERE w.word <> ''
      |GROUP BY w.word ORDER BY w.word""".stripMargin) { (s, d) =>
    t(s, d, "part")
      .select(explode(split(col("p_name"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy("word")
  }

  q("q_fn_array_ops",
    """SELECT p_partkey,
      |  len(string_split(p_name, ' ')) AS n_words,
      |  list_contains(string_split(p_type, ' '), 'BRUSHED') AS has_brushed,
      |  string_split(p_name, ' ')[1] AS first_word
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    t(s, d, "part").select(
      col("p_partkey"),
      size(split(col("p_name"), " ")).as("n_words"),
      array_contains(split(col("p_type"), " "), "BRUSHED").as("has_brushed"),
      element_at(split(col("p_name"), " "), 1).as("first_word"))
      .orderBy("p_partkey")
  }

  q("q_fn_struct",
    // build a nested struct, then access fields at two depths
    """SELECT p_partkey,
      |  {'num': p_size, 'inner': {'brand': p_brand}}.num AS num,
      |  {'num': p_size, 'inner': {'brand': p_brand}}.inner.brand AS brand
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    t(s, d, "part")
      .withColumn("s", struct(col("p_size").as("num"),
        struct(col("p_brand").as("brand")).as("inner")))
      .select(col("p_partkey"), col("s.num").as("num"),
        col("s.inner.brand").as("brand"))
      .orderBy("p_partkey")
  }

  q("q_project_reorder",
    // reorder_columns analog (meta.py:290-298) as a projection
    """SELECT n_name, n_regionkey, n_nationkey FROM nation
      |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
    t(s, d, "nation").select("n_name", "n_regionkey", "n_nationkey")
      .orderBy("n_nationkey")
  }

  // ------------------------------------------------------------ §2.J streaming (batch-mode windows)

  q("q_stream_tumbling",
    // decimal accumulation (exact), DOUBLE final projection (hash-stable)
    """SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n,
      |  cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
    t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))
      .orderBy("window_start", "event_type")
  }

  q("q_stream_sliding",
    // 1h windows sliding every 15min = union of 4 offset tumbling buckets
    """WITH slid AS (
      |  SELECT date_trunc('hour', ts - o.off * INTERVAL 1 MINUTE) + o.off * INTERVAL 1 MINUTE AS ws, value
      |  FROM events CROSS JOIN (SELECT unnest([0, 15, 30, 45]) AS off) o)
      |SELECT ws AS window_start, count(*) AS n
      |FROM slid GROUP BY ws ORDER BY window_start""".stripMargin) { (s, d) =>
    t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))
      .orderBy("window_start")
  }

  q("q_stream_session",
    // session windows (30 min gap) per user; oracle = gaps-and-islands
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |islands AS (
      |  SELECT user_id, ts,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
      |FROM islands GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    t(s, d, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min("ts").as("session_start"))
      .select(col("user_id"), col("session_start"), col("n_events"))
      .orderBy("user_id", "session_start")
  }

  q("q_dedup_watermark",
    // duplicate-event drop, batch equivalent: keep first by event time
    """SELECT user_id, event_type, min(event_id) AS first_event, count(*) AS dups
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    t(s, d, "events")
      .groupBy("user_id", "event_type")
      .agg(min("event_id").as("first_event"), count(lit(1)).as("dups"))
      .orderBy("user_id", "event_type")
  }

  // ------------------------------------------------------------ §2.H validation

  q("q_check_nullable",
    """SELECT count(*) FILTER (WHERE o_custkey IS NULL) AS o_custkey_null,
      |       count(*) FILTER (WHERE o_orderdate IS NULL) AS o_orderdate_null
      |FROM orders""".stripMargin) { (s, d) =>
    t(s, d, "orders").agg(
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("o_custkey_null"),
      sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("o_orderdate_null"))
  }

  q("q_check_enum",
    // rows outside a declared enum (here a deliberately narrow one so the
    // check yields real violations)
    """SELECT l_returnflag, count(*) AS n_violations FROM lineitem
      |WHERE l_returnflag NOT IN ('A', 'N')
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .filter(!col("l_returnflag").isin("A", "N"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_violations"))
      .orderBy("l_returnflag")
  }

  q("q_check_pattern",
    """SELECT count(*) FILTER (WHERE NOT regexp_matches(p_brand, '^Brand#\d+$')) AS brand_bad,
      |       count(*) FILTER (WHERE NOT regexp_matches(cast(p_size AS VARCHAR), '^\d+$')) AS size_bad
      |FROM part""".stripMargin) { (s, d) =>
    t(s, d, "part").agg(
      sum(when(!col("p_brand").rlike("^Brand#\\d+$"), 1L).otherwise(0L)).as("brand_bad"),
      sum(when(!col("p_size").cast("string").rlike("^\\d+$"), 1L).otherwise(0L)).as("size_bad"))
  }

  q("q_check_fk",
    // referential integrity over the declared star edges: orphan child
    // rows per FK walk (left-anti join per edge; null FKs excluded —
    // that's q_check_nullable's job). Both fixture edges are clean, so a
    // regression MAKING orphans flips the counts, and the synthetic
    // third edge (orders -> even-keyed customers) proves nonzero counts
    // flow through
    """SELECT * FROM (
      |  SELECT 'lineitem.l_orderkey->orders' AS fk, count(*) AS n_orphans
      |  FROM lineitem l WHERE l.l_orderkey IS NOT NULL
      |    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'orders.o_custkey->customer', count(*)
      |  FROM orders t WHERE t.o_custkey IS NOT NULL
      |    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = t.o_custkey)
      |  UNION ALL
      |  SELECT 'orders.o_custkey->even_customers', count(*)
      |  FROM orders t WHERE t.o_custkey IS NOT NULL
      |    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = t.o_custkey
      |                    AND c.c_custkey % 2 = 0))
      |ORDER BY fk""".stripMargin) { (s, d) =>
    import graft.validate.Validate.orphanCount
    val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
    val c = t(s, d, "customer")
    orphanCount(li, "l_orderkey", o.select(col("o_orderkey")), "o_orderkey",
        "lineitem.l_orderkey->orders")
      .unionByName(orphanCount(o, "o_custkey", c.select(col("c_custkey")),
        "c_custkey", "orders.o_custkey->customer"))
      .unionByName(orphanCount(o, "o_custkey",
        c.filter(col("c_custkey") % 2 === 0).select(col("c_custkey")),
        "c_custkey", "orders.o_custkey->even_customers"))
      .orderBy("fk")
  }

  q("q_check_pk",
    // duplicate primary-key groups (meta.py:178-191 declared; we enforce)
    """SELECT l_orderkey, l_linenumber, count(*) AS n FROM lineitem
      |GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    graft.validate.Validate.duplicatePkGroups(
        t(s, d, "lineitem"), Seq("l_orderkey", "l_linenumber"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  q("q_redact",
    // non-sensitive view: drop the redacted column, sha2-mask the sensitive
    """SELECT c_custkey, sha256(c_name) AS c_name, c_mktsegment FROM customer
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    import graft.meta.ColumnMeta
    val meta = graft.meta.TableMeta("customer", "customer/", Seq(
      ColumnMeta("c_custkey", "long"),
      ColumnMeta("c_name", "character", sensitivity = Some("personal_data")),
      ColumnMeta("c_nationkey", "int"),
      ColumnMeta("c_acctbal", "double", redacted = Some(true)),
      ColumnMeta("c_mktsegment", "character")))
    graft.validate.Validate.redactedView(
        t(s, d, "customer").select("c_custkey", "c_name", "c_nationkey",
          "c_acctbal", "c_mktsegment"), meta)
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  // --- privacy / disclosure-risk audits (EXT §2.K: Privacy.scala) ----------
  // q_redact enforces the MASKING half of the reference's sensitivity
  // metadata (meta.py:211-220); these audit the unmasked remainder.

  q("q_privacy_kanon",
    // k-anonymity audit (k=5): quasi-identifier classes (nation, segment,
    // 2000-wide acctbal band) small enough to re-identify. All-integer
    // output; floor(c_acctbal/2000) is the same IEEE division+floor in
    // both engines (negative balances land in the -2000 band identically)
    """SELECT c_nationkey, c_mktsegment,
      |  CAST(floor(c_acctbal / 2000) * 2000 AS BIGINT) AS acctbal_band,
      |  count(*) AS n
      |FROM customer
      |GROUP BY 1, 2, 3 HAVING count(*) < 5
      |ORDER BY n, c_nationkey, c_mktsegment, acctbal_band""".stripMargin) { (s, d) =>
    graft.operators.Privacy.kAnonymityAudit(
      t(s, d, "customer").withColumn("acctbal_band",
        (floor(col("c_acctbal") / 2000) * 2000).cast("long"))
        .select("c_nationkey", "c_mktsegment", "acctbal_band"),
      Seq("c_nationkey", "c_mktsegment", "acctbal_band"), k = 5)
  }

  q("q_privacy_ldiv",
    // l-diversity audit (l=4) over the joined sensitive attribute: QI
    // classes whose members' order priorities take < 4 distinct values —
    // membership alone leaks the sensitive column there, even where
    // k-anonymity holds
    """SELECT c_nationkey, c_mktsegment,
      |  CAST(floor(c_acctbal / 2000) * 2000 AS BIGINT) AS acctbal_band,
      |  count(DISTINCT o_orderpriority) AS distinct_sensitive, count(*) AS n
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY 1, 2, 3 HAVING count(DISTINCT o_orderpriority) < 4
      |ORDER BY distinct_sensitive, n, c_nationkey, c_mktsegment, acctbal_band""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer").withColumn("acctbal_band",
      (floor(col("c_acctbal") / 2000) * 2000).cast("long"))
    graft.operators.Privacy.lDiversityAudit(
      c.join(t(s, d, "orders"), c("c_custkey") === col("o_custkey"))
        .select("c_nationkey", "c_mktsegment", "acctbal_band",
          "o_orderpriority"),
      Seq("c_nationkey", "c_mktsegment", "acctbal_band"),
      sensitive = "o_orderpriority", l = 4)
  }

  q("q_privacy_ladder",
    // generalization ladder: ONE pass evaluating every candidate acctbal
    // bucket width; per width the class count, k=5 violations, smallest
    // class, and row mass needing suppression — the table a data owner
    // reads to pick the cheapest anonymizing width (500 here: 0
    // violations where width=100 suppresses 1083 rows at sf0.01)
    """WITH classes AS (
      |  SELECT w.width, c.c_mktsegment,
      |    CAST(floor(c.c_acctbal / w.width) * w.width AS BIGINT) AS bucket,
      |    count(*) AS n
      |  FROM customer c CROSS JOIN (SELECT unnest([100::BIGINT, 500::BIGINT, 2500::BIGINT, 12500::BIGINT]) AS width) w
      |  GROUP BY 1, 2, 3)
      |SELECT width, count(*) AS classes,
      |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS violating_classes,
      |  min(n) AS min_class,
      |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS suppressed_rows
      |FROM classes GROUP BY width ORDER BY width""".stripMargin) { (s, d) =>
    graft.operators.Privacy.generalizationLadder(
      t(s, d, "customer").select("c_mktsegment", "c_acctbal"),
      Seq("c_mktsegment"), numCol = "c_acctbal",
      widths = Seq(100L, 500L, 2500L, 12500L), k = 5)
  }

  q("q_privacy_pseudonym",
    // deterministic keyed pseudonymization — the TRANSFORM half of the
    // privacy family (audits find the risk, redaction destroys joins,
    // this preserves them): the same salted sha-256 token replaces the
    // customer key in BOTH tables, and the join/aggregation runs on
    // tokens alone — raw keys never reach the output. Top customers by
    // order count, keyed only by token; the oracle replays the salted
    // hash (identical canonical integer-to-string cast both engines)
    """WITH c AS (
      |  SELECT sha256('graft-r9:' || CAST(c_custkey AS VARCHAR)) AS cust_token,
      |    c_mktsegment
      |  FROM customer),
      |o AS (
      |  SELECT sha256('graft-r9:' || CAST(o_custkey AS VARCHAR)) AS cust_token
      |  FROM orders)
      |SELECT c.cust_token AS cust_token, c.c_mktsegment, count(*) AS n_orders
      |FROM o JOIN c ON o.cust_token = c.cust_token
      |GROUP BY 1, 2
      |ORDER BY n_orders DESC, c.cust_token LIMIT 50""".stripMargin) { (s, d) =>
    val c = graft.operators.Privacy.pseudonymize(
        t(s, d, "customer").select(col("c_custkey").as("cust_token"),
          col("c_mktsegment")),
        Seq("cust_token"), salt = "graft-r9")
    val o = graft.operators.Privacy.pseudonymize(
        t(s, d, "orders").select(col("o_custkey").as("cust_token")),
        Seq("cust_token"), salt = "graft-r9")
    o.join(c, Seq("cust_token"))
      .groupBy("cust_token", "c_mktsegment")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("cust_token"))
      .limit(50)
  }

  // catalog-shape query: cross-table type alignment over inferred schemas
  // (meta.py:878-916 semantics over the fixture warehouse). The oracle
  // replays it with DuckDB's own schema introspection (DESCRIBE on the
  // registered views) plus the same physical→agnostic type mapping
  // AgnosticType.print applies to the Spark schema — engine-independent
  // because both sides derive types from the SAME parquet footers, and
  // every physical type in play maps 1:1 (TIMESTAMP/TIMESTAMP_NS both →
  // datetime, mirroring TimestampType|TimestampNTZType → datetime).
  q("q_meta_type_align", {
    val mapT = (e: String) =>
      s"""CASE $e WHEN 'VARCHAR' THEN 'character' WHEN 'INTEGER' THEN 'int'
         |  WHEN 'BIGINT' THEN 'long' WHEN 'DOUBLE' THEN 'double'
         |  WHEN 'FLOAT' THEN 'float' WHEN 'DATE' THEN 'date'
         |  WHEN 'BOOLEAN' THEN 'boolean' WHEN 'BLOB' THEN 'binary'
         |  ELSE CASE WHEN $e LIKE 'TIMESTAMP%' THEN 'datetime'
         |            ELSE lower($e) END END""".stripMargin
    val occ = graft.sources.Tables.all.map(t =>
      s"SELECT column_name, column_type FROM (DESCRIBE $t)").mkString("\n  UNION ALL ")
    s"""WITH occ AS (
       |  $occ),
       |m AS (SELECT column_name,
       |  CASE WHEN column_type LIKE '%[]'
       |       THEN 'array<' || ${mapT("rtrim(column_type, '[]')")} || '>'
       |       ELSE ${mapT("column_type")} END AS col_type
       |  FROM occ)
       |SELECT column_name, count(DISTINCT col_type) AS n_types,
       |  count(*) AS n_tables
       |FROM m GROUP BY column_name ORDER BY column_name""".stripMargin
  }) { (s, d) =>
    import s.implicits._
    // the query's cost is ten driver-side footer/schema reads, nothing
    // else — sequential they dominate the bench entry (~1.5 s steady);
    // read them concurrently (plan-only work). The events loader
    // MUTATES session conf (nanosAsLong) before its read, so it runs
    // FIRST on the calling thread — racing that set against nine
    // concurrent analyses reading the same SQLConf would make the
    // events schema read fail timing-dependently.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    def fields(name: String): Seq[(String, String, String)] = {
      // pool threads have no active session; pin it so any
      // session-thread-local dependency a future loader grows (conf
      // reads, analysis helpers) resolves to THIS session instead of
      // failing timing-dependently. events stays the only loader that
      // MUTATES conf, and it runs first on the calling thread.
      org.apache.spark.sql.SparkSession.setActiveSession(s)
      Tables.load(s, d, name).schema.fields.map { f =>
        (f.name, name, graft.types.AgnosticType.print(f.dataType))
      }.toSeq
    }
    val eventsOcc = fields("events")
    val occurrences = Await.result(
      Future.sequence(Tables.all.filterNot(_ == "events")
        .map(name => Future(fields(name)))),
      scala.concurrent.duration.Duration(120, "s")).flatten ++ eventsOcc
    occurrences.toDF("column_name", "table_name", "col_type")
      .groupBy("column_name")
      .agg(countDistinct("col_type").as("n_types"),
        count(lit(1)).as("n_tables"))
      .orderBy("column_name")
  }

  q("q_meta_schema_drift", {
    val mapT = (e: String) =>
      s"""CASE $e WHEN 'VARCHAR' THEN 'character' WHEN 'INTEGER' THEN 'int'
         |  WHEN 'BIGINT' THEN 'long' WHEN 'DOUBLE' THEN 'double'
         |  WHEN 'FLOAT' THEN 'float' WHEN 'DATE' THEN 'date'
         |  WHEN 'BOOLEAN' THEN 'boolean' WHEN 'BLOB' THEN 'binary'
         |  ELSE CASE WHEN $e LIKE 'TIMESTAMP%' THEN 'datetime'
         |            ELSE lower($e) END END""".stripMargin
    // drift between the documents snapshot and a "next version" of it:
    // source dropped, n_chars narrowed to int, quality added — all four
    // statuses exercised; the oracle DESCRIBEs the same two shapes
    s"""WITH l AS (SELECT column_name, ${mapT("column_type")} AS t
       |  FROM (DESCRIBE documents)),
       |r AS (SELECT column_name, ${mapT("column_type")} AS t
       |  FROM (DESCRIBE (SELECT doc_id, text, lang,
       |    CAST(n_chars AS INTEGER) AS n_chars,
       |    CAST(1.0 AS DOUBLE) AS quality FROM documents))),
       |j AS (SELECT coalesce(l.column_name, r.column_name) AS column_name,
       |        l.t AS type_left, r.t AS type_right
       |      FROM l FULL JOIN r ON l.column_name = r.column_name)
       |SELECT column_name, type_left, type_right,
       |  CASE WHEN type_left IS NULL THEN 'added'
       |       WHEN type_right IS NULL THEN 'removed'
       |       WHEN type_left = type_right THEN 'unchanged'
       |       ELSE 'retyped' END AS status
       |FROM j ORDER BY column_name""".stripMargin
  }) { (s, d) =>
    val docs = t(s, d, "documents")
    val next = docs.select(col("doc_id"), col("text"), col("lang"),
      col("n_chars").cast("int").as("n_chars"),
      lit(1.0).as("quality"))
    graft.catalog.GraftCatalog.schemaDiff(s, docs.schema, next.schema)
      .orderBy("column_name")
  }

  // ------------------------------------------------------------ §2.K LLM-pipeline ops

  q("q_dedup_exact",
    """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_docs
      |FROM documents GROUP BY md5(text) ORDER BY content_hash""".stripMargin) { (s, d) =>
    graft.operators.Dedup.exactGroups(t(s, d, "documents"), "doc_id", "text")
      .orderBy("content_hash")
  }

  q("q_dedup_ngram",
    // exact 3-gram-shingle Jaccard near-dup pairs; the oracle mirrors the
    // shingling (lowercase, distinct, word 3-grams) and the df>=2 block
    """WITH words AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w)-1, 1))])) AS s
      |  FROM words),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |shared AS (SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND 100),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      |  FROM (SELECT * FROM sh WHERE s IN (SELECT s FROM shared)) a
      |  JOIN (SELECT * FROM sh WHERE s IN (SELECT s FROM shared)) b USING (s)
      |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  CAST(round(CAST(CAST((n_common * 1.0 / (sa.n + sb.n - n_common)) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS jaccard
      |FROM pairs
      |JOIN sizes sa ON id_a = sa.doc_id
      |JOIN sizes sb ON id_b = sb.doc_id
      |WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    graft.operators.Dedup.ngramJaccardPairsFrom(
        sharedShingles(s, d), threshold = 0.8, maxShingleDf = 100L)
      .withColumn("jaccard", round(col("jaccard"), 6))
      .orderBy("id_a", "id_b")
  }

  /** The shared brute-force oracle of the three q_join_setsim* gates —
    * all-pairs token-set Jaccard with the threshold gated in
    * cleared-denominator integers; ONE builder so a tokenizer or
    * rounding-chain fix cannot silently diverge one gate's oracle from
    * the other two. `where` restricts the corpus stratum (must match
    * the Spark side's filter verbatim in semantics). */
  private def setsimOracleSql(tNum: Int, tDen: Int, where: String = ""): String =
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents$where),
      |sets AS (
      |  SELECT doc_id, list_distinct(
      |    list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS toks
      |  FROM corpus),
      |ne AS (
      |  SELECT doc_id, toks, len(toks)::BIGINT AS sz FROM sets WHERE len(toks) > 0),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    len(list_intersect(a.toks, b.toks))::BIGINT AS ix,
      |    a.sz AS sz_a, b.sz AS sz_b
      |  FROM ne a JOIN ne b ON a.doc_id < b.doc_id)
      |SELECT id_a, id_b, ix, sz_a, sz_b,
      |  CAST(round(CAST(CAST((ix * 1.0 / (sz_a + sz_b - ix)) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS jaccard
      |FROM pairs
      |WHERE ix * $tDen >= $tNum * (sz_a + sz_b - ix)
      |ORDER BY id_a, id_b""".stripMargin

  q("q_join_setsim",
    // EXACT set-similarity self-join (auto-dispatch; 19/20 on this
    // corpus profiles to the FastSS deletion-neighborhood path —
    // spec-pinned in SetSimJoinSpec): every document pair whose
    // token-set Jaccard >= 19/20, with the exact
    // similarity — the deterministic complement of q_dedup_minhash
    // (which trades recall for banding speed) and of q_dedup_ngram
    // (which blocks on shared shingles with a df cap, an approximation
    // under hot shingles). The oracle replays BRUTE FORCE — all pairs,
    // no prefix filter — so a pass certifies the pigeonhole bound loses
    // nothing, boundary pairs included (the threshold is the rational
    // 19/20 and both engines gate in cleared-denominator integers, so
    // no float rounding can flip a pair at exactly 0.95)
    setsimOracleSql(tNum = 19, tDen = 20)) { (s, d) =>
    graft.operators.SetSimJoin.jaccardJoin(
        t(s, d, "documents"), "doc_id", "text", tNum = 19, tDen = 20)
      .orderBy("id_a", "id_b")
  }

  q("q_join_setsim_partition",
    // the same exact join at 17/20 over the doc_id ≡ 0 (mod 3) stratum
    // — the regime where jaccardJoin's profile dispatches to UNIVERSE
    // PARTITIONING (kMax = 4 > 1 rules out deletion; D = 2·szMax·3/37+1
    // = 6 ≤ szMin keeps it — a size filter can only RAISE szMin, so the
    // stratum preserves the regime): the vocabulary is hashed into D
    // groups and a qualifying pair's ≤ Δmax differing tokens leave one
    // group projection-identical. The stratum keeps the 17/20 answer
    // (~1.7 M pairs corpus-wide at the bench SF) bench-sized without
    // touching the dispatch. Registered separately from q_join_setsim
    // (which dispatches to deletion at 19/20) so the driver gate
    // certifies THIS strategy's no-loss property against the same
    // brute-force replay; SetSimJoinSpec pins the dispatch so fixture
    // drift cannot silently swap the certified path. Oracle = brute
    // force, boundary pairs gated in integers.
    setsimOracleSql(tNum = 17, tDen = 20, where = " WHERE doc_id % 3 = 0")) { (s, d) =>
    graft.operators.SetSimJoin.jaccardJoin(
        t(s, d, "documents").filter(col("doc_id") % 3 === 0),
        "doc_id", "text", tNum = 17, tDen = 20)
      .orderBy("id_a", "id_b")
  }

  q("q_join_setsim_prefix",
    // the same exact join at 3/5 over the doc_id ≡ 0 (mod 10) stratum —
    // the low-threshold regime where jaccardJoin dispatches to PPJOIN
    // PREFIX FILTERING (kMax ≈ 12 rules out deletion; D = 16 > szMin
    // rules out partitioning): rare-first token order, prefix length
    // sz − ceil(t·sz) + 1, pigeonhole makes the prefix equi-join
    // lossless. The stratum keeps the low-threshold answer (and the
    // all-pairs oracle) bench-sized while leaving the dispatch profile
    // in the prefix regime at every fixture SF (spec-pinned). Oracle =
    // brute force over the same stratum.
    setsimOracleSql(tNum = 3, tDen = 5, where = " WHERE doc_id % 10 = 0")) { (s, d) =>
    graft.operators.SetSimJoin.jaccardJoin(
        t(s, d, "documents").filter(col("doc_id") % 10 === 0),
        "doc_id", "text", tNum = 3, tDen = 5)
      .orderBy("id_a", "id_b")
  }

  q("q_join_setsim_stratified",
    // the same exact join at 9/10 over the doc_id ≡ 1 (mod 3) stratum
    // PLUS one injected 2-token doc — the regime where jaccardJoin's
    // profile dispatches to the SIZE-STRATIFIED hybrid (kMax ≥ 2 rules
    // out deletion; the tiny doc drags szMin under D ruling out plain
    // partitioning; the band bound ⌊(D−1)·10/9⌋ keeps a worst-case
    // deletion budget ≤ 1, so partitioning over sz ≥ D plus deletion
    // over the band, overlap deduped by size, is the complete exact
    // answer). This was the r11 dispatch path with NO driver-visible
    // gate (certified only in sbt scope — the blind-spot class the r10
    // verdict ranked #1): the fourth strategy now has its own
    // CORRECTNESS row against the same brute-force replay, dispatch
    // spec-pinned at sf0.001/0.01/0.1 in SetSimJoinSpec. The injected
    // doc's tokens are outside the corpus vocabulary and a 9/10 partner
    // would need size ≤ 2, so it adds no pairs — it exists purely to
    // flip the dispatch the way one real tiny document would.
    setsimOracleSql(tNum = 9, tDen = 10,
      where = " WHERE doc_id % 3 = 1 UNION ALL SELECT -1, 'aardvark zyzzyva'")) { (s, d) =>
    import s.implicits._
    graft.operators.SetSimJoin.jaccardJoin(
        t(s, d, "documents").filter(col("doc_id") % 3 === 1)
          .select("doc_id", "text")
          .unionByName(Seq((-1L, "aardvark zyzzyva")).toDF("doc_id", "text")),
        "doc_id", "text", tNum = 9, tDen = 10)
      .orderBy("id_a", "id_b")
  }

  q("q_dedup_clusters",
    // connected components over the near-dup pairs; the oracle computes
    // min-reachable-id per node via a recursive transitive closure
    """WITH RECURSIVE words AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w)-1, 1))])) AS s
      |  FROM words),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |shared AS (SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND 100),
      |cp AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      |  FROM (SELECT * FROM sh WHERE s IN (SELECT s FROM shared)) a
      |  JOIN (SELECT * FROM sh WHERE s IN (SELECT s FROM shared)) b USING (s)
      |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM cp
      |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.8),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |labels AS (
      |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u)
      |SELECT doc_id, cluster_id FROM labels ORDER BY doc_id""".stripMargin) { (s, d) =>
    sharedClusterLabels(s, d).orderBy("doc_id")
  }

  q("q_dedup_keep_best",
    // near-dup collapse with quality-aware survivor choice: cluster the
    // ngram-Jaccard pairs (singletons = own cluster), keep the
    // HIGHEST-quality member per cluster, ties by lowest id. Survivor
    // choice is two keyed aggs (max score, then min id among maximal) —
    // never a per-cluster window sort. The oracle replays the recursive
    // transitive closure plus the 4-dp quality blend.
    """WITH RECURSIVE words AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w)-1, 1))])) AS s
      |  FROM words),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |shared AS (SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND 100),
      |cp AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      |  FROM (SELECT * FROM sh WHERE s IN (SELECT s FROM shared)) a
      |  JOIN (SELECT * FROM sh WHERE s IN (SELECT s FROM shared)) b USING (s)
      |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM cp
      |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.8),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |labels AS (
      |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u),
      |lab AS (
      |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
      |  FROM documents d LEFT JOIN labels l USING (doc_id)),
      |base AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS lt,
      |    length(text)::DOUBLE AS n_chars,
      |    (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE AS punct
      |  FROM documents),
      |qual AS (
      |  SELECT doc_id,
      |    round((round((n_chars - punct * 2) / greatest(n_chars, 1.0), 4)
      |      + round(least(len(list_intersect(lt,
      |          ['the','and','of','to','in','is','that','it','for','was']))::DOUBLE
      |        / greatest(len(toks), 1) * 5, 1.0), 4)
      |      + round(least(len(toks) / 100.0, 1.0), 4)) / 3, 4) AS quality
      |  FROM base),
      |j AS (
      |  SELECT lab.cluster_id, lab.doc_id, qual.quality
      |  FROM lab JOIN qual USING (doc_id)),
      |best AS (
      |  SELECT cluster_id, max(quality) AS best_quality, count(*) AS n_members
      |  FROM j GROUP BY cluster_id)
      |SELECT b.cluster_id, min(j.doc_id) AS keep_id, b.best_quality, b.n_members
      |FROM j JOIN best b ON j.cluster_id = b.cluster_id AND j.quality = b.best_quality
      |GROUP BY 1, 3, 4
      |ORDER BY b.cluster_id""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents")
    val scores = graft.operators.TextAnalysis
      .qualityScore(docs, "doc_id", "text")
      .select("doc_id", "quality")
    graft.operators.Dedup.keepBestFromLabels(
        docs, sharedClusterLabels(s, d), scores, "doc_id", "quality")
      .orderBy("cluster_id")
  }

  q("q_decontaminate",
    // benchmark-contamination check: corpus docs (doc_id % 97 != 0)
    // sharing at least one word 3-gram with the held-out eval set
    // (doc_id % 97 = 0), with the distinct-shingle hit count. The eval
    // side is tiny and broadcast; the corpus side never shuffles.
    """WITH words AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w)-1, 1))])) AS s
      |  FROM words),
      |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
      |SELECT doc_id, count(*) AS n_hits
      |FROM sh
      |WHERE doc_id % 97 <> 0 AND s IN (SELECT s FROM ev)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val sh = sharedShingles(s, d)
    graft.operators.Dedup.contaminationHits(
        sh.filter(col("doc_id") % 97 =!= 0),
        sh.filter(col("doc_id") % 97 === 0))
      .orderBy("doc_id")
  }

  q("q_decontaminate_semantic",
    // the EMBEDDING-space contamination check (a paraphrased eval item
    // shares no 3-gram but sits next to its source in embedding space):
    // corpus vectors (vec_id >= 50) with cosine >= 0.35 to ANY eval
    // vector (vec_id < 50). Exact by construction — decontamination
    // must not hinge on blocking recall — the small eval side
    // broadcasts and the corpus never shuffles
    """SELECT c.vec_id, count(*) AS n_hits,
      |  max(round(list_cosine_similarity(c.embedding::DOUBLE[],
      |    e.embedding::DOUBLE[]), 6)) AS max_cos
      |FROM embeddings c JOIN embeddings e
      |  ON c.vec_id >= 50 AND e.vec_id < 50
      | AND round(list_cosine_similarity(c.embedding::DOUBLE[],
      |       e.embedding::DOUBLE[]), 6) >= 0.35
      |GROUP BY c.vec_id ORDER BY c.vec_id""".stripMargin) { (s, d) =>
    val emb = t(s, d, "embeddings")
    graft.operators.Similarity.semanticContaminationHits(
        emb.filter(col("vec_id") >= 50),
        emb.filter(col("vec_id") < 50),
        "vec_id", "embedding", threshold = 0.35)
      .orderBy("vec_id")
  }

  q("q_decontaminate_bloom",
    // same contamination semantics through the Bloom semi-join reduction:
    // ~10 bits/shingle broadcast + map-side might-contain prefilter, so
    // only candidate corpus shingles ever reach the (unhinted) confirm
    // join — the formulation for eval sets too big to broadcast exactly.
    // Bloom false positives die in the exact join, so the oracle is the
    // same SQL as q_decontaminate.
    """WITH words AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w)-1, 1))])) AS s
      |  FROM words),
      |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
      |SELECT doc_id, count(*) AS n_hits
      |FROM sh
      |WHERE doc_id % 97 <> 0 AND s IN (SELECT s FROM ev)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val sh = sharedShingles(s, d)
    graft.operators.Dedup.contaminationHitsBloom(
        sh.filter(col("doc_id") % 97 =!= 0),
        sh.filter(col("doc_id") % 97 === 0))
      .orderBy("doc_id")
  }

  q("q_dedup_incremental",
    // dedup NEW docs (odd ids) against the EXISTING corpus (even ids):
    // exact hash anti-join + ngram-Jaccard vs existing only — the
    // existing×existing quadrant is never compared
    """WITH existing AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
      |newdocs AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
      |exact_surv AS (
      |  SELECT * FROM newdocs
      |  WHERE md5(text) NOT IN (SELECT md5(text) FROM existing)),
      |words_n AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM exact_surv),
      |sh_n AS (SELECT doc_id AS id_new, unnest(list_distinct(
      |  [array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w)-1, 1))])) AS s
      |  FROM words_n),
      |words_o AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM existing),
      |sh_o AS (SELECT doc_id AS id_old, unnest(list_distinct(
      |  [array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w)-1, 1))])) AS s
      |  FROM words_o),
      |rare_o AS (SELECT s FROM sh_o GROUP BY s HAVING count(*) <= 100),
      |sizes_n AS (SELECT id_new, count(*) AS szn FROM sh_n GROUP BY 1),
      |sizes_o AS (SELECT id_old, count(*) AS szo FROM sh_o GROUP BY 1),
      |common AS (
      |  SELECT id_new, id_old, count(*) AS c
      |  FROM sh_n JOIN (SELECT * FROM sh_o WHERE s IN (SELECT s FROM rare_o)) so USING (s)
      |  GROUP BY 1, 2),
      |neardup AS (
      |  SELECT DISTINCT id_new FROM common
      |  JOIN sizes_n USING (id_new) JOIN sizes_o USING (id_old)
      |  WHERE c * 1.0 / (szn + szo - c) >= 0.8)
      |SELECT doc_id FROM exact_surv
      |WHERE doc_id NOT IN (SELECT id_new FROM neardup)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents")
    graft.operators.Dedup.dedupAgainstCorpus(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", n = 3, threshold = 0.8, maxShingleDf = 100L,
        // the existing side's explosion is the dedup family's shared stage
        // filtered to the corpus half — no re-parse of the text
        existingShingles = Some(sharedShingles(s, d).filter(col("doc_id") % 2 === 0)))
      .select("doc_id").orderBy("doc_id")
  }

  q("q_dedup_spans",
    // exact substring (span) dedup signal: per doc, the 5-word spans that
    // appear verbatim in >= 2 distinct docs, and the token coverage of
    // their interval union (within-doc repeats do NOT count — that is
    // q_text_repetition's signal). Linear: no pair join anywhere.
    """WITH words AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
      |sp AS (
      |  SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+4], ' ') AS s
      |  FROM (SELECT doc_id, unnest(generate_series(1, greatest(len(w) - 4, 0))) AS i, w
      |        FROM words)),
      |dup AS (
      |  SELECT s FROM (SELECT DISTINCT s, doc_id FROM sp)
      |  GROUP BY s HAVING count(*) >= 2),
      |hits AS (SELECT doc_id, pos FROM sp WHERE s IN (SELECT s FROM dup)),
      |cov AS (
      |  SELECT doc_id, greatest(0, pos + 5 - greatest(coalesce(max(pos + 5) OVER (
      |      PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), pos)) AS add
      |  FROM hits),
      |agg AS (SELECT doc_id, count(*) AS dup_spans, sum(add) AS dup_tokens
      |        FROM cov GROUP BY 1),
      |base AS (SELECT doc_id, len(w) AS n_tokens FROM words)
      |SELECT b.doc_id, b.n_tokens,
      |  coalesce(a.dup_spans, 0) AS dup_spans,
      |  CAST(coalesce(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
      |  CAST(round(CAST(CAST((coalesce(a.dup_tokens, 0) * 1.0 / greatest(b.n_tokens, 1)) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS dup_frac
      |FROM base b LEFT JOIN agg a USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Dedup.duplicatedSpans(
        t(s, d, "documents"), "doc_id", "text", k = 5,
        spanFrame = Some(sharedSpans(s, d)))
      .withColumn("dup_frac", round(col("dup_frac"), 6))
      .orderBy("doc_id")
  }

  q("q_dedup_spans_strip",
    // the removal half: rewrite each doc with flagged-span tokens cut
    // (cut the substring, keep the doc); surviving order preserved
    """WITH words AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
      |sp AS (
      |  SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+4], ' ') AS s
      |  FROM (SELECT doc_id, unnest(generate_series(1, greatest(len(w) - 4, 0))) AS i, w
      |        FROM words)),
      |dup AS (
      |  SELECT s FROM (SELECT DISTINCT s, doc_id FROM sp)
      |  GROUP BY s HAVING count(*) >= 2),
      |covered AS (
      |  SELECT DISTINCT doc_id, tpos FROM (
      |    SELECT doc_id, unnest(generate_series(pos, pos + 4)) AS tpos
      |    FROM sp WHERE s IN (SELECT s FROM dup))),
      |toks AS (
      |  SELECT doc_id, i - 1 AS tpos, w[i] AS tok
      |  FROM (SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM words)),
      |kept AS (
      |  SELECT t.doc_id, t.tpos, t.tok FROM toks t
      |  WHERE NOT EXISTS (SELECT 1 FROM covered c
      |                    WHERE c.doc_id = t.doc_id AND c.tpos = t.tpos)),
      |reb AS (
      |  SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
      |         count(*) AS kept_tokens
      |  FROM kept GROUP BY 1),
      |base AS (SELECT doc_id, len(w) AS n_tokens FROM words)
      |SELECT b.doc_id,
      |  CASE WHEN b.n_tokens IS NOT NULL
      |       THEN coalesce(r.clean_text, '') END AS clean_text,
      |  b.n_tokens,
      |  CASE WHEN b.n_tokens IS NOT NULL
      |       THEN coalesce(r.kept_tokens, 0) END AS kept_tokens
      |FROM base b LEFT JOIN reb r USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Dedup.stripDuplicatedSpans(
        t(s, d, "documents"), "doc_id", "text", k = 5,
        spanFrame = Some(sharedSpans(s, d)))
      .orderBy("doc_id")
  }

  q("q_text_pii",
    // PII scrub over text salted with deterministic synthetic PII (the
    // fixture corpus is clean, so both engines append the same email/ip/
    // phone material first — the oracle then pins real matches, not a
    // vacuous zero). md5 of the scrubbed text pins every replacement.
    """WITH salted AS (
      |  SELECT doc_id,
      |    concat(text, ' contact user', doc_id, '@example.com or 10.0.',
      |           doc_id % 256, '.7 tel 555-010-', 1000 + doc_id % 9000) AS t
      |  FROM documents),
      |scrubbed AS (
      |  SELECT doc_id,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |          '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b', '<PHONE>', 'g'),
      |        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |      '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS clean,
      |    len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
      |    len(regexp_extract_all(t, '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b')) AS n_phone,
      |    len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
      |    len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn
      |  FROM salted)
      |SELECT doc_id, n_email, n_phone, n_ip, n_ssn, md5(clean) AS clean_md5
      |FROM scrubbed ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.operators.TextAnalysis
    val salted = t(s, d, "documents").select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or 10.0."), col("doc_id") % 256,
        lit(".7 tel 555-010-"), lit(1000) + col("doc_id") % 9000).as("t"))
    salted.select(
      (col("doc_id") +: TextAnalysis.piiCounts(col("t")) :+
        md5(TextAnalysis.scrubPii(col("t"))).as("clean_md5")): _*)
      .orderBy("doc_id")
  }

  q("q_pack_sequences",
    // concatenate-and-chunk sequence packing at a 2048-token budget; the
    // oracle's single global cumsum window IS the semantics the engine
    // computes with a two-phase distributed prefix sum (the unpartitioned
    // window would be one task at scale — the engine never runs it)
    """WITH toks AS (
      |  SELECT doc_id,
      |    coalesce(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')), 0)::BIGINT AS n_tokens
      |  FROM documents),
      |cum AS (
      |  SELECT doc_id, n_tokens,
      |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
      |  FROM toks)
      |SELECT doc_id, n_tokens,
      |  cast(start_offset AS BIGINT) AS start_offset,
      |  cast(start_offset // 2048 AS BIGINT) AS pack_id,
      |  cast(start_offset % 2048 AS BIGINT) AS offset_in_pack
      |FROM cum ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Packing.packChunks(
        t(s, d, "documents"), "doc_id", "text", budget = 2048L)
      .orderBy("doc_id")
  }

  q("q_chunk_docs",
    // overlapping token-window chunking (32-token windows every 24):
    // per-document map-side explode, no shuffle at any corpus size
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS tk
      |  FROM documents),
      |sized AS (SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) > 0),
      |chunks AS (
      |  SELECT doc_id, tk, unnest(generate_series(0, n - 1, 24)) AS start_tok
      |  FROM sized)
      |SELECT doc_id,
      |  CAST(start_tok // 24 AS BIGINT) AS chunk_id,
      |  CAST(start_tok AS BIGINT) AS start_tok,
      |  CAST(len(tk[start_tok + 1 : start_tok + 32]) AS BIGINT) AS n_tok,
      |  md5(array_to_string(tk[start_tok + 1 : start_tok + 32], ' ')) AS chunk_md5
      |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    graft.operators.Packing.chunkDocs(
        t(s, d, "documents"), "doc_id", "text",
        chunkTokens = 32, strideTokens = 24)
      .orderBy("doc_id", "chunk_id")
  }

  q("q_sample_split",
    // deterministic content-hash sampling + train/val/test assignment —
    // reproducible across engines and runs, unlike TABLESAMPLE
    """SELECT doc_id,
      |  substr(md5(text), 1, 2) AS h2,
      |  CASE WHEN substr(md5(text), 1, 2) < '0a' THEN 'test'
      |       WHEN substr(md5(text), 1, 2) < '14' THEN 'val'
      |       ELSE 'train' END AS split
      |FROM documents
      |WHERE substr(md5(text), 1, 2) < 'c0'
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val h2 = substring(md5(col("text")), 1, 2)
    t(s, d, "documents")
      .select(col("doc_id"), h2.as("h2"),
        when(h2 < "0a", "test").when(h2 < "14", "val")
          .otherwise("train").as("split"))
      .filter(col("h2") < "c0")
      .orderBy("doc_id")
  }

  q("q_sample_split_leakage_safe",
    // leakage-safe split: a plain content-hash split puts a paraphrase
    // in train and its near-dup twin in test (the eval then measures
    // memorization). Here the split key is the dedup-CLUSTER ROOT, so
    // whole near-dup clusters move together; singletons root at their
    // own id. Oracle replays the closure + the same md5-threshold rule
    s"""WITH RECURSIVE words AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w)-1, 1))])) AS s
      |  FROM words),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |shared AS (SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND 100),
      |cp AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      |  FROM (SELECT * FROM sh WHERE s IN (SELECT s FROM shared)) a
      |  JOIN (SELECT * FROM sh WHERE s IN (SELECT s FROM shared)) b USING (s)
      |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM cp
      |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.8),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |labels AS (
      |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u),
      |rooted AS (
      |  SELECT d.doc_id,
      |    coalesce(l.cluster_id, d.doc_id) AS split_root,
      |    substr(md5(CAST(coalesce(l.cluster_id, d.doc_id) AS VARCHAR)), 1, 8) AS h8
      |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)
      |SELECT doc_id, split_root, h8,
      |  CASE WHEN h8 < '${graft.operators.Sampling.thresholdHex(0.04)}' THEN 'test'
      |       WHEN h8 < '${graft.operators.Sampling.thresholdHex(0.08)}' THEN 'val'
      |       ELSE 'train' END AS split
      |FROM rooted ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Sampling.leakageSafeSplit(
        t(s, d, "documents"), "doc_id", sharedClusterLabels(s, d),
        bounds = Seq("test" -> 0.04, "val" -> 0.08))
      .select(col("doc_id"), col("split_root"), col("h8"), col("split"))
      .orderBy("doc_id")
  }

  q("q_sample_stratified",
    // per-source deterministic downsampling: the rate map compiles to a
    // CASE threshold on the content hash — map-side filter, no join, no
    // shuffle at any corpus size. Rates exercise keep-all (src1 -> 'g',
    // which sorts above every hex string), drop-all (src2), fractional
    // (src0 1/4), and the 1/2 default. 8 hex chars = 1/2^32 granularity,
    // so mixtureWeights-derived micro-rates never floor to drop-all.
    """SELECT doc_id, source, substr(md5(text), 1, 8) AS h8
      |FROM documents
      |WHERE substr(md5(text), 1, 8) <
      |  CASE source WHEN 'src0' THEN '40000000' WHEN 'src1' THEN 'g'
      |              WHEN 'src2' THEN '00000000' ELSE '80000000' END
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Sampling.stratifiedSample(
        t(s, d, "documents"), "source", col("text"),
        rates = Map("src0" -> 0.25, "src1" -> 1.0, "src2" -> 0.0),
        defaultRate = 0.5)
      .select("doc_id", "source", "h8")
      .orderBy("doc_id")
  }

  q("q_sample_cap_source",
    // domain capping: at most 7 docs per source by descending
    // NeutralHash rank (deterministic uniform sample, no seed). The
    // oracle is the window formulation; the Spark plan is the bounded-
    // heap TopKAgg (see Sampling.capPerGroup — the window would fully
    // sort every hot domain at 100 TB). Rank key = hash >> 11: top 53
    // bits, exact in both engines, ties broken by ascending doc_id.
    """WITH r AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY (md5_number_lower(CAST(doc_id AS VARCHAR)) >> 11) DESC,
      |               doc_id) AS rn
      |  FROM documents WHERE doc_id IS NOT NULL)
      |SELECT source, doc_id FROM r WHERE rn <= 7
      |ORDER BY source, doc_id""".stripMargin) { (s, d) =>
    graft.operators.Sampling.capPerGroup(
        t(s, d, "documents"), "source", "doc_id", 7)
      .orderBy("source", "doc_id")
  }

  q("q_sample_quality_bins",
    // curriculum binning: exact quartile boundaries of the 4-dp quality
    // blend (ONE percentile aggregate — single reduce, value→count
    // buffer bounded by the 10^4 distinct 4-dp scores; an ntile window
    // would globally sort the corpus), broadcast back, map-side CASE
    // label. Boundaries round to 6 dp in both engines before comparing.
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS lt,
      |    length(text)::DOUBLE AS n_chars,
      |    (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE AS punct
      |  FROM documents),
      |qual AS (
      |  SELECT doc_id,
      |    round((round((n_chars - punct * 2) / greatest(n_chars, 1.0), 4)
      |      + round(least(len(list_intersect(lt,
      |          ['the','and','of','to','in','is','that','it','for','was']))::DOUBLE
      |        / greatest(len(toks), 1) * 5, 1.0), 4)
      |      + round(least(len(toks) / 100.0, 1.0), 4)) / 3, 4) AS quality
      |  FROM base),
      |b AS (
      |  SELECT round(quantile_cont(quality, 0.25), 6) AS b0,
      |         round(quantile_cont(quality, 0.5), 6) AS b1,
      |         round(quantile_cont(quality, 0.75), 6) AS b2
      |  FROM qual)
      |SELECT CASE WHEN quality IS NULL THEN NULL
      |            WHEN quality <= b0 THEN 0 WHEN quality <= b1 THEN 1
      |            WHEN quality <= b2 THEN 2 ELSE 3 END AS bin,
      |  count(*) AS n_docs,
      |  round(min(quality), 4) AS min_q, round(max(quality), 4) AS max_q
      |FROM qual CROSS JOIN b
      |GROUP BY 1 ORDER BY bin""".stripMargin) { (s, d) =>
    val scores = graft.operators.TextAnalysis
      .qualityScore(t(s, d, "documents"), "doc_id", "text")
      .select("doc_id", "quality")
    graft.operators.Sampling.quantileBins(scores, "quality", Seq(0.25, 0.5, 0.75))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("quality")), 4).as("min_q"),
        round(max(col("quality")), 4).as("max_q"))
      // nulls LAST to match the oracle: a null-quality doc lands in a NULL
      // bin, which DuckDB's default ASC ordering sorts last while Spark's
      // sorts first — latent on the current fixture (no null text), but
      // the contract must survive one
      .orderBy(col("bin").asc_nulls_last)
  }

  q("q_sample_exact_n",
    // exactly-n deterministic uniform sample: the n smallest md5(doc_id)
    // values. rand() sampling promises neither the count nor replay; the
    // hash order does both, and the plan is TakeOrderedAndProject — an
    // n-element heap per task, never a global sort of the corpus.
    """SELECT doc_id, lang, source FROM documents
      |ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 100""".stripMargin) { (s, d) =>
    graft.operators.Sampling.deterministicSample(
      t(s, d, "documents").select("doc_id", "lang", "source"),
      col("doc_id"), n = 100)
  }

  q("q_agg_approx_percentile_hist",
    // histogram-sketch quantiles: the engine-neutral APPROXIMATE quantile
    // (the KMV-vs-HLL story applied to percentiles). Exact percentile
    // keeps value→count state bounded by value cardinality; the histogram
    // keeps ceil(range/binWidth) counters per group regardless of
    // cardinality, merges as plain partial+final counter adds, and the
    // p-estimate (upper edge of the first bin reaching p·total) replays
    // bit-for-bit in SQL — unlike any t-digest/KLL buffer layout.
    """WITH h AS (
      |  SELECT l_returnflag, CAST(floor(l_quantity / 5.0) AS BIGINT) AS b,
      |         count(*) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT l_returnflag, b, n,
      |    sum(n) OVER (PARTITION BY l_returnflag ORDER BY b) AS cum,
      |    sum(n) OVER (PARTITION BY l_returnflag) AS tot
      |  FROM h)
      |SELECT l_returnflag,
      |  min(CASE WHEN CAST(cum AS DOUBLE) >= tot * 0.5 THEN (b + 1) * 5.0 END) AS p50,
      |  min(CASE WHEN CAST(cum AS DOUBLE) >= tot * 0.9 THEN (b + 1) * 5.0 END) AS p90
      |FROM c GROUP BY 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    graft.operators.Sampling.histogramQuantiles(
        t(s, d, "lineitem"), "l_returnflag", "l_quantity",
        binWidth = 5.0, probs = Seq(0.5, 0.9))
      .orderBy("l_returnflag")
  }

  q("q_corpus_shard",
    // deterministic training-shard deal: shard = hash bits [32,64) mod 8,
    // within-shard order key = top 53 bits — reproducible across engines,
    // runs, and partitionings (no rand()). Assignment is a map-side
    // projection; the audit is a groupBy on 8 keys with map-side partial
    // agg. The write form (Sharding.writeShards: repartition(shard) →
    // sorted partitionBy dirs) is spec'd; this query verifies the full
    // assignment arithmetic against the oracle's u64 replay.
    """WITH a AS (
      |  SELECT doc_id, text,
      |    CAST((md5_number_lower(CAST(doc_id AS VARCHAR)) >> 32) % 8 AS BIGINT) AS shard,
      |    CAST((md5_number_lower(CAST(doc_id AS VARCHAR)) >> 11) AS BIGINT) AS rk
      |  FROM documents WHERE doc_id IS NOT NULL)
      |SELECT shard, count(*) AS n_docs,
      |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
      |  CAST(min(rk) AS DOUBLE) AS first_rank,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM a GROUP BY shard ORDER BY shard""".stripMargin) { (s, d) =>
    graft.operators.Sharding.shardStats(
        t(s, d, "documents"), "doc_id", "text", nShards = 8)
      .orderBy("shard")
  }

  q("q_corpus_mix",
    // data-mixture weighting: per-language token mass and the
    // sample-rate/epoch factor needed to hit a target share of a 1M-token
    // budget. One low-cardinality groupBy with map-side partial agg; the
    // token count runs inside the scan projection.
    """WITH g AS (
      |  SELECT lang, count(*) AS n_docs,
      |    CAST(sum(len(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY lang)
      |SELECT lang, n_docs, tokens,
      |  CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.2 WHEN 'de' THEN 0.1
      |                 WHEN 'es' THEN 0.1 WHEN 'fr' THEN 0.1 ELSE 0.0 END
      |    AS DOUBLE) AS target_share,
      |  CAST(floor(target_share * 1000000) AS BIGINT) AS target_tokens,
      |  CASE WHEN tokens = 0 THEN NULL
      |       ELSE round(CAST(floor(target_share * 1000000) AS BIGINT) * 1.0 / tokens, 6) END AS weight,
      |  CASE WHEN tokens = 0 THEN NULL
      |       ELSE least(round(CAST(floor(target_share * 1000000) AS BIGINT) * 1.0 / tokens, 6), 1.0) END AS sample_rate,
      |  CASE WHEN tokens = 0 THEN NULL
      |       ELSE greatest(round(CAST(floor(target_share * 1000000) AS BIGINT) * 1.0 / tokens, 6), 1.0) END AS epochs
      |FROM g
      |ORDER BY lang""".stripMargin) { (s, d) =>
    graft.operators.Sampling.mixtureWeights(
        t(s, d, "documents"), "lang", "text",
        targetShares = Map("en" -> 0.5, "zh" -> 0.2, "de" -> 0.1,
          "es" -> 0.1, "fr" -> 0.1),
        budgetTokens = 1000000L)
      .orderBy("lang")
  }

  q("q_corpus_mix_apply",
    // the mixture loop CLOSED: mixtureWeights' sample_rate applied to the
    // corpus in the same pass — weights broadcast-join onto documents,
    // per-row threshold from the rate, md5-prefix keep rule. The 20k
    // budget against sf0.01's ~27k tokens exercises all three branches:
    // fractional keep (en/de/es), keep-all (zh: target > actual), and
    // drop-all (fr: absent from the share map).
    """WITH g AS (
      |  SELECT lang,
      |    CAST(sum(len(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY lang),
      |w AS (
      |  SELECT lang,
      |    CASE WHEN tokens = 0 THEN NULL
      |         ELSE least(round(CAST(floor(
      |             CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.3
      |                            WHEN 'de' THEN 0.1 WHEN 'es' THEN 0.1
      |                            ELSE 0.0 END AS DOUBLE)
      |             * 20000) AS BIGINT) * 1.0 / tokens, 6), 1.0) END AS sample_rate
      |  FROM g),
      |t AS (
      |  SELECT lang,
      |    CASE WHEN sample_rate IS NULL THEN '00000000'
      |         WHEN sample_rate >= 1.0 THEN 'g'
      |         ELSE lpad(lower(hex(least(CAST(floor(sample_rate * 4294967296.0) AS BIGINT), 4294967295))), 8, '0')
      |    END AS thr
      |  FROM w)
      |SELECT d.doc_id, d.lang, substr(md5(coalesce(d.text, '')), 1, 8) AS h8
      |FROM documents d JOIN t ON d.lang = t.lang
      |WHERE substr(md5(coalesce(d.text, '')), 1, 8) < t.thr
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    graft.operators.Sampling.applyMixture(
        t(s, d, "documents"), "lang", "text",
        targetShares = Map("en" -> 0.5, "zh" -> 0.3, "de" -> 0.1,
          "es" -> 0.1),
        budgetTokens = 20000L)
      .select("doc_id", "lang", "h8")
      .orderBy("doc_id")
  }

  q("q_corpus_mix_apply_epochs",
    // the mixture loop closed in BOTH directions: applyMixture can only
    // downsample, but weight > 1 means the mix wants the group REPEATED.
    // Every doc gets floor(weight) whole copies plus one more iff h8
    // clears the threshold for the fractional part — expected group mass
    // lands on weight × actual exactly, and weight < 1 degenerates to
    // applyMixture's selection (spec-pinned equality). The 20k budget
    // against sf0.01's lang masses exercises every branch: zh weight
    // ≈2.41 (two whole copies + a 41% third), es ≈1.01 (one + 1%),
    // en/de fractional-only, fr share-0 dropped. Weights broadcast; the
    // explode is map-side and output-bound — no shuffle, no collect.
    """WITH g AS (
      |  SELECT lang,
      |    CAST(sum(len(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY lang),
      |w AS (
      |  SELECT lang,
      |    CASE WHEN tokens = 0 THEN NULL
      |         ELSE round(CAST(floor(
      |             CAST(CASE lang WHEN 'en' THEN 0.2 WHEN 'zh' THEN 0.5
      |                            WHEN 'de' THEN 0.1 WHEN 'es' THEN 0.2
      |                            ELSE 0.0 END AS DOUBLE)
      |             * 20000) AS BIGINT) * 1.0 / tokens, 6) END AS weight
      |  FROM g),
      |t AS (
      |  SELECT lang, CAST(floor(weight) AS BIGINT) AS copies,
      |    CASE WHEN weight - floor(weight) <= 0 THEN '00000000'
      |         ELSE lpad(lower(hex(least(CAST(floor((weight - floor(weight)) * 4294967296.0) AS BIGINT), 4294967295))), 8, '0')
      |    END AS thr
      |  FROM w WHERE weight IS NOT NULL),
      |sel AS (
      |  SELECT d.doc_id, d.lang, substr(md5(coalesce(d.text, '')), 1, 8) AS h8,
      |    t.copies, t.thr
      |  FROM documents d JOIN t ON d.lang = t.lang),
      |e AS (
      |  SELECT doc_id, lang, h8, copies, thr,
      |    unnest(range(0, copies + 1)) AS epoch
      |  FROM sel)
      |SELECT doc_id, lang, CAST(epoch AS BIGINT) AS epoch, h8
      |FROM e WHERE epoch < copies OR h8 < thr
      |ORDER BY doc_id, epoch""".stripMargin) { (s, d) =>
    graft.operators.Sampling.applyMixtureEpochs(
        t(s, d, "documents"), "lang", "text",
        targetShares = Map("en" -> 0.2, "zh" -> 0.5, "de" -> 0.1,
          "es" -> 0.2),
        budgetTokens = 20000L)
      .select("doc_id", "lang", "epoch", "h8")
      .orderBy("doc_id", "epoch")
  }

  q("q_corpus_mix_temperature",
    // temperature-scaled mixture (the multilingual-sampling move:
    // share ∝ tokens^α, α=0.5 upsamples low-resource languages): the
    // target shares are DERIVED from the corpus instead of caller-
    // supplied — same output columns as q_corpus_mix, so the same
    // applyMixture consumers read either. share rounds to 6 dp BEFORE
    // floor(share·budget), so with the power-of-ten budget the product
    // is an exact integer-valued double and the floor replays bit-equal;
    // weight/rate/epochs are then exact-integer ratios. One
    // low-cardinality groupBy + a one-row broadcast total.
    """WITH g AS (
      |  SELECT lang, count(*) AS n_docs,
      |    CAST(sum(len(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY lang),
      |tt AS (SELECT sum(pow(CAST(tokens AS DOUBLE), 0.5)) AS tot FROM g),
      |s AS (
      |  SELECT lang, n_docs, tokens,
      |    CASE WHEN tot = 0 THEN 0.0
      |         ELSE round(pow(CAST(tokens AS DOUBLE), 0.5) / tot, 6) END AS target_share
      |  FROM g, tt),
      |w AS (
      |  SELECT lang, n_docs, tokens, target_share,
      |    CAST(floor(target_share * 1000000) AS BIGINT) AS target_tokens
      |  FROM s)
      |SELECT lang, n_docs, tokens, target_share, target_tokens,
      |  CASE WHEN tokens = 0 THEN NULL
      |       ELSE round(target_tokens * 1.0 / tokens, 6) END AS weight,
      |  CASE WHEN tokens = 0 THEN NULL
      |       ELSE least(round(target_tokens * 1.0 / tokens, 6), 1.0) END AS sample_rate,
      |  CASE WHEN tokens = 0 THEN NULL
      |       ELSE greatest(round(target_tokens * 1.0 / tokens, 6), 1.0) END AS epochs
      |FROM w ORDER BY lang""".stripMargin) { (s, d) =>
    graft.operators.Sampling.mixtureWeightsTemperature(
        t(s, d, "documents"), "lang", "text",
        alpha = 0.5, budgetTokens = 1000000L)
      .orderBy("lang")
  }

  q("q_sample_token_budget",
    // greedy token-budget selection — "spend a fixed token budget on the
    // best data", the step every curated pretraining mix ends with:
    // docs in (quality DESC, doc_id ASC) order until the running token
    // count reaches the budget; the boundary-crossing doc is kept. The
    // oracle replays the keep rule as a window cumsum; the engine runs
    // the packChunks two-phase prefix sum instead (range-repartition on
    // the priority order, per-partition sums to the driver — one row per
    // partition — offsets broadcast back), so nothing serializes into a
    // single task and partitions past the budget skip their input
    // entirely. 12k tokens against sf0.01's ~20k whitespace tokens
    // exercises both keep and drop; at sf1 the same budget keeps only
    // the top slice — the cap binds at every scale.
    """WITH base AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks,
      |    length(text)::DOUBLE AS n_chars,
      |    (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE AS punct
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id,
      |    round((round((n_chars - punct * 2) / greatest(n_chars, 1.0), 4)
      |      + round(least(len(list_intersect(
      |          list_filter(string_split_regex(lower(text), '\s+'), t -> t <> ''),
      |          ['the','and','of','to','in','is','that','it','for','was']))::DOUBLE
      |        / greatest(len(toks), 1) * 5, 1.0), 4)
      |      + round(least(len(toks) / 100.0, 1.0), 4)) / 3, 4) AS quality,
      |    len(toks)::BIGINT AS n_tok
      |  FROM base),
      |c AS (
      |  SELECT doc_id, quality, n_tok,
      |    CAST(sum(n_tok) OVER (ORDER BY quality DESC, doc_id) - n_tok AS BIGINT) AS start_offset
      |  FROM sc WHERE quality IS NOT NULL)
      |SELECT doc_id, quality, n_tok AS n_tokens, start_offset
      |FROM c WHERE start_offset < 12000 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents")
    val scored = graft.operators.TextAnalysis
      .qualityScore(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"),
        coalesce(size(graft.operators.TextAnalysis.tokens(col("text"))), lit(0))
          .cast("long").as("n_tok")), Seq("doc_id"))
    graft.operators.Sampling.tokenBudgetSample(
        scored, "doc_id", "quality", "n_tok", budgetTokens = 12000L)
      .select(col("doc_id"), col("quality"), col("n_tokens"), col("start_offset"))
      .orderBy("doc_id")
  }

  q("q_corpus_report",
    // one-pass corpus health report (the dashboard row an ingest run
    // publishes): doc/lang/source counts, token mass + percentiles,
    // exact-dup fraction. Single partial+final aggregate over the scan;
    // the only multi-pass cost is the distinct-count trio, which Spark
    // expands map-side. Single-reduce percentile, no sort.
    """WITH b AS (
      |  SELECT lang, source, text, md5(text) AS h,
      |    len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tok
      |  FROM documents)
      |SELECT count(*) AS n_docs,
      |  count(CASE WHEN text IS NULL THEN 1 END) AS n_null_text,
      |  count(DISTINCT lang) AS n_langs,
      |  count(DISTINCT source) AS n_sources,
      |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
      |  round(quantile_cont(n_tok, 0.5), 4) AS p50_tokens,
      |  round(quantile_cont(n_tok, 0.9), 4) AS p90_tokens,
      |  round((count(h) - count(DISTINCT h)) * 1.0 / count(h), 6) AS dup_frac
      |FROM b""".stripMargin) { (s, d) =>
    t(s, d, "documents")
      .select(col("text"), col("lang"), col("source"),
        graft.operators.TextAnalysis.bpeishTokenCount(col("text")).as("n_tok"),
        md5(col("text")).as("h"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("text").isNull, 1)).as("n_null_text"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_tok")).cast("long").as("total_tokens"),
        // one value→count buffer serves both percentiles
        expr("percentile(n_tok, array(0.5D, 0.9D))").as("__ps"),
        round((count(col("h")) - countDistinct(col("h"))).cast("double")
          / count(col("h")), 6).as("dup_frac"))
      .select(col("n_docs"), col("n_null_text"), col("n_langs"),
        col("n_sources"), col("total_tokens"),
        round(col("__ps")(0), 4).as("p50_tokens"),
        round(col("__ps")(1), 4).as("p90_tokens"),
        col("dup_frac"))
  }

  q("q_corpus_clean",
    // the COMPOSITE pipeline replayed end-to-end in SQL: exact min-id
    // dedup → ngram-Jaccard pairs over survivors → recursive-closure
    // cluster collapse → the quality formula (punct/stop/length blend,
    // each component rounded at 4 dp like the engine) with its 0.3 floor
    """WITH RECURSIVE exact AS (
      |  SELECT d.* FROM documents d
      |  JOIN (SELECT md5(text) AS h, min(doc_id) AS keep
      |        FROM documents GROUP BY 1) k ON d.doc_id = k.keep),
      |words AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM exact),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |  [array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w)-1, 1))])) AS s
      |  FROM words),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |shared AS (SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND 100),
      |cp AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
      |  FROM (SELECT * FROM sh WHERE s IN (SELECT s FROM shared)) a
      |  JOIN (SELECT * FROM sh WHERE s IN (SELECT s FROM shared)) b USING (s)
      |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM cp
      |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |losers AS (
      |  SELECT u AS doc_id FROM reach GROUP BY u HAVING least(u, min(v)) <> u),
      |deduped AS (
      |  SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
      |feats AS (
      |  SELECT doc_id,
      |    length(text) AS nc,
      |    length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np,
      |    len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS nt,
      |    len(list_filter(list_distinct(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')),
      |        t -> t IN ('the','and','of','to','in','is','that','it','for','was'))) AS nstop
      |  FROM deduped),
      |qual AS (
      |  SELECT doc_id, round((
      |      round((nc - np * 2) * 1.0 / greatest(nc, 1.0), 4)
      |    + round(least(nstop * 1.0 / greatest(nt, 1.0) * 5, 1.0), 4)
      |    + round(least(nt / 100.0, 1.0), 4)) / 3, 4) AS quality
      |  FROM feats)
      |SELECT doc_id, quality FROM qual WHERE quality >= 0.3
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.CorpusPipeline.cleanCorpus(t(s, d, "documents"),
        corpusShingles = Some(sharedShingles(s, d)))
      .select("doc_id", "quality").orderBy("doc_id")
  }

  // MinHash-LSH and SimHash hash through graft.functions.NeutralHash
  // (md5-derived 64-bit slices = DuckDB md5_number_lower/upper), so the
  // FULL sketch pipeline — slot hashes, band buckets, bit votes, chunk
  // keys — replays in the oracle engine, not just the row count.
  q("q_dedup_minhash",
    // slot i of shingle s = (md5_lower64(s) + i*md5_upper64(s)) mod 2^64,
    // min per (doc, slot) compared unsigned (HUGEINT min over the nonneg
    // residue = Long.compareUnsigned min over the wrapped bit pattern);
    // band bucket = md5_lower64("band|s0,s1,s2,s3") over unsigned decimals
    """WITH words AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |  [array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w)-1, 1))])) AS s
      |  FROM words),
      |h AS (SELECT doc_id, md5_number_lower(s)::HUGEINT AS lo,
      |             md5_number_upper(s)::HUGEINT AS hi FROM sh),
      |mh AS (SELECT doc_id, i,
      |         min((lo + i * hi) % 18446744073709551616::HUGEINT) AS v
      |       FROM h, range(64) t(i) GROUP BY 1, 2),
      |bands AS (SELECT doc_id, (i // 4) AS band,
      |            md5_number_lower(CAST(i // 4 AS VARCHAR) || '|' ||
      |              string_agg(CAST(v AS VARCHAR), ',' ORDER BY i)) AS bucket
      |          FROM mh GROUP BY doc_id, (i // 4))
      |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |FROM bands a JOIN bands b USING (band, bucket)
      |WHERE a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    graft.operators.Dedup.minHashCandidatesFrom(sharedShingles(s, d))
      .orderBy("id_a", "id_b")
  }

  q("q_dedup_minhash_est",
    // sketch-only refine: Jaccard ESTIMATES for the banded candidate
    // pairs from signature slot agreement alone (no second shingle
    // shuffle). 64 is a power of two, so k/64 is an EXACT double —
    // estimates replay bit-equal with no rounding bridge
    """WITH words AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |  [array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w)-1, 1))])) AS s
      |  FROM words),
      |h AS (SELECT doc_id, md5_number_lower(s)::HUGEINT AS lo,
      |             md5_number_upper(s)::HUGEINT AS hi FROM sh),
      |mh AS (SELECT doc_id, i,
      |         min((lo + i * hi) % 18446744073709551616::HUGEINT) AS v
      |       FROM h, range(64) t(i) GROUP BY 1, 2),
      |bands AS (SELECT doc_id, (i // 4) AS band,
      |            md5_number_lower(CAST(i // 4 AS VARCHAR) || '|' ||
      |              string_agg(CAST(v AS VARCHAR), ',' ORDER BY i)) AS bucket
      |          FROM mh GROUP BY doc_id, (i // 4)),
      |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |          FROM bands a JOIN bands b USING (band, bucket)
      |          WHERE a.doc_id < b.doc_id),
      |agree AS (SELECT p.id_a, p.id_b,
      |            sum(CASE WHEN ma.v = mb.v THEN 1 ELSE 0 END) AS k
      |          FROM pairs p JOIN mh ma ON ma.doc_id = p.id_a
      |          JOIN mh mb ON mb.doc_id = p.id_b AND mb.i = ma.i
      |          GROUP BY 1, 2)
      |SELECT id_a, id_b, CAST(k AS DOUBLE) / 64 AS est_jaccard
      |FROM agree ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    graft.operators.Dedup.minHashJaccardEstimates(sharedShingles(s, d))
      .orderBy("id_a", "id_b")
  }

  q("q_dedup_simhash",
    // word hash = md5_lower64(w); signature bit i = majority vote of bit i
    // (the i=63 term is the sign bit: -2^63 in two's complement); chunk
    // key = 16 extracted bits (shift-then-mask — shift-type agnostic);
    // refine = hamming ≤ 3 via bit_count(xor)
    """WITH words AS (
      |  SELECT DISTINCT doc_id, w FROM (
      |    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
      |    FROM documents) WHERE w <> ''),
      |h AS (SELECT doc_id, md5_number_lower(w) AS hw FROM words),
      |bits AS (SELECT doc_id, i,
      |           sum(CASE WHEN ((hw >> i) & 1) = 1 THEN 1 ELSE -1 END) AS c
      |         FROM h, range(64) t(i) GROUP BY 1, 2),
      |sigs AS (SELECT doc_id,
      |           sum(CASE WHEN c > 0 THEN
      |                 CASE WHEN i = 63 THEN -9223372036854775808
      |                      ELSE (1::BIGINT << i) END
      |               ELSE 0 END)::BIGINT AS sig
      |         FROM bits GROUP BY doc_id),
      |chunks AS (SELECT doc_id, sig, i AS chunk,
      |             (sig >> (16 * i)) & 65535 AS ckey
      |           FROM sigs, range(4) t(i))
      |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |FROM chunks a JOIN chunks b USING (chunk, ckey)
      |WHERE a.doc_id < b.doc_id
      |  AND bit_count(xor(a.sig, b.sig)) <= 3
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    graft.operators.Dedup.simHashCandidates(
        t(s, d, "documents"), "doc_id", "text", maxHamming = 3)
      .orderBy("id_a", "id_b")
  }

  q("q_dedup_embed",
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.45
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    // size-adaptive: exact broadcast kernel under the budget (this scale),
    // IVF-cell-blocked pair join past it (the 100 TB path); the pair set
    // is the shared prefix with q_dedup_semantic
    sharedEmbedPairs(s, d).orderBy("id_a", "id_b")
  }

  q("q_dedup_semantic",
    // SemDeDup: cosine near-dup pairs -> connected components -> keep each
    // component's min-id root; the embedding column itself is projected
    // away so the result is driver-hashable
    """WITH RECURSIVE pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.45),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |labels AS (SELECT u AS vec_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u)
      |SELECT vec_id, label FROM embeddings
      |WHERE vec_id NOT IN (SELECT vec_id FROM labels WHERE vec_id <> cluster_id)
      |ORDER BY vec_id""".stripMargin) { (s, d) =>
    graft.operators.Similarity.semanticDedupFrom(
        t(s, d, "embeddings"), "vec_id", sharedEmbedPairs(s, d))
      .select("vec_id", "label")
      .orderBy("vec_id")
  }

  /** The q_sim_lsh oracle, generated from the SAME signPlanes derivation
    * the engine uses: per table t a 6-bit signature
    * `Σ_b 2^b · [list_dot_product(v, plane_tb) >= 0]`, candidates = rows
    * matching the probe's signature in ANY table, exact cosine rerank.
    * Planes are ±1.0 literals, so every dot is an exact left-to-right
    * double sum in both engines — bit-identical signs. */
  private def lshOracleSql(dim: Int, nBits: Int, nTables: Int, seed: Long,
      k: Int): String = {
    def planeLit(p: Array[Float]): String =
      p.map(x => if (x > 0f) "1.0" else "-1.0").mkString("[", ",", "]")
    def sigExpr(t: Int, vcol: String): String =
      graft.operators.Similarity.signPlanes(dim, nBits, seed + t).zipWithIndex
        .map { case (p, b) =>
          s"(CASE WHEN list_dot_product($vcol, ${planeLit(p)}) >= 0 THEN ${1L << b} ELSE 0 END)"
        }.mkString("(", " + ", ")")
    val sigCols = (0 until nTables)
      .map(t => s"${sigExpr(t, "v")} AS s$t").mkString(",\n  ")
    val anyMatch = (0 until nTables).map(t => s"a.s$t = p.s$t").mkString(" OR ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE embedding IS NOT NULL),
       |sigs AS (SELECT vec_id, v,
       |  $sigCols
       |  FROM e),
       |probe AS (SELECT * FROM sigs WHERE vec_id = 0)
       |SELECT a.vec_id, round(list_cosine_similarity(a.v, p.v), 6) AS cos
       |FROM sigs a, probe p
       |WHERE a.vec_id <> 0 AND ($anyMatch)
       |ORDER BY cos DESC, a.vec_id LIMIT $k""".stripMargin
  }

  // sign-random-projection ANN with ±1 (Rademacher) hyperplanes derived
  // from the neutral md5 stream: plane·vector products are EXACT in
  // double (±1.0 factors), so the DuckDB oracle — same plane literals via
  // list_dot_product, generated from the same signPlanes call — replays
  // the signatures bit-for-bit. Literals pin dim=64 (the testdata
  // embedding width at every sf).
  q("q_sim_lsh", lshOracleSql(dim = 64, nBits = 6, nTables = 12, seed = 7L,
    k = 10)) { (s, d) =>
    val emb = t(s, d, "embeddings")
    val probe = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    graft.operators.Similarity.lshTopK(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", probe, k = 10)
  }

  // the materialized multi-table form: identical semantics (candidates =
  // any-table bucket match, exact rerank — the same oracle replays), but
  // the probe is nTables point lookups with file-level pruning over the
  // partitionBy(table, bucket) layout
  q("q_sim_lsh_indexed", lshOracleSql(dim = 64, nBits = 6, nTables = 12,
    seed = 7L, k = 10)) { (s, d) =>
    graft.operators.Similarity.lshTopKIndexed(
      s, lshIndexPath(s, d), "vec_id", "embedding", embProbe(s, d), k = 10)
  }

  q("q_sim_topk",
    """SELECT b.vec_id,
      |  round(list_cosine_similarity(b.embedding::DOUBLE[],
      |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS cos
      |FROM embeddings b WHERE b.vec_id <> 0
      |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
    val emb = t(s, d, "embeddings")
    val probe = broadcast(emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe_vec")))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(probe)
      .select(col("vec_id"),
        round(graft.operators.Similarity.cosine(col("embedding"), col("probe_vec")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  // IVF is deterministic given fixed centroids (first 8 vectors), so the
  // whole pipeline — cell argmax at 9 dp with min-index tiebreak, probe's
  // 2 nearest cells, cosine top-10 in the probed cells — replays in SQL.
  // The same SQL oracles BOTH the scan form (q_sim_ivf, cells re-derived
  // per probe) and the materialized form (q_sim_ivf_indexed, cells are a
  // partitionBy directory layout): the index is an execution layout, not
  // a semantics change.
  private val ivfOracleSql: String =
    """WITH cent AS (
      |  SELECT vec_id AS c, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id < 8),
      |probe AS (SELECT embedding::DOUBLE[] AS pv FROM embeddings WHERE vec_id = 0),
      |pcells AS (
      |  SELECT c FROM cent, probe
      |  ORDER BY list_cosine_similarity(pv, ce) DESC, c LIMIT 2),
      |assigned AS (
      |  SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
      |    (SELECT c FROM cent
      |     ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], ce), 9) DESC, c
      |     LIMIT 1) AS cell
      |  FROM embeddings e WHERE e.vec_id <> 0)
      |SELECT vec_id, round(list_cosine_similarity(v, (SELECT pv FROM probe)), 6) AS cos
      |FROM assigned WHERE cell IN (SELECT c FROM pcells)
      |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin

  private def ivfCentroids(s: SparkSession, d: String): Seq[Array[Float]] =
    t(s, d, "embeddings").filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray).toSeq

  private def embProbe(s: SparkSession, d: String): Array[Float] =
    t(s, d, "embeddings").filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray

  q("q_dedup_embed_incremental",
    // incremental embedding dedup: odd vec_ids are the "new" increment,
    // even the existing corpus; IVF-cell blocking (first 8 vectors as
    // centroids, the q_sim_ivf convention) replays exactly in SQL —
    // only same-cell new×existing pairs are ever scored
    """WITH cent AS (
      |  SELECT vec_id AS c, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id < 8),
      |assigned AS (
      |  SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
      |    (SELECT c FROM cent
      |     ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], ce), 9) DESC, c
      |     LIMIT 1) AS cell
      |  FROM embeddings e)
      |SELECT n.vec_id AS id_new, o.vec_id AS id_old,
      |  round(list_cosine_similarity(n.v, o.v), 6) AS cos
      |FROM assigned n JOIN assigned o ON n.cell = o.cell
      |WHERE n.vec_id % 2 = 1 AND o.vec_id % 2 = 0
      |  AND round(list_cosine_similarity(n.v, o.v), 6) >= 0.45
      |ORDER BY id_new, id_old""".stripMargin) { (s, d) =>
    val emb = t(s, d, "embeddings")
    graft.operators.Similarity.nearDupAgainstCorpus(
        emb.filter(col("vec_id") % 2 === 1), emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", ivfCentroids(s, d), threshold = 0.45)
      .orderBy("id_new", "id_old")
  }

  q("q_text_heavy_hitters",
    // corpus-wide most-frequent tokens: map-side partial counts shuffle
    // |vocab| rows, then a TakeOrdered top-20 — never a global sort of
    // the token stream (the heavy-hitters pass every corpus audit runs)
    """SELECT w, count(*) AS n FROM (
      |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
      |  FROM documents)
      |WHERE w <> ''
      |GROUP BY w
      |ORDER BY n DESC, w LIMIT 20""".stripMargin) { (s, d) =>
    t(s, d, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(20)
  }

  q("q_sim_topk_batch",
    // the batch retrieval shape: 8 probes scored against the corpus in
    // ONE pass, per-probe bounded-heap top-5 (no window sort; the oracle
    // replays with a window because SQL has no heap, same rows)
    """WITH probes AS (
      |  SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv
      |  FROM embeddings WHERE vec_id < 8),
      |scored AS (
      |  SELECT p.probe_id, e.vec_id,
      |    round(list_cosine_similarity(e.embedding::DOUBLE[], p.pv), 6) AS cos
      |  FROM embeddings e, probes p WHERE e.vec_id >= 8)
      |SELECT probe_id, vec_id, cos FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rn
      |  FROM scored)
      |WHERE rn <= 5
      |ORDER BY probe_id, cos DESC, vec_id""".stripMargin) { (s, d) =>
    val emb = t(s, d, "embeddings")
    graft.operators.Similarity.batchTopK(
        emb.filter(col("vec_id") >= 8), "vec_id", "embedding",
        emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 5)
      .orderBy(col("probe_id"), col("cos").desc, col("vec_id"))
  }

  q("q_sim_hard_negatives",
    // contrastive-training negative mining: per probe, top-5 most-similar
    // corpus vectors with a DIFFERENT label ("close but wrong"). Same
    // one-pass bounded-heap shape as q_sim_topk_batch; the label-mismatch
    // predicate runs map-side before the heap. Oracle replays with a
    // window because SQL has no heap — same rows.
    """WITH probes AS (
      |  SELECT vec_id AS probe_id, label AS probe_label, embedding::DOUBLE[] AS pv
      |  FROM embeddings WHERE vec_id < 8),
      |scored AS (
      |  SELECT p.probe_id, e.vec_id,
      |    round(list_cosine_similarity(e.embedding::DOUBLE[], p.pv), 6) AS cos
      |  FROM embeddings e, probes p
      |  WHERE e.vec_id >= 8 AND e.label <> p.probe_label)
      |SELECT probe_id, vec_id, cos FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rn
      |  FROM scored)
      |WHERE rn <= 5
      |ORDER BY probe_id, cos DESC, vec_id""".stripMargin) { (s, d) =>
    val emb = t(s, d, "embeddings")
    graft.operators.Similarity.hardNegatives(
        emb.filter(col("vec_id") >= 8), "vec_id", "embedding", "label",
        emb.filter(col("vec_id") < 8), "vec_id", "embedding", "label", k = 5)
      .orderBy(col("probe_id"), col("cos").desc, col("vec_id"))
  }

  q("q_sim_ivf", ivfOracleSql) { (s, d) =>
    val emb = t(s, d, "embeddings")
    graft.operators.Similarity.ivfTopK(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      ivfCentroids(s, d), embProbe(s, d), k = 10, nprobe = 2)
  }

  /** Materialized ANN index dirs, one per (session, corpus dir, kind) —
    * the registered form of the 100 TB index story: the one-off
    * assignment cost is paid at build time into a partitionBy layout,
    * and probes prune at the FILE level. Same weak-session caching
    * contract as [[sharedFrame]]; the build runs OUTSIDE the lock (it is
    * a Spark write job) and a losing racer's temp dir is just orphaned
    * tmp space. */
  private val annIndexCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, String]]())

  // every created temp root (winners AND losing racers' orphans) is
  // removed at JVM exit — repeated Bench/Verify/test runs must not
  // accumulate multi-hundred-directory index trees in java.io.tmpdir
  private val annTmpRoots =
    java.util.Collections.synchronizedList(new java.util.ArrayList[java.nio.file.Path]())
  // catalog tables created for bucketed fixtures (saveAsTable) — unlike
  // temp views these live in the session catalog until dropped, so a
  // long-lived session cycling fixture dirs would otherwise accumulate
  // dead entries pointing at deleted paths. Weak session refs: a GC'd
  // session's catalog died with it, nothing to drop.
  private val catalogTables =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[(java.lang.ref.WeakReference[SparkSession], String)]())
  private lazy val annCleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      catalogTables.forEach { case (ref, name) =>
        try {
          val s = ref.get()
          if (s != null && !s.sparkContext.isStopped)
            s.sql(s"DROP TABLE IF EXISTS `$name`")
        } catch { case scala.util.control.NonFatal(_) => () }
      }
      annTmpRoots.forEach { root =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(root).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }, "graft-ann-index-cleanup"))

  private def annIndexPath(s: SparkSession, dir: String, kind: String)(
      build: String => Unit): String = {
    val key = s"$kind|$dir"
    withSessionMap(annIndexCache, s)(_.get(key)).getOrElse {
      annCleanupHook
      val root = java.nio.file.Files.createTempDirectory(s"graft_${kind}_idx")
      annTmpRoots.add(root)
      val p = root.resolve("index").toString
      build(p)
      withSessionMap(annIndexCache, s)(_.getOrElseUpdate(key, p))
    }
  }

  /** Build-or-reuse paths for the two materialized ANN indexes — called
    * by the query bodies AND exposed through [[indexBuilds]] so Bench can
    * charge the one-off build separately from the steady-state probe. */
  private def ivfIndexPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "ivf") { p =>
      graft.operators.Similarity.buildIvfIndex(
        t(s, d, "embeddings").filter(col("vec_id") =!= 0),
        "vec_id", "embedding", ivfCentroids(s, d), p)
    }

  private def lshIndexPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "lsh") { p =>
      graft.operators.Similarity.buildLshIndex(
        t(s, d, "embeddings").filter(col("vec_id") =!= 0),
        "vec_id", "embedding", p, dim = 64)
    }

  q("q_sim_ivf_indexed", ivfOracleSql) { (s, d) =>
    graft.operators.Similarity.ivfTopKIndexed(
      s, ivfIndexPath(s, d), "vec_id", "embedding", ivfCentroids(s, d),
      embProbe(s, d), k = 10, nprobe = 2)
  }

  q("q_text_stats",
    """SELECT doc_id, length(text) AS n_chars,
      |  len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS n_tokens,
      |  len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpeish,
      |  CAST(round(CAST(CAST((list_sum([length(t) for t in list_filter(string_split_regex(text, '\s+'), t -> t <> '')]) * 1.0
      |    / greatest(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')), 1)) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS mean_token_len
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.textStats(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  q("q_text_langid",
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS w
      |  FROM documents),
      |hits AS (
      |  SELECT doc_id,
      |    len(list_intersect(w, ['the','and','of','to','in','is','that','it','for','was'])) AS hits_en,
      |    len(list_intersect(w, ['el','la','de','que','y','en','un','por','con','los'])) AS hits_es,
      |    len(list_intersect(w, ['le','la','de','et','les','des','un','une','du','est'])) AS hits_fr,
      |    len(list_intersect(w, ['der','die','und','das','ist','von','mit','den','auf','ein'])) AS hits_de
      |  FROM toks)
      |SELECT doc_id, hits_en, hits_es, hits_fr, hits_de,
      |  CASE
      |    WHEN hits_en >= hits_es AND hits_en >= hits_fr AND hits_en >= hits_de AND hits_en > 0 THEN 'en'
      |    WHEN hits_es >= hits_fr AND hits_es >= hits_de AND hits_es > 0 THEN 'es'
      |    WHEN hits_fr >= hits_de AND hits_fr > 0 THEN 'fr'
      |    WHEN hits_de > 0 THEN 'de'
      |    ELSE 'und' END AS lang_pred
      |FROM hits ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.languageId(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  q("q_text_quality",
    """WITH base AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks,
      |    length(text)::DOUBLE AS n_chars,
      |    (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE AS punct
      |  FROM documents)
      |SELECT doc_id,
      |  round((n_chars - punct * 2) / greatest(n_chars, 1.0), 4) AS punct_score,
      |  round(least(len(list_intersect(
      |      list_filter(string_split_regex(lower(text), '\s+'), t -> t <> ''),
      |      ['the','and','of','to','in','is','that','it','for','was']))::DOUBLE
      |    / greatest(len(toks), 1) * 5, 1.0), 4) AS stop_score,
      |  round(least(len(toks) / 100.0, 1.0), 4) AS len_score,
      |  round((round((n_chars - punct * 2) / greatest(n_chars, 1.0), 4)
      |    + round(least(len(list_intersect(
      |        list_filter(string_split_regex(lower(text), '\s+'), t -> t <> ''),
      |        ['the','and','of','to','in','is','that','it','for','was']))::DOUBLE
      |      / greatest(len(toks), 1) * 5, 1.0), 4)
      |    + round(least(len(toks) / 100.0, 1.0), 4)) / 3, 4) AS quality
      |FROM base ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.qualityScore(t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  q("q_text_bpe_pairs",
    // BPE tokenizer induction, driver-visible surface: the weighted
    // adjacent-character pair counts the FIRST merge maximizes. The
    // corpus appears only through the word-frequency table (the one
    // distributed scan BPE training needs — the fastBPE discipline);
    // the full merge loop is vocab-sized driver work, spec-pinned
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |    t -> t <> '')) AS word
      |  FROM documents),
      |wc AS (SELECT word, count(*) AS freq FROM toks GROUP BY 1),
      |pairs AS (
      |  SELECT unnest([substr(word, i, 2) for i in range(1, length(word))]) AS pair,
      |    freq
      |  FROM wc)
      |SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM pairs GROUP BY 1
      |ORDER BY pair""".stripMargin) { (s, d) =>
    graft.operators.BpeTokenizer.pairCounts(t(s, d, "documents"), "text")
      .orderBy("pair")
  }

  /** Generated oracle for the ENCODED corpus: `m` unrolled BPE merge
    * steps as chained CTEs, then the token histogram of the final
    * segmentation. Each word is a chr(31)-wrapped space-joined symbol
    * string (chr(31) sorts below every corpus character, so ORDER BY
    * pair ASC in the delimited space IS the driver loop's lexicographic
    * (a, b) tie-break; symbols never contain space or chr(31), so
    * `replace` is collision-free and its left-to-right non-overlapping
    * scan is exactly [[graft.operators.BpeTokenizer.BpeModel.encodeWord]]'s
    * merge-every-occurrence pass). Rank-order replay ≡ greedy encoding
    * under the `mergesAreReplayOrderSafe` property (spec-pinned). */
  private def bpeEncodeOracle(m: Int): String = {
    val head =
      """WITH wc AS (
        |  SELECT word, count(*) AS freq FROM (
        |    SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t <> '')) AS word
        |    FROM documents) GROUP BY 1),
        |w0 AS (
        |  SELECT freq,
        |    array_to_string(list_transform(string_split(word, ''),
        |      c -> chr(31) || c || chr(31)), ' ') AS rep
        |  FROM wc)""".stripMargin
    val steps = (1 to m).map { k =>
      s"""p$k AS (
         |  SELECT unnest([l[i] || ' ' || l[i+1] for i in range(1, len(l))]) AS pair, freq
         |  FROM (SELECT string_split(rep, ' ') AS l, freq FROM w${k - 1}) WHERE len(l) >= 2),
         |b$k AS (SELECT pair FROM p$k GROUP BY pair ORDER BY sum(freq) DESC, pair ASC LIMIT 1),
         |w$k AS (SELECT freq,
         |    replace(rep, b.pair, replace(b.pair, chr(31) || ' ' || chr(31), '')) AS rep
         |  FROM w${k - 1} CROSS JOIN b$k b)""".stripMargin
    }
    val tail =
      s"""SELECT replace(tok, chr(31), '') AS token, CAST(sum(freq) AS BIGINT) AS n
         |FROM (SELECT unnest(string_split(rep, ' ')) AS tok, freq FROM w$m)
         |GROUP BY 1 ORDER BY token""".stripMargin
    (head +: steps).mkString(",\n") + "\n" + tail
  }

  q("q_text_bpe_encode",
    // the ENCODED-corpus surface q_text_bpe_pairs stops short of: train
    // 8 merges (driver loop over the vocab-sized word-count frame — the
    // one distributed scan), then the corpus token histogram under the
    // trained model. Encoding runs once per DISTINCT word; the oracle
    // replays the full merge loop as 8 unrolled CTE steps and must
    // agree token-for-token, count-for-count
    bpeEncodeOracle(8)) { (s, d) =>
    val docs = t(s, d, "documents")
    val model = graft.operators.BpeTokenizer.bpeTrain(docs, "text", nMerges = 8)
    graft.operators.BpeTokenizer.tokenHistogram(docs, "text", model)
      .orderBy("token")
  }

  q("q_sample_dsir",
    // DSIR importance-resampling data selection (Xie et al. 2023):
    // target = the English docs, raw pool = everything else; each raw
    // doc scored by the add-one-smoothed hashed-unigram log likelihood
    // ratio (1024 md5 buckets — engine-neutral), top-100 kept. The
    // per-doc sum rides the DECIMAL(38,12) bridge so it is
    // order-independent before the round-6 boundary
    """WITH toks AS (
      |  SELECT doc_id, lang = 'en' AS tgt,
      |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |      w -> w <> '')) AS w
      |  FROM documents),
      |bag AS (
      |  SELECT doc_id, tgt,
      |    CAST((md5_number_lower(w) >> 32) % 1024 AS BIGINT) AS b,
      |    count(*) AS c
      |  FROM toks GROUP BY 1, 2, 3),
      |bc AS (SELECT b,
      |    sum(CASE WHEN tgt THEN c ELSE 0 END) AS c_t,
      |    sum(CASE WHEN NOT tgt THEN c ELSE 0 END) AS c_r
      |  FROM bag GROUP BY 1),
      |tot AS (SELECT sum(c_t) AS n_t, sum(c_r) AS n_r FROM bc),
      |r AS (SELECT b,
      |    ln((c_t + 1.0) / (n_t + 1024.0)) -
      |    ln((c_r + 1.0) / (n_r + 1024.0)) AS lr
      |  FROM bc CROSS JOIN tot),
      |dw AS (SELECT bag.doc_id,
      |    sum(CAST(CAST(bag.c AS DOUBLE) * r.lr AS DECIMAL(38,12))) AS s
      |  FROM bag JOIN r USING (b) WHERE NOT bag.tgt GROUP BY 1)
      |SELECT d.doc_id, round(coalesce(CAST(dw.s AS DOUBLE), 0.0), 6) AS log_w
      |FROM documents d LEFT JOIN dw USING (doc_id)
      |WHERE d.lang <> 'en'
      |ORDER BY log_w DESC, d.doc_id LIMIT 100""".stripMargin) { (s, d) =>
    graft.operators.DataSelection.dsirSelect(
      t(s, d, "documents"), "doc_id", "text",
      col("lang") === "en", k = 100, nBuckets = 1024)
  }

  // learnable, ~balanced planted label for the LR trainer: does the doc
  // say 'join' more often than 'scan'? LR must discover opposite-sign
  // weights on exactly those two hashed buckets
  private def joinGtScan: Column =
    size(filter(split(lower(col("text")), "\\s+"), w => w === "join")) >
      size(filter(split(lower(col("text")), "\\s+"), w => w === "scan"))

  /** Generated oracle for the quantized-LR training loop: `iterations`
    * unrolled GD steps as chained CTEs over `trainFilter`ed documents.
    * Mirrors [[graft.operators.ClassifierTrain.trainQuantized]]
    * term-for-term (same association order, same DECIMAL bridge, same
    * micro-unit quantization); the caller appends the final SELECT. */
  private def logregTrainCtes(trainFilter: String, iterations: Int): String = {
    val label =
      """len(list_filter(string_split_regex(lower(text), '\s+'), w -> w = 'join')) >
        |      len(list_filter(string_split_regex(lower(text), '\s+'), w -> w = 'scan'))""".stripMargin
    val head =
      raw"""WITH toks AS (
         |  SELECT doc_id, $label AS y,
         |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
         |      w -> w <> '')) AS w
         |  FROM documents$trainFilter),
         |bag AS (
         |  SELECT doc_id, y, CAST(md5_number_lower(w) & 255 AS BIGINT) AS b,
         |    count(*) AS c
         |  FROM toks GROUP BY 1, 2, 3),
         |nt AS (SELECT doc_id, sum(c) AS n FROM bag GROUP BY 1),
         |nd AS (SELECT count(DISTINCT doc_id) AS nd FROM bag),
         |w0 AS (SELECT CAST(NULL AS BIGINT) AS b, CAST(NULL AS BIGINT) AS w
         |  WHERE false)""".stripMargin
    val iters = (1 to iterations).map { k =>
      val pw = s"w${k - 1}"
      s"""m$k AS (
         |  SELECT bag.doc_id, nt.n, sum(bag.c * coalesce($pw.w, 0)) AS m
         |  FROM bag JOIN nt USING (doc_id) LEFT JOIN $pw USING (b)
         |  GROUP BY 1, 2),
         |p$k AS (SELECT doc_id,
         |    1.0::DOUBLE / (1.0::DOUBLE + exp(-(CAST(m AS DOUBLE) / (n * 1000000.0)))) AS p
         |  FROM m$k),
         |g$k AS (
         |  SELECT bag.b, sum(CAST((CASE WHEN bag.y THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END
         |      - p$k.p) * bag.c / nt.n / nd.nd AS DECIMAL(38,12))) AS g
         |  FROM bag JOIN nt USING (doc_id) JOIN p$k USING (doc_id) CROSS JOIN nd
         |  GROUP BY 1),
         |w$k AS (
         |  SELECT coalesce($pw.b, g$k.b) AS b,
         |    coalesce($pw.w, 0) +
         |      CAST(round(1000.0::DOUBLE * CAST(coalesce(g$k.g, 0) AS DOUBLE)
         |        * 1000000.0) AS BIGINT) AS w
         |  FROM $pw FULL OUTER JOIN g$k ON $pw.b = g$k.b)""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }

  q("q_ml_logreg_train",
    // distributed quality-classifier TRAINING (the TextClassifier
    // inference twin): 4 full-batch mean-gradient GD steps on md5-hashed
    // unigram features, the model QUANTIZED to integer micro-units after
    // every step — margins are exact integer sums at each iteration
    // boundary, so the whole loop unrolls as generated CTE chains
    // (step 1 is float-free: w=0 -> p=0.5 exactly; later sigmoids feed
    // DECIMAL-bridged gradient sums)
    logregTrainCtes("", 4) +
      "\nSELECT b AS bucket, w AS w_micro FROM w4 ORDER BY bucket") { (s, d) =>
    graft.operators.ClassifierTrain.trainQuantized(
        t(s, d, "documents"), "doc_id", "text",
        joinGtScan, buckets = 256, iterations = 4, lr = 1000.0)
      .select(col("_b").as("bucket"), col("_w").as("w_micro"))
      .orderBy("bucket")
  }

  q("q_ml_logreg_confusion",
    // the trained filter evaluated where it matters: fit on EVEN doc_ids,
    // confusion counts on held-out ODD docs (the leakage-safe split
    // discipline). Predictions are integer-margin sign tests — every
    // output cell is an exact count
    logregTrainCtes(" WHERE doc_id % 2 = 0", 4) +
      """
        |, ho AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), w -> w = 'join')) >
        |      len(list_filter(string_split_regex(lower(text), '\s+'), w -> w = 'scan')) AS y,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      w -> w <> '')) AS w
        |  FROM documents WHERE doc_id % 2 = 1),
        |hbag AS (
        |  SELECT doc_id, y, CAST(md5_number_lower(w) & 255 AS BIGINT) AS b,
        |    count(*) AS c
        |  FROM ho GROUP BY 1, 2, 3),
        |hm AS (
        |  SELECT hbag.doc_id, any_value(hbag.y) AS y,
        |    sum(hbag.c * coalesce(w4.w, 0)) AS m
        |  FROM hbag LEFT JOIN w4 USING (b) GROUP BY 1)
        |SELECT y AS label, m > 0 AS pred, count(*) AS n
        |FROM hm GROUP BY 1, 2 ORDER BY label, pred""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents")
    val w = sharedLogregModel(s, d)
    graft.operators.ClassifierTrain.confusion(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        joinGtScan, w, buckets = 256)
      .orderBy("label", "pred")
  }

  q("q_ml_logreg_apply",
    // the DEPLOYMENT step the train/confusion pair stops short of: fit
    // on even doc_ids, then score the WHOLE corpus and keep the top-100
    // by margin — the "train a small quality filter, rank 100 TB by it"
    // pipeline shape. Margins are exact integer micro-unit sums, so the
    // ranking (margin desc, doc_id asc) replays bit-equal
    logregTrainCtes(" WHERE doc_id % 2 = 0", 4) +
      """
        |, sbag AS (
        |  SELECT doc_id, CAST(md5_number_lower(w) & 255 AS BIGINT) AS b,
        |    count(*) AS c
        |  FROM (
        |    SELECT doc_id,
        |      unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |        w -> w <> '')) AS w
        |    FROM documents) GROUP BY 1, 2),
        |sm AS (
        |  SELECT sbag.doc_id, sum(sbag.c * coalesce(w4.w, 0)) AS m
        |  FROM sbag LEFT JOIN w4 USING (b) GROUP BY 1)
        |SELECT doc_id, CAST(m AS BIGINT) AS margin_micro
        |FROM sm ORDER BY margin_micro DESC, doc_id LIMIT 100""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents")
    val w = sharedLogregModel(s, d)
    graft.operators.ClassifierTrain.scoreQuantized(
        docs, "doc_id", "text", w, buckets = 256)
      .orderBy(col("margin_micro").desc, col("doc_id"))
      .limit(100)
  }

  q("q_ml_calibration",
    // the deployment question confusion matrices don't answer: when the
    // model says 0.8, is it right 80 % of the time? Fit on even doc_ids,
    // score EVERYTHING, bin p = sigmoid(margin/(n_tok·1e6)) into 10
    // widths, compare mean prediction vs empirical positive rate per
    // bin. Margins are exact integer sums, mean-p rides the
    // DECIMAL(38,12) bridge, sigmoid's exp keeps rounds off half-points
    logregTrainCtes(" WHERE doc_id % 2 = 0", 4) +
      """
        |, sbag AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), w -> w = 'join')) >
        |      len(list_filter(string_split_regex(lower(text), '\s+'), w -> w = 'scan')) AS y,
        |    CAST(md5_number_lower(w) & 255 AS BIGINT) AS b,
        |    count(*) AS c
        |  FROM (
        |    SELECT doc_id, text,
        |      unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |        w -> w <> '')) AS w
        |    FROM documents) GROUP BY 1, 2, 3),
        |snt AS (SELECT doc_id, sum(c) AS n FROM sbag GROUP BY 1),
        |sm AS (
        |  SELECT sbag.doc_id, sbag.y, snt.n,
        |    sum(sbag.c * coalesce(w4.w, 0)) AS m
        |  FROM sbag JOIN snt USING (doc_id) LEFT JOIN w4 USING (b)
        |  GROUP BY 1, 2, 3),
        |sp AS (
        |  SELECT y,
        |    1.0::DOUBLE / (1.0::DOUBLE + exp(-(CAST(m AS DOUBLE) / (n * 1000000.0)))) AS p
        |  FROM sm),
        |sb AS (SELECT y, p,
        |    least(CAST(floor(p * 10) AS BIGINT), 9) AS bin FROM sp)
        |SELECT bin, count(*) AS n,
        |  CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  round(CAST(CAST(sum(CAST(CAST(p AS VARCHAR) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / count(*), 6) AS mean_p,
        |  round(CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS pos_rate
        |FROM sb GROUP BY bin ORDER BY bin""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents")
    val w = sharedLogregModel(s, d)
    graft.operators.ClassifierTrain.calibration(
        docs, "doc_id", "text", joinGtScan, w, buckets = 256, nBins = 10)
      .orderBy("bin")
  }

  q("q_text_normalize",
    // Unicode NFC normalization — the pre-hash canonicalization every
    // corpus dedup needs ("café" composed vs decomposed escapes exact
    // dedup otherwise). Fixture plants BOTH directions: combining-mark
    // sequences (doc_id%3=0: e + U+0301) that must compose, and
    // precomposed letters (%3=1: U+00E1) that must stay. Both engines
    // implement UAX #15 NFC, so the outputs hash-compare exactly
    """WITH dirty AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN replace(text, 'e', 'e' || chr(769))
      |         WHEN doc_id % 3 = 1 THEN replace(text, 'a', chr(225))
      |         ELSE text END AS t
      |  FROM documents)
      |SELECT doc_id, nfc_normalize(t) AS norm,
      |  length(t) AS n_raw, length(nfc_normalize(t)) AS n_norm
      |FROM dirty ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.UnicodeNormalize
    val dirty = t(s, d, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
          // decomposed: "e" + U+0301 combining acute (explicit escape — a
          // source-file glyph would be ambiguous between the two forms)
          regexp_replace(col("text"), lit("e"), lit("e\u0301")))
        .when(col("doc_id") % 3 === 1,
          // precomposed U+00E1
          regexp_replace(col("text"), lit("a"), lit("\u00e1")))
        .otherwise(col("text")).as("t"))
    dirty.select(col("doc_id"),
        UnicodeNormalize.nfcCol(col("t")).as("norm"),
        length(col("t")).as("n_raw"),
        length(UnicodeNormalize.nfcCol(col("t"))).as("n_norm"))
      .orderBy("doc_id")
  }

  q("q_text_fingerprint",
    """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"),
        graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")
  }

  q("q_text_entropy",
    // Shannon entropy of each doc's word distribution — one compiled
    // StaticInvoke per row (no explode → groupBy → join round-trip);
    // the oracle replays it relationally. H = log2(n) - sum(c*log2(c))/n.
    """WITH words AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS w
      |  FROM documents),
      |counts AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2),
      |h AS (SELECT doc_id, sum(c) AS n, sum(c * log2(c)) AS s FROM counts GROUP BY 1)
      |SELECT d.doc_id, round(coalesce(log2(h.n) - h.s / h.n, 0.0), 6) AS entropy
      |FROM documents d LEFT JOIN h USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"),
        round(graft.functions.TextEntropy.wordEntropyCol(col("text")), 6)
          .as("entropy"))
      .orderBy("doc_id")
  }

  q("q_dedup_url",
    // URL-level dedup for a web corpus: many crawl spellings of the same
    // page (host case, www., default ports, tracking params, fragments,
    // trailing slashes) collapse to one canonical key, making URL dedup
    // a single hash shuffle. URLs are salted deterministically from
    // doc_id; the canonicalization is pure RE2-safe regex/string ops, so
    // the oracle replays the exact pipeline.
    """WITH urls AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 5 AS INT)
      |      WHEN 0 THEN 'HTTPS://WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.com:443/Article/' || CAST(doc_id % 97 AS VARCHAR) || '/?utm_source=feed&id=' || CAST(doc_id % 31 AS VARCHAR) || '#frag'
      |      WHEN 1 THEN 'http://example' || CAST(doc_id % 7 AS VARCHAR) || '.com:80/a/b'
      |      WHEN 2 THEN 'https://example' || CAST(doc_id % 7 AS VARCHAR) || '.com/Article/' || CAST(doc_id % 97 AS VARCHAR) || '?id=' || CAST(doc_id % 31 AS VARCHAR) || '&gclid=xyz'
      |      WHEN 3 THEN 'not a url ' || CAST(doc_id AS VARCHAR)
      |      ELSE 'https://sub.example' || CAST(doc_id % 7 AS VARCHAR) || '.com:8443/x//y/?fbclid=1&q=' || CAST(doc_id % 13 AS VARCHAR)
      |    END AS url
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id, url,
      |    lower(nullif(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), '')) AS scheme,
      |    lower(nullif(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '')) AS host_port,
      |    regexp_replace(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), '#.*$', '') AS rest
      |  FROM urls),
      |pieces AS (
      |  SELECT doc_id, url, scheme,
      |    regexp_replace(regexp_replace(host_port, ':[0-9]*$', ''), '^www\.', '') AS host,
      |    regexp_extract(host_port, ':([0-9]+)$', 1) AS port,
      |    regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '') AS path,
      |    regexp_extract(rest, '\?(.*)$', 1) AS raw_query
      |  FROM parts),
      |tidy AS (
      |  SELECT doc_id, url, scheme, host, port, path,
      |    -- empty list -> array_to_string yields NULL in DuckDB; coalesce
      |    -- to '' so a query reduced to nothing drops cleanly
      |    coalesce(array_to_string(list_filter(string_split(raw_query, '&'),
      |      p -> p <> '' AND NOT regexp_matches(p, '^(?:utm_[^=&#]*|gclid|fbclid|msclkid|ref_src)(=.*)?$')), '&'), '') AS tidied
      |  FROM pieces),
      |canon AS (
      |  SELECT doc_id,
      |    CASE WHEN scheme IS NULL THEN url
      |         ELSE scheme || '://' || host ||
      |           CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
      |                  OR (scheme = 'https' AND port = '443') THEN ''
      |                ELSE ':' || port END ||
      |           path ||
      |           CASE WHEN tidied = '' THEN '' ELSE '?' || tidied END
      |    END AS canonical_url
      |  FROM tidy)
      |SELECT canonical_url, count(*) AS n_urls, min(doc_id) AS survivor
      |FROM canon GROUP BY canonical_url ORDER BY canonical_url""".stripMargin) { (s, d) =>
    val id = col("doc_id")
    def part(m: Int) = (id % m).cast("string")
    val url = when(id % 5 === 0,
        concat(lit("HTTPS://WWW.Example"), part(7), lit(".com:443/Article/"),
          part(97), lit("/?utm_source=feed&id="), part(31), lit("#frag")))
      .when(id % 5 === 1,
        concat(lit("http://example"), part(7), lit(".com:80/a/b")))
      .when(id % 5 === 2,
        concat(lit("https://example"), part(7), lit(".com/Article/"),
          part(97), lit("?id="), part(31), lit("&gclid=xyz")))
      .when(id % 5 === 3, concat(lit("not a url "), id.cast("string")))
      .otherwise(concat(lit("https://sub.example"), part(7),
        lit(".com:8443/x//y/?fbclid=1&q="), part(13)))
    t(s, d, "documents")
      .select(id, graft.operators.UrlOps.canonicalizeUrl(url).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_urls"), min(id).as("survivor"))
      .orderBy("canonical_url")
  }

  q("q_dedup_url_latest",
    // recrawl snapshot dedup: same salted URL spellings as q_dedup_url
    // plus a deterministic capture version (doc_id*37 mod 97); keep the
    // NEWEST capture per canonical URL, ties to lowest doc_id — "the
    // current version of every page". Selection = two keyed aggs on the
    // canonical key, never a per-URL window sort.
    """WITH urls AS (
      |  SELECT doc_id, CAST((doc_id * 37) % 97 AS BIGINT) AS ts,
      |    CASE CAST(doc_id % 5 AS INT)
      |      WHEN 0 THEN 'HTTPS://WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.com:443/Article/' || CAST(doc_id % 97 AS VARCHAR) || '/?utm_source=feed&id=' || CAST(doc_id % 31 AS VARCHAR) || '#frag'
      |      WHEN 1 THEN 'http://example' || CAST(doc_id % 7 AS VARCHAR) || '.com:80/a/b'
      |      WHEN 2 THEN 'https://example' || CAST(doc_id % 7 AS VARCHAR) || '.com/Article/' || CAST(doc_id % 97 AS VARCHAR) || '?id=' || CAST(doc_id % 31 AS VARCHAR) || '&gclid=xyz'
      |      WHEN 3 THEN 'not a url ' || CAST(doc_id AS VARCHAR)
      |      ELSE 'https://sub.example' || CAST(doc_id % 7 AS VARCHAR) || '.com:8443/x//y/?fbclid=1&q=' || CAST(doc_id % 13 AS VARCHAR)
      |    END AS url
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id, ts, url,
      |    lower(nullif(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), '')) AS scheme,
      |    lower(nullif(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '')) AS host_port,
      |    regexp_replace(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), '#.*$', '') AS rest
      |  FROM urls),
      |pieces AS (
      |  SELECT doc_id, ts, url, scheme,
      |    regexp_replace(regexp_replace(host_port, ':[0-9]*$', ''), '^www\.', '') AS host,
      |    regexp_extract(host_port, ':([0-9]+)$', 1) AS port,
      |    regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '') AS path,
      |    regexp_extract(rest, '\?(.*)$', 1) AS raw_query
      |  FROM parts),
      |tidy AS (
      |  SELECT doc_id, ts, url, scheme, host, port, path,
      |    coalesce(array_to_string(list_filter(string_split(raw_query, '&'),
      |      p -> p <> '' AND NOT regexp_matches(p, '^(?:utm_[^=&#]*|gclid|fbclid|msclkid|ref_src)(=.*)?$')), '&'), '') AS tidied
      |  FROM pieces),
      |canon AS (
      |  SELECT doc_id, ts,
      |    CASE WHEN scheme IS NULL THEN url
      |         ELSE scheme || '://' || host ||
      |           CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
      |                  OR (scheme = 'https' AND port = '443') THEN ''
      |                ELSE ':' || port END ||
      |           path ||
      |           CASE WHEN tidied = '' THEN '' ELSE '?' || tidied END
      |    END AS canonical_url
      |  FROM tidy),
      |latest AS (
      |  SELECT canonical_url, max(ts) AS latest_ts, count(*) AS n_snapshots
      |  FROM canon GROUP BY canonical_url)
      |SELECT c.canonical_url, l.latest_ts, min(c.doc_id) AS keep_id, l.n_snapshots
      |FROM canon c JOIN latest l
      |  ON c.canonical_url = l.canonical_url AND c.ts = l.latest_ts
      |GROUP BY 1, 2, 4
      |ORDER BY c.canonical_url""".stripMargin) { (s, d) =>
    val id = col("doc_id")
    def part(m: Int) = (id % m).cast("string")
    val url = when(id % 5 === 0,
        concat(lit("HTTPS://WWW.Example"), part(7), lit(".com:443/Article/"),
          part(97), lit("/?utm_source=feed&id="), part(31), lit("#frag")))
      .when(id % 5 === 1,
        concat(lit("http://example"), part(7), lit(".com:80/a/b")))
      .when(id % 5 === 2,
        concat(lit("https://example"), part(7), lit(".com/Article/"),
          part(97), lit("?id="), part(31), lit("&gclid=xyz")))
      .when(id % 5 === 3, concat(lit("not a url "), id.cast("string")))
      .otherwise(concat(lit("https://sub.example"), part(7),
        lit(".com:8443/x//y/?fbclid=1&q="), part(13)))
    graft.operators.UrlOps.latestPerUrl(
        t(s, d, "documents")
          .select(id, ((id * 37) % 97).cast("long").as("ts"), url.as("url")),
        "doc_id", "url", "ts")
      .orderBy("canonical_url")
  }

  q("q_text_gopher",
    // Gopher-rule quality breakdown: word-count band, mean word length,
    // alpha-word fraction, each auditable plus the combined pass flag.
    // Bounds [20, 80] sit inside the fixture's 10-99 word range so the
    // word-count rule splits both ways here; the fixture's synthetic
    // all-alpha short-word text cannot fail the mwl/alpha rules, so
    // THOSE rules' falsifiability lives in the gopherRules spec, not
    // this oracle. n_words coalesces so a null text is (0, fail), the
    // operator's contract, not SQL-null.
    """WITH toks AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS tk
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(coalesce(len(tk), 0) AS BIGINT) AS n_words,
      |    CASE WHEN len(tk) > 0
      |      THEN CAST(round(CAST(CAST((length(regexp_replace(text, '\s+', '', 'g')) * 1.0 / len(tk)) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
      |      ELSE 0.0 END AS mean_word_len,
      |    CASE WHEN len(tk) > 0
      |      THEN CAST(round(CAST(CAST((len(list_filter(tk, w -> regexp_matches(w, '[A-Za-z]'))) * 1.0 / len(tk)) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE)
      |      ELSE 0.0 END AS alpha_frac
      |  FROM toks)
      |SELECT doc_id, n_words, mean_word_len, alpha_frac,
      |  n_words >= 20 AND n_words <= 80 AS ok_words,
      |  mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS ok_mwl,
      |  alpha_frac >= 0.8 AS ok_alpha,
      |  ok_words AND ok_mwl AND ok_alpha AS pass
      |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.gopherRules(
        t(s, d, "documents"), "doc_id", "text",
        minWords = 20L, maxWords = 80L)
      .orderBy("doc_id")
  }

  q("q_text_tfidf",
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |len AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT tf.doc_id, tf.term,
      |    round(tf.tf * 1.0 / len.len * ln((SELECT count(*) FROM documents) * 1.0 / df.df), 6) AS tfidf
      |  FROM tf JOIN len USING (doc_id) JOIN df USING (term))
      |SELECT doc_id, term, tfidf, rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
      |  FROM scored) WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.tfIdfTopTerms(t(s, d, "documents"), "doc_id", "text", 3)
      .orderBy("doc_id", "rk")
  }

  q("q_text_strip_html",
    // HTML → text extraction (the first stage of crawl-corpus prep):
    // pages are salted deterministically from doc_id (the q_dedup_url
    // convention), then script/style/comment blocks, tags, and entities
    // strip through the exact Java∩RE2-safe pipeline the oracle replays
    """WITH pages AS (
      |  SELECT doc_id,
      |    '<html><!-- id ' || doc_id || ' --><head><style>p{color:#333}</style>'
      |    || '<script src="x.js">track(1&2);</script></head><body><h1>Doc '
      |    || doc_id || '</h1><p>' || text || '</p><div class="f">&amp;copy; 2026 '
      |    || '&lt;Corp&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</div></body></html>' AS html
      |  FROM documents),
      |stripped AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
      |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |      '(?s)<!--.*?-->', ' ', 'g'),
      |      '(?s)<[^>]+>', ' ', 'g') AS t
      |  FROM pages),
      |decoded AS (
      |  SELECT doc_id,
      |    replace(replace(replace(replace(replace(replace(t,
      |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      |      '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS t
      |  FROM stripped)
      |SELECT doc_id,
      |  trim(regexp_replace(t, '\s+', ' ', 'g')) AS clean,
      |  length(trim(regexp_replace(t, '\s+', ' ', 'g'))) AS n_chars_clean
      |FROM decoded ORDER BY doc_id""".stripMargin) { (s, d) =>
    val id = col("doc_id")
    val html = concat(
      lit("<html><!-- id "), id.cast("string"),
      lit(" --><head><style>p{color:#333}</style><script src=\"x.js\">track(1&2);</script></head><body><h1>Doc "),
      id.cast("string"),
      lit("</h1><p>"), col("text"),
      lit("</p><div class=\"f\">&amp;copy; 2026 &lt;Corp&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</div></body></html>"))
    t(s, d, "documents")
      .select(id, graft.operators.TextAnalysis.stripHtml(html).as("clean"))
      .withColumn("n_chars_clean", length(col("clean")))
      .orderBy("doc_id")
  }

  q("q_text_strip_boilerplate",
    // line-level boilerplate removal (RefinedWeb/CCNet): pages salted
    // with a universal copyright line (df=all docs), a rotating
    // subscribe line (df≈1/5 of docs), and a unique ref line; lines in
    // >= 10 distinct docs are dropped, the rest rejoin in order. The
    // doc text itself survives (planted dup groups are < 10 docs).
    """WITH pages AS (
      |  SELECT doc_id,
      |    coalesce(text, '') || chr(10) || 'Copyright 2026 Example Corp' || chr(10)
      |    || 'Subscribe channel ' || CAST(doc_id % 5 AS VARCHAR) || chr(10)
      |    || 'ref ' || CAST(doc_id AS VARCHAR) AS page
      |  FROM documents),
      |l AS (SELECT doc_id, string_split(page, chr(10)) AS ln FROM pages),
      |flat AS (
      |  SELECT doc_id, unnest([{'idx': i, 'line': ln[i]} for i in range(1, len(ln)+1)]) AS s
      |  FROM l),
      |lines AS (SELECT doc_id, s.idx AS idx, s.line AS line FROM flat),
      |hot AS (SELECT line FROM lines WHERE line <> ''
      |        GROUP BY line HAVING count(DISTINCT doc_id) >= 10),
      |kept AS (SELECT doc_id, idx, line FROM lines
      |         WHERE line NOT IN (SELECT line FROM hot)),
      |agg AS (
      |  SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS clean_text,
      |    count(*) AS n_kept
      |  FROM kept GROUP BY doc_id),
      |totals AS (SELECT doc_id, count(*) AS n_total FROM lines GROUP BY doc_id)
      |SELECT t.doc_id, coalesce(a.clean_text, '') AS clean_text,
      |  coalesce(a.n_kept, 0) AS n_kept,
      |  t.n_total - coalesce(a.n_kept, 0) AS n_dropped
      |FROM totals t LEFT JOIN agg a USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    val id = col("doc_id")
    val page = concat(
      coalesce(col("text"), lit("")),
      lit("\nCopyright 2026 Example Corp\nSubscribe channel "),
      (id % 5).cast("string"),
      lit("\nref "), id.cast("string"))
    graft.operators.TextAnalysis.stripBoilerplateLines(
        t(s, d, "documents").select(id, page.as("page")),
        "doc_id", "page", minDocs = 10L)
      .orderBy("doc_id")
  }

  q("q_text_extract_links",
    // outlink extraction (link-graph prep): pages salted with two
    // absolute links (host case, www., default port variants) and a
    // relative one every 4th doc; hrefs come out of ONE codegen'd RE2
    // regexp_extract_all, hosts canonicalize via the q_dedup_url string
    // pipeline, relative links (null host) stay out of the graph by
    // contract. Per-host outlink count + distinct-page count.
    """WITH pages AS (
      |  SELECT doc_id,
      |    '<p>' || text || '</p><a href="HTTPS://WWW.News' || CAST(doc_id % 5 AS VARCHAR)
      |    || '.example.com/a/' || CAST(doc_id % 11 AS VARCHAR) || '">n</a><a href="http://blog'
      |    || CAST(doc_id % 3 AS VARCHAR) || '.example.com:80/x?q=' || CAST(doc_id % 7 AS VARCHAR)
      |    || '">b</a>' || CASE WHEN doc_id % 4 = 0 THEN '<a href="/rel/x">r</a>' ELSE '' END AS html
      |  FROM documents),
      |links AS (
      |  SELECT doc_id, unnest(regexp_extract_all(html, '(?i)href="([^"]+)"', 1)) AS link
      |  FROM pages),
      |hosts AS (
      |  SELECT doc_id, regexp_replace(regexp_replace(
      |      lower(nullif(regexp_extract(link, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '')),
      |      ':[0-9]*$', ''), '^www\.', '') AS host
      |  FROM links)
      |SELECT host, count(*) AS n_links, count(DISTINCT doc_id) AS n_docs
      |FROM hosts WHERE host IS NOT NULL
      |GROUP BY host ORDER BY host""".stripMargin) { (s, d) =>
    val id = col("doc_id")
    def part(m: Int) = (id % m).cast("string")
    val html = concat(
      lit("<p>"), col("text"),
      lit("</p><a href=\"HTTPS://WWW.News"), part(5),
      lit(".example.com/a/"), part(11),
      lit("\">n</a><a href=\"http://blog"), part(3),
      lit(".example.com:80/x?q="), part(7), lit("\">b</a>"),
      when(id % 4 === 0, lit("<a href=\"/rel/x\">r</a>")).otherwise(lit("")))
    t(s, d, "documents")
      .select(id, explode(graft.operators.UrlOps.extractLinks(html)).as("link"))
      .select(id, graft.operators.UrlOps.linkHost(col("link")).as("host"))
      .filter(col("host").isNotNull)
      .groupBy("host")
      .agg(count(lit(1)).as("n_links"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("host")
  }

  q("q_text_classify",
    // hashed-feature linear classifier inference (fastText-style quality
    // filter): md5 buckets + integer micro-unit weights make the per-doc
    // weight sum order-independent and bit-replayable; the engine runs
    // ONE compiled static call per row, the oracle the relational form.
    // score rounds through the VARCHAR->DECIMAL bridge: wsum/1e6/n is a
    // RATIONAL whose double can print as exactly ...5 at the 6th place
    // (one sf1 doc does), where Spark's shortest-repr BigDecimal HALF_UP
    // rounds up but DuckDB's x*1e6 binary multiply lands below the half
    // — the bridge replays Spark's semantics exactly (q_tpch1 discipline)
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS w
      |  FROM documents),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_tokens,
      |    sum((${graft.functions.TextClassifier.weightsSqlLiteral(11L, 64)})[CAST((md5_number_lower(w) & 63) + 1 AS BIGINT)]) AS wsum
      |  FROM toks GROUP BY doc_id),
      |scored AS (
      |  SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
      |    CAST(round(CAST(CAST((0.05 + coalesce(a.wsum, 0) / 1000000.0 / greatest(coalesce(a.n_tokens, 1), 1)) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS score
      |  FROM documents d LEFT JOIN agg a USING (doc_id))
      |SELECT doc_id, n_tokens, score, score >= 0.0 AS keep
      |FROM scored ORDER BY doc_id""".stripMargin) { (s, d) =>
    val txt = col("text")
    t(s, d, "documents")
      .select(col("doc_id"),
        coalesce(size(graft.operators.TextAnalysis.tokens(txt)), lit(0)).as("n_tokens"),
        coalesce(graft.functions.TextClassifier.hashedWeightSumCol(lower(txt), 11L, 64),
          lit(0L)).as("wsum"))
      .select(col("doc_id"), col("n_tokens"),
        round(lit(0.05) + col("wsum").cast("double") / lit(1000000.0)
          / greatest(col("n_tokens"), lit(1)).cast("double"), 6).as("score"))
      .withColumn("keep", col("score") >= 0.0)
      .orderBy("doc_id")
  }

  q("q_topk_grouped",
    // per-group top-k as ONE bounded-heap aggregate (TopKAgg): the window
    // formulation must fully sort every group (5 priority groups = 5 giant
    // sort tasks at 100 TB); the agg keeps a k-element heap per group with
    // map-side partial aggregation, so the shuffle carries ≤ k rows per
    // group per mapper. The oracle is the window formulation — results
    // are identical, only the plan differs.
    """SELECT o_orderpriority, rk, totalprice, o_orderkey FROM (
      |  SELECT o_orderpriority,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk,
      |    cast(o_totalprice AS DOUBLE) AS totalprice, o_orderkey
      |  FROM orders) WHERE rk <= 3
      |ORDER BY o_orderpriority, rk""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .groupBy("o_orderpriority")
      .agg(graft.functions.SketchAggregates.topKAgg(
        col("o_totalprice").cast("double"), col("o_orderkey"), 3).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rk"),
        col("col.score").as("totalprice"), col("col.id").as("o_orderkey"))
      .orderBy("o_orderpriority", "rk")
  }

  q("q_text_repetition",
    // Gopher-style repetition filters: duplicate-word fraction, top-bigram
    // fraction, duplicate-bigram occurrence fraction (multiplicity kept —
    // unlike the dedup shingles, which are distinct)
    """WITH words AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
      |wstats AS (
      |  SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct
      |  FROM words),
      |bg AS (
      |  SELECT doc_id, unnest(
      |    [array_to_string(w[i:i+1], ' ') for i in range(1, greatest(len(w), 1))]) AS b
      |  FROM words),
      |bgc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
      |bstats AS (
      |  SELECT doc_id, sum(c) AS n_bg, max(c) AS top_c,
      |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_c
      |  FROM bgc GROUP BY 1)
      |SELECT doc_id,
      |  CAST(round(CAST(CAST((1.0 - n_distinct * 1.0 / n_words) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS dup_word_frac,
      |  CAST(round(CAST(CAST((top_c * 1.0 / n_bg) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS top_bigram_frac,
      |  CAST(round(CAST(CAST((dup_c * 1.0 / n_bg) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS dup_bigram_frac
      |FROM wstats JOIN bstats USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.repetitionScore(
        t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  q("q_embed_quantize",
    // symmetric int8 quantization summarized to scalar columns (the raw
    // int8 array is not driver-hashable; q_sum/q_sqsum pin every value)
    """WITH q AS (
      |  SELECT vec_id,
      |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS mx,
      |    embedding::DOUBLE[] AS e
      |  FROM embeddings)
      |SELECT vec_id,
      |  round(mx / 127, 6) AS scale,
      |  CAST(list_sum(list_transform(e, x -> round(x * 127 / mx))) AS BIGINT) AS q_sum,
      |  CAST(list_sum(list_transform(e, x -> round(x * 127 / mx) ** 2)) AS BIGINT) AS q_sqsum
      |FROM q ORDER BY vec_id""".stripMargin) { (s, d) =>
    // one compiled pass per row (vecQuantStats) — the HOF formulation in
    // Similarity.quantizeInt8 costs interpreted closures per element; the
    // spec asserts both agree
    t(s, d, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.vecQuantStats(col("embedding")).as("st"))
      .select(col("vec_id"),
        round(col("st.scale"), 6).as("scale"),
        col("st.q_sum").as("q_sum"), col("st.q_sqsum").as("q_sqsum"))
      .orderBy("vec_id")
  }

  q("q_embed_standardize",
    // per-dimension z-score standardization (diagonal whitening): the
    // d-group (n, Σx, Σx²) pass with DECIMAL(38,12) per-term sums, then
    // a broadcast join back onto the vectors. Verified on the probe
    // slice vec_id < 5 (the stats still come from the FULL corpus);
    // decimal→double crossings ride the VARCHAR bridge, z rounds via the
    // DECIMAL(38,20) route (q_embed_drift discipline)
    """WITH x AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim1,
      |         unnest(embedding)::DOUBLE AS v
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |st AS (SELECT dim1, count(*) AS n,
      |         sum(CAST(CAST(v AS VARCHAR) AS DECIMAL(38,12))) AS s,
      |         sum(CAST(CAST(v * v AS VARCHAR) AS DECIMAL(38,12))) AS ss
      |       FROM x GROUP BY dim1),
      |m AS (SELECT dim1,
      |        CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |        sqrt(greatest(
      |          CAST(CAST(ss AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
      |            - (CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
      |              * (CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)),
      |          0.0)) AS sd
      |      FROM st)
      |SELECT x.vec_id, CAST(x.dim1 - 1 AS BIGINT) AS dim,
      |  CAST(round(CAST(CAST(
      |    CASE WHEN m.sd = 0.0 THEN 0.0 ELSE (x.v - m.mean) / m.sd END
      |    AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS z
      |FROM x JOIN m USING (dim1) WHERE x.vec_id < 5
      |ORDER BY vec_id, dim""".stripMargin) { (s, d) =>
    graft.operators.Similarity.standardizeDims(
        t(s, d, "embeddings"), "vec_id", "embedding")
      .filter(col("vec_id") < 5)
      .withColumn("z", round(col("z"), 6))
      .orderBy("vec_id", "dim")
  }

  q("q_embed_drift",
    // per-dimension distribution drift between two embedding snapshots
    // (vec_id parity = the synthetic old/new split): the encoder-change
    // monitor. One posexplode + d-group agg per side; sums add through
    // per-term DECIMAL(38,12) casts (order-independent), divisions and
    // rounds follow the q_events_twap VARCHAR→DECIMAL bridge
    """WITH o AS (
      |  SELECT generate_subscripts(embedding, 1) AS dim1,
      |         unnest(embedding)::DOUBLE AS v
      |  FROM embeddings WHERE vec_id % 2 = 0 AND embedding IS NOT NULL),
      |n AS (
      |  SELECT generate_subscripts(embedding, 1) AS dim1,
      |         unnest(embedding)::DOUBLE AS v
      |  FROM embeddings WHERE vec_id % 2 = 1 AND embedding IS NOT NULL),
      |os AS (SELECT dim1, count(*) AS n_old,
      |         sum(CAST(CAST(v AS VARCHAR) AS DECIMAL(38,12))) AS so
      |       FROM o GROUP BY dim1),
      |ns AS (SELECT dim1, count(*) AS n_new,
      |         sum(CAST(CAST(v AS VARCHAR) AS DECIMAL(38,12))) AS sn
      |       FROM n GROUP BY dim1)
      |SELECT CAST(os.dim1 - 1 AS BIGINT) AS dim, n_old, n_new,
      |  CAST(round(CAST(CAST((CAST(so AS DOUBLE) / CAST(n_old AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean_old,
      |  CAST(round(CAST(CAST((CAST(sn AS DOUBLE) / CAST(n_new AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS mean_new,
      |  CAST(round(CAST(CAST((CAST(sn AS DOUBLE) / CAST(n_new AS DOUBLE)
      |    - CAST(so AS DOUBLE) / CAST(n_old AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS shift
      |FROM os JOIN ns USING (dim1) ORDER BY dim""".stripMargin) { (s, d) =>
    val emb = t(s, d, "embeddings")
    graft.operators.Similarity.embeddingDrift(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), "embedding")
      .orderBy("dim")
  }

  q("q_text_zipf",
    // Zipf-law head fit (corpus-shape diagnostic: slope ≈ −1 is healthy
    // natural text; duplication bends the head, template spam flattens
    // it): OLS over the top-100 (ln rank, ln freq) points. One tokenize
    // + keyed count scan, TakeOrdered head cut, regression sums through
    // DECIMAL(38,18) per-term casts (order-independent)
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
      |  FROM documents),
      |tc AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
      |top AS (SELECT term, cnt FROM tc ORDER BY cnt DESC, term LIMIT 100),
      |pts AS (SELECT
      |    ln(CAST(row_number() OVER (ORDER BY cnt DESC, term) AS DOUBLE)) AS x,
      |    ln(CAST(cnt AS DOUBLE)) AS y
      |  FROM top),
      |s AS (SELECT count(*) AS n,
      |    CAST(CAST(sum(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(sum(CAST(CAST(y AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(sum(CAST(CAST(x * y AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sxy,
      |    CAST(CAST(sum(CAST(CAST(x * x AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sxx
      |  FROM pts)
      |SELECT n AS n_terms,
      |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
      |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4) AS intercept
      |FROM s""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.zipfFit(t(s, d, "documents"), "text", topN = 100)
      .select(col("n_terms"),
        round(col("slope"), 4).as("slope"),
        round(col("intercept"), 4).as("intercept"))
  }

  q("q_text_vocab_drift",
    // vocabulary drift between corpus snapshots (doc_id parity split):
    // the text twin of q_embed_drift. Counts are exact integers; the
    // frequency shift is a flat rational round, so the oracle replays
    // it through the VARCHAR→DECIMAL bridge (the percent_rank
    // discipline)
    """WITH o AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
      |  FROM documents WHERE doc_id % 2 = 0),
      |n AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
      |  FROM documents WHERE doc_id % 2 = 1),
      |oc AS (SELECT term, count(*) AS c_old FROM o GROUP BY term),
      |nc AS (SELECT term, count(*) AS c_new FROM n GROUP BY term),
      |t AS (SELECT (SELECT sum(c_old) FROM oc) AS t_old,
      |             (SELECT sum(c_new) FROM nc) AS t_new),
      |j AS (
      |  SELECT coalesce(oc.term, nc.term) AS term,
      |    coalesce(c_old, 0) AS c_old, coalesce(c_new, 0) AS c_new
      |  FROM oc FULL JOIN nc ON oc.term = nc.term)
      |SELECT term, c_old, c_new,
      |  CAST(round(CAST(CAST((CAST(c_new AS DOUBLE) / t_new
      |    - CAST(c_old AS DOUBLE) / t_old) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS freq_shift
      |FROM j CROSS JOIN t
      |ORDER BY c_old + c_new DESC, term LIMIT 40""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents")
    graft.operators.TextAnalysis.vocabDrift(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), "text", topK = 40)
  }

  // ------------------------------------------------ product quantization

  /** PQ fixture convention (mirrors [[ivfCentroids]]): codebooks are the
    * 8-dim sub-slices of the first 16 vectors, so the oracle re-derives
    * them in SQL; assignment distances reduce to pure dot products
    * (|c|² − 2·v·c) and replay bit-identically via `list_dot_product`. */
  private def pqCodebooks(s: SparkSession, d: String): Seq[Seq[Array[Float]]] =
    graft.operators.Similarity.pqCodebooksFromRows(
      t(s, d, "embeddings").filter(col("vec_id") < 16).orderBy("vec_id")
        .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq,
      numSub = 8)

  q("q_embed_pq",
    // PQ code assignment: 64-dim float32 vectors → 8 byte-sized codes
    // (32× compression for a 100 TB embedding table); every (vector,
    // subspace) row carries the nearest codebook entry by squared L2
    // with min-index tiebreak — distances are |c|²−2·v·c, dot products
    // only, so DuckDB replays the argmin bit-for-bit
    """WITH cb AS (
      |  SELECT vec_id AS j, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 16),
      |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE embedding IS NOT NULL),
      |codes AS (
      |  SELECT v.vec_id, m.range AS m,
      |    (SELECT j FROM cb
      |     ORDER BY round(
      |       list_dot_product(cv[m.range*8+1 : m.range*8+8], cv[m.range*8+1 : m.range*8+8])
      |       - 2 * list_dot_product(e[m.range*8+1 : m.range*8+8], cv[m.range*8+1 : m.range*8+8]), 9) ASC, j
      |     LIMIT 1) AS code
      |  FROM v CROSS JOIN range(8) m)
      |SELECT vec_id, m, code FROM codes ORDER BY vec_id, m""".stripMargin) { (s, d) =>
    graft.operators.Similarity.pqCodes(
        t(s, d, "embeddings"), "vec_id", "embedding", pqCodebooks(s, d))
      .orderBy("vec_id", "m")
  }

  // ADC retrieval over PQ codes: probe·v ≈ Σ_m LUT[m][code_m(v)], the
  // lookup table in integer micro-units so partial sums are exact
  // under any accumulation order — the oracle recomputes the same LUT
  // from the same dot products and sums the same integers. Shared by the
  // scan form (q_sim_pq, codes re-derived from vectors) and the indexed
  // form (q_sim_pq_indexed, codes read from the materialized table):
  // both produce identical rows by construction.
  private val pqAdcOracleSql =
    """WITH cb AS (
      |  SELECT vec_id AS j, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 16),
      |probe AS (SELECT embedding::DOUBLE[] AS pv FROM embeddings WHERE vec_id = 0),
      |lut AS (
      |  SELECT m.range AS m, cb.j,
      |    CAST(round(list_dot_product(
      |      (SELECT pv FROM probe)[m.range*8+1 : m.range*8+8],
      |      cv[m.range*8+1 : m.range*8+8]) * 1000000) AS BIGINT) AS s
      |  FROM cb CROSS JOIN range(8) m),
      |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id <> 0 AND embedding IS NOT NULL),
      |codes AS (
      |  SELECT v.vec_id, m.range AS m,
      |    (SELECT j FROM cb
      |     ORDER BY round(
      |       list_dot_product(cv[m.range*8+1 : m.range*8+8], cv[m.range*8+1 : m.range*8+8])
      |       - 2 * list_dot_product(e[m.range*8+1 : m.range*8+8], cv[m.range*8+1 : m.range*8+8]), 9) ASC, j
      |     LIMIT 1) AS code
      |  FROM v CROSS JOIN range(8) m),
      |scored AS (
      |  SELECT c.vec_id, sum(l.s) AS score
      |  FROM codes c JOIN lut l ON l.m = c.m AND l.j = c.code
      |  GROUP BY c.vec_id)
      |SELECT vec_id, round(score / 1000000.0, 6) AS approx_dot
      |FROM scored ORDER BY approx_dot DESC, vec_id LIMIT 10""".stripMargin

  q("q_sim_pq", pqAdcOracleSql) { (s, d) =>
    val emb = t(s, d, "embeddings")
    graft.operators.Similarity.adcTopK(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      pqCodebooks(s, d), embProbe(s, d), k = 10)
  }

  private def pqIndexPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "pq") { p =>
      graft.operators.Similarity.buildPqIndex(
        t(s, d, "embeddings").filter(col("vec_id") =!= 0),
        "vec_id", "embedding", pqCodebooks(s, d), p)
    }

  q("q_sim_pq_indexed", pqAdcOracleSql) { (s, d) =>
    // the steady-state 100 TB shape: the probe PLAN scans only the
    // materialized numSub-ints-per-row code table (32× less IO than the
    // vectors — the embedding table appears nowhere in it; codebooks and
    // probe are driver-side scalars, the fixture's 16-row collect)
    graft.operators.Similarity.adcTopKIndexed(
      s, pqIndexPath(s, d), "vec_id",
      pqCodebooks(s, d), embProbe(s, d), k = 10)
  }

  // ---- refreshed-index twins (r7): each ANN index built on a 2/3
  // stratum then refreshed with the held-out 1/3 — the probes against
  // the refreshed layout must hash-equal the SAME full-corpus oracles
  // the full builds use, making refresh ≡ rebuild driver-visible for
  // the whole index family (the q_text_bm25_index_refresh discipline)
  private def lshRefreshPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "lshrefresh") { p =>
      val emb = t(s, d, "embeddings").filter(col("vec_id") =!= 0)
      graft.operators.Similarity.buildLshIndex(
        emb.filter(col("vec_id") % 3 =!= 1), "vec_id", "embedding", p, dim = 64)
      graft.operators.Similarity.refreshLshIndex(
        emb.filter(col("vec_id") % 3 === 1), "vec_id", "embedding", p)
    }

  private def ivfRefreshPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "ivfrefresh") { p =>
      val emb = t(s, d, "embeddings").filter(col("vec_id") =!= 0)
      graft.operators.Similarity.buildIvfIndex(
        emb.filter(col("vec_id") % 3 =!= 1), "vec_id", "embedding",
        ivfCentroids(s, d), p)
      // refresh reads the bit-exact centroid sidecar — no caller state
      graft.operators.Similarity.refreshIvfIndex(
        emb.filter(col("vec_id") % 3 === 1), "vec_id", "embedding", p)
    }

  private def pqRefreshPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "pqrefresh") { p =>
      val emb = t(s, d, "embeddings").filter(col("vec_id") =!= 0)
      graft.operators.Similarity.buildPqIndex(
        emb.filter(col("vec_id") % 3 =!= 1), "vec_id", "embedding",
        pqCodebooks(s, d), p)
      graft.operators.Similarity.refreshPqIndex(
        emb.filter(col("vec_id") % 3 === 1), "vec_id", "embedding",
        pqCodebooks(s, d), p)
    }

  /** Delete-lifecycle fixture for the ANN family (the txtdelete twin):
    * full build, tombstone the vec_id ≡ 2 (mod 5) stratum, compact. */
  private def ivfDeletePath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "ivfdelete") { p =>
      val emb = t(s, d, "embeddings").filter(col("vec_id") =!= 0)
      graft.operators.Similarity.buildIvfIndex(
        emb, "vec_id", "embedding", ivfCentroids(s, d), p)
      graft.operators.Similarity.deleteFromAnnIndex(
        emb.filter(col("vec_id") % 5 === 2).select("vec_id"), "vec_id", p)
      graft.operators.Similarity.compactAnnIndex(s, p, "vec_id", Seq("cell_id"))
    }

  q("q_sim_ivf_index_deleted",
    // tombstone → compact for the ANN family, driver-visible: the oracle
    // re-derives assignments over the SURVIVING vectors only (centroids
    // are parameters and keep the full fixture), so a compaction that
    // leaks deleted vectors or loses survivors fails the hash
    """WITH cent AS (
      |  SELECT vec_id AS c, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id < 8),
      |probe AS (SELECT embedding::DOUBLE[] AS pv FROM embeddings WHERE vec_id = 0),
      |pcells AS (
      |  SELECT c FROM cent, probe
      |  ORDER BY list_cosine_similarity(pv, ce) DESC, c LIMIT 2),
      |assigned AS (
      |  SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
      |    (SELECT c FROM cent
      |     ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], ce), 9) DESC, c
      |     LIMIT 1) AS cell
      |  FROM embeddings e WHERE e.vec_id <> 0 AND e.vec_id % 5 <> 2)
      |SELECT vec_id, round(list_cosine_similarity(v, (SELECT pv FROM probe)), 6) AS cos
      |FROM assigned WHERE cell IN (SELECT c FROM pcells)
      |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
    graft.operators.Similarity.ivfTopKIndexed(
      s, ivfDeletePath(s, d), "vec_id", "embedding", ivfCentroids(s, d),
      embProbe(s, d), k = 10, nprobe = 2)
  }

  q("q_sim_lsh_index_refresh", lshOracleSql(dim = 64, nBits = 6, nTables = 12,
    seed = 7L, k = 10)) { (s, d) =>
    graft.operators.Similarity.lshTopKIndexed(
      s, lshRefreshPath(s, d), "vec_id", "embedding", embProbe(s, d), k = 10)
  }

  q("q_sim_ivf_index_refresh", ivfOracleSql) { (s, d) =>
    graft.operators.Similarity.ivfTopKIndexed(
      s, ivfRefreshPath(s, d), "vec_id", "embedding", ivfCentroids(s, d),
      embProbe(s, d), k = 10, nprobe = 2)
  }

  q("q_sim_pq_index_refresh", pqAdcOracleSql) { (s, d) =>
    graft.operators.Similarity.adcTopKIndexed(
      s, pqRefreshPath(s, d), "vec_id",
      pqCodebooks(s, d), embProbe(s, d), k = 10)
  }

  // ---- ANN index builds as first-class inventory entries. The one-off
  // partitionBy materialization is the expensive half of every *_indexed
  // query; registering the builds separately (named to sort BEFORE their
  // consuming probes) means any harness that runs the inventory in name
  // order charges the build here and the *_indexed entries read as what
  // they are at 100 TB: steady-state probe cost over an amortized index.
  // Each build query materializes via the shared annIndexPath cache (the
  // same key the probe bodies hit) and returns a read-back audit row the
  // oracle replays from the source table: count drift between the index
  // and the corpus = a broken build, caught by the same rows+schema+hash
  // gate as every other query.

  // retrieval-quality audit: recall@10 of each ANN method's probe result
  // against the brute-force exact top-10 — the number an ANN deployment
  // is actually judged by, surfaced as a one-row report (q_corpus_report
  // discipline) so the driver sees retrieval quality every round, not
  // just spec-pinned. The oracle composes the SAME full SQL replays the
  // per-method queries use (DuckDB allows a WITH-bearing SELECT as a
  // parenthesized subquery), so every stage — signatures, cell
  // assignment, integer-LUT ADC, the brute ranking — replays end to end.
  q("q_sim_recall_report", {
    val brute =
      """SELECT b.vec_id FROM embeddings b WHERE b.vec_id <> 0
        |  ORDER BY round(list_cosine_similarity(b.embedding::DOUBLE[],
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) DESC, b.vec_id
        |  LIMIT 10""".stripMargin
    val lsh = lshOracleSql(dim = 64, nBits = 6, nTables = 12, seed = 7L, k = 10)
    s"""WITH brute AS ($brute),
       |ivf AS (SELECT vec_id FROM ($ivfOracleSql)),
       |lsh AS (SELECT vec_id FROM ($lsh)),
       |pq AS (SELECT vec_id FROM ($pqAdcOracleSql))
       |SELECT CAST(10 AS INTEGER) AS k,
       |  round((SELECT count(*) FROM ivf WHERE vec_id IN (SELECT vec_id FROM brute)) / 10.0, 4) AS recall_ivf,
       |  round((SELECT count(*) FROM lsh WHERE vec_id IN (SELECT vec_id FROM brute)) / 10.0, 4) AS recall_lsh,
       |  round((SELECT count(*) FROM pq WHERE vec_id IN (SELECT vec_id FROM brute)) / 10.0, 4) AS recall_pq""".stripMargin
  }) { (s, d) =>
    val emb = t(s, d, "embeddings")
    val corpus = emb.filter(col("vec_id") =!= 0)
    val probe = embProbe(s, d)
    val brute = corpus
      .select(col("vec_id"),
        round(graft.operators.Similarity.cosine(
          col("embedding"), typedLit(probe.toSeq)), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .select("vec_id")
    def recall(hits: org.apache.spark.sql.DataFrame, name: String) =
      hits.select("vec_id").join(brute, Seq("vec_id"), "leftsemi")
        .agg(round(count(lit(1)) / 10.0, 4).as(name))
    recall(graft.operators.Similarity.ivfTopK(
        corpus, "vec_id", "embedding", ivfCentroids(s, d), probe,
        k = 10, nprobe = 2), "recall_ivf")
      .crossJoin(recall(graft.operators.Similarity.lshTopK(
        corpus, "vec_id", "embedding", probe, k = 10), "recall_lsh"))
      .crossJoin(recall(graft.operators.Similarity.adcTopK(
        corpus, "vec_id", "embedding", pqCodebooks(s, d), probe, k = 10),
        "recall_pq"))
      .select(lit(10).as("k"), col("recall_ivf"), col("recall_lsh"),
        col("recall_pq"))
  }

  /** Hive-layout partitioned copy of `orders` (partitionBy o_orderstatus),
    * materialized once per (session, dir) through the same tmp-path cache
    * the ANN indexes use. Partition pruning is the reference's core scale
    * mechanism (reference: etl_manager/meta.py:473-479 partitioned tables,
    * meta.py:574-643 MSCK repair); this fixture lets an ORACLED query
    * prove the file-level behavior, not just a spec. */
  private def partitionedOrdersPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "orders_bystatus") { p =>
      t(s, d, "orders")
        // cluster by the partition key: each status dir written by one
        // task, not tasks × statuses open files (buildLshIndex discipline)
        .repartition(col("o_orderstatus"))
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(p)
    }

  /** Fixture for the EXECUTED Z-order rewrite: a copy of orders written
    * as 8 files with NO correlation to the clustering key (round-robin
    * repartition), then clustered in place by
    * [[graft.operators.Layout.zorderCluster]] on the Morton key over
    * (days since epoch-of-dataset, totalprice/160) — both dimensions
    * bounded < 2^12 at any sf by the data model, so bits=12 needs no
    * per-dataset scaling. Built once per (session, dir); Bench charges
    * the rewrite as an index build, not query time. */
  private def zorderExecPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "zorder_exec") { p =>
      t(s, d, "orders").repartition(8).write.mode("overwrite").parquet(p)
      graft.operators.Layout.zorderCluster(s, p,
        df => graft.operators.Layout.zorderKey(
          datediff(to_date(df("o_orderdate")), lit("1992-01-01")).cast("long"),
          floor(df("o_totalprice") / 160).cast("long"), bits = 12),
        nFiles = 8)
    }

  /** Fixture for the EXECUTED compaction: a copy of orders deliberately
    * fragmented into 16 files, then compacted by
    * [[graft.operators.Layout.compactFiles]] with target = ~quarter of
    * the table's bytes (derived from the inventory — metadata-sized —
    * so the fixture self-scales with sf). */
  private def compactExecPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "compact_exec") { p =>
      t(s, d, "orders").repartition(16).write.mode("overwrite").parquet(p)
      val total = graft.operators.Layout.fileInventory(s, p)
        .agg(sum(col("bytes"))).head.getLong(0)
      graft.operators.Layout.compactFiles(s, p,
        targetBytes = math.max(1L, total / 4 + 1))
      ()
    }

  /** Bucketed twin tables for the co-located join: orders and customer
    * written ONCE per (session, dir) as external bucketed tables (8
    * buckets on the join key, sorted within buckets), so every later
    * join on that key is exchange-free on both sides. Table names carry
    * the temp path's hash — unique per build, collision-free across
    * dirs; the annIndexPath cache makes the build a one-off charged to
    * `indexBuilds` in Bench, like the ANN indexes. */
  private def bucketedOrdersCustomer(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val base = annIndexPath(s, d, "bktjoin") { p =>
      val suf = java.lang.Integer.toHexString(p.hashCode)
      t(s, d, "orders").select("o_orderkey", "o_custkey")
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$p/orders").saveAsTable(s"graft_bkt_orders_$suf")
      t(s, d, "customer").select("c_custkey", "c_mktsegment")
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$p/customer").saveAsTable(s"graft_bkt_customer_$suf")
      Seq(s"graft_bkt_orders_$suf", s"graft_bkt_customer_$suf").foreach { n =>
        catalogTables.add((new java.lang.ref.WeakReference(s), n))
      }
    }
    val suf = java.lang.Integer.toHexString(base.hashCode)
    (s.table(s"graft_bkt_orders_$suf"), s.table(s"graft_bkt_customer_$suf"))
  }

  /** Bucketed lineitem + orders on the ORDER key — the Q21 fixture: both
    * lineitem self-joins AND the orders join run exchange-free when the
    * fact table is pre-bucketed on its hot join key (the pay-the-shuffle-
    * once-at-write-time discipline, applied where BASELINE.md measured
    * the canonical Q21 profile: two lineitem exchanges at 25×/sf5).
    * 32 buckets, not q_join_bucketed's demo 8: bucket count CAPS scan
    * parallelism on the exchange-free side, so a fact-table fixture sizes
    * it to the box's cores (production: ≈ cluster parallelism). */
  private def bucketedLineitemOrders(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val base = annIndexPath(s, d, "bktq21") { p =>
      val suf = java.lang.Integer.toHexString(p.hashCode)
      t(s, d, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
        .write.mode("overwrite").bucketBy(32, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$p/lineitem").saveAsTable(s"graft_bkt_lineitem_$suf")
      t(s, d, "orders").select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite").bucketBy(32, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$p/orders").saveAsTable(s"graft_bkt_q21orders_$suf")
      Seq(s"graft_bkt_lineitem_$suf", s"graft_bkt_q21orders_$suf").foreach { n =>
        catalogTables.add((new java.lang.ref.WeakReference(s), n))
      }
    }
    val suf = java.lang.Integer.toHexString(base.hashCode)
    (s.table(s"graft_bkt_lineitem_$suf"), s.table(s"graft_bkt_q21orders_$suf"))
  }

  private def csvRoundtripPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "csvrt") { p =>
      // LazySimpleSerDe shape: comma-delimited, no header, no quoting
      t(s, d, "orders").write.option("header", "false")
        .mode("overwrite").csv(p)
    }

  /** Orders with any zone-less timestamp normalized to the catalog's
    * canonical datetime (TimestampType) — the agnostic grammar has ONE
    * datetime, so NTZ parquet reads normalize at ingestion (the events
    * loader's discipline); spark-avro would otherwise refuse to read a
    * local-timestamp column against the declared TIMESTAMP schema. */
  private def ordersDatetimeNormalized(s: SparkSession, d: String): DataFrame = {
    val orders = t(s, d, "orders")
    orders.select(orders.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.TimestampNTZType)
        col(f.name).cast("timestamp").as(f.name)
      else col(f.name)
    }.toSeq: _*)
  }

  private def avroRoundtripPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "avrort") { p =>
      graft.sources.AvroFiles.write(
        ordersDatetimeNormalized(s, d), p, mode = "overwrite")
    }

  q("q_scan_csv_roundtrip",
    // FORMAT-FIDELITY oracle for the csv reader (previously spec-only):
    // orders written as LazySimpleSerDe-shaped CSV, read back through
    // GraftCatalog.readTable with a fromSparkSchema TableMeta, and
    // hash-compared against the PARQUET original — dates, doubles
    // (shortest-roundtrip text), and key order must all survive the
    // text round trip bit-exactly
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val orders = t(s, d, "orders")
    val meta = graft.meta.TableMeta.fromSparkSchema(
      "orders_csv", "orders_csv/", orders.schema, dataFormat = "csv")
    graft.catalog.GraftCatalog.readTable(s, meta, csvRoundtripPath(s, d))
      .orderBy("o_orderkey")
  }

  q("q_scan_avro_roundtrip",
    // same fidelity oracle for the avro container source (AvroFiles:
    // logical date/timestamp-micros types, union-nullable fields)
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val orders = ordersDatetimeNormalized(s, d)
    val meta = graft.meta.TableMeta.fromSparkSchema(
      "orders_avro", "orders_avro/", orders.schema, dataFormat = "avro")
    graft.catalog.GraftCatalog.readTable(s, meta, avroRoundtripPath(s, d))
      .orderBy("o_orderkey")
  }

  // ------- format-fidelity round trips for the remaining declared serdes
  // (specs/json_specific.json, specs/orc_specific.json,
  // specs/csv_quoted_nodate_specific.json, specs/regex_specific.json):
  // orders written THROUGH GraftCatalog.writeTable in the serde's shape,
  // read back THROUGH GraftCatalog.readTable, and hash-compared against
  // the PARQUET original — so sink and source fidelity gate together,
  // exactly the q_scan_csv_roundtrip discipline.

  private def jsonRoundtripPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "jsonrt") { p =>
      // JsonSerDe over newline-delimited JSON; datetime normalized to the
      // catalog's one canonical TimestampType (the avro path's discipline)
      val orders = ordersDatetimeNormalized(s, d)
      val meta = graft.meta.TableMeta.fromSparkSchema(
        "orders_json", "orders_json/", orders.schema, dataFormat = "json")
      graft.catalog.GraftCatalog.writeTable(orders, meta, p, mode = "overwrite")
    }

  private def orcRoundtripPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "orcrt") { p =>
      val orders = ordersDatetimeNormalized(s, d)
      val meta = graft.meta.TableMeta.fromSparkSchema(
        "orders_orc", "orders_orc/", orders.schema, dataFormat = "orc")
      graft.catalog.GraftCatalog.writeTable(orders, meta, p, mode = "overwrite")
    }

  /** OpenCSVSerde fixture: the serde family is all-strings (the reference
    * names it csv_quoted_NODATE because Athena's OpenCSVSerde cannot carry
    * date/timestamp types), so the datetime renders to a string column
    * with a format pinned IDENTICALLY in both engines; `o_note` embeds
    * quotes AND the separator — the exact payloads the quote/escape
    * machinery must round-trip. */
  private def csvqFixture(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_orderdate_str"),
      concat(lit("pri=\""), col("o_orderpriority"), lit("\", key="),
        col("o_orderkey")).as("o_note"))

  private def csvqRoundtripPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "csvqrt") { p =>
      val fx = csvqFixture(s, d)
      val meta = graft.meta.TableMeta.fromSparkSchema(
        "orders_csvq", "orders_csvq/", fx.schema,
        dataFormat = "csv_quoted_nodate")
      graft.catalog.GraftCatalog.writeTable(fx, meta, p, mode = "overwrite")
    }

  /** One `([^|]*)` capture group per data column, `(.*)` for the last —
    * the RegexSerDe contract (one group per column,
    * specs/regex_specific.json:1-15). */
  private def regexRoundtripRe(nCols: Int): String =
    (Seq.fill(nCols - 1)("([^|]*)") :+ "(.*)").mkString("\\|")

  private def regexRoundtripPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "regexrt") { p =>
      // RegexSerDe tables are read-side serdes (TextInputFormat); the
      // fixture renders each row as one pipe-delimited text line via the
      // same string casts the read-back reverses
      val orders = t(s, d, "orders")
      orders.select(concat_ws("|",
          orders.columns.map(c => col(c).cast("string")).toSeq: _*).as("value"))
        .write.mode("overwrite").text(p)
    }

  q("q_scan_json_roundtrip",
    // FORMAT-FIDELITY oracle for the json reader+sink (previously
    // spec-only): longs, doubles (shortest-roundtrip text), strings and
    // the datetime must survive the JSON text round trip bit-exactly
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val orders = ordersDatetimeNormalized(s, d)
    val meta = graft.meta.TableMeta.fromSparkSchema(
      "orders_json", "orders_json/", orders.schema, dataFormat = "json")
    graft.catalog.GraftCatalog.readTable(s, meta, jsonRoundtripPath(s, d))
      .orderBy("o_orderkey")
  }

  q("q_scan_orc_roundtrip",
    // same fidelity oracle for the orc reader+sink (OrcSerde analog)
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val orders = ordersDatetimeNormalized(s, d)
    val meta = graft.meta.TableMeta.fromSparkSchema(
      "orders_orc", "orders_orc/", orders.schema, dataFormat = "orc")
    graft.catalog.GraftCatalog.readTable(s, meta, orcRoundtripPath(s, d))
      .orderBy("o_orderkey")
  }

  q("q_scan_csvq_roundtrip",
    // OpenCSVSerde fidelity: all-strings-then-cast read semantics over a
    // quoted/escaped write — embedded separators and quote chars in
    // o_note are the payloads LazySimpleSerDe csv CANNOT carry and this
    // serde exists to carry
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_str,
      |  'pri="' || o_orderpriority || '", key=' || CAST(o_orderkey AS VARCHAR)
      |    AS o_note
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val fx = csvqFixture(s, d)
    val meta = graft.meta.TableMeta.fromSparkSchema(
      "orders_csvq", "orders_csvq/", fx.schema,
      dataFormat = "csv_quoted_nodate")
    graft.catalog.GraftCatalog.readTable(s, meta, csvqRoundtripPath(s, d))
      .orderBy("o_orderkey")
  }

  q("q_scan_regex_roundtrip",
    // RegexSerDe fidelity: capture-group extraction + declared-type casts
    // must reverse the text render bit-exactly
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val orders = t(s, d, "orders")
    val meta = graft.meta.TableMeta.fromSparkSchema(
        "orders_rx", "orders_rx/", orders.schema, dataFormat = "regex")
      .copy(glueSpecific = Map("StorageDescriptor" -> Map("SerdeInfo" ->
        Map("Parameters" -> Map(
          "input.regex" -> regexRoundtripRe(orders.columns.length))))))
    graft.catalog.GraftCatalog.readTable(s, meta, regexRoundtripPath(s, d))
      .orderBy("o_orderkey")
  }

  q("q_scan_partition_prune",
    // the oracle replays on the flat fixture — same rows by definition;
    // what the partitioned layout adds is PROOF the predicate prunes at
    // the directory level (PlanQualitySpec asserts PartitionFilters on
    // this exact query's scan, so a pruning regression fails the suite
    // while a data regression fails this hash check)
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
      |FROM orders
      |WHERE o_orderstatus = 'F' AND o_totalprice > 200000
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    s.read.parquet(partitionedOrdersPath(s, d))
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 200000)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy("o_orderkey")
  }

  q("q_sim_ivf_index_build",
    """SELECT count(*) AS n_indexed, count(DISTINCT vec_id) AS n_vecs
      |FROM embeddings WHERE vec_id <> 0""".stripMargin) { (s, d) =>
    s.read.parquet(ivfIndexPath(s, d))
      .agg(count(lit(1)).as("n_indexed"),
        countDistinct(col("vec_id")).as("n_vecs"))
  }

  q("q_sim_lsh_index_build",
    // 12 = nTables: the multi-table space trade, one assignment row per
    // (vector, table)
    """SELECT CAST(12 * count(*) AS BIGINT) AS n_rows,
      |  count(DISTINCT vec_id) AS n_vecs,
      |  CAST(12 AS BIGINT) AS n_tables
      |FROM embeddings WHERE vec_id <> 0 AND embedding IS NOT NULL""".stripMargin) { (s, d) =>
    s.read.parquet(lshIndexPath(s, d))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("vec_id")).as("n_vecs"),
        countDistinct(col("table")).as("n_tables"))
  }

  q("q_sim_pq_index_build",
    // 8 = numSub (pqCodebooks fixture convention): codes arity read back
    // from the table, so a build writing malformed code rows hash-fails
    """SELECT count(*) AS n_rows, count(DISTINCT vec_id) AS n_vecs,
      |  CAST(8 AS INTEGER) AS num_sub
      |FROM embeddings WHERE vec_id <> 0 AND embedding IS NOT NULL""".stripMargin) { (s, d) =>
    s.read.parquet(pqIndexPath(s, d))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("vec_id")).as("n_vecs"),
        min(size(col("codes"))).as("num_sub"))
  }

  q("q_embed_centroids",
    // per-label centroid components (first 8 dims): decimal sums + counts
    // stay exact under any accumulation order, unlike a double avg; the
    // final projection goes back to DOUBLE for a hash-stable physical type
    """SELECT label, i.range AS pos,
      |  cast(sum(cast(cast(embedding[i.range + 1] AS DOUBLE) AS DECIMAL(12,6))) AS DOUBLE) AS comp_sum,
      |  count(*) AS n
      |FROM embeddings CROSS JOIN range(8) i
      |GROUP BY label, i.range ORDER BY label, pos""".stripMargin) { (s, d) =>
    t(s, d, "embeddings")
      .select(col("label"), posexplode(slice(col("embedding"), 1, 8)))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("col").cast("double").cast("decimal(12,6)")).cast("double").as("comp_sum"),
        count(lit(1)).as("n"))
      .orderBy("label", "pos")
  }

  q("q_multimodal",
    """SELECT d.doc_id, d.lang, e.label,
      |  len(e.embedding) AS dim, round(e.embedding[1]::DOUBLE, 6) AS e0,
      |  d.n_chars
      |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents")
    val emb = t(s, d, "embeddings")
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), docs("lang"), emb("label"),
        size(emb("embedding")).as("dim"),
        round(element_at(emb("embedding"), 1).cast("double"), 6).as("e0"),
        docs("n_chars"))
      .orderBy("doc_id")
  }

  q("q_multimodal_frames",
    // frame-sampling plumbing over opaque binary payloads (every 4th
    // 64-byte frame): the engine slices REAL bytes via mapPartitions
    // (Multimodal.sampleFrames — the video-frame shape); the oracle
    // replays through hex strings (DuckDB v1.0 cannot slice BLOBs), so
    // both engines md5 the HEX of each frame. UTF-8 text stands in as
    // the payload — the slicing never interprets it
    """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS ph FROM documents),
      |f AS (SELECT media_id,
      |        unnest(range(0, (length(ph) // 2) // 64, 4)) AS frame_no, ph
      |      FROM m)
      |SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no,
      |  md5(substring(ph, 1 + CAST(frame_no AS BIGINT) * 128, 128)) AS frame_md5
      |FROM f ORDER BY media_id, frame_no""".stripMargin) { (s, d) =>
    val media = t(s, d, "documents")
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
    graft.operators.Multimodal.sampleFrames(media, frameBytes = 64, stride = 4)
      .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
        md5(hex(col("frame"))).as("frame_md5"))
      .orderBy("media_id", "frame_no")
  }

  q("q_multimodal_features",
    // batched per-partition feature extraction over opaque payloads
    // (the mixed-modality table's fallback path, made driver-visible):
    // 16-dim byte statistics from EXACT integer sums + one fixed
    // double→float32 rounding, so every feature replays bit-for-bit.
    // The oracle walks the same bytes via codepoints (the fixture is
    // ASCII by construction — the same caveat class as the \s+
    // tokenizer note; a real blob column replays via hex as in
    // q_multimodal_frames). Limited to doc_id < 100 probe rows; the
    // extraction itself runs the full mapPartitions batch shape
    """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
      |b0 AS (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
      |       FROM docs),
      |b AS (
      |  SELECT doc_id, (i - 1) % 16 AS dim,
      |         ord(substr(text, CAST(i AS INTEGER), 1)) AS byte
      |  FROM b0),
      |s AS (SELECT doc_id, dim, sum(byte) AS sb FROM b GROUP BY 1, 2),
      |spine AS (SELECT doc_id, unnest(range(16)) AS dim FROM docs),
      |d AS (SELECT doc_id, greatest(1, length(text) // 16) AS den FROM docs)
      |SELECT spine.doc_id AS media_id, CAST(spine.dim AS BIGINT) AS dim,
      |  CAST(CAST(CAST(coalesce(s.sb, 0) AS DOUBLE) / 255.0 / d.den AS FLOAT) AS DOUBLE) AS f
      |FROM spine LEFT JOIN s ON spine.doc_id = s.doc_id AND spine.dim = s.dim
      |JOIN d ON spine.doc_id = d.doc_id
      |ORDER BY media_id, dim""".stripMargin) { (s, d) =>
    graft.operators.Multimodal.extractFeatures(
        graft.operators.Multimodal.mediaFromDocuments(
          t(s, d, "documents").filter(col("doc_id") < 100)))
      .select(col("media_id"), posexplode(col("features")))
      .select(col("media_id"), col("pos").cast("long").as("dim"),
        col("col").cast("double").as("f"))
      .orderBy("media_id", "dim")
  }

  // ------------------------------------------------------------ §2.K event analytics (r6)

  q("q_events_twap",
    // per-(user, day) TIME-weighted average of value: each observation
    // holds until the next event, the last until midnight (the TWAP
    // carry convention). Exact integer-µs weights; the weighted sum adds
    // through DECIMAL(38,12) per-term casts (order-independent), and the
    // final division bridge-rounds — bit-equal replay
    """WITH b AS (SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
      |             CAST(value AS DOUBLE) AS v
      |           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      |d AS (SELECT user_id, day, v,
      |        coalesce(epoch_us(lead(ts) OVER
      |            (PARTITION BY user_id, day ORDER BY ts, event_id)),
      |          epoch_us(CAST(day + 1 AS TIMESTAMP))) - epoch_us(ts) AS dt
      |      FROM b),
      |a AS (SELECT user_id, day,
      |        sum(CAST(CAST(v * CAST(dt AS DOUBLE) AS VARCHAR) AS DECIMAL(38,12))) AS wsum,
      |        sum(dt) AS sum_dt
      |      FROM d GROUP BY 1, 2)
      |SELECT user_id, day,
      |  CAST(round(CAST(CAST((CAST(wsum AS DOUBLE) / CAST(sum_dt AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS twap,
      |  CAST(sum_dt AS BIGINT) AS sum_dt
      |FROM a ORDER BY user_id, day""".stripMargin) { (s, d) =>
    graft.operators.EventAnalytics.timeWeightedAvg(
        t(s, d, "events"), "user_id", "ts", "value", tieBreakCol = "event_id")
      .orderBy("user_id", "day")
  }

  q("q_events_funnel_windowed",
    // conversion-window funnel: each step must land STRICTLY after AND
    // within 3 days of the previous step's chosen timestamp (greedy
    // semantics, consistent with the unbounded funnel — a slow journey
    // does not convert). Same cascaded keyed min-agg plan + one gap
    // predicate; the oracle replays the cascade with the bound
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS ts_1 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, max(s1.ts_1) AS ts_1, min(e.ts) AS ts_2
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.ts_1
      |    AND epoch_us(e.ts) - epoch_us(s1.ts_1) <= 259200000000
      |  WHERE e.event_type = 'view' GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, max(s2.ts_1) AS ts_1, min(e.ts) AS ts_3
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.ts_2
      |    AND epoch_us(e.ts) - epoch_us(s2.ts_2) <= 259200000000
      |  WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT * FROM (
      |  SELECT 1 AS step_idx, 'signup' AS step, count(*) AS n_users,
      |    CAST(round(CAST(CAST((CAST(sum(epoch_us(ts_1) - epoch_us(ts_1)) AS DOUBLE) / count(*) / 1000000.0) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS avg_secs_to_reach
      |  FROM s1
      |  UNION ALL
      |  SELECT 2, 'view', count(*),
      |    CAST(round(CAST(CAST((CAST(sum(epoch_us(ts_2) - epoch_us(ts_1)) AS DOUBLE) / count(*) / 1000000.0) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE)
      |  FROM s2
      |  UNION ALL
      |  SELECT 3, 'purchase', count(*),
      |    CAST(round(CAST(CAST((CAST(sum(epoch_us(ts_3) - epoch_us(ts_1)) AS DOUBLE) / count(*) / 1000000.0) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE)
      |  FROM s3)
      |ORDER BY step_idx""".stripMargin) { (s, d) =>
    graft.operators.EventAnalytics.funnelSummary(
        t(s, d, "events"), "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"),
        maxStepGapUs = 3L * 24 * 3600 * 1000000)
      .orderBy("step_idx")
  }

  q("q_events_funnel",
    // strict ordered conversion funnel (signup → view → purchase): each
    // step's timestamp must come STRICTLY after the previous step's. The
    // engine cascades k keyed min-aggregations (EventAnalytics.funnelUsers)
    // — never a per-user sort or event×event join; means use exact integer
    // microsecond sums so they replay bit-equal in any engine
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS ts_1 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, max(s1.ts_1) AS ts_1, min(e.ts) AS ts_2
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.ts_1
      |  WHERE e.event_type = 'view' GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, max(s2.ts_1) AS ts_1, min(e.ts) AS ts_3
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.ts_2
      |  WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT * FROM (
      |  SELECT 1 AS step_idx, 'signup' AS step, count(*) AS n_users,
      |    CAST(round(CAST(CAST((CAST(sum(epoch_us(ts_1) - epoch_us(ts_1)) AS DOUBLE) / count(*) / 1000000.0) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS avg_secs_to_reach
      |  FROM s1
      |  UNION ALL
      |  SELECT 2, 'view', count(*),
      |    CAST(round(CAST(CAST((CAST(sum(epoch_us(ts_2) - epoch_us(ts_1)) AS DOUBLE) / count(*) / 1000000.0) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE)
      |  FROM s2
      |  UNION ALL
      |  SELECT 3, 'purchase', count(*),
      |    CAST(round(CAST(CAST((CAST(sum(epoch_us(ts_3) - epoch_us(ts_1)) AS DOUBLE) / count(*) / 1000000.0) AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE)
      |  FROM s3)
      |ORDER BY step_idx""".stripMargin) { (s, d) =>
    graft.operators.EventAnalytics.funnelSummary(
        t(s, d, "events"), "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"))
      .orderBy("step_idx")
  }

  q("q_events_retention",
    // weekly cohort retention: cohort = Monday of the user's first-event
    // week, offset = full weeks since the first event; retention vs the
    // cohort's week-0 distinct-user count (broadcast join of cohort sizes)
    """WITH fs AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS first_day
      |  FROM events GROUP BY 1),
      |act AS (
      |  SELECT DISTINCT e.user_id,
      |    CAST(date_trunc('week', f.first_day) AS DATE) AS cohort_week,
      |    CAST(date_diff('day', f.first_day, CAST(e.ts AS DATE)) // 7 AS BIGINT) AS week_offset
      |  FROM events e JOIN fs f USING (user_id)),
      |counts AS (
      |  SELECT cohort_week, week_offset, count(*) AS n_users
      |  FROM act GROUP BY 1, 2),
      |base AS (SELECT cohort_week, n_users AS cohort_size FROM counts WHERE week_offset = 0)
      |SELECT c.cohort_week, c.week_offset, c.n_users,
      |  CAST(round(CAST(CAST((CAST(c.n_users AS DOUBLE) / b.cohort_size) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS retention
      |FROM counts c JOIN base b USING (cohort_week)
      |ORDER BY cohort_week, week_offset""".stripMargin) { (s, d) =>
    graft.operators.EventAnalytics.weeklyRetention(
        t(s, d, "events"), "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
  }

  q("q_events_anomaly",
    // daily-volume anomaly per event type: z-score of each day's count
    // against the type's own daily distribution. Mean/variance come from
    // EXACT integer sums (sum, sum of squares) so the doubles divide
    // identically in both engines — stddev_samp's streaming double
    // accumulation would not replay
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, count(*) AS days, sum(n) AS s, sum(n * n) AS ss
      |  FROM daily GROUP BY 1),
      |z AS (
      |  SELECT d.event_type, d.day, d.n,
      |    (CAST(d.n AS DOUBLE) - CAST(s.s AS DOUBLE) / s.days)
      |      / sqrt((CAST(s.ss AS DOUBLE) - CAST(s.s AS DOUBLE) * (CAST(s.s AS DOUBLE) / s.days))
      |             / (s.days - 1)) AS zv
      |  FROM daily d JOIN st s USING (event_type))
      |SELECT event_type, day, n, round(zv, 4) AS z, abs(zv) >= 2.0 AS is_anomaly
      |FROM z ORDER BY event_type, day""".stripMargin) { (s, d) =>
    graft.operators.EventAnalytics.dailyVolumeAnomaly(
        t(s, d, "events"), "event_type", "ts", zThreshold = 2.0)
      .orderBy("event_type", "day")
  }

  q("q_events_attribution",
    // last-touch revenue attribution: each purchase credited to the
    // user's latest view/click at-or-before it — the as-of join reused as
    // an analytics primitive (one keyed shuffle per side, no range
    // explosion); revenue sums in exact decimal before the final DOUBLE
    """SELECT coalesce(t.touch_type, 'none') AS touch_type,
      |  count(*) AS n_purchases,
      |  cast(sum(cast(p.value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, ts, event_type AS touch_type FROM events
      |                WHERE event_type IN ('view', 'click')) t
      |  ON p.user_id = t.user_id AND p.ts >= t.ts
      |GROUP BY 1 ORDER BY touch_type""".stripMargin) { (s, d) =>
    val ev = t(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "value")
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"), col("event_type").as("touch_type"))
    graft.operators.AsOfJoin.asofBackward(
        purchases, touches, "user_id", "ts", "ts",
        Map("touch_type" -> "touch_type"))
      .groupBy(coalesce(col("touch_type"), lit("none")).as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("touch_type")
  }

  q("q_events_transitions",
    // Markov transition matrix between consecutive event types per user:
    // the one event op where a per-user lead() window is irreducible
    // (adjacency is order-dependent); everything downstream is a tiny
    // (from,to) agg + broadcast totals
    """WITH seq AS (
      |  SELECT user_id, event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |tr AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, sum(n) AS t FROM tr GROUP BY 1)
      |SELECT tr.from_type, tr.to_type, tr.n,
      |  CAST(round(CAST(CAST((CAST(tr.n AS DOUBLE) / tot.t) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS p
      |FROM tr JOIN tot USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin) { (s, d) =>
    graft.operators.EventAnalytics.eventTransitions(
        t(s, d, "events"), "user_id", "event_type", Seq("ts", "event_id"))
      .orderBy("from_type", "to_type")
  }

  q("q_events_gapfill",
    // calendar resample + forward-fill over a SPARSE series (events
    // thinned to ~1% so real gaps exist): missing days appear with n=0
    // and the value carries forward. Spine generated per key via
    // sequence() — never a global calendar cross join
    """WITH obs AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
      |    cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      |  FROM events WHERE event_id % 97 = 0 GROUP BY 1, 2),
      |span AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY 1),
      |spine AS (
      |  SELECT event_type, CAST(unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span)
      |SELECT s.event_type, s.day, coalesce(o.n, 0) AS n,
      |  last_value(o.day_value IGNORE NULLS) OVER (
      |    PARTITION BY s.event_type ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS ffill_value
      |FROM spine s LEFT JOIN obs o USING (event_type, day)
      |ORDER BY event_type, day""".stripMargin) { (s, d) =>
    graft.operators.EventAnalytics.gapFillDaily(
        t(s, d, "events").filter(col("event_id") % 97 === 0),
        "event_type", "ts", "value")
      .orderBy("event_type", "day")
  }

  q("q_events_interpolate",
    // calendar resample with LINEAR interpolation (same 1%-thinned sparse
    // series as q_events_gapfill): a missing day takes the straight-line
    // value between the nearest observed days on each side; leading /
    // trailing gaps clamp to the nearest observation. Endpoints aggregate
    // in DECIMAL so both engines interpolate from bit-identical doubles;
    // the formula is written identically on both sides
    // (pv + (nv-pv) * (Δprev / Δspan))
    """WITH obs AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
      |    cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      |  FROM events WHERE event_id % 97 = 0 GROUP BY 1, 2),
      |span AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY 1),
      |spine AS (
      |  SELECT event_type, CAST(unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span),
      |g AS (SELECT s.event_type, s.day, o.n, o.v
      |      FROM spine s LEFT JOIN obs o USING (event_type, day)),
      |w AS (SELECT event_type, day, coalesce(n, 0) AS n, v,
      |        last_value(v IGNORE NULLS) OVER (PARTITION BY event_type
      |          ORDER BY day ROWS UNBOUNDED PRECEDING) AS pv,
      |        last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
      |          OVER (PARTITION BY event_type ORDER BY day
      |            ROWS UNBOUNDED PRECEDING) AS pd,
      |        first_value(v IGNORE NULLS) OVER (PARTITION BY event_type
      |          ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |        first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
      |          OVER (PARTITION BY event_type ORDER BY day
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      |      FROM g)
      |SELECT event_type, day, n,
      |  round(CASE WHEN v IS NOT NULL THEN v
      |             WHEN pv IS NULL THEN nv
      |             WHEN nv IS NULL THEN pv
      |             ELSE pv + (nv - pv) *
      |                  (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
      |        END, 4) AS value
      |FROM w ORDER BY event_type, day""".stripMargin) { (s, d) =>
    graft.operators.EventAnalytics.interpolateDaily(
        t(s, d, "events").filter(col("event_id") % 97 === 0),
        "event_type", "ts", "value")
      .withColumn("value", round(col("value"), 4))
      .orderBy("event_type", "day")
  }

  q("q_events_rolling_active",
    // trailing 7-day distinct active users per day (DAU/WAU family):
    // each (user, activity-day) replicates onto <= 7 trailing calendar
    // days map-side, then one countDistinct per day — no window over
    // the event stream, no per-day self-join chain
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS aday FROM events),
      |b AS (SELECT max(CAST(ts AS DATE)) AS lastd FROM events),
      |rep AS (
      |  SELECT user_id,
      |    CAST(unnest(generate_series(aday::TIMESTAMP,
      |      least(aday + 6, b.lastd)::TIMESTAMP, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM ud CROSS JOIN b)
      |SELECT day, count(DISTINCT user_id) AS active_7d
      |FROM rep GROUP BY 1 ORDER BY day""".stripMargin) { (s, d) =>
    graft.operators.EventAnalytics.rollingActiveUsers(
        t(s, d, "events"), "user_id", "ts", windowDays = 7)
      .orderBy("day")
  }

  q("q_sample_weighted",
    // Efraimidis–Spirakis weighted sampling without replacement, n=200,
    // weight = n_chars (longer docs proportionally likelier). Key is
    // ln(u)/w — the log transform of u^(1/w), same winners, no
    // cross-engine pow; u = the top-53-bit NeutralHash uniform. Plans as
    // TakeOrderedAndProject (n-element heap/task, never a global sort)
    """WITH keyed AS (
      |  SELECT doc_id,
      |    ln((md5_number_lower(CAST(doc_id AS VARCHAR)) >> 11) / 9007199254740992.0)
      |      / n_chars AS wkey
      |  FROM documents
      |  WHERE doc_id IS NOT NULL AND n_chars > 0),
      |top AS (SELECT doc_id, wkey FROM keyed ORDER BY wkey DESC, doc_id LIMIT 200)
      |SELECT doc_id, round(wkey, 6) AS wkey FROM top ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Sampling.weightedSample(
        t(s, d, "documents"), "doc_id", col("n_chars").cast("double"), n = 200)
  }

  q("q_sample_weighted_grouped",
    // per-stratum E-S weighted sampling (top 50 per lang by ln(u)/w):
    // ONE bounded-heap aggregate selects every stratum's sample in a
    // single pass — ≤ n rows per group per mapper, no window, no global
    // sort; the oracle's per-group window replays the heap's selection
    """WITH keyed AS (
      |  SELECT lang, doc_id,
      |    ln((md5_number_lower(CAST(doc_id AS VARCHAR)) >> 11) / 9007199254740992.0)
      |      / n_chars AS wkey
      |  FROM documents
      |  WHERE doc_id IS NOT NULL AND n_chars > 0),
      |r AS (SELECT lang AS grp, doc_id, wkey,
      |        row_number() OVER (PARTITION BY lang ORDER BY wkey DESC, doc_id) AS rk
      |      FROM keyed)
      |SELECT grp, doc_id, round(wkey, 6) AS wkey, CAST(rk AS BIGINT) AS rk
      |FROM r WHERE rk <= 50 ORDER BY grp, rk""".stripMargin) { (s, d) =>
    graft.operators.Sampling.weightedSamplePerGroup(
        t(s, d, "documents"), "doc_id", "lang",
        col("n_chars").cast("double"), n = 50)
      .orderBy("grp", "rk")
  }

  // ------------------------------------------------------------ §2.K LM scoring + link graph (r6)

  q("q_text_perplexity",
    // corpus bigram-LM quality scoring (CCNet-style): fit bigram counts
    // on the corpus, score each doc's mean bigram log-probability with
    // add-one smoothing over the vocabulary. Engine = three keyed aggs +
    // two keyed joins over a persisted shared bigram stage
    """WITH words AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ws
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
      |        FROM words WHERE len(ws) >= 2)),
      |docbi AS (SELECT doc_id, w1, w2, count(*) AS c FROM bi GROUP BY 1, 2, 3),
      |model AS (SELECT w1, w2, sum(c) AS c_bi FROM docbi GROUP BY 1, 2),
      |lt AS (SELECT w1, sum(c_bi) AS c_w1 FROM model GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v
      |      FROM (SELECT unnest(ws) AS w FROM words)),
      |sc AS (
      |  SELECT d.doc_id, sum(d.c) AS n_bigrams,
      |    sum(d.c * ln((m.c_bi + 1.0) / CAST(l.c_w1 + v.v AS DOUBLE))) / sum(d.c) AS lp
      |  FROM docbi d JOIN model m USING (w1, w2) JOIN lt l USING (w1) CROSS JOIN v
      |  GROUP BY 1)
      |SELECT doc.doc_id, CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  round(sc.lp, 6) AS avg_logp
      |FROM documents doc LEFT JOIN sc USING (doc_id)
      |ORDER BY doc.doc_id""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.bigramLogProb(
        t(s, d, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  q("q_text_perplexity_incremental",
    // incremental LM scoring: model fit on the EXISTING half (even
    // doc_id), NEW odd-id docs scored against it with explicit
    // unseen-bigram backoff — fresh-crawl quality gating without
    // refitting on the crawl. probe×probe never meets; corpus is
    // scanned only to build the model
    """WITH cwords AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ws
      |  FROM documents WHERE doc_id % 2 = 0),
      |pwords AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ws
      |  FROM documents WHERE doc_id % 2 = 1),
      |cbi AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
      |        FROM cwords WHERE len(ws) >= 2)),
      |model AS (SELECT w1, w2, count(*) AS c_bi FROM cbi GROUP BY 1, 2),
      |lt AS (SELECT w1, sum(c_bi) AS c_w1 FROM model GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(ws) AS w FROM cwords)),
      |pbi AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
      |        FROM pwords WHERE len(ws) >= 2)),
      |pagg AS (SELECT doc_id, w1, w2, count(*) AS c FROM pbi GROUP BY 1, 2, 3),
      |sc AS (
      |  SELECT p.doc_id, sum(p.c) AS n_bigrams,
      |    sum(CASE WHEN m.c_bi IS NULL THEN p.c ELSE 0 END) AS n_unseen,
      |    sum(p.c * ln((coalesce(m.c_bi, 0) + 1.0)
      |                 / CAST(coalesce(l.c_w1, 0) + v.v AS DOUBLE))) / sum(p.c) AS lp
      |  FROM pagg p
      |  LEFT JOIN model m USING (w1, w2)
      |  LEFT JOIN lt l USING (w1)
      |  CROSS JOIN v
      |  GROUP BY 1)
      |SELECT d.doc_id, CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  CAST(coalesce(sc.n_unseen, 0) AS BIGINT) AS n_unseen,
      |  round(sc.lp, 6) AS avg_logp
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
      |LEFT JOIN sc USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents")
    graft.operators.TextAnalysis.bigramLogProbAgainst(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text")
      .orderBy("doc_id")
  }

  q("q_graph_pagerank",
    // PageRank over the outlink host graph (crawl-prioritization /
    // source-quality prior): 5 fixed simplified-damping iterations —
    // each iteration is ONE edges⋈ranks equi-join + one keyed sum, no
    // driver-side adjacency (LinkGraph.pageRank). Hosts salt
    // deterministically from doc_id (site% -> news%/blog%); the oracle
    // unrolls the same 5 updates as CTEs
    """WITH edges AS (
      |  SELECT DISTINCT 'site' || CAST(doc_id % 13 AS VARCHAR) || '.example.com' AS src, dst
      |  FROM (SELECT doc_id,
      |          unnest(['news' || CAST(doc_id % 5 AS VARCHAR) || '.example.com',
      |                  'blog' || CAST(doc_id % 3 AS VARCHAR) || '.example.com']) AS dst
      |        FROM documents)),
      |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
      |r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
      |r1 AS (SELECT nd.node, (1 - 0.85) / nn.n + 0.85 * coalesce(s.m, 0.0) AS r
      |       FROM nodes nd CROSS JOIN nn LEFT JOIN (
      |         SELECT e.dst AS node, sum(p.r / d.deg) AS m
      |         FROM edges e JOIN r0 p ON e.src = p.node JOIN deg d ON e.src = d.src
      |         GROUP BY 1) s ON nd.node = s.node),
      |r2 AS (SELECT nd.node, (1 - 0.85) / nn.n + 0.85 * coalesce(s.m, 0.0) AS r
      |       FROM nodes nd CROSS JOIN nn LEFT JOIN (
      |         SELECT e.dst AS node, sum(p.r / d.deg) AS m
      |         FROM edges e JOIN r1 p ON e.src = p.node JOIN deg d ON e.src = d.src
      |         GROUP BY 1) s ON nd.node = s.node),
      |r3 AS (SELECT nd.node, (1 - 0.85) / nn.n + 0.85 * coalesce(s.m, 0.0) AS r
      |       FROM nodes nd CROSS JOIN nn LEFT JOIN (
      |         SELECT e.dst AS node, sum(p.r / d.deg) AS m
      |         FROM edges e JOIN r2 p ON e.src = p.node JOIN deg d ON e.src = d.src
      |         GROUP BY 1) s ON nd.node = s.node),
      |r4 AS (SELECT nd.node, (1 - 0.85) / nn.n + 0.85 * coalesce(s.m, 0.0) AS r
      |       FROM nodes nd CROSS JOIN nn LEFT JOIN (
      |         SELECT e.dst AS node, sum(p.r / d.deg) AS m
      |         FROM edges e JOIN r3 p ON e.src = p.node JOIN deg d ON e.src = d.src
      |         GROUP BY 1) s ON nd.node = s.node),
      |r5 AS (SELECT nd.node, (1 - 0.85) / nn.n + 0.85 * coalesce(s.m, 0.0) AS r
      |       FROM nodes nd CROSS JOIN nn LEFT JOIN (
      |         SELECT e.dst AS node, sum(p.r / d.deg) AS m
      |         FROM edges e JOIN r4 p ON e.src = p.node JOIN deg d ON e.src = d.src
      |         GROUP BY 1) s ON nd.node = s.node)
      |SELECT node AS host, round(r, 6) AS pr FROM r5 ORDER BY host""".stripMargin) { (s, d) =>
    val id = col("doc_id")
    val edges = t(s, d, "documents").select(
      concat(lit("site"), (id % 13).cast("string"), lit(".example.com")).as("src"),
      explode(array(
        concat(lit("news"), (id % 5).cast("string"), lit(".example.com")),
        concat(lit("blog"), (id % 3).cast("string"), lit(".example.com")))).as("dst"))
    graft.operators.LinkGraph.pageRank(edges, "src", "dst", iterations = 5)
      .select(col("node").as("host"), round(col("rank"), 6).as("pr"))
      .orderBy("host")
  }

  // ------------------------------------------------------------ §2.K CDC / profiling / retrieval (r6 continuation)

  /** Deterministic CDC snapshots derived from `orders`: base drops every
    * 10th key, next drops every 7th and bumps every 3rd key's price by
    * +10.0 (exact IEEE add — replays bit-equal), so inserts, deletes,
    * updates, and untouched rows all genuinely occur. */
  private def cdcBase(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 10 =!= 0)

  private def cdcNext(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 7 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")))

  private val cdcNextSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10.0
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 7 <> 0""".stripMargin

  q("q_cdc_diff",
    // snapshot diff (incremental-load CDC): one full-outer sort-merge
    // join on the snapshot key classifies inserts/deletes/updates and
    // drops unchanged rows; presence is tracked with side markers so an
    // all-NULL attribute row is not mistaken for an absent row
    s"""WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 10 <> 0),
      |nxt AS (
      |  $cdcNextSql)
      |SELECT coalesce(b.o_orderkey, n.o_orderkey) AS o_orderkey,
      |  CASE WHEN b.o_orderkey IS NULL THEN 'insert'
      |       WHEN n.o_orderkey IS NULL THEN 'delete'
      |       ELSE 'update' END AS change_type,
      |  b.o_custkey AS old_o_custkey, n.o_custkey AS new_o_custkey,
      |  b.o_orderstatus AS old_o_orderstatus, n.o_orderstatus AS new_o_orderstatus,
      |  b.o_totalprice AS old_o_totalprice, n.o_totalprice AS new_o_totalprice
      |FROM base b FULL OUTER JOIN nxt n ON b.o_orderkey = n.o_orderkey
      |WHERE b.o_orderkey IS NULL OR n.o_orderkey IS NULL
      |   OR b.o_custkey IS DISTINCT FROM n.o_custkey
      |   OR b.o_orderstatus IS DISTINCT FROM n.o_orderstatus
      |   OR b.o_totalprice IS DISTINCT FROM n.o_totalprice
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    graft.operators.ChangeCapture.snapshotDiff(
        cdcBase(s, d), cdcNext(s, d), Seq("o_orderkey"),
        Seq("o_custkey", "o_orderstatus", "o_totalprice"))
      .orderBy("o_orderkey")
  }

  q("q_cdc_apply",
    // MERGE-style changeset apply: the changeset is the diff of the two
    // snapshots, so apply(base, diff(base, next)) must reproduce next
    // EXACTLY — the oracle is the next snapshot itself, which checks the
    // upsert path, the delete path, AND the untouched pass-through in
    // one equality
    s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM (
      |  $cdcNextSql)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val base = cdcBase(s, d)
    val diff = graft.operators.ChangeCapture.snapshotDiff(
      base, cdcNext(s, d), Seq("o_orderkey"),
      Seq("o_custkey", "o_orderstatus", "o_totalprice"))
    val changes = diff.select(
      col("o_orderkey"),
      col("new_o_custkey").as("o_custkey"),
      col("new_o_orderstatus").as("o_orderstatus"),
      col("new_o_totalprice").as("o_totalprice"),
      when(col("change_type") === "insert", lit("I"))
        .when(col("change_type") === "delete", lit("D"))
        .otherwise(lit("U")).as("op"))
    graft.operators.ChangeCapture.applyChanges(
        base, changes, Seq("o_orderkey"), "op")
      .orderBy("o_orderkey")
  }

  q("q_cdc_incremental_agg",
    // CDC-aware view maintenance — the HARD half (deletes, not just
    // appends): counts/sums retract exactly from the changeset alone;
    // min/max recompute ONLY for groups whose deleted values touch the
    // candidate boundary (semi-join-pruned snapshot scan — proportional
    // to dirty groups' data, never the table). The oracle is the full
    // recompute over the post-change snapshot, so passing proves
    // applyCdc(state(S), ins, del, S') == state(S') exactly. Changes:
    // delete every orderkey%10 row, insert shifted copies of orderkey%7
    // rows with +100 quantity (moves maxima through the insert path
    // while the deletes hit minima through the recompute path)
    """WITH ins AS (
      |  SELECT l_returnflag, l_linestatus,
      |         l_quantity + 100 AS l_quantity, l_extendedprice
      |  FROM lineitem WHERE l_orderkey % 7 = 0),
      |snap AS (
      |  SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice
      |  FROM lineitem WHERE l_orderkey % 10 <> 0
      |  UNION ALL SELECT * FROM ins)
      |SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
      |  cast(cast(sum(cast(l_quantity AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sum_l_quantity,
      |  round(cast(cast(sum(cast(l_quantity AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) / count(l_quantity), 6) AS avg_l_quantity,
      |  cast(min(cast(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS min_l_quantity,
      |  cast(max(cast(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS max_l_quantity,
      |  cast(cast(sum(cast(l_extendedprice AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sum_l_extendedprice,
      |  round(cast(cast(sum(cast(l_extendedprice AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) / count(l_extendedprice), 6) AS avg_l_extendedprice,
      |  cast(min(cast(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS min_l_extendedprice,
      |  cast(max(cast(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS max_l_extendedprice
      |FROM snap
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    import graft.operators.IncrementalAgg
    val keys = Seq("l_returnflag", "l_linestatus")
    val measures = Seq("l_quantity", "l_extendedprice")
    val li = t(s, d, "lineitem")
    val deletes = li.filter(col("l_orderkey") % 10 === 0)
    val inserts = li.filter(col("l_orderkey") % 7 === 0)
      .withColumn("l_orderkey", col("l_orderkey") + lit(3000000000L))
      .withColumn("l_quantity", col("l_quantity") + lit(100.0))
    val snapshot = li.filter(col("l_orderkey") % 10 =!= 0).unionByName(inserts)
    val maintained = IncrementalAgg.applyCdc(
      IncrementalAgg.state(li, keys, measures),
      keys, measures, inserts, deletes, snapshot)
    IncrementalAgg.finish(maintained, keys, measures)
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Shared CDC-join fixture for q_cdc_incremental_join and
    * q_cdc_view_cascade: customer ⋈ supplier on nationkey with every
    * change class firing at once — deletes (%13 / %5), fresh-key inserts
    * that MOVE rows between join groups (%11 / %3, remapped nationkey —
    * new-A × new-B pairs land on shared keys), payload updates as
    * delete+insert (%17, +100.0 exact IEEE add). */
  private case class CdcJoinFixture(
      cust: DataFrame, supp: DataFrame,
      cIns: DataFrame, cDel: DataFrame, sIns: DataFrame, sDel: DataFrame,
      cNew: DataFrame, sNew: DataFrame)

  private def cdcJoinFixture(s: SparkSession, d: String): CdcJoinFixture = {
    val cust = t(s, d, "customer").filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_nationkey").as("nationkey"), col("c_acctbal"))
    val supp = t(s, d, "supplier").filter(col("s_suppkey") % 2 === 0)
      .select(col("s_suppkey"), col("s_nationkey").as("nationkey"), col("s_acctbal"))
    val cDel = cust
      .filter(col("c_custkey") % 13 === 0 || col("c_custkey") % 17 === 0)
      .select("c_custkey")
    val cIns = cust.filter(col("c_custkey") % 11 === 0)
      .withColumn("c_custkey", col("c_custkey") + lit(900000000L))
      .withColumn("nationkey", (col("nationkey") + 7) % 25)
      .unionByName(cust.filter(col("c_custkey") % 17 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0))
    val sDel = supp.filter(col("s_suppkey") % 5 === 0).select("s_suppkey")
    val sIns = supp.filter(col("s_suppkey") % 3 === 0)
      .withColumn("s_suppkey", col("s_suppkey") + lit(900000000L))
      .withColumn("nationkey", (col("nationkey") + 3) % 25)
    val cNew = cust.join(cDel, Seq("c_custkey"), "left_anti").unionByName(cIns)
    val sNew = supp.join(sDel, Seq("s_suppkey"), "left_anti").unionByName(sIns)
    CdcJoinFixture(cust, supp, cIns, cDel, sIns, sDel, cNew, sNew)
  }

  /** The fixture's post-change snapshots as oracle CTEs (cnew / snew). */
  private val cdcJoinSql =
    """c0 AS (
      |  SELECT c_custkey, c_nationkey AS nationkey, c_acctbal
      |  FROM customer WHERE c_custkey % 10 = 0),
      |s0 AS (
      |  SELECT s_suppkey, s_nationkey AS nationkey, s_acctbal
      |  FROM supplier WHERE s_suppkey % 2 = 0),
      |cnew AS (
      |  SELECT c_custkey, nationkey, c_acctbal FROM c0
      |  WHERE c_custkey % 13 <> 0 AND c_custkey % 17 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 900000000, (nationkey + 7) % 25, c_acctbal
      |  FROM c0 WHERE c_custkey % 11 = 0
      |  UNION ALL
      |  SELECT c_custkey, nationkey, c_acctbal + 100.0
      |  FROM c0 WHERE c_custkey % 17 = 0),
      |snew AS (
      |  SELECT s_suppkey, nationkey, s_acctbal FROM s0 WHERE s_suppkey % 5 <> 0
      |  UNION ALL
      |  SELECT s_suppkey + 900000000, (nationkey + 3) % 25, s_acctbal
      |  FROM s0 WHERE s_suppkey % 3 = 0)""".stripMargin

  q("q_cdc_incremental_join",
    // incremental JOIN-view maintenance (IncrementalJoin.applyCdc) — the
    // join half of the materialized-view family (q_cdc_incremental_agg is
    // the aggregate half): V = customer ⋈ supplier on nationkey is
    // maintained from per-side CDC changesets via the Blakeley delta-join
    // decomposition (retained-pairs anti-joins + delta⋈snapshot terms,
    // base-table probes semi-join-pruned by the delta's join keys — never
    // a re-join of the bases). Changes exercise every class at once:
    // deletes (%13 / %5), fresh-key inserts that MOVE rows between join
    // groups (%11 / %3 with remapped nationkey — new-A × new-B pairs land
    // on shared keys, the double-count trap), and payload updates as
    // delete+insert (%17, +100.0 exact IEEE add). The oracle recomputes
    // the full join over the post-change snapshots, so passing proves
    // applyCdc(joinState(A,B), Δ) == joinState(A',B') exactly.
    s"""WITH $cdcJoinSql
      |SELECT nationkey, c_custkey, c_acctbal, s_suppkey, s_acctbal
      |FROM cnew JOIN snew USING (nationkey)
      |ORDER BY nationkey, c_custkey, s_suppkey""".stripMargin) { (s, d) =>
    import graft.operators.IncrementalJoin
    val fx = cdcJoinFixture(s, d)
    IncrementalJoin.applyCdc(
        IncrementalJoin.joinState(fx.cust, fx.supp, Seq("nationkey")),
        "c_custkey", "s_suppkey", Seq("nationkey"),
        fx.cIns, fx.cDel, fx.sIns, fx.sDel, fx.cNew, fx.sNew)
      .orderBy("nationkey", "c_custkey", "s_suppkey")
  }

  q("q_cdc_view_cascade",
    // the materialized-view CASCADE: an aggregate ON a join view, both
    // maintained incrementally — IncrementalJoin.applyCdcWithDelta emits
    // the view's own row-level changeset (old pairs retracted, new pairs
    // inserted), which feeds IncrementalAgg.applyCdc with the maintained
    // view as its dirty-group snapshot. NOTHING here re-joins or rescans
    // the base tables: the join delta is changeset-sized, the agg merge
    // is state-sized, and the view snapshot is consulted only for groups
    // whose deleted values touch a min/max boundary. The oracle
    // recomputes the aggregate over the full re-join of the post-change
    // snapshots — passing proves the ENTIRE two-stage pipeline equals the
    // from-scratch result exactly.
    s"""WITH $cdcJoinSql,
      |v AS (
      |  SELECT nationkey, c_acctbal, s_acctbal
      |  FROM cnew JOIN snew USING (nationkey))
      |SELECT nationkey, count(*) AS n_rows,
      |  cast(cast(sum(cast(c_acctbal AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sum_c_acctbal,
      |  round(cast(cast(sum(cast(c_acctbal AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) / count(c_acctbal), 6) AS avg_c_acctbal,
      |  cast(min(cast(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS min_c_acctbal,
      |  cast(max(cast(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS max_c_acctbal,
      |  cast(cast(sum(cast(s_acctbal AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sum_s_acctbal,
      |  round(cast(cast(sum(cast(s_acctbal AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) / count(s_acctbal), 6) AS avg_s_acctbal,
      |  cast(min(cast(s_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS min_s_acctbal,
      |  cast(max(cast(s_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS max_s_acctbal
      |FROM v GROUP BY nationkey
      |ORDER BY nationkey""".stripMargin) { (s, d) =>
    import graft.operators.{IncrementalAgg, IncrementalJoin}
    val fx = cdcJoinFixture(s, d)
    val keys = Seq("nationkey")
    val measures = Seq("c_acctbal", "s_acctbal")
    // r10 measured an EAGER localCheckpoint of v0 at parity (4.2 s
    // steady either way at sf0.1) and left the frames lazy; the r12
    // snowflake A/B overturned that for LAZY pins — the agg fold
    // consumes inserted/deleted/view in separate terms, each re-deriving
    // the join fold, and lazy pins fold the one materialization into the
    // first consuming job (production persists the maintained view
    // anyway). Same-session A/B at sf0.1, min of 5 steady reps:
    // 4.29 -> 3.33 s (medians ~4.6 -> ~3.8).
    //
    // FAILURE/LIFETIME CONTRACT for every lazy pin in the CDC-fold
    // queries (this is the first pin site; the snowflake/cascade pins
    // below share it): localCheckpoint truncates lineage to
    // NON-REPLICATED executor blocks, so losing an executor mid-query
    // FAILS the query instead of recomputing — acceptable here because
    // (a) local-mode has one executor whose loss kills the session
    // anyway, and (b) a production deployment persists the maintained
    // view/delta to reliable storage between triggers (these pins model
    // exactly that materialization point; use reliable checkpoint() or
    // write+read-back on a cluster). The blocks live until the session
    // (or explicit unpersist) releases them — per-query bench/oracle
    // runs end their session; a long-lived caller folding MANY triggers
    // should unpersist each trigger's pinned frames after its action.
    val v0 = IncrementalJoin.joinState(fx.cust, fx.supp, Seq("nationkey"))
      .localCheckpoint(eager = false)
    val deltaR = IncrementalJoin.applyCdcWithDelta(v0,
      "c_custkey", "s_suppkey", Seq("nationkey"),
      fx.cIns, fx.cDel, fx.sIns, fx.sDel, fx.cNew, fx.sNew)
    val delta = IncrementalJoin.ViewDelta(
      deltaR.view.localCheckpoint(eager = false),
      deltaR.inserted.localCheckpoint(eager = false),
      deltaR.deleted.localCheckpoint(eager = false))
    val maintained = IncrementalAgg.applyCdc(
      IncrementalAgg.state(v0, keys, measures), keys, measures,
      inserts = delta.inserted, deletes = delta.deleted,
      snapshot = delta.view)
    IncrementalAgg.finish(maintained, keys, measures).orderBy("nationkey")
  }

  q("q_cdc_incremental_left",
    // LEFT-join view maintenance — the genuinely-harder outer half
    // (IncrementalJoin.applyCdcLeft): beyond the inner fold, a B delete
    // that kills a join key's LAST row must flip that key's untouched A
    // rows to NULL-EXTENDED, and a first B insert must flip them back
    // (the zero-crossing transitions). The fixture fires both: supplier
    // deletes (%5) empty some nations, remapped supplier inserts (%3,
    // +3 mod 25) give previously-empty nations their first supplier.
    // The unmatched set needs no extra state — it is the view's own
    // bKey-IS-NULL slice. Oracle = full LEFT re-join of the post-change
    // snapshots; NULLS FIRST pinned on the nullable sort key (DuckDB
    // defaults NULLS LAST, Spark NULLS FIRST).
    s"""WITH $cdcJoinSql
      |SELECT nationkey, c_custkey, c_acctbal, s_suppkey, s_acctbal
      |FROM cnew LEFT JOIN snew USING (nationkey)
      |ORDER BY nationkey, c_custkey, s_suppkey NULLS FIRST""".stripMargin) { (s, d) =>
    import graft.operators.IncrementalJoin
    val fx = cdcJoinFixture(s, d)
    IncrementalJoin.applyCdcLeft(
        IncrementalJoin.joinStateLeft(fx.cust, fx.supp, Seq("nationkey")),
        "c_custkey", "s_suppkey", Seq("nationkey"),
        fx.cIns, fx.cDel, fx.sIns, fx.sDel, fx.cNew, fx.sNew)
      .orderBy(col("nationkey"), col("c_custkey"),
        col("s_suppkey").asc_nulls_first)
  }

  q("q_cdc_snowflake",
    // SNOWFLAKE IVM: (A ⋈ B) ⋈ C maintained end to end with the bases
    // NEVER re-joined — the join-of-join cell of the maintenance matrix.
    // Level 1 is the q_cdc_incremental_join fixture (customer ⋈ supplier
    // on nationkey, every change class firing); its applyCdcWithDelta
    // changeset becomes the A-SIDE CDC of a SECOND fold against a
    // churning nation dimension (deletes %5, payload updates %7 as
    // delete+insert, fresh-key inserts %4 remapped to (n+1)%25 — landing
    // on nationkeys that already have a row, so the second level sees
    // fan-out AND the new-V1 × new-C double-count trap at once). The
    // level-1 view's row key is the composite (c_custkey, s_suppkey),
    // carried as a struct column. Blakeley's decomposition composes:
    // level 2's retained/delta terms consume only the level-1 DELTA plus
    // the maintained V1′ (for C-insert pairs, semi-pruned by the delta's
    // join keys). Oracle = the full three-way re-join of the post-change
    // snapshots, so a pass proves the whole two-level pipeline exact.
    s"""WITH $cdcJoinSql,
      |nnew AS (
      |  SELECT n_nationkey AS c_id, n_nationkey AS nationkey, n_name
      |  FROM nation WHERE n_nationkey % 5 <> 0 AND n_nationkey % 7 <> 0
      |  UNION ALL
      |  SELECT n_nationkey + 900000000, (n_nationkey + 1) % 25, n_name
      |  FROM nation WHERE n_nationkey % 4 = 0
      |  UNION ALL
      |  SELECT n_nationkey, n_nationkey, n_name || '_v2'
      |  FROM nation WHERE n_nationkey % 7 = 0)
      |SELECT nationkey, c_custkey, c_acctbal, s_suppkey, s_acctbal, c_id, n_name
      |FROM cnew JOIN snew USING (nationkey) JOIN nnew USING (nationkey)
      |ORDER BY nationkey, c_custkey, s_suppkey, c_id""".stripMargin) { (s, d) =>
    import graft.operators.IncrementalJoin
    val fx = cdcJoinFixture(s, d)
    val abKey = struct(col("c_custkey"), col("s_suppkey")).as("ab_key")
    // C = nation as (row key c_id, join key nationkey, payload), churned
    val nat = t(s, d, "nation").select(
      col("n_nationkey").as("c_id"), col("n_nationkey").as("nationkey"),
      col("n_name"))
    val nDel = nat.filter(col("c_id") % 5 === 0 || col("c_id") % 7 === 0)
      .select("c_id")
    val nIns = nat.filter(col("c_id") % 4 === 0)
      .withColumn("c_id", col("c_id") + lit(900000000L))
      .withColumn("nationkey", (col("nationkey") + 1) % 25)
      .unionByName(nat.filter(col("c_id") % 7 === 0)
        .withColumn("n_name", concat(col("n_name"), lit("_v2"))))
    val nNew = nat.join(nDel, Seq("c_id"), "left_anti").unionByName(nIns)
    // level 1: maintain V1 = customer ⋈ supplier and surface its delta.
    // v1 and the three delta frames are LAZY-pinned: level 2 consumes
    // each of them in several terms (the delta-key census, newA, the
    // A' probe), and unpinned every consumer re-derives the level-1
    // fold — measured at sf0.1 as a 59-stage plan whose wall is pure
    // stage-scheduling tax. Lazy (not eager) so materialization folds
    // into the first consuming job instead of serial driver jobs —
    // production persists the maintained view anyway.
    val v1 = IncrementalJoin.joinState(fx.cust, fx.supp, Seq("nationkey"))
      .localCheckpoint(eager = false)
    val vd1r = IncrementalJoin.applyCdcWithDelta(v1,
      "c_custkey", "s_suppkey", Seq("nationkey"),
      fx.cIns, fx.cDel, fx.sIns, fx.sDel, fx.cNew, fx.sNew)
    val vd1 = IncrementalJoin.ViewDelta(
      vd1r.view.localCheckpoint(eager = false),
      vd1r.inserted.localCheckpoint(eager = false),
      vd1r.deleted.localCheckpoint(eager = false))
    // level 2: V1's inserted/deleted ARE the A-side CDC; the A snapshot
    // is the MAINTAINED V1′ (vd1.view) — no base table is re-joined
    val v2 = IncrementalJoin.applyCdc(
      IncrementalJoin.joinState(v1.select(abKey, col("*")), nat,
        Seq("nationkey")),
      "ab_key", "c_id", Seq("nationkey"),
      vd1.inserted.select(abKey, col("*")),
      vd1.deleted.select(abKey),
      nIns, nDel,
      vd1.view.select(abKey, col("*")), nNew)
    v2.select("nationkey", "c_custkey", "c_acctbal", "s_suppkey",
        "s_acctbal", "c_id", "n_name")
      .orderBy("nationkey", "c_custkey", "s_suppkey", "c_id")
  }

  q("q_cdc_snowflake_agg",
    // the THREE-level MV tree: an aggregate ON the snowflake — V1 =
    // customer ⋈ supplier, V2 = V1 ⋈ nation, and a per-nationkey summary
    // of V2, ALL maintained incrementally from the same changesets as
    // q_cdc_snowflake. Level 2 switches to applyCdcWithDelta so V2's own
    // row-level changeset (which folds BOTH the level-1 delta's fan-out
    // through C and the C churn's fan-out through V1′) feeds
    // IncrementalAgg.applyCdc, exactly as q_cdc_view_cascade does one
    // level down. No base table is re-joined at any level: the level-2
    // delta is changeset-sized, the agg merge is state-sized, and V2' is
    // consulted only for min/max-dirty groups. Oracle = the aggregate
    // over the full three-way re-join of the post-change snapshots, so a
    // pass proves the whole join→join→agg pipeline exact.
    s"""WITH $cdcJoinSql,
      |nnew AS (
      |  SELECT n_nationkey AS c_id, n_nationkey AS nationkey, n_name
      |  FROM nation WHERE n_nationkey % 5 <> 0 AND n_nationkey % 7 <> 0
      |  UNION ALL
      |  SELECT n_nationkey + 900000000, (n_nationkey + 1) % 25, n_name
      |  FROM nation WHERE n_nationkey % 4 = 0
      |  UNION ALL
      |  SELECT n_nationkey, n_nationkey, n_name || '_v2'
      |  FROM nation WHERE n_nationkey % 7 = 0),
      |v AS (
      |  SELECT nationkey, c_acctbal, s_acctbal
      |  FROM cnew JOIN snew USING (nationkey) JOIN nnew USING (nationkey))
      |SELECT nationkey, count(*) AS n_rows,
      |  cast(cast(sum(cast(c_acctbal AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sum_c_acctbal,
      |  round(cast(cast(sum(cast(c_acctbal AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) / count(c_acctbal), 6) AS avg_c_acctbal,
      |  cast(min(cast(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS min_c_acctbal,
      |  cast(max(cast(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS max_c_acctbal,
      |  cast(cast(sum(cast(s_acctbal AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sum_s_acctbal,
      |  round(cast(cast(sum(cast(s_acctbal AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) / count(s_acctbal), 6) AS avg_s_acctbal,
      |  cast(min(cast(s_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS min_s_acctbal,
      |  cast(max(cast(s_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS max_s_acctbal
      |FROM v GROUP BY nationkey
      |ORDER BY nationkey""".stripMargin) { (s, d) =>
    import graft.operators.{IncrementalAgg, IncrementalJoin}
    val fx = cdcJoinFixture(s, d)
    val abKey = struct(col("c_custkey"), col("s_suppkey")).as("ab_key")
    val nat = t(s, d, "nation").select(
      col("n_nationkey").as("c_id"), col("n_nationkey").as("nationkey"),
      col("n_name"))
    val nDel = nat.filter(col("c_id") % 5 === 0 || col("c_id") % 7 === 0)
      .select("c_id")
    val nIns = nat.filter(col("c_id") % 4 === 0)
      .withColumn("c_id", col("c_id") + lit(900000000L))
      .withColumn("nationkey", (col("nationkey") + 1) % 25)
      .unionByName(nat.filter(col("c_id") % 7 === 0)
        .withColumn("n_name", concat(col("n_name"), lit("_v2"))))
    val nNew = nat.join(nDel, Seq("c_id"), "left_anti").unionByName(nIns)
    val keys = Seq("nationkey")
    val measures = Seq("c_acctbal", "s_acctbal")
    // UNLIKE q_cdc_view_cascade (one level, pinning measured at parity),
    // the three-level tree re-derives each lazy frame in every consuming
    // term of the NEXT level — v1 under vd1's fold and v20, vd1 under
    // vd2's five terms, v20/vd2 under the agg fold — so the shared
    // frames are pinned once each (production materializes the views
    // anyway; the pins mirror that). LAZY pins: eager ones ran eight
    // serial driver-blocking jobs before the fold started; lazy folds
    // each materialization into its first consuming job (same block
    // reuse; A/B at sf0.1, min of 5 steady reps: 6.14 → 5.40 s).
    val v1 = IncrementalJoin.joinState(fx.cust, fx.supp, Seq("nationkey"))
      .localCheckpoint(eager = false)
    val vd1r = IncrementalJoin.applyCdcWithDelta(v1,
      "c_custkey", "s_suppkey", Seq("nationkey"),
      fx.cIns, fx.cDel, fx.sIns, fx.sDel, fx.cNew, fx.sNew)
    val vd1 = IncrementalJoin.ViewDelta(
      vd1r.view.localCheckpoint(eager = false),
      vd1r.inserted.localCheckpoint(eager = false),
      vd1r.deleted.localCheckpoint(eager = false))
    val v20 = IncrementalJoin.joinState(v1.select(abKey, col("*")), nat,
      Seq("nationkey")).localCheckpoint(eager = false)
    val vd2r = IncrementalJoin.applyCdcWithDelta(v20,
      "ab_key", "c_id", Seq("nationkey"),
      vd1.inserted.select(abKey, col("*")),
      vd1.deleted.select(abKey),
      nIns, nDel,
      vd1.view.select(abKey, col("*")), nNew)
    val vd2 = IncrementalJoin.ViewDelta(
      vd2r.view.localCheckpoint(eager = false),
      vd2r.inserted.localCheckpoint(eager = false),
      vd2r.deleted.localCheckpoint(eager = false))
    val maintained = IncrementalAgg.applyCdc(
      IncrementalAgg.state(v20, keys, measures), keys, measures,
      inserts = vd2.inserted, deletes = vd2.deleted,
      snapshot = vd2.view)
    IncrementalAgg.finish(maintained, keys, measures).orderBy("nationkey")
  }

  q("q_cdc_snowflake_left",
    // the OUTER snowflake: (A LEFT B) ⋈ C maintained end to end — the
    // left-join cell of the matrix at DEPTH. Level 1 is the
    // q_cdc_incremental_left fixture (zero-crossings fire both ways:
    // supplier deletes empty nations, remapped inserts give empty
    // nations their first supplier); its applyCdcLeftWithDelta changeset
    // — which carries the null-extended transitions as key
    // deletes+inserts, (ck, sk) pairs swapping with (ck, NULL) rows —
    // cascades through a SECOND fold against the churning nation
    // dimension. The composite struct row key is null-SAFE by Spark's
    // struct-equality semantics (field-wise, null == null), so the
    // level-2 anti/semi probes retract and re-add null-extended rows
    // exactly like matched ones. Oracle = the full LEFT-then-inner
    // re-join of the post-change snapshots.
    s"""WITH $cdcJoinSql,
      |nnew AS (
      |  SELECT n_nationkey AS c_id, n_nationkey AS nationkey, n_name
      |  FROM nation WHERE n_nationkey % 5 <> 0 AND n_nationkey % 7 <> 0
      |  UNION ALL
      |  SELECT n_nationkey + 900000000, (n_nationkey + 1) % 25, n_name
      |  FROM nation WHERE n_nationkey % 4 = 0
      |  UNION ALL
      |  SELECT n_nationkey, n_nationkey, n_name || '_v2'
      |  FROM nation WHERE n_nationkey % 7 = 0)
      |SELECT nationkey, c_custkey, c_acctbal, s_suppkey, s_acctbal, c_id, n_name
      |FROM cnew LEFT JOIN snew USING (nationkey) JOIN nnew USING (nationkey)
      |ORDER BY nationkey, c_custkey, s_suppkey NULLS FIRST, c_id""".stripMargin) { (s, d) =>
    import graft.operators.IncrementalJoin
    val fx = cdcJoinFixture(s, d)
    val abKey = struct(col("c_custkey"), col("s_suppkey")).as("ab_key")
    val nat = t(s, d, "nation").select(
      col("n_nationkey").as("c_id"), col("n_nationkey").as("nationkey"),
      col("n_name"))
    val nDel = nat.filter(col("c_id") % 5 === 0 || col("c_id") % 7 === 0)
      .select("c_id")
    val nIns = nat.filter(col("c_id") % 4 === 0)
      .withColumn("c_id", col("c_id") + lit(900000000L))
      .withColumn("nationkey", (col("nationkey") + 1) % 25)
      .unionByName(nat.filter(col("c_id") % 7 === 0)
        .withColumn("n_name", concat(col("n_name"), lit("_v2"))))
    val nNew = nat.join(nDel, Seq("c_id"), "left_anti").unionByName(nIns)
    // same lazy pin discipline as q_cdc_snowflake: the outer level-1
    // fold is wider (83 stages unpinned at sf0.1), and level 2 re-derives
    // it per consuming term without the pins
    val v1 = IncrementalJoin.joinStateLeft(fx.cust, fx.supp, Seq("nationkey"))
      .localCheckpoint(eager = false)
    val vd1r = IncrementalJoin.applyCdcLeftWithDelta(v1,
      "c_custkey", "s_suppkey", Seq("nationkey"),
      fx.cIns, fx.cDel, fx.sIns, fx.sDel, fx.cNew, fx.sNew)
    val vd1 = IncrementalJoin.ViewDelta(
      vd1r.view.localCheckpoint(eager = false),
      vd1r.inserted.localCheckpoint(eager = false),
      vd1r.deleted.localCheckpoint(eager = false))
    val v2 = IncrementalJoin.applyCdc(
      IncrementalJoin.joinState(v1.select(abKey, col("*")), nat,
        Seq("nationkey")),
      "ab_key", "c_id", Seq("nationkey"),
      vd1.inserted.select(abKey, col("*")),
      vd1.deleted.select(abKey),
      nIns, nDel,
      vd1.view.select(abKey, col("*")), nNew)
    v2.select("nationkey", "c_custkey", "c_acctbal", "s_suppkey",
        "s_acctbal", "c_id", "n_name")
      .orderBy(col("nationkey"), col("c_custkey"),
        col("s_suppkey").asc_nulls_first, col("c_id"))
  }

  q("q_cdc_scd2",
    // SCD-type-2 history build from the events change log: per user, the
    // event_type attribute's runs of equal consecutive values collapse
    // into validity intervals [valid_from, valid_to) with a 1-based
    // version and an is_current flag. Engine = two same-key window
    // passes over ONE exchange (ChangeCapture.scd2FromLog)
    """WITH o AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER w AS prev,
      |    row_number() OVER w AS rn
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |cp AS (
      |  SELECT user_id, event_type, ts, event_id FROM o
      |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev)
      |SELECT user_id, event_type,
      |  CAST(row_number() OVER w2 AS BIGINT) AS version,
      |  ts AS valid_from,
      |  lead(ts) OVER w2 AS valid_to,
      |  lead(ts) OVER w2 IS NULL AS is_current
      |FROM cp WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin) { (s, d) =>
    graft.operators.ChangeCapture.scd2FromLog(
        t(s, d, "events"), "user_id", "ts", "event_type", Seq("event_id"))
      .orderBy("user_id", "version")
  }

  q("q_events_sessionize",
    // gap-based sessionization (30-min inactivity closes a session):
    // lag + running-sum windows share one user-keyed exchange, then a
    // keyed agg collapses to session rows; duration is EXACT integer
    // microseconds (no double seconds to round)
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM g)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events,
      |  max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
      |FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin) { (s, d) =>
    graft.operators.ChangeCapture.sessionize(
        t(s, d, "events"), "user_id", "ts",
        gapSeconds = 1800L, tiebreak = Seq("event_id"))
      .orderBy("user_id", "session_idx")
  }

  q("q_profile_columns",
    // column profiling (the measurement side of the reference's declared
    // column metadata, meta.py:30-53): one scan, one aggregate — every
    // stat is an agg expression in the same agg(); exact distincts plan
    // as a single Expand-based aggregate; the tall shape explodes a
    // struct array AFTER the one-row agg
    """WITH o AS (SELECT * FROM orders)
      |SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
      |  count(*) - count(o_custkey) AS n_nulls,
      |  count(DISTINCT o_custkey) AS n_distinct,
      |  CAST(min(o_custkey) AS DOUBLE) AS min_num,
      |  CAST(max(o_custkey) AS DOUBLE) AS max_num,
      |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
      |FROM o
      |UNION ALL
      |SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
      |  count(DISTINCT o_orderpriority),
      |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
      |  min(o_orderpriority), max(o_orderpriority)
      |FROM o
      |UNION ALL
      |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
      |  count(DISTINCT o_orderstatus),
      |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
      |  min(o_orderstatus), max(o_orderstatus)
      |FROM o
      |UNION ALL
      |SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
      |  count(DISTINCT o_totalprice),
      |  min(o_totalprice), max(o_totalprice),
      |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
      |FROM o
      |ORDER BY column_name""".stripMargin) { (s, d) =>
    graft.operators.Profiling.profileColumns(
        t(s, d, "orders"),
        Seq("o_custkey", "o_orderpriority", "o_orderstatus", "o_totalprice"))
      .orderBy("column_name")
  }

  q("q_profile_columns_approx",
    // the documented 100 TB swap (Profiling.profileColumns
    // approxDistinct=true: HLL++ instead of the Expand-based exact
    // multi-distinct) made driver-visible under the gate with the
    // q_agg_approx_distinct tolerance discipline: the oracle replays
    // every EXACT stat plus the literal verdict TRUE; the approx path's
    // estimate must land within 3·rsd (rsd 0.05 → ±15 %) of the exact
    // distinct per column or the boolean hash-fails. The exact twin here
    // is the correctness harness, not the operator: at scale a user runs
    // ONLY the approx profile.
    """WITH o AS (SELECT * FROM orders)
      |SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
      |  count(*) - count(o_custkey) AS n_nulls,
      |  count(DISTINCT o_custkey) AS n_distinct,
      |  TRUE AS within_band
      |FROM o
      |UNION ALL
      |SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
      |  count(DISTINCT o_orderpriority), TRUE
      |FROM o
      |UNION ALL
      |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
      |  count(DISTINCT o_orderstatus), TRUE
      |FROM o
      |UNION ALL
      |SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
      |  count(DISTINCT o_totalprice), TRUE
      |FROM o
      |ORDER BY column_name""".stripMargin) { (s, d) =>
    val cols = Seq("o_custkey", "o_orderpriority", "o_orderstatus", "o_totalprice")
    val exact = graft.operators.Profiling.profileColumns(t(s, d, "orders"), cols)
      .select("column_name", "n_rows", "n_nulls", "n_distinct")
    val approx = graft.operators.Profiling
      .profileColumns(t(s, d, "orders"), cols, approxDistinct = true)
      .select(col("column_name"), col("n_distinct").as("__approx"))
    exact.join(approx, "column_name")
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"),
        (abs(col("__approx") - col("n_distinct")) <=
          col("n_distinct") * lit(3 * 0.05)).as("within_band"))
      .orderBy("column_name")
  }

  q("q_text_bm25",
    // BM25 keyword retrieval (lexical complement to the ANN family):
    // probe terms = the 3 highest-df terms of length >= 6 (self-derived,
    // deterministic); top-10 docs per term via the bounded-heap TopKAgg,
    // never a per-term sort. idf contains ln -> irrational scores, so
    // the 6-dp round is half-point-immune (BASELINE.md rational audit)
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |consts AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      |probes AS (
      |  SELECT term, df FROM dft WHERE length(term) >= 6
      |  ORDER BY df DESC, term LIMIT 3),
      |scored AS (
      |  SELECT p.term, tf.doc_id,
      |    ln(1.0 + (CAST(c.n_docs AS DOUBLE) - p.df + 0.5) / (CAST(p.df AS DOUBLE) + 0.5))
      |      * (CAST(tf.tf AS DOUBLE) * 2.2)
      |      / (CAST(tf.tf AS DOUBLE) + 1.2 *
      |         (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) *
      |          (CAST(c.n_docs AS DOUBLE) / CAST(c.sum_dl AS DOUBLE)))) AS score
      |  FROM tf JOIN probes p USING (term) JOIN dl USING (doc_id) CROSS JOIN consts c),
      |top AS (
      |  SELECT term, doc_id, score,
      |    row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rk
      |  FROM scored)
      |SELECT term, CAST(rk AS BIGINT) AS rk, doc_id, round(score, 6) AS score
      |FROM top WHERE rk <= 10 ORDER BY term, rk""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.bm25TopDocs(
        t(s, d, "documents"), "doc_id", "text",
        nTerms = 3, minTermLen = 6, k1 = 1.2, b = 0.75, topK = 10)
      .orderBy("term", "rk")
  }

  private def textIndexPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "txt") { p =>
      graft.operators.TextAnalysis.buildTextIndex(
        t(s, d, "documents"), "doc_id", "text", p, nBuckets = 64)
    }

  /** Incremental-index fixture: build on the 80 % stratum (doc_id % 5
    * ≠ 0), then refresh with the held-out 20 % — the refreshed index
    * must serve probes identically to one built over everything. */
  private def textRefreshIndexPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "txtrefresh") { p =>
      val docs = t(s, d, "documents")
      graft.operators.TextAnalysis.buildTextIndex(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", p,
        nBuckets = 64)
      graft.operators.TextAnalysis.refreshTextIndex(
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", p)
    }

  /** Delete-lifecycle fixture: build on EVERYTHING, tombstone the 1-in-7
    * stratum, compact — the compacted index must serve probes
    * identically to one built over the survivors. */
  private def textDeleteIndexPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "txtdelete") { p =>
      val docs = t(s, d, "documents")
      graft.operators.TextAnalysis.buildTextIndex(
        docs, "doc_id", "text", p, nBuckets = 64)
      graft.operators.TextAnalysis.deleteFromTextIndex(
        docs.filter(col("doc_id") % 7 === 0).select("doc_id"), "doc_id", p)
      graft.operators.TextAnalysis.compactTextIndex(s, p)
    }

  q("q_text_bm25_index_build",
    // one-off inverted-index materialization charged separately from the
    // probes (the ANN index_build discipline): postings = distinct
    // (doc, term) pairs, replayed from raw tokenization
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2)
      |SELECT count(*) AS n_postings, count(DISTINCT term) AS n_terms,
      |  count(DISTINCT doc_id) AS n_docs
      |FROM tf""".stripMargin) { (s, d) =>
    s.read.parquet(s"${textIndexPath(s, d)}/postings")
      .agg(count(lit(1)).as("n_postings"),
        countDistinct(col("term")).as("n_terms"),
        countDistinct(col("doc_id")).as("n_docs"))
  }

  q("q_text_bm25_indexed",
    // the indexed probe: same scores and output as q_text_bm25, but the
    // corpus-sized postings scan reads ONLY the probed terms' bucket
    // partitions (PartitionFilters — PlanQualitySpec asserts), and dl is
    // denormalized into the postings so no doc-length join runs at probe
    // time. The oracle is the FULL scoring replay on raw documents —
    // index staleness or bucket-routing bugs fail the hash
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |consts AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      |probes AS (
      |  SELECT term, df FROM dft WHERE length(term) >= 6
      |  ORDER BY df DESC, term LIMIT 3),
      |scored AS (
      |  SELECT p.term, tf.doc_id,
      |    ln(1.0 + (CAST(c.n_docs AS DOUBLE) - p.df + 0.5) / (CAST(p.df AS DOUBLE) + 0.5))
      |      * (CAST(tf.tf AS DOUBLE) * 2.2)
      |      / (CAST(tf.tf AS DOUBLE) + 1.2 *
      |         (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) *
      |          (CAST(c.n_docs AS DOUBLE) / CAST(c.sum_dl AS DOUBLE)))) AS score
      |  FROM tf JOIN probes p USING (term) JOIN dl USING (doc_id) CROSS JOIN consts c),
      |top AS (
      |  SELECT term, doc_id, score,
      |    row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rk
      |  FROM scored)
      |SELECT term, CAST(rk AS BIGINT) AS rk, doc_id, round(score, 6) AS score
      |FROM top WHERE rk <= 10 ORDER BY term, rk""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.bm25TopDocsIndexed(
        s, textIndexPath(s, d),
        nTerms = 3, minTermLen = 6, k1 = 1.2, b = 0.75, topK = 10)
      .orderBy("term", "rk")
  }

  q("q_text_bm25_index_refresh",
    // incremental index maintenance (the dedupAgainstCorpus discipline
    // for the index family): built on 80 % of the corpus, refreshed with
    // the held-out 20 % — postings appended only into the new terms'
    // buckets, df merged vocab-sized, consts advanced by deltas. The
    // oracle is the FULL scoring replay over ALL documents, so a refresh
    // that loses postings, double-counts df, or leaves consts stale
    // fails the hash exactly as a stale index would
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |consts AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      |probes AS (
      |  SELECT term, df FROM dft WHERE length(term) >= 6
      |  ORDER BY df DESC, term LIMIT 3),
      |scored AS (
      |  SELECT p.term, tf.doc_id,
      |    ln(1.0 + (CAST(c.n_docs AS DOUBLE) - p.df + 0.5) / (CAST(p.df AS DOUBLE) + 0.5))
      |      * (CAST(tf.tf AS DOUBLE) * 2.2)
      |      / (CAST(tf.tf AS DOUBLE) + 1.2 *
      |         (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) *
      |          (CAST(c.n_docs AS DOUBLE) / CAST(c.sum_dl AS DOUBLE)))) AS score
      |  FROM tf JOIN probes p USING (term) JOIN dl USING (doc_id) CROSS JOIN consts c),
      |top AS (
      |  SELECT term, doc_id, score,
      |    row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rk
      |  FROM scored)
      |SELECT term, CAST(rk AS BIGINT) AS rk, doc_id, round(score, 6) AS score
      |FROM top WHERE rk <= 10 ORDER BY term, rk""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.bm25TopDocsIndexed(
        s, textRefreshIndexPath(s, d),
        nTerms = 3, minTermLen = 6, k1 = 1.2, b = 0.75, topK = 10)
      .orderBy("term", "rk")
  }

  q("q_text_bm25_index_deleted",
    // the delete half of the index lifecycle (tombstone → compact, the
    // Lucene merge discipline): built over everything, 1-in-7 docs
    // tombstoned, compacted FROM THE POSTINGS (one postings scan — the
    // model rebuilds without touching raw text). The oracle scores the
    // SURVIVING documents from scratch, so a compaction that leaks
    // deleted postings, keeps stale df, or mis-advances consts fails
    // the hash
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
      |  FROM documents WHERE doc_id % 7 <> 0),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |consts AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      |probes AS (
      |  SELECT term, df FROM dft WHERE length(term) >= 6
      |  ORDER BY df DESC, term LIMIT 3),
      |scored AS (
      |  SELECT p.term, tf.doc_id,
      |    ln(1.0 + (CAST(c.n_docs AS DOUBLE) - p.df + 0.5) / (CAST(p.df AS DOUBLE) + 0.5))
      |      * (CAST(tf.tf AS DOUBLE) * 2.2)
      |      / (CAST(tf.tf AS DOUBLE) + 1.2 *
      |         (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) *
      |          (CAST(c.n_docs AS DOUBLE) / CAST(c.sum_dl AS DOUBLE)))) AS score
      |  FROM tf JOIN probes p USING (term) JOIN dl USING (doc_id) CROSS JOIN consts c),
      |top AS (
      |  SELECT term, doc_id, score,
      |    row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rk
      |  FROM scored)
      |SELECT term, CAST(rk AS BIGINT) AS rk, doc_id, round(score, 6) AS score
      |FROM top WHERE rk <= 10 ORDER BY term, rk""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.bm25TopDocsIndexed(
        s, textDeleteIndexPath(s, d),
        nTerms = 3, minTermLen = 6, k1 = 1.2, b = 0.75, topK = 10)
      .orderBy("term", "rk")
  }

  q("q_join_interval",
    // interval-overlap join WITHOUT an equi-key (view windows × purchase
    // windows, variable lengths both sides): binned to a shuffled
    // equi-join on the bin id with the canonical-bin rule emitting each
    // overlapping pair exactly once — never a BroadcastNestedLoopJoin.
    // Closed intervals: touching endpoints overlap with overlap_us = 0
    """WITH a AS (
      |  SELECT event_id AS a_id, epoch_us(ts) AS a_s,
      |    epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS a_e
      |  FROM events WHERE event_type = 'view'),
      |b AS (
      |  SELECT event_id AS b_id, epoch_us(ts) AS b_s,
      |    epoch_us(ts) + (event_id % 5 + 1) * 60000000 AS b_e
      |  FROM events WHERE event_type = 'purchase')
      |SELECT a_id, b_id, least(a_e, b_e) - greatest(a_s, b_s) AS overlap_us
      |FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
      |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    val ev = t(s, d, "events")
    val a = ev.filter(col("event_type") === "view").select(
      col("event_id").as("a_id"),
      unix_micros(col("ts")).as("a_s"),
      (unix_micros(col("ts")) + (col("event_id") % 7 + 1) * 60000000L).as("a_e"))
    val b = ev.filter(col("event_type") === "purchase").select(
      col("event_id").as("b_id"),
      unix_micros(col("ts")).as("b_s"),
      (unix_micros(col("ts")) + (col("event_id") % 5 + 1) * 60000000L).as("b_e"))
    graft.operators.RangeJoin.intervalOverlapJoin(
        a, b, "a_s", "a_e", "b_s", "b_e", binUnits = 600L * 1000000L)
      .select("a_id", "b_id", "overlap_us")
      .orderBy("a_id", "b_id")
  }

  q("q_join_interval_capped",
    // bounded-output interval overlap: the 3 MOST-overlapping purchase
    // windows per view window. The interval join is the inventory's one
    // output-bound (~sf²) family; the bounded-heap cap (map-side partial
    // agg, ≤k rows per left interval per mapper) returns it to
    // O(k·|left|) when top-k semantics suffice — the binnedRangeJoinCapped
    // move applied to variable-length intervals. Selection is
    // deterministic (overlap desc, then right cols by name asc) so the
    // oracle replays it with the equivalent row_number window.
    """WITH a AS (
      |  SELECT event_id AS a_id, epoch_us(ts) AS a_s,
      |    epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS a_e
      |  FROM events WHERE event_type = 'view'),
      |b AS (
      |  SELECT event_id AS b_id, epoch_us(ts) AS b_s,
      |    epoch_us(ts) + (event_id % 5 + 1) * 60000000 AS b_e
      |  FROM events WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT a_id, b_id,
      |    least(a_e, b_e) - greatest(a_s, b_s) AS overlap_us,
      |    row_number() OVER (PARTITION BY a_id
      |      ORDER BY least(a_e, b_e) - greatest(a_s, b_s) DESC,
      |               b_e, b_id, b_s) AS rn
      |  FROM a JOIN b ON a_s <= b_e AND b_s <= a_e)
      |SELECT a_id, b_id, overlap_us FROM j WHERE rn <= 3
      |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    val ev = t(s, d, "events")
    val a = ev.filter(col("event_type") === "view").select(
      col("event_id").as("a_id"),
      unix_micros(col("ts")).as("a_s"),
      (unix_micros(col("ts")) + (col("event_id") % 7 + 1) * 60000000L).as("a_e"))
    val b = ev.filter(col("event_type") === "purchase").select(
      col("event_id").as("b_id"),
      unix_micros(col("ts")).as("b_s"),
      (unix_micros(col("ts")) + (col("event_id") % 5 + 1) * 60000000L).as("b_e"))
    graft.operators.RangeJoin.intervalOverlapJoinCapped(
        a, b, "a_s", "a_e", "b_s", "b_e", binUnits = 600L * 1000000L,
        leftKey = Seq("a_id"), k = 3)
      .select("a_id", "b_id", "overlap_us")
      .orderBy("a_id", "b_id")
  }

  q("q_profile_skew",
    // key-skew profile for a join key (the go/no-go numbers for salting
    // or AQE skew handling): per-key counts in one partial+final agg,
    // heavy hitters via a GLOBAL bounded-heap TopKAgg (no sort of the
    // key histogram), totals broadcast back. All-integer output
    """WITH c AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
      |tot AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows FROM c),
      |top AS (
      |  SELECT l_partkey, cnt,
      |    row_number() OVER (ORDER BY cnt DESC, l_partkey) AS rk
      |  FROM c)
      |SELECT l_partkey, cnt, CAST(rk AS BIGINT) AS rk, n_keys, n_rows
      |FROM top CROSS JOIN tot WHERE rk <= 10 ORDER BY rk""".stripMargin) { (s, d) =>
    graft.operators.Profiling.keySkewTopK(
        t(s, d, "lineitem"), "l_partkey", k = 10)
      .orderBy("rk")
  }

  /** Morton-interleave SQL for the z-order oracle: OR of 2·bits
    * single-bit shift terms — the exact arithmetic the engine's
    * [[graft.operators.Layout.zorderKey]] runs, rendered for DuckDB. */
  private def zorderSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  q("q_layout_zorder",
    // Z-order clustering evidence: bucket lineitem by the top bits of
    // the Morton key over (partkey, scaled suppkey) and report each
    // bucket's bounding box — small boxes on BOTH dimensions are
    // exactly what parquet min/max stats expose to the scan pruner.
    // suppkey scales ×20 so both dimensions span comparable bit widths
    // (Z-order degenerates on the narrow axis of a mismatched pair —
    // the normalize-then-interleave rule every Z-clustering needs).
    // Pure bit arithmetic (replays bit-equal), one projection + one agg
    s"""WITH z AS (
      |  SELECT ${zorderSql("CAST(l_partkey AS BIGINT)", "(CAST(l_suppkey AS BIGINT) * 20)", 11)} AS zkey,
      |    CAST(l_partkey AS BIGINT) AS x, CAST(l_suppkey AS BIGINT) * 20 AS y
      |  FROM lineitem)
      |SELECT zkey >> 14 AS z_bucket, count(*) AS n,
      |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
      |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin) { (s, d) =>
    graft.operators.Layout.zorderBucketStats(
        t(s, d, "lineitem").withColumn("supp_scaled",
          col("l_suppkey").cast("long") * 20),
        "l_partkey", "supp_scaled",
        bits = 11, bucketShift = 14)
      .orderBy("z_bucket")
  }

  q("q_compact_plan",
    // small-file compaction planning: partition inventory (rows per
    // ship-month) binned by greedy running total into ~target-size
    // output files. The window runs over the INVENTORY (metadata-sized),
    // never the table; the planned rewrite is one repartitionByRange
    """WITH inv AS (
      |  SELECT date_trunc('month', l_shipdate) AS part_month, count(*) AS n_rows
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT part_month, n_rows,
      |    CAST(sum(n_rows) OVER (ORDER BY part_month ROWS UNBOUNDED PRECEDING)
      |         AS BIGINT) - n_rows AS cum
      |  FROM inv)
      |SELECT part_month, n_rows, CAST(floor(cum / 25000) AS BIGINT) AS bin
      |FROM c ORDER BY part_month""".stripMargin) { (s, d) =>
    val inv = t(s, d, "lineitem")
      .groupBy(date_trunc("month", col("l_shipdate")).as("part_month"))
      .agg(count(lit(1)).as("n_rows"))
    graft.operators.Layout.compactionPlan(inv, "part_month", "n_rows",
        targetSize = 25000L)
      .orderBy("part_month")
  }

  q("q_layout_zorder_exec",
    // EXECUTED Z-order clustered rewrite (the piece q_layout_zorder only
    // planned): a copy of orders, initially laid out in 8
    // key-uncorrelated files, is range-partitioned and within-file
    // sorted by the Morton key over (order day, price bucket) — both
    // naturally bounded at ANY sf, so the interleave needs no
    // per-dataset scaling — then swapped in with the staged-rename
    // discipline. The oracle is ROW IDENTITY: the clustered copy must
    // read back exactly as the original table, every column bit-equal
    // through the shuffle + sort + swap. Clustering QUALITY (per-file
    // bounding boxes shrinking on both dimensions, row-group pruning
    // measurably engaging) is pinned by FuzzyLayoutSpec, where the file
    // boundaries are controlled
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    s.read.parquet(zorderExecPath(s, d))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  q("q_layout_compact_exec",
    // EXECUTED small-file compaction (Layout.compactFiles, the
    // maintenance half of the reference's delete/relocate surface,
    // meta.py:769-791): a 16-file copy of orders is rewritten so each
    // output file holds one greedy ~quarter-of-total bin, via the
    // staged-swap rename. Same row-identity oracle as the zorder
    // rewrite: compaction must be invisible to readers. Bin-count /
    // crash-safety / partitioned-input behavior is spec-pinned
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    s.read.parquet(compactExecPath(s, d))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  q("q_join_fuzzy",
    // blocked fuzzy join (entity resolution): customers matched to
    // deterministically corrupted name variants (one char deleted at a
    // key-dependent position) within Levenshtein distance 1. Engine =
    // deletion-neighborhood (FastSS) blocking with a no-false-negative
    // guarantee + exact verify on candidates only — chosen over q-gram
    // prefix blocking because the zero-padded serial names make every
    // gram corpus-hot (sf0.1: 299 s gram-blocked vs ~2 s here); the
    // oracle is the BRUTE theta join, so any blocking recall loss fails
    // the hash
    """WITH r AS (
      |  SELECT c_custkey AS r_key,
      |    substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT))
      |      || substr(c_name, CAST(c_custkey % length(c_name) AS INT) + 2) AS r_name
      |  FROM customer)
      |SELECT l.c_custkey, r.r_key,
      |  CAST(levenshtein(l.c_name, r.r_name) AS BIGINT) AS dist
      |FROM customer l JOIN r ON levenshtein(l.c_name, r.r_name) <= 1
      |ORDER BY c_custkey, r_key""".stripMargin) { (s, d) =>
    val cust = t(s, d, "customer").select("c_custkey", "c_name")
    val corrupted = cust.select(
      col("c_custkey").as("r_key"),
      expr("""concat(
        substring(c_name, 1, cast(c_custkey % length(c_name) as int)),
        substring(c_name, cast(c_custkey % length(c_name) as int) + 2))""")
        .as("r_name"))
    graft.operators.FuzzyJoin.deletionFuzzyJoin(
        cust, corrupted, "c_custkey", "c_name", "r_key", "r_name",
        maxDist = 1)
      .orderBy("c_custkey", "r_key")
  }

  q("q_join_fuzzy_qgram",
    // the OTHER fuzzy blocking scheme as a registered query: q-gram
    // rare-prefix blocking over word-salad part names (deletion blocking
    // owns the low-entropy serials in q_join_fuzzy), on a 1-in-20
    // partkey stratum. The stratum is the SELECTIVITY budget, not just
    // oracle thrift: part names draw from a ~90-word vocabulary, so
    // gram document frequency grows linearly with the indexed side and
    // candidates grow ~n·df — at a full-table sf1 that measured
    // runaway-quadratic (the r6c lesson re-learned on a new fixture).
    // Blocked joins are only as good as their key selectivity; the
    // registered stratum keeps df bounded at every gate scale while
    // still quadratic-checking recall against the brute oracle. The 25
    // four-char nation prefixes (≤ q·d distinct grams) exercise the
    // short-string fallback block — the r7 pigeonhole fix — so a recall
    // regression at EITHER length stratum fails the hash
    """WITH l AS (
      |  SELECT p_partkey AS lid, p_name AS ls FROM part WHERE p_partkey % 20 = 1
      |  UNION ALL
      |  SELECT n_nationkey + 10000000, substr(n_name, 1, 4) FROM nation),
      |r AS (
      |  SELECT lid AS rid,
      |    substr(ls, 1, CAST(lid % length(ls) AS INT))
      |      || substr(ls, CAST(lid % length(ls) AS INT) + 2) AS rs
      |  FROM l)
      |SELECT l.lid, r.rid, CAST(levenshtein(l.ls, r.rs) AS BIGINT) AS dist
      |FROM l JOIN r ON levenshtein(l.ls, r.rs) <= 1
      |ORDER BY lid, rid""".stripMargin) { (s, d) =>
    val parts = t(s, d, "part").filter(col("p_partkey") % 20 === 1)
      .select(col("p_partkey").cast("long").as("lid"), col("p_name").as("ls"))
    val shorts = t(s, d, "nation")
      .select((col("n_nationkey") + 10000000L).as("lid"),
        substring(col("n_name"), 1, 4).as("ls"))
    val left = parts.unionByName(shorts)
    val right = left.select(col("lid").as("rid"),
      expr("""concat(
        substring(ls, 1, cast(lid % length(ls) as int)),
        substring(ls, cast(lid % length(ls) as int) + 2))""").as("rs"))
    graft.operators.FuzzyJoin.qgramFuzzyJoin(
        left, right, "lid", "ls", "rid", "rs", maxDist = 1)
      .orderBy("lid", "rid")
  }

  q("q_join_sorted_neighborhood",
    // sorted-neighborhood ER (the OTHER classic blocking): one total
    // order on (c_name, c_custkey), each row meets its 9 successors,
    // exact Levenshtein ≤ 2 verify. The engine materializes the order
    // via a two-phase distributed rank (never a global window); the
    // oracle IS the definition — row_number + rank-difference self-join
    """WITH r AS (
      |  SELECT c_custkey AS id, c_name AS s,
      |    row_number() OVER (ORDER BY c_name, c_custkey) AS rn
      |  FROM customer WHERE c_name IS NOT NULL AND c_custkey IS NOT NULL)
      |SELECT a.id AS id_a, b.id AS id_b,
      |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
      |FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 9
      |WHERE levenshtein(a.s, b.s) <= 2
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    graft.operators.FuzzyJoin.sortedNeighborhoodJoin(
        t(s, d, "customer"), "c_custkey", "c_name",
        sortKey = col("c_name"), window = 10, maxDist = 2)
      .orderBy("id_a", "id_b")
  }

  q("q_join_jarowinkler",
    // SNM blocking + Jaro–Winkler verify (the classic name-matcher: JW
    // weighs shared prefixes, SNM bounds candidates since JW has no
    // edit-distance blocking guarantee). graft.functions.JaroWinkler is
    // BIT-compatible with DuckDB's jaro_winkler_similarity (verified on
    // 3,000 random pairs), so the 0.95 threshold and the 6-dp scores
    // replay exactly; output rounds through the VARCHAR→DECIMAL bridge
    """WITH r AS (
      |  SELECT c_custkey AS id, c_name AS s,
      |    row_number() OVER (ORDER BY c_name, c_custkey) AS rn
      |  FROM customer WHERE c_name IS NOT NULL AND c_custkey IS NOT NULL)
      |SELECT a.id AS id_a, b.id AS id_b,
      |  CAST(round(CAST(CAST(jaro_winkler_similarity(a.s, b.s) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS jw
      |FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 9
      |WHERE jaro_winkler_similarity(a.s, b.s) >= 0.95
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    graft.operators.FuzzyJoin.sortedNeighborhoodJaroWinkler(
        t(s, d, "customer"), "c_custkey", "c_name",
        sortKey = col("c_name"), window = 10, minSim = 0.95)
      .withColumn("jw", round(col("jw"), 6))
      .orderBy("id_a", "id_b")
  }

  // Fellegi–Sunter model constants for q_er_fs_score — driver-computed
  // once, interpolated as shortest-roundtrip double literals into BOTH
  // the Spark plan and the oracle SQL so the weight sums are bit-equal
  // (same literals, same fold order).
  private val fsComps = Seq(
    graft.operators.RecordLinkage.FsJaroWinkler("name", "c_name", "d_name",
      minSim = 0.95, m = 0.95, u = 0.02),
    graft.operators.RecordLinkage.FsExact("bal", "c_acctbal", "d_acctbal",
      m = 0.9, u = 0.001),
    graft.operators.RecordLinkage.FsExact("seg", "c_mktsegment", "d_mktsegment",
      m = 0.85, u = 0.2))
  private val fsLambda = 0.01
  private val fsPrior = math.log(fsLambda / (1 - fsLambda)) / math.log(2.0)

  /** FS scoring of `customer` vs a dirtied-copy CTE as two chained CTEs
    * (`outName`_g = blocked agreement vectors, `outName` = ids of pairs
    * whose match weight clears 0) — the q_er_fs_score arithmetic,
    * factored so q_er_clusters can score TWO snapshots without
    * duplicating the weight literal block. */
  private def fsMatchedCte(dirtyName: String, outName: String): String =
    s"""${outName}_g AS (
       |  SELECT l.c_custkey AS id_l, r.d_custkey AS id_r,
       |    CASE WHEN l.c_name IS NULL OR r.d_name IS NULL THEN NULL
       |         WHEN jaro_winkler_similarity(l.c_name, r.d_name) >= 0.95
       |           THEN 1 ELSE 0 END AS g_name,
       |    CASE WHEN l.c_acctbal IS NULL OR r.d_acctbal IS NULL THEN NULL
       |         WHEN l.c_acctbal = r.d_acctbal THEN 1 ELSE 0 END AS g_bal,
       |    CASE WHEN l.c_mktsegment IS NULL OR r.d_mktsegment IS NULL THEN NULL
       |         WHEN l.c_mktsegment = r.d_mktsegment THEN 1 ELSE 0 END AS g_seg
       |  FROM customer l JOIN $dirtyName r
       |    ON l.c_nationkey = r.d_nationkey
       |   AND substr(l.c_name, 16, 3) = substr(r.d_name, 16, 3)),
       |$outName AS (
       |  SELECT id_l, id_r FROM ${outName}_g
       |  WHERE ((($fsPrior
       |      + CASE WHEN g_name IS NULL THEN 0.0
       |             WHEN g_name = 1 THEN ${fsComps(0).agreeWeight}
       |             ELSE ${fsComps(0).disagreeWeight} END)
       |      + CASE WHEN g_bal IS NULL THEN 0.0
       |             WHEN g_bal = 1 THEN ${fsComps(1).agreeWeight}
       |             ELSE ${fsComps(1).disagreeWeight} END)
       |      + CASE WHEN g_seg IS NULL THEN 0.0
       |             WHEN g_seg = 1 THEN ${fsComps(2).agreeWeight}
       |             ELSE ${fsComps(2).disagreeWeight} END) >= 0.0)""".stripMargin

  q("q_er_fs_score",
    // probabilistic record linkage (Fellegi–Sunter): customers vs a
    // deterministically-dirtied copy (one-char name substitution for
    // key%3, reversed name for key%7, NULLed balance for key%5,
    // corrupted segment for key%2), blocked on (nation, name-suffix),
    // scored as log2 Bayes factors with a λ=0.01 prior. JW is
    // bit-compatible with DuckDB; weights are shared literals; the
    // threshold filters on the RAW weight, output rounds via the bridge
    s"""WITH dirty AS (
      |  SELECT c_custkey AS d_custkey,
      |    CASE WHEN c_custkey % 3 = 0
      |           THEN substr(c_name, 1, 9) || 'X' || substr(c_name, 11)
      |         WHEN c_custkey % 7 = 0 THEN reverse(c_name)
      |         ELSE c_name END AS d_name,
      |    CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END AS d_acctbal,
      |    CASE WHEN c_custkey % 2 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS d_mktsegment,
      |    c_nationkey AS d_nationkey
      |  FROM customer),
      |scored AS (
      |  SELECT l.c_custkey AS id_l, r.d_custkey AS id_r,
      |    CASE WHEN l.c_name IS NULL OR r.d_name IS NULL THEN NULL
      |         WHEN jaro_winkler_similarity(l.c_name, r.d_name) >= 0.95
      |           THEN 1 ELSE 0 END AS g_name,
      |    CASE WHEN l.c_acctbal IS NULL OR r.d_acctbal IS NULL THEN NULL
      |         WHEN l.c_acctbal = r.d_acctbal THEN 1 ELSE 0 END AS g_bal,
      |    CASE WHEN l.c_mktsegment IS NULL OR r.d_mktsegment IS NULL THEN NULL
      |         WHEN l.c_mktsegment = r.d_mktsegment THEN 1 ELSE 0 END AS g_seg
      |  FROM customer l JOIN dirty r
      |    ON l.c_nationkey = r.d_nationkey
      |   AND substr(l.c_name, 16, 3) = substr(r.d_name, 16, 3)),
      |w AS (
      |  SELECT id_l, id_r, g_name, g_bal, g_seg,
      |    ((($fsPrior
      |      + CASE WHEN g_name IS NULL THEN 0.0
      |             WHEN g_name = 1 THEN ${fsComps(0).agreeWeight}
      |             ELSE ${fsComps(0).disagreeWeight} END)
      |      + CASE WHEN g_bal IS NULL THEN 0.0
      |             WHEN g_bal = 1 THEN ${fsComps(1).agreeWeight}
      |             ELSE ${fsComps(1).disagreeWeight} END)
      |      + CASE WHEN g_seg IS NULL THEN 0.0
      |             WHEN g_seg = 1 THEN ${fsComps(2).agreeWeight}
      |             ELSE ${fsComps(2).disagreeWeight} END) AS mw
      |  FROM scored)
      |SELECT id_l, id_r, g_name, g_bal, g_seg,
      |  CAST(round(CAST(CAST(mw AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS match_weight
      |FROM w WHERE mw >= 0.0 ORDER BY id_l, id_r""".stripMargin) { (s, d) =>
    val cust = t(s, d, "customer")
    val key = col("c_custkey")
    val dirty = cust.select(
      key.as("d_custkey"),
      when(key % 3 === 0,
          concat(substring(col("c_name"), 1, 9), lit("X"),
            expr("substring(c_name, 11)")))
        .when(key % 7 === 0, reverse(col("c_name")))
        .otherwise(col("c_name")).as("d_name"),
      when(key % 5 === 0, lit(null).cast("double"))
        .otherwise(col("c_acctbal")).as("d_acctbal"),
      when(key % 2 === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")).as("d_mktsegment"),
      col("c_nationkey").as("d_nationkey"))
    graft.operators.RecordLinkage.fsScorePairs(
        cust.withColumn("blk", substring(col("c_name"), 16, 3)),
        dirty.withColumn("blk", substring(col("d_name"), 16, 3)),
        "c_custkey", "d_custkey",
        blockOn = Seq(("c_nationkey", "d_nationkey"), ("blk", "blk")),
        comparisons = fsComps, lambda = fsLambda, minWeight = 0.0)
      .select(col("id_l"), col("id_r"), col("g_name"), col("g_bal"),
        col("g_seg"), round(col("match_weight"), 6).as("match_weight"))
      .orderBy("id_l", "id_r")
  }

  q("q_er_clusters",
    // ENTITY RESOLUTION end-to-end: the step q_er_fs_score stops short
    // of. Two independently-dirtied snapshots of customer are FS-scored
    // against the clean table (same blocking/weights as q_er_fs_score),
    // matched pairs become edges in a tri-partite graph (clean node =
    // custkey, snapshot A node = key + 1e9, snapshot B node = key +
    // 2e9), and connected components assign one entity_id per real-world
    // customer — A and B records of the same entity unite TRANSITIVELY
    // through the clean node, never compared to each other. Engine =
    // the O(log d) pointer-jumping / budget-gated union-find of
    // Dedup.dedupClusters; oracle = recursive transitive closure
    s"""WITH RECURSIVE dirty_a AS (
      |  SELECT c_custkey AS d_custkey,
      |    CASE WHEN c_custkey % 3 = 0
      |           THEN substr(c_name, 1, 9) || 'X' || substr(c_name, 11)
      |         WHEN c_custkey % 7 = 0 THEN reverse(c_name)
      |         ELSE c_name END AS d_name,
      |    CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END AS d_acctbal,
      |    CASE WHEN c_custkey % 2 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS d_mktsegment,
      |    c_nationkey AS d_nationkey
      |  FROM customer),
      |dirty_b AS (
      |  SELECT c_custkey AS d_custkey,
      |    CASE WHEN c_custkey % 4 = 0
      |           THEN substr(c_name, 1, 11) || 'Q' || substr(c_name, 13)
      |         ELSE c_name END AS d_name,
      |    CASE WHEN c_custkey % 6 = 0 THEN NULL ELSE c_acctbal END AS d_acctbal,
      |    CASE WHEN c_custkey % 3 = 0 THEN 'CORRUPT' ELSE c_mktsegment END AS d_mktsegment,
      |    c_nationkey AS d_nationkey
      |  FROM customer),
      |${fsMatchedCte("dirty_a", "match_a")},
      |${fsMatchedCte("dirty_b", "match_b")},
      |pairs AS (
      |  SELECT id_l AS id_a, id_r + 1000000000 AS id_b FROM match_a
      |  UNION ALL
      |  SELECT id_l, id_r + 2000000000 FROM match_b),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |labels AS (
      |  SELECT u AS node_id, least(u, min(v)) AS entity_id FROM reach GROUP BY u)
      |SELECT node_id, entity_id FROM labels ORDER BY node_id""".stripMargin) { (s, d) =>
    val cust = t(s, d, "customer")
    val key = col("c_custkey")
    def block(df: DataFrame, name: String): DataFrame =
      df.withColumn("blk", substring(col(name), 16, 3))
    val dirtyA = cust.select(
      key.as("d_custkey"),
      when(key % 3 === 0,
          concat(substring(col("c_name"), 1, 9), lit("X"),
            expr("substring(c_name, 11)")))
        .when(key % 7 === 0, reverse(col("c_name")))
        .otherwise(col("c_name")).as("d_name"),
      when(key % 5 === 0, lit(null).cast("double"))
        .otherwise(col("c_acctbal")).as("d_acctbal"),
      when(key % 2 === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")).as("d_mktsegment"),
      col("c_nationkey").as("d_nationkey"))
    val dirtyB = cust.select(
      key.as("d_custkey"),
      when(key % 4 === 0,
          concat(substring(col("c_name"), 1, 11), lit("Q"),
            expr("substring(c_name, 13)")))
        .otherwise(col("c_name")).as("d_name"),
      when(key % 6 === 0, lit(null).cast("double"))
        .otherwise(col("c_acctbal")).as("d_acctbal"),
      when(key % 3 === 0, lit("CORRUPT"))
        .otherwise(col("c_mktsegment")).as("d_mktsegment"),
      col("c_nationkey").as("d_nationkey"))
    def matched(dirty: DataFrame): DataFrame =
      graft.operators.RecordLinkage.fsScorePairs(
        block(cust, "c_name"), block(dirty, "d_name"),
        "c_custkey", "d_custkey",
        blockOn = Seq(("c_nationkey", "d_nationkey"), ("blk", "blk")),
        comparisons = fsComps, lambda = fsLambda, minWeight = 0.0)
    val edges = matched(dirtyA)
      .select(col("id_l").as("id_a"), (col("id_r") + lit(1000000000L)).as("id_b"))
      .unionByName(matched(dirtyB)
        .select(col("id_l").as("id_a"), (col("id_r") + lit(2000000000L)).as("id_b")))
    graft.operators.Dedup.dedupClusters(edges)
      .select(col("doc_id").as("node_id"), col("cluster_id").as("entity_id"))
      .orderBy("node_id")
  }

  q("q_join_snm_multipass",
    // multi-pass SNM: one pass sorted by name, one by REVERSED name —
    // the standard recall fix (a leading-character typo lands far away
    // under the forward sort, adjacent under the reverse). Pairs
    // canonicalize to (min, max) id before the union dedup
    """WITH r1 AS (
      |  SELECT c_custkey AS id, c_name AS s,
      |    row_number() OVER (ORDER BY c_name, c_custkey) AS rn
      |  FROM customer WHERE c_name IS NOT NULL AND c_custkey IS NOT NULL),
      |p1 AS (SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
      |         CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
      |       FROM r1 a JOIN r1 b ON b.rn - a.rn BETWEEN 1 AND 9
      |       WHERE levenshtein(a.s, b.s) <= 2),
      |r2 AS (
      |  SELECT c_custkey AS id, c_name AS s,
      |    row_number() OVER (ORDER BY reverse(c_name), c_custkey) AS rn
      |  FROM customer WHERE c_name IS NOT NULL AND c_custkey IS NOT NULL),
      |p2 AS (SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
      |         CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
      |       FROM r2 a JOIN r2 b ON b.rn - a.rn BETWEEN 1 AND 9
      |       WHERE levenshtein(a.s, b.s) <= 2),
      |u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
      |SELECT id_a, id_b, min(dist) AS dist FROM u
      |GROUP BY id_a, id_b ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    graft.operators.FuzzyJoin.sortedNeighborhoodMultiPass(
        t(s, d, "customer"), "c_custkey", "c_name",
        Seq(col("c_name"), reverse(col("c_name"))),
        window = 10, maxDist = 2)
      .orderBy("id_a", "id_b")
  }

  q("q_dedup_containment",
    // DIRECTED n-gram containment: |sh(a) ∩ sh(b)| / |sh(a)| ≥ 0.8 —
    // catches a short doc embedded in a long one, invisible to
    // symmetric Jaccard. Same shingling + df∈[2,100] block as
    // q_dedup_ngram; both directions of each intersecting pair are
    // scored against their OWN size; ratio bridges VARCHAR→DECIMAL
    """WITH words AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [array_to_string(w[i:i+2], ' ') for i in range(1, greatest(len(w)-1, 1))])) AS s
      |  FROM words),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |shared AS (SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND 100),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      |  FROM (SELECT * FROM sh WHERE s IN (SELECT s FROM shared)) a
      |  JOIN (SELECT * FROM sh WHERE s IN (SELECT s FROM shared)) b USING (s)
      |  WHERE a.doc_id <> b.doc_id GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  CAST(round(CAST(CAST((n_common * 1.0 / sa.n) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) AS containment
      |FROM pairs
      |JOIN sizes sa ON id_a = sa.doc_id
      |WHERE n_common * 1.0 / sa.n >= 0.8
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    graft.operators.Dedup.containmentPairsFrom(
        sharedShingles(s, d), threshold = 0.8, maxShingleDf = 100L)
      .withColumn("containment", round(col("containment"), 6))
      .orderBy("id_a", "id_b")
  }

  q("q_sketch_cms_join_estimate",
    // count–min INNER-PRODUCT join-size estimate (AMS/CM): est |orders ⋈
    // customer on custkey| = min over rows j of Σ_b O[j][b]·C[j][b] —
    // the O(d·w)-state answer to "will this join explode?" vs
    // q_profile_joinstats' exact (full-shuffle) histograms. Entirely
    // deterministic: the oracle replays both grids and the min-of-inner-
    // products exactly; the paired exact join count makes the
    // over-estimate-only guarantee driver-visible (est >= exact always)
    """WITH ho AS (
      |  SELECT md5_number_lower(CAST(o_custkey AS VARCHAR))::HUGEINT AS lo,
      |         md5_number_upper(CAST(o_custkey AS VARCHAR))::HUGEINT AS hi
      |  FROM orders WHERE o_custkey IS NOT NULL),
      |hc AS (
      |  SELECT md5_number_lower(CAST(c_custkey AS VARCHAR))::HUGEINT AS lo,
      |         md5_number_upper(CAST(c_custkey AS VARCHAR))::HUGEINT AS hi
      |  FROM customer WHERE c_custkey IS NOT NULL),
      |co AS (SELECT j, ((lo + j*hi) % 18446744073709551616::HUGEINT) % 256 AS b,
      |         count(*) AS ca
      |       FROM ho, range(4) t(j) GROUP BY 1, 2),
      |cc AS (SELECT j, ((lo + j*hi) % 18446744073709551616::HUGEINT) % 256 AS b,
      |         count(*) AS cb
      |       FROM hc, range(4) t(j) GROUP BY 1, 2),
      |ip AS (SELECT co.j, sum(ca * cb) AS ip
      |       FROM co JOIN cc ON co.j = cc.j AND co.b = cc.b GROUP BY co.j),
      |ex AS (SELECT count(*) AS exact_rows
      |       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
      |SELECT CAST(min(ip) AS BIGINT) AS est_join_rows,
      |  (SELECT exact_rows FROM ex) AS exact_rows,
      |  min(ip) >= (SELECT exact_rows FROM ex) AS over_estimate_only
      |FROM ip""".stripMargin) { (s, d) =>
    val est = graft.operators.Profiling.cmsJoinSizeEstimate(
      graft.operators.Profiling.cmsCounters(
        t(s, d, "orders"), col("o_custkey"), depth = 4, width = 256),
      graft.operators.Profiling.cmsCounters(
        t(s, d, "customer"), col("c_custkey"), depth = 4, width = 256))
    val exact = t(s, d, "orders").join(t(s, d, "customer"),
        col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)).as("exact_rows"))
    est.crossJoin(broadcast(exact))
      .select(col("est_join_rows"), col("exact_rows"),
        (col("est_join_rows") >= col("exact_rows")).as("over_estimate_only"))
  }

  q("q_sketch_cms",
    // count–min sketch: 4×256 counters over l_partkey via the
    // engine-neutral Carter–Wegman hashes (lower64 + j·upper64, low 8
    // bits), point estimates for part keys 1–10 = min over the 4 rows.
    // Bounded O(d·w) state at ANY key cardinality — the oracle replays
    // every counter and estimate exactly
    """WITH h AS (
      |  SELECT md5_number_lower(CAST(l_partkey AS VARCHAR))::HUGEINT AS lo,
      |         md5_number_upper(CAST(l_partkey AS VARCHAR))::HUGEINT AS hi
      |  FROM lineitem WHERE l_partkey IS NOT NULL),
      |c AS (SELECT j, ((lo + j*hi) % 18446744073709551616::HUGEINT) % 256 AS b,
      |        count(*) AS cnt
      |      FROM h, range(4) t(j) GROUP BY 1, 2),
      |p AS (SELECT CAST(range AS BIGINT) AS probe_key,
      |        md5_number_lower(CAST(range AS VARCHAR))::HUGEINT AS lo,
      |        md5_number_upper(CAST(range AS VARCHAR))::HUGEINT AS hi
      |      FROM range(1, 11)),
      |e AS (SELECT probe_key, j,
      |        ((lo + j*hi) % 18446744073709551616::HUGEINT) % 256 AS b
      |      FROM p, range(4) t(j))
      |SELECT probe_key, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est_cnt
      |FROM e LEFT JOIN c USING (j, b)
      |GROUP BY probe_key ORDER BY probe_key""".stripMargin) { (s, d) =>
    val counters = graft.operators.Profiling.cmsCounters(
      t(s, d, "lineitem"), col("l_partkey"), depth = 4, width = 256)
    val probes = s.range(1, 11).select(col("id").as("probe_key"))
    graft.operators.Profiling.cmsEstimates(
        counters, probes, "probe_key", depth = 4, width = 256)
      .orderBy("probe_key")
  }

  q("q_sketch_kmv_setops",
    // KMV set algebra (Beyer et al. 2007) between order-status segments:
    // each segment's customer set collapses to its k=64 smallest distinct
    // md5 hashes in ONE scan (map-side-merged KmvSketchAgg); union /
    // intersection / Jaccard between every segment pair then compute on
    // the k-sized arrays alone — the merged sketch (k smallest of A∪B) is
    // itself a valid union sketch, and the fraction of it present in both
    // sides estimates Jaccard. Nothing segment-sized ever joins or
    // re-scans: at 100 TB the sketches are KBs per segment and every
    // pairwise overlap question is answered without touching the data
    // again. Engine-neutral like q_agg_approx_distinct_kmv: the oracle
    // replays every hash, the merged sketch, the membership counts, and
    // the one u64→double conversion exactly — this is a HASH-EXACT row,
    // not a tolerance band
    """WITH h AS (
      |  SELECT DISTINCT o_orderstatus AS seg,
      |         md5_number_lower(CAST(o_custkey AS VARCHAR)) AS hv
      |  FROM orders WHERE o_custkey IS NOT NULL),
      |r AS (SELECT seg, hv,
      |        row_number() OVER (PARTITION BY seg ORDER BY hv) AS rn
      |      FROM h),
      |sk AS (SELECT seg, hv FROM r WHERE rn <= 64),
      |segs AS (SELECT DISTINCT seg FROM sk),
      |pairs AS (SELECT a.seg AS sa, b.seg AS sb
      |          FROM segs a JOIN segs b ON a.seg < b.seg),
      |u AS (SELECT p.sa, p.sb, s.hv
      |      FROM pairs p JOIN sk s ON s.seg IN (p.sa, p.sb)
      |      GROUP BY 1, 2, 3),
      |ur AS (SELECT sa, sb, hv,
      |         row_number() OVER (PARTITION BY sa, sb ORDER BY hv) AS rn,
      |         count(*) OVER (PARTITION BY sa, sb) AS un
      |       FROM u),
      |merged AS (SELECT sa, sb, hv, un FROM ur WHERE rn <= 64),
      |flags AS (SELECT m.sa, m.sb, m.hv, m.un,
      |            max(CASE WHEN s.seg = m.sa THEN 1 ELSE 0 END) AS ina,
      |            max(CASE WHEN s.seg = m.sb THEN 1 ELSE 0 END) AS inb
      |          FROM merged m
      |          JOIN sk s ON s.seg IN (m.sa, m.sb) AND s.hv = m.hv
      |          GROUP BY 1, 2, 3, 4),
      |est AS (SELECT sa, sb, max(un) AS un, count(*) AS mk,
      |          CASE WHEN max(un) < 64 THEN CAST(max(un) AS DOUBLE)
      |               ELSE 63 * 18446744073709551616.0 /
      |                    CAST(max(hv) AS DOUBLE) END AS union_est,
      |          sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS nboth
      |        FROM flags GROUP BY 1, 2)
      |SELECT sa AS seg_a, sb AS seg_b,
      |  round(union_est, 4) AS union_est,
      |  round(CAST(nboth AS DOUBLE) * union_est / mk, 4) AS inter_est,
      |  round(CAST(nboth AS DOUBLE) / mk, 4) AS jaccard_est
      |FROM est ORDER BY seg_a, seg_b""".stripMargin) { (s, d) =>
    val k = 64
    val sk = t(s, d, "orders")
      .groupBy(col("o_orderstatus").as("seg"))
      .agg(graft.functions.SketchAggregates.kmvSketch(
        col("o_custkey").cast("string"), k).as("sk"))
    val pairs = sk.select(col("seg").as("seg_a"), col("sk").as("ska"))
      .join(sk.select(col("seg").as("seg_b"), col("sk").as("skb")),
        col("seg_a") < col("seg_b"))
    pairs
      .withColumn("comb", array_sort(array_union(col("ska"), col("skb"))))
      .withColumn("un", size(col("comb")))
      .withColumn("merged", slice(col("comb"), 1, k))
      .withColumn("mk", least(col("un"), lit(k)))
      .withColumn("nboth", size(array_intersect(
        array_intersect(col("merged"), col("ska")), col("skb"))))
      .withColumn("union_est",
        when(col("un") < k, col("un").cast("double"))
          .otherwise(lit(63.0 * 18446744073709551616.0) /
            element_at(col("merged"), k).cast("double")))
      .select(col("seg_a"), col("seg_b"),
        round(col("union_est"), 4).as("union_est"),
        round(col("nboth").cast("double") * col("union_est") / col("mk"), 4)
          .as("inter_est"),
        round(col("nboth").cast("double") / col("mk"), 4).as("jaccard_est"))
      .orderBy("seg_a", "seg_b")
  }

  q("q_events_paths",
    // top user-journey prefixes: first 3 events per user (ts, event_id
    // order) as "a>b>c", counted, top 20. Engine = bounded-heap
    // min-k-rows per user (≤ 3 rows/user/mapper cross the exchange) +
    // TakeOrdered — the oracle's window replays the heap's selection.
    // coalesce sentinel = topPaths' null contract (string_agg would
    // otherwise skip the element, as array_join would)
    """WITH r AS (
      |  SELECT user_id, coalesce(event_type, '(null)') AS event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |      FROM r WHERE rn <= 3 GROUP BY user_id),
      |c AS (SELECT path, count(*) AS n_users FROM p GROUP BY path)
      |SELECT path, n_users FROM c
      |ORDER BY n_users DESC, path LIMIT 20""".stripMargin) { (s, d) =>
    graft.operators.EventAnalytics.topPaths(
      t(s, d, "events"), "user_id", "ts", "event_id", "event_type",
      pathLen = 3, topN = 20)
  }

  q("q_profile_joinstats",
    // pre-join key diagnostics orders.o_custkey ⋈ customer.c_custkey:
    // distinct keys per side, overlap, orphan ROWS per side, worst
    // per-key fanout — the broadcast/salt/bucket decision numbers.
    // Engine collapses each side to its key histogram first; only the
    // histograms (key-cardinality-sized) ever join
    """WITH lh AS (SELECT o_custkey AS k, count(*) AS lc FROM orders GROUP BY 1),
      |rh AS (SELECT c_custkey AS k, count(*) AS rc FROM customer GROUP BY 1),
      |j AS (SELECT lh.k AS lk, lc, rh.k AS rk, rc
      |      FROM lh FULL JOIN rh ON lh.k = rh.k)
      |SELECT CAST(coalesce(sum(lc), 0) AS BIGINT) AS n_left_rows,
      |  count(CASE WHEN lk IS NOT NULL THEN 1 END) AS n_left_keys,
      |  CAST(coalesce(sum(rc), 0) AS BIGINT) AS n_right_rows,
      |  count(CASE WHEN rk IS NOT NULL THEN 1 END) AS n_right_keys,
      |  count(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL THEN 1 END) AS n_common_keys,
      |  CAST(coalesce(sum(CASE WHEN rk IS NULL THEN lc END), 0) AS BIGINT) AS left_orphan_rows,
      |  CAST(coalesce(sum(CASE WHEN lk IS NULL THEN rc END), 0) AS BIGINT) AS right_orphan_rows,
      |  CAST(coalesce(max(lc * rc), 0) AS BIGINT) AS max_key_fanout
      |FROM j""".stripMargin) { (s, d) =>
    graft.operators.Profiling.joinKeyStats(
      t(s, d, "orders"), "o_custkey", t(s, d, "customer"), "c_custkey")
  }

  q("q_agg_mode",
    // statistical mode per group with a deterministic tie-break: the
    // most frequent o_orderpriority per o_orderstatus (ties → smallest
    // priority). Engine = two keyed aggs — count, then min(struct(-cnt,
    // mode)) — never a per-group window sort; the oracle's row_number
    // replays exactly that ordering
    """WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
      |           FROM orders GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
      |        ORDER BY cnt DESC, o_orderpriority) AS rn FROM c)
      |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
      |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("o_orderstatus")
      .agg(min(struct((-col("cnt")).as("nc"),
        col("o_orderpriority").as("m"))).as("_b"))
      .select(col("o_orderstatus"), col("_b.m").as("mode_priority"),
        (-col("_b.nc")).as("cnt"))
      .orderBy("o_orderstatus")
  }

  q("q_join_bucketed",
    // co-located join evidence: orders and customer persisted BUCKETED
    // by their join key (8 buckets, sorted) so the join needs NO
    // exchange on either side — the 100 TB repeated-join mechanism
    // (pay the shuffle once at write time). The oracle replays on the
    // flat fixture (same rows by definition); PlanQualitySpec asserts
    // the exchange-free sort-merge plan on this exact query
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  count(DISTINCT c_custkey) AS n_customers
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val (o, c) = bucketedOrdersCustomer(s, d)
    o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  q("q_graph_triangles",
    // triangle statistics over the part co-purchase graph via exact
    // counting on a DETERMINISTIC node sample (keep parts ≡ 0 mod 4):
    // each triangle survives with (1/4)³, so est_total = 64 × count is
    // the standard unbiased sparsified estimator — the scale practice
    // for a graph whose full wedge set grows ~degree² (measured: exact
    // full-graph 27.5 s at sf0.1 / 1139 s at sf5; sampled ~64× cheaper,
    // same operator). Engine = degree-ordered edge iterator: orient
    // low→high (degree, node), wedges from out-pairs (O(m^1.5) at ANY
    // skew), close against the undirected set. The oracle replays the
    // sample and counts the textbook u<v<w way
    """WITH pairs AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0),
      |nodes AS (SELECT count(DISTINCT n) AS n_nodes FROM
      |  (SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs)),
      |tri AS (SELECT count(*) AS n_triangles
      |        FROM pairs e1 JOIN pairs e2 ON e2.u = e1.u AND e2.v > e1.v
      |        JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v)
      |SELECT n_nodes, (SELECT count(*) FROM pairs) AS n_edges, n_triangles,
      |  64 * n_triangles AS est_total
      |FROM nodes, tri""".stripMargin) { (s, d) =>
    val li = t(s, d, "lineitem")
      .filter(col("l_partkey") % 4 === 0)
      .select("l_orderkey", "l_partkey")
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
    val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pb"))
    val edges = a.join(b, Seq("ok")).filter(col("pa") < col("pb"))
      .select("pa", "pb")
    graft.operators.LinkGraph.triangleCount(edges, "pa", "pb")
      .withColumn("est_total", col("n_triangles") * 64)
  }

  q("q_graph_jaccard",
    // common-neighbor Jaccard link prediction (Liben-Nowell & Kleinberg
    // 2003) over the supplier—part bipartite graph: suppliers are
    // similar when they ship the same parts. Engine = inverted-index
    // wedge self-join grouped by the shared part — NEVER an all-pairs
    // supplier scan — with hub parts (degree > 200) dropped BEFORE the
    // join, the dedup family's hot-shingle df cap: a part shared by d
    // suppliers costs d² wedge rows and carries ~no signal. Degrees and
    // the union denominator count over the SAME capped universe, so the
    // result is exact-by-definition and fully replayable
    """WITH e AS (
      |  SELECT DISTINCT l_suppkey AS n, l_partkey AS nbr FROM lineitem
      |  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
      |keep AS (SELECT nbr FROM e GROUP BY nbr HAVING count(*) <= 200),
      |k AS (SELECT e.n, e.nbr FROM e JOIN keep USING (nbr)),
      |deg AS (SELECT n, count(*) AS deg FROM k GROUP BY n),
      |c AS (SELECT a.n AS sa, b.n AS sb, count(*) AS n_common
      |      FROM k a JOIN k b USING (nbr) WHERE a.n < b.n
      |      GROUP BY 1, 2 HAVING count(*) >= 2),
      |j AS (SELECT sa, sb, n_common,
      |        da.deg + db.deg - n_common AS n_union,
      |        CAST(n_common AS DOUBLE) / (da.deg + db.deg - n_common) AS jac
      |      FROM c JOIN deg da ON sa = da.n JOIN deg db ON sb = db.n)
      |SELECT sa AS supp_a, sb AS supp_b, n_common, n_union,
      |  round(jac, 6) AS jaccard
      |FROM j ORDER BY jac DESC, supp_a, supp_b LIMIT 20""".stripMargin) { (s, d) =>
    graft.operators.LinkGraph.jaccardNeighbors(
        t(s, d, "lineitem"), "l_suppkey", "l_partkey",
        maxNeighborDegree = 200, minCommon = 2)
      .orderBy(col("jaccard").desc, col("node_a"), col("node_b"))
      .limit(20)
      .select(col("node_a").as("supp_a"), col("node_b").as("supp_b"),
        col("n_common"), col("n_union"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  q("q_graph_jaccard_topk",
    // the 100 TB-bounded form of q_graph_jaccard: each canonical left
    // supplier keeps its k=5 best pairs, so output is <= k·|suppliers|
    // whatever the similarity-graph density. Engine = ONE bounded-heap
    // aggregate (MinKByAgg, map-side partial: <= k rows per node per
    // mapper reach the shuffle) over the same capped wedge pairs; the
    // oracle replays the selection as the window it is semantically
    // equivalent to — ranking key is an exact IEEE division of integer
    // counts, so the order replays bit-equally
    """WITH e AS (
      |  SELECT DISTINCT l_suppkey AS n, l_partkey AS nbr FROM lineitem
      |  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
      |keep AS (SELECT nbr FROM e GROUP BY nbr HAVING count(*) <= 200),
      |k AS (SELECT e.n, e.nbr FROM e JOIN keep USING (nbr)),
      |deg AS (SELECT n, count(*) AS deg FROM k GROUP BY n),
      |c AS (SELECT a.n AS sa, b.n AS sb, count(*) AS n_common
      |      FROM k a JOIN k b USING (nbr) WHERE a.n < b.n
      |      GROUP BY 1, 2 HAVING count(*) >= 2),
      |j AS (SELECT sa, sb, n_common,
      |        da.deg + db.deg - n_common AS n_union,
      |        CAST(n_common AS DOUBLE) / (da.deg + db.deg - n_common) AS jac
      |      FROM c JOIN deg da ON sa = da.n JOIN deg db ON sb = db.n),
      |r AS (SELECT sa, sb, n_common, n_union, jac,
      |        row_number() OVER (PARTITION BY sa ORDER BY jac DESC, sb) AS rk
      |      FROM j)
      |SELECT sa AS supp_a, rk AS rank, sb AS supp_b, n_common, n_union,
      |  round(jac, 6) AS jaccard
      |FROM r WHERE rk <= 5 ORDER BY supp_a, rank""".stripMargin) { (s, d) =>
    graft.operators.LinkGraph.jaccardNeighborsTopK(
        t(s, d, "lineitem"), "l_suppkey", "l_partkey",
        maxNeighborDegree = 200, minCommon = 2, k = 5)
      .select(col("node_a").as("supp_a"), col("rank"),
        col("node_b").as("supp_b"), col("n_common"), col("n_union"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy("supp_a", "rank")
  }

  q("q_stat_assoc",
    // pair association rules over order baskets (Apriori's workhorse
    // surface): support >= 2 orders (the fixture's basket keys repeat a
    // pair at most a handful of times even at sf1 — measured max 2
    // there), directional confidence P(b|a), symmetric lift.
    // The pair generator self-joins on the BASKET key,
    // so each order contributes C(|basket|,2) rows — bounded by basket
    // size, never by catalog size; all metrics are integer counts + two
    // IEEE divisions, replayed exactly
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem
      |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      |nb AS (SELECT count(DISTINCT bk) AS n FROM items),
      |ic AS (SELECT i, count(*) AS ci FROM items GROUP BY 1),
      |p AS (SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_both
      |      FROM items a JOIN items b USING (bk) WHERE a.i < b.i
      |      GROUP BY 1, 2 HAVING count(*) >= 2),
      |r AS (SELECT item_a, item_b, n_both,
      |        CAST(n_both AS DOUBLE) / ca.ci AS conf,
      |        CAST(n_both AS DOUBLE) * nb.n / (ca.ci * cb.ci) AS lift
      |      FROM p JOIN ic ca ON item_a = ca.i
      |      JOIN ic cb ON item_b = cb.i CROSS JOIN nb)
      |SELECT item_a, item_b, n_both,
      |  round(conf, 6) AS conf_a_to_b, round(lift, 6) AS lift
      |FROM r ORDER BY lift DESC, item_a, item_b LIMIT 20""".stripMargin) { (s, d) =>
    graft.operators.MarketBasket.pairRules(
        t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2)
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(20)
      .select(col("item_a"), col("item_b"), col("n_both"),
        round(col("conf_a_to_b"), 6).as("conf_a_to_b"),
        round(col("lift"), 6).as("lift"))
  }

  q("q_rec_items",
    // item-item collaborative filtering ("customers who bought X also
    // bought", Linden et al. 2003): each part's top-3 co-purchase
    // partners by lift over the q_stat_assoc rule set. The per-item cut
    // is the MinKByAgg bounded heap on (-lift, partner) — never a window
    // over the full rule set; the oracle's per-item window replays the
    // heap's total order exactly
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem
      |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      |nb AS (SELECT count(DISTINCT bk) AS n FROM items),
      |ic AS (SELECT i, count(*) AS ci FROM items GROUP BY 1),
      |p AS (SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_both
      |      FROM items a JOIN items b USING (bk) WHERE a.i < b.i
      |      GROUP BY 1, 2 HAVING count(*) >= 2),
      |r AS (SELECT item_a, item_b, n_both,
      |        CAST(n_both AS DOUBLE) * nb.n / (ca.ci * cb.ci) AS lift
      |      FROM p JOIN ic ca ON item_a = ca.i
      |      JOIN ic cb ON item_b = cb.i CROSS JOIN nb),
      |d AS (SELECT item_a AS item, item_b AS rec_item, n_both, lift FROM r
      |      UNION ALL
      |      SELECT item_b, item_a, n_both, lift FROM r),
      |t AS (SELECT item, rec_item, n_both, lift,
      |        row_number() OVER (PARTITION BY item
      |          ORDER BY lift DESC, rec_item) AS rk
      |      FROM d)
      |SELECT item, CAST(rk AS BIGINT) AS rk, rec_item, n_both,
      |  round(lift, 6) AS lift
      |FROM t WHERE rk <= 3 ORDER BY item, rk""".stripMargin) { (s, d) =>
    graft.operators.MarketBasket.itemRecommendations(
        t(s, d, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 2, topN = 3)
      .withColumn("lift", round(col("lift"), 6))
      .orderBy("item", "rk")
  }

  q("q_sketch_hist_merge",
    // histogram-sketch MERGEABILITY as a driver-visible query: per-shard
    // bin counters (o_custkey%4 shards) merged by per-bin addition, then
    // the first-bin-reaching-p·total quantile rule. The oracle computes
    // the UNSHARDED histogram directly — hash equality proves
    // merge(shard counters) == global counters, the IncrementalAgg
    // contract applied to quantile sketches
    """WITH h AS (
      |  SELECT CAST(floor(CAST(o_totalprice AS DOUBLE) / 10000) AS BIGINT) AS hb,
      |         count(*) AS hn
      |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
      |c AS (SELECT hb, hn,
      |        sum(hn) OVER (ORDER BY hb) AS hcum,
      |        sum(hn) OVER () AS htot
      |      FROM h)
      |SELECT
      |  min(CASE WHEN CAST(hcum AS DOUBLE) >= htot * 0.5 THEN (hb + 1) * 10000.0 END) AS p50,
      |  min(CASE WHEN CAST(hcum AS DOUBLE) >= htot * 0.9 THEN (hb + 1) * 10000.0 END) AS p90,
      |  min(CASE WHEN CAST(hcum AS DOUBLE) >= htot * 0.99 THEN (hb + 1) * 10000.0 END) AS p99
      |FROM c""".stripMargin) { (s, d) =>
    graft.operators.Sampling.mergedHistogramQuantiles(
      t(s, d, "orders"), col("o_custkey") % 4, "o_totalprice",
      binWidth = 10000.0, probs = Seq(0.5, 0.9, 0.99))
  }

  q("q_stat_ks",
    // two-sample Kolmogorov–Smirnov over o_totalprice between the 'O'
    // and 'F' order populations — the whole-distribution drift monitor
    // (embed_drift = per-dim means, vocab_drift = head terms, this =
    // any shape change). Engine: each side collapses to its value
    // histogram, then running CDFs via the Packing two-phase prefix sum
    // — never a global single-task window. D and its location are
    // integer-count arithmetic + one fixed double expression
    """WITH av AS (SELECT CAST(o_totalprice AS DOUBLE) AS v, count(*) AS ca
      |            FROM orders WHERE o_orderstatus = 'O' AND o_totalprice IS NOT NULL
      |            GROUP BY 1),
      |bv AS (SELECT CAST(o_totalprice AS DOUBLE) AS v, count(*) AS cb
      |       FROM orders WHERE o_orderstatus = 'F' AND o_totalprice IS NOT NULL
      |       GROUP BY 1),
      |m AS (SELECT v, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
      |      FROM av FULL JOIN bv USING (v)),
      |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM m),
      |c AS (SELECT v,
      |        sum(ca) OVER (ORDER BY v) AS cuma,
      |        sum(cb) OVER (ORDER BY v) AS cumb
      |      FROM m),
      |d AS (SELECT v,
      |        abs(CAST(cuma AS DOUBLE) / t.na - CAST(cumb AS DOUBLE) / t.nb) AS dd
      |      FROM c CROSS JOIN t),
      |mx AS (SELECT max(dd) AS dmax FROM d)
      |SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
      |  round(mx.dmax, 6) AS d_stat,
      |  (SELECT min(v) FROM d WHERE dd = mx.dmax) AS d_at
      |FROM t CROSS JOIN mx""".stripMargin) { (s, d) =>
    val orders = t(s, d, "orders")
    graft.operators.Profiling.ksTwoSample(
      orders.filter(col("o_orderstatus") === "O"),
      orders.filter(col("o_orderstatus") === "F"),
      "o_totalprice")
  }

  q("q_stat_chisq",
    // chi-square independence test lang × source over documents: the
    // full expected grid (zero-observed cells contribute), statistic
    // summed through the VARCHAR→DECIMAL bridge so the per-cell double
    // contributions add order-independently in both engines
    """WITH obs AS (SELECT lang AS a, source AS b, count(*) AS o
      |             FROM documents GROUP BY 1, 2),
      |ra AS (SELECT a, sum(o) AS ra FROM obs GROUP BY 1),
      |cb AS (SELECT b, sum(o) AS cb FROM obs GROUP BY 1),
      |tot AS (SELECT sum(o) AS t FROM obs),
      |grid AS (SELECT ra.a, cb.b, ra.ra, cb.cb, tot.t FROM ra, cb, tot),
      |j AS (SELECT g.*, coalesce(obs.o, 0) AS o
      |      FROM grid g LEFT JOIN obs USING (a, b)),
      |c AS (SELECT t, a, b,
      |        (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * cb / t)
      |          * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * cb / t)
      |          / (CAST(ra AS DOUBLE) * cb / t) AS contrib
      |      FROM j)
      |SELECT CAST(max(t) AS BIGINT) AS n,
      |  CAST((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS BIGINT) AS dof,
      |  CAST(round(sum(CAST(CAST(contrib AS VARCHAR) AS DECIMAL(38,18))), 6) AS DOUBLE) AS chi2
      |FROM c""".stripMargin) { (s, d) =>
    graft.operators.Profiling.chiSquare(t(s, d, "documents"), "lang", "source")
  }

  q("q_stat_trend",
    // per-group OLS trend fit (Profiling.trendFit): slope/intercept/R² of
    // order value over days-since-epoch-start, per priority class — the
    // "which way is this metric drifting" companion to q_stat_ks. Engine
    // shape: exact DECIMAL co-moment sums (order-independent), ONE double
    // conversion per sum, then a fixed-order IEEE closed-form chain the
    // oracle writes identically — bit-equal with NO rounding, which is
    // the point being proven. regr_slope/regr_covar were deliberately
    // NOT used: their streaming-update accumulation order differs per
    // engine in the last ulp.
    """WITH r AS (
      |  SELECT o_orderpriority,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS DECIMAL(12,2)) AS x,
      |    CAST(o_totalprice AS DECIMAL(19,4)) AS y
      |  FROM orders WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
      |s AS (
      |  SELECT o_orderpriority, count(*) AS n,
      |    CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(sum(x * y) AS VARCHAR) AS DOUBLE) AS sxy,
      |    CAST(CAST(sum(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(sum(y * y) AS VARCHAR) AS DOUBLE) AS syy,
      |    min(x) AS xmn, max(x) AS xmx, min(y) AS ymn, max(y) AS ymx
      |  FROM r GROUP BY o_orderpriority),
      |m AS (
      |  SELECT o_orderpriority, n,
      |    CAST(n AS DOUBLE) * sxy - sx * sy AS cnum,
      |    CAST(n AS DOUBLE) * sxx - sx * sx AS denx,
      |    CAST(n AS DOUBLE) * syy - sy * sy AS deny,
      |    sx, sy, xmn, xmx, ymn, ymx
      |  FROM s)
      |SELECT o_orderpriority, n,
      |  CASE WHEN xmn = xmx OR denx = 0 THEN NULL ELSE cnum / denx END AS slope,
      |  CASE WHEN xmn = xmx OR denx = 0 THEN NULL
      |       ELSE (sy - (cnum / denx) * sx) / CAST(n AS DOUBLE) END AS intercept,
      |  CASE WHEN xmn = xmx OR denx = 0 OR ymn = ymx OR deny = 0 THEN NULL
      |       ELSE (cnum * cnum) / (denx * deny) END AS r2
      |FROM m ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    graft.operators.Profiling.trendFit(
        t(s, d, "orders").withColumn("_day",
          datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))),
        Seq("o_orderpriority"), "_day", "o_totalprice")
      .orderBy("o_orderpriority")
  }

  q("q_profile_histogram",
    // 10-bin equi-width histogram of o_totalprice (the ANALYZE-histogram
    // distribution profile): exact [min,max] envelope broadcast, one
    // map-side binning pass, nBins-sized aggregate. Bin assignment and
    // edges are ONE fixed double expression replayed verbatim — floor of
    // the same IEEE division lands in the same bin in both engines
    """WITH mm AS (
      |  SELECT min(CAST(o_totalprice AS DOUBLE)) AS mn,
      |         max(CAST(o_totalprice AS DOUBLE)) AS mx
      |  FROM orders WHERE o_totalprice IS NOT NULL),
      |b AS (
      |  SELECT CASE WHEN mx = mn THEN 0
      |         ELSE least(CAST(floor((CAST(o_totalprice AS DOUBLE) - mn)
      |                / ((mx - mn) / 10)) AS BIGINT), 9) END AS bin,
      |    mn, mx
      |  FROM orders, mm WHERE o_totalprice IS NOT NULL)
      |SELECT bin,
      |  round(mn + bin * ((mx - mn) / 10), 4) AS lo,
      |  round(mn + (bin + 1) * ((mx - mn) / 10), 4) AS hi,
      |  count(*) AS n
      |FROM b GROUP BY bin, mn, mx ORDER BY bin""".stripMargin) { (s, d) =>
    graft.operators.Profiling.histogramEquiWidth(
        t(s, d, "orders"), "o_totalprice", nBins = 10)
      .orderBy("bin")
  }

  q("q_profile_outliers",
    // per-group Tukey-fence outlier profile on o_totalprice: type-1
    // (discrete) quartiles — DATA values at rank ceil(p·n), never an
    // interpolated double — so fences are exact arithmetic on exact
    // inputs and the boundary comparisons replay bit-equal
    """WITH v AS (SELECT o_orderstatus AS grp, CAST(o_totalprice AS DOUBLE) AS v
      |           FROM orders WHERE o_totalprice IS NOT NULL),
      |r AS (SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
      |        count(*) OVER (PARTITION BY grp) AS n FROM v),
      |q AS (SELECT grp, max(n) AS n,
      |        min(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN v END) AS q1,
      |        min(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN v END) AS q3
      |      FROM r GROUP BY grp),
      |f AS (SELECT grp, n, q1, q3,
      |        q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM q)
      |SELECT f.grp, CAST(f.n AS BIGINT) AS n, f.q1, f.q3,
      |  CAST(coalesce(sum(CASE WHEN v.v < f.lo THEN 1 END), 0) AS BIGINT) AS n_low,
      |  CAST(coalesce(sum(CASE WHEN v.v > f.hi THEN 1 END), 0) AS BIGINT) AS n_high
      |FROM f JOIN v ON v.grp IS NOT DISTINCT FROM f.grp
      |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin) { (s, d) =>
    graft.operators.Profiling.iqrOutliers(
        t(s, d, "orders"), "o_totalprice", "o_orderstatus")
      .orderBy("grp")
  }

  q("q_profile_outliers_mad",
    // robust (MAD) outlier profile — the Iglewicz–Hoaglin modified
    // z-score with TYPE-1 medians, so every fence input is a data value
    // (or an exact difference of two) and the strict-inequality cut
    // replays bit-equal; tolerates 50% contamination vs Tukey's 25%
    """WITH v AS (SELECT o_orderstatus AS grp, CAST(o_totalprice AS DOUBLE) AS v
      |           FROM orders WHERE o_totalprice IS NOT NULL),
      |rv AS (SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
      |         count(*) OVER (PARTITION BY grp) AS n FROM v),
      |med AS (SELECT grp, min(v) AS med, max(n) AS n FROM rv
      |        WHERE rn = CAST(ceil(n * 0.5) AS BIGINT) GROUP BY grp),
      |dv AS (SELECT v.grp, v.v, abs(v.v - m.med) AS d, m.med, m.n
      |       FROM v JOIN med m ON v.grp IS NOT DISTINCT FROM m.grp),
      |rd AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY d, v) AS rn
      |       FROM dv),
      |mad AS (SELECT grp, min(d) AS mad FROM rd
      |        WHERE rn = CAST(ceil(n * 0.5) AS BIGINT) GROUP BY grp)
      |SELECT dv.grp, CAST(max(dv.n) AS BIGINT) AS n,
      |  max(dv.med) AS med, max(t.mad) AS mad,
      |  CAST(coalesce(sum(CASE WHEN CAST(0.6745 AS DOUBLE) * dv.d >
      |    CAST(3.5 AS DOUBLE) * t.mad THEN 1 END), 0) AS BIGINT) AS n_outliers
      |FROM dv JOIN mad t ON dv.grp IS NOT DISTINCT FROM t.grp
      |GROUP BY dv.grp ORDER BY dv.grp""".stripMargin) { (s, d) =>
    graft.operators.Profiling.madOutliers(
        t(s, d, "orders"), "o_totalprice", "o_orderstatus", zCut = 3.5)
      .orderBy("grp")
  }

  q("q_join_nullsafe",
    // null-safe (<=>) equi-join: derived null keys on BOTH sides so the
    // null<=>null branch carries real rows at every sf. Stays a hash/SMJ
    // equi-join (null-safe equality is a join key, not a theta filter)
    """WITH l AS (SELECT o_orderkey,
      |    CASE WHEN o_custkey % 997 = 0 THEN NULL ELSE o_custkey END AS lk
      |  FROM orders),
      |r AS (SELECT c_custkey,
      |    CASE WHEN c_custkey % 499 = 0 THEN NULL ELSE c_custkey END AS rk
      |  FROM customer)
      |SELECT count(*) AS n_pairs,
      |  CAST(coalesce(sum(CASE WHEN lk IS NULL THEN 1 END), 0) AS BIGINT) AS n_null_pairs,
      |  count(DISTINCT rk) AS n_keys_matched
      |FROM l JOIN r ON l.lk IS NOT DISTINCT FROM r.rk""".stripMargin) { (s, d) =>
    val l = t(s, d, "orders").select(col("o_orderkey"),
      when(col("o_custkey") % 997 === 0, lit(null)).otherwise(col("o_custkey")).as("lk"))
    val r = t(s, d, "customer").select(col("c_custkey"),
      when(col("c_custkey") % 499 === 0, lit(null)).otherwise(col("c_custkey")).as("rk"))
    l.join(r, col("lk") <=> col("rk"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("lk").isNull, 1L).otherwise(0L)).as("n_null_pairs"),
        countDistinct(col("rk")).as("n_keys_matched"))
  }

  q("q_text_tfidf_pairs",
    // sparse TF-IDF cosine near-dup pairs (the lexical complement of
    // q_dedup_embed): vectors over terms with df ≤ 100 (hot terms carry
    // ~zero idf and would square the inverted self-join), dot over
    // shared terms, full norms. ln → irrational scores, 6-dp round
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |len AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1 HAVING count(*) <= 100),
      |w AS (SELECT tf.doc_id, tf.term,
      |        CAST(tf.tf AS DOUBLE) / len.len *
      |          ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df.df) AS w
      |      FROM tf JOIN df USING (term) JOIN len USING (doc_id)),
      |norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
      |dot AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
      |        FROM w a JOIN w b USING (term)
      |        WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
      |FROM dot JOIN norms na ON id_a = na.doc_id JOIN norms nb ON id_b = nb.doc_id
      |WHERE dot / (na.nrm * nb.nrm) >= 0.6
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    graft.operators.TextAnalysis.tfIdfCosinePairs(
        t(s, d, "documents"), "doc_id", "text",
        threshold = 0.6, maxTermDf = 100L)
      .withColumn("cosine", round(col("cosine"), 6))
      .orderBy("id_a", "id_b")
  }

  // --- retrieval fusion (EXTENSION §2.K: Retrieval.scala) -------------------

  // reciprocal-rank fusion of the BM25 lexical ranking (probe term =
  // highest-df term >= 6 chars over the corpus minus the probe doc)
  // and the dense cosine ranking vs probe vec_id=0. Ranks are
  // integers; the fused score is exactly two IEEE divisions added in
  // fixed order, so it replays bit-identically with no rounding.
  // Shared by the scan and indexed forms: the index is an execution
  // layout, not a semantics change, so BOTH hash against the same
  // full from-raw-documents replay — a stale or mis-bucketed index
  // fails the indexed form's hash exactly as q_text_bm25_indexed does.
  private val hybridRrfOracleSql: String =
    """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id <> 0),
      |toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
      |  FROM corpus),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |consts AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      |probes AS (
      |  SELECT term, df FROM dft WHERE length(term) >= 6
      |  ORDER BY df DESC, term LIMIT 1),
      |scored AS (
      |  SELECT tf.doc_id,
      |    ln(1.0 + (CAST(c.n_docs AS DOUBLE) - p.df + 0.5) / (CAST(p.df AS DOUBLE) + 0.5))
      |      * (CAST(tf.tf AS DOUBLE) * 2.2)
      |      / (CAST(tf.tf AS DOUBLE) + 1.2 *
      |         (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) *
      |          (CAST(c.n_docs AS DOUBLE) / CAST(c.sum_dl AS DOUBLE)))) AS score
      |  FROM tf JOIN probes p USING (term) JOIN dl USING (doc_id) CROSS JOIN consts c),
      |lex AS (
      |  SELECT doc_id, lex_rk FROM (
      |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rk
      |    FROM scored) WHERE lex_rk <= 20),
      |vecs AS (
      |  SELECT vec_id AS doc_id,
      |    round(list_cosine_similarity(embedding::DOUBLE[],
      |      (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS cos
      |  FROM embeddings WHERE vec_id <> 0),
      |vrank AS (
      |  SELECT doc_id, vec_rk FROM (
      |    SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS vec_rk
      |    FROM vecs) WHERE vec_rk <= 20)
      |SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.lex_rk, v.vec_rk,
      |  coalesce(1.0::DOUBLE / (60.0::DOUBLE + lex_rk), 0.0::DOUBLE) +
      |  coalesce(1.0::DOUBLE / (60.0::DOUBLE + vec_rk), 0.0::DOUBLE) AS rrf
      |FROM lex l FULL OUTER JOIN vrank v ON l.doc_id = v.doc_id
      |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin

  q("q_search_hybrid_rrf", hybridRrfOracleSql) { (s, d) =>
    graft.operators.Retrieval.hybridRrf(
        t(s, d, "documents"), "doc_id", "text",
        t(s, d, "embeddings"), "vec_id", "embedding",
        probeId = 0L, minTermLen = 6, k1 = 1.2, b = 0.75,
        poolK = 20, rrfK = 60, topK = 10)
      .orderBy(col("rrf").desc, col("doc_id"))
  }

  /** Inverted index over corpus-minus-probe (the scan form's exclusion
    * rule, baked in at build time): the lexical ranker becomes nTerms
    * partition-pruned point lookups, which is what makes interactive
    * fusion viable at corpus scale. */
  private def hybridTextIndexPath(s: SparkSession, d: String): String =
    annIndexPath(s, d, "hyb") { p =>
      graft.operators.TextAnalysis.buildTextIndex(
        t(s, d, "documents").filter(col("doc_id") =!= 0L),
        "doc_id", "text", p, nBuckets = 64)
    }

  q("q_search_hybrid_rrf_indexed", hybridRrfOracleSql) { (s, d) =>
    graft.operators.Retrieval.hybridRrfIndexed(
        s, hybridTextIndexPath(s, d),
        t(s, d, "embeddings"), "vec_id", "embedding",
        probeId = 0L, minTermLen = 6, k1 = 1.2, b = 0.75,
        poolK = 20, rrfK = 60, topK = 10)
      .orderBy(col("rrf").desc, col("doc_id"))
  }

  /** MMR greedy-selection oracle: each step k unrolls as
    * candidate-score → argmax-pick → selected-set CTEs (the
    * [[graft.operators.ClassifierTrain]] unrolled-oracle discipline).
    * λ and (1−λ) interpolate as full-precision double literals — the
    * Scala-side `1.0 - 0.7` is 0.30000000000000004, and writing `0.3`
    * in the SQL would diverge in the 17th digit and flip near-ties. */
  private def mmrOracleSql(lambda: Double, poolK: Int, topK: Int): String = {
    val lam = s"${lambda}::DOUBLE"
    val oneMinus = s"${1.0 - lambda}::DOUBLE"
    val head =
      s"""WITH pool0 AS (
         |  SELECT vec_id AS doc_id, embedding::DOUBLE[] AS vec,
         |    round(list_cosine_similarity(embedding::DOUBLE[],
         |      (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS rel
         |  FROM embeddings WHERE vec_id <> 0),
         |pool AS (
         |  SELECT doc_id, vec, rel FROM (
         |    SELECT *, row_number() OVER (ORDER BY rel DESC, doc_id) AS prk
         |    FROM pool0) WHERE prk <= $poolK),
         |sims AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b,
         |    round(list_cosine_similarity(a.vec, b.vec), 6) AS sim
         |  FROM pool a JOIN pool b ON a.doc_id <> b.doc_id),
         |pick1 AS (
         |  SELECT doc_id, $lam * rel AS mmr FROM pool
         |  ORDER BY $lam * rel DESC, doc_id LIMIT 1),
         |sel1 AS (SELECT 1::BIGINT AS rk, doc_id, mmr FROM pick1)""".stripMargin
    val steps = (2 to topK).map { k =>
      s"""cand$k AS (
         |  SELECT p.doc_id,
         |    $lam * p.rel - $oneMinus * (
         |      SELECT max(s.sim) FROM sims s
         |      WHERE s.a = p.doc_id
         |        AND s.b IN (SELECT doc_id FROM sel${k - 1})) AS mmr
         |  FROM pool p
         |  WHERE p.doc_id NOT IN (SELECT doc_id FROM sel${k - 1})),
         |pick$k AS (SELECT doc_id, mmr FROM cand$k ORDER BY mmr DESC, doc_id LIMIT 1),
         |sel$k AS (SELECT * FROM sel${k - 1}
         |  UNION ALL SELECT $k::BIGINT, doc_id, mmr FROM pick$k)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT rk, doc_id, mmr FROM sel$topK ORDER BY rk"
  }

  q("q_search_prf",
    // pseudo-relevance-feedback expansion (Rocchio): per seed term (the
    // 2 top-df terms, the q_text_bm25 derivation), take the BM25 top-5
    // as pseudo-relevant, mine the 3 strongest co-occurring terms
    // (Σ tf·idf, decimal-bridged), re-score the corpus with seed@1.0 +
    // expansions@0.5 and keep the top 10. Per-(seed,doc) contributions
    // sum through DECIMAL(38,18) so fused scores are order-independent;
    // final ordering compares the SAME one-step-rounded double in both
    // engines (VARCHAR bridge on the oracle side, q_tpch1 lesson)
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |consts AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      |seeds AS (
      |  SELECT term, df FROM dft WHERE length(term) >= 6
      |  ORDER BY df DESC, term LIMIT 2),
      |s1 AS (
      |  SELECT p.term AS seed, tf.doc_id,
      |    ln(1.0 + (CAST(c.n_docs AS DOUBLE) - p.df + 0.5) / (CAST(p.df AS DOUBLE) + 0.5))
      |      * (CAST(tf.tf AS DOUBLE) * 2.2)
      |      / (CAST(tf.tf AS DOUBLE) + 1.2 *
      |         (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) *
      |          (CAST(c.n_docs AS DOUBLE) / CAST(c.sum_dl AS DOUBLE)))) AS score
      |  FROM tf JOIN seeds p USING (term) JOIN dl USING (doc_id) CROSS JOIN consts c),
      |fb AS (SELECT seed, doc_id FROM (
      |    SELECT seed, doc_id,
      |      row_number() OVER (PARTITION BY seed ORDER BY score DESC, doc_id) AS rn
      |    FROM s1) WHERE rn <= 5),
      |cw AS (
      |  SELECT f.seed, tf.term,
      |    sum(CAST(CAST(tf.tf * ln(1.0 + (CAST(c.n_docs AS DOUBLE) - d.df + 0.5)
      |      / (CAST(d.df AS DOUBLE) + 0.5)) AS VARCHAR) AS DECIMAL(38,18))) AS w
      |  FROM fb f JOIN tf ON tf.doc_id = f.doc_id
      |  JOIN dft d ON d.term = tf.term CROSS JOIN consts c
      |  WHERE length(tf.term) >= 6 AND tf.term <> f.seed
      |  GROUP BY 1, 2),
      |expd AS (
      |  SELECT seed, term, CAST(0.5 AS DOUBLE) AS wt FROM (
      |    SELECT seed, term,
      |      row_number() OVER (PARTITION BY seed ORDER BY w DESC, term) AS rn
      |    FROM cw) WHERE rn <= 3
      |  UNION ALL SELECT term AS seed, term, CAST(1.0 AS DOUBLE) AS wt FROM seeds),
      |fs AS (
      |  SELECT e.seed, tf.doc_id,
      |    sum(CAST(CAST(e.wt *
      |      (ln(1.0 + (CAST(c.n_docs AS DOUBLE) - d.df + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
      |       * (CAST(tf.tf AS DOUBLE) * 2.2)
      |       / (CAST(tf.tf AS DOUBLE) + 1.2 *
      |          (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) *
      |           (CAST(c.n_docs AS DOUBLE) / CAST(c.sum_dl AS DOUBLE)))))
      |      AS VARCHAR) AS DECIMAL(38,18))) AS fscore
      |  FROM tf JOIN expd e ON e.term = tf.term
      |  JOIN dft d ON d.term = tf.term
      |  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN consts c
      |  GROUP BY 1, 2),
      |top AS (
      |  SELECT seed, doc_id,
      |    CAST(CAST(fscore AS VARCHAR) AS DOUBLE) AS fd,
      |    row_number() OVER (PARTITION BY seed
      |      ORDER BY CAST(CAST(fscore AS VARCHAR) AS DOUBLE) DESC, doc_id) AS rk
      |  FROM fs)
      |SELECT seed AS seed_term, CAST(rk AS BIGINT) AS rk, doc_id,
      |  round(fd, 6) AS score
      |FROM top WHERE rk <= 10 ORDER BY seed_term, rk""".stripMargin) { (s, d) =>
    graft.operators.Retrieval.prfSearch(
        t(s, d, "documents"), "doc_id", "text",
        nSeeds = 2, minTermLen = 6, fbDocs = 5, nExpand = 3,
        beta = 0.5, k1 = 1.2, b = 0.75, topK = 10)
      .orderBy("seed_term", "rk")
  }

  q("q_search_mmr", mmrOracleSql(lambda = 0.7, poolK = 20, topK = 5)) { (s, d) =>
    graft.operators.Retrieval.mmrRerank(
        t(s, d, "embeddings"), "vec_id", "embedding",
        probeId = 0L, lambda = 0.7, poolK = 20, topK = 5)
      .orderBy("rk")
  }

  q("q_search_eval", {
    // retrieval-quality audit: precision@10 + MRR of the lexical,
    // IVF-approx, and RRF-fused rankings vs the EXACT dense top-10
    // (the recall_report ground-truth convention). Every metric is
    // integers + ONE IEEE division (hits/10, 1/first-hit-rank) — no
    // float sums, no rounding, bit-exact across engines. The ivf and
    // rrf rankings nest their registered oracles verbatim, so this
    // audit inherits their full replays.
    val brute =
      """SELECT b.vec_id AS doc_id FROM embeddings b WHERE b.vec_id <> 0
        |  ORDER BY round(list_cosine_similarity(b.embedding::DOUBLE[],
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) DESC, b.vec_id
        |  LIMIT 10""".stripMargin
    val lex =
      """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id <> 0),
        |toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
        |  FROM corpus),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |consts AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        |probes AS (
        |  SELECT term, df FROM dft WHERE length(term) >= 6
        |  ORDER BY df DESC, term LIMIT 1),
        |scored AS (
        |  SELECT tf.doc_id,
        |    ln(1.0 + (CAST(c.n_docs AS DOUBLE) - p.df + 0.5) / (CAST(p.df AS DOUBLE) + 0.5))
        |      * (CAST(tf.tf AS DOUBLE) * 2.2)
        |      / (CAST(tf.tf AS DOUBLE) + 1.2 *
        |         (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) *
        |          (CAST(c.n_docs AS DOUBLE) / CAST(c.sum_dl AS DOUBLE)))) AS score
        |  FROM tf JOIN probes p USING (term) JOIN dl USING (doc_id) CROSS JOIN consts c)
        |SELECT doc_id, rk FROM (
        |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rk
        |  FROM scored) WHERE rk <= 10""".stripMargin
    s"""WITH brute AS ($brute),
       |lexrk AS (SELECT doc_id, rk FROM ($lex)),
       |ivfrk AS (
       |  SELECT vec_id AS doc_id, row_number() OVER (ORDER BY cos DESC, vec_id) AS rk
       |  FROM ($ivfOracleSql)),
       |rrfrk AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rk
       |  FROM ($hybridRrfOracleSql))
       |SELECT CAST(10 AS INTEGER) AS k,
       |  (SELECT count(*) FROM lexrk WHERE doc_id IN (SELECT doc_id FROM brute)) AS hits_lex,
       |  (SELECT count(*) FROM lexrk WHERE doc_id IN (SELECT doc_id FROM brute))::DOUBLE / 10.0::DOUBLE AS prec_lex,
       |  coalesce(1.0::DOUBLE / (SELECT min(rk) FROM lexrk WHERE doc_id IN (SELECT doc_id FROM brute)), 0.0::DOUBLE) AS mrr_lex,
       |  (SELECT count(*) FROM ivfrk WHERE doc_id IN (SELECT doc_id FROM brute)) AS hits_ivf,
       |  (SELECT count(*) FROM ivfrk WHERE doc_id IN (SELECT doc_id FROM brute))::DOUBLE / 10.0::DOUBLE AS prec_ivf,
       |  coalesce(1.0::DOUBLE / (SELECT min(rk) FROM ivfrk WHERE doc_id IN (SELECT doc_id FROM brute)), 0.0::DOUBLE) AS mrr_ivf,
       |  (SELECT count(*) FROM rrfrk WHERE doc_id IN (SELECT doc_id FROM brute)) AS hits_rrf,
       |  (SELECT count(*) FROM rrfrk WHERE doc_id IN (SELECT doc_id FROM brute))::DOUBLE / 10.0::DOUBLE AS prec_rrf,
       |  coalesce(1.0::DOUBLE / (SELECT min(rk) FROM rrfrk WHERE doc_id IN (SELECT doc_id FROM brute)), 0.0::DOUBLE) AS mrr_rrf""".stripMargin
  }) { (s, d) =>
    graft.operators.Retrieval.searchEval(
        t(s, d, "documents"), "doc_id", "text",
        t(s, d, "embeddings"), "vec_id", "embedding",
        probeId = 0L, centroids = ivfCentroids(s, d), nprobe = 2,
        minTermLen = 6, k1 = 1.2, b = 0.75, poolK = 20, rrfK = 60, k = 10)
  }

  // --------------------------------------------------------------------------

  lazy val all: Map[String, Q] = registry.map { case (k, (f, _)) => k -> f }.toMap

  lazy val oracles: Map[String, String] = registry.collect {
    case (k, (_, Some(sql))) => k -> sql
  }.toMap

  /** Which shared persisted stage(s) each dedup-family query consumes
    * ([[sharedShingles]]/[[sharedSpans]]/[[sharedEmbedPairs]]): within a
    * session the FIRST query of a stage group pays the materialization
    * and the rest ride the cache, so per-query timings are only
    * interpretable with this map — Bench emits a warm/cold flag from it.
    * Maintained next to the query bodies; EntrySpec pins every key to a
    * registered query. */
  lazy val sharedStages: Map[String, Seq[String]] = Map(
    "q_dedup_ngram" -> Seq("shingles"),
    "q_dedup_clusters" -> Seq("shingles", "clusters"),
    "q_dedup_keep_best" -> Seq("shingles", "clusters"),
    "q_sample_split_leakage_safe" -> Seq("shingles", "clusters"),
    "q_decontaminate" -> Seq("shingles"),
    "q_decontaminate_bloom" -> Seq("shingles"),
    "q_dedup_incremental" -> Seq("shingles"),
    "q_dedup_minhash" -> Seq("shingles"),
    "q_dedup_minhash_est" -> Seq("shingles"),
    "q_corpus_clean" -> Seq("shingles"),
    "q_dedup_spans" -> Seq("spans"),
    "q_dedup_spans_strip" -> Seq("spans"),
    "q_dedup_embed" -> Seq("embed_pairs"),
    "q_dedup_semantic" -> Seq("embed_pairs"),
    "q_ml_logreg_confusion" -> Seq("logreg_model"),
    "q_ml_logreg_apply" -> Seq("logreg_model"),
    "q_ml_calibration" -> Seq("logreg_model"),
    // index builds: cold flag = the timing includes the one-off
    // partitionBy materialization (annIndexPath)
    "q_sim_ivf_indexed" -> Seq("ivf_index"),
    "q_sim_lsh_indexed" -> Seq("lsh_index"),
    "q_sim_pq_indexed" -> Seq("pq_index"),
    "q_sim_ivf_index_build" -> Seq("ivf_index"),
    "q_sim_lsh_index_build" -> Seq("lsh_index"),
    "q_sim_pq_index_build" -> Seq("pq_index"),
    "q_scan_partition_prune" -> Seq("orders_part"),
    "q_dedup_containment" -> Seq("shingles"),
    "q_join_bucketed" -> Seq("bkt_tables"),
    "q_tpch21_bucketed" -> Seq("bkt_q21_tables"),
    "q_text_bm25_indexed" -> Seq("txt_index"),
    "q_text_bm25_index_build" -> Seq("txt_index"),
    "q_search_hybrid_rrf_indexed" -> Seq("hyb_index"),
    "q_text_bm25_index_refresh" -> Seq("txt_refresh_index"),
    "q_text_bm25_index_deleted" -> Seq("txt_delete_index"),
    "q_sim_lsh_index_refresh" -> Seq("lsh_refresh_index"),
    "q_sim_ivf_index_refresh" -> Seq("ivf_refresh_index"),
    "q_sim_ivf_index_deleted" -> Seq("ivf_delete_index"),
    "q_sim_pq_index_refresh" -> Seq("pq_refresh_index"),
    "q_layout_zorder_exec" -> Seq("zorder_exec"),
    "q_layout_compact_exec" -> Seq("compact_exec"),
    "q_scan_csv_roundtrip" -> Seq("csv_rt"),
    "q_scan_avro_roundtrip" -> Seq("avro_rt"),
    "q_scan_json_roundtrip" -> Seq("json_rt"),
    "q_scan_orc_roundtrip" -> Seq("orc_rt"),
    "q_scan_csvq_roundtrip" -> Seq("csvq_rt"),
    "q_scan_regex_roundtrip" -> Seq("regex_rt"))

  /** Force-materialize an ANN index OUTSIDE query timing. Bench runs
    * these before the first consuming query and reports the build
    * seconds separately (`index_build` in the bench JSON), so the
    * per-query number is the steady-state probe cost — at 100 TB the
    * build is a one-off amortized over every later probe, and folding
    * it into one query's timing misreads the index as a slow query.
    * Idempotent per (session, dir): the query bodies hit the same
    * annIndexPath key and ride the cache. */
  lazy val indexBuilds: Map[String, (SparkSession, String) => Unit] = Map(
    "ivf_index" -> ((s, d) => { ivfIndexPath(s, d); () }),
    "lsh_index" -> ((s, d) => { lshIndexPath(s, d); () }),
    "pq_index" -> ((s, d) => { pqIndexPath(s, d); () }),
    "orders_part" -> ((s, d) => { partitionedOrdersPath(s, d); () }),
    "bkt_tables" -> ((s, d) => { bucketedOrdersCustomer(s, d); () }),
    "bkt_q21_tables" -> ((s, d) => { bucketedLineitemOrders(s, d); () }),
    "txt_index" -> ((s, d) => { textIndexPath(s, d); () }),
    "hyb_index" -> ((s, d) => { hybridTextIndexPath(s, d); () }),
    "txt_refresh_index" -> ((s, d) => { textRefreshIndexPath(s, d); () }),
    "txt_delete_index" -> ((s, d) => { textDeleteIndexPath(s, d); () }),
    "lsh_refresh_index" -> ((s, d) => { lshRefreshPath(s, d); () }),
    "ivf_refresh_index" -> ((s, d) => { ivfRefreshPath(s, d); () }),
    "ivf_delete_index" -> ((s, d) => { ivfDeletePath(s, d); () }),
    "pq_refresh_index" -> ((s, d) => { pqRefreshPath(s, d); () }),
    "zorder_exec" -> ((s, d) => { zorderExecPath(s, d); () }),
    "compact_exec" -> ((s, d) => { compactExecPath(s, d); () }),
    "csv_rt" -> ((s, d) => { csvRoundtripPath(s, d); () }),
    "avro_rt" -> ((s, d) => { avroRoundtripPath(s, d); () }),
    "json_rt" -> ((s, d) => { jsonRoundtripPath(s, d); () }),
    "orc_rt" -> ((s, d) => { orcRoundtripPath(s, d); () }),
    "csvq_rt" -> ((s, d) => { csvqRoundtripPath(s, d); () }),
    "regex_rt" -> ((s, d) => { regexRoundtripPath(s, d); () }))
}

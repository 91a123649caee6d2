package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §0 scale guidance: "skewed
  * keys → salting or AQE skew-join"). AQE's skew-join handles sort-merge
  * spills automatically; explicit salting is for the cases AQE can't fix —
  * a single hot key exceeding one executor's memory in a hash aggregate or
  * broadcast-miss join.
  *
  * Left rows get a deterministic-per-row salt in [0, saltFactor); right
  * rows are replicated saltFactor times; the join key becomes (key, salt),
  * splitting each hot key's rows across saltFactor reducers. */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    // salt from the row content hash: stable, no RNG, spreads same-key rows
    val leftSalted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.toIndexedSeq.map(col): _*), lit(saltFactor)).cast("int"))
    val rightSalted = right
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    leftSalted.join(rightSalted, Seq(key, "_salt")).drop("_salt")
  }

  /** The salting go/no-go, decided from the numbers
    * [[Profiling.keySkewTopK]] produces: the share of the left side's
    * rows held by its single hottest key. Salting costs a saltFactor×
    * replication of the right side — worth paying only when one reducer
    * would otherwise receive a topKeyShare fraction of the join's rows. */
  final case class SaltDecision(topKeyCount: Long, nRows: Long,
      topKeyShare: Double, salted: Boolean, saltFactor: Int)

  /** Profile `left.key` (one keyed count + a k=1 bounded-heap top — the
    * keySkewTopK shape) and decide. The profile is ONE eager pass over
    * the left side; at 100 TB run it once per ingest and cache the
    * decision, not once per join. */
  def decide(left: DataFrame, key: String, topShareThreshold: Double = 0.2,
      saltFactor: Int = 16): SaltDecision = {
    require(topShareThreshold > 0 && topShareThreshold <= 1,
      s"topShareThreshold must be in (0,1], got $topShareThreshold")
    // keySkewTopK emits no row for an empty (or all-null-key) left side —
    // that's the "no hot key" case, not an error: share 0, no salting
    Profiling.keySkewTopK(left.select(col(key)), key, k = 1).head(1) match {
      case Array(row) =>
        val top = row.getAs[Long]("cnt")
        val n = row.getAs[Long]("n_rows")
        val share = if (n == 0) 0.0 else top.toDouble / n
        SaltDecision(top, n, share, share >= topShareThreshold, saltFactor)
      case _ => SaltDecision(0L, 0L, 0.0, salted = false, saltFactor)
    }
  }

  /** Join ADVISOR — the profile-then-decide pattern composed end to end
    * (the r7 SkewJoin.decide / cmsJoinSizeEstimate discipline, unified):
    * one row of pre-join diagnostics + the physical-strategy
    * recommendation a planner (or a human) would act on. Everything
    * derives distributively — key histograms ([[Profiling.joinKeyStats]]),
    * the hottest-key share (k=1 bounded heap), the CM-sketch join-size
    * over-estimate — and the decision itself is a CASE over those
    * integers, so an external engine replays the whole recommendation:
    * `broadcast` when the build side fits the row budget, `salted` when
    * one left key would own a reducer past the share threshold,
    * `shuffle` otherwise (AQE handles mild skew).
    *
    * @return ONE row: (n_left_rows, n_right_rows, n_common_keys,
    *         max_key_fanout, top_key_share, est_join_rows, strategy) */
  def advise(left: DataFrame, lKey: String, right: DataFrame, rKey: String,
      broadcastMaxRows: Long = 10000, topShareThreshold: Double = 0.2): DataFrame = {
    val stats = Profiling.joinKeyStats(left, lKey, right, rKey)
      .select("n_left_rows", "n_right_rows", "n_common_keys", "max_key_fanout")
    // aggregate the k=1 heap output so an empty/all-null left still
    // yields one row (the decide() headOption lesson, kept plan-side)
    val top = Profiling.keySkewTopK(left.select(col(lKey)), lKey, k = 1)
      .agg(coalesce(max(col("cnt")), lit(0L)).as("_top_cnt"))
    val est = Profiling.cmsJoinSizeEstimate(
      Profiling.cmsCounters(left, col(lKey), depth = 4, width = 256),
      Profiling.cmsCounters(right, col(rKey), depth = 4, width = 256))
    stats.crossJoin(broadcast(top)).crossJoin(broadcast(est))
      .withColumn("top_key_share",
        when(col("n_left_rows") === 0, lit(0.0))
          .otherwise(col("_top_cnt").cast("double") / col("n_left_rows")))
      .select(col("n_left_rows"), col("n_right_rows"), col("n_common_keys"),
        col("max_key_fanout"), col("top_key_share"), col("est_join_rows"),
        when(col("n_right_rows") <= broadcastMaxRows, lit("broadcast"))
          .when(col("top_key_share") >= topShareThreshold, lit("salted"))
          .otherwise(lit("shuffle")).as("strategy"))
  }

  /** Inner join that reads the skew profile and picks its own physical
    * shape: plain equi-join when the hottest key's row share is below
    * `topShareThreshold` (AQE handles mild skew fine), the salted form
    * past it (one key dominating a reducer is the case AQE's spill
    * splitting cannot always fix — a hash-aggregate or broadcast-miss
    * hot key needs the key space itself split). Same rows either way;
    * only the exchange shape differs. */
  def autoSalted(left: DataFrame, right: DataFrame, key: String,
      topShareThreshold: Double = 0.2, saltFactor: Int = 16): DataFrame = {
    val d = decide(left, key, topShareThreshold, saltFactor)
    if (d.salted) saltedInnerJoin(left, right, key, d.saltFactor)
    else left.join(right, Seq(key))
  }
}

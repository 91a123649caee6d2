package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange

/** Parallelism posture for parse-heavy stages (r12, optimization guide
  * §1.2/§2.5): tokenize/shingle/feature stages pay per-row CPU that is
  * orders of magnitude above their input bytes, so their wall-clock is
  * set by the SCAN's task count — and a small corpus stored as a
  * single-row-group parquet file pins the whole parse to one task
  * (parquet splits at row-group granularity; `maxPartitionBytes` cannot
  * help). Measured at sf0.1: SetSimJoin's tokenize job and
  * ClassifierTrain's bag stage each ran 2.3-2.7 s on ONE task of a
  * 32-core session.
  *
  * [[widen]] rebalances such a frame to the session's shuffle-partition
  * count — but ONLY when the frame's planned parallelism is materially
  * below it, so at production scale (scans already hundreds of tasks
  * wide) it is the identity and no corpus-sized shuffle is ever added.
  * The repartition key must be provided (hash partitioning is
  * deterministic under task retry; keyless round-robin would depend on
  * the sort-before-repartition defence).
  */
object Parallelism {

  /** The session's configured shuffle-partition count, falling back to
    * `sparkContext.defaultParallelism` when the conf value is not an
    * integer (e.g. "auto" under advisory-partitioning setups) — a tuning
    * knob must degrade, not crash every pinned operator (r12 ADVICE).
    * Every REPARTITION_BY_NUM pin in the operators reads THIS, never a
    * constant, so cluster confs keep owning the number at scale. */
  def sessionShufflePartitions(spark: SparkSession): Int =
    spark.conf.getOption("spark.sql.shuffle.partitions")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ > 0)
      .getOrElse(spark.sparkContext.defaultParallelism)

  /** `df` hash-repartitioned on `key` to the session's configured
    * shuffle-partition count iff it is a scan-shaped (exchange-free)
    * frame whose planned partition count is less than half of it; `df`
    * unchanged otherwise.
    *
    * The exchange guard (r12 ADVICE) is what makes the planned-count
    * probe safe: under AQE, `df.rdd` on a plan that CONTAINS exchanges
    * materializes its shuffle stages — real jobs whose output is then
    * discarded, since the returned repartitioned frame re-executes from
    * scratch. An exchange-free plan has no query stages to materialize,
    * so `.rdd.getNumPartitions` is pure metadata (the scan's split
    * count). Frames WITH exchanges need no widening anyway: their
    * parallelism is already governed by the shuffle-partition conf. */
  def widen(df: DataFrame, key: Column): DataFrame = {
    val n = sessionShufflePartitions(df.sparkSession)
    val plan = df.queryExecution.executedPlan
    val inner: SparkPlan = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan // pre-final, no jobs
      case p => p
    }
    val hasExchange = inner.exists(_.isInstanceOf[Exchange])
    if (hasExchange) df
    else {
      // planned (pre-AQE) partition count — metadata only, no job runs
      val parts = df.rdd.getNumPartitions
      if (parts * 2 <= n) df.repartition(n, key) else df
    }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

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

  /** `df` hash-repartitioned on `key` to the session's configured
    * shuffle-partition count iff its planned partition count is less
    * than half of it; `df` unchanged otherwise. */
  def widen(df: DataFrame, key: Column): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // planned (pre-AQE) partition count — metadata only, no job runs
    val parts = df.rdd.getNumPartitions
    if (parts * 2 <= n) df.repartition(n, key) else df
  }
}

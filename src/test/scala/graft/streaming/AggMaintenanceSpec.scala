package graft.streaming

import graft.SparkTestBase
import graft.sources.Tables
import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._

/** Live state table == from-scratch state over everything ingested, at
  * every trigger boundary — the continuous self-maintainability
  * contract of [[AggMaintenance]]. */
class AggMaintenanceSpec extends SparkTestBase {

  private val keys = Seq("l_returnflag", "l_linestatus")
  private val measures = Seq("l_quantity", "l_extendedprice")

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("paced micro-batches fold into exactly the batch-computed state") {
    val root = java.nio.file.Files.createTempDirectory("graft-aggmaint")
    val srcDir = s"$root/src"
    val stateDir = s"$root/state"
    val li = Tables.load(spark, sf(), "lineitem")

    // three deltas land as SEPARATE files so maxFilesPerTrigger=1 paces
    // them into three distinct triggers — each one a real merge step
    (0 until 3).foreach { i =>
      li.filter(col("l_orderkey") % 3 === i).coalesce(1)
        .write.mode("append").parquet(srcDir)
    }

    val q = AggMaintenance.maintainAggState(spark, srcDir, stateDir,
      s"$root/chk", keys, measures, maxFilesPerTrigger = 1)
    q.awaitTermination()

    val live = spark.read.parquet(stateDir)
    val scratch = IncrementalAgg.state(li, keys, measures)
    // parquet erases NOT NULL — names and types must agree, nullability
    // is the storage layer's business
    assert(live.schema.map(f => (f.name, f.dataType)) ==
      scratch.schema.map(f => (f.name, f.dataType)))
    assert(canon(live) == canon(scratch))

    // late delta in a SECOND stream run (fresh checkpoint dir would
    // re-ingest; the SAME checkpoint resumes where the first stopped)
    val extra = li.filter(col("l_linenumber") === 1)
      .withColumn("l_orderkey", col("l_orderkey") + lit(1000000000L))
    extra.coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = AggMaintenance.maintainAggState(spark, srcDir, stateDir,
      s"$root/chk", keys, measures, maxFilesPerTrigger = 1)
    q2.awaitTermination()

    val live2 = spark.read.parquet(stateDir)
    val scratch2 = IncrementalAgg.state(li.unionByName(extra), keys, measures)
    assert(canon(live2) == canon(scratch2))

    // and the derived read-time aggregates agree too
    assert(canon(IncrementalAgg.finish(live2, keys, measures)) ==
      canon(IncrementalAgg.finish(scratch2, keys, measures)))
  }
}

package graft.streaming

import graft.SparkTestBase
import graft.sources.Tables
import graft.operators.Profiling
import org.apache.spark.sql.functions._

/** Per-trigger KS rows == the batch operator on the same slice, and a
  * planted offset surfaces as a larger statistic. */
class DriftMonitorSpec extends SparkTestBase {

  test("per-trigger drift rows match batch KS; planted offset alarms") {
    val root = java.nio.file.Files.createTempDirectory("graft-drift")
    val srcDir = s"$root/src"
    val ev = Tables.load(spark, sf(), "events")
      .select(col("event_id"), col("value"))
      .where(col("value").isNotNull)
    val reference = ev.filter(col("event_id") % 3 === 0)
    val b0 = ev.filter(col("event_id") % 3 === 1)
    // planted drift: the second batch's values shift by +1000
    val b1 = ev.filter(col("event_id") % 3 === 2)
      .withColumn("value", col("value") + lit(1000.0))
    b0.coalesce(1).write.mode("append").parquet(srcDir)
    b1.coalesce(1).write.mode("append").parquet(srcDir)

    val q = DriftMonitor.monitorKs(spark, srcDir, s"$root/out",
      s"$root/chk", "value", reference, maxFilesPerTrigger = 1)
    q.awaitTermination()

    // the library's typed reader is the read-side contract (batch_id is
    // an inferred partition dir on disk; readDrift pins it back to LONG)
    def readDrift() = DriftMonitor.readDrift(spark, s"$root/out")
      .orderBy("batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val drift = readDrift()
    assert(drift.length == 2, s"expected 2 trigger rows, got ${drift.length}")

    // IDEMPOTENCE: replaying the same batches (fresh checkpoint, same
    // batch ids) must overwrite the per-batch partitions, not append —
    // the at-least-once foreachBatch contract mitigated
    val q2 = DriftMonitor.monitorKs(spark, srcDir, s"$root/out",
      s"$root/chk2", "value", reference, maxFilesPerTrigger = 1)
    q2.awaitTermination()
    assert(readDrift().length == 2,
      "a torn-trigger replay must rewrite its batch partition, not duplicate it")

    // each trigger row equals the batch operator on the same slice —
    // match rows to slices by their n (file→trigger order is not
    // guaranteed to follow write order)
    val expect = Seq(b0, b1).map { b =>
      val r = Profiling.ksTwoSample(reference, b, "value")
        .collect().head
      (r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    drift.foreach { case (_, n, d, at) =>
      assert(expect.contains((n, d, at)), s"unmatched drift row ($n, $d, $at)")
    }
    // the shifted slice must alarm far above the unshifted one
    val ds = drift.map(_._3).sorted
    assert(ds.last > 0.9, s"planted +1000 shift should push D toward 1, got ${ds.last}")
    assert(ds.head < ds.last, "undrifted batch should score lower")
  }
}

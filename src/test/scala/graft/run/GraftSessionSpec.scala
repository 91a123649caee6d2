package graft.run

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {

  test("cluster conf scales shuffle partitions with cores and enables AQE") {
    val c = GraftSession.clusterConf(executors = 1000, coresPerExecutor = 4)
    assert(c("spark.sql.shuffle.partitions") == "10000")
    assert(c("spark.sql.adaptive.enabled") == "true")
    assert(c("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(c("spark.sql.files.maxPartitionBytes") == (128L * 1024 * 1024).toString)
    assert(c("spark.executor.instances") == "1000")
  }

  test("broadcast threshold bounded by executor memory") {
    assert(GraftSession.clusterConf(10, 4, executorMemoryGb = 4)
      ("spark.sql.autoBroadcastJoinThreshold") == "64MB")
    assert(GraftSession.clusterConf(10, 4, executorMemoryGb = 64)
      ("spark.sql.autoBroadcastJoinThreshold") == "256MB")
  }
}

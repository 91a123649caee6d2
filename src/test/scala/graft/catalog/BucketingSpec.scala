package graft.catalog

import graft.SparkTestBase
import graft.sources.Tables

class BucketingSpec extends SparkTestBase {

  test("bucketed tables join without a shuffle exchange") {
    val orders = Tables.load(spark, sf(), "orders")
    val customer = Tables.load(spark, sf(), "customer")
    Bucketing.writeBucketed(orders, "b_orders", 4,
      Seq("o_custkey"), Seq("o_custkey"))
    Bucketing.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer", 4,
      Seq("o_custkey"), Seq("o_custkey"))
    // force a non-broadcast join so the test exercises the exchange logic
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(Bucketing.joinIsShuffleFree(spark, "b_orders", "b_customer", "o_custkey"),
        spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
          .queryExecution.executedPlan.toString)
      // same join on the raw (unbucketed) files DOES shuffle — the control
      val raw = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      assert(raw.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // results identical to the plain join
    val n1 = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey").count()
    val n2 = orders.join(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey").count()
    assert(n1 == n2)
  }
}

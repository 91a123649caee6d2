package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // sketch TypedImperativeAggregates (MinHashAgg/SimHashAgg) keep
      // small fixed-size buffers; let ObjectHashAggregate hold many groups
      // before sort-based fallback
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 100000)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same adaptive posture as GraftSession profiles: runtime partition
      // coalescing collapses the 32 reducer tasks of tiny shuffles (most of
      // the inventory at small SF), skew-join splits the heavy ones
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen/IO-path warmup so the alphabetically-first query doesn't
    // absorb session startup: exercise codegen, a shuffle, and the parquet
    // reader (via the 5-row region table — no meaningful data cached)
    spark.range(1000).selectExpr("id", "id * 2 AS x")
      .groupBy((org.apache.spark.sql.functions.col("id") % 7).as("k"))
      .count().write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"${sfDir.stripSuffix("/")}/region.parquet")
      .write.format("noop").mode("overwrite").save()
    // noop sink: forces full evaluation of every column of every row
    // (count() would let Spark skip projections entirely)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support (SURVEY.md §4: the reference's base spec
  * declares `NumberOfBuckets: -1` — bucketing declared but never used;
  * here it is a first-class scale tool). Writing both sides of a hot join
  * bucketed+sorted by the join key makes every subsequent join / groupBy
  * on that key shuffle-free: the exchange is done once at write time and
  * amortized over every downstream query — the single biggest lever for
  * repeated 100 TB joins. */
object Bucketing {

  /** Persist `df` as a bucketed, sorted catalog table (parquet datasource
    * table — no Hive needed). */
  def writeBucketed(df: DataFrame, tableName: String, numBuckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Seq.empty,
      mode: String = "overwrite"): Unit = {
    var w = df.write.format("parquet").mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(tableName)
  }

  /** True when a join between the two bucketed tables on `key` needs no
    * shuffle (both sides report the same bucketed distribution). */
  def joinIsShuffleFree(spark: SparkSession, table1: String, table2: String,
      key: String): Boolean = {
    val joined = spark.table(table1).join(spark.table(table2), key)
    val plan = joined.queryExecution.executedPlan.toString
    !plan.contains("Exchange hashpartitioning")
  }
}

package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.GraftCatalog
import graft.meta.MetaJson

/** The reference's shipped example job re-expressed natively
  * (`example/glue_jobs/simple_etl_job/job.py:1-38`): read table metadata
  * JSONs, register the employees/teams tables, run the LEFT JOIN, write
  * the result. What was "package to S3 + run on a Glue cluster + poll"
  * is here one in-process function — the query itself is identical SQL.
  *
  * @param metadataDir folder holding employees.json/teams.json (+
  *                    database.json)
  * @param warehouseRoot root under which the table data lives
  * @param outPath  where the joined result is written (parquet) */
object SimpleEtlJob {

  def run(spark: SparkSession, metadataDir: String, warehouseRoot: String,
      outPath: String): DataFrame = {
    val db = MetaJson.readDatabaseFolder(metadataDir)
    // job.py:30-31 registers emp/team views from the raw files
    GraftCatalog.readTable(spark, db, "employees", warehouseRoot)
      .createOrReplaceTempView("emp")
    GraftCatalog.readTable(spark, db, "teams", warehouseRoot)
      .createOrReplaceTempView("team")
    // job.py:33 — the reference's literal query; SELECT * of an equi-join
    // carries the key twice, which a parquet sink rejects, so the written
    // projection keeps one copy (USING-join semantics)
    spark.sql(
      "SELECT * FROM emp LEFT JOIN team ON emp.employee_id = team.employee_id")
    val df = spark.sql(
      "SELECT * FROM emp LEFT JOIN team USING (employee_id)")
    df.write.mode("overwrite").parquet(outPath) // job.py:35
    df
  }
}

package graft.examples

import java.nio.file.Files
import graft.SparkTestBase
import graft.catalog.GraftCatalog
import graft.meta.MetaJson

class SimpleEtlJobSpec extends SparkTestBase {

  test("the reference's example job end-to-end on the db1 fixture metadata") {
    import spark.implicits._
    // stage the db1 metadata + generated data under a temp warehouse
    val metaDir = Files.createTempDirectory("db1meta").toString
    Seq("database.json", "employees.json", "teams.json", "pay.json").foreach { f =>
      val in = getClass.getResourceAsStream(s"/meta/db1/$f")
      val s = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      Files.writeString(java.nio.file.Paths.get(metaDir, f), s)
    }
    val db = MetaJson.readDatabaseFolder(metaDir)
    val wh = Files.createTempDirectory("db1wh").toString
    val employees = Seq(
      (1, "ana", java.sql.Date.valueOf("1990-01-01")),
      (2, "bo", java.sql.Date.valueOf("1985-05-05")),
      (3, "cy", java.sql.Date.valueOf("2000-12-12")))
      .toDF("employee_id", "employee_name", "employee_dob")
    val teams = Seq((10, "core", 1, 2024, 1), (11, "data", 2, 2024, 1))
      .toDF("team_id", "team_name", "employee_id", "snapshot_year", "snapshot_month")
    GraftCatalog.writeTable(employees, db.table("employees"),
      db.tablePath(wh, "employees"), mode = "overwrite")
    GraftCatalog.writeTable(teams, db.table("teams"),
      db.tablePath(wh, "teams"), mode = "overwrite")

    val out = Files.createTempDirectory("db1out").toString + "/join"
    val df = SimpleEtlJob.run(spark, metaDir, wh, out)
    // LEFT JOIN keeps all 3 employees; cy has no team
    assert(df.count() == 3)
    val back = spark.read.parquet(out)
    assert(back.filter($"employee_name" === "cy").head()
      .getAs[Any]("team_name") == null)
    assert(back.filter($"employee_name" === "ana").head()
      .getAs[String]("team_name") == "core")
  }
}

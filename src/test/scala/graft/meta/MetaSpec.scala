package graft.meta

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Meta-layer behavior ported from the reference's unit suite
  * (`tests/test_tests.py`): golden JSON round-trips vs the example fixtures
  * (:369-390), column surgery (:556-710), partition reorder invariant
  * (:712-722), primary key (:724-745), sensitivity derivation (:752-784),
  * cross-table type alignment (:473-485). */
class MetaSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/meta/db1/$name")
    try scala.io.Source.fromInputStream(in).mkString finally in.close()
  }

  private def db1: DatabaseMeta = {
    val db = MetaJson.databaseFromJson(fixture("database.json"))
    Seq("employees.json", "pay.json", "teams.json")
      .foldLeft(db)((d, f) => d.addTable(MetaJson.tableFromJson(fixture(f))))
  }

  test("golden round-trip: table json -> TableMeta -> json is semantically equal") {
    Seq("employees.json", "pay.json", "teams.json").foreach { f =>
      val orig = fixture(f)
      val t = MetaJson.tableFromJson(orig)
      assert(MetaJson.jsonEquals(MetaJson.tableToJson(t), orig), s"round-trip $f")
    }
  }

  test("golden round-trip: database json") {
    val orig = fixture("database.json")
    val db = MetaJson.databaseFromJson(orig)
    assert(MetaJson.jsonEquals(MetaJson.databaseToJson(db), orig))
    assert(db.name == "workforce")
    assert(db.bucket == "my-bucket")
    assert(db.baseFolder == "database/database1")
  }

  test("teams fixture parses with constraints, partitions, glue_specific defaults") {
    val t = MetaJson.tableFromJson(fixture("teams.json"))
    assert(t.partitions == Seq("snapshot_year", "snapshot_month"))
    assert(t.primaryKey == Seq("team_id"))
    val emp = t.columns.find(_.name == "employee_id").get
    assert(emp.pattern.contains("\\d+"))
    assert(emp.sensitivity.contains("personal_data"))
    assert(emp.redacted.contains(false))
    val month = t.columns.find(_.name == "snapshot_month").get
    assert(month.enumValues.get == (1L to 12L))
    assert(t.columns.find(_.name == "team_id").get.nullable.contains(false))
    // derived table sensitivity (meta.py:210-221)
    assert(t.sensitivity == Seq("personal_data"))
  }

  test("pay fixture carries glue_specific deep map (skip.header.line.count)") {
    val t = MetaJson.tableFromJson(fixture("pay.json"))
    val sd = t.glueSpecific("StorageDescriptor")
      .asInstanceOf[scala.collection.Map[String, Any]]
    val params = sd("Parameters").asInstanceOf[scala.collection.Map[String, Any]]
    assert(params("skip.header.line.count") == "1")
  }

  test("partition setter reorders columns so partitions sort last (meta.py:161-176)") {
    val t = TableMeta("t", "t/", Seq(
      ColumnMeta("a", "int"), ColumnMeta("b", "character"),
      ColumnMeta("c", "date")))
    val p = t.withPartitions(Seq("a"))
    assert(p.columnNames == Seq("b", "c", "a"))
    assert(p.validated.partitions == Seq("a"))
    // data schema excludes partition columns, full schema keeps order
    assert(p.dataSchema.fieldNames.toSeq == Seq("b", "c"))
    assert(p.fullSchema.fieldNames.toSeq == Seq("b", "c", "a"))
  }

  test("addColumn re-establishes partition-last; dup add rejected (tests:556-710)") {
    val t = TableMeta("t", "t/", Seq(
      ColumnMeta("a", "int"), ColumnMeta("p", "int"))).withPartitions(Seq("p"))
    val t2 = t.addColumn(ColumnMeta("z", "double"))
    assert(t2.columnNames == Seq("a", "z", "p"))
    intercept[IllegalArgumentException](t2.addColumn(ColumnMeta("a", "int")))
    intercept[IllegalArgumentException](t2.addColumn(ColumnMeta("bad", "array()")))
  }

  test("removeColumn drops from columns, partitions and primary key") {
    val t = TableMeta("t", "t/", Seq(
      ColumnMeta("a", "int"), ColumnMeta("p", "int")),
      primaryKey = Seq("a")).withPartitions(Seq("p"))
    val r = t.removeColumn("p")
    assert(r.columnNames == Seq("a") && r.partitions.isEmpty)
    assert(t.removeColumn("a").primaryKey.isEmpty)
    intercept[IllegalArgumentException](t.removeColumn("nope"))
  }

  test("updateColumn validates the new column") {
    val t = TableMeta("t", "t/", Seq(ColumnMeta("a", "int")))
    val u = t.updateColumn("a")(_.copy(typeName = "long"))
    assert(u.columns.head.typeName == "long")
    intercept[IllegalArgumentException](
      t.updateColumn("a")(_.copy(typeName = "nope")))
  }

  test("reorderColumns requires a complete order (meta.py:290-298)") {
    val t = TableMeta("t", "t/", Seq(ColumnMeta("a", "int"), ColumnMeta("b", "int")))
    assert(t.reorderColumns(Seq("b", "a")).columnNames == Seq("b", "a"))
    intercept[IllegalArgumentException](t.reorderColumns(Seq("b")))
  }

  test("name/location/format validation (utils.py:82-124, meta.py:197-208)") {
    intercept[IllegalArgumentException](TableMeta("Bad", "t/").validated)
    intercept[IllegalArgumentException](TableMeta("has-dash", "t/").validated)
    intercept[IllegalArgumentException](TableMeta("t", "").validated)
    intercept[IllegalArgumentException](TableMeta("t", "/abs").validated)
    // dead `par` format rejected up front (SURVEY.md §1.2)
    intercept[IllegalArgumentException](TableMeta("t", "t/", dataFormat = "par").validated)
    TableMeta("ok_name", "ok/loc", dataFormat = "json").validated
  }

  test("sensitivity is derived, sorted, distinct (tests:752-784)") {
    val t = TableMeta("t", "t/", Seq(
      ColumnMeta("a", "int", sensitivity = Some("special_category_data")),
      ColumnMeta("b", "int", sensitivity = Some("personal_data")),
      ColumnMeta("c", "int", sensitivity = Some("personal_data")),
      ColumnMeta("d", "int")))
    assert(t.sensitivity == Seq("personal_data", "special_category_data"))
    intercept[IllegalArgumentException](
      ColumnMeta("a", "int", sensitivity = Some("nope")).validate())
  }

  test("cross-table type alignment (meta.py:878-916, tests:473-485)") {
    val ok = db1
    ok.checkColumnTypesAlign() // employee_id is int in all three tables
    val bad = ok.copy(tables = ok.tables.map {
      case t if t.name == "pay" =>
        t.updateColumn("employee_id")(_.copy(typeName = "character"))
      case t => t
    })
    val errs = bad.typeAlignErrors()
    assert(errs.exists(_.contains("employee_id")))
    intercept[MetaColumnTypeMismatch](bad.checkColumnTypesAlign())
    bad.checkColumnTypesAlign(excludeTables = Seq("pay"))
  }

  test("database path model replaces s3://bucket/base_folder (SURVEY §1.3)") {
    val db = db1
    assert(db.databasePath("/wh") == "/wh/my-bucket/database/database1")
    assert(db.tablePath("/wh", "teams") ==
      "/wh/my-bucket/database/database1/teams")
    intercept[IllegalArgumentException](db.table("nope"))
    intercept[IllegalArgumentException](db.addTable(db.table("pay")))
    assert(db.removeTable("pay").tableNames == Seq("employees", "teams"))
  }

  test("StructField carries constraint metadata; nullable maps through") {
    val c = ColumnMeta("a", "int", description = "d", pattern = Some("\\d+"),
      nullable = Some(false), sensitivity = Some("personal_data"),
      redacted = Some(true))
    val f = c.toStructField
    assert(f.dataType == IntegerType && !f.nullable)
    assert(f.metadata.getString("pattern") == "\\d+")
    assert(f.metadata.getBoolean("redacted"))
  }

  test("fromSparkSchema infers agnostic meta (meta.py:1038-1060 port)") {
    val st = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("vec", ArrayType(FloatType)),
      StructField("nest", StructType(Seq(StructField("num", IntegerType))))))
    val t = TableMeta.fromSparkSchema("t", "t/", st)
    assert(t.columns.map(_.typeName) ==
      Seq("long", "character", "array<float>", "struct<num:int>"))
  }

  test("out-of-range decimal is invalid, not a crash") {
    assert(!graft.types.AgnosticType.isValid("decimal(2,5)"))
    assert(!graft.types.AgnosticType.isValid("decimal(99,0)"))
    assert(graft.types.AgnosticType.isValid("decimal(38,38)"))
  }

  test("explicit JSON null behaves like a missing key") {
    val t = MetaJson.tableFromJson(
      """{"name":"t","location":"t/","data_format":"parquet",
         "description":null,"glue_specific":null,
         "columns":[{"name":"c","type":"int","nullable":null,"pattern":null}]}""")
    assert(t.description == "")
    assert(t.glueSpecific.isEmpty)
    assert(t.columns.head.nullable.isEmpty)
    assert(t.columns.head.pattern.isEmpty)
  }

  test("updateColumn rename propagates to partitions/pk; dup rename rejected") {
    val t = TableMeta("t", "t/", Seq(
      ColumnMeta("a", "int"), ColumnMeta("p", "int")),
      primaryKey = Seq("p")).withPartitions(Seq("p"))
    val renamed = t.updateColumn("p")(_.copy(name = "p2"))
    assert(renamed.partitions == Seq("p2") && renamed.primaryKey == Seq("p2"))
    renamed.validated
    intercept[IllegalArgumentException](
      t.updateColumn("p")(_.copy(name = "a"))) // collides with existing column
  }

  test("folder round-trip: write then read back equals") {
    val dir = java.nio.file.Files.createTempDirectory("graftmeta").toString
    val db = db1
    MetaJson.writeDatabaseFolder(db, dir)
    val back = MetaJson.readDatabaseFolder(dir)
    assert(back.tableNames.sorted == db.tableNames.sorted)
    assert(MetaJson.jsonEquals(
      MetaJson.tableToJson(back.table("teams")),
      MetaJson.tableToJson(db.table("teams"))))
  }
}

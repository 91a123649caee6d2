package graft.validate

import graft.SparkTestBase
import graft.meta.{ColumnMeta, DatabaseMeta, TableMeta}

class ValidateSpec extends SparkTestBase {

  import spark.implicits._

  private val meta = TableMeta("t", "t/", Seq(
    ColumnMeta("id", "int", nullable = Some(false)),
    ColumnMeta("status", "character", enumValues = Some(Seq("a", "b"))),
    ColumnMeta("code", "character", pattern = Some("\\d+")),
    ColumnMeta("secret", "character", sensitivity = Some("personal_data")),
    ColumnMeta("hidden", "character", redacted = Some(true))),
    primaryKey = Seq("id"))

  private def df = Seq(
    (Some(1), "a", "123", "s1", "h1"),
    (Some(2), "zz", "abc", "s2", "h2"),
    (Option.empty[Int], "b", "456", "s3", "h3"),
  ).toDF("id", "status", "code", "secret", "hidden")

  test("summaryCounts: one scan, per-rule violation counts") {
    val m = Validate.summaryCounts(df, meta).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("id_null" -> 1L, "status_enum" -> 1L, "code_pattern" -> 1L))
  }

  test("violatingRows tags each row with the rules it broke") {
    val rows = Validate.violatingRows(df, meta).collect()
    assert(rows.length == 2)
    val byStatus = rows.map(r => r.getString(1) -> r.getSeq[String](5).toSet).toMap
    assert(byStatus("zz") == Set("status_enum", "code_pattern"))
    assert(byStatus("b") == Set("id_null"))
  }

  test("duplicatePkGroups finds dup groups only") {
    val d2 = Seq((1, "x"), (1, "y"), (2, "z")).toDF("id", "v")
    val dups = Validate.duplicatePkGroups(d2, Seq("id")).collect()
    assert(dups.length == 1 && dups(0).getInt(0) == 1 && dups(0).getLong(1) == 2)
  }

  test("redactedView drops redacted, sha2-masks sensitive, keeps the rest") {
    val v = Validate.redactedView(df, meta)
    assert(v.columns.toSeq == Seq("id", "status", "code", "secret"))
    val r = v.orderBy("code").collect()(0)
    assert(r.getString(3).matches("[0-9a-f]{64}"))
  }

  test("markdownDoc layout matches the reference generator") {
    val db = DatabaseMeta("workforce", "my-bucket", "base", tables = Seq(meta))
    val md = Validate.markdownDoc(meta, Some(db), "/wh")
    assert(md.startsWith("# t\n"))
    assert(md.contains("**Table Format:** csv"))
    assert(md.contains("**Primary Key:** id"))
    assert(md.contains("**Database Name:** workforce"))
    assert(md.contains("### id"))
    assert(md.contains("**type:** int"))
  }
}

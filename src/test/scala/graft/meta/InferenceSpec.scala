package graft.meta

import graft.SparkTestBase

/** Schema-inference parity with the reference's own fixtures
  * (tests/data/data_types/): the Spark-schema JSON extracted from
  * test_nest.parquet must produce the same agnostic types the reference's
  * tablemeta_from_parquet_meta derives (meta.py:1038-1060), and reading
  * the actual parquet must agree with the JSON path. */
class InferenceSpec extends SparkTestBase {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/data_types/$name")
    try scala.io.Source.fromInputStream(in).mkString finally in.close()
  }

  test("fromSparkSchemaJson on the reference's parquet_metadata fixture") {
    val t = TableMeta.fromSparkSchemaJson("test_nest", "test_nest/",
      fixture("parquet_metadata_json.json"))
    val types = t.columns.map(c => c.name -> c.typeName).toMap
    assert(types("entity_id") == "long")
    assert(types("test_array") == "array<long>")
    assert(types("test_nest").startsWith("struct<arr_key:array<character>"))
    assert(types("test_nest").contains("nest_arr:array<long>"))
  }

  test("reading test_nest.parquet infers the same meta as its schema JSON") {
    val path = getClass.getResource("/data_types/test_nest.parquet").getPath
    val fromFile = TableMeta.fromSparkSchema("t", "t/",
      spark.read.parquet(path).schema)
    val fromJson = TableMeta.fromSparkSchemaJson("t", "t/",
      fixture("parquet_metadata_json.json"))
    assert(fromFile.columns.map(c => (c.name, c.typeName)) ==
      fromJson.columns.map(c => (c.name, c.typeName)))
  }

  test("deep-nested struct round-trips through the type grammar") {
    val t = TableMeta.fromSparkSchemaJson("t", "t/",
      fixture("parquet_metadata_json.json"))
    t.columns.foreach { c =>
      assert(graft.types.AgnosticType.isValid(c.typeName), c.typeName)
      assert(graft.types.AgnosticType.print(
        graft.types.AgnosticType.parse(c.typeName)) == c.typeName)
    }
  }

  test("all-types fixture (test_table.json) round-trips; unknown keys ignored") {
    // the fixture has a (misspelled) "partition" key the reference silently
    // ignores — we must too
    val t = MetaJson.tableFromJson(fixture("test_table.json"))
    assert(t.partitions.isEmpty)
    assert(t.columns.map(_.typeName) == Seq("int", "array<int>",
      "array<struct<num:int,desc:character>>", "struct<num:int,desc:character>",
      "struct<arr:array<int>>", "decimal(38,0)"))
    assert(MetaJson.jsonEquals(MetaJson.tableToJson(t).replace("\"partition\"", "\"x\""),
      fixture("test_table.json").replace("\"partition\": [\n        \"entity_id\"\n    ],", "")))
  }

  test("reading the nested parquet data yields queryable nested rows") {
    val path = getClass.getResource("/data_types/test_nest.parquet").getPath
    val df = spark.read.parquet(path)
    df.createOrReplaceTempView("nest_t")
    val r = spark.sql(
      "SELECT entity_id, test_nest.dict_key.nest_dict.a_key FROM nest_t LIMIT 1")
    assert(r.columns.length == 2)
    assert(r.count() == 1)
  }
}

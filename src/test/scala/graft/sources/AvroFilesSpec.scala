package graft.sources

import graft.SparkTestBase
import graft.meta.{ColumnMeta, DatabaseMeta, TableMeta}
import graft.catalog.GraftCatalog
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Built-in avro container-file source/sink (AvroSerDe analog,
  * specs/avro_specific.json:1-22) — exercised directly since the
  * spark-avro module is absent in this image. */
class AvroFilesSpec extends SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graftavro").toString

  test("round-trip: primitives, date/timestamp/decimal logical types, nested") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("flag", BooleanType),
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("amount", DecimalType(12, 2)),
      StructField("tags", ArrayType(StringType)),
      StructField("nest", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType))))))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, java.sql.Date.valueOf("2020-01-02"),
        java.sql.Timestamp.valueOf("2020-01-02 03:04:05.123456"),
        new java.math.BigDecimal("1234.56"), Seq("x", "y"), Row(7, "in")),
      Row(2L, null, null, false, null, null, null, Seq.empty[String], null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp() + "/t"
    AvroFiles.write(df, dir, mode = "overwrite")
    val back = AvroFiles.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val got = back.orderBy("id").collect()
    assert(got(0) == rows(0), s"${got(0)} != ${rows(0)}")
    assert(got(1).getLong(0) == 2L && got(1).isNullAt(1) && got(1).isNullAt(6))
  }

  test("reads parallelize per file; k=v directories become partition columns") {
    val root = tmp()
    import spark.implicits._
    AvroFiles.write(Seq((1L, "a")).toDF("id", "v"), s"$root/year=2020")
    AvroFiles.write(Seq((2L, "b")).toDF("id", "v"), s"$root/year=2021")
    val df = AvroFiles.read(spark, root,
      StructType(Seq(StructField("year", IntegerType))))
    val got = df.orderBy("id").collect()
    assert(got.map(_.getAs[Int]("year")).toSeq == Seq(2020, 2021))
    assert(df.rdd.getNumPartitions >= 2, "one task per file expected")
  }

  test("catalog: avro data_format reads and writes through writeTable/readTable") {
    val root = tmp()
    val t = TableMeta("av", "av/", Seq(
      ColumnMeta("id", "long"), ColumnMeta("s", "character")),
      dataFormat = "avro")
    val db = DatabaseMeta("db", "b", tables = Seq(t))
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    GraftCatalog.writeTable(df, t, db.tablePath(root, "av"), mode = "overwrite")
    val back = GraftCatalog.readTable(spark, db, "av", root).orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "x"), (2L, "y")))
  }

  test("catalog: partitioned avro table round-trips with partition discovery") {
    val root = tmp()
    val t = TableMeta("pav", "pav/", Seq(
      ColumnMeta("id", "long"), ColumnMeta("year", "int")),
      dataFormat = "avro").withPartitions(Seq("year"))
    val db = DatabaseMeta("db", "b", tables = Seq(t))
    import spark.implicits._
    val df = Seq((1L, 2020), (2L, 2021)).toDF("id", "year")
    GraftCatalog.writeTable(df, t, db.tablePath(root, "pav"), mode = "overwrite")
    val back = GraftCatalog.readTable(spark, db, "pav", root).orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getAs[Int]("year"))).toSeq ==
      Seq((1L, 2020), (2L, 2021)))
  }

  test("pre-epoch fractional timestamps round-trip (floorDiv, not truncation)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType)))
    val before = java.sql.Timestamp.valueOf("1969-12-31 23:59:59.25")
    val after = java.sql.Timestamp.valueOf("1970-01-01 00:00:00.25")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, before), Row(2L, after)), 1), schema)
    val dir = tmp() + "/ts"
    AvroFiles.write(df, dir)
    val back = AvroFiles.read(spark, dir).orderBy("id").collect()
    assert(back(0).getTimestamp(1) == before, s"pre-epoch: ${back(0).getTimestamp(1)}")
    assert(back(1).getTimestamp(1) == after)
  }

  test("partition values containing '+' survive; mixed-depth layouts null-fill") {
    val root = tmp()
    import spark.implicits._
    AvroFiles.write(Seq((1L, "a")).toDF("id", "v"), s"$root/lang=C++")
    AvroFiles.write(Seq((2L, "b")).toDF("id", "v"), s"$root/lang=scala")
    // a file with NO partition directory in the same tree
    AvroFiles.write(Seq((3L, "c")).toDF("id", "v"), root, mode = "append")
    val got = AvroFiles.read(spark, root).orderBy("id").collect()
    assert(got.map(_.getAs[String]("lang")).toSeq == Seq("C++", "scala", null))
  }

  test("compression codecs apply (smaller files) and round-trip") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, "x" * 200)).toDF("id", "s").repartition(1)
    val plain = tmp() + "/plain"; val zstd = tmp() + "/zstd"
    AvroFiles.write(df, plain)
    AvroFiles.write(df, zstd, compression = Some("zstd"))
    def size(d: String): Long = {
      val st = java.nio.file.Files.list(java.nio.file.Paths.get(d))
      try st.iterator().asScala.map(java.nio.file.Files.size(_)).sum finally st.close()
    }
    assert(size(zstd) < size(plain) / 2, s"zstd ${size(zstd)} vs plain ${size(plain)}")
    assert(AvroFiles.read(spark, zstd).count() == 2000)
    intercept[IllegalArgumentException](
      AvroFiles.write(df, tmp() + "/bad", compression = Some("lz4")))
  }

  test("persistent catalog: avro table registers via the full-class provider") {
    val root = tmp()
    val t = TableMeta("av2", "av2/", Seq(
      ColumnMeta("id", "long"), ColumnMeta("s", "character")),
      dataFormat = "avro")
    val db = DatabaseMeta("persavro", "b", tables = Seq(t))
    import spark.implicits._
    GraftCatalog.writeTable(Seq((5L, "z")).toDF("id", "s"), t,
      db.tablePath(root, "av2"), mode = "overwrite")
    GraftCatalog.registerDatabasePersistent(spark, db, root)
    val got = spark.sql("SELECT id, s FROM persavro.av2").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((5L, "z")))
    GraftCatalog.unregisterDatabasePersistent(spark, db)
  }
}

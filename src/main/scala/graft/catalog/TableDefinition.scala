package graft.catalog

import graft.meta.{DatabaseMeta, TableMeta}

/** Hive/Glue-style table definition builder — the port of
  * `glue_table_definition` (reference: `etl_manager/meta.py:432-481` with
  * the spec templates under `etl_manager/specs/`). The output map is the
  * metadata-export surface; [[GraftCatalog]] derives Spark reader options
  * from the same information independently, so this stays a pure function
  * of the meta. */
object TableDefinition {

  import DeepMerge.JMap

  /** base.json:1-27 — the format-independent skeleton. */
  private def baseSpec: JMap = Map(
    "Name" -> "",
    "Description" -> "",
    "Owner" -> "owner",
    "Retention" -> 0L,
    "StorageDescriptor" -> Map(
      "Columns" -> Seq.empty[Any],
      "Location" -> "",
      "InputFormat" -> "",
      "OutputFormat" -> "",
      "Compressed" -> false,
      "NumberOfBuckets" -> -1L,
      "SerdeInfo" -> Map(
        "SerializationLibrary" -> "",
        "Parameters" -> Map.empty[String, Any]),
      "BucketColumns" -> Seq.empty[Any],
      "SortColumns" -> Seq.empty[Any],
      "Parameters" -> Map.empty[String, Any],
      "StoredAsSubDirectories" -> false),
    "PartitionKeys" -> Seq.empty[Any],
    "TableType" -> "EXTERNAL_TABLE",
    "Parameters" -> Map.empty[String, Any],
  )

  private def textIO(serde: String, serdeParams: JMap,
      sdParams: JMap = Map.empty, params: JMap = Map.empty): JMap = Map(
    "StorageDescriptor" -> Map(
      "InputFormat" -> "org.apache.hadoop.mapred.TextInputFormat",
      "OutputFormat" -> "org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat",
      "SerdeInfo" -> Map(
        "SerializationLibrary" -> serde,
        "Parameters" -> serdeParams),
      "Parameters" -> sdParams),
    "Parameters" -> params)

  /** Format-specific overlays (specs/{csv,csv_quoted_nodate,json,parquet,
    * orc,avro,regex}_specific.json). */
  private def formatSpec(dataFormat: String): JMap = dataFormat match {
    case "csv" => textIO(
      "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe",
      Map("field.delim" -> ","),
      Map("classification" -> "csv", "delimiter" -> ","),
      Map("classification" -> "csv", "delimiter" -> ","))
    case "csv_quoted_nodate" => textIO(
      "org.apache.hadoop.hive.serde2.OpenCSVSerde",
      Map("escapeChar" -> "\\", "quoteChar" -> "\"",
        "separatorChar" -> ",", "serialization.format" -> "1"))
    case "json" => textIO(
      "org.openx.data.jsonserde.JsonSerDe",
      Map("paths" -> ""),
      Map("classification" -> "json"),
      Map("classification" -> "json"))
    case "regex" => textIO(
      "org.apache.hadoop.hive.serde2.RegexSerDe",
      Map("input.regex" -> "(.*)", "serialization.format" -> "1"),
      Map.empty, Map("classification" -> "csv"))
    case "parquet" => Map(
      "StorageDescriptor" -> Map(
        "InputFormat" -> "org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat",
        "OutputFormat" -> "org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat",
        "SerdeInfo" -> Map(
          "SerializationLibrary" -> "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe",
          "Parameters" -> Map("serialization.format" -> "1")),
        "Parameters" -> Map("classification" -> "parquet", "compressionType" -> "none")),
      "Parameters" -> Map("classification" -> "parquet"))
    case "orc" => Map(
      "StorageDescriptor" -> Map(
        "InputFormat" -> "org.apache.hadoop.hive.ql.io.orc.OrcInputFormat",
        "OutputFormat" -> "org.apache.hadoop.hive.ql.io.orc.OrcOutputFormat",
        "SerdeInfo" -> Map(
          "SerializationLibrary" -> "org.apache.hadoop.hive.ql.io.orc.OrcSerde",
          "Parameters" -> Map.empty[String, Any]),
        "Parameters" -> Map("classification" -> "orc", "compressionType" -> "none")),
      "Parameters" -> Map("classification" -> "orc"))
    case "avro" => Map(
      "StorageDescriptor" -> Map(
        "InputFormat" -> "org.apache.hadoop.hive.ql.io.avro.AvroContainerInputFormat",
        "OutputFormat" -> "org.apache.hadoop.hive.ql.io.avro.AvroContainerOutputFormat",
        "SerdeInfo" -> Map(
          "SerializationLibrary" -> "org.apache.hadoop.hive.serde2.avro.AvroSerDe",
          "Parameters" -> Map("avro.schema.literal" -> "")),
        "BucketColumns" -> Seq.empty[Any],
        "SortColumns" -> Seq.empty[Any],
        "Parameters" -> Map("avro.schema.literal" -> "", "classification" -> "avro")),
      "Parameters" -> Map("avro.schema.literal" -> "", "classification" -> "avro"))
    case other =>
      throw new IllegalArgumentException(s"no spec template for format $other")
  }

  /** Full table definition: base ⊕ format ⊕ columns/location/json-paths ⊕
    * user glue_specific ⊕ PartitionKeys (meta.py:432-481 ordering). */
  def forTable(table: TableMeta, databasePath: String): JMap = {
    val merged = DeepMerge.merge(baseSpec, formatSpec(table.dataFormat))

    val nonPartition = table.columns.filterNot(c => table.partitions.contains(c.name))
    val dataCols: Seq[Any] = table.glueColumns(excludeColumns = table.partitions)

    var sd = merged("StorageDescriptor").asInstanceOf[JMap] +
      ("Columns" -> dataCols) +
      ("Location" -> s"${databasePath.stripSuffix("/")}/${table.location.stripSuffix("/")}/")

    // JSON serde needs `paths` = comma-joined non-partition names (meta.py:446-452)
    if (table.dataFormat == "json") {
      val serde = sd("SerdeInfo").asInstanceOf[JMap]
      sd += ("SerdeInfo" -> (serde +
        ("Parameters" -> Map("paths" -> nonPartition.map(_.name).mkString(",")))))
    }

    var out = merged +
      ("Name" -> table.name) +
      ("Description" -> table.description) +
      ("StorageDescriptor" -> sd)

    // user override wins last (meta.py:470-471)
    if (table.glueSpecific.nonEmpty)
      out = DeepMerge.merge(out, table.glueSpecific)

    val partitionKeys: Seq[Any] = table.partitions.map { p =>
      val c = table.columns.find(_.name == p).get
      Map("Name" -> c.name, "Comment" -> c.description, "Type" -> c.glueType)
    }
    out + ("PartitionKeys" -> partitionKeys)
  }

  def forTable(db: DatabaseMeta, tableName: String, warehouseRoot: String): JMap =
    forTable(db.table(tableName), db.databasePath(warehouseRoot))
}

package graft.meta

import org.apache.spark.sql.types.StructType
import graft.types.AgnosticType

/** Agnostic table metadata (reference: `etl_manager/meta.py:99-505`,
  * TableMeta). Immutable: every mutator returns a new instance with the
  * reference's invariants re-established (partition columns sort last,
  * sensitivity is derived, two-stage validation on construction).
  */
final case class TableMeta(
    name: String,
    location: String,
    columns: Seq[ColumnMeta] = Seq.empty,
    dataFormat: String = "csv",
    description: String = "",
    partitions: Seq[String] = Seq.empty,
    primaryKey: Seq[String] = Seq.empty,
    glueSpecific: Map[String, Any] = Map.empty,
) {

  def columnNames: Seq[String] = columns.map(_.name)

  /** Table-level sensitivity = sorted distinct column sensitivities,
    * derived and read-only (meta.py:210-221). */
  def sensitivity: Seq[String] =
    columns.flatMap(_.sensitivity).distinct.sorted

  /** Two-stage validation mirroring meta.py:132-136: structural rules then
    * per-column type grammar. Returns this for chaining. */
  def validated: TableMeta = {
    Validation.validateName(name)
    Validation.validateLocation(location)
    Validation.validateDataFormat(dataFormat)
    columns.foreach(_.validate())
    val dup = columnNames.diff(columnNames.distinct)
    if (dup.nonEmpty)
      throw new IllegalArgumentException(s"duplicate column names: $dup")
    partitions.foreach(checkColumnExists)
    primaryKey.foreach(checkColumnExists)
    // partitions-last invariant (meta.py:161-176)
    val expected = columnNames.filterNot(partitions.contains) ++ partitions
    if (columnNames != expected)
      throw new IllegalArgumentException(
        s"partition columns must sort last: $columnNames vs $expected")
    this
  }

  private def checkColumnExists(c: String): Unit =
    if (!columnNames.contains(c))
      throw new IllegalArgumentException(
        s"The column name: $c does not match those existing in meta: " +
          columnNames.mkString(", "))

  private def checkColumnAbsent(c: String): Unit =
    if (columnNames.contains(c))
      throw new IllegalArgumentException(
        s"The column name provided ($c) already exists table in meta.")

  /** Set partitions; reorders columns so partitions come last, preserving
    * relative order of the rest (meta.py:161-176). */
  def withPartitions(ps: Seq[String]): TableMeta = {
    ps.foreach(checkColumnExists)
    val reordered = columns.filterNot(c => ps.contains(c.name)) ++
      ps.flatMap(p => columns.find(_.name == p))
    copy(columns = reordered, partitions = ps)
  }

  /** meta.py:238-288 add_column + partition reorder. */
  def addColumn(col: ColumnMeta): TableMeta = {
    checkColumnAbsent(col.name)
    col.validate()
    val added = copy(columns = columns :+ col)
    if (partitions.nonEmpty) added.withPartitions(partitions) else added
  }

  /** meta.py:241-253 remove_column: drops from columns, partitions, pk. */
  def removeColumn(columnName: String): TableMeta = {
    checkColumnExists(columnName)
    copy(
      columns = columns.filterNot(_.name == columnName),
      partitions = partitions.filterNot(_ == columnName),
      primaryKey = primaryKey.filterNot(_ == columnName))
  }

  /** meta.py:380-430 update_column: per-property surgery. A rename
    * propagates to partitions/primaryKey references, and the whole table
    * re-validates so a rename onto an existing column is rejected rather
    * than silently duplicating. */
  def updateColumn(columnName: String)(f: ColumnMeta => ColumnMeta): TableMeta = {
    checkColumnExists(columnName)
    var newName = columnName
    val updated = copy(columns = columns.map { c =>
      if (c.name == columnName) {
        val n = f(c); n.validate(); newName = n.name; n
      } else c
    })
    val renamed =
      if (newName == columnName) updated
      else updated.copy(
        partitions = updated.partitions.map(p => if (p == columnName) newName else p),
        primaryKey = updated.primaryKey.map(p => if (p == columnName) newName else p))
    renamed.validated
  }

  /** meta.py:290-298 reorder_columns: every existing column must appear. */
  def reorderColumns(order: Seq[String]): TableMeta = {
    columnNames.foreach { c =>
      if (!order.contains(c))
        throw new IllegalArgumentException(
          s"input column_name_order is missing column ($c) in meta table")
    }
    copy(columns = columns.sortBy(c => order.indexOf(c.name)))
  }

  /** Spark schema for reading the table's data files: non-partition columns
    * only, in declared (= physical, headerless-CSV) order. Partition
    * columns come from directory discovery (meta.py:442-444,473-479). */
  def dataSchema: StructType =
    StructType(columns.filterNot(c => partitions.contains(c.name)).map(_.toStructField))

  /** Full logical schema including partition columns (last). */
  def fullSchema: StructType = StructType(columns.map(_.toStructField))

  def partitionSchema: StructType =
    StructType(partitions.flatMap(p => columns.find(_.name == p)).map(_.toStructField))

  /** Spark-schema inference path: StructType -> TableMeta, the port of
    * tablemeta_from_parquet_meta (meta.py:1038-1060). */
  def glueColumns(excludeColumns: Seq[String] = Seq.empty): Seq[Map[String, String]] =
    columns.filterNot(c => excludeColumns.contains(c.name)).map { c =>
      Map("Name" -> c.name, "Comment" -> c.description, "Type" -> c.glueType)
    }
}

object TableMeta {

  /** tablemeta_from_parquet_meta port (meta.py:1038-1060): build a
    * TableMeta from a Spark schema JSON string — either `df.schema.json()`
    * or the `org.apache.spark.sql.parquet.row.metadata` key of a parquet
    * footer. */
  def fromSparkSchemaJson(name: String, location: String,
      schemaJson: String): TableMeta =
    fromSparkSchema(name, location,
      org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[StructType])

  /** Schema-inference source (meta.py:1038-1060): build a TableMeta from a
    * Spark schema, e.g. `spark.read.parquet(p).schema`. */
  def fromSparkSchema(
      name: String,
      location: String,
      schema: StructType,
      dataFormat: String = "parquet"): TableMeta = {
    val cols = schema.fields.map { f =>
      ColumnMeta(f.name, AgnosticType.print(f.dataType))
    }
    TableMeta(name, location, cols.toSeq, dataFormat).validated
  }
}

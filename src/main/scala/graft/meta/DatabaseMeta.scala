package graft.meta

/** Agnostic database metadata (reference: `etl_manager/meta.py:646-916`,
  * DatabaseMeta). The reference's `s3://bucket/base_folder` path model
  * becomes a warehouse-root-relative path (SURVEY.md §1.3). */
final case class DatabaseMeta(
    name: String,
    bucket: String,
    baseFolder: String = "",
    description: String = "",
    tables: Seq[TableMeta] = Seq.empty,
) {

  def validated: DatabaseMeta = {
    Validation.validateName(name)
    // an empty bucket would collapse databasePath to the warehouse root,
    // making deleteData(tablesOnly = false) wipe the whole warehouse
    if (bucket.isEmpty)
      throw new IllegalArgumentException("bucket must be non-empty")
    Validation.validateString(bucket, allowedChars = ".-")
    tables.foreach(_.validated)
    this
  }

  def tableNames: Seq[String] = tables.map(_.name)

  /** Root of the database inside a local/remote warehouse, replacing
    * `s3_database_path` = `s3://bucket/base_folder` (meta.py:697-702). */
  def databasePath(warehouseRoot: String): String =
    Seq(warehouseRoot, bucket, baseFolder).filter(_.nonEmpty).mkString("/")

  def tablePath(warehouseRoot: String, tableName: String): String =
    s"${databasePath(warehouseRoot)}/${table(tableName).location.stripSuffix("/")}"

  def table(tableName: String): TableMeta =
    tables.find(_.name == tableName).getOrElse(
      throw new IllegalArgumentException(s"Table $tableName does not exist."))

  /** meta.py:732-746 add_table with duplicate check. */
  def addTable(t: TableMeta): DatabaseMeta = {
    if (tableNames.contains(t.name))
      throw new IllegalArgumentException(s"Table ${t.name} already exists.")
    copy(tables = tables :+ t)
  }

  /** meta.py:748-753 remove_table. */
  def removeTable(tableName: String): DatabaseMeta = {
    table(tableName) // existence check
    copy(tables = tables.filterNot(_.name == tableName))
  }

  /** Cross-table type-align check (meta.py:878-916): same-named columns
    * must have identical agnostic types across all tables; returns the
    * per-column error log lines, empty when aligned. */
  def typeAlignErrors(excludeTables: Seq[String] = Seq.empty): Seq[String] = {
    val occurrences: Seq[(String, String, String)] = for {
      t <- tables if !excludeTables.contains(t.name)
      c <- t.columns
    } yield (c.name, t.name, c.typeName)
    occurrences.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (col, occ) =>
        val types = occ.map(_._3).distinct
        if (types.size > 1) {
          val traceback = occ.map { case (_, t, ty) => s"===> $t: $ty" }
          Seq(s"ERROR: column $col has multiple types [${types.mkString(", ")}]") ++
            traceback
        } else Nil
    }
  }

  /** Throws like meta.py MetaColumnTypeMismatch when types don't align. */
  def checkColumnTypesAlign(excludeTables: Seq[String] = Seq.empty): Unit = {
    val errs = typeAlignErrors(excludeTables)
    if (errs.nonEmpty)
      throw new MetaColumnTypeMismatch(
        "Meta data does not align...\n\n" + errs.mkString("\n"))
  }
}

final class MetaColumnTypeMismatch(msg: String) extends RuntimeException(msg)

package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.meta.{ColumnMeta, DatabaseMeta, TableMeta}

/** Constraint enforcement (SURVEY.md §2.H). The reference DECLARES
  * enum/pattern/nullable/primary_key but never enforces them on data
  * (`README.md:168`); here each constraint compiles to a Catalyst
  * predicate, so enforcement is one codegen'd scan — no driver loops.
  */
object Validate {

  /** The violation predicate for one column's declared constraints:
    * true where the row VIOLATES (constraint properties per
    * `specs/table_schema.json:50-92`). */
  def violations(c: ColumnMeta): Seq[(String, Column)] = {
    val checks = scala.collection.mutable.ArrayBuffer.empty[(String, Column)]
    if (c.nullable.contains(false))
      checks += (s"${c.name}_null" -> col(c.name).isNull)
    c.enumValues.foreach { vs =>
      checks += (s"${c.name}_enum" ->
        (col(c.name).isNotNull && !col(c.name).isin(vs: _*)))
    }
    c.pattern.foreach { p =>
      checks += (s"${c.name}_pattern" ->
        (col(c.name).isNotNull && !col(c.name).cast("string").rlike(p)))
    }
    checks.toSeq
  }

  /** Single-pass validation summary: one conditional aggregate per declared
    * constraint — one scan regardless of constraint count (SURVEY §2.H),
    * unpivoted to (rule, n_violations). */
  def summaryCounts(df: DataFrame, table: TableMeta): DataFrame = {
    val checks = table.columns.flatMap(violations)
    val aggs = checks.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(name)
    }
    if (aggs.isEmpty)
      df.sparkSession.range(0).select(lit("").as("rule"), lit(0L).as("n_violations"))
    else {
      val wide = df.agg(aggs.head, aggs.tail: _*)
      // unpivot to (rule, n_violations) — stable long form for any number
      // of constraints
      val pairs = checks.map { case (name, _) =>
        struct(lit(name).as("rule"), col(name).as("n_violations"))
      }
      wide.select(explode(array(pairs: _*)).as("kv"))
        .select(col("kv.rule").as("rule"), col("kv.n_violations").as("n_violations"))
    }
  }

  /** Rows violating any constraint, tagged with the rule names that fired. */
  def violatingRows(df: DataFrame, table: TableMeta): DataFrame = {
    val checks = table.columns.flatMap(violations)
    if (checks.isEmpty) df.limit(0).withColumn("violated_rules", lit(Array.empty[String]))
    else {
      val tags = checks.map { case (name, pred) => when(pred, name) }
      df.withColumn("violated_rules",
          filter(array(tags: _*), x => x.isNotNull))
        .filter(size(col("violated_rules")) > 0)
    }
  }

  /** Primary-key uniqueness (meta.py:178-191 declares, we enforce):
    * groups with more than one row. Partial-agg friendly: the groupBy
    * count is map-side combined before the shuffle. */
  def duplicatePkGroups(df: DataFrame, pk: Seq[String]): DataFrame =
    df.groupBy(pk.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Referential-integrity check (q_check_fk): orphan child rows whose
    * FK value has no match in the parent — the enforcement half of the
    * reference's declared-but-unenforced key metadata (primary_key
    * `meta.py:178-191`; the FK walk its example join implies). One
    * left-anti join per edge (keyed shuffle, or broadcast when the
    * parent's key column is dim-sized); null FKs count separately —
    * they are a nullability question, not an orphan. */
  def orphanCount(child: DataFrame, childCol: String,
      parent: DataFrame, parentCol: String, edgeName: String): DataFrame = {
    val keys = parent.select(col(parentCol).as(childCol)).distinct()
    child.select(col(childCol))
      .filter(col(childCol).isNotNull)
      .join(keys, Seq(childCol), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .select(lit(edgeName).as("fk"), col("n_orphans"))
  }

  /** Non-sensitive view (q_redact): drop redacted columns, sha2-mask
    * sensitive ones (`redacted`/`sensitivity` props,
    * specs/table_schema.json:81-92). */
  def redactedView(df: DataFrame, table: TableMeta): DataFrame = {
    val keep = table.columns.filterNot(_.redacted.contains(true))
    df.select(keep.map { c =>
      if (c.sensitivity.isDefined)
        sha2(col(c.name).cast("string"), 256).as(c.name)
      else col(c.name)
    }: _*)
  }

  /** generate_markdown_doc port (meta.py:507-572): same section layout. */
  def markdownDoc(table: TableMeta, db: Option[DatabaseMeta],
      warehouseRoot: String = ""): String = {
    val dbName = db.map(_.name).getOrElse("unknown")
    val path = db.map(d => s"${d.databasePath(warehouseRoot)}/${table.location}")
      .getOrElse("unknown")
    val partitionText =
      if (table.partitions.nonEmpty) table.partitions.mkString(", ") else "None"
    val pkText =
      if (table.primaryKey.nonEmpty) table.primaryKey.mkString(", ") else "None"
    val sb = new StringBuilder
    sb ++= s"# ${table.name}\n"
    sb ++= "*Note: This meta data document has been automatically generated by the graft engine*\n"
    sb ++= "## Details\n"
    sb ++= s"**Description:** ${table.description}\n\n"
    sb ++= s"**Table Format:** ${table.dataFormat}\n\n"
    sb ++= s"**Table Partitions:** $partitionText\n\n"
    sb ++= s"**Primary Key:** $pkText\n\n"
    sb ++= s"**Database Name:** $dbName\n\n"
    sb ++= s"**Warehouse Path:** $path\n"
    sb ++= "## Table Columns\n***\n"
    table.columns.foreach { c =>
      sb ++= s"### ${c.name}"
      if (table.partitions.contains(c.name)) sb ++= "\n *(partition)*"
      sb ++= "\n\n"
      sb ++= s"**type:** ${c.typeName}\n\n"
      sb ++= s"**description:** ${c.description}\n***\n"
    }
    sb.toString
  }
}

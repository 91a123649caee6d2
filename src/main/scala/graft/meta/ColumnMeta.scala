package graft.meta

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField}
import graft.types.AgnosticType

/** One column of the agnostic metadata format
  * (reference: `etl_manager/specs/table_schema.json:10-100`).
  *
  * `enumValues` keeps the raw JSON scalars (Long | Double | String |
  * Boolean) so round-trips preserve numeric enums like teams.snapshot_month.
  * Constraint properties (pattern/enum/nullable) are declared-only in the
  * reference (`README.md:168`); enforcement lives in [[graft.validate]].
  */
final case class ColumnMeta(
    name: String,
    typeName: String,
    description: String = "",
    pattern: Option[String] = None,
    enumValues: Option[Seq[Any]] = None,
    nullable: Option[Boolean] = None,
    sensitivity: Option[String] = None,
    redacted: Option[Boolean] = None,
) {
  def validate(): Unit = {
    Validation.validateColumnName(name)
    if (!AgnosticType.isValid(typeName))
      throw new IllegalArgumentException(
        s"The data_type provided ($typeName) for column $name is not a " +
          "valid agnostic type")
    sensitivity.foreach(Validation.validateSensitivity)
  }

  /** Spark StructField: agnostic type parsed, constraint/doc properties
    * carried in the field Metadata (SURVEY.md §1.1). */
  def toStructField: StructField = {
    val mb = new MetadataBuilder()
    if (description.nonEmpty) mb.putString("description", description)
    pattern.foreach(mb.putString("pattern", _))
    enumValues.foreach(vs => mb.putStringArray("enum", vs.map(String.valueOf).toArray))
    sensitivity.foreach(mb.putString("sensitivity", _))
    redacted.foreach(mb.putBoolean("redacted", _))
    StructField(
      name,
      AgnosticType.parse(typeName),
      nullable = nullable.getOrElse(true),
      metadata = mb.build())
  }

  def glueType: String = AgnosticType.toGlue(typeName)
}

package graft.meta

/** Name/property validation rules of the reference metadata format
  * (reference: `etl_manager/utils.py:82-124`). */
object Validation {

  private val Punctuation: Set[Char] =
    """!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""".toSet

  /** Lowercase + restricted punctuation ("Athena doesn't like names with
    * dashes" — meta.py:142-146). Default allows only '_'. */
  def validateString(
      s: String,
      allowedChars: String = "_",
      allowUpper: Boolean = false): Unit = {
    if (!allowUpper && s != s.toLowerCase)
      throw new IllegalArgumentException(
        s"string provided must be lowercase: '$s'")
    val invalid = Punctuation -- allowedChars.toSet
    if (s.exists(invalid.contains))
      throw new IllegalArgumentException(
        s"punctuation excluding ($allowedChars) is not allowed in string: '$s'")
  }

  def validateName(s: String): Unit = validateString(s)

  /** Table location: non-empty folder, no leading slash (meta.py:197-208). */
  def validateLocation(location: String): Unit = {
    if (location == null || location.isEmpty)
      throw new IllegalArgumentException(
        "Your table must exist inside a folder in the warehouse. " +
          "Please specify a location.")
    if (location.startsWith("/"))
      throw new IllegalArgumentException("location should not start with a slash")
    validateString(location, allowedChars = "_/-", allowUpper = true)
  }

  /** Supported data formats (specs/table_schema.json:113 enum) minus the
    * dead `par` entry, which the reference accepts at schema level but has
    * no spec template for (meta.py:30-53, fails later at _get_spec) —
    * we reject it up front (SURVEY.md §1.2). */
  val supportedDataFormats: Set[String] =
    Set("avro", "csv", "csv_quoted_nodate", "regex", "orc", "parquet", "json")

  val supportedSensitivities: Set[String] =
    Set("personal_data", "special_category_data")

  def validateDataFormat(f: String): Unit =
    if (!supportedDataFormats.contains(f))
      throw new IllegalArgumentException(
        s"The data_format provided ($f) must match the supported data_type " +
          s"names: ${supportedDataFormats.toSeq.sorted.mkString(", ")}")

  def validateSensitivity(s: String): Unit =
    if (!supportedSensitivities.contains(s))
      throw new IllegalArgumentException(
        s"The sensitivity provided must match the supported sensitivity " +
          s"names: ${supportedSensitivities.toSeq.sorted.mkString(", ")}")

  /** Column names: [a-z0-9_]+ (table_schema.json name pattern). */
  def validateColumnName(s: String): Unit = {
    validateString(s)
    if (!s.matches("[a-z0-9_]+"))
      throw new IllegalArgumentException(s"invalid column name: '$s'")
  }
}

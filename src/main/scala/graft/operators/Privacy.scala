package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / disclosure-risk audits over the tables the catalog marks
  * sensitive. The reference tracks per-column `sensitivity` as metadata and
  * rolls it up per table (`/root/reference/etl_manager/meta.py:211-220`);
  * [[graft.validate.Validate.redactedView]] already enforces the masking
  * half of that contract. These operators audit the OTHER half: whether the
  * columns left unmasked — the quasi-identifiers — still re-identify
  * individuals (Sweeney's k-anonymity) or leak a sensitive attribute by
  * group homogeneity (Machanavajjhala's l-diversity), and how much
  * generalization of a numeric quasi-identifier buys anonymity back.
  *
  * Scale shape (100 TB): every audit is ONE keyed aggregation with
  * map-side partials — equivalence classes are the groupBy keys, so the
  * shuffle carries one row per CLASS, not per person. The ladder audit
  * evaluates all candidate widths in a single corpus pass via a map-side
  * explode (rows × |widths|, then partial-aggregated before the exchange)
  * rather than one scan per rung.
  */
object Privacy {

  private def qi(cols: Seq[String]): Seq[Column] = cols.map(col)

  /** Equivalence classes over the quasi-identifier columns with fewer than
    * `k` members — the re-identification risk set a release has to
    * suppress or generalize away. Output: the violating QI combos with
    * their class size, smallest (riskiest) first.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    df.groupBy(qi(qiCols): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
      .orderBy(col("n") +: qi(qiCols): _*)
  }

  /** l-diversity audit: QI classes whose `sensitive` column takes fewer
    * than `l` DISTINCT values — classes where membership alone discloses
    * the sensitive attribute even when k-anonymity holds. NULL sensitive
    * values carry no disclosure and are not counted as a distinct value.
    */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String], sensitive: String,
      l: Int): DataFrame = {
    require(l >= 2, s"l-diversity needs l >= 2, got $l")
    df.groupBy(qi(qiCols): _*)
      .agg(countDistinct(col(sensitive)).as("distinct_sensitive"),
        count(lit(1)).as("n"))
      .filter(col("distinct_sensitive") < l)
      .orderBy(col("distinct_sensitive") +: col("n") +: qi(qiCols): _*)
  }

  /** Deterministic keyed pseudonymization: each listed column is
    * replaced by `sha256(salt || ':' || value)` — the same (salt, value)
    * always maps to the same token, so joins, grouping and dedup across
    * tables SURVIVE the transform (the property plain redaction destroys)
    * while the raw identifier never leaves the engine. NULLs stay NULL
    * (no token leaks "this row had no value" as a constant). The salt is
    * the secret: without it the token space cannot be enumerated from
    * known identifiers (rainbow-style reversal of an unsalted hash).
    * SHA-256, not md5: md5 is collision-broken, and an engineered
    * collision would silently MERGE two identities into one token.
    * Values are stringified with Spark's canonical cast — for
    * cross-engine replay restrict to string/integer identifier columns
    * (float formatting is engine-specific).
    *
    * Scale shape: a pure codegen'd projection — zero shuffle, zero UDF;
    * composes with [[graft.validate.Validate.redactedView]] (mask what
    * downstream never needs, pseudonymize what it joins on). */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize needs at least one column")
    require(salt.nonEmpty, "pseudonymize needs a non-empty salt")
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c).isNull, lit(null))
          .otherwise(sha2(concat_ws(":", lit(salt), col(c).cast("string")), 256)))
    }
  }

  /** Generalization ladder: for each candidate bucket `width` over the
    * numeric quasi-identifier `numCol` (ascending widths = coarser
    * generalization), report how many equivalence classes the release
    * would have, how many still violate k-anonymity, the smallest class,
    * and the row mass that would need suppression — the table a data
    * owner reads to pick the cheapest width that clears the k floor.
    *
    * ONE corpus pass: widths explode map-side (|widths| is a handful),
    * classes partial-aggregate before the shuffle, and the per-width
    * rollup aggregates the CLASS frame (already metadata-sized).
    * `floor(numCol / width) * width` stays exact: 2-dp fixture values
    * divided by integer widths hit floor boundaries only at exactly
    * representable quotients, identically in any IEEE engine.
    */
  def generalizationLadder(df: DataFrame, qiCols: Seq[String], numCol: String,
      widths: Seq[Long], k: Int): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ > 0), "widths must be positive")
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    val classes = df
      .select(qi(qiCols) :+ col(numCol) :+
        explode(typedLit(widths)).as("width"): _*)
      .select(col("width") +: qi(qiCols) :+
        (floor(col(numCol) / col("width")) * col("width"))
          .cast("long").as("bucket"): _*)
      .groupBy(col("width") +: qi(qiCols) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n"))
    classes.groupBy("width")
      .agg(count(lit(1)).as("classes"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("violating_classes"),
        min(col("n")).as("min_class"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("suppressed_rows"))
      .orderBy("width")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §0 scale guidance: "skewed
  * keys → salting or AQE skew-join"). AQE's skew-join handles sort-merge
  * spills automatically; explicit salting is for the cases AQE can't fix —
  * a single hot key exceeding one executor's memory in a hash aggregate or
  * broadcast-miss join.
  *
  * Left rows get a deterministic-per-row salt in [0, saltFactor); right
  * rows are replicated saltFactor times; the join key becomes (key, salt),
  * splitting each hot key's rows across saltFactor reducers. */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    // salt from the row content hash: stable, no RNG, spreads same-key rows
    val leftSalted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.toIndexedSeq.map(col): _*), lit(saltFactor)).cast("int"))
    val rightSalted = right
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    leftSalted.join(rightSalted, Seq(key, "_salt")).drop("_salt")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (EXTENSION, SURVEY.md §2.K) — the
  * materialized-view / rollup-table discipline: keep a PARTIAL-aggregate
  * state table (algebraic accumulators per group), fold each arriving
  * delta into it with a state-sized merge, and derive the presentable
  * aggregates (averages) only at read time. The reference's pipelines
  * recompute summary tables from scratch per run
  * (`/root/reference/etl_manager/etl.py` re-runs the full job); at 100 TB
  * the whole point is to NEVER rescan history: each maintenance cycle
  * scans only the delta (O(|delta|)), and the merge shuffles only
  * group-cardinality-sized state rows — the classic self-maintainable
  * view result for distributive/algebraic aggregates (Gupta & Mumick,
  * "Maintenance of Materialized Views", IEEE DE Bulletin 1995).
  *
  * Exactness contract: counts are longs, sums run in DECIMAL(28,4)
  * (associative and commutative under ANY accumulation order — merge
  * order can never change a bit), min/max are idempotent lattice ops.
  * Consequently `merge(state(a), state(b)) == state(a ∪ b)` EXACTLY, not
  * approximately, which the spec and the DuckDB oracle both pin.
  *
  * State schema by convention: keys ++ `n_rows` ++ per measure m:
  * `sum_m` DECIMAL, `cnt_m` (non-null count), `min_m`, `max_m`. AVG is
  * deliberately NOT in the state — it is not self-maintainable; it
  * derives as sum/cnt in [[finish]].
  */
object IncrementalAgg {

  private def dec(c: String): Column = col(c).cast("decimal(28,4)")

  /** Collapse `df` to its partial-aggregate state: one row per key group,
    * algebraic accumulators only. One scan, map-side partial agg. */
  def state(df: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty, "state needs keys and measures")
    val aggs = count(lit(1)).as("n_rows") +: measures.flatMap { m =>
      Seq(
        // pin the accumulator type so state and merged-state schemas are
        // identical (sum() would otherwise widen to DECIMAL(38,4))
        sum(dec(m)).cast("decimal(28,4)").as(s"sum_$m"),
        count(col(m)).as(s"cnt_$m"),
        min(dec(m)).as(s"min_$m"),
        max(dec(m)).as(s"max_$m"))
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge state frames (any number, any split of the underlying data):
    * union + one keyed re-aggregation over state-sized inputs. Fully
    * associative/commutative — re-merging merged states is valid, so a
    * maintenance pipeline can fold daily states into monthly into yearly
    * without ever touching row-level data again. */
  def merge(keys: Seq[String], measures: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    val stateCols = (keys :+ "n_rows") ++
      measures.flatMap(m => Seq(s"sum_$m", s"cnt_$m", s"min_$m", s"max_$m"))
    val u = states.map(_.select(stateCols.map(col): _*)).reduce(_ unionByName _)
    // coalesce pins the counts back to NOT NULL (sum() is nullable in
    // the abstract; a group only exists here because some state row has
    // it) so state and merged-state schemas are bit-identical
    val aggs = coalesce(sum(col("n_rows")), lit(0L)).as("n_rows") +:
      measures.flatMap { m =>
      Seq(
        // re-sum at the STATE's own type (already decimal) — exact
        sum(col(s"sum_$m")).cast("decimal(28,4)").as(s"sum_$m"),
        coalesce(sum(col(s"cnt_$m")), lit(0L)).as(s"cnt_$m"),
        min(col(s"min_$m")).as(s"min_$m"),
        max(col(s"max_$m")).as(s"max_$m"))
    }
    u.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Read-time projection: exact decimal accumulators to stable DOUBLEs
    * plus the derived averages (sum/cnt — NOT maintained in state). */
  def finish(state: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    val cols = keys.map(col) ++ Seq(col("n_rows")) ++ measures.flatMap { m =>
      Seq(
        col(s"sum_$m").cast("double").as(s"sum_$m"),
        round(col(s"sum_$m").cast("double") / col(s"cnt_$m"), 6).as(s"avg_$m"),
        col(s"min_$m").cast("double").as(s"min_$m"),
        col(s"max_$m").cast("double").as(s"max_$m"))
    }
    state.select(cols: _*)
  }
}

package graft

/** The correctness gate's own guard: a registered query that returns 0
  * rows at the gate SF has a vacuous oracle row — 0 == 0 hashes can never
  * fail, so the entry LOOKS green while verifying nothing (r9 shipped
  * three such rows: q_join_anti, q_except, q_subquery_scalar). This spec
  * enumerates EVERY SparkEntry query against the gate fixture and fails
  * on any empty result, so a future fixture regeneration or predicate
  * edit cannot silently re-vacuate a gate row. The allowlist is the
  * explicit escape hatch — and it must stay empty. */
class FixtureEntropySpec extends SparkTestBase {

  test("every registered query returns >= 1 row at the gate SF; the 0-row allowlist is empty") {
    val gateDir = sf("sf0.01")
    val allowZero = Set.empty[String]
    assert(allowZero.isEmpty, "the 0-row allowlist exists to be empty")
    val zeroRow = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val empty =
          try fn(spark, gateDir).isEmpty
          catch {
            case e: Exception =>
              fail(s"$name failed to build/run at the gate SF: $e")
          }
        if (empty && !allowZero(name)) Some(name) else None
    }
    assert(zeroRow.isEmpty,
      s"vacuous gate rows (0 rows at sf0.01 -> hash check can never fail): $zeroRow")
  }
}

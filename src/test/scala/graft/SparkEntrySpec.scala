package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants the README quotes instead of hand-maintaining
  * counts: every query is oracled, and the bench set is the query set
  * minus only the documented side-effecting probes. */
class SparkEntrySpec extends AnyFunSuite {

  test("every registered query has a DuckDB oracle") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }

  test("bench set is a subset of the registry") {
    assert(SparkEntry.benchQueries.toSet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.benchQueries.nonEmpty)
  }
}

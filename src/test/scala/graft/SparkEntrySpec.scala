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

  test("README's stated query count matches the registry") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val m = """\*\*Every registered query has a DuckDB oracle\*\* \((\d+)"""
      .r.findFirstMatchIn(readme)
    assert(m.isDefined, "README no longer states the oracle-count sentence")
    assert(m.get.group(1).toInt === SparkEntry.queries.size,
      "README's query count drifted from SparkEntry.queries.size")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants the README quotes instead of hand-maintaining
  * counts: every query is oracled, and the bench set is the query set
  * minus only the documented side-effecting probes. */
class SparkEntrySpec extends AnyFunSuite {

  test("every registered query has a DuckDB oracle") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }

  test("no oracle SQL interpolated a null Scala constant") {
    // Object-initialization order bites silently: a `val` oracle that
    // interpolates a sibling `val` defined LATER in the object embeds
    // the literal string "null" into its SQL (caught live in q104,
    // where "(null) AS sig" made a whole CTE silently NULL). Oracles
    // spell SQL NULL uppercase, so any lowercase bare `null` is an
    // uninitialized Scala constant.
    val bare = """(?<![A-Za-z_])null(?![A-Za-z_])""".r
    for ((name, sql) <- SparkEntry.oracleSql) {
      assert(sql != null, s"$name oracle SQL is itself null")
      bare.findFirstMatchIn(sql).foreach { hit =>
        fail(s"$name oracle embeds a null Scala constant near: " +
          sql.slice(hit.start - 40, hit.end + 20))
      }
    }
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

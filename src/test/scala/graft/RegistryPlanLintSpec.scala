package graft

/** Whole-registry plan lint: every batch query in the bench set is
  * PLANNED (not executed) at sf0.001 and its physical plan checked
  * against the engine's standing anti-pattern contracts:
  *
  *   - no `CartesianProductExec` — the repo's crossJoins are all
  *     1-row aggregate broadcasts, which plan as
  *     BroadcastNestedLoopJoin; a real cartesian product appearing
  *     anywhere means a broadcast contract silently broke;
  *   - no Python/batch-eval UDFs — the §2.8 policy is native
  *     expressions and typed Aggregators only.
  *
  * Streaming queries are excluded (building them RUNS the stream to
  * completion by design — their plan contracts live in their own
  * specs), as are the side-effecting fixtures the bench also skips.
  * Queries whose construction performs bounded driver work (model
  * scalars, profiles) execute that work here — at sf0.001 that is
  * part of the point: the lint also proves every registered builder
  * still constructs. */
class RegistryPlanLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // Driven by the streaming registry itself, not a name substring: a
  // future BATCH query whose name happens to contain "stream" stays
  // under lint coverage (advisor note, round 9).
  private def isStreaming(name: String) =
    graft.queries.StreamingQ.all.contains(name)

  /** Cap on how many times one plan may physically RE-SCAN the same
    * source table (cached/checkpointed subtrees don't count — the
    * collect does not descend into InMemoryTableScan). The r10 audit
    * measured the registry's honest multi-pass algorithms at ≤ 6
    * same-table scans; q184's accidental nine-scan plan (a
    * multi-branch reference to an unmaterialized build) and q185's
    * triple BM25 re-derivation both sat ABOVE this bar before their
    * fixes — exactly the class this lint exists to catch. */
  private val MaxSameTableScans = 7

  private val TableName =
    ("(lineitem|orders|customer|supplier|part|nation|region|events|" +
      "documents|embeddings)").r

  test("no registered batch plan contains a cartesian product or a UDF, " +
      "and none re-scans one table more than 7 times") {
    graft.queries.Tables.prep(spark)
    val names = SparkEntry.benchQueries.filterNot(isStreaming)
    assert(names.size > 130, s"lint lost coverage: ${names.size}")
    val offenders = names.flatMap { name =>
      val ep = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan
      val physical = ep match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val plan = physical.toString
      // Attribute each scan by its file LOCATION, never by toString:
      // the node's string leads with output columns, so a scan
      // projecting l_partkey would match 'part' before the path's
      // real table — merging counts across tables and splitting them
      // within one (reviewer find, r10 continuation)
      val scanCounts = physical.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.mkString(",")
      }.flatMap(loc => TableName.findFirstIn(loc))
        .groupBy(identity).view.mapValues(_.length)
      val worst = scanCounts.maxByOption(_._2)
      val bad = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "PythonUDF" -> plan.contains("PythonUDF"),
        "BatchEvalPython" -> plan.contains("BatchEvalPython"),
        s"re-scans ${worst.map(_._1).getOrElse("")} ${worst.map(_._2)
          .getOrElse(0)}x" ->
          worst.exists(_._2 > MaxSameTableScans)
      ).collect { case (what, true) => s"$name: $what" }
      bad
    }
    assert(offenders.isEmpty,
      s"plan-lint violations:\n${offenders.mkString("\n")}")
  }
}

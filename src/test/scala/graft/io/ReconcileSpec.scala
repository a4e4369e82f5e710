package graft.io

import graft.SparkSpec

/** Per-partition digest reconciliation: every status arm on
  * constructed loads, including the partition-presence arms q109's
  * perturbations cannot reach. */
class ReconcileSpec extends SparkSpec {

  test("all five statuses: match, count/content mismatch, missing either side") {
    import spark.implicits._
    val a = Seq(
      (1L, 10L, "p1"), (2L, 20L, "p1"), // p1: identical in b -> match
      (3L, 30L, "p2"),                  // p2: b has an extra row
      (4L, 40L, "p3"),                  // p3: same count, changed value
      (5L, 50L, "p4")                   // p4: absent from b
    ).toDF("id", "v", "part")
    val b = Seq(
      (1L, 10L, "p1"), (2L, 20L, "p1"),
      (3L, 30L, "p2"), (30L, 33L, "p2"),
      (4L, 41L, "p3"),
      (6L, 60L, "p5") // p5: absent from a
    ).toDF("id", "v", "part")
    val out = Reconcile.compare(a, b, "part", Seq("id", "v"))
      .orderBy("part").collect()
      .map(r => (r.getString(0), r.getString(3)))
    assert(out.toSeq === Seq(
      "p1" -> "match",
      "p2" -> "count_mismatch",
      "p3" -> "content_mismatch",
      "p4" -> "missing_b",
      "p5" -> "missing_a"))
  }

  test("digest is row-order and partitioning insensitive") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (i, i * 7L, s"p${i % 3}"))
    val a = rows.toDF("id", "v", "part").repartition(13)
    val b = new scala.util.Random(20260813L).shuffle(rows).toDF("id", "v", "part")
      .repartition(3)
    val statuses = Reconcile.compare(a, b, "part", Seq("id", "v"))
      .select("status").collect().map(_.getString(0)).toSet
    assert(statuses === Set("match"))
  }
}

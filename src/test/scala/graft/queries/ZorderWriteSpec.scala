package graft.queries

import graft.SparkSpec

/** q192: the PHYSICAL effect of the written z-order layout, measured
  * through the parquet scan's post-row-group-skip output rows (see
  * [[graft.ZorderProbe]] for the measurement mechanics and
  * BENCH_NOTES "r10 z-order write" for the sf0.1 skip-ratio table). */
class ZorderWriteSpec extends SparkSpec {

  test("the written z-order layout prunes the pk-range scan the " +
      "linear layout cannot prune at all") {
    val dir = "/root/testdata/sf0.001"
    Tables.prep(spark)
    val (lin, zo) = Relational.zorderWritten(spark, dir)
    val (linOkScan, linOkMatch, _, linTotal) =
      graft.ZorderProbe.measure(spark, lin, "ok")
    val (linPkScan, linPkMatch, _, _) =
      graft.ZorderProbe.measure(spark, lin, "pk")
    val (zoOkScan, zoOkMatch, _, zoTotal) =
      graft.ZorderProbe.measure(spark, zo, "ok")
    val (zoPkScan, zoPkMatch, _, _) =
      graft.ZorderProbe.measure(spark, zo, "pk")
    // both layouts hold the same table and agree on every answer
    assert(linTotal === zoTotal && linTotal > 0)
    assert(linOkMatch === zoOkMatch && linPkMatch === zoPkMatch)
    // linear: pk is uncorrelated with the sort key, so footer stats
    // buy NOTHING — the pk query physically reads the whole table
    assert(linPkScan === linTotal,
      s"linear pk scan unexpectedly pruned: $linPkScan/$linTotal")
    // z-order: the same pk query is pruned to a strict fraction —
    // the multi-dimensional clustering the layout exists to buy
    assert(zoPkScan * 2 < linPkScan,
      s"zorder pk scan $zoPkScan vs linear $linPkScan")
    // and the ok query still prunes on both layouts (z pays a premium
    // over the perfect linear clustering but never degenerates)
    assert(linOkScan < linTotal)
    assert(zoOkScan < zoTotal)
  }
}

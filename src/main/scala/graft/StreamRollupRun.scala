package graft

/** Back-compat entry for the ORIGINAL kill-and-resume proof (the
  * additive streamed rollup — round 13); the generalized per-cell
  * runner is [[StreamCellRun]], which this delegates to with
  * cell = additive. Usage: `StreamRollupRun <arrivalDir> <checkpoint>
  * <storeRoot> [crashAfterBatch]`. */
object StreamRollupRun {
  def main(args: Array[String]): Unit =
    StreamCellRun.main("additive" +: args)
}

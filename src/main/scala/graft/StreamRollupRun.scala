package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Standalone runner for the ADDITIVE streamed rollup (q222's sink) —
  * the process the kill-and-resume proof (round-12 verdict, missing
  * #4) murders mid-stream: ColdRestartSpec launches this JVM against
  * an arrival directory, lets one batch COMMIT ITS ARTIFACT, then the
  * `crash-after` arm halts the JVM inside foreachBatch — after the
  * sink published, BEFORE Structured Streaming wrote the batch's
  * commit log entry. A second launch resuming the SAME
  * checkpointLocation therefore RE-DELIVERS that batch with its
  * original id (the WAL replay contract), and the artifact's
  * on-storage high-water mark must make the re-delivery a content
  * no-op while the remaining files land as new batches — the final
  * rollup equals the uninterrupted run's.
  *
  * Usage: `StreamRollupRun <arrivalDir> <checkpoint> <storeRoot>
  * [crashAfterBatch]`. One file per trigger, so the spec controls
  * batch boundaries by writing one file per slice. The lineage passed
  * to the sink is the checkpoint location — resuming it keeps the
  * batch-id contract; a different checkpoint against the same store
  * root fails loudly (the lineage guard, exercised by the spec's
  * third launch). */
object StreamRollupRun {
  def main(args: Array[String]): Unit = {
    val arrival = args(0)
    val ckpt = args(1)
    val root = args(2)
    val crashAfter = if (args.length >= 4) args(3).toLong else -1L
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the arrival files all share one schema; the static read is the
    // standard way to hand it to the streaming file source
    val schema = spark.read.parquet(arrival).schema
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(arrival)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.queries.WarehouseIvm.applyRollupBatchAdditive(
          spark, batch, id, ckpt, root)
        println(s"committed batch $id")
        if (crashAfter >= 0 && id >= crashAfter) {
          // die like a crash, not an exit: no shutdown hooks, no
          // streaming commit-log write for this batch — the resume
          // JVM must see the batch as in-flight and re-deliver it
          System.out.flush()
          Runtime.getRuntime.halt(137)
        }
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q168 hop-knob sweep: recall@5 vs exact and wall time for the
  * graph-beam walk at H = 1..4 — the q164-style tuning curve for the
  * graph-ANN dial (BENCH_NOTES "r10 beam hop sweep"). Dev/bench
  * tooling, not part of the driver contract. */
object BeamSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = graft.io.Config.fromEnv.int("SPARK_GRAFT_CPUS", 32).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Tables.prep(spark)
    val sim = graft.queries.Similarity
    val exact5 = sim.cosineTopK(spark, sfDir).filter(col("rnk") <= 5)
      .select(col("qid"), col("vec_id")).persist()
    val nq = exact5.select(countDistinct(col("qid"))).head.getLong(0)
    // warm the graph + vector artifacts so per-H timings measure the
    // walk, not the shared index build
    sim.graphBeamWalk(spark, sfDir, 1).write.format("noop")
      .mode("overwrite").save()
    for (h <- 1 to 4) {
      // time ONLY the walk's own materialization; the recall join and
      // counts run outside the clock (they scale with exact5, not
      // with the hop knob the sweep measures — reviewer find, r10)
      val t0 = System.nanoTime()
      val top = sim.graphBeamWalk(spark, sfDir, h)
        .select(col("qid"), col("vec_id")).localCheckpoint(true)
      val dt = (System.nanoTime() - t0) / 1e9
      val hits = top.join(exact5, Seq("qid", "vec_id"), "left_semi").count()
      val n = top.count()
      println(f"SWEEP hops=$h recall5=${hits.toDouble / (5 * nq)}%.4f " +
        f"results=$n time=$dt%.2f s")
    }
    spark.stop()
  }
}

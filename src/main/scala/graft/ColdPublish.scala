package graft

import org.apache.spark.sql.SparkSession

/** Standalone artifact publisher — the "yesterday" process of the
  * cold-restart proof (reference main.py:201-209: one process per
  * day). Builds the seven incremental-maintenance base artifacts and
  * publishes them to an [[graft.io.ArtifactStore]], then EXITS; a
  * different JVM (ColdRestartSpec, or an operator's next daily run)
  * reads them back cold.
  *
  * Usage: `ColdPublish <sfDir> <storeRoot>` (full base publish), or
  * `ColdPublish <sfDir> <storeRoot> <chainStep>` — one "day" of the
  * three-process chained-restart proof: read the previous (dead)
  * process's published index version, merge this day's slice, publish
  * the next version, exit. */
object ColdPublish {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val root = args(1)
    val cpus = graft.io.Config.fromEnv.int("SPARK_GRAFT_CPUS", 4).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length >= 3) {
      val m = graft.queries.ColdRestart.chainPublish(
        spark, dir, root, args(2).toInt)
      println(s"published ${m.name} v${m.version} rows=${m.rows}")
    } else {
      val manifests = graft.queries.ColdRestart.publishAll(spark, dir, root)
      manifests.foreach(m =>
        println(s"published ${m.name} v${m.version} rows=${m.rows}"))
    }
    spark.stop()
  }
}

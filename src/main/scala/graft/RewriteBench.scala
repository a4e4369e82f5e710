package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-loop measurement for [[graft.plans.WindowTopKRewrite]]:
  * `RewriteBench [nRows] [nGroups]` times the naive window top-k
  * (which Spark itself already improves with WindowGroupLimit) against
  * the same query under the graft extension on a generated corpus.
  * Not part of the driver contract. */
object RewriteBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000000L
    val groups = if (args.length > 1) args(1).toInt else 100
    val cpus = graft.io.Config.fromEnv.int("SPARK_GRAFT_CPUS", 32).toString

    def mk(s: SparkSession) = s.range(n).select(
      (col("id") % groups).as("grp"),
      // multiply, not divide: Divide is unconditionally nullable
      // (null on /0 under non-ANSI) and the rewrite's correctness
      // guard rejects nullable scores
      (hash(col("id")).cast("double") * lit(1e-9)).as("score"),
      col("id").as("vid"))

    def run(s: SparkSession, label: String): Unit = {
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("score").desc, col("vid").asc)
      val df = mk(s).withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"TIMING $label pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val plan = df.queryExecution.executedPlan.toString
      println(s"PLAN $label window=${plan.contains("Window")} " +
        s"objHashAgg=${plan.contains("ObjectHashAggregate")}")
    }

    val plain = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    plain.sparkContext.setLogLevel("WARN")
    run(plain, "naive-window")

    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.graft.rewriteWindowTopKDistinct", "true")
      .withExtensions(new graft.plans.GraftExtensions())
      .getOrCreate()
    // optional 3rd arg: ObjectHashAggregate sort-fallback threshold
    // (default 128 in-memory keys — the dominant term at high group
    // cardinality)
    if (args.length > 2)
      ext.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", args(2))
    run(ext, "graft-rewrite")
    ext.stop()
  }
}

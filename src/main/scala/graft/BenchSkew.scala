package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured comparison of the three skew strategies on one skewed
  * join (the claim SkewJoin's doc makes — "AQE's skew-join split
  * remains the first-line fix; this operator is the explicit form for
  * extreme single-key skew" — measured, not argued; results recorded
  * in BENCH_NOTES.md):
  *
  *   - `plain`  : SMJ, AQE off — the melted-reducer baseline; one
  *                task sorts/joins the entire hot key.
  *   - `aqe`    : SMJ, AQE on with the skew-split thresholds lowered
  *                to fire at local-test sizes (the defaults target
  *                256 MB partitions).
  *   - `salted` : SkewJoin.autoSalted, AQE off — explicit salting,
  *                including its own profiling pass.
  *
  * The dimension side is forced out of broadcast range
  * (autoBroadcastJoinThreshold=-1): a broadcastable dim never has a
  * skew problem in the first place — the comparison only exists in
  * the SMJ regime. Usage:
  * `run-class.sh graft.BenchSkew [nRows] [hotShare%]`. */
object BenchSkew {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val hotPct = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val cpus = graft.io.Config.fromEnv.int("SPARK_GRAFT_CPUS", 32).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    // hotPct% of rows on key 7; the rest uniform over 100k keys
    def big: DataFrame = spark.range(n).select(
      when(pmod(col("id"), lit(100)) < hotPct, lit(7L))
        .otherwise(pmod(hash(col("id")), lit(100000)).cast("long"))
        .as("k"),
      col("id").as("payload"))
    def small: DataFrame = spark.range(100000L)
      .select(col("id").as("dk"), (col("id") * 3).as("dim_v"))

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      // full-plan materialization (the Bench noop-write discipline)
      df.write.format("noop").mode("overwrite").save()
      println(f"""{"variant":"$label","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    def agg(j: DataFrame): DataFrame =
      j.groupBy(col("dk")).agg(count(lit(1)).as("cnt"),
        sum(col("dim_v")).as("s"))

    def withConf(kv: (String, String)*)(body: => Unit): Unit = {
      val prev = kv.map { case (k, _) => k -> spark.conf.get(k) }
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
    }

    // warm-up (shuffle service init, codegen)
    time("warmup")(agg(big.join(small, col("k") === col("dk"))))
    withConf("spark.sql.adaptive.enabled" -> "false") {
      time("plain_smj_aqe_off")(agg(big.join(small, col("k") === col("dk"))))
    }
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m") {
      time("aqe_skew_split")(agg(big.join(small, col("k") === col("dk"))))
    }
    withConf("spark.sql.adaptive.enabled" -> "false") {
      time("salted_aqe_off")(
        agg(graft.operators.SkewJoin.autoSalted(big, "k", small, "dk")))
    }
    // skew known ahead of planning: no profiling pass
    withConf("spark.sql.adaptive.enabled" -> "false") {
      time("salted_known_keys")(
        agg(graft.operators.SkewJoin.saltedForKeys(
          big, "k", small, "dk", Seq(7L))))
    }
    spark.stop()
  }
}

package graft.io

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S5-S8 idempotent date-partitioned load
  * (reference main.py:1500-1578; dedup rationale README.md:111). */
class IdempotentWriterSpec extends SparkSpec {

  test("whitelist guard (S8, main.py:1481-1497)") {
    IdempotentWriter.requireAllowed("t1", Set("t1", "t2"))
    intercept[IllegalArgumentException] {
      IdempotentWriter.requireAllowed("evil", Set("t1", "t2"))
    }
  }

  test("quarantine splits rows missing keys explicitly (F2)") {
    import spark.implicits._
    val df = Seq(
      (Some(1), Some("2024-01-01"), "a"),
      (None, Some("2024-01-01"), "b"),
      (Some(3), None, "c")).toDF("id", "fecha", "v")
    val (ok, bad) = IdempotentWriter.quarantine(df, Seq("id", "fecha"))
    assert(ok.count() === 1)
    assert(bad.count() === 2)
    assert(ok.head.getString(2) === "a")
  }

  test("idempotency: writing the same date twice equals writing it once") {
    import spark.implicits._
    val dir = Files.createTempDirectory("idem_spec").toString
    val day1 = Seq((1, "2024-01-01"), (2, "2024-01-01")).toDF("id", "fecha")
    val day2 = Seq((3, "2024-01-02")).toDF("id", "fecha")
    IdempotentWriter.overwritePartitions(day1.union(day2), dir)
    // re-run of day1 (the reference's daily re-run): must replace, not append
    IdempotentWriter.overwritePartitions(day1, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 3)
    assert(back.filter(col("fecha") === "2024-01-01").count() === 2)
    assert(back.filter(col("fecha") === "2024-01-02").count() === 1)
  }

  test("untouched partitions survive a partial overwrite (dynamic mode)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("idem_spec2").toString
    IdempotentWriter.overwritePartitions(
      Seq((1, "2024-01-01"), (2, "2024-01-02")).toDF("id", "fecha"), dir)
    IdempotentWriter.overwritePartitions(
      Seq((9, "2024-01-02")).toDF("id", "fecha"), dir)
    val back = spark.read.parquet(dir)
    assert(back.filter(col("fecha") === "2024-01-01").count() === 1) // kept
    assert(back.filter(col("fecha") === "2024-01-02")
      .select("id").head.getInt(0) === 9) // replaced
  }

  test("load_date audit column is appended (DDL default, main.py:1400)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("idem_spec3").toString
    IdempotentWriter.overwritePartitions(
      Seq((1, "2024-01-01")).toDF("id", "fecha"), dir)
    assert(spark.read.parquet(dir).columns.contains("load_date"))
  }

  test("property: writing any date-partitioned row set twice equals once") {
    import spark.implicits._
    val genRows = org.scalacheck.Gen.nonEmptyListOf(for {
      id <- org.scalacheck.Gen.choose(0, 50)
      d <- org.scalacheck.Gen.oneOf(
        "2024-01-01", "2024-01-02", "2024-01-03")
    } yield (id, d))
    val samples = Iterator.continually(genRows.sample).flatten.take(8).toSeq
    for (rows <- samples) {
      val dir = Files.createTempDirectory("idem_prop").toString
      val df = rows.toDF("id", "fecha")
      IdempotentWriter.overwritePartitions(df, dir, addLoadDate = false)
      // the daily re-run: replace, never append
      IdempotentWriter.overwritePartitions(df, dir, addLoadDate = false)
      val back = spark.read.parquet(dir)
        .select(col("id"), col("fecha").cast("string"))
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
      assert(back === rows.sorted, s"rows $rows")
    }
  }

  test("mergeUpsert: update + insert + survivors; untouched partitions " +
      "keep their exact files; re-apply is a no-op") {
    import spark.implicits._
    val dir = Files.createTempDirectory("merge_spec").resolve("t").toString
    def files(part: String): Set[String] = {
      val d = java.nio.file.Paths.get(dir, s"fecha=$part")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(d).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    }
    val base = Seq((1, 10.0, "2024-01-01"), (2, 20.0, "2024-01-01"),
      (3, 30.0, "2024-01-02")).toDF("id", "amount", "fecha")
    IdempotentWriter.overwritePartitions(base, dir, addLoadDate = false)
    val day2Files = files("2024-01-02")
    // batch: update id=1, insert id=4 — touches ONLY 2024-01-01
    val batch = Seq((1, 11.0, "2024-01-01"), (4, 40.0, "2024-01-01"))
      .toDF("id", "amount", "fecha")
    IdempotentWriter.mergeUpsert(batch, dir, "id")
    def state() = spark.read.parquet(dir)
      .select(col("id"), col("amount"), col("fecha").cast("string"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2)))
      .toSeq.sorted
    assert(state() === Seq(
      (1, 11.0, "2024-01-01"), // updated
      (2, 20.0, "2024-01-01"), // survivor in the touched partition
      (3, 30.0, "2024-01-02"), // untouched partition intact
      (4, 40.0, "2024-01-01"))) // inserted
    // the untouched partition was NOT rewritten: same physical files
    assert(files("2024-01-02") === day2Files,
      "merge must rewrite only touched partitions")
    // idempotency: re-applying the identical batch changes nothing
    IdempotentWriter.mergeUpsert(batch, dir, "id")
    assert(state() === Seq((1, 11.0, "2024-01-01"), (2, 20.0, "2024-01-01"),
      (3, 30.0, "2024-01-02"), (4, 40.0, "2024-01-01")))
  }

  test("mergeUpsert on a fresh path creates the table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("merge_fresh").resolve("t").toString
    val batch = Seq((7, 70.0, "2024-02-01")).toDF("id", "amount", "fecha")
    IdempotentWriter.mergeUpsert(batch, dir, "id")
    assert(spark.read.parquet(dir).count() === 1)
  }

  test("q189: a single-date read PARTITION-prunes the fecha warehouse " +
      "to exactly one partition (main.py:1535's hot predicate)") {
    val dir = "/root/testdata/sf0.001"
    val wh = graft.queries.Reference.fechaWarehouse(spark, dir)
    val df = graft.queries.Reference.dailyEventsRead(spark, wh, "2024-01-05")
    // AQE wraps the physical plan; collect() does not descend into it
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size === 1, plan.toString)
    val scan = scans.head
    // The fecha predicate must land in partitionFilters (directory
    // pruning before any file is opened), not merely dataFilters.
    assert(scan.partitionFilters.exists(_.toString.contains("fecha")),
      s"partitionFilters: ${scan.partitionFilters}")
    // and the listing must prune to the ONE matching fecha directory
    assert(scan.selectedPartitions.partitionCount === 1,
      s"selected ${scan.selectedPartitions.partitionCount} partitions")
    // correctness of the pruned read: same totals as the source filter
    val n = df.agg(sum(col("n"))).head.getLong(0)
    val expected = graft.queries.Tables.events(spark, dir)
      .filter(to_date(col("ts")) === lit("2024-01-05").cast("date")).count()
    assert(n === expected && expected > 0)
  }
}

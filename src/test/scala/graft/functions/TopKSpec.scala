package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded-heap top-k aggregate: ordering parity with the
  * row_number window it replaces, and DISTINCT semantics for
  * structurally duplicated entries (an LSH pair arriving once per
  * matching band). */
class TopKSpec extends SparkSpec {

  test("topK matches distinct + row_number window on duplicated input") {
    import spark.implicits._
    // 3 groups x 40 candidates, every candidate duplicated 1..5 times
    // (like a pair matching in 1..5 LSH bands); ties in cos across
    // different vec_ids included.
    val rows = for {
      g <- 0 until 3
      i <- 0 until 40
      copy <- 0 until (i % 5 + 1)
    } yield (g, (i % 10) / 10.0, i.toLong + 100 * g, copy)
    val df = rows.toDF("grp", "cos", "vec_id", "copy").drop("copy")
      .repartition(4) // duplicates spread across partial buffers

    val agg = df.groupBy($"grp")
      .agg(TopK.topK(7)($"cos", $"vec_id").as("tk"))
      .select($"grp", posexplode($"tk").as(Seq("i", "s")))
      .select($"grp", ($"i" + 1).as("rnk"), $"s.vec_id", $"s.cos")

    val w = Window.partitionBy($"grp").orderBy($"cos".desc, $"vec_id".asc)
    val win = df.distinct()
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 7)
      .select($"grp", $"rnk", $"vec_id", $"cos")

    val a = agg.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
    val b = win.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
    assert(a.nonEmpty)
    assert(a.toSeq === b.toSeq)
  }

  test("NaN cosines rank deterministically (largest, like the window " +
      "ordering) and NaN duplicates collapse") {
    import spark.implicits._
    val nan = Double.NaN
    // duplicated NaN entry (a band-duplicate pair with a zero-norm
    // vector) + finite entries, shuffled across partitions
    val df = Seq(
      ("g", nan, 7L), ("g", nan, 7L), ("g", 0.9, 1L), ("g", nan, 3L),
      ("g", 0.8, 2L), ("g", 0.9, 0L))
      .toDF("grp", "cos", "vec_id").repartition(3)
    val out = df.groupBy($"grp")
      .agg(TopK.topK(4)($"cos", $"vec_id").as("tk"))
      .select(posexplode($"tk").as(Seq("i", "s")))
      .select($"s.vec_id").as[Long].collect().toSeq
    // NaN sorts largest (Spark/DuckDB window parity), ties by vec_id;
    // the duplicate (NaN, 7) appears once
    assert(out === Seq(3L, 7L, 0L, 1L))
  }

  test("topK is a no-op dedup for unique entries and keeps k best") {
    import spark.implicits._
    val df = (0 until 100).map(i => ("g", i / 100.0, i.toLong))
      .toDF("grp", "cos", "vec_id")
    val out = df.groupBy($"grp")
      .agg(TopK.topK(5)($"cos", $"vec_id").as("tk"))
      .select(posexplode($"tk").as(Seq("i", "s")))
      .select($"s.vec_id").as[Long].collect().toSeq
    assert(out === Seq(99L, 98L, 97L, 96L, 95L))
  }
}

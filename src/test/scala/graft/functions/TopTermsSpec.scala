package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The string-keyed bounded-heap top-k ([[TopTermsAgg]]): ordering
  * parity with the (score DESC, term ASC) row_number window it
  * replaces, including score ties broken lexicographically and
  * duplicate entries collapsing. */
class TopTermsSpec extends SparkSpec {

  test("topTerms matches distinct + row_number window, ties broken by term") {
    import spark.implicits._
    // 2 groups x 30 terms; scores collide in bands of 5 so the
    // lexicographic tiebreak decides most ranks; every entry
    // duplicated 1..3 times across partitions.
    val rows = for {
      g <- 0 until 2
      i <- 0 until 30
      copy <- 0 until (i % 3 + 1)
    } yield (g, (i / 5).toDouble, f"term_${(i * 7) % 30}%02d", copy)
    val df = rows.toDF("grp", "score", "term", "copy").drop("copy")
      .repartition(4)

    val agg = df.groupBy($"grp")
      .agg(TopK.topTerms(6)($"score", $"term").as("tt"))
      .select($"grp", posexplode($"tt").as(Seq("i", "s")))
      .select($"grp", ($"i" + 1).as("rnk"), $"s.term", $"s.score")

    val w = Window.partitionBy($"grp").orderBy($"score".desc, $"term".asc)
    val win = df.distinct()
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 6)
      .select($"grp", $"rnk", $"term", $"score")

    val a = agg.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getString(2), r.getDouble(3))).sorted
    val b = win.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getString(2), r.getDouble(3))).sorted
    assert(a.nonEmpty)
    assert(a.toSeq === b.toSeq)
  }

  test("k larger than the group returns the whole group, best first") {
    import spark.implicits._
    val df = Seq(("g", 1.0, "b"), ("g", 1.0, "a"), ("g", 2.0, "z"))
      .toDF("grp", "score", "term")
    val out = df.groupBy($"grp")
      .agg(TopK.topTerms(10)($"score", $"term").as("tt"))
      .select(explode($"tt").as("s"))
      .select($"s.term").as[String].collect().toSeq
    assert(out === Seq("z", "a", "b"))
  }
}

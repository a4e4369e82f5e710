package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity of the native rolling_min_hash kernel with the
  * higher-order-lambda composition it replaces (the q59 fingerprint
  * definition, which the DuckDB oracle still spells out). */
class RollingMinHashSpec extends SparkSpec {

  test("native kernel matches the lambda form, including multibyte text") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaa",
      "abcdefgh",                        // exactly W
      "中文文本测试内容更多", // CJK
      "mixed éè accents and ascii text here",
      "0123456789 punctuation!? and, more. text;")
    val df = texts.toDF("s")
    val rows = df
      .withColumn("native", expr("rolling_min_hash(s, 8)"))
      .withColumn("lambda", expr(
        """array_min(transform(sequence(1, length(s) - 7),
          |  i -> aggregate(sequence(0, 7), 0L,
          |         (acc, j) -> (acc * 131 + ascii(substr(s, i + j, 1)))
          |                     % 1000000007L)))""".stripMargin))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"mismatch on '${r.getString(0)}'")
    }
  }

  test("strings shorter than the window return null") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val out = Seq("short", "").toDF("s")
      .select(expr("rolling_min_hash(s, 8)").as("h")).collect()
    assert(out.forall(_.isNullAt(0)))
  }
}

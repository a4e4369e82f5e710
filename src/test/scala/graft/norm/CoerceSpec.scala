package graft.norm

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** X1/X3/X4/X5 edge-case tests, pinned to the reference's exact
  * semantics (main.py:425-462 time conversion, 501-528 coercions,
  * 1239/1295 day-first dates). */
class CoerceSpec extends SparkSpec {

  private def evalTime(inputs: Seq[String]): Seq[java.lang.Double] = {
    import spark.implicits._
    inputs.toDF("s")
      .select(Coerce.timeToMinutes(col("s")).as("m"))
      .collect().map(r => Double.box(r.getDouble(0))).toSeq
  }

  test("timeToMinutes: null tokens -> 0.0 (exact case, main.py:441-444)") {
    assert(evalTime(Seq("-", "", "  ", "nan", "None")) ===
      Seq(0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("timeToMinutes: null input -> 0.0") {
    import spark.implicits._
    val out = Seq[Option[String]](None).toDF("s")
      .select(Coerce.timeToMinutes(col("s"))).head.getDouble(0)
    assert(out === 0.0)
  }

  test("timeToMinutes: H:M and H:M:S (main.py:452-457)") {
    assert(evalTime(Seq("1:30", "01:30:30", "0:05", "10:00:00", "2:-30")) ===
      Seq(90.0, 90.5, 5.0, 600.0, 90.0)) // int() accepts signs
  }

  test("timeToMinutes: non-integer pieces -> 0.0 (int() semantics)") {
    assert(evalTime(Seq("1.5:30", "1:xx", "1:2:3:4", ":30", "1:")) ===
      Seq(0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("timeToMinutes: plain numbers pass through (main.py:460)") {
    assert(evalTime(Seq("90", "  7.5  ", "-3", "0")) ===
      Seq(90.0, 7.5, -3.0, 0.0))
  }

  test("timeToMinutes: tabs/newlines strip like Python strip(), not just spaces") {
    assert(evalTime(Seq("7.5\t", "\t7.5", "7.5\n", " 1:30\t")) ===
      Seq(7.5, 7.5, 7.5, 90.0))
  }

  test("timeToMinutes: garbage -> 0.0, total function never errors") {
    assert(evalTime(Seq("garbage", "NONE", "12abc", "∞")) ===
      Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("lenientInt: truncate-toward-zero, garbage -> 0 (main.py:501-513)") {
    import spark.implicits._
    val out = Seq("42", "  7  ", "3.9", "-5.2", "x9", "", "3000000000")
      .toDF("s").select(Coerce.lenientInt(col("s")).as("i"))
      .collect().map(_.getLong(0)).toSeq
    // int64 like the reference: 3000000000 survives (a 32-bit cast
    // would wrap it to -1294967296)
    assert(out === Seq(42L, 7L, 3L, -5L, 0L, 0L, 3000000000L))
  }

  test("lenientDouble: garbage -> 0.0 (main.py:516-528)") {
    import spark.implicits._
    val out = Seq("42", "3.9", "-5.2", "x9", "", "nan")
      .toDF("s").select(Coerce.lenientDouble(col("s")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(out === Seq(42.0, 3.9, -5.2, 0.0, 0.0, 0.0))
  }

  test("parseDateDayFirst: DD/MM/YYYY and lenient variants; garbage -> null") {
    import spark.implicits._
    val out = Seq("15/01/2024", "5/1/2024", "31/12/1999", "2024-01-15", "junk")
      .toDF("s").select(Coerce.parseDateDayFirst(col("s")).as("d"))
      .collect().map(r => Option(r.getDate(0)).map(_.toString)).toSeq
    assert(out === Seq(Some("2024-01-15"), Some("2024-01-05"),
      Some("1999-12-31"), None, None))
  }
}

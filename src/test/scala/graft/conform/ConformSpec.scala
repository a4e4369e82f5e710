package graft.conform

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

/** P1-P4 conformance: dynamic source schema -> fixed target
  * (reference main.py:1222-1255, 1278-1303). */
class ConformSpec extends SparkSpec {

  private val target = StructType(Seq(
    StructField("id", IntegerType),
    StructField("campana", StringType),
    StructField("pct_in", DoubleType)))

  test("messy names are normalized, missing columns null-filled, extras dropped") {
    import spark.implicits._
    val messy = Seq(("1", "Ventas", "x")).toDF("ID", "Campaña", "Extra Col")
    val out = Conform.conformTo(target)(messy)
    assert(out.schema === target)
    val row = out.head
    assert(row.getInt(0) === 1)
    assert(row.getString(1) === "Ventas")
    assert(row.isNullAt(2)) // pct_in missing from input -> typed null
  }

  test("rename map applies after normalization (in -> in_total, main.py:115)") {
    import spark.implicits._
    val t = StructType(Seq(StructField("in_total", IntegerType)))
    val df = Seq("7").toDF("In")
    val out = Conform.conformTo(t, Schemas.ConductaRenames)(df)
    assert(out.schema === t)
    assert(out.head.getInt(0) === 7)
  }

  test("casts are applied to target types") {
    import spark.implicits._
    val df = Seq(("3", "x", "95.5")).toDF("id", "campana", "% In")
    val out = Conform.conformTo(target)(df)
    assert(out.head.getDouble(2) === 95.5)
  }

  test("property: output schema equals target for arbitrary column subsets") {
    import spark.implicits._
    val cols = Seq("ID", "Campaña", "% In", "Junk1", "Junk2")
    val subsets = Iterator.continually(
      Gen.someOf(cols).sample).flatten.take(25).toSeq
    for (subset <- subsets if subset.nonEmpty) {
      val row = subset.map(_ => "1")
      val df = Seq(row.mkString("")).toDF("packed")
        .select(subset.toIndexedSeq.zipWithIndex.map { case (c, i) =>
          split(col("packed"), "").getItem(i).as(c)
        }: _*)
      val out = Conform.conformTo(target)(df)
      assert(out.schema === target, s"subset $subset")
      assert(out.count() === 1)
    }
  }

  test("full-width schemas transcribed from the reference DDLs") {
    assert(Schemas.Conducta.fields.length === 22)   // main.py:1375-1402
    assert(Schemas.Estados.fields.length === 32)    // main.py:1404-1441
    assert(Schemas.EstadosTimeCols.length === 26)   // 13 t_* + 13 t_diario_*
  }

  test("driftRows names each silent conformance act: added_null, " +
      "dropped (incl. the shadowed duplicate), retyped") {
    import org.apache.spark.sql.types._
    val target = StructType(Seq(
      StructField("id", IntegerType),
      StructField("fecha", DateType),
      StructField("v", DoubleType)))
    // source: `ID` matches (retyped string->int), `Fecha` twice after
    // normalization (second is shadowed -> dropped), `extra` novel
    // (dropped), `v` absent (added_null)
    val source = StructType(Seq(
      StructField("ID", StringType),
      StructField("Fecha", StringType),
      StructField("FECHA ", StringType), // normalizes to fecha too
      StructField("extra", LongType)))
    val rows = Conform.driftRows(target)(source)
    def of(d: String) = rows.filter(_.disposition == d)
    assert(of("added_null").map(_.column) === Seq("v"))
    assert(of("retyped").map(r => (r.column, r.source_column.get,
      r.source_type.get, r.target_type.get)) ===
      Seq(("fecha", "Fecha", "STRING", "DATE"),
        ("id", "ID", "STRING", "INT")))
    // the shadowed duplicate IS dropped by conformTo's first-match
    // rule, so the report must say so
    assert(of("dropped").map(r => (r.column, r.source_column.get)) ===
      Seq(("extra", "extra"), ("fecha", "FECHA ")))
  }

  test("property: driftRows agrees with what conformTo actually did " +
      "for arbitrary column subsets/supersets") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val target = Schemas.Conducta
    val sources = Seq(
      Seq("ID", "Campaña", "In", "% In", "Novel One"),
      Seq("Agente", "Fecha", "Extra", "ID"),
      Seq("% Out", "Out", "Out Dialing"))
    for (cols <- sources) {
      val df = Seq(cols.map(_ => "x").mkString(""))
        .toDF("packed")
        .select(cols.zipWithIndex.map { case (c, i) =>
          split(col("packed"), "").getItem(i).as(c)
        }: _*)
      val drift = Conform.driftRows(target, Schemas.ConductaRenames)(df.schema)
      val out = Conform.conformTo(target, Schemas.ConductaRenames)(df)
      val row = out.head
      // every added_null column is actually NULL in the conformed row
      for (d <- drift.filter(_.disposition == "added_null"))
        assert(row.isNullAt(out.schema.fieldIndex(d.column)), d.column)
      // every dropped source column really contributed nothing: its
      // raw name is gone from the output (targets use conformed names)
      for (d <- drift.filter(_.disposition == "dropped"))
        assert(!out.columns.contains(d.source_column.get), d)
      // the report's column accounting is COMPLETE: every target field
      // is either reported (added_null/retyped) or matched untyped
      val reported = drift.map(_.column).toSet
      val matchedClean = target.fieldNames.filterNot(reported.contains)
      for (m <- matchedClean) {
        assert(out.columns.contains(m))
        // untyped-match means a source column conformed to `m` with the
        // SAME type — for these all-string fixtures, only string targets
        assert(target(m).dataType ===
          org.apache.spark.sql.types.StringType, m)
      }
    }
  }
}

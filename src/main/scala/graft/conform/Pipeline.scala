package graft.conform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.norm.Coerce

/** The reference's two full transform chains as reusable library
  * operators (conducta: main.py:1207-1261; estados: main.py:1264-1308):
  *
  *   P1 normalize names → P2 rename map → P3 null-fill missing →
  *   P4 project in order → X5 date parse → X3 int coerce →
  *   X4 float coerce → X1/X2 time-to-minutes → F2 drop null keys.
  *
  * Conformance goes through an all-STRING intermediate so the lenient
  * coercions (garbage→0) see the raw text, exactly like pandas — a
  * direct typed cast would turn garbage into NULL instead of 0.
  * The whole chain is narrow (one projection + one filter): Catalyst
  * collapses it into a single whole-stage-codegen pass over the scan,
  * so at 100 TB it runs at reader speed with zero shuffles.
  */
object Pipeline {

  private def stringified(target: StructType): StructType =
    StructType(target.fields.map(f => StructField(f.name, StringType)))

  /** The NATIVE coercion forms (registered SQL functions,
    * [[graft.functions.GraftFunctions]]), deliberately: these chains
    * coerce 22-32 columns inside one whole-stage-codegen stage, and
    * the regexp combinators would put ~4-10 compiled matchers per
    * column into a single generated method — past Janino's 64 KB
    * limit, which silently drops the whole conform stage to
    * interpreted execution (observed as `InternalCompilerException:
    * sort_addToSorter_0`). Semantics are identical (parity specs);
    * LenientNumSpec pins the compiles-under-codegen property with
    * codegen fallback disabled. */
  private def coerceAll(df: DataFrame, ints: Seq[String], doubles: Seq[String],
      times: Seq[String]): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    def fn(name: String)(c: String) = expr(s"$name(cast(`$c` as string))")
    val d1 = df.withColumn("fecha", Coerce.parseDateDayFirst(col("fecha")))
    val d2 = ints.foldLeft(d1)((d, c) => d.withColumn(c, fn("lenient_long")(c)))
    val d3 = doubles.foldLeft(d2)((d, c) => d.withColumn(c, fn("lenient_double")(c)))
    times.foldLeft(d3)((d, c) => d.withColumn(c, fn("time_to_minutes")(c)))
  }

  /** F1: drop rows where EVERY column is null, applied to the raw
    * frame right after read (reference main.py:1352,
    * `dropna(how='all')`). */
  def dropAllNull(raw: DataFrame): DataFrame = raw.na.drop("all")

  /** Conducta - Agentes chain (reference main.py:1207-1261). */
  def conducta(raw: DataFrame): DataFrame = {
    val conformed = Conform.conformTo(
      stringified(Schemas.Conducta), Schemas.ConductaRenames)(dropAllNull(raw))
    val pctCols = Schemas.Conducta.fieldNames.filter(_.contains("pct")).toSeq
    coerceAll(conformed, Schemas.ConductaIntCols, pctCols,
      Schemas.ConductaTimeCols)
      .na.drop("any", Seq("id", "fecha")) // id never null post-coerce; fecha is the live filter
      .select(Schemas.Conducta.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Estados Operativos chain (reference main.py:1264-1308). */
  def estados(raw: DataFrame): DataFrame = {
    val conformed = Conform.conformTo(stringified(Schemas.Estados))(dropAllNull(raw))
    coerceAll(conformed, Schemas.EstadosIntCols, Seq.empty,
      Schemas.EstadosTimeCols)
      .na.drop("any", Seq("id", "fecha"))
      .select(Schemas.Estados.fieldNames.map(col).toIndexedSeq: _*)
  }
}

package graft.conform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.norm.Names

/** Schema conformance: dynamic source schema → fixed target schema.
  *
  * Re-expresses the reference's transform chain P1→P2→P3→P4+casts
  * (reference main.py:1222-1255, 1278-1303):
  *   1. normalize incoming column names ([[graft.norm.Names]]),
  *   2. apply a rename map (e.g. `in`→`in_total`, reserved words,
  *      reference main.py:115/121),
  *   3. add target columns missing from the input as typed NULLs
  *      (reference main.py:1228-1230),
  *   4. project to the target column list in order, dropping extras
  *      (reference main.py:1233), casting each to the target type.
  *
  * All four steps collapse into ONE `select` — a single narrow
  * projection stage under whole-stage codegen. At 100 TB this is the
  * correct shape: no shuffle, column pruning reaches the scan, and
  * Catalyst prunes unreferenced source columns from the reader.
  */
object Conform {

  def conformTo(target: StructType, renames: Map[String, String] = Map.empty)(
      df: DataFrame): DataFrame = {
    // original name -> conformed name (normalize, then rename map)
    val conformedName: Seq[(String, String)] = df.columns.toSeq.map { orig =>
      val n = Names.normalizeName(orig)
      orig -> renames.getOrElse(n, n)
    }
    // target name -> first matching source column
    val source: Map[String, String] =
      conformedName.groupBy(_._2).map { case (t, srcs) => t -> srcs.head._1 }
    val cols = target.fields.map { f =>
      source.get(f.name) match {
        case Some(src) => col(s"`$src`").cast(f.dataType).as(f.name)
        case None      => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}

/** Fixed target schemas of the reference's two destination tables.
  * Names/order: reference main.py:135-146 (conducta) and 148-183
  * (estados); types from the DDLs main.py:1375-1441. `load_date`
  * (DDL default GETDATE(), main.py:1400/1439) is added at write time
  * by [[graft.io.IdempotentWriter]], not part of the conformance
  * target.
  */
object Schemas {

  /** `in`→`in_total`, `out`→`out_total` (SQL reserved words,
    * reference main.py:115, 121) and the one non-identity shortening
    * `tiempo_medio_de_respuesta_*`→`tiempo_medio_respuesta_*`
    * (reference main.py:131-132). */
  val ConductaRenames: Map[String, String] = Map(
    "in" -> "in_total",
    "out" -> "out_total",
    "tiempo_medio_de_respuesta_in" -> "tiempo_medio_respuesta_in",
    "tiempo_medio_de_respuesta_out" -> "tiempo_medio_respuesta_out"
  )

  val Conducta: StructType = StructType(Seq(
    StructField("agente", StringType),
    StructField("fecha", DateType),
    StructField("id", IntegerType),
    StructField("campana", StringType),
    StructField("in_total", IntegerType),
    StructField("pct_in", DoubleType),
    StructField("in_rechazadas_ignoradas", IntegerType),
    StructField("pct_in_rechazadas_ignoradas", DoubleType),
    StructField("in_atendidas", IntegerType),
    StructField("pct_in_atendidas", DoubleType),
    StructField("out_total", IntegerType),
    StructField("pct_out", DoubleType),
    StructField("out_rechazadas_ignoradas", IntegerType),
    StructField("pct_out_rechazadas_ignoradas", DoubleType),
    StructField("out_atendidas", IntegerType),
    StructField("pct_out_atendidas", DoubleType),
    StructField("out_dialing", IntegerType),
    StructField("pct_out_dialing", DoubleType),
    StructField("llamados_con_hold", IntegerType),
    StructField("pct_llamados_con_hold", DoubleType),
    StructField("tiempo_medio_respuesta_in", DoubleType),
    StructField("tiempo_medio_respuesta_out", DoubleType)
  ))

  /** Columns whose raw form is a duration string (`HH:MM:SS`) to be
    * converted by [[graft.norm.Coerce.timeToMinutes]]
    * (reference main.py:1254-1255). */
  val ConductaTimeCols: Seq[String] =
    Seq("tiempo_medio_respuesta_in", "tiempo_medio_respuesta_out")

  val ConductaIntCols: Seq[String] = Seq(
    "id", "in_total", "in_rechazadas_ignoradas", "in_atendidas",
    "out_total", "out_rechazadas_ignoradas", "out_atendidas",
    "out_dialing", "llamados_con_hold")

  private val estadosTimeNames = Seq(
    "t_login", "t_login_neto", "t_available", "t_preview", "t_dialing",
    "t_ringing", "t_talking", "t_talking_in", "t_talking_out", "t_hold",
    "t_acw", "t_other_crm", "t_pause")

  /** Interval-grain (`t_*`) and day-grain (`t_diario_*`) duration
    * columns (reference main.py:148-183). */
  val EstadosTimeCols: Seq[String] =
    estadosTimeNames ++ estadosTimeNames.map(n => "t_diario" + n.stripPrefix("t"))

  val Estados: StructType = StructType(
    Seq(
      StructField("fecha", DateType),
      StructField("intervalo", StringType),
      StructField("id", IntegerType),
      StructField("agente", StringType),
      StructField("id_campana", IntegerType),
      StructField("campana", StringType)
    ) ++ EstadosTimeCols.map(n => StructField(n, DoubleType)))

  val EstadosIntCols: Seq[String] = Seq("id", "id_campana")
}

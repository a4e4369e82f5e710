package graft.queries

import java.nio.charset.Charset
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.conform.Conform
import graft.io.{CsvProbe, IdempotentWriter}
import graft.norm.Coerce

/** Layer-A queries: the reference's literal operator semantics
  * (lenient coercions, conformance, null-key drops, idempotent
  * date-partitioned load, messy-CSV ingestion) exercised over the
  * harness tables so the DuckDB oracle can check them value-by-value.
  *
  * The harness parquet has no messy strings, so each query first
  * SYNTHESIZES deterministic messy inputs from integer columns
  * (never from doubles — double→string formatting differs across
  * engines), applies the graft operator, and aggregates. The oracle
  * SQL mirrors both the synthesis and the documented semantics.
  */
object Reference {
  import Tables._

  /** X1 `timeToMinutes` (reference main.py:425-462) over every input
    * class: null-tokens, H:M, H:M:S, broken pieces, too many parts,
    * plain/padded numerics, garbage. */
  def timeToMinutesQ(spark: SparkSession, dir: String): DataFrame = {
    prep(spark)
    val raw = expr(
      """CASE CAST(l_orderkey % 11 AS INT)
        | WHEN 0 THEN '-'
        | WHEN 1 THEN ''
        | WHEN 2 THEN 'nan'
        | WHEN 3 THEN 'None'
        | WHEN 4 THEN 'garbage'
        | WHEN 5 THEN CAST(l_linenumber AS STRING)
        | WHEN 6 THEN concat(CAST(l_partkey % 10 AS STRING), ':',
        |                    lpad(CAST(l_suppkey % 60 AS STRING), 2, '0'))
        | WHEN 7 THEN concat(CAST(l_partkey % 10 AS STRING), ':',
        |                    lpad(CAST(l_suppkey % 60 AS STRING), 2, '0'), ':',
        |                    lpad(CAST(l_orderkey % 60 AS STRING), 2, '0'))
        | WHEN 8 THEN '1:xx'
        | WHEN 9 THEN '1:2:3:4'
        | ELSE '  7.5  '
        |END""".stripMargin)
    lineitem(spark, dir)
      .select((col("l_orderkey") % 11).cast("int").as("bucket"),
        Coerce.timeToMinutes(raw).as("minutes"))
      .groupBy(col("bucket"))
      .agg(round(sum("minutes"), 4).as("sum_min"), count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  val timeToMinutesSql: String =
    """WITH synth AS (
      |  SELECT CAST(l_orderkey % 11 AS INTEGER) AS bucket,
      |    CASE CAST(l_orderkey % 11 AS INTEGER)
      |      WHEN 0 THEN '-'
      |      WHEN 1 THEN ''
      |      WHEN 2 THEN 'nan'
      |      WHEN 3 THEN 'None'
      |      WHEN 4 THEN 'garbage'
      |      WHEN 5 THEN CAST(l_linenumber AS VARCHAR)
      |      WHEN 6 THEN concat(CAST(l_partkey % 10 AS VARCHAR), ':',
      |                         lpad(CAST(l_suppkey % 60 AS VARCHAR), 2, '0'))
      |      WHEN 7 THEN concat(CAST(l_partkey % 10 AS VARCHAR), ':',
      |                         lpad(CAST(l_suppkey % 60 AS VARCHAR), 2, '0'), ':',
      |                         lpad(CAST(l_orderkey % 60 AS VARCHAR), 2, '0'))
      |      WHEN 8 THEN '1:xx'
      |      WHEN 9 THEN '1:2:3:4'
      |      ELSE '  7.5  '
      |    END AS raw
      |  FROM lineitem),
      |conv AS (
      |  SELECT bucket,
      |    CASE
      |      WHEN raw IS NULL OR trim(raw) IN ('-','','nan','None') THEN 0.0
      |      WHEN contains(trim(raw), ':') THEN
      |        CASE len(string_split(trim(raw), ':'))
      |          WHEN 3 THEN CASE WHEN NOT regexp_full_match(trim(string_split(trim(raw), ':')[1]), '[+-]?[0-9]+')
      |                             OR NOT regexp_full_match(trim(string_split(trim(raw), ':')[2]), '[+-]?[0-9]+')
      |                             OR NOT regexp_full_match(trim(string_split(trim(raw), ':')[3]), '[+-]?[0-9]+')
      |                      THEN 0.0
      |                      ELSE try_cast(string_split(trim(raw), ':')[1] AS DOUBLE) * 60
      |                         + try_cast(string_split(trim(raw), ':')[2] AS DOUBLE)
      |                         + try_cast(string_split(trim(raw), ':')[3] AS DOUBLE) / 60 END
      |          WHEN 2 THEN CASE WHEN NOT regexp_full_match(trim(string_split(trim(raw), ':')[1]), '[+-]?[0-9]+')
      |                             OR NOT regexp_full_match(trim(string_split(trim(raw), ':')[2]), '[+-]?[0-9]+')
      |                      THEN 0.0
      |                      ELSE try_cast(string_split(trim(raw), ':')[1] AS DOUBLE) * 60
      |                         + try_cast(string_split(trim(raw), ':')[2] AS DOUBLE) END
      |          ELSE 0.0 END
      |      WHEN try_cast(trim(raw) AS DOUBLE) IS NULL
      |        OR isnan(try_cast(trim(raw) AS DOUBLE)) THEN 0.0
      |      ELSE try_cast(trim(raw) AS DOUBLE)
      |    END AS minutes
      |  FROM synth)
      |SELECT bucket, round(sum(minutes), 4) AS sum_min, count(*) AS n
      |FROM conv GROUP BY 1 ORDER BY 1""".stripMargin

  /** X3/X4 lenient int/double coercion (reference main.py:501-528):
    * garbage→0, parse-then-truncate for ints. */
  def lenientCasts(spark: SparkSession, dir: String): DataFrame = {
    prep(spark)
    val raw = expr(
      """CASE CAST(event_id % 6 AS INT)
        | WHEN 0 THEN '42'
        | WHEN 1 THEN '  7  '
        | WHEN 2 THEN '3.9'
        | WHEN 3 THEN 'x9'
        | WHEN 4 THEN ''
        | ELSE '-5.2'
        |END""".stripMargin)
    events(spark, dir)
      .select((col("event_id") % 6).cast("int").as("bucket"),
        Coerce.lenientInt(raw).as("as_int"),
        Coerce.lenientDouble(raw).as("as_double"))
      .groupBy(col("bucket"))
      .agg(sum("as_int").as("sum_int"),
        round(sum("as_double"), 4).as("sum_double"),
        count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  val lenientCastsSql: String =
    """WITH synth AS (
      |  SELECT CAST(event_id % 6 AS INTEGER) AS bucket,
      |    CASE CAST(event_id % 6 AS INTEGER)
      |      WHEN 0 THEN '42' WHEN 1 THEN '  7  ' WHEN 2 THEN '3.9'
      |      WHEN 3 THEN 'x9' WHEN 4 THEN '' ELSE '-5.2' END AS raw
      |  FROM events),
      |conv AS (
      |  SELECT bucket,
      |    CASE WHEN try_cast(trim(raw) AS DOUBLE) IS NULL
      |           OR isnan(try_cast(trim(raw) AS DOUBLE)) THEN 0.0
      |         ELSE try_cast(trim(raw) AS DOUBLE) END AS d
      |  FROM synth)
      |SELECT bucket, CAST(sum(CAST(trunc(d) AS BIGINT)) AS BIGINT) AS sum_int,
      |  round(sum(d), 4) AS sum_double, count(*) AS n
      |FROM conv GROUP BY 1 ORDER BY 1""".stripMargin

  /** X5 day-first date parsing (reference main.py:1239/1295):
    * format out as DD/MM/YYYY, parse back, roll up by month. */
  def dateDayFirst(spark: SparkSession, dir: String): DataFrame = {
    prep(spark)
    orders(spark, dir)
      .select(date_format(col("o_orderdate"), "dd/MM/yyyy").as("s"))
      .select(Coerce.parseDateDayFirst(col("s")).as("d"))
      .groupBy(trunc(col("d"), "month").as("m"))
      .agg(count(lit(1)).as("n"))
      .orderBy("m")
  }

  val dateDayFirstSql: String =
    """WITH synth AS (SELECT strftime(o_orderdate, '%d/%m/%Y') AS s FROM orders),
      |parsed AS (SELECT CAST(try_strptime(s, '%d/%m/%Y') AS DATE) AS d FROM synth)
      |SELECT CAST(date_trunc('month', d) AS DATE) AS m, count(*) AS n
      |FROM parsed GROUP BY 1 ORDER BY 1""".stripMargin

  /** P1-P4 conformance (reference main.py:1222-1255): messy incoming
    * names (spaces, case, accents, `%`), extra column dropped,
    * missing column null-filled, casts applied — one select. */
  def conformQ(spark: SparkSession, dir: String): DataFrame = {
    prep(spark)
    val target = StructType(Seq(
      StructField("cust_key", LongType),
      StructField("name", StringType),
      StructField("pct_balance", DoubleType),
      StructField("missing_col", DoubleType)))
    val messy = customer(spark, dir).select(
      col("c_custkey").as("Cust  Key"),
      col("c_name").as("NAME"),
      col("c_acctbal").as("% Balance"),
      col("c_mktsegment").as("Extra Column (dropped)"))
    Conform.conformTo(target)(messy).orderBy("cust_key")
  }

  val conformSql: String =
    """SELECT c_custkey AS cust_key, c_name AS name,
      |  c_acctbal AS pct_balance, CAST(NULL AS DOUBLE) AS missing_col
      |FROM customer ORDER BY cust_key""".stripMargin

  /** F1/F2 null handling (reference main.py:1258/1305,1352):
    * synthesized nulls, drop rows missing required keys. */
  def nullDrop(spark: SparkSession, dir: String): DataFrame = {
    prep(spark)
    val e2 = events(spark, dir)
      .withColumn("key", when(col("event_id") % 7 === 0, lit(null))
        .otherwise(col("user_id")))
      .withColumn("v", when(col("event_id") % 3 === 0, lit(null))
        .otherwise(col("value")))
    e2.na.drop("any", Seq("key", "v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("v"), 4).as("sum_v"))
      .orderBy("event_type")
  }

  val nullDropSql: String =
    """WITH synth AS (
      |  SELECT event_type,
      |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE user_id END AS key,
      |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
      |  FROM events)
      |SELECT event_type, count(*) AS n, round(sum(v), 4) AS sum_v
      |FROM synth WHERE key IS NOT NULL AND v IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** S5-S7 idempotent date-partitioned load (reference
    * main.py:1500-1578): write all dates, then OVERWRITE a subset
    * partition with the same content, read back. If overwrite
    * degraded to append, per-date counts double → oracle mismatch. */
  def idempotentLoad(spark: SparkSession, dir: String): DataFrame = {
    prep(spark)
    // One fixed scratch dir, overwritten per invocation — repeated runs
    // don't leak temp dirs. (Driver-local path: this probe validates the
    // overwrite SEMANTICS; on a cluster the target would be shared
    // storage. Excluded from the timed bench set for the same reason.)
    val tmp = java.nio.file.Paths
      .get(System.getProperty("java.io.tmpdir"), "graft_idem_scratch").toString
    val src = events(spark, dir).select(
      to_date(col("ts")).as("fecha"),
      col("event_id"), col("user_id"), col("value"))
    IdempotentWriter.overwritePartitions(src, tmp)
    // re-load of one date (the reference's daily re-run scenario)
    val oneDate = src.filter(col("fecha") === lit("2024-01-05").cast("date"))
    IdempotentWriter.overwritePartitions(oneDate, tmp)
    spark.read.parquet(tmp)
      .groupBy(col("fecha"))
      .agg(count(lit(1)).as("n"))
      .orderBy("fecha")
  }

  val idempotentLoadSql: String =
    """SELECT CAST(ts AS DATE) AS fecha, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** S1+S4+P*+X*+F2 full micro-pipeline: a latin-1, `;`-separated CSV
    * with accented/messy headers → probe → conform → coerce → drop
    * null keys. The oracle pins the exact expected rows (VALUES). */
  def csvPipeline(spark: SparkSession, dir: String): DataFrame = {
    prep(spark)
    val csv =
      "ID;Campaña;% In;Tiempo Medio De Respuesta In;Fecha\n" +
        "1;Ventas;95.5;00:02:30;15/01/2024\n" +
        "2;Café;-;1:30;16/01/2024\n" +
        ";Soporte;x;90;17/01/2024\n" +
        "3;Niño;88;;18/01/2024\n"
    val f = Files.createTempFile("graft_conducta_raw", ".csv")
    Files.write(f, csv.getBytes(Charset.forName("ISO-8859-1")))
    val target = StructType(Seq(
      StructField("id", IntegerType),
      StructField("campana", StringType),
      StructField("pct_in", DoubleType),
      StructField("tiempo_medio_respuesta_in", StringType),
      StructField("fecha", StringType)))
    val raw = CsvProbe.read(spark, f.toString)
    Conform.conformTo(target,
        graft.conform.Schemas.ConductaRenames)(raw)
      .select(col("id"), col("campana"),
        Coerce.lenientDouble(col("pct_in")).as("pct_in"),
        Coerce.timeToMinutes(col("tiempo_medio_respuesta_in"))
          .as("tiempo_medio_respuesta_in"),
        Coerce.parseDateDayFirst(col("fecha")).as("fecha"))
      .na.drop("any", Seq("id", "fecha"))
      .orderBy("id")
  }

  val csvPipelineSql: String =
    """SELECT * FROM (VALUES
      |  (CAST(1 AS INTEGER), 'Ventas', CAST(95.5 AS DOUBLE),
      |   CAST(2.5 AS DOUBLE), DATE '2024-01-15'),
      |  (CAST(2 AS INTEGER), 'Café', CAST(0.0 AS DOUBLE),
      |   CAST(90.0 AS DOUBLE), DATE '2024-01-16'),
      |  (CAST(3 AS INTEGER), 'Niño', CAST(88.0 AS DOUBLE),
      |   CAST(0.0 AS DOUBLE), DATE '2024-01-18'))
      |  t(id, campana, pct_in, tiempo_medio_respuesta_in, fecha)
      |ORDER BY id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_time_to_minutes" -> timeToMinutesQ,
    "q31_lenient_casts" -> lenientCasts,
    "q32_date_dayfirst" -> dateDayFirst,
    "q33_conform" -> conformQ,
    "q34_null_drop" -> nullDrop,
    "q35_idempotent_load" -> idempotentLoad,
    "q36_csv_pipeline" -> csvPipeline
  )

  val oracle: Map[String, String] = Map(
    "q30_time_to_minutes" -> timeToMinutesSql,
    "q31_lenient_casts" -> lenientCastsSql,
    "q32_date_dayfirst" -> dateDayFirstSql,
    "q33_conform" -> conformSql,
    "q34_null_drop" -> nullDropSql,
    "q35_idempotent_load" -> idempotentLoadSql,
    "q36_csv_pipeline" -> csvPipelineSql
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing exercised end-to-end: binary payloads built
  * deterministically from `documents`, batch feature extraction via
  * mapPartitions, digest per kind. The DuckDB oracle mirrors the
  * byte arithmetic with ascii()/substr() over the (ASCII-only) text
  * the payloads were encoded from — so the whole binary path
  * (encode → mapPartitions → byte ops → agg) is value-checked. */
object MultimodalQ {
  import Tables._

  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    prep(spark)
    val blobs = Multimodal.mediaFromDocuments(documents(spark, dir))
    Multimodal.extractFeatures(blobs).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("sum_bytes"),
        sum(col("checksum")).as("sum_checksum"),
        sum(col("op_sum")).as("sum_op"),
        sum(col("meta_width")).as("sum_width"))
      .orderBy("kind")
  }

  val mediaFeaturesSql: String =
    """WITH d AS (
      |  SELECT doc_id, text,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |      ELSE 'video' END AS kind
      |  FROM documents WHERE length(text) = strlen(text)),
      |f AS (
      |  SELECT doc_id, kind, strlen(text) AS n_bytes,
      |    list_sum(list_transform(range(1, length(text) + 1),
      |      i -> ascii(substr(text, i, 1)))) AS checksum,
      |    CASE kind
      |      WHEN 'image' THEN list_sum(list_transform(
      |        list_filter(range(1, length(text) + 1), i -> (i - 1) % 16 = 0),
      |        i -> ascii(substr(text, i, 1))))
      |      WHEN 'audio' THEN list_sum(list_transform(
      |        range(1, least(256, length(text)) + 1),
      |        i -> ascii(substr(text, i, 1))))
      |      ELSE list_sum(list_transform(
      |        list_filter(range(1, length(text) + 1), i -> (i - 1) % 100 = 0),
      |        i -> ascii(substr(text, i, 1))))
      |    END AS op_sum,
      |    CASE kind WHEN 'image' THEN 1 + ascii(substr(text, 1, 1)) % 64
      |      WHEN 'audio' THEN 0 ELSE 16 END AS meta_width
      |  FROM d)
      |SELECT kind, count(*) AS n,
      |  CAST(sum(n_bytes) AS BIGINT) AS sum_bytes,
      |  CAST(sum(checksum) AS BIGINT) AS sum_checksum,
      |  CAST(sum(op_sum) AS BIGINT) AS sum_op,
      |  CAST(sum(meta_width) AS BIGINT) AS sum_width
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_media_features" -> mediaFeatures
  )

  val oracle: Map[String, String] = Map(
    "q63_media_features" -> mediaFeaturesSql
  )
}

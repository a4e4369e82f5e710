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

  /** REAL image decode, value-checked: synthetic binary-PPM rasters
    * (one per nation key, [[Multimodal.syntheticPpm]]) flow through
    * the SAME mapPartitions feature extraction as q63, and the output
    * carries the decoder's parsed dimensions and per-image pixel sums.
    * The oracle regenerates header + pixels from the formula in SQL —
    * a header-grammar or plane-walk defect in [[Multimodal.decodePpm]]
    * breaks the hash. */
  def imageDecode(spark: SparkSession, dir: String): DataFrame = {
    prep(spark)
    import spark.implicits._
    val blobs = nation(spark, dir)
      .select(col("n_nationkey").cast("long")).as[Long]
      .map(id =>
        Multimodal.MediaBlob(id, "image", Multimodal.syntheticPpm(id)))
    Multimodal.extractFeatures(blobs).toDF()
      .select(col("media_id"), col("ppm_w"), col("ppm_h"),
        col("n_bytes"), col("checksum"), col("ppm_sum_rgb"))
      .orderBy("media_id")
  }

  val imageDecodeSql: String =
    """WITH ids AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS media_id,
      |    4 + n_nationkey % 8 AS w, 3 + n_nationkey % 5 AS h
      |  FROM nation),
      |px AS (
      |  SELECT media_id, w, h,
      |    'P6' || chr(10) || CAST(w AS VARCHAR) || ' ' ||
      |      CAST(h AS VARCHAR) || chr(10) || '255' || chr(10) AS hdr,
      |    list_transform(range(0, w * h * 3),
      |      k -> (media_id * 7 + k * 13) % 256) AS pix
      |  FROM ids)
      |SELECT media_id, CAST(w AS INTEGER) AS ppm_w,
      |  CAST(h AS INTEGER) AS ppm_h,
      |  CAST(strlen(hdr) + w * h * 3 AS INTEGER) AS n_bytes,
      |  CAST(list_sum(list_transform(range(1, strlen(hdr) + 1),
      |    i -> ascii(substr(hdr, CAST(i AS INTEGER), 1))))
      |    + list_sum(pix) AS BIGINT) AS checksum,
      |  CAST(list_sum(pix) AS BIGINT) AS ppm_sum_rgb
      |FROM px ORDER BY media_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_media_features" -> mediaFeatures,
    "q81_image_decode" -> imageDecode
  )

  val oracle: Map[String, String] = Map(
    "q63_media_features" -> mediaFeaturesSql,
    "q81_image_decode" -> imageDecodeSql
  )
}

package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.TimestampType

/** The ts-encoding canary: the harness has regenerated testdata with
  * `events.ts` as parquet INT64 TIMESTAMP(NANOS) in some rounds and
  * native timestamp[us] in others, and a reader pinned to the wrong
  * one either refuses to read (batch) or silently yields garbage
  * epochs (a streaming schema reading µs through a Long column).
  * Both encodings are CHECKED IN as fixtures here, so the adaptive
  * readers ([[Tables.events]], [[graft.streaming.Streams
  * .eventsStream]]) are pinned by a test, not a memory note — if a
  * future data generation ships yet another encoding, this suite is
  * the first thing that goes red. */
class TablesSpec extends SparkSpec {

  /** Copy a checked-in fixture into a scratch dir under the name the
    * table readers expect (`<dir>/events.parquet`). */
  private def fixtureDir(name: String): String = {
    val dir = Files.createTempDirectory("ts_canary")
    val src = getClass.getResourceAsStream(s"/fixtures/$name.parquet")
    try Files.copy(src, dir.resolve("events.parquet"))
    finally src.close()
    dir.toString
  }

  private val expectedFirstUs = // 2024-03-01T12:00:00Z
    java.time.Instant.parse("2024-03-01T12:00:00Z").toEpochMilli * 1000L

  private def digest(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("batch events reader surfaces identical timestamps from both " +
      "shipped ts encodings") {
    val us = Tables.events(spark, fixtureDir("events_ts_micros"))
    val ns = Tables.events(spark, fixtureDir("events_ts_nanos"))
    assert(us.schema("ts").dataType === TimestampType)
    assert(ns.schema("ts").dataType === TimestampType)
    val du = digest(us)
    val dn = digest(ns)
    assert(du === dn, "encodings disagree after adaptation")
    assert(du.head === (0L, expectedFirstUs))
    assert(du.size === 12)
  }

  test("streaming events reader surfaces identical timestamps from " +
      "both shipped ts encodings") {
    def streamed(name: String, sink: String): Seq[(Long, Long)] = {
      val dir = fixtureDir(name)
      val out = graft.streaming.Streams.runToMemory(
        graft.streaming.Streams.eventsStream(spark, dir)
          .select(col("event_id"), col("ts")),
        sink, OutputMode.Append())
      digest(out)
    }
    val du = streamed("events_ts_micros", "ts_canary_us")
    val dn = streamed("events_ts_nanos", "ts_canary_ns")
    assert(du === dn, "stream encodings disagree after adaptation")
    assert(du.head === (0L, expectedFirstUs))
    assert(du.size === 12)
  }
}

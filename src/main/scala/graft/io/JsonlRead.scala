package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-explicit JSONL (one JSON object per line) ingestion with
  * corrupt-record QUARANTINE — the landing format of a crawl corpus,
  * read under the engine's messy-input policy. The reference swallows
  * unreadable files whole (main.py:1362–1366) and silently drops
  * poison rows (main.py:1564–1569); our documented policy is explicit
  * quarantine (cf. IdempotentWriter.quarantine and README
  * "Documented deviations"), applied here at parse time.
  *
  *   - The schema is EXPLICIT: at 100 TB, inference would be a full
  *     extra pass over the data before the real one.
  *   - PERMISSIVE + columnNameOfCorruptRecord: a malformed line (bad
  *     JSON, or a field that cannot convert to its declared type)
  *     surfaces as a row whose [[CorruptCol]] holds the raw line —
  *     never silently dropped (DROPMALFORMED) and never failing the
  *     whole job for one bad crawl line (FAILFAST). Missing fields
  *     are NOT corruption: they land as typed nulls, the same
  *     add-missing-as-null semantics as the conform stage (P3).
  */
object JsonlRead {

  /** Name of the quarantine column appended to the caller's schema. */
  val CorruptCol = "_corrupt_record"

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
}

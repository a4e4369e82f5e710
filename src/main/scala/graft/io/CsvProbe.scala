package graft.io

import java.nio.charset.{Charset, CharsetDecoder, CodingErrorAction, StandardCharsets}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Messy-CSV ingestion: charset fallback + delimiter sniffing.
  *
  * Re-expresses the reference's read path (S1, reference
  * main.py:1337-1342): pandas tries utf-8 → latin-1 → cp1252 and
  * sniffs the separator (`sep=None, engine='python'`). Spark's CSV
  * reader takes one fixed charset/sep, so we decide both driver-side,
  * then launch the distributed `spark.read` with the detected options:
  *
  *   - separator: sniffed from the first few KB — O(1) in file size;
  *   - charset: validated over the WHOLE file with a streaming decoder
  *     (O(n) sequential read, O(1) memory). A head-only probe would
  *     silently corrupt a latin-1 file whose first non-ASCII byte sits
  *     past the window (UTF-8 "passes" on the head, then the bad byte
  *     decodes to U+FFFD mid-file); the reference decodes the whole
  *     file too, so the cost is the same work pandas does.
  *
  * cp1252 is listed for reference parity but is unreachable after
  * ISO-8859-1 (latin-1 maps every byte, so it never fails) — exactly
  * as in the reference, where pandas' latin-1 attempt also never
  * raises. Kept to document the fallback chain faithfully.
  */
object CsvProbe {

  private val CandidateSeps = Seq(',', ';', '\t', '|')
  private val CandidateCharsets =
    Seq(StandardCharsets.UTF_8, StandardCharsets.ISO_8859_1, Charset.forName("windows-1252"))

  /** Detect (charset, separator): charset by streaming full-file
    * validation, separator from the first `probeBytes` only. */
  def probe(path: String, probeBytes: Int = 65536): (Charset, Char) = {
    val in = Files.newInputStream(Paths.get(path))
    val full = try in.readNBytes(probeBytes) finally in.close()
    val head =
      if (full.length < probeBytes) full // whole file fit: nothing was split
      else {
        val lastNl = full.lastIndexWhere(_ == '\n'.toByte)
        if (lastNl > 0) java.util.Arrays.copyOf(full, lastNl) else full
      }
    val cs = CandidateCharsets
      .find(c => decodesStream(path, c))
      .getOrElse(StandardCharsets.ISO_8859_1) // latin-1 accepts any byte
    val text = new String(head, cs)
    val firstLine = text.linesIterator.toSeq.headOption.getOrElse("")
    val sep = CandidateSeps.maxBy(s => countOutsideQuotes(firstLine, s))
    (cs, sep)
  }

  /** Whole-file charset validation with a 64 KB rolling buffer —
    * InputStreamReader drives the incremental decoder, so split
    * multibyte sequences across chunk boundaries are handled and
    * memory stays O(1) at any file size. */
  private def decodesStream(path: String, cs: Charset): Boolean = {
    val dec: CharsetDecoder = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val rd = new java.io.InputStreamReader(
      Files.newInputStream(Paths.get(path)), dec)
    val buf = new Array[Char](1 << 16)
    try { while (rd.read(buf) != -1) {}; true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
    finally rd.close()
  }

  private def countOutsideQuotes(line: String, sep: Char): Int = {
    var inQuote = false; var n = 0
    line.foreach {
      case '"'            => inQuote = !inQuote
      case c if c == sep  => if (!inQuote) n += 1
      case _              =>
    }
    n
  }

  /** Probe then read. All values arrive as strings; downstream
    * conformance ([[graft.conform.Conform]]) does the typed casts —
    * matching the reference, where pandas infers and the transform
    * re-coerces anyway. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val (cs, sep) = probe(path)
    spark.read
      .option("header", "true")
      .option("sep", sep.toString)
      .option("encoding", cs.name())
      .option("mode", "PERMISSIVE") // bad rows → nulls, like errors='coerce'
      .csv(path)
  }

  /** File-type router by filename substring (S4, reference
    * main.py:1188-1204): `conducta` | `estados`/`operativo`. */
  def routeByName(fileName: String): Option[String] = {
    val n = fileName.toLowerCase
    if (n.contains("conducta")) Some("conducta")
    else if (n.contains("estados") || n.contains("operativo")) Some("estados_operativos")
    else None
  }

  /** Column-expression form of [[routeByName]] — same rule applied to
    * a filename COLUMN (e.g. `input_file_name()` on a multi-file scan,
    * or an arrival manifest), so routing runs distributed inside the
    * scan projection instead of driver-side. NULL = unroutable.
    * Parity with [[routeByName]] is asserted in CsvProbeSpec. */
  def routeCol(fileName: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, lower, when}
    val n = lower(fileName)
    when(n.contains("conducta"), lit("conducta"))
      .when(n.contains("estados") || n.contains("operativo"),
        lit("estados_operativos"))
      .otherwise(lit(null).cast("string"))
  }
}

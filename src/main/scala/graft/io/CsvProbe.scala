package graft.io

import java.nio.charset.{Charset, CharsetDecoder, CodingErrorAction, StandardCharsets}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Messy-CSV ingestion: charset fallback + delimiter sniffing.
  *
  * Re-expresses the reference's read path (S1, reference
  * main.py:1337-1342): pandas tries utf-8 → latin-1 → cp1252 and
  * sniffs the separator (`sep=None, engine='python'`). Spark's CSV
  * reader takes one fixed charset/sep, so we probe the FIRST few KB
  * driver-side (one tiny read), then launch the distributed
  * `spark.read` with the detected options — the probe cost is O(1)
  * regardless of file size, so this scales to arbitrarily large
  * inputs.
  */
object CsvProbe {

  private val CandidateSeps = Seq(',', ';', '\t', '|')
  private val CandidateCharsets =
    Seq(StandardCharsets.UTF_8, StandardCharsets.ISO_8859_1, Charset.forName("windows-1252"))

  /** Detect (charset, separator) from the first `probeBytes` of the file.
    * Reads AT MOST `probeBytes` through a bounded stream — never the
    * whole file — so probing a multi-GB CSV allocates ≤64 KB on the
    * driver. If the buffer filled (mid-file truncation), the tail is
    * trimmed to the last newline so a split multibyte UTF-8 sequence
    * can't falsely fail the UTF-8 probe and demote the file to latin-1. */
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
      .find(c => decodes(head, c))
      .getOrElse(StandardCharsets.ISO_8859_1) // latin-1 accepts any byte
    val text = new String(head, cs)
    val firstLine = text.linesIterator.toSeq.headOption.getOrElse("")
    val sep = CandidateSeps.maxBy(s => countOutsideQuotes(firstLine, s))
    (cs, sep)
  }

  private def decodes(bytes: Array[Byte], cs: Charset): Boolean = {
    val dec: CharsetDecoder = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(bytes)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
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
}

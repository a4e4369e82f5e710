package graft.io

import java.io.{InputStream, OutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX ingestion (S2, reference main.py:1345-1346: the
  * `pd.read_excel` fallback when a drop arrives as a spreadsheet
  * instead of CSV — openpyxl per requirements.txt:5).
  *
  * An .xlsx file is a zip of XML parts; this reader uses only JDK
  * APIs (java.util.zip + StAX), so it works with zero dependencies:
  *
  *   - `xl/sharedStrings.xml` (optional): the string table; rich-text
  *     runs are concatenated like openpyxl does.
  *   - the first worksheet part under `xl/worksheets/` (reference
  *     reads the default first sheet): rows of `<c r="A1" t="...">`
  *     cells. Supported cell
  *     types: shared string (`t="s"`), inline string
  *     (`t="inlineStr"`), boolean/number/raw (`<v>` text as-is).
  *     Gaps (omitted cells) become nulls via the A1 column reference.
  *
  * Everything is surfaced as STRINGS, exactly like the CSV path —
  * downstream conformance + lenient coercions ([[graft.conform]],
  * [[graft.norm.Coerce]]) do the typing, so a spreadsheet drop flows
  * through the same pipeline as a CSV drop. The whole file parses
  * driver-side (arrival files are small operational reports — the
  * same single-process work the reference does); the DISTRIBUTED part
  * of the pipeline starts at the DataFrame this returns.
  *
  * Deliberately out of scope (documented, reachable error): .xls
  * (binary BIFF), formulas (only cached `<v>` results are read),
  * number formats (raw stored values are surfaced).
  */
object XlsxRead {

  private val xif = XMLInputFactory.newInstance()
  // The parser only ever sees driver-local trusted fixture files, but
  // disabling DTD/external entities is free and removes the XXE class.
  xif.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
  xif.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
    java.lang.Boolean.FALSE)

  /** "BC42" -> 0-based column index (54). */
  private[io] def colIndex(cellRef: String): Int = {
    val letters = cellRef.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, c) => acc * 26 + (c.toUpper - 'A' + 1)) - 1
  }

  private def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return IndexedSeq.empty
    val in = zip.getInputStream(entry)
    try {
      val r = xif.createXMLStreamReader(in)
      val out = mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => cur.clear()
              case "t"  => inT = true
              case _    =>
            }
          case XMLStreamConstants.CHARACTERS if inT =>
            cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "si" => out += cur.result()
              case "t"  => inT = false
              case _    =>
            }
          case _ =>
        }
      }
      out.toIndexedSeq
    } finally in.close()
  }

  private def firstSheet(zip: ZipFile): InputStream = {
    import scala.jdk.CollectionConverters._
    val sheets = zip.entries().asScala
      .filter(e => e.getName.startsWith("xl/worksheets/") &&
        e.getName.endsWith(".xml"))
      .toSeq.sortBy(_.getName)
    require(sheets.nonEmpty, "xlsx has no xl/worksheets/*.xml part")
    zip.getInputStream(sheets.head)
  }

  /** Parse the first worksheet into rows of nullable strings (ragged;
    * omitted trailing cells are absent, in-row gaps are nulls). */
  def readRows(path: String): Seq[Seq[String]] = {
    val zip = new ZipFile(path)
    try {
      val strings = sharedStrings(zip)
      val in = firstSheet(zip)
      try {
        val r = xif.createXMLStreamReader(in)
        val rows = mutable.ArrayBuffer.empty[Seq[String]]
        var row: mutable.ArrayBuffer[String] = null
        var nextSeqCol = 0 // fallback when a <c> has no r= attribute
        var cellType: String = null
        var cellCol = 0
        var inV = false
        val v = new StringBuilder
        def put(col: Int, value: String): Unit = {
          while (row.length < col) row += null
          if (row.length == col) row += value else row(col) = value
        }
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "row" =>
                  row = mutable.ArrayBuffer.empty[String]
                  nextSeqCol = 0
                case "c" =>
                  val ref = r.getAttributeValue(null, "r")
                  cellCol = if (ref != null) colIndex(ref) else nextSeqCol
                  nextSeqCol = cellCol + 1
                  cellType = r.getAttributeValue(null, "t")
                  v.clear()
                case "v" | "t" => inV = true
                case _         =>
              }
            case XMLStreamConstants.CHARACTERS if inV =>
              v.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "v" | "t" => inV = false
                case "c" =>
                  val raw = v.result()
                  val value = cellType match {
                    case "s" => strings(raw.trim.toInt)
                    case _   => raw // inlineStr <t> text / number / bool
                  }
                  put(cellCol, value)
                case "row" => rows += row.toSeq
                case _     =>
              }
            case _ =>
          }
        }
        rows.toSeq
      } finally in.close()
    } finally zip.close()
  }

  /** First row = header (normalized downstream like the CSV path),
    * remaining rows = all-string data — the same contract as
    * [[CsvProbe.read]], so the conform/coerce pipeline is shared. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = readRows(path)
    require(rows.nonEmpty, s"xlsx '$path' has no rows")
    val header = rows.head.map(h => if (h == null) "" else h)
    val width = header.length
    val schema = StructType(header.map(StructField(_, StringType)))
    val data = rows.tail.map { r =>
      Row.fromSeq(r.padTo(width, null).take(width))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toList, 1), schema)
  }

  /** Minimal xlsx WRITER — fixture/roundtrip support only (the engine
    * sinks are parquet/JDBC; spreadsheets are an arrival format, not
    * an output format). Emits the three parts a reader needs:
    * [Content_Types], workbook, one inline-string worksheet. */
  def writeMinimal(path: String, rows: Seq[Seq[String]]): Unit = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.result()
    }
    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8"?>""")
      .append("<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    rows.zipWithIndex.foreach { case (cells, ri) =>
      sheet.append(s"""<row r="${ri + 1}">""")
      cells.zipWithIndex.foreach { case (c, ci) =>
        if (c != null)
          sheet.append(s"""<c r="${colRef(ci)}${ri + 1}" t="inlineStr">""" +
            s"<is><t>${esc(c)}</t></is></c>")
      }
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")
    val parts = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8"?>""" +
          "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
          "<Default Extension=\"xml\" ContentType=\"application/xml\"/></Types>"),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8"?>""" +
          "<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
          "<sheets><sheet name=\"Sheet1\" sheetId=\"1\"/></sheets></workbook>"),
      "xl/worksheets/sheet1.xml" -> sheet.result())
    val out: OutputStream = java.nio.file.Files.newOutputStream(
      java.nio.file.Paths.get(path))
    val zos = new ZipOutputStream(out)
    try parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }
}

package graft.io

import java.io.{InputStream, OutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType,
  StringType, StructField, StructType, TimestampType}

/** Minimal XLSX ingestion (S2, reference main.py:1345-1346: the
  * `pd.read_excel` fallback when a drop arrives as a spreadsheet
  * instead of CSV — openpyxl per requirements.txt:5).
  *
  * An .xlsx file is a zip of XML parts; this reader uses only JDK
  * APIs (java.util.zip + StAX), so it works with zero dependencies:
  *
  *   - `xl/sharedStrings.xml` (optional): the string table; rich-text
  *     runs are concatenated like openpyxl does.
  *   - `xl/styles.xml` (optional): cell formats — needed to tell a
  *     DATE cell from a plain number, exactly as openpyxl does (xlsx
  *     stores dates as serial numbers; only the number FORMAT marks
  *     them as dates).
  *   - the first worksheet part under `xl/worksheets/` (reference
  *     reads the default first sheet): rows of `<c r="A1" t="...">`
  *     cells. Supported cell types: shared string (`t="s"`), inline
  *     string (`t="inlineStr"`), boolean (`t="b"`), formula-cached
  *     string (`t="str"`), number/raw (`<v>` text). Gaps (omitted
  *     cells) become nulls via the A1 column reference.
  *
  * Two read surfaces share one parse:
  *   - [[read]] surfaces everything as STRINGS, exactly like the CSV
  *     path — downstream conformance + lenient coercions
  *     ([[graft.conform]], [[graft.norm.Coerce]]) do the typing, so a
  *     spreadsheet drop flows through the same pipeline as a CSV drop.
  *   - [[readTyped]] surfaces TYPED cells like `pd.read_excel`
  *     (main.py:1345-1346): numeric cells as LONG/DOUBLE, date-format
  *     cells as TIMESTAMP, booleans as BOOLEAN, unified per column
  *     (a mixed column degrades to string, pandas' object-dtype
  *     analogue) — for users reading a spreadsheet OUTSIDE the
  *     conformance pipeline.
  *
  * The whole file parses driver-side (arrival files are small
  * operational reports — the same single-process work the reference
  * does; pandas is equally single-process), GUARDED by a size cap
  * with an actionable error so a surprise multi-GB workbook fails
  * fast instead of exhausting driver memory. The DISTRIBUTED part of
  * the pipeline starts at the DataFrame this returns.
  *
  * Deliberately out of scope (documented, reachable error): .xls
  * (binary BIFF — openpyxl has the same limit), formulas (only cached
  * `<v>` results are read), non-date number formats (raw stored
  * values are surfaced).
  */
object XlsxRead {

  /** Driver-parse size cap (compressed bytes). Arrival spreadsheets
    * are daily operational reports (KBs–MBs); anything beyond this is
    * almost certainly a mis-routed data file that would OOM the
    * single-process parse. Overridable per call for a deliberate
    * large read. */
  val DefaultMaxBytes: Long = 64L * 1024 * 1024

  private val xif = XMLInputFactory.newInstance()
  // The parser only ever sees driver-local trusted fixture files, but
  // disabling DTD/external entities is free and removes the XXE class.
  xif.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
  xif.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
    java.lang.Boolean.FALSE)

  /** Days between the Excel epoch (1899-12-30, the 1900 date system
    * as every library actually implements it) and 1970-01-01. */
  private val ExcelEpochOffsetDays = 25569.0
  private val MsPerDay = 86400000.0

  /** One parsed cell: `text` is the raw string rendering (the
    * [[read]] contract, identical to the pre-typed behavior), `value`
    * the typed rendering (null | String | Double | Boolean |
    * java.sql.Timestamp). */
  private final case class XCell(text: String, value: Any)

  /** "BC42" -> 0-based column index (54). */
  private[io] def colIndex(cellRef: String): Int = {
    val letters = cellRef.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, c) => acc * 26 + (c.toUpper - 'A' + 1)) - 1
  }

  /** xlsx compresses its XML heavily, so the real driver-memory cost
    * is the DECOMPRESSED part size; parts are allowed this multiple
    * of the compressed-file cap before the guard trips. */
  private val MaxInflation = 16L

  private def guard(path: String, maxBytes: Long): Unit = {
    val size = new java.io.File(path).length()
    require(size <= maxBytes,
      s"xlsx '$path' is $size bytes, over the $maxBytes-byte driver-parse " +
        "cap: the workbook parses single-process on the driver (same as " +
        "pd.read_excel). Convert the file to CSV/parquet for a distributed " +
        "read, or raise the cap explicitly via the maxBytes argument if " +
        "the driver has the memory for it.")
  }

  /** The compressed-file cap alone is not enough: repetitive sheet XML
    * routinely inflates 10-50x, and the OOM risk tracks decompressed
    * bytes (plus materialized cells). The central directory records
    * each part's uncompressed size, so this is a free pre-parse
    * check; an unrecorded size (-1, never produced by real writers)
    * passes and the file cap still bounds it. */
  private def guardPart(path: String, e: ZipEntry, maxBytes: Long): Unit =
    require(e.getSize < 0 || e.getSize <= maxBytes * MaxInflation,
      s"xlsx '$path' part '${e.getName}' decompresses to ${e.getSize} " +
        s"bytes, over the ${maxBytes * MaxInflation}-byte driver-parse " +
        "cap (compressed cap x" + MaxInflation + "): the workbook parses " +
        "single-process on the driver. Convert the file to CSV/parquet " +
        "for a distributed read, or raise the cap explicitly via the " +
        "maxBytes argument if the driver has the memory for it.")

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

  /** Built-in numFmtIds that render as dates/times (ECMA-376 §18.8.30;
    * 27–36 and 50–58 are the locale calendar variants). */
  private val BuiltinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** openpyxl-style heuristic for CUSTOM format codes: date-ish iff a
    * y/m/d/h/s token survives after stripping quoted literals,
    * escaped chars, and [bracketed] sections. */
  private[io] def isDateFormatCode(code: String): Boolean = {
    val stripped = code
      .replaceAll("\"[^\"]*\"", "")
      .replaceAll("\\\\.", "")
      .replaceAll("\\[[^\\]]*\\]", "")
    stripped.exists(c => "ymdhsYMDHS".indexOf(c) >= 0)
  }

  /** Style indices (the `s=` attribute values) whose number format is
    * a date format — the set openpyxl derives to type date cells. */
  private def dateStyles(zip: ZipFile): Set[Int] = {
    val entry = zip.getEntry("xl/styles.xml")
    if (entry == null) return Set.empty
    val in = zip.getInputStream(entry)
    try {
      val r = xif.createXMLStreamReader(in)
      val customDateFmts = mutable.Set.empty[Int]
      val xfFmtIds = mutable.ArrayBuffer.empty[Int]
      var inCellXfs = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "numFmt" =>
                val id = r.getAttributeValue(null, "numFmtId")
                val code = r.getAttributeValue(null, "formatCode")
                if (id != null && code != null && isDateFormatCode(code))
                  customDateFmts += id.toInt
              case "cellXfs" => inCellXfs = true
              case "xf" if inCellXfs =>
                val id = r.getAttributeValue(null, "numFmtId")
                xfFmtIds += (if (id == null) 0 else id.toInt)
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT =>
            if (r.getLocalName == "cellXfs") inCellXfs = false
          case _ =>
        }
      }
      xfFmtIds.zipWithIndex.collect {
        case (fmt, i) if BuiltinDateFmts(fmt) || customDateFmts(fmt) => i
      }.toSet
    } finally in.close()
  }

  private def firstSheet(zip: ZipFile): ZipEntry = {
    import scala.jdk.CollectionConverters._
    val sheets = zip.entries().asScala
      .filter(e => e.getName.startsWith("xl/worksheets/") &&
        e.getName.endsWith(".xml"))
      .toSeq.sortBy(_.getName)
    require(sheets.nonEmpty, "xlsx has no xl/worksheets/*.xml part")
    sheets.head
  }

  /** Excel serial number -> timestamp (UTC instant; serials are
    * day-resolution plus a time-of-day fraction, so ms rounding is
    * exact for any real workbook value). */
  private def serialToTimestamp(serial: Double): java.sql.Timestamp =
    new java.sql.Timestamp(
      math.rint((serial - ExcelEpochOffsetDays) * MsPerDay).toLong)

  /** Parse the first worksheet into typed cells (ragged; omitted
    * trailing cells are absent, in-row gaps are nulls). */
  private def parseSheet(path: String, maxBytes: Long): Seq[Seq[XCell]] = {
    val zip = new ZipFile(path)
    try {
      Seq("xl/sharedStrings.xml", "xl/styles.xml").foreach { n =>
        val e = zip.getEntry(n)
        if (e != null) guardPart(path, e, maxBytes)
      }
      val sheetEntry = firstSheet(zip)
      guardPart(path, sheetEntry, maxBytes)
      val strings = sharedStrings(zip)
      val dateStyleIdx = dateStyles(zip)
      val in = zip.getInputStream(sheetEntry)
      try {
        val r = xif.createXMLStreamReader(in)
        val rows = mutable.ArrayBuffer.empty[Seq[XCell]]
        var row: mutable.ArrayBuffer[XCell] = null
        var nextSeqCol = 0 // fallback when a <c> has no r= attribute
        var cellType: String = null
        var cellStyle = -1
        var cellCol = 0
        var inV = false
        val v = new StringBuilder
        def put(col: Int, value: XCell): Unit = {
          while (row.length < col) row += null
          if (row.length == col) row += value else row(col) = value
        }
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "row" =>
                  row = mutable.ArrayBuffer.empty[XCell]
                  nextSeqCol = 0
                case "c" =>
                  val ref = r.getAttributeValue(null, "r")
                  cellCol = if (ref != null) colIndex(ref) else nextSeqCol
                  nextSeqCol = cellCol + 1
                  cellType = r.getAttributeValue(null, "t")
                  val s = r.getAttributeValue(null, "s")
                  cellStyle = if (s == null) -1 else s.toInt
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
                  val cell = cellType match {
                    case "s" =>
                      val s = strings(raw.trim.toInt)
                      XCell(s, s)
                    case "inlineStr" | "str" => XCell(raw, raw)
                    case "b" =>
                      XCell(raw, java.lang.Boolean.valueOf(raw.trim == "1"))
                    case _ if raw.isEmpty => XCell(raw, null)
                    case _ => // number (or unformatted raw text)
                      val typed: Any = raw.trim.toDoubleOption match {
                        case Some(d) if dateStyleIdx(cellStyle) =>
                          serialToTimestamp(d)
                        case Some(d) => java.lang.Double.valueOf(d)
                        case None    => raw
                      }
                      XCell(raw, typed)
                  }
                  put(cellCol, cell)
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

  /** Parse the first worksheet into rows of nullable strings — the
    * raw `<v>` text, the exact contract the conformance pipeline
    * coerces downstream. */
  def readRows(path: String,
      maxBytes: Long = DefaultMaxBytes): Seq[Seq[String]] = {
    guard(path, maxBytes)
    parseSheet(path, maxBytes).map(_.map(c => if (c == null) null else c.text))
  }

  /** First row = header (normalized downstream like the CSV path),
    * remaining rows = all-string data — the same contract as
    * [[CsvProbe.read]], so the conform/coerce pipeline is shared. */
  def read(spark: SparkSession, path: String,
      maxBytes: Long = DefaultMaxBytes): DataFrame = {
    val rows = readRows(path, maxBytes)
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

  /** TYPED read, the `pd.read_excel` shape: first row = header, each
    * data column unified to the narrowest Spark type covering every
    * non-null cell — TIMESTAMP (all date-format cells), LONG (all
    * numbers, all integral), DOUBLE (all numbers), BOOLEAN, else
    * STRING via the raw text (pandas' object-dtype analogue for mixed
    * columns). No string detour: a numeric or date cell lands typed
    * without passing through the lenient coercions. */
  def readTyped(spark: SparkSession, path: String,
      maxBytes: Long = DefaultMaxBytes): DataFrame = {
    guard(path, maxBytes)
    val rows = parseSheet(path, maxBytes)
    require(rows.nonEmpty, s"xlsx '$path' has no rows")
    val header = rows.head.map(c => if (c == null || c.text == null) "" else c.text)
    val width = header.length
    val data = rows.tail.map(_.padTo(width, null: XCell).take(width))

    def unify(col: Int): DataType = {
      val vals = data.flatMap(r => Option(r(col)).map(_.value))
        .filter(_ != null)
      if (vals.isEmpty) StringType
      else if (vals.forall(_.isInstanceOf[java.sql.Timestamp])) TimestampType
      else if (vals.forall(_.isInstanceOf[java.lang.Double])) {
        val ds = vals.map(_.asInstanceOf[java.lang.Double].doubleValue())
        val integral = ds.forall(d =>
          d == math.rint(d) && math.abs(d) <= 9.007199254740992e15)
        if (integral) LongType else DoubleType
      } else if (vals.forall(_.isInstanceOf[java.lang.Boolean])) BooleanType
      else StringType
    }

    val types = (0 until width).map(unify)
    val schema = StructType(header.lazyZip(types).map(StructField(_, _)))
    val converted = data.map { r =>
      Row.fromSeq((0 until width).map { i =>
        val c = r(i)
        if (c == null || c.value == null) null
        else types(i) match {
          case LongType =>
            c.value.asInstanceOf[java.lang.Double].doubleValue().toLong
          case DoubleType =>
            c.value.asInstanceOf[java.lang.Double].doubleValue()
          case TimestampType => c.value
          case BooleanType   => c.value
          case _             => c.text
        }
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(converted.toList, 1), schema)
  }

  /** Minimal xlsx WRITER — fixture/roundtrip support only (the engine
    * sinks are parquet/JDBC; spreadsheets are an arrival format, not
    * an output format). Emits the parts a reader needs:
    * [Content_Types], workbook, styles (one date format), one
    * worksheet. Cells may be typed: String -> inline string,
    * Number -> numeric cell, Boolean -> boolean cell,
    * java.sql.Timestamp / java.time.LocalDate -> serial-number cell
    * carrying the date style; null -> omitted (a gap). */
  def writeMinimal(path: String, rows: Seq[Seq[Any]]): Unit = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.result()
    }
    def num(d: Double): String = // integral serials/values stay compact
      if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8"?>""")
      .append("<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    rows.zipWithIndex.foreach { case (cells, ri) =>
      sheet.append(s"""<row r="${ri + 1}">""")
      cells.zipWithIndex.foreach { case (c, ci) =>
        val ref = s"${colRef(ci)}${ri + 1}"
        c match {
          case null =>
          case s: String =>
            sheet.append(s"""<c r="$ref" t="inlineStr">""" +
              s"<is><t>${esc(s)}</t></is></c>")
          case b: java.lang.Boolean =>
            sheet.append(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
          case t: java.sql.Timestamp =>
            val serial = t.getTime / MsPerDay + ExcelEpochOffsetDays
            sheet.append(s"""<c r="$ref" s="1"><v>${num(serial)}</v></c>""")
          case d: java.time.LocalDate =>
            val serial = d.toEpochDay + ExcelEpochOffsetDays
            sheet.append(s"""<c r="$ref" s="1"><v>${num(serial)}</v></c>""")
          case n: Number =>
            sheet.append(s"""<c r="$ref"><v>${esc(n.toString)}</v></c>""")
          case other =>
            sheet.append(s"""<c r="$ref" t="inlineStr">""" +
              s"<is><t>${esc(other.toString)}</t></is></c>")
        }
      }
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")
    val styles =
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        "<styleSheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
        "<cellXfs count=\"2\">" +
        "<xf numFmtId=\"0\"/>" +
        "<xf numFmtId=\"14\" applyNumberFormat=\"1\"/>" + // builtin date
        "</cellXfs></styleSheet>"
    val parts = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8"?>""" +
          "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
          "<Default Extension=\"xml\" ContentType=\"application/xml\"/></Types>"),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8"?>""" +
          "<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
          "<sheets><sheet name=\"Sheet1\" sheetId=\"1\"/></sheets></workbook>"),
      "xl/styles.xml" -> styles,
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

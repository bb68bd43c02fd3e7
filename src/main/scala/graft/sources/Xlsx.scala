package graft.sources

import java.io.{ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal XLSX read/write on JVM built-ins (java.util.zip + StAX) —
  * no external dependency (reference: native_libs/src/IO/XLSX.cpp via
  * xlnt; optional there too).
  *
  * Parity contract (XLSX.cpp:100-167): header policies share the CSV
  * naming rules (empty header cell -> MISSING_i, generated colN, short
  * custom lists pad colN); the default column type is TEXT with missing
  * cells as empty strings; callers wanting typed columns opt into the
  * same 50-row deduction the CSV reader uses. Cell forms handled:
  * shared strings, inline strings, formula-cached strings, booleans,
  * numbers. Styled date serials are NOT decoded (xlnt does styles; out
  * of minimal scope) — write timestamps as ISO text instead.
  *
  * Scale stance: XLSX is a single-file exchange format (zip of XML, not
  * splittable) — parsed driver-side like Feather v1; convert to Parquet
  * for querying at scale.
  */
object Xlsx {

  // ------------------------------------------------------------------ read

  private def sharedStrings(zip: ZipFile): Vector[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return Vector.empty
    val rd = javax.xml.stream.XMLInputFactory.newInstance()
      .createXMLStreamReader(zip.getInputStream(entry))
    val out = Vector.newBuilder[String]
    var cur: StringBuilder = null
    var inT = false
    var inRPh = 0 // phonetic (furigana) runs: their <t> text is NOT cell text
    while (rd.hasNext) {
      rd.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          rd.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t" => inT = true
            case "rPh" => inRPh += 1
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
          if (inT && inRPh == 0 && cur != null) cur.append(rd.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          rd.getLocalName match {
            case "si" => out += unescapeCellText(cur.result()); cur = null
            case "t" => inT = false
            case "rPh" => inRPh -= 1
            case _ =>
          }
        case _ =>
      }
    }
    rd.close()
    out.result()
  }

  /** "BC7" -> 0-based column index 54. */
  private def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref(i).isLetter) { acc = acc * 26 + (ref(i) - 'A' + 1); i += 1 }
    acc - 1
  }

  /** Parse the first worksheet into sparse string cells. */
  private def readCells(zip: ZipFile): (mutable.ArrayBuffer[mutable.Map[Int, String]], Int) = {
    val sheetEntry = {
      val names = zip.entries()
      def sheetNum(n: String): Int =
        n.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml").toInt
      var best: ZipEntry = null
      while (names.hasMoreElements) {
        val e = names.nextElement()
        if (e.getName.matches("xl/worksheets/sheet\\d+\\.xml") &&
          (best == null || sheetNum(e.getName) < sheetNum(best.getName))) best = e
      }
      require(best != null, "xlsx: no worksheet found")
      best
    }
    val shared = sharedStrings(zip)
    val rd = javax.xml.stream.XMLInputFactory.newInstance()
      .createXMLStreamReader(zip.getInputStream(sheetEntry))
    val rows = mutable.ArrayBuffer[mutable.Map[Int, String]]()
    var maxCol = 0
    var row: mutable.Map[Int, String] = null
    var cellCol = -1; var cellType = ""; var nextColGuess = 0
    var inV = false; var inT = false
    val text = new StringBuilder
    while (rd.hasNext) {
      rd.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          rd.getLocalName match {
            case "row" => row = mutable.Map.empty; nextColGuess = 0
            case "c" =>
              val r = rd.getAttributeValue(null, "r")
              cellCol = if (r != null) colIndex(r) else nextColGuess
              nextColGuess = cellCol + 1
              val t = rd.getAttributeValue(null, "t")
              cellType = if (t == null) "n" else t
              text.clear()
            case "v" => inV = true
            case "t" => inT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
          if (inV || inT) text.append(rd.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          rd.getLocalName match {
            case "v" => inV = false
            case "t" => inT = false
            case "c" if row != null && cellCol >= 0 =>
              val raw = text.result()
              val value = cellType match {
                case "s" => shared(raw.trim.toInt) // already unescaped
                case "b" => if (raw.trim == "1") "true" else "false"
                case "str" | "inlineStr" => unescapeCellText(raw)
                case _ => raw // n carries a number
              }
              row(cellCol) = value
              if (cellCol + 1 > maxCol) maxCol = cellCol + 1
              cellCol = -1
            case "row" => rows += row; row = null
            case _ =>
          }
        case _ =>
      }
    }
    rd.close()
    (rows, maxCol)
  }

  /** Read the first worksheet. Default: every column TEXT, missing cells
    * empty strings (reference's non-nullable-text default). With
    * `deduceTypes`, the CSV reader's 50-row deduction applies (missing
    * cells become nulls first, so they don't vote). */
  def read(spark: SparkSession, path: String,
      header: TableIO.HeaderPolicy = TableIO.HeaderFromFirstRow,
      deduceTypes: Boolean = false): DataFrame = {
    val zip = new ZipFile(path)
    val (cells, width) = try readCells(zip) finally zip.close()
    val headerRow = cells.headOption.getOrElse(mutable.Map.empty[Int, String])
    val names = header match {
      case TableIO.HeaderFromFirstRow =>
        (0 until width).map(i => headerRow.get(i).filter(_.nonEmpty).getOrElse(s"MISSING_$i"))
      case TableIO.GenerateColumnNames => (0 until width).map(i => s"col$i")
      case TableIO.CustomNames(ns) =>
        (0 until width).map(i => if (i < ns.length) ns(i) else s"col$i")
    }
    val dataRows = if (header == TableIO.HeaderFromFirstRow) cells.drop(1) else cells
    val missing: String = if (deduceTypes) null else ""
    val rows = new java.util.ArrayList[Row](dataRows.length)
    dataRows.foreach { r =>
      rows.add(Row.fromSeq((0 until width).map(i => r.getOrElse(i, missing))))
    }
    val schema = StructType(names.map(StructField(_, StringType)))
    val df = spark.createDataFrame(rows, schema)
    if (deduceTypes) TableIO.applyDeducedSchema(spark, df, TableIO.CsvOptions())
    else df
  }

  // ----------------------------------------------------------------- write

  /** ECMA-376 cell-text escape: chars invalid in XML 1.0 (controls except
    * TAB/LF/CR) would make the whole workbook unreadable — Excel itself
    * writes them as `_xHHHH_`, escaping a literal collision-shaped `_x`
    * as `_x005F_x`. [[unescapeCellText]] inverts this on read. */
  private[sources] def escapeCellText(s: String): String = {
    val guarded = EscSeqRe.matcher(s).replaceAll("_x005F_x$1_")
    guarded.flatMap {
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' =>
        f"_x${c.toInt}%04X_"
      case c => c.toString
    }
  }
  private val EscSeqRe = java.util.regex.Pattern.compile("_x([0-9A-Fa-f]{4})_")
  private[sources] def unescapeCellText(s: String): String =
    if (!s.contains("_x")) s
    else {
      val m = EscSeqRe.matcher(s)
      val sb = new StringBuffer
      while (m.find()) {
        val cp = Integer.parseInt(m.group(1), 16)
        m.appendReplacement(sb,
          java.util.regex.Matcher.quoteReplacement(cp.toChar.toString))
      }
      m.appendTail(sb)
      sb.toString
    }

  private def xml(s: String): String =
    escapeCellText(s).flatMap {
      case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
      case '"' => "&quot;"; case '\'' => "&apos;"; case c => c.toString
    }

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.result()
  }

  /** Write a DataFrame as a single-sheet XLSX (collected driver-side —
    * exchange format, not the scale sink). Numbers write as number
    * cells, booleans as boolean cells, everything else (incl.
    * timestamps, as ISO text) as inline strings. */
  def write(df: DataFrame, path: String, header: Boolean = true): Unit = {
    // XLSX sheets hard-cap at 1,048,576 rows, and the writer collects
    // driver-side — refuse early with the scale-sink pointer instead of
    // producing a corrupt sheet or an OOM. The limit+collect probe reads
    // at most cap+1 rows, never the full overage.
    val cap = 1048576 - (if (header) 1 else 0)
    val rows = df.limit(cap + 1).collect()
    if (rows.length > cap)
      throw new IllegalArgumentException(
        s"XLSX export collects driver-side and sheets cap at 1,048,576 " +
          s"rows ($path would exceed $cap data rows). Write Parquet for " +
          "scale (df.write.parquet) or export a bounded slice.")
    val fields = df.schema.fields
    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sheet.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    var rowNum = 1
    def cellXml(ci: Int, v: Any, dt: DataType): String = {
      val ref = s"${colRef(ci)}$rowNum"
      (v, dt) match {
        case (null, _) => "" // omitted cell = missing
        case (b: Boolean, _) => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
        case (x, _: NumericType) => s"""<c r="$ref"><v>$x</v></c>"""
        case (x, _) => s"""<c r="$ref" t="inlineStr"><is><t>${xml(x.toString)}</t></is></c>"""
      }
    }
    if (header) {
      sheet.append(s"""<row r="$rowNum">""")
      fields.zipWithIndex.foreach { case (f, i) =>
        sheet.append(s"""<c r="${colRef(i)}$rowNum" t="inlineStr"><is><t>${xml(f.name)}</t></is></c>""")
      }
      sheet.append("</row>")
      rowNum += 1
    }
    rows.foreach { r =>
      sheet.append(s"""<row r="$rowNum">""")
      fields.indices.foreach { i =>
        sheet.append(cellXml(i, if (r.isNullAt(i)) null else r.get(i), fields(i).dataType))
      }
      sheet.append("</row>")
      rowNum += 1
    }
    sheet.append("</sheetData></worksheet>")

    val entries = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          """<sheets><sheet name="Table" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """</Relationships>"""),
      "xl/worksheets/sheet1.xml" -> sheet.result())

    val zos = new ZipOutputStream(new FileOutputStream(path))
    try entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }
}

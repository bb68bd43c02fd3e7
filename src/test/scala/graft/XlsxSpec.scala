package graft

import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.{TableIO, Xlsx}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** XLSX reader/writer: round-trip, shared strings, header policies,
  * MISSING_i naming, sparse cells, type deduction opt-in. */
class XlsxSpec extends SparkSpec {

  private def tmpPath(name: String): String =
    java.nio.file.Files.createTempDirectory("xlsx").resolve(name).toString

  test("write -> read round-trip (text default) and sniff dispatch") {
    import spark.implicits._
    val df = Seq((1L, "hello", 2.5), (2L, "wor<ld> & \"q\"", -0.25), (3L, "", 0.0))
      .toDF("id", "s", "d")
    val p = tmpPath("rt.xlsx")
    TableIO.write(df, p)
    assert(TableIO.sniff(p) == TableIO.Xlsx)
    val back = TableIO.read(spark, p) // text-default read
    assert(back.columns.toSeq == Seq("id", "s", "d"))
    assert(back.schema.fields.forall(_.dataType == StringType))
    val rows = back.orderBy("id").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1", "2", "3"))
    assert(rows(1).getString(1) == "wor<ld> & \"q\"") // XML escaping round-trips
    assert(rows(1).getString(2) == "-0.25")
  }

  test("deduceTypes applies the CSV 50-row rule; round-trips typed values") {
    import spark.implicits._
    val df = Seq((1L, 1.5, "x"), (2L, 2.5, "y")).toDF("i", "d", "s")
    val p = tmpPath("typed.xlsx")
    Xlsx.write(df, p)
    val back = Xlsx.read(spark, p, deduceTypes = true)
    assert(back.schema("i").dataType == LongType)
    assert(back.schema("d").dataType == DoubleType)
    assert(back.schema("s").dataType == StringType)
    assert(back.orderBy("i").collect().map(_.toSeq).toSeq ==
      df.orderBy("i").collect().map(_.toSeq).toSeq)
  }

  test("reads shared strings and sparse cells from a foreign-style file") {
    // hand-crafted minimal xlsx using sharedStrings (our writer uses inline
    // strings, so this exercises the other cell form) with a missing cell
    val p = tmpPath("shared.xlsx")
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>""" +
        """<row r="2"><c r="A2"><v>7</v></c><c r="B2" t="s"><v>2</v></c></row>""" +
        """<row r="3"><c r="B3" t="s"><v>0</v></c></row>""" + // A3 missing
        """</sheetData></worksheet>"""
    val shared =
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<si><t>alpha</t></si><si><t>beta</t></si><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>"""
    val zos = new ZipOutputStream(new java.io.FileOutputStream(p))
    Seq("xl/worksheets/sheet1.xml" -> sheet, "xl/sharedStrings.xml" -> shared)
      .foreach { case (n, c) =>
        zos.putNextEntry(new ZipEntry(n)); zos.write(c.getBytes("UTF-8")); zos.closeEntry()
      }
    zos.close()
    val df = Xlsx.read(spark, p)
    assert(df.columns.toSeq == Seq("alpha", "beta"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "7")
    assert(rows(0).getString(1) == "rich") // multi-run shared string concatenated
    assert(rows(1).getString(0) == "")     // missing cell -> empty string (text default)
    assert(rows(1).getString(1) == "alpha")
  }

  test("header policies: MISSING_i, generated colN, custom names pad") {
    import spark.implicits._
    val df = Seq(("", "b", "c"), ("1", "2", "3")).toDF("x", "y", "z")
    val p = tmpPath("hdr.xlsx")
    // write WITHOUT header so the first data row ("", b, c) acts as header
    Xlsx.write(df, p, header = false)
    val first = Xlsx.read(spark, p)
    assert(first.columns.toSeq == Seq("MISSING_0", "b", "c"))
    val gen = Xlsx.read(spark, p, header = TableIO.GenerateColumnNames)
    assert(gen.columns.toSeq == Seq("col0", "col1", "col2"))
    assert(gen.count() == 2)
    val custom = Xlsx.read(spark, p, header = TableIO.CustomNames(Seq("only")))
    assert(custom.columns.toSeq == Seq("only", "col1", "col2"))
  }

  test("control characters round-trip via ECMA-376 _xHHHH_ escapes") {
    import spark.implicits._
    // NUL and BS are invalid in XML 1.0 — written raw they make the
    // workbook unreadable; a literal _x0041_ in DATA must also survive
    val dirty = Seq(("a\u0000b", "tab\tok"), ("_x0041_literal", "cd"))
      .toDF("x", "y")
    val p = java.nio.file.Files.createTempDirectory("xlsxctl")
      .resolve("t.xlsx").toString
    Xlsx.write(dirty, p)
    val back = Xlsx.read(spark, p).collect().map(r => (r.getString(0), r.getString(1)))
    assert(back.toSet == Set(("a\u0000b", "tab\tok"), ("_x0041_literal", "cd")))
  }

  test("phonetic rPh runs in shared strings are not cell text") {
    // Japanese-Excel style: <si><t>東京</t><rPh sqref="1"><t>トウキョウ</t></rPh></si>
    val dir = java.nio.file.Files.createTempDirectory("xlsxrph")
    val p = dir.resolve("t.xlsx")
    val zip = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(p))
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(content.getBytes("UTF-8")); zip.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets><sheet name="S" sheetId="1" r:id="rId1" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/></sheets></workbook>""")
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="1" uniqueCount="1"><si><t>東京</t><rPh sb="0" eb="2"><t>トウキョウ</t></rPh></si></sst>""")
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c></row></sheetData></worksheet>""")
    zip.close()
    val got = Xlsx.read(spark, p.toString,
      header = TableIO.GenerateColumnNames).collect()
    assert(got.length == 1 && got(0).getString(0) == "東京")
  }

  test("write refuses above the 1,048,576-row sheet cap with the scale-sink pointer") {
    // header on -> 1,048,575 data rows fit; one more must refuse (XLSX
    // sheets hard-cap, and the writer collects driver-side)
    val df = spark.range(0, 1048576L).toDF("x")
    val p = java.nio.file.Files.createTempDirectory("xlsx")
      .resolve("cap.xlsx").toString
    val e = intercept[IllegalArgumentException] { Xlsx.write(df, p) }
    assert(e.getMessage.contains("Parquet"))
    assert(!new java.io.File(p).exists())
  }
}

package graft.sources

import java.util.zip.{ZipEntry, ZipOutputStream}

/** Test-side xlsx writer: emits a minimal REAL workbook (zip of OOXML
  * parts — content types, workbook, rels, one worksheet per sheet) the
  * way a spreadsheet tool would, so reader tests run on workbook BYTES
  * rather than on the CSV exports the reference commits. Strings go as
  * inline strings, numbers as number cells, nulls as ABSENT cells (the
  * sparse form Excel itself writes for blanks) — which is why every cell
  * carries an explicit `r` reference. */
object XlsxTestWriter {

  /** 0-based column index → "A", "Z", "AA", … */
  private def colName(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      val r = (n - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;") // also used inside attribute values (sheet names)

  private def cell(ref: String, v: Any): String = v match {
    case null => ""
    case None => ""
    case Some(x) => cell(ref, x)
    case d: Double => s"""<c r="$ref"><v>$d</v></c>"""
    case i: Int => s"""<c r="$ref"><v>$i</v></c>"""
    case l: Long => s"""<c r="$ref"><v>$l</v></c>"""
    case s: String => s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(s)}</t></is></c>"""
    case other => cell(ref, other.toString)
  }

  /** Write `sheets` as (name, header, rows); returns the temp-file path.
    * Row values may be String / Double / Int / Long / Option / null —
    * nulls become absent cells. */
  def write(prefix: String, sheets: Seq[(String, Seq[String], Seq[Seq[Any]])]): String = {
    val f = java.io.File.createTempFile(prefix, ".xlsx")
    f.deleteOnExit()
    val z = new ZipOutputStream(new java.io.FileOutputStream(f))
    def entry(name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    }
    // conformant OPC content types: the workbook and each worksheet get
    // their real spreadsheetml Override (a reader that dispatches on
    // content type — as spreadsheet tools do — needs these, not just the
    // xml Default graft's lenient XlsxSource would accept)
    entry("[Content_Types].xml",
      s"""<?xml version="1.0"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |  <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |  <Default Extension="xml" ContentType="application/xml"/>
         |  <Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |${sheets.indices.map(i =>
             s"""  <Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
           .mkString("\n")}
         |</Types>""".stripMargin)
    // the package-root relationship that points a generic OPC reader at
    // the workbook part
    entry("_rels/.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |  <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/workbook.xml",
      s"""<?xml version="1.0"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
         |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |  <sheets>
         |${sheets.zipWithIndex.map { case ((n, _, _), i) =>
             s"""    <sheet name="${esc(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
           }.mkString("\n")}
         |  </sheets>
         |</workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |${sheets.indices.map(i =>
             s"""  <Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""")
           .mkString("\n")}
         |</Relationships>""".stripMargin)
    sheets.zipWithIndex.foreach { case ((_, header, rows), si) =>
      val body = (header.map(h => h: Any) +: rows).zipWithIndex.map { case (r, ri) =>
        val cells = r.zipWithIndex
          .map { case (v, ci) => cell(s"${colName(ci)}${ri + 1}", v) }
          .mkString
        s"""<row r="${ri + 1}">$cells</row>"""
      }.mkString("\n")
      entry(s"xl/worksheets/sheet${si + 1}.xml",
        s"""<?xml version="1.0"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
           |<sheetData>
           |$body
           |</sheetData>
           |</worksheet>""".stripMargin)
    }
    z.close()
    f.getAbsolutePath
  }
}

package graft.sources

import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S9 native scan, proven against a workbook this spec BUILDS byte-level
  * (zip entries + OOXML parts) — the same 3-sheet shape as the survey
  * workbook `code/10_global_cva_analysis.R:30-37` reads, exercising
  * shared strings (incl. rich-text runs), inline strings, formula
  * caches, booleans, sparse cells and space-dotted headers. */
class XlsxSourceSpec extends SparkSpec {

  private def entry(z: ZipOutputStream, name: String, body: String): Unit = {
    z.putNextEntry(new ZipEntry(name))
    z.write(body.getBytes("UTF-8"))
    z.closeEntry()
  }

  private def writeFixture(): String = {
    val f = java.io.File.createTempFile("graft_survey", ".xlsx")
    f.deleteOnExit()
    val z = new ZipOutputStream(new java.io.FileOutputStream(f))
    entry(z, "[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry(z, "xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |  <sheets>
        |    <sheet name="survey" sheetId="1" r:id="rId1"/>
        |    <sheet name="sub_grants" sheetId="2" r:id="rId2"/>
        |    <sheet name="pc_tv" sheetId="3" r:id="rId3"/>
        |  </sheets>
        |</workbook>""".stripMargin)
    entry(z, "xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |  <Relationship Id="rId1" Type="ws" Target="worksheets/sheet1.xml"/>
        |  <Relationship Id="rId2" Type="ws" Target="worksheets/sheet2.xml"/>
        |  <Relationship Id="rId3" Type="ws" Target="worksheets/sheet3.xml"/>
        |</Relationships>""".stripMargin)
    // 0: plain, 1: rich-text runs (concatenated), 2-4: plain
    entry(z, "xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="5" uniqueCount="5">
        |  <si><t>Organisation</t></si>
        |  <si><r><t>Save the </t></r><r><t>Children</t></r></si>
        |  <si><t>Oxfam GB</t></si>
        |  <si><t>Take out</t></si>
        |  <si><t>CVA data year</t></si>
        |</sst>""".stripMargin)
    // survey: header has SPACES in "PC USD m"/"TV USD m" (dotted on
    // read); B3 absent -> null; C3 is a formula with a cached value
    entry(z, "xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1">
        |      <c r="A1" t="s"><v>0</v></c>
        |      <c r="B1" t="inlineStr"><is><t>PC USD m</t></is></c>
        |      <c r="C1" t="inlineStr"><is><t>TV USD m</t></is></c>
        |    </row>
        |    <row r="2">
        |      <c r="A2" t="s"><v>1</v></c>
        |      <c r="B2"><v>12.5</v></c>
        |      <c r="C2"><v>20</v></c>
        |    </row>
        |    <row r="3">
        |      <c r="A3" t="s"><v>2</v></c>
        |      <c r="C3"><f>B3*2</f><v>7.25</v></c>
        |    </row>
        |  </sheetData>
        |</worksheet>""".stripMargin)
    // sub_grants: boolean cell + lowercase y filter column
    entry(z, "xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1">
        |      <c r="A1" t="s"><v>0</v></c>
        |      <c r="B1" t="s"><v>3</v></c>
        |      <c r="C1" t="inlineStr"><is><t>flag</t></is></c>
        |    </row>
        |    <row r="2">
        |      <c r="A2" t="s"><v>1</v></c>
        |      <c r="B2" t="inlineStr"><is><t>Y</t></is></c>
        |      <c r="C2" t="b"><v>1</v></c>
        |    </row>
        |    <row r="3">
        |      <c r="A3" t="s"><v>2</v></c>
        |      <c r="B3" t="inlineStr"><is><t>n</t></is></c>
        |      <c r="C3" t="b"><v>0</v></c>
        |    </row>
        |  </sheetData>
        |</worksheet>""".stripMargin)
    // pc_tv: numeric-only; an EMPTY row that read.xlsx would skip
    entry(z, "xl/worksheets/sheet3.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1">
        |      <c r="A1" t="s"><v>4</v></c>
        |      <c r="B1" t="inlineStr"><is><t>pc_average</t></is></c>
        |    </row>
        |    <row r="2"><c r="A2"><v>2023</v></c><c r="B2"><v>1.8</v></c></row>
        |    <row r="3"/>
        |    <row r="4"><c r="A4"><v>2024</v></c><c r="B4"><v>2.0</v></c></row>
        |  </sheetData>
        |</worksheet>""".stripMargin)
    z.close()
    f.getAbsolutePath
  }

  test("3-sheet survey workbook reads like read.xlsx: dotted headers, nulls, formula caches") {
    val path = writeFixture()
    val survey = XlsxSource.readSheet(spark, path, sheet = 1)
    assert(survey.columns.toSeq == Seq("Organisation", "PC.USD.m", "TV.USD.m"))
    val rows = survey.collect().map(r =>
      (r.getString(0), Option(r.getString(1)), Option(r.getString(2)))).toSeq
    assert(rows == Seq(
      ("Save the Children", Some("12.5"), Some("20")), // rich-text si concatenated
      ("Oxfam GB", None, Some("7.25")))) // absent B3 null; formula cache read
    // the reference's first post-read step works directly (as.numeric)
    assert(survey.select(sum(col("`PC.USD.m`").cast("double"))).head.getDouble(0) == 12.5)
  }

  test("sheet 2 by index and by name agree; booleans print R-style") {
    val path = writeFixture()
    val byIdx = XlsxSource.readSheet(spark, path, sheet = 2).collect()
    val byName = XlsxSource.readSheetByName(spark, path, "sub_grants").collect()
    assert(byIdx.map(_.toSeq).toSeq == byName.map(_.toSeq).toSeq)
    assert(byIdx.map(_.getString(2)).toSeq == Seq("TRUE", "FALSE"))
    // the reference's subset(tolower(Take.out) == "y") filter shape
    val kept = XlsxSource.readSheet(spark, path, sheet = 2)
      .filter(lower(col("`Take.out`")) === "y")
    assert(kept.count() == 1 && kept.head.getString(0) == "Save the Children")
  }

  test("sheet 3: numeric cells as strings, empty rows skipped, names listed in order") {
    val path = writeFixture()
    assert(XlsxSource.sheetNames(path) == Seq("survey", "sub_grants", "pc_tv"))
    val pcTv = XlsxSource.readSheet(spark, path, sheet = 3)
    assert(pcTv.columns.toSeq == Seq("CVA.data.year", "pc_average"))
    assert(pcTv.count() == 2) // the empty <row/> is skipped, as read.xlsx
    assert(pcTv.select(col("`CVA.data.year`").cast("int")).collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(2023, 2024))
    intercept[IllegalArgumentException](XlsxSource.readSheet(spark, path, sheet = 4))
    intercept[IllegalArgumentException](XlsxSource.readSheetByName(spark, path, "nope"))
  }

  /** The FIXTURES §6 survey-workbook shape (code/10:30-37 columns). */
  private def writeSurveyFixture(): String = {
    val f = java.io.File.createTempFile("graft_cva_survey", ".xlsx")
    f.deleteOnExit()
    val z = new ZipOutputStream(new java.io.FileOutputStream(f))
    entry(z, "[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry(z, "xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |  <sheets>
        |    <sheet name="survey_data" sheetId="1" r:id="rId1"/>
        |    <sheet name="sub_grants" sheetId="2" r:id="rId2"/>
        |    <sheet name="pc_tv_estimate" sheetId="3" r:id="rId3"/>
        |  </sheets>
        |</workbook>""".stripMargin)
    entry(z, "xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |  <Relationship Id="rId1" Type="ws" Target="worksheets/sheet1.xml"/>
        |  <Relationship Id="rId2" Type="ws" Target="worksheets/sheet2.xml"/>
        |  <Relationship Id="rId3" Type="ws" Target="worksheets/sheet3.xml"/>
        |</Relationships>""".stripMargin)
    def is(s: String) = s"""<c t="inlineStr"><is><t>$s</t></is></c>"""
    def num(s: String) = s"""<c><v>$s</v></c>"""
    def sheet(header: Seq[String], rows: Seq[Seq[String]]): String = {
      val body = (header.map(is) +: rows)
        .map(cells => s"<row>${cells.mkString}</row>").mkString("\n")
      s"""<?xml version="1.0"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>
         |$body
         |</sheetData>
         |</worksheet>""".stripMargin
    }
    // untrimmed Organisation on row 1: read.xlsx keeps it, code/10:31 trims
    entry(z, "xl/worksheets/sheet1.xml", sheet(
      Seq("Organisation", "Year", "Org_type", "PC USD m", "TV USD m"),
      Seq(Seq(is("  Save the Children  "), num("2023"), is("INGO"), num("100"), num("150")),
        Seq(is("Oxfam GB"), num("2023"), is("INGO"), num("50"), num("75")),
        Seq(is("Oxfam GB"), num("2024"), is("INGO"), num("30"), is("unknown")))))
    entry(z, "xl/worksheets/sheet2.xml", sheet(
      Seq("Recipient.org", "Amount.USD", "Year", "Take out"),
      Seq(Seq(is("Save the Children"), num("20"), num("2023"), is("Y")),
        Seq(is("Oxfam GB"), num("10"), num("2023"), is("n")))))
    entry(z, "xl/worksheets/sheet3.xml", sheet(
      Seq("CVA data year", "PC average used"),
      Seq(Seq(num("2023"), num("1.5")), Seq(num("2024"), num("2.0")))))
    z.close()
    f.getAbsolutePath
  }

  test("readSurveyWorkbook mirrors code/10:30-37: trim, numeric casts, Take.out filter, year rename") {
    val (survey, subGrants, pcTv) =
      XlsxSource.readSurveyWorkbook(spark, writeSurveyFixture())
    // str_trim + as.numeric (a non-numeric TV cell -> NA, i.e. null)
    assert(survey.schema("PC.USD.m").dataType.typeName == "double")
    val sorted = survey.orderBy("Organisation", "Year").collect()
    assert(sorted.map(_.getString(0)).toSeq ==
      Seq("Oxfam GB", "Oxfam GB", "Save the Children"))
    assert(sorted.map(r => Option(r.get(4))).toSeq ==
      Seq(Some(75.0), None, Some(150.0)))
    // subset(tolower(Take.out) == "y") kept only the Y row
    assert(subGrants.collect().map(_.getString(0)).toSeq == Seq("Save the Children"))
    // setnames(pc_tv_estimate, "CVA.data.year", "year")
    assert(pcTv.columns.toSeq == Seq("year", "PC.average.used"))
  }

  test("workbook frames drive the GlobalAnalysis undouble + rollup spine") {
    import graft.cva.GlobalAnalysis
    val (survey, subGrants, pcTv) =
      XlsxSource.readSurveyWorkbook(spark, writeSurveyFixture())
    val cvaAgg = survey.select(
      col("Organisation").as("clean_org"), col("Year"), lit("all").as("newMoney"),
      col("`PC.USD.m`"), col("Org_type"))
    val sg = subGrants.select(
      col("`Recipient.org`").as("clean_org"), col("Year"), lit("all").as("newMoney"),
      col("`Amount.USD`").cast("double").as("amount_usd"))
    val rolled = GlobalAnalysis.orgTypeRollup(
      GlobalAnalysis.undoubleAgg(cvaAgg, sg),
      pcTv.select(col("year").as("Year"),
        col("`PC.average.used`").cast("double").as("pc_average")))
      .orderBy("Year").collect()
    // 2023: (100-20) + 50 = 130, TV = 130*1.5; 2024: 30, TV = 30*2.0
    assert(rolled.map(r => (r.getString(0), r.getDouble(2), r.getDouble(3))).toSeq ==
      Seq(("2023", 130.0, 195.0), ("2024", 30.0, 60.0)))
  }

  test("column references decode beyond Z") {
    assert(XlsxSource.colIndex("A1") == 0)
    assert(XlsxSource.colIndex("Z9") == 25)
    assert(XlsxSource.colIndex("AA3") == 26)
    assert(XlsxSource.colIndex("BC7") == 54)
  }
}

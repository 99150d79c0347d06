package graft.sources

import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Native Excel scan (S9) — `openxlsx::read.xlsx(path, sheet = n)` as the
  * reference runs it on the 3-sheet survey workbook
  * (`code/10_global_cva_analysis.R:30-37`), without any Excel library:
  * .xlsx IS a zip of XML parts, and both the zip codec and a streaming
  * XML parser ship with the JDK.
  *
  * Faithful to read.xlsx where the reference depends on it:
  *  - sheet addressed by 1-BASED index (or name), in workbook order;
  *  - first row is the header, with spaces dotted the way openxlsx
  *    produced the committed goldens' names (`PC.USD.m`,
  *    `Reasons.for.year-on-year.change`);
  *  - absent cells are NULL (sparse cell lists, not ragged rows);
  *  - shared strings, inline strings and formula caches all resolve.
  * One deliberate divergence: every column lands as STRING and callers
  * cast — the reference itself re-casts the numeric columns on arrival
  * (`as.numeric(survey_data$PC.USD.m)`, code/10:31-32), so engine-side
  * inference would only add a second, implicit casting layer.
  *
  * Scale note: an xlsx workbook is a DRIVER-SIDE boundary by nature
  * (central directory + shared-string table make the format
  * unsplittable, and the reference's workbooks are hand-curated KBs).
  * The parse happens once on the driver and the rows become an ordinary
  * DataFrame; anything 100 TB-sized arrives via the parquet/CSV scans,
  * not Excel.
  */
object XlsxSource {

  /** `read.xlsx(path, sheet = i)` — 1-based sheet index. */
  def readSheet(spark: SparkSession, path: String, sheet: Int = 1): DataFrame = {
    val sheets = sheetTable(path)
    require(sheet >= 1 && sheet <= sheets.length,
      s"sheet $sheet out of range: workbook has ${sheets.length} sheets")
    read(spark, path, sheets(sheet - 1)._2)
  }

  /** The survey-workbook entrypoint exactly as code/10:30-37 opens it:
    * (survey_data with `Organisation` trimmed and PC/TV cast numeric,
    * sub_grants filtered to `tolower(Take.out) == "y"`, pc_tv_estimate
    * with `CVA.data.year` renamed `year`). Everything downstream
    * ([[graft.cva.GlobalAnalysis]]) takes these three frames. */
  def readSurveyWorkbook(spark: SparkSession, path: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, lower, trim}
    // as.numeric is NA-on-failure (code/10:32-33) → try_cast, not the
    // ANSI cast that would fail the job on one free-text cell
    val survey = readSheet(spark, path, sheet = 1)
      .withColumn("Organisation", trim(col("Organisation")))
      .withColumn("PC.USD.m", col("`PC.USD.m`").try_cast("double"))
      .withColumn("TV.USD.m", col("`TV.USD.m`").try_cast("double"))
    val subGrants = readSheet(spark, path, sheet = 2)
      .filter(lower(col("`Take.out`")) === "y")
    val pcTv = readSheet(spark, path, sheet = 3)
      .withColumnRenamed("CVA.data.year", "year")
    (survey, subGrants, pcTv)
  }

  /** `read.xlsx(path, sheet = "name")`. */
  def readSheetByName(spark: SparkSession, path: String, name: String): DataFrame = {
    val sheets = sheetTable(path)
    val hit = sheets.collectFirst { case (n, target) if n == name => target }
    require(hit.isDefined,
      s"no sheet named '$name'; workbook has: ${sheets.map(_._1).mkString(", ")}")
    read(spark, path, hit.get)
  }

  /** Sheet names in workbook order. */
  def sheetNames(path: String): Seq[String] = sheetTable(path).map(_._1)

  // ---- workbook plumbing -------------------------------------------------

  private def withZip[T](path: String)(f: ZipFile => T): T = {
    val zip = new ZipFile(path)
    try f(zip) finally zip.close()
  }

  private def part(zip: ZipFile, name: String): Option[Array[Byte]] =
    Option(zip.getEntry(name)).map { e =>
      val in = zip.getInputStream(e)
      try in.readAllBytes() finally in.close()
    }

  private def parser(bytes: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    // zip content is untrusted input: no DTDs, no external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
  }

  /** (sheet name, zip part path) in workbook order: workbook.xml lists
    * the sheets with relationship ids; the .rels part maps each id to
    * its worksheet part. */
  private def sheetTable(path: String): Seq[(String, String)] = withZip(path) { zip =>
    val rels: Map[String, String] = {
      val p = parser(part(zip, "xl/_rels/workbook.xml.rels")
        .getOrElse(throw new IllegalArgumentException(s"$path: not an xlsx (no workbook rels)")))
      val m = Seq.newBuilder[(String, String)]
      while (p.hasNext) {
        if (p.next() == XMLStreamConstants.START_ELEMENT && p.getLocalName == "Relationship") {
          val target = p.getAttributeValue(null, "Target")
          m += ((p.getAttributeValue(null, "Id"),
            if (target.startsWith("/")) target.drop(1) else s"xl/$target"))
        }
      }
      m.result().toMap
    }
    val p = parser(part(zip, "xl/workbook.xml")
      .getOrElse(throw new IllegalArgumentException(s"$path: not an xlsx (no workbook)")))
    val out = Seq.newBuilder[(String, String)]
    while (p.hasNext) {
      if (p.next() == XMLStreamConstants.START_ELEMENT && p.getLocalName == "sheet") {
        val name = p.getAttributeValue(null, "name")
        // the relationship attribute is namespaced (r:id); match by local name
        val rid = (0 until p.getAttributeCount)
          .collectFirst { case i if p.getAttributeLocalName(i) == "id" => p.getAttributeValue(i) }
        rid.flatMap(rels.get).foreach(t => out += ((name, t)))
      }
    }
    out.result()
  }

  /** sharedStrings.xml: each <si> may hold one <t> or rich-text runs
    * (<r><t>…) — concatenate every <t> inside the item. */
  private def sharedStrings(zip: ZipFile): IndexedSeq[String] =
    part(zip, "xl/sharedStrings.xml").map { bytes =>
      val p = parser(bytes)
      val out = IndexedSeq.newBuilder[String]
      var cur: java.lang.StringBuilder = null
      var inT = false
      while (p.hasNext) p.next() match {
        case XMLStreamConstants.START_ELEMENT if p.getLocalName == "si" =>
          cur = new java.lang.StringBuilder()
        case XMLStreamConstants.START_ELEMENT if p.getLocalName == "t" => inT = true
        case XMLStreamConstants.CHARACTERS if inT && cur != null =>
          cur.append(p.getText)
        case XMLStreamConstants.END_ELEMENT if p.getLocalName == "t" => inT = false
        case XMLStreamConstants.END_ELEMENT if p.getLocalName == "si" =>
          out += cur.toString; cur = null
        case _ => ()
      }
      out.result()
    }.getOrElse(IndexedSeq.empty)

  /** "BC7" → 0-based column 54 (letters only; the digits are the row). */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def read(spark: SparkSession, path: String, sheetPart: String): DataFrame =
    withZip(path) { zip =>
      val sst = sharedStrings(zip)
      val p = parser(part(zip, sheetPart)
        .getOrElse(throw new IllegalArgumentException(s"$path: missing part $sheetPart")))
      val rows = Seq.newBuilder[Map[Int, String]]
      var row: scala.collection.mutable.Map[Int, String] = null
      var cellCol = -1
      var cellType = ""
      var text: java.lang.StringBuilder = null
      var collecting = false
      while (p.hasNext) p.next() match {
        case XMLStreamConstants.START_ELEMENT => p.getLocalName match {
          case "row" => row = scala.collection.mutable.Map.empty
          case "c" if row != null =>
            cellCol = Option(p.getAttributeValue(null, "r")).map(colIndex)
              .getOrElse(if (row.isEmpty) 0 else row.keys.max + 1)
            cellType = Option(p.getAttributeValue(null, "t")).getOrElse("")
          case "v" | "t" if cellCol >= 0 =>
            text = new java.lang.StringBuilder(); collecting = true
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS if collecting => text.append(p.getText)
        case XMLStreamConstants.END_ELEMENT => p.getLocalName match {
          case "v" | "t" if collecting =>
            collecting = false
            val raw = text.toString
            val value = cellType match {
              case "s" => sst(raw.trim.toInt) // shared-string index
              case "b" => if (raw.trim == "1") "TRUE" else "FALSE" // R logical print form
              case _ => raw // numeric, "str" formula cache, inlineStr <t>
            }
            // rich inline strings append runs; everything else overwrites
            row.updateWith(cellCol) {
              case Some(prev) if cellType == "inlineStr" => Some(prev + value)
              case _ => Some(value)
            }
          case "row" if row != null =>
            if (row.nonEmpty) rows += row.toMap // skipEmptyRows, as read.xlsx
            row = null; cellCol = -1
          case _ => ()
        }
        case _ => ()
      }
      val all = rows.result()
      require(all.nonEmpty, s"$path: $sheetPart has no rows")
      val header = all.head
      val width = header.keys.max + 1
      // openxlsx-style names: spaces become dots (the committed goldens'
      // `PC.USD.m` shape); unnamed columns get X<position> like R
      val names = (0 until width).map { i =>
        header.get(i).map(_.trim.replace(" ", ".")).filter(_.nonEmpty)
          .getOrElse(s"X${i + 1}")
      }
      val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
      val data = all.tail.map { r =>
        Row.fromSeq((0 until width).map(i => r.get(i).orNull))
      }
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
        schema)
    }
}

package graft.sources

import java.io.{DataOutputStream, FileOutputStream}
import java.util.zip.GZIPOutputStream

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S7 native scan, proven two ways: against an .RData stream this spec
  * WRITES byte-level (XDR tokens per "R Internals" §Serialization
  * Formats — NAs of every type, factors, Latin-1 strings, ALTREP
  * compact sequences, data.table's external-pointer attribute), and
  * against the reference's committed `projects/project_data_<y>.RData`
  * stages (`code/07_process_project_data.R:26-35`). */
class RDataSourceSpec extends SparkSpec {

  // ---- XDR fixture writer ------------------------------------------------

  private val NaInt = Int.MinValue
  private val NaRealBits = 0x7ff00000000007a2L

  private final class W(out: DataOutputStream) {
    private def flags(t: Int, obj: Boolean = false, attr: Boolean = false,
        tag: Boolean = false, levels: Int = 0): Unit =
      out.writeInt(t | (if (obj) 256 else 0) | (if (attr) 512 else 0) |
        (if (tag) 1024 else 0) | (levels << 12))
    def nil(): Unit = flags(254)
    def charsxp(s: String): Unit =
      if (s == null) { flags(9); out.writeInt(-1) }
      else { val b = s.getBytes("UTF-8"); flags(9); out.writeInt(b.length); out.write(b) }
    def charLatin1(s: String): Unit = { // levels bit 2 marks Latin-1
      val b = s.getBytes("ISO-8859-1")
      flags(9, levels = 4); out.writeInt(b.length); out.write(b)
    }
    def sym(name: String): Unit = { flags(1); charsxp(name) }
    def str(vs: String*): Unit = { flags(16); out.writeInt(vs.length); vs.foreach(charsxp) }
    def ints(attr: Boolean, obj: Boolean, vs: Int*): Unit = {
      flags(13, obj = obj, attr = attr); out.writeInt(vs.length); vs.foreach(out.writeInt)
    }
    def realBits(vs: Long*): Unit = { flags(14); out.writeInt(vs.length); vs.foreach(out.writeLong) }
    def reals(vs: Double*): Unit = realBits(vs.map(java.lang.Double.doubleToRawLongBits): _*)
    def lgls(vs: Int*): Unit = { flags(10); out.writeInt(vs.length); vs.foreach(out.writeInt) }
    def pairNode(tagName: String): Unit = { flags(2, tag = true); sym(tagName) }
    def pairNodeUntagged(): Unit = flags(2)
    def vecsxp(n: Int, attr: Boolean): Unit = { flags(19, obj = true, attr = attr); out.writeInt(n) }
    def altrep(): Unit = flags(238)
    def extptr(): Unit = flags(22)
  }

  /** One data.frame `df` exercising every decode path, plus a non-frame
    * binding `note` the frame lookup must skip. */
  private def writeFixture(): String = {
    val f = java.io.File.createTempFile("graft_rdata", ".RData")
    f.deleteOnExit()
    val gz = new GZIPOutputStream(new FileOutputStream(f))
    val out = new DataOutputStream(gz)
    out.writeBytes("RDX3\n")
    out.writeBytes("X\n")
    out.writeInt(3); out.writeInt(0x040402); out.writeInt(0x030500) // versions
    val enc = "UTF-8".getBytes; out.writeInt(enc.length); out.write(enc)
    val w = new W(out)

    w.pairNode("df")
    w.vecsxp(6, attr = true) // the data.frame: 6 columns x 3 rows
    w.ints(attr = false, obj = false, 7, NaInt, -3) // n: int with NA
    w.realBits(java.lang.Double.doubleToRawLongBits(1.5), NaRealBits,
      java.lang.Double.doubleToRawLongBits(Double.NaN)) // x: NA vs real NaN
    w.lgls(1, 0, NaInt) // b: logical with NA
    w.str("alpha", null, "café") // s: string with NA
    // g: factor c("lo","hi",NA) with levels c("hi","lo")
    w.ints(attr = true, obj = true, 2, 1, NaInt)
    w.pairNode("levels"); w.str("hi", "lo")
    w.pairNode("class"); w.str("factor"); w.nil()
    // k: ALTREP compact_intseq 1:3 (modern row-id shape); the class
    // descriptor is an UNTAGGED pairlist (name sym, package sym, type)
    w.altrep()
    w.pairNodeUntagged(); w.sym("compact_intseq")
    w.pairNodeUntagged(); w.sym("base")
    w.pairNodeUntagged(); w.ints(attr = false, obj = false, 13); w.nil()
    w.reals(3.0, 1.0, 1.0) // state: (n, start, step)
    w.nil() // altrep attributes
    // frame attributes: names, row.names c(NA,-3), class, selfref extptr
    w.pairNode("names"); w.str("n", "x", "b", "s", "g", "k")
    w.pairNode("row.names"); w.ints(attr = false, obj = false, NaInt, -3)
    w.pairNode("class"); w.str("data.table", "data.frame")
    w.pairNode(".internal.selfref"); w.extptr(); w.nil(); w.nil()
    w.nil() // end of frame attrs
    // second binding: a bare Latin-1 string vector (not a data.frame)
    w.pairNode("note")
    out.writeInt(16); out.writeInt(1); w.charLatin1("café")
    w.nil() // end of workspace pairlist
    out.close()
    f.getAbsolutePath
  }

  test("hand-written XDR stream: every column type, NA forms, factor, ALTREP, Latin-1") {
    val path = writeFixture()
    assert(RDataSource.bindings(path) == Seq("df", "note"))
    val df = RDataSource.readDataFrame(spark, path) // sole frame; `note` skipped
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) == Seq(
      ("n", "integer"), ("x", "double"), ("b", "boolean"),
      ("s", "string"), ("g", "string"), ("k", "integer")))
    val rows = df.collect()
    assert(rows.map(r => Option(r.get(0))).toSeq == Seq(Some(7), None, Some(-3)))
    // NA_real_ -> null, but a computational NaN survives as NaN
    assert(Option(rows(0).get(1)) == Some(1.5) && rows(1).isNullAt(1)
      && rows(2).getDouble(1).isNaN)
    assert(rows.map(r => Option(r.get(2))).toSeq == Seq(Some(true), Some(false), None))
    assert(rows.map(r => Option(r.get(3))).toSeq == Seq(Some("alpha"), None, Some("café")))
    assert(rows.map(r => Option(r.get(4))).toSeq == Seq(Some("lo"), Some("hi"), None))
    assert(rows.map(_.getInt(5)).toSeq == Seq(1, 2, 3)) // compact_intseq materialized
    intercept[IllegalArgumentException](RDataSource.readDataFrame(spark, path, "nope"))
  }

  test("committed project stage loads natively: load() + rbindlist shape of code/07:26-35") {
    val dir = "/root/reference/projects"
    assume(new java.io.File(s"$dir/project_data_2017.RData").exists())
    val y2017 = RDataSource.readDataFrame(spark, s"$dir/project_data_2017.RData", "all_projects")
    assert(y2017.count() == 4585)
    assert(y2017.columns.toSeq == Seq("project_id", "project_name", "project_objective",
      "project_year", "currently_requested_funds", "plan_id", "plan_name", "global_clusters",
      "organisation_ids", "organisation_names", "question", "answer"))
    assert(y2017.select("project_year").distinct().head.getInt(0) == 2017)
    // rbindlist across years: the id columns drift int -> " | "-joined
    // string over the years, so align on the stable analysis columns
    val all = Seq("2017", "2018", "2024")
      .map(y => RDataSource.readDataFrame(spark, s"$dir/project_data_$y.RData")
        .select(col("project_year"), col("question"), col("organisation_names")))
      .reduce(_ unionByName _)
    assert(all.count() > y2017.count())
    assert(all.select(countDistinct("project_year")).head.getLong(0) == 3)
  }
}

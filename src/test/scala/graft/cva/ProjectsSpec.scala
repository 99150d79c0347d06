package graft.cva

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProjectsSpec extends SparkSpec {
  import spark.implicits._

  private def questions = Seq(
    ("What % cash?", "quantC"), ("What % vouchers?", "quantV"),
    ("Any CVA?", "flagCVA"), ("Notes", "otherCVA"))
    .toDF("question", "qtype")

  test("cashProjects: quant sum capped, flags bool-or, patches + C5 (code/07)") {
    val qa = Seq(
      // p1: 40% + 30% quant, flag yes
      ("p1", "What % cash?", "40%"), ("p1", "What % vouchers?", "30 percent"),
      ("p1", "Any CVA?", "yes"),
      // p2: quant only, over 100 → capped
      ("p2", "What % cash?", "80"), ("p2", "What % vouchers?", "45%"),
      // p3: flag false only → patched to 0 percent
      ("p3", "Any CVA?", "non"),
      // p4: flag true but zero percent answer → C5 forces false
      ("p4", "What % cash?", "0"), ("p4", "Any CVA?", "qui"),
      // p5: garbage answers only → dropped from quant; flag true stays
      ("p5", "What % cash?", "unknown"), ("p5", "Any CVA?", "TRUE"),
      // unmapped question ignored
      ("p1", "Unmapped?", "99%"))
      .toDF("project_id", "question", "answer")
    val out = Projects.cashProjects(qa, questions)
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]), Option(r.get(2)).map(_.asInstanceOf[Boolean])))
      .toMap
    assert(out("p1") == (Some(0.7), Some(true)))
    assert(out("p2") == (Some(1.0), Some(true)))   // capped at 100 → 1.0; pct>0 ⇒ cva
    assert(out("p3") == (Some(0.0), Some(false)))  // patched zero + false
    assert(out("p4") == (Some(0.0), Some(false)))  // C5: pct==0 overrides "qui"
    assert(out("p5") == (None, Some(true)))        // no parseable pct; flag kept
  }

  test("exchange rates: OECD ≻ WB ≻ IFS precedence on the iso×year grid") {
    val isos = Seq("MLI", "NER").toDF("iso3")
    val years = Seq("2020", "2021").toDF("year")
    val oecd = Seq(("MLI", "2020", 555.0)).toDF("iso3", "year", "value")
    val wb = Seq(("MLI", "2020", 111.0), ("MLI", "2021", 222.0)).toDF("iso3", "year", "value")
    val ifs = Seq(("NER", "2020", 333.0)).toDF("iso3", "year", "value")
    val out = ExchangeRates.build(isos, years, oecd, wb, ifs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (Option(r.get(2)), Option(r.getString(3)))).toMap
    assert(out(("MLI", "2020")) == (Some(555.0), Some("OECD"))) // OECD wins over WB
    assert(out(("MLI", "2021")) == (Some(222.0), Some("WB")))
    assert(out(("NER", "2020")) == (Some(333.0), Some("IFS")))
    assert(out(("NER", "2021")) == (None, None))                // grid row survives empty
  }
}

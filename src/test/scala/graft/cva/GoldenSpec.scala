package graft.cva

import graft.SparkSpec
import graft.cva.CvaPipeline
import org.apache.spark.sql.functions._

/** Golden end-to-end parity (SURVEY §5.2): re-derive the reference's
  * committed `output/cva_agg_org_type.csv` from its committed upstream
  * `output/cva_agg.csv` using the engine's operators (A7 rollup + C6
  * undoubling + TV imputation, reference code/10:313-324), and verify the
  * undoubling invariant on every row of the upstream itself.
  *
  * The PC→TV ratio (pc_tv_estimate sheet) is not committed; it is
  * recovered per-year from the golden (TV/PC is constant within a year by
  * construction) and cross-checked for consistency first.
  */
class GoldenSpec extends SparkSpec {
  private val refOut = "/root/reference/output"

  private def readRef(name: String) =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$refOut/$name")

  test("C6 invariant holds on every committed cva_agg row: undoubled = pmax(PC - subgrant, 0)") {
    assume(new java.io.File(s"$refOut/cva_agg.csv").exists())
    val agg = readRef("cva_agg.csv")
    val recomputed = agg.withColumn("recomputed",
      CvaPipeline.undouble(col("`PC.USD.m`"), col("`PC.USD.m_subgrant`")))
    val bad = recomputed
      .filter(abs(col("recomputed") - col("`PC.USD.m_undoubled`")) > 1e-9)
      .count()
    assert(bad == 0)
  }

  test("A7 rollup of cva_agg reproduces cva_agg_org_type (code/10:316-319)") {
    assume(new java.io.File(s"$refOut/cva_agg.csv").exists())
    val agg = readRef("cva_agg.csv")
    val golden = readRef("cva_agg_org_type.csv")

    // recover the per-year PC→TV factor from the golden, verifying it is
    // consistent within each year (max-min ratio spread ≈ 0)
    val ratios = golden.filter(col("`PC.USD.m`") > 0)
      .withColumn("ratio", col("`TV.USD.m`") / col("`PC.USD.m`"))
      .groupBy("Year")
      .agg(min("ratio").as("rmin"), max("ratio").as("rmax"), first("ratio").as("ratio"))
    assert(ratios.filter(col("rmax") - col("rmin") > 1e-9).count() == 0)

    val rollup = agg.groupBy("Year", "Org_type")
      .agg(sum("`PC.USD.m_undoubled`").as("pc"))
      .join(ratios.select(col("Year"), col("ratio")), Seq("Year"), "left")
      .withColumn("tv", col("pc") * col("ratio"))

    val joined = golden.join(rollup, Seq("Year", "Org_type"), "outer")
    // FTS years (2017+) are fully derivable; earlier years come from the
    // survey side which is upstream of cva_agg too — all rows must match.
    val mismatches = joined.filter(
      col("pc").isNull || col("`PC.USD.m`").isNull ||
      abs(col("pc") - col("`PC.USD.m`")) > 1e-6 ||
      (col("`TV.USD.m`").isNotNull && abs(col("tv") - col("`TV.USD.m`")) > 1e-6))
    val n = mismatches.count()
    if (n > 0) mismatches.show(10, truncate = false)
    assert(n == 0)
    assert(joined.count() == golden.count()) // no extra groups invented
  }

  test("cva_agg: every derivable column re-derived across all 1,562 rows (row-count + sorted-hash)") {
    // The true upstreams (output/fts_cva.csv, cva_survey_data.xlsx) are
    // MISSING_LARGE_BLOBS, so the aggregate's input-side columns come
    // from the golden itself; every column code/10 DERIVES from them is
    // recomputed with the engine's operators and hash-compared:
    //   clean_org       = ICU-punct clean of Organisation (code/10:105)
    //   PC.USD.m_undoubled = pmax(PC - subgrant, 0)       (code/10:314-315)
    //   TV.USD.m (FTS)  = PC × per-year PC→TV factor       (code/10:71-72)
    // The PC→TV factor sheet is not committed; it is recovered per year
    // from the FTS rows and consistency-checked first (TV/PC is constant
    // within a year by construction).
    assume(new java.io.File(s"$refOut/cva_agg.csv").exists())
    val agg = readRef("cva_agg.csv")
    assert(agg.count() == 1562)

    val ratios = agg.filter(col("source") === "FTS" && col("`PC.USD.m`") > 0 &&
        col("`TV.USD.m`").isNotNull)
      .withColumn("ratio", col("`TV.USD.m`") / col("`PC.USD.m`"))
      .groupBy("Year")
      .agg(min("ratio").as("rmin"), max("ratio").as("rmax"), first("ratio").as("ratio"))
    assert(ratios.filter(col("rmax") - col("rmin") > 1e-9).count() == 0,
      "PC→TV factor not constant within a year — recovery invalid")

    // concat_ws silently skips NULLs (which would shift fields), and R's
    // NA propagates through `NA - 0` where greatest() would swallow it —
    // so every field is explicitly sentinel'd and NULL PC keeps its
    // undoubled NULL.
    def fmt(c: org.apache.spark.sql.Column) =
      coalesce(format_number(c, 6), lit("NA"))
    def tuple(clean: org.apache.spark.sql.Column, undoubled: org.apache.spark.sql.Column,
        tv: org.apache.spark.sql.Column) =
      concat_ws("|", coalesce(clean, lit("")), col("Year").cast("string"),
        fmt(col("`PC.USD.m`")), fmt(undoubled), fmt(tv))

    val joined = agg.join(broadcast(ratios.select("Year", "ratio")), Seq("Year"), "left")
    val committed = joined.select(tuple(col("clean_org"),
      col("`PC.USD.m_undoubled`"), col("`TV.USD.m`")).as("t"))
    val derived = joined.select(tuple(
      graft.functions.TextFns.cleanNameUnicode(
        coalesce(col("Organisation"), col("`destinationObjects_Organization.name`"), lit(""))),
      when(col("`PC.USD.m`").isNotNull,
        CvaPipeline.undouble(col("`PC.USD.m`"), coalesce(col("`PC.USD.m_subgrant`"), lit(0.0)))),
      when(col("source") === "FTS", col("`PC.USD.m`") * col("ratio"))
        .otherwise(col("`TV.USD.m`"))).as("t"))

    def sortedHash(df: org.apache.spark.sql.DataFrame): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(df.collect().map(_.getString(0)).sorted.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(derived.count() == 1562)
    assert(sortedHash(derived) == sortedHash(committed),
      {
        val c = committed.collect().map(_.getString(0)).sorted
        val d = derived.collect().map(_.getString(0)).sorted
        val diffs = c.zip(d).filter { case (a, b) => a != b }.take(5)
        s"derived cva_agg diverges from golden, e.g.:\n${diffs.mkString("\n")}"
      })
  }

  test("unifyNames cascade on the golden's real 555-org universe (code/10:117-301)") {
    // Right side = the committed cva_agg's distinct clean_org values
    // (real org names, accents included); left side = real subgrant
    // recipient names committed in code/10's manual-match block plus
    // names from the committed fts_survey_overlap mapping. Exercises all
    // four precedence tiers on real data:
    //   manual    — "drc" → "danish refugee council" (code/10:255-257):
    //               unblocked fuzzy would hit "nrc"/"dca"-class traps
    //               (the reference manually REJECTED its own fuzzy match
    //               for exactly this name, code/10:158)
    //   exact     — "qatar charity" is in the universe verbatim
    //   fuzzy     — "action against hunger usa" is within the 20% edit
    //               budget of "action against hunger" (d=4 ≤ ⌈0.2·24⌉)
    //   substring — "mercy corps europe" contains "mercy corps" as a
    //               word-bounded phrase and nothing closer
    assume(new java.io.File(s"$refOut/cva_agg.csv").exists())
    import spark.implicits._
    val universe = readRef("cva_agg.csv")
      .select(col("clean_org").as("survey_org"))
      .filter(col("survey_org").isNotNull && col("survey_org") =!= "")
      .distinct()
    assert(universe.count() == 555)

    val manual = Seq( // literal entries from code/10:229-285
      ("drc", "danish refugee council"),
      ("wfp", "world food programme"),
      ("wvi", "world vision international"),
      ("acf", "action against hunger"),
      ("united nations children s fund", "unicef"),
      ("somali cash consortium", "concern worldwide"))
      .toDF("org_name", "clean_org")
    val left = (manual.select("org_name") union Seq(
      "qatar charity", "action against hunger usa", "mercy corps europe")
      .toDF("org_name")).distinct()

    val out = GlobalAnalysis.unifyNames(left, universe, manual,
        clean = graft.functions.TextFns.cleanNameUnicode)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("drc") == "danish refugee council")
    assert(out("wfp") == "world food programme")
    assert(out("wvi") == "world vision international")
    assert(out("acf") == "action against hunger")
    assert(out("united nations children s fund") == "unicef")
    assert(out("somali cash consortium") == "concern worldwide")
    assert(out("qatar charity") == "qatar charity")
    assert(out("action against hunger usa") == "action against hunger")
    assert(out("mercy corps europe") == "mercy corps")

    // manual really is load-bearing: without it, "drc" keeps its own name
    // (first-letter blocking + the 1-char budget reject the "nrc"/"dca"
    // traps the reference had to hand-fix), while the data-driven tiers
    // still resolve the others identically.
    val noManual = GlobalAnalysis.unifyNames(left, universe,
        manual.limit(0), clean = graft.functions.TextFns.cleanNameUnicode)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(noManual("drc") == "drc")
    assert(noManual("action against hunger usa") == "action against hunger")
    assert(noManual("mercy corps europe") == "mercy corps")
  }

  test("A8 invariants hold on the committed USA location analysis (code/11:62-89)") {
    // the upstream fts_cva.csv is a MISSING_LARGE_BLOB, so the full
    // re-derivation isn't possible; the golden's internal relationship
    // IS derivable: pc = USA / all, USA ≤ all, and per-location rows are
    // unique (the full-outer location join produced no duplicates)
    assume(new java.io.File(s"$refOut/fts_cva_USA_analysis.csv").exists())
    val usa = readRef("fts_cva_USA_analysis.csv")
    val withBoth = usa.filter(col("CVAamount").isNotNull && col("CVAamount_USA").isNotNull)
    assert(withBoth.filter(col("CVAamount_USA") > col("CVAamount") + 1e-6).count() == 0)
    val badPc = withBoth.filter(col("CVAamount") > 0 &&
      abs(col("CVAamount_USA") / col("CVAamount") - col("CVAamount_USA_pc")) > 1e-9)
    assert(badPc.count() == 0)
    assert(usa.select("`destinationObjects_Location.name`").distinct().count() == usa.count())
  }

  test("USA location table re-derived across all 98 rows (row-count + sorted-hash, code/11:62-89)") {
    // fts_cva.csv itself is a MISSING_LARGE_BLOB, but code/11's whole
    // post-aggregate pipeline IS re-derivable from the golden: the two
    // pre-merge location aggregates are recoverable exactly (every USA
    // flow is also an overall flow, so the all-side holds every row, and
    // the USA side is precisely the rows the zero-fill did NOT touch —
    // a genuinely-zero USA aggregate lands in the same merged row either
    // way). Re-runs merge(all=T) → zero-fill → pc division with engine
    // operators and hash-compares all four columns over all 98 rows.
    assume(new java.io.File(s"$refOut/fts_cva_USA_analysis.csv").exists())
    val usa = readRef("fts_cva_USA_analysis.csv")
    assert(usa.count() == 98)
    // Spark's CSV reader turns the quoted-empty location into NULL, and
    // null keys never equi-join — restore R's "" so the empty-location
    // row merges instead of splitting into two outer-join halves
    val loc = coalesce(col("`destinationObjects_Location.name`"), lit("")).as("loc")
    val locAll = usa.select(loc, col("CVAamount"))
    val locUsa = usa.filter(col("CVAamount_USA") =!= 0)
      .select(loc, col("CVAamount_USA"))
    val derived = locAll.join(locUsa, Seq("loc"), "full_outer") // merge all=T
      .withColumn("CVAamount_USA", coalesce(col("CVAamount_USA"), lit(0.0)))
      .withColumn("CVAamount_USA_pc", col("CVAamount_USA") / col("CVAamount"))

    def fmt(c: org.apache.spark.sql.Column) =
      coalesce(format_number(c, 6), lit("NA"))
    def tuple(l: org.apache.spark.sql.Column) = concat_ws("|", l,
      fmt(col("CVAamount")), fmt(col("CVAamount_USA")), fmt(col("CVAamount_USA_pc")))
    def sortedHash(df: org.apache.spark.sql.DataFrame): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(df.collect().map(_.getString(0)).sorted.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString

    val committed = usa.select(tuple(coalesce(
      col("`destinationObjects_Location.name`"), lit(""))).as("t"))
    val rederived = derived.select(tuple(col("loc")).as("t"))
    assert(rederived.count() == 98)
    assert(sortedHash(rederived) == sortedHash(committed),
      {
        val c = committed.collect().map(_.getString(0)).sorted
        val d = rederived.collect().map(_.getString(0)).sorted
        val diffs = c.zip(d).filter { case (a, b) => a != b }.take(5)
        s"derived USA analysis diverges from golden, e.g.:\n${diffs.mkString("\n")}"
      })
  }

  test("survey workbook loop: cva_agg's survey slice re-derived from workbook BYTES (code/10:30-37,302-315)") {
    // The reference commits the survey data only as cva_agg.csv rows
    // (source == 'Survey'); the .xlsx itself is not in the repo. Close
    // the S9 loop by writing those rows back into a REAL 3-sheet
    // workbook (zip + OOXML via XlsxTestWriter) and re-deriving the
    // slice through the production read path:
    //   XlsxSource.readSurveyWorkbook (trim/try_cast/Take.out/rename)
    //   → unifyNames on the sub-grant recipients (exact tier)
    //   → GlobalAnalysis.undoubleAgg (A6 + C6)
    // then row-count + sorted-hash against the committed slice — the
    // same discipline as the 1,562-row and 98-row re-derivations.
    assume(new java.io.File(s"$refOut/cva_agg.csv").exists())
    import spark.implicits._
    val slice = readRef("cva_agg.csv").filter(col("source") === "Survey")
      .localCheckpoint(true)
    assert(slice.count() == 254)
    // the sub-grant reconstruction below re-aggregates by (clean_org,
    // Year); a duplicate key would make per-row subgrant ambiguous
    assert(slice.groupBy("clean_org", "Year").count()
      .filter(col("count") > 1).count() == 0)

    val in = slice.select(col("Organisation"), col("Year"),
        col("Org_type"), col("`PC.USD.m`"), col("`TV.USD.m`"),
        col("`PC.USD.m_subgrant`")).collect()
    // sheet 1 exactly as read.xlsx expects it: spaced headers (dotted on
    // read), blanks as ABSENT cells, one Organisation padded to prove
    // the code/10:31 trim runs
    val sheet1 = in.zipWithIndex.map { case (r, i) =>
      Seq[Any](
        if (i == 0) s"  ${r.getString(0)}  " else r.getString(0),
        r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3),
        if (r.isNullAt(4)) null else r.getDouble(4))
    }.toSeq
    // sheet 2: each positive committed subgrant split into two half
    // rows (the A6 SUM is exercised, and a/2 + a/2 == a exactly in
    // IEEE), Take.out case varied; decoys that the reader's filter and
    // the name cascade's no-match path must drop
    val sgRows = in.filter(r => !r.isNullAt(5) && r.getDouble(5) > 0)
    val sheet2 = sgRows.zipWithIndex.flatMap { case (r, i) =>
      val half = r.getDouble(5) / 2
      Seq(
        Seq[Any](r.getString(0), half, r.getInt(1), if (i % 2 == 0) "Y" else "y"),
        Seq[Any](r.getString(0), half, r.getInt(1), "y"),
        Seq[Any](r.getString(0), 999999.0, r.getInt(1), "n")) // filtered out
    }.toSeq :+ Seq[Any]("Entirely Unrelated Consortium", 777.0, 2020, "y")
    // sheet 3: the per-year PC→TV factors recovered from the FTS rows
    // (constant within a year — asserted by the 1,562-row test)
    val ratios = readRef("cva_agg.csv")
      .filter(col("source") === "FTS" && col("`PC.USD.m`") > 0 &&
        col("`TV.USD.m`").isNotNull)
      .groupBy("Year")
      .agg(first(col("`TV.USD.m`") / col("`PC.USD.m`")).as("ratio"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    val sheet3 = ratios.map { case (y, f) => Seq[Any](y, f) }.toSeq

    val path = graft.sources.XlsxTestWriter.write("graft_cva_survey_golden", Seq(
      ("survey_data", Seq("Organisation", "Year", "Org_type", "PC USD m", "TV USD m"), sheet1),
      ("sub_grants", Seq("Recipient org", "Amount USD", "Year", "Take out"), sheet2),
      ("pc_tv_estimate", Seq("CVA data year", "PC average used"), sheet3)))

    // ---- production read path, workbook bytes in ----------------------
    val (survey, subGrants, pcTv) =
      graft.sources.XlsxSource.readSurveyWorkbook(spark, path)
    // the rename + numeric round-trip through the sheet is exact
    assert(pcTv.columns.toSeq == Seq("year", "PC.average.used"))
    assert(pcTv.select(col("year").cast("int"),
        col("`PC.average.used`").cast("double"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1).toSeq
      == ratios.toSeq)

    val clean = graft.functions.TextFns.cleanNameUnicode(_)
    val surveyAgg = survey.select(clean(col("Organisation")).as("clean_org"),
      col("Year").cast("int").as("Year"), lit("FALSE").as("newMoney"),
      col("`PC.USD.m`"), col("`TV.USD.m`"))
    // code/10:286-301: recipients resolve against the survey org
    // universe through the cascade (all exact here — the committed
    // recipients ARE survey orgs); the decoy keeps its own name and
    // falls out of the join
    val universe = survey.select(clean(col("Organisation")).as("survey_org")).distinct()
    val mapping = GlobalAnalysis.unifyNames(
      subGrants.select(col("`Recipient.org`").as("org_name")).distinct(),
      universe, Seq.empty[(String, String)].toDF("org_name", "clean_org"),
      clean = graft.functions.TextFns.cleanNameUnicode)
    val sub = subGrants
      .join(mapping, subGrants("`Recipient.org`") === mapping("org_name"))
      .select(col("clean_org"), col("Year").cast("int").as("Year"),
        lit("FALSE").as("newMoney"),
        col("`Amount.USD`").cast("double").as("amount_usd"))
    val derived = GlobalAnalysis.undoubleAgg(surveyAgg, sub)
      // R's NA - 0 stays NA; greatest() would swallow it (same caveat as
      // the 1,562-row test)
      .withColumn("PC.USD.m_undoubled",
        when(col("`PC.USD.m`").isNotNull, col("`PC.USD.m_undoubled`")))

    def fmt(c: org.apache.spark.sql.Column) =
      coalesce(format_number(c, 6), lit("NA"))
    def tuple(df: org.apache.spark.sql.DataFrame) = df.select(concat_ws("|",
      col("clean_org"), col("Year").cast("string"), fmt(col("`PC.USD.m`")),
      fmt(col("`PC.USD.m_subgrant`")), fmt(col("`PC.USD.m_undoubled`")),
      fmt(col("`TV.USD.m`"))).as("t"))
    def sortedHash(df: org.apache.spark.sql.DataFrame): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(df.collect().map(_.getString(0)).sorted.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString

    val committed = tuple(slice)
    val rederived = tuple(derived)
    assert(rederived.count() == 254)
    assert(sortedHash(rederived) == sortedHash(committed),
      {
        val c = committed.collect().map(_.getString(0)).sorted
        val d = rederived.collect().map(_.getString(0)).sorted
        val diffs = c.zip(d).filter { case (a, b) => a != b }.take(5)
        s"workbook-derived survey slice diverges from golden, e.g.:\n${diffs.mkString("\n")}"
      })
  }

  // ---- questions goldens (code/07) --------------------------------------

  private val projectsDir = "/root/reference/projects"

  private def readQuestionsGolden(name: String) =
    spark.read.option("header", "true").option("escape", "\"")
      .csv(s"$refOut/$name") // write.csv(quote=TRUE) doubles inner quotes

  test("questions.csv golden: the committed project stages' distinct questions all appear (code/07:26-40)") {
    assume(new java.io.File(s"$projectsDir/project_data_2017.RData").exists()
      && new java.io.File(s"$refOut/questions.csv").exists())
    // the native S7 scan replaces load(); unique(all_projects$question)
    // is a distinct over the rbindlist union (only 3 of the 8 years are
    // committed, so derivation is a subset of the golden universe)
    val derived = Seq("2017", "2018", "2024")
      .map(y => graft.sources.RDataSource
        .readDataFrame(spark, s"$projectsDir/project_data_$y.RData", "all_projects")
        .select(col("question")))
      .reduce(_ union _).distinct()
    val golden = readQuestionsGolden("questions.csv") // single column "x"
    val missing = derived.join(golden, derived("question") === golden("x"), "left_anti")
    assert(missing.count() == 0, {
      val ex = missing.take(3).map(_.getString(0))
      s"questions derived from committed years missing from golden: ${ex.mkString(" | ")}"
    })
    assert(derived.count() > 300) // the 3 committed years carry real coverage
  }

  test("potential_new_cash_questions golden: keyword sweep + setdiff trigger reproduce the committed write (code/07:42-91)") {
    assume(new java.io.File(s"$refOut/potential_new_cash_questions.csv").exists())
    val golden = readQuestionsGolden("questions.csv")
    // code/07:43-79's keyword list, \b-fenced and case-insensitive; (?U)
    // makes Java's \b Unicode-aware like TRE's in a UTF-8 locale (the
    // list has French/Spanish terms next to accented text)
    val keywords = Seq("cash", "voucher", "vouchers", "cash transfer", "cash grant",
      "unconditional cash", "money", "conditional cash transfer", "argent", "monetaires",
      "bons", "espèces", "monnaie", "monétaires", "tokens", "coupons", "cupones",
      "transfert monétaire", "transfer monétaire", "transferencias monetarias",
      "public works programme", "social assistance", "social safety net", "social transfer",
      "social protection", "CVA", "CCT", "UCT", "CTP", "CFW", "CFA", "SSN", "ESSN", "MPC", "MPCT")
    val pattern = "(?iU)" + keywords.map(k => s"\\b$k\\b").mkString("|")
    val potential = golden.filter(col("x").rlike(pattern))
    assert(potential.count() > 0)
    val labeled = spark.read.option("header", "true").option("escape", "\"")
      .csv("/root/reference/reference_datasets/cva_project_questions.csv")
    val fresh = potential.join(labeled,
      potential("x") === labeled("Question"), "left_anti")
    // the committed potential file exists, so the reference's trigger
    // (setdiff nonempty) must fire on the committed inputs too
    assert(fresh.count() > 0)
    // and its write emits the FULL question vector (code/07:91 writes
    // `questions`, not the new subset) — committed file == questions.csv
    val committed = readQuestionsGolden("potential_new_cash_questions.csv")
    assert(committed.count() == golden.count()
      && committed.except(golden).isEmpty && golden.except(committed).isEmpty)
  }

  test("cash_projects golden: the committed years re-derive their slice row-for-row (code/07:96-160)") {
    assume(new java.io.File(s"$projectsDir/cash_projects.csv").exists()
      && new java.io.File(s"$projectsDir/project_data_2017.RData").exists())
    // the full M3 chain from the native S7 scan: labeled-question joins
    // (F3) -> standardize (U1/U2) -> per-project aggs (A3/A4) -> overlap
    // patches (R5) -> flag reconciliation (C5). Project ids are
    // year-scoped and per-project aggregation never crosses projects, so
    // committed years must reproduce EXACTLY the golden's rows for their
    // own project ids — row-for-row. 2024 is excluded on evidence, not
    // convenience: the committed golden predates that snapshot (its max
    // project_id is 213,154; the 2024 stage runs to 219,338), so its
    // projects cannot appear in the golden at all.
    val qa = Seq("2017", "2018")
      .map(y => graft.sources.RDataSource
        .readDataFrame(spark, s"$projectsDir/project_data_$y.RData", "all_projects")
        .select(col("project_id").cast("long"), col("question"), col("answer")))
      .reduce(_ unionByName _)
    val questions = spark.read.option("header", "true").option("escape", "\"")
      .csv("/root/reference/reference_datasets/cva_project_questions.csv")
      .select(col("Question").as("question"), col("`Question type`").as("qtype"))
    val derived = Projects.cashProjects(qa, questions)
      .select(col("project_id"),
        round(col("cva_percentage"), 6).as("cva_percentage"), col("cva"))
    val golden = spark.read.option("header", "true")
      .csv(s"$projectsDir/cash_projects.csv")
      .select(col("project_id").cast("long"),
        round(col("cva_percentage").try_cast("double"), 6).as("cva_percentage"),
        col("cva").try_cast("boolean").as("cva"))
    val goldenSlice = golden.join(derived.select("project_id").distinct(), Seq("project_id"), "leftsemi")
    // CVA questions only enter the plans in later years, so the two
    // committed-and-covered years yield a small but fully-checkable slice
    assert(derived.count() >= 70)
    assert(goldenSlice.count() == derived.count())
    val extra = derived.except(goldenSlice)
    val lost = goldenSlice.except(derived)
    assert(extra.isEmpty && lost.isEmpty, {
      s"cash_projects divergence, derived-not-golden: ${extra.take(3).mkString(" | ")}; " +
        s"golden-not-derived: ${lost.take(3).mkString(" | ")}"
    })
  }
}

package graft.operators

import graft.SparkSpec
import graft.functions.OsaDistance
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzyMatch finds nearest name within 20% of length (J8, code/10:129-144)") {
    val subgrants = Seq("save the chidren", "unicef fudn", "zzzzz").toDF("sub")
    val orgs = Seq("save the children", "unicef fund", "world bank").toDF("org")
    val out = FuzzyJoin.fuzzyMatch(subgrants, "sub", orgs, "org",
      maxDistFrac = 0.2, dist = (a, b) => OsaDistance.osa_distance(a, b))
      .select("sub", "org").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("save the chidren") == "save the children")
    assert(out("unicef fudn") == "unicef fund") // transposition = 1 edit under OSA
    assert(!out.contains("zzzzz")) // nothing within threshold
  }

  test("fuzzyMatch with blocking key gives same result on blocked pairs") {
    val l = Seq("alpha", "alphq", "beta").toDF("a")
    val r = Seq("alpha", "betta").toDF("b")
    val blocked = FuzzyJoin.fuzzyMatch(l, "a", r, "b", maxDistFrac = 0.5,
      blockKey = Some(c => substring(c, 1, 1)))
      .select("a", "b").collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(blocked("alphq") == "alpha")
    assert(blocked("beta") == "betta")
  }

  test("substringMatch: word-boundary containment, shortest host wins (J9)") {
    val toks = Seq("widget", "bolt").toDF("tok")
    val hosts = Seq("a very cold widget", "cold widget", "widgetry", "large bolt").toDF("host")
    val out = FuzzyJoin.substringMatch(toks, "tok", hosts, "host")
      .select("tok", "host").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("widget") == "cold widget") // not "widgetry" (word boundary), shortest wins
    assert(out("bolt") == "large bolt")
  }

  test("substringMatch blocking is lossless vs brute-force regex containment") {
    // Re-derive the match set the old crossJoin form produced and assert
    // the token-blocked operator returns exactly it — including a host
    // where the left's longest token adjoins punctuation (tokenization
    // by \w+ runs, not whitespace).
    val toks = Seq("food programme", "relief", "x").toDF("tok")
    val hosts = Seq(
      "food programme, global hq", "relief intl",
      "disaster relief", "worldwide food programmes").toDF("host")
    val blocked = FuzzyJoin.substringMatch(toks, "tok", hosts, "host")
      .select("tok", "host").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val brute = toks.distinct().crossJoin(hosts)
      .filter(regexp_count(col("host"),
        concat(lit("""\b"""), SplitRows.regexEscapeCol(col("tok")), lit("""\b"""))) > 0)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("tok")
          .orderBy(length(col("host")), col("host"))))
      .filter(col("__rn") === 1)
      .select("tok", "host").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(blocked == brute)
    assert(blocked.contains(("food programme", "food programme, global hq")))
  }

  test("substringMatch keeps word-char-free left values (degenerate leg)") {
    // "-" has no \w token to block on, but \b-\b still fires inside
    // "a-b" (boundaries at the word/non-word transitions) — the old
    // crossJoin form matched it, so the blocked form must too.
    val toks = Seq("-", "widget").toDF("tok")
    val hosts = Seq("a-b", "a - b", "cold widget").toDF("host")
    val out = FuzzyJoin.substringMatch(toks, "tok", hosts, "host")
      .select("tok", "host").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("-") == "a-b") // shortest hit wins over "a - b"
    assert(out("widget") == "cold widget")
  }

  test("fuzzyMatch first-letter blocking = unblocked on org-name typos (M6 wiring)") {
    // The unifyNames block key: typos that keep the first letter (the
    // reference's entire manual-match list does) make blocked and
    // unblocked match sets identical. Deterministic typo fixture:
    // deletions, adjacent swaps, and replacements at position > 1.
    val orgs = Seq("save the children", "unicef fund", "world food programme",
      "danish refugee council", "norwegian refugee council", "care international",
      "mercy corps", "oxfam gb", "action against hunger", "catholic relief services")
    val typos = orgs.zipWithIndex.map { case (o, i) =>
      i % 3 match {
        case 0 => o.patch(1 + i % (o.length - 1), "", 1)              // deletion
        case 1 => { val p = 1 + i % (o.length - 2); o.updated(p, o(p + 1)).updated(p + 1, o(p)) }
        case _ => o.updated(1 + i % (o.length - 1), 'q')              // replacement
      }
    }
    val l = typos.toDF("a")
    val r = orgs.toDF("b")
    def run(bk: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column]) =
      FuzzyJoin.fuzzyMatch(l, "a", r, "b", maxDistFrac = 0.2,
        dist = (x, y) => OsaDistance.osa_distance(x, y), blockKey = bk)
        .select("a", "b").collect().map(x => (x.getString(0), x.getString(1))).toSet
    val blocked = run(Some(c => substring(c, 1, 1)))
    val unblocked = run(None)
    assert(blocked == unblocked)
    assert(blocked.nonEmpty)
  }

  test("fuzzyMatch default is blocked: no cartesian product unless opted out") {
    val l = Seq("alpha", "beta").toDF("a")
    val r = Seq("alpha", "betta").toDF("b")
    // a physical cross pairing shows as CartesianProduct or a Cross-typed
    // broadcast nested loop, depending on side sizes
    def crossed(df: org.apache.spark.sql.DataFrame): Boolean = {
      val p = df.queryExecution.executedPlan.toString
      p.contains("CartesianProduct") ||
        (p.contains("BroadcastNestedLoopJoin") && p.contains("Cross"))
    }
    val defaulted = FuzzyJoin.fuzzyMatch(l, "a", r, "b", maxDistFrac = 0.5)
    assert(!crossed(defaulted))
    val optedOut = FuzzyJoin.fuzzyMatch(l, "a", r, "b", maxDistFrac = 0.5,
      blockKey = None)
    assert(crossed(optedOut))
    // and the default still finds the same matches on this fixture
    val dm = defaulted.select("a", "b").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(dm("beta") == "betta")
  }

  test("precedenceCoalesce: manual override beats exact beats fuzzy (J10/C4)") {
    val base = Seq("a", "b", "c", "d").toDF("k")
    val manual = Seq(("a", "M")).toDF("k", "v")
    val exact = Seq(("a", "E"), ("b", "E")).toDF("k", "v")
    val fuzzy = Seq(("b", "F"), ("c", "F")).toDF("k", "v")
    val out = FuzzyJoin.precedenceCoalesce(base, "k",
      Seq((manual, "v"), (exact, "v"), (fuzzy, "v")))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map("a" -> Some("M"), "b" -> Some("E"), "c" -> Some("F"), "d" -> None))
  }
}

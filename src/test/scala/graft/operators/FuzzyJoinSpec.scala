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

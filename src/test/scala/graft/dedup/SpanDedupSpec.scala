package graft.dedup

import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {

  // tokens "t0 t1 ... t{n-1}" with an optional substitution map — lets a
  // fixture share exact sub-sequences across docs at chosen positions
  private def doc(n: Int, sub: Map[Int, String] = Map.empty): String =
    (0 until n).map(i => sub.getOrElse(i, s"t$i")).mkString(" ")

  private def spans(rows: Seq[(Long, String)], k: Int): Map[Long, Seq[(Long, Long)]] = {
    import spark.implicits._
    SpanDedup.duplicatedSpans(rows.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sortBy(_._1).toSeq }
  }

  test("two separated shared passages merge into two islands, not one") {
    // doc 1: 30 unique tokens, then 10 shared (a0..a9), 30 unique, 10
    // shared (b0..b9), 30 more unique. doc 2 carries the same a-run and
    // b-run at different offsets inside otherwise-distinct text.
    val aRun = (0 until 10).map(i => s"a$i")
    val bRun = (0 until 10).map(i => s"b$i")
    val d1 = ((0 until 30).map(i => s"x$i") ++ aRun ++ (0 until 30).map(i => s"y$i")
      ++ bRun ++ (0 until 30).map(i => s"z$i")).mkString(" ")
    val d2 = ((0 until 20).map(i => s"u$i") ++ aRun ++ (0 until 40).map(i => s"v$i")
      ++ bRun ++ (0 until 20).map(i => s"w$i")).mkString(" ")
    val got = spans(Seq((1L, d1), (2L, d2)), k = 10)
    // d1: a-run at 1-based [31,40], b-run at [71,80]; 40-token gap >> k
    assert(got(1L) == Seq((31L, 40L), (71L, 80L)))
    assert(got(2L) == Seq((21L, 30L), (71L, 80L)))
  }

  test("overlapping duplicated windows chain into one maximal span") {
    // docs share a 15-token run; with k=10 that is 6 overlapping
    // duplicated windows, which must merge into exactly one [s, s+14] span
    val run = (0 until 15).map(i => s"s$i")
    val d1 = ((0 until 5).map(i => s"p$i") ++ run ++ (0 until 5).map(i => s"q$i")).mkString(" ")
    val d2 = (run ++ (0 until 10).map(i => s"r$i")).mkString(" ")
    val got = spans(Seq((1L, d1), (2L, d2)), k = 10)
    assert(got(1L) == Seq((6L, 20L)))
    assert(got(2L) == Seq((1L, 15L)))
  }

  test("within-doc repetition alone is not a duplicated span") {
    // doc 1 repeats its own 10-token run twice; no other doc has it
    val run = (0 until 10).map(i => s"m$i")
    val d1 = (run ++ (0 until 10).map(i => s"n$i") ++ run).mkString(" ")
    val got = spans(Seq((1L, d1), (2L, doc(40))), k = 10)
    assert(!got.contains(1L) && !got.contains(2L))
  }

  test("within-doc copies of a cross-doc span all surface, in both docs") {
    // the a-run appears twice in doc 1 and once in doc 2: all three
    // occurrences are duplicated spans (the min!=max doc test is per
    // shingle, not per occurrence)
    val run = (0 until 10).map(i => s"a$i")
    val d1 = (run ++ (0 until 30).map(i => s"g$i") ++ run).mkString(" ")
    val d2 = ((0 until 10).map(i => s"h$i") ++ run).mkString(" ")
    val got = spans(Seq((1L, d1), (2L, d2)), k = 10)
    assert(got(1L) == Seq((1L, 10L), (41L, 50L)))
    assert(got(2L) == Seq((11L, 20L)))
  }

  test("docs shorter than k tokens never shingle; identical short docs stay silent") {
    val got = spans(Seq((1L, "a b c"), (2L, "a b c"), (3L, doc(40))), k = 10)
    assert(got.isEmpty)
  }

  // --- occurrence cap (the r6-verdict hot-key hazard) ---

  // a boilerplate run shared by MORE docs than the cap, plus a normal
  // two-doc duplicate that must keep working alongside it
  private def overflowFixture: Seq[(Long, String)] = {
    val boiler = (0 until 10).map(i => s"bp$i")
    val normal = (0 until 10).map(i => s"nm$i")
    val boilerDocs = (1L to 5L).map { d =>
      (d, ((0 until 10).map(i => s"u${d}_$i") ++ boiler).mkString(" "))
    }
    val normalDocs = Seq(
      (6L, (normal ++ (0 until 10).map(i => s"v$i")).mkString(" ")),
      (7L, ((0 until 10).map(i => s"w$i") ++ normal).mkString(" ")))
    boilerDocs ++ normalDocs
  }

  test("shingle in more docs than maxOcc is routed to everywhere, not spans") {
    import spark.implicits._
    val df = overflowFixture.toDF("doc_id", "text")
    val got = SpanDedup.duplicatedSpans(df, "doc_id", "text", k = 10, maxOcc = 3)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sortBy(_._1).toSeq }
    // the 5-doc boilerplate run (5 occurrences > cap 3) yields NO spans;
    // the 2-doc normal run still does
    assert(got.keySet == Set(6L, 7L))
    assert(got(6L) == Seq((1L, 10L)) && got(7L) == Seq((11L, 20L)))
    val ew = SpanDedup.everywhereShingles(df, "doc_id", "text", k = 10, maxOcc = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(ew.length == 1 && ew.head._2 == 5L) // the boilerplate hash, exact count
  }

  test("a shingle with exactly maxOcc occurrences still produces full spans") {
    import spark.implicits._
    val df = overflowFixture.toDF("doc_id", "text")
    val got = SpanDedup.duplicatedSpans(df, "doc_id", "text", k = 10, maxOcc = 5)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sortBy(_._1).toSeq }
    // at the cap (5 == maxOcc) the capped list is the complete list:
    // all five boilerplate docs report the span, plus the normal pair
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    (1L to 5L).foreach(d => assert(got(d) == Seq((11L, 20L))))
    assert(SpanDedup.everywhereShingles(df, "doc_id", "text", k = 10, maxOcc = 5)
      .isEmpty)
  }
}

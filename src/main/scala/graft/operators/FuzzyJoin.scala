package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy / substring matching (SURVEY.md J8-J10, code/10:117-301).
  *
  * The reference cross-multiplies unique name lists (≈10²×10³) and picks
  * argmin edit distance. We keep the semantics but make the scale path
  * the DEFAULT: `blockKey` partitions both sides before any pairing
  * (first letter by default), turning O(|A|·|B|) into
  * O(Σ_blocks |A_b|·|B_b|) — the "blocking hook" SURVEY §4.2 calls for.
  * The unblocked crossJoin exists only behind an explicit
  * `blockKey = None` opt-out.
  * Determinism: argmin window tiebreaks on the candidate string itself.
  */
object FuzzyJoin {

  /** Default blocking key: the lowercased first character. At the
    * reference's maxDistFrac=0.2 a typo that rewrites the FIRST letter
    * is outside anything its manual-match list contains (property-tested
    * in FuzzyJoinSpec: blocked == unblocked on the org-typo fixture), so
    * the block loses nothing while cutting each comparison set to ~1/26.
    * A length band is deliberately NOT part of the default:
    * |len(l)-len(r)| can legally reach ceil(0.2·len), which straddles
    * any fixed band boundary. */
  val firstLetterBlock: Column => Column = c => lower(substring(c, 1, 1))

  /** J8: for each left name, the closest right name within
    * `maxDistFrac * length(left)` (ceil), ties broken lexicographically.
    * `dist` is a pluggable distance column fn (levenshtein or OSA).
    *
    * Blocking is the DEFAULT ([[firstLetterBlock]]): the quadratic
    * crossJoin arm is reachable only by explicitly passing
    * `blockKey = None`, which is an opt-out for small, known-bounded
    * name lists (the reference's ≈10²×10³ shape) — never the path a
    * caller lands on by omission. */
  def fuzzyMatch(
      left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String,
      maxDistFrac: Double = 0.2,
      dist: (Column, Column) => Column = levenshtein,
      blockKey: Option[Column => Column] = Some(firstLetterBlock)): DataFrame = {
    val l = left.select(col(leftCol)).distinct()
    val r = right.select(col(rightCol)).distinct()
    val joined = blockKey match {
      case Some(bk) =>
        l.withColumn("__blk", bk(col(leftCol)))
          .join(r.withColumn("__blk", bk(col(rightCol))), "__blk")
          .drop("__blk")
      case None => l.crossJoin(r)
    }
    val withDist = joined
      .filter(col(leftCol) =!= col(rightCol))
      .withColumn("dist", dist(col(leftCol), col(rightCol)))
      .filter(col("dist") <= ceil(length(col(leftCol)) * maxDistFrac))
    val w = Window.partitionBy(leftCol).orderBy(col("dist"), col(rightCol))
    withDist.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** J9: word-boundary substring containment — left phrase appears as a
    * whole word inside right string; shortest right string wins.
    *
    * Token-blocked, never a crossJoin: a `\b<left>\b` hit implies every
    * maximal `\w+` run of the left phrase occurs as a maximal `\w+` run
    * of the right string (the phrase occurrence is flanked by non-word
    * chars), so candidates are exactly the pairs sharing the left's
    * longest token. Right side explodes its distinct tokens once; the
    * equi-join on the token replaces O(|A|·|B|) with Σ-per-block, and
    * the regex then confirms the full containment.
    *
    * Left names with NO word character (pure punctuation — `\w` is
    * ASCII in Java regex) have no token to block on yet can still hit
    * (`\b-\b` fires inside "a-b"), so they take a separate broadcast
    * nested-loop leg, ALWAYS unioned in so the plan stays lazy: no job
    * runs at DataFrame-construction time, and the degenerate-leg
    * decision is the data's, not frozen at build. The leg is bounded by
    * construction — its build side is the broadcast distinct tokenless
    * names (tiny by nature), so its cost is |right| × |tokenless|; in
    * the common all-tokened case the zero-row broadcast makes it one
    * extra scan of the deduplicated right names emitting nothing
    * (measured: AQE does NOT collapse the empty leg, it just runs
    * cheaply), which is no more than the probe job the old eager
    * `isEmpty` check paid unconditionally. */
  def substringMatch(
      left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String): DataFrame = {
    val lAll = left.select(col(leftCol)).distinct()
      .withColumn("__tok", longestToken(col(leftCol)))
    val l = lAll.filter(col("__tok").isNotNull)
    val rDistinct = right.select(col(rightCol)).distinct()
    val r = rDistinct
      .withColumn("__tok", explode(array_distinct(
        regexp_extract_all(col(rightCol), lit("""\w+"""), lit(0)))))
    def confirm(cand: DataFrame): DataFrame = cand
      .withColumn("__patt", concat(lit("""\b"""), SplitRows.regexEscapeCol(col(leftCol)), lit("""\b""")))
      .filter(regexp_count(col(rightCol), col("__patt")) > 0)
      .drop("__patt")
    val blocked = confirm(l.join(r, Seq("__tok"))).drop("__tok")
    val tokenless = lAll.filter(col("__tok").isNull).drop("__tok")
    val withHit = blocked.unionByName(confirm(broadcast(tokenless).crossJoin(rDistinct)))
    val w = Window.partitionBy(leftCol).orderBy(length(col(rightCol)), col(rightCol))
    withHit.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Longest `\w+` token (ties: lexicographically first) — the blocking
    * key for [[substringMatch]]. Null when the string has no word char. */
  private def longestToken(c: Column): Column =
    aggregate(
      regexp_extract_all(c, lit("""\w+"""), lit(0)),
      lit(null).cast("string"),
      (acc, t) => when(acc.isNull || length(t) > length(acc) ||
        (length(t) === length(acc) && t < acc), t).otherwise(acc))

  /** J10/C4: precedence coalesce across match methods — first non-null of
    * manual override ≻ perfect ≻ fuzzy ≻ substring. */
  def precedenceCoalesce(
      base: DataFrame, key: String,
      matches: Seq[(DataFrame, String)]): DataFrame = {
    val joined = matches.zipWithIndex.foldLeft(base) { case (acc, ((m, valueCol), i)) =>
      acc.join(broadcast(m.withColumnRenamed(valueCol, s"__m$i")
        .select(col(key), col(s"__m$i"))), Seq(key), "left")
    }
    joined.withColumn("matched",
      coalesce(matches.indices.map(i => col(s"__m$i")): _*))
      .drop(matches.indices.map(i => s"__m$i"): _*)
  }
}

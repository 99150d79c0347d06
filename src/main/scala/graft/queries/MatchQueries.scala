package graft.queries

import graft.QueryDef
import graft.operators.FuzzyJoin
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Fuzzy / substring / precedence matching (SURVEY.md J8-J10, C4, U7). */
object MatchQueries {

  val defs: Seq[QueryDef] = Seq(

    // J8+W6: nearest other brand by edit distance (≤ 2), argmin window
    // with lexicographic tiebreak — the subgrant fuzzy-match shape on the
    // deduplicated name lists.
    QueryDef("q30_fuzzy_match", Seq("J8", "U7", "W6"),
      """WITH u AS (SELECT DISTINCT p_brand FROM part)
         SELECT a.p_brand AS name_a, b.p_brand AS name_b,
                levenshtein(a.p_brand, b.p_brand) AS dist
         FROM u a CROSS JOIN u b
         WHERE a.p_brand <> b.p_brand
           AND levenshtein(a.p_brand, b.p_brand) <= 2
         QUALIFY row_number() OVER (PARTITION BY a.p_brand
           ORDER BY levenshtein(a.p_brand, b.p_brand), b.p_brand) = 1""") { (s, d) =>
      val brands = Tables.part(s, d).select("p_brand")
      FuzzyJoin.fuzzyMatch(
        brands.withColumnRenamed("p_brand", "name_a"), "name_a",
        brands.withColumnRenamed("p_brand", "name_b"), "name_b",
        maxDistFrac = 1.0, // brand strings are short; absolute cap below
        dist = (a, b) => levenshtein(a, b))
        .filter(col("dist") <= 2)
    },

    // J9: word-boundary substring containment, shortest-host-wins — the
    // second noun token of each p_name matched back into full names.
    QueryDef("q31_substring_match", Seq("J9", "U3"),
      """WITH toks AS (SELECT DISTINCT string_split(p_name, ' ')[2] AS tok FROM part),
         names AS (SELECT DISTINCT p_name FROM part)
         SELECT tok, p_name AS host FROM (
           SELECT tok, p_name,
             row_number() OVER (PARTITION BY tok ORDER BY length(p_name), p_name) AS rn
           FROM toks JOIN names ON regexp_matches(p_name, '\b' || tok || '\b'))
         WHERE rn = 1""") { (s, d) =>
      val toks = Tables.part(s, d)
        .select(element_at(split(col("p_name"), " "), 2).as("tok"))
      val names = Tables.part(s, d).select(col("p_name").as("host"))
      FuzzyJoin.substringMatch(toks, "tok", names, "host")
        .select("tok", "host")
    },

    // J10+C4: precedence coalesce — manual override ≻ exact ≻ fuzzy.
    // Manual table is an inline literal frame (the reference's ~20
    // hardcoded rewrites, code/10:226-299).
    QueryDef("q32_match_precedence", Seq("J10", "C4", "F7"),
      """WITH manual(c_mktsegment, matched_manual) AS (
           VALUES ('BUILDING', 'Construction'), ('MACHINERY', 'Industrial')),
         exact(c_mktsegment, matched_exact) AS (
           VALUES ('BUILDING', 'exact-building'), ('AUTOMOBILE', 'exact-auto')),
         fuzzy(c_mktsegment, matched_fuzzy) AS (
           VALUES ('HOUSEHOLD', 'fuzzy-household'), ('AUTOMOBILE', 'fuzzy-auto'))
         SELECT c_mktsegment,
           coalesce(matched_manual, matched_exact, matched_fuzzy) AS matched,
           count(*) AS n
         FROM customer
         LEFT JOIN manual USING (c_mktsegment)
         LEFT JOIN exact USING (c_mktsegment)
         LEFT JOIN fuzzy USING (c_mktsegment)
         GROUP BY c_mktsegment, matched""") { (s, d) =>
      import s.implicits._
      val manual = Seq(("BUILDING", "Construction"), ("MACHINERY", "Industrial"))
        .toDF("c_mktsegment", "matched")
      val exact = Seq(("BUILDING", "exact-building"), ("AUTOMOBILE", "exact-auto"))
        .toDF("c_mktsegment", "matched")
      val fuzzy = Seq(("HOUSEHOLD", "fuzzy-household"), ("AUTOMOBILE", "fuzzy-auto"))
        .toDF("c_mktsegment", "matched")
      FuzzyJoin.precedenceCoalesce(
        Tables.customer(s, d).select("c_mktsegment"), "c_mktsegment",
        Seq((manual, "matched"), (exact, "matched"), (fuzzy, "matched")))
        .groupBy("c_mktsegment", "matched").agg(count(lit(1)).as("n"))
    },
  )
}

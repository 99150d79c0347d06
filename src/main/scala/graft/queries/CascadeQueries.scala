package graft.queries

import graft.QueryDef
import graft.functions.TextFns
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Rule-cascade ("business-logic operator") coverage — SURVEY.md §2.9.
  *
  * The reference implements these as sequential in-place mutations
  * (`x[which(cond)] = v`); here each cascade is ONE ordered `when` chain
  * (first match wins), which keeps the whole thing inside a single
  * codegen'd projection — no intermediate materialization, trivially
  * scalable.
  */
object CascadeQueries {

  val defs: Seq[QueryDef] = Seq(

    // C1+C2: relevance waterfall with method attribution. Mirrors the
    // sector/method/cluster → percentage-band → upgrade ordering of
    // code/08:121-182 on the bench schema.
    QueryDef("q23_relevance_cascade", Seq("C1", "C2"),
      """SELECT relevance, relevance_method, count(*) AS n,
           round(sum(l_extendedprice), 4) AS amount
         FROM (
           SELECT l_extendedprice,
             CASE WHEN l_returnflag = 'R' THEN 'Full'
                  WHEN l_discount >= 0.08 THEN 'Full'
                  WHEN l_discount > 0 AND l_tax >= 0.04 THEN 'Partial'
                  ELSE 'None' END AS relevance,
             CASE WHEN l_returnflag = 'R' THEN 'Return flag'
                  WHEN l_discount >= 0.08 THEN 'High discount'
                  WHEN l_discount > 0 AND l_tax >= 0.04 THEN 'Taxed discount'
                  ELSE 'None' END AS relevance_method
           FROM lineitem)
         GROUP BY relevance, relevance_method""") { (s, d) =>
      val relevance = when(col("l_returnflag") === "R", "Full")
        .when(col("l_discount") >= 0.08, "Full")
        .when(col("l_discount") > 0 && col("l_tax") >= 0.04, "Partial")
        .otherwise("None")
      val method = when(col("l_returnflag") === "R", "Return flag")
        .when(col("l_discount") >= 0.08, "High discount")
        .when(col("l_discount") > 0 && col("l_tax") >= 0.04, "Taxed discount")
        .otherwise("None")
      Tables.lineitem(s, d)
        .select(col("l_extendedprice"), relevance.as("relevance"), method.as("relevance_method"))
        .groupBy("relevance", "relevance_method")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 4).as("amount"))
    },

    // C3: the CVAamount waterfall — amount + type label assigned by the
    // first matching branch; branches are mutually exclusive and
    // exhaustive by construction (property-tested in the suite).
    QueryDef("q24_amount_waterfall", Seq("C3"),
      """SELECT amount_type, count(*) AS n, round(sum(amount), 4) AS total
         FROM (
           SELECT
             CASE WHEN l_returnflag = 'R' THEN l_extendedprice
                  WHEN l_discount >= 0.08 THEN l_extendedprice / l_quantity
                  WHEN l_tax >= 0.06 THEN l_extendedprice * l_discount
                  ELSE 0.0 END AS amount,
             CASE WHEN l_returnflag = 'R' THEN 'Full'
                  WHEN l_discount >= 0.08 THEN 'Partial cluster'
                  WHEN l_tax >= 0.06 THEN 'Percentage'
                  ELSE 'Excluded' END AS amount_type
           FROM lineitem)
         WHERE amount > 0 GROUP BY amount_type""") { (s, d) =>
      val amount = when(col("l_returnflag") === "R", col("l_extendedprice"))
        .when(col("l_discount") >= 0.08, col("l_extendedprice") / col("l_quantity"))
        .when(col("l_tax") >= 0.06, col("l_extendedprice") * col("l_discount"))
        .otherwise(lit(0.0))
      val amountType = when(col("l_returnflag") === "R", "Full")
        .when(col("l_discount") >= 0.08, "Partial cluster")
        .when(col("l_tax") >= 0.06, "Percentage")
        .otherwise("Excluded")
      Tables.lineitem(s, d)
        .select(amount.as("amount"), amountType.as("amount_type"))
        .filter(col("amount") > 0)
        .groupBy("amount_type")
        .agg(count(lit(1)).as("n"), round(sum("amount"), 4).as("total"))
    },

    // C6+A3: undoubling (pmax(x - sub, 0)) and cap-at-100 percentage.
    QueryDef("q25_undouble_cap", Seq("C6", "A3"),
      """WITH agg AS (
           SELECT o_custkey AS c_custkey, round(sum(o_totalprice), 4) AS gross
           FROM orders GROUP BY o_custkey)
         SELECT c_custkey, gross,
           round(greatest(gross - c_acctbal * 10, 0.0), 4) AS undoubled,
           least(gross / 100000, 100.0) / 100 AS capped_pct
         FROM agg JOIN customer USING (c_custkey)""") { (s, d) =>
      val agg = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(round(sum("o_totalprice"), 4).as("gross"))
      agg.join(Tables.customer(s, d).select("c_custkey", "c_acctbal"), Seq("c_custkey"))
        // No mid-chain rounding on capped_pct: 2-decimal money / 1e5 sits
        // exactly on .5 boundaries at the 6th decimal, where Spark
        // (HALF_UP on decimal string) and DuckDB (binary) disagree. The
        // un-rounded division chain is bit-identical in both engines.
        .select(col("c_custkey"), col("gross"),
          round(greatest(col("gross") - col("c_acctbal") * 10, lit(0.0)), 4).as("undoubled"),
          least(col("gross") / 100000, lit(100.0)) / 100 as "capped_pct")
    },

    // U1: standardize_percentage over strings covering every branch
    // ("45%", "12.5 percent", "less than 1", bare number, garbage).
    QueryDef("q26_percent_parse", Seq("U1", "F5"),
      """SELECT o_orderkey, raw,
           CASE WHEN raw IS NULL THEN NULL
                WHEN regexp_extract(lower(trim(raw)), '(\d+(?:\.\d+)?)\s*%', 1) <> ''
                  THEN cast(regexp_extract(lower(trim(raw)), '(\d+(?:\.\d+)?)\s*%', 1) AS DOUBLE)
                WHEN regexp_matches(lower(trim(raw)), 'less\s+than\s+1') THEN 0.5
                WHEN regexp_extract(lower(trim(raw)), '(\d+(?:\.\d+)?)\s*percent', 1) <> ''
                  THEN cast(regexp_extract(lower(trim(raw)), '(\d+(?:\.\d+)?)\s*percent', 1) AS DOUBLE)
                WHEN regexp_extract(lower(trim(raw)), '^(\d+(?:\.\d+)?)$', 1) <> ''
                  THEN cast(regexp_extract(lower(trim(raw)), '^(\d+(?:\.\d+)?)$', 1) AS DOUBLE)
                ELSE NULL END AS pct
         FROM (
           SELECT o_orderkey,
             CASE cast(o_orderkey % 6 AS INTEGER)
               WHEN 0 THEN '45%' WHEN 1 THEN '12.5 percent'
               WHEN 2 THEN 'less than 1' WHEN 3 THEN '80'
               WHEN 4 THEN 'approx 30.5% of budget' ELSE 'no figure given' END AS raw
           FROM orders)""") { (s, d) =>
      val raw = when(col("o_orderkey") % 6 === 0, "45%")
        .when(col("o_orderkey") % 6 === 1, "12.5 percent")
        .when(col("o_orderkey") % 6 === 2, "less than 1")
        .when(col("o_orderkey") % 6 === 3, "80")
        .when(col("o_orderkey") % 6 === 4, "approx 30.5% of budget")
        .otherwise("no figure given")
      Tables.orders(s, d).select(col("o_orderkey"), raw.as("raw"))
        .withColumn("pct", TextFns.standardizePercentage(col("raw")))
    },

    // U2: standardize_boolean.
    QueryDef("q27_bool_parse", Seq("U2", "C5"),
      """SELECT raw, (lower(trim(raw)) IN ('true', 'qui', 'yes')) AS parsed, count(*) AS n
         FROM (
           SELECT CASE cast(o_orderkey % 5 AS INTEGER)
             WHEN 0 THEN 'TRUE' WHEN 1 THEN 'qui' WHEN 2 THEN 'Yes'
             WHEN 3 THEN 'non' ELSE 'FALSE' END AS raw FROM orders)
         GROUP BY raw, parsed""") { (s, d) =>
      val raw = when(col("o_orderkey") % 5 === 0, "TRUE")
        .when(col("o_orderkey") % 5 === 1, "qui")
        .when(col("o_orderkey") % 5 === 2, "Yes")
        .when(col("o_orderkey") % 5 === 3, "non")
        .otherwise("FALSE")
      Tables.orders(s, d).select(raw.as("raw"))
        .withColumn("parsed", TextFns.standardizeBoolean(col("raw")))
        .groupBy("raw", "parsed").agg(count(lit(1)).as("n"))
    },

    // U3: name normalization + fingerprint (md5 of normalized text) —
    // identical byte-level result in both engines.
    QueryDef("q28_clean_fingerprint", Seq("U3"),
      """SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS clean,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
         FROM documents""") { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextFns.cleanName(col("text")).as("clean"),
        TextFns.fingerprint(col("text")).as("fp"))
    },

    // S4: NULL scrub — sentinel strings → real nulls, then null-aware agg
    // (R na.rm=T ≈ Spark null-skipping sum).
    QueryDef("q29_null_scrub", Seq("S4"),
      """SELECT scrubbed, count(*) AS n FROM (
           SELECT nullif(o_orderpriority, '3-MEDIUM') AS scrubbed FROM orders)
         GROUP BY scrubbed""") { (s, d) =>
      Tables.orders(s, d)
        .select(when(col("o_orderpriority") === "3-MEDIUM", lit(null).cast("string"))
          .otherwise(col("o_orderpriority")).as("scrubbed"))
        .groupBy("scrubbed").agg(count(lit(1)).as("n"))
    },
  )
}

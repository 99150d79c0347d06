package graft.queries

import graft.QueryDef
import graft.operators.Reshape
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / ordered-group operator coverage (SURVEY.md §2.6, A12, R2/R3).
  *
  * All orderings are total (explicit unique tiebreaks) so window frames are
  * identical across engines — ordered-frame float accumulation is then
  * deterministic, and a final round() absorbs any residual ULP noise.
  * Every window partitions by a key (single shuffle); no global windows on
  * big tables except the explicit top-k.
  */
object WindowQueries {

  val defs: Seq[QueryDef] = Seq(

    // W1+W3: running total + lead over a per-customer ordered window.
    QueryDef("q14_running_total", Seq("W1", "W3"),
      """SELECT o_orderkey, o_custkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend,
         lead(o_orderkey) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS next_orderkey
         FROM orders""") { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .withColumn("running_spend",
          round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
        .withColumn("next_orderkey", lead("o_orderkey", 1).over(w))
        .drop("o_orderdate", "o_totalprice")
    },

    // W1 exact cumulative product (the deflator growth-chaining op,
    // code/03:76-77): exp(sum(log)) over the ordered frame, rounded back
    // to the exact integer product (inputs are small integers).
    QueryDef("q15_cumprod", Seq("W1", "U5"),
      """SELECT l_orderkey, l_partkey, l_suppkey,
         round(exp(sum(ln(l_linenumber)) OVER (PARTITION BY l_orderkey
           ORDER BY l_linenumber, l_partkey, l_suppkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 0) AS cum_product
         FROM lineitem""") { (s, d) =>
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d).select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        .withColumn("cum_product", round(exp(sum(log(col("l_linenumber"))).over(w)), 0))
        .drop("l_linenumber")
        .select("l_orderkey", "l_partkey", "l_suppkey", "cum_product")
    },

    // W2: reverse-ordered cumulative (the back-casting idiom, code/03:164).
    QueryDef("q16_reverse_cumulative", Seq("W2"),
      """SELECT o_orderkey, o_custkey,
         count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS orders_remaining,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS spend_remaining
         FROM orders""") { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .withColumn("orders_remaining", count(lit(1)).over(w))
        .withColumn("spend_remaining", round(sum("o_totalprice").over(w), 4))
        .drop("o_orderdate", "o_totalprice")
    },

    // W4+W5: value-at-anchor within group (ratio to the customer's first
    // order) + conditional group max (last 'F'-status year).
    QueryDef("q17_anchor_ratio", Seq("W4", "W5"),
      """SELECT o_orderkey,
         round(o_totalprice / first_value(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey), 6) AS vs_first_order,
         max(CASE WHEN o_orderstatus = 'F' THEN year(o_orderdate) END)
           OVER (PARTITION BY o_custkey) AS last_f_year
         FROM orders""") { (s, d) =>
      val wOrd = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val wAll = Window.partitionBy("o_custkey")
      Tables.orders(s, d)
        .withColumn("vs_first_order",
          round(col("o_totalprice") / first("o_totalprice").over(wOrd), 6))
        .withColumn("last_f_year",
          max(when(col("o_orderstatus") === "F", year(col("o_orderdate")))).over(wAll))
        .select("o_orderkey", "vs_first_order", "last_f_year")
    },

    // W6: argmax per group with deterministic tiebreak.
    QueryDef("q18_argmax_per_group", Seq("W6"),
      """SELECT c_nationkey, c_custkey, c_acctbal FROM customer
         QUALIFY row_number() OVER (PARTITION BY c_nationkey
           ORDER BY c_acctbal DESC, c_custkey) = 1""") { (s, d) =>
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d).select("c_nationkey", "c_custkey", "c_acctbal")
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    },

    // W8: global ordered top-k with rank (the only global sort; k small so
    // Spark uses TakeOrderedAndProject — no full-sort shuffle at scale).
    QueryDef("q19_topk", Seq("W8"),
      """SELECT row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
         o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""") { (s, d) =>
      Tables.orders(s, d).select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .select("rnk", "o_orderkey", "o_totalprice")
    },

    // A12: geometric growth per group — (last/first)^(1/span) over each
    // customer's order history (the WEO growth-approximation op).
    QueryDef("q20_geometric_growth", Seq("A12"),
      """WITH e AS (
           SELECT o_custkey, year(o_orderdate) AS yr,
             first_value(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS first_price,
             first_value(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS last_price
           FROM orders)
         SELECT o_custkey,
           round(pow(max(last_price) / max(first_price), 1.0 / (max(yr) - min(yr))), 6) AS growth
         FROM e GROUP BY o_custkey HAVING max(yr) > min(yr)""") { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(
          min_by(col("o_totalprice"), struct(col("o_orderdate"), col("o_orderkey"))).as("first_price"),
          max_by(col("o_totalprice"), struct(col("o_orderdate"), col("o_orderkey"))).as("last_price"),
          (year(max("o_orderdate")) - year(min("o_orderdate"))).as("yr_span"))
        .filter(col("yr_span") > 0)
        .select(col("o_custkey"),
          round(pow(col("last_price") / col("first_price"), lit(1.0) / col("yr_span")), 6).as("growth"))
    },

    // R2: wide→long melt of per-nation metrics.
    QueryDef("q21_melt_long", Seq("R2"),
      """WITH wide AS (
           SELECT c_nationkey, round(sum(c_acctbal), 4) AS total_bal,
                  cast(count(*) AS DOUBLE) AS n_cust
           FROM customer GROUP BY c_nationkey)
         SELECT c_nationkey, 'total_bal' AS variable, total_bal AS value FROM wide
         UNION ALL
         SELECT c_nationkey, 'n_cust', n_cust FROM wide""") { (s, d) =>
      val wide = Tables.customer(s, d).groupBy("c_nationkey")
        .agg(round(sum("c_acctbal"), 4).as("total_bal"),
          count(lit(1)).cast("double").as("n_cust"))
      Reshape.melt(wide, Seq("c_nationkey"), Seq("total_bal", "n_cust"))
    },

    // R3: proxy-relabel union (deflator GBR→AIA idiom) on region rollups.
    QueryDef("q22_proxy_relabel", Seq("R3"),
      """WITH base AS (
           SELECT r_name, count(*) AS n_nations
           FROM region JOIN nation ON r_regionkey = n_regionkey GROUP BY r_name)
         SELECT r_name, n_nations FROM base
         UNION ALL SELECT 'EUROPE_DEPENDENCY', n_nations FROM base WHERE r_name = 'EUROPE'
         UNION ALL SELECT 'ASIA_DEPENDENCY', n_nations FROM base WHERE r_name = 'ASIA'""") { (s, d) =>
      val base = Tables.region(s, d)
        .join(Tables.nation(s, d), col("r_regionkey") === col("n_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("n_nations"))
      Reshape.proxyRelabelUnion(base, "r_name",
        Map("EUROPE_DEPENDENCY" -> "EUROPE", "ASIA_DEPENDENCY" -> "ASIA"))
    },

    // A12/W4/W5 composite: the deflator missing-year approximation
    // (reference code/03:150-175) — build a sparse (nation, year) panel,
    // derive each nation's annualized geometric growth from its boundary
    // anchors, and back/forward-fill the missing cells by growth chaining.
    // Growth is rounded to 6 before chaining so both engines quantize
    // identically (pow is not correctly-rounded across libms).
    QueryDef("q58_growth_backfill", Seq("A12", "W4", "W5"),
      """WITH obs AS (
           SELECT c_nationkey AS nk, year(o_orderdate) AS yr,
             round(sum(o_totalprice), 4) AS v
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE (c_nationkey + year(o_orderdate)) % 5 <> 0
           GROUP BY 1, 2),
         anchors AS (
           SELECT nk, min(yr) AS y_first, max(yr) AS y_last,
             min_by(v, yr) AS v_first, max_by(v, yr) AS v_last
           FROM obs GROUP BY nk),
         growth AS (
           SELECT *, CASE WHEN y_last = y_first THEN 1.0
             ELSE round(pow(v_last / v_first, 1.0 / (y_last - y_first)), 6) END AS g
           FROM anchors),
         grid AS (
           SELECT n.nk, y.yr
           FROM (SELECT DISTINCT c_nationkey AS nk FROM customer) n
           CROSS JOIN (SELECT DISTINCT year(o_orderdate) AS yr FROM orders) y)
         SELECT grid.nk AS nationkey, grid.yr AS yr,
           CASE WHEN obs.v IS NOT NULL THEN round(obs.v, 2)
                ELSE round(g.v_first * pow(g.g, grid.yr - g.y_first), 2) END AS value,
           CASE WHEN obs.v IS NOT NULL THEN 'obs' ELSE 'approx' END AS src
         FROM grid
         LEFT JOIN obs ON obs.nk = grid.nk AND obs.yr = grid.yr
         LEFT JOIN growth g ON g.nk = grid.nk""") { (s, d) =>
      val orders = Tables.orders(s, d)
        .select(col("o_custkey"), year(col("o_orderdate")).as("yr"), col("o_totalprice"))
      val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val obs = orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"), col("yr"), col("o_totalprice"))
        .filter((col("nk") + col("yr")) % 5 =!= 0)
        .groupBy("nk", "yr").agg(round(sum("o_totalprice"), 4).as("v"))
      val anchors = obs.groupBy("nk").agg(
        min("yr").as("y_first"), max("yr").as("y_last"),
        min_by(col("v"), col("yr")).as("v_first"),
        max_by(col("v"), col("yr")).as("v_last"))
      val growth = anchors.withColumn("g",
        when(col("y_last") === col("y_first"), lit(1.0))
          .otherwise(round(pow(col("v_last") / col("v_first"),
            lit(1.0) / (col("y_last") - col("y_first"))), 6)))
      val grid = cust.select(col("c_nationkey").as("nk")).distinct()
        .crossJoin(orders.select("yr").distinct())
      grid.join(obs, Seq("nk", "yr"), "left")
        .join(broadcast(growth), Seq("nk"), "left")
        .select(col("nk").as("nationkey"), col("yr"),
          when(col("v").isNotNull, round(col("v"), 2))
            .otherwise(round(col("v_first") * pow(col("g"), col("yr") - col("y_first")), 2))
            .as("value"),
          when(col("v").isNotNull, lit("obs")).otherwise(lit("approx")).as("src"))
    },

    // §1.1 long key-value → wide: groupBy().pivot() with explicit value
    // list (one shuffle; explicit values keep the plan static — no
    // distinct-scan planning pass). Inverse of q21's melt.
    QueryDef("q68_pivot_wide", Seq("R2"),
      """WITH wide AS (
           SELECT c_nationkey, round(sum(c_acctbal), 4) AS total_bal,
                  cast(count(*) AS DOUBLE) AS n_cust
           FROM customer GROUP BY c_nationkey),
         long AS (
           SELECT c_nationkey, 'total_bal' AS variable, total_bal AS value FROM wide
           UNION ALL
           SELECT c_nationkey, 'n_cust', n_cust FROM wide)
         SELECT c_nationkey,
           max(CASE WHEN variable = 'total_bal' THEN value END) AS total_bal,
           max(CASE WHEN variable = 'n_cust' THEN value END) AS n_cust
         FROM long GROUP BY c_nationkey""") { (s, d) =>
      val wide = Tables.customer(s, d).groupBy("c_nationkey")
        .agg(round(sum("c_acctbal"), 4).as("total_bal"),
          count(lit(1)).cast("double").as("n_cust"))
      val long = Reshape.melt(wide, Seq("c_nationkey"), Seq("total_bal", "n_cust"))
      long.groupBy("c_nationkey")
        .pivot("variable", Seq("total_bal", "n_cust"))
        .agg(max("value"))
    },

    // A11 extension: exact interpolated quantile profile per group — the
    // distribution-profiling step of a training-data quality pass. Spark's
    // `percentile` and DuckDB's `quantile_cont` share the p·(n−1) linear
    // interpolation definition, so the values agree bit-for-bit after
    // rounding.
    QueryDef("q61_quantile_profile", Seq("A11"),
      """SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
         FROM lineitem GROUP BY l_returnflag""") { (s, d) =>
      // Distributed order statistics, NOT percentile(): the built-in
      // exact percentile is a TypedImperativeAggregate whose buffer
      // holds every (value → count) of a group in one executor's memory
      // — the thing that OOMs at 100 TB. Here the same exact quantiles
      // come from bounded-memory relational ops: per-value counts (one
      // partial-agg shuffle), a cumulative-count window keyed on the
      // group, and one final agg picking the two covering values per
      // quantile with Spark's own interpolation lower+(higher-lower)·g.
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.lineitem(s, d)
        .select("l_returnflag", "l_extendedprice")
        .groupBy("l_returnflag", "l_extendedprice").agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
      val wAll = Window.partitionBy("l_returnflag")
      val ranked = counts
        .withColumn("hi", sum("cnt").over(wCum)) // 1-based cumulative count
        .withColumn("lo", col("hi") - col("cnt")) // 0-based first index covered
        .withColumn("n", sum("cnt").over(wAll))
      val ps = Seq(0.25 -> "p25", 0.50 -> "p50", 0.75 -> "p75", 0.99 -> "p99")
      val aggs = ps.flatMap { case (p, name) =>
        val t = lit(p) * (col("n") - 1) // fractional 0-based target index
        val fi = floor(t)
        val ci = ceil(t)
        def valueAt(idx: org.apache.spark.sql.Column) =
          max(when(col("lo") <= idx && idx < col("hi"), col("l_extendedprice")))
        Seq(valueAt(fi).as(s"__f_$name"), valueAt(ci).as(s"__c_$name"),
          max(t - fi).as(s"__g_$name"))
      }
      val quantiles = ps.map { case (_, name) =>
        round(col(s"__f_$name") +
          (col(s"__c_$name") - col(s"__f_$name")) * col(s"__g_$name"), 4).as(name)
      }
      ranked.groupBy("l_returnflag").agg(aggs.head, aggs.tail: _*)
        .select(col("l_returnflag") +: quantiles: _*)
    },

    // Fixed-bin histogram per group (the distribution sketch next to
    // q61's quantiles in a profiling pass). Global bounds ride a 1-row
    // broadcast; bucketing is exact IEEE arithmetic so both engines bin
    // identically; one partial-agg shuffle.
    QueryDef("q82_histogram", Seq("A11"),
      """WITH bounds AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem)
         SELECT l_returnflag,
           CAST(least(floor((l_extendedprice - mn) * 10.0 / (mx - mn)), 9) AS BIGINT) AS bucket,
           count(*) AS n
         FROM lineitem CROSS JOIN bounds
         GROUP BY l_returnflag, bucket""") { (s, d) =>
      val li = Tables.lineitem(s, d).select("l_returnflag", "l_extendedprice")
      val bounds = li.agg(min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"))
      li.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          least(floor((col("l_extendedprice") - col("mn")) * 10.0 / (col("mx") - col("mn"))),
            lit(9)).cast("long"))
        .groupBy("l_returnflag", "bucket")
        .agg(count(lit(1)).as("n"))
    },

    // KMV (k-minimum-values) distinct-count sketch — the mergeable
    // cardinality estimator for profiling at corpus scale, made
    // ORACLE-EXACT by deriving the uniform hash from md5 (both engines
    // produce identical doubles: 48 md5 bits / 2^48 is exact dyadic
    // arithmetic). Estimator: (k-1)/u_(k) once a group holds ≥ k
    // distinct hashes, exact count below. k = 256 (rel. stderr ≈ 1/√k ≈
    // 6%; KmvAccuracySpec asserts the estimate lands within 3/√k of the
    // exact count): the rank-filter is a single-double payload after the
    // TopK rewrite routes the group key around the buffer, so it runs on
    // BoundedTopKDoubles' flat primitive heap under the BYTE memory gate
    // — k·8 bytes of mergeable per-group state and no full sort, the
    // same plan a sketch library's partial aggregation would give; the
    // distinct pre-pass is one hash aggregate. At 100 TB the state per
    // group stays 256 doubles regardless of group size.
    QueryDef("q119_kmv_distinct", Seq("A11", "W6"),
      """WITH h AS (
           SELECT DISTINCT l_returnflag AS grp,
             CAST('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 12) AS BIGINT)
               / 281474976710656.0 AS u
           FROM lineitem),
         r AS (SELECT grp, u, row_number() OVER (PARTITION BY grp ORDER BY u) AS rn FROM h),
         t AS (SELECT grp, count(*) AS n_seen, max(u) AS kth FROM r WHERE rn <= 256 GROUP BY grp)
         SELECT grp,
           CASE WHEN n_seen < 256 THEN CAST(n_seen AS DOUBLE)
                ELSE round(255.0 / kth, 6) END AS est_distinct
         FROM t""") { (s, d) =>
      val k = 256
      val hashed = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("grp"),
          (graft.functions.TextHash.md5_prefix_long(col("l_partkey").cast("string"), 12)
            .cast("double") / lit(281474976710656.0)).as("u"))
        .distinct()
      hashed
        .withColumn("rn", row_number().over(
          Window.partitionBy("grp").orderBy("u")))
        .filter(col("rn") <= k)
        .groupBy("grp")
        .agg(count(lit(1)).as("n_seen"), max("u").as("kth"))
        .select(col("grp"),
          when(col("n_seen") < k, col("n_seen").cast("double"))
            .otherwise(round(lit(k - 1.0) / col("kth"), 6)).as("est_distinct"))
    },

    // HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
    // fixed-256-byte mergeable twin of q119's KMV: register j = 8 md5
    // bits, rank = leading zeros of the other 48 + 1, per-group state =
    // 256 register maxima that merge by max (THE industry cardinality
    // sketch shape; KMV keeps k hash values, HLL k 6-bit ranks). Made
    // oracle-exact where float folds would diverge: the harmonic-mean
    // denominator Σ 2^(-M_j) is scaled by 2^49 into an INTEGER sum
    // (pow(2, 49-r) is exact dyadic, the bigint sum is order-free), so
    // both engines divide the same integer; ranks come from
    // length(bin(w)) — integer bit length, no float log2. Two partial-agg
    // shuffles, the first carrying ≤256 rows per (partition, group), the
    // second 256 per group — at 100 TB per-group state never grows.
    // Linear-counting branch (E ≤ 2.5m with empty registers) fires at
    // sf0.001, the raw branch at sf0.01+, so both get oracle coverage.
    QueryDef("q128_hll_distinct", Seq("A11"),
      """WITH h AS (
           SELECT l_returnflag AS grp,
             CAST('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 12) AS BIGINT) AS w,
             CAST('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 13, 2) AS BIGINT) AS j
           FROM lineitem),
         regs AS (
           SELECT grp, j,
             max(CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END) AS r
           FROM h GROUP BY grp, j),
         t AS (
           SELECT grp, count(*) AS n_present,
             sum(CAST(pow(2.0, 49 - r) AS BIGINT)) AS s_present
           FROM regs GROUP BY grp),
         e AS (
           SELECT grp, 256 - n_present AS v,
             (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 562949953421312.0
               / CAST(s_present + (256 - n_present) * 562949953421312 AS DOUBLE) AS e_raw
           FROM t)
         SELECT grp,
           round(CASE WHEN e_raw <= 640.0 AND v > 0
                      THEN 256.0 * ln(256.0 / CAST(v AS DOUBLE))
                      ELSE e_raw END, 4) AS est_distinct
         FROM e""") { (s, d) =>
      val md = md5(col("l_partkey").cast("string"))
      val h = Tables.lineitem(s, d).select(col("l_returnflag").as("grp"),
        conv(substring(md, 1, 12), 16, 10).cast("long").as("w"),
        conv(substring(md, 13, 2), 16, 10).cast("long").as("j"))
      val regs = h.groupBy("grp", "j")
        .agg(max(when(col("w") === 0, lit(49))
          .otherwise(lit(49) - length(bin(col("w"))))).as("r"))
      val t = regs.groupBy("grp")
        .agg(count(lit(1)).as("n_present"),
          sum(pow(lit(2.0), lit(49) - col("r")).cast("long")).as("s_present"))
      val twoTo49 = 562949953421312.0
      val eRaw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0) *
        lit(twoTo49) /
        (col("s_present") + (lit(256) - col("n_present")) * lit(twoTo49).cast("long")).cast("double")
      t.select(col("grp"), (lit(256) - col("n_present")).as("v"), eRaw.as("e_raw"))
        .select(col("grp"),
          round(when(col("e_raw") <= 640.0 && col("v") > 0,
            lit(256.0) * log(lit(256.0) / col("v").cast("double")))
            .otherwise(col("e_raw")), 4).as("est_distinct"))
    },

    // Approximate per-group quantiles from a BOTTOM-k-BY-HASH uniform
    // sample — the third mergeable sketch beside KMV (q119, cardinality)
    // and CMS (q121, counts). The k rows with the smallest md5-rank per
    // group are a uniform random sample that every engine draws
    // IDENTICALLY (md5 is the shared randomness — no RNG, re-runnable,
    // mergeable: min-k of min-k's is the min-k). Scale shape: the rank
    // filter on the hash is a single-double payload, so it runs on
    // BoundedTopKDoubles' primitive heap (k·8 bytes per group, no sort
    // of the fact table — plan-asserted); the sampled KEYS broadcast
    // back over a leftsemi join (groups × k rows), and only the
    // ≤ groups×k sample rows ever meet a Window. q61 computes these
    // quantiles exactly with a corpus-wide cumulative window; this is
    // the form that replaces it when the table is 100 TB —
    // QuantileSampleSpec asserts the rank error stays within the
    // 3·√(p(1-p)/k) sampling bound.
    QueryDef("q122_quantile_sample", Seq("A11", "W6"),
      """WITH li AS (
           SELECT l_returnflag AS grp, l_extendedprice AS v,
             CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)
               || ':' || CAST(l_partkey AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR)), 1, 12) AS BIGINT) AS h
           FROM lineitem),
         keys_ AS (
           SELECT grp, h FROM (
             SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM li)
           WHERE rn <= 256),
         samp AS (SELECT li.grp, li.v FROM li JOIN keys_ USING (grp, h)),
         ranked AS (
           SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v) AS vr,
             count(*) OVER (PARTITION BY grp) AS n
           FROM samp)
         SELECT grp, CAST(max(n) AS BIGINT) AS n_sample,
           round(max(CASE WHEN vr = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 THEN v END), 4) AS p50_est,
           round(max(CASE WHEN vr = CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1 THEN v END), 4) AS p90_est
         FROM ranked GROUP BY grp""") { (s, d) =>
      val k = 256
      // h is the 48-bit integer hash rank; the JOIN key. The heap side
      // orders by u = h / 2^48 — a pure exponent shift (h < 2^48), so
      // both the division and the recovery u * 2^48 are EXACT in binary
      // floating point: the semi-join below is on the integer h itself,
      // not on a formatted double (no codegen/constant-folding rounding
      // surface), while the rank filter still carries a single-double
      // payload and runs on BoundedTopKDoubles' primitive heap.
      val li = Tables.lineitem(s, d).select(
        col("l_returnflag").as("grp"), col("l_extendedprice").as("v"),
        graft.functions.TextHash.md5_prefix_long(concat_ws(":",
            col("l_orderkey").cast("string"), col("l_linenumber").cast("string"),
            col("l_partkey").cast("string"), col("l_suppkey").cast("string")), 12)
          .as("h"))
      val keys = li.select(col("grp"),
          (col("h").cast("double") / lit(281474976710656.0)).as("u"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("grp").orderBy("u")))
        .filter(col("rn") <= k)
        .select(col("grp"),
          (col("u") * lit(281474976710656.0)).cast("long").as("h"))
      val samp = li.join(broadcast(keys), Seq("grp", "h"), "leftsemi")
      val ranked = samp
        .withColumn("vr", row_number().over(
          Window.partitionBy("grp").orderBy("v")))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
      def at(p: Double) = floor(lit(p) * (col("n") - 1)).cast("long") + 1
      ranked.groupBy("grp").agg(
        max("n").cast("long").as("n_sample"),
        round(max(when(col("vr") === at(0.5), col("v"))), 4).as("p50_est"),
        round(max(when(col("vr") === at(0.9), col("v"))), 4).as("p90_est"))
    },
  )
}

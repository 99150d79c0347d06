package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-5 corpus-curation battery: the within-document scrubbing,
  * context-window cutting, mixture balancing and shard layout steps that
  * sit between dedup/filtering and the training-data writer.
  *
  * Scale discipline: q99/q100 are per-document generators plus one
  * grouped aggregation (no window sort); q101 is rate-based hash
  * sampling — a stateless filter against a broadcast per-language rate,
  * the only mixture form that needs no per-group ordering at 100 TB;
  * q102's within-shard sort is the deliberate exception because ordered
  * shard files ARE its output contract (8 balanced md5 shards ≈ ordered
  * writer tasks). Round 6 adds the two mixture-realization steps: q107
  * weighted sampling (global top-n as TakeOrderedAndProject — zero
  * shuffles) and q108 epoch-repeat materialization (row-local explode
  * against a broadcast per-lang rate — the multiplied rows never cross
  * an exchange).
  */
object CurationQueries {

  private val wsToks =
    """string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ')"""

  /** doc_id + whitespace-token array for non-empty documents (Spark side
    * of the oracle's `tok` CTE). */
  private def tok(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"),
        split(regexp_replace(trim(col("text")), "\\s+", " "), " ").as("toks"))

  val defs: Seq[QueryDef] = Seq(

    // Within-document repetition scrub (the per-doc twin of q84's
    // cross-corpus span dedup): cut each doc into 2-token chunks, keep
    // each chunk's FIRST occurrence inside the doc, reassemble in
    // original order. Sort-free: first occurrence via groupBy-min (not
    // a window), reassembly via array_sort over (first_idx, chunk) —
    // per-doc data only, so no stage ever sorts a partition.
    QueryDef("q99_repetition_scrub", Seq("A10", "U6"),
      s"""WITH tok AS (
            SELECT doc_id, $wsToks AS toks FROM documents WHERE trim(text) <> ''),
          chunks AS (
            SELECT doc_id, c AS chunk_idx,
              array_to_string(toks[(c*2+1):(c*2+2)], ' ') AS chunk_text
            FROM tok, LATERAL (SELECT unnest(generate_series(0, (len(toks)-1)//2)) AS c)),
          kept AS (
            SELECT doc_id, chunk_text, min(chunk_idx) AS first_idx, count(*) AS occ
            FROM chunks GROUP BY 1, 2)
          SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_chunks, count(*) AS n_kept,
            md5(string_agg(chunk_text, ' ' ORDER BY first_idx)) AS clean_hash
          FROM kept GROUP BY doc_id""") { (s, d) =>
      tok(s, d)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, (size(toks)-1) div 2)," +
            " c -> concat_ws(' ', slice(toks, c*2+1, 2)))")))
        .groupBy(col("doc_id"), col("col").as("chunk_text"))
        .agg(min("pos").as("first_idx"), count(lit(1)).as("occ"))
        .groupBy("doc_id")
        .agg(sum("occ").as("n_chunks"), count(lit(1)).as("n_kept"),
          md5(concat_ws(" ", expr(
            "transform(array_sort(collect_list(struct(first_idx, chunk_text)))," +
              " x -> x.chunk_text)"))).as("clean_hash"))
    },

    // Training context windows: overlapping 32-token windows at stride
    // 16 per document (the chunking step feeding a tokenizer/packer).
    // Pure per-row generator — transform(sequence) + posexplode, zero
    // shuffles; window payload is hashed so row width stays constant.
    QueryDef("q100_token_windows", Seq("U6", "A11"),
      s"""WITH tok AS (
            SELECT doc_id, $wsToks AS toks FROM documents WHERE trim(text) <> ''),
          wins AS (
            SELECT doc_id, CAST(w AS BIGINT) AS win_idx, CAST(w*16 AS BIGINT) AS start_tok,
              CAST(least(w*16+32, len(toks)) - w*16 AS BIGINT) AS win_len,
              md5(array_to_string(toks[(w*16+1):least(w*16+32, len(toks))], ' ')) AS win_hash
            FROM tok, LATERAL (SELECT unnest(generate_series(0, (len(toks)-1)//16)) AS w))
          SELECT doc_id, win_idx, start_tok, win_len, win_hash FROM wins""") { (s, d) =>
      tok(s, d)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, (size(toks)-1) div 16)," +
            " w -> struct(CAST(w*16 AS BIGINT) AS start_tok," +
            "   CAST(least(w*16+32, size(toks)) - w*16 AS BIGINT) AS win_len," +
            "   md5(concat_ws(' ', slice(toks, w*16+1, least(32, size(toks)-w*16)))) AS win_hash))")))
        .select(col("doc_id"), col("pos").cast("long").as("win_idx"),
          col("col.start_tok"), col("col.win_len"), col("col.win_hash"))
    },

    // Temperature-balanced mixture sampling: per-language acceptance
    // rate ∝ n^(α-1) (α=0.5 flattens the en-heavy skew), selection by
    // md5(doc_id) hash threshold. Deterministic, stateless, and — unlike
    // fixed-count top-k per group (q92) — needs no per-group ordering:
    // the rate table broadcasts and the corpus is filtered in place.
    QueryDef("q101_temperature_mix", Seq("F5", "A11"),
      """WITH stats AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         wt AS (SELECT lang, n, pow(n, -0.5) AS boost FROM stats),
         rate AS (SELECT lang, least(1.0, 0.5 * boost / (SELECT min(boost) FROM wt)) AS p FROM wt)
         SELECT d.doc_id, d.lang FROM documents d JOIN rate r USING (lang)
         WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)) AS INT) / 16777216.0 < r.p""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val wt = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .withColumn("boost", pow(col("n"), -0.5))
      // global min via a window over the ALREADY-AGGREGATED per-lang
      // frame (a handful of rows) — a crossJoin(broadcast(wt.agg(min)))
      // would re-derive the aggregate subtree and scan the corpus twice
      val rate = wt
        .withColumn("min_boost", min("boost").over(Window.partitionBy(lit(1))))
        .select(col("lang"),
          least(lit(1.0), lit(0.5) * col("boost") / col("min_boost")).as("p"))
      docs.join(broadcast(rate), "lang")
        .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
          .cast("long") / lit(16777216.0) < col("p"))
        .select("doc_id", "lang")
    },

    // Deterministic shard layout: md5-bucket every document into 8
    // shards and order within each shard by hash — the "global shuffle"
    // a training run wants, without any global sort: shards are
    // independent, balanced by construction, and each one sorts only
    // its own rows (= one ordered writer task per shard).
    QueryDef("q102_shard_assign", Seq("W8", "F5"),
      """WITH hashed AS (
           SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
         SELECT doc_id,
           CAST(('0x' || substr(h, 1, 1)) AS INT) % 8 AS shard,
           CAST(row_number() OVER (
             PARTITION BY CAST(('0x' || substr(h, 1, 1)) AS INT) % 8
             ORDER BY h) AS BIGINT) AS pos
         FROM hashed""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val hashed = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
        .withColumn("shard",
          (conv(substring(col("h"), 1, 1), 16, 10).cast("int") % 8))
      hashed
        .withColumn("pos", row_number()
          .over(Window.partitionBy("shard").orderBy("h")).cast("long"))
        .select("doc_id", "shard", "pos")
    },

    // Deterministic weighted sampling (Efraimidis–Spiliotis A-ES): each
    // doc draws u from its id hash and ranks by u^(1/w) with w = doc
    // length — longer docs proportionally likelier, reproducible across
    // runs and engines. Global top-n plans as TakeOrderedAndProject
    // (per-partition partial top-n, no global sort, no shuffle) — the
    // only sane shape for "pick n of 10^10 by weight". Keys rounded to
    // 9 before ranking so both engines rank identical doubles.
    QueryDef("q107_weighted_sample", Seq("F5", "W8"),
      """WITH keyed AS (
           SELECT doc_id, n_chars,
             round(pow(
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS INT) + 0.5) / 16777216.0,
               1.0 / greatest(n_chars, 1)), 9) AS k
           FROM documents)
         SELECT doc_id, n_chars FROM keyed ORDER BY k DESC, doc_id LIMIT 100""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("double") + 0.5) / 16777216.0
      val k = round(pow(u, lit(1.0) / greatest(col("n_chars"), lit(1L)).cast("double")), 9)
      docs.select(col("doc_id"), col("n_chars"), k.as("__k"))
        .orderBy(col("__k").desc, col("doc_id")).limit(100)
        .select("doc_id", "n_chars")
    },

    // Epoch-repeat materialization: the under-represented sources get a
    // fractional repeat factor f = min(3, sqrt(max_n/n)) (rounded to 6 so
    // both engines hold the same double); each doc repeats floor(f) times
    // plus one more iff its id-hash fraction falls under frac(f) — the
    // deterministic way to realize "this domain runs 2.3 epochs". The
    // explode is a row-local generator over a broadcast per-source rate:
    // nothing wide ever sees the multiplied rows.
    QueryDef("q108_repeat_upsample", Seq("F5", "U6"),
      """WITH stats AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         f AS (
           SELECT lang,
             round(least(3.0, pow((SELECT max(n) FROM stats) / CAST(n AS DOUBLE), 0.5)), 6) AS f
           FROM stats),
         rep AS (
           SELECT d.doc_id, d.lang,
             CAST(floor(f.f) AS BIGINT)
               + CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)) AS INT) / 16777216.0
                      < f.f - floor(f.f) THEN 1 ELSE 0 END AS repeats
           FROM documents d JOIN f USING (lang))
         SELECT doc_id, lang, CAST(e AS BIGINT) AS epoch
         FROM rep, LATERAL (SELECT unnest(generate_series(1, repeats)) AS e)""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val stats = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      // same single-scan discipline as q101: global max over the per-lang
      // aggregate rides a window, not a second aggregate subtree
      val fByLang = stats
        .withColumn("max_n", max("n").over(Window.partitionBy(lit(1))))
        .select(col("lang"),
          round(least(lit(3.0), pow(col("max_n") / col("n").cast("double"), 0.5)), 6).as("f"))
      val hashFrac = conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("double") / 16777216.0
      docs.join(broadcast(fByLang), "lang")
        .withColumn("repeats",
          floor(col("f")).cast("long")
            + when(hashFrac < col("f") - floor(col("f")), 1L).otherwise(0L))
        .select(col("doc_id"), col("lang"),
          // repeats >= 1 today (f = least(3, sqrt(max_n/n)) >= 1), but
          // guard anyway: Spark's sequence(1, 0) yields [1, 0] (a
          // DESCENDING two-element array) where DuckDB's
          // generate_series(1, 0) yields nothing — a future
          // down-sampling factor < 1 would silently diverge
          explode(when(col("repeats") >= 1, sequence(lit(1L), col("repeats")))
            .otherwise(array().cast("array<bigint>"))).as("epoch"))
    },

    // TOKEN-BUDGET MIXTURE — the planner's side of a training-data mix:
    // the run has a TOKEN budget (here half the corpus), each source a
    // mixture weight (1 + src# % 3 — deterministic), and the engine must
    // fill each source's share with its BEST documents. Per source:
    // budget = floor(total/2 · w / Σw), docs ranked by quality (q40's
    // 6dp-rounded score, so the order is engine-stable), kept while the
    // running token prefix-sum stays within budget. Complements the
    // rate-based mixers (q101 temperature, q108 epochs): those realize a
    // RATIO, this realizes an absolute budget with a quality floor —
    // what an actual pretraining run is provisioned by. Scale shape: the
    // corpus is tokenized+scored in ONE pinned pass; budgets derive from
    // the per-source aggregate (20 rows) with the global sums as windows
    // over THAT frame, not second corpus scans; the prefix-sum is a
    // per-source window (sources ≫ executors ⇒ partition-parallel; a
    // single monster source would use the PrefixSum two-phase scan
    // instead, q83's idiom). Output is the per-source manifest.
    QueryDef("q176_token_budget_mix", Seq("F5", "W4", "W8", "A5"),
      s"""WITH tok AS (
            SELECT doc_id, source, len($wsToks) AS tokens,
              ${TextQueries.qualitySql} AS quality
            FROM documents),
          srct AS (
            SELECT source, CAST(sum(tokens) AS BIGINT) AS src_tokens
            FROM tok GROUP BY source),
          srcw AS (
            SELECT source, src_tokens,
              1 + CAST(substr(source, 4) AS INT) % 3 AS w
            FROM srct),
          budgets AS (
            SELECT source, w,
              CAST(floor(
                CAST(floor(sum(src_tokens) OVER () / 2.0) AS BIGINT)
                  * w / CAST(sum(w) OVER () AS DOUBLE)) AS BIGINT) AS budget
            FROM srcw),
          ranked AS (
            SELECT doc_id, source, tokens,
              sum(tokens) OVER (PARTITION BY source
                ORDER BY quality DESC, doc_id
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM tok),
          kept AS (
            SELECT r.source, count(*) AS n_kept,
              CAST(sum(r.tokens) AS BIGINT) AS tokens_kept
            FROM ranked r JOIN budgets b ON r.source = b.source
            WHERE r.cum <= b.budget GROUP BY r.source)
          SELECT b.source, b.w, b.budget,
            coalesce(k.n_kept, 0) AS n_kept,
            coalesce(k.tokens_kept, 0) AS tokens_kept
          FROM budgets b LEFT JOIN kept k ON b.source = k.source""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFns
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(trim(col("text")), """\s+""")).cast("long").as("tokens"),
          TextFns.qualityScore(col("text"), TextQueries.qualityStops).as("quality"))
        .localCheckpoint(false) // budgets agg and the ranked window share one scan
      // global sums ride windows over the 20-row per-source aggregate
      // (q101/q108 discipline), never a second corpus scan
      val srcw = tok.groupBy("source").agg(sum("tokens").as("src_tokens"))
        // substr(source, 4) to END of string — the oracle takes the full
        // numeric suffix, and a length-capped substring(…, 4, 10) would
        // silently diverge on a suffix longer than the cap
        .withColumn("w", lit(1) + expr("substr(source, 4)").cast("int") % 3)
      val budgets = srcw
        .withColumn("budget_total",
          floor(sum("src_tokens").over(Window.partitionBy(lit(1))) / 2.0).cast("long"))
        .withColumn("ws", sum("w").over(Window.partitionBy(lit(1))))
        .select(col("source"), col("w"),
          floor(col("budget_total") * col("w") / col("ws").cast("double"))
            .cast("long").as("budget"))
      val ranked = tok.withColumn("cum",
        sum("tokens").over(Window.partitionBy("source")
          .orderBy(col("quality").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val kept = ranked.join(broadcast(budgets), "source")
        .filter(col("cum") <= col("budget"))
        .groupBy("source").agg(count(lit(1)).as("n_kept"),
          sum("tokens").as("tokens_kept"))
      budgets.join(kept, Seq("source"), "left")
        .select(col("source"), col("w"), col("budget"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
    },

    // MONSTER-SOURCE TOKEN BUDGET — q176's missing arm, wired: the
    // per-source cumulative window is partition-parallel only while
    // sources ≫ executors, and a real crawl mix has ONE source holding
    // most of the corpus (here: src0–src11 fold into 'mega', ~60% of
    // tokens). For that source a PARTITION BY source window funnels
    // most of the corpus through one task — so the mega source's
    // ranked prefix-sum runs through PrefixSum's two-phase scan
    // instead (bucket = the negated 6dp quality micro-key, a
    // coarsening of the (quality DESC, doc_id) rank order with doc_id
    // unique inside; q180's discipline), while the remaining small
    // sources keep the per-source window. Both arms produce the same
    // `cum` the oracle's window defines; budgets ride the per-source
    // aggregate exactly as in q176. PlanBudgetSpec asserts no
    // un-partitioned corpus-sized window survives in the plan.
    QueryDef("q183_monster_source_budget", Seq("F5", "W4", "W8", "A5"),
      s"""WITH tok AS (
            SELECT doc_id,
              CASE WHEN CAST(substr(source, 4) AS INT) < 12
                   THEN 'mega' ELSE source END AS source,
              len($wsToks) AS tokens,
              ${TextQueries.qualitySql} AS quality
            FROM documents),
          srct AS (
            SELECT source, CAST(sum(tokens) AS BIGINT) AS src_tokens
            FROM tok GROUP BY source),
          srcw AS (
            SELECT source, src_tokens,
              CASE WHEN source = 'mega' THEN 4
                   ELSE 1 + CAST(substr(source, 4) AS INT) % 3 END AS w
            FROM srct),
          budgets AS (
            SELECT source, w,
              CAST(floor(
                CAST(floor(sum(src_tokens) OVER () / 2.0) AS BIGINT)
                  * w / CAST(sum(w) OVER () AS DOUBLE)) AS BIGINT) AS budget
            FROM srcw),
          ranked AS (
            SELECT doc_id, source, tokens,
              sum(tokens) OVER (PARTITION BY source
                ORDER BY quality DESC, doc_id
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM tok),
          kept AS (
            SELECT r.source, count(*) AS n_kept,
              CAST(sum(r.tokens) AS BIGINT) AS tokens_kept
            FROM ranked r JOIN budgets b ON r.source = b.source
            WHERE r.cum <= b.budget GROUP BY r.source)
          SELECT b.source, b.w, b.budget,
            coalesce(k.n_kept, 0) AS n_kept,
            coalesce(k.tokens_kept, 0) AS tokens_kept
          FROM budgets b LEFT JOIN kept k ON b.source = k.source""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFns
      import graft.operators.PrefixSum
      val srcNum = expr("substr(source, 4)").cast("int")
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          when(srcNum < 12, lit("mega")).otherwise(col("source")).as("source"),
          size(split(trim(col("text")), """\s+""")).cast("long").as("tokens"),
          TextFns.qualityScore(col("text"), TextQueries.qualityStops).as("quality"))
        .localCheckpoint(false) // budgets agg and both ranked arms share one scan
      val srcw = tok.groupBy("source").agg(sum("tokens").as("src_tokens"))
        .withColumn("w", when(col("source") === "mega", lit(4))
          .otherwise(lit(1) + expr("substr(source, 4)").cast("int") % 3))
      val budgets = srcw
        .withColumn("budget_total",
          floor(sum("src_tokens").over(Window.partitionBy(lit(1))) / 2.0).cast("long"))
        .withColumn("ws", sum("w").over(Window.partitionBy(lit(1))))
        .select(col("source"), col("w"),
          floor(col("budget_total") * col("w") / col("ws").cast("double"))
            .cast("long").as("budget"))
      // mega arm: (quality DESC, doc_id) ≡ (negq ASC, doc_id) with negq
      // the 6dp micro-key — bijective on 6dp-rounded scores, so the
      // two-phase scan reproduces the window's cum exactly
      val mega = tok.filter(col("source") === "mega")
        .withColumn("__negq",
          lit(1000000L) - round(col("quality") * 1e6).cast("long"))
      val megaRanked = PrefixSum.exclusive(mega,
          order = struct(col("__negq"), col("doc_id")),
          value = col("tokens"),
          bucket = expr("CAST(__negq DIV 10000 AS BIGINT)"), as = "__pre")
        .withColumn("cum", col("__pre") + col("tokens"))
        .select("doc_id", "source", "tokens", "cum")
      val restRanked = tok.filter(col("source") =!= "mega")
        .withColumn("cum",
          sum("tokens").over(Window.partitionBy("source")
            .orderBy(col("quality").desc, col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("doc_id", "source", "tokens", "cum")
      val kept = megaRanked.unionByName(restRanked)
        .join(broadcast(budgets), "source")
        .filter(col("cum") <= col("budget"))
        .groupBy("source").agg(count(lit(1)).as("n_kept"),
          sum("tokens").as("tokens_kept"))
      budgets.join(kept, Seq("source"), "left")
        .select(col("source"), col("w"), col("budget"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
    },

    // TOKEN-BALANCED SHARDS — q102 hash-shards documents uniformly BY
    // COUNT, which leaves shard token totals as lopsided as the length
    // distribution; a training run wants shards balanced BY TOKENS so
    // every data-parallel reader finishes together. Classic LPT
    // approximation: order docs by tokens desc and deal them round-robin
    // — shard = global_rank % 8, which bounds the token imbalance by one
    // document per deal round. The global rank is the q83 discipline:
    // PrefixSum's two-phase scan (bucket = the negated token count —
    // a coarsening of the order with doc_id unique inside), NEVER a
    // single-partition row_number over the corpus. Output is the
    // per-doc shard manifest the writer tasks consume.
    QueryDef("q180_balanced_shards", Seq("W8", "F5", "A5"),
      s"""WITH tok AS (
            SELECT doc_id, len($wsToks) AS tokens FROM documents),
          ranked AS (
            SELECT doc_id, tokens,
              row_number() OVER (ORDER BY tokens DESC, doc_id) AS rnk
            FROM tok)
          SELECT doc_id, tokens, CAST((rnk - 1) % 8 AS INT) AS shard
          FROM ranked""") { (s, d) =>
      import graft.operators.PrefixSum
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(trim(col("text")), """\s+""")).cast("long").as("tokens"))
      // rank-1 = exclusive prefix COUNT in (tokens desc, doc_id) order;
      // the bucket (-tokens) coarsens that order so phase 3 partitions
      // by token count and no task ever sees the whole corpus
      PrefixSum.exclusive(tok,
          order = struct((-col("tokens")).as("nt"), col("doc_id")),
          value = lit(1L), bucket = -col("tokens"), as = "__pre")
        .select(col("doc_id"), col("tokens"),
          (col("__pre") % 8).cast("int").as("shard"))
    },

    // Classifier-scored curation ([[graft.ml.NaiveBayes]]): train a
    // multinomial NB lang model in ONE aggregation pass (per-class doc
    // counts ride the token-count shuffle via a marker token), then
    // score every document ROW-LOCALLY — the per-class log-likelihoods
    // are integer micro-log map literals, so the apply side is a pure
    // map stage (no join, no shuffle) and scores are exact integer sums
    // both engines agree on. The oracle replays training and scoring
    // verbatim (floor(ln(p)·1e6); add-one smoothing over the global
    // vocabulary; argmax tie → alphabetically-first class; `uns` keys
    // off nd, not tot, so a class whose docs are all empty still owns
    // its smoothed unseen weight — matching fit()'s marker-token path).
    QueryDef("q110_nb_classifier", Seq("F5", "A11"),
      """WITH tok AS (
           SELECT doc_id, lang,
             unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), w -> w <> '')) AS w
           FROM documents),
         v AS (SELECT count(DISTINCT w) AS v FROM tok),
         nd AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         prior AS (
           SELECT lang, CAST(floor(ln(n / CAST((SELECT sum(n) FROM nd) AS DOUBLE)) * 1e6) AS BIGINT) AS p
           FROM nd),
         cnt AS (SELECT lang, w, count(*) AS n FROM tok GROUP BY 1, 2),
         tot AS (SELECT lang, sum(n) AS t FROM cnt GROUP BY 1),
         ll AS (
           SELECT c.lang, c.w, CAST(floor(ln((c.n + 1.0) / (t.t + v.v)) * 1e6) AS BIGINT) AS l
           FROM cnt c JOIN tot t USING (lang) CROSS JOIN v),
         uns AS (
           SELECT nd.lang, CAST(floor(ln(1.0 / (coalesce(t.t, 0) + v.v)) * 1e6) AS BIGINT) AS u
           FROM nd LEFT JOIN tot t USING (lang) CROSS JOIN v),
         tokscore AS (
           SELECT t.doc_id, u.lang AS c, sum(coalesce(l.l, u.u)) AS s
           FROM tok t CROSS JOIN uns u
           LEFT JOIN ll l ON l.lang = u.lang AND l.w = t.w
           GROUP BY 1, 2),
         sc AS (
           SELECT d.doc_id, d.lang, pr.lang AS c, pr.p + coalesce(ts.s, 0) AS s
           FROM documents d
           CROSS JOIN prior pr
           LEFT JOIN tokscore ts ON ts.doc_id = d.doc_id AND ts.c = pr.lang),
         pred AS (
           SELECT doc_id, lang, c, s,
             row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, c) AS rn
           FROM sc)
         SELECT doc_id, lang, c AS pred_lang, CAST(s AS BIGINT) AS score FROM pred WHERE rn = 1""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val m = graft.ml.NaiveBayes.fit(docs, "lang", "text")
      // two-step select so the 5-class fold runs once per row: __b is
      // non-cheap and referenced twice, which blocks CollapseProject
      docs.select(col("doc_id"), col("lang"),
          graft.ml.NaiveBayes.best(col("text"), m).as("__b"))
        .select(col("doc_id"), col("lang"),
          graft.ml.NaiveBayes.predClass(col("__b"), m).as("pred_lang"),
          graft.ml.NaiveBayes.predScore(col("__b")).as("score"))
    },

    // Token-budget selection ("take the best documents until the budget
    // is filled" — the corpus-sizing step after scoring): rank docs by
    // lexical diversity (distinct/total tokens as an integer micro-key,
    // doc_id tiebreak) and keep each doc whose tokens still fit the
    // 15k-token budget (greedy — an oversized doc is skipped, smaller
    // later docs still fit). The global ordered cumsum runs through
    // PrefixSum's two-phase scan, NOT a single-partition window: bucket
    // subtotals shuffle once, the un-partitioned window sees only the
    // ~100 bucket rows, the within-bucket running sum parallelizes on
    // the bucket key. Selection itself is a row-local predicate.
    QueryDef("q113_token_budget", Seq("A5", "F5", "U6"),
      s"""WITH tok AS (
           SELECT doc_id, $wsToks AS toks FROM documents WHERE trim(text) <> ''),
         scored AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             1000000 - CAST(floor(len(list_distinct(toks)) * 1e6 / len(toks)) AS BIGINT) AS nd
           FROM tok WHERE len(toks) > 0),
         cum AS (
           SELECT doc_id, n_tokens, nd,
             coalesce(sum(n_tokens) OVER (ORDER BY nd, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
           FROM scored)
         SELECT doc_id, nd, n_tokens, CAST(start_tok AS BIGINT) AS start_tok
         FROM cum WHERE start_tok + n_tokens <= 15000""") { (s, d) =>
      val scored = tok(s, d)
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
          (lit(1000000L) - floor(size(array_distinct(col("toks"))) * lit(1e6)
            / size(col("toks"))).cast("long")).as("nd"))
        .filter(col("n_tokens") > 0)
      graft.operators.PrefixSum.exclusive(scored,
          struct(col("nd"), col("doc_id")), col("n_tokens"),
          expr("CAST(nd DIV 10000 AS BIGINT)"), "start_tok")
        .filter(col("start_tok") + col("n_tokens") <= 15000)
        .select("doc_id", "nd", "n_tokens", "start_tok")
    },

    // Data-quality gate — the constraint battery every production
    // pipeline runs before trusting an ingest (Deequ's core checks,
    // declaratively): key uniqueness, FK resolution, domain ranges,
    // non-emptiness, and a derived-column consistency check, one row
    // per check. Scale shape: the row-local checks per table FUSE into
    // ONE conditional-sum aggregate per scan (three scans total), the
    // FK check is the only join (anti, resolved-side projected to its
    // key), and everything meets in 1-row crossJoins + a stack unpivot
    // — at 100 TB this is 3 passes + 1 keyed anti-join, not a pass per
    // check.
    QueryDef("q136_dq_checks", Seq("A11", "F4"),
      """WITH o AS (
           SELECT count(*) - count(DISTINCT o_orderkey) AS pk_dup,
             sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust
           FROM orders),
         li AS (
           SELECT sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS disc,
             sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS qty
           FROM lineitem),
         orph AS (
           SELECT count(*) AS orphans
           FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderkey IS NULL),
         doc AS (
           SELECT sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END) AS empty_text,
             sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS bad_nchars
           FROM documents)
         SELECT dq_check, CAST(violations AS BIGINT) AS violations,
           violations = 0 AS pass
         FROM (
           SELECT 'orders_pk_unique' AS dq_check, pk_dup AS violations FROM o
           UNION ALL SELECT 'orders_custkey_not_null', null_cust FROM o
           UNION ALL SELECT 'lineitem_fk_resolves', orphans FROM orph
           UNION ALL SELECT 'lineitem_discount_in_range', disc FROM li
           UNION ALL SELECT 'lineitem_qty_positive', qty FROM li
           UNION ALL SELECT 'documents_text_nonempty', empty_text FROM doc
           UNION ALL SELECT 'documents_nchars_consistent', bad_nchars FROM doc)""") { (s, d) =>
      val o = Tables.orders(s, d).agg(
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk_dup"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"))
      val li = Tables.lineitem(s, d).agg(
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L)).as("disc"),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("qty"))
      val orph = Tables.lineitem(s, d).select("l_orderkey")
        .join(Tables.orders(s, d).select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("orphans"))
      val doc = Tables.documents(s, d).agg(
        sum(when(length(trim(col("text"))) === 0, 1L).otherwise(0L)).as("empty_text"),
        sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L)).as("bad_nchars"))
      o.crossJoin(li).crossJoin(orph).crossJoin(doc) // four 1-row frames
        .select(expr(
          """stack(7,
             'orders_pk_unique', pk_dup,
             'orders_custkey_not_null', null_cust,
             'lineitem_fk_resolves', orphans,
             'lineitem_discount_in_range', disc,
             'lineitem_qty_positive', qty,
             'documents_text_nonempty', empty_text,
             'documents_nchars_consistent', bad_nchars) AS (dq_check, violations)"""))
        .select(col("dq_check"), col("violations").cast("long").as("violations"),
          (col("violations") === 0).as("pass"))
    },

    // REFERENTIAL COVERAGE AUDIT — the corpus↔embedding coverage facts
    // a multi-representation pipeline must treat as first-class: which
    // documents have an embedding row (and so are VISIBLE to the
    // semantic stages — q106/q140/q153), which don't (they flow through
    // lexical passes only; a semantic stage that inner-joins them away
    // silently shrinks the corpus — the exact q153 bug class, made a
    // monitored number here the way q136 monitors constraints), and
    // which embeddings are ORPHANS with no backing document (stale index
    // entries — q151 tombstone candidates). Scale shape: both sides are
    // corpus-sized, so neither broadcasts — each is PROJECTED TO ITS KEY
    // before one co-partitioned full-outer shuffle join, counts
    // partial-aggregate per class, and the share window runs over the
    // 3-row result (driver-trivial). At 100 TB: two key-column scans +
    // one keyed shuffle, nothing else.
    QueryDef("q155_embedding_coverage_audit", Seq("A11", "F4"),
      """WITH d AS (SELECT doc_id AS id FROM documents),
         e AS (SELECT vec_id AS id FROM embeddings),
         j AS (
           SELECT CASE
               WHEN d.id IS NOT NULL AND e.id IS NOT NULL THEN 'both'
               WHEN d.id IS NOT NULL THEN 'document_only'
               ELSE 'embedding_only' END AS coverage_class
           FROM d FULL OUTER JOIN e ON d.id = e.id),
         g AS (SELECT coverage_class, count(*) AS n FROM j GROUP BY 1)
         SELECT coverage_class, CAST(n AS BIGINT) AS n,
           round(n * 1.0 / sum(n) OVER (), 6) AS share
         FROM g""") { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id").as("id"))
        .withColumn("has_doc", lit(true))
      val embs = Tables.embeddings(s, d).select(col("vec_id").as("id"))
        .withColumn("has_emb", lit(true))
      val cls = when(col("has_doc").isNotNull && col("has_emb").isNotNull, "both")
        .when(col("has_doc").isNotNull, "document_only")
        .otherwise("embedding_only")
      val g = docs.join(embs, Seq("id"), "full_outer")
        .groupBy(cls.as("coverage_class")).agg(count(lit(1)).as("n"))
      g.withColumn("share",
        round(col("n") / sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()), 6))
    }
  )
}

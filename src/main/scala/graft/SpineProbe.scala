package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the MULTI-STAGE queries: materializes a scaled copy
  * of the fact tables they read and times each query at 1× and N×,
  * printing one JSON line per measurement (ScaleProbe methodology: min
  * of 2 runs, GC settling).
  *
  * The scaled tables are built by key-offset unions — ⌊N⌋-1 full copies
  * plus (for fractional N) a KEY-RANGE half copy (`key ≤ max/2`). The
  * range cut keeps whole id-groups (a parity cut would halve every
  * group's membership and ~triple group count instead); the offset is a
  * multiple of every modulus the q94 fixture derives from `o_orderkey`
  * AND — because the fixture also derives org/boundary patterns from
  * `m = k div 4` — of 4 × lcm(m-moduli): 2⁴·3·5·7·11·13·19 = 4,564,560
  * (so m shifts by 1,141,140 ≡ 0 mod 420·2717). Each copy therefore
  * replicates the same per-group shapes under fresh ids: group COUNT
  * grows ~N×, per-group size does not — the growth profile a cluster
  * sees, not artificially deepened groups. q104's only id derivation is
  * `doc_id DIV 50`, so its offset just needs to be a bin-width multiple
  * past the max id. `nation` stays 1× (dimension).
  *
  * Usage: runMain graft.SpineProbe [sfDir] [factor]
  *   factor 2.5 (default) → the per-round 2.5× sweep over the full list;
  *   factor 10 → the decade probe over the q94/q106/q112/q114 spine
  *   family (sf0.1 × 10 ≈ sf1), which cuts the 2.5×→100 TB
  *   extrapolation by one decade of measurement.
  */
object SpineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toDouble).getOrElse(2.5)
    require(factor >= 1, s"scale factor must be >= 1, got $factor")
    val fullCopies = math.floor(factor).toInt - 1 // beyond the base
    val halfCopy = factor - math.floor(factor) >= 0.49
    // the tag records what was BUILT (copies quantize to halves), never
    // the requested factor — labels land in SCALING.md
    val built = 1.0 + fullCopies + (if (halfCopy) 0.5 else 0.0)
    val tag = if (built == built.floor) f"${built}%.0fx" else s"${built}x"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scaled = s"${System.getProperty("java.io.tmpdir")}/graft_spine_probe_$tag"
    val ordersOff = 4564560L // 2^4·3·5·7·11·13·19: > max key, ≡0 mod every k- and 4·m-modulus
    val docsOff = 1000000L // multiple of the DIV-50 bin width, > max doc_id

    /** base + ⌊N⌋-1 offset copies (+ key-range half copy), with `mutate`
      * applied per copy index (0 = the base, untouched). */
    def scaleUnion(base: DataFrame, key: String, off: Long,
        mutate: (DataFrame, Int) => DataFrame = (df, _) => df): DataFrame = {
      val half = base.agg(max(col(key)).cast("long")).head().getLong(0) / 2
      val copies = (0 to fullCopies).map { c =>
        if (c == 0) base else mutate(base.withColumn(key, col(key) + c * off), c)
      }
      val withHalf =
        if (!halfCopy) copies
        else {
          val c = fullCopies + 1
          // contiguous key RANGE (not parity): whole id-groups survive,
          // so this adds ~half the groups at full per-group membership
          copies :+ mutate(base.filter(col(key) <= half)
            .withColumn(key, col(key) + c * off), c)
        }
      withHalf.reduce(_ unionByName _)
    }

    // the decade probe covers the spine family; the per-round sweep the
    // full list — staging below is gated on what the list actually reads
    val decade = factor >= 4

    // every orders-spine query also reads the nation dimension, so its
    // footprint names BOTH tables — staging is the union over selections
    val ordersSpine = Set("orders", "nation")
    val probes: Seq[(String, Set[String])] =
      if (decade) Seq( // decade probe: spine + sketch + ANN + streaming
        ("q94_cva_end_to_end", ordersSpine),
        ("q106_semdedup", Set("embeddings")),
        ("q112_flagging_end_to_end", ordersSpine),
        ("q114_dup_spans", Set("documents_sfx")),
        ("q153_llm_corpus_end_to_end", Set("documents_q153")),
        ("q119_kmv_distinct", Set("lineitem")),
        ("q121_cms_heavy_hitters", Set("documents")),
        ("q122_quantile_sample", Set("lineitem")),
        ("q126_ann_pq", Set("embeddings")),
        ("q127_ann_ivfpq", Set("embeddings")),
        ("q128_hll_distinct", Set("lineitem")),
        // the index-family SEARCH queries: every persisted/train-in-query
        // rung gets a measured 10x wall-time row, not just q145
        ("q138_ann_ivf_tree", Set("embeddings")),
        ("q139_ann_ivfpq_faiss", Set("embeddings")),
        ("q141_ann_tree_persisted", Set("embeddings")),
        ("q144_ann_ivfpq_persisted", Set("embeddings")),
        ("q148_ann_ivfpq_append", Set("embeddings")),
        ("q149_ann_segment_compact", Set("embeddings")),
        ("q151_ann_tombstone_delete", Set("embeddings")),
        ("q154_ann_lifecycle_compacted_delete", Set("embeddings")),
        ("q140_semdedup_tree", Set("embeddings")),
        ("q142_semdedup_incremental_tree", Set("embeddings")),
        ("q143_stream_semdedup", Set("embeddings")),
        ("q145_ann_ivfpq_coded", Set("embeddings")),
        ("q146_stream_semdedup_pairs", Set("embeddings_ev")),
        ("q147_stream_semdedup_unified", Set("embeddings")),
        ("q150_stream_drift_monitor", Set("embeddings_ev")),
        ("q152_stream_index_append", Set("embeddings")),
        ("q157_index_asof_snapshot", Set("embeddings")),
        ("q164_stream_tombstone_delete", Set("embeddings")),
        ("q156_agg_incremental_refresh", Set("events")),
        ("q158_stream_agg_refresh", Set("events")),
        ("q159_stream_decontam", Set("documents")),
        ("q166_image_decode", Set("documents")),
        ("q168_audio_decode", Set("documents")),
        ("q173_video_frames", Set("documents")),
        ("q171_components_incremental", Set("documents")),
        ("q172_stream_components", Set("documents")),
        ("q181_components_retraction", Set("documents")),
        ("q182_survivor_reelection", Set("documents")),
        ("q185_stream_components_retraction", Set("documents")),
        ("q187_stream_components_cdc", Set("documents")),
        ("q188_stream_survivor_reelection", Set("documents")),
        ("q189_stream_manifest_cdc", Set("documents")),
        ("q190_stream_manifest_compaction", Set("documents")),
        ("q191_manifest_asof", Set("documents")),
        ("q192_manifest_asof_time", Set("documents")),
        ("q183_monster_source_budget", Set("documents")),
        ("q184_mmr_rerank_k5", Set("embeddings")),
        ("q186_stats_broadcast_join", Set("orders", "customer")),
        ("q161_partition_backfill", Set("events")),
        ("q162_schema_evolution", Set("events")),
        ("q163_cdc_incremental_refresh", Set("events")),
        ("q165_scd2_join_ivm", Set("events")),
        ("q167_stream_cdc_view", Set("events")),
        ("q169_scd2_incremental_build", Set("events")),
        ("q160_join_incremental_refresh", Set("orders", "nation", "customer")),
        ("q170_cdc_join_refresh", Set("orders", "nation", "customer")),
        ("q174_dedup_quality_survivor", Set("documents")),
        ("q175_hybrid_rrf", Set("documents", "embeddings")),
        ("q176_token_budget_mix", Set("documents")),
        ("q177_contamination_fraction", Set("documents")),
        ("q178_fuzzy_decontam", Set("documents")),
        ("q179_mmr_rerank", Set("embeddings")),
        ("q180_balanced_shards", Set("documents")),
        ("q130_stream_interval_join", Set("events")),
        ("q131_stream_session", Set("events")),
        ("q132_stream_cms", Set("documents")),
        ("q133_stream_cdc_tws", Set("events")),
        ("q135_stream_interval_outer", Set("events")),
        ("q137_stream_join_window", Set("events")))
      else Seq(
        ("q94_cva_end_to_end", ordersSpine),
        ("q104_pack_materialize", Set("documents")),
        ("q113_token_budget", Set("documents")),
        ("q115_bm25", Set("documents")),
        ("q114_dup_spans", Set("documents_sfx")),
        ("q116_batched_inference", ordersSpine),
        ("q117_staged_spine_join", ordersSpine),
        ("q153_llm_corpus_end_to_end", Set("documents_q153")),
        ("q118_stream_incremental_neardup", Set("documents")),
        ("q119_kmv_distinct", Set("lineitem")),
        ("q121_cms_heavy_hitters", Set("documents")),
        ("q122_quantile_sample", Set("lineitem")),
        ("q123_zorder_scan", Set("lineitem")),
        ("q126_ann_pq", Set("embeddings")),
        ("q127_ann_ivfpq", Set("embeddings")),
        ("q140_semdedup_tree", Set("embeddings")),
        ("q142_semdedup_incremental_tree", Set("embeddings")),
        ("q143_stream_semdedup", Set("embeddings")),
        ("q145_ann_ivfpq_coded", Set("embeddings")),
        ("q146_stream_semdedup_pairs", Set("embeddings_ev")),
        ("q147_stream_semdedup_unified", Set("embeddings")),
        ("q150_stream_drift_monitor", Set("embeddings_ev")),
        ("q152_stream_index_append", Set("embeddings")),
        ("q157_index_asof_snapshot", Set("embeddings")),
        ("q164_stream_tombstone_delete", Set("embeddings")),
        ("q156_agg_incremental_refresh", Set("events")),
        ("q158_stream_agg_refresh", Set("events")),
        ("q159_stream_decontam", Set("documents")),
        ("q166_image_decode", Set("documents")),
        ("q168_audio_decode", Set("documents")),
        ("q173_video_frames", Set("documents")),
        ("q171_components_incremental", Set("documents")),
        ("q172_stream_components", Set("documents")),
        ("q181_components_retraction", Set("documents")),
        ("q182_survivor_reelection", Set("documents")),
        ("q185_stream_components_retraction", Set("documents")),
        ("q187_stream_components_cdc", Set("documents")),
        ("q188_stream_survivor_reelection", Set("documents")),
        ("q189_stream_manifest_cdc", Set("documents")),
        ("q190_stream_manifest_compaction", Set("documents")),
        ("q191_manifest_asof", Set("documents")),
        ("q192_manifest_asof_time", Set("documents")),
        ("q183_monster_source_budget", Set("documents")),
        ("q184_mmr_rerank_k5", Set("embeddings")),
        ("q186_stats_broadcast_join", Set("orders", "customer")),
        ("q161_partition_backfill", Set("events")),
        ("q162_schema_evolution", Set("events")),
        ("q163_cdc_incremental_refresh", Set("events")),
        ("q165_scd2_join_ivm", Set("events")),
        ("q167_stream_cdc_view", Set("events")),
        ("q169_scd2_incremental_build", Set("events")),
        ("q160_join_incremental_refresh", Set("orders", "nation", "customer")),
        ("q170_cdc_join_refresh", Set("orders", "nation", "customer")),
        ("q174_dedup_quality_survivor", Set("documents")),
        ("q175_hybrid_rrf", Set("documents", "embeddings")),
        ("q176_token_budget_mix", Set("documents")),
        ("q177_contamination_fraction", Set("documents")),
        ("q178_fuzzy_decontam", Set("documents")),
        ("q179_mmr_rerank", Set("embeddings")),
        ("q180_balanced_shards", Set("documents")),
        ("q130_stream_interval_join", Set("events")),
        ("q131_stream_session", Set("events")),
        ("q132_stream_cms", Set("documents")),
        ("q133_stream_cdc_tws", Set("events")),
        ("q135_stream_interval_outer", Set("events")),
        ("q137_stream_join_window", Set("events")))
    // optional third arg: comma-separated query filter (dev iteration);
    // staging is gated on the SELECTED queries' tables, so a one-query
    // drill-down doesn't pay the full multi-table 2.5× materialization
    val onlyQ: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    onlyQ.foreach { names =>
      val unknown = names -- probes.map(_._1).toSet
      require(unknown.isEmpty, s"unknown probe queries: ${unknown.mkString(", ")}")
    }
    val selected = probes.filter { case (q, _) => onlyQ.forall(_.contains(q)) }
    val needed = selected.flatMap(_._2).toSet

    def stage(name: String, df: => DataFrame): Unit =
      if (needed(name))
        df.write.mode("overwrite").parquet(s"$scaled/$name.parquet")

    stage("orders", scaleUnion(
      spark.read.parquet(s"$sfDir/orders.parquet"), "o_orderkey", ordersOff))
    // documents: q104/q113/q115/q118 (sweep) and q121 (decade);
    // lineitem: q119/q122 in both lists — shift l_partkey so the
    // sketch's distinct-value universe (not just the row count) grows
    // with scale
    stage("documents", scaleUnion(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", docsOff))
    stage("lineitem", scaleUnion(
      spark.read.parquet(s"$sfDir/lineitem.parquet"), "l_orderkey", ordersOff,
      (df, c) => df.withColumn("l_partkey", col("l_partkey") + c * ordersOff)))
    // embeddings (q106 decade; q126/q127 sweep): dimension-ROTATED
    // copies — norms and within-copy cosine structure preserved,
    // cross-copy cosines decorrelated (dims are near-iid), so
    // semantic-dedup cells and dup-groups grow ~N× at constant
    // per-group shape: the vector-space analogue of the token-suffix
    // trick below. The 7-dim rotation also straddles PQ's 8-dim
    // subspace boundaries, so copies land on fresh code combinations.
    def rotatedEmbeddings(off: Long) = scaleUnion(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id", off,
      (df, c) => {
        val r = (7 * c) % 64
        if (r == 0) df
        else df.withColumn("embedding",
          expr(s"concat(slice(embedding, ${r + 1}, ${64 - r}), slice(embedding, 1, $r))"))
      })
    stage("embeddings", rotatedEmbeddings(docsOff))
    if (needed("nation")) // dimension: copied 1×, never scaled
      spark.read.parquet(s"$sfDir/nation.parquet")
        .write.mode("overwrite").parquet(s"$scaled/nation.parquet")
    if (needed("customer")) // dimension: copied 1× (o_custkey is unscaled)
      spark.read.parquet(s"$sfDir/customer.parquet")
        .write.mode("overwrite").parquet(s"$scaled/customer.parquet")
    // events (q130/q131 sweep): full copies shift user_id past max, so
    // USERS grow with scale at constant per-user depth — streaming
    // state per watermark horizon grows N×, exactly what the probe
    // should charge the queries for. (The fractional HALF copy is a
    // key-range cut on event_id, which is time-correlated: it re-adds
    // ALL users at ~half-depth, boundary-truncated timelines — so at
    // 2.5× the user count is 3×, aggregate state/output still ~2.5×.)
    // event_id offset is a multiple of lcm(500, 300) so q81/q97/q120's
    // derived-entity dup structure would also replicate per copy.
    // Staged from Tables.events so ts is the normalized nanos BIGINT
    // either way.
    // the events scaling, shared by the "events" staging and q146's
    // matched-offset "embeddings_ev" dir below
    lazy val ev = graft.sources.Tables.events(spark, sfDir)
    lazy val userOff = // > max(user_id) at ANY sf, asserted not assumed
      ev.agg(max(col("user_id")).cast("long")).head().getLong(0) + 1
    // event_id offset likewise DERIVED, not hardcoded: the next
    // multiple of lcm(500, 300) = 1500 past max(event_id), so copies
    // never collide in key space at any sf while q81/q97/q120/q133's
    // derived-entity structure (event_id % 500 / % 300) still
    // replicates per copy
    lazy val eidOff = (ev.agg(max(col("event_id")).cast("long")).head().getLong(0)
      / 1500L + 1L) * 1500L
    def scaledEvents = scaleUnion(ev, "event_id", eidOff,
      (df, c) => df.withColumn("user_id", col("user_id") + c * userOff))
    stage("events", scaledEvents)
    // q146 joins vec_id = event_id for its REAL ingest timestamps, so
    // its scaled embeddings must share the EVENTS key offset (the
    // standard embeddings staging uses docsOff, which would leave every
    // copy's vectors without a matching event). Copies reuse the base
    // timeline's timestamps — the scaled stream is the same ~30-day
    // window at N× the arrival rate, which is exactly the growth a
    // horizon-bounded stream state should be charged for. Same
    // dimension rotation as the standard embeddings staging.
    val scaledEv = s"${System.getProperty("java.io.tmpdir")}/graft_spine_probe_ev_$tag"
    if (needed("embeddings_ev")) {
      // reuse the already-staged scaled events when the standard dir has
      // them (both lists stage both) instead of re-running the biggest
      // scaleUnion and paying a second full write of its output
      if (needed("events"))
        spark.read.parquet(s"$scaled/events.parquet")
          .write.mode("overwrite").parquet(s"$scaledEv/events.parquet")
      else
        scaledEvents.write.mode("overwrite").parquet(s"$scaledEv/events.parquet")
      rotatedEmbeddings(eidOff)
        .write.mode("overwrite").parquet(s"$scaledEv/embeddings.parquet")
    }

    // q114 (cross-doc span dedup) needs a SECOND documents scaling: the
    // plain copy above duplicates every text verbatim, which flips the
    // workload to its worst case (every position cross-doc duplicated —
    // dupPos becomes corpus-sized) instead of growing a same-shape
    // corpus. Suffixing every token with the copy index keeps each
    // copy's within-copy duplicate structure identical while making the
    // copies' shingle spaces disjoint: duplicated-shingle GROUPS grow
    // N×, per-shingle multiplicity does not — the cluster growth
    // profile. (The verbatim-copy worst case is still covered: the
    // capped occurrence aggregate bounds the buffer either way.)
    val scaledSfx = s"${System.getProperty("java.io.tmpdir")}/graft_spine_probe_sfx_$tag"
    if (needed("documents_sfx"))
      scaleUnion(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", docsOff,
        (df, c) => df.withColumn("text", array_join(
          transform(split(trim(col("text")), """\s+"""), t => concat(t, lit(s"_$c"))), " ")))
        .write.mode("overwrite").parquet(s"$scaledSfx/documents.parquet")

    // q153 (the LLM-corpus spine) needs a corpus that SURVIVES its own
    // dedup stages at N×: verbatim copies collapse at the exact-dedup
    // fingerprint, and whole-token suffixing (the q114 trick) collapses
    // the QUALITY stage instead — suffixed stopwords stop matching and
    // the stopword arm of the score zeroes out. Suffix only NON-stopword
    // tokens: the quality score's three arms are ~unchanged (stopword
    // and token counts identical, punctuation untouched, length slightly
    // longer), while the fingerprint and most 8-char shingles change per
    // copy — so the exact and minhash stages see a same-shape corpus
    // growing N×, not one they erase back to 1×. Embeddings ride beside
    // the documents in the same dir: the shared docsOff offset keeps the
    // doc_id↔vec_id correspondence per copy, and the rotation
    // decorrelates cross-copy cosines so semdedup cells grow N× at
    // constant per-cell shape.
    val scaledQ153 = s"${System.getProperty("java.io.tmpdir")}/graft_spine_probe_q153_$tag"
    if (needed("documents_q153")) {
      // = TextFns.qualityScore's stopword list (q40/q153)
      val stops = Seq("the", "a", "and", "of", "to", "is")
      scaleUnion(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", docsOff,
        (df, c) => df.withColumn("text", array_join(
          transform(split(trim(col("text")), """\s+"""),
            t => when(lower(t).isin(stops: _*), t)
              .otherwise(concat(t, lit(s"_$c")))), " ")))
        .write.mode("overwrite").parquet(s"$scaledQ153/documents.parquet")
      rotatedEmbeddings(docsOff)
        .write.mode("overwrite").parquet(s"$scaledQ153/embeddings.parquet")
    }

    def time(name: String, fn: => DataFrame): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 2) {
        spark.sharedState.cacheManager.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        fn.write.format("noop").mode("overwrite").save() // materializes every column
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best) best = sec
      }
      val rows = fn.count() // outside the timer — result-size sanity only
      println(s"""{"probe":"$name","sec":${math.round(best * 100) / 100.0},"rows":$rows}""")
    }

    // Streaming queries run their whole drain INSIDE build() and return
    // only a tiny aggregate over the drained sink — a plan compare on the
    // returned frame would inspect that trivial sink-side plan (and pay
    // two more full drains to get it), asserting nothing about the
    // streaming pipeline. Their plan shape is pinned by PlanBudgetSpec /
    // StreamingStateSpec instead; the probe reports wall + rows only.
    val drainsInBuild = Set("q118_stream_incremental_neardup",
      "q143_stream_semdedup", // stateless stream-static join: no state gate
      "q146_stream_semdedup_pairs",
      "q147_stream_semdedup_unified",
      "q150_stream_drift_monitor",
      "q152_stream_index_append",
      "q164_stream_tombstone_delete",
      "q167_stream_cdc_view",
      "q172_stream_components",
      "q185_stream_components_retraction",
      "q187_stream_components_cdc",
      "q188_stream_survivor_reelection",
      "q189_stream_manifest_cdc",
      "q190_stream_manifest_compaction",
      "q191_manifest_asof",
      "q192_manifest_asof_time",
      "q158_stream_agg_refresh", // foreachBatch merge; gate = view-rows ledger
      "q159_stream_decontam", // stateless gate reads StreamMetrics, not the plan
      "q130_stream_interval_join", "q131_stream_session",
      "q132_stream_cms", "q133_stream_cdc_tws",
      "q135_stream_interval_outer", "q137_stream_join_window")
    // sink name per streaming query — the StreamMetrics key its drain
    // records under, read back to gate state bounds at N×
    val streamSinks = Map(
      "q130_stream_interval_join" -> "graft_stream_interval_join",
      "q131_stream_session" -> "graft_stream_session",
      "q132_stream_cms" -> "graft_stream_cms",
      "q133_stream_cdc_tws" -> "graft_stream_cdc_tws",
      "q135_stream_interval_outer" -> "graft_stream_interval_outer",
      "q137_stream_join_window" -> "graft_stream_join_window",
      "q146_stream_semdedup_pairs" -> "graft_stream_semdedup_pairs",
      "q147_stream_semdedup_unified" -> "graft_stream_semdedup_unified",
      "q150_stream_drift_monitor" -> "graft_stream_drift_monitor")
    // foreachBatch queries meter no state operators — their scaling
    // evidence is the per-batch SEGMENT LEDGER each one records
    val ledgerSinks = Map(
      "q152_stream_index_append" -> "graft_stream_index_append",
      "q164_stream_tombstone_delete" -> "graft_stream_tombstone_delete",
      "q158_stream_agg_refresh" -> "graft_stream_agg_refresh",
      "q167_stream_cdc_view" -> "graft_stream_cdc_view",
      "q172_stream_components" -> "graft_stream_components",
      "q185_stream_components_retraction" -> "graft_stream_cc_retraction",
      "q187_stream_components_cdc" -> "graft_stream_cc_cdc",
      "q188_stream_survivor_reelection" -> "graft_stream_survivor",
      "q189_stream_manifest_cdc" -> "graft_stream_manifest_cdc",
      "q190_stream_manifest_compaction" -> "graft_stream_manifest_compaction",
      "q191_manifest_asof" -> "graft_manifest_asof",
      "q192_manifest_asof_time" -> "graft_manifest_asof_time")
    for ((q, tbls) <- selected) {
      val big = if (tbls("documents_sfx")) scaledSfx
        else if (tbls("documents_q153")) scaledQ153
        else if (tbls("embeddings_ev")) scaledEv
        else scaled
      time(s"${q}_1x", SparkEntry.queries(q)(spark, sfDir))
      val state1 = streamSinks.get(q).flatMap(graft.streaming.StreamMetrics.get)
      val segs1 = ledgerSinks.get(q).map(graft.streaming.StreamMetrics.segments)
        .getOrElse(Vector.empty)
      time(s"${q}_$tag", SparkEntry.queries(q)(spark, big))
      val stateN = streamSinks.get(q).flatMap(graft.streaming.StreamMetrics.get)
      val segsN = ledgerSinks.get(q).map(graft.streaming.StreamMetrics.segments)
        .getOrElse(Vector.empty)
      // q152/q164 have no state operators to meter (foreachBatch
      // encode/route) — their scaling claim lives in the SEGMENT
      // LEDGER: segment count tracks trigger cadence (flat — the staged
      // range count at every SF: 4 for q152, 2 for q164; rate moves
      // rows per segment, never segment count, and the q149 compaction
      // cadence stays an operational knob), total landed rows ∝ N
      // (q164's ledger counts appends + tombstones).
      if (decade && (q == "q152_stream_index_append" ||
          q == "q164_stream_tombstone_delete")) {
        val (n1, nN) = (segs1.count(_._2 > 0), segsN.count(_._2 > 0))
        val (r1, rN) = (segs1.map(_._2).sum, segsN.map(_._2).sum)
        val ok = n1 > 0 && nN <= n1 + 1 &&
          rN >= r1 * fullCopies && rN <= r1 * (fullCopies + 2)
        println(s"""{"gate":"${q}_segment_ledger_$tag","ok":$ok,"detail":"segments_1x=$n1 segments_$tag=$nN rows_1x=$r1 rows_$tag=$rN"}""")
      }
      // q158's ledger rows are the maintained VIEW's size after each
      // merge — |(event_type, day)| keys. The events scaling offsets
      // event_id only (timestamps and types replicate per copy), so the
      // key set — and therefore the view — must stay EXACTLY flat while
      // the stream folding into it deepens N×: the whole point of
      // maintaining partials instead of rows.
      if (decade && (q == "q158_stream_agg_refresh" ||
          q == "q167_stream_cdc_view")) {
        val ok = segs1.nonEmpty && segsN.nonEmpty &&
          segsN.last._2 == segs1.last._2 && segsN.size <= segs1.size + 1
        println(s"""{"gate":"${q}_view_rows_$tag","ok":$ok,"detail":"view_rows_1x=${segs1.lastOption.map(_._2).getOrElse(-1L)} view_rows_$tag=${segsN.lastOption.map(_._2).getOrElse(-1L)} batches_1x=${segs1.size} batches_$tag=${segsN.size}"}""")
      }
      // q185/q187/q189 fold cluster retractions (and, for q187/q189,
      // appends) per micro-batch: segment COUNT tracks trigger cadence
      // (the staged range count — 2 for q185, 3 for q187/q189), never
      // data volume; the ledger rows are the maintained artifact's
      // standing row count (labels for q185/q187, MANIFEST rows for
      // q189), which grows with the corpus (copy-scaling clones every
      // near-dup clique) and must never shrink below the 1x state.
      if (decade && (q == "q185_stream_components_retraction" ||
          q == "q187_stream_components_cdc" ||
          q == "q189_stream_manifest_cdc" ||
          q == "q190_stream_manifest_compaction")) {
        val ok = segs1.nonEmpty && segsN.size <= segs1.size + 1 &&
          segsN.lastOption.map(_._2).getOrElse(-1L) >=
            segs1.lastOption.map(_._2).getOrElse(Long.MaxValue)
        println(s"""{"gate":"${q}_fold_cadence_$tag","ok":$ok,"detail":"batches_1x=${segs1.size} batches_$tag=${segsN.size} state_rows_1x=${segs1.lastOption.map(_._2).getOrElse(-1L)} state_rows_$tag=${segsN.lastOption.map(_._2).getOrElse(-1L)}"}""")
      }
      // q159's whole claim is STATELESSNESS: the gate against the probe
      // set is row-local (plan-literal Bloom + broadcast confirm), so
      // the state store must hold ZERO rows at any arrival rate — the
      // opposite pole from q143's standing-corpus gate. (Not in
      // streamSinks: the generic bound treats peak 0 as a degenerate
      // baseline, here it IS the invariant.)
      if (decade && q == "q159_stream_decontam") {
        val snap = graft.streaming.StreamMetrics.get("graft_stream_decontam")
        val ok = snap.exists(s => s.maxRowsTotal == 0 && s.operators == 0)
        println(s"""{"gate":"${q}_stateless_$tag","ok":$ok,"detail":"peak_rows=${snap.map(_.maxRowsTotal).getOrElse(-1L)} operators=${snap.map(_.operators).getOrElse(-1)}"}""")
      }
      // The decade re-runs StreamingStateSpec's claim ON THE SCALED
      // TABLE: state rows per key-horizon, not wall time, is what the
      // streaming family promises. The events scaling grows USERS N×
      // at constant per-user depth, so horizon-bounded state (join
      // buffers, open sessions) may grow ~N× and no more; the CMS is
      // flat at its 4,096 cells BY CONSTRUCTION; the CDC entity space
      // (event_id % 300, offsets ≡ 0 mod 1500) replicates per copy, so
      // its live-entity state must stay EXACTLY flat while the stream
      // deepens N×.
      if (decade && streamSinks.contains(q)) (state1, stateN) match {
        // a degenerate 1× snapshot (peak 0 — e.g. progress missed the
        // peak entirely) would collapse the multiplicative bound to ~64
        // and make the gate fail or pass on NOISE instead of the real
        // invariant — report it as its own failure mode, never gate on it
        case (Some(a), Some(_)) if a.maxRowsTotal <= 0 =>
          println(s"""{"gate":"${q}_state_bound_$tag","ok":false,"detail":"no 1x baseline: peak_1x=${a.maxRowsTotal}"}""")
        case (Some(a), Some(b)) =>
          val ok = q match {
            case "q132_stream_cms" =>
              a.maxRowsTotal <= 4096L && b.maxRowsTotal == a.maxRowsTotal
            case "q133_stream_cdc_tws" =>
              b.maxRowsTotal == a.maxRowsTotal && b.maxRowsTotal <= 300L
            case "q150_stream_drift_monitor" =>
              // state = LIVE HOURLY WINDOWS inside the watermark — the
              // monitor's whole point is that arrival rate moves n per
              // window, never the window count: FLAT at any N×
              b.maxRowsTotal > 0 && b.maxRowsTotal <= a.maxRowsTotal * 2 + 8
            case "q147_stream_semdedup_unified" =>
              // state = one ListState row per arrival EVER within the
              // TTL horizon; the drain's TTL is off, so nothing is
              // removed in-drain (the TTL is the production eviction
              // lever, spec-driven) — gate that state tracks arrivals
              // ∝ N, never worse; the lower bound keeps a degenerate
              // zero/shrunk Nx snapshot from passing vacuously
              b.maxRowsTotal >= a.maxRowsTotal &&
                b.maxRowsTotal <= a.maxRowsTotal * (fullCopies + 2) + 64
            case _ =>
              // ×5/4 slack on the linear bound: the PEAK is sampled at
              // micro-batch boundaries, and where those land against
              // the watermark shifts the in-flight buffer by ~10%
              // (observed: q135 at 11.08× across runs that also
              // measured 9.9× — same code, same data). The gate's job
              // is linear-vs-superlinear, which the slack preserves.
              b.removed > 0 &&
                b.maxRowsTotal <= a.maxRowsTotal * (fullCopies + 2) * 5 / 4 + 64
          }
          println(s"""{"gate":"${q}_state_bound_$tag","ok":$ok,"detail":"peak_1x=${a.maxRowsTotal} peak_$tag=${b.maxRowsTotal} removed_$tag=${b.removed} operators=${b.operators}"}""")
        case _ =>
          println(s"""{"gate":"${q}_state_bound_$tag","ok":false,"detail":"no StreamMetrics snapshot recorded"}""")
      }
      if (drainsInBuild(q))
        println(s"""{"probe":"${q}_plan_$tag","skipped":"drain executes inside build; sink-side plan is not the pipeline"}""")
      else {
        // the SCALING.md claim is measured, not assumed: the N× plan must
        // keep the PlanBudget shape (no cross product, no sort-merge join
        // the 1× plan didn't have, shuffle count unchanged vs 1×)
        def shuffles(p: String) = PlanText.shuffles(p)
        val p1 = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
        val pN = SparkEntry.queries(q)(spark, big).queryExecution.executedPlan.toString
        val ok = !pN.contains("CartesianProduct") &&
          pN.contains("SortMergeJoin") == p1.contains("SortMergeJoin") &&
          shuffles(pN) == shuffles(p1)
        println(s"""{"probe":"${q}_plan_$tag","shuffles":${shuffles(pN)},"ok":$ok}""")
      }
    }

    // The decade probe also re-asserts each sketch's ACCURACY gate at
    // 10× — wall-clock exponents alone would let a sketch get fast by
    // getting wrong. Same bounds as the sf0.01 specs (KmvAccuracySpec,
    // QuantileSampleSpec, the q121 est≥exact guarantee), evaluated on
    // the scaled tables.
    if (decade) {
      def gate(name: String, ok: Boolean, detail: String): Unit =
        println(s"""{"gate":"$name","ok":$ok,"detail":"$detail"}""")

      val kSketch = 256
      // each gate family reads its own scaled table, so a --only filter
      // that never staged it must skip the gate, not crash the probe
      if (needed("lineitem")) {
      val kmvEst = SparkEntry.queries("q119_kmv_distinct")(spark, scaled)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val kmvExact = spark.read.parquet(s"$scaled/lineitem.parquet")
        .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val kmvWorst = kmvExact.map { case (g, n) =>
        math.abs(kmvEst(g) - n) / n.toDouble }.max
      gate(s"q119_kmv_within_3oversqrtk_$tag",
        kmvWorst <= 3.0 / math.sqrt(kSketch), f"max_rel_err=$kmvWorst%.4f")

      // q128: the HLL bound re-asserted on the 10× distinct universe
      // (l_partkey shifts per copy, so exact cardinality really grows
      // 10× — deep inside the raw harmonic-mean branch)
      val hllEst = SparkEntry.queries("q128_hll_distinct")(spark, scaled)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val hllWorst = kmvExact.map { case (g, n) =>
        math.abs(hllEst(g) - n) / n.toDouble }.max
      gate(s"q128_hll_within_3sigma_$tag",
        hllWorst <= 3.0 * 1.04 / math.sqrt(256.0), f"max_rel_err=$hllWorst%.4f")
      }

      if (needed("documents")) {
      // q121: the CMS hard guarantee (est ≥ exact) must hold on every
      // emitted heavy hitter; the measured worst overestimate is
      // reported in units of N/w (the sketch's error scale) so drift
      // is visible even while the hard bound holds
      val hh = SparkEntry.queries("q121_cms_heavy_hitters")(spark, scaled)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val totalToks = spark.read.parquet(s"$scaled/documents.parquet")
        .select(explode(split(trim(col("text")), """\s+""")).as("t")).count()
      val overUnit = totalToks.toDouble / 1024
      val allGe = hh.forall { case (_, exact, est) => est >= exact }
      val worstOver = if (hh.isEmpty) 0.0
        else hh.map { case (_, exact, est) => (est - exact) / overUnit }.max
      gate(s"q121_cms_est_ge_exact_$tag", allGe && hh.nonEmpty,
        f"hitters=${hh.length} worst_overestimate=${worstOver}%.3f N_over_w_units")
      }

      if (needed("lineitem")) {
      // q122: exact CDF at each estimate within 3·√(p(1-p)/k) of p
      val qs = SparkEntry.queries("q122_quantile_sample")(spark, scaled)
        .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
      val li = spark.read.parquet(s"$scaled/lineitem.parquet")
        .select(col("l_returnflag").as("grp"), col("l_extendedprice").as("v"))
        .localCheckpoint()
      val qWorst = qs.map { case (g, (p50, p90)) =>
        val total = li.filter(col("grp") === g).count().toDouble
        def cdf(x: Double) =
          li.filter(col("grp") === g && col("v") <= x).count() / total
        math.max(math.abs(cdf(p50) - 0.5) / (3 * math.sqrt(0.25 / kSketch)),
          math.abs(cdf(p90) - 0.9) / (3 * math.sqrt(0.09 / kSketch)))
      }.max
      gate(s"q122_rank_error_in_bound_$tag", qWorst <= 1.0,
        f"worst_error_over_bound=$qWorst%.3f")
      }

      if (needed("documents_sfx")) {
      // READ-FLOOR GATE (round 17): fold ONE FIXED-SIZE delete batch
      // into the maintained labels at 1× and at 10× corpus and meter
      // the fold's task input bytes. The r16 fold pinned the FULL
      // standing label relation every micro-batch (bytes ∝ corpus —
      // 10× across this decade) plus a corpus-sized labels⋈origOf
      // derivation; the r17 doc-keyed companion index + closure walk
      // make every state read a pruned bucket point read, and with the
      // bucket count following the production rule nb ∝ corpus
      // (constant target bucket SIZE — 64 at 1×, 64·N at N×), a fixed
      // batch's fold bytes stay ~flat while the corpus grows a decade.
      // The SUFFIXED corpus keeps cluster shapes constant (verbatim
      // copies share simhashes and would merge cross-copy cliques,
      // growing the affected set itself — a data effect, not an
      // architecture one).
      def meteredBytes(body: => Unit): Long = {
        val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (e.taskMetrics != null) {
              bytes.addAndGet(e.taskMetrics.inputMetrics.bytesRead); ()
            }
        }
        spark.sparkContext.addSparkListener(l)
        try {
          body
          // the listener bus is async — drain it (not a fixed sleep
          // poll, which undercounts when the bus stalls past one
          // interval on a loaded host)
          org.apache.spark.GraftListenerBridge
            .waitListenerBusEmpty(spark.sparkContext)
        } finally spark.sparkContext.removeSparkListener(l)
        bytes.get
      }
      def labelFoldBytes(dir: String, nb: Int, batch: DataFrame): Long = {
        val st = graft.queries.DedupQueries.ccGateStateDir(spark, dir, nb)
        val root = java.nio.file.Files
          .createTempDirectory("graft_readfloor_").toString
        meteredBytes {
          graft.queries.DedupQueries.componentsCdcStep(st, root, batch, 0L,
            batch.select(col("doc_id"), lit(0L).as("simhash")).limit(0),
            historyPred = lit(true)); ()
        }
      }
      // the q189 twin: the SAME fixed batch through the composed
      // label-fold + manifest-repair step, survivor state staged at the
      // proportional manifest bucket count
      def manifestFoldBytes(dir: String, nb: Int, batch: DataFrame): Long = {
        val cc = graft.queries.DedupQueries.ccGateStateDir(spark, dir, nb)
        val sv = graft.queries.DedupQueries.survivorGateStateDir(spark, dir, cc, nb)
        val root = java.nio.file.Files
          .createTempDirectory("graft_readfloor_m_").toString
        meteredBytes {
          graft.queries.DedupQueries.survivorCdcStep(cc, sv, root,
            batch.withColumn("quality", lit(null).cast("double")), 0L,
            batch.select(col("doc_id"), lit(0L).as("simhash")).limit(0),
            historyPred = lit(true)); ()
        }
      }
      // the fixed batch: the 24 smallest CLUSTERED doc ids of the base
      // corpus — present verbatim (copy 0) in the scaled corpus, where
      // the suffix trick keeps their clusters the same size
      val st1 = graft.queries.DedupQueries.ccGateStateDir(spark, sfDir, 64)
      val fixedBatch = spark.read.parquet(s"$st1/labels")
        .select(col("id").as("doc_id")).orderBy("doc_id").limit(24)
        .select(lit("D").as("op"), col("doc_id"),
          lit(null).cast("long").as("simhash"))
        .localCheckpoint()
      val nbN = (64 * factor).toInt
      val b1 = labelFoldBytes(sfDir, 64, fixedBatch)
      val bN = labelFoldBytes(scaledSfx, nbN, fixedBatch)
      gate(s"q187_readfloor_bytes_flat_$tag",
        b1 > 0 && bN <= b1 * 5 / 2 + (1L << 20),
        f"fixed 24-delete fold bytes_1x=$b1 bytes_$tag=$bN ratio=${bN.toDouble / math.max(b1, 1)}%.2f nb=64->$nbN")
      val m1 = manifestFoldBytes(sfDir, 64, fixedBatch)
      val mN = manifestFoldBytes(scaledSfx, nbN, fixedBatch)
      gate(s"q189_readfloor_bytes_flat_$tag",
        m1 > 0 && mN <= m1 * 5 / 2 + (2L << 20),
        f"fixed 24-delete manifest fold bytes_1x=$m1 bytes_$tag=$mN ratio=${mN.toDouble / math.max(m1, 1)}%.2f nb=64->$nbN")

      // IN-PLACE GROWTH + RE-BUCKETING GATE (round 18): the two gates
      // above prove nb ∝ corpus for FRESHLY STAGED states (64 buckets
      // staged at 1×, 64·N staged at N×). This one proves it for a
      // state that grew IN PLACE: the N× corpus arrives as one CDC
      // APPEND onto the 1×-staged 64-bucket state (standing rows grow
      // ~N× under the original bucket count), the size policy fires,
      // compaction RE-BUCKETS at the staged density
      // (DedupQueries.rescaleBuckets), and the SAME fixed 24-delete
      // batch's composed fold bytes must return to ~flat vs the 1×
      // measurement — without the re-bucket, every "pruned point read"
      // would open 1/64 of an N×-bigger relation and the ratio would
      // track N.
      locally {
        // the fixture's label relation is MBs, so the r19 min-bytes
        // floor would (correctly) veto the re-bucket at toy scale —
        // lower it to 1 byte to SIMULATE production density, so the
        // gate keeps exercising the rescale + flat-read mechanism the
        // floor exists to protect at the small end
        spark.conf.set("graft.gens.minBucketBytes", "1")
        val cc1 = graft.queries.DedupQueries.ccGateStateDir(spark, sfDir, 64)
        val sv1 = graft.queries.DedupQueries
          .survivorGateStateDir(spark, sfDir, cc1, 64)
        val root = java.nio.file.Files
          .createTempDirectory("graft_rebucket_").toString
        val sfx = spark.read.parquet(s"$scaledSfx/documents.parquet")
        val allSigs = sfx.select(col("doc_id"),
          graft.dedup.TextDedup.simHashN(col("text"), 60).as("simhash"))
          .localCheckpoint()
        val basePred = col("doc_id") < docsOff // the 1×-staged coverage
        val appends = sfx.filter(col("doc_id") >= docsOff)
          .select(lit("I").as("op"), col("doc_id"),
            graft.dedup.TextDedup.simHashN(col("text"), 60).as("simhash"),
            (pmod(col("doc_id"), lit(100)) / 100.0).as("quality"))
        graft.queries.DedupQueries.survivorCdcStep(cc1, sv1, root, appends,
          1L, allSigs, historyPred = basePred)
        val fired = graft.queries.DedupQueries.shouldCompact(root, 2L, frac = 0.18)
        if (fired)
          graft.queries.DedupQueries.survivorCompactStep(cc1, sv1, root, 2L,
            allSigs, historyPred = basePred)
        val nbAfter = graft.queries.EventQueries
          .latestViewGen(s"$root/state", Some(3L))
          .flatMap(p => graft.queries.DedupQueries.stateMeta(p, "labels"))
          .map(_._1).getOrElse(-1)
        val bIn = meteredBytes {
          graft.queries.DedupQueries.survivorCdcStep(cc1, sv1, root,
            fixedBatch.withColumn("quality", lit(null).cast("double")), 3L,
            fixedBatch.select(col("doc_id"), lit(0L).as("simhash")).limit(0),
            historyPred = basePred); ()
        }
        // the re-bucket floor scales with what was BUILT: the rescale
        // rule targets nb ≈ 64·growth, and the ±2x hysteresis plus
        // data-dependent label growth mean "at least half the ideal"
        // is the architectural claim (a fixed 10x floor would
        // spuriously fail a supported smaller-factor decade run)
        val nbFloor = (64 * built / 2).toInt
        gate(s"q190_rebucket_inplace_flat_$tag",
          fired && nbAfter >= nbFloor && bIn <= m1 * 5 / 2 + (2L << 20),
          f"policy_fired=$fired nb=64->$nbAfter (floor $nbFloor) fixed " +
            f"24-delete fold bytes_1x=$m1 bytes_inplace=$bIn " +
            f"ratio=${bIn.toDouble / math.max(m1, 1)}%.2f")
        spark.conf.unset("graft.gens.minBucketBytes")
      }
      }

      if (needed("embeddings")) {
      // ANN recall at 10×: the composed IVFADC stack re-gated on a
      // planted-cluster blend of the SCALED corpus (20k vectors, 32
      // clusters of ~625 — every cluster 10× as populous as the 1×
      // PqSpec gate). The probe measures the three-rung ladder that IS
      // the production scaling rule, because each rung's failure is a
      // distinct mechanism (numbers in SCALING.md):
      //   1. raw codes at the 1× settings (nlist=16, 4-bit, r=30):
      //      collapses — tight-cluster members code identically, the
      //      in-cluster ADC order is an id-tiebreak.
      //   2. residual codes under a TOO-COARSE router (nlist=16 < 32
      //      clusters): still collapses — the residual is dominated by
      //      the shared anchor−centroid offset, not member differences.
      //      Residuals alone don't save you; the router must resolve
      //      clusters first.
      //   3. the FAISS-shaped config — nlist ∝ N (64 cells ≈ 2 per
      //      cluster), 8-bit residual codebooks, rerank r = 10·k:
      //      recall ≥ 0.9. This rung is the gate.
      val embBig = graft.ann.Planted.corpus(
        spark.read.parquet(s"$scaled/embeddings.parquet"),
        "vec_id", "embedding", nClusters = 32, eps = 0.15).localCheckpoint()
      val qs50 = embBig.filter(col("vec_id") < 50)
      val exactNN = graft.ann.Knn.bruteForceTopK(
        embBig, qs50, "vec_id", "embedding", 10).localCheckpoint()
      def ivfpqRecall(cents: Seq[(Int, Seq[Double])], cb: graft.ann.Pq.Codebooks,
          probes: Int, r: Int, res: Boolean) =
        graft.ann.Knn.recall(exactNN, graft.ann.Pq.ivfPqTopK(
          embBig, qs50, "vec_id", "embedding", cents, cb,
          k = 10, probes = probes, r = r, residual = res))
      val cents16 = graft.ann.KMeans.fit(embBig, "vec_id", "embedding", k = 16, iters = 2)
      val rRaw = ivfpqRecall(cents16,
        graft.ann.Pq.fit(embBig, "vec_id", "embedding", m = 8, k = 16, iters = 2),
        probes = 4, r = 30, res = false)
      val rResCoarse = ivfpqRecall(cents16,
        graft.ann.Pq.fitResidual(embBig, "vec_id", "embedding", cents16, m = 8, k = 16, iters = 2),
        probes = 4, r = 30, res = true)
      val cents64 = graft.ann.KMeans.fit(embBig, "vec_id", "embedding", k = 64, iters = 2)
      val rProd = ivfpqRecall(cents64,
        graft.ann.Pq.fitResidual(embBig, "vec_id", "embedding", cents64, m = 8, k = 256, iters = 2),
        probes = 16, r = 100, res = true)
      gate(s"q127_ivfpq_residual_recall_planted_$tag", rProd >= 0.9,
        f"nlist64/8-bit-residual/r100 recall@10=$rProd%.4f (ladder: raw 1x-config $rRaw%.4f, residual-under-coarse-router $rResCoarse%.4f)")

      // q140: the k ∝ N cell-count rule must hold the within-cell
      // pairwise term flat PER ROW — Σ|cell|·(|cell|−1)/2 divided by N
      // stays within 3× across the decade (the cell count absorbs the
      // corpus growth; a fixed-k quantizer would grow this ~10×, the
      // quadratic bend q106's fixed 16 cells admit).
      locally {
        def pairsPerRow(dir: String): Double = {
          val emb = spark.read.parquet(s"$dir/embeddings.parquet")
          val n = emb.count()
          // the SHARED rule — the gate must measure the quantizer the
          // shipped q140 actually trains
          val side = graft.dedup.SemDedup.cellSide(n)
          val tq = graft.ann.KMeans.fitTree(emb, "vec_id", "embedding",
            k1 = side, k2 = side, iters = 2)
          // Column `/` is double division; the product is even so the
          // double sum is exact at these magnitudes
          val pairs = graft.dedup.SemDedup
            .assignCellsTree(emb, "vec_id", "embedding", tq)
            .groupBy("cid").count()
            .agg(sum(col("count") * (col("count") - 1) / 2).as("p"))
            .head().getDouble(0)
          pairs / n
        }
        val pp1 = pairsPerRow(sfDir)
        val ppN = pairsPerRow(scaled)
        gate(s"q140_pairs_per_row_flat_$tag", ppN <= 3.0 * pp1,
          f"pairs_per_row_1x=$pp1%.2f ${tag}=$ppN%.2f ratio=${ppN / pp1}%.2f")
      }
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the MULTI-STAGE queries (q94 cva_end_to_end, q104
  * pack_materialize): materializes a 2.5× copy of the fact tables they
  * read and times each query at 1× and 2.5×, printing one JSON line per
  * measurement (ScaleProbe methodology: min of 2 runs, GC settling).
  *
  * The 2.5× tables are built by key-offset unions — two full copies plus
  * a KEY-RANGE half copy (`key ≤ max/2`). The range cut keeps whole
  * id-groups (a parity cut would halve every group's membership and
  * ~triple group count instead); the offset is a multiple of every
  * modulus the q94 fixture derives from `o_orderkey` AND — because the
  * fixture also derives org/boundary patterns from `m = k div 4` — of
  * 4 × lcm(m-moduli): 2⁴·3·5·7·11·13·19 = 4,564,560 (so m shifts by
  * 1,141,140 ≡ 0 mod 420·2717). Each copy therefore replicates the same
  * per-group shapes under fresh ids: group COUNT grows ~2.5×, per-group
  * size does not — the growth profile a cluster sees, not artificially
  * deepened groups. q104's only id derivation is `doc_id DIV 50`, so its
  * offset just needs to be a bin-width multiple past the max id.
  * `nation` stays 1× (dimension).
  *
  * Usage: runMain graft.SpineProbe [sfDir]
  */
object SpineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scaled = s"${System.getProperty("java.io.tmpdir")}/graft_spine_probe"
    val ordersOff = 4564560L // 2^4·3·5·7·11·13·19: > max key, ≡0 mod every k- and 4·m-modulus
    val docsOff = 1000000L // multiple of the DIV-50 bin width, > max doc_id

    def scale(table: String, key: String, off: Long): Unit = {
      val base = spark.read.parquet(s"$sfDir/$table.parquet")
      val half = base.agg(max(col(key)).cast("long")).head().getLong(0) / 2
      base
        .unionByName(base.withColumn(key, col(key) + off))
        // contiguous key RANGE (not parity): whole id-groups survive, so
        // this adds ~half the groups at full per-group membership
        .unionByName(base.filter(col(key) <= half).withColumn(key, col(key) + 2 * off))
        .write.mode("overwrite").parquet(s"$scaled/$table.parquet")
    }
    scale("orders", "o_orderkey", ordersOff)
    scale("documents", "doc_id", docsOff)
    // q119 scans lineitem; the offset keeps l_orderkey groups intact and
    // shifts l_partkey too so the sketch's distinct-value universe (and
    // not just the row count) genuinely grows with scale
    locally {
      val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val half = base.agg(max(col("l_orderkey")).cast("long")).head().getLong(0) / 2
      def copy(off: Long) = base
        .withColumn("l_orderkey", col("l_orderkey") + off)
        .withColumn("l_partkey", col("l_partkey") + off)
      base.unionByName(copy(ordersOff))
        .unionByName(copy(2 * ordersOff).filter(col("l_orderkey") <= half + 2 * ordersOff))
        .write.mode("overwrite").parquet(s"$scaled/lineitem.parquet")
    }
    spark.read.parquet(s"$sfDir/nation.parquet")
      .write.mode("overwrite").parquet(s"$scaled/nation.parquet")

    // q114 (cross-doc span dedup) needs a SECOND documents scaling: the
    // plain copy above duplicates every text verbatim, which flips the
    // workload to its worst case (every position cross-doc duplicated —
    // dupPos becomes corpus-sized) instead of growing a same-shape
    // corpus. Suffixing every token with the copy index keeps each
    // copy's within-copy duplicate structure identical while making the
    // copies' shingle spaces disjoint: duplicated-shingle GROUPS grow
    // 2.5×, per-shingle multiplicity does not — the cluster growth
    // profile. (The verbatim-copy worst case is still covered: the
    // capped occurrence aggregate bounds the buffer either way.)
    val scaledSfx = s"${System.getProperty("java.io.tmpdir")}/graft_spine_probe_sfx"
    locally {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      val half = base.agg(max(col("doc_id")).cast("long")).head().getLong(0) / 2
      def copy(tag: String, off: Long) = base
        .withColumn("doc_id", col("doc_id") + off)
        .withColumn("text", array_join(
          transform(split(trim(col("text")), """\s+"""), t => concat(t, lit(tag))), " "))
      base
        .unionByName(copy("_b", docsOff))
        .unionByName(copy("_c", 2 * docsOff).filter(col("doc_id") <= half + 2 * docsOff))
        .write.mode("overwrite").parquet(s"$scaledSfx/documents.parquet")
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

    val probes = Seq(
      ("q94_cva_end_to_end", scaled),
      ("q104_pack_materialize", scaled),
      ("q113_token_budget", scaled),
      ("q115_bm25", scaled),
      ("q114_dup_spans", scaledSfx),
      ("q116_batched_inference", scaled),
      ("q117_staged_spine_join", scaled),
      ("q118_stream_incremental_neardup", scaled),
      ("q119_kmv_distinct", scaled))
    for ((q, big) <- probes) {
      time(s"${q}_1x", SparkEntry.queries(q)(spark, sfDir))
      time(s"${q}_2.5x", SparkEntry.queries(q)(spark, big))
      // the SCALING.md claim is measured, not assumed: the 2.5× plan must
      // keep the PlanBudget shape (no cross product, no sort-merge join
      // the 1× plan didn't have, shuffle count unchanged vs 1×)
      def shuffles(p: String) = PlanText.shuffles(p)
      val p1 = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
      val p25 = SparkEntry.queries(q)(spark, big).queryExecution.executedPlan.toString
      val ok = !p25.contains("CartesianProduct") &&
        p25.contains("SortMergeJoin") == p1.contains("SortMergeJoin") &&
        shuffles(p25) == shuffles(p1)
      println(s"""{"probe":"${q}_plan_2.5x","shuffles":${shuffles(p25)},"ok":$ok}""")
    }
    spark.stop()
  }
}

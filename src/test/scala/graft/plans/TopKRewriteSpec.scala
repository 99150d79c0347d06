package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RewriteRankFilterToTopK: result-identity vs the sort-based Window plan
  * (rule toggled off), plus plan-shape assertions that the Window is gone. */
class TopKRewriteSpec extends SparkSpec {

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty

  private def hasTopK(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("bounded_top_k")

  /** Runs `build` with the rewrite on and off; both must agree. */
  private def check(build: => DataFrame, expectRewrite: Boolean = true): Unit = {
    val rewritten = build
    if (expectRewrite) {
      assert(!hasWindow(rewritten), s"Window survived:\n${rewritten.queryExecution.optimizedPlan}")
      assert(hasTopK(rewritten), s"no bounded_top_k in:\n${rewritten.queryExecution.optimizedPlan}")
    } else {
      assert(hasWindow(rewritten) && !hasTopK(rewritten),
        s"unexpected rewrite:\n${rewritten.queryExecution.optimizedPlan}")
    }
    spark.conf.set("spark.graft.topk.rewrite.enabled", "false")
    try {
      val baseline = build
      assert(hasWindow(baseline), "toggle failed: baseline plan was rewritten")
      val a = rewritten.collect().map(_.toString).sorted.toSeq
      val b = baseline.collect().map(_.toString).sorted.toSeq
      assert(a == b, s"rewritten != baseline\nrewritten: $a\nbaseline: $b")
    } finally spark.conf.unset("spark.graft.topk.rewrite.enabled")
  }

  private lazy val cust = spark.read.parquet(s"$sf/customer.parquet")
    .select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")

  test("k=1 argmax per key (q07 shape)") {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    check(cust.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn"))
  }

  test("k=3 ascending with tie-break, rn kept in output") {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").asc, col("c_custkey"))
    check(cust.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3))
  }

  test("global top-k (empty partition spec)") {
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
    check(cust.withColumn("rn", row_number().over(w)).filter(col("rn") < 6))
  }

  test("residual conjunct is preserved") {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    check(cust.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4 && col("c_acctbal") > 0))
  }

  test("rn = k (k > 1) keeps only rank k via residual") {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    check(cust.withColumn("rn", row_number().over(w)).filter(col("rn") === 2))
  }

  test("null sort keys follow the window's null ordering") {
    val df = cust.withColumn("maybe",
      when(col("c_custkey") % 3 === 0, col("c_acctbal")))
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("maybe").desc_nulls_last, col("c_custkey"))
    check(df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2))
  }

  test("computed (non-attribute) sort keys become extra struct fields") {
    val w = Window.partitionBy("c_nationkey")
      .orderBy((col("c_acctbal") * -1).asc, col("c_custkey"))
    check(cust.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2))
  }

  test("rank() is NOT rewritten (ties can exceed k)") {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_mktsegment"))
    check(cust.withColumn("rn", rank().over(w)).filter(col("rn") <= 2),
      expectRewrite = false)
  }

  test("k beyond maxK keeps the sort-based plan") {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    check(cust.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1000000), expectRewrite = false)
  }

  test("k × fallbackThreshold beyond the buffered-rows budget keeps the sort plan") {
    // this session sets fallbackThreshold=65536, so the 2^21 product
    // budget admits k ≤ 32: k=33 must fall back to the spill-safe Window
    // even though it is far below maxK
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    check(cust.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 33), expectRewrite = false)
    check(cust.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 32)) // at the boundary the rewrite still fires
  }

  test("partition-key payload columns ride the grouping, not the buffer") {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val out = cust.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val topks = out.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.flatMap(_.collect { case b: BoundedTopK => b })
    }.flatten
    assert(topks.nonEmpty, "no BoundedTopK in the optimized plan")
    val bufferedCols = topks.head.child.children.collect {
      case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
    }
    assert(!bufferedCols.contains("c_nationkey"),
      s"partition key buffered k times per group: $bufferedCols")
    assert(bufferedCols.toSet == Set("c_custkey", "c_acctbal", "c_mktsegment"))
    check(cust.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3))
  }

  test("float partition keys keep each row's own stored value") {
    import spark.implicits._
    // -0.0 and 0.0 land in the same group (grouping and window
    // partitioning normalize floats), but the emitted payload must be
    // each ROW's value — routing a double key through the grouping
    // output would swap both rows' values for the single normalized key
    val df = Seq((-0.0, 1L), (0.0, 2L), (1.5, 3L)).toDF("g", "uid")
    val w = Window.partitionBy("g").orderBy("uid")
    val out = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(hasTopK(out))
    val bits = out.select("g").collect()
      .map(r => java.lang.Double.doubleToRawLongBits(r.getDouble(0))).toSet
    assert(bits.contains(java.lang.Double.doubleToRawLongBits(-0.0)) &&
      bits.contains(java.lang.Double.doubleToRawLongBits(0.0)),
      s"double partition key normalized away a row's own -0.0/0.0: $bits")
  }

  test("single-double payload runs the primitive-heap specialization past the row gate") {
    // (grp, u) with the group key routed around the buffer — the KMV
    // sketch shape. k=64 exceeds the ROW gate (32 under this harness's
    // fallback threshold) but the 8-byte-per-value heap passes the BYTE
    // gate; the result must still match the sort-based Window.
    val df = cust.select(col("c_nationkey"), col("c_acctbal"))
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal"))
    val out = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 64)
    assert(out.queryExecution.optimizedPlan.toString.contains("bounded_top_k_doubles"),
      s"specialization did not fire:\n${out.queryExecution.optimizedPlan}")
    check(df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 64))
    // k × threshold × 8B beyond the byte budget keeps the sort plan:
    // 257 × 65536 × 8 is one value past the default 2^27
    check(df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 257),
      expectRewrite = false)
  }

  test("double specialization: nulls, directions and orderings match the window plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xd0b1e)
    for (trial <- 1 to 6) {
      val n = 150 + rnd.nextInt(300)
      val rows = Seq.tabulate(n) { _ =>
        val key = rnd.nextInt(1 + rnd.nextInt(20))
        // duplicate-heavy domain: tied doubles and null blocks both hit
        // the heap's eviction and the eval interleave
        val d = if (rnd.nextInt(3) == 0) None else Some(rnd.nextInt(12).toDouble / 4)
        (key, d)
      }
      val df = rows.toDF("grp", "score")
      val k = 1 + rnd.nextInt(8)
      val ord = (rnd.nextInt(4): @unchecked) match {
        case 0 => col("score").asc_nulls_first
        case 1 => col("score").asc_nulls_last
        case 2 => col("score").desc_nulls_first
        case 3 => col("score").desc_nulls_last
      }
      val w = Window.partitionBy("grp").orderBy(ord)
      withClue(s"trial $trial (k=$k, ord=$ord): ") {
        val out = df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).drop("rn")
        assert(out.queryExecution.optimizedPlan.toString.contains("bounded_top_k_doubles"))
        // rn dropped: under tied doubles the rank ASSIGNMENT is arbitrary
        // but the surviving multiset is not
        check(df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).drop("rn"))
      }
    }
  }

  test("seeded randomized trials: rewritten == window plan on null-heavy data") {
    // Deterministic fuzz over the rewrite's whole parameter space: random
    // group cardinality (incl. groups smaller than k), nullable sort keys,
    // random k / directions / null orderings / computed-key mix. Any
    // divergence from the sort-based Window plan fails with the trial seed.
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eed)
    for (trial <- 1 to 8) {
      val n = 200 + rnd.nextInt(400)
      val rows = Seq.tabulate(n) { i =>
        val key = rnd.nextInt(1 + rnd.nextInt(30))
        val d = if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(50).toDouble / 4)
        val s = if (rnd.nextInt(5) == 0) None else Some(("w" + rnd.nextInt(20)))
        (key, d, s, i.toLong)
      }
      val df = rows.toDF("grp", "score", "word", "uid")
      val k = 1 + rnd.nextInt(6)
      // leading keys collide freely (small domains, computed-key mix);
      // the final unique uid makes the total order — and thus the
      // expected result — deterministic under ties
      val leading = Seq(
        Some(if (rnd.nextBoolean()) col("score").asc_nulls_first else col("score").desc_nulls_last),
        if (rnd.nextBoolean()) Some(if (rnd.nextBoolean()) col("word").desc_nulls_first
          else col("word").asc_nulls_last) else None,
        if (rnd.nextBoolean()) Some((col("uid") % 7).asc) else None).flatten
      val ord = leading :+ (if (rnd.nextBoolean()) col("uid").asc else col("uid").desc)
      val w = Window.partitionBy("grp").orderBy(ord: _*)
      withClue(s"trial $trial (k=$k): ") {
        check(df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k))
      }
    }
  }

  test("sort-based aggregation fallback (tiny threshold) agrees with the hash path") {
    // A conservative cluster config (or >threshold groups per task) sends
    // ObjectHashAggregate down its sort-based fallback, which drives the
    // buffer through serialize/deserialize + sorted-run merge instead of
    // in-memory update. Same rows must come out.
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    def run() = cust.repartition(4)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val hashPath = run().collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
    try {
      val fallback = run()
      assert(hasTopK(fallback), "rewrite should still fire under the fallback config")
      assert(fallback.collect().map(_.toString).sorted.toSeq == hashPath)
    } finally spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
  }

  test("downstream aggregation over the rewritten output resolves") {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    check(cust.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .groupBy("c_nationkey")
      .agg(round(sum("c_acctbal"), 4).as("top5_bal"), max("rn").as("max_rn")))
  }
}

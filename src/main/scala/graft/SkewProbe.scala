package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures AQE's runtime skew-join split against the same join run
  * with the splitter disabled — the "let the optimizer handle it"
  * counterpart to q60's manual salting, so SCALING.md can say WHEN each
  * applies from numbers rather than folklore.
  *
  * Fixture: a sort-merge join where `hotFrac` of the fact rows carry
  * ONE join key (the q60 shape). With a hash shuffle that key lands in
  * a single reduce task: the stage's wall-clock is that task, and 31 of
  * 32 local cores idle. AQE's OptimizeSkewedJoin splits the oversized
  * partition into advisory-sized slices at RUNTIME (both sides of a SMJ
  * can replay the matching range), which salting achieves only by
  * rewriting the query. The thresholds are lowered here because the
  * bench-scale hot partition is ~MBs (at 100 TB the 256 MB default
  * triggers by itself — the knob moves, the mechanism is identical;
  * SCALING.md "Knobs that change at cluster scale").
  *
  * Salting stays necessary where AQE cannot reach: skewed AGGREGATION
  * keys (no join to split) and broadcast-ineligible skew under
  * non-equi conditions. The probe prints the skew-split evidence from
  * the final adaptive plan (`AQEShuffleRead skewed` nodes) so the speedup
  * is attributable, not coincidental.
  *
  * Usage: runMain graft.SkewProbe [sfDir] [hotFrac]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val hotFrac = args.lift(1).map(_.toDouble).getOrElse(0.3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      // force the sort-merge path: skew split only applies to SMJ, and
      // a broadcast would hide the skew entirely (which is itself the
      // first-line fix when the dim side fits)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "true")
      // bench-scale thresholds (hot partition is MBs here, not the
      // 256 MB production default — see Scaladoc)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      // keep AQE from ALSO coalescing the comparison away
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // q60's skew shape from lineitem ×8 (copies shift l_orderkey so
    // the non-hot key space replicates): hotFrac of rows on key 0, the
    // rest uniform over 10k keys; the hot partition must clear the
    // (lowered) threshold by a wide margin
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val fact = (0 until 8).map(c =>
        base.withColumn("l_orderkey", col("l_orderkey") + c * 4564560L))
      .reduce(_ unionByName _)
      .select(
        when(pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(1000))
          < lit((hotFrac * 1000).toInt), 0L)
          .otherwise(pmod(hash(col("l_partkey")), lit(10000)).cast("long") + 1L)
          .as("k"),
        col("l_extendedprice"), col("l_quantity"),
        col("l_returnflag"), col("l_shipdate"))
    val dim = spark.range(10001).select(col("id").as("k"),
      (col("id") % 97).cast("double").as("rate"))

    def joined = fact.join(dim, "k")
      .select(sum(col("l_extendedprice") * col("rate")).as("s"),
        count(lit(1)).as("n"))

    def run(skewFix: Boolean): (Double, String) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewFix.toString)
      var best = Double.MaxValue
      var plan = ""
      for (_ <- 1 to 3) {
        System.gc()
        val df = joined
        val t0 = System.nanoTime()
        // collect, not a noop write: the write path builds its OWN
        // QueryExecution, leaving df's adaptive plan unexecuted — its
        // toString would show the initial plan with no AQEShuffleRead
        // nodes and the skew evidence would read as absent
        df.collect() // one global-agg row
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best) {
          best = sec
          // keep the plan FROM THE ITERATION THAT PRODUCED best, so the
          // reported time and its skewed_reads evidence are one run
          plan = df.queryExecution.executedPlan.toString
        }
      }
      (best, plan)
    }

    run(skewFix = false) // warm IO + codegen before either timed arm
    val (offSec, offPlan) = run(skewFix = false)
    val (onSec, onPlan) = run(skewFix = true)
    def skewReads(p: String) = p.linesIterator.count(_.trim.endsWith("AQEShuffleRead skewed"))
    if (sys.env.contains("SKEW_DEBUG")) println(onPlan)
    println(s"""{"probe":"skew_join_off","sec":${math.round(offSec * 100) / 100.0},"skewed_reads":${skewReads(offPlan)}}""")
    println(s"""{"probe":"skew_join_on","sec":${math.round(onSec * 100) / 100.0},"skewed_reads":${skewReads(onPlan)},"speedup":${math.round(offSec / onSec * 100) / 100.0}}""")
    spark.stop()
  }
}

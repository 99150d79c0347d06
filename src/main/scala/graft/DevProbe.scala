package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing probe (dev tool): times the stages of the heavier
  * operators through the LIBRARY entry points, so what it measures is
  * what ships. Usage: runMain graft.DevProbe [sfDir]
  *
  * Findings it encodes (see SCALING.md "Round-2 scale lessons"): the
  * signature computation is cheap; self-join expression inlining and
  * per-iteration job overheads are where wall-clock goes.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"[probe] $label n=$n ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    docs.count() // warm IO
    val sig = docs.select(col("doc_id"),
      graft.dedup.TextDedup.simHashN(col("text"), 60).as("simhash"))
    t("sig_only")(sig.count())
    val nd = graft.dedup.TextDedup.simHashNearDup(sig, "doc_id", "simhash", 3)
    t("neardup_full")(nd.count())
    val pairsPinned = nd.localCheckpoint()
    t("cc_from_pinned_pairs")(
      graft.dedup.Components.connectedComponents(pairsPinned, "id_a", "id_b").count())

    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    li.count()
    t("first_window")(graft.operators.Dedup.firstRowPerGroup(li,
      Seq("l_orderkey"),
      Seq(col("l_linenumber").asc, col("l_partkey").asc, col("l_suppkey").asc)).count())
    t("first_aggmin")(graft.operators.Dedup.firstRowPerGroupAgg(li,
      Seq("l_orderkey"),
      Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))).count())

    // q06 group-concat variants: struct-sort (shipped) vs fixed-width
    // string-encode (cheaper comparator, bigger shuffle payload)
    val li6 = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_returnflag")
    def noop(dfl: org.apache.spark.sql.DataFrame): Long = {
      dfl.write.format("noop").mode("overwrite").save(); 1L
    }
    t("gc_struct_sort")(noop(li6.groupBy("l_orderkey").agg(
      concat_ws("; ", transform(
        array_sort(collect_list(struct(
          col("l_linenumber"), col("l_partkey"), col("l_suppkey"), col("l_returnflag")))),
        x => x.getField("l_returnflag"))).as("flags"),
      count(lit(1)).as("n_lines"))))
    t("gc_string_encode")(noop(li6.groupBy("l_orderkey").agg(
      concat_ws("; ", transform(
        sort_array(collect_list(concat(
          lpad(hex(col("l_linenumber")), 16, "0"),
          lpad(hex(col("l_partkey")), 16, "0"),
          lpad(hex(col("l_suppkey")), 16, "0"),
          col("l_returnflag")))),
        x => substring(x, 49, 1))).as("flags"),
      count(lit(1)).as("n_lines"))))
    spark.stop()
  }
}

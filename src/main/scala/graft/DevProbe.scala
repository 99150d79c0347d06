package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing probe (dev tool): breaks a query into stages to find
  * where wall-clock goes. Usage: runMain graft.DevProbe [sfDir] */
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
    t("sig_only_again")(sig.count())
    val banded = sig.repartition(col("doc_id")).select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), 15 * b).bitwiseAND(lit(32767L)).as("chunk"))): _*)).as("bc"))
      .select(col("doc_id"), col("simhash"), col("bc.band"), col("bc.chunk"))
    t("banded")(banded.count())
    val a = banded.select(col("band"), col("chunk"), col("doc_id").as("id_a"), col("simhash").as("__sa"))
    val b = banded.select(col("band"), col("chunk"), col("doc_id").as("id_b"), col("simhash").as("__sb"))
    val joined = a.join(b, Seq("band", "chunk")).filter(col("id_a") < col("id_b"))
    t("join_only")(joined.count())
    t("join_hamming")(joined
      .select(bit_count(col("__sa").bitwiseXOR(col("__sb"))).as("h"))
      .filter(col("h") <= 3).count())
    val nd = graft.dedup.TextDedup.simHashNearDup(sig, "doc_id", "simhash", 3)
    t("neardup_full")(nd.count())

    val pairsPinned = nd.localCheckpoint()
    t("cc_from_pinned_pairs")(
      graft.dedup.Components.connectedComponents(pairsPinned, "id_a", "id_b").count())
    // instrumented copy of the loop
    locally {
      val sym = pairsPinned.select(col("id_a").as("a"), col("id_b").as("b"))
        .union(pairsPinned.select(col("id_b").as("a"), col("id_a").as("b"))).distinct().persist()
      var labels = sym.select(col("a").as("id")).distinct()
        .withColumn("label", col("id")).localCheckpoint()
      var changed = 1L; var i = 0
      while (changed > 0 && i < 20) {
        val t0 = System.nanoTime
        val nbrMin = sym.join(labels.select(col("id").as("b"), col("label")), Seq("b"))
          .groupBy(col("a").as("id")).agg(min("label").as("nbr_label"))
        val stepped = labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"), col("label").as("old_label"),
            least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        val parents = stepped.select(col("id").as("label"), col("label").as("grand"))
        val next = stepped.join(parents, Seq("label"), "left")
          .select(col("id"), col("old_label"),
            least(col("label"), coalesce(col("grand"), col("label"))).as("label"))
          .localCheckpoint()
        changed = next.filter(col("label") =!= col("old_label")).count()
        labels = next.select("id", "label")
        i += 1
        println(f"[probe] cc_iter $i changed=$changed ${(System.nanoTime - t0) / 1e9}%.2f s")
      }
    }

    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    li.count()
    t("first_window")(graft.operators.Dedup.firstRowPerGroup(li,
      Seq("l_orderkey"),
      Seq(col("l_linenumber").asc, col("l_partkey").asc, col("l_suppkey").asc)).count())
    t("first_aggmin")(li.groupBy("l_orderkey")
      .agg(min(struct(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))).as("m"))
      .select(col("l_orderkey"), col("m.l_linenumber"), col("m.l_partkey"), col("m.l_suppkey"))
      .count())
    t("first_window2")(graft.operators.Dedup.firstRowPerGroup(li,
      Seq("l_orderkey"),
      Seq(col("l_linenumber").asc, col("l_partkey").asc, col("l_suppkey").asc)).count())
    t("first_aggmin2")(li.groupBy("l_orderkey")
      .agg(min(struct(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))).as("m"))
      .select(col("l_orderkey"), col("m.l_linenumber"), col("m.l_partkey"), col("m.l_suppkey"))
      .count())
    spark.stop()
  }
}

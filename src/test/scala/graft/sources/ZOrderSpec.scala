package graft.sources

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

/** Z-order layout: interleave correctness, and the pruning effect
  * measured from REAL parquet footers — the count of row groups whose
  * [min,max] stats intersect a 2-D query box, z-ordered vs arrival
  * order. That intersection count IS what a stats-pruning reader scans;
  * asserting it (rather than timing) makes the layout claim exact.
  */
class ZOrderSpec extends SparkSpec {

  test("zvalue2 is the Morton interleave (reference bit twiddle, boundaries included)") {
    import spark.implicits._
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (65535L, 0L),
      (0L, 65535L), (65535L, 65535L), (12345L, 54321L), (70000L, 3L))
    val df = cases.toDF("a", "b")
      .select(ZOrder.zvalue2(col("a"), col("b"), 16).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      cases.map { case (a, b) => ref(a, b, 16) })
    // z-order preserves prefix locality: the quadrant split — points with
    // the same top bit pair land in the same z quarter
    assert(ref(0x8000L, 0x8000L, 16) >> 30 == 3L)
    assert(ref(0x8000L, 0L, 16) >> 30 == 1L)
  }

  /** Row groups of `dir` whose [min,max] on both columns intersect the
    * box — exactly the groups a footer-stats-pruning reader must scan. */
  private def intersecting(dir: String, colA: String, colB: String,
      box: ((Long, Long), (Long, Long))): (Int, Int) = {
    val ((aLo, aHi), (bLo, bHi)) = box
    val conf = spark.sessionState.newHadoopConf()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    var total = 0
    var hit = 0
    files.foreach { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
      try r.getFooter.getBlocks.asScala.foreach { b =>
        def range(name: String): (Long, Long) = {
          val s = b.getColumns.asScala
            .find(_.getPath.toDotString == name).get.getStatistics
          (s.genericGetMin.asInstanceOf[Number].longValue,
            s.genericGetMax.asInstanceOf[Number].longValue)
        }
        val (pa, pb) = (range(colA), range(colB))
        total += 1
        if (pa._1 <= aHi && pa._2 >= aLo && pb._1 <= bHi && pb._2 >= bLo) hit += 1
      } finally r.close()
    }
    (hit, total)
  }

  test("z-ordered row groups: a 2-D box touches a fraction of what arrival order touches") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_extendedprice")
    val root = java.nio.file.Files.createTempDirectory("graft_zorder_spec_").toString
    // tiny row groups so the layout has granularity to prune at this SF
    // (range-exchange sampling can shift file sizes a little run to run;
    // 2 KB groups keep the group count comfortably past the guard)
    val opts = Map("parquet.block.size" -> "2048", "parquet.page.size" -> "512")
    ZOrder.stageZOrdered(li, s"$root/z", "l_partkey", "l_suppkey",
      partitions = 4, options = opts)
    li.repartition(4).write.mode("overwrite").options(opts).parquet(s"$root/arrival")

    // a selective box: ~15% of the partkey domain × ~30% of suppkey
    val box = ((10L, 40L), (2L, 4L))
    val (zHit, zTotal) = intersecting(s"$root/z", "l_partkey", "l_suppkey", box)
    val (aHit, aTotal) = intersecting(s"$root/arrival", "l_partkey", "l_suppkey", box)
    assert(zTotal >= 8 && aTotal >= 8,
      s"fixture too coarse to measure pruning: z=$zTotal arrival=$aTotal row groups")
    // arrival order scatters both keys, so ~every group straddles the
    // box; the z-order must prune strictly — and by at least 2×
    assert(zHit < aHit, s"z-order pruned nothing: z $zHit/$zTotal vs arrival $aHit/$aTotal")
    assert(zHit.toDouble / zTotal <= 0.5 * aHit.toDouble / aTotal,
      s"z-order pruning below 2×: z $zHit/$zTotal vs arrival $aHit/$aTotal")
    // and the rows the layouts return are identical
    val boxed = (df: org.apache.spark.sql.DataFrame) => df
      .filter(col("l_partkey").between(10, 40) && col("l_suppkey").between(2, 4))
      .agg(count(lit(1)), round(sum("l_extendedprice"), 4)).collect().head.toSeq
    assert(boxed(spark.read.parquet(s"$root/z")) == boxed(li))
  }

  test("spine staging: the curated-flows z-order prunes the (id, year) box vs arrival order") {
    // q125's layout measured on the pipeline's OWN data: curated spine
    // (id, year, amountUSD), z-staged with auto-derived bit width, read
    // back under the incremental-reprocessing box cut
    // sf0.01: enough curated rows for the 16 KB row groups to have
    // measurable granularity (sf0.001's ~2k rows fit in ~4 groups)
    val curated = graft.queries.EndToEndQueries.curatedSpine(spark, "/root/testdata/sf0.01")
    val root = java.nio.file.Files.createTempDirectory("graft_zspine_spec_").toString
    val opts = Map("parquet.block.size" -> "2048", "parquet.page.size" -> "512")
    ZOrder.stageZOrdered(curated, s"$root/z", "id", "year",
      partitions = 4, options = opts)
    curated.repartition(4).write.mode("overwrite").options(opts).parquet(s"$root/arrival")

    // q125's read shape: an id window × two of the three years
    val box = ((200L, 900L), (2021L, 2022L))
    val (zHit, zTotal) = intersecting(s"$root/z", "id", "year", box)
    val (aHit, aTotal) = intersecting(s"$root/arrival", "id", "year", box)
    assert(zTotal >= 8 && aTotal >= 8,
      s"fixture too coarse to measure pruning: z=$zTotal arrival=$aTotal row groups")
    assert(zHit < aHit, s"z-order pruned nothing: z $zHit/$zTotal vs arrival $aHit/$aTotal")
    assert(zHit.toDouble / zTotal <= 0.5 * aHit.toDouble / aTotal,
      s"z-order pruning below 2×: z $zHit/$zTotal vs arrival $aHit/$aTotal")
    // and the staged copy returns exactly the curated rows
    val boxed = (df: org.apache.spark.sql.DataFrame) => df
      .filter(col("id").between(200, 900) && col("year").between(2021, 2022))
      .agg(count(lit(1)), round(sum("amountUSD"), 4)).collect().head.toSeq
    assert(boxed(spark.read.parquet(s"$root/z")) == boxed(curated))
  }
}

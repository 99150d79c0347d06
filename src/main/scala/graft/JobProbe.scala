package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall attribution for one named query (dev tool): runs the
  * query once warm (sf0.001) and once timed (target SF) under a
  * listener that records every Spark job's duration, task count, and
  * call site, then prints the timed run's jobs sorted by cost plus the
  * gap between query wall and summed job wall (= driver-side planning /
  * codegen / filesystem time, which no job ever accounts for).
  *
  * Usage: runMain graft.JobProbe <query> [sfDir] [k=v ...]
  */
object JobProbe {
  private final case class J(id: Int, start: Long, var end: Long = -1L,
      var tasks: Int = 0, site: String)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val confs = args.drop(2).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    @volatile var record = false
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (record) {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        val nTasks = e.stageInfos.map(_.numTasks).sum
        val j = J(e.jobId, e.time, site = site); j.tasks = nTasks
        jobs.put(e.jobId, j); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = e.time
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    val fn = SparkEntry.queries(name)
    try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => println(s"[warm] failed: ${e.getMessage}") }
    System.gc()
    record = true
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    record = false
    org.apache.spark.GraftListenerBridge.waitListenerBusEmpty(spark.sparkContext)
    import scala.jdk.CollectionConverters._
    val done = jobs.values.asScala.toSeq.filter(_.end > 0).sortBy(_.start)
    val total = done.map(j => (j.end - j.start) / 1e3).sum
    println(f"[jobprobe] $name wall=$wall%.2f s, jobs=${done.size}, " +
      f"sum(job)=$total%.2f s, driver-gap=${wall - total}%.2f s")
    // timeline: every job in start order (gaps between jobs are driver time)
    var prevEnd = -1L
    done.foreach { j =>
      val gap = if (prevEnd < 0) 0.0 else (j.start - prevEnd) / 1e3
      prevEnd = math.max(prevEnd, j.end)
      println(f"[job] id=${j.id}%4d dur=${(j.end - j.start) / 1e3}%6.3f s " +
        f"gapBefore=$gap%6.3f s tasks=${j.tasks}%4d  ${j.site}")
    }
    val bySite = done.groupBy(_.site).view
      .mapValues(js => (js.size, js.map(j => (j.end - j.start) / 1e3).sum))
      .toSeq.sortBy(-_._2._2)
    println("[jobprobe] by call site:")
    bySite.foreach { case (s, (n, t)) =>
      println(f"[site] $t%7.2f s  n=$n%3d  $s")
    }
    spark.stop()
  }
}

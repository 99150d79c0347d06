package graft

import org.apache.spark.sql.SparkSession

/** Library entry point for users: a session with the engine's
  * recommended configuration and all custom functions registered.
  * Shuffle partitions default to 2× cores locally; on a cluster pass
  * ~2-3× total executor cores (AQE coalesces the excess at runtime).
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(
      math.max(2 * Runtime.getRuntime.availableProcessors(), 8))
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
  }

  def getOrCreate(master: String = "local[*]"): SparkSession = {
    val s = builder(master).getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }
}

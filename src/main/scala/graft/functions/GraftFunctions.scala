package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration: exposes the engine's custom expressions to
  * `spark.sql(...)` users so every capability is reachable from both the
  * DataFrame and SQL APIs. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "osa_distance", exprs => OsaDistance(exprs.head, exprs(1)), "scala_udf")
  }
}

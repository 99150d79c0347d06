package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration: exposes the engine's custom expressions to
  * `spark.sql(...)` users so every capability is reachable from both the
  * DataFrame and SQL APIs. */
object GraftFunctions {
  def register(spark: SparkSession): Unit =
    // Same function set as graft.GraftExtensions (the spark.sql.extensions
    // route): both inject GraftFunctionDefs.all.
    graft.GraftFunctionDefs.all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

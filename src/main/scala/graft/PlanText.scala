package graft

import org.apache.spark.sql.DataFrame

/** The one definition of "what counts as a shuffle" when auditing a
  * physical-plan string — shared by PlanBudgetSpec, BucketingSpec and
  * SpineProbe so a Spark upgrade that changes exchange rendering (or a
  * new exchange kind) is fixed in exactly one place. */
object PlanText {

  private val shuffleRe = "(?<!Broadcast)Exchange (hash|range|SinglePartition)".r
  private val broadcastRe = "BroadcastExchange".r

  def shuffles(plan: String): Int = shuffleRe.findAllIn(plan).length

  def shuffles(df: DataFrame): Int =
    shuffles(df.queryExecution.executedPlan.toString)

  def broadcasts(df: DataFrame): Int =
    broadcastRe.findAllIn(df.queryExecution.executedPlan.toString).length
}

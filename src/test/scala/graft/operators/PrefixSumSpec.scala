package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("exclusive prefix sum matches the single-partition window oracle") {
    val df = (0L until 997L).map(i => (i, (i * 31 % 17) + 1)).toDF("id", "v")
    val got = PrefixSum.exclusive(df, col("id"), col("v"),
        expr("CAST(id DIV 25 AS BIGINT)"), "run")
      .select("id", "run")
    val oracle = df.withColumn("run",
        coalesce(sum("v").over(
          Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "run")
    assert(got.exceptAll(oracle).count() == 0)
    assert(oracle.exceptAll(got).count() == 0)
  }

  test("first row gets 0; total matches sum of all earlier rows") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
    val out = PrefixSum.exclusive(df, col("id"), col("v"), lit(0L), "run")
      .orderBy("id").select("run").as[Long].collect()
    assert(out.toSeq == Seq(0L, 10L, 30L))
  }

  test("bucket granularity does not change the result") {
    val df = (0L until 200L).map(i => (i, i % 7)).toDF("id", "v")
    val fine = PrefixSum.exclusive(df, col("id"), col("v"),
      expr("CAST(id DIV 3 AS BIGINT)"), "run").select("id", "run")
    val coarse = PrefixSum.exclusive(df, col("id"), col("v"),
      expr("CAST(id DIV 90 AS BIGINT)"), "run").select("id", "run")
    assert(fine.exceptAll(coarse).count() == 0)
    assert(coarse.exceptAll(fine).count() == 0)
  }

  test("no single-partition window over the data: the global window only sees bucket subtotals") {
    // the plan must contain a window partitioned by the bucket key (the
    // scalable phase-3) and the only un-partitioned window must consume
    // the aggregate, not the input relation
    val df = (0L until 100L).map(i => (i, 1L)).toDF("id", "v")
    val plan = PrefixSum.exclusive(df, col("id"), col("v"),
      expr("CAST(id DIV 10 AS BIGINT)"), "run").queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.forall(_.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty), "un-partitioned window must sit over the bucket-subtotal aggregate")
  }
}

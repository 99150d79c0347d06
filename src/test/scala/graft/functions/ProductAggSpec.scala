package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductAggSpec extends SparkSpec {
  import spark.implicits._

  test("product aggregate: exact, null-skipping, handles ≤0 (U5)") {
    val df = Seq[java.lang.Double](2.0, 3.0, null, -0.5).toDF("x")
    val out = df.agg(ProductAgg.product(col("x"))).collect()(0).getDouble(0)
    assert(out == -3.0)
  }

  test("product works as a window function: exact windowed cumprod (U5)") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(("a", 1, 2.0), ("a", 2, 3.0), ("a", 3, -4.0)).toDF("k", "t", "x")
    val w = Window.partitionBy("k").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = df.withColumn("cp", ProductAgg.product(col("x")).over(w))
      .orderBy("t").collect().map(_.getDouble(3))
    assert(out.toSeq == Seq(2.0, 6.0, -24.0)) // handles negatives, no log-domain trick
  }

  test("grouped product matches exp(sum(log)) on positive inputs") {
    val df = Seq(("a", 1.1), ("a", 1.2), ("b", 2.0), ("b", 4.0)).toDF("k", "x")
    val viaAgg = df.groupBy("k").agg(ProductAgg.product(col("x")).as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(viaAgg("a") - 1.32) < 1e-12)
    assert(viaAgg("b") == 8.0)
  }
}

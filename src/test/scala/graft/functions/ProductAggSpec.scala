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

  test("grouped product matches exp(sum(log)) on positive inputs") {
    val df = Seq(("a", 1.1), ("a", 1.2), ("b", 2.0), ("b", 4.0)).toDF("k", "x")
    val viaAgg = df.groupBy("k").agg(ProductAgg.product(col("x")).as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(viaAgg("a") - 1.32) < 1e-12)
    assert(viaAgg("b") == 8.0)
  }
}

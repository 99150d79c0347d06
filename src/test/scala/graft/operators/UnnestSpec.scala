package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnnestSpec extends SparkSpec {
  import spark.implicits._

  // FIXTURES.md §2: a flow with two Locations (tests "; " group-concat in
  // array order), one with zero objects of a type, one with one of each.
  private def flows = Seq(
    (1L, "f1", Seq(("Location", "Mali"), ("Location", "Niger"), ("Organization", "UNICEF"))),
    (2L, "f2", Seq(("Organization", "WFP"))),
    (3L, "f3", Seq.empty[(String, String)]))
    .toDF("id", "payload", "objs")
    .withColumn("destinationObjects",
      transform(col("objs"), o => struct(o.getField("_1").as("type"), o.getField("_2").as("name"))))
    .drop("objs")

  test("unnestGroupSame: per-type group-concat in array order, wide columns (S2, code/01:50-72)") {
    val out = Unnest.unnestGroupSame(
      flows, "id", "destinationObjects", "type",
      fields = Seq("name"), types = Seq("Location", "Organization"))
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[String]("destinationObjects_Location.name") == "Mali; Niger")
    assert(byId(1L).getAs[String]("destinationObjects_Organization.name") == "UNICEF")
    assert(byId(2L).getAs[String]("destinationObjects_Organization.name") == "WFP")
    assert(byId(2L).getAs[String]("destinationObjects_Location.name") == null)
    assert(byId(3L).getAs[String]("destinationObjects_Location.name") == null)
    assert(out.count() == 3) // every input row survives
    assert(byId(1L).getAs[String]("payload") == "f1") // scalars ride along
  }

  test("dropAllNaColumns removes types that never occur (code/01:66-71)") {
    // 'Cluster' is in the pivot domain but absent from every row → its
    // grid column is all-null and must be dropped; partially-null
    // columns (Location) stay.
    val out = Unnest.dropAllNaColumns(Unnest.unnestGroupSame(
      flows, "id", "destinationObjects", "type",
      fields = Seq("name"), types = Seq("Location", "Organization", "Cluster")))
    assert(!out.columns.contains("destinationObjects_Cluster.name"))
    assert(out.columns.contains("destinationObjects_Location.name"))
    assert(out.columns.contains("destinationObjects_Organization.name"))
    assert(out.count() == 3)
  }

  test("presentTypes probe ≡ dropAllNaColumns on the array-native grid") {
    // Element-level source frame: one row per nested element.
    val elems = flows.select(col("id"), explode(col("destinationObjects")).as("o"))
      .select(col("o.type").as("type"))
    val domain = Seq("Location", "Organization", "Cluster")
    val keep = Unnest.presentTypes(elems, "type", domain)
    assert(keep == Seq("Location", "Organization")) // absent 'Cluster' dropped, order preserved
    // The restricted-domain grid equals the generic dropAllNaColumns result.
    val viaProbe = Unnest.unnestGroupSameArray(flows, "destinationObjects", "type", Seq("name"), keep)
    val viaCounts = Unnest.dropAllNaColumns(
      Unnest.unnestGroupSameArray(flows, "destinationObjects", "type", Seq("name"), domain))
    assert(viaProbe.columns.toSeq == viaCounts.columns.toSeq)
    val cols = viaProbe.columns.map(c => col(s"`$c`"))
    assert(viaProbe.select(cols: _*).collect().map(_.toString).sorted.toSeq ==
      viaCounts.select(cols: _*).collect().map(_.toString).sorted.toSeq)
  }

  test("unnestGroupSameArray matches the explode/pivot path cell-for-cell") {
    val types = Seq("Location", "Organization", "Cluster")
    val generic = Unnest.unnestGroupSame(
      flows, "id", "destinationObjects", "type", Seq("name"), types)
    val arrayNative = Unnest.unnestGroupSameArray(
      flows, "destinationObjects", "type", Seq("name"), types)
    assert(generic.columns.sorted.toSeq == arrayNative.columns.sorted.toSeq)
    val cols = generic.columns.sorted.map(c => col(s"`$c`"))
    val a = generic.select(cols: _*).collect().map(_.toString).sorted.toSeq
    val b = arrayNative.select(cols: _*).collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // and it is a pure projection: no exchange in the plan
    assert(!arrayNative.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("element order within the concat follows array order, not value order") {
    val df = Seq((1L, Seq(("Location", "Zz"), ("Location", "Aa")))).toDF("id", "objs")
      .withColumn("destinationObjects",
        transform(col("objs"), o => struct(o.getField("_1").as("type"), o.getField("_2").as("name"))))
      .drop("objs")
    val out = Unnest.unnestGroupSame(df, "id", "destinationObjects", "type",
      Seq("name"), Seq("Location"))
    assert(out.collect()(0).getAs[String]("destinationObjects_Location.name") == "Zz; Aa")
  }
}

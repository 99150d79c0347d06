package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit, pmod}

/** The fold family's one-pin discipline rests on two claims about
  * [[DedupQueries.pinMetered]]: (1) the observed collect_set bucket
  * metrics are EXACT — identical to a distinct+collect over the same
  * frame — so driver unions of per-pin sets can replace per-use
  * collects without changing which partitions a fold reads or writes;
  * (2) a statically-empty observed subtree (AQE may replace it with an
  * empty relation and drop CollectMetrics, returning an EMPTY metrics
  * map) resolves to count 0 / empty sets WITHOUT hanging on
  * Observation.get. Both are pinned here against Spark upgrades. */
class PinMeteredSpec extends SparkSpec {
  import spark.implicits._

  test("observed bucket sets equal distinct+collect, counts exact") {
    val rnd = new scala.util.Random(41)
    val rows = Seq.fill(500)((rnd.nextLong().abs % 10000, rnd.nextLong().abs % 997))
    val df = rows.toDF("id", "component")
    val p = DedupQueries.pinMetered(df,
      "ibk" -> pmod(col("id"), lit(16)),
      "cbk" -> pmod(col("component"), lit(64)))
    assert(p.n == 500L)
    def collected(key: String, nb: Int): Seq[Int] =
      df.select(pmod(col(key), lit(nb)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq.sorted
    assert(p.bks("ibk") == collected("id", 16),
      "observed id-bucket set must equal the distinct+collect set")
    assert(p.bks("cbk") == collected("component", 64),
      "observed component-bucket set must equal the distinct+collect set")
    assert(p.bks("missing").isEmpty, "unknown keys default to empty")
    assert(p.df.count() == 500L, "the pin serves the same rows")
  }

  test("runtime-empty and statically-empty frames resolve to zero, no hang") {
    val df = Seq((1L, 2L)).toDF("id", "component")
    // runtime-empty: the filter survives analysis, metrics arrive as 0
    val pr = DedupQueries.pinMetered(df.filter(col("id") > 100),
      "ibk" -> pmod(col("id"), lit(16)))
    assert(pr.n == 0L && pr.bks("ibk").isEmpty)
    // statically-empty: limit(0) lets the optimizer prove emptiness —
    // the AQE-dropped-CollectMetrics path must default, not block
    val ps = DedupQueries.pinMetered(df.limit(0),
      "ibk" -> pmod(col("id"), lit(16)))
    assert(ps.n == 0L && ps.bks("ibk").isEmpty)
  }
}

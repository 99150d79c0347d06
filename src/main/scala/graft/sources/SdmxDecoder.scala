package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S12: OECD SDMX-JSON observation decode (reference
  * code/util_oecd_sdmx.R:8-49): observations arrive as a map
  * `"d0:d1:d2" -> [value, ...]` plus parallel dimension dictionaries;
  * decoding = split the key, index each position into its dictionary.
  *
  * Input contract here: a DataFrame with (obs_key string, obs_value
  * double) plus the dimension value lists. Pure column work — the
  * dictionaries are tiny arrays carried as literals. */
object SdmxDecoder {
  /** @param dims ordered (dimension name, values) — position i of the
    *             ":"-split key indexes values of dims(i). */
  def decode(obs: DataFrame, dims: Seq[(String, Seq[String])]): DataFrame = {
    val parts = split(col("obs_key"), ":")
    val withDims = dims.zipWithIndex.foldLeft(obs) { case (d, ((name, values), i)) =>
      d.withColumn(name,
        element_at(array(values.map(lit): _*), element_at(parts, i + 1).cast("int") + 1))
    }
    withDims.drop("obs_key")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Reshaping operators: melt (R2), union-by-name drift tolerance (R4),
  * proxy-relabel union (R3). All are narrow (no shuffle) — melt is a
  * generator, unions are plan-level concatenation.
  */
object Reshape {
  /** R2: wide→long melt of `valueCols` into (variable, value) rows.
    * Uses explode of a struct array (equivalent to SQL stack()) so it
    * stays in whole-stage codegen. */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String = "variable", valName: String = "value"): DataFrame = {
    val kvs = array(valueCols.map(c =>
      struct(lit(c).as("k"), col(c).cast("double").as("v"))): _*)
    df.select(idCols.map(col) :+ explode(kvs).as("kv"): _*)
      .select(idCols.map(col) :+ col("kv.k").as(varName) :+ col("kv.v").as(valName): _*)
  }

  /** R4: rbindlist(use.names=T, fill=T). */
  def unionByNameFill(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** R3: copy rows of `df` whose `keyCol` matches a proxy source, relabeled
    * to the proxy target (the deflator GBR→AIA idiom, code/03:131-147).
    * `proxies` maps target→source. Originals for targets are dropped first. */
  def proxyRelabelUnion(df: DataFrame, keyCol: String, proxies: Map[String, String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pm = proxies.toSeq.toDF("__target", "__source")
    val cleaned = df.join(broadcast(pm.select(col("__target"))),
      col(keyCol) === col("__target"), "left_anti")
    val copies = df
      .join(broadcast(pm), col(keyCol) === col("__source"))
      .withColumn(keyCol, col("__target"))
      .drop("__target", "__source")
    cleaned.unionByName(copies)
  }
}

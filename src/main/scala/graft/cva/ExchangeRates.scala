package graft.cva

import graft.operators.Joins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** util_exchange_rates.R: build the (iso3 × year) USD exchange-rate
  * panel with source precedence OECD ≻ World Bank ≻ IMF-IFS
  * (code/util_exchange_rates.R:62,77).
  *
  * Shape: J12 scaffold (cross product of the iso and year sets) + one
  * broadcast left join per source + a precedence coalesce — no shuffles
  * beyond the tiny grid build.
  */
object ExchangeRates {

  /** Each source: (iso3, year, value). Output: (iso3, year, value, source). */
  def build(isos: DataFrame, years: DataFrame,
            oecd: DataFrame, wb: DataFrame, ifs: DataFrame): DataFrame = {
    val grid = isos.select("iso3").distinct().crossJoin(years.select("year").distinct())
    def side(df: DataFrame, name: String) =
      broadcast(df.select(col("iso3"), col("year"), col("value").as(s"v_$name")))
    grid
      .join(side(oecd, "oecd"), Seq("iso3", "year"), "left")
      .join(side(wb, "wb"), Seq("iso3", "year"), "left")
      .join(side(ifs, "ifs"), Seq("iso3", "year"), "left")
      .withColumn("value", coalesce(col("v_oecd"), col("v_wb"), col("v_ifs")))
      .withColumn("source",
        when(col("v_oecd").isNotNull, "OECD")
          .when(col("v_wb").isNotNull, "WB")
          .when(col("v_ifs").isNotNull, "IFS"))
      .drop("v_oecd", "v_wb", "v_ifs")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S2 "group-same" JSON unnest (reference code/01_fts_get_flows.R:50-72).
  *
  * The reference takes nested object arrays (sourceObjects /
  * destinationObjects), splits elements by their `type` field, and for
  * each (row, type) group joins every scalar field with "; " into one
  * wide column named `{arrayCol}_{Type}.{field}`.
  *
  * Spark shape: posexplode (keeps JSON element order for the
  * order-sensitive concat, SURVEY A1) → groupBy (id, type) with ordered
  * collect → pivot on type → join back to the scalar columns. One shuffle
  * on the row id; the pivot values must be supplied so the plan is static
  * (no driver-side distinct scan).
  */
object Unnest {
  /** @param df         input with a unique `idCol` and `arrayCol: array<struct<...>>`
    * @param idCol      unique row key
    * @param arrayCol   nested array column
    * @param typeField  struct field to split on (reference: "type")
    * @param fields     struct fields to emit per type
    * @param types      pivot domain (known up front — keeps the plan static)
    */
  def unnestGroupSame(
      df: DataFrame,
      idCol: String,
      arrayCol: String,
      typeField: String,
      fields: Seq[String],
      types: Seq[String]): DataFrame = {
    val exploded = df
      .select(col(idCol), posexplode(col(arrayCol)).as(Seq("__pos", "__obj")))
      .select(col(idCol), col("__pos"),
        col(s"__obj.$typeField").as("__type"),
        struct(fields.map(f => col(s"__obj.$f").as(f)): _*).as("__fields"))
    // ordered "; " concat per (id, type, field), element order = array order
    val fieldAggs = fields.map { f =>
      concat_ws("; ",
        transform(
          array_sort(collect_list(struct(col("__pos"), col(s"__fields.$f").as("v")))),
          x => x.getField("v"))).as(f)
    }
    val grouped = exploded
      .groupBy(col(idCol), col("__type"))
      .agg(fieldAggs.head, fieldAggs.tail: _*)
    val pivoted = grouped
      .groupBy(col(idCol))
      .pivot("__type", types)
      .agg(fields.map(f => first(col(f)).as(f)).head, fields.tail.map(f => first(col(f)).as(f)): _*)
    // pivot names come out as `{type}_{field}` (or `{type}` if 1 field);
    // rename to the reference convention `{arrayCol}_{Type}.{field}`.
    val renamed = types.foldLeft(pivoted) { (acc, t) =>
      fields.foldLeft(acc) { (a, f) =>
        val pivotName = if (fields.size == 1) t else s"${t}_$f"
        a.withColumnRenamed(pivotName, s"${arrayCol}_$t.$f")
      }
    }
    df.drop(arrayCol).join(renamed, Seq(idCol), "left")
  }

  /** Array-native "group-same" unnest: same semantics as
    * [[unnestGroupSame]] when the nested objects already live in ONE
    * `array<struct>` column per row — each output cell is
    * `concat_ws("; ", transform(filter(arr, type=t), _.f))`, i.e. a pure
    * per-row projection.
    *
    * Prefer this form whenever the data arrives nested (the
    * sourceObjects/destinationObjects JSON shape): the explode → groupBy
    * → pivot → self-join of the generic path re-shuffles and re-joins
    * data that never needed to leave its row. At 100 TB this is the
    * difference between a map-only pass and two exchanges plus a join.
    * Element order inside each cell = array order (the reference's JSON
    * order, SURVEY A1) — pre-sort the array if a different order is
    * required. Fields must be string-typed (as in the reference, where
    * unnest runs before type inference).
    *
    * An absent (row, type) group yields NULL (not ""), matching the
    * pivot path; a present group whose field values are all NULL yields
    * "" — concat_ws skips NULLs — also matching.
    */
  def unnestGroupSameArray(
      df: DataFrame,
      arrayCol: String,
      typeField: String,
      fields: Seq[String],
      types: Seq[String]): DataFrame = {
    val wide = types.flatMap { t =>
      val matches = filter(col(arrayCol), x => x.getField(typeField) === lit(t))
      fields.map { f =>
        when(size(matches) > 0,
          concat_ws("; ", transform(matches, x => x.getField(f))))
          .as(s"${arrayCol}_$t.$f")
      }
    }
    val keep = df.columns.filterNot(_ == arrayCol).map(c => col(s"`$c`"))
    df.select(keep ++ wide: _*)
  }

  /** The reference's post-unnest cleanup (code/01_fts_get_flows.R:66-71):
    * drop columns that are entirely NA after the types×fields grid is
    * emitted (a type that never occurs leaves an all-null column).
    *
    * Data-dependent schema ⇒ one extra action: a single partial-agg
    * `count` pass over the frame (one row back to the driver). At scale
    * that is one cheap column-pruned scan of the (already narrow) unnest
    * output — do it once at the source boundary, not per query. */
  def dropAllNaColumns(df: DataFrame): DataFrame = {
    val counts = df.select(df.columns.map(c => count(col(s"`$c`")).as(c)): _*).head()
    val keep = df.columns.filter(c => counts.getAs[Long](c) > 0L)
    df.select(keep.map(c => col(s"`$c`")): _*)
  }

  /** All-NA drop, specialized to the array-native form: a
    * `{arrayCol}_{t}.{f}` cell is NULL iff NO element of type `t` exists
    * in that row (a present group whose fields are all NULL still yields
    * "" — concat_ws skips NULLs). So a grid column is all-NA across the
    * frame iff its type occurs in NO row — and [[dropAllNaColumns]] ∘
    * [[unnestGroupSameArray]] reduces to restricting the pivot domain to
    * the types actually present.
    *
    * That turns the probe from a full re-run of the upstream aggregate
    * (the generic path counts non-nulls over the BUILT grid) into one
    * column-pruned scan of a single source column with a map-side-combine
    * distinct — candidates are the caller's static type list, so at most
    * `types.size` rows ever reach the driver. At 100 TB the generic probe
    * re-executes the shuffle; this one reads one low-cardinality column.
    *
    * @param typeSource  the pre-aggregation frame (any frame holding one
    *                    row per nested element)
    * @param typeCol     element-type column on `typeSource`
    */
  def presentTypes(typeSource: DataFrame, typeCol: String, types: Seq[String]): Seq[String] = {
    val present = typeSource
      .select(col(typeCol))
      .filter(col(typeCol).isin(types: _*)) // bounds the collect at types.size rows
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    types.filter(present)
  }
}

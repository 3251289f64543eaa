package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark SQL lacks (DuckDB ships it as
  * `ASOF JOIN`): for every left row, attach the greatest right
  * timestamp that is ≤ the left row's timestamp, per key.
  *
  * Implementation is the merge-scan shape, not a join: tag both
  * inputs, union them, and carry the most recent right timestamp
  * forward with a running `last(ignoreNulls)` window. One shuffle by
  * key, one sort within partitions — no range-join explosion, no
  * per-row probing, skew-bounded by the hottest key like any window.
  * At 100 TB this is the same plan a sort-merge as-of join would
  * produce, expressed with built-in operators (preference (a) of the
  * custom-operator ladder).
  */
object AsOfJoin {

  /** @param left     rows to enrich
    * @param right    timeline to match against (only `key` + `ts` used)
    * @param key      equi-join column present in both inputs
    * @param ts       event-time column present in both inputs
    * @param asOfCol  output column: right's `ts` as-of left's `ts`
    *                 (null when no right row precedes the left row)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           asOfCol: String = "asof_ts"): DataFrame = {
    val tsType = left.schema(left.schema.fieldIndex(ts)).dataType
    val l = left
      .withColumn("__side", lit(1))
      .withColumn(asOfCol, lit(null).cast(tsType))
    val r = right
      .select(col(key), col(ts))
      .withColumn("__side", lit(0))
      .withColumn(asOfCol, col(ts))
    // right rows sort BEFORE left rows at equal ts → inclusive
    // (right.ts <= left.ts) semantics, matching DuckDB ASOF's `>=`.
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(asOfCol, last(col(asOfCol), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side")
  }
}

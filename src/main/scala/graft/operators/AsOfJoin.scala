package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark SQL lacks (DuckDB ships it as
  * `ASOF JOIN`, pandas as `merge_asof`): for every left row, attach
  * the closest right timestamp on one side of the left row's
  * timestamp, per key. Backward (default) takes the greatest right
  * `ts` ≤ left `ts`; forward takes the smallest right `ts` ≥ left
  * `ts`; an optional tolerance nulls matches further than a horizon
  * (pandas `merge_asof(tolerance=...)`).
  *
  * Implementation is the merge-scan shape, not a join: tag both
  * inputs, union them, and carry the nearest right timestamp with a
  * running `last(ignoreNulls)` window — ascending scan for backward,
  * descending for forward (the same pass over the mirrored order).
  * One shuffle by key, one sort within partitions — no range-join
  * explosion, no per-row probing, skew-bounded by the hottest key
  * like any window. The tolerance is a pure map-side post-filter on
  * the identical plan: zero extra exchanges. `__side` is claimed as a
  * working column name, and a pre-existing left column named
  * `asOfCol` is overwritten — inputs must carry neither. At 100 TB
  * this is the
  * same plan a sort-merge as-of join would produce, expressed with
  * built-in operators (preference (a) of the custom-operator ladder).
  */
object AsOfJoin {

  /** @param left        rows to enrich
    * @param right       timeline to match against (only `key` + `ts` used)
    * @param key         equi-join column present in both inputs
    * @param ts          event-time column present in both inputs
    * @param asOfCol     output column: right's `ts` as-of left's `ts`
    *                    (null when no right row qualifies)
    * @param forward     false = greatest right ts ≤ left ts (default);
    *                    true = smallest right ts ≥ left ts
    * @param toleranceMs when set, matches further than this many
    *                    milliseconds from the left timestamp become
    *                    null (timestamp inputs only)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           asOfCol: String = "asof_ts", forward: Boolean = false,
           toleranceMs: Option[Long] = None): DataFrame = {
    val tsType = left.schema(left.schema.fieldIndex(ts)).dataType
    val l = left
      .withColumn("__side", lit(1))
      .withColumn(asOfCol, lit(null).cast(tsType))
    val r = right
      .select(col(key), col(ts))
      .withColumn("__side", lit(0))
      .withColumn(asOfCol, col(ts))
    // right rows sort BEFORE left rows at equal ts → inclusive
    // (backward: right.ts <= left.ts; forward: right.ts >= left.ts)
    // semantics, matching DuckDB ASOF's >= / <= forms.
    val ord = if (forward) col(ts).desc else col(ts).asc
    val w = Window.partitionBy(col(key))
      .orderBy(ord, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r, allowMissingColumns = true)
      .withColumn(asOfCol, last(col(asOfCol), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side")
    toleranceMs.fold(joined) { tol =>
      // CAST handles TIMESTAMP_NTZ inputs (unix_millis requires TZ;
      // the session runs UTC so the epoch is unambiguous); backticks
      // keep non-bare column names working on this path too
      val diff =
        if (forward)
          s"unix_millis(CAST(`$asOfCol` AS TIMESTAMP)) - unix_millis(CAST(`$ts` AS TIMESTAMP))"
        else
          s"unix_millis(CAST(`$ts` AS TIMESTAMP)) - unix_millis(CAST(`$asOfCol` AS TIMESTAMP))"
      joined.withColumn(asOfCol, when(expr(s"$diff <= ${tol}L"), col(asOfCol)))
    }
  }
}

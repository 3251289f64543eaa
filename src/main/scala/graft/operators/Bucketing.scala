package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffling both sides of a recurring
  * join into the same bucket layout makes every subsequent join on
  * the bucket key shuffle-free — the single biggest repeated-cost
  * saving on a 100 TB fact/fact workload (pay the shuffle once at
  * write time, never at read time).
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (sorted within buckets
    * so merge joins need no sort either).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planned as a
    * zero-exchange sort-merge join when both sides share the layout.
    */
  def cogroupJoin(spark: SparkSession, leftTable: String,
                  rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}

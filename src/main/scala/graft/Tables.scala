package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). All queries receive the sf directory at call
  * time; nothing is cached so each query re-reads with its own
  * pushed-down filters/projections.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; a user-supplied schema reads the raw nanos as
    * long — no session-wide legacy conf mutation — and truncates to
    * microseconds (identical to DuckDB's ns→µs truncation, so oracle
    * parity holds).
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.read.schema(sch).parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** Register all tables as temp views (used by SQL-string queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}

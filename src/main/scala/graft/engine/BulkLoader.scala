package graft.engine

import org.apache.spark.sql.DataFrame

/** C9: seeded bulk loader — mirrors the reference's synthetic
  * `transactions` generator (API/bulk_loader.cpp:25-132): fixed seed
  * 42, same table schema, same value pools and ranges. Unlike the
  * reference (one INSERT statement per row through the string
  * parser), rows flow through the batch write path (C8) in chunks:
  * one lock acquisition and one delta-log fsync per chunk.
  */
object BulkLoader {

  private val Regions = Vector("North", "South", "East", "West", "Central")
  private val Categories = Vector(
    "Electronics", "Software", "Hardware", "Services",
    "Support", "Logistics", "Marketing", "Finance")
  private val Statuses = Vector(
    "completed", "pending", "refunded", "processing", "shipped")

  val CreateSql: String =
    "CREATE TABLE transactions (id INT PRIMARY KEY, region VARCHAR(50), " +
      "category VARCHAR(50), amount DOUBLE, units INT, status VARCHAR(20))"

  /** Load `n` seeded rows into `transactions` (created if absent).
    * Deterministic for a given (n, seed, chunk).
    *
    * @return number of rows inserted
    */
  def load(engine: Engine, n: Int = 1000000, seed: Long = 42L,
           chunk: Int = 10000): Long = {
    engine.sql(CreateSql) // "already exists" tolerated, like the reference
    val rng = new scala.util.Random(seed)
    var inserted = 0L
    var id = 1
    while (id <= n) {
      val hi = math.min(id.toLong + chunk - 1, n.toLong).toInt
      val rows: Seq[Array[Any]] = (id to hi).map { i =>
        Array[Any](
          i,
          Regions(rng.nextInt(Regions.size)),
          Categories(rng.nextInt(Categories.size)),
          math.rint((5.0 + rng.nextDouble() * (9999.99 - 5.0)) * 100) / 100,
          Int.box(1 + rng.nextInt(500)),
          Statuses(rng.nextInt(Statuses.size)))
      }
      inserted += engine.batchPut("transactions", rows).size
      id = hi + 1
    }
    inserted
  }

  /** Load an arbitrary DataFrame — any Spark source: parquet, CSV,
    * JSON, JDBC — into an existing engine table through the batch
    * write path. Columns are matched by name and CAST to the table's
    * declared types; partitions stream to the driver one at a time
    * (the hot store is driver memory by design, SURVEY §3.1), and
    * each chunk lands under one lock + one delta-log fsync.
    *
    * Timestamp sources: the engine's TIMESTAMP is int64 (reference
    * columnar_format.hpp:26 — epoch numbers, not a logical type), so
    * a Spark TIMESTAMP or TIMESTAMP_NTZ source column converts to
    * epoch SECONDS. NTZ needs the explicit hop through TIMESTAMP
    * first (Spark refuses NTZ→BIGINT directly; session-zone
    * interpretation of the wall time, so a UTC session round-trips) —
    * without it, loading the footer-aware events table (which
    * surfaces ts as NTZ for MICROS files) failed analysis.
    *
    * @return number of rows inserted (upserts count once)
    */
  def loadFrom(engine: Engine, table: String, df: DataFrame,
               chunk: Int = 10000): Long = {
    val m = engine.meta(table).getOrElse(
      throw new EngineException(s"Table '$table' does not exist"))
    val srcType = df.schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    val anyNtzHop = m.schema.fields.exists(f =>
      f.dataType == org.apache.spark.sql.types.LongType &&
        srcType.get(f.name.toLowerCase)
          .contains(org.apache.spark.sql.types.TimestampNTZType))
    // the NTZ→TIMESTAMP hop interprets the wall time in the SESSION
    // zone — only a UTC session round-trips the epoch value. Assert it
    // loudly instead of silently shifting every loaded timestamp by
    // the zone offset (the documented convention, now enforced).
    if (anyNtzHop) {
      val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
      require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT",
        s"loading a TIMESTAMP_NTZ source into an epoch column requires a " +
          s"UTC session (spark.sql.session.timeZone = $tz would shift every value)")
    }
    val projected = df.select(m.schema.fields.map { f =>
      val c = org.apache.spark.sql.functions.col(f.name)
      val needsHop = f.dataType == org.apache.spark.sql.types.LongType &&
        srcType.get(f.name.toLowerCase)
          .contains(org.apache.spark.sql.types.TimestampNTZType)
      (if (needsHop) c.cast(org.apache.spark.sql.types.TimestampType) else c)
        .cast(f.dataType)
    }: _*)
    val width = m.cols.size
    var inserted = 0L
    import scala.jdk.CollectionConverters._
    projected.toLocalIterator().asScala.grouped(chunk).foreach { rows =>
      inserted += engine.batchPut(table,
        rows.map(r => Array.tabulate[Any](width)(r.get))).size
    }
    inserted
  }
}

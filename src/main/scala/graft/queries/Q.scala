package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator query: a Spark implementation plus an
  * optional DuckDB-equivalent oracle SQL (omitted for ops that are
  * not SQL-expressible; the driver then records a weaker rows-only
  * check).
  *
  * Oracle-parity conventions used throughout:
  *  - Sums over money/metric doubles go through CAST(x AS DECIMAL)
  *    first: decimal addition is exact and order-independent, so
  *    Spark's partial aggregation and DuckDB's sequential fold give
  *    bit-identical results (no float-rounding tolerance needed).
  *  - Ratios/averages are derived as DOUBLE from exact decimals and
  *    exact counts, so both engines run the same IEEE ops on the
  *    same inputs.
  *  - Every computed column is aliased identically on both sides.
  *  - Timestamp-derived outputs are formatted as strings to avoid
  *    tz-aware vs naive mismatches across engines.
  */
final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object Q {
  def apply(oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(fn, Some(oracle))
  def noOracle(fn: (SparkSession, String) => DataFrame): Q = Q(fn, None)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout codes for multi-dimensional tier
  * clustering — the physical-layout half of the lakehouse OPTIMIZE
  * ZORDER primitive (the query-surface half with its integer-exact
  * DuckDB oracle is q_zorder in queries/Analytics.scala; this object
  * is the engine-write path, where layout quality, not hash parity,
  * is the contract, so normalization runs in plain double math).
  *
  * Shape at scale: [[bounds]] is ONE column-pruned min/max aggregate
  * over the input (parquet footer-served where pushdown applies);
  * [[zcodeColumn]] is a pure map — shift/mask/add arithmetic inside
  * whole-stage codegen, no exchange, no UDF. The physical write that
  * consumes it (`repartitionByRange(zcode)`) is the only shuffle.
  *
  * Dimensions share a 32-bit code budget: 2 cols → 16 bits each,
  * 3 → 10, 4 → 8. Each column min/max-normalizes into its cell grid
  * and the cells bit-interleave (column j takes bit positions
  * i·k + j). Nulls land in cell 0 (they sort first, like parquet
  * stats treat them); a constant column contributes cell 0
  * everywhere and costs nothing.
  *
  * Reference behavior target: the reference's unwired columnar-level
  * layout ambition (StorageEngine/includes/lsm_levels.hpp:84-99);
  * design per the public Delta Lake OPTIMIZE ZORDER recipe.
  */
object ZOrder {

  /** Columns a layout may declare: anything totally ordered by
    * numeric cast (ints, floats, the engine's int64 TIMESTAMP).
    */
  def bitsFor(k: Int): Int = {
    require(k >= 2 && k <= 4,
      s"z-order layout needs 2 to 4 columns, got $k")
    32 / k
  }

  /** One min/max pass over the layout columns (column-pruned — at
    * 100 TB this reads two stats per column, not the corpus, when the
    * source format serves footer aggregates). Bounds from a SUPERSET
    * of the final rows (e.g. pre-LWW-dedup tier unions) are fine:
    * extra versions only widen the range, never corrupt the code.
    */
  def bounds(df: DataFrame, cols: Seq[String]): Map[String, (Double, Double)] = {
    // min/max over FINITE values only: one NaN row would otherwise
    // make hi=NaN (Spark max sorts NaN above everything) and poison
    // scale for every row; infinities would zero it. Non-finite rows
    // still get codes — zcodeColumn maps them to the edge cells.
    val aggs = cols.flatMap { c =>
      val d = col(c).cast("double")
      val fin = when(!isnan(d) &&
        !d.isin(Double.PositiveInfinity, Double.NegativeInfinity), d)
      Seq(min(fin), max(fin))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      val lo = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val hi = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      c -> (lo, hi)
    }.toMap
  }

  /** The interleaved Morton code as a single long Column. Map-only:
    * per column, normalize to a `2^bitsFor(k)`-cell grid (clamped, so
    * bounds from a stale/partial pass still yield a valid code), then
    * interleave bit i of column j into position i·k + j.
    */
  def zcodeColumn(cols: Seq[String], bs: Map[String, (Double, Double)]): Column = {
    val k = cols.size
    val bits = bitsFor(k)
    val cells = 1L << bits
    val normalized = cols.map { c =>
      val (lo, hi) = bs(c)
      if (hi <= lo) lit(0L)
      else {
        val scale = cells.toDouble / (hi - lo)
        val x = col(c).cast("double")
        // null and NaN rows land in cell 0 (they have no order
        // position; parquet stats exclude them too); ±Infinity rides
        // the double-space clamp to the edge cells. Clamp BEFORE the
        // long cast — CAST(NaN/Infinity AS LONG) throws under Spark's
        // default ANSI mode, so the cast must only ever see [0, cells).
        val v = when(x.isNull || isnan(x), lit(lo)).otherwise(x)
        val raw = floor((v - lit(lo)) * lit(scale))
        least(lit((cells - 1).toDouble), greatest(lit(0.0), raw)).cast("long")
      }
    }
    (0 until bits).flatMap { i =>
      normalized.zipWithIndex.map { case (n, j) =>
        shiftleft(shiftright(n, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_ + _)
  }
}

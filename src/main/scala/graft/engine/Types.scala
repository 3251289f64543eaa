package graft.engine

import org.apache.spark.sql.types._

/** Column type system mirroring the reference's declared types
  * (reference includes/columnar_format.hpp:18-27, SQL aliases
  * SQLLayer/includes/schema_registry.hpp:219-239). TIMESTAMP is
  * int64 millis in the reference (columnar_format.hpp:26) and stays
  * LongType here for behavior parity.
  */
sealed abstract class ColType(val sqlName: String, val spark: DataType)
object ColType {
  case object I64  extends ColType("BIGINT", LongType)
  case object I32  extends ColType("INT", IntegerType)
  case object F64  extends ColType("DOUBLE", DoubleType)
  case object F32  extends ColType("FLOAT", FloatType)
  case object Str  extends ColType("VARCHAR", StringType)
  case object Bool extends ColType("BOOLEAN", BooleanType)
  case object Bytes extends ColType("BINARY", BinaryType)
  case object Ts   extends ColType("TIMESTAMP", LongType)

  /** SQL alias → type (schema_registry.hpp:219-239; DECIMAL is lossy,
    * aliased to DOUBLE — query_executor.cpp:799-801).
    */
  def fromSql(name: String): Option[ColType] = name.toUpperCase match {
    case "BIGINT" | "INT64"            => Some(I64)
    case "INT" | "INT32" | "INTEGER"   => Some(I32)
    case "DOUBLE" | "DECIMAL"          => Some(F64)
    case "FLOAT" | "REAL"              => Some(F32)
    case "VARCHAR" | "TEXT" | "CHAR" | "STRING" => Some(Str)
    case "BOOL" | "BOOLEAN"            => Some(Bool)
    case "BLOB" | "BINARY" | "BYTES"   => Some(Bytes)
    case "TIMESTAMP"                   => Some(Ts)
    case _                             => None
  }
}

final case class ColumnDef(name: String, tpe: ColType, notNull: Boolean)

/** Table metadata: exactly one primary key per table — explicit
  * PRIMARY KEY, else first NOT NULL column, else first column
  * (reference query_executor.cpp:326-345).
  */
final case class TableMeta(name: String, cols: Vector[ColumnDef], pk: String) {
  /** Column resolution is case-insensitive everywhere (point lookup,
    * scan predicates, DML, projections) — the reference resolves the
    * PK case-insensitively and we keep one rule for every path.
    */
  val colIndex: Map[String, Int] = cols.map(_.name.toLowerCase).zipWithIndex.toMap
  def indexOf(colName: String): Option[Int] = colIndex.get(colName.toLowerCase)
  val pkIndex: Int = indexOf(pk).get
  def schema: StructType =
    StructType(cols.map(c => StructField(c.name, c.tpe.spark, nullable = !c.notNull && c.name != pk)))
}

/** One MVCC row version: monotonically increasing seq, tombstone for
  * deletes (reference includes/skiplist.hpp:14-26).
  */
final case class RowVersion(seq: Long, tombstone: Boolean, values: Array[Any])

/** SQL-layer result envelope (reference
  * SQLLayer/includes/result_formatter.hpp ResultSet).
  */
final case class ResultSet(
    ok: Boolean,
    headers: Vector[String],
    rows: Vector[Vector[String]],
    rowsAffected: Long = 0L,
    error: String = "") {
  def rowCount: Int = rows.size
}

object ResultSet {
  def err(msg: String): ResultSet = ResultSet(ok = false, Vector.empty, Vector.empty, 0L, msg)
  def affected(n: Long): ResultSet = ResultSet(ok = true, Vector.empty, Vector.empty, n)
}

final class EngineException(msg: String) extends RuntimeException(msg)

/** Aggregate stats for ONE column over the live rows of a cold tier
  * set (A5 — the reference's columnar files carry per-file column
  * stats, columnar_format.hpp:143-191, and hybrid_query_router.hpp:
  * 404-446 sketches a ColumnarAggregator that would answer aggregates
  * from them, but the wiring into SQL was never finished; here it is).
  * Values are in the `cast("double")` domain the SQL aggregate path
  * uses. min/max are NaN when nonNull == 0.
  */
final case class ColAggStats(sum: Double, min: Double, max: Double, nonNull: Long)

/** Whole-table aggregate stats over the cold-only LWW live view:
  * total live rows plus per-column stats, indexed like TableMeta.cols
  * (None for non-numeric columns — the SQL dialect aggregates those
  * as a null literal, a constant needing no stats).
  */
final case class TableAggStats(liveRows: Long, cols: Vector[Option[ColAggStats]])

/** Per-table storage stats (M5 — reference level stats,
  * storage_engine.hpp:517-553).
  */
final case class TableStats(
    name: String,
    hotRows: Int,
    hotVersions: Int,
    hotBytes: Long,
    coldTiers: Int,
    coldBytes: Long,
    /** bytes in cold tiers NOT written under the table's current
      * declared layout token — the z-layout drift bound (0 when no
      * layout is declared). Leveled merges deliberately write
      * pk-sorted tiers, so this grows with ingest between OPTIMIZEs;
      * the incremental OPTIMIZE pays ∝ exactly this figure to clear it.
      */
    unlaidBytes: Long,
    maxFlushedSeq: Long)

/** Engine-wide stats for monitoring / the REST status endpoint
  * (reference StorageEngineStats, API/json_helpers.hpp:73-104).
  */
final case class EngineStats(
    tables: Vector[TableStats],
    totalWrites: Long,
    totalReads: Long,
    totalRangeQueries: Long,
    totalCompactions: Long,
    currentSeq: Long)

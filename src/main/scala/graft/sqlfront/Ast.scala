package graft.sqlfront

/** Statement/expression AST for the reference SQL dialect
  * (SURVEY §2.1-2.2): 8 statement forms, predicates limited to
  * {=, !=, <, <=, >, >=} with AND/OR nesting, literals, exactly one
  * aggregate per SELECT.
  */
sealed trait Literal
object Literal {
  final case class IntLit(v: Long) extends Literal
  final case class FloatLit(v: Double) extends Literal
  final case class StrLit(v: String) extends Literal
  final case class BoolLit(v: Boolean) extends Literal
  case object NullLit extends Literal
}

sealed trait Pred
object Pred {
  /** column <op> literal, either operand order normalized to col-left. */
  final case class Cmp(col: String, op: String, lit: Literal) extends Pred
  final case class And(l: Pred, r: Pred) extends Pred
  final case class Or(l: Pred, r: Pred) extends Pred
}

sealed trait SelectItem
object SelectItem {
  case object Star extends SelectItem
  final case class Col(name: String) extends SelectItem
  /** COUNT/SUM/AVG/MIN/MAX over a column or `*` (COUNT only). */
  final case class Agg(fn: String, col: Option[String]) extends SelectItem
}

sealed trait Stmt
object Stmt {
  final case class ColSpec(name: String, sqlType: String, notNull: Boolean, primaryKey: Boolean)
  final case class CreateTable(table: String, cols: Vector[ColSpec]) extends Stmt
  final case class DropTable(table: String) extends Stmt
  final case class Insert(table: String, cols: Option[Vector[String]], values: Vector[Literal]) extends Stmt
  final case class Select(table: String, items: Vector[SelectItem], where: Option[Pred]) extends Stmt
  final case class Update(table: String, sets: Vector[(String, Literal)], where: Pred) extends Stmt
  final case class Delete(table: String, where: Pred) extends Stmt
  case object ShowTables extends Stmt
  final case class Explain(select: Select) extends Stmt
  final case class Describe(table: String) extends Stmt
  /** OPTIMIZE <table> ZORDER BY (c1, c2[, ...]) [PARTSIZE <bytes>] —
    * the cold-tier layout rewrite (engine extension;
    * Engine.optimizeZorder). PARTSIZE sets the rewrite granularity
    * (persisted with the layout); omitted = the engine default.
    */
  final case class Optimize(table: String, zorderCols: Vector[String],
                            partBytes: Option[Long] = None,
                            autoBytes: Option[Long] = None) extends Stmt
  /** EXPORT <table> TO '<path>' — engine extension: write the merged
    * live snapshot (hot ∪ cold, LWW, tombstones dropped) as parquet
    * at `path`, error-if-exists (Engine.execExport).
    */
  final case class Export(table: String, path: String) extends Stmt
  /** IMPORT <table> FROM '<path>' — engine extension: bulk-load a
    * parquet directory into the table with upsert semantics
    * (BulkLoader.loadFrom; columns matched by name, values coerced).
    */
  final case class Import(table: String, path: String) extends Stmt
  /** SEARCH <table> NEAREST (v1, v2, ...) TOP k [USING exact|lsh|ivf]
    * [VECTOR <col>] — engine extension (r19): cosine top-k similarity
    * search over a table's vector column (VARCHAR of comma-separated
    * floats), routed through engine-owned ANN artifacts with the
    * incremental-fold + staleness discipline of the index tier
    * (Engine.execSearch / AnnSearch). USING omitted = size-routed:
    * exact below AnnSearch.ExactMax rows, LSH above.
    */
  final case class Search(table: String, vec: Vector[Double], topK: Int,
                          method: Option[String] = None,
                          vecCol: Option[String] = None) extends Stmt
}

package graft.sqlfront

import scala.collection.mutable.ArrayBuffer

/** Hand-rolled lexer + recursive-descent parser for the reference
  * dialect (SURVEY §2.1). The grammar is deliberately tiny — single
  * table, no joins/GROUP BY/ORDER BY — and validation rules (WHERE
  * mandatory on UPDATE/DELETE, one aggregate max, supported
  * predicate ops only) are enforced at parse/execute time rather
  * than silently passing rows like the reference's unknown-op
  * fallback (query_executor.cpp:691-693; divergence by design,
  * SURVEY §4.3.5).
  *
  * Errors are reported as `Parse error: <detail>` like the
  * reference surface (Unit_Test2.cpp edge cases).
  */
object Parser {

  final case class ParseException(msg: String) extends RuntimeException(msg)

  private sealed trait Tok
  private case class Ident(s: String) extends Tok
  private case class Num(s: String) extends Tok
  private case class Str(s: String) extends Tok
  private case class Punct(s: String) extends Tok
  private case object EOF extends Tok

  private def lex(input: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (input(i) == '\'') {
            if (i + 1 < n && input(i + 1) == '\'') { sb += '\''; i += 2 }
            else { closed = true; i += 1 }
          } else { sb += input(i); i += 1 }
        }
        if (!closed) throw ParseException("Parse error: unterminated string literal")
        out += Str(sb.toString)
      }
      else if (c.isDigit || (c == '-' && i + 1 < n && input(i + 1).isDigit &&
               (out.isEmpty || (out.last match {
                 case Ident(_) | Num(_) | Str(_) | Punct(")") => false
                 case _ => true })))) {
        val start = i
        if (c == '-') i += 1
        while (i < n && (input(i).isDigit || input(i) == '.')) i += 1
        out += Num(input.substring(start, i))
      }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
        out += Ident(input.substring(start, i))
      }
      else {
        val two = if (i + 1 < n) input.substring(i, i + 2) else ""
        if (two == "!=" || two == "<=" || two == ">=" || two == "<>") {
          out += Punct(if (two == "<>") "!=" else two); i += 2
        } else if ("(),=<>*;".indexOf(c) >= 0) { out += Punct(c.toString); i += 1 }
        else throw ParseException(s"Parse error: unexpected character '$c'")
      }
    }
    out += EOF
    out.toVector
  }

  /** Parse statement 0 only — the reference executes only the first
    * statement of a multi-statement string (query_executor.cpp:29).
    */
  def parse(sql: String): Stmt = new P(lex(sql)).statement()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def fail(msg: String): Nothing = throw ParseException(s"Parse error: $msg")

    private def kw(): String = peek match {
      case Ident(s) => pos += 1; s.toUpperCase
      case t        => fail(s"expected identifier, got $t")
    }
    private def expectKw(k: String): Unit = {
      val got = kw(); if (got != k) fail(s"expected $k, got $got")
    }
    private def ident(): String = peek match {
      case Ident(s) => pos += 1; s
      case t        => fail(s"expected identifier, got $t")
    }
    private def expectPunct(p: String): Unit = peek match {
      case Punct(`p`) => pos += 1
      case t          => fail(s"expected '$p', got $t")
    }
    private def isPunct(p: String): Boolean = peek match {
      case Punct(`p`) => true; case _ => false
    }
    private def isKw(k: String): Boolean = peek match {
      case Ident(s) => s.equalsIgnoreCase(k); case _ => false
    }

    def statement(): Stmt = {
      val s = peek match {
        case Ident(w) => w.toUpperCase match {
          case "CREATE"   => create()
          case "DROP"     => drop()
          case "INSERT"   => insert()
          case "SELECT"   => select()
          case "UPDATE"   => update()
          case "DELETE"   => delete()
          case "SHOW"     => { next(); expectKw("TABLES"); Stmt.ShowTables }
          case "EXPLAIN"  => { next(); select() match { case sel: Stmt.Select => Stmt.Explain(sel) } }
          case "DESCRIBE" | "DESC" => { next(); Stmt.Describe(ident()) }
          case "OPTIMIZE" => optimize()
          case "EXPORT"   => { next(); val t = ident(); expectKw("TO"); Stmt.Export(t, strTok()) }
          case "IMPORT"   => { next(); val t = ident(); expectKw("FROM"); Stmt.Import(t, strTok()) }
          case "SEARCH"   => search()
          case other      => fail(s"unsupported statement '$other'")
        }
        case t => fail(s"unexpected token $t")
      }
      // statement 0 must be complete: trailing tokens WITHOUT a ';'
      // separator (e.g. an unsupported LIMIT/ORDER BY clause) are an
      // error rather than being silently ignored. AFTER a ';', any
      // further input is a subsequent statement, and the reference
      // executes only statement 0 of a multi-statement string
      // (query_executor.cpp:29) — so it is ignored, not rejected.
      if (isPunct(";")) next()
      else peek match {
        case EOF => ()
        case t   => fail(s"unexpected trailing input at $t")
      }
      s
    }

    private def create(): Stmt = {
      next(); expectKw("TABLE")
      val table = ident()
      expectPunct("(")
      val cols = ArrayBuffer.empty[Stmt.ColSpec]
      var done = false
      while (!done) {
        val cname = ident()
        val ctype = kw()
        // optional (n) length — parsed, not enforced (VARCHAR(n) per ref)
        if (isPunct("(")) {
          expectPunct("(")
          peek match { case Num(_) => next(); case t => fail(s"expected length, got $t") }
          expectPunct(")")
        }
        var notNull = false
        var pkFlag = false
        var more = true
        while (more) {
          if (isKw("NOT")) { next(); expectKw("NULL"); notNull = true }
          else if (isKw("PRIMARY")) { next(); expectKw("KEY"); pkFlag = true }
          else more = false
        }
        cols += Stmt.ColSpec(cname, ctype, notNull, pkFlag)
        if (isPunct(",")) next() else done = true
      }
      expectPunct(")")
      Stmt.CreateTable(table, cols.toVector)
    }

    private def drop(): Stmt = { next(); expectKw("TABLE"); Stmt.DropTable(ident()) }

    /** OPTIMIZE <table> ZORDER BY (c1, c2[, ...]) [PARTSIZE <bytes>]
      * [AUTO <bytes>] — AUTO (r19) opts into the self-scheduling
      * incremental fold: once post-flush layout drift crosses the
      * threshold, the engine folds without an admin call.
      */
    private def optimize(): Stmt = {
      next(); val table = ident()
      expectKw("ZORDER"); expectKw("BY"); expectPunct("(")
      val cols = ArrayBuffer(ident())
      while (isPunct(",")) { next(); cols += ident() }
      expectPunct(")")
      def byteCount(clause: String): Long = peek match {
        case Num(s) if s.forall(_.isDigit) && s.toLongOption.isDefined =>
          next(); s.toLong
        case t => fail(s"expected $clause byte count, got $t")
      }
      val partBytes =
        if (isKw("PARTSIZE")) { next(); Some(byteCount("PARTSIZE")) } else None
      val autoBytes =
        if (isKw("AUTO")) { next(); Some(byteCount("AUTO")) } else None
      Stmt.Optimize(table, cols.toVector, partBytes, autoBytes)
    }

    /** SEARCH <table> NEAREST (v1, v2[, ...]) TOP <k>
      * [USING exact|lsh|ivf] [VECTOR <col>] — the similarity-search
      * verb (r19). The vector is a parenthesized list of numeric
      * literals; TOP takes a positive integer; USING names the index
      * route (validated at execute time so the error carries the
      * supported set); VECTOR overrides the default vector column
      * name ("v").
      */
    private def search(): Stmt = {
      next(); val table = ident()
      expectKw("NEAREST"); expectPunct("(")
      def num(): Double = next() match {
        case Num(s) => s.toDouble
        case t      => fail(s"expected a numeric vector component, got $t")
      }
      val vec = ArrayBuffer(num())
      while (isPunct(",")) { next(); vec += num() }
      expectPunct(")")
      expectKw("TOP")
      val k = peek match {
        case Num(s) if s.forall(_.isDigit) && s.toIntOption.exists(_ > 0) =>
          next(); s.toInt
        case t => fail(s"expected a positive TOP k, got $t")
      }
      val method = if (isKw("USING")) { next(); Some(kw().toLowerCase) } else None
      val vecCol = if (isKw("VECTOR")) { next(); Some(ident()) } else None
      Stmt.Search(table, vec.toVector, k, method, vecCol)
    }

    private def insert(): Stmt = {
      next(); expectKw("INTO")
      val table = ident()
      val cols =
        if (isPunct("(")) {
          expectPunct("(")
          val cs = ArrayBuffer(ident())
          while (isPunct(",")) { next(); cs += ident() }
          expectPunct(")")
          Some(cs.toVector)
        } else None
      expectKw("VALUES")
      expectPunct("(")
      val vals = ArrayBuffer(literal())
      while (isPunct(",")) { next(); vals += literal() }
      expectPunct(")")
      Stmt.Insert(table, cols, vals.toVector)
    }

    /** A quoted string operand (EXPORT/IMPORT paths). */
    private def strTok(): String = next() match {
      case Str(s) => s
      case t      => fail(s"expected a quoted path string, got $t")
    }

    private def literal(): Literal = next() match {
      case Num(s) =>
        if (s.contains('.')) Literal.FloatLit(s.toDouble) else Literal.IntLit(s.toLong)
      case Str(s)   => Literal.StrLit(s)
      case Ident(s) if s.equalsIgnoreCase("NULL")  => Literal.NullLit
      case Ident(s) if s.equalsIgnoreCase("TRUE")  => Literal.BoolLit(true)
      case Ident(s) if s.equalsIgnoreCase("FALSE") => Literal.BoolLit(false)
      case t => fail(s"expected literal, got $t")
    }

    private val aggFns = Set("COUNT", "SUM", "AVG", "MIN", "MAX")

    private def select(): Stmt.Select = {
      expectKw("SELECT")
      val items = ArrayBuffer.empty[SelectItem]
      var done = false
      while (!done) {
        if (isPunct("*")) { next(); items += SelectItem.Star }
        else {
          val name = ident()
          if (aggFns.contains(name.toUpperCase) && isPunct("(")) {
            next()
            val arg = if (isPunct("*")) { next(); None } else Some(ident())
            expectPunct(")")
            val fn = name.toUpperCase
            // `*` is only meaningful for COUNT (reference SUM(*) would
            // crash the executor; we reject it up front)
            if (fn != "COUNT" && arg.isEmpty)
              fail(s"$fn(*) is not supported — $fn requires a column argument")
            items += SelectItem.Agg(fn, arg)
          } else items += SelectItem.Col(name)
        }
        if (isPunct(",")) next() else done = true
      }
      expectKw("FROM")
      val table = ident()
      val where = if (isKw("WHERE")) { next(); Some(pred()) } else None
      if (items.count(_.isInstanceOf[SelectItem.Agg]) > 1)
        fail("only one aggregate per query is supported")
      Stmt.Select(table, items.toVector, where)
    }

    private def update(): Stmt = {
      next()
      val table = ident()
      expectKw("SET")
      val sets = ArrayBuffer.empty[(String, Literal)]
      var done = false
      while (!done) {
        val c = ident(); expectPunct("="); sets += (c -> literal())
        if (isPunct(",")) next() else done = true
      }
      if (!isKw("WHERE")) fail("UPDATE requires a WHERE clause")
      next()
      Stmt.Update(table, sets.toVector, pred())
    }

    private def delete(): Stmt = {
      next(); expectKw("FROM")
      val table = ident()
      if (!isKw("WHERE")) fail("DELETE requires a WHERE clause")
      next()
      Stmt.Delete(table, pred())
    }

    // pred := andPred (OR andPred)* ; andPred := atom (AND atom)*
    private def pred(): Pred = {
      var l = andPred()
      while (isKw("OR")) { next(); l = Pred.Or(l, andPred()) }
      l
    }
    private def andPred(): Pred = {
      var l = atom()
      while (isKw("AND")) { next(); l = Pred.And(l, atom()) }
      l
    }
    private def atom(): Pred = {
      if (isPunct("(")) { next(); val p = pred(); expectPunct(")"); p }
      else {
        // col op lit | lit op col (reference accepts both operand orders,
        // query_executor.cpp:603-624)
        val leftIdent: Option[String] = peek match {
          case Ident(s) if !s.equalsIgnoreCase("NULL") &&
            !s.equalsIgnoreCase("TRUE") && !s.equalsIgnoreCase("FALSE") =>
            next(); Some(s)
          case _ => None
        }
        val leftLit: Option[Literal] = if (leftIdent.isEmpty) Some(literal()) else None
        val op = next() match {
          case Punct(o @ ("=" | "!=" | "<" | "<=" | ">" | ">=")) => o
          case Ident(o) => fail(s"unsupported predicate operator '$o'")
          case t => fail(s"expected comparison operator, got $t")
        }
        (leftIdent, leftLit) match {
          case (Some(c), _) => Pred.Cmp(c, op, literal())
          case (_, Some(l)) =>
            val c = ident()
            Pred.Cmp(c, flip(op), l)
          case _ => fail("malformed predicate")
        }
      }
    }
    private def flip(op: String): String = op match {
      case "<" => ">"; case ">" => "<"; case "<=" => ">="; case ">=" => "<="
      case other => other
    }
  }
}

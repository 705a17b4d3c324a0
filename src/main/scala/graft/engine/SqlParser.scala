package graft.engine

import scala.collection.mutable.ArrayBuffer

/** Minimal PG-dialect tokenizer + statement-level parser.
  *
  * Scope mirrors the reference exactly: only CREATE DATABASE / CREATE TABLE
  * / DROP TABLE / INSERT are parsed by our own code (reference parses
  * CREATE TABLE itself at src/sql/postgresql/mod.rs:121-268 and intercepts
  * the DDL/DML plans at src/sql/mod.rs:104-134); every other statement
  * falls through to Spark SQL, as the reference falls through to
  * DataFusion. The reject list is parity with SURVEY §2.C.
  */
object SqlParser {

  sealed trait Tok { def text: String }
  /** Unquoted identifier/keyword, lower-cased (PG folds unquoted idents). */
  final case class Word(text: String) extends Tok
  /** Double-quoted identifier, case preserved. */
  final case class QuotedIdent(text: String) extends Tok
  /** Single-quoted string literal (text excludes quotes, '' unescaped). */
  final case class Str(text: String) extends Tok
  final case class Num(text: String) extends Tok
  final case class Sym(text: String) extends Tok

  /** Token plus its [start, end) character span in the source text —
    * rewrites splice the ORIGINAL text around replaced spans, so string
    * escapes/comments/whitespace are preserved verbatim. */
  final case class Span(tok: Tok, start: Int, end: Int)

  def tokenize(sql: String): Vector[Tok] = tokenizeWithSpans(sql).map(_.tok)

  def tokenizeWithSpans(sql: String): Vector[Span] = {
    val out = ArrayBuffer.empty[Span]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      val start = i
      if (c.isWhitespace) { i += 1 }
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      }
      else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i += 2
      }
      else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done && i < n) {
          val ch = sql.charAt(i)
          if (ch == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') { sb.append('\''); i += 2 }
            else { done = true; i += 1 }
          } else { sb.append(ch); i += 1 }
        }
        out += Span(Str(sb.toString), start, i)
      }
      else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done && i < n) {
          val ch = sql.charAt(i)
          if (ch == '"') {
            if (i + 1 < n && sql.charAt(i + 1) == '"') { sb.append('"'); i += 2 }
            else { done = true; i += 1 }
          } else { sb.append(ch); i += 1 }
        }
        out += Span(QuotedIdent(sb.toString), start, i)
      }
      else if (c.isLetter || c == '_') {
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_' || sql.charAt(i) == '$')) i += 1
        out += Span(Word(sql.substring(start, i).toLowerCase), start, i)
      }
      else if (c.isDigit || (c == '.' && i + 1 < n && sql.charAt(i + 1).isDigit)) {
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.' ||
          sql.charAt(i) == 'e' || sql.charAt(i) == 'E' ||
          ((sql.charAt(i) == '+' || sql.charAt(i) == '-') && i > start &&
            (sql.charAt(i - 1) == 'e' || sql.charAt(i - 1) == 'E')))) i += 1
        out += Span(Num(sql.substring(start, i)), start, i)
      }
      else {
        // multi-char operators we care about keeping intact
        val two = if (i + 1 < n) sql.substring(i, i + 2) else ""
        if (Set("<=", ">=", "<>", "!=", "||", "::", "<=>").exists(_.startsWith(two)) && two.length == 2
          && Set("<=", ">=", "<>", "!=", "||", "::").contains(two)) {
          out += Span(Sym(two), start, i + 2); i += 2
        } else { out += Span(Sym(c.toString), start, i + 1); i += 1 }
      }
    }
    out.toVector
  }

  // ---------- statement model ----------

  sealed trait Statement
  final case class CreateDatabase(name: String, ifNotExists: Boolean) extends Statement
  final case class CreateTable(name: Seq[String], builder: TableDescriptorBuilder, ifNotExists: Boolean)
    extends Statement
  final case class DropTable(name: Seq[String], ifExists: Boolean) extends Statement
  /** `rest` is the source query text (VALUES ... or SELECT ...). */
  final case class Insert(table: Seq[String], columns: Option[Seq[String]], restSql: String) extends Statement
  final case class ShowDatabases() extends Statement
  final case class ShowTables() extends Statement
  final case class Describe(table: Seq[String]) extends Statement
  /** COPY — parsed, then deliberately ignored: the reference treats COPY as
    * a silent no-op (src/sql/postgresql/mod.rs:548,564-566). */
  final case class CopyNoOp() extends Statement
  /** Anything else — passes through to Spark SQL. */
  final case class Query(sql: String) extends Statement

  /** Splits on top-level ';'; exactly one non-empty statement allowed
    * (reference: src/sql/postgresql/mod.rs:103-110). Splitting rides the
    * real tokenizer, so ';' inside string literals AND comments never
    * splits, and a comment-only segment (`SELECT 1; -- note`) counts as
    * empty. The returned statement spans its first to last token, which
    * preserves interior comments verbatim. */
  def singleStatement(sql: String): String = {
    val spans = tokenizeWithSpans(sql)
    val segs = ArrayBuffer.empty[(Int, Int)]
    var first = -1
    var last = -1
    def close(): Unit = { if (first >= 0) segs += ((first, last)); first = -1; last = -1 }
    spans.foreach { sp =>
      if (sp.tok == Sym(";")) close()
      else { if (first < 0) first = sp.start; last = sp.end }
    }
    close()
    segs.length match {
      case 0 => throw SqlError.noStatement
      case 1 => sql.substring(segs.head._1, segs.head._2)
      case _ => throw SqlError.multipleStatements
    }
  }

  def parse(sqlRaw: String): Statement = {
    val sql = singleStatement(sqlRaw)
    new Parse(tokenizeWithSpans(sql), sql).statement()
  }

  private final class Parse(spans: Vector[Span], sql: String) {
    private var pos = 0
    private def peek(k: Int = 0): Option[Tok] = spans.lift(pos + k).map(_.tok)
    private def isWord(k: Int, w: String): Boolean = peek(k).exists {
      case Word(t) => t == w
      case _ => false
    }
    private def next(): Tok = { val t = spans(pos).tok; pos += 1; t }
    private def expectWord(w: String): Unit = next() match {
      case Word(t) if t == w =>
      case other => throw SqlError.invalid(s"expected $w, got ${other.text}")
    }
    private def expectSym(s: String): Unit = next() match {
      case Sym(t) if t == s =>
      case other => throw SqlError.invalid(s"expected $s, got ${other.text}")
    }
    private def ident(): String = next() match {
      case Word(t) => t
      case QuotedIdent(t) => t
      case other => throw SqlError.invalid(s"expected identifier, got ${other.text}")
    }
    private def qualifiedName(): Seq[String] = {
      val parts = ArrayBuffer(ident())
      while (peek().contains(Sym("."))) { next(); parts += ident() }
      parts.toSeq
    }
    private def atEnd: Boolean = pos >= spans.length

    def statement(): Statement = peek() match {
      case Some(Word("create")) => create()
      case Some(Word("drop")) => drop()
      case Some(Word("insert")) => insert()
      case Some(Word("update")) => throw SqlError.unsupported("UPDATE ..")
      case Some(Word("delete")) => throw SqlError.unsupported("DELETE ..")
      case Some(Word("copy")) => CopyNoOp()
      case Some(Word("show")) if isWord(1, "databases") => ShowDatabases()
      case Some(Word("show")) if isWord(1, "tables") => ShowTables()
      case Some(Word("describe")) => next(); Describe(qualifiedName())
      case _ => Query(sql)
    }

    private def create(): Statement = {
      expectWord("create")
      peek() match {
        case Some(Word("or")) => throw SqlError.unsupported("CREATE OR REPLACE TABLE ..")
        case Some(Word("temporary")) | Some(Word("temp")) | Some(Word("global")) | Some(Word("local")) =>
          throw SqlError.unsupported("CREATE [ GLOBAL | LOCAL ] { TEMPORARY | TEMP } TABLE ..")
        case Some(Word("external")) => throw SqlError.unsupported("CREATE EXTERNAL TABLE ..")
        case Some(Word("view")) => throw SqlError.unsupported("CREATE VIEW ..")
        case Some(Word("schema")) => throw SqlError.unsupported("CREATE SCHEMA ..")
        case Some(Word("index")) | Some(Word("unique")) => throw SqlError.unsupported("CREATE INDEX ..")
        case Some(Word("function")) => throw SqlError.unsupported("CREATE FUNCTION ..")
        case Some(Word("database")) =>
          next()
          val ine = ifNotExists()
          CreateDatabase(ident(), ine)
        case Some(Word("table")) =>
          next()
          createTable()
        case other => throw SqlError.unsupported(s"CREATE ${other.map(_.text).getOrElse("")} ..")
      }
    }

    private def ifNotExists(): Boolean =
      if (isWord(0, "if") && isWord(1, "not") && isWord(2, "exists")) { pos += 3; true } else false
    private def ifExists(): Boolean =
      if (isWord(0, "if") && isWord(1, "exists")) { pos += 2; true } else false

    private def drop(): Statement = {
      expectWord("drop")
      peek() match {
        case Some(Word("table")) =>
          next()
          val ie = ifExists()
          DropTable(qualifiedName(), ie)
        case Some(Word("database")) => throw SqlError.unsupported("DROP DATABASE ..")
        case Some(Word("view")) => throw SqlError.unsupported("DROP VIEW ..")
        case Some(Word("schema")) => throw SqlError.unsupported("DROP SCHEMA ..")
        case Some(Word("function")) => throw SqlError.unsupported("DROP FUNCTION ..")
        case other => throw SqlError.unsupported(s"DROP ${other.map(_.text).getOrElse("")} ..")
      }
    }

    private def insert(): Statement = {
      expectWord("insert")
      expectWord("into")
      val table = qualifiedName()
      // optional column list — only when followed by VALUES/SELECT/( later;
      // a '(' here is the column list iff its members are bare identifiers
      // followed by ')' then VALUES/SELECT
      var columns: Option[Seq[String]] = None
      if (peek().contains(Sym("("))) {
        val save = pos
        next()
        val cols = ArrayBuffer(ident())
        while (peek().contains(Sym(","))) { next(); cols += ident() }
        if (peek().contains(Sym(")"))) {
          next()
          columns = Some(cols.toSeq)
        } else pos = save
      }
      if (atEnd) throw SqlError.invalid("INSERT without source")
      // remainder of the original text is the source query (VALUES/SELECT);
      // the token's recorded span gives the exact offset, comments included
      val restStart = spans(pos).start
      peek() match {
        case Some(Word("values")) | Some(Word("select")) | Some(Sym("(")) | Some(Word("with")) =>
          Insert(table, columns, sql.substring(restStart))
        case Some(Word("default")) => throw SqlError.unsupported("INSERT .. DEFAULT VALUES")
        case other => throw SqlError.invalid(s"INSERT source ${other.map(_.text).getOrElse("")}")
      }
    }

    // ---------- CREATE TABLE ----------

    /** PG DDL type → kind mapping (reference: src/sql/postgresql/mod.rs:149-184). */
    private def dataType(): (Boolean, ColumnTypeKind, Option[Int]) = {
      import ColumnTypeKind._
      val w = ident()
      w match {
        case "boolean" | "bool" => (false, BooleanKind, None)
        case "text" => (false, StringKind, None)
        case "int" | "int4" | "integer" => (false, Int32Kind, None)
        case "smallint" | "int2" => (false, Int16Kind, None)
        case "bigint" | "int8" => (false, Int64Kind, None)
        case "smallserial" | "serial2" => (true, Int16Kind, None)
        case "serial" | "serial4" => (true, Int32Kind, None)
        case "bigserial" | "serial8" => (true, Int64Kind, None)
        case "real" | "float4" => (false, Float32Kind, None)
        case "float8" => (false, Float64Kind, None)
        case "double" =>
          if (isWord(0, "precision")) { next(); (false, Float64Kind, None) }
          else throw SqlError.unsupported("data type double")
        case "bytea" => (false, BytesKind, None)
        case "varchar" => (false, StringKind, varcharLength())
        case "character" =>
          if (isWord(0, "varying")) { next(); (false, StringKind, varcharLength()) }
          else throw SqlError.unsupported("data type character")
        case other => throw SqlError.unsupported(s"data type $other")
      }
    }

    private def varcharLength(): Option[Int] = {
      if (!peek().contains(Sym("("))) return None
      next()
      val len = next() match {
        case Num(t) => t.toInt
        case Word("max") => throw SqlError.invalid("varchar(MAX)")
        case other => throw SqlError.invalid(s"varchar length ${other.text}")
      }
      peek() match {
        case Some(Word("characters")) | Some(Word("octets")) =>
          throw SqlError.invalid("character length units")
        case _ =>
      }
      expectSym(")")
      Some(len)
    }

    private def createTable(): Statement = {
      val ine = ifNotExists()
      val name = qualifiedName()
      if (!peek().contains(Sym("(")))
        throw SqlError.invalid(s"no columns in creating table ${name.mkString(".")}")
      next()
      val b = new TableDescriptorBuilder(name.last)
      var first = true
      while (!peek().contains(Sym(")"))) {
        if (!first) expectSym(",")
        first = false
        peek() match {
          case Some(Word("constraint")) | Some(Word("primary")) | Some(Word("unique")) |
               Some(Word("foreign")) | Some(Word("check")) =>
            tableConstraint(b)
          case _ => columnDef(b)
        }
      }
      expectSym(")")
      if (!atEnd) throw SqlError.unsupported(s"CREATE TABLE trailing clause ${peek().map(_.text).getOrElse("")}")
      CreateTable(name, b, ine)
    }

    private def columnDef(b: TableDescriptorBuilder): Unit = {
      val colName = ident()
      val (serial, kind, maxLen) = dataType()
      b.addColumn(colName, kind, maxLen)
      var done = false
      // options loop below; serial applied last, mirroring the reference's
      // column_builder.set_serial(serial) after the options loop
      while (!done && !atEnd && !peek().contains(Sym(",")) && !peek().contains(Sym(")"))) {
        peek() match {
          case Some(Word("not")) if isWord(1, "null") => pos += 2; b.setNullable(false)
          case Some(Word("null")) => next(); b.setNullable(true)
          case Some(Word("primary")) => next(); expectWord("key"); b.addPrimaryIndex(None, Seq(colName))
          case Some(Word("unique")) =>
            next()
            // column-level UNIQUE has no NULLS DISTINCT option in the
            // reference's parser path; defaults to NULLS DISTINCT
            b.addUniqueIndex(None, Seq(colName), nullsDistinct = true)
          case Some(Word("default")) => throw SqlError.unimplemented("DEFAULT expr")
          case Some(Word("references")) => throw SqlError.unsupported("CREATE TABLE .. FOREIGN KEY ..")
          case Some(Word("check")) => throw SqlError.unsupported("CREATE TABLE .. (column_name .. CHECK ..) ..")
          case Some(Word("collate")) => throw SqlError.unsupported("CREATE TABLE table_name (column_name .. COLLATE ..")
          case Some(Word("generated")) => throw SqlError.unsupported("CREATE TABLE .. (column_name .. GENERATED ..)")
          case Some(other) => throw SqlError.unsupported(s"option: ${other.text}")
          case None => done = true
        }
      }
      b.setSerial(serial)
    }

    private def tableConstraint(b: TableDescriptorBuilder): Unit = {
      var cname: Option[String] = None
      if (isWord(0, "constraint")) { next(); cname = Some(ident()) }
      peek() match {
        case Some(Word("primary")) =>
          next(); expectWord("key")
          b.addPrimaryIndex(cname, columnList())
        case Some(Word("unique")) =>
          next()
          var nullsDistinct = true
          if (isWord(0, "nulls")) {
            next()
            if (isWord(0, "not")) { next(); nullsDistinct = false }
            expectWord("distinct")
          }
          b.addUniqueIndex(cname, columnList(), nullsDistinct)
        case Some(Word("foreign")) => throw SqlError.unsupported("FOREIGN KEY")
        case Some(Word("check")) => throw SqlError.unsupported("CHECK")
        case other => throw SqlError.unsupported(s"constraint ${other.map(_.text).getOrElse("")}")
      }
    }

    private def columnList(): Seq[String] = {
      expectSym("(")
      val cols = ArrayBuffer(ident())
      while (peek().contains(Sym(","))) { next(); cols += ident() }
      expectSym(")")
      cols.toSeq
    }
  }
}

package graft.sources

import java.sql.{Connection, Driver, DriverPropertyInfo, ResultSet, SQLException, SQLFeatureNotSupportedException, Types}
import java.util.Properties
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** A MySQL-shaped in-process JDBC endpoint — the second real JDBC
  * dialect family (reference: `presto-mysql/src/main/java/com/facebook/
  * presto/plugin/mysql/MySqlClientModule.java` over
  * `presto-base-jdbc/.../JdbcClient.java`), closing the one
  * environment-blocked gap the round-11 audit left: Derby exercises the
  * base-jdbc MECHANICS (predicate/aggregate/limit/TopN/offset
  * pushdown), but dialect DIVERGENCE — identifier quoting, write-side
  * type mapping, read-side type inference incl. the unsigned family —
  * needs a second dialect, and no mysql/H2/SQLite jar ships in this
  * zero-egress distribution.
  *
  * DOCUMENTED SUBSTITUTION (the [[KafkaLog]]/[[RedisStore]] pattern):
  * the wire+server half is replaced by [[MySqlStore]], a JVM-wide
  * store whose surface is a real `java.sql.Driver` accepting
  * `jdbc:mysql://graft-shim/...` URLs. Because the URL is genuinely
  * `jdbc:mysql:`, the code under test is SPARK'S OWN
  * `org.apache.spark.sql.jdbc.MySQLDialect` — not a re-implementation:
  *
  *   - '''Write-side type mapping''': Spark's CREATE TABLE arrives with
  *     the dialect's MySQL DDL (`LONGTEXT`, `BIT(1)`, `TINYINT`,
  *     `DOUBLE PRECISION`, ...); the store parses and RECORDS it (the
  *     gate asserts the exact DDL that crossed the wire).
  *   - '''Read-side type inference''': the store's ResultSetMetaData
  *     answers with MySQL type names / JDBC codes / signedness, so
  *     `MySQLDialect.getCatalystType` + the JdbcUtils defaults make the
  *     real divergence calls — BIT(1)→boolean, BIT(8)→binary,
  *     TINYINT→byte, FLOAT(REAL)→float, INT UNSIGNED→bigint,
  *     BIGINT UNSIGNED→decimal(20,0), LONGTEXT→string.
  *   - '''Identifier quoting''': every statement arrives
  *     backtick-quoted; the statement log is the suite's lock.
  *   - '''Pushdown''': the store executes the exact SQL Spark's JDBC
  *     source generates — compiled predicates (incl. LIKE from
  *     startsWith/endsWith/contains), grouped aggregates
  *     (MIN/MAX/SUM/COUNT/AVG + the variance family the dialect
  *     declares pushable), ORDER BY ... LIMIT/OFFSET — via [[MiniSql]],
  *     a small evaluator covering precisely the grammar the JDBC source
  *     emits and FAILING LOUDLY on anything outside it.
  *
  * Scale stance: at 100 TB against a real MySQL-family store the wire
  * half changes, nothing above it does — quoting, type mapping, and the
  * pushdown surface are exactly what these gates pin.
  */
object MySqlStore extends ShimBackend {

  /** One column as the remote engine models it (drives RSMD answers);
    * shared with the Postgres shim ([[ShimModel]]). */
  type ColDef = ShimModel.ColDef
  val ColDef = ShimModel.ColDef
  type MTable = ShimModel.MTable

  override def who: String = "graft-mysql"
  override def quote: Char = '`'
  override def escapeBackslashInLiterals: Boolean = true
  override def productName: String = "MySQL"
  override def productVersion: String = "8.0.0-graft-shim"
  override def majorVersion: Int = 8
  override def minorVersion: Int = 0

  private[graft] val tables = new ConcurrentHashMap[String, MTable]()

  /** Every SQL text that crossed the shim boundary — the suite's lock
    * on what Spark's dialect actually generated (quoting, clauses). */
  override val statementLog = new ConcurrentLinkedQueue[String]()

  /** Recorded CREATE TABLE column DDL per table — the write-side
    * type-mapping proof (e.g. "l_comment LONGTEXT"). */
  override val ddlLog = new ConcurrentHashMap[String, String]()

  override def drop(name: String): Unit = {
    tables.remove(name.toLowerCase)
    ddlLog.remove(name.toLowerCase)
  }

  def clearAll(): Unit = {
    tables.clear(); ddlLog.clear(); statementLog.clear()
  }

  /** Seed a table directly with MySQL-typed columns — the out-of-band
    * path for read-side inference gates (an UNSIGNED column can only
    * exist in a table MySQL itself created). */
  override def create(name: String, cols: Seq[ColDef]): Unit =
    tables.put(name.toLowerCase, new MTable(cols))

  override def insert(name: String, values: Seq[Any]): Unit = {
    val t = table(name)
    require(values.length == t.columns.length, "graft-mysql: arity")
    t.synchronized { t.rows += values.toArray }
  }

  override def table(name: String): MTable = {
    val t = tables.get(name.toLowerCase)
    if (t == null)
      throw new SQLException(s"Table '$name' doesn't exist", "42S02", 1146)
    t
  }

  /** MySQL DDL type → column model; the inverse of what the dialect's
    * getJDBCType emitted (probed empirically against Spark 4.1). */
  override def ddlType(name: String, ddl: String,
      nullable: Boolean): ColDef = {
    val up = ddl.trim.toUpperCase
    def c(tn: String, jt: Int, p: Int, s: Int = 0, signed: Boolean = true) =
      ColDef(name, tn, jt, p, s, signed, nullable)
    val DecimalRe = """DECIMAL\((\d+),(\d+)\)""".r
    val BitRe = """BIT\((\d+)\)""".r
    up match {
      case "LONGTEXT" => c("LONGTEXT", Types.LONGVARCHAR, Int.MaxValue)
      case BitRe(n) => c(s"BIT", Types.BIT, n.toInt)
      case "TINYINT" => c("TINYINT", Types.TINYINT, 3)
      case "SMALLINT" => c("SMALLINT", Types.SMALLINT, 5)
      case "INTEGER" | "INT" => c("INT", Types.INTEGER, 10)
      case "INT UNSIGNED" | "INTEGER UNSIGNED" =>
        c("INT UNSIGNED", Types.INTEGER, 10, signed = false)
      case "BIGINT" => c("BIGINT", Types.BIGINT, 19)
      case "BIGINT UNSIGNED" =>
        c("BIGINT UNSIGNED", Types.BIGINT, 20, signed = false)
      case "FLOAT" => c("FLOAT", Types.REAL, 12)
      case "DOUBLE PRECISION" | "DOUBLE" => c("DOUBLE", Types.DOUBLE, 22)
      case "BLOB" => c("BLOB", Types.BLOB, Int.MaxValue)
      case "TIMESTAMP" => c("TIMESTAMP", Types.TIMESTAMP, 19)
      case "DATE" => c("DATE", Types.DATE, 10)
      case DecimalRe(p, s) => c(s"DECIMAL", Types.DECIMAL, p.toInt, s.toInt)
      case "TEXT" => c("TEXT", Types.LONGVARCHAR, 65535)
      case other => throw new SQLException(
        s"graft-mysql shim: unmapped DDL type '$other' for '$name'")
    }
  }
}

/** Evaluator for exactly the SQL Spark's JDBC source generates against
  * a shimmed dialect URL (MySQL or PostgreSQL — the [[ShimBackend]]
  * supplies the per-dialect knobs). Anything outside that grammar
  * throws — the shim must never guess. */
private[sources] object MiniSql {

  import ShimModel._

  // ---------- tokenizer ----------
  sealed trait Tok
  final case class TIdent(s: String) extends Tok // quoted or bare
  final case class TNum(s: String) extends Tok
  final case class TStr(s: String) extends Tok
  final case class TPunct(s: String) extends Tok
  final case class TParam(idx: Int) extends Tok

  def tokenize(sql: String,
      escapeBackslash: Boolean = true,
      identQuote: Char = '`'): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    var params = 0
    val n = sql.length
    while (i < n) {
      val ch = sql.charAt(i)
      if (ch.isWhitespace) i += 1
      else if (ch == identQuote) { // the BACKEND's ident quote only:
        // MySQL's default sql_mode reads double-quoted text as a STRING
        // literal, so accepting `"` as an ident quote under the MySQL
        // dialect would silently mis-parse; an off-dialect quote char
        // falls through to TPunct and the parser rejects it loudly.
        val j = sql.indexOf(ch, i + 1)
        if (j < 0) throw new SQLException(s"unterminated $ch in: $sql")
        out += TIdent(sql.substring(i + 1, j)); i = j + 1
      }
      else if (ch == '\'') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done) {
          if (i >= n) throw new SQLException(s"unterminated ' in: $sql")
          val c = sql.charAt(i)
          if (c == '\'' && i + 1 < n && sql.charAt(i + 1) == '\'') {
            sb += '\''; i += 2
          } else if (c == '\\' && escapeBackslash && i + 1 < n) {
            sb += sql.charAt(i + 1); i += 2 // MySQL escapes \ and '
          } else if (c == '\'') { done = true; i += 1 }
          else { sb += c; i += 1 }
        }
        out += TStr(sb.toString)
      }
      else if (ch.isDigit ||
          (ch == '.' && i + 1 < n && sql.charAt(i + 1).isDigit)) {
        val j0 = i
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.' ||
          sql.charAt(i) == 'E' || sql.charAt(i) == 'e' ||
          ((sql.charAt(i) == '-' || sql.charAt(i) == '+') && i > j0 &&
            (sql.charAt(i - 1) == 'E' || sql.charAt(i - 1) == 'e'))))
          i += 1
        out += TNum(sql.substring(j0, i))
      }
      else if (ch.isLetter || ch == '_') {
        val j0 = i
        while (i < n && (sql.charAt(i).isLetterOrDigit ||
          sql.charAt(i) == '_')) i += 1
        out += TIdent(sql.substring(j0, i))
      }
      else if (ch == '?') { out += TParam(params); params += 1; i += 1 }
      else {
        val two = if (i + 1 < n) sql.substring(i, i + 2) else ""
        if (two == "<=" || two == ">=" || two == "<>" || two == "!=") {
          out += TPunct(two); i += 2
        } else { out += TPunct(ch.toString); i += 1 }
      }
    }
    out.result()
  }

  // ---------- AST ----------
  sealed trait Expr
  final case class Col(name: String) extends Expr
  final case class Lit(v: Any) extends Expr
  final case class Param(idx: Int) extends Expr
  final case class Cmp(op: String, l: Expr, r: Expr) extends Expr
  final case class Arith(op: String, l: Expr, r: Expr) extends Expr
  final case class AndE(l: Expr, r: Expr) extends Expr
  final case class OrE(l: Expr, r: Expr) extends Expr
  final case class NotE(e: Expr) extends Expr
  final case class IsNull(e: Expr, negated: Boolean) extends Expr
  final case class InE(e: Expr, vals: Seq[Expr], negated: Boolean) extends Expr
  final case class LikeE(e: Expr, pattern: Expr, escape: Option[String],
      negated: Boolean) extends Expr
  /** CAST(e AS type) — Spark's V2ExpressionSQLBuilder wraps integral
    * args of the variance/stddev family in CAST(... AS DOUBLE
    * PRECISION), so the pushed aggregate grammar includes it. Only the
    * numeric targets Spark generates are accepted (loud otherwise). */
  final case class CastE(e: Expr, to: String) extends Expr
  final case class Agg(fn: String, arg: Option[Expr], distinct: Boolean)
      extends Expr
  case object Star extends Expr
  final case class CaseWhen(branches: Seq[(Expr, Expr)], orElse: Option[Expr])
      extends Expr

  final case class OrderKey(e: Expr, asc: Boolean, nullsFirst: Boolean)
  /** One projection item: the expression plus its optional alias (the
    * JOIN-pushdown builder aliases collision columns, `id AS id_1`). */
  final case class Item(e: Expr, alias: Option[String])

  /** FROM sources: a base table, a parenthesized derived table with an
    * alias (`(SELECT ...) join_subquery_0`), or an equi/theta join of
    * two sources — exactly the shapes Spark's JDBC join pushdown
    * generates (JDBCScanBuilder.getJoinPushdownJdbcSQLBuilder). */
  sealed trait Source
  final case class TableRef(name: String) extends Source
  final case class SubSelect(sel: Select, alias: Option[String])
      extends Source
  final case class JoinSrc(left: Source, right: Source, on: Expr,
      joinType: String) extends Source

  /** `sample` = (percent, seed): the TABLESAMPLE BERNOULLI clause
    * PostgresDialect pushes (`getTableSample`); applied to the base
    * rows BEFORE the WHERE, as SQL defines it. */
  final case class Select(items: Seq[Item], from: Source,
      where: Option[Expr], groupBy: Seq[Expr], orderBy: Seq[OrderKey],
      limit: Option[Int], offset: Option[Int],
      sample: Option[(Double, Option[Long])] = None)

  /** Column scope a row is evaluated against (a base table's columns
    * or a derived/joined source's output). Duplicate names keep the
    * FIRST index — the pushdown builder aliases collisions away. */
  final class Scope(val columns: Seq[ColDef]) {
    val colIdx: Map[String, Int] =
      columns.map(_.name.toLowerCase).zipWithIndex.reverse.toMap
  }

  // incl. the T-SQL spellings MsSqlServerDialect compiles the variance
  // family into (VAR/VARP/STDEV/STDEVP)
  private val AggFns = Set("MIN", "MAX", "SUM", "COUNT", "AVG",
    "VAR_POP", "VAR_SAMP", "STDDEV_POP", "STDDEV_SAMP",
    "VAR", "VARP", "STDEV", "STDEVP")

  /** Canonical aggregate name (T-SQL aliases fold in). */
  private def canonAgg(fn: String): String = fn match {
    case "VAR" => "VAR_SAMP"
    case "VARP" => "VAR_POP"
    case "STDEV" => "STDDEV_SAMP"
    case "STDEVP" => "STDDEV_POP"
    case other => other
  }

  // ---------- parser ----------
  final class P(toks: Vector[Tok], sql: String,
      who: String = "graft-mysql") {
    var pos = 0
    def atEnd: Boolean = pos == toks.length
    def peek: Option[Tok] = toks.lift(pos)
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def fail(msg: String): Nothing =
      throw new SQLException(s"$who shim cannot parse ($msg): $sql")
    def isKw(t: Tok, kw: String): Boolean = t match {
      case TIdent(s) => s.equalsIgnoreCase(kw)
      case _ => false
    }
    def atKw(kw: String): Boolean = peek.exists(isKw(_, kw))
    def eatKw(kw: String): Unit =
      if (atKw(kw)) pos += 1 else fail(s"expected $kw")
    def tryKw(kw: String): Boolean =
      if (atKw(kw)) { pos += 1; true } else false
    def atPunct(p: String): Boolean = peek.contains(TPunct(p))
    def eatPunct(p: String): Unit =
      if (atPunct(p)) pos += 1 else fail(s"expected '$p'")
    def tryPunct(p: String): Boolean =
      if (atPunct(p)) { pos += 1; true } else false

    def parseSelect(): Select = {
      val s = parseSelectInner()
      if (pos != toks.length) fail(s"trailing tokens at $pos")
      s
    }

    // keywords that may follow a source — never its alias
    private val PostSourceKws = Set("WHERE", "GROUP", "ORDER", "LIMIT",
      "OFFSET", "INNER", "LEFT", "RIGHT", "JOIN", "ON", "TABLESAMPLE")

    private def parseSourceUnit(): Source =
      if (tryPunct("(")) {
        val inner = parseSelectInner()
        eatPunct(")")
        val alias = peek match {
          case Some(TIdent(a))
            if !PostSourceKws.contains(a.toUpperCase) =>
            pos += 1; Some(a)
          case _ => None
        }
        SubSelect(inner, alias)
      } else TableRef(parseTableRef())

    private def parseSource(): Source = {
      var left = parseSourceUnit()
      var done = false
      while (!done) {
        if (tryKw("INNER")) {
          eatKw("JOIN")
          val r = parseSourceUnit(); eatKw("ON")
          left = JoinSrc(left, r, parseExpr(), "INNER")
        } else if (atKw("JOIN")) {
          pos += 1
          val r = parseSourceUnit(); eatKw("ON")
          left = JoinSrc(left, r, parseExpr(), "INNER")
        } else if (tryKw("LEFT")) {
          tryKw("OUTER"); eatKw("JOIN")
          val r = parseSourceUnit(); eatKw("ON")
          left = JoinSrc(left, r, parseExpr(), "LEFT")
        } else done = true
      }
      left
    }

    def parseSelectInner(): Select = {
      eatKw("SELECT")
      // T-SQL's limit precedes the projection: SELECT TOP (n) ...
      // (MsSqlServerDialect.getLimitClause — the only shimmed dialect
      // without a trailing LIMIT clause)
      var topLimit: Option[Int] = None
      if (tryKw("TOP")) {
        eatPunct("(")
        topLimit = Some(intTok())
        eatPunct(")")
      }
      val items = Seq.newBuilder[Item]
      items += parseItem()
      while (tryPunct(",")) items += parseItem()
      eatKw("FROM")
      val from = parseSource()
      val sample: Option[(Double, Option[Long])] =
        if (tryKw("TABLESAMPLE")) {
          eatKw("BERNOULLI")
          eatPunct("(")
          val pct = next() match {
            case TNum(s) => s.toDouble
            case other => fail(s"expected sample percent, got $other")
          }
          eatPunct(")")
          val seed = if (tryKw("REPEATABLE")) {
            eatPunct("(")
            val v = next() match {
              case TNum(s) => s.toLong
              case other => fail(s"expected sample seed, got $other")
            }
            eatPunct(")")
            Some(v)
          } else None
          Some((pct, seed))
        } else None
      val where = if (tryKw("WHERE")) Some(parseExpr()) else None
      val groupBy = Seq.newBuilder[Expr]
      if (tryKw("GROUP")) {
        eatKw("BY")
        groupBy += parseExpr()
        while (tryPunct(",")) groupBy += parseExpr()
      }
      val orderBy = Seq.newBuilder[OrderKey]
      if (tryKw("ORDER")) {
        eatKw("BY")
        def key(): OrderKey = {
          val e = parseExpr()
          val asc = if (tryKw("DESC")) false else { tryKw("ASC"); true }
          var nullsFirst = asc // SQL default: asc->nulls first(ish)
          if (tryKw("NULLS")) {
            if (tryKw("FIRST")) nullsFirst = true
            else { eatKw("LAST"); nullsFirst = false }
          }
          OrderKey(e, asc, nullsFirst)
        }
        orderBy += key()
        while (tryPunct(",")) orderBy += key()
      }
      var limit: Option[Int] = topLimit
      var offset: Option[Int] = None
      while (atKw("LIMIT") || atKw("OFFSET")) {
        if (tryKw("LIMIT")) limit = Some(intTok())
        else { eatKw("OFFSET"); offset = Some(intTok()) }
      }
      Select(items.result(), from, where, groupBy.result(),
        orderBy.result(), limit, offset, sample)
    }

    private def intTok(): Int = next() match {
      case TNum(s) => s.toInt
      case other => fail(s"expected int, got $other")
    }

    private def parseTableRef(): String = {
      // `db`.`tbl` or bare segments; key on the LAST segment
      var last = next() match {
        case TIdent(s) => s
        case other => fail(s"bad table ref $other")
      }
      while (tryPunct(".")) last = next() match {
        case TIdent(s) => s
        case other => fail(s"bad table ref $other")
      }
      last
    }

    private def parseItem(): Item =
      if (tryPunct("*")) Item(Star, None)
      else {
        val e = parseExpr()
        val alias =
          if (tryKw("AS")) next() match {
            case TIdent(a) => Some(a)
            case other => fail(s"bad alias $other")
          }
          else None
        Item(e, alias)
      }

    // precedence: OR < AND < NOT < cmp/IS/IN/LIKE < add < mul < unary
    def parseExpr(): Expr = parseOr()
    private def parseOr(): Expr = {
      var l = parseAnd()
      while (tryKw("OR")) l = OrE(l, parseAnd())
      l
    }
    private def parseAnd(): Expr = {
      var l = parseNot()
      while (tryKw("AND")) l = AndE(l, parseNot())
      l
    }
    private def parseNot(): Expr =
      if (tryKw("NOT")) NotE(parseNot()) else parseCmp()
    private def parseCmp(): Expr = {
      var l = parseAdd()
      var done = false
      while (!done) {
        peek match {
          case Some(TPunct(op))
            if Set("=", "<", ">", "<=", ">=", "<>", "!=").contains(op) =>
            pos += 1
            l = Cmp(if (op == "!=") "<>" else op, l, parseAdd())
          case Some(t) if isKw(t, "IS") =>
            pos += 1
            val neg = tryKw("NOT")
            eatKw("NULL")
            l = IsNull(l, neg)
          case Some(t) if isKw(t, "IN") =>
            pos += 1
            eatPunct("(")
            val vs = Seq.newBuilder[Expr]
            vs += parseExpr()
            while (tryPunct(",")) vs += parseExpr()
            eatPunct(")")
            l = InE(l, vs.result(), negated = false)
          case Some(t) if isKw(t, "NOT") &&
              toks.lift(pos + 1).exists(x => isKw(x, "IN") ||
                isKw(x, "LIKE")) =>
            pos += 1
            if (tryKw("IN")) {
              eatPunct("(")
              val vs = Seq.newBuilder[Expr]
              vs += parseExpr()
              while (tryPunct(",")) vs += parseExpr()
              eatPunct(")")
              l = InE(l, vs.result(), negated = true)
            } else {
              eatKw("LIKE")
              val p = parseAdd()
              val esc = if (tryKw("ESCAPE")) Some(strTok()) else None
              l = LikeE(l, p, esc, negated = true)
            }
          case Some(t) if isKw(t, "LIKE") =>
            pos += 1
            val p = parseAdd()
            val esc = if (tryKw("ESCAPE")) Some(strTok()) else None
            l = LikeE(l, p, esc, negated = false)
          case _ => done = true
        }
      }
      l
    }
    private def strTok(): String = next() match {
      case TStr(s) => s
      case other => fail(s"expected string, got $other")
    }
    private def parseAdd(): Expr = {
      var l = parseMul()
      var done = false
      while (!done) peek match {
        case Some(TPunct(op)) if op == "+" || op == "-" =>
          pos += 1; l = Arith(op, l, parseMul())
        case _ => done = true
      }
      l
    }
    private def parseMul(): Expr = {
      var l = parseUnary()
      var done = false
      while (!done) peek match {
        case Some(TPunct(op)) if op == "*" || op == "/" || op == "%" =>
          pos += 1; l = Arith(op, l, parseUnary())
        case _ => done = true
      }
      l
    }
    private def parseUnary(): Expr = peek match {
      case Some(TPunct("-")) => pos += 1; Arith("-", Lit(0L), parseUnary())
      case _ => parsePrimary()
    }
    private def parsePrimary(): Expr = next() match {
      case TNum(s) =>
        if (s.contains('.') || s.toUpperCase.contains('E'))
          Lit(java.lang.Double.valueOf(s))
        else Lit(java.lang.Long.valueOf(s))
      case TStr(s) => Lit(s)
      case TParam(i) => Param(i)
      case TPunct("(") =>
        val e = parseExpr(); eatPunct(")"); e
      case TPunct("*") => Star
      case t @ TIdent(name) =>
        val up = name.toUpperCase
        if (up == "NULL") Lit(null)
        else if (up == "TRUE") Lit(java.lang.Boolean.TRUE)
        else if (up == "FALSE") Lit(java.lang.Boolean.FALSE)
        else if (up == "CASE") parseCase()
        else if (atPunct("(")) {
          pos += 1 // (
          if (up == "CAST") {
            val e = parseExpr()
            eatKw("AS")
            val parts = Seq.newBuilder[String]
            var doneT = false
            while (!doneT) peek match {
              case Some(TIdent(s)) => pos += 1; parts += s.toUpperCase
              case _ => doneT = true
            }
            eatPunct(")")
            CastE(e, parts.result().mkString(" "))
          } else if (AggFns.contains(up)) {
            if (tryPunct("*")) {
              eatPunct(")")
              Agg(up, None, distinct = false)
            } else {
              val distinct = tryKw("DISTINCT")
              val arg = parseExpr()
              eatPunct(")")
              Agg(up, Some(arg), distinct)
            }
          } else fail(s"unsupported function $name")
        }
        else if (atPunct(".")) {
          // qualified column: keep the last segment
          var last = name
          while (tryPunct(".")) last = next() match {
            case TIdent(s) => s
            case other => fail(s"bad qualified ident $other")
          }
          Col(last)
        }
        else Col(name)
      case other => fail(s"unexpected token $other")
    }
    private def parseCase(): Expr = {
      val branches = Seq.newBuilder[(Expr, Expr)]
      while (tryKw("WHEN")) {
        val c = parseExpr(); eatKw("THEN"); val v = parseExpr()
        branches += ((c, v))
      }
      val orElse = if (tryKw("ELSE")) Some(parseExpr()) else None
      eatKw("END")
      CaseWhen(branches.result(), orElse)
    }
  }

  // ---------- evaluation ----------
  private def num(v: Any): java.math.BigDecimal = v match {
    case null => null
    case b: java.math.BigDecimal => b
    case b: Boolean => if (b) java.math.BigDecimal.ONE
      else java.math.BigDecimal.ZERO
    case n: Byte => java.math.BigDecimal.valueOf(n.toLong)
    case n: Short => java.math.BigDecimal.valueOf(n.toLong)
    case n: Int => java.math.BigDecimal.valueOf(n.toLong)
    case n: Long => java.math.BigDecimal.valueOf(n)
    case n: Float => new java.math.BigDecimal(n.toDouble)
    case n: Double => new java.math.BigDecimal(n)
    case n: Number => new java.math.BigDecimal(n.toString)
    case other =>
      throw new SQLException(s"jdbc shim: not numeric: $other")
  }

  private def cmpVals(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
    case _ => num(a).compareTo(num(b))
  }

  private def likeRegex(pattern: String, escape: Option[String]): String = {
    val esc = escape.map(_.charAt(0))
    val sb = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (esc.contains(c) && i + 1 < pattern.length) {
        sb.append(java.util.regex.Pattern.quote(
          pattern.charAt(i + 1).toString)); i += 2
      } else {
        c match {
          case '%' => sb.append(".*")
          case '_' => sb.append(".")
          case o => sb.append(java.util.regex.Pattern.quote(o.toString))
        }
        i += 1
      }
    }
    sb.toString
  }

  /** Three-valued eval: null propagates; predicates keep rows iff TRUE. */
  def eval(e: Expr, t: Scope, row: Array[Any], params: Array[Any]): Any =
    e match {
      case Lit(v) => v
      case Param(i) => params(i)
      case Col(c) =>
        val i = t.colIdx.getOrElse(c.toLowerCase,
          throw new SQLException(s"Unknown column '$c'"))
        row(i)
      case Arith(op, l, r) =>
        val (a, b) = (eval(l, t, row, params), eval(r, t, row, params))
        if (a == null || b == null) null
        else {
          val (x, y) = (num(a), num(b))
          op match {
            case "+" => x.add(y)
            case "-" => x.subtract(y)
            case "*" => x.multiply(y)
            case "/" => x.divide(y, java.math.MathContext.DECIMAL64)
            case "%" => x.remainder(y)
          }
        }
      case CastE(inner, to) =>
        val v = eval(inner, t, row, params)
        if (v == null) null
        else to match {
          case "DOUBLE" | "DOUBLE PRECISION" | "FLOAT" | "REAL" |
               "FLOAT8" | "FLOAT4" => // FLOAT8: the Postgres spelling
            java.lang.Double.valueOf(num(v).doubleValue())
          case "BIGINT" | "SIGNED" | "SIGNED INTEGER" =>
            java.lang.Long.valueOf(num(v).longValue())
          case other => throw new SQLException(
            s"jdbc shim: unsupported CAST target '$other' — " +
              "extend the shim if Spark's pushdown now generates it")
        }
      case Cmp(op, l, r) =>
        val (a, b) = (eval(l, t, row, params), eval(r, t, row, params))
        if (a == null || b == null) null
        else {
          val c = cmpVals(a, b)
          java.lang.Boolean.valueOf(op match {
            case "=" => c == 0
            case "<>" => c != 0
            case "<" => c < 0
            case "<=" => c <= 0
            case ">" => c > 0
            case ">=" => c >= 0
          })
        }
      case AndE(l, r) =>
        (eval(l, t, row, params), eval(r, t, row, params)) match {
          case (java.lang.Boolean.FALSE, _) => java.lang.Boolean.FALSE
          case (_, java.lang.Boolean.FALSE) => java.lang.Boolean.FALSE
          case (java.lang.Boolean.TRUE, java.lang.Boolean.TRUE) =>
            java.lang.Boolean.TRUE
          case _ => null
        }
      case OrE(l, r) =>
        (eval(l, t, row, params), eval(r, t, row, params)) match {
          case (java.lang.Boolean.TRUE, _) => java.lang.Boolean.TRUE
          case (_, java.lang.Boolean.TRUE) => java.lang.Boolean.TRUE
          case (java.lang.Boolean.FALSE, java.lang.Boolean.FALSE) =>
            java.lang.Boolean.FALSE
          case _ => null
        }
      case NotE(x) => eval(x, t, row, params) match {
        case null => null
        case b: java.lang.Boolean => java.lang.Boolean.valueOf(!b)
        case o => throw new SQLException(s"NOT on non-boolean $o")
      }
      case IsNull(x, neg) =>
        java.lang.Boolean.valueOf(
          (eval(x, t, row, params) == null) != neg)
      case InE(x, vals, neg) =>
        val a = eval(x, t, row, params)
        if (a == null) null
        else {
          var anyNull = false
          var hit = false
          vals.foreach { v =>
            val b = eval(v, t, row, params)
            if (b == null) anyNull = true
            else if (cmpVals(a, b) == 0) hit = true
          }
          if (hit) java.lang.Boolean.valueOf(!neg)
          else if (anyNull) null
          else java.lang.Boolean.valueOf(neg)
        }
      case LikeE(x, p, esc, neg) =>
        val a = eval(x, t, row, params)
        val pat = eval(p, t, row, params)
        if (a == null || pat == null) null
        else java.lang.Boolean.valueOf(
          a.toString.matches(likeRegex(pat.toString, esc)) != neg)
      case CaseWhen(branches, orElse) =>
        branches.collectFirst {
          case (c, v) if eval(c, t, row, params) ==
            java.lang.Boolean.TRUE => eval(v, t, row, params)
        }.getOrElse(orElse.map(eval(_, t, row, params)).orNull)
      case Star => java.lang.Long.valueOf(1L)
      case a: Agg =>
        throw new SQLException(s"aggregate outside aggregation: $a")
    }

  /** Resolve a FROM source to (scope, rows): base tables read the
    * store; derived tables recurse; joins combine the two sides'
    * columns and rows (INNER or NULL-padded LEFT; fixture-sized per
    * the shim's documented scale stance — a real engine executes the
    * same SQL with its own join machinery). */
  private def evalSource(src: Source, params: Array[Any],
      backend: ShimBackend): (Scope, Vector[Array[Any]]) = src match {
    case TableRef(name) =>
      val t = backend.table(name)
      (new Scope(t.columns), t.synchronized(t.rows.toVector))
    case SubSelect(inner, _) =>
      val (cols, rows) = run(inner, params, backend)
      (new Scope(cols), rows.toVector)
    case JoinSrc(l, r, on, joinType) =>
      val (ls, lrows) = evalSource(l, params, backend)
      val (rs, rrows) = evalSource(r, params, backend)
      val scope = new Scope(ls.columns ++ rs.columns)
      val rWidth = rs.columns.length
      val joined = Vector.newBuilder[Array[Any]]
      lrows.foreach { lr =>
        var matched = false
        rrows.foreach { rr =>
          val row = lr ++ rr
          if (eval(on, scope, row, params) == java.lang.Boolean.TRUE) {
            matched = true
            joined += row
          }
        }
        if (!matched && joinType == "LEFT")
          joined += (lr ++ Array.fill[Any](rWidth)(null))
      }
      (scope, joined.result())
  }

  /** Execute a parsed SELECT; returns (columns, rows). */
  def run(sel: Select, params: Array[Any],
      backend: ShimBackend = MySqlStore): (Seq[ColDef], Seq[Array[Any]]) = {
    val (t, base0) = evalSource(sel.from, params, backend)
    // TABLESAMPLE BERNOULLI: a seeded per-row coin flip, deterministic
    // for a given (seed, row position) — REPEATABLE's contract. 100%
    // keeps every row exactly ([0,1) * 100 < 100 always). splitmix64
    // finalizer, NOT java.util.Random: sequential seeds' first draws
    // are correlated enough to empty a 50% sample.
    def mix01(z0: Long): Double = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      (z >>> 11).toDouble / (1L << 53).toDouble
    }
    val base = sel.sample match {
      case None => base0
      case Some((pct, seed)) =>
        val s = seed.getOrElse(0L)
        base0.zipWithIndex.collect {
          case (r, i) if mix01(s * 0x5851F42D4C957F2DL + i) * 100 < pct => r
        }
    }
    val filtered = sel.where match {
      case None => base
      case Some(w) =>
        base.filter(r => eval(w, t, r, params) == java.lang.Boolean.TRUE)
    }
    val hasAgg = sel.groupBy.nonEmpty ||
      sel.items.exists(it => containsAgg(it.e))
    def cmpKey(k: OrderKey, x: Any, y: Any): Int =
      if (x == null && y == null) 0
      else if (x == null) { if (k.nullsFirst) -1 else 1 }
      else if (y == null) { if (k.nullsFirst) 1 else -1 }
      else cmpVals(x, y) * (if (k.asc) 1 else -1)
    val (cols, ordered) =
      if (!hasAgg) {
        val items = sel.items.flatMap {
          case Item(Star, _) => t.columns.map(c => (Col(c.name): Expr, c))
          case Item(e, alias) =>
            val c0 = outCol(e, t)
            Seq((e, alias.fold(c0)(a => c0.copy(name = a))))
        }
        // sort on SOURCE rows before projecting — a pushed TopN may
        // order by a column outside the projection (SELECT k ...
        // ORDER BY price), which is legal remote SQL
        val sorted =
          if (sel.orderBy.isEmpty) filtered
          else filtered.sortWith { (ra, rb) =>
            var r = 0
            sel.orderBy.foreach { k =>
              if (r == 0)
                r = cmpKey(k, eval(k.e, t, ra, params),
                  eval(k.e, t, rb, params))
            }
            r < 0
          }
        (items.map(_._2),
          sorted.map(r => items.map(i => eval(i._1, t, r, params)).toArray))
      } else {
        val groups = filtered.groupBy(r =>
          sel.groupBy.map(g => normKey(eval(g, t, r, params))).toList)
        val groupSeq =
          if (groups.isEmpty && sel.groupBy.isEmpty)
            Seq(List.empty[Any] -> Vector.empty[Array[Any]])
          else groups.toSeq
        val cols = sel.items.map { it =>
          val c0 = outCol(it.e, t)
          it.alias.fold(c0)(a => c0.copy(name = a))
        }
        val rows = groupSeq.map { case (_, rs) =>
          sel.items.map(i => evalAgg(i.e, t, rs, params)).toArray
        }
        val sorted =
          if (sel.orderBy.isEmpty) rows
          else {
            // aggregate outputs: order keys must match projected items
            // (by expression, or by the item's output alias)
            val keyIdx = sel.orderBy.map { k =>
              val i = sel.items.indexWhere(it => sameExpr(it.e, k.e) ||
                (k.e match {
                  case Col(n) => it.alias.exists(_.equalsIgnoreCase(n))
                  case _ => false
                }))
              if (i < 0) throw new SQLException(
                s"ORDER BY key not in aggregate projection: ${k.e}")
              (k, i)
            }
            rows.sortWith { (a, b) =>
              var r = 0
              keyIdx.foreach { case (k, i) =>
                if (r == 0) r = cmpKey(k, a(i), b(i))
              }
              r < 0
            }
          }
        (cols, sorted)
      }
    val paged = ordered
      .drop(sel.offset.getOrElse(0))
      .take(sel.limit.getOrElse(Int.MaxValue))
    (cols, paged)
  }

  private def normKey(v: Any): Any = v match {
    case b: java.math.BigDecimal => b.stripTrailingZeros()
    case o => o
  }

  private def containsAgg(e: Expr): Boolean = e match {
    case _: Agg => true
    case Arith(_, l, r) => containsAgg(l) || containsAgg(r)
    case Cmp(_, l, r) => containsAgg(l) || containsAgg(r)
    case CaseWhen(bs, o) => bs.exists(b => containsAgg(b._1) ||
      containsAgg(b._2)) || o.exists(containsAgg)
    case _ => false
  }

  private def sameExpr(a: Expr, b: Expr): Boolean = (a, b) match {
    case (Col(x), Col(y)) => x.equalsIgnoreCase(y)
    case _ => a == b
  }

  private def evalAgg(e: Expr, t: Scope, rs: Seq[Array[Any]],
      params: Array[Any]): Any = e match {
    case Agg(fn0, argOpt, distinct) =>
      val fn = canonAgg(fn0)
      val raw = argOpt match {
        case None => rs.map(_ => java.lang.Long.valueOf(1L): Any)
        case Some(a) => rs.map(r => eval(a, t, r, params))
      }
      val nonNull0 = raw.filter(_ != null)
      val nonNull = if (distinct) nonNull0.distinct else nonNull0
      fn match {
        case "COUNT" => java.lang.Long.valueOf(nonNull.size.toLong)
        case "MIN" =>
          if (nonNull.isEmpty) null else nonNull.minBy(identity[Any])(
            Ordering.fromLessThan[Any]((x, y) => cmpVals(x, y) < 0))
        case "MAX" =>
          if (nonNull.isEmpty) null else nonNull.maxBy(identity[Any])(
            Ordering.fromLessThan[Any]((x, y) => cmpVals(x, y) < 0))
        case "SUM" =>
          if (nonNull.isEmpty) null
          else {
            val s = nonNull.map(num).reduce(_.add(_))
            nonNull.head match {
              case _: java.lang.Double | _: java.lang.Float =>
                java.lang.Double.valueOf(s.doubleValue())
              case _: java.math.BigDecimal => s
              case _ => java.lang.Long.valueOf(s.longValueExact())
            }
          }
        case "AVG" =>
          if (nonNull.isEmpty) null
          else java.lang.Double.valueOf(
            nonNull.map(num(_).doubleValue()).sum / nonNull.size)
        case "VAR_POP" | "VAR_SAMP" | "STDDEV_POP" | "STDDEV_SAMP" =>
          val xs = nonNull.map(num(_).doubleValue())
          val denom = if (fn.endsWith("_POP")) xs.size else xs.size - 1
          if (xs.isEmpty || denom <= 0) null
          else {
            val mean = xs.sum / xs.size
            val v = xs.map(x => (x - mean) * (x - mean)).sum / denom
            java.lang.Double.valueOf(
              if (fn.startsWith("STDDEV")) math.sqrt(v) else v)
          }
      }
    case Arith(op, l, r) =>
      val (a, b) = (evalAgg(l, t, rs, params), evalAgg(r, t, rs, params))
      if (a == null || b == null) null
      else {
        val (x, y) = (num(a), num(b))
        op match {
          case "+" => x.add(y)
          case "-" => x.subtract(y)
          case "*" => x.multiply(y)
          case "/" => x.divide(y, java.math.MathContext.DECIMAL64)
          case "%" => x.remainder(y)
        }
      }
    case other =>
      // group expression: constant within the group
      rs.headOption.map(r => eval(other, t, r, params)).orNull
  }

  /** Output-column model for the RSMD (only the schema-probe query's
    * answers matter to Spark's type inference; reads go by position). */
  private def outCol(e: Expr, t: Scope): ColDef = e match {
    case Col(c) =>
      t.columns(t.colIdx.getOrElse(c.toLowerCase,
        throw new SQLException(s"Unknown column '$c'")))
    case Agg("COUNT", _, _) =>
      ColDef("count", "BIGINT", Types.BIGINT, 19, 0, signed = true,
        nullable = false)
    case _ =>
      ColDef("expr", "DOUBLE", Types.DOUBLE, 22, 0, signed = true,
        nullable = true)
  }

  def parse(sql: String,
      backend: ShimBackend = MySqlStore): Select =
    new P(tokenize(sql, backend.escapeBackslashInLiterals, backend.quote),
      sql, backend.who).parseSelect()

  // ---------- UPDATE (the DAO surface: Spark's JDBC source never
  // issues UPDATE, but the function-namespace manager's DAO does —
  // `MySqlFunctionNamespaceManager` flips is_deleted in place) ----------
  final case class Update(table: String, sets: Seq[(String, Expr)],
      where: Option[Expr])

  def parseUpdate(sql: String, backend: ShimBackend): Update = {
    val p = new P(tokenize(sql, backend.escapeBackslashInLiterals,
      backend.quote), sql, backend.who)
    p.eatKw("UPDATE")
    val table = p.next() match {
      case TIdent(s) => s
      case other => p.fail(s"bad table ref $other")
    }
    p.eatKw("SET")
    val sets = Seq.newBuilder[(String, Expr)]
    def one(): Unit = {
      val col = p.next() match {
        case TIdent(s) => s
        case other => p.fail(s"bad SET column $other")
      }
      p.eatPunct("=")
      sets += ((col, p.parseExpr()))
    }
    one()
    while (p.tryPunct(",")) one()
    val where = if (p.tryKw("WHERE")) Some(p.parseExpr()) else None
    if (!p.atEnd) p.fail(s"trailing tokens at ${p.pos}")
    Update(table, sets.result(), where)
  }

  def runUpdate(upd: Update, params: Array[Any],
      backend: ShimBackend): Int = {
    val t = backend.table(upd.table)
    val scope = new Scope(t.columns)
    val setIdx = upd.sets.map { case (c, e) =>
      (scope.colIdx.getOrElse(c.toLowerCase,
        throw new SQLException(s"Unknown column '$c'")), e)
    }
    t.synchronized {
      var n = 0
      t.rows.indices.foreach { i =>
        val row = t.rows(i)
        val hit = upd.where.forall(w =>
          eval(w, scope, row, params) == java.lang.Boolean.TRUE)
        if (hit) {
          setIdx.foreach { case (ci, e) =>
            row(ci) = eval(e, scope, row, params)
          }
          n += 1
        }
      }
      n
    }
  }
}

package graft.sources

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo, ResultSet, SQLException, Types}
import java.util.Properties
import java.util.logging.Logger

import scala.collection.mutable

/** The `java.sql` face of [[MySqlStore]] — a real JDBC driver for
  * `jdbc:mysql://graft-shim/...` URLs, so Spark's OWN MySQLDialect
  * (URL-keyed) is the code under test. The interfaces are implemented
  * with dynamic proxies answering exactly the calls Spark's JDBC source
  * makes and FAILING LOUDLY (method name in the error) on anything
  * else — the shim must never silently misbehave. The proxy/statement
  * machinery itself is dialect-neutral ([[ShimJdbcCore]]); the MySQL
  * and PostgreSQL drivers differ only in their [[ShimBackend]]. */
object GraftMySqlDriver {
  @volatile private var installed = false
  def install(): Unit = synchronized {
    if (!installed) {
      DriverManager.registerDriver(new GraftMySqlDriver)
      installed = true
    }
  }
}

class GraftMySqlDriver extends Driver {

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:mysql://graft-shim")

  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null else ShimJdbc.mysql.connection()

  override def getMajorVersion: Int = 8
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
  override def getPropertyInfo(url: String, info: Properties)
      : Array[DriverPropertyInfo] = Array.empty
}

private[sources] object ShimJdbc {
  val mysql = new ShimJdbcCore(MySqlStore)
  lazy val postgres = new ShimJdbcCore(PgStore)
  lazy val sqlserver = new ShimJdbcCore(MsStore)
}

/** Dialect-neutral `java.sql` implementation over a [[ShimBackend]]:
  * dynamic proxies for Connection / DatabaseMetaData / Statement /
  * ResultSet / RSMD answering exactly what Spark's JDBC source calls,
  * loud on everything else. */
private[sources] final class ShimJdbcCore(b: ShimBackend) {

  import ShimModel._

  private def unsupported(iface: String, m: Method): Nothing =
    throw new SQLException(
      s"${b.who} shim: $iface.${m.getName} not implemented — " +
        "extend the shim if Spark's JDBC source now calls it")

  private def proxy[T](clazz: Class[T])(
      handle: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(clazz.getClassLoader, Array[Class[_]](clazz),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method,
            args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          val key = (m.getName, a)
          if (handle.isDefinedAt(key)) handle(key)
          else m.getName match {
            // universal no-op/benign defaults
            case "toString" => s"${b.who}-shim ${clazz.getSimpleName}"
            case "hashCode" => Integer.valueOf(System.identityHashCode(p))
            case "equals" => java.lang.Boolean.valueOf(p eq a(0))
            case "isClosed" => java.lang.Boolean.FALSE
            case "close" | "clearWarnings" | "cancel" => null
            case "isWrapperFor" => java.lang.Boolean.FALSE
            case "getWarnings" => null
            // config setters only (setFetchSize, setQueryTimeout,
            // setAutoCommit...) take <=1 argument. A multi-arg set* is
            // a POSITIONAL PARAMETER setter (setObject(i, v, sqlType),
            // setTimestamp(i, ts, cal)); no-opping one would silently
            // insert NULL — route it to the fail-loudly error instead.
            case n if n.startsWith("set") && a.length <= 1 => null
            case _ => unsupported(clazz.getSimpleName, m)
          }
        }
      }).asInstanceOf[T]

  def connection(): Connection = {
    lazy val conn: Connection = proxy(classOf[Connection]) {
      case ("createStatement", _) => statement(None)
      case ("prepareStatement", args) =>
        statement(Some(args(0).asInstanceOf[String]))
      case ("getMetaData", _) => databaseMetaData(conn)
      case ("getAutoCommit", _) => java.lang.Boolean.TRUE
      case ("setAutoCommit", _) => null
      case ("commit", _) | ("rollback", _) => null
      case ("isValid", _) => java.lang.Boolean.TRUE
      case ("getTransactionIsolation", _) =>
        Integer.valueOf(Connection.TRANSACTION_READ_COMMITTED)
      case ("getCatalog", _) => "graft"
      case ("getSchema", _) => null
      // JdbcUtils' ArrayType setter: conn.createArrayOf(baseTypeName,
      // elements) — the value travels as a java.sql.Array whose
      // getArray() hands the elements back (the pgjdbc contract)
      case ("createArrayOf", args) =>
        sqlArray(args(0).asInstanceOf[String],
          args(1).asInstanceOf[Array[AnyRef]])
    }
    conn
  }

  /** Minimal java.sql.Array carrier (arrays are a PostgreSQL-family
    * surface: `BIGINT[]` columns round-trip as these). */
  private def sqlArray(baseType: String,
      elems: Array[AnyRef]): java.sql.Array =
    proxy(classOf[java.sql.Array]) {
      case ("getArray", a) if a.isEmpty => elems
      case ("getBaseTypeName", _) => baseType
      case ("free", _) => null
    }

  private def databaseMetaData(conn: Connection)
      : java.sql.DatabaseMetaData =
    proxy(classOf[java.sql.DatabaseMetaData]) {
      case ("supportsTransactions", _) => java.lang.Boolean.TRUE
      case ("getDatabaseProductName", _) => b.productName
      case ("getDatabaseProductVersion", _) => b.productVersion
      case ("getDatabaseMajorVersion", _) => Integer.valueOf(b.majorVersion)
      case ("getDatabaseMinorVersion", _) => Integer.valueOf(b.minorVersion)
      case ("getDriverVersion", _) => s"${b.majorVersion}.${b.minorVersion}"
      case ("getDriverMajorVersion", _) => Integer.valueOf(b.majorVersion)
      case ("getDriverMinorVersion", _) => Integer.valueOf(b.minorVersion)
      case ("getConnection", _) => conn
      case ("getIdentifierQuoteString", _) => b.quote.toString
      case ("storesUpperCaseIdentifiers", _) => java.lang.Boolean.FALSE
      case ("getSQLKeywords", _) => ""
    }

  private def statement(prepared: Option[String]): java.sql.PreparedStatement = {
    val params = mutable.ArrayBuffer.empty[Any]
    val batches = mutable.ArrayBuffer.empty[Array[Any]]
    def paramsArray: Array[Any] = params.toArray

    def setParam(i: Int, v: Any): AnyRef = {
      val idx = i - 1
      while (params.size <= idx) params += null
      params(idx) = v
      null
    }

    proxy(classOf[java.sql.PreparedStatement]) {
      case ("executeQuery", args) =>
        val sql = prepared.orElse(args.headOption.map(_.toString))
          .getOrElse(throw new SQLException("no sql"))
        executeQuery(sql, paramsArray)
      case ("executeUpdate", args) =>
        val sql = prepared.orElse(args.headOption.map(_.toString))
          .getOrElse(throw new SQLException("no sql"))
        Integer.valueOf(executeUpdate(sql, paramsArray))
      case ("execute", args) =>
        val sql = prepared.orElse(args.headOption.map(_.toString))
          .getOrElse(throw new SQLException("no sql"))
        executeUpdate(sql, paramsArray)
        java.lang.Boolean.FALSE
      case ("addBatch", args) if args.isEmpty =>
        batches += paramsArray
        params.clear()
        null
      case ("executeBatch", _) =>
        val sql = prepared.getOrElse(throw new SQLException("no sql"))
        val counts = batches.map(b => executeUpdate(sql, b)).toArray
        batches.clear()
        counts
      case ("clearParameters", _) => params.clear(); null
      case ("getConnection", _) => connection()
      case ("getUpdateCount", _) => Integer.valueOf(-1)
      case ("getMoreResults", _) => java.lang.Boolean.FALSE
      // typed setters (Spark's JdbcUtils makeSetter surface)
      case ("setNull", args) => setParam(args(0).asInstanceOf[Int], null)
      case (n, args) if n.startsWith("set") && args.length == 2 &&
          args(0).isInstanceOf[Integer] &&
          Set("setBoolean", "setByte", "setShort", "setInt", "setLong",
            "setFloat", "setDouble", "setBigDecimal", "setString",
            "setBytes", "setTimestamp", "setDate", "setObject",
            "setArray").contains(n) =>
        setParam(args(0).asInstanceOf[Int], args(1))
    }
  }

  // ---------------- statement execution ----------------

  private val InsertRe =
    """(?is)\s*INSERT\s+INTO\s+(.+?)\s*\((.*?)\)\s*VALUES\s*\((.*?)\)\s*""".r
  private val CreateRe =
    """(?is)\s*CREATE\s+TABLE\s+(\S+)\s*\((.*)\)\s*(.*?)\s*""".r
  private val DropRe = """(?is)\s*DROP\s+TABLE\s+(\S+)\s*""".r
  private val UpdateRe = """(?is)\s*UPDATE\s+.*""".r
  // PostgresDialect truncates with TRUNCATE TABLE ONLY <t>
  private val TruncateRe =
    """(?is)\s*TRUNCATE\s+TABLE\s+(?:ONLY\s+)?(\S+)\s*""".r

  private def unquoteName(raw: String): String = {
    val parts = raw.trim.split('.')
    val q = b.quote.toString
    parts.last.stripPrefix(q).stripSuffix(q)
  }

  private def executeUpdate(sql: String, params: Array[Any]): Int = {
    b.statementLog.add(sql)
    sql match {
      case InsertRe(rawName, _, _) =>
        b.insert(unquoteName(rawName), params.toSeq)
        1
      case CreateRe(rawName, colsDdl, _) =>
        val name = unquoteName(rawName)
        // split on top-level commas (DECIMAL(10,2) has a nested one)
        val parts = Seq.newBuilder[String]
        var depth = 0
        val cur = new StringBuilder
        colsDdl.foreach {
          case '(' => depth += 1; cur += '('
          case ')' => depth -= 1; cur += ')'
          case ',' if depth == 0 => parts += cur.toString; cur.clear()
          case c => cur += c
        }
        if (cur.nonEmpty) parts += cur.toString
        val cols = parts.result().map { p =>
          val s = p.trim
          val (colName, rest) =
            if (s.charAt(0) == b.quote) {
              val end = s.indexOf(b.quote, 1)
              (s.substring(1, end), s.substring(end + 1).trim)
            } else {
              val sp = s.indexOf(' ')
              (s.substring(0, sp), s.substring(sp + 1).trim)
            }
          val nullable = !rest.toUpperCase.endsWith("NOT NULL")
          val typeDdl = rest.replaceAll("(?i)\\s*NOT\\s+NULL\\s*$", "")
          b.ddlType(colName, typeDdl, nullable)
        }
        b.create(name, cols)
        b.ddlLog.put(name.toLowerCase, colsDdl.trim)
        0
      case DropRe(rawName) =>
        val name = unquoteName(rawName)
        b.table(name) // throws if absent, like the real engines
        b.drop(name)
        0
      case TruncateRe(rawName) =>
        val t = b.table(unquoteName(rawName))
        t.synchronized(t.rows.clear())
        0
      case UpdateRe() =>
        // the DAO surface (function-namespace manager's
        // setDeletionStatus); Spark's JDBC source never issues UPDATE
        MiniSql.runUpdate(MiniSql.parseUpdate(sql, b), params, b)
      case _ =>
        throw new SQLException(s"${b.who} shim: unsupported update: $sql")
    }
  }

  private def executeQuery(sql: String, params: Array[Any]): ResultSet = {
    b.statementLog.add(sql)
    val sel = MiniSql.parse(sql, b)
    val (cols, rows) = MiniSql.run(sel, params, b)
    resultSet(cols, rows)
  }

  // ---------------- result set ----------------

  private def resultSet(cols: Seq[ColDef],
      rows: Seq[Array[Any]]): ResultSet = {
    var cursor = -1
    var lastWasNull = false
    def cell(i: Int): Any = {
      val v = rows(cursor)(i - 1)
      lastWasNull = v == null
      v
    }
    def asNum(i: Int): java.math.BigDecimal = cell(i) match {
      case null => null
      case b: java.math.BigDecimal => b
      case b: java.lang.Boolean =>
        if (b) java.math.BigDecimal.ONE else java.math.BigDecimal.ZERO
      case n: Number => new java.math.BigDecimal(n.toString)
      case s: String => new java.math.BigDecimal(s)
      case o => throw new SQLException(s"not numeric: $o")
    }
    val meta = resultSetMetaData(cols)
    proxy(classOf[ResultSet]) {
      case ("next", _) =>
        cursor += 1
        java.lang.Boolean.valueOf(cursor < rows.size)
      case ("wasNull", _) => java.lang.Boolean.valueOf(lastWasNull)
      case ("getMetaData", _) => meta
      case ("getString", args) =>
        val v = cell(args(0).asInstanceOf[Int])
        if (v == null) null else v.toString
      case ("getBoolean", args) =>
        val v = cell(args(0).asInstanceOf[Int])
        java.lang.Boolean.valueOf(v match {
          case null => false
          case b: java.lang.Boolean => b.booleanValue()
          case n: Number => n.longValue() != 0
          case o => throw new SQLException(s"not boolean: $o")
        })
      case ("getByte", args) =>
        val v = asNum(args(0).asInstanceOf[Int])
        java.lang.Byte.valueOf(if (v == null) 0.toByte else v.byteValue())
      case ("getShort", args) =>
        val v = asNum(args(0).asInstanceOf[Int])
        java.lang.Short.valueOf(if (v == null) 0.toShort else v.shortValue())
      case ("getInt", args) =>
        val v = asNum(args(0).asInstanceOf[Int])
        Integer.valueOf(if (v == null) 0 else v.intValue())
      case ("getLong", args) =>
        val v = asNum(args(0).asInstanceOf[Int])
        java.lang.Long.valueOf(if (v == null) 0L else v.longValue())
      case ("getFloat", args) =>
        val v = asNum(args(0).asInstanceOf[Int])
        java.lang.Float.valueOf(if (v == null) 0f else v.floatValue())
      case ("getDouble", args) =>
        val v = asNum(args(0).asInstanceOf[Int])
        java.lang.Double.valueOf(if (v == null) 0d else v.doubleValue())
      case ("getBigDecimal", args) => asNum(args(0).asInstanceOf[Int])
      case ("getBytes", args) =>
        cell(args(0).asInstanceOf[Int]).asInstanceOf[Array[Byte]]
      case ("getTimestamp", args) =>
        cell(args(0).asInstanceOf[Int]).asInstanceOf[java.sql.Timestamp]
      case ("getDate", args) =>
        cell(args(0).asInstanceOf[Int]).asInstanceOf[java.sql.Date]
      case ("getArray", args) =>
        cell(args(0).asInstanceOf[Int]) match {
          case null => null
          case a: java.sql.Array => a
          case a: Array[AnyRef] => sqlArray("", a)
          case o => throw new SQLException(s"not an array: $o")
        }
      case ("getObject", args) => cell(args(0).asInstanceOf[Int])
        .asInstanceOf[AnyRef]
      case ("isClosed", _) => java.lang.Boolean.FALSE
    }
  }

  private def resultSetMetaData(cols: Seq[ColDef])
      : java.sql.ResultSetMetaData =
    proxy(classOf[java.sql.ResultSetMetaData]) {
      case ("getColumnCount", _) => Integer.valueOf(cols.size)
      case ("getColumnName", args) =>
        cols(args(0).asInstanceOf[Int] - 1).name
      case ("getColumnLabel", args) =>
        cols(args(0).asInstanceOf[Int] - 1).name
      case ("getColumnType", args) =>
        Integer.valueOf(cols(args(0).asInstanceOf[Int] - 1).jdbcType)
      case ("getColumnTypeName", args) =>
        cols(args(0).asInstanceOf[Int] - 1).typeName
      case ("getPrecision", args) =>
        Integer.valueOf(cols(args(0).asInstanceOf[Int] - 1).precision)
      case ("getScale", args) =>
        Integer.valueOf(cols(args(0).asInstanceOf[Int] - 1).scale)
      case ("isSigned", args) =>
        java.lang.Boolean.valueOf(cols(args(0).asInstanceOf[Int] - 1).signed)
      case ("isNullable", args) =>
        Integer.valueOf(
          if (cols(args(0).asInstanceOf[Int] - 1).nullable)
            java.sql.ResultSetMetaData.columnNullable
          else java.sql.ResultSetMetaData.columnNoNulls)
      case ("isCaseSensitive", _) => java.lang.Boolean.TRUE
      case ("isCurrency", _) => java.lang.Boolean.FALSE
      case ("isAutoIncrement", _) => java.lang.Boolean.FALSE
      // pgjdbc answers "" when the column's table is not resolvable;
      // Spark's Postgres path asks during schema inference
      case ("getTableName", _) => ""
    }
}

package graft.sources

import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo, SQLException, Types}
import java.util.Properties
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import java.util.logging.Logger

/** A SQL-Server-shaped in-process JDBC endpoint — the FOURTH JDBC
  * dialect family (reference: `presto-sqlserver/src/main/java/com/
  * facebook/presto/plugin/sqlserver/SqlServerClient.java` over
  * `presto-base-jdbc/.../JdbcClient.java`), completing the reference's
  * mysql/postgresql/sqlserver dialect set. Same DOCUMENTED SUBSTITUTION
  * as [[MySqlStore]]/[[PgStore]]: a real `java.sql.Driver` accepting
  * `jdbc:sqlserver://graft-shim...` URLs makes SPARK'S OWN
  * `org.apache.spark.sql.jdbc.MsSqlServerDialect` the code under test.
  * What THIS dialect pins that the other three cannot (probed
  * empirically against Spark 4.1, locked in MsProbeDialectSuite):
  *
  *   - '''TOP, not LIMIT''': `supportsLimit` compiles through
  *     `getLimitClause(n) = "TOP (n)"` — a pushed TopN arrives as
  *     `SELECT TOP (5) ... ORDER BY ...`, the only shimmed dialect
  *     whose limit clause precedes the projection. `supportsOffset`
  *     is FALSE: OFFSET stays Spark-side (the gate asserts it never
  *     crosses the wire while paging still answers).
  *   - '''No boolean literals''': `compileValue(true) = 1` — a pushed
  *     boolean predicate arrives as `"flag" = 1` (T-SQL BIT has no
  *     true/false literals).
  *   - '''Write-side DDL''': `NVARCHAR(MAX)` (not LONGTEXT/TEXT),
  *     `BIT` (unparenthesized), `VARBINARY(MAX)`, `DATETIME`,
  *     SMALLINT for byte AND short.
  *   - '''Read-side inference''': TINYINT→SHORT (T-SQL tinyint is
  *     unsigned 0-255, so the dialect widens — MySQL's signed tinyint
  *     maps to byte: the same JDBC code, opposite calls),
  *     REAL→float, DATETIMEOFFSET (type -155)→timestamp.
  *
  * Scale stance: identical to the sibling shims — at 100 TB the wire
  * half changes, nothing above the socket does. */
object MsStore extends ShimBackend {

  import ShimModel._

  type ColDef = ShimModel.ColDef
  val ColDef = ShimModel.ColDef

  override def who: String = "graft-sqlserver"
  override def quote: Char = '"'
  override def escapeBackslashInLiterals: Boolean = false
  override def productName: String = "Microsoft SQL Server"
  override def productVersion: String = "16.0 (graft-shim)"
  override def majorVersion: Int = 16
  override def minorVersion: Int = 0

  private[graft] val tables = new ConcurrentHashMap[String, MTable]()
  override val statementLog = new ConcurrentLinkedQueue[String]()
  override val ddlLog = new ConcurrentHashMap[String, String]()

  override def drop(name: String): Unit = {
    tables.remove(name.toLowerCase)
    ddlLog.remove(name.toLowerCase)
  }

  def clearAll(): Unit = {
    tables.clear(); ddlLog.clear(); statementLog.clear()
  }

  override def create(name: String, cols: Seq[ColDef]): Unit =
    tables.put(name.toLowerCase, new MTable(cols))

  override def insert(name: String, values: Seq[Any]): Unit = {
    val t = table(name)
    require(values.length == t.columns.length, "graft-sqlserver: arity")
    t.synchronized { t.rows += values.toArray }
  }

  override def table(name: String): MTable = {
    val t = tables.get(name.toLowerCase)
    if (t == null) // the real engine's error 208, invalid object name
      throw new SQLException(s"Invalid object name '$name'.", "S0002", 208)
    t
  }

  /** SQL Server DDL type → column model; the inverse of what
    * MsSqlServerDialect.getJDBCType emitted (probed against Spark 4.1:
    * NVARCHAR(MAX)/BIT/SMALLINT/VARBINARY(MAX)/DATETIME, the rest via
    * the JdbcUtils common mapping). The recorded fields are the
    * mssql-jdbc RSMD answers getCatalystType sees. */
  override def ddlType(name: String, ddl: String,
      nullable: Boolean): ColDef = {
    val up = ddl.trim.toUpperCase
    def c(tn: String, jt: Int, p: Int, s: Int = 0) =
      ColDef(name, tn, jt, p, s, signed = true, nullable)
    val DecimalRe = """DECIMAL\((\d+),(\d+)\)""".r
    up match {
      case "NVARCHAR(MAX)" => c("nvarchar", Types.NVARCHAR, Int.MaxValue)
      case "BIT" => c("bit", Types.BIT, 1)
      case "SMALLINT" => c("smallint", Types.SMALLINT, 5)
      case "INTEGER" | "INT" => c("int", Types.INTEGER, 10)
      case "BIGINT" => c("bigint", Types.BIGINT, 19)
      case "REAL" => c("real", Types.REAL, 7)
      case "DOUBLE PRECISION" | "FLOAT" => c("float", Types.DOUBLE, 15)
      case "VARBINARY(MAX)" => c("varbinary", Types.VARBINARY, Int.MaxValue)
      case "DATETIME" => c("datetime", Types.TIMESTAMP, 23, 3)
      case "DATE" => c("date", Types.DATE, 10)
      case DecimalRe(p, s) => c("decimal", Types.DECIMAL, p.toInt, s.toInt)
      case other => throw new SQLException(
        s"graft-sqlserver shim: unmapped DDL type '$other' for '$name'")
    }
  }
}

object GraftSqlServerDriver {
  @volatile private var installed = false
  def install(): Unit = synchronized {
    if (!installed) {
      DriverManager.registerDriver(new GraftSqlServerDriver)
      installed = true
    }
  }
}

class GraftSqlServerDriver extends Driver {

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:sqlserver://graft-shim")

  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null else ShimJdbc.sqlserver.connection()

  override def getMajorVersion: Int = 16
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
  override def getPropertyInfo(url: String, info: Properties)
      : Array[DriverPropertyInfo] = Array.empty
}

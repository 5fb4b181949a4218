package graft.sources

import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo, SQLException, Types}
import java.util.Properties
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import java.util.logging.Logger

/** A PostgreSQL-shaped in-process JDBC endpoint — the THIRD real JDBC
  * dialect family (reference: `presto-postgresql/src/main/java/com/
  * facebook/presto/plugin/postgresql/PostgreSqlClient.java` over
  * `presto-base-jdbc/.../JdbcClient.java`), the highest-traffic
  * federated store the round-12 audit left open. Same DOCUMENTED
  * SUBSTITUTION as [[MySqlStore]]: the wire+server half is a JVM-wide
  * store behind a real `java.sql.Driver` accepting
  * `jdbc:postgresql://graft-shim/...` URLs — because the URL is
  * genuinely `jdbc:postgresql:`, the code under test is SPARK'S OWN
  * `org.apache.spark.sql.jdbc.PostgresDialect`, not a
  * re-implementation. What THIS dialect pins that Derby/MySQL cannot
  * (each probed empirically against Spark 4.1, locked in
  * PgProbeDialectSuite):
  *
  *   - '''Write-side type mapping''': `TEXT` (not LONGTEXT),
  *     `BOOLEAN` (not BIT(1)), `SMALLINT` for byte AND short,
  *     `FLOAT4`/`FLOAT8`, `BYTEA` (not BLOB), `NUMERIC(p,s)`,
  *     `TIMESTAMP WITH TIME ZONE`, and ARRAY columns
  *     (`BIGINT[]`/`TEXT[]`) — recorded DDL is the gate's lock.
  *   - '''Read-side type inference''': the RSMD answers with pgjdbc's
  *     type names/codes so `PostgresDialect.getCatalystType` makes the
  *     real calls — float4→float, int2→short, bpchar→padded string,
  *     `_int8`→array<bigint>, uuid/jsonb/money→string,
  *     bit(8)→binary, bool→boolean.
  *   - '''Identifier quoting''': every statement arrives
  *     `"double-quoted"` (vs MySQL's backticks); standard literal
  *     escaping ('' doubling, backslash NOT an escape).
  *   - '''Pushdown''': aggregates + the variance family, LIMIT and
  *     OFFSET clauses, `TRUNCATE TABLE ONLY`, and — unique among the
  *     shimmed dialects — `TABLESAMPLE BERNOULLI (pct) REPEATABLE
  *     (seed)` (`supportsTableSample`), executed by [[MiniSql]]'s
  *     seeded per-row coin flip.
  *
  * Scale stance: identical to the MySQL shim — at 100 TB against a
  * real PostgreSQL the wire half changes, nothing above the socket
  * does; quoting, type mapping, and the pushdown surface are exactly
  * what these gates pin. */
object PgStore extends ShimBackend {

  import ShimModel._

  type ColDef = ShimModel.ColDef
  val ColDef = ShimModel.ColDef

  override def who: String = "graft-postgres"
  override def quote: Char = '"'
  // standard_conforming_strings: backslash is a literal character
  override def escapeBackslashInLiterals: Boolean = false
  override def productName: String = "PostgreSQL"
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

  /** Seed a table directly with pg-typed columns — the out-of-band
    * path for read-side inference gates (a float4/bpchar/uuid column
    * can only exist in a table PostgreSQL itself created). */
  override def create(name: String, cols: Seq[ColDef]): Unit =
    tables.put(name.toLowerCase, new MTable(cols))

  override def insert(name: String, values: Seq[Any]): Unit = {
    val t = table(name)
    require(values.length == t.columns.length, "graft-postgres: arity")
    t.synchronized { t.rows += values.toArray }
  }

  override def table(name: String): MTable = {
    val t = tables.get(name.toLowerCase)
    if (t == null) // the real engine's 42P01 undefined_table
      throw new SQLException(
        s"""relation "$name" does not exist""", "42P01")
    t
  }

  /** PostgreSQL DDL type → column model; the inverse of what
    * PostgresDialect.getJDBCType emitted (probed empirically against
    * Spark 4.1: TEXT/BOOLEAN/SMALLINT/FLOAT4/FLOAT8/BYTEA/
    * NUMERIC(p,s)/TIMESTAMP WITH TIME ZONE/elem[]). The recorded
    * (typeName, jdbcType, precision, scale) are pgjdbc's answers for
    * that column — what getCatalystType sees coming back. */
  override def ddlType(name: String, ddl: String,
      nullable: Boolean): ColDef = {
    val up = ddl.trim.toUpperCase
    def c(tn: String, jt: Int, p: Int, s: Int = 0) =
      ColDef(name, tn, jt, p, s, signed = true, nullable)
    val NumericRe = """NUMERIC\((\d+),(\d+)\)""".r
    val CharRe = """(?:BPCHAR|CHAR|CHARACTER)\((\d+)\)""".r
    up match {
      case "TEXT" => c("text", Types.VARCHAR, Int.MaxValue)
      case "BOOLEAN" => c("bool", Types.BIT, 1)
      case "SMALLINT" => c("int2", Types.SMALLINT, 5)
      case "INTEGER" | "INT" => c("int4", Types.INTEGER, 10)
      case "BIGINT" => c("int8", Types.BIGINT, 19)
      case "FLOAT4" | "REAL" => c("float4", Types.REAL, 8, 8)
      case "FLOAT8" | "DOUBLE PRECISION" => c("float8", Types.DOUBLE, 17, 17)
      case "BYTEA" => c("bytea", Types.BINARY, Int.MaxValue)
      case NumericRe(p, s) => c("numeric", Types.NUMERIC, p.toInt, s.toInt)
      case "TIMESTAMP WITH TIME ZONE" =>
        c("timestamptz", Types.TIMESTAMP, 35, 6)
      case "TIMESTAMP" => c("timestamp", Types.TIMESTAMP, 29, 6)
      case "DATE" => c("date", Types.DATE, 13)
      case "BIGINT[]" => c("_int8", Types.ARRAY, 19)
      case "TEXT[]" => c("_text", Types.ARRAY, Int.MaxValue)
      case "FLOAT8[]" | "DOUBLE PRECISION[]" =>
        c("_float8", Types.ARRAY, 17, 17)
      case CharRe(n) => c("bpchar", Types.CHAR, n.toInt)
      case "UUID" => c("uuid", Types.OTHER, 36)
      case "JSONB" => c("jsonb", Types.OTHER, Int.MaxValue)
      case other => throw new SQLException(
        s"graft-postgres shim: unmapped DDL type '$other' for '$name'")
    }
  }
}

object GraftPostgresDriver {
  @volatile private var installed = false
  def install(): Unit = synchronized {
    if (!installed) {
      DriverManager.registerDriver(new GraftPostgresDriver)
      installed = true
    }
  }
}

class GraftPostgresDriver extends Driver {

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:postgresql://graft-shim")

  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null else ShimJdbc.postgres.connection()

  override def getMajorVersion: Int = 16
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
  override def getPropertyInfo(url: String, info: Properties)
      : Array[DriverPropertyInfo] = Array.empty
}

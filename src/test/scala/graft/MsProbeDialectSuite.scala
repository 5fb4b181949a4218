package graft

import org.apache.spark.sql.types._

/** Locks the MsSqlServerDialect contract the shim's store model
  * depends on (probed empirically against Spark 4.1): the TOP-based
  * limit, FALSE supportsOffset, boolean-as-1 value compilation, DDL
  * types, and the getCatalystType divergence arms. A Spark upgrade
  * that shifts any of these must fail HERE, not as a silent drift in
  * the q2z/q3a gates. Siblings: ProbeDialectSuite (MySQL),
  * PgProbeDialectSuite (Postgres). */
class MsProbeDialectSuite extends org.scalatest.funsuite.AnyFunSuite {

  private val d =
    org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:sqlserver://x;db")

  test("dialect resolves by URL and emits the T-SQL DDL types") {
    assert(d.getClass.getName ==
      "org.apache.spark.sql.jdbc.MsSqlServerDialect")
    def ddl(t: DataType): String =
      d.getJDBCType(t).map(_.databaseTypeDefinition).getOrElse("?")
    assert(ddl(StringType) == "NVARCHAR(MAX)")
    assert(ddl(BooleanType) == "BIT")
    assert(ddl(ByteType) == "SMALLINT")
    assert(ddl(ShortType) == "SMALLINT")
    assert(ddl(BinaryType) == "VARBINARY(MAX)")
    assert(ddl(TimestampType) == "DATETIME")
    // int/long/float/double/decimal/date fall to the common mapping
    assert(d.getJDBCType(IntegerType).isEmpty)
    assert(d.getJDBCType(LongType).isEmpty)
    assert(d.getJDBCType(DoubleType).isEmpty)
  }

  test("clause shapes: TOP limit, no OFFSET, quote, bool-as-1") {
    assert(d.getSchemaQuery("tbl") == "SELECT * FROM tbl WHERE 1=0")
    assert(d.quoteIdentifier("col") == "\"col\"")
    // the signature arm: limit is TOP (n) BEFORE the projection, and
    // OFFSET is not pushable at all
    assert(d.supportsLimit)
    assert(!d.supportsOffset)
    assert(d.getLimitClause(5) == "TOP (5)")
    assert(d.getTruncateQuery("tbl") == "TRUNCATE TABLE tbl")
    // T-SQL BIT has no true/false literals
    assert(d.compileValue(true) == 1)
    assert(d.compileValue(false) == 0)
    // binary literals compile to 0x hex
    assert(d.compileValue(Array[Byte](1, 2)) == "0x0102")
  }

  test("getCatalystType divergence arms the shim's RSMD drives") {
    import java.sql.Types
    def cat(sqlType: Int, typeName: String, size: Int, scale: Int = 0,
        signed: Boolean = true): Option[DataType] = {
      val b = new MetadataBuilder()
      b.putBoolean("isSigned", signed)
      b.putLong("scale", scale.toLong)
      b.putBoolean("isTimestampNTZ", false)
      d.getCatalystType(sqlType, typeName, size, b)
    }
    // TINYINT widens to SHORT (T-SQL tinyint is unsigned 0-255) — the
    // same JDBC code MySQLDialect maps to ByteType
    assert(cat(Types.TINYINT, "tinyint", 3).contains(ShortType))
    assert(cat(Types.SMALLINT, "smallint", 5).contains(ShortType))
    assert(cat(Types.REAL, "real", 7).contains(FloatType))
    // microsoft.sql.Types.DATETIMEOFFSET = -155
    assert(cat(-155, "datetimeoffset", 34, 7).contains(TimestampType))
    // arms left to the JdbcUtils defaults (None)
    assert(cat(Types.BIT, "bit", 1).isEmpty)
    assert(cat(Types.NVARCHAR, "nvarchar", Int.MaxValue).isEmpty)
    assert(cat(Types.VARBINARY, "varbinary", Int.MaxValue).isEmpty)
    assert(cat(Types.TIMESTAMP, "datetime", 23, 3).isEmpty)
    // the variance family is pushable — and compiles to the T-SQL
    // spellings (VAR/VARP/STDEV/STDEVP), which MiniSql canonicalizes
    val m = d.getClass.getMethods.find(_.getName == "isSupportedFunction")
    assert(m.isDefined)
    Seq("VAR_POP", "VAR_SAMP", "STDDEV_POP", "STDDEV_SAMP", "AVG").foreach {
      f => assert(m.get.invoke(d, f) == java.lang.Boolean.TRUE, f)
    }
  }
}

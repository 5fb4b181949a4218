package graft

import org.apache.spark.sql.types._

/** Locks the MySQLDialect contract the shim's store model depends on
  * (probed empirically against Spark 4.1): write-side DDL types, the
  * probe/limit/quote clause shapes, and the getCatalystType divergence
  * arms. A Spark upgrade that shifts any of these must fail HERE, not
  * as a silent type drift inside the q2q/q2r gates. */
class ProbeDialectSuite extends org.scalatest.funsuite.AnyFunSuite {

  private val d = org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:mysql://x/db")

  test("dialect resolves by URL and emits the MySQL DDL types") {
    assert(d.getClass.getName ==
      "org.apache.spark.sql.jdbc.MySQLDialect")
    def ddl(t: DataType): String =
      d.getJDBCType(t).map(_.databaseTypeDefinition).getOrElse("?")
    assert(ddl(StringType) == "LONGTEXT")
    assert(ddl(BooleanType) == "BIT(1)")
    assert(ddl(ByteType) == "TINYINT")
    assert(ddl(ShortType) == "SMALLINT")
    assert(ddl(IntegerType) == "INTEGER")
    assert(ddl(LongType) == "BIGINT")
    assert(ddl(FloatType) == "FLOAT")
    assert(ddl(DoubleType) == "DOUBLE PRECISION")
    assert(ddl(BinaryType) == "BLOB")
    assert(ddl(DecimalType(10, 2)) == "DECIMAL(10,2)")
  }

  test("clause shapes: probe, quote, limit/offset, truncate") {
    assert(d.getSchemaQuery("tbl") == "SELECT * FROM tbl WHERE 1=0")
    assert(d.getTableExistsQuery("tbl") == "SELECT 1 FROM tbl WHERE 1=0")
    assert(d.quoteIdentifier("col") == "`col`")
    assert(d.supportsLimit && d.supportsOffset)
    assert(d.getLimitClause(5) == "LIMIT 5")
    assert(d.getOffsetClause(3) == "OFFSET 3")
    assert(d.getTruncateQuery("tbl") == "TRUNCATE TABLE tbl")
  }

  test("getCatalystType divergence arms the shim's RSMD drives") {
    import java.sql.Types
    def cat(sqlType: Int, typeName: String, size: Int,
        signed: Boolean = true): Option[DataType] = {
      val b = new MetadataBuilder()
      b.putBoolean("isSigned", signed)
      b.putLong("scale", 0)
      b.putBoolean("isTimestampNTZ", false)
      d.getCatalystType(sqlType, typeName, size, b)
    }
    // dialect-handled arms
    assert(cat(Types.BIT, "BIT", 8).contains(BinaryType))
    assert(cat(Types.TINYINT, "TINYINT", 3).contains(ByteType))
    assert(cat(Types.SMALLINT, "SMALLINT", 5).contains(ShortType))
    assert(cat(Types.REAL, "FLOAT", 12).contains(FloatType))
    // arms the dialect leaves to the JdbcUtils defaults (None): BIT(1)
    // falls to BooleanType, the UNSIGNED pair to bigint/decimal(20,0)
    assert(cat(Types.BIT, "BIT", 1).isEmpty)
    assert(cat(Types.INTEGER, "INT UNSIGNED", 10, signed = false).isEmpty)
    assert(cat(Types.BIGINT, "BIGINT UNSIGNED", 20, signed = false).isEmpty)
    assert(cat(Types.LONGVARCHAR, "LONGTEXT", Int.MaxValue).isEmpty)
    // the variance family is declared pushable — q2r relies on it
    val m = d.getClass.getMethods.find(_.getName == "isSupportedFunction")
    assert(m.isDefined)
    Seq("VAR_POP", "VAR_SAMP", "STDDEV_POP", "STDDEV_SAMP", "AVG").foreach {
      f => assert(m.get.invoke(d, f) == java.lang.Boolean.TRUE, f)
    }
  }
}

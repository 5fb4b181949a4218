package graft

import org.apache.spark.sql.types._

/** Locks the PostgresDialect contract the pg shim's store model depends
  * on (probed empirically against Spark 4.1): write-side DDL types, the
  * probe/quote/limit/offset/truncate/tablesample clause shapes, and the
  * getCatalystType divergence arms. A Spark upgrade that shifts any of
  * these must fail HERE, not as a silent type drift inside the q2v/q2w
  * gates. The ProbeDialectSuite sibling covers MySQL. */
class PgProbeDialectSuite extends org.scalatest.funsuite.AnyFunSuite {

  private val d =
    org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:postgresql://x/db")

  test("dialect resolves by URL and emits the Postgres DDL types") {
    assert(d.getClass.getName ==
      "org.apache.spark.sql.jdbc.PostgresDialect")
    def ddl(t: DataType): String =
      d.getJDBCType(t).map(_.databaseTypeDefinition).getOrElse("?")
    assert(ddl(StringType) == "TEXT")
    assert(ddl(BooleanType) == "BOOLEAN")
    assert(ddl(ByteType) == "SMALLINT")
    assert(ddl(ShortType) == "SMALLINT")
    assert(ddl(FloatType) == "FLOAT4")
    assert(ddl(DoubleType) == "FLOAT8")
    assert(ddl(BinaryType) == "BYTEA")
    assert(ddl(DecimalType(10, 2)) == "NUMERIC(10,2)")
    assert(ddl(TimestampType) == "TIMESTAMP WITH TIME ZONE")
    assert(ddl(ArrayType(LongType)) == "BIGINT[]")
    assert(ddl(ArrayType(StringType)) == "TEXT[]")
    // int/long/date fall to the JdbcUtils common mapping
    assert(d.getJDBCType(IntegerType).isEmpty)
    assert(d.getJDBCType(LongType).isEmpty)
    assert(d.getJDBCType(DateType).isEmpty)
  }

  test("clause shapes: probe, quote, limit/offset, truncate, sample") {
    assert(d.getSchemaQuery("tbl") == "SELECT * FROM tbl WHERE 1=0")
    assert(d.quoteIdentifier("col") == "\"col\"")
    assert(d.supportsLimit && d.supportsOffset)
    assert(d.getLimitClause(5) == "LIMIT 5")
    assert(d.getOffsetClause(3) == "OFFSET 3")
    // the dialect divergence: ONLY (no descendant tables), vs MySQL's
    // plain TRUNCATE TABLE
    assert(d.getTruncateQuery("tbl") == "TRUNCATE TABLE ONLY tbl")
    // TABLESAMPLE is unique to this dialect among the shimmed three
    assert(d.supportsTableSample)
    val ts = org.apache.spark.sql.execution.datasources.v2
      .TableSampleInfo(0.0, 0.5, false, 42L)
    assert(d.getTableSample(ts) ==
      "TABLESAMPLE BERNOULLI (50.0) REPEATABLE (42)")
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
    // dialect-handled arms
    assert(cat(Types.REAL, "float4", 8, 8).contains(FloatType))
    assert(cat(Types.SMALLINT, "int2", 5).contains(ShortType))
    assert(cat(Types.BIT, "bit", 8).contains(BinaryType))
    assert(cat(Types.ARRAY, "_int8", 19).contains(ArrayType(LongType)))
    assert(cat(Types.ARRAY, "_text", Int.MaxValue)
      .contains(ArrayType(StringType)))
    assert(cat(Types.ARRAY, "_float8", 17, 17)
      .contains(ArrayType(DoubleType)))
    assert(cat(Types.OTHER, "uuid", 36).contains(StringType))
    assert(cat(Types.OTHER, "jsonb", Int.MaxValue).contains(StringType))
    assert(cat(Types.DOUBLE, "money", 19, 2).contains(StringType))
    assert(cat(Types.TIMESTAMP, "timestamptz", 35, 6)
      .contains(TimestampType))
    // arms left to the JdbcUtils defaults (None): bool -> boolean,
    // bpchar -> padded string, float8 -> double, bytea -> binary,
    // numeric -> decimal(p,s), int8 -> long
    assert(cat(Types.BIT, "bool", 1).isEmpty)
    assert(cat(Types.CHAR, "bpchar", 5).isEmpty)
    assert(cat(Types.DOUBLE, "float8", 17, 17).isEmpty)
    assert(cat(Types.BINARY, "bytea", Int.MaxValue).isEmpty)
    assert(cat(Types.NUMERIC, "numeric", 10, 2).isEmpty)
    assert(cat(Types.BIGINT, "int8", 19).isEmpty)
    // the variance family is declared pushable — q2w relies on it
    val m = d.getClass.getMethods.find(_.getName == "isSupportedFunction")
    assert(m.isDefined)
    Seq("VAR_POP", "VAR_SAMP", "STDDEV_POP", "STDDEV_SAMP", "AVG").foreach {
      f => assert(m.get.invoke(d, f) == java.lang.Boolean.TRUE, f)
    }
  }
}

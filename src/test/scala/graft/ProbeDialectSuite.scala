package graft
import org.apache.spark.sql.types._
class ProbeDialectSuite extends org.scalatest.funsuite.AnyFunSuite {
  test("probe mysql dialect") {
    val d = org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:mysql://x/db")
    info("dialect: " + d.getClass.getName)
    for (t <- Seq(StringType, BooleanType, ByteType, ShortType,
        IntegerType, LongType, FloatType, DoubleType, BinaryType,
        TimestampType, DateType, DecimalType(10, 2)))
      info(s"$t -> " + d.getJDBCType(t).map(_.databaseTypeDefinition))
    info("schemaQuery: " + d.getSchemaQuery("tbl"))
    info("tableExists: " + d.getTableExistsQuery("tbl"))
    info("quote: " + d.quoteIdentifier("col"))
    info("limit: " + d.getLimitClause(5) + " offset: " + d.getOffsetClause(3))
    info("supportsLimit " + d.supportsLimit + " supportsOffset " + d.supportsOffset)
    info("truncate: " + d.getTruncateQuery("tbl"))
    import java.sql.Types
    def cat(sqlType: Int, typeName: String, size: Int, signed: Boolean = true): Unit = {
      val b = new MetadataBuilder()
      b.putBoolean("isSigned", signed)
      b.putLong("scale", 0)
      val r = try d.getCatalystType(sqlType, typeName, size, b)
        catch { case e: Throwable => Some("ERR " + e) }
      info(s"catalyst($typeName, $sqlType, size=$size, signed=$signed) -> $r")
    }
    cat(Types.BIT, "BIT", 1); cat(Types.BIT, "BIT", 8)
    cat(Types.TINYINT, "TINYINT", 3); cat(Types.SMALLINT, "SMALLINT", 5)
    cat(Types.INTEGER, "INT", 10); cat(Types.INTEGER, "INT UNSIGNED", 10, signed = false)
    cat(Types.BIGINT, "BIGINT", 19); cat(Types.BIGINT, "BIGINT UNSIGNED", 20, signed = false)
    cat(Types.LONGVARCHAR, "LONGTEXT", 2147483647); cat(Types.VARCHAR, "VARCHAR", 255)
    cat(Types.REAL, "FLOAT", 12); cat(Types.DOUBLE, "DOUBLE", 22)
    cat(Types.VARBINARY, "VARBINARY", 255); cat(Types.TIMESTAMP, "DATETIME", 19)
    info("isSupportedFunction: " + (try {
      val m = d.getClass.getMethods.find(_.getName == "isSupportedFunction").get
      Seq("VAR_POP","VAR_SAMP","STDDEV_POP","STDDEV_SAMP","AVG","SUM","MIN","MAX","COUNT")
        .map(f => f + "=" + m.invoke(d, f)).mkString(", ")
    } catch { case e: Throwable => "n/a " + e }))
  }
}

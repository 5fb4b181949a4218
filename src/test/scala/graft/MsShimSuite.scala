package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{GraftSqlServerDriver, MsStore}

/** The SQL-Server-family JDBC dialect, exercised end-to-end against
  * the in-process shim (sources/MsShimConn.scala): because the URL is
  * really `jdbc:sqlserver:`, Spark's own MsSqlServerDialect does the
  * quoting, DDL mapping, inference, and — uniquely — compiles limits
  * as `SELECT TOP (n)`, refuses OFFSET pushdown, and compiles boolean
  * literals as 1/0. */
class MsShimSuite extends GraftSuite {

  GraftSqlServerDriver.install()

  private val url = "jdbc:sqlserver://graft-shim;databaseName=g"
  private val drv = "graft.sources.GraftSqlServerDriver"

  private def jdbc(table: String) =
    spark.read.format("jdbc").option("url", url)
      .option("dbtable", table).option("driver", drv).load()

  test("write path emits T-SQL DDL types and round-trips") {
    import spark.implicits._
    MsStore.drop("t_msround")
    Seq((1L, "alpha", 1.5, true, Array[Byte](1, 2),
      java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789")),
      (2L, null.asInstanceOf[String], -2.25, false,
        null.asInstanceOf[Array[Byte]],
        java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
      .toDF("k", "s", "d", "b", "bin", "ts")
      .write.format("jdbc").option("url", url)
      .option("dbtable", "t_msround").option("driver", drv)
      .mode("overwrite").save()
    val ddl = MsStore.ddlLog.get("t_msround")
    assert(ddl.contains("NVARCHAR(MAX)"), ddl) // StringType
    assert(ddl.contains("\"b\" BIT"), ddl) // BooleanType, no (1)
    assert(ddl.contains("VARBINARY(MAX)"), ddl) // BinaryType
    assert(ddl.contains("DATETIME"), ddl) // TimestampType
    val back = jdbc("t_msround").orderBy("k").collect()
    assert(back(0).getString(1) == "alpha" && back(1).isNullAt(1))
    assert(back(0).getBoolean(3) && !back(1).getBoolean(3))
    assert(back(0).getAs[Array[Byte]](4).toSeq == Seq(1, 2))
    assert(back(0).getTimestamp(5).toString == "2024-03-01 12:34:56.789")
  }

  test("tinyint widens to short — the anti-MySQL divergence") {
    MsStore.drop("t_msty")
    MsStore.create("t_msty", Seq(
      MsStore.ColDef("ti", "tinyint", java.sql.Types.TINYINT, 3, 0,
        signed = false, nullable = true)))
    MsStore.insert("t_msty", Seq(255.toShort)) // max unsigned tinyint
    val df = jdbc("t_msty")
    // MySQLDialect maps the same Types.TINYINT to ByteType; T-SQL's
    // tinyint is unsigned 0-255 so the dialect widens to short — 255
    // survives where a byte would overflow
    assert(df.schema("ti").dataType == ShortType, df.schema)
    assert(df.collect()(0).getShort(0) == 255.toShort)
  }

  test("boolean predicates compile as 1/0, never true/false") {
    import spark.implicits._
    MsStore.drop("t_msbool")
    (1 to 50).map(i => (i.toLong, i % 3 == 0)).toDF("id", "flag")
      .write.format("jdbc").option("url", url)
      .option("dbtable", "t_msbool").option("driver", drv)
      .mode("overwrite").save()
    MsStore.statementLog.clear()
    val n = jdbc("t_msbool").filter(col("flag") === true).count()
    assert(n == 16)
    val reads = MsStore.statementLog.toArray.map(_.toString)
      .filter(s => s.contains("t_msbool") && s.contains("WHERE"))
    assert(reads.exists(s => s.contains("\"flag\" = 1")),
      reads.mkString("\n"))
    assert(!reads.exists(_.contains("true")), reads.mkString("\n"))
  }

  test("TopN pushes as SELECT TOP (n); OFFSET stays Spark-side") {
    import spark.implicits._
    MsStore.drop("t_mstop")
    (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .write.format("jdbc").option("url", url)
      .option("dbtable", "t_mstop").option("driver", drv)
      .mode("overwrite").save()
    spark.conf.set("spark.sql.catalog.graft_ms",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.graft_ms.url", url)
    spark.conf.set("spark.sql.catalog.graft_ms.driver", drv)
    spark.conf.set("spark.sql.catalog.graft_ms.pushDownAggregate", "true")
    spark.conf.set("spark.sql.catalog.graft_ms.pushDownLimit", "true")
    spark.conf.set("spark.sql.catalog.graft_ms.pushDownOffset", "true")
    MsStore.statementLog.clear()
    val top = spark.sql(
      """SELECT id FROM graft_ms.g.t_mstop
        |ORDER BY v DESC LIMIT 3""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(100L, 99L, 98L))
    val remote = MsStore.statementLog.toArray.map(_.toString)
    assert(remote.exists(s => s.contains("TOP (3)") &&
      s.contains("ORDER BY")), remote.mkString("\n"))
    assert(!remote.exists(_.contains("LIMIT")), remote.mkString("\n"))
    // OFFSET: supportsOffset=false — the page answers correctly but
    // no OFFSET clause may cross the wire
    MsStore.statementLog.clear()
    val page = spark.sql(
      """SELECT id FROM graft_ms.g.t_mstop
        |ORDER BY id LIMIT 3 OFFSET 5""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(page == Seq(6L, 7L, 8L))
    assert(!MsStore.statementLog.toArray.map(_.toString)
      .exists(_.contains("OFFSET")),
      MsStore.statementLog.toArray.mkString("\n"))
  }

  test("variance pushdown arrives in the T-SQL spelling") {
    import spark.implicits._
    MsStore.drop("t_msvar")
    (1 to 120).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
      .write.format("jdbc").option("url", url)
      .option("dbtable", "t_msvar").option("driver", drv)
      .mode("overwrite").save()
    spark.conf.set("spark.sql.catalog.graft_ms",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.graft_ms.url", url)
    spark.conf.set("spark.sql.catalog.graft_ms.driver", drv)
    spark.conf.set("spark.sql.catalog.graft_ms.pushDownAggregate", "true")
    MsStore.statementLog.clear()
    val agg = spark.sql(
      """SELECT grp, round(var_samp(id), 4) AS vv,
        |  round(stddev_pop(id), 4) AS sp
        |FROM graft_ms.g.t_msvar GROUP BY grp ORDER BY grp""".stripMargin)
    assert(agg.queryExecution.executedPlan.treeString
      .contains("PushedAggregates"))
    val rows = agg.collect()
    assert(rows.length == 3)
    // g0: 3,6,...,120 — var_samp = 1230, stddev_pop ≈ 34.6265
    assert(rows.find(_.getString(0) == "g0").get.getDouble(1) == 1230.0)
    val remote = MsStore.statementLog.toArray.map(_.toString)
    assert(remote.exists(s => s.contains("VAR(") && s.contains("STDEVP(")),
      remote.mkString("\n"))
  }
}

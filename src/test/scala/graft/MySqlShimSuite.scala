package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{GraftMySqlDriver, MySqlStore}

/** The MySQL-family JDBC dialect, exercised end-to-end against the
  * in-process shim (sources/MySqlShimConn.scala): because the URL is
  * really `jdbc:mysql:`, Spark's own MySQLDialect does the quoting,
  * write-side DDL type mapping, and read-side type inference — the
  * dialect-DIVERGENCE surface Derby cannot test. */
class MySqlShimSuite extends GraftSuite {

  GraftMySqlDriver.install()

  private val url = "jdbc:mysql://graft-shim/g"

  private def jdbc(table: String) =
    spark.read.format("jdbc").option("url", url)
      .option("dbtable", table)
      .option("driver", "graft.sources.GraftMySqlDriver").load()

  test("write path emits MySQL DDL types and round-trips") {
    import spark.implicits._
    MySqlStore.drop("t_round")
    val df = Seq(
      (1L, "alpha", 1.5, true, 7.toByte),
      (2L, "beta", -2.25, false, 8.toByte),
      (3L, null.asInstanceOf[String], 0.0, true, 9.toByte))
      .toDF("k", "s", "d", "b", "y")
    df.write.format("jdbc").option("url", url)
      .option("dbtable", "t_round")
      .option("driver", "graft.sources.GraftMySqlDriver")
      .mode("overwrite").save()
    // the DDL that crossed the wire is the DIALECT's MySQL mapping
    val ddl = MySqlStore.ddlLog.get("t_round")
    assert(ddl.contains("LONGTEXT"), ddl) // StringType
    assert(ddl.contains("BIT(1)"), ddl) // BooleanType
    assert(ddl.contains("TINYINT"), ddl) // ByteType
    assert(ddl.contains("DOUBLE PRECISION"), ddl) // DoubleType
    assert(ddl.contains("BIGINT"), ddl) // LongType
    val back = jdbc("t_round")
    // read-side inference: LONGTEXT->string, BIT(1)->boolean,
    // TINYINT->byte (MySQLDialect), DOUBLE->double, BIGINT->long
    assert(back.schema("s").dataType == StringType)
    assert(back.schema("b").dataType == BooleanType)
    assert(back.schema("y").dataType == ByteType)
    assert(back.schema("d").dataType == DoubleType)
    assert(back.schema("k").dataType == LongType)
    val rows = back.orderBy("k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0).getString(1) == "alpha" && rows(2).isNullAt(1))
    assert(rows.map(_.getBoolean(3)).toSeq == Seq(true, false, true))
    assert(rows.map(_.getByte(4)).toSeq == Seq(7, 8, 9))
  }

  test("unsigned family infers the MySQL divergence types") {
    import MySqlStore.ColDef
    import java.sql.Types
    MySqlStore.drop("t_unsigned")
    MySqlStore.create("t_unsigned", Seq(
      ColDef("iu", "INT UNSIGNED", Types.INTEGER, 10, 0,
        signed = false, nullable = true),
      ColDef("bu", "BIGINT UNSIGNED", Types.BIGINT, 20, 0,
        signed = false, nullable = true),
      ColDef("b8", "BIT", Types.BIT, 8, 0, signed = true, nullable = true),
      ColDef("f", "FLOAT", Types.REAL, 12, 0, signed = true,
        nullable = true)))
    MySqlStore.insert("t_unsigned", Seq(3000000000L,
      new java.math.BigDecimal("9223372036854775808"),
      Array[Byte](1, 2), 1.5f))
    val df = jdbc("t_unsigned")
    // INT UNSIGNED exceeds int -> long; BIGINT UNSIGNED exceeds long ->
    // decimal(20,0); BIT(8) -> binary; REAL/FLOAT -> float
    assert(df.schema("iu").dataType == LongType, df.schema)
    assert(df.schema("bu").dataType == DecimalType(20, 0), df.schema)
    assert(df.schema("b8").dataType == BinaryType, df.schema)
    assert(df.schema("f").dataType == FloatType, df.schema)
    val r = df.collect()(0)
    assert(r.getLong(0) == 3000000000L)
    assert(r.getDecimal(1).toString == "9223372036854775808")
    assert(r.getFloat(3) == 1.5f)
  }

  test("predicates arrive backtick-quoted and filter remote-side") {
    import spark.implicits._
    MySqlStore.drop("t_pred")
    (1 to 100).map(i => (i.toLong, s"name$i", i % 7 == 0))
      .toDF("id", "nm", "flag")
      .write.format("jdbc").option("url", url).option("dbtable", "t_pred")
      .option("driver", "graft.sources.GraftMySqlDriver")
      .mode("overwrite").save()
    MySqlStore.statementLog.clear()
    val got = jdbc("t_pred")
      .filter(col("id") > 90 && col("nm").startsWith("name9") &&
        col("flag") === true)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(91L, 98L)) // 91..99 ∩ name9* ∩ %7==0
    val reads = MySqlStore.statementLog.toArray.map(_.toString)
      .filter(s => s.contains("t_pred") && s.contains("WHERE"))
    assert(reads.exists(s => s.contains("`id`") && s.contains("LIKE") &&
      s.contains("`flag`")), reads.mkString("\n"))
  }

  test("DSv2 catalog pushes grouped aggregates and TopN into the shim") {
    import spark.implicits._
    MySqlStore.drop("t_agg")
    (1 to 200).map(i => (i.toLong, s"g${i % 4}", i * 1.0))
      .toDF("id", "grp", "v")
      .write.format("jdbc").option("url", url).option("dbtable", "t_agg")
      .option("driver", "graft.sources.GraftMySqlDriver")
      .mode("overwrite").save()
    spark.conf.set("spark.sql.catalog.graft_mysql",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.graft_mysql.url", url)
    spark.conf.set("spark.sql.catalog.graft_mysql.driver",
      "graft.sources.GraftMySqlDriver")
    spark.conf.set("spark.sql.catalog.graft_mysql.pushDownAggregate", "true")
    spark.conf.set("spark.sql.catalog.graft_mysql.pushDownLimit", "true")
    MySqlStore.statementLog.clear()
    val agg = spark.sql(
      """SELECT grp, count(*) AS n, cast(sum(id) as bigint) AS id_sum,
        |  round(var_samp(v), 4) AS vv
        |FROM graft_mysql.g.t_agg GROUP BY grp ORDER BY grp""".stripMargin)
    val plan = agg.queryExecution.executedPlan.treeString
    assert(plan.contains("PushedAggregates"), plan)
    val rows = agg.collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(1)).sum == 200L)
    // g0: ids 4,8,...,200 -> sum = 4*(1..50).sum = 5100
    assert(rows.find(_.getString(0) == "g0").get.getLong(2) == 5100L)
    val remote = MySqlStore.statementLog.toArray.map(_.toString)
    assert(remote.exists(s => s.contains("GROUP BY") &&
      s.contains("VAR_SAMP")), remote.mkString("\n"))
    // TopN: ORDER BY + LIMIT compile into the remote query
    MySqlStore.statementLog.clear()
    val top = spark.sql(
      """SELECT id, v FROM graft_mysql.g.t_agg
        |ORDER BY v DESC LIMIT 3""".stripMargin)
    assert(top.queryExecution.executedPlan.treeString
      .contains("PushedTopN") ||
      MySqlStore.statementLog.toArray.map(_.toString)
        .exists(s => s.contains("ORDER BY") && s.contains("LIMIT 3")))
    assert(top.collect().map(_.getLong(0)).toSeq == Seq(200L, 199L, 198L))
    val remote2 = MySqlStore.statementLog.toArray.map(_.toString)
    assert(remote2.exists(s => s.contains("ORDER BY") &&
      s.contains("LIMIT 3")), remote2.mkString("\n"))
  }

  test("temporal and decimal types round-trip through the dialect DDL") {
    import spark.implicits._
    MySqlStore.drop("t_temporal")
    val df = Seq(
      (1L, java.sql.Date.valueOf("2024-03-01"),
        java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789"),
        new java.math.BigDecimal("12345.67")),
      (2L, java.sql.Date.valueOf("1999-12-31"),
        java.sql.Timestamp.valueOf("2000-01-01 00:00:00"),
        new java.math.BigDecimal("-0.01")))
      .toDF("k", "d", "ts", "dec")
      .withColumn("dec", col("dec").cast("decimal(10,2)"))
    df.write.format("jdbc").option("url", url)
      .option("dbtable", "t_temporal")
      .option("driver", "graft.sources.GraftMySqlDriver")
      .mode("overwrite").save()
    val ddl = MySqlStore.ddlLog.get("t_temporal")
    assert(ddl.contains("DATE") && ddl.contains("TIMESTAMP") &&
      ddl.contains("DECIMAL(10,2)"), ddl)
    val back = jdbc("t_temporal")
    assert(back.schema("d").dataType == DateType)
    assert(back.schema("dec").dataType == DecimalType(10, 2))
    val rows = back.orderBy("k").collect()
    assert(rows(0).getDate(1).toString == "2024-03-01")
    assert(rows(0).getTimestamp(2).toString == "2024-03-01 12:34:56.789")
    assert(rows(0).getDecimal(3).toString == "12345.67")
    assert(rows(1).getDecimal(3).toString == "-0.01")
    // append mode: the exists probe finds the table, no re-create
    MySqlStore.statementLog.clear()
    Seq((3L, java.sql.Date.valueOf("2025-06-15"),
      java.sql.Timestamp.valueOf("2025-06-15 01:02:03"),
      new java.math.BigDecimal("9.99")))
      .toDF("k", "d", "ts", "dec")
      .withColumn("dec", col("dec").cast("decimal(10,2)"))
      .write.format("jdbc").option("url", url)
      .option("dbtable", "t_temporal")
      .option("driver", "graft.sources.GraftMySqlDriver")
      .mode("append").save()
    val log = MySqlStore.statementLog.toArray.map(_.toString)
    assert(!log.exists(_.startsWith("CREATE TABLE")), log.mkString("\n"))
    assert(jdbc("t_temporal").count() == 3)
  }

  test("table lifecycle: exists probe, truncate, drop all arrive remote") {
    import spark.implicits._
    MySqlStore.drop("t_life")
    Seq((1L, "a")).toDF("k", "v")
      .write.format("jdbc").option("url", url).option("dbtable", "t_life")
      .option("driver", "graft.sources.GraftMySqlDriver")
      .mode("overwrite").save()
    // overwrite with truncate: TRUNCATE TABLE instead of drop+create
    MySqlStore.statementLog.clear()
    Seq((2L, "b"), (3L, "c")).toDF("k", "v")
      .write.format("jdbc").option("url", url).option("dbtable", "t_life")
      .option("driver", "graft.sources.GraftMySqlDriver")
      .option("truncate", "true").mode("overwrite").save()
    val log = MySqlStore.statementLog.toArray.map(_.toString)
    assert(log.exists(_.startsWith("TRUNCATE TABLE")), log.mkString("\n"))
    assert(jdbc("t_life").count() == 2)
  }
}

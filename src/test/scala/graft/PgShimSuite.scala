package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{GraftPostgresDriver, PgStore}

/** The PostgreSQL-family JDBC dialect, exercised end-to-end against the
  * in-process shim (sources/PgShimConn.scala): because the URL is
  * really `jdbc:postgresql:`, Spark's own PostgresDialect does the
  * quoting, write-side DDL type mapping, and read-side type inference —
  * the dialect-DIVERGENCE surface neither Derby nor MySQL can test
  * (float4/int2/bpchar/bytea/arrays, standard literal escaping,
  * TRUNCATE ONLY, TABLESAMPLE pushdown). */
class PgShimSuite extends GraftSuite {

  GraftPostgresDriver.install()

  private val url = "jdbc:postgresql://graft-shim/g"
  private val drv = "graft.sources.GraftPostgresDriver"

  private def jdbc(table: String) =
    spark.read.format("jdbc").option("url", url)
      .option("dbtable", table).option("driver", drv).load()

  test("write path emits Postgres DDL types and round-trips") {
    import spark.implicits._
    PgStore.drop("t_pground")
    val df = Seq(
      (1L, "alpha", 1.5, true, 7.toShort, Array[Byte](1, 2)),
      (2L, "beta", -2.25, false, 8.toShort, Array[Byte](3)),
      (3L, null.asInstanceOf[String], 0.0, true, 9.toShort,
        null.asInstanceOf[Array[Byte]]))
      .toDF("k", "s", "d", "b", "i2", "bin")
    df.write.format("jdbc").option("url", url)
      .option("dbtable", "t_pground").option("driver", drv)
      .mode("overwrite").save()
    // the DDL that crossed the wire is the DIALECT's Postgres mapping —
    // every divergence from MySQL's LONGTEXT/BIT(1)/BLOB family
    val ddl = PgStore.ddlLog.get("t_pground")
    assert(ddl.contains("TEXT"), ddl) // StringType (not LONGTEXT)
    assert(ddl.contains("BOOLEAN"), ddl) // BooleanType (not BIT(1))
    assert(ddl.contains("FLOAT8"), ddl) // DoubleType (not DOUBLE PRECISION)
    assert(ddl.contains("SMALLINT"), ddl) // ShortType
    assert(ddl.contains("BYTEA"), ddl) // BinaryType (not BLOB)
    assert(ddl.contains("\"k\""), ddl) // double-quoted identifiers
    val back = jdbc("t_pground")
    assert(back.schema("s").dataType == StringType)
    assert(back.schema("b").dataType == BooleanType)
    assert(back.schema("i2").dataType == ShortType)
    assert(back.schema("d").dataType == DoubleType)
    assert(back.schema("bin").dataType == BinaryType)
    val rows = back.orderBy("k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0).getString(1) == "alpha" && rows(2).isNullAt(1))
    assert(rows.map(_.getBoolean(3)).toSeq == Seq(true, false, true))
    assert(rows.map(_.getShort(4)).toSeq == Seq(7, 8, 9))
    assert(rows(0).getAs[Array[Byte]](5).toSeq == Seq(1, 2))
    assert(rows(2).isNullAt(5))
  }

  test("pg-only column types infer the Postgres divergence arms") {
    import PgStore.ColDef
    import java.sql.Types
    PgStore.drop("t_pgtypes")
    PgStore.create("t_pgtypes", Seq(
      ColDef("f4", "float4", Types.REAL, 8, 8, signed = true,
        nullable = true),
      ColDef("bp", "bpchar", Types.CHAR, 4, 0, signed = true,
        nullable = true),
      ColDef("uid", "uuid", Types.OTHER, 36, 0, signed = true,
        nullable = true),
      ColDef("js", "jsonb", Types.OTHER, Int.MaxValue, 0, signed = true,
        nullable = true),
      ColDef("arr", "_int8", Types.ARRAY, 19, 0, signed = true,
        nullable = true),
      ColDef("sarr", "_text", Types.ARRAY, Int.MaxValue, 0,
        signed = true, nullable = true)))
    PgStore.insert("t_pgtypes", Seq(2.5f, "ab  ",
      "123e4567-e89b-12d3-a456-426614174000", """{"a":1}""",
      Array[AnyRef](java.lang.Long.valueOf(10L),
        java.lang.Long.valueOf(20L)),
      Array[AnyRef]("x", "y", "z")))
    val df = jdbc("t_pgtypes")
    assert(df.schema("f4").dataType == FloatType, df.schema)
    assert(df.schema("bp").dataType == StringType, df.schema)
    assert(df.schema("uid").dataType == StringType, df.schema)
    assert(df.schema("js").dataType == StringType, df.schema)
    assert(df.schema("arr").dataType == ArrayType(LongType), df.schema)
    assert(df.schema("sarr").dataType == ArrayType(StringType), df.schema)
    val r = df.collect()(0)
    assert(r.getFloat(0) == 2.5f)
    assert(r.getString(1) == "ab  ") // bpchar keeps its padding
    assert(r.getString(3) == """{"a":1}""")
    assert(r.getSeq[Long](4) == Seq(10L, 20L))
    assert(r.getSeq[String](5) == Seq("x", "y", "z"))
  }

  test("array columns round-trip through the dialect's elem[] DDL") {
    import spark.implicits._
    PgStore.drop("t_pgarr")
    Seq((1L, Seq(1L, 2L, 3L), Seq("a", "b")),
      (2L, Seq(5L), Seq.empty[String]))
      .toDF("k", "ls", "ss")
      .write.format("jdbc").option("url", url)
      .option("dbtable", "t_pgarr").option("driver", drv)
      .mode("overwrite").save()
    val ddl = PgStore.ddlLog.get("t_pgarr")
    assert(ddl.contains("BIGINT[]") && ddl.contains("TEXT[]"), ddl)
    val back = jdbc("t_pgarr").orderBy("k").collect()
    assert(back(0).getSeq[Long](1) == Seq(1L, 2L, 3L))
    assert(back(0).getSeq[String](2) == Seq("a", "b"))
    assert(back(1).getSeq[Long](1) == Seq(5L))
    assert(back(1).getSeq[String](2).isEmpty)
    // Spark-side array math over the federated column
    val s = jdbc("t_pgarr")
      .select(aggregate(col("ls"), lit(0L), (a, x) => a + x).as("t"))
      .agg(sum(col("t"))).collect()(0).getLong(0)
    assert(s == 11L)
  }

  test("predicates arrive double-quoted with standard literal escaping") {
    import spark.implicits._
    PgStore.drop("t_pgpred")
    (1 to 100).map(i => (i.toLong, if (i == 42) "a\\b" else s"name$i",
      i % 7 == 0))
      .toDF("id", "nm", "flag")
      .write.format("jdbc").option("url", url)
      .option("dbtable", "t_pgpred").option("driver", drv)
      .mode("overwrite").save()
    PgStore.statementLog.clear()
    val got = jdbc("t_pgpred")
      .filter(col("id") > 90 && col("nm").startsWith("name9") &&
        col("flag") === true)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(91L, 98L))
    val reads = PgStore.statementLog.toArray.map(_.toString)
      .filter(s => s.contains("t_pgpred") && s.contains("WHERE"))
    assert(reads.exists(s => s.contains("\"id\"") && s.contains("LIKE") &&
      s.contains("\"flag\"")), reads.mkString("\n"))
    // standard_conforming_strings: a backslash in a literal is LITERAL
    // (MySQL would double it) — the equality must match store-side
    val bs = jdbc("t_pgpred").filter(col("nm") === "a\\b")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(bs == Seq(42L))
  }

  test("DSv2 catalog pushes aggregates, TopN, OFFSET and TABLESAMPLE") {
    import spark.implicits._
    PgStore.drop("t_pgagg")
    (1 to 200).map(i => (i.toLong, s"g${i % 4}", i * 1.0))
      .toDF("id", "grp", "v")
      .write.format("jdbc").option("url", url)
      .option("dbtable", "t_pgagg").option("driver", drv)
      .mode("overwrite").save()
    spark.conf.set("spark.sql.catalog.graft_pg",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.graft_pg.url", url)
    spark.conf.set("spark.sql.catalog.graft_pg.driver", drv)
    spark.conf.set("spark.sql.catalog.graft_pg.pushDownAggregate", "true")
    spark.conf.set("spark.sql.catalog.graft_pg.pushDownLimit", "true")
    spark.conf.set("spark.sql.catalog.graft_pg.pushDownOffset", "true")
    spark.conf.set("spark.sql.catalog.graft_pg.pushDownTableSample", "true")
    PgStore.statementLog.clear()
    val agg = spark.sql(
      """SELECT grp, count(*) AS n, cast(sum(id) as bigint) AS id_sum,
        |  round(var_samp(id), 4) AS vv
        |FROM graft_pg.g.t_pgagg GROUP BY grp ORDER BY grp""".stripMargin)
    assert(agg.queryExecution.executedPlan.treeString
      .contains("PushedAggregates"))
    val rows = agg.collect()
    assert(rows.length == 4 && rows.map(_.getLong(1)).sum == 200L)
    assert(rows.find(_.getString(0) == "g0").get.getLong(2) == 5100L)
    val remote = PgStore.statementLog.toArray.map(_.toString)
    assert(remote.exists(s => s.contains("GROUP BY") &&
      s.contains("VAR_SAMP") && s.contains("\"grp\"")),
      remote.mkString("\n"))
    // TopN + OFFSET page in one remote statement
    PgStore.statementLog.clear()
    val page = spark.sql(
      """SELECT id FROM graft_pg.g.t_pgagg
        |ORDER BY v DESC LIMIT 3 OFFSET 2""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(page == Seq(198L, 197L, 196L))
    val remote2 = PgStore.statementLog.toArray.map(_.toString)
    assert(remote2.exists(s => s.contains("ORDER BY") &&
      s.contains("LIMIT 3") && s.contains("OFFSET 2")),
      remote2.mkString("\n"))
    // TABLESAMPLE BERNOULLI pushes whole and REPEATABLE is exactly
    // that: the same seed drains the same rows, a different seed a
    // (generally) different subset; 100% keeps everything
    PgStore.statementLog.clear()
    val t = spark.table("graft_pg.g.t_pgagg")
    val a1 = t.sample(0.5, 7L).select("id").collect().map(_.getLong(0)).toSeq
    val a2 = t.sample(0.5, 7L).select("id").collect().map(_.getLong(0)).toSeq
    assert(a1 == a2 && a1.nonEmpty && a1.size < 200)
    assert(t.sample(1.0, 9L).count() == 200L)
    val remote3 = PgStore.statementLog.toArray.map(_.toString)
    assert(remote3.exists(
      _.contains("TABLESAMPLE BERNOULLI (50.0) REPEATABLE (7)")),
      remote3.mkString("\n"))
  }

  test("temporal/decimal round-trip and the TRUNCATE ONLY lifecycle") {
    import spark.implicits._
    PgStore.drop("t_pgtime")
    Seq((1L, java.sql.Date.valueOf("2024-03-01"),
      java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789"),
      new java.math.BigDecimal("12345.67")))
      .toDF("k", "d", "ts", "dec")
      .withColumn("dec", col("dec").cast("decimal(10,2)"))
      .write.format("jdbc").option("url", url)
      .option("dbtable", "t_pgtime").option("driver", drv)
      .mode("overwrite").save()
    val ddl = PgStore.ddlLog.get("t_pgtime")
    // TimestampType lands as the dialect's WITH TIME ZONE form
    assert(ddl.contains("TIMESTAMP WITH TIME ZONE") &&
      ddl.contains("NUMERIC(10,2)") && ddl.contains("DATE"), ddl)
    val back = jdbc("t_pgtime").collect()(0)
    assert(back.getDate(1).toString == "2024-03-01")
    assert(back.getTimestamp(2).toString == "2024-03-01 12:34:56.789")
    assert(back.getDecimal(3).toString == "12345.67")
    // overwrite with truncate: the dialect's TRUNCATE TABLE ONLY
    PgStore.statementLog.clear()
    Seq((2L, java.sql.Date.valueOf("2025-01-01"),
      java.sql.Timestamp.valueOf("2025-01-01 00:00:00"),
      new java.math.BigDecimal("9.99")))
      .toDF("k", "d", "ts", "dec")
      .withColumn("dec", col("dec").cast("decimal(10,2)"))
      .write.format("jdbc").option("url", url)
      .option("dbtable", "t_pgtime").option("driver", drv)
      .option("truncate", "true").mode("overwrite").save()
    val log = PgStore.statementLog.toArray.map(_.toString)
    assert(log.exists(_.startsWith("TRUNCATE TABLE ONLY")),
      log.mkString("\n"))
    assert(jdbc("t_pgtime").count() == 1)
  }

  test("a multi-arg positional setter fails loudly, never drops a value") {
    // the shim's contract: a 3-arg set* (setObject(i, v, sqlType)) must
    // never be silently no-opped into a NULL insert
    PgStore.drop("t_pgsetter")
    PgStore.create("t_pgsetter", Seq(
      PgStore.ColDef("k", "int8", java.sql.Types.BIGINT, 19, 0,
        signed = true, nullable = true)))
    val conn = new GraftPostgresDriver()
      .connect("jdbc:postgresql://graft-shim/g", new java.util.Properties)
    val ps = conn.prepareStatement(
      """INSERT INTO "t_pgsetter" ("k") VALUES (?)""")
    val e = intercept[java.sql.SQLException] {
      ps.setObject(1, java.lang.Long.valueOf(5L), java.sql.Types.BIGINT)
    }
    assert(e.getMessage.contains("setObject"))
  }
}

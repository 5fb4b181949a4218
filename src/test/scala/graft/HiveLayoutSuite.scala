package graft

import org.apache.spark.sql.functions._

import graft.functions.Registry
import graft.queries.HiveLayout

/** The Hive partitioned-table operations surface: table-suffix system
  * tables (`HiveMetadata.java:407-415,2788-2811`), the
  * create_empty_partition procedure
  * (`CreateEmptyPartitionProcedure.java:95-117`), and
  * insert_existing_partitions_behavior
  * (`HiveSessionProperties.java:106-117`, `HiveMetadata.java:1619-1648`). */
class HiveLayoutSuite extends GraftSuite {

  Registry.install(spark)
  import Registry.prestoStatement

  private def tmp(n: String): String = new java.io.File(
    System.getProperty("java.io.tmpdir"), n).getAbsolutePath

  private def mkPartitioned(name: String): Unit = {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS $name")
    Seq((1L, 1995, "a"), (2L, 1996, "b"), (3L, 1996, "c"))
      .toDF("k", "yr", "v")
      .write.mode("overwrite").option("path", tmp(s"graft_$name"))
      .partitionBy("yr").saveAsTable(name)
  }

  test("t$partitions serves typed partition values from catalog only") {
    mkPartitioned("hls_p")
    val df = prestoStatement(spark,
      """SELECT * FROM "hls_p$partitions" ORDER BY yr""")
    assert(df.schema.fieldNames.toSeq == Seq("yr"))
    assert(df.schema.fields.head.dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1995, 1996))
    // metadata only: the system table's plan never opens a data file
    assert(!df.queryExecution.executedPlan.toString.contains("FileScan"))
    // composes inside a bigger statement (join against the listing)
    val n = prestoStatement(spark,
      """SELECT count(*) AS n FROM hls_p t
        |JOIN "hls_p$partitions" p ON t.yr = p.yr""".stripMargin)
      .collect()(0).getLong(0)
    assert(n == 3L)
  }

  test("t$partitions decodes escaped values; '+' survives") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS hls_esc")
    // a partition value with a literal '+' and one with an escaped
    // character: Hive path escaping is %xx, and '+' must NOT fold to
    // space on read-back
    Seq((1L, "+05:30"), (2L, "a b")).toDF("k", "zone")
      .write.mode("overwrite").option("path", tmp("graft_hls_esc"))
      .partitionBy("zone").saveAsTable("hls_esc")
    val vals = prestoStatement(spark,
      """SELECT * FROM "hls_esc$partitions"""")
      .collect().map(_.getString(0)).toSet
    assert(vals == Set("+05:30", "a b"), vals)
  }

  test("t$partitions on a non-partitioned table is unresolved") {
    spark.sql("DROP TABLE IF EXISTS hls_np")
    spark.sql("CREATE TABLE hls_np (k BIGINT) USING parquet")
    val e = intercept[Exception] {
      prestoStatement(spark, """SELECT * FROM "hls_np$partitions"""")
    }
    assert(e.getMessage.contains("'hls_np$partitions' does not exist"),
      e.getMessage)
  }

  test("t$properties is one key-sorted row of table parameters") {
    mkPartitioned("hls_q")
    spark.sql("ALTER TABLE hls_q SET TBLPROPERTIES " +
      "('zz.last' = '2', 'aa.first' = '1')")
    val df = prestoStatement(spark,
      """SELECT * FROM "hls_q$properties"""")
    val cols = df.schema.fieldNames.toSeq
    assert(cols == cols.sorted, cols)
    assert(cols.contains("aa.first") && cols.contains("zz.last"))
    val row = df.collect() match { case Array(r) => r }
    assert(row.getString(cols.indexOf("aa.first")) == "1")
    assert(row.getString(cols.indexOf("zz.last")) == "2")
  }

  test("t$properties on a view is unresolved like the reference") {
    spark.sql("DROP VIEW IF EXISTS hls_v")
    mkPartitioned("hls_vbase")
    spark.sql("CREATE VIEW hls_v AS SELECT * FROM hls_vbase")
    try {
      val e = intercept[Exception] {
        prestoStatement(spark, """SELECT * FROM "hls_v$properties"""")
      }
      assert(e.getMessage.contains("'hls_v$properties' does not exist"),
        e.getMessage)
    } finally spark.sql("DROP VIEW IF EXISTS hls_v")
  }

  test("create_empty_partition registers a zero-row partition") {
    mkPartitioned("hls_c")
    val db = spark.catalog.currentDatabase
    // named-argument spelling
    prestoStatement(spark,
      s"""CALL system.create_empty_partition(
         |  schema_name => '$db', table_name => 'hls_c',
         |  partition_columns => ARRAY['yr'],
         |  partition_values => ARRAY['2001'])""".stripMargin)
    val parts = spark.sql("SHOW PARTITIONS hls_c").collect()
      .map(_.getString(0)).toSet
    assert(parts.contains("yr=2001"), parts)
    assert(spark.table("hls_c").filter(col("yr") === 2001).count() == 0L)
    // positional spelling + the ALREADY_EXISTS arm
    val dup = intercept[Exception] {
      prestoStatement(spark, s"CALL system.create_empty_partition(" +
        s"'$db', 'hls_c', ARRAY['yr'], ARRAY['2001'])")
    }
    assert(dup.getMessage.contains("Partition already exists"))
    // the INVALID_PROCEDURE_ARGUMENT arm: wrong partition column names
    val bad = intercept[Exception] {
      prestoStatement(spark, s"CALL system.create_empty_partition(" +
        s"'$db', 'hls_c', ARRAY['nope'], ARRAY['1'])")
    }
    assert(bad.getMessage
      .contains("doesn't match actual partition column names"))
    // unknown procedures stay loud
    val unk = intercept[Exception] {
      prestoStatement(spark, "CALL system.no_such_procedure('x')")
    }
    assert(unk.getMessage.contains("Procedure not registered"))
  }

  test("insert_existing_partitions_behavior: three arms") {
    import spark.implicits._
    mkPartitioned("hls_i")
    def rows(yr: Int, ks: Long*) =
      ks.map(k => (k, yr, "n")).toDF("k", "yr", "v")
    // ERROR refuses an existing partition with the reference's text...
    val e = intercept[Exception] {
      HiveLayout.insertExisting(spark, "hls_i", rows(1996, 9L), "yr",
        behavior = Some("ERROR"))
    }
    assert(e.getMessage.contains(
      "Cannot insert into an existing partition of Hive table: yr=1996"))
    // ...but admits a brand-new one
    HiveLayout.insertExisting(spark, "hls_i", rows(1997, 7L), "yr",
      behavior = Some("ERROR"))
    assert(spark.table("hls_i").filter($"yr" === 1997).count() == 1L)
    // APPEND lands beside existing rows
    HiveLayout.insertExisting(spark, "hls_i", rows(1996, 8L), "yr",
      behavior = Some("APPEND"))
    assert(spark.table("hls_i").filter($"yr" === 1996).count() == 3L)
    // OVERWRITE replaces ONLY the touched partition
    HiveLayout.insertExisting(spark, "hls_i", rows(1996, 6L), "yr",
      behavior = Some("OVERWRITE"))
    assert(spark.table("hls_i").filter($"yr" === 1996).count() == 1L)
    assert(spark.table("hls_i").filter($"yr" === 1995).count() == 1L)
    assert(spark.table("hls_i").filter($"yr" === 1997).count() == 1L)
    // an out-of-enum behavior is loud, like the reference's valueOf
    val badArm = intercept[Exception] {
      HiveLayout.insertExisting(spark, "hls_i", rows(1999, 1L), "yr",
        behavior = Some("UPSERT"))
    }
    assert(badArm.getMessage.contains("No enum constant"))
  }

  test("metadata delete drops whole partitions without touching data") {
    import spark.implicits._
    mkPartitioned("hls_d")
    val dataDir = new java.io.File(tmp("graft_hls_d"), "yr=1996")
    val before = dataDir.list().toSet
    // partition-only predicate -> MetadataDeleteOptimizer arm: catalog
    // drop, zero data I/O (the files stay byte-identical)
    val dropped = HiveLayout.delete(spark, "hls_d", col("yr") === 1996)
    assert(dropped == 1L)
    assert(spark.table("hls_d").filter($"yr" === 1996).count() == 0L)
    assert(dataDir.list().toSet == before && before.nonEmpty)
    assert(!spark.sql("SHOW PARTITIONS hls_d").collect()
      .map(_.getString(0)).contains("yr=1996"))
    // deleting an already-dropped partition matches nothing
    assert(HiveLayout.delete(spark, "hls_d", col("yr") === 1996) == 0L)
  }

  test("row-path delete rewrites ONLY the touched partitions") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS hls_r")
    Seq((1L, 1995, "a"), (2L, 1995, "b"), (3L, 1996, "c"),
      (4L, 1996, "d"), (5L, 1997, "e"))
      .toDF("k", "yr", "v")
      .write.mode("overwrite").option("path", tmp("graft_hls_r"))
      .partitionBy("yr").saveAsTable("hls_r")
    val dir1995 = new java.io.File(tmp("graft_hls_r"), "yr=1995")
    val before1995 = dir1995.list().toSet
    // mixed predicate -> copy-on-write, scoped to 1996
    val dropped = HiveLayout.delete(spark, "hls_r",
      col("k") % 2 === 0 && col("yr") === 1996)
    assert(dropped == 0L)
    assert(spark.table("hls_r").filter($"yr" === 1996)
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // the untouched partition's files are byte-identical
    assert(dir1995.list().toSet == before1995)
    // a row delete matching a WHOLE partition drops it
    HiveLayout.delete(spark, "hls_r", col("k") > 0 && col("yr") === 1997)
    assert(!spark.sql("SHOW PARTITIONS hls_r").collect()
      .map(_.getString(0)).contains("yr=1997"))
    assert(spark.table("hls_r").count() == 3L)
  }

  test("behavior defaults from the SET SESSION registry") {
    import spark.implicits._
    mkPartitioned("hls_s")
    // registry default is APPEND (HiveSessionProperties:150-155)
    assert(Registry.sessionPropValue(spark,
      "insert_existing_partitions_behavior") == "APPEND")
    prestoStatement(spark,
      "SET SESSION insert_existing_partitions_behavior = 'ERROR'")
    try {
      val e = intercept[Exception] {
        HiveLayout.insertExisting(spark, "hls_s",
          Seq((9L, 1996, "x")).toDF("k", "yr", "v"), "yr")
      }
      assert(e.getMessage.contains("Cannot insert into an existing"))
      // SET validates the enum at set time
      val bad = intercept[Exception] {
        prestoStatement(spark,
          "SET SESSION insert_existing_partitions_behavior = 'MERGE'")
      }
      assert(bad.getMessage.contains("No enum constant"))
    } finally prestoStatement(spark,
      "RESET SESSION insert_existing_partitions_behavior")
    assert(Registry.sessionPropValue(spark,
      "insert_existing_partitions_behavior") == "APPEND")
  }
}

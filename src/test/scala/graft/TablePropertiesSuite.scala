package graft

import org.apache.spark.sql.functions._

import graft.functions.Registry

/** CREATE TABLE ... WITH (properties) — the Hive table-layout DDL
  * surface (`presto-hive/.../HiveTableProperties.java:42-51`) through
  * the statement router: format/partitioned_by/bucketed_by/
  * bucket_count/sorted_by/external_location/preferred_ordering_columns/
  * orc bloom properties, the reference's validation arms
  * (`getBucketProperty:173-195`, `getPreferredOrderingColumns:219-231`,
  * `HiveMetadata.java:2668`, `AbstractPropertyManager.java:92`), and
  * the sorted write contract (`SortingFileWriter`). */
class TablePropertiesSuite extends GraftSuite {

  Registry.install(spark)
  import Registry.prestoStatement

  // wiped once per name per suite run (CTAS refuses a non-empty
  // location); later calls return the path without touching it
  private val wiped = scala.collection.mutable.Set.empty[String]
  private def tmp(n: String): String = {
    val f = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_tps_$n")
    if (wiped.add(n)) org.apache.commons.io.FileUtils.deleteQuietly(f)
    f.getAbsolutePath
  }

  private def errorOf(sql: String): String =
    intercept[Exception](prestoStatement(spark, sql)).getMessage

  /** Per-file monotonicity over a parquet directory (ascending unless
    * `desc`); scan partitions concatenate whole files, so the check
    * resets at each file boundary. */
  private def filesSorted(path: String, column: String,
      desc: Boolean = false): Boolean = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(col(column).cast("long"), col("_metadata.file_path"))
      .as[(Long, String)]
      .mapPartitions { it =>
        var ok = true
        var pf: String = null
        var pk = if (desc) Long.MaxValue else Long.MinValue
        it.foreach { case (k, fp) =>
          if (fp != pf) {
            pf = fp; pk = if (desc) Long.MaxValue else Long.MinValue
          }
          if (if (desc) k > pk else k < pk) ok = false
          pk = k
        }
        Iterator.single(ok)
      }.reduce(_ && _)
  }

  test("plain column-definition form translates Presto type spellings") {
    spark.sql("DROP TABLE IF EXISTS tps_plain")
    prestoStatement(spark,
      s"""CREATE TABLE tps_plain (id bigint NOT NULL, name varchar,
         |  tags array(varchar), price decimal(10,2),
         |  meta map(varchar, bigint))
         |WITH (format = 'PARQUET',
         |      external_location = '${tmp("plain")}')""".stripMargin)
    val schema = spark.table("tps_plain").schema
    assert(schema.simpleString == "struct<id:bigint,name:string," +
      "tags:array<string>,price:decimal(10,2),meta:map<string,bigint>>")
    // NOT NULL is accepted through the DDL; Spark's v1 file-source
    // catalog normalizes file-backed columns to nullable (its own
    // parquet stance), so acceptance — not retention — is the contract
    spark.sql("INSERT INTO tps_plain VALUES " +
      "(1, 'a', array('x'), 1.50, map('k', 2))")
    assert(spark.table("tps_plain").count() == 1)
  }

  test("the reference's default storage format is ORC") {
    // HiveClientConfig.java:86 — hiveStorageFormat defaults to ORC
    spark.sql("DROP TABLE IF EXISTS tps_orc")
    prestoStatement(spark,
      s"""CREATE TABLE tps_orc WITH (
         |  external_location = '${tmp("orc")}',
         |  orc_bloom_filter_columns = ARRAY['k'],
         |  orc_bloom_filter_fpp = 0.02)
         |AS SELECT 1 AS k""".stripMargin)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("tps_orc"))
    assert(meta.provider.contains("orc"))
    // the bloom properties ride as the ORC writer's own options
    assert(meta.storage.properties.get("orc.bloom.filter.columns")
      .contains("k"))
    assert(meta.storage.properties.get("orc.bloom.filter.fpp")
      .contains("0.02"))
    assert(spark.table("tps_orc").count() == 1)
  }

  test("JSON and TEXTFILE formats round-trip values") {
    spark.sql("DROP TABLE IF EXISTS tps_json")
    prestoStatement(spark,
      s"""CREATE TABLE tps_json WITH (format = 'JSON',
         |  external_location = '${tmp("json")}')
         |AS SELECT 7 AS k, 'seven' AS v""".stripMargin)
    assert(spark.table("tps_json").collect().map(r =>
      (r.getInt(0), r.getString(1))).toSeq == Seq((7, "seven")))
    spark.sql("DROP TABLE IF EXISTS tps_text")
    prestoStatement(spark,
      s"""CREATE TABLE tps_text WITH (format = 'TEXTFILE',
         |  external_location = '${tmp("text")}')
         |AS SELECT 'a' AS x, 'b' AS y""".stripMargin)
    assert(spark.table("tps_text").collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq == Seq(("a", "b")))
    // LazySimpleSerDe's  field delimiter, not a comma
    val raw = spark.read.text(tmp("text"))
    assert(raw.collect().head.getString(0).contains('\u0001'))
  }

  test("CTAS column aliases rename positionally; WITH NO DATA keeps schema only") {
    spark.sql("DROP TABLE IF EXISTS tps_alias")
    prestoStatement(spark,
      s"""CREATE TABLE tps_alias (first_key, flag)
         |WITH (format = 'PARQUET', external_location = '${tmp("alias")}')
         |AS SELECT 42 AS a, 'Y' AS b""".stripMargin)
    assert(spark.table("tps_alias").columns.toSeq ==
      Seq("first_key", "flag"))
    spark.sql("DROP TABLE IF EXISTS tps_nodata")
    prestoStatement(spark,
      s"""CREATE TABLE tps_nodata WITH (format = 'PARQUET',
         |  external_location = '${tmp("nodata")}')
         |AS SELECT 1 AS k, 'v' AS v WITH NO DATA""".stripMargin)
    assert(spark.table("tps_nodata").columns.toSeq == Seq("k", "v"))
    assert(spark.table("tps_nodata").count() == 0)
  }

  test("partitioned_by CTAS registers real partitions") {
    spark.sql("DROP TABLE IF EXISTS tps_part")
    prestoStatement(spark,
      s"""CREATE TABLE tps_part WITH (format = 'PARQUET',
         |  external_location = '${tmp("part")}',
         |  partitioned_by = ARRAY['yr'])
         |AS SELECT o_orderkey, year(o_orderdate) AS yr
         |   FROM parquet.`$SfDir/orders.parquet`
         |   WHERE year(o_orderdate) IN (1995, 1996)""".stripMargin)
    assert(spark.sql("SHOW PARTITIONS tps_part").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("yr=1995", "yr=1996"))
  }

  test("sorted_by DESC writes descending bucket files") {
    spark.sql("DROP TABLE IF EXISTS tps_desc")
    prestoStatement(spark,
      s"""CREATE TABLE tps_desc WITH (format = 'PARQUET',
         |  external_location = '${tmp("desc")}',
         |  bucketed_by = ARRAY['o_orderkey'], bucket_count = 4,
         |  sorted_by = ARRAY['o_orderkey DESC'])
         |AS SELECT o_orderkey, o_orderstatus
         |   FROM parquet.`$SfDir/orders.parquet`""".stripMargin)
    assert(filesSorted(tmp("desc"), "o_orderkey", desc = true))
    // one writer per bucket (HiveWriterFactory): exactly 4 data files
    assert(new java.io.File(tmp("desc")).listFiles()
      .count(_.getName.startsWith("part-")) == 4)
    // the DESC spec survives the catalog via the graft.sorted_by
    // parameter: SHOW CREATE renders it and a later INSERT through the
    // router keeps every new bucket file descending
    val ddl = prestoStatement(spark, "SHOW CREATE TABLE tps_desc")
      .collect()(0).getString(0)
    assert(ddl.contains("sorted_by = ARRAY['o_orderkey DESC']"), ddl)
    prestoStatement(spark,
      s"""INSERT INTO tps_desc
         |SELECT o_orderkey + 1000000, o_orderstatus
         |FROM parquet.`$SfDir/orders.parquet`""".stripMargin)
    assert(filesSorted(tmp("desc"), "o_orderkey", desc = true))
    assert(new java.io.File(tmp("desc")).listFiles()
      .count(_.getName.startsWith("part-")) == 8)
  }

  test("preferred_ordering_columns sorts unbucketed writer output") {
    spark.sql("DROP TABLE IF EXISTS tps_pref")
    prestoStatement(spark,
      s"""CREATE TABLE tps_pref WITH (format = 'PARQUET',
         |  external_location = '${tmp("pref")}',
         |  preferred_ordering_columns = ARRAY['o_orderkey'])
         |AS SELECT o_orderkey, o_orderstatus
         |   FROM parquet.`$SfDir/orders.parquet`""".stripMargin)
    assert(filesSorted(tmp("pref"), "o_orderkey"))
  }

  test("property validation replays the reference's texts and order") {
    // getBucketProperty:173-195
    assert(errorOf("CREATE TABLE tps_e1 WITH (sorted_by = ARRAY['x']) " +
      "AS SELECT 1 AS x").contains(
      "sorted_by may be specified only when bucketed_by is specified"))
    assert(errorOf("CREATE TABLE tps_e2 WITH (bucketed_by = ARRAY['x']) " +
      "AS SELECT 1 AS x").contains(
      "bucketed_by and bucket_count must be specified together"))
    assert(errorOf("CREATE TABLE tps_e3 WITH (bucket_count = 4) " +
      "AS SELECT 1 AS x").contains(
      "bucketed_by and bucket_count must be specified together"))
    assert(errorOf("CREATE TABLE tps_e4 WITH (bucketed_by = ARRAY['x'], " +
      "bucket_count = -2) AS SELECT 1 AS x").contains(
      "bucket_count must be greater than zero"))
    assert(errorOf("CREATE TABLE tps_e5 WITH (bucketed_by = ARRAY['x'], " +
      "bucket_count = 1000001) AS SELECT 1 AS x").contains(
      "bucket_count should be no more than 1000000"))
    // AbstractPropertyManager.java:92
    assert(errorOf("CREATE TABLE tps_e6 WITH (shiny = 'yes') " +
      "AS SELECT 1 AS x").contains(
      "Catalog 'hive' does not support table property 'shiny'"))
    // format is HiveStorageFormat.valueOf; serde members are a
    // documented descope (the RCFile rationale)
    assert(errorOf("CREATE TABLE tps_e7 WITH (format = 'EXCEL') " +
      "AS SELECT 1 AS x").contains(
      "Cannot convert 'EXCEL' to HiveStorageFormat"))
    assert(errorOf("CREATE TABLE tps_e8 WITH (format = 'RCBINARY') " +
      "AS SELECT 1 AS x").contains("documented descope"))
    // HiveMetadata.java:2668
    assert(errorOf("CREATE TABLE tps_e9 WITH (partitioned_by = " +
      "ARRAY['a']) AS SELECT 1 AS a, 2 AS b").contains(
      "Partition keys must be the last columns in the table and in the " +
        "same order as the table properties: [a]"))
    // getPreferredOrderingColumns:219-231
    assert(errorOf("CREATE TABLE tps_ea WITH (bucketed_by = ARRAY['a'], " +
      "bucket_count = 2, preferred_ordering_columns = ARRAY['b']) " +
      "AS SELECT 1 AS a, 2 AS b").contains(
      "preferred_ordering_columns must not be specified when bucketed_by" +
        " is specified"))
    // HiveMetadata.java:958
    assert(errorOf("CREATE TABLE tps_eb WITH (avro_schema_url = 'u') " +
      "AS SELECT 1 AS a").contains(
      "Cannot specify avro_schema_url table property for storage " +
        "format: ORC"))
  }

  test("IF NOT EXISTS is a no-op on an existing table") {
    spark.sql("DROP TABLE IF EXISTS tps_ine")
    prestoStatement(spark,
      s"""CREATE TABLE tps_ine WITH (format = 'PARQUET',
         |  external_location = '${tmp("ine")}')
         |AS SELECT 1 AS k""".stripMargin)
    prestoStatement(spark,
      s"""CREATE TABLE IF NOT EXISTS tps_ine WITH (format = 'PARQUET',
         |  external_location = '${tmp("ine2")}')
         |AS SELECT 2 AS k""".stripMargin)
    assert(spark.table("tps_ine").collect().map(_.getInt(0)).toSeq ==
      Seq(1))
  }

  test("column COMMENT rides the definition; partition x bucket pruning compose") {
    spark.sql("DROP TABLE IF EXISTS tps_cc")
    prestoStatement(spark,
      s"""CREATE TABLE tps_cc (k bigint NOT NULL COMMENT 'the key',
         |  flag varchar COMMENT 'status flag', v double)
         |WITH (format = 'PARQUET',
         |      external_location = '${tmp("cc")}',
         |      partitioned_by = ARRAY['v'])""".stripMargin)
    val byName = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("tps_cc"))
      .schema.map(f => f.name -> f.getComment()).toMap
    assert(byName("k").contains("the key"))
    assert(byName("flag").contains("status flag"))
    // the 100 TB read path: a statement-created partitioned+bucketed
    // layout prunes on BOTH axes at once — the scan reads one
    // partition directory AND one bucket file of it
    spark.sql("DROP TABLE IF EXISTS tps_px")
    prestoStatement(spark,
      s"""CREATE TABLE tps_px WITH (format = 'PARQUET',
         |  external_location = '${tmp("px")}',
         |  partitioned_by = ARRAY['yr'],
         |  bucketed_by = ARRAY['o_orderkey'], bucket_count = 8)
         |AS SELECT o_orderkey, o_totalprice, year(o_orderdate) AS yr
         |   FROM parquet.`$SfDir/orders.parquet`
         |   WHERE year(o_orderdate) IN (1995, 1996)""".stripMargin)
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val plan = spark.table("tps_px")
        .filter(col("yr") === 1995 && col("o_orderkey") === 42L)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan)
      assert(plan.contains("PartitionFilters: [isnotnull(yr"), plan)
    } finally spark.conf.set(key, prev)
  }

  test("LIKE expands source columns; INCLUDING PROPERTIES inherits layout") {
    spark.sql("DROP TABLE IF EXISTS tps_like_src")
    spark.sql("DROP TABLE IF EXISTS tps_like1")
    spark.sql("DROP TABLE IF EXISTS tps_like2")
    prestoStatement(spark,
      s"""CREATE TABLE tps_like_src WITH (format = 'PARQUET',
         |  external_location = '${tmp("likesrc")}',
         |  bucketed_by = ARRAY['k'], bucket_count = 4,
         |  sorted_by = ARRAY['k'])
         |AS SELECT 1 AS k, 'a' AS v""".stripMargin)
    // EXCLUDING (the default): columns at position, no layout carried
    prestoStatement(spark,
      s"""CREATE TABLE tps_like1 (id bigint, LIKE tps_like_src,
         |  extra varchar)
         |WITH (format = 'PARQUET',
         |      external_location = '${tmp("like1")}')""".stripMargin)
    assert(spark.table("tps_like1").columns.toSeq ==
      Seq("id", "k", "v", "extra"))
    val m1 = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("tps_like1"))
    assert(m1.bucketSpec.isEmpty)
    // INCLUDING PROPERTIES: bucket layout inherits; the explicit WITH
    // key overrides the inherited one (combineProperties:205-215)
    prestoStatement(spark,
      s"""CREATE TABLE tps_like2 (LIKE tps_like_src INCLUDING PROPERTIES)
         |WITH (bucket_count = 8,
         |      external_location = '${tmp("like2")}')""".stripMargin)
    val m2 = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("tps_like2"))
    assert(m2.provider.exists(_.equalsIgnoreCase("parquet")))
    assert(m2.bucketSpec.exists(b => b.numBuckets == 8 &&
      b.bucketColumnNames == Seq("k") && b.sortColumnNames == Seq("k")))
    // the reference's loud arms
    assert(errorOf("CREATE TABLE tps_le1 (k bigint, LIKE tps_like_src) " +
      s"WITH (format = 'PARQUET')").contains(
      "Column name 'k' specified more than once"))
    assert(errorOf("CREATE TABLE tps_le2 (LIKE tps_like_src INCLUDING " +
      "PROPERTIES, LIKE tps_like1 INCLUDING PROPERTIES) " +
      "WITH (format = 'PARQUET')").contains(
      "Only one LIKE clause can specify INCLUDING PROPERTIES"))
    assert(errorOf("CREATE TABLE tps_le3 (LIKE tps_no_such_table) " +
      "WITH (format = 'PARQUET')").contains(
      "LIKE table 'tps_no_such_table' does not exist"))
  }

  test("SHOW CREATE TABLE round-trips the property surface") {
    // create via WITH (...) -> SHOW CREATE renders the same properties
    // -> the rendered text re-executes and reproduces the layout
    spark.sql("DROP TABLE IF EXISTS tps_rt")
    spark.sql("DROP TABLE IF EXISTS tps_rt2")
    prestoStatement(spark,
      s"""CREATE TABLE tps_rt WITH (format = 'PARQUET',
         |  external_location = '${tmp("rt")}',
         |  partitioned_by = ARRAY['flag'],
         |  bucketed_by = ARRAY['k'], bucket_count = 4,
         |  sorted_by = ARRAY['k'])
         |AS SELECT o_orderkey AS k, o_totalprice AS price,
         |          o_orderstatus AS flag
         |   FROM parquet.`$SfDir/orders.parquet`""".stripMargin)
    val ddl = prestoStatement(spark, "SHOW CREATE TABLE tps_rt")
      .collect()(0).getString(0)
    assert(ddl.contains("format = 'PARQUET'"), ddl)
    assert(ddl.contains("partitioned_by = ARRAY['flag']"), ddl)
    assert(ddl.contains("bucketed_by = ARRAY['k']"), ddl)
    assert(ddl.contains("bucket_count = 4"), ddl)
    assert(ddl.contains("sorted_by = ARRAY['k']"), ddl)
    assert(ddl.contains("external_location ="), ddl)
    // re-execute against a new name/location; Presto's SHOW CREATE is
    // a runnable statement, so the clone must carry the whole layout
    val clone = ddl
      .replace("tps_rt", "tps_rt2")
      .replaceAll("external_location = '[^']*'",
        s"external_location = '${tmp("rt2")}'")
    prestoStatement(spark, clone)
    val m = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("tps_rt2"))
    assert(m.partitionColumnNames == Seq("flag"))
    assert(m.bucketSpec.exists(b => b.numBuckets == 4 &&
      b.bucketColumnNames == Seq("k") && b.sortColumnNames == Seq("k")))
    assert(m.provider.exists(_.equalsIgnoreCase("parquet")))
  }

  test("the property listing is the live CREATE TABLE registry") {
    // system.metadata.table_properties rows must be exactly what the
    // WITH (...) surface accepts: probing each listed name must never
    // produce the unknown-property rejection (a wrong VALUE may be
    // loud, a wrong NAME means the listing lies)
    val listed = prestoStatement(spark,
      "SELECT property_name, type FROM system.metadata.table_properties")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(listed.length == 10)
    listed.foreach { case (name, typ) =>
      val dummy = typ match {
        case "integer" => "4"
        case "double" => "0.5"
        case t if t.startsWith("array") => "ARRAY['x']"
        case _ => "'x'"
      }
      val got = try {
        prestoStatement(spark,
          s"CREATE TABLE tps_probe WITH ($name = $dummy) AS SELECT 1 AS x")
        spark.sql("DROP TABLE IF EXISTS tps_probe")
        ""
      } catch { case e: Exception => e.getMessage }
      assert(!got.contains("does not support table property"),
        s"listed property '$name' rejected as unknown")
    }
    // schema/analyze listings and the empty column registry
    assert(prestoStatement(spark,
      "SELECT property_name FROM system.metadata.schema_properties")
      .collect().map(_.getString(0)).toSeq == Seq("location"))
    assert(prestoStatement(spark,
      "SELECT property_name FROM system.metadata.analyze_properties")
      .collect().map(_.getString(0)).toSeq == Seq("partitions"))
    assert(prestoStatement(spark,
      "SELECT * FROM system.metadata.column_properties").count() == 0)
  }

  test("CREATE SCHEMA WITH (location) places managed tables under it") {
    // HiveSchemaProperties.java:29-34 — the schema's base URI; a
    // managed table created inside lands under it
    val loc = tmp("schloc")
    spark.sql("DROP DATABASE IF EXISTS tps_sch CASCADE")
    prestoStatement(spark,
      s"CREATE SCHEMA tps_sch WITH (location = '$loc')")
    spark.sql("CREATE TABLE tps_sch.inner_t USING parquet AS SELECT 1 AS x")
    val m = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        "inner_t", Some("tps_sch")))
    assert(m.storage.locationUri.exists(_.toString.contains("schloc")))
    assert(errorOf("CREATE SCHEMA tps_sch2 WITH (owner = 'bob')")
      .contains("Catalog 'hive' does not support schema property 'owner'"))
    spark.sql("DROP DATABASE tps_sch CASCADE")
  }

  test("bucketed groupBy on the bucket key plans no exchange") {
    // the aggregation half of the bucketing dividend: grouping by the
    // bucket key over the statement-created layout reuses the scan's
    // hash placement — zero exchanges (at 100 TB the agg shuffle is
    // gone, the same way qk0 deletes the join shuffle)
    spark.sql("DROP TABLE IF EXISTS tps_agg")
    prestoStatement(spark,
      s"""CREATE TABLE tps_agg WITH (format = 'PARQUET',
         |  external_location = '${tmp("agg")}',
         |  bucketed_by = ARRAY['o_orderkey'], bucket_count = 4)
         |AS SELECT o_orderkey, o_totalprice
         |   FROM parquet.`$SfDir/orders.parquet`""".stripMargin)
    val agg = spark.table("tps_agg")
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("SelectedBucketsCount: 4 out of 4"), plan)
  }

  test("review arms: empty WITH, duplicate keys, huge bucket_count, case") {
    // ANALYZE t WITH () is a whole-table analyze, not a partition list
    prestoStatement(spark, "CREATE OR REPLACE TEMPORARY VIEW tps_unpart " +
      s"AS SELECT * FROM parquet.`$SfDir/nation.parquet`")
    spark.sql("DROP TABLE IF EXISTS tps_wt")
    prestoStatement(spark,
      s"""CREATE TABLE tps_wt WITH (format = 'PARQUET',
         |  external_location = '${tmp("wt")}')
         |AS SELECT n_nationkey FROM tps_unpart""".stripMargin)
    prestoStatement(spark, "ANALYZE tps_wt WITH ()")
    assert(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("tps_wt"))
      .stats.flatMap(_.rowCount).exists(_.toLong > 0))
    // duplicate property names are the reference's loud arm
    assert(errorOf("CREATE TABLE tps_dup WITH (format = 'PARQUET', " +
      "format = 'ORC') AS SELECT 1 AS x")
      .contains("Duplicate property: format"))
    // out-of-int-range bucket_count fails at decode, never truncates
    assert(errorOf("CREATE TABLE tps_big WITH (bucketed_by = ARRAY['x']," +
      " bucket_count = 4294967297) AS SELECT 1 AS x").contains(
      "Cannot convert '4294967297' to integer"))
    // system-table spellings are case-insensitive
    assert(prestoStatement(spark,
      "SELECT property_name FROM SYSTEM.METADATA.TABLE_PROPERTIES")
      .count() == 10)
  }

  test("preferred ordering persists and sorts later INSERTs") {
    // the reference stores preferred_ordering_columns in table
    // parameters (HiveMetadata.java:1076) and SortingFileWriter sorts
    // EVERY write; here the plain-form table carries the parameter,
    // SHOW CREATE renders it back, and an INSERT through the router
    // lands per-writer-sorted files
    spark.sql("DROP TABLE IF EXISTS tps_po")
    val loc = tmp("po")
    prestoStatement(spark,
      s"""CREATE TABLE tps_po (k bigint, v varchar)
         |WITH (format = 'PARQUET', external_location = '$loc',
         |      preferred_ordering_columns = ARRAY['k DESC'])""".stripMargin)
    val ddl = prestoStatement(spark, "SHOW CREATE TABLE tps_po")
      .collect()(0).getString(0)
    assert(ddl.contains("preferred_ordering_columns = ARRAY['k DESC']"),
      ddl)
    prestoStatement(spark,
      s"""INSERT INTO tps_po
         |SELECT o_orderkey, o_orderstatus
         |FROM parquet.`$SfDir/orders.parquet`""".stripMargin)
    assert(spark.table("tps_po").count() > 0)
    assert(filesSorted(loc, "k", desc = true))
    // a column-list insert sorts too (aliases bind positionally);
    // the Presto-quoted spelling rebuilds with backticks, and duplicate
    // SOURCE names never go ambiguous (positional subquery aliases)
    prestoStatement(spark,
      "INSERT INTO tps_po (\"k\", \"v\") SELECT o_orderkey * 10, " +
        "CAST(o_orderkey AS VARCHAR) AS o_orderkey " +
        s"FROM parquet.`$SfDir/orders.parquet`")
    assert(filesSorted(loc, "k", desc = true))
  }

  test("sorted inserts respect qualified names and partition columns") {
    // a schema-qualified INSERT must land in THAT schema's table, not a
    // same-named table in the current database
    spark.sql("DROP DATABASE IF EXISTS tps_qdb CASCADE")
    spark.sql("CREATE DATABASE tps_qdb")
    spark.sql("DROP TABLE IF EXISTS tps_qt")
    prestoStatement(spark,
      s"""CREATE TABLE tps_qt (k bigint)
         |WITH (format = 'PARQUET', external_location = '${tmp("qt0")}',
         |      preferred_ordering_columns = ARRAY['k'])""".stripMargin)
    prestoStatement(spark,
      s"""CREATE TABLE tps_qdb.tps_qt (k bigint)
         |WITH (format = 'PARQUET', external_location = '${tmp("qt1")}',
         |      preferred_ordering_columns = ARRAY['k'])""".stripMargin)
    prestoStatement(spark, "INSERT INTO tps_qdb.tps_qt VALUES (3), (1)")
    assert(spark.table("tps_qdb.tps_qt").count() == 2)
    assert(spark.table("tps_qt").count() == 0)
    // a PARTITIONED preferred-ordering table sorts within each
    // partition: the writer's own partition ordering leads the sort
    spark.sql("DROP TABLE IF EXISTS tps_pp")
    val ploc = tmp("pp")
    prestoStatement(spark,
      s"""CREATE TABLE tps_pp (k bigint, flag varchar)
         |WITH (format = 'PARQUET', external_location = '$ploc',
         |      partitioned_by = ARRAY['flag'],
         |      preferred_ordering_columns = ARRAY['k'])""".stripMargin)
    prestoStatement(spark,
      s"""INSERT INTO tps_pp
         |SELECT o_orderkey, o_orderstatus
         |FROM parquet.`$SfDir/orders.parquet`""".stripMargin)
    assert(spark.table("tps_pp").count() > 0)
    assert(filesSorted(ploc, "k"))
    spark.sql("DROP DATABASE tps_qdb CASCADE")
  }

  test("the parser is string-masked against adversarial property values") {
    // quote escapes, trigger-looking text inside values, and nested
    // parens in types must not derail the scanner
    spark.sql("DROP TABLE IF EXISTS tps_adv")
    val loc = tmp("adv")
    prestoStatement(spark,
      s"""CREATE TABLE tps_adv (a decimal(10,2), b varchar)
         |WITH (format = 'PARQUET', external_location = '$loc')""".stripMargin)
    assert(spark.table("tps_adv").schema.simpleString ==
      "struct<a:decimal(10,2),b:string>")
    // a WITH ( that lives inside a string literal is data, not grammar:
    // the bare CTAS must reach the default pipeline untouched
    spark.sql("DROP TABLE IF EXISTS tps_adv2")
    prestoStatement(spark,
      "CREATE TABLE tps_adv2 AS SELECT 'WITH (format = 1)' AS s, " +
        "'it''s (nested [deep])' AS t")
    assert(spark.table("tps_adv2").collect()(0).getString(0) ==
      "WITH (format = 1)")
    spark.sql("DROP TABLE tps_adv2")
    // doubled-quote escape inside a property value round-trips
    spark.sql("DROP TABLE IF EXISTS tps_adv3")
    val weird = tmp("it''s adv3")
    prestoStatement(spark,
      s"""CREATE TABLE tps_adv3 WITH (format = 'PARQUET',
         |  external_location = '${weird.replace("'", "''")}')
         |AS SELECT 1 AS x""".stripMargin)
    assert(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("tps_adv3"))
      .storage.locationUri.exists(_.toString.contains("adv3")))
    // SHOW CREATE re-escapes the quote so its output stays runnable
    val advDdl = prestoStatement(spark, "SHOW CREATE TABLE tps_adv3")
      .collect()(0).getString(0)
    assert(advDdl.contains("it''s") || !advDdl.contains("it's"), advDdl)
    // an AS SELECT whose body CONTAINS 'WITH DATA' in a literal keeps it
    spark.sql("DROP TABLE IF EXISTS tps_adv4")
    prestoStatement(spark,
      s"""CREATE TABLE tps_adv4 WITH (format = 'PARQUET',
         |  external_location = '${tmp("adv4")}')
         |AS SELECT 'ends WITH DATA' AS s""".stripMargin)
    assert(spark.table("tps_adv4").collect()(0).getString(0) ==
      "ends WITH DATA")
  }

  test("a CREATE TABLE without a WITH list stays on the default pipeline") {
    // the property router must not intercept plain statements: a bare
    // CTAS still lands through the rewrite pipeline untouched
    spark.sql("DROP TABLE IF EXISTS tps_noprops")
    prestoStatement(spark, "CREATE TABLE tps_noprops AS SELECT 1 AS x")
    assert(spark.table("tps_noprops").collect().map(_.getInt(0)).toSeq ==
      Seq(1))
    spark.sql("DROP TABLE tps_noprops")
  }

  test("double-quoted property names are the same identifier") {
    // the reference's grammar accepts "p1" = ... and treats it as p1
    // (TestAnalyzer.java:1156 flags the pair a duplicate)
    spark.sql("DROP TABLE IF EXISTS tps_qp")
    prestoStatement(spark,
      s"""CREATE TABLE tps_qp WITH ("format" = 'PARQUET',
         |  "external_location" = '${tmp("qp")}')
         |AS SELECT 1 AS x""".stripMargin)
    assert(spark.table("tps_qp").count() == 1)
    assert(errorOf("CREATE TABLE tps_qp2 WITH (\"format\" = 'PARQUET', " +
      "format = 'ORC') AS SELECT 1 AS x")
      .contains("Duplicate property: format"))
  }

  test("a DESC-bucketed insert missing a bucket column still lands") {
    // the repartition hint must skip (like the bucket-id sort lead)
    // when the insert's column list omits a bucket column — the write
    // then follows the default placement and the column fills NULL
    spark.sql("DROP TABLE IF EXISTS tps_pbi")
    prestoStatement(spark,
      s"""CREATE TABLE tps_pbi (k bigint, v varchar)
         |WITH (format = 'PARQUET', external_location = '${tmp("pbi")}',
         |      bucketed_by = ARRAY['k'], bucket_count = 2,
         |      sorted_by = ARRAY['v DESC'])""".stripMargin)
    prestoStatement(spark,
      "INSERT INTO tps_pbi (v) VALUES ('b'), ('a'), ('c')")
    val rows = spark.table("tps_pbi").collect()
    assert(rows.length == 3 && rows.forall(_.isNullAt(0)))
  }

  test("sorted-insert arity mismatch surfaces Spark's own error") {
    // preparation falls through to the default pipeline ONLY for the
    // intended cases (unanalyzable body, arity mismatch) — the default
    // pipeline then raises its own analysis error instead of the
    // sorted path silently mis-binding columns
    spark.sql("DROP TABLE IF EXISTS tps_ar")
    prestoStatement(spark,
      s"""CREATE TABLE tps_ar (k bigint, v varchar)
         |WITH (format = 'PARQUET', external_location = '${tmp("ar")}',
         |      preferred_ordering_columns = ARRAY['k'])""".stripMargin)
    intercept[Exception](prestoStatement(spark,
      "INSERT INTO tps_ar SELECT 1"))
    assert(spark.table("tps_ar").count() == 0)
  }
}

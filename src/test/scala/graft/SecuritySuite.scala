package graft

import graft.functions.Registry

/** Role/privilege statement family + queryable information_schema
  * (PrestoSecurity): loud-failure guards, transitive role grants, exact
  * SHOW output shapes, and the string-literal mask on the
  * information_schema rewrite. */
class SecuritySuite extends GraftSuite {

  Registry.install(spark)

  private def stmt(sql: String) = Registry.prestoStatement(spark, sql)

  private def reset(): Unit = Registry.resetSecurityState(spark)

  test("duplicate CREATE ROLE / missing DROP ROLE / reserved names fail loudly") {
    reset()
    stmt("CREATE ROLE sec_a")
    val dup = intercept[Exception] { stmt("CREATE ROLE sec_a") }
    assert(dup.getMessage.contains("already exists"))
    val missing = intercept[Exception] { stmt("DROP ROLE sec_phantom") }
    assert(missing.getMessage.contains("does not exist"))
    val reserved = intercept[Exception] { stmt("CREATE ROLE public") }
    assert(reserved.getMessage.contains("reserved"))
    val dropReserved = intercept[Exception] { stmt("DROP ROLE admin") }
    assert(dropReserved.getMessage.contains("reserved"))
  }

  test("SET ROLE requires the role to be granted; ALL/NONE adjust enabled set") {
    reset()
    stmt("CREATE ROLE sec_r1")
    val denied = intercept[Exception] { stmt("SET ROLE sec_r1") }
    assert(denied.getMessage.contains("Cannot set role"))
    val user = spark.sparkContext.sparkUser
    stmt(s"GRANT sec_r1 TO USER $user")
    stmt("SET ROLE sec_r1") // now allowed
    val current = stmt("SHOW CURRENT ROLES").collect().map(_.getString(0))
    assert(current.toSeq == Seq("public", "sec_r1").sorted)
    stmt("SET ROLE NONE")
    assert(stmt("SHOW CURRENT ROLES").collect().map(_.getString(0)).toSeq
      == Seq("public"))
    stmt("SET ROLE ALL")
    assert(stmt("SHOW CURRENT ROLES").collect().map(_.getString(0)).toSeq
      == Seq("public", "sec_r1"))
  }

  test("role-to-role grants reach the user transitively in enabled/applicable") {
    reset()
    val user = spark.sparkContext.sparkUser
    stmt("CREATE ROLE sec_inner")
    stmt("CREATE ROLE sec_outer")
    stmt("GRANT sec_outer TO USER " + user)
    stmt("GRANT sec_inner TO ROLE sec_outer")
    val enabled = stmt("SHOW CURRENT ROLES").collect().map(_.getString(0))
    assert(enabled.contains("sec_inner") && enabled.contains("sec_outer"))
    val applicable = stmt(
      "SELECT role_name FROM information_schema.applicable_roles")
      .collect().map(_.getString(0))
    assert(applicable.contains("sec_inner"))
  }

  test("SHOW GRANTS carries the reference's exact 10-column header") {
    reset()
    stmt("GRANT SELECT ON nation TO USER someone")
    val df = stmt("SHOW GRANTS ON TABLE nation")
    assert(df.columns.toSeq == Seq("Grantor", "Grantor Type", "Grantee",
      "Grantee Type", "Catalog", "Schema", "Table", "Privilege",
      "Grantable", "With Hierarchy"))
    val row = df.collect()(0)
    assert(row.getString(2) == "someone" && row.getString(7) == "SELECT" &&
      row.getString(8) == "NO")
    // revoking a grant that does not exist fails loudly
    val e = intercept[Exception] {
      stmt("REVOKE INSERT ON nation FROM USER someone")
    }
    assert(e.getMessage.contains("no such grant"))
    stmt("REVOKE SELECT ON nation FROM USER someone")
    assert(stmt("SHOW GRANTS ON nation").count() == 0)
  }

  test("REVOKE GRANT OPTION FOR keeps the privilege, drops only the option") {
    reset()
    stmt("GRANT SELECT ON nation TO USER someone WITH GRANT OPTION")
    val before = stmt("SHOW GRANTS ON nation").collect()(0)
    assert(before.getString(7) == "SELECT" && before.getString(8) == "YES")
    stmt("REVOKE GRANT OPTION FOR SELECT ON nation FROM USER someone")
    // reference semantics: the SELECT grant survives, no longer grantable
    val after = stmt("SHOW GRANTS ON nation").collect()
    assert(after.length == 1)
    assert(after(0).getString(7) == "SELECT" && after(0).getString(8) == "NO")
    stmt("REVOKE SELECT ON nation FROM USER someone")
    assert(stmt("SHOW GRANTS ON nation").count() == 0)
  }

  test("catalog-qualified information_schema references resolve") {
    Tables.register(spark, SfDir)
    val n = stmt("SELECT count(*) AS n FROM " +
      "spark_catalog.information_schema.columns WHERE table_name = 'region'")
      .collect()(0).getLong(0)
    assert(n == 2L) // region = (r_regionkey, r_name)
  }

  test("unknown privilege names are rejected") {
    reset()
    val e = intercept[Exception] {
      stmt("GRANT EXECUTE ON nation TO USER someone")
    }
    assert(e.getMessage.contains("Unknown privilege"))
  }

  test("information_schema rewrite is string-literal masked") {
    Tables.register(spark, SfDir)
    // the literal must survive verbatim; the FROM reference must rewrite
    val df = stmt("SELECT 'information_schema.columns' AS s, count(*) AS n " +
      "FROM information_schema.columns WHERE table_name = 'region'")
    val row = df.collect()(0)
    assert(row.getString(0) == "information_schema.columns")
    assert(row.getLong(1) == 2L) // region = (r_regionkey, r_name)
  }

  test("system.runtime.queries logs FAILED statements; kill_query uses the reference texts") {
    Tables.register(spark, SfDir)
    intercept[Exception] {
      stmt("SELECT * FROM graft_no_such_table_xyz").collect()
    }
    val failed = stmt(
      """SELECT count(*) AS n FROM system.runtime.queries
        |WHERE state = 'FAILED'
        |  AND query LIKE '%graft_no_such_table_xyz%'""".stripMargin)
      .collect()(0).getLong(0)
    assert(failed >= 1L)
    val id = stmt("SELECT query_id FROM system.runtime.queries LIMIT 1")
      .collect()(0).getString(0)
    val known = intercept[Exception] {
      stmt(s"CALL system.runtime.kill_query('$id', 'because')")
    }
    assert(known.getMessage.contains(s"Target query is not running: $id"))
    val unknown = intercept[Exception] {
      stmt("CALL system.runtime.kill_query('nope_123')")
    }
    assert(unknown.getMessage.contains("Target query not found: nope_123"))
  }

  test("EXPLAIN FORMAT JSON / GRAPHVIZ render the plan tree") {
    Tables.register(spark, SfDir)
    val json = stmt(
      "EXPLAIN (TYPE LOGICAL, FORMAT JSON) SELECT count(*) FROM region")
      .collect()(0).getString(0)
    assert(json.startsWith("{\"name\":") && json.contains("\"children\":"))
    assert(json.contains("Aggregate"))
    val dot = stmt(
      "EXPLAIN (TYPE DISTRIBUTED, FORMAT GRAPHVIZ) " +
        "SELECT r_name FROM region ORDER BY r_name")
      .collect()(0).getString(0)
    assert(dot.startsWith("digraph distributed_plan {"))
    assert(dot.contains("->") && dot.endsWith("}"))
  }

  test("information_schema.tables and schemata answer catalog facts") {
    Tables.register(spark, SfDir)
    val tbls = stmt("SELECT table_name FROM information_schema.tables " +
      "WHERE table_name IN ('region', 'nation')").collect()
      .map(_.getString(0)).sorted
    assert(tbls.toSeq == Seq("nation", "region"))
    val schemata = stmt(
      "SELECT schema_name FROM information_schema.schemata").collect()
      .map(_.getString(0))
    assert(schemata.contains("default") &&
      schemata.contains("information_schema"))
  }
}

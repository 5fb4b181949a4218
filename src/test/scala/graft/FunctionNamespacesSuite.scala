package graft

import graft.plans.FunctionNamespaces._
import graft.plans.FunctionNamespaceManager
import graft.sources.{GraftMySqlDriver, MySqlStore}

/** The MySQL-backed function namespace manager's contract
  * (`presto-function-namespace-managers/.../mysql/
  * MySqlFunctionNamespaceManager.java`): versioned inserts, logical
  * deletes with in-place undelete, overload identity by parameter
  * types, the namespace precondition, real statements over the MySQL
  * shim wire, and session loading through the CREATE FUNCTION
  * rewrite. */
class FunctionNamespacesSuite extends GraftSuite {

  GraftMySqlDriver.install()

  private val url = "jdbc:mysql://graft-shim/g"
  private val drv = "graft.sources.GraftMySqlDriver"

  private def freshManager(): FunctionNamespaceManager = {
    MySqlStore.drop("function_namespaces")
    MySqlStore.drop("sql_functions")
    val m = new FunctionNamespaceManager(url, drv)
    m.initialize()
    m.createNamespace("graft", "t")
    m
  }

  private def fn(name: String, body: String, rnoni: Boolean = false,
      params: Seq[SqlParam] = Seq(SqlParam("x", "double"))) =
    SqlInvokedFunction("graft", "t", name, params, "double",
      returnsNullOnNullInput = rnoni, body = body)

  /** Every stored version row, deleted or not — through the wire. */
  private def storedVersions: Long = {
    val c = java.sql.DriverManager.getConnection(url)
    val rs = c.createStatement()
      .executeQuery("SELECT count(*) FROM sql_functions")
    rs.next(); rs.getLong(1)
  }

  test("create versions monotonically; identical replace is a no-op") {
    val m = freshManager()
    m.createFunction(fn("f1", "x + 1.0"), replace = false)
    assert(m.listFunctions().head.version.contains(1L))
    // identical definition: NO new version
    m.createFunction(fn("f1", "x + 1.0"), replace = true)
    assert(m.listFunctions().head.version.contains(1L))
    // changed definition: version 2
    m.createFunction(fn("f1", "x + 2.0"), replace = true)
    val v2 = m.listFunctions().head
    assert(v2.version.contains(2L) && v2.body == "x + 2.0")
    // duplicate create without replace is the reference's error
    val e = intercept[IllegalStateException] {
      m.createFunction(fn("f1", "x"), replace = false)
    }
    assert(e.getMessage.startsWith("Function already exists:"))
  }

  test("drop is logical; identical re-create undeletes in place") {
    val m = freshManager()
    m.createFunction(fn("f2", "x * 3.0"), replace = false)
    m.createFunction(fn("f2", "x * 4.0"), replace = true) // v2
    m.dropFunction("graft", "t", "f2", None)
    assert(m.listFunctions().isEmpty)
    // the history row is still in the store (logical delete)
    assert(storedVersions == 2)
    // identical re-create: UNDELETE v2, no insert
    m.createFunction(fn("f2", "x * 4.0"), replace = false)
    val live = m.listFunctions().head
    assert(live.version.contains(2L) && live.body == "x * 4.0")
    assert(storedVersions == 2)
    // a DIFFERENT re-create after drop inserts version 3
    m.dropFunction("graft", "t", "f2", None)
    m.createFunction(fn("f2", "x * 5.0"), replace = false)
    assert(m.listFunctions().head.version.contains(3L))
  }

  test("alter flips only the null-call clause and bumps the version") {
    val m = freshManager()
    m.createFunction(fn("f3", "x"), replace = false)
    m.alterFunction("graft", "t", "f3", None,
      returnsNullOnNullInput = true)
    val altered = m.listFunctions().head
    assert(altered.version.contains(2L) && altered.returnsNullOnNullInput)
    // a no-op alter inserts nothing
    m.alterFunction("graft", "t", "f3", None,
      returnsNullOnNullInput = true)
    assert(m.listFunctions().head.version.contains(2L))
  }

  test("overloads are distinct ids; name-only ops on them are loud") {
    val m = freshManager()
    m.createFunction(fn("f4", "x"), replace = false)
    m.createFunction(fn("f4", "x + y",
      params = Seq(SqlParam("x", "double"), SqlParam("y", "double"))),
      replace = false)
    assert(m.listFunctions().size == 2)
    val e = intercept[IllegalStateException] {
      m.alterFunction("graft", "t", "f4", None,
        returnsNullOnNullInput = true)
    }
    assert(e.getMessage.contains("multiple signatures"))
    // typed resolution works
    m.dropFunction("graft", "t", "f4", Some(Seq("double", "double")))
    assert(m.listFunctions().size == 1)
    // unknown name is the reference's NOT_FOUND
    val e2 = intercept[NoSuchElementException] {
      m.dropFunction("graft", "t", "nope", None)
    }
    assert(e2.getMessage.startsWith("Function not found:"))
  }

  test("persistence is real statements over the mysql shim wire") {
    val m = freshManager()
    MySqlStore.statementLog.clear()
    m.createFunction(fn("f5", "x"), replace = false)
    m.dropFunction("graft", "t", "f5", None)
    val log = MySqlStore.statementLog.toArray.map(_.toString)
    assert(log.exists(_.startsWith("INSERT INTO sql_functions")),
      log.mkString("\n"))
    // the logical delete is an UPDATE, not a DELETE or re-insert
    assert(log.exists(_.startsWith("UPDATE sql_functions SET is_deleted")),
      log.mkString("\n"))
    // a second manager over the same store sees the state
    val m2 = new FunctionNamespaceManager(url, drv)
    assert(m2.listFunctions().isEmpty)
    m.createFunction(fn("f5", "x"), replace = false) // undelete
    assert(m2.listFunctions().size == 1)
  }

  test("parameterized and multi-word types round-trip the store") {
    val m = freshManager()
    // the stored format is "name type" comma-joined — commas inside a
    // parameterized type and spaces inside a multi-word type must not
    // corrupt the split on read
    val params = Seq(SqlParam("a", "decimal(10,2)"),
      SqlParam("b", "double precision"),
      SqlParam("c", "map(varchar, bigint)"))
    m.createFunction(fn("f8", "a", params = params), replace = false)
    val back = m.listFunctions().find(_.name == "f8").get
    assert(back.parameters == params, back.parameters)
    // write-time validation: a parameter whose NAME cannot round-trip
    // fails at createFunction, not later on read
    val e1 = intercept[IllegalArgumentException] {
      m.createFunction(fn("f9", "x",
        params = Seq(SqlParam("a b", "double"))), replace = false)
    }
    assert(e1.getMessage.contains("parameter name"), e1.getMessage)
    // ...as does a type with a top-level comma or unbalanced parens
    val e2 = intercept[IllegalArgumentException] {
      m.createFunction(fn("f9", "x",
        params = Seq(SqlParam("a", "double,double"))), replace = false)
    }
    assert(e2.getMessage.contains("top-level comma"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      m.createFunction(fn("f9", "x",
        params = Seq(SqlParam("a", "decimal(10,2"))), replace = false)
    }
    assert(e3.getMessage.contains("Unbalanced"), e3.getMessage)
  }

  test("loadInto registers live functions; RNONI guard is real") {
    val m = freshManager()
    // a body that would MASK a null input — only the RNONI guard makes
    // the function return NULL for NULL
    m.createFunction(fn("fnm_guard", "coalesce(x, 99.0) * 2.0",
      rnoni = true), replace = false)
    assert(m.loadInto(spark) == 1)
    val r = spark.sql(
      """SELECT fnm_guard(cast(NULL AS double)) AS a,
        |       fnm_guard(2.0) AS b""".stripMargin).collect()(0)
    assert(r.isNullAt(0), "RNONI must force NULL for a NULL argument")
    assert(r.getDouble(1) == 4.0)
    // an overloaded name cannot load into a name-keyed session
    m.createFunction(fn("fnm_guard", "x",
      params = Seq(SqlParam("x", "double"), SqlParam("y", "double"))),
      replace = false)
    val e = intercept[IllegalStateException] { m.loadInto(spark) }
    assert(e.getMessage.contains("overloaded"))
  }
}

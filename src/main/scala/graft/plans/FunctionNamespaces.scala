package graft.plans

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession

/** SQL function namespace manager — the Spark-native re-expression of
  * the reference's MySQL-backed manager
  * (`presto-function-namespace-managers/.../mysql/
  * MySqlFunctionNamespaceManager.java` over
  * `AbstractSqlInvokedFunctionNamespaceManager.java`): SQL-invoked
  * function definitions persisted in a MySQL store, versioned, served
  * to every new session. qn4/qn6 already cover the CREATE/ALTER/DROP
  * FUNCTION statement surface; THIS module is the persistence half the
  * statements route through in the reference.
  *
  * What carries over 1:1 (all deterministic, all gated):
  *   - '''The store''': two tables in MySQL — the reference literally
  *     requires MySQL, so the manager composes with the r12 dialect
  *     shim exactly as the reference composes with a real server: every
  *     read/write goes through the REAL `jdbc:mysql://` driver
  *     (INSERT/SELECT/UPDATE statements in the shim's statement log),
  *     not a private map.
  *   - '''Versioning''' (`createFunction:132-179`): a create inserts
  *     version = latest+1; creating over a live function without
  *     `replace` fails `Function already exists: <id>`; REPLACE with an
  *     IDENTICAL definition inserts nothing (no version bump); a create
  *     after a drop with the identical definition UNDELETES the latest
  *     version in place (`setDeletionStatus(false)` — an UPDATE, not an
  *     insert).
  *   - '''Drop is logical''' (`dropFunction:211-226`): the latest
  *     version flips `is_deleted`; history is retained.
  *   - '''Alter''' (`alterFunction:181-205`): the only alterable
  *     characteristic is the null-call clause; an actual change inserts
  *     version+1, a no-op alter inserts nothing.
  *   - '''Overloads''': the function id is (qualified name, parameter
  *     TYPE list) — same-name functions with different signatures
  *     coexist; name-only alter/drop on an overloaded name fails the
  *     reference's `has multiple signatures` error (`checkUnique:270`).
  *   - '''Namespace precondition''' (`createFunction:140-141`):
  *     creating into an absent namespace fails
  *     `Function namespace not found: <ns>`.
  *
  * Spark-first binding: [[FunctionNamespaceManager.loadInto]] registers
  * every latest non-deleted function into a SparkSession through the
  * engine's own CREATE FUNCTION rewrite (Presto grammar, RNONI
  * absorbed, invocations inline into codegen — the qn4 machinery), the
  * reference's resolve-at-analysis served cross-session. Spark session
  * functions are name-keyed, so loading an overloaded name is LOUD
  * (documented divergence; the manager itself stores overloads fine).
  * Function metadata is KB-scale driver state at any corpus size —
  * the reference's DAO makes the same call. */
object FunctionNamespaces {

  final case class SqlParam(name: String, typ: String)

  final case class SqlInvokedFunction(
      catalog: String, schema: String, name: String,
      parameters: Seq[SqlParam], returnType: String,
      description: String = "",
      deterministic: Boolean = true,
      returnsNullOnNullInput: Boolean = false,
      body: String,
      version: Option[Long] = None) {
    def functionId: String =
      s"$catalog.$schema.$name" +
        parameters.map(_.typ.toLowerCase).mkString("(", ",", ")")
    def hasSameDefinitionAs(o: SqlInvokedFunction): Boolean =
      this.copy(version = None) == o.copy(version = None)
  }

  // the reference's field-length preconditions (:60-66)
  private[plans] val MaxCatalog = 128
  private[plans] val MaxSchema = 128
  private[plans] val MaxFunctionName = 256
  private[plans] val MaxParameterCount = 100
  private[plans] val MaxParameterName = 100

  // Parameters persist as "name type" joined by ", ". Names are
  // identifiers (validated at create), so the FIRST space splits name
  // from type even for multi-word types (double precision); commas
  // split parameter boundaries only at paren depth 0, so parameterized
  // types (decimal(10,2), map(varchar, bigint)) round-trip intact.
  private[plans] val ParamNameRe = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Split on top-level commas only (commas inside parentheses belong
    * to a parameterized type). */
  private[plans] def splitTopLevel(s: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; sb += '('
      case ')' => depth -= 1; sb += ')'
      case ',' if depth == 0 => parts += sb.toString; sb.clear()
      case c => sb += c
    }
    if (sb.nonEmpty) parts += sb.toString
    parts.result().map(_.trim).filter(_.nonEmpty)
  }

  private[plans] def parseStoredParam(p: String): SqlParam = {
    val i = p.indexOf(' ')
    require(i > 0, s"malformed stored parameter '$p'")
    SqlParam(p.substring(0, i), p.substring(i + 1).trim)
  }

  /** Write-time validation so a parameter that cannot round-trip the
    * "name type" store format is rejected at createFunction, not on a
    * later read: the name must be an identifier; the type must be
    * non-empty with balanced parentheses and no top-level comma. */
  private[plans] def checkParamSerializable(p: SqlParam): Unit = {
    require(ParamNameRe.matches(p.name),
      s"Invalid parameter name (not an identifier): '${p.name}'")
    require(p.typ.trim == p.typ && p.typ.nonEmpty,
      s"Invalid parameter type: '${p.typ}'")
    var depth = 0
    p.typ.foreach { c =>
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1
        require(depth >= 0, s"Unbalanced parameter type: '${p.typ}'") }
      else require(c != ',' || depth > 0,
        s"Invalid parameter type (top-level comma): '${p.typ}'")
    }
    require(depth == 0, s"Unbalanced parameter type: '${p.typ}'")
  }
}

class FunctionNamespaceManager(url: String, driverClass: String,
    servingCatalog: String = "graft") {

  import FunctionNamespaces._

  Class.forName(driverClass)

  private def withConn[T](f: java.sql.Connection => T): T = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close() // never leak against a real server
  }

  private val NsTable = "function_namespaces"
  private val FnTable = "sql_functions"

  /** `initialize:87-91`: create the two tables when absent (probed —
    * the shim's CREATE is not IF NOT EXISTS and would reset them). */
  def initialize(): Unit = withConn { c =>
    def exists(t: String): Boolean =
      try { c.createStatement().executeQuery(
        s"SELECT 1 FROM $t WHERE 1=0"); true }
      catch { case _: java.sql.SQLException => false }
    if (!exists(NsTable))
      c.createStatement().executeUpdate(
        s"""CREATE TABLE $NsTable (catalog_name LONGTEXT NOT NULL,
           | schema_name LONGTEXT NOT NULL)""".stripMargin)
    if (!exists(FnTable))
      c.createStatement().executeUpdate(
        s"""CREATE TABLE $FnTable (function_id LONGTEXT NOT NULL,
           | version BIGINT NOT NULL,
           | catalog_name LONGTEXT NOT NULL,
           | schema_name LONGTEXT NOT NULL,
           | function_name LONGTEXT NOT NULL,
           | parameters LONGTEXT NOT NULL,
           | return_type LONGTEXT NOT NULL,
           | description LONGTEXT,
           | deterministic BIT(1) NOT NULL,
           | rnoni BIT(1) NOT NULL,
           | body LONGTEXT NOT NULL,
           | is_deleted BIT(1) NOT NULL)""".stripMargin)
  }

  def createNamespace(catalog: String, schema: String): Unit = withConn { c =>
    if (!namespaceExists(catalog, schema)) {
      val ps = c.prepareStatement(
        s"INSERT INTO $NsTable (catalog_name, schema_name) VALUES (?, ?)")
      ps.setString(1, catalog); ps.setString(2, schema)
      ps.executeUpdate()
    }
  }

  def namespaceExists(catalog: String, schema: String): Boolean =
    withConn { c =>
      val ps = c.prepareStatement(
        s"""SELECT catalog_name FROM $NsTable
           | WHERE catalog_name = ? AND schema_name = ?""".stripMargin)
      ps.setString(1, catalog); ps.setString(2, schema)
      ps.executeQuery().next()
    }

  private def rowToFn(rs: java.sql.ResultSet): SqlInvokedFunction =
    SqlInvokedFunction(
      catalog = rs.getString(3), schema = rs.getString(4),
      name = rs.getString(5),
      parameters = splitTopLevel(rs.getString(6)).map(parseStoredParam),
      returnType = rs.getString(7),
      description = Option(rs.getString(8)).getOrElse(""),
      deterministic = rs.getBoolean(9),
      returnsNullOnNullInput = rs.getBoolean(10),
      body = rs.getString(11),
      version = Some(rs.getLong(2)))

  private val SelectCols =
    "function_id, version, catalog_name, schema_name, function_name, " +
      "parameters, return_type, description, deterministic, rnoni, " +
      "body, is_deleted"

  /** Latest record for one function id → (function, isDeleted). */
  private def latestRecord(c: java.sql.Connection,
      functionId: String): Option[(SqlInvokedFunction, Boolean)] = {
    val ps = c.prepareStatement(
      s"""SELECT $SelectCols FROM $FnTable WHERE function_id = ?
         | ORDER BY version DESC LIMIT 1""".stripMargin)
    ps.setString(1, functionId)
    val rs = ps.executeQuery()
    if (!rs.next()) None
    else Some((rowToFn(rs), rs.getBoolean(12)))
  }

  private def insertVersion(c: java.sql.Connection,
      fn: SqlInvokedFunction, version: Long): Unit = {
    val ps = c.prepareStatement(
      s"""INSERT INTO $FnTable ($SelectCols)
         | VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)""".stripMargin)
    ps.setString(1, fn.functionId)
    ps.setLong(2, version)
    ps.setString(3, fn.catalog); ps.setString(4, fn.schema)
    ps.setString(5, fn.name)
    ps.setString(6, fn.parameters.map(p => s"${p.name} ${p.typ}")
      .mkString(","))
    ps.setString(7, fn.returnType)
    ps.setString(8, fn.description)
    ps.setBoolean(9, fn.deterministic)
    ps.setBoolean(10, fn.returnsNullOnNullInput)
    ps.setString(11, fn.body)
    ps.setBoolean(12, false)
    ps.executeUpdate()
  }

  private def setDeletionStatus(c: java.sql.Connection, functionId: String,
      version: Long, deleted: Boolean): Unit = {
    val ps = c.prepareStatement(
      s"""UPDATE $FnTable SET is_deleted = ?
         | WHERE function_id = ? AND version = ?""".stripMargin)
    ps.setBoolean(1, deleted)
    ps.setString(2, functionId)
    ps.setLong(3, version)
    ps.executeUpdate()
  }

  private def checkCatalog(catalog: String): Unit =
    require(catalog == servingCatalog,
      s"Cannot access catalog $catalog served by this manager")

  /** `createFunction:132-179`. */
  def createFunction(fn: SqlInvokedFunction, replace: Boolean): Unit = {
    checkCatalog(fn.catalog)
    require(fn.version.isEmpty,
      s"function '${fn.functionId}' is already versioned")
    def len(what: String, v: String, max: Int): Unit =
      require(v.length <= max,
        s"$what exceeds max length of $max: $v")
    len("Catalog name", fn.catalog, MaxCatalog)
    len("Schema name", fn.schema, MaxSchema)
    len("Function name", fn.name, MaxFunctionName)
    require(fn.parameters.size <= MaxParameterCount,
      s"Function has more than $MaxParameterCount parameters: " +
        fn.parameters.size)
    fn.parameters.foreach { p =>
      len("Parameter name", p.name, MaxParameterName)
      checkParamSerializable(p)
    }
    if (!namespaceExists(fn.catalog, fn.schema))
      throw new IllegalArgumentException(
        s"Function namespace not found: ${fn.catalog}.${fn.schema}")
    withConn { c =>
      latestRecord(c, fn.functionId) match {
        case Some((_, deleted)) if !replace && !deleted =>
          throw new IllegalStateException(
            s"Function already exists: ${fn.functionId}")
        case Some((latest, deleted)) if latest.hasSameDefinitionAs(fn) =>
          // identical definition: no version bump; a deleted latest
          // UNDELETES in place (the reference's setDeletionStatus arm)
          if (deleted)
            setDeletionStatus(c, fn.functionId, latest.version.get,
              deleted = false)
        case latest =>
          val newVersion =
            latest.flatMap(_._1.version).getOrElse(0L) + 1
          insertVersion(c, fn, newVersion)
      }
    }
  }

  /** Latest non-deleted, name-scoped; loud on overload ambiguity when
    * no parameter types are given (`checkUnique:270-279`). */
  private def liveByName(c: java.sql.Connection, catalog: String,
      schema: String, name: String,
      paramTypes: Option[Seq[String]]): Seq[SqlInvokedFunction] =
    paramTypes match {
      case Some(ts) =>
        val id = s"$catalog.$schema.$name" +
          ts.map(_.toLowerCase).mkString("(", ",", ")")
        latestRecord(c, id).filterNot(_._2).map(_._1).toSeq
      case None =>
        val ps = c.prepareStatement(
          s"""SELECT $SelectCols FROM $FnTable
             | WHERE catalog_name = ? AND schema_name = ?
             |   AND function_name = ?""".stripMargin)
        ps.setString(1, catalog); ps.setString(2, schema)
        ps.setString(3, name)
        val rs = ps.executeQuery()
        val all = Iterator.continually(rs)
          .takeWhile(_.next())
          .map(r => (rowToFn(r), r.getBoolean(12))).toVector
        all.groupBy(_._1.functionId).values.toSeq
          .map(_.maxBy(_._1.version.get))
          .collect { case (f, false) => f }
    }

  private def checkUniqueExists(fns: Seq[SqlInvokedFunction],
      catalog: String, schema: String, name: String,
      paramTypes: Option[Seq[String]]): SqlInvokedFunction = {
    if (fns.size > 1)
      throw new IllegalStateException(
        s"Function '$catalog.$schema.$name' has multiple signatures: " +
          fns.map(_.functionId).mkString("; ") +
          ". Please specify parameter types.")
    if (fns.isEmpty)
      throw new NoSuchElementException(
        s"Function not found: $catalog.$schema.$name" +
          paramTypes.map(_.mkString("(", ",", ")")).getOrElse(""))
    fns.head
  }

  /** `alterFunction:181-205`: null-call is the only alterable
    * characteristic; a real change inserts version+1. */
  def alterFunction(catalog: String, schema: String, name: String,
      paramTypes: Option[Seq[String]],
      returnsNullOnNullInput: Boolean): Unit = {
    checkCatalog(catalog)
    withConn { c =>
      val latest = checkUniqueExists(
        liveByName(c, catalog, schema, name, paramTypes),
        catalog, schema, name, paramTypes)
      val altered = latest.copy(
        returnsNullOnNullInput = returnsNullOnNullInput, version = None)
      if (!altered.hasSameDefinitionAs(latest))
        insertVersion(c, altered, latest.version.get + 1)
    }
  }

  /** `dropFunction:211-226`: logical delete of the latest version. */
  def dropFunction(catalog: String, schema: String, name: String,
      paramTypes: Option[Seq[String]]): Unit = {
    checkCatalog(catalog)
    withConn { c =>
      val latest = checkUniqueExists(
        liveByName(c, catalog, schema, name, paramTypes),
        catalog, schema, name, paramTypes)
      setDeletionStatus(c, latest.functionId, latest.version.get,
        deleted = true)
    }
  }

  /** `listFunctions:94-97`: latest non-deleted version per function id
    * within the served catalog. */
  def listFunctions(): Seq[SqlInvokedFunction] = withConn { c =>
    val ps = c.prepareStatement(
      s"SELECT $SelectCols FROM $FnTable WHERE catalog_name = ?")
    ps.setString(1, servingCatalog)
    val rs = ps.executeQuery()
    val all = Iterator.continually(rs).takeWhile(_.next())
      .map(r => (rowToFn(r), r.getBoolean(12))).toVector
    all.groupBy(_._1.functionId).values.toSeq
      .map(_.maxBy(_._1.version.get))
      .collect { case (f, false) => f }
      .sortBy(_.functionId)
  }

  /** Register every live function into the session through the
    * engine's CREATE FUNCTION rewrite (Presto grammar — qualified
    * name, characteristics, RNONI guard). Spark session functions are
    * name-keyed, so an overloaded name is LOUD here (the manager
    * stores overloads fine; resolution-by-signature is the documented
    * divergence). Returns the registered count. */
  def loadInto(spark: SparkSession): Int = {
    val live = listFunctions()
    val byName = live.groupBy(f => (f.schema, f.name))
    byName.collect { case (k, fs) if fs.size > 1 => k } match {
      case amb if amb.nonEmpty => throw new IllegalStateException(
        "Cannot load overloaded names into a Spark session " +
          "(name-keyed session functions): " + amb.mkString(", "))
      case _ =>
    }
    graft.functions.Registry.install(spark)
    live.foreach { f =>
      val params = f.parameters.map(p => s"${p.name} ${p.typ}")
        .mkString(", ")
      val nullClause =
        if (f.returnsNullOnNullInput) "RETURNS NULL ON NULL INPUT"
        else "CALLED ON NULL INPUT"
      val det = if (f.deterministic) "DETERMINISTIC" else "NOT DETERMINISTIC"
      graft.functions.Registry.prestoStatement(spark,
        s"""CREATE OR REPLACE FUNCTION ${f.catalog}.${f.schema}.${f.name}($params)
           |RETURNS ${f.returnType}
           |LANGUAGE SQL $det $nullClause
           |RETURN ${f.body}""".stripMargin)
    }
    live.size
  }
}

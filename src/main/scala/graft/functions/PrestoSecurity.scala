package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Role / privilege statement family + queryable `information_schema`
  * tables.
  *
  * Reference surface: SqlBase.g4:71-94 (#createRole/#dropRole/#grantRoles/
  * #revokeRoles/#setRole/#grant/#revoke/#showGrants, plus #showRoles/
  * #showRoleGrants at :108-109) and the information_schema connector
  * (presto-main/.../connector/informationSchema/InformationSchemaMetadata
  * .java:81-133 — columns/tables/views/schemata/roles/applicable_roles/
  * enabled_roles/table_privileges with exactly the column sets replayed
  * below). SHOW output shapes follow ShowQueriesRewrite.java:237-331
  * ("Role", "Role Grants", and the 10-column SHOW GRANTS header).
  *
  * Like the reference's hive metastore defaults, the catalog seeds the
  * reserved roles `admin` and `public`; `public` is implicitly granted to
  * every principal and always enabled. Grants are session-scoped in-memory
  * state (weak-keyed, the Tables.register stance) — the engine emulates
  * the metadata surface, not enforcement, exactly the reference's
  * AllowAllAccessControl default (presto-spi/.../security/
  * AllowAllAccessControl.java): every access check passes; GRANT/REVOKE
  * maintain the metadata that SHOW GRANTS / information_schema read back.
  *
  * 100 TB stance: every result here is metadata-sized (roles, grants,
  * catalog listings) — driver-side assembly is the correct plan, the same
  * as the reference's coordinator-local information_schema pages.
  */
private[functions] object PrestoSecurity {

  // ——— session role state ————————————————————————————————————————————

  /** One GRANT ... ON table row (information_schema.table_privileges). */
  private case class TablePriv(grantor: String, grantee: String,
      granteeType: String, table: String, privilege: String,
      grantable: Boolean)

  private class RoleState {
    /** role name -> admin grantor (CREATE ROLE ... WITH ADMIN). Seeded
      * with hive's reserved roles. */
    val roles: mutable.LinkedHashMap[String, String] =
      mutable.LinkedHashMap("admin" -> "system", "public" -> "system")
    /** role -> (grantee, granteeType, adminOption) direct grants. */
    val roleGrants:
        mutable.Map[String, mutable.LinkedHashSet[(String, String, Boolean)]] =
      mutable.Map.empty
    /** None = SET ROLE ALL (default); Some(set) after SET ROLE r / NONE.
      * `public` is added back at read time, never stored. */
    var enabled: Option[Set[String]] = None
    val tablePrivs: mutable.ArrayBuffer[TablePriv] = mutable.ArrayBuffer.empty
  }

  private val states = new java.util.WeakHashMap[SparkSession, RoleState]()

  private def state(spark: SparkSession): RoleState = synchronized {
    states.computeIfAbsent(spark, _ => new RoleState)
  }

  /** Test/gate hook: forget all session security state (roles, grants,
    * enabled set) so lifecycle gates replay idempotently. */
  def resetSecurityState(spark: SparkSession): Unit = synchronized {
    states.remove(spark)
  }

  private def sessionUser(spark: SparkSession): String =
    spark.sparkContext.sparkUser

  /** Roles granted (directly or via role-to-role grants, transitively) to
    * the session user, excluding the implicit `public`. */
  private def grantedToUser(st: RoleState, user: String): Set[String] = {
    val direct = st.roleGrants.collect {
      case (role, gs) if gs.exists(g => g._1 == user && g._2 == "USER") => role
    }.toSet
    // expand role-to-role grants until fixpoint (tiny sets, driver-side)
    var acc = direct
    var grew = true
    while (grew) {
      val next = acc ++ st.roleGrants.collect {
        case (role, gs)
            if gs.exists(g => g._2 == "ROLE" && acc.contains(g._1)) => role
      }
      grew = next.size != acc.size
      acc = next
    }
    acc
  }

  private def enabledRoles(st: RoleState, user: String): Seq[String] = {
    val applicable = grantedToUser(st, user)
    val on = st.enabled match {
      case None => applicable
      case Some(set) => set.intersect(applicable + "public")
    }
    (on + "public").toSeq.sorted
  }

  // ——— statement regexes (whole-statement anchored, case-insensitive) ——

  private val createRoleRe =
    """(?is)^\s*CREATE\s+ROLE\s+([A-Za-z_]\w*)(?:\s+WITH\s+ADMIN\s+(?:USER\s+|ROLE\s+)?([A-Za-z_]\w*))?\s*$""".r
  private val dropRoleRe =
    """(?is)^\s*DROP\s+ROLE\s+([A-Za-z_]\w*)\s*$""".r
  private val setRoleRe =
    """(?is)^\s*SET\s+ROLE\s+([A-Za-z_]\w*)\s*$""".r
  private val showRolesRe =
    """(?is)^\s*SHOW\s+(CURRENT\s+)?ROLES(?:\s+(?:FROM|IN)\s+[A-Za-z_]\w*)?\s*$""".r
  private val showRoleGrantsRe =
    """(?is)^\s*SHOW\s+ROLE\s+GRANTS(?:\s+(?:FROM|IN)\s+[A-Za-z_]\w*)?\s*$""".r
  private val showGrantsRe =
    """(?is)^\s*SHOW\s+GRANTS(?:\s+ON\s+(?:TABLE\s+)?([\w.]+))?\s*$""".r
  // GRANT/REVOKE discriminate role-form from privilege-form on ` ON `:
  // #grant/#revoke always carry it, #grantRoles/#revokeRoles never do.
  private val grantPrivRe =
    """(?is)^\s*GRANT\s+(.+?)\s+ON\s+(?:TABLE\s+)?([\w.]+)\s+TO\s+(?:(USER|ROLE)\s+)?([A-Za-z_]\w*)(\s+WITH\s+GRANT\s+OPTION)?\s*$""".r
  private val revokePrivRe =
    """(?is)^\s*REVOKE\s+(GRANT\s+OPTION\s+FOR\s+)?(.+?)\s+ON\s+(?:TABLE\s+)?([\w.]+)\s+FROM\s+(?:(USER|ROLE)\s+)?([A-Za-z_]\w*)\s*$""".r
  private val grantRolesRe =
    """(?is)^\s*GRANT\s+([A-Za-z_][\w,\s]*?)\s+TO\s+(.+?)(\s+WITH\s+ADMIN\s+OPTION)?(?:\s+GRANTED\s+BY\s+\S+)?\s*$""".r
  private val revokeRolesRe =
    """(?is)^\s*REVOKE\s+(?:ADMIN\s+OPTION\s+FOR\s+)?([A-Za-z_][\w,\s]*?)\s+FROM\s+(.+?)(?:\s+GRANTED\s+BY\s+\S+)?\s*$""".r

  private val reservedRoles = Set("admin", "public")
  private val privilegeNames = Set("SELECT", "DELETE", "INSERT", "UPDATE")

  private def statusDf(spark: SparkSession, v: String): DataFrame = {
    import spark.implicits._
    Seq(v).toDF("result")
  }

  /** Parse `principal` (SqlBase.g4 principal: USER x | ROLE x | x; the
    * reference's bare spelling resolves to USER). */
  private def principal(s: String): (String, String) = {
    val t = s.trim
    val m = """(?is)^(USER|ROLE)\s+([A-Za-z_]\w*)$""".r.findFirstMatchIn(t)
    m.map(mm => (mm.group(2), mm.group(1).toUpperCase))
      .getOrElse((t, "USER"))
  }

  private def requireRole(st: RoleState, name: String): Unit =
    require(st.roles.contains(name), s"Role '$name' does not exist")

  /** Try to route a security statement; None = not one of this family. */
  def maybeStatement(spark: SparkSession, sqlText: String): Option[DataFrame] =
    sqlText match {
      case createRoleRe(name0, adminOrNull) =>
        val name = name0.toLowerCase
        val st = state(spark)
        require(!reservedRoles.contains(name),
          s"Role name cannot be one of the reserved roles: $reservedRoles")
        require(!st.roles.contains(name), s"Role '$name' already exists")
        st.roles(name) =
          Option(adminOrNull).map(_.toLowerCase).getOrElse(sessionUser(spark))
        Some(statusDf(spark, "CREATE ROLE"))

      case dropRoleRe(name0) =>
        val name = name0.toLowerCase
        val st = state(spark)
        require(!reservedRoles.contains(name),
          s"Role name cannot be one of the reserved roles: $reservedRoles")
        requireRole(st, name)
        st.roles.remove(name)
        st.roleGrants.remove(name)
        // grants of OTHER roles to the dropped role vanish with it
        st.roleGrants.values.foreach(
          _.filterInPlace(g => !(g._2 == "ROLE" && g._1 == name)))
        st.tablePrivs.filterInPlace(p =>
          !(p.granteeType == "ROLE" && p.grantee == name))
        Some(statusDf(spark, "DROP ROLE"))

      case setRoleRe(name0) =>
        val st = state(spark)
        name0.toLowerCase match {
          case "all" => st.enabled = None
          case "none" => st.enabled = Some(Set.empty)
          case name =>
            requireRole(st, name)
            require(grantedToUser(st, sessionUser(spark)).contains(name) ||
                name == "public",
              s"Access Denied: Cannot set role $name")
            st.enabled = Some(Set(name))
        }
        Some(statusDf(spark, "SET ROLE"))

      case showRoleGrantsRe() =>
        // ShowQueriesRewrite:315-331 — roles granted DIRECTLY to the
        // session user, single "Role Grants" column, plus public.
        import spark.implicits._
        val st = state(spark)
        val user = sessionUser(spark)
        val direct = st.roleGrants.collect {
          case (role, gs) if gs.exists(g => g._1 == user && g._2 == "USER") =>
            role
        }.toSeq
        Some(("public" +: direct).distinct.sorted.toDF("Role Grants"))

      case showRolesRe(currentOrNull) =>
        import spark.implicits._
        val st = state(spark)
        val out =
          if (currentOrNull != null) enabledRoles(st, sessionUser(spark))
          else st.roles.keys.toSeq.sorted
        Some(out.toDF("Role"))

      case showGrantsRe(tableOrNull) =>
        // ShowQueriesRewrite:276-285 — the 10-column header over
        // table_privileges, optionally filtered to one table.
        import spark.implicits._
        val st = state(spark)
        val rows = st.tablePrivs.toSeq
          .filter(p => tableOrNull == null ||
            p.table == tableOrNull.split('.').last.toLowerCase)
          .map(p => (p.grantor, "USER", p.grantee, p.granteeType,
            spark.catalog.currentCatalog(), spark.catalog.currentDatabase,
            p.table, p.privilege, if (p.grantable) "YES" else "NO", "NO"))
          .sortBy(r => (r._7, r._3, r._8))
        Some(rows.toDF("Grantor", "Grantor Type", "Grantee", "Grantee Type",
          "Catalog", "Schema", "Table", "Privilege", "Grantable",
          "With Hierarchy"))

      case grantPrivRe(privs0, table0, gTypeOrNull, grantee0, optOrNull) =>
        val st = state(spark)
        val privs =
          if ("""(?is)^\s*ALL\s+PRIVILEGES\s*$""".r.matches(privs0))
            Seq("SELECT", "DELETE", "INSERT", "UPDATE") // spi Privilege.java
          else privs0.split(',').map(_.trim.toUpperCase).toSeq
        privs.foreach(p => require(privilegeNames.contains(p),
          s"Unknown privilege: $p"))
        val granteeType =
          Option(gTypeOrNull).map(_.toUpperCase).getOrElse("USER")
        val grantee = grantee0.toLowerCase
        if (granteeType == "ROLE") requireRole(st, grantee)
        val table = table0.split('.').last.toLowerCase
        val grantable = optOrNull != null
        privs.foreach { p =>
          // re-grant replaces (idempotent; grantable may upgrade)
          st.tablePrivs.filterInPlace(tp => !(tp.grantee == grantee &&
            tp.granteeType == granteeType && tp.table == table &&
            tp.privilege == p))
          st.tablePrivs += TablePriv(sessionUser(spark), grantee,
            granteeType, table, p, grantable)
        }
        Some(statusDf(spark, "GRANT"))

      case revokePrivRe(optForNull, privs0, table0, gTypeOrNull, grantee0) =>
        val st = state(spark)
        val privs =
          if ("""(?is)^\s*ALL\s+PRIVILEGES\s*$""".r.matches(privs0))
            Seq("SELECT", "DELETE", "INSERT", "UPDATE")
          else privs0.split(',').map(_.trim.toUpperCase).toSeq
        privs.foreach(p => require(privilegeNames.contains(p),
          s"Unknown privilege: $p"))
        val granteeType =
          Option(gTypeOrNull).map(_.toUpperCase).getOrElse("USER")
        val grantee = grantee0.toLowerCase
        val table = table0.split('.').last.toLowerCase
        // REVOKE GRANT OPTION FOR only removes the grant option and
        // keeps the privilege (spi AccessControl revokeTablePrivileges
        // grantOptionFor=true); plain REVOKE deletes the row
        val optionOnly = optForNull != null
        privs.foreach { p =>
          val had = st.tablePrivs.exists(tp => tp.grantee == grantee &&
            tp.granteeType == granteeType && tp.table == table &&
            tp.privilege == p)
          require(had,
            s"Cannot revoke $p on $table from $granteeType '$grantee': " +
              "no such grant")
          if (optionOnly)
            st.tablePrivs.mapInPlace(tp =>
              if (tp.grantee == grantee && tp.granteeType == granteeType &&
                  tp.table == table && tp.privilege == p)
                tp.copy(grantable = false)
              else tp)
          else
            st.tablePrivs.filterInPlace(tp => !(tp.grantee == grantee &&
              tp.granteeType == granteeType && tp.table == table &&
              tp.privilege == p))
        }
        Some(statusDf(spark, "REVOKE"))

      // role-form GRANT/REVOKE only after the ON-forms failed to match
      case grantRolesRe(roles0, principals0, adminOrNull)
          if !roles0.toUpperCase.split("[,\\s]+").exists(_ == "ON") =>
        val st = state(spark)
        val roles = roles0.split(',').map(_.trim.toLowerCase).toSeq
        roles.foreach(requireRole(st, _))
        val ps = splitPrincipals(principals0).map(principal)
        roles.foreach { r =>
          val set = st.roleGrants.getOrElseUpdate(r,
            mutable.LinkedHashSet.empty)
          ps.foreach { case (name, typ) =>
            if (typ == "ROLE") requireRole(st, name)
            set.filterInPlace(g => !(g._1 == name && g._2 == typ))
            set += ((name, typ, adminOrNull != null))
          }
        }
        Some(statusDf(spark, "GRANT ROLE"))

      case revokeRolesRe(roles0, principals0) =>
        val st = state(spark)
        val roles = roles0.split(',').map(_.trim.toLowerCase).toSeq
        roles.foreach(requireRole(st, _))
        val ps = splitPrincipals(principals0).map(principal)
        roles.foreach { r =>
          val set = st.roleGrants.getOrElse(r, mutable.LinkedHashSet.empty)
          ps.foreach { case (name, typ) =>
            require(set.exists(g => g._1 == name && g._2 == typ),
              s"Cannot revoke role '$r' from $typ '$name': not granted")
            set.filterInPlace(g => !(g._1 == name && g._2 == typ))
          }
        }
        Some(statusDf(spark, "REVOKE ROLE"))

      case _ => None
    }

  private def splitPrincipals(s: String): Seq[String] =
    s.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  // ——— information_schema as queryable tables —————————————————————————

  private val infoTableNames = Seq("columns", "tables", "views", "schemata",
    "roles", "applicable_roles", "enabled_roles", "table_privileges")

  // optional leading `<catalog>.` qualifier is consumed and dropped —
  // the reference supports `cat.information_schema.t` spellings
  private val infoRe =
    ("""(?i)\b(?:[A-Za-z_]\w*\s*\.\s*)?information_schema\s*\.\s*(""" +
      infoTableNames.mkString("|") + """)\b""").r

  /** Rewrite `information_schema.<t>` references (outside string
    * literals) to freshly-materialized `graft_infoschema_<t>` temp views.
    * A no-op for queries that never mention information_schema. */
  def rewriteInfoSchema(spark: SparkSession, q: String): String = {
    val mask = PrestoRewrite.stringMask(q)
    val ms = infoRe.findAllMatchIn(q).filter(m => !mask(m.start)).toList
    if (ms.isEmpty) q
    else {
      refreshInfoSchema(spark, ms.map(_.group(1).toLowerCase).toSet)
      val sb = new StringBuilder
      var pos = 0
      ms.foreach { m =>
        sb.append(q.substring(pos, m.start))
        sb.append("graft_infoschema_").append(m.group(1).toLowerCase)
        pos = m.end
      }
      sb.append(q.substring(pos))
      sb.toString
    }
  }

  /** Materialize the referenced information_schema tables as temp views —
    * a point-in-time catalog snapshot, which is exactly what one Presto
    * query sees. Metadata-sized driver assembly (the Curation.scala:35
    * stance); the reference's InformationSchemaPageSourceProvider builds
    * the same pages coordinator-side. */
  private def refreshInfoSchema(spark: SparkSession, which: Set[String]): Unit = {
    import spark.implicits._
    val cat = spark.catalog.currentCatalog()
    val db = spark.catalog.currentDatabase
    lazy val tbls = spark.catalog.listTables().collect() // metadata-sized
    def schemaOf(t: org.apache.spark.sql.catalog.Table) = {
      val ident = Option(t.database).filter(_.nonEmpty)
        .map(d => s"`$d`.`${t.name}`").getOrElse(s"`${t.name}`")
      spark.table(ident).schema
    }
    def tableSchema(t: org.apache.spark.sql.catalog.Table): String =
      Option(t.database).filter(_.nonEmpty).getOrElse(db)

    if (which("columns")) {
      val rows = tbls.toSeq.flatMap { t =>
        schemaOf(t).fields.toSeq.zipWithIndex.map { case (f, i) =>
          (cat, tableSchema(t), t.name, f.name, (i + 1).toLong,
            Option.empty[String], if (f.nullable) "YES" else "NO",
            PrestoStatements.prestoTypeName(f.dataType),
            Option.empty[String], Option.empty[String])
        }
      }
      rows.toDF("table_catalog", "table_schema", "table_name", "column_name",
        "ordinal_position", "column_default", "is_nullable", "data_type",
        "comment", "extra_info")
        .createOrReplaceTempView("graft_infoschema_columns")
    }
    if (which("tables")) {
      val rows = tbls.toSeq.map { t =>
        val typ =
          if (t.tableType == "VIEW" || t.isTemporary) "VIEW" else "BASE TABLE"
        (cat, tableSchema(t), t.name, typ)
      }
      rows.toDF("table_catalog", "table_schema", "table_name", "table_type")
        .createOrReplaceTempView("graft_infoschema_tables")
    }
    if (which("views")) {
      val rows = tbls.toSeq
        .filter(t => t.tableType == "VIEW" || t.isTemporary)
        .map { t =>
          (cat, tableSchema(t), t.name, sessionUser(spark),
            PrestoStatements.viewText(spark, t.name))
        }
      rows.toDF("table_catalog", "table_schema", "table_name", "view_owner",
        "view_definition")
        .createOrReplaceTempView("graft_infoschema_views")
    }
    if (which("schemata")) {
      val rows = (spark.catalog.listDatabases().collect().map(_.name).toSeq
        :+ "information_schema").distinct.sorted.map(n => (cat, n))
      rows.toDF("catalog_name", "schema_name")
        .createOrReplaceTempView("graft_infoschema_schemata")
    }
    val st = state(spark)
    val user = sessionUser(spark)
    if (which("roles")) {
      st.roles.keys.toSeq.sorted.toDF("role_name")
        .createOrReplaceTempView("graft_infoschema_roles")
    }
    if (which("enabled_roles")) {
      enabledRoles(st, user).toDF("role_name")
        .createOrReplaceTempView("graft_infoschema_enabled_roles")
    }
    if (which("applicable_roles")) {
      val rows = ("public" +: grantedToUser(st, user).toSeq.sorted)
        .distinct.map { r =>
          val grantable = st.roleGrants.get(r)
            .exists(_.exists(g => g._1 == user && g._2 == "USER" && g._3))
          (user, "USER", r, if (grantable) "YES" else "NO")
        }
      rows.toDF("grantee", "grantee_type", "role_name", "is_grantable")
        .createOrReplaceTempView("graft_infoschema_applicable_roles")
    }
    if (which("table_privileges")) {
      val rows = st.tablePrivs.toSeq.map(p =>
        (p.grantor, "USER", p.grantee, p.granteeType, cat, db, p.table,
          p.privilege, if (p.grantable) "YES" else "NO", "NO"))
      rows.toDF("grantor", "grantor_type", "grantee", "grantee_type",
        "table_catalog", "table_schema", "table_name", "privilege_type",
        "is_grantable", "with_hierarchy")
        .createOrReplaceTempView("graft_infoschema_table_privileges")
    }
  }
}

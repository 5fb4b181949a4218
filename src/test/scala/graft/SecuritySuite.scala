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

  test("kill_query cancels a RUNNING statement with the reference text") {
    // KillQueryProcedure.java:66-70 on a multi-threaded driver: the
    // victim thread runs an eager statement (CTAS — its jobs execute
    // inside the router's record/finish bracket under the query's job
    // group); the killer finds the RUNNING record, kills it, and the
    // victim errs with createKillQueryException's exact text.
    Tables.register(spark, SfDir)
    spark.sql("DROP TABLE IF EXISTS graft_kill_victim")
    @volatile var victimError: Throwable = null
    val victim = new Thread(() => {
      try {
        stmt("""CREATE TABLE graft_kill_victim AS
               |SELECT max(hash(concat(cast(id AS string), 'xyz'))) AS h
               |FROM range(0, 30000000000, 1, 2)""".stripMargin)
      } catch { case e: Throwable => victimError = e }
    })
    victim.setDaemon(true)
    victim.start()
    // wait until the victim's record is RUNNING (the CREATE prefix
    // keeps this poll's own record — whose text also carries the
    // victim marker inside the LIKE literal — out of the match)
    def runningId(): Option[String] =
      stmt("""SELECT query_id FROM system.runtime.queries
             |WHERE state = 'RUNNING'
             |  AND query LIKE 'CREATE TABLE graft_kill_victim%'"""
        .stripMargin)
        .collect().headOption.map(_.getString(0))
    val deadline = System.currentTimeMillis() + 60000
    var id: Option[String] = None
    while (id.isEmpty && System.currentTimeMillis() < deadline) {
      id = runningId()
      if (id.isEmpty) Thread.sleep(50)
    }
    assert(id.nonEmpty, "victim never reached RUNNING")
    // cancelJobGroup only reaches SUBMITTED jobs — wait for the
    // victim's first job to exist before killing
    while (spark.sparkContext.statusTracker
        .getJobIdsForGroup(id.get).isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(spark.sparkContext.statusTracker
      .getJobIdsForGroup(id.get).nonEmpty, "victim never submitted jobs")
    val out = stmt(
      s"CALL system.runtime.kill_query('${id.get}', 'runaway scan')")
    assert(out.collect()(0).getString(0) == "CALL")
    victim.join(60000)
    assert(!victim.isAlive, "victim did not die after kill")
    assert(victimError != null, "victim finished instead of dying")
    assert(victimError.getMessage ==
      "Query killed. Message: runaway scan")
    // the record reads FAILED afterward
    val state = stmt(
      s"""SELECT state FROM system.runtime.queries
         |WHERE query_id = '${id.get}'""".stripMargin)
      .collect()(0).getString(0)
    assert(state == "FAILED")
    // killing it AGAIN is the reference's "not running" arm
    val again = intercept[Exception] {
      stmt(s"CALL system.runtime.kill_query('${id.get}')")
    }
    assert(again.getMessage.contains(
      s"Target query is not running: ${id.get}"))
    spark.sql("DROP TABLE IF EXISTS graft_kill_victim")
  }

  test("kill bars the killed query's FUTURE jobs (failQuery finality)") {
    // KillQueryProcedure.java:66-70 fails the query OBJECT — nothing
    // further runs. Spark twin: cancelJobGroupAndFutureJobs. Here the
    // victim statement is mid-bracket (RUNNING, job group = query id),
    // has finished one job, is killed, then acts on a lazy DataFrame it
    // built earlier — the submission must FAIL, not compute a result.
    val rec = Registry.recordStatement(spark,
      "SELECT /* graft_future_kill_victim */ 1")
    val killOut = try {
      val queryId =
        spark.sparkContext.getLocalProperty("spark.jobGroup.id")
      assert(queryId != null && queryId.nonEmpty)
      // job 1 under the victim's group computes normally
      assert(spark.range(0, 100, 1, 4).count() == 100L)
      // a lazy DataFrame built BEFORE the kill — nothing submitted yet
      val lazyDf = spark.range(0, 1000, 1, 4).selectExpr("sum(id) AS s")
      // the kill routes on this same thread; the router stacks its own
      // job group and restores the victim's on exit (clearGroup)
      // (the CALL's result is collected after the bracket clears — ANY
      // job on this thread now dies, including the CALL output's own)
      val out = stmt(
        s"CALL system.runtime.kill_query('$queryId', 'no more work')")
      assert(spark.sparkContext
        .getLocalProperty("spark.jobGroup.id") == queryId)
      // acting on the lazy DataFrame AFTER the kill fails at submission
      val e = intercept[Exception] { lazyDf.collect() }
      // the victim's bracket maps the cancellation to the kill text
      assert(Registry.statementFailure(rec, e).getMessage ==
        "Query killed. Message: no more work")
      Registry.finishStatement(spark, rec, failed = true,
        failure = Some(e))
      out
    } finally Registry.clearStatementGroup(spark)
    // the thread's group is restored — jobs compute again, and the
    // CALL's own result collects normally
    assert(spark.range(0, 10).count() == 10L)
    assert(killOut.collect()(0).getString(0) == "CALL")
    val queryId =
      stmt("""SELECT query_id FROM system.runtime.queries
             |WHERE query LIKE 'SELECT /* graft_future_kill_victim%'"""
        .stripMargin).collect()(0).getString(0)
    val state = stmt(
      s"""SELECT state FROM system.runtime.queries
         |WHERE query_id = '$queryId'""".stripMargin)
      .collect()(0).getString(0)
    assert(state == "FAILED")
  }

  test("query_max_execution_time cancels at the limit with the reference text") {
    // QueryTracker.enforceTimeLimits:215 — only an explicitly-SET
    // limit arms the watchdog; the victim errs with the reference's
    // "Query exceeded the maximum execution time limit of <duration>"
    Tables.register(spark, SfDir)
    spark.sql("DROP TABLE IF EXISTS graft_timeout_victim")
    stmt("SET SESSION query_max_execution_time = '2s'")
    try {
      val e = intercept[Exception] {
        stmt("""CREATE TABLE graft_timeout_victim AS
               |SELECT max(hash(concat(cast(id AS string), 'xyz'))) AS h
               |FROM range(0, 30000000000, 1, 2)""".stripMargin)
      }
      assert(e.getMessage ==
        "Query exceeded the maximum execution time limit of 2.00s")
    } finally {
      stmt("RESET SESSION query_max_execution_time")
      spark.sql("DROP TABLE IF EXISTS graft_timeout_victim")
    }
    // a fast statement under the same limit is untouched
    stmt("SET SESSION query_max_execution_time = '30s'")
    try {
      assert(stmt("SELECT 1 AS one").collect()(0).getInt(0) == 1)
    } finally stmt("RESET SESSION query_max_execution_time")
  }

  test("query_max_run_time kills with its own reference text") {
    // QueryTracker.enforceTimeLimits:218 — run time includes queueing,
    // and the text differs from the execution-time arm
    Tables.register(spark, SfDir)
    spark.sql("DROP TABLE IF EXISTS graft_runtime_victim")
    stmt("SET SESSION query_max_run_time = '2s'")
    try {
      val e = intercept[Exception] {
        stmt("""CREATE TABLE graft_runtime_victim AS
               |SELECT max(hash(concat(cast(id AS string), 'xyz'))) AS h
               |FROM range(0, 30000000000, 1, 2)""".stripMargin)
      }
      assert(e.getMessage == "Query exceeded maximum time limit of 2.00s")
    } finally {
      stmt("RESET SESSION query_max_run_time")
      spark.sql("DROP TABLE IF EXISTS graft_runtime_victim")
    }
  }

  test("a QUEUED statement is visible and killable while parked") {
    // the reference's dispatcher registers queued queries
    // (QueryState.QUEUED in system.runtime.queries) and failQuery
    // reaches them; here: a parked statement renders QUEUED with a
    // live queued_time_ms and NULL started, kill_query revokes the
    // park, and the victim fails with the kill text
    import graft.plans.ResourceGroups
    import graft.functions.Registry.{installResourceGroups,
      uninstallResourceGroups}
    Tables.register(spark, SfDir)
    val mgr = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "kq", "maxQueued": 5,
        |    "hardConcurrencyLimit": 1 } ],
        |  "selectors": [ { "user": ".*", "group": "kq" } ] }"""
        .stripMargin)
    ResourceGroups.clearAll()
    val g = ResourceGroups.stateOf(
      ResourceGroups.select(mgr, spark.sparkContext.sparkUser, None).get)
    assert(ResourceGroups.admit(g) == ResourceGroups.Run) // saturate
    installResourceGroups(spark, mgr)
    try {
      @volatile var err: Throwable = null
      val runner = new Thread(() => {
        try stmt("SELECT 43 AS queued_kill_probe").collect()
        catch { case e: Throwable => err = e }
      })
      runner.setDaemon(true)
      runner.start()
      // wait until the runner is actually PARKED (group state), THEN
      // uninstall so the observation polls don't route through the
      // saturated group themselves — the already-parked runner is
      // unaffected (its wait is inside awaitTicket)
      val parkDeadline = System.currentTimeMillis() + 30000
      while (g.queuedCount == 0 &&
        System.currentTimeMillis() < parkDeadline) Thread.sleep(10)
      assert(g.queuedCount == 1, "runner never parked")
      uninstallResourceGroups(spark)
      def queuedRow(): Option[org.apache.spark.sql.Row] =
        stmt("""SELECT query_id, queued_time_ms, started
               |FROM system.runtime.queries
               |WHERE state = 'QUEUED'
               |  AND query = 'SELECT 43 AS queued_kill_probe'"""
          .stripMargin).collect().headOption
      val deadline = System.currentTimeMillis() + 30000
      var row: Option[org.apache.spark.sql.Row] = None
      while (row.isEmpty && System.currentTimeMillis() < deadline) {
        row = queuedRow()
        if (row.isEmpty) Thread.sleep(20)
      }
      assert(row.nonEmpty, "statement never surfaced as QUEUED")
      assert(row.get.getLong(1) >= 0L && row.get.isNullAt(2),
        "QUEUED row must carry live queued time and NULL started")
      val id = row.get.getString(0)
      val out = stmt(
        s"CALL system.runtime.kill_query('$id', 'queue jumped')")
      assert(out.collect()(0).getString(0) == "CALL")
      runner.join(30000)
      assert(!runner.isAlive, "victim did not die")
      assert(err != null &&
        err.getMessage == "Query killed. Message: queue jumped")
      val state = stmt(
        s"""SELECT state, queued_time_ms FROM system.runtime.queries
           |WHERE query_id = '$id'""".stripMargin).collect()(0)
      assert(state.getString(0) == "FAILED")
      assert(state.getLong(1) > 0L) // the park charged as queued time
    } finally {
      uninstallResourceGroups(spark)
      ResourceGroups.release(g)
      ResourceGroups.clearAll()
    }
  }

  test("a DB-backed-manager park renders QUEUED with live queued_time_ms") {
    // the file-manager arm above locks the QUEUED rendering; the
    // DB-backed manager rides the SAME admission path
    // (StatementAdmission.admitted → awaitTicket), so a statement
    // parked by a DbResourceGroupManager must render identically: a
    // QUEUED row with NULL started and a queued_time_ms that GROWS
    // while parked, settling into the record once promoted
    import graft.plans.{DbResourceGroupManager, ResourceGroups}
    import graft.sources.{GraftMySqlDriver, MySqlStore}
    import graft.functions.Registry.{installResourceGroups,
      uninstallResourceGroups}
    Tables.register(spark, SfDir)
    GraftMySqlDriver.install()
    val url = "jdbc:mysql://graft-shim/g"
    Seq("resource_groups_global_properties", "resource_groups",
      "selectors", "exact_match_source_selectors")
      .foreach(MySqlStore.drop)
    ResourceGroups.clearAll()
    val mgr = new DbResourceGroupManager(url,
      "graft.sources.GraftMySqlDriver", "suite")
    mgr.initialize()
    val c = java.sql.DriverManager.getConnection(url)
    val ins = c.prepareStatement(
      """INSERT INTO resource_groups (resource_group_id, name,
        | soft_memory_limit, max_queued, soft_concurrency_limit,
        | hard_concurrency_limit, scheduling_policy, scheduling_weight,
        | jmx_export, soft_cpu_limit, hard_cpu_limit, parent,
        | environment) VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)"""
        .stripMargin)
    ins.setLong(1, 1L); ins.setString(2, "dbq"); ins.setString(3, "1GB")
    ins.setInt(4, 5); ins.setObject(5, null); ins.setInt(6, 1)
    ins.setObject(7, null); ins.setObject(8, null); ins.setObject(9, null)
    ins.setObject(10, null); ins.setObject(11, null)
    ins.setObject(12, null); ins.setString(13, "suite")
    ins.executeUpdate()
    val sel = c.prepareStatement(
      """INSERT INTO selectors (resource_group_id, priority, user_regex,
        | source_regex, query_type, client_tags,
        | selector_resource_estimate) VALUES (?, ?, ?, ?, ?, ?, ?)"""
        .stripMargin)
    sel.setLong(1, 1L); sel.setLong(2, 1L); sel.setString(3, ".*")
    sel.setObject(4, null); sel.setObject(5, null)
    sel.setObject(6, null); sel.setObject(7, null)
    sel.executeUpdate()
    mgr.load()
    val g = ResourceGroups.stateOf(
      mgr.select(spark.sparkContext.sparkUser, None).get)
    assert(ResourceGroups.admit(g) == ResourceGroups.Run) // saturate
    installResourceGroups(spark, mgr)
    try {
      @volatile var err: Throwable = null
      val runner = new Thread(() => {
        try stmt("SELECT 44 AS db_queued_probe").collect()
        catch { case e: Throwable => err = e }
      })
      runner.setDaemon(true)
      runner.start()
      val parkDeadline = System.currentTimeMillis() + 30000
      while (g.queuedCount == 0 &&
        System.currentTimeMillis() < parkDeadline) Thread.sleep(10)
      assert(g.queuedCount == 1, "runner never parked")
      // uninstall so the observation polls don't route through the
      // saturated group (the parked runner's wait is unaffected)
      uninstallResourceGroups(spark)
      def queuedMs(): Option[(String, Long, Boolean)] =
        stmt("""SELECT query_id, queued_time_ms, started IS NULL AS ns
               |FROM system.runtime.queries
               |WHERE state = 'QUEUED'
               |  AND query = 'SELECT 44 AS db_queued_probe'"""
          .stripMargin).collect().headOption
          .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      val deadline = System.currentTimeMillis() + 30000
      var first: Option[(String, Long, Boolean)] = None
      while (first.isEmpty && System.currentTimeMillis() < deadline) {
        first = queuedMs()
        if (first.isEmpty) Thread.sleep(20)
      }
      assert(first.nonEmpty, "statement never surfaced as QUEUED")
      assert(first.get._3, "QUEUED row must carry NULL started")
      Thread.sleep(150)
      val second = queuedMs()
      assert(second.nonEmpty && second.get._2 > first.get._2,
        s"queued_time_ms must grow while parked: $first -> $second")
      ResourceGroups.release(g) // promote the parked statement
      runner.join(30000)
      assert(!runner.isAlive && err == null)
      val row = stmt(
        s"""SELECT state, queued_time_ms FROM system.runtime.queries
           |WHERE query_id = '${first.get._1}'""".stripMargin)
        .collect()(0)
      assert(row.getString(0) == "FINISHED")
      assert(row.getLong(1) >= 150L) // the park charged as queued time
    } finally {
      uninstallResourceGroups(spark)
      ResourceGroups.clearAll()
      c.close()
    }
  }

  test("admission park is the query log's real queued_time_ms") {
    // With StatementAdmission installed, a parked statement's record
    // carries its actual queue wait (QueryStats.getQueuedTime) and
    // created = dispatch, started = created + queued
    import graft.plans.ResourceGroups
    import graft.functions.Registry.{installResourceGroups,
      uninstallResourceGroups}
    Tables.register(spark, SfDir)
    val mgr = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "parked", "maxQueued": 5,
        |    "hardConcurrencyLimit": 1 } ],
        |  "selectors": [ { "user": ".*", "group": "parked" } ] }"""
        .stripMargin)
    ResourceGroups.clearAll()
    val g = ResourceGroups.stateOf(
      ResourceGroups.select(mgr, spark.sparkContext.sparkUser, None).get)
    assert(ResourceGroups.admit(g) == ResourceGroups.Run) // saturate
    installResourceGroups(spark, mgr)
    try {
      @volatile var err: Throwable = null
      val runner = new Thread(() => {
        try stmt("SELECT 42 AS parked_probe").collect()
        catch { case e: Throwable => err = e }
      })
      runner.setDaemon(true)
      runner.start()
      // wait until it is actually PARKED, then hold it parked long
      // enough that the recorded queued time is unambiguous
      val parkDeadline = System.currentTimeMillis() + 30000
      while (g.queuedCount == 0 &&
        System.currentTimeMillis() < parkDeadline) Thread.sleep(10)
      assert(g.queuedCount == 1, "runner never parked")
      Thread.sleep(300)
      ResourceGroups.release(g) // promote the parked statement
      runner.join(30000)
      assert(!runner.isAlive && err == null)
      uninstallResourceGroups(spark)
      val row = stmt(
        """SELECT queued_time_ms,
          |  cast(started AS long) - cast(created AS long) AS gap_s
          |FROM system.runtime.queries
          |WHERE query = 'SELECT 42 AS parked_probe'""".stripMargin)
        .collect()(0)
      assert(row.getLong(0) >= 300L,
        s"queued_time_ms = ${row.getLong(0)}")
      // created + queued = started (timestamps carry the park)
      assert(row.getLong(1) >= 0L)
    } finally {
      uninstallResourceGroups(spark)
      ResourceGroups.clearAll()
    }
  }

  test("system.runtime.queries serves the reference's 12-column layout") {
    Tables.register(spark, SfDir)
    val df = stmt("SELECT * FROM system.runtime.queries")
    // QuerySystemTable.java:56-71, exact names in exact order
    assert(df.columns.toSeq == Seq("query_id", "state", "user",
      "source", "query", "resource_group_id", "queued_time_ms",
      "analysis_time_ms", "created", "started", "last_heartbeat",
      "end"))
    // source rides the client tag; a statement under a resource group
    // logs the group's segments (the pinned FAIR pool)
    spark.conf.set("graft.source", "suite-cli")
    try {
      graft.plans.ResourceGroups.clearAll()
      val r = graft.plans.ResourceGroups.Resolved(Seq("global", "suite"), 5, 5,
        None, None)
      graft.plans.ResourceGroups.withGroup(spark, r) {
        stmt("SELECT 41 AS tagged_probe").collect()
      }
    } finally spark.conf.unset("graft.source")
    val row = stmt(
      """SELECT source, resource_group_id, queued_time_ms,
        |  analysis_time_ms, started, `end`
        |FROM system.runtime.queries
        |WHERE query LIKE 'SELECT 41 AS tagged_probe%'""".stripMargin)
      .collect().last
    assert(row.getString(0) == "suite-cli")
    assert(row.getSeq[String](1) == Seq("global", "suite"))
    assert(row.getLong(2) == 0L) // no admission queue: never queued
    assert(!row.isNullAt(3) && row.getLong(3) >= 0L)
    assert(!row.isNullAt(4) && !row.isNullAt(5)) // started + end settled
  }

  test("a routed statement restores the caller's job group") {
    Tables.register(spark, SfDir)
    val sc = spark.sparkContext
    sc.setJobGroup("caller_group_17", "outer work")
    try {
      stmt("SELECT count(*) AS n FROM region").collect()
      assert(sc.getLocalProperty("spark.jobGroup.id") == "caller_group_17")
      assert(sc.getLocalProperty("spark.job.description") == "outer work")
    } finally sc.clearJobGroup()
    // with no caller group, the router leaves the group unset
    stmt("SELECT 1 AS x").collect()
    assert(sc.getLocalProperty("spark.jobGroup.id") == null)
  }

  test("system.runtime.tasks serves the reference's 24-column layout") {
    Tables.register(spark, SfDir)
    spark.read.parquet(s"$SfDir/region.parquet").count()
    val df = stmt("SELECT * FROM system.runtime.tasks")
    // TaskSystemTable.java:47-80, exact names in exact order
    assert(df.columns.toSeq == Seq("node_id", "task_id",
      "stage_execution_id", "stage_id", "query_id", "state", "splits",
      "queued_splits", "running_splits", "completed_splits",
      "split_scheduled_time_ms", "split_cpu_time_ms",
      "split_blocked_time_ms", "raw_input_bytes", "raw_input_rows",
      "processed_input_bytes", "processed_input_rows", "output_bytes",
      "output_rows", "physical_written_bytes", "created", "start",
      "last_heartbeat", "end"))
    val finished = df.filter("state = 'FINISHED'").collect()
    assert(finished.nonEmpty)
    // end is set on finished tasks; processed input covers raw input
    assert(finished.forall(r => !r.isNullAt(23)))
    assert(finished.forall(r => r.getLong(15) >= r.getLong(13) &&
      r.getLong(16) >= r.getLong(14)))
  }

  test("system.jdbc tables carry the reference's exact column sets") {
    Tables.register(spark, SfDir)
    // ColumnJdbcTable.java:74-97 — 24 columns, exact names and order
    assert(stmt("SELECT * FROM system.jdbc.columns WHERE 1=0")
      .columns.toSeq == Seq("table_cat", "table_schem", "table_name",
      "column_name", "data_type", "type_name", "column_size",
      "buffer_length", "decimal_digits", "num_prec_radix", "nullable",
      "remarks", "column_def", "sql_data_type", "sql_datetime_sub",
      "char_octet_length", "ordinal_position", "is_nullable",
      "scope_catalog", "scope_schema", "scope_table",
      "source_data_type", "is_autoincrement", "is_generatedcolumn"))
    // TableJdbcTable.java:50-59 — 10 columns
    assert(stmt("SELECT * FROM system.jdbc.tables WHERE 1=0")
      .columns.length == 10)
    // the empty tables still carry full schemas
    assert(stmt("SELECT * FROM system.jdbc.procedure_columns")
      .columns.length == 20)
    assert(stmt("SELECT * FROM system.jdbc.attributes")
      .columns.length == 21)
    assert(stmt("SELECT * FROM system.jdbc.pseudo_columns")
      .columns.length == 12)
    // a catalog prefix filter prunes to nothing, like FilterUtil
    assert(stmt("SELECT * FROM system.jdbc.tables " +
      "WHERE table_cat = 'nope'").count() == 0)
    // decimal columns carry precision/scale facts
    spark.sql("SELECT CAST(1.5 AS DECIMAL(10,2)) AS d")
      .createOrReplaceTempView("jdbc_dec_probe")
    val d = stmt("SELECT data_type, type_name, column_size, " +
      "decimal_digits, num_prec_radix FROM system.jdbc.columns " +
      "WHERE table_name = 'jdbc_dec_probe'").collect()(0)
    assert(d.getLong(0) == java.sql.Types.DECIMAL.toLong)
    assert(d.getString(1) == "decimal(10,2)")
    assert((d.getLong(2), d.getLong(3), d.getLong(4)) == ((10L, 2L, 10L)))
    spark.catalog.dropTempView("jdbc_dec_probe")
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

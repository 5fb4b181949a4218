package graft

import graft.plans.SessionPropertyManagers._
import graft.plans.{ResourceGroups, SessionPropertyManagers}

/** The file session property manager's contract
  * (`presto-session-property-managers/.../SessionMatchSpec.java`,
  * `FileSessionPropertyManager.java`): full-match regexes, tag-subset
  * and case-insensitive queryType criteria, the
  * later-overrides-earlier combination, loud config parsing, and the
  * apply/restore lifecycle through the SET SESSION registry. */
class SessionPropertyManagersSuite extends GraftSuite {

  private val specs = SessionPropertyManagers.parse(
    """[
      |  { "user": "etl", "sessionProperties":
      |      { "hash_partition_count": "7" } },
      |  { "user": "etl_.*", "sessionProperties":
      |      { "hash_partition_count": "11", "task_concurrency": "2" } },
      |  { "source": "bi-(tool|suite)", "clientTags": ["prod", "bi"],
      |    "sessionProperties": { "task_concurrency": "8" } },
      |  { "queryType": "insert", "sessionProperties":
      |      { "optimize_hash_generation": "false" } },
      |  { "group": "global\\.etl_.*", "sessionProperties":
      |      { "query_max_run_time": "2.00h" } }
      |]""".stripMargin)

  test("regexes must match FULLY, not find()") {
    // "etl" does not match user etl_nightly (matches(), not find())
    val p = properties(specs, Context("etl_nightly")).toMap
    assert(p.get("hash_partition_count").contains("11"))
    assert(properties(specs, Context("etl")).toMap
      .get("hash_partition_count").contains("7"))
    // a user that only CONTAINS the pattern does not match
    assert(properties(specs, Context("xetl")).isEmpty)
  }

  test("clientTags are a subset criterion; queryType case-insensitive") {
    val base = Context("u", source = Some("bi-tool"))
    // missing one required tag -> no match
    assert(properties(specs,
      base.copy(clientTags = Set("prod"))).isEmpty)
    // superset of the required tags -> match
    assert(properties(specs,
      base.copy(clientTags = Set("prod", "bi", "extra"))).toMap
      .get("task_concurrency").contains("8"))
    // queryType compares case-insensitively against the spec's text
    assert(properties(specs,
      Context("u", queryType = Some("INSERT"))).toMap
      .get("optimize_hash_generation").contains("false"))
    assert(properties(specs,
      Context("u", queryType = Some("select"))).isEmpty)
    // absent context queryType does not match a spec that requires one
    assert(properties(specs, Context("u")).isEmpty)
  }

  test("every matching spec contributes; later overrides earlier") {
    // user "etl" matches BOTH spec1 (7) and... only spec1 (etl_.* does
    // not match "etl" minus suffix? it does: etl_.* needs the
    // underscore) — craft an overlapping pair instead
    val overlap = SessionPropertyManagers.parse(
      """[
        |  { "user": "a.*", "sessionProperties":
        |      { "hash_partition_count": "5", "task_concurrency": "1" } },
        |  { "user": "ab.*", "sessionProperties":
        |      { "hash_partition_count": "9" } }
        |]""".stripMargin)
    val p = properties(overlap, Context("abc")).toMap
    // the later spec overrides the earlier for the shared key, the
    // non-shared key survives from the earlier
    assert(p("hash_partition_count") == "9")
    assert(p("task_concurrency") == "1")
    // the earlier-only match keeps its own values
    val axe = properties(overlap, Context("axe")).toMap
    assert(axe("hash_partition_count") == "5")
  }

  test("group regex matches the RESOLVED resource-group id") {
    // compose with the resource-group manager: the selector resolves
    // the group id, the session property manager matches against it —
    // the reference's own configure chain
    val mgr = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "global", "maxQueued": 10,
        |    "hardConcurrencyLimit": 10, "subGroups": [
        |      { "name": "etl_${pipeline}", "maxQueued": 5,
        |        "hardConcurrencyLimit": 3 } ] } ],
        |  "selectors": [
        |    { "source": "etl-(?<pipeline>[a-z]+)",
        |      "group": "global.etl_${pipeline}" } ] }""".stripMargin)
    val resolved =
      ResourceGroups.select(mgr, "u", Some("etl-ingest")).get
    assert(resolved.id == "global.etl_ingest")
    val p = properties(specs,
      Context("u", resourceGroupId = Some(resolved.id))).toMap
    assert(p.get("query_max_run_time").contains("2.00h"))
    assert(properties(specs,
      Context("u", resourceGroupId = Some("global.dashboards"))).isEmpty)
  }

  test("unknown config fields fail loudly at parse") {
    val e = intercept[IllegalArgumentException] {
      SessionPropertyManagers.parse("""[ { "userz": "x" } ]""")
    }
    assert(e.getMessage.contains("Unknown property"))
  }

  test("withProperties applies through SET SESSION and restores") {
    graft.functions.Registry.install(spark)
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    var inside: String = null
    withProperties(spark, specs, Context("etl_nightly")) {
      inside = spark.conf.get("spark.sql.shuffle.partitions")
    }
    assert(inside == "11")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prior)
    // restore runs even when the body throws
    intercept[RuntimeException] {
      withProperties(spark, specs, Context("etl_nightly")) {
        sys.error("boom")
      }
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prior)
    // a nonexistent property name surfaces the registry's loud error
    val bad = SessionPropertyManagers.parse(
      """[ { "sessionProperties": { "graft_no_such_prop": "1" } } ]""")
    val e = intercept[Exception] {
      withProperties(spark, bad, Context("u")) { () }
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("query_priority bridges the session into admission ordering") {
    import graft.functions.Registry.{install, prestoStatement}
    import graft.plans.ResourceGroups
    install(spark)
    assert(graft.functions.Registry.queryPriority(spark) == 1)
    prestoStatement(spark, "SET SESSION query_priority = '5'")
    try {
      assert(graft.functions.Registry.queryPriority(spark) == 5)
      // the bridge value orders a query_priority group's queue
      ResourceGroups.clearAll()
      val m = ResourceGroups.parse(
        """{ "rootGroups": [
          |  { "name": "qb", "maxQueued": 5, "hardConcurrencyLimit": 1,
          |    "schedulingPolicy": "query_priority" } ],
          |  "selectors": [ { "user": ".*", "group": "qb" } ] }"""
          .stripMargin)
      val g = ResourceGroups.stateOf(
        ResourceGroups.select(m, "u", None).get)
      assert(ResourceGroups.admit(g) == ResourceGroups.Run)
      val low = ResourceGroups.admit(g, priority = 1)
        .asInstanceOf[ResourceGroups.Queued].ticket
      val mine = ResourceGroups.admit(g,
        priority = graft.functions.Registry.queryPriority(spark))
        .asInstanceOf[ResourceGroups.Queued].ticket
      assert(ResourceGroups.release(g) == Seq(mine))
      assert(ResourceGroups.release(g) == Seq(low))
      ResourceGroups.release(g)
    } finally prestoStatement(spark, "RESET SESSION query_priority")
  }

  test("statement classification follows the reference's QueryType table") {
    import graft.functions.StatementAdmission.queryTypeOf
    // StatementUtils.java:81-135
    assert(queryTypeOf("SELECT 1") == Some("SELECT"))
    assert(queryTypeOf(" WITH t AS (SELECT 1) SELECT * FROM t")
      == Some("SELECT"))
    assert(queryTypeOf("EXPLAIN SELECT 1") == Some("EXPLAIN"))
    assert(queryTypeOf("ANALYZE nation") == Some("ANALYZE"))
    assert(queryTypeOf("CREATE TABLE t AS SELECT 1 AS x")
      == Some("INSERT"))
    assert(queryTypeOf("CREATE TABLE t (x BIGINT)")
      == Some("DATA_DEFINITION"))
    assert(queryTypeOf("INSERT INTO t VALUES (1)") == Some("INSERT"))
    assert(queryTypeOf("DELETE FROM t WHERE x = 1") == Some("DELETE"))
    assert(queryTypeOf("SHOW SESSION") == Some("DESCRIBE"))
    assert(queryTypeOf("DESCRIBE nation") == Some("DESCRIBE"))
    assert(queryTypeOf("SET SESSION query_priority = '2'")
      == Some("DATA_DEFINITION"))
    assert(queryTypeOf("CALL system.runtime.kill_query('x')")
      == Some("DATA_DEFINITION"))
    assert(queryTypeOf("GRANT SELECT ON t TO USER u")
      == Some("DATA_DEFINITION"))
    assert(queryTypeOf("   ") == None)
  }

  test("query events compose with statement admission") {
    // an admitted statement's created event fires at DISPATCH with the
    // reference's QUEUED state, and its completed event carries the
    // resolved group's segments + the queued time
    import graft.functions.Registry._
    import graft.plans.QueryEvents._
    install(spark)
    val mgr = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "ev", "maxQueued": 5, "hardConcurrencyLimit": 4 } ],
        |  "selectors": [ { "user": ".*", "group": "ev" } ] }"""
        .stripMargin)
    ResourceGroups.clearAll()
    val created = new java.util.concurrent
      .CopyOnWriteArrayList[QueryCreatedEvent]()
    val completed = new java.util.concurrent
      .CopyOnWriteArrayList[QueryCompletedEvent]()
    val l = new EventListener {
      override def queryCreated(e: QueryCreatedEvent): Unit = created.add(e)
      override def queryCompleted(e: QueryCompletedEvent): Unit =
        completed.add(e)
    }
    addQueryEventListener(spark, l)
    installResourceGroups(spark, mgr)
    try {
      prestoStatement(spark, "SELECT 7 AS ev_adm_probe").collect()
      import scala.jdk.CollectionConverters._
      val c = created.asScala.find(_.metadata.query.contains("ev_adm_probe"))
      assert(c.nonEmpty)
      assert(c.get.metadata.queryState == "QUEUED") // dispatch state
      assert(c.get.context.resourceGroupId.contains(Seq("ev")))
      val d = completed.asScala
        .find(_.metadata.query.contains("ev_adm_probe"))
      assert(d.nonEmpty)
      assert(d.get.metadata.queryState == "FINISHED")
      assert(d.get.statistics.queuedTimeMillis >= 0L)
      assert(d.get.context.resourceGroupId.contains(Seq("ev")))
      assert(d.get.executionStartTime.nonEmpty)
    } finally {
      uninstallResourceGroups(spark)
      removeQueryEventListener(spark, l)
      ResourceGroups.clearAll()
    }
  }

  test("explicit SET SESSION outranks manager defaults and survives") {
    import graft.functions.Registry.{install, prestoStatement}
    install(spark)
    // the reference applies manager defaults at session creation with
    // LOWER precedence than explicit session properties — an explicit
    // SET must neither be overridden inside the block nor wiped by the
    // block's restore (FileSessionPropertyManager defaults merge UNDER
    // the session's own properties)
    prestoStatement(spark, "SET SESSION hash_partition_count = '23'")
    try {
      var inside: String = null
      var insideOther: String = null
      withProperties(spark, specs, Context("etl_nightly")) {
        inside = spark.conf.get("spark.sql.shuffle.partitions")
        insideOther = prestoStatement(spark, "SHOW SESSION")
          .filter("Name = 'task_concurrency'")
          .collect()(0).getString(1)
      }
      // the manager's 11 did NOT override the explicit 23...
      assert(inside == "23")
      // ...while the not-explicitly-set sibling property DID apply
      assert(insideOther == "2")
      // and after the block the explicit SET is still in effect
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "23")
      val shown = prestoStatement(spark, "SHOW SESSION")
        .filter("Name = 'hash_partition_count'")
        .collect()(0).getString(1)
      assert(shown == "23")
    } finally prestoStatement(spark,
      "RESET SESSION hash_partition_count")
  }
}

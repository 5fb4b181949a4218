package graft

import graft.plans.ResourceGroups
import graft.plans.ResourceGroups._

/** Selector/template/admission semantics of plans/ResourceGroups.scala
  * beyond the q2s gate: error paths and ordering rules from
  * `StaticSelector.java` / `ResourceGroupNameTemplate.java` /
  * `InternalResourceGroup.java`. */
class ResourceGroupsSuite extends org.scalatest.funsuite.AnyFunSuite {

  private val mgr = ResourceGroups.parse(
    """{ "rootGroups": [
      |  { "name": "top", "maxQueued": 10, "hardConcurrencyLimit": 2,
      |    "subGroups": [
      |      { "name": "sub_${team}", "maxQueued": 1,
      |        "hardConcurrencyLimit": 1 } ] },
      |  { "name": "first", "maxQueued": 1, "hardConcurrencyLimit": 1 },
      |  { "name": "second", "maxQueued": 2, "hardConcurrencyLimit": 2 } ],
      |  "selectors": [
      |    { "user": "x.*", "group": "first" },
      |    { "user": ".*", "group": "second" },
      |    { "source": "t-(?<team>[a-z]+)", "group": "top.sub_${team}" }
      |  ] }""".stripMargin)

  test("selectors evaluate in order; first match wins") {
    // 'xena' matches BOTH user selectors — the first one must win
    assert(ResourceGroups.select(mgr, "xena", None).get.id == "first")
    assert(ResourceGroups.select(mgr, "amy", None).get.id == "second")
  }

  test("named capture groups expand nested templates") {
    val m2 = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "top", "maxQueued": 10, "hardConcurrencyLimit": 2,
        |    "subGroups": [
        |      { "name": "sub_${team}", "maxQueued": 7,
        |        "hardConcurrencyLimit": 3 } ] } ],
        |  "selectors": [
        |    { "source": "t-(?<team>[a-z]+)", "group": "top.sub_${team}" }
        |  ] }""".stripMargin)
      val r = ResourceGroups.select(m2, "u", Some("t-ml")).get
      assert(r.id == "top.sub_ml")
      assert(r.maxQueued == 7 && r.hardConcurrencyLimit == 3)
  }

  test("selector queryType matches case-insensitively; absent reads ''") {
    // StaticSelector.java:108-112
    val m = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "etl", "maxQueued": 1, "hardConcurrencyLimit": 1 },
        |  { "name": "rest", "maxQueued": 1, "hardConcurrencyLimit": 1 } ],
        |  "selectors": [
        |    { "user": ".*", "queryType": "INSERT", "group": "etl" },
        |    { "user": ".*", "group": "rest" } ] }""".stripMargin)
    assert(ResourceGroups.select(m, "u", None,
      queryType = Some("insert")).get.id == "etl")
    assert(ResourceGroups.select(m, "u", None,
      queryType = Some("SELECT")).get.id == "rest")
    assert(ResourceGroups.select(m, "u", None).get.id == "rest")
  }

  test("selector resource estimates gate on inclusive ranges") {
    // SelectorResourceEstimate.match: a constrained dimension requires
    // the query's estimate PRESENT and inside [min, max]; units ride
    // airlift's duration/datasize spellings
    val m = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "small", "maxQueued": 1, "hardConcurrencyLimit": 1 },
        |  { "name": "rest", "maxQueued": 1, "hardConcurrencyLimit": 1 } ],
        |  "selectors": [
        |    { "selectorResourceEstimate": {
        |        "executionTime": { "min": "30s", "max": "5m" },
        |        "peakMemory": { "max": "500MB" } },
        |      "group": "small" },
        |    { "user": ".*", "group": "rest" } ] }""".stripMargin)
    def est(secs: Double, mb: Double) = QueryEstimates(
      executionTimeSecs = Some(secs),
      peakMemoryBytes = Some(mb * 1024 * 1024))
    assert(ResourceGroups.select(m, "u", None,
      estimates = est(60, 100)).get.id == "small")
    // bounds are inclusive both ends
    assert(ResourceGroups.select(m, "u", None,
      estimates = est(300, 500)).get.id == "small")
    assert(ResourceGroups.select(m, "u", None,
      estimates = est(29, 100)).get.id == "rest") // under min
    assert(ResourceGroups.select(m, "u", None,
      estimates = est(60, 501)).get.id == "rest") // over max
    // missing estimate for a constrained dimension never matches
    assert(ResourceGroups.select(m, "u", None, estimates =
      QueryEstimates(executionTimeSecs = Some(60.0))).get.id == "rest")
    assert(ResourceGroups.select(m, "u", None).get.id == "rest")
    // unit parsing
    assert(ResourceGroups.parseDurationSecs("1.5h") == 5400.0)
    assert(ResourceGroups.parseDataSizeBytes("2kB") == 2048.0)
    intercept[IllegalArgumentException](
      ResourceGroups.parseDurationSecs("5 parsecs"))
  }

  test("clientTags must be a subset of the criteria tags") {
    val m2 = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "g", "maxQueued": 1, "hardConcurrencyLimit": 1 } ],
        |  "selectors": [
        |    { "clientTags": ["etl", "hourly"], "group": "g" } ] }"""
        .stripMargin)
    assert(ResourceGroups.select(m2, "u", None, Set("etl")).isEmpty)
    assert(ResourceGroups.select(m2, "u", None,
      Set("etl", "hourly", "extra")).get.id == "g")
  }

  test("no matching selector means no group (the rejection arm)") {
    val m2 = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "g", "maxQueued": 1, "hardConcurrencyLimit": 1 } ],
        |  "selectors": [ { "user": "admin", "group": "g" } ] }"""
        .stripMargin)
    assert(ResourceGroups.select(m2, "mallory", None).isEmpty)
  }

  test("unresolved template variable fails loudly") {
    val m2 = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "g_${nope}", "maxQueued": 1,
        |    "hardConcurrencyLimit": 1 } ],
        |  "selectors": [ { "user": ".*", "group": "g_${nope}" } ] }"""
        .stripMargin)
    val e = intercept[IllegalArgumentException] {
      ResourceGroups.select(m2, "u", None)
    }
    assert(e.getMessage.contains("unresolved variable 'nope'"))
  }

  test("release without queue frees the slot; with queue hands it over") {
    ResourceGroups.clearAll()
    val r = Resolved(Seq("t"), maxQueued = 1, hardConcurrencyLimit = 1,
      schedulingPolicy = None, schedulingWeight = None)
    val g = ResourceGroups.stateOf(r)
    assert(ResourceGroups.admit(g) == Run)
    assert(g.runningCount == 1)
    assert(ResourceGroups.release(g).isEmpty)
    assert(g.runningCount == 0)
    assert(ResourceGroups.admit(g) == Run)
    val q = ResourceGroups.admit(g)
    assert(q.isInstanceOf[Queued])
    // the released slot is handed to the queued query: running stays 1
    assert(ResourceGroups.release(g).nonEmpty)
    assert(g.runningCount == 1 && g.queuedCount == 0)
  }

  test("reconfigure re-limits a live group without touching its queue") {
    // DbResourceGroupConfigurationManager.configureChangedGroups: the
    // new limits govern the NEXT admission; running/queued survive
    ResourceGroups.clearAll()
    val r = Resolved(Seq("rc"), maxQueued = 1, hardConcurrencyLimit = 1,
      schedulingPolicy = None, schedulingWeight = None)
    val g = ResourceGroups.stateOf(r)
    assert(ResourceGroups.admit(g) == Run)
    assert(ResourceGroups.admit(g).isInstanceOf[Queued])
    intercept[IllegalStateException](ResourceGroups.admit(g))
    ResourceGroups.reconfigure(r.copy(hardConcurrencyLimit = 3,
      maxQueued = 5))
    assert(ResourceGroups.admit(g) == Run)
    assert(g.runningCount == 2 && g.queuedCount == 1)
    // disable (the deleted-spec arm): zero limits reject immediately
    ResourceGroups.reconfigure(r.copy(hardConcurrencyLimit = 0,
      maxQueued = 0))
    intercept[IllegalStateException](ResourceGroups.admit(g))
    // reconfigure of a never-admitted group id is a no-op
    ResourceGroups.reconfigure(Resolved(Seq("ghost"), 1, 1, None, None))
  }

  test("ancestor capacity gates every leaf admission") {
    // InternalResourceGroup.run:505-535 — the whole chain must clear:
    // a root at its hard limit parks leaf admissions even when the
    // leaf has capacity; queue-full can fire at an ancestor's
    // maxQueued; counts propagate as descendant totals
    ResourceGroups.clearAll()
    val m = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "root", "maxQueued": 3, "hardConcurrencyLimit": 2,
        |    "subGroups": [
        |      { "name": "a", "maxQueued": 10, "hardConcurrencyLimit": 2 },
        |      { "name": "b", "maxQueued": 10, "hardConcurrencyLimit": 2 }
        |    ] } ],
        |  "selectors": [
        |    { "source": "a", "group": "root.a" },
        |    { "source": "b", "group": "root.b" } ] }""".stripMargin)
    val ga = ResourceGroups.stateOf(
      ResourceGroups.select(m, "u", Some("a")).get)
    val gb = ResourceGroups.stateOf(
      ResourceGroups.select(m, "u", Some("b")).get)
    assert(ResourceGroups.admit(ga) == Run)
    assert(ResourceGroups.admit(gb) == Run)
    // both leaves have a free slot, but root (hard 2) is full
    assert(ResourceGroups.admit(ga).isInstanceOf[Queued])
    assert(ResourceGroups.admit(gb).isInstanceOf[Queued])
    val root = ResourceGroups.stateOf(
      ResourceGroups.select(m, "u", Some("a")).get.parents.head)
    assert(root.runningCount == 2 && root.queuedCount == 2)
    // root maxQueued 3: the fourth queued query overflows AT THE ROOT,
    // reported with the leaf's id
    assert(ResourceGroups.admit(gb).isInstanceOf[Queued])
    val e = intercept[IllegalStateException](ResourceGroups.admit(ga))
    assert(e.getMessage == "Too many queued queries for \"root.a\"")
    // a release starts the EARLIEST-queued query tree-wide (ticket 0,
    // ga's) and keeps the root total constant
    assert(ResourceGroups.release(ga) == Seq(0L))
    assert(root.runningCount == 2 && root.queuedCount == 2)
    assert(ga.runningCount == 1 && ga.queuedCount == 0)
    // releasing a leaf with an empty queue hands the freed capacity to
    // the OTHER leaf's parked query (queryFinished →
    // root.processQueuedQueries promotes across the whole tree)
    assert(ResourceGroups.release(ga) == Seq(1L))
    assert(root.runningCount == 2 && gb.runningCount == 2)
    assert(gb.queuedCount == 1)
    assert(ResourceGroups.release(gb) == Seq(2L))
    assert(gb.queuedCount == 0 && root.queuedCount == 0)
  }

  test("cancel and reconfigure keep the ancestor bookkeeping exact") {
    ResourceGroups.clearAll()
    val m = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "r", "maxQueued": 4, "hardConcurrencyLimit": 1,
        |    "subGroups": [
        |      { "name": "x", "maxQueued": 4, "hardConcurrencyLimit": 1 }
        |    ] } ],
        |  "selectors": [ { "user": ".*", "group": "r.x" } ] }"""
        .stripMargin)
    val gx = ResourceGroups.stateOf(ResourceGroups.select(m, "u", None).get)
    val gr = ResourceGroups.stateOf(
      ResourceGroups.select(m, "u", None).get.parents.head)
    assert(ResourceGroups.admit(gx) == Run)
    val Queued(t1) = ResourceGroups.admit(gx): @unchecked
    val Queued(t2) = ResourceGroups.admit(gx): @unchecked
    assert(gr.queuedCount == 2 && gx.queuedCount == 2)
    // cancel decrements the WHOLE chain's queued totals, exactly once
    assert(ResourceGroups.cancelQueued(gx, t1))
    assert(gr.queuedCount == 1 && gx.queuedCount == 1)
    assert(!ResourceGroups.cancelQueued(gx, t1)) // already gone: false
    assert(gr.queuedCount == 1)
    // a reconfigure (which preserves lineage) still promotes through
    // the chain: widening the leaf alone is NOT enough (root binds)…
    ResourceGroups.reconfigure(gx.resolved.copy(hardConcurrencyLimit = 5))
    assert(ResourceGroups.release(gx) == Seq(t2)) // root slot handed on
    assert(gr.runningCount == 1 && gx.runningCount == 1)
    // …and the promoted query still counts at every level
    assert(ResourceGroups.release(gx).isEmpty)
    assert(gr.runningCount == 0 && gx.runningCount == 0 &&
      gr.queuedCount == 0)
  }

  test("weighted_fair and weighted policies pick children by share") {
    // WeightedFairQueue.poll:67-99 (delta = utilization share over
    // weight share, minimum wins) and the weighted policy's
    // share-proportional pick (deterministic here; the reference
    // flips a weighted coin — documented)
    ResourceGroups.clearAll()
    val m = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "wf", "maxQueued": 10, "hardConcurrencyLimit": 2,
        |    "schedulingPolicy": "weighted_fair",
        |    "subGroups": [
        |      { "name": "a", "maxQueued": 5, "hardConcurrencyLimit": 2,
        |        "schedulingWeight": 1 },
        |      { "name": "b", "maxQueued": 5, "hardConcurrencyLimit": 2,
        |        "schedulingWeight": 3 } ] },
        |  { "name": "w", "maxQueued": 10, "hardConcurrencyLimit": 1,
        |    "schedulingPolicy": "weighted",
        |    "subGroups": [
        |      { "name": "c", "maxQueued": 5, "hardConcurrencyLimit": 1,
        |        "schedulingWeight": 1 },
        |      { "name": "d", "maxQueued": 5, "hardConcurrencyLimit": 1,
        |        "schedulingWeight": 5 } ] } ],
        |  "selectors": [
        |    { "source": "a", "group": "wf.a" },
        |    { "source": "b", "group": "wf.b" },
        |    { "source": "c", "group": "w.c" },
        |    { "source": "d", "group": "w.d" } ] }""".stripMargin)
    def st(src: String) = ResourceGroups.stateOf(
      ResourceGroups.select(m, "u", Some(src)).get)
    val (ga, gb) = (st("a"), st("b"))
    assert(ResourceGroups.admit(ga) == Run)
    assert(ResourceGroups.admit(gb) == Run) // root full
    assert(ResourceGroups.admit(ga).isInstanceOf[Queued]) // ticket 0
    assert(ResourceGroups.admit(gb).isInstanceOf[Queued]) // ticket 1
    // b finishes: utilization a=1, b=0 — weighted_fair hands the slot
    // to UNDER-SERVED b (delta 0 beats 2) though a queued earlier
    assert(ResourceGroups.release(gb) == Seq(1L))
    assert(gb.runningCount == 1 && ga.queuedCount == 1)
    // weighted: the heavier share wins regardless of arrival order
    val (gc, gd) = (st("c"), st("d"))
    assert(ResourceGroups.admit(gc) == Run)
    assert(ResourceGroups.admit(gc).isInstanceOf[Queued]) // ticket 2
    assert(ResourceGroups.admit(gd).isInstanceOf[Queued]) // ticket 3
    assert(ResourceGroups.release(gc) == Seq(3L))
  }

  test("cpu quota: hard limit blocks, soft limit penalizes, quota regenerates") {
    // InternalResourceGroup.canRunMore:896-921 +
    // internalGenerateCpuQuota:772-786
    ResourceGroups.clearAll()
    val m = ResourceGroups.parse(
      """{ "cpuQuotaPeriod": "10s",
        |  "rootGroups": [
        |    { "name": "cg", "maxQueued": 10, "hardConcurrencyLimit": 4,
        |      "softCpuLimit": "1s", "hardCpuLimit": "2s" } ],
        |  "selectors": [ { "user": ".*", "group": "cg" } ] }"""
        .stripMargin)
    val r = ResourceGroups.select(m, "u", None).get
    assert(r.softCpuLimitMillis == 1000L && r.hardCpuLimitMillis == 2000L)
    // rate = 1000 * hard / period = 1000 * 2000 / 10000 = 200 ms/s
    assert(r.cpuQuotaGenerationMillisPerSecond == 200L)
    val g = ResourceGroups.stateOf(r)
    // burn the full hard quota: even an idle group admits nothing
    assert(ResourceGroups.admit(g) == Run)
    assert(ResourceGroups.release(g, cpuMillis = 2000L).isEmpty)
    assert(g.cpuUsage == 2000L && g.runningCount == 0)
    assert(ResourceGroups.admit(g).isInstanceOf[Queued])
    // 5 s of quota (1000 ms) lands usage at the soft limit: the linear
    // penalty is 0 but the always-penalize-by-one floor applies —
    // min(hard-1, floor(hard*1)) = 3... and running<3 admits
    ResourceGroups.generateCpuQuota(g, 5L)
    assert(g.cpuUsage == 1000L)
    assert(ResourceGroups.admit(g) == Run)
    // usage 1500: penalty 0.5 → floor(4*0.5)=2 → min(3,2)=2: with 2
    // running the group is at its penalized limit
    assert(ResourceGroups.release(g, cpuMillis = 500L).nonEmpty)
    assert(ResourceGroups.admit(g) == Run)
    assert(ResourceGroups.admit(g).isInstanceOf[Queued])
    // full regeneration restores the configured concurrency
    ResourceGroups.generateCpuQuota(g, 100L)
    assert(g.cpuUsage == 0L)
    assert(ResourceGroups.admit(g) == Run)
    assert(ResourceGroups.admit(g) == Run)
    assert(g.runningCount == 4)
    // a release under CPU throttle does NOT hand the slot over: burn
    // quota past hard, release leaves the queue parked
    ResourceGroups.release(g, cpuMillis = 2500L)
    assert(ResourceGroups.admit(g).isInstanceOf[Queued])
    assert(ResourceGroups.release(g).isEmpty && g.queuedCount >= 1)
    // a SOFT-only configuration is rejected at parse with the
    // reference's own text (validateRootGroups:66 — soft requires
    // hard), as is soft > hard (:67)
    val eSoft = intercept[IllegalArgumentException](ResourceGroups.parse(
      """{ "cpuQuotaPeriod": "10s",
        |  "rootGroups": [
        |    { "name": "sg", "maxQueued": 10, "hardConcurrencyLimit": 4,
        |      "softCpuLimit": "1s" } ],
        |  "selectors": [ { "user": ".*", "group": "sg" } ] }"""
        .stripMargin))
    assert(eSoft.getMessage.contains(
      "Must specify hard CPU limit in addition to soft limit"))
    val eOrder = intercept[IllegalArgumentException](ResourceGroups.parse(
      """{ "cpuQuotaPeriod": "10s",
        |  "rootGroups": [
        |    { "name": "sg", "maxQueued": 10, "hardConcurrencyLimit": 4,
        |      "softCpuLimit": "2h", "hardCpuLimit": "1h" } ],
        |  "selectors": [ { "user": ".*", "group": "sg" } ] }"""
        .stripMargin))
    assert(eOrder.getMessage.contains(
      "Soft CPU limit cannot be greater than hard CPU limit"))
    // generation-rate floor (AbstractResourceConfigurationManager:224
    // Math.max(1, rate)): a hard limit under period/1000 must still
    // regenerate — rate 0 would park a hard-capped group forever
    val msFloor = ResourceGroups.parse(
      """{ "cpuQuotaPeriod": "10s",
        |  "rootGroups": [
        |    { "name": "fl", "maxQueued": 10, "hardConcurrencyLimit": 4,
        |      "hardCpuLimit": "5ms" } ],
        |  "selectors": [ { "user": ".*", "group": "fl" } ] }"""
        .stripMargin)
    val rFloor = ResourceGroups.select(msFloor, "u", None).get
    assert(rFloor.cpuQuotaGenerationMillisPerSecond == 1L)
    // cpu limits without a cpuQuotaPeriod are the reference's loud arm
    val bad = ResourceGroups.parse(
      """{ "rootGroups": [
        |    { "name": "b", "maxQueued": 1, "hardConcurrencyLimit": 1,
        |      "hardCpuLimit": "1h" } ],
        |  "selectors": [ { "user": ".*", "group": "b" } ] }"""
        .stripMargin)
    val e = intercept[IllegalArgumentException](
      ResourceGroups.select(bad, "u", None))
    assert(e.getMessage.contains(
      "cpuQuotaPeriod must be specified to use cpu limits"))
  }

  test("db manager: load populates, reload diffs, failure keeps config") {
    import graft.plans.DbResourceGroupManager
    import graft.sources.{GraftMySqlDriver, MySqlStore}
    GraftMySqlDriver.install()
    val url = "jdbc:mysql://graft-shim/g"
    Seq("resource_groups_global_properties", "resource_groups",
      "selectors", "exact_match_source_selectors")
      .foreach(MySqlStore.drop)
    ResourceGroups.clearAll()
    val mgr = new DbResourceGroupManager(url,
      "graft.sources.GraftMySqlDriver", "suite")
    mgr.initialize()
    // initialize is idempotent (probed, never resets)
    mgr.initialize()
    val c = java.sql.DriverManager.getConnection(url)
    val ins = c.prepareStatement(
      """INSERT INTO resource_groups (resource_group_id, name,
        | soft_memory_limit, max_queued, soft_concurrency_limit,
        | hard_concurrency_limit, scheduling_policy, scheduling_weight,
        | jmx_export, soft_cpu_limit, hard_cpu_limit, parent,
        | environment) VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)"""
        .stripMargin)
    def grp(id: Long, name: String, mq: Int, hc: Int,
        parent: Option[Long], env: String): Unit = {
      ins.setLong(1, id); ins.setString(2, name); ins.setString(3, "1GB")
      ins.setInt(4, mq); ins.setObject(5, null); ins.setInt(6, hc)
      ins.setObject(7, null); ins.setObject(8, null)
      ins.setObject(9, null); ins.setObject(10, null)
      ins.setObject(11, null)
      parent.fold(ins.setObject(12, null))(ins.setLong(12, _))
      ins.setString(13, env); ins.executeUpdate()
    }
    grp(1, "root", 5, 2, None, "suite")
    grp(2, "kid_${USER}", 1, 1, Some(1), "suite")
    grp(3, "other_env", 9, 9, None, "elsewhere") // filtered out
    val sel = c.prepareStatement(
      """INSERT INTO selectors (resource_group_id, priority, user_regex,
        | source_regex, query_type, client_tags,
        | selector_resource_estimate) VALUES (?, ?, ?, ?, ?, ?, ?)"""
        .stripMargin)
    sel.setLong(1, 2L); sel.setLong(2, 1L); sel.setString(3, ".*")
    sel.setObject(4, null); sel.setObject(5, null)
    sel.setObject(6, null); sel.setObject(7, null)
    sel.executeUpdate()
    mgr.load()
    // the other environment's group never loads (the DAO's WHERE)
    assert(mgr.select("pat", None).map(_.id).contains("root.kid_pat"))
    // change detection: an identical reload reconfigures nothing and
    // keeps serving; a real change shows on the next select
    mgr.load()
    assert(mgr.select("pat", None).exists(_.hardConcurrencyLimit == 1))
    val up = c.prepareStatement("UPDATE resource_groups SET " +
      "max_queued = ? WHERE resource_group_id = ?")
    up.setInt(1, 4); up.setLong(2, 2L); up.executeUpdate()
    mgr.load()
    assert(mgr.select("pat", None).exists(_.maxQueued == 4))
    // a group whose environment flips AWAY disables its live state;
    // flipping BACK must re-enable it (absent-then-present counts as
    // changed — the reference reconfigures re-appearing groups)
    val live = ResourceGroups.stateOf(mgr.select("pat", None).get)
    assert(ResourceGroups.admit(live) == Run)
    ResourceGroups.release(live)
    val flip = c.prepareStatement("UPDATE resource_groups SET " +
      "environment = ? WHERE resource_group_id = ?")
    flip.setString(1, "away"); flip.setLong(2, 2L); flip.executeUpdate()
    mgr.load()
    intercept[IllegalStateException](ResourceGroups.admit(live))
    flip.setString(1, "suite"); flip.setLong(2, 2L); flip.executeUpdate()
    mgr.load()
    assert(ResourceGroups.admit(live) == Run)
    ResourceGroups.release(live)
    // an ANCESTOR spec change re-limits its LIVE state on reload too
    // (selection records every level, not just the leaf): root drops
    // to hard 1 while the kid widens to 5 — the root becomes binding
    val up2 = c.prepareStatement("UPDATE resource_groups SET " +
      "hard_concurrency_limit = ? WHERE resource_group_id = ?")
    up2.setInt(1, 1); up2.setLong(2, 1L); up2.executeUpdate()
    up2.setInt(1, 5); up2.setLong(2, 2L); up2.executeUpdate()
    mgr.load()
    val kid = ResourceGroups.stateOf(mgr.select("pat", None).get)
    assert(ResourceGroups.admit(kid) == Run)
    val parked = ResourceGroups.admit(kid) // root 1/1 blocks
    assert(parked.isInstanceOf[Queued])
    parked match {
      case Queued(t) => ResourceGroups.cancelQueued(kid, t)
      case _ =>
    }
    ResourceGroups.release(kid)
    // a broken store keeps the last good configuration, loudly counted
    MySqlStore.drop("resource_groups")
    mgr.load()
    assert(mgr.refreshFailures == 1L)
    assert(mgr.select("pat", None).map(_.id).contains("root.kid_pat"))
    // a manager that NEVER loaded successfully propagates the failure
    ResourceGroups.clearAll()
    val broken = new DbResourceGroupManager(url,
      "graft.sources.GraftMySqlDriver", "suite")
    intercept[Exception](broken.load())
  }

  test("expanded segments containing dots stay distinct live states") {
    // ResourceGroupId is a SEGMENT LIST in the reference — user
    // "john.doe" under adhoc_${USER} must not collide with a sibling
    // path whose dotted rendering is identical
    ResourceGroups.clearAll()
    val g1 = ResourceGroups.stateOf(
      Resolved(Seq("g", "adhoc_john.doe"), 5, 5, None, None))
    val g2 = ResourceGroups.stateOf(
      Resolved(Seq("g", "adhoc_john", "doe"), 5, 5, None, None))
    assert(g1.resolved.id == g2.resolved.id) // display form collides
    assert(!(g1 eq g2)) // live state does not
    assert(ResourceGroups.admit(g1) == Run)
    assert(g1.runningCount == 1 && g2.runningCount == 0)
    ResourceGroups.release(g1)
  }

  test("awaitAdmission parks queued queries; promotion wakes them FIFO") {
    ResourceGroups.clearAll()
    val m = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "aw", "maxQueued": 5, "hardConcurrencyLimit": 1 } ],
        |  "selectors": [ { "user": ".*", "group": "aw" } ] }"""
        .stripMargin)
    val g = ResourceGroups.stateOf(ResourceGroups.select(m, "u", None).get)
    assert(ResourceGroups.admit(g) == Run) // saturate the one slot
    val started = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val done = new java.util.concurrent.CountDownLatch(3)
    // spawn one waiter at a time so arrival order is deterministic
    (1 to 3).foreach { i =>
      val before = g.queuedCount
      val t = new Thread(() => {
        assert(ResourceGroups.awaitAdmission(g, 30000L))
        started.add(i)
        ResourceGroups.release(g) // chain-promotes the next waiter
        done.countDown()
      })
      t.setDaemon(true)
      t.start()
      val deadline = System.currentTimeMillis() + 10000
      while (g.queuedCount == before &&
        System.currentTimeMillis() < deadline) Thread.sleep(1)
      assert(g.queuedCount == before + 1)
    }
    ResourceGroups.release(g) // kick off the promotion chain
    assert(done.await(30, java.util.concurrent.TimeUnit.SECONDS))
    import scala.jdk.CollectionConverters._
    assert(started.asScala.toList == List(1, 2, 3)) // fair = FIFO
    assert(g.runningCount == 0 && g.queuedCount == 0)
    // a waiter that times out withdraws its ticket — nothing leaks
    assert(ResourceGroups.admit(g) == Run)
    assert(!ResourceGroups.awaitAdmission(g, 50L))
    assert(g.queuedCount == 0)
    ResourceGroups.release(g)
  }

  test("query_priority policy: highest priority dequeues first") {
    // InternalResourceGroup QUERY_PRIORITY: the leaf's queue orders by
    // the query_priority session value, arrival breaking ties
    ResourceGroups.clearAll()
    val m = ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "qp", "maxQueued": 5, "hardConcurrencyLimit": 1,
        |    "schedulingPolicy": "query_priority" } ],
        |  "selectors": [ { "user": ".*", "group": "qp" } ] }"""
        .stripMargin)
    val g = ResourceGroups.stateOf(ResourceGroups.select(m, "u", None).get)
    assert(ResourceGroups.admit(g, priority = 1) == Run)
    val t1 = ResourceGroups.admit(g, priority = 1)
      .asInstanceOf[Queued].ticket
    val t5 = ResourceGroups.admit(g, priority = 5)
      .asInstanceOf[Queued].ticket
    val t3 = ResourceGroups.admit(g, priority = 3)
      .asInstanceOf[Queued].ticket
    assert(ResourceGroups.release(g) == Seq(t5)) // highest priority
    assert(ResourceGroups.release(g) == Seq(t3))
    assert(ResourceGroups.release(g) == Seq(t1))
    ResourceGroups.release(g)
    // a query_priority parent requires query_priority children
    // (setSchedulingPolicy:519-520, enforced at parse)
    val e = intercept[IllegalArgumentException](ResourceGroups.parse(
      """{ "rootGroups": [
        |  { "name": "p", "maxQueued": 1, "hardConcurrencyLimit": 1,
        |    "schedulingPolicy": "query_priority",
        |    "subGroups": [
        |      { "name": "c", "maxQueued": 1,
        |        "hardConcurrencyLimit": 1 } ] } ],
        |  "selectors": [] }""".stripMargin))
    assert(e.getMessage.contains("uses query priority scheduling"))
  }

  test("db exact-match selector resolves stored ids via templates") {
    // DbResourceGroupConfigurationManager.configure matches EXPANDED
    // ids against templated specs (getMatchingSpec /
    // ResourceGroupIdTemplate) — a stored id global.adhoc_alice under
    // spec global.adhoc_${USER} resolves to that spec's limits
    import graft.plans.DbResourceGroupManager
    import graft.sources.{GraftMySqlDriver, MySqlStore}
    GraftMySqlDriver.install()
    val url = "jdbc:mysql://graft-shim/g"
    Seq("resource_groups_global_properties", "resource_groups",
      "selectors", "exact_match_source_selectors")
      .foreach(MySqlStore.drop)
    ResourceGroups.clearAll()
    val mgr = new DbResourceGroupManager(url,
      "graft.sources.GraftMySqlDriver", "suite",
      exactMatchSelectorEnabled = true)
    mgr.initialize()
    val c = java.sql.DriverManager.getConnection(url)
    val ins = c.prepareStatement(
      """INSERT INTO resource_groups (resource_group_id, name,
        | soft_memory_limit, max_queued, soft_concurrency_limit,
        | hard_concurrency_limit, scheduling_policy, scheduling_weight,
        | jmx_export, soft_cpu_limit, hard_cpu_limit, parent,
        | environment) VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)"""
        .stripMargin)
    def grp(id: Long, name: String, mq: Int, hc: Int,
        parent: Option[Long]): Unit = {
      ins.setLong(1, id); ins.setString(2, name); ins.setString(3, "1GB")
      ins.setInt(4, mq); ins.setObject(5, null); ins.setInt(6, hc)
      ins.setObject(7, null); ins.setObject(8, null)
      ins.setObject(9, null); ins.setObject(10, null)
      ins.setObject(11, null)
      parent.fold(ins.setObject(12, null))(ins.setLong(12, _))
      ins.setString(13, "suite"); ins.executeUpdate()
    }
    grp(1, "global", 10, 4, None)
    grp(2, "adhoc_${USER}", 3, 2, Some(1))
    val ex = c.prepareStatement(
      """INSERT INTO exact_match_source_selectors (environment, source,
        | query_type, update_time, resource_group_id)
        | VALUES (?, ?, ?, ?, ?)""".stripMargin)
    ex.setString(1, "suite"); ex.setString(2, "nightly-etl")
    ex.setObject(3, null)
    ex.setTimestamp(4, new java.sql.Timestamp(0L))
    ex.setString(5, """["global", "adhoc_alice"]""")
    ex.executeUpdate()
    mgr.load()
    val hit = mgr.select("whoever", Some("nightly-etl")).get
    assert(hit.id == "global.adhoc_alice")
    assert(hit.maxQueued == 3 && hit.hardConcurrencyLimit == 2)
    // the ancestor chain rides along (admissions gate on global too)
    assert(hit.parents.map(_.id) == Seq("global"))
    assert(hit.parents.head.hardConcurrencyLimit == 4)
    // an id no template can bind still throws the loud arm
    ex.setString(2, "bogus-src")
    ex.setString(5, """["global", "nosuch", "deep"]""")
    ex.executeUpdate()
    intercept[IllegalArgumentException](
      mgr.select("whoever", Some("bogus-src")))
  }
}

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
    val r = Resolved("t", maxQueued = 1, hardConcurrencyLimit = 1,
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
    assert(ResourceGroups.release(g).isDefined)
    assert(g.runningCount == 1 && g.queuedCount == 0)
  }
}

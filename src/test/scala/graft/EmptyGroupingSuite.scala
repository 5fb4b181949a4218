package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.plans.logical.Union
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.functions.Registry

/** The SQL-standard grand-total row over an EMPTY input
  * (plans.EmptyGroupingSetsGrandTotal; divergence-ledger item 13, closed
  * r8): ROLLUP/CUBE (and any GROUPING SETS spelling the `()` set) yield
  * the single grand-total row even when zero rows survive the filter —
  * count 0, sum NULL, keys NULL, grouping() = 1 — exactly what the
  * reference's GroupIdOperator + () aggregation produce and what DuckDB
  * replays for the q0v gate. GROUPING SETS without `()` stays empty, and
  * non-empty inputs are unchanged (the probe branch is silent).
  */
class EmptyGroupingSuite extends GraftSuite with AdaptiveSparkPlanHelper {

  private lazy val ready: Unit = {
    Registry.install(spark)
    Tables.register(spark, SfDir)
  }

  test("rollup over empty input yields the grand-total row") {
    ready
    val rows = spark.sql(
      """SELECT l_returnflag rf, l_linestatus ls, count(*) n,
        |  sum(l_quantity) sq, CAST(grouping(l_returnflag) AS INT) g1,
        |  CAST(grouping(l_linestatus) AS INT) g2
        |FROM lineitem WHERE l_quantity < 0
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin).collect()
    assert(rows.toSeq == Seq(Row(null, null, 0L, null, 1, 1)))
  }

  test("cube over empty input yields the grand-total row") {
    ready
    val rows = spark.sql(
      """SELECT count(*) n, sum(l_quantity) sq
        |FROM lineitem WHERE l_quantity < 0
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin).collect()
    assert(rows.toSeq == Seq(Row(0L, null)))
  }

  test("grouping sets without () stays empty over empty input") {
    ready
    val rows = spark.sql(
      """SELECT l_returnflag rf, count(*) n
        |FROM lineitem WHERE l_quantity < 0
        |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus))
        |""".stripMargin).collect()
    assert(rows.isEmpty)
  }

  test("duplicate () sets emit the grand-total row once per spelling") {
    ready
    val rows = spark.sql(
      """SELECT count(*) n FROM lineitem WHERE l_quantity < 0
        |GROUP BY GROUPING SETS ((), ())""".stripMargin).collect()
    assert(rows.toSeq == Seq(Row(0L), Row(0L)))
  }

  test("aggregate-function empty defaults come from the functions themselves") {
    ready
    // FILTER (WHERE false) evaluates each function over zero rows: the
    // count family gives 0, sum/min/avg NULL, collect_list an EMPTY array —
    // no hand-maintained default table could get all of these right.
    val rows = spark.sql(
      """SELECT count(*) n, count(DISTINCT l_suppkey) nd, sum(l_quantity) s,
        |  min(l_shipdate) mn, avg(l_discount) av, collect_list(l_linestatus) cl
        |FROM lineitem WHERE l_quantity < 0
        |GROUP BY ROLLUP(l_returnflag)""".stripMargin).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.isNullAt(2) &&
      r.isNullAt(3) && r.isNullAt(4) && r.getSeq[String](5).isEmpty)
  }

  test("non-empty rollup results are unchanged and the rewrite is one-pass") {
    ready
    val df = spark.sql(
      """SELECT l_returnflag rf, count(*) n FROM lineitem
        |GROUP BY ROLLUP(l_returnflag)""".stripMargin)
    val byKey = df.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byKey(None) == 6000L && byKey.size == 4)
    // Plan shape: ONE Expand over Union(child, sentinel row) — the child
    // subtree appears exactly once (no probe branch replaying it; the
    // TPC-DS Q14 lesson), the sentinel flag rides the existing shuffle.
    val plan = df.queryExecution.optimizedPlan
    val expands = plan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
    }
    assert(expands.size == 1, plan.treeString)
    assert(plan.exists(_.isInstanceOf[Union]), plan.treeString)
    assert(plan.treeString.contains(
      graft.plans.EmptyGroupingSetsGrandTotal.FlagName), plan.treeString)
    // Idempotence: the analysis-time injection ran; the optimizer-installed
    // copy must not have stacked a second sentinel.
    val flags = plan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project
          if p.projectList.exists(
            _.name == graft.plans.EmptyGroupingSetsGrandTotal.FlagName) =>
        p
    }
    assert(flags.size == 2, plan.treeString) // real branch + sentinel branch
  }
}

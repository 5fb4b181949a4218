package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.plans.logical.Union
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

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

  test("property: every grouping-set spelling equals the per-set GROUP BY union") {
    ready
    // Independent ground truth: GROUPING SETS is DEFINED as the union of
    // one GROUP BY per set (keys outside the set nulled) — and Spark's
    // plain global aggregate already has correct empty-input semantics
    // (one default row), so deriving expected results this way checks
    // the sentinel rewrite against the spec without trusting Expand.
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", IntegerType),
      StructField("v", DoubleType)))
    val aggsSql = "count(*) AS n, sum(v) AS s, count(v) AS cv, min(a) AS ma"
    val aggCols = Seq(count(lit(1)).as("n"), sum(col("v")).as("s"),
      count(col("v")).as("cv"), min(col("a")).as("ma"))
    val spellings: Seq[(String, Seq[Seq[String]])] = Seq(
      "ROLLUP(a, b)" -> Seq(Seq("a", "b"), Seq("a"), Seq()),
      "CUBE(a, b)" -> Seq(Seq("a", "b"), Seq("a"), Seq("b"), Seq()),
      "GROUPING SETS ((a), (a, b))" -> Seq(Seq("a"), Seq("a", "b")),
      "GROUPING SETS ((), (b))" -> Seq(Seq(), Seq("b")),
      "GROUPING SETS ((), ())" -> Seq(Seq(), Seq()))
    def render(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
      rows.map(_.toSeq.map(x => if (x == null) "∅" else x.toString)
        .mkString("|")).sorted.toSeq
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val n = seed % 4 match { case 0 => 0; case k => rnd.nextInt(8) }
      val rows = (0 until n).map { _ =>
        org.apache.spark.sql.Row(
          if (rnd.nextInt(4) == 0) null else "k" + rnd.nextInt(3),
          if (rnd.nextInt(4) == 0) null else Int.box(rnd.nextInt(3)),
          rnd.nextInt(10).toDouble)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      df.createOrReplaceTempView("graft_gs_prop")
      spellings.foreach { case (spelling, sets) =>
        // only columns appearing in some set are selectable (standard
        // grouping-set scoping; others are MISSING_AGGREGATION errors)
        val keyCols = Seq("a", "b").filter(c => sets.exists(_.contains(c)))
        val keySel = (keyCols :+ "").mkString(", ")
        val got = spark.sql(
          s"SELECT $keySel$aggsSql FROM graft_gs_prop GROUP BY $spelling")
          .collect()
        val expected = sets.map { set =>
          val g = if (set.isEmpty) df.groupBy() else df.groupBy(set.map(col): _*)
          val agged = g.agg(aggCols.head, aggCols.tail: _*)
          val keyExprs = keyCols.map { c =>
            val dt = if (c == "a") "string" else "int"
            (if (set.contains(c)) col(c) else lit(null).cast(dt)).as(c)
          }
          agged.select(keyExprs ++ Seq(col("n"), col("s"), col("cv"),
            col("ma")): _*).collect()
        }.reduce(_ ++ _)
        assert(render(got) == render(expected),
          s"seed=$seed n=$n spelling=$spelling\n got=${render(got)}\n exp=${render(expected)}")
      }
    }
  }

  test("a rollup composed over an already-rewritten rollup gets its own row") {
    ready
    // r9 ADVICE regression: idempotence used to be a plan-GLOBAL marker
    // scan, so a fresh rollup chained over a subtree the rule had already
    // rewritten (here: the inner empty-input rollup) was silently left
    // unrewritten and its grand-total row went missing. The per-node check
    // (sentinel flag in the Expand's own output) rewrites the outer one.
    val inner = spark.sql(
      """SELECT l_returnflag rf, count(*) n FROM lineitem
        |WHERE l_quantity < 0 GROUP BY ROLLUP(l_returnflag)""".stripMargin)
    assert(inner.collect().toSeq == Seq(Row(null, 0L)))
    val outer = inner.filter(col("n") > 0)
      .rollup("rf").agg(count(lit(1)).as("m"))
    assert(outer.collect().toSeq == Seq(Row(null, 0L)))
    // Same through a temp view holding the analyzed inner plan.
    inner.createOrReplaceTempView("graft_inner_rollup")
    val viaView = spark.sql(
      """SELECT rf, count(*) m FROM graft_inner_rollup WHERE n > 0
        |GROUP BY ROLLUP(rf)""".stripMargin)
    assert(viaView.collect().toSeq == Seq(Row(null, 0L)))
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

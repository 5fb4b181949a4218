package graft

import org.apache.spark.sql.SparkSession

import graft.functions.Registry

/** Behaviors on DRIVER-PROVIDED sessions — sessions the engine did not
  * build, so `GraftExtensions` (analysis-time rules) is absent and the
  * only hooks are what `Registry.install` can attach post-hoc
  * (`spark.experimental.extraOptimizations`, conf). The bare session
  * comes from the public classic constructor with default (empty)
  * extensions over the shared SparkContext — exactly the shape an
  * embedding application hands the library. */
class DriverSessionSuite extends GraftSuite {

  /** A fresh session with NO graft extensions (new SessionState, default
    * extension set) — the driver-session shape. */
  private lazy val bare: SparkSession = {
    val s = org.apache.spark.sql.graft.TestSessions.bare(spark.sparkContext)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    Registry.install(s)
    s
  }

  private def sql1(q: String) = bare.sql(Registry.rewritePrestoSql(q)).head()

  test("bare session really lacks the analysis-time rules") {
    // guard the premise with a DISCRIMINATING probe: on a session with
    // neither hook (no extensions, no install), an unshielded
    // literal-literal zoned comparison constant-folds with struct PAIR
    // semantics — same instant in two zones reads unequal. If this
    // ever flips, the bare constructor leaked the extensions and every
    // test below stops testing the driver-session path.
    val virgin = org.apache.spark.sql.graft.TestSessions.bare(
      spark.sparkContext)
    val pairFolded = virgin.sql(
      """SELECT named_struct('utc', to_utc_timestamp(
        |    cast('2020-06-01 12:00:00' as timestamp_ntz), 'UTC'),
        |  'tz', 'UTC') =
        |  named_struct('utc', to_utc_timestamp(
        |    cast('2020-06-01 13:00:00' as timestamp_ntz), '+01:00'),
        |  'tz', '+01:00') AS eq""".stripMargin).head().getBoolean(0)
    assert(!pairFolded,
      "premise drift: a hook-free session now compares zoned structs " +
        "by instant — re-check TestSessions.bare")
  }

  test("literal-literal zoned comparisons use instant semantics (former residual)") {
    // same instant spelled in two zones: = is TRUE under the reference's
    // packed-millis comparison; pair-folding would say FALSE
    val r = sql1(
      """SELECT
        |  TIMESTAMP '2020-06-01 12:00:00 UTC' =
        |    TIMESTAMP '2020-06-01 13:00:00 +01:00' AS eq_instant,
        |  TIMESTAMP '2020-06-01 12:00:00 UTC' <
        |    TIMESTAMP '2020-06-01 12:30:00 UTC' AS lt_utc,
        |  TIMESTAMP '2020-06-01 14:00:00 +02:00' <=
        |    TIMESTAMP '2020-06-01 12:00:00 UTC' AS le_crosszone,
        |  TIMESTAMP '2020-06-01 12:00:00 UTC' <>
        |    TIMESTAMP '2020-06-01 12:00:00 +01:00' AS ne_hour""".stripMargin)
    assert(r.getBoolean(0), "same instant across zones must compare equal")
    assert(r.getBoolean(1))
    assert(r.getBoolean(2), "same instant: <= must hold")
    assert(r.getBoolean(3), "different instants must compare unequal")
  }

  test("TIME WITH TIME ZONE literal comparisons follow instants too") {
    val r = sql1(
      """SELECT
        |  TIME '10:00:00 +02:00' = TIME '09:00:00 +01:00' AS eq,
        |  TIME '10:00:00 +02:00' < TIME '09:30:00 +01:00' AS lt""".stripMargin)
    assert(r.getBoolean(0))
    assert(r.getBoolean(1))
  }

  test("zoned literals still carry their zone for extraction") {
    // the shield must not break the per-value layer: at_timezone /
    // zoned_timezone_hour read the tz field of the SAME literal
    val r = sql1(
      """SELECT zoned_timezone_hour(
        |  TIMESTAMP '2020-06-01 12:00:00 +05:30') AS h,
        |  zoned_timezone_minute(
        |  TIMESTAMP '2020-06-01 12:00:00 +05:30') AS m""".stripMargin)
    assert(r.getLong(0) == 5L && r.getLong(1) == 30L)
  }

  test("empty-input ROLLUP yields the grand-total row (driver session)") {
    Tables.register(bare, SfDir)
    // scan-backed empty input (the realistic shape: emptiness only
    // discoverable at runtime)
    val r = bare.sql(
      """SELECT count(*) AS n, sum(n_nationkey) AS s
        |FROM nation WHERE n_nationkey < 0
        |GROUP BY ROLLUP(n_regionkey)""".stripMargin).collect()
    assert(r.length == 1, s"grand-total row missing: ${r.toSeq}")
    assert(r(0).getLong(0) == 0 && r(0).isNullAt(1))
    // provably-empty input: PropagateEmptyRelation would erase the
    // aggregate before the last-batch rule — install excludes it on
    // driver sessions
    val r2 = bare.sql(
      """SELECT count(*) AS n, sum(v) AS s
        |FROM (SELECT 'x' AS k, 1 AS v WHERE 1 = 0)
        |GROUP BY ROLLUP(k)""".stripMargin).collect()
    assert(r2.length == 1, s"grand-total row missing (literal): ${r2.toSeq}")
    assert(r2(0).getLong(0) == 0 && r2(0).isNullAt(1))
  }

  test("empty-input ROLLUP with DISTINCT aggregates (driver session)") {
    // multiple distinct groups force RewriteDistinctAggregates; on a
    // driver session that logical rewrite runs BEFORE the user-provided
    // batch — the former ledger residual, closed by the rule's
    // post-RDA shape handler (r10)
    Tables.register(bare, SfDir)
    val q =
      """SELECT count(DISTINCT n_name) AS da,
        |  count(DISTINCT n_nationkey) AS db, count(*) AS n
        |FROM nation WHERE n_nationkey < 0
        |GROUP BY ROLLUP(n_regionkey)""".stripMargin
    val r = bare.sql(q).collect()
    assert(r.length == 1, s"grand-total row missing: ${r.toSeq}")
    assert(r(0).getLong(0) == 0 && r(0).getLong(1) == 0 &&
      r(0).getLong(2) == 0)
    // negative control: a session with NEITHER hook loses the row —
    // proving this test discriminates (Spark's native behavior is 0
    // rows) and the post-RDA handler is what produces it here
    val virgin = org.apache.spark.sql.graft.TestSessions.bare(
      spark.sparkContext)
    Tables.register(virgin, SfDir)
    assert(virgin.sql(q).collect().isEmpty,
      "premise drift: Spark now emits the grand-total row natively — " +
        "re-check whether the sentinel rewrite is still needed")
  }

  test("NON-empty multi-distinct ROLLUP is value-identical across session kinds") {
    // the post-RDA sentinel surgery must be invisible on real data:
    // driver-session results match the engine session's row for row
    Tables.register(bare, SfDir)
    val q =
      """SELECT n_regionkey, count(DISTINCT n_name) AS da,
        |  count(DISTINCT n_nationkey % 3) AS db, count(*) AS n,
        |  grouping(n_regionkey) AS g
        |FROM nation GROUP BY ROLLUP(n_regionkey)
        |ORDER BY g, n_regionkey""".stripMargin
    Tables.register(spark, SfDir)
    val engine = spark.sql(q).collect().map(_.toSeq)
    val driver = bare.sql(q).collect().map(_.toSeq)
    assert(engine.length == 6) // 5 regions + grand total
    assert(driver.toSeq == engine.toSeq,
      s"driver ${driver.toSeq} != engine ${engine.toSeq}")
  }
}

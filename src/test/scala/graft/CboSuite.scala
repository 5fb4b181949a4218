package graft

import org.apache.spark.sql.functions._

/** Cost-based optimization end-to-end (SURVEY §4: the reference's CBO —
  * `presto-main/.../cost/CostCalculatorUsingExchanges.java`, join
  * distribution picked from statistics — maps onto Catalyst's CBO):
  * ANALYZE-collected column statistics must CHANGE the physical plan —
  * an equality filter on a high-NDV column shrinks the estimated size
  * below the broadcast threshold only when the optimizer can see ndv,
  * turning a shuffle join into a broadcast join. */
class CboSuite extends GraftSuite {

  test("ANALYZE column statistics flip a shuffle join to broadcast") {
    val t1 = "graft_cbo_li"
    val t2 = "graft_cbo_ord"
    Tables.view(spark, SfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .write.mode("overwrite").saveAsTable(t1)
    Tables.view(spark, SfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").saveAsTable(t2)
    def joined = spark.table(t1)
      .filter(col("l_orderkey") === 7L) // ~1/ndv of the fact table
      .join(spark.table(t2), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).count()
    val confs = Seq(
      "spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = confs.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // threshold below both FILE sizes: without stats-aware filter
      // estimation neither side broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "2048")
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val before = joined.queryExecution.executedPlan.treeString
      assert(!before.contains("BroadcastHashJoin"),
        s"premise drift: already broadcasts without statistics:\n$before")
      // collect table + column stats, turn CBO on: the l_orderkey = 7
      // filter now estimates count/ndv rows and drops under the
      // threshold -> broadcast
      spark.sql(s"ANALYZE TABLE $t1 COMPUTE STATISTICS FOR COLUMNS " +
        "l_orderkey, l_quantity, l_returnflag")
      spark.sql(s"ANALYZE TABLE $t2 COMPUTE STATISTICS FOR COLUMNS " +
        "o_orderkey, o_totalprice")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val after = joined.queryExecution.executedPlan.treeString
      assert(after.contains("BroadcastHashJoin"),
        s"column statistics did not flip the join to broadcast:\n$after")
    } finally {
      prev.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      spark.sql(s"DROP TABLE IF EXISTS $t1")
      spark.sql(s"DROP TABLE IF EXISTS $t2")
    }
  }
}

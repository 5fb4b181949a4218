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

  test("AQE splits the skewed side of a shuffle join at runtime") {
    // the runtime half of the skew story (Salt.scala is the manual
    // half): a 90%-hot key would pin one reducer; with AQE skew-join
    // handling the hot partition splits into slices, visible as
    // `skew=true` on the merge join in the FINAL adaptive plan
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
    val prev = confs.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // the join feeds a global aggregate, whose required distribution
      // would normally veto the split (it adds a shuffle); force it —
      // the production shape (join into a sink) needs no forcing
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val skewed = spark.range(200000)
        .select((when(col("id") % 10 =!= 0, 0L).otherwise(col("id")))
          .as("k"),
          // fat incompressible-ish payload so the hot partition's
          // shuffle bytes are unambiguously over the skew threshold
          md5(col("id").cast("string")).as("payload"))
      val dim = spark.range(2000).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      // keep the payload alive through the aggregate, or column pruning
      // shrinks the hot partition below the skew threshold
      val joined = skewed.join(dim, "k")
        .groupBy().agg(count(lit(1)).as("n"), max(col("payload")))
      joined.collect() // run it: skew handling is a RUNTIME re-plan
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}

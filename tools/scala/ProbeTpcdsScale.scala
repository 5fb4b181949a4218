package graft

import org.apache.spark.sql.functions._

/** Dev probe: replicate the TPC-H fact source 10x (orderkeys shifted per
  * replica so the lineitem⋈orders derivation joins within each copy) and
  * re-run the TPC-DS pack's heaviest shapes — evidence the star plans
  * hold at 10x: dimensions stay broadcast, Q65's two-level re-aggregation
  * grows linearly, Q88's cross joins stay 1-row x 1-row, Q95's
  * order-number self-join stays bounded by per-order line counts. */
object ProbeTpcdsScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val sf = "/root/testdata/sf0.1"

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[tpcds-scale] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val qs = Seq("qo1_tpcds_q7", "qq4_tpcds_q65", "qr2_tpcds_q88",
      "qr7_tpcds_q47", "qr9_tpcds_q95", "qr4_tpcds_q38")
    def run(q: String): Unit =
      SparkEntry.queries(q)(spark, sf)
        .write.format("noop").mode("overwrite").save()

    for (q <- qs) time(s"$q@1x")(run(q))

    // 10x facts: replicate lineitem/orders with per-replica orderkey
    // shifts; the derived star views re-create lazily over these.
    Tables.register(spark, sf)
    val li = Tables.df(spark, sf, "lineitem")
    val ord = Tables.df(spark, sf, "orders")
    (0 until 10).map(k => li.withColumn("l_orderkey",
        col("l_orderkey") + lit(k * 100000000L)))
      .reduce(_ unionAll _).createOrReplaceTempView("lineitem")
    (0 until 10).map(k => ord.withColumn("o_orderkey",
        col("o_orderkey") + lit(k * 100000000L)))
      .reduce(_ unionAll _).createOrReplaceTempView("orders")
    // facts are materialized per (JVM, dir) — drop them so the next
    // register re-derives from the replicated sources
    graft.queries.TpcdsSql.invalidateMaterialized(spark)

    for (q <- qs) time(s"$q@10x")(run(q))

    for (q <- Seq("qq4_tpcds_q65", "qo1_tpcds_q7")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      println(s"[tpcds-scale] $q plan@10x: " +
        "broadcast_joins=" + "BroadcastHashJoin".r.findAllIn(plan).size +
        " smj=" + "SortMergeJoin".r.findAllIn(plan).size +
        " cartesian=" + "Cartesian".r.findAllIn(plan).size)
    }

    // Inventory-fact family: the fact derives from `part`, so scale THAT
    // 10x (partkey shift keeps item joins within each replica) — the
    // r7 stats fix must keep the 42M-row inventory off broadcast sides
    // (Q22 pre-aggregated rollup grows linearly; Q72's fact-fact join
    // stays a co-partitioned SMJ).
    val part = Tables.df(spark, sf, "part")
    (0 until 10).map(k => part.withColumn("p_partkey",
        col("p_partkey") + lit(k * 100000000L)))
      .reduce(_ unionAll _).createOrReplaceTempView("part")
    graft.queries.TpcdsSql.invalidateMaterialized(spark)
    for (q <- Seq("qu6_tpcds_q22", "qt6_tpcds_q72")) {
      time(s"$q@10x-part")(run(q))
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      println(s"[tpcds-scale] $q plan@10x-part: " +
        "broadcast_joins=" + "BroadcastHashJoin".r.findAllIn(plan).size +
        " smj=" + "SortMergeJoin".r.findAllIn(plan).size +
        " cartesian=" + "Cartesian".r.findAllIn(plan).size)
    }
    spark.stop()
  }
}

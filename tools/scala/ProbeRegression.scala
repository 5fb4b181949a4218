package graft

/** Dev-only probe: time named queries in a fresh JVM, several passes each,
  * to separate plan cost from in-session effects (GC, codegen cache churn)
  * when diagnosing bench regressions.  Not part of the driver contract.
  */
object ProbeRegression {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    val names =
      if (args.nonEmpty) args.toSeq else Seq("q17_large_orders", "q43_except")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[probe] $n pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}

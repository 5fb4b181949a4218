package graft

/** Dev-only: isolated-probe a LIST of gate queries in one JVM (median of
  * 3 post-warm trials each, the ProbeSweep methodology incl. the
  * localCheckpoint-residue release). Not part of the driver contract.
  * Usage: runMain graft.ProbeMany <dir> <name1,name2,...|topN> */
object ProbeMany {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val spark = Sessions.local("32")
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      def release(): Unit = {
        spark.sparkContext.getPersistentRDDs.values
          .filter(org.apache.spark.rdd.GraftRddBridge.isLocallyCheckpointed)
          .foreach(_.unpersist(true))
        System.gc()
      }
      try {
        q(spark, dir).write.format("noop").mode("overwrite").save() // warm
        val times = (1 to 3).map { _ =>
          release()
          val t0 = System.nanoTime()
          q(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[probe] $name median=${times(1)}%.3f " +
          f"(all=${times.map(t => f"$t%.2f").mkString(",")})")
      } catch {
        case e: Throwable =>
          println(s"[probe] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Dev-only: time one gate query at a given fixture dir (median of 3
  * post-warm trials), for the BENCH_sf1 scaling sweep. Not part of the
  * driver contract. Usage: runMain graft.ProbeSweep <name> <dir>. */
object ProbeSweep {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val spark = Sessions.local("32")
    val q = SparkEntry.queries(name)
    q(spark, dir).write.format("noop").mode("overwrite").save() // warm
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[sweep] $name $dir median=${times(1)}%.3f s " +
      f"(all=${times.map(t => f"$t%.2f").mkString(",")})")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object ProbeQ71 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    val sf = "/root/testdata/sf0.1"
    def run(n: String): Unit =
      try {
        SparkEntry.queries(n)(spark, sf).write.format("noop").mode("overwrite").save()
        println(s"[probe] $n OK")
      } catch { case e: Throwable =>
        println(s"[probe] $n FAILED: ${e.getClass.getName}: ${e.getMessage.take(300)}")
      }
    SparkEntry.queries.keys.toSeq.sorted.foreach(run)
    run("q71_datetime_funcs")
    spark.stop()
  }
}

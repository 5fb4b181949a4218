package graft
import org.apache.spark.sql.SparkSession
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    val sf = "/root/testdata/sf0.01"
    args.foreach { q =>
      println(s"\n========== $q ==========")
      val df = SparkEntry.queries(q)(spark, sf)
      println(df.queryExecution.executedPlan.treeString.linesIterator
        .map(_.take(200)).take(80).mkString("\n"))
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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

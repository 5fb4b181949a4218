package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev-only: run one gate query (warm + one profiled pass) and dump the
  * executed plan tree with per-node SQLMetrics (rows, duration-class
  * metrics) — the no-UI substitute for the SQL tab's operator view.
  * Usage: runMain graft.ProfPlan <name> <dir> */
object ProfPlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val spark = Sessions.local("32")
    val q = SparkEntry.queries(name)
    q(spark, dir).write.format("noop").mode("overwrite").save() // warm
    val df = q(spark, dir)
    val t0 = System.nanoTime()
    // execute THIS df's QueryExecution (a .write would plan its own copy
    // and leave these nodes' metrics empty)
    df.queryExecution.executedPlan.execute()
      .foreachPartition((_: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => ())
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[prof] $name pass=$sec%.3f s")
    def walk(p: SparkPlan, depth: Int): Unit = {
      val keep = p.metrics.filter { case (k, m) =>
        m.value > 0 && (k.contains("Rows") || k.contains("time") ||
          k.contains("Time") || k == "duration" || k.contains("size") ||
          k.contains("spill"))
      }
      val ms = keep.toSeq.sortBy(_._1).map { case (k, m) =>
        s"$k=${m.value}"
      }.mkString(" ")
      println("  " * depth + p.nodeName + "  " + ms)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case s: QueryStageExec => walk(s.plan, depth + 1)
        case other => other.children.foreach(walk(_, depth + 1))
      }
      p.subqueries.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}

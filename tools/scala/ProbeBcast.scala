package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Dev probe: print every BroadcastExchange subtree estimate for a query. */
object ProbeBcast {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    def exchanges(p: SparkPlan): Seq[BroadcastExchangeExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        exchanges(a.executedPlan)
      case b: BroadcastExchangeExec => b +: b.children.flatMap(exchanges)
      case other => other.children.flatMap(exchanges)
    }
    val plan = SparkEntry.queries(args(0))(spark, sf)
      .queryExecution.executedPlan
    exchanges(plan).foreach { b =>
      val est = b.child.logicalLink.map(_.stats.sizeInBytes).getOrElse(BigInt(-1))
      println(s"[bcast] est=$est")
      println(b.child.treeString.linesIterator.take(12)
        .map("  " + _.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}

package graft.tools

import scala.io.Source

import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.Sessions
import graft.functions.Registry

/** Dev probe: which reference SQL function names resolve in this engine?
  *
  * Input: /tmp/ref_fn_names.txt (one Presto function name per line,
  * extracted from the reference's @ScalarFunction/@AggregationFunction
  * annotations). For each, checks the session FunctionRegistry after
  * Registry.install — i.e. exactly what `spark.sql` name resolution sees.
  * Prints the unresolved names for gap review. Dev-only; not shipped.
  */
object ProbeCoverage {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    Registry.install(spark)
    val reg = spark.sessionState.functionRegistry
    val names = Source.fromFile("/tmp/ref_fn_names.txt").getLines()
      .map(_.trim).filter(_.nonEmpty).toSeq
    val missing = names.filterNot(n =>
      reg.functionExists(FunctionIdentifier(n)))
    println(s"[coverage] ${names.size - missing.size}/${names.size} resolve")
    println("[coverage] missing: " + missing.mkString(" "))
    spark.stop()
  }
}

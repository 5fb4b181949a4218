package graft.tools

import graft.{Sessions, SparkEntry}
import graft.functions.Registry

/** Dev probe: isolated qu6 (TPC-DS Q22, ROLLUP over the 11.7M-row derived
  * inventory) timing — measures the sentinel rewrite's overhead. */
object ProbeQ22 {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local("32")
    Registry.install(s)
    def run(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("qu6_tpcds_q22")(s, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    println(f"[probe] qu6 isolated: ${run()}%.2f s / ${run()}%.2f s")
    s.stop()
  }
}

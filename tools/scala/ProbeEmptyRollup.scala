package graft.tools

import graft.{Sessions, Tables}
import graft.functions.Registry

/** Dev probe: empty-input grouping analytics after EmptyGroupingSetsGrandTotal. */
object ProbeEmptyRollup {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local("4")
    Registry.install(s)
    Tables.register(s, "/root/testdata/sf0.001")
    println("== rollup over empty ==")
    val d1 = s.sql("SELECT l_returnflag rf, l_linestatus ls, count(*) n, sum(l_quantity) sq, grouping(l_returnflag) g1 FROM lineitem WHERE l_quantity < 0 GROUP BY ROLLUP(l_returnflag, l_linestatus)")
    d1.show()
    d1.explain()
    println("== cube over empty ==")
    s.sql("SELECT count(*) n, sum(l_quantity) sq FROM lineitem WHERE l_quantity < 0 GROUP BY CUBE(l_returnflag, l_linestatus)").show()
    println("== grouping sets no () over empty ==")
    s.sql("SELECT l_returnflag rf, count(*) n FROM lineitem WHERE l_quantity < 0 GROUP BY GROUPING SETS ((l_returnflag),(l_returnflag,l_linestatus))").show()
    println("== grouping sets ((),()) over empty ==")
    s.sql("SELECT count(*) n FROM lineitem WHERE l_quantity < 0 GROUP BY GROUPING SETS ((),())").show()
    println("== nonempty rollup unchanged ==")
    s.sql("SELECT l_returnflag rf, count(*) n FROM lineitem GROUP BY ROLLUP(l_returnflag) ORDER BY rf NULLS LAST").show()
    println("== distinct agg + rollup over empty ==")
    s.sql("SELECT count(DISTINCT l_suppkey) nd, count(*) n FROM lineitem WHERE l_quantity < 0 GROUP BY ROLLUP(l_returnflag)").show()
    s.stop()
  }
}

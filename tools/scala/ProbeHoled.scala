package graft.tools

import graft.functions.GeomBoolean

object ProbeHoled {
  def main(args: Array[String]): Unit = {
    val u = Array(0.0, 0, 30, 0, 30, 30, 20, 30, 20, 10, 10, 10, 10, 30, 0, 30)
    val cap = Array(5.0, 20, 25, 20, 25, 25, 5, 25)
    val d1 = GeomBoolean.holedDifference(u, cap)
    println("U-cap comps: " + d1.map(GeomBoolean.signedArea).mkString(", "))
    d1.foreach(r => println("  ring: " + r.grouped(2).map(p => s"(${p(0)},${p(1)})").mkString(" ")))
    val d2 = GeomBoolean.holedDifference(cap, u)
    println("cap-U comps: " + d2.map(GeomBoolean.signedArea).mkString(", "))
    d2.foreach(r => println("  ring: " + r.grouped(2).map(p => s"(${p(0)},${p(1)})").mkString(" ")))
  }
}

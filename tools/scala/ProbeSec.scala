package graft.tools

import graft.{Sessions, Tables}
import graft.functions.Registry

/** Dev probe for the security/information_schema surface. */
object ProbeSec {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    Tables.register(spark, "/root/testdata/sf0.001")
    Registry.install(spark)
    def run(sql: String): Unit = {
      println(s"--- $sql")
      try Registry.prestoStatement(spark, sql).show(5, false)
      catch { case e: Throwable => println(s"ERR: ${e.getMessage}") }
    }
    run("SELECT column_name, ordinal_position, data_type FROM information_schema.columns WHERE table_name = 'lineitem' ORDER BY ordinal_position")
    run("CREATE ROLE analyst")
    run("GRANT analyst TO USER root")
    run("SHOW ROLES")
    run("SHOW CURRENT ROLES")
    run("GRANT SELECT, INSERT ON lineitem TO ROLE analyst WITH GRANT OPTION")
    run("SHOW GRANTS ON lineitem")
    spark.stop()
  }
}

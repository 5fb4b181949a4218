package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, SparkEntry}
import graft.functions.Registry

/** Dev probe: DSIR resampling (q0w) under the installed registry — guards
  * the split-shadow lesson (functions.split resolves by NAME in Spark 4,
  * so the Presto literal-delimiter shadow binds for the DataFrame API
  * too; a regex delimiter would silently stop splitting). */
object ProbeDsir {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local("4")
    Registry.install(s)
    val df = SparkEntry.queries("q0w_dsir_resample")(s, "/root/testdata/sf0.01")
    df.agg(count(lit(1)).as("n_kept"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en")).show()
    s.stop()
  }
}

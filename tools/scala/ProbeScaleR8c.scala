package graft.tools

import graft.{Sessions, SparkEntry}
import graft.functions.Registry

/** Dev probe: sf0.1 -> sf1 (10x) scaling sanity for the r8c operators
  * (DSIR resampling, PCA, and the sentinel-rewritten empty-rollup gate).
  * Prints per-query seconds at both scales; exponent = log10(ratio). */
object ProbeScaleR8c {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local("32")
    Registry.install(s)
    val qs = Seq("q0w_dsir_resample", "q0y_pca", "q0p_chunk_dedup",
      "q0j_semdedup", "q0v_empty_rollup")
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(s, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    qs.foreach { q =>
      time(q, "/root/testdata/sf0.1") // warm codegen
      val a = time(q, "/root/testdata/sf0.1")
      val b = time(q, "/tmp/sf1")
      println(f"[scale] $q: sf0.1=$a%.2f s sf1=$b%.2f s ratio=${b / a}%.2f exp=${math.log10(b / a)}%.2f")
    }
    s.stop()
  }
}

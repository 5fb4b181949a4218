package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.operators.{KMeans, Similarity}

/** Dev probe: Lloyd-round wall time at 1x vs 10x corpus (sf0.01 / sf0.1),
  * k = floor(sqrt(n)) like qk6. Expect ~n^1.5 growth (n rows x k
  * broadcast centroids per assignment scan) — the cost model SURVEY §2.4
  * documents. Dev-only; not shipped. */
object ProbeKmeans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val e = Tables.view(spark, dir, "embeddings")
        .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("e"))
      val n = e.count()
      val stride = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong)
      // warm
      KMeans.train(e, stride, 2).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      KMeans.train(e, stride, 2).write.format("noop").mode("overwrite").save()
      println(f"[kmeans] $dir n=$n k~${n / stride} " +
        f"train2=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

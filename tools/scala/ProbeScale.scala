package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: replicate the sf0.1 fixtures 10x (perturbed so replicas are
  * near- but not exact-duplicates) and measure the dedup/ANN pipelines —
  * evidence that candidate generation scales with corpus size, not
  * quadratically. */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    import graft.operators.{MinHash, Similarity}
    val sf = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (result=$n)")
    }

    val docs0 = Tables.view(spark, sf, "documents").select("doc_id", "text")
    val docs10 = (0 until 10).map(k =>
      docs0.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" replica token$k")).as("text")))
      .reduce(_ unionAll _)

    def minhashPipeline(docs: DataFrame): Long = {
      val sh = docs.select(col("doc_id"), MinHash.shingles(col("text")).as("sh"))
      val sigs = MinHash.signatures(sh, "doc_id", 64)
      val banded = MinHash.bandize(sigs, "doc_id", "sig", 16, 4)
      val cands = MinHash.candidatePairs(banded, "doc_id")
      MinHash.verifyJaccard(cands, sh, "doc_id", 0.8).count()
    }
    time("minhash_5k")(minhashPipeline(docs0))
    time("minhash_50k")(minhashPipeline(docs10))

    val emb0 = Tables.view(spark, sf, "embeddings")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("e"))
    val emb10 = (0 until 10).map(k =>
      emb0.select((col("vec_id") + lit(k * 100000L)).as("vec_id"),
        transform(col("e"), x => x + lit(k * 1e-4)).as("e")))
      .reduce(_ unionAll _)

    def lshPipeline(e: DataFrame, ppt: Int): Long = {
      val blocked = Similarity.bucketTables(e, "vec_id", "e", 4, ppt, 64)
      val a = blocked.select(col("t"), col("bv"), col("vec_id").as("a_id"))
      val b = blocked.select(col("t"), col("bv"), col("vec_id").as("b_id"))
      a.join(b, Seq("t", "bv")).filter(col("a_id") < col("b_id")).count()
    }
    // Fixed 3 bits/table: occupancy doubles with the corpus, pair work
    // grows ~quadratically — the shape q95/q96 must NOT have.
    time("lsh_cands_fixed3_2k")(lshPipeline(emb0, 3))
    time("lsh_cands_fixed3_20k")(lshPipeline(emb10, 3))
    // Adaptive planesFor(n, 64): bits grow with log2(n), occupancy stays
    // ~64 — candidate growth must be near-linear in corpus size.
    var c2k = 0L; var c20k = 0L
    time("lsh_cands_adaptive_2k") {
      c2k = lshPipeline(emb0, Similarity.planesFor(emb0.count(), 64)); c2k
    }
    time("lsh_cands_adaptive_20k") {
      c20k = lshPipeline(emb10, Similarity.planesFor(emb10.count(), 64)); c20k
    }
    val growth = c20k.toDouble / c2k
    val verdict = if (growth <= 15.0) "PASS" else "FAIL"
    println(f"[scale] adaptive candidate growth at 10x corpus: $growth%.1fx " +
      f"(linear = 10x, bound 15x) -> $verdict")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the driver contract). */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    import graft.operators.{MinHash, Similarity}

    def time(name: String)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[devtime] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = Tables.view(spark, sfDir, "documents")
      .select(col("doc_id"), MinHash.shingles(col("text")).as("sh"))
    val emb = Tables.view(spark, sfDir, "embeddings")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("e"))
    val li = Tables.view(spark, sfDir, "lineitem")

    time("shingles_only")(docs)
    time("minhash_sigs")(MinHash.signatures(docs, "doc_id", 64))
    val sigs = MinHash.signatures(docs, "doc_id", 64)
    val banded = MinHash.bandize(sigs, "doc_id", "sig", 16, 4)
    time("banded")(banded)
    time("cand_pairs")(MinHash.candidatePairs(banded, "doc_id"))
    time("q91_full")(SparkEntry.queries("q91_minhash_dedup")(spark, sfDir))

    time("emb_cast")(emb)
    time("plane_dots12")(Similarity.planeDots(emb, "vec_id", "e", 12, 64))
    time("bucket_tables")(Similarity.bucketTables(emb, "vec_id", "e", 4, 3, 64))
    val blocked = Similarity.bucketTables(emb, "vec_id", "e", 4, 3, 64)
    val a = blocked.select(col("t"), col("bv"), col("vec_id").as("a_id"))
    val b = blocked.select(col("t"), col("bv"), col("vec_id").as("b_id"))
    val cands = a.join(b, Seq("t", "bv")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    time("q96_cands")(cands)
    time("q96_full")(SparkEntry.queries("q96_embedding_neardup")(spark, sfDir))

    time("q85_cdist")(li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("x")))
    time("q85_acd")(li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("x")))
    time("q85_papprox")(li.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("x")))
    time("q85_pexact")(li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("x")))
    time("q85_full")(SparkEntry.queries("q85_approx_aggs")(spark, sfDir))

    time("q92_full")(SparkEntry.queries("q92_simhash_dedup")(spark, sfDir))
    val perFeature = docs.select(col("doc_id"), explode(col("sh")).as("f"))
      .withColumn("h", conv(substring(md5(col("f")), 1, 15), 16, 10).cast("long"))
    time("q92_features")(perFeature)
    time("q92_bitsums_exploded") {
      // variant: explode bit index -> (doc_id, k, +-1) rows, 2-col agg
      val bits = perFeature.select(col("doc_id"), col("h"),
          explode(sequence(lit(0), lit(59))).as("k"))
        .withColumn("s", when(expr("shiftright(h, k)")
          .bitwiseAND(1) === 1, 1).otherwise(-1))
        .groupBy(col("doc_id"), col("k")).agg(sum(col("s")).as("bs"))
      bits.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    }
    time("q92_bitsums") {
      val bitSums = (0 until 60).map(k =>
        sum(when(shiftright(col("h"), k).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"b$k"))
      perFeature.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    }
    spark.stop()
  }
}

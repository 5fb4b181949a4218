package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.MinHash

/** Dev probe: hamming distance distribution of true near-dup pairs. */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.view(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), MinHash.shingles(col("text")).as("sh"))
    val chunked = MinHash.simhashChunks(docs, "doc_id").cache()
    val a = chunked.select(col("doc_id").as("a_id"), col("chunk0").as("a0"),
      col("chunk1").as("a1"), col("chunk2").as("a2"), col("chunk3").as("a3"))
    val b = chunked.select(col("doc_id").as("b_id"), col("chunk0").as("b0"),
      col("chunk1").as("b1"), col("chunk2").as("b2"), col("chunk3").as("b3"))
    val truePairs = MinHash.verifyJaccard(
      a.select(col("a_id")).crossJoin(b.select(col("b_id")))
        .filter(col("a_id") < col("b_id")),
      docs, "doc_id", 0.8).select("a_id", "b_id")
    val hamming = (0 until 4).map(i =>
      bit_count(col(s"a$i").bitwiseXOR(col(s"b$i")))).reduce(_ + _)
    truePairs.join(a, "a_id").join(b, "b_id")
      .select(col("a_id"), col("b_id"), hamming.as("ham"))
      .orderBy(col("ham").desc)
      .show(30, false)
    spark.stop()
  }
}

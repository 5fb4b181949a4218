package graft

import org.apache.spark.sql.functions._

/** DSv2 write-path contract for the graft-memory connector
  * (sources/MemoryConn.scala): two-phase append/overwrite, chunked
  * read-back, loud schema mismatch and missing-table errors. */
class MemoryConnSuite extends GraftSuite {

  import spark.implicits._

  private def readBack(name: String) =
    spark.read.format("graft-memory").option("name", name).load()

  test("append and overwrite round-trip through the two-phase write") {
    graft.sources.MemoryConn.drop("mem_t1")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("graft-memory").option("name", "mem_t1")
      .mode("append").save()
    assert(readBack("mem_t1").count() == 2L)
    Seq((3L, "c")).toDF("id", "s")
      .write.format("graft-memory").option("name", "mem_t1")
      .mode("append").save()
    assert(readBack("mem_t1").orderBy("id").as[(Long, String)].collect()
      .toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    Seq((9L, "z")).toDF("id", "s")
      .write.format("graft-memory").option("name", "mem_t1")
      .mode("overwrite").save()
    assert(readBack("mem_t1").as[(Long, String)].collect().toSeq ==
      Seq((9L, "z")))
  }

  test("multi-partition writes land as parallel read chunks") {
    graft.sources.MemoryConn.drop("mem_t2")
    spark.range(1000).toDF("id").repartition(6)
      .write.format("graft-memory").option("name", "mem_t2")
      .mode("overwrite").save()
    val back = readBack("mem_t2")
    assert(back.count() == 1000L)
    assert(back.rdd.getNumPartitions == 6)
    assert(back.agg(sum(col("id"))).collect()(0).getLong(0) == 499500L)
  }

  test("schema mismatch on append and missing table fail loudly") {
    graft.sources.MemoryConn.drop("mem_t3")
    Seq((1L, "a")).toDF("id", "s").write.format("graft-memory")
      .option("name", "mem_t3").mode("append").save()
    val e = intercept[Exception] {
      Seq((1.5, "a")).toDF("id", "s").write.format("graft-memory")
        .option("name", "mem_t3").mode("append").save()
    }
    assert(e.getMessage.contains("schema mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("schema mismatch")),
      e.getMessage)
    val miss = intercept[Exception] { readBack("mem_phantom").collect() }
    assert(miss.getMessage.contains("does not exist"), miss.getMessage)
  }

  test("complex types survive the unsafe-row serialization") {
    graft.sources.MemoryConn.drop("mem_t4")
    Seq((1L, Seq(1, 2, 3), Map("k" -> 1.5)))
      .toDF("id", "xs", "m")
      .write.format("graft-memory").option("name", "mem_t4")
      .mode("overwrite").save()
    val row = readBack("mem_t4").collect()(0)
    assert(row.getAs[scala.collection.Seq[Int]]("xs").toSeq == Seq(1, 2, 3))
    assert(row.getAs[scala.collection.Map[String, Double]]("m").toMap ==
      Map("k" -> 1.5))
  }
}

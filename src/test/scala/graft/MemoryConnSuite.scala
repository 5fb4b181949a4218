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

  test("graft_mem catalog: CREATE/INSERT/RENAME COLUMN/DROP COLUMN/ADD/RENAME/DROP") {
    graft.sources.MemoryConn.drop("cat_t")
    graft.sources.MemoryConn.drop("cat_u")
    spark.sql("CREATE TABLE graft_mem.default.cat_t (id BIGINT, a STRING, junk INT)")
    spark.sql("INSERT INTO graft_mem.default.cat_t VALUES (1, 'x', 9), (2, 'y', 8)")
    // the two statements qk7 descoped, end-to-end through Spark's DDL:
    spark.sql("ALTER TABLE graft_mem.default.cat_t RENAME COLUMN a TO label")
    spark.sql("ALTER TABLE graft_mem.default.cat_t DROP COLUMN junk")
    spark.sql("ALTER TABLE graft_mem.default.cat_t ADD COLUMN score DOUBLE")
    spark.sql("INSERT INTO graft_mem.default.cat_t VALUES (3, 'z', 1.5)")
    val rows = spark.sql(
      "SELECT id, label, score FROM graft_mem.default.cat_t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    assert(rows == Seq((1L, "x", null), (2L, "y", null), (3L, "z", 1.5)))
    // RENAME TO moves the store entry; the old name is gone
    spark.sql("ALTER TABLE graft_mem.default.cat_t RENAME TO cat_u")
    assert(spark.sql("SELECT count(*) FROM graft_mem.default.cat_u")
      .head().getLong(0) == 3L)
    val missing = intercept[Exception](
      spark.sql("SELECT * FROM graft_mem.default.cat_t").collect())
    assert(missing.getMessage.toLowerCase.contains("cat_t"))
    // SHOW TABLES sees the catalog; DROP TABLE removes it
    val shown = spark.sql("SHOW TABLES IN graft_mem.default")
      .collect().map(_.getString(1)).toSet
    assert(shown.contains("cat_u"))
    spark.sql("DROP TABLE graft_mem.default.cat_u")
    val gone = spark.sql("SHOW TABLES IN graft_mem.default")
      .collect().map(_.getString(1)).toSet
    assert(!gone.contains("cat_u"))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.sources.{RedisKvTable, RedisStore}

/** The Redis-shaped connector (sources/RedisKvConn.scala): the
  * key-prefix table mapping, the zset index-range split contract, the
  * string/hash value dispatch with skip-on-retype, and the option
  * surface — the transport behaviors the differential gates (q1o/q1p)
  * aggregate away. */
class RedisKvSuite extends GraftSuite {

  test("zset split planning follows the RedisSplitManager constants") {
    // stride 100; the last split's end is -1 ("through the end")
    assert(RedisKvTable.zsetRanges(0) == Seq.empty)
    assert(RedisKvTable.zsetRanges(50) == Seq((0L, -1L)))
    // an exact-stride chunk keeps its literal end (the reference only
    // marks -1 when start+stride-1 overruns the key count)
    assert(RedisKvTable.zsetRanges(100) == Seq((0L, 99L)))
    assert(RedisKvTable.zsetRanges(250) ==
      Seq((0L, 99L), (100L, 199L), (200L, -1L)))
    // past 100 splits the stride grows (REDIS_MAX_SPLITS)
    val big = RedisKvTable.zsetRanges(20001)
    assert(big.size == 101) // stride 200: 100 full chunks + 1-key tail
    assert(big.head == (0L, 199L))
    assert(big.last == (20000L, -1L))
  }

  test("key-prefix mapping: schema/table/delimiter, default unprefixed") {
    RedisStore.set("pfx_t1:a", "1")
    RedisStore.set("pfx_t1:b", "2")
    RedisStore.set("pfx_t2:a", "9") // other table, same keyspace
    RedisStore.set("s1:pfx_t1:c", "3") // schema-qualified
    RedisStore.set("s1|pfx_t1|d", "4") // custom delimiter
    def keys(opts: (String, String)*): Set[String] = {
      var r = spark.read.format("graft-redis")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load().select("key").collect().map(_.getString(0)).toSet
    }
    // default schema: bare `table:*` — the other table and the
    // schema-qualified key are invisible
    assert(keys("table" -> "pfx_t1") == Set("pfx_t1:a", "pfx_t1:b"))
    // named schema prefixes the pattern
    assert(keys("table" -> "pfx_t1", "schema" -> "s1") ==
      Set("s1:pfx_t1:c"))
    // configurable delimiter (redis.key-delimiter)
    assert(keys("table" -> "pfx_t1", "schema" -> "s1",
      "key.delimiter" -> "|") == Set("s1|pfx_t1|d"))
    // key-prefix-schema-table=false: whole keyspace is one table
    val all = keys("table" -> "pfx_t1",
      "key.prefix.schema.table" -> "false")
    assert(Set("pfx_t1:a", "pfx_t2:a", "s1:pfx_t1:c").subsetOf(all))
  }

  test("value dispatch: string vs hash; re-typed keys skip, not corrupt") {
    RedisStore.set("vd_t:s1", "hello")
    RedisStore.hset("vd_t:h1", Map("f1" -> "x", "f2" -> "yy"))
    // string read surfaces value + lengths; the hash key is skipped
    // (the cursor's "data modified while query was running" arm)
    val str = spark.read.format("graft-redis").option("table", "vd_t")
      .load().orderBy("key").collect()
    assert(str.map(_.getString(0)).toSeq == Seq("vd_t:s1"))
    assert(str(0).getString(1) == "hello")
    assert(str(0).isNullAt(2)) // hash column null on the string arm
    assert(str(0).getLong(3) == "vd_t:s1".length.toLong)
    assert(str(0).getLong(4) == 5L)
    // hash read surfaces the field map; the string key is skipped
    val h = spark.read.format("graft-redis").option("table", "vd_t")
      .option("value.format", "hash").load().collect()
    assert(h.map(_.getString(0)).toSeq == Seq("vd_t:h1"))
    assert(h(0).isNullAt(1)) // value column null on the hash arm
    assert(h(0).getMap[String, String](2).toMap ==
      Map("f1" -> "x", "f2" -> "yy"))
    assert(h(0).getLong(4) == ("f1x" + "f2yy").length.toLong)
  }

  test("zset-keyed table: zrange order, split fan-out, member skip") {
    (1 to 250).foreach { i =>
      val key = f"zk_t:$i%03d"
      RedisStore.zadd("zk_index", i.toDouble, key)
      RedisStore.hset(key, Map("v" -> i.toString))
    }
    // a zset member whose key was deleted mid-query: skipped
    RedisStore.zadd("zk_index", 999.0, "zk_t:gone")
    val df = spark.read.format("graft-redis").option("table", "zk_t")
      .option("key.format", "zset").option("key.name", "zk_index")
      .option("value.format", "hash").load()
    // one task per stride-100 index chunk
    assert(df.rdd.getNumPartitions == 3)
    val rows = df.select(col("key"),
        element_at(col("hash"), "v").cast("long").as("v"))
      .collect()
    assert(rows.length == 250) // the dangling member contributed nothing
    assert(rows.map(_.getLong(1)).sum == (1 to 250).sum.toLong)
    // zrange semantics directly: (score, member) order, -1 tail,
    // out-of-range start
    assert(RedisStore.zrange("zk_index", 0, 1) ==
      Seq("zk_t:001", "zk_t:002"))
    assert(RedisStore.zrange("zk_index", 249, -1) ==
      Seq("zk_t:250", "zk_t:gone"))
    assert(RedisStore.zrange("zk_index", 500, -1) == Seq.empty)
    assert(RedisStore.zcard("zk_index") == 251L)
  }

  test("option surface fails loudly") {
    def load(opts: (String, String)*): Unit = {
      var r = spark.read.format("graft-redis")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load().collect()
    }
    assert(intercept[Exception](load())
      .getMessage.contains("table"))
    assert(intercept[Exception](load("table" -> "t",
      "key.format" -> "set")).getMessage.contains("key.format"))
    assert(intercept[Exception](load("table" -> "t",
      "key.format" -> "zset")).getMessage.contains("key.name"))
    assert(intercept[Exception](load("table" -> "t",
      "value.format" -> "list")).getMessage.contains("value.format"))
  }

  test("scan reports exact key counts so a small control table can broadcast") {
    (1 to 40).foreach(i => RedisStore.set(s"bc_t:$i", i.toString))
    val dim = spark.read.format("graft-redis").option("table", "bc_t")
      .load().select(col("key"), col("value").cast("long").as("v"))
    val fact = spark.range(0, 10000).toDF("id")
      .withColumn("v", col("id") % 40 + 1)
    val joined = fact.join(dim, "v")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the 40-key redis table to broadcast:\n$plan")
    assert(joined.count() == 10000L)
  }
}

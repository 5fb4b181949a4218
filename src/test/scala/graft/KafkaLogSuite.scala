package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.{KafkaLog, KafkaLogTable}

/** The Kafka-shaped connector (sources/KafkaLogConn.scala): batch offset
  * semantics, the sink contract, offset-JSON round-trips, and the
  * micro-batch streaming read — the transport-layer behaviors the batch
  * differential gates (q1d/q1e/q1f) aggregate away. */
class KafkaLogSuite extends GraftSuite {

  private def bytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("batch read surfaces the exact kafka source schema") {
    KafkaLog.create("t_schema", 1)
    KafkaLog.produce("t_schema", 0, bytes("k"), bytes("v"), 1700000000000L)
    val df = spark.read.format("graft-kafka")
      .option("subscribe", "t_schema").load()
    assert(df.schema == KafkaLogTable.Schema)
    val r = df.collect()(0)
    assert(new String(r.getAs[Array[Byte]]("key")) == "k")
    assert(new String(r.getAs[Array[Byte]]("value")) == "v")
    assert(r.getAs[String]("topic") == "t_schema")
    assert(r.getAs[Int]("partition") == 0)
    assert(r.getAs[Long]("offset") == 0L)
    assert(r.getAs[java.sql.Timestamp]("timestamp").getTime ==
      1700000000000L)
    assert(r.getAs[Int]("timestampType") == 0) // CreateTime
  }

  test("startingOffsets/endingOffsets honor earliest/latest/json with sentinels") {
    KafkaLog.create("t_off", 2)
    (0 until 10).foreach(i => KafkaLog.produce("t_off", i % 2, null,
      bytes(s"m$i"), 1700000000000L + i))
    def count(start: String = null, end: String = null): Long = {
      var r = spark.read.format("graft-kafka").option("subscribe", "t_off")
      if (start != null) r = r.option("startingOffsets", start)
      if (end != null) r = r.option("endingOffsets", end)
      r.load().count()
    }
    assert(count() == 10)
    assert(count(start = "earliest", end = "latest") == 10)
    // skip 2 from partition 0 only
    assert(count(start = """{"t_off":{"0":2,"1":0}}""") == 8)
    // -2 = earliest, -1 = latest sentinels (Spark's kafka grammar)
    assert(count(start = """{"t_off":{"0":-2,"1":-1}}""") == 5)
    // bounded end: first 3 of each partition
    assert(count(end = """{"t_off":{"0":3,"1":3}}""") == 6)
    // out-of-range start clamps to the log end, not an error
    assert(count(start = """{"t_off":{"0":99,"1":99}}""") == 0)
  }

  test("subscribe spans multiple topics, one split per partition range") {
    KafkaLog.create("t_a", 2)
    KafkaLog.create("t_b", 1)
    (0 until 4).foreach(i => KafkaLog.produce("t_a", i % 2, null,
      bytes(s"a$i"), 0L))
    KafkaLog.produce("t_b", 0, null, bytes("b0"), 0L)
    val df = spark.read.format("graft-kafka")
      .option("subscribe", "t_a, t_b").load()
    assert(df.count() == 5)
    assert(df.select("topic").distinct().collect()
      .map(_.getString(0)).toSet == Set("t_a", "t_b"))
    // empty ranges plan no splits: an empty topic contributes nothing
    KafkaLog.create("t_empty", 3)
    assert(spark.read.format("graft-kafka")
      .option("subscribe", "t_empty").load().rdd.getNumPartitions == 0)
  }

  test("sink writes key/value/partition/timestamp; default partitioner is key-sticky") {
    import spark.implicits._
    KafkaLog.create("t_sink", 4)
    Seq(("u1", "v1", 2), ("u2", "v2", 0))
      .toDF("k", "v", "p")
      .select(encode(col("k"), "UTF-8").as("key"),
        encode(col("v"), "UTF-8").as("value"),
        col("p").cast("int").as("partition"),
        lit(new java.sql.Timestamp(1700000000000L)).as("timestamp"))
      .write.mode("append").format("graft-kafka")
      .option("topic", "t_sink").save()
    val rows = spark.read.format("graft-kafka")
      .option("subscribe", "t_sink").load()
      .select(col("partition"),
        col("value").cast("string"),
        unix_millis(col("timestamp")))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set((2, "v1", 1700000000000L), (0, "v2", 1700000000000L)))
    // no partition column -> key-hash partitioner: one key, one partition
    KafkaLog.create("t_hash", 4)
    Seq.fill(8)("samekey").toDF("k")
      .select(encode(col("k"), "UTF-8").as("key"),
        encode(col("k"), "UTF-8").as("value"))
      .write.mode("append").format("graft-kafka")
      .option("topic", "t_hash").save()
    val parts = spark.read.format("graft-kafka")
      .option("subscribe", "t_hash").load()
      .select("partition").distinct().collect().map(_.getInt(0))
    assert(parts.length == 1)
    assert(KafkaLog.endOffsets("t_hash").sum == 8)
  }

  test("timestamp-based offset resolution mirrors offsetsForTimes") {
    // record timestamps 1000, 2000, ... per partition (driver-side
    // produce: arrival order = timestamp order, the Kafka assumption)
    KafkaLog.create("t_ts", 2)
    (0 until 10).foreach(i => KafkaLog.produce("t_ts", i % 2, null,
      bytes(s"m$i"), 1000L * (i / 2 + 1)))
    // first offset at-or-after ts; past-the-end timestamp -> end offset
    assert(KafkaLog.offsetForTimestamp("t_ts", 0, 3000L) == 2L)
    assert(KafkaLog.offsetForTimestamp("t_ts", 0, 2500L) == 2L)
    assert(KafkaLog.offsetForTimestamp("t_ts", 1, 99999L) == 5L)
    assert(KafkaLog.offsetForTimestamp("t_ts", 1, 0L) == 0L)
    def count(opts: (String, String)*): Long = {
      var r = spark.read.format("graft-kafka").option("subscribe", "t_ts")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load().count()
    }
    // skip everything before ts=3000 in both partitions: 3 remain each
    assert(count("startingOffsetsByTimestamp" ->
      """{"t_ts":{"0":3000,"1":3000}}""") == 6)
    // bounded end by timestamp: records strictly before ts=4000
    assert(count("endingOffsetsByTimestamp" ->
      """{"t_ts":{"0":4000,"1":4000}}""") == 6)
    // both bounds: ts in [2000, 5000)
    assert(count(
      "startingOffsetsByTimestamp" -> """{"t_ts":{"0":2000,"1":2000}}""",
      "endingOffsetsByTimestamp" -> """{"t_ts":{"0":5000,"1":5000}}""") == 6)
    // setting both an offset and a timestamp spec for the same bound
    // fails loudly, like Spark's kafka source
    val err = intercept[Exception] {
      count("startingOffsets" -> "earliest",
        "startingOffsetsByTimestamp" -> """{"t_ts":{"0":0,"1":0}}""")
    }
    assert(err.getMessage.contains("only one of"))
  }

  test("offset json round-trips the per-partition map") {
    val offs = Map("topic_z" -> Seq(5L, 0L, 17L), "a" -> Seq(3L))
    val json = KafkaLog.offsetsToJson(offs)
    assert(json == """{"a":{"0":3},"topic_z":{"0":5,"1":0,"2":17}}""")
    assert(KafkaLog.offsetsFromJson(json) == offs)
  }

  test("micro-batch stream delivers producer rounds incrementally with advancing offsets") {
    KafkaLog.create("t_stream", 2)
    (0 until 6).foreach(i => KafkaLog.produce("t_stream", i % 2, null,
      bytes(s"r1-$i"), 1700000000000L))
    val q = spark.readStream.format("graft-kafka")
      .option("subscribe", "t_stream").load()
      .select(col("partition"), col("offset"), col("value").cast("string"))
      .writeStream.format("memory").queryName("klog")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("klog").count() == 6)
      // second producer round arrives while the query runs: the next
      // micro-batch reads exactly the (committed, latest] delta
      (0 until 4).foreach(i => KafkaLog.produce("t_stream", i % 2, null,
        bytes(s"r2-$i"), 1700000001000L))
      q.processAllAvailable()
      val rows = spark.table("klog")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
      assert(rows.length == 10) // no replays, no loss
      // offsets are contiguous from 0 within each partition
      Seq(0, 1).foreach { p =>
        val offs = rows.filter(_._1 == p).map(_._2).sorted
        assert(offs.sameElements(offs.indices.map(_.toLong)),
          s"partition $p offsets not contiguous: ${offs.toSeq}")
      }
      // round-2 payloads sit at the tail offsets
      assert(rows.filter(_._3.startsWith("r2")).forall(_._2 >= 3))
    } finally q.stop()
  }

  test("streaming composes with the record decoders (kafka -> raw decode -> agg)") {
    import org.apache.spark.sql.types._
    import graft.functions.RecordDecoders
    KafkaLog.create("t_dec", 1)
    def msg(uid: Long, v: Double): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16)
      b.putLong(uid).putDouble(v)
      b.array()
    }
    (1L to 5L).foreach(k => KafkaLog.produce("t_dec", 0, null,
      msg(k % 2, k * 1.0), 1700000000000L))
    val q = spark.readStream.format("graft-kafka")
      .option("subscribe", "t_dec").load()
      .select(
        RecordDecoders.raw(col("value"), LongType, "LONG", "0").as("uid"),
        RecordDecoders.raw(col("value"), DoubleType, "DOUBLE", "8").as("v"))
      .groupBy(col("uid")).agg(sum(col("v")).as("sv"))
      .writeStream.format("memory").queryName("kdec")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val m = spark.table("kdec").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(m == Map(0L -> 6.0, 1L -> 9.0)) // 2+4, 1+3+5
    } finally q.stop()
  }

  test("offset json maps omitting a partition default by bound polarity") {
    KafkaLog.create("t_sparse", 3)
    (0 until 9).foreach(i => KafkaLog.produce("t_sparse", i % 3, null,
      bytes(s"m$i"), 1000L * i))
    def count(start: String = null, end: String = null): Long = {
      var r = spark.read.format("graft-kafka").option("subscribe", "t_sparse")
      if (start != null) r = r.option("startingOffsets", start)
      if (end != null) r = r.option("endingOffsets", end)
      r.load().count()
    }
    // endingOffsets omitting partitions 1 and 2 means "up to latest"
    // for them — NOT a silent empty [start, 0) range (that would
    // quietly drop their data; Spark's kafka source reserves -1 for
    // latest and errors on unspecified partitions)
    assert(count(end = """{"t_sparse":{"0":1}}""") == 1 + 3 + 3)
    // startingOffsets omitting a partition still means earliest
    assert(count(start = """{"t_sparse":{"0":2}}""") == 1 + 3 + 3)
    // and the timestamp variants inherit the same polarity: an
    // endingOffsetsByTimestamp map covering only partition 0 reads the
    // other partitions in full
    assert(spark.read.format("graft-kafka").option("subscribe", "t_sparse")
      .option("endingOffsetsByTimestamp", """{"t_sparse":{"0":3000}}""")
      .load().count() == 1 + 3 + 3)
  }

  test("sink rejects multi-topic writes and mistyped columns at plan time") {
    import spark.implicits._
    KafkaLog.create("t_w1", 1)
    KafkaLog.create("t_w2", 1)
    val df = Seq("x").toDF("v")
      .select(encode(col("v"), "UTF-8").as("value"))
    // a write with topic=a,b must not silently route everything to `a`
    val multi = intercept[Exception] {
      df.write.mode("append").format("graft-kafka")
        .option("topic", "t_w1,t_w2").save()
    }
    assert(multi.getMessage.contains("exactly one topic"))
    // mistyped optional columns fail at PLAN time (Spark's own
    // table-schema cast check, with KafkaLogWriteBuilder.build() as the
    // second line), not as an executor-side ClassCastException mid-job
    def mistyped(colName: String, c: org.apache.spark.sql.Column): Exception =
      intercept[Exception] {
        Seq("x").toDF("v")
          .select(encode(col("v"), "UTF-8").as("value"), c.as(colName))
          .write.mode("append").format("graft-kafka")
          .option("topic", "t_w1").save()
      }
    // (a long `partition` is NOT a mistype: ANSI store assignment
    // inserts a checked narrowing cast — use genuinely incompatible
    // types here)
    assert(mistyped("key", lit("string-key")).getMessage.contains("key"))
    assert(mistyped("partition", lit(true)).getMessage.contains("partition"))
    assert(mistyped("timestamp", lit(true)).getMessage.contains("timestamp"))
    // nothing was produced by any rejected write
    assert(KafkaLog.endOffsets("t_w1").sum == 0)
    assert(KafkaLog.endOffsets("t_w2").sum == 0)
  }
}

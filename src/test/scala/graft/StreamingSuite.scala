package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, Session}

/** Structured-Streaming behavior: watermarked windowed aggregation and
  * stateful sessionization driven through a MemoryStream micro-batch at a
  * time (the streaming execution paths the batch differential gate cannot
  * exercise). */
class StreamingSuite extends GraftSuite {

  import spark.implicits._

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  test("windowedCounts aggregates tumbling windows under append mode") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStream.windowedCounts(in.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(0), 10, "click", 1.0),
        Event(2, ts(3), 10, "click", 2.0),
        Event(3, ts(7), 11, "view", 5.0))
      q.processAllAvailable()
      // advance event time far past watermark so the first windows close
      in.addData(Event(4, ts(60), 10, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .selectExpr("event_type", "n_events", "total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("record decoders compose with streaming: binary messages to windowed counts") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.functions.RecordDecoders
    // the kafka shape: a `value: binary` stream decoded by fixed-offset
    // RAW fields (LONG uid @0, LONG epoch-millis @8, DOUBLE @16), then
    // watermarked tumbling windows — decode is a plain projection, so
    // it rides the streaming plan unchanged.
    def msg(uid: Long, tsMin: Long, v: Double): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24)
      b.putLong(uid).putLong(1700000000000L + tsMin * 60000L).putDouble(v)
      b.array()
    }
    val in = MemoryStream[Array[Byte]]
    val decoded = in.toDF().select(
      RecordDecoders.raw(col("value"), LongType, "LONG", "0").as("user_id"),
      timestamp_millis(RecordDecoders.raw(col("value"), LongType, "LONG", "8"))
        .as("ts"),
      RecordDecoders.raw(col("value"), DoubleType, "DOUBLE", "16").as("v"))
    val agg = decoded.withWatermark("ts", "20 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val q = agg.writeStream.format("memory").queryName("rawdec")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(msg(1, 0, 1.5), msg(1, 3, 2.5), msg(2, 7, 4.0))
      q.processAllAvailable()
      in.addData(msg(1, 60, 1.0)) // advance past watermark, close windows
      q.processAllAvailable()
      val rows = spark.table("rawdec").selectExpr("user_id", "n", "sv")
        .as[(Long, Long, Double)].collect().toSet
      assert(rows.contains((1L, 2L, 4.0)))
      assert(rows.contains((2L, 1L, 4.0)))
    } finally q.stop()
  }

  test("stream-static enrichment join broadcasts the dimension") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val dim = Seq((10L, "gold"), (11L, "basic")).toDF("user_id", "segment")
    val q = EventStream.enrich(in.toDF(), dim)
      .writeStream.format("memory").queryName("enr")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(0), 10, "click", 1.0),
        Event(2, ts(1), 11, "view", 2.0),
        Event(3, ts(2), 99, "view", 3.0)) // no dim row -> null segment
      q.processAllAvailable()
      val rows = spark.table("enr")
        .selectExpr("event_id", "segment")
        .as[(Long, Option[String])].collect().toMap
      assert(rows(1L).contains("gold"))
      assert(rows(2L).contains("basic"))
      assert(rows(3L).isEmpty)
    } finally q.stop()
  }

  test("sessionize splits on gap and emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStream.sessionize(in.toDS(), gapMinutes = 30,
        watermark = "1 minute")
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two bursts 100 minutes apart -> two sessions
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(110), 1, "view", 3.0),
        Event(4, ts(115), 1, "view", 4.0))
      q.processAllAvailable()
      // push watermark far ahead so the second session times out too
      in.addData(Event(5, ts(500), 2, "click", 0.0))
      q.processAllAvailable()
      in.addData(Event(6, ts(1000), 2, "click", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sess").as[Session].collect()
        .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
      assert(sessions.length == 2)
      assert(sessions(0).n_events == 2 && sessions(0).total_value == 3.0)
      assert(sessions(0).session_start == ts(0) &&
        sessions(0).session_end == ts(10))
      assert(sessions(1).n_events == 2 && sessions(1).total_value == 7.0)
    } finally q.stop()
  }

  test("file-source streaming over the events fixture matches batch") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file source streams a DIRECTORY of arriving files — stage the
    // fixture into one (read-only testdata can't be re-laid-out).
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$SfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val path = dir.toString
    val batchSchema = spark.read.parquet(path).schema
    val rawStream = spark.readStream.schema(batchSchema).parquet(path)
    // ts physical type varies by testdata generation: int64 nanos vs
    // TIMESTAMP(MICROS)/NTZ — normalize to TimestampType like Tables does.
    val stream = batchSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        rawStream.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        rawStream.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => rawStream
    }
    // Complete mode: a single input file means the watermark only advances
    // after the one-and-only batch, so Append would emit nothing.
    val q = EventStream.windowedCounts(stream, "1 day", "30 minutes")
      .writeStream.format("memory").queryName("filewc")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("filewc")
        .groupBy().sum("n_events").as[Long].collect()(0)
      val batchTotal = spark.read.parquet(path).count()
      assert(streamed == batchTotal)
    } finally {
      q.stop()
      java.nio.file.Files.deleteIfExists(dir.resolve("events.parquet"))
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("checkpoint restart resumes exactly-once into a file sink") {
    // The production shape: file source -> watermarked windowed agg ->
    // parquet sink with a checkpoint. Kill the query between input
    // batches, restart from the same checkpoint, and the sink must hold
    // every closed window EXACTLY once — no replays of batch-1 output,
    // no loss of in-flight state (the open window spanning the restart
    // closes correctly when batch 2 advances the watermark).
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val inDir = root.resolve("in"); val outDir = root.resolve("out")
    val ckptDir = root.resolve("ckpt")
    java.nio.file.Files.createDirectories(inDir)
    def writeBatch(name: String, rows: Seq[Event]): Unit =
      rows.toDF().coalesce(1).write.mode("append")
        .parquet(inDir.resolve(name).toString)
    def startQuery() = {
      val schema = spark.read.parquet(s"$inDir/*").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*")
      EventStream.windowedCounts(stream, "10 minutes", "5 minutes")
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckptDir.toString)
        .outputMode(OutputMode.Append()).start()
    }
    try {
      // batch 1: two windows' worth of events plus one event that keeps
      // the third window open across the restart
      writeBatch("b1", Seq(
        Event(1, ts(0), 1, "click", 1.0), Event(2, ts(3), 1, "click", 1.0),
        Event(3, ts(12), 2, "view", 1.0),
        Event(4, ts(31), 1, "click", 1.0))) // advances watermark past w0/w1
      val q1 = startQuery()
      q1.processAllAvailable()
      q1.stop() // hard stop between batches — the restart point
      val afterB1 = spark.read.parquet(outDir.toString).count()
      assert(afterB1 >= 2, s"closed windows not emitted before restart")
      // batch 2 arrives while the query is DOWN; restart from checkpoint
      writeBatch("b2", Seq(
        Event(5, ts(33), 2, "view", 1.0),
        Event(6, ts(99), 1, "click", 1.0))) // closes the 30- and 33-min windows
      val q2 = startQuery()
      q2.processAllAvailable()
      q2.stop()
      val out = spark.read.parquet(outDir.toString)
        .select(col("w_start"), col("event_type"), col("n_events"))
        .as[(java.sql.Timestamp, String, Long)].collect().toSeq
      // exactly-once: every (window, type) key appears ONCE
      assert(out.map(r => (r._1, r._2)).distinct.size == out.size,
        s"duplicate sink rows after restart: $out")
      // equivalence with batch over the union of both inputs, restricted
      // to windows the final watermark closed (ts(99) - 5 min)
      val all = spark.read.parquet(s"$inDir/*")
      val closed = EventStream.windowedCounts(all.withColumn("ts", col("ts")),
          "10 minutes", "5 minutes")
      val batchRows = closed
        .filter(col("w_start") < lit(new java.sql.Timestamp(
          1700000000000L + (99 - 5 - 9) * 60000L)))
        .as[(java.sql.Timestamp, String, Long, Double)].collect()
        .map(r => (r._1, r._2, r._3)).toSet
      assert(batchRows.subsetOf(out.toSet),
        s"restart lost closed windows: batch=$batchRows stream=$out")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  test("built-in session_window aggregation matches the custom sessionizer") {
    // Spark's native session_window covers aggregate-only sessions; the
    // custom flatMapGroupsWithState sessionizer exists for payloads it
    // can't express. On in-order data both must agree.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val in = MemoryStream[Event]
    val q = in.toDF()
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .writeStream.format("memory").queryName("swin")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(110), 1, "view", 3.0))
      q.processAllAvailable()
      in.addData(Event(4, ts(500), 2, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("swin")
        .filter(col("user_id") === 1)
        .select("n", "v").as[(Long, Double)].collect().toSet
      assert(rows.contains((2L, 3.0))) // first burst closed as one session
    } finally q.stop()
  }

  test("stream-stream interval join within watermark") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val left = clicks.toDF().select(col("user_id"), col("ts").as("click_ts"),
      col("value").as("click_v")).withWatermark("click_ts", "10 minutes")
    val right = views.toDF().select(col("user_id").as("v_user"),
      col("ts").as("view_ts")).withWatermark("view_ts", "10 minutes")
    // view attributed to a click within the following 5 minutes
    val joined = left.join(right,
      expr("""user_id = v_user AND
             |view_ts >= click_ts AND
             |view_ts <= click_ts + interval 5 minutes""".stripMargin))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(Event(1, ts(0), 7, "click", 1.0))
      views.addData(Event(2, ts(3), 7, "view", 0.0),   // within 5 min -> match
        Event(3, ts(8), 7, "view", 0.0))               // outside -> no match
      q.processAllAvailable()
      clicks.addData(Event(4, ts(60), 8, "click", 1.0)) // advance watermark
      views.addData(Event(5, ts(60), 9, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("ssj").select("user_id").as[Long].collect()
      assert(rows.toSeq == Seq(7L))
    } finally q.stop()
  }

  test("streaming exact dedup via dropDuplicatesWithinWatermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = in.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 1, "click", 2.0), // dup within watermark -> dropped
        Event(3, ts(2), 1, "view", 3.0),
        Event(4, ts(3), 2, "click", 4.0))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 3)
    } finally q.stop()
  }

  test("StreamingDedup.firstArrival matches its batch twin under ordered replay") {
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 1, "click", 2.0), // dup -> dropped
      Event(3, ts(2), 2, "click", 3.0),
      Event(4, ts(3), 1, "view", 4.0),
      Event(5, ts(4), 2, "click", 5.0), // dup -> dropped
      Event(6, ts(5), 2, "view", 6.0))
    val in = MemoryStream[Event]
    val q = StreamingDedup.firstArrival(in.toDF(),
      Seq("user_id", "event_type"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("sd_first")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("sd_first")
        .select("event_id").as[Long].collect().toSet
      val twin = StreamingDedup.firstArrivalBatch(data.toDF(),
        Seq("user_id", "event_type"), "ts", "event_id")
        .select("event_id").as[Long].collect().toSet
      assert(streamed == twin && twin == Set(1L, 3L, 4L, 6L))
    } finally q.stop()
  }

  test("StreamingDedup.firstArrivalWithin re-admits past the horizon") {
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamingDedup.firstArrivalWithin(in.toDF(),
      Seq("user_id", "event_type"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("sd_within")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 1, "click", 2.0)) // within horizon -> dropped
      q.processAllAvailable()
      // advance the watermark far past the first sighting's horizon:
      // the same key is then a FRESH document (re-crawl semantics)
      in.addData(Event(3, ts(60), 2, "view", 3.0))
      q.processAllAvailable()
      in.addData(Event(4, ts(65), 1, "click", 4.0))
      q.processAllAvailable()
      in.addData(Event(5, ts(200), 9, "view", 5.0)) // close event 4's window
      q.processAllAvailable()
      val ids = spark.table("sd_within")
        .select("event_id").as[Long].collect().toSet
      assert(ids.contains(1L) && !ids.contains(2L) && ids.contains(4L))
    } finally q.stop()
  }

  test("planted sub-µs tie: twin keeps the µs-resolution survivor (q3w oracle convention)") {
    // Two same-key rows distinct ONLY at ns resolution: on a ns-typed
    // fixture Spark truncates ts to µs (Tables.normalizeEventsTs), so the
    // twin tiebreaks by event_id; a DuckDB oracle ranking by RAW ts would
    // pick the other survivor (the r16 q3w hash mismatch). The shipped
    // oracle ranks by epoch_us(ts) — this lock proves the µs-normalized
    // path picks the event_id-tiebreak survivor, and that raw-ns ordering
    // genuinely disagrees (i.e. the planted tie is real).
    import graft.streaming.StreamingDedup
    import org.apache.spark.sql.functions.{col, expr}
    val dir = java.nio.file.Files.createTempDirectory("graft_ns_tie")
    val path = dir.resolve("events.parquet").toString
    try {
      // int64 ns since epoch — the exact shape a TIMESTAMP(NANOS) fixture
      // reads as under spark.sql.legacy.parquet.nanosAsLong.
      Seq(
        (1L, 1000000700L, 1L, "click", 1.0), // µs 1000000, later at ns
        (2L, 1000000500L, 1L, "click", 2.0), // µs 1000000, earlier at ns
        (3L, 2000000000L, 2L, "view", 3.0), // control: distinct at µs too
        (4L, 3000000000L, 2L, "view", 4.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.parquet(path)
      val raw = spark.read.parquet(path)
      val norm = Tables.normalizeEventsTs(raw)
      val kept = StreamingDedup.firstArrivalBatch(
        norm, Seq("user_id", "event_type"), "ts", "event_id")
        .select("event_id").as[Long].collect().toSet
      // µs tie -> event_id tiebreak keeps 1; control key keeps 3.
      assert(kept == Set(1L, 3L))
      // Sanity: ranking by the RAW ns value keeps event 2 instead — the
      // divergence the epoch_us(ts) oracle convention eliminates.
      val rawKept = StreamingDedup.firstArrivalBatch(
        raw, Seq("user_id", "event_type"), "ts", "event_id")
        .select("event_id").as[Long].collect().toSet
      assert(rawKept == Set(2L, 3L))
      // And the normalized ts is exactly the ns value DIV 1000 in µs —
      // both tied rows land on the same µs instant.
      val us = norm.filter(col("user_id") === 1)
        .select(expr("unix_micros(ts)")).as[Long].collect().toSet
      assert(us == Set(1000000L))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir.toFile)
    }
  }

  test("StreamingNearDup.firstArrival matches its batch twin under ordered replay") {
    import graft.streaming.StreamingNearDup
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the river"
    val docs = Seq(
      NdDoc(1, ts(0), base),
      NdDoc(2, ts(1), base), // exact copy -> every band collides -> dropped
      NdDoc(3, ts(2), "entirely different words describe another topic here"),
      NdDoc(4, ts(3), base + " bank")) // near copy: twin decides its fate
    val in = MemoryStream[NdDoc]
    val q = StreamingNearDup.firstArrival(in.toDF(),
      "doc_id", "text", "ts", "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("snd_first")
      .outputMode(OutputMode.Append()).start()
    try {
      // one batch per doc: replay order == doc_id order, like the twin
      docs.foreach { d => in.addData(d); q.processAllAvailable() }
      // a far-future sentinel advances the watermark past every window
      in.addData(NdDoc(99, ts(600), "sentinel closes all open windows"))
      q.processAllAvailable()
      val streamed = spark.table("snd_first")
        .filter(col("doc_id") < 90)
        .select("doc_id").as[Long].collect().toSet
      val twin = StreamingNearDup.firstArrivalBatch(
        docs.toDF(), "doc_id", "text")
        .filter(col("kept")).select("doc_id").as[Long].collect().toSet
      assert(streamed == twin)
      assert(streamed.contains(1L) && !streamed.contains(2L) &&
        streamed.contains(3L))
    } finally q.stop()
  }

  test("StreamingNearDup.firstArrivalWithin re-admits boilerplate past the horizon") {
    import graft.streaming.StreamingNearDup
    implicit val sqlCtx = spark.sqlContext
    val boiler = "standard license header text appears on every page of this corpus"
    val in = MemoryStream[NdDoc]
    val q = StreamingNearDup.firstArrivalWithin(in.toDF(),
      "doc_id", "text", "ts", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("snd_within")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(NdDoc(1, ts(0), boiler))
      q.processAllAvailable()
      in.addData(NdDoc(2, ts(1), boiler)) // within horizon -> dropped
      q.processAllAvailable()
      // advance the watermark far past the claim's horizon
      in.addData(NdDoc(3, ts(60), "unrelated fresh document about other things"))
      q.processAllAvailable()
      in.addData(NdDoc(4, ts(65), boiler)) // re-crawl: admitted again
      q.processAllAvailable()
      in.addData(NdDoc(99, ts(600), "sentinel closes all open windows"))
      q.processAllAvailable()
      val ids = spark.table("snd_within")
        .select("doc_id").as[Long].collect().toSet
      assert(ids.contains(1L) && !ids.contains(2L) &&
        ids.contains(3L) && ids.contains(4L))
    } finally q.stop()
  }

  test("dedup state physics: Within arm evicts by watermark, strict arm cannot forget") {
    // The documented state contract, PROVEN from the engine's own state
    // store metrics (StreamingQueryProgress.stateOperators): feeding
    // batches of fresh keys with advancing event time, the strict
    // first-arrival arm's dedup state grows with every distinct key
    // ever admitted (exact-forever suppression cannot forget), while
    // dropDuplicatesWithinWatermark's state is EVICTED as the
    // watermark passes — bounded by the horizon, not the stream.
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext
    def stateRowsAfter(arm: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        name: String): Seq[Long] = {
      val in = MemoryStream[Event]
      val q = arm(in.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        val readings = (0 until 6).map { batch =>
          // 50 fresh keys per batch, batches 60 min apart (horizon 10)
          in.addData((0 until 50).map(i => Event(
            batch * 50L + i, ts(batch * 60L), batch * 50L + i,
            "click", 1.0)): _*)
          q.processAllAvailable()
          q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        }
        readings
      } finally q.stop()
    }
    val strict = stateRowsAfter(df => StreamingDedup.firstArrival(
      df, Seq("user_id", "event_type"), "ts", "10 minutes"), "sp_strict")
    val within = stateRowsAfter(df => StreamingDedup.firstArrivalWithin(
      df, Seq("user_id", "event_type"), "ts", "10 minutes"), "sp_within")
    // strict: every admitted key still in state at the end (300 keys)
    assert(strict.last == 300L, s"strict state: $strict")
    // within: old claims evicted as the watermark passed — the final
    // state holds at most the last horizon's keys, far below the total
    assert(within.last <= 100L, s"within state: $within")
    assert(within.max < strict.last, s"within never accumulates: $within")
  }

  test("batch twin qa7 agrees with streaming sessionize on the fixture") {
    // Run the stateful sessionizer in a single batch over sf0.001 events
    // and compare per-user session counts with the window-function twin.
    val events = Tables.view(spark, SfDir, "events")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
    // batch flatMapGroupsWithState: group and fold directly
    val streaming = events.groupByKey(_.user_id).flatMapGroups {
      (uid, it) =>
        val sorted = it.toSeq.sortBy(_.ts.getTime)
        val gapMs = 360 * 60000L
        var sessions = 0
        var last = Long.MinValue
        sorted.foreach { e =>
          if (last == Long.MinValue || e.ts.getTime - last > gapMs)
            sessions += 1
          last = e.ts.getTime
        }
        Iterator((uid, sessions.toLong))
    }.toDF("user_id", "n_sessions")
    val twin = SparkEntry.queries("qa7_sessionize")(spark, SfDir)
      .select("user_id", "n_sessions")
    val diff = streaming.filter("user_id < 50")
      .except(twin).count()
    assert(diff == 0)
  }
}

/** Top-level so Spark derives an Encoder (method-local case classes
  * cannot get one) — the StreamingNearDup locks' document shape. */
case class NdDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{ColorMath, PrestoScalars, TextExpressions, VectorExpressions}

/** Unit tests for the scalar/vector function layer: edge cases the
  * differential oracle's fixture data cannot reach (nulls, unicode, empty
  * arrays, pattern-translation corners). */
class FunctionsSuite extends GraftSuite {

  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c).collect()(0).getAs[T](0)

  test("widthBucket matches Presto semantics incl. boundaries") {
    val rows = Seq(-1.0, 0.0, 2.5, 9.99, 10.0, 42.0).toDF("x")
      .select(PrestoScalars.widthBucket(col("x"), lit(0.0), lit(10.0), lit(4))
        .as("b")).as[Long].collect()
    assert(rows.toSeq == Seq(0L, 1L, 2L, 4L, 5L, 5L))
  }

  test("mysqlToJavaPattern translates and quotes correctly") {
    assert(PrestoScalars.mysqlToJavaPattern("%Y-%m-%d") == "yyyy-MM-dd")
    assert(PrestoScalars.mysqlToJavaPattern("%H:%i:%s") == "HH:mm:ss")
    // literal letters must be quoted for java.time
    assert(PrestoScalars.mysqlToJavaPattern("%YT%m") == "yyyy'T'MM")
    assert(PrestoScalars.mysqlToJavaPattern("100%%") == "100%")
  }

  test("date_parse round-trips through date_format") {
    val out = Seq("2024-03-05 10:30:00").toDF("s")
      .select(PrestoScalars.dateFormatMysql(
        PrestoScalars.dateParse(col("s"), "%Y-%m-%d %H:%i:%s"),
        "%d/%m/%Y %H:%i").as("f")).as[String].collect()(0)
    assert(out == "05/03/2024 10:30")
  }

  test("to_base/from_base round-trip") {
    val df = Seq(255L, 0L, 37L).toDF("x")
    val back = df.select(PrestoScalars.fromBase(
      PrestoScalars.toBase(col("x"), 16), 16).as("y")).as[Long].collect()
    assert(back.toSeq == Seq(255L, 0L, 37L))
  }

  test("cosine similarity: identity, orthogonality, nulls") {
    val df = Seq(
      (Array(1.0, 0.0), Array(1.0, 0.0)),
      (Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(3.0, 4.0), Array(3.0, 4.0))).toDF("a", "b")
    val cos = df.select(VectorExpressions.cosine(col("a"), col("b")).as("c"))
      .as[Double].collect()
    assert(math.abs(cos(0) - 1.0) < 1e-12)
    assert(math.abs(cos(1)) < 1e-12)
    assert(math.abs(cos(2) - 1.0) < 1e-12)
    val n = Seq((null.asInstanceOf[Array[Double]], Array(1.0)))
      .toDF("a", "b")
      .select(VectorExpressions.cosine(col("a"), col("b"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("dot and l2 agree with hand math and match interpreted eval") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(VectorExpressions.dot(col("a"), col("b")))
      .as[Double].collect()(0) == 32.0)
    assert(math.abs(df.select(VectorExpressions.l2(col("a"), col("b")))
      .as[Double].collect()(0) - math.sqrt(27.0)) < 1e-12)
    // interpreted path (eval) must agree with codegen: force via filter
    // on a non-deterministic-free expr is fiddly — instead compare to the
    // HOF composition which always evaluates interpreted.
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
        (s, v) => s + v)).as[Double].collect()(0)
    assert(hof == 32.0)
  }

  test("wordShingles: distinct, order-preserving, unicode, short input") {
    val sh = Seq("a b c d", "x y", "α β γ δ", "a b a b a b")
      .toDF("t")
      .select(TextExpressions.wordShingles(col("t"), 3).as("s"))
      .as[Seq[String]].collect()
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1) == Seq.empty) // shorter than k
    assert(sh(2) == Seq("α β γ", "β γ δ"))
    assert(sh(3) == Seq("a b a", "b a b")) // distinct, first-occurrence order
  }

  test("wordShingles null propagates") {
    val r: Row = Seq(Option.empty[String]).toDF("t")
      .select(TextExpressions.wordShingles(col("t"), 2)).collect()(0)
    assert(r.isNullAt(0))
  }

  test("ddsketch: int/decimal children accepted, strings fail analysis") {
    import graft.functions.QuantileSketch
    // integer column: converted per static type, no runtime CCE
    val est = Seq(1, 2, 3, 4, 5).toDF("x")
      .agg(QuantileSketch.valueAt(QuantileSketch.sketch(col("x")), 0.5)
        .as("m")).as[Double].head()
    assert(math.abs(est - 3.0) <= 0.05)
    val dec = Seq(BigDecimal("1.50"), BigDecimal("2.50")).toDF("x")
      .agg(QuantileSketch.valueAt(QuantileSketch.sketch(col("x")), 1.0)
        .as("m")).as[Double].head()
    assert(math.abs(dec - 2.5) <= 0.03)
    // non-numeric input is an analysis-time error, not a per-row crash
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq("a").toDF("x").agg(QuantileSketch.sketch(col("x"))).collect()
    }
  }

  test("space-saving: exact when capacity >= distinct, invariants under eviction") {
    import graft.functions.ApproxMostFrequent
    // capacity >= distinct keys: counts exact, deterministic tie order
    val exact = new ApproxMostFrequent.State(8)
    Seq("a", "b", "a", "c", "a", "b").foreach(exact.insert)
    assert(exact.top(3) == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
    // forced eviction: space-saving guarantees est >= true >= est - err,
    // and a key with true count > n/capacity is retained
    val st = new ApproxMostFrequent.State(3)
    val truth = scala.collection.mutable.HashMap.empty[String, Long]
    val stream = (1 to 60).map(i => s"k${i % 7}") ++ Seq.fill(40)("hh")
    stream.foreach { k =>
      st.insert(k); truth.update(k, truth.getOrElse(k, 0L) + 1)
    }
    truth.foreach { case (k, t) =>
      val (est, err) = st.estimate(k)
      assert(est >= t, s"$k est $est < true $t")
      assert(est - err <= t, s"$k lower bound ${est - err} > true $t")
    }
    assert(st.top(3).map(_._1).contains("hh")) // 40 > 100/3: must survive
    // merge: exact path (no evictions either side) sums exactly
    val a = new ApproxMostFrequent.State(8)
    val b = new ApproxMostFrequent.State(8)
    Seq("x", "y", "x").foreach(a.insert)
    Seq("y", "z").foreach(b.insert)
    a.mergeWith(b)
    assert(a.top(3) == Seq(("x", 2L), ("y", 2L), ("z", 1L)))
  }

  test("approx_most_frequent: long keys, map output, partial-merge path") {
    import graft.functions.ApproxMostFrequent
    // 200 rows over 32 partitions: Spark's partial/final split exercises
    // serialize + merge; capacity 16 > 10 distinct keys keeps it exact.
    val df = spark.range(200).repartition(32)
      .select((col("id") % 10).as("k"))
      .agg(ApproxMostFrequent(3, col("k"), 16).as("m"))
    val m = df.as[Map[Long, Long]].head()
    assert(m == Map(0L -> 20L, 1L -> 20L, 2L -> 20L)) // ties → smallest keys
    // analysis-time rejection: double child, buckets > capacity
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(3).select(col("id").cast("double").as("d"))
        .agg(ApproxMostFrequent(2, col("d"), 4)).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(3).agg(ApproxMostFrequent(8, col("id"), 4)).collect()
    }
  }

  test("numeric_histogram: capacity, conservation, range, merge") {
    import graft.functions.NumericHistogram
    val st = new NumericHistogram.State(8)
    val xs = (0 until 1000).map(i => ((i * 7919) % 97).toDouble)
    xs.foreach(st.add(_))
    assert(st.values.length == 8)
    assert(st.weights.sum == 1000.0) // weight conserved exactly
    val wmean = st.values.zip(st.weights).map { case (v, w) => v * w }.sum /
      st.weights.sum
    assert(math.abs(wmean - xs.sum / xs.size) <= 1e-9 * xs.max)
    assert(st.values.min >= xs.min && st.values.max <= xs.max)
    assert(st.values.toSeq == st.values.sorted.toSeq)
    // exact when distinct values fit the capacity
    val small = new NumericHistogram.State(8)
    Seq(1.0, 2.0, 2.0, 5.0).foreach(small.add(_))
    assert(small.values.toSeq == Seq(1.0, 2.0, 5.0))
    assert(small.weights.toSeq == Seq(1.0, 2.0, 1.0))
    // merge conserves weight and respects capacity
    val a = new NumericHistogram.State(8)
    val b = new NumericHistogram.State(8)
    xs.take(500).foreach(a.add(_))
    xs.drop(500).foreach(b.add(_))
    a.mergeWith(b)
    assert(a.values.length == 8 && a.weights.sum == 1000.0)
    // serialization round-trip
    val rt = NumericHistogram.deserialize(st.serialize())
    assert(rt.values.toSeq == st.values.toSeq &&
      rt.weights.toSeq == st.weights.toSeq)
    intercept[IllegalArgumentException](st.add(1.0, 0.0))
  }

  test("color pack: parse forms, ANSI cube index, HSB endpoints, bar") {
    assert(ColorMath.parse("#f00") == 0xFF0000L)
    assert(ColorMath.parse("#fa0") == 0xFFAA00L) // CSS nibble replication
    assert(ColorMath.parse("red") == -2L)
    assert(ColorMath.parse("WHITE") == -8L) // case-insensitive system name
    intercept[IllegalArgumentException](ColorMath.parse("#ff0000")) // 6-digit
    intercept[IllegalArgumentException](ColorMath.parse("mauve"))
    intercept[IllegalArgumentException](ColorMath.rgb(256, 0, 0))
    // interpolation pins the endpoints and the sector-boundary midpoint
    assert(ColorMath.interpolate(0.0, 0xFF0000L, 0x00FF00L) == 0xFF0000L)
    assert(ColorMath.interpolate(1.0, 0xFF0000L, 0x00FF00L) == 0x00FF00L)
    assert(ColorMath.interpolate(0.5, 0xFF0000L, 0x00FF00L) == 0xFFFF00L)
    assert(ColorMath.interpolate(2.0, 0xFF0000L, 0x00FF00L) == 0x00FF00L)
    // render: ESC[38;5;<cube>m prefix, reset suffix; 255,0,0 -> 196
    assert(ColorMath.render("x", 0xFF0000L) == "\u001b[38;5;196mx\u001b[0m")
    assert(ColorMath.renderBool(true) == "\u001b[38;5;2m✓\u001b[0m")
    // bar: count = trunc(percent*width) blocks, then reset, then padding
    val b = ColorMath.bar(0.5, 4, 0xFF0000L, 0xFF0000L)
    assert(b.count(_ == '█') == 2 && b.endsWith("\u001b[0m  "))
    assert(ColorMath.bar(-1.0, 3, 0L, 0L) == "\u001b[0m   ")
  }

  test("vector_avg: element-wise mean, null rows skipped, ragged fails") {
    import spark.implicits._
    val df = Seq(
      (1, Seq(1.0, 2.0, 3.0)), (1, Seq(3.0, 4.0, 7.0)),
      (2, Seq(10.0, 0.0, -2.0))).toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(graft.functions.VectorAvg.agg(col("v")).as("m"))
      .orderBy(col("g"))
      .as[(Int, Seq[Double])].collect()
    assert(got(0) == (1 -> Seq(2.0, 3.0, 5.0)))
    assert(got(1) == (2 -> Seq(10.0, 0.0, -2.0)))
    // nulls don't count toward the mean
    val withNull = Seq((1, Some(Seq(2.0, 4.0))), (1, None))
      .toDF("g", "v")
      .groupBy(col("g")).agg(graft.functions.VectorAvg.agg(col("v")).as("m"))
      .as[(Int, Seq[Double])].head()
    assert(withNull == (1 -> Seq(2.0, 4.0)))
    // ragged input fails loudly (fixed-dimension contract)
    val e = intercept[Exception] {
      Seq((1, Seq(1.0)), (1, Seq(1.0, 2.0))).toDF("g", "v")
        .groupBy(col("g")).agg(graft.functions.VectorAvg.agg(col("v")))
        .collect()
    }
    assert(e.getMessage.contains("ragged"))
  }

  test("weighted percentile agg matches Spark's percentile-with-frequency exactly") {
    graft.functions.Registry.install(spark)
    // deterministic pseudo-random values with ties and skewed weights
    spark.sql(
      """SELECT cast(id % 7 as int) AS g,
        |  cast((id * 37) % 100 as double) / 4 AS x,
        |  cast(id % 5 + 1 as bigint) AS w
        |FROM range(0, 20000) AS t(id)""".stripMargin)
      .createOrReplaceTempView("wp_probe")
    val rows = spark.sql(graft.functions.Registry.rewritePrestoSql(
      """SELECT g,
        |  approx_percentile(x, w, 0.5) AS ours_med,
        |  percentile(x, 0.5, w) AS spark_med,
        |  approx_percentile(x, w, 0.9) AS ours_p90,
        |  percentile(x, 0.9, w) AS spark_p90,
        |  approx_percentile(x, w, 0.013) AS ours_p013,
        |  percentile(x, 0.013, w) AS spark_p013
        |FROM wp_probe GROUP BY g""".stripMargin)).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"median diverges: $r")
      assert(r.getDouble(3) == r.getDouble(4), s"p90 diverges: $r")
      assert(r.getDouble(5) == r.getDouble(6), s"p013 diverges: $r")
    }
    // null values and null/zero weights drop out on both sides
    val nulled = spark.sql(graft.functions.Registry.rewritePrestoSql(
      """SELECT approx_percentile(x, w, 0.5) AS ours,
        |  percentile(x, 0.5, w) AS theirs
        |FROM VALUES (1.0, CAST(2 AS BIGINT)), (CAST(null AS DOUBLE), 5),
        |  (3.0, CAST(null AS BIGINT)), (2.0, 0), (9.0, 1) AS t(x, w)"""
        .stripMargin)).collect()(0)
    assert(nulled.getDouble(0) == nulled.getDouble(1))
    // negative weights fail loudly (Presto INVALID_FUNCTION_ARGUMENT)
    val neg = intercept[Exception] {
      spark.sql(graft.functions.Registry.rewritePrestoSql(
        "SELECT approx_percentile(x, w, 0.5) FROM VALUES (1.0, -1) AS t(x, w)"))
        .collect()
    }
    assert(neg.getMessage.contains("negative weight") ||
      Option(neg.getCause).exists(_.getMessage.contains("negative weight")))
    // all-weights-zero and empty groups yield NULL
    val empty = spark.sql(graft.functions.Registry.rewritePrestoSql(
      "SELECT approx_percentile(x, w, 0.5) AS v FROM VALUES (1.0, 0) AS t(x, w)"))
      .collect()(0)
    assert(empty.isNullAt(0))
    // NaN values sort greatest, exactly like Spark's percentile
    // (ADVICE r6: the quicksort now compares via Double.compare)
    val nans = spark.sql(graft.functions.Registry.rewritePrestoSql(
      """SELECT approx_percentile(x, w, 0.25) AS ours_lo,
        |  percentile(x, 0.25, w) AS spark_lo,
        |  approx_percentile(x, w, 0.9) AS ours_hi,
        |  percentile(x, 0.9, w) AS spark_hi
        |FROM VALUES (cast('NaN' as double), CAST(2 AS BIGINT)), (1.0, 3),
        |  (cast('NaN' as double), 1), (5.0, 2), (3.0, 4), (2.0, 1)
        |  AS t(x, w)""".stripMargin)).collect()(0)
    assert(nans.getDouble(0) == nans.getDouble(1), s"NaN p25 diverges: $nans")
    assert(nans.getDouble(2).isNaN == nans.getDouble(3).isNaN &&
      (nans.getDouble(2).isNaN || nans.getDouble(2) == nans.getDouble(3)),
      s"NaN p90 diverges: $nans")
  }

  test("approx_percentile 3-arg routing: unweighted (x, p, accuracy) vs weighted (x, w, p)") {
    graft.functions.Registry.install(spark)
    // Presto's unweighted (x, percentage, DOUBLE accuracy) form must NOT
    // route to the weighted aggregate (ADVICE r6: weight would cast to 0
    // and silently return NULL) — it maps to percentile_approx
    val un = spark.sql(graft.functions.Registry.rewritePrestoSql(
      "SELECT approx_percentile(x, 0.5, 0.01) AS v FROM VALUES " +
        "(1.0D), (2.0D), (3.0D), (4.0D), (5.0D) AS t(x)")).collect()(0)
    assert(!un.isNullAt(0) && un.getDouble(0) == 3.0)
    // literal integral weight still routes weighted
    val w = spark.sql(graft.functions.Registry.rewritePrestoSql(
      "SELECT approx_percentile(x, 2, 0.5) AS v FROM VALUES " +
        "(1.0D), (2.0D), (9.0D) AS t(x)")).collect()(0)
    assert(w.getDouble(0) == 2.0)
    // a literal weight of 0 (i.e. a misplaced percentage) fails loudly
    val zero = intercept[Exception] {
      spark.sql(graft.functions.Registry.rewritePrestoSql(
        "SELECT approx_percentile(x, 0, 0.5) FROM VALUES (1.0D) AS t(x)"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(zero).exists(m => m != null && m.contains("weight 0")))
    // array-of-percentages 2nd position stays unweighted
    val arr = spark.sql(graft.functions.Registry.rewritePrestoSql(
      "SELECT approx_percentile(x, array(0.0, 1.0), 0.01) AS v FROM VALUES " +
        "(1.0D), (5.0D) AS t(x)")).collect()(0)
    assert(arr.getSeq[Double](0) == Seq(1.0, 5.0))
  }

  test("zoned_timestamp accepts IANA named zones and rejects garbage loudly") {
    graft.functions.Registry.install(spark)
    val r = spark.sql(
      "SELECT zoned_timestamp('2020-06-10T15:30:00 Asia/Kolkata') AS z")
      .selectExpr("z.tz AS tz", "cast(z.utc as string) AS utc").collect()(0)
    assert(r.getString(0) == "Asia/Kolkata")
    assert(r.getString(1) == "2020-06-10 10:00:00") // +05:30 ahead of UTC
    // offset and Z forms unchanged
    val off = spark.sql(
      "SELECT zoned_timestamp('2020-06-10T15:30:00+05:30') AS z")
      .selectExpr("z.tz", "cast(z.utc as string)").collect()(0)
    assert(off.getString(0) == "+05:30" &&
      off.getString(1) == "2020-06-10 10:00:00")
    // unparseable wall clock raises instead of a silent NULL struct
    val bad = intercept[Exception] {
      spark.sql("SELECT zoned_timestamp('not a timestamp') AS z").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(bad).exists(m => m != null && m.contains("cannot parse")))
    // NULL input stays NULL (no raise)
    assert(spark.sql(
      "SELECT zoned_timestamp(cast(null as string)) AS z").collect()(0)
      .getStruct(0).isNullAt(0))
  }

  test("raw record decoder: offsets, widths, nulls, and loud errors") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.functions.RecordDecoders
    import spark.implicits._
    // message: long 0x0102030405060708 @0, short 0x7FFF @8, byte 0xFF @10,
    // tail "hi" @11
    val msg: Array[Byte] =
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 0x7f, -1, -1) ++ "hi".getBytes
    val df = Seq(Tuple1(msg)).toDF("m")
    val r = df.select(
      RecordDecoders.raw(col("m"), LongType, "LONG", "0").as("l"),
      RecordDecoders.raw(col("m"), IntegerType, "SHORT", "8").as("s"),
      RecordDecoders.raw(col("m"), LongType, "BYTE", "10").as("b"),
      RecordDecoders.raw(col("m"), BooleanType, "BYTE", "10").as("bool"),
      RecordDecoders.raw(col("m"), StringType, "BYTE", "11").as("tail"),
      RecordDecoders.raw(col("m"), StringType, "BYTE", "11:12").as("t1"),
      RecordDecoders.raw(col("m"), StringType, "BYTE", "13:13").as("z"))
      .collect()(0)
    assert(r.getLong(0) == 0x0102030405060708L)
    assert(r.getInt(1) == 0x7fff)
    assert(r.getLong(2) == -1L) // signed byte widens
    assert(r.getBoolean(3))
    assert(r.getString(4) == "hi")
    assert(r.getString(5) == "h")
    assert(r.isNullAt(6)) // zero-length slice decodes NULL
    // offset past the message end raises loudly
    val e = intercept[Exception] {
      df.select(RecordDecoders.raw(col("m"), LongType, "LONG", "20")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("must be less than or equal")), e)
    // field-width / target-type mismatch rejected at construction
    val bad = intercept[IllegalArgumentException] {
      RecordDecoders.raw(col("m"), IntegerType, "LONG", "0")
    }
    assert(bad.getMessage.contains("wrong dataFormat"), bad.getMessage)
  }

  test("avro row decoder: nested types, nullable union, loud container errors") {
    import org.apache.spark.sql.functions.col
    import graft.functions.RecordDecoders
    import graft.queries.Connectors
    import spark.implicits._
    val df = Seq(Tuple1(Connectors.q0oAvroMsg(10L))).toDF("m")
      .select(RecordDecoders.avroRow(col("m"), Connectors.Q0oSchema).as("r"))
    val row = df.select(col("r.id"), col("r.name"), col("r.score"),
      col("r.tags"), col("r.attrs")).collect()(0)
    assert(row.getLong(0) == 10L)
    assert(row.isNullAt(1)) // k % 10 == 0 -> null union branch
    assert(row.getDouble(2) == 5.0)
    assert(row.getSeq[String](3) == Seq("t1", "t0"))
    assert(row.getMap[String, Long](4).toMap == Map("a" -> 10L, "b" -> 20L))
    // garbage bytes raise loudly (no container header)
    val e = intercept[Exception] {
      Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("m")
        .select(RecordDecoders.avroRow(col("m"), Connectors.Q0oSchema))
        .collect()
    }
    assert(e.getMessage != null)
    // non-nullable multi-branch unions rejected at construction
    val bad = intercept[Exception] {
      Seq(Tuple1(Array[Byte](1))).toDF("m")
        .select(RecordDecoders.avroRow(col("m"),
          """{"type":"record","name":"X","fields":[
            |{"name":"u","type":["string","long"]}]}""".stripMargin))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(bad).exists(_.contains("union")), bad.getMessage)
  }

  test("csv row decoder: positional fields onto a typed schema") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    import graft.functions.RecordDecoders
    import spark.implicits._
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val r = Seq("7,foo,2.5").toDF("m")
      .select(RecordDecoders.csvRow(col("m"), sch).as("r"))
      .select(col("r.id"), col("r.name"), col("r.v")).collect()(0)
    assert(r.getLong(0) == 7L && r.getString(1) == "foo" &&
      r.getDouble(2) == 2.5)
  }

  test("bpe merge pass: left-to-right greedy, merged tail never rematches") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}
    import graft.functions.BpeMergePass
    import spark.implicits._
    def merge(seq: String, a: String, b: String): String =
      Seq(seq).toDF("s")
        .select(toCol(BpeMergePass(toExpr(col("s")), a, b)))
        .collect()(0).getString(0)
    // the Sennrich scan: after merging, the tail is `ll`, not `l`
    assert(merge("h e l l o", "l", "l") == "h e ll o")
    assert(merge("l l l", "l", "l") == "ll l")
    assert(merge("l l l l", "l", "l") == "ll ll")
    // alternating chain: every occurrence merges (the shared-boundary
    // case a naive string replace gets wrong)
    assert(merge("a b a b a b", "a", "b") == "ab ab ab")
    // multi-char learned symbols merge like any other token
    assert(merge("th e th e", "th", "e") == "the the")
    // no occurrence -> identity; single symbol -> identity
    assert(merge("x y z", "a", "b") == "x y z")
    assert(merge("q", "q", "q") == "q")
  }

  test("json_array_contains: non-finite double probe is false pre-parse") {
    import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}
    import graft.functions.JsonArrayContains
    import spark.implicits._
    def probe(json: String, v: Double): Any =
      Seq(json).toDF("j")
        .select(toCol(JsonArrayContains(toExpr(col("j")),
          toExpr(lit(v))))).collect()(0).get(0)
    // reference (JsonFunctions.java double overload): NaN/Inf returns
    // false BEFORE parsing — even on malformed or non-array input where
    // the normal path answers NULL
    assert(probe("not json at all", Double.NaN) == false)
    assert(probe("{\"k\":1}", Double.PositiveInfinity) == false)
    assert(probe("[1.5, 2.5]", Double.NaN) == false)
    // sanity: the normal path still distinguishes malformed (NULL) from
    // miss (false) from hit (true)
    assert(probe("not json at all", 1.5) == null)
    assert(probe("[1.5, 2.5]", 2.5) == true)
    assert(probe("[1.5, 2.5]", 3.5) == false)
  }

  test("media_dimensions: BMP DIB header generations") {
    import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}
    import graft.operators.MediaDimensions
    import spark.implicits._
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def dims(b: Array[Byte]): Option[(Int, Int)] = {
      val r = Seq(Tuple1(b)).toDF("b")
        .select(toCol(MediaDimensions(toExpr(col("b"))))).collect()(0)
      if (r.isNullAt(0)) None
      else Some((r.getStruct(0).getInt(1), r.getStruct(0).getInt(2)))
    }
    def bmp(dibSize: Int, body: Array[Byte]): Array[Byte] =
      "BM".getBytes ++ Array.fill[Byte](12)(0) ++ le32(dibSize) ++ body ++
        Array.fill[Byte](16)(0)
    // BITMAPINFOHEADER (40): int32 w/h at 18/22
    assert(dims(bmp(40, le32(640) ++ le32(480))) == Some((640, 480)))
    // top-down bitmap: negative height reported as magnitude
    assert(dims(bmp(40, le32(640) ++ le32(-480))) == Some((640, 480)))
    // BITMAPV5HEADER (124) uses the same field layout
    assert(dims(bmp(124, le32(64) ++ le32(64))) == Some((64, 64)))
    // BITMAPCOREHEADER (12): uint16 w/h at 18/20 — used to misparse as
    // garbage int32 dimensions (r9 ADVICE)
    assert(dims(bmp(12, le16(320) ++ le16(200) ++ Array.fill[Byte](4)(0))) ==
      Some((320, 200)))
    // unknown DIB size → NULL, not garbage
    assert(dims(bmp(16, le32(640) ++ le32(480))) == None)
    // garbage non-positive width → NULL (spec: width strictly positive;
    // only height may be negative) — r10 ADVICE
    assert(dims(bmp(40, le32(-640) ++ le32(480))) == None)
    assert(dims(bmp(40, le32(0) ++ le32(480))) == None)
    // the core-header arm applies the same validation: zero/garbage
    // uint16 dimensions → NULL, not width=0 — r11 ADVICE
    assert(dims(bmp(12, le16(0) ++ le16(200) ++ Array.fill[Byte](4)(0))) ==
      None)
    assert(dims(bmp(12, le16(320) ++ le16(0) ++ Array.fill[Byte](4)(0))) ==
      None)
  }

  test("media_dimensions: JPEG marker walk") {
    import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}
    import graft.operators.MediaDimensions
    import spark.implicits._
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def dims(b: Array[Byte]): Option[(Int, Int)] = {
      val r = Seq(Tuple1(b)).toDF("b")
        .select(toCol(MediaDimensions(toExpr(col("b"))))).collect()(0)
      if (r.isNullAt(0)) None
      else Some((r.getStruct(0).getInt(1), r.getStruct(0).getInt(2)))
    }
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array[Byte](0xff.toByte, marker.toByte) ++
        be16(payload.length + 2) ++ payload
    val soi = Array[Byte](0xff.toByte, 0xd8.toByte)
    def sof(m: Int, w: Int, h: Int): Array[Byte] =
      seg(m, Array[Byte](8) ++ be16(h) ++ be16(w) ++
        Array[Byte](3) ++ Array.fill[Byte](9)(0))
    // minimal SOI + SOF0
    assert(dims(soi ++ sof(0xc0, 640, 480)) == Some((640, 480)))
    // APPn/DQT/COM segments before the frame header must be walked
    val app0 = seg(0xe0, Array.fill[Byte](14)(0))
    val com = seg(0xfe, "hello".getBytes)
    assert(dims(soi ++ app0 ++ com ++ sof(0xc2, 33, 17)) == Some((33, 17)))
    // standalone RST/TEM markers carry no length field
    val rst = Array[Byte](0xff.toByte, 0xd0.toByte)
    assert(dims(soi ++ rst ++ sof(0xc1, 5, 7)) == Some((5, 7)))
    // DHT (C4) is NOT a frame header even though it sits in C0-CF
    val dht = seg(0xc4, Array.fill[Byte](5)(0))
    assert(dims(soi ++ dht ++ sof(0xc0, 9, 9)) == Some((9, 9)))
    // EOI before any SOF, truncation mid-segment, garbage length → NULL
    assert(dims(soi ++ Array[Byte](0xff.toByte, 0xd9.toByte)) == None)
    assert(dims(soi ++ app0.take(3)) == None)
    assert(dims(soi ++ Array[Byte](0xff.toByte, 0xe0.toByte, 0, 1)) == None)
  }

  test("media_dimensions: MP4 box walk to tkhd") {
    import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}
    import graft.operators.MediaDimensions
    import spark.implicits._
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def dims(b: Array[Byte]): Option[(Int, Int)] = {
      val r = Seq(Tuple1(b)).toDF("b")
        .select(toCol(MediaDimensions(toExpr(col("b"))))).collect()(0)
      if (r.isNullAt(0)) None
      else Some((r.getStruct(0).getInt(1), r.getStruct(0).getInt(2)))
    }
    def box(name: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8) ++ name.getBytes ++ payload
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0))
    def tkhd(ver: Int, w: Int, h: Int): Array[Byte] = {
      val fixed = if (ver == 1) 84 else 72 // fields between flags and w
      box("tkhd", Array[Byte](ver.toByte, 0, 0, 0) ++
        Array.fill[Byte](fixed)(0) ++ be32(w << 16) ++ be32(h << 16))
    }
    def mp4(ver: Int, w: Int, h: Int, pre: Array[Byte] = Array.empty) =
      ftyp ++ pre ++ box("moov", box("trak", tkhd(ver, w, h)))
    assert(dims(mp4(0, 1920, 1080)) == Some((1920, 1080)))
    assert(dims(mp4(1, 640, 360)) == Some((640, 360)))
    // moov after an interleaved free box; mdat-style boxes skipped
    assert(dims(mp4(0, 12, 34, pre = box("free", Array.fill[Byte](6)(0))))
      == Some((12, 34)))
    // missing tkhd / truncated moov / zero-size box → NULL
    assert(dims(ftyp ++ box("moov", box("trak", Array.empty[Byte]))) == None)
    assert(dims(mp4(0, 8, 8).dropRight(4)) == None)
    assert(dims(ftyp ++ be32(0) ++ "moov".getBytes) == None)
  }

  test("chunk_text: overlap windows, boundary tails, short docs") {
    import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}
    import graft.functions.ChunkText
    import spark.implicits._
    def chunks(text: String, c: Int, o: Int): Seq[String] =
      Seq(text).toDF("t")
        .select(toCol(ChunkText(toExpr(col("t")), c, o)))
        .collect()(0).getSeq[String](0)
    val words = (1 to 10).map("w" + _).mkString(" ")
    // chunk 4, overlap 1 -> starts 0,3,6 (6+4 >= 10 stops the walk)
    assert(chunks(words, 4, 1) == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    // exact boundary: the window reaching the end is the last
    assert(chunks((1 to 8).map("w" + _).mkString(" "), 4, 2) == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8"))
    // short document -> one chunk; no overlap -> disjoint windows
    assert(chunks("a b c", 8, 2) == Seq("a b c"))
    assert(chunks("a b c d e", 2, 0) == Seq("a b", "c d", "e"))
  }

  test("media_audio_info: FLAC STREAMINFO bit unpacking") {
    import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}
    import graft.operators.MediaAudioInfo
    import spark.implicits._
    def info(b: Array[Byte]): Option[(Int, Int, Int)] = {
      val r = Seq(Tuple1(b)).toDF("b")
        .select(toCol(MediaAudioInfo(toExpr(col("b"))))).collect()(0)
      if (r.isNullAt(0)) None
      else Some((r.getStruct(0).getInt(0), r.getStruct(0).getInt(1),
        r.getStruct(0).getInt(2)))
    }
    def flac(rate: Int, channels: Int, bits: Int): Array[Byte] =
      "fLaC".getBytes ++ Array[Byte](0, 0, 0, 34) ++
        Array.fill[Byte](10)(0) ++ Array[Byte](
          (rate >> 12).toByte, ((rate >> 4) & 0xff).toByte,
          (((rate & 0xf) << 4) | ((channels - 1) << 1) |
            ((bits - 1) >> 4)).toByte,
          (((bits - 1) & 0xf) << 4).toByte) ++ Array.fill[Byte](20)(0)
    assert(info(flac(44100, 2, 16)) == Some((44100, 2, 16)))
    assert(info(flac(96000, 8, 24)) == Some((96000, 8, 24)))
    assert(info(flac(8000, 1, 16)) == Some((8000, 1, 16)))
    // truncated or wrong magic → NULL
    assert(info(flac(44100, 2, 16).take(20)) == None)
    assert(info("flaC".getBytes ++ Array.fill[Byte](30)(0)) == None)
  }
}

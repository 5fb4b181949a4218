package graft

import org.apache.spark.sql.functions._

import graft.functions.Registry

/** Behavioral tests of the Presto-name registry: semantics of the
  * absorbed spellings and the loud-failure guards. */
class RegistrySuite extends GraftSuite {

  import spark.implicits._

  Registry.install(spark)

  private def one[T: org.apache.spark.sql.Encoder](sql: String): T =
    spark.sql(Registry.rewritePrestoSql(s"SELECT $sql AS v")).as[T].head()

  test("date_add preserves DATE for date inputs, TIMESTAMP for timestamps") {
    val d = spark.sql(Registry.rewritePrestoSql(
      "SELECT date_add('month', 1, date '2020-01-31') AS v"))
    assert(d.schema.head.dataType.typeName == "date")
    assert(d.as[java.sql.Date].head().toString == "2020-02-29")
    val t = spark.sql(Registry.rewritePrestoSql(
      "SELECT date_add('hour', 3, timestamp '2020-01-01 01:00:00') AS v"))
    assert(t.schema.head.dataType.typeName == "timestamp")
  }

  test("date_add rejects sub-day units on DATE inputs (Presto contract)") {
    val e = intercept[Exception] {
      spark.sql(Registry.rewritePrestoSql(
        "SELECT date_add('hour', 3, date '2020-01-01') AS v")).collect()
    }
    assert(e.getMessage.contains("invalid for a DATE input"))
  }

  test("date_diff is t2 minus t1 in whole units") {
    assert(one[Long](
      "date_diff('day', date '2020-01-01', date '2020-03-01')") == 60L)
    assert(one[Long](
      "date_diff('day', date '2020-03-01', date '2020-01-01')") == -60L)
  }

  test("aggregate ORDER BY rewrites; window/subquery ORDER BY stay") {
    import spark.implicits._
    // the ordering contract end-to-end, multi-key mixed direction
    val r = spark.sql(Registry.rewritePrestoSql(
      """SELECT array_join(array_agg(v ORDER BY g DESC, v), ',') AS a
        |FROM VALUES (1, 'x'), (2, 'x'), (1, 'y') AS t(v, g)"""
        .stripMargin)).as[String].head()
    assert(r == "1,1,2", r)
    // default null ordering is the reference's NULLS LAST; explicit
    // NULLS FIRST flips it
    val n = spark.sql(Registry.rewritePrestoSql(
      """SELECT array_join(array_agg(v ORDER BY k), ',') AS a,
        |  array_join(array_agg(v ORDER BY k ASC NULLS FIRST), ',') AS b
        |FROM VALUES (1, 10), (2, CAST(NULL AS INT)), (3, 5) AS t(v, k)"""
        .stripMargin)).collect()(0)
    assert(n.getString(0) == "3,1,2", n)
    assert(n.getString(1) == "2,3,1", n)
    // order-insensitive aggregates drop the clause (result-identical)
    assert(Registry.rewritePrestoSql("SELECT sum(x ORDER BY y) FROM t")
      == "SELECT sum(x) FROM t")
    // window ORDER BY and subquery ORDER BY are NOT aggregate-internal
    val w = "SELECT rank() OVER (PARTITION BY a ORDER BY b) FROM t"
    assert(Registry.rewritePrestoSql(w) == w)
    val sub = "SELECT coalesce((SELECT x FROM u ORDER BY y LIMIT 1), 0)"
    assert(Registry.rewritePrestoSql(sub) == sub)
    // DISTINCT: ORDER BY must equal the argument (AggregationAnalyzer)
    val e = intercept[Exception] {
      Registry.rewritePrestoSql(
        "SELECT array_agg(DISTINCT x ORDER BY y) FROM t")
    }
    assert(e.getMessage.contains(
      "ORDER BY expressions must appear in arguments"))
    val d = spark.sql(Registry.rewritePrestoSql(
      """SELECT array_join(array_agg(DISTINCT v ORDER BY v), ',') AS a
        |FROM VALUES (3), (1), (3), (2) AS t(v)""".stripMargin))
      .as[String].head()
    assert(d == "1,2,3", d)
    // FILTER rides the aggregate through the rewrite
    val f = spark.sql(Registry.rewritePrestoSql(
      """SELECT array_join(array_agg(v ORDER BY v DESC)
        |  FILTER (WHERE v % 2 = 0), ',') AS a
        |FROM VALUES (1), (2), (3), (4) AS t(v)""".stripMargin))
      .as[String].head()
    assert(f == "4,2", f)
    // multimap_agg's VALUE ORDER is observable — the rewrite sorts the
    // pairs and rebuilds map<k, array<v>> in that order
    val m = spark.sql(Registry.rewritePrestoSql(
      """SELECT array_join(transform(array_sort(map_entries(
        |    multimap_agg(g, v ORDER BY s DESC))),
        |  e -> concat(e.key, ':', array_join(
        |    transform(e.value, x -> CAST(x AS STRING)), ' '))), ',') AS a
        |FROM VALUES ('a', 1, 10), ('a', 2, 20), ('b', 3, 5),
        |  ('a', 4, 30) AS t(g, v, s)""".stripMargin))
      .as[String].head()
    assert(m == "a:4 2 1,b:3", m)
    // an order-SENSITIVE aggregate without a re-expression is LOUD —
    // dropping the clause would silently change observable results
    val loud = intercept[Exception] {
      Registry.rewritePrestoSql(
        "SELECT reduce_agg(x, 0, (a, b) -> a + b, (a, b) -> a + b " +
          "ORDER BY y) FROM t")
    }
    assert(loud.getMessage.contains("not supported for reduce_agg"),
      loud.getMessage)
    // the reference rejects the WINDOWED form outright
    // (StatementAnalyzer.java:1484) — same text here
    val win = intercept[Exception] {
      Registry.rewritePrestoSql(
        "SELECT array_agg(x ORDER BY y) OVER (PARTITION BY g) FROM t")
    }
    assert(win.getMessage.contains(
      "Window function with ORDER BY is not supported"), win.getMessage)
  }

  test("rewrite only touches the literal-unit Presto spelling") {
    assert(Registry.rewritePrestoSql("date_add('day', 1, x)") ==
      "presto_date_add('day', 1, x)")
    assert(Registry.rewritePrestoSql("DATE_DIFF('day', a, b)") ==
      "presto_date_diff('day', a, b)")
    // Spark's own 2-arg date_add has no leading quote — untouched
    assert(Registry.rewritePrestoSql("date_add(d, 3)") == "date_add(d, 3)")
    // Spark 2-arg with a string-literal start date: the quote is there but
    // the word after it is not a unit keyword — untouched
    assert(Registry.rewritePrestoSql("date_add('2020-01-01', 3)") ==
      "date_add('2020-01-01', 3)")
    // the names inside a string literal stay untouched too
    assert(Registry.rewritePrestoSql("SELECT 'call date_add(''x'') here'") ==
      "SELECT 'call date_add(''x'') here'")
  }

  test("entropy matches Shannon bits over counts; zero counts contribute 0") {
    // Uniform 4-way split: exactly 2 bits regardless of zero-count rows
    // (EntropyAggregation.java skips non-positive counts the same way).
    val h = spark.sql(Registry.rewritePrestoSql(
      "SELECT entropy(c) AS v FROM VALUES (5), (5), (5), (5), (0) AS t(c)"))
      .as[Double].head()
    assert(math.abs(h - 2.0) < 1e-12)
    // Single nonzero class: zero entropy.
    val h1 = spark.sql(Registry.rewritePrestoSql(
      "SELECT entropy(c) AS v FROM VALUES (7), (0) AS t(c)")).as[Double].head()
    assert(math.abs(h1) < 1e-12)
  }

  test("checksum is order-independent and value-sensitive") {
    def ck(vals: String): Long = spark.sql(Registry.rewritePrestoSql(
      s"SELECT checksum(x) AS v FROM VALUES $vals AS t(x)")).as[Long].head()
    assert(ck("('a'), ('b'), ('c')") == ck("('c'), ('a'), ('b')"))
    assert(ck("('a'), ('b'), ('c')") != ck("('a'), ('b'), ('d')"))
  }

  test("bare varchar cast rewrites to string; varchar(n) untouched") {
    assert(Registry.rewritePrestoSql("cast(x as varchar)") ==
      "cast(x as string)")
    assert(Registry.rewritePrestoSql("CAST(x AS VARCHAR )") ==
      "CAST(x AS string )")
    assert(Registry.rewritePrestoSql("cast(x as varchar(10))") ==
      "cast(x as varchar(10))")
    assert(one[String]("cast(42 as varchar)") == "42")
  }

  test("approx_most_frequent SQL spelling: literal sizes, Presto arg order") {
    val m = spark.sql(Registry.rewritePrestoSql(
      "SELECT approx_most_frequent(2, x, 8) AS v FROM VALUES " +
        "('a'), ('b'), ('a'), ('c'), ('a'), ('b') AS t(x)"))
      .as[Map[String, Long]].head()
    assert(m == Map("a" -> 3L, "b" -> 2L))
    val e = intercept[Exception] {
      spark.sql(Registry.rewritePrestoSql(
        "SELECT approx_most_frequent(2, x, y) FROM VALUES (1, 2) AS t(x, y)"))
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("parse_duration/to_milliseconds: units, fractions, loud invalids") {
    assert(one[Long]("to_milliseconds(parse_duration('1.5s'))") == 1500L)
    assert(one[Long]("to_milliseconds(parse_duration('750ms'))") == 750L)
    assert(one[Long]("to_milliseconds(parse_duration('2.25h'))") == 8100000L)
    assert(one[Long]("to_milliseconds(parse_duration('1d'))") == 86400000L)
    assert(one[Long]("to_milliseconds(parse_duration(' 42 us '))") == 0L)
    // interval type comes back out, usable in timestamp arithmetic
    assert(one[java.sql.Timestamp](
      "timestamp '2020-01-01 00:00:00' + parse_duration('90m')").toString
      .startsWith("2020-01-01 01:30:00"))
    val e = intercept[Exception] { one[Long]("to_milliseconds(parse_duration('5 parsecs'))") }
    assert(e.getMessage.contains("not a valid data duration"))
  }

  test("human_readable_seconds matches Presto formatting") {
    assert(one[String]("human_readable_seconds(96)") == "1 minute, 36 seconds")
    assert(one[String]("human_readable_seconds(0)") == "0 seconds")
    assert(one[String]("human_readable_seconds(604800)") == "1 week")
    assert(one[String]("human_readable_seconds(694861)") ==
      "1 week, 1 day, 1 hour, 1 minute, 1 second")
    assert(one[String]("human_readable_seconds(3762)") ==
      "1 hour, 2 minutes, 42 seconds")
    // double input rounds first (Presto Math.round semantics)
    assert(one[String]("human_readable_seconds(59.6)") == "1 minute")
  }

  test("wilson interval: known value, ordering, loud domain errors") {
    val wl = one[Double]("wilson_interval_lower(9, 10, 1.96)")
    val wu = one[Double]("wilson_interval_upper(9, 10, 1.96)")
    // hand-computed Wilson bounds for 9/10 at z=1.96
    assert(math.abs(wl - 0.5958) < 5e-4, s"wl=$wl")
    assert(math.abs(wu - 0.9821) < 5e-4, s"wu=$wu")
    assert(wl < 0.9 && 0.9 < wu)
    val e = intercept[Exception] { one[Double]("wilson_interval_lower(5, 4, 1.96)") }
    assert(e.getMessage.contains("wilson_interval"))
  }

  test("set_agg and set_union dedupe and sort deterministically") {
    assert(one[Seq[String]](
      "(SELECT set_agg(x) FROM VALUES ('b'), ('a'), ('b') AS t(x))")
      == Seq("a", "b"))
    assert(one[Seq[Long]](
      "(SELECT set_union(x) FROM VALUES (array(3L, 1L)), (array(1L, 2L)) " +
        "AS t(x))") == Seq(1L, 2L, 3L))
  }

  test("approx_percentile weighted 3-arg form = weighted-multiset percentile") {
    // multiset {10 x1, 20 x3, 30 x1}: median is 20; 0.9-quantile
    // interpolates between the expanded ranks
    val r = spark.sql(
      """SELECT approx_percentile(x, w, 0.5) AS med,
        |  approx_percentile(x, w, 0.0) AS lo,
        |  approx_percentile(x, w, 1.0) AS hi
        |FROM VALUES (10.0D, 1L), (20.0D, 3L), (30.0D, 1L) t(x, w)""".stripMargin)
      .head()
    assert(r.getDouble(0) == 20.0)
    assert(r.getDouble(1) == 10.0 && r.getDouble(2) == 30.0)
    // Spark's own 3-arg (col, percentage, integer accuracy) still works
    assert(spark.sql("SELECT approx_percentile(x, 0.5, 100) AS v " +
      "FROM VALUES (1.0D), (2.0D), (3.0D) t(x)").head().getDouble(0) == 2.0)
  }

  test("word_stem accepts only English") {
    assert(one[String]("word_stem('running')") == "run")
    // no case folding, like the reference's Snowball delegation
    assert(one[String]("word_stem('Motoring', 'en')") == "Motor")
    assert(one[String]("word_stem('ties')") == "tie")
    val e = intercept[Exception] {
      spark.sql("SELECT word_stem('laufen', 'de') AS v").collect()
    }
    assert(e.getMessage.contains("only language 'en'"))
  }

  test("ip functions: prefix masking and subnet membership") {
    assert(one[String]("ip_prefix('10.1.2.3', 24)") == "10.1.2.0/24")
    assert(one[String]("ip_prefix('255.255.255.255', 12)") == "255.240.0.0/12")
    assert(one[String]("ip_prefix('8.8.8.8', 32)") == "8.8.8.8/32")
    assert(one[Boolean]("is_subnet_of('10.0.0.0/8', '10.255.0.1')"))
    assert(!one[Boolean]("is_subnet_of('10.0.0.0/8', '11.0.0.1')"))
    assert(one[Boolean]("is_subnet_of('192.168.77.0/24', '192.168.77.200')"))
  }

  test("hamming_distance counts differing positions, rejects length mismatch") {
    assert(one[Long]("hamming_distance('karolin', 'kathrin')") == 3L)
    assert(one[Long]("hamming_distance('abc', 'abc')") == 0L)
    val e = intercept[Exception] {
      spark.sql("SELECT hamming_distance('ab', 'abc') AS v").collect()
    }
    assert(e.getMessage.contains("same length"))
  }

  test("ngrams and reduce templates") {
    val bi = spark.sql(
      "SELECT ngrams(array('a','b','c'), 2) AS v").as[Seq[Seq[String]]].head()
    assert(bi == Seq(Seq("a", "b"), Seq("b", "c")))
    // n > length clamps to one whole-array n-gram (ArrayNgramsFunction.java)
    assert(spark.sql("SELECT ngrams(array('a'), 2) AS v")
      .as[Seq[Seq[String]]].head() == Seq(Seq("a")))
    assert(one[Long](
      "reduce(array(1L, 2L, 3L), 0L, (s, x) -> s + x, s -> s)") == 6L)
  }

  test("bing tiles: quadkey spec example, round-trips, clip at poles") {
    // The Microsoft quadkey doc's example: tile (3, 5) at zoom 3 <-> "213"
    assert(one[String](
      "bing_tile_quadkey(bing_tile(3, 5, 3))") == "213")
    assert(one[Boolean](
      "bing_tile(bing_tile_quadkey(bing_tile(3, 5, 3))) = bing_tile(3, 5, 3)"))
    assert(one[Int]("bing_tile_zoom_level(bing_tile('213'))") == 3)
    // bing_tile_at at the lat/lon extremes clips into the last/first tile
    assert(one[Int]("bing_tile_at(-85.05112878, 0.0, 4).y") == 15)
    assert(one[Int]("bing_tile_at(85.05112878, -180.0, 4).x") == 0)
    // interior point: 3x3 neighborhood complete; corner point: clipped
    assert(one[Int](
      "size(bing_tiles_around(47.6097, -122.3331, 10))") == 9)
    assert(one[Int](
      "size(bing_tiles_around(85.05112878, -180.0, 4))") == 4)
    // envelope corners invert the projection (zoom 1: hemispheres)
    assert(one[Double](
      "round(element_at(bing_tile_polygon(bing_tile(0, 0, 1)), 1).x, 9)")
      == -180.0)
    assert(one[Double](
      "round(element_at(bing_tile_polygon(bing_tile(0, 0, 1)), 1).y, 9)")
      == 0.0)
  }

  test("differential_entropy: hand values, NaN on empty, loud guards") {
    // Uniform over 4 unit buckets: exactly 2 bits (ln 4 / ln 2 is exact).
    assert(spark.sql(
      """SELECT differential_entropy(4, x, 1.0, 'fixed_histogram_mle',
        |  0.0, 4.0) AS v
        |FROM VALUES (0.5), (1.5), (2.5), (3.5) AS t(x)""".stripMargin)
      .as[Double].head() == 2.0)
    // Weighted (1,1,2) over 3 occupied buckets: H = 1.5 bits + ln(1)=0
    val w = spark.sql(
      """SELECT differential_entropy(4, x, w, 'fixed_histogram_mle',
        |  0.0, 4.0) AS v
        |FROM VALUES (0.5, 1.0), (1.5, 1.0), (2.5, 2.0) AS t(x, w)"""
        .stripMargin).as[Double].head()
    assert(math.abs(w - 1.5) < 1e-12)
    // All-null input: the reference returns NaN on zero total weight
    assert(spark.sql(
      """SELECT differential_entropy(4, x, 1.0, 'fixed_histogram_mle',
        |  0.0, 4.0) AS v
        |FROM VALUES (cast(null as double)) AS t(x)""".stripMargin)
      .as[Double].head().isNaN)
    // Reservoir (3-arg) forms and non-mle methods are rejected loudly
    val e1 = intercept[Exception] {
      spark.sql("SELECT differential_entropy(10, x, 1.0) FROM VALUES (1.0) t(x)")
    }
    assert(e1.getMessage.contains("nondeterministic"))
    // jacknife strategy, by hand: uniform 4 unit buckets, n = 4 ->
    // n*H - sum of 4 leave-one-out terms = 4*2 - 4*(3/4)*log2(3)
    val jk = spark.sql(
      """SELECT differential_entropy(4, x, 1.0, 'fixed_histogram_jacknife',
        |  0.0, 4.0) AS v
        |FROM VALUES (0.5), (1.5), (2.5), (3.5) AS t(x)""".stripMargin)
      .as[Double].head()
    assert(math.abs(jk - (8.0 - 3.0 * math.log(3) / math.log(2))) < 1e-12)
    val e2 = intercept[Exception] {
      spark.sql("""SELECT differential_entropy(10, x, 1.0,
        'unweighted_reservoir', 0.0, 1.0) FROM VALUES (0.5) t(x)""")
    }
    assert(e2.getMessage.contains("fixed_histogram"))
    // Out-of-range sample fails like the reference's checkArgument
    val e3 = intercept[Exception] {
      spark.sql("""SELECT differential_entropy(4, x, 1.0,
        'fixed_histogram_mle', 0.0, 4.0) FROM VALUES (9.0) t(x)""").collect()
    }
    assert(e3.getMessage.contains("within range"))
  }

  test("histogram aggregates: merge path equals single-partition bulk") {
    // integer-valued weights make per-bucket sums exact, so any
    // partition layout must produce BIT-IDENTICAL results (the merge
    // is element-wise addition of exact doubles)
    import org.apache.spark.sql.functions.{col, expr}
    val base = spark.range(0, 1000)
      .select((col("id") % 47).cast("double").as("x"),
        ((col("id") % 5) + 1).cast("double").as("w"),
        (col("id") % 3 === 0).as("o"),
        ((col("id") % 11).cast("double") / 10).as("p"))
    def run(parts: Int): Seq[Any] = {
      val df = base.repartition(parts)
      df.select(
        expr("differential_entropy(13, x, w, 'fixed_histogram_mle', 0.0, 47.0)"),
        expr("differential_entropy(13, x, w, 'fixed_histogram_jacknife', 0.0, 47.0)"),
        expr("classification_precision(10, o, p, w)"),
        expr("classification_thresholds(10, o, p)"),
        graft.functions.VectorAvg.agg(expr("array(x, w)")))
        .head().toSeq
    }
    assert(run(1) == run(13))
  }

  test("classification_*: hand case incl. early stop and 1.0 clamp") {
    // trues at preds 0.1 (bk0) and 0.9 (bk3); false at 0.3 (bk1); 4 buckets
    val rows = "VALUES (true, 0.1D), (true, 0.9D), (false, 0.3D) AS t(o, p)"
    def arr(fn: String): Seq[Double] =
      spark.sql(s"SELECT $fn(4, o, p) AS v FROM $rows").as[Seq[Double]].head()
    assert(arr("classification_thresholds") == Seq(0.0, 0.25, 0.5, 0.75))
    assert(arr("classification_precision") == Seq(2.0 / 3, 0.5, 1.0, 1.0))
    assert(arr("classification_recall") == Seq(1.0, 0.5, 0.5, 0.5))
    // reference-verbatim ratios (BucketResult's field mapping):
    assert(arr("classification_fall_out") == Seq(0.0, 1.0, 1.0, 1.0))
    assert(arr("classification_miss_rate") == Seq(0.5, 0.5, 0.0, 0.0))
    // early stop: all true weight in bucket 0 -> single entry
    assert(spark.sql(
      """SELECT classification_thresholds(4, o, p) AS v
        |FROM VALUES (true, 0.1D), (false, 0.9D) AS t(o, p)""".stripMargin)
      .as[Seq[Double]].head() == Seq(0.0))
    // pred = 1.0 is legal and clamps into the top bucket
    assert(spark.sql(
      """SELECT classification_thresholds(4, o, p) AS v
        |FROM VALUES (true, 1.0D) AS t(o, p)""".stripMargin)
      .as[Seq[Double]].head() == Seq(0.0, 0.25, 0.5, 0.75))
    // out-of-range prediction fails loudly, like the reference
    val e = intercept[Exception] {
      spark.sql("""SELECT classification_recall(4, o, p)
        FROM VALUES (true, 1.5D) AS t(o, p)""").collect()
    }
    assert(e.getMessage.contains("between 0.0 and 1.0"))
  }

  test("TIME literals ride as epoch-date timestamps; localtime() runs") {
    Registry.install(spark)
    import spark.implicits._
    // rewrite leaves TIMESTAMP literals alone, converts TIME
    val row = spark.sql(Registry.rewritePrestoSql(
      """SELECT TIME '08:30:15' < TIME '12:00:00' AS am,
        |  hour(TIME '17:45:59.250') AS h,
        |  cast(date_diff('minute', TIME '09:00:00', TIME '10:30:00')
        |    as bigint) AS mins,
        |  TIMESTAMP '2020-01-02 03:04:05' AS ts
        |""".stripMargin)).head()
    assert(row.getBoolean(0))
    assert(row.getInt(1) == 17)
    assert(row.getLong(2) == 90L)
    assert(row.getTimestamp(3).toString.startsWith("2020-01-02"))
    // localtime(): a time-of-day on the epoch date
    val lt = spark.sql("SELECT cast(localtime() as string) AS t")
      .as[String].head()
    assert(lt.startsWith("1970-01-01 "))
  }

  test("TIME WITH TIME ZONE literals ride the zoned struct layer") {
    Registry.install(spark)
    // literal rewrite: wall clock on the epoch date, zone carried
    val r = spark.sql(Registry.rewritePrestoSql(
      """SELECT hour(zoned_local(TIME '08:30:15 +05:30')) AS h,
        |  zoned_timezone_hour(TIME '08:30:15 +05:30') AS tzh,
        |  zoned_timezone_minute(TIME '08:30:15 +05:30') AS tzm,
        |  zoned_instant(TIME '08:30:15 +05:30') =
        |    zoned_instant(TIME '03:00:15 +00:00') AS same_inst""".stripMargin))
      .collect()(0)
    assert(r.getInt(0) == 8)
    assert(r.getLong(1) == 5L && r.getLong(2) == 30L)
    assert(r.getBoolean(3))
    // column-bearing comparison goes through the instant rule
    val n = spark.sql(Registry.rewritePrestoSql(
      """SELECT count(*) AS n FROM (SELECT TIME '08:30:15 +05:30' AS t
        |  FROM VALUES (1) AS v(x))
        |WHERE t = TIME '03:00:15 +00:00'""".stripMargin))
      .collect()(0).getLong(0)
    assert(n == 1L)
    // plain TIME literals (no offset tail) still parse as before
    assert(spark.sql(Registry.rewritePrestoSql(
      "SELECT hour(TIME '09:15:00') AS h")).collect()(0).getInt(0) == 9)
  }

  test("ARRAY[...] and DECIMAL '...' literal spellings rewrite and run") {
    Registry.install(spark)
    import spark.implicits._
    val arr = spark.sql(Registry.rewritePrestoSql(
      "SELECT ARRAY[1, 2, 3] AS v")).as[Seq[Int]].head()
    assert(arr == Seq(1, 2, 3))
    // nested arrays + strings containing ].
    val nested = spark.sql(Registry.rewritePrestoSql(
      "SELECT element_at(element_at(ARRAY[ARRAY[1, 2], ARRAY[3, 4]], 1), 2)" +
        " AS v, ' ARRAY[x] ' AS s")).head()
    assert(nested.getInt(0) == 2)
    assert(nested.getString(1) == " ARRAY[x] ") // string literal untouched
    val dec = spark.sql(Registry.rewritePrestoSql(
      "SELECT DECIMAL '12.345' AS v")).head()
    assert(dec.getDecimal(0).toPlainString == "12.345")
    assert(spark.sql(Registry.rewritePrestoSql(
      "SELECT DECIMAL '12.345' * 2 AS v")).schema.head.dataType.sql
      .startsWith("DECIMAL"))
  }

  test("bracket subscripts rewrite to 1-based element_at") {
    Registry.install(spark)
    import spark.implicits._
    // Presto's [] is 1-based (ArraySubscriptOperator.java) — arr[1] must
    // read the FIRST element, not Spark's 0-based second.
    assert(spark.sql(Registry.rewritePrestoSql(
      "SELECT ARRAY[10, 20, 30][1] AS v")).as[Int].head() == 10)
    // receiver shapes: qualified names, call results, chained subscripts,
    // map string keys, struct-field chains
    val row = spark.sql(Registry.rewritePrestoSql(
      """SELECT t.xs[2] AS a,
        |  split('a-b-c', '-')[3] AS b,
        |  ARRAY[ARRAY[1, 2], ARRAY[3, 4]][2][1] AS c,
        |  map('k', 7)['k'] AS d,
        |  named_struct('f', ARRAY[5, 6]).f[2] AS e
        |FROM (SELECT ARRAY[10, 20, 30] AS xs) t""".stripMargin)).head()
    assert(row.getInt(0) == 20)
    assert(row.getString(1) == "c")
    assert(row.getInt(2) == 3)
    assert(row.getInt(3) == 7)
    assert(row.getInt(4) == 6)
    // '[' inside string literals and with no receiver stay untouched
    assert(Registry.rewritePrestoSql("SELECT ' a[1] ' AS s") ==
      "SELECT ' a[1] ' AS s")
    // slice syntax (not Presto) passes through unrewritten
    assert(Registry.rewritePrestoSql("SELECT w[3:6] AS s").contains("w[3:6]"))
  }

  test("subscripts fail loudly out of bounds / on missing keys (Presto contract)") {
    Registry.install(spark)
    def run(sql: String) =
      spark.sql(Registry.rewritePrestoSql(s"SELECT $sql AS v")).collect()
    // reference texts: ArraySubscriptOperator.java:152-169,
    // MapSubscriptOperator.java:233
    val oob = intercept[Exception] { run("ARRAY[10, 20][3]") }
    assert(oob.getMessage.contains("Array subscript out of bounds"))
    val zero = intercept[Exception] { run("ARRAY[10, 20][0]") }
    assert(zero.getMessage.contains("SQL array indices start at 1"))
    val neg = intercept[Exception] { run("ARRAY[10, 20][-1]") }
    assert(neg.getMessage.contains("Array subscript is negative"))
    val missing = intercept[Exception] { run("map('k', 7)['nope']") }
    assert(missing.getMessage.contains("Key not present in map: nope"))
    // NULL receiver / NULL subscript stay NULL (RETURN_NULL_ON_NULL)
    val nulls = spark.sql(Registry.rewritePrestoSql(
      "SELECT cast(null as array<int>)[1] AS a, ARRAY[1][cast(null as int)] AS b"))
      .collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
    // TRY swallows the failure into NULL like the reference's TRY()
    val tried = spark.sql(Registry.rewritePrestoSql(
      "SELECT TRY(ARRAY[10, 20][3]) AS v")).collect()(0)
    assert(tried.isNullAt(0))
  }

  test("strict element_at opts into the reference's soft semantics") {
    Registry.install(spark)
    def run(sql: String) =
      spark.sql(Registry.rewritePrestoSql(s"SELECT $sql AS v")).collect()
    val key = "spark.graft.elementAt.strict"
    try {
      spark.conf.set(key, "true")
      // ArrayElementAtFunction.checkedIndexToBlockPosition: past either
      // end -> NULL (ANSI Spark raises), negative counts from the end,
      // index 0 stays loud with the reference's text
      assert(run("element_at(ARRAY[10, 20], 3)")(0).isNullAt(0))
      assert(run("element_at(ARRAY[10, 20], -3)")(0).isNullAt(0))
      assert(run("element_at(ARRAY[10, 20], -1)")(0).getInt(0) == 20)
      val zero = intercept[Exception] { run("element_at(ARRAY[10, 20], 0)") }
      assert(zero.getMessage.contains("SQL array indices start at 1"))
      // MapElementAtFunction: missing key -> NULL (m[k] stays loud)
      assert(run("element_at(map('k', 7), 'nope')")(0).isNullAt(0))
      assert(run("element_at(map('k', 7), 'k')")(0).getInt(0) == 7)
    } finally spark.conf.unset(key)
    // conf off: bare element_at keeps Spark ANSI semantics (the
    // documented residual default) — out of bounds raises
    val ansi = intercept[Exception] { run("element_at(ARRAY[10, 20], 3)") }
    assert(ansi.getMessage.toLowerCase.contains("index"))
  }

  test("map constructor duplicate keys carry the reference's error text") {
    Registry.install(spark)
    def run(sql: String) =
      spark.sql(Registry.rewritePrestoSql(s"SELECT $sql AS v")).collect()
    // DuplicateMapKeyException.getDetailedMessage: the exact text, with
    // the first duplicated key rendered — both constructor spellings
    val zip = intercept[Exception] {
      run("MAP(ARRAY[1, 2, 1], ARRAY['a', 'b', 'c'])")
    }
    assert(zip.getMessage.contains("Duplicate map keys (1) are not allowed"),
      zip.getMessage)
    val varargs = intercept[Exception] { run("map('x', 1, 'x', 2)") }
    assert(varargs.getMessage
      .contains("Duplicate map keys (x) are not allowed"), varargs.getMessage)
    // TRY composes, like every INVALID_FUNCTION_ARGUMENT in the
    // reference
    assert(run("TRY(map('x', 1, 'x', 2))")(0).isNullAt(0))
    // distinct keys still construct fine through the checked path
    assert(run("cardinality(MAP(ARRAY[1, 2], ARRAY['a', 'b']))")(0)
      .getInt(0) == 2)
    assert(run("cardinality(MAP())")(0).getInt(0) == 0)
  }

  test("mistyped subscripts are rejected at analysis, not silently cast") {
    Registry.install(spark)
    def run(sql: String) =
      spark.sql(Registry.rewritePrestoSql(s"SELECT $sql AS v")).collect()
    // a[1.9] must NOT truncate to a[1] (the reference types the array
    // subscript as bigint — fractional indexes fail the analyzer)
    val frac = intercept[Exception] { run("ARRAY[10, 20][1.9]") }
    assert(frac.getMessage.contains("Array subscript must be an integer"))
    val str = intercept[Exception] { run("ARRAY[10, 20]['x']") }
    assert(str.getMessage.contains("Array subscript must be an integer"))
    // int-keyed map subscripted with a string: analysis error, not NULL
    val badKey = intercept[Exception] { run("map(1, 7)['x']") }
    assert(badKey.getMessage.contains("not coercible to key type"))
    // integral-width mixes still work (bigint literal on int-keyed map)
    assert(spark.sql(Registry.rewritePrestoSql(
      "SELECT map(1, 7)[cast(1 as bigint)] AS v")).collect()(0).getInt(0) == 7)
  }

  test("CAST targets accept Presto's parametric type spellings") {
    Registry.install(spark)
    // TypeSignature.java spellings: row(name T, ...), array(T), map(K, V)
    val row = spark.sql(Registry.rewritePrestoSql(
      """SELECT CAST(row(1, 2.5) AS ROW(x BIGINT, y DOUBLE)).y AS y,
        |  CAST(ARRAY[1, 2, 3] AS array(double))[2] AS d,
        |  CAST(map(ARRAY['a'], ARRAY[1]) AS map(varchar, bigint))['a'] AS m,
        |  CAST(ARRAY[row(1, 'p')]
        |    AS array(row(k bigint, v varchar)))[1].v AS nested
        |FROM (SELECT 1)""".stripMargin)).collect()(0)
    assert(row.getDouble(0) == 2.5)
    assert(row.getDouble(1) == 2.0)
    assert(row.getLong(2) == 1L)
    assert(row.getString(3) == "p")
    // non-parametric and same-spelling types pass through untouched
    assert(Registry.rewritePrestoSql("SELECT CAST(x AS decimal(10, 2))") ==
      "SELECT CAST(x AS decimal(10, 2))")
    // the array CONSTRUCTOR function is not a type and must not rewrite
    assert(Registry.rewritePrestoSql("SELECT array(1, 2)") ==
      "SELECT array(1, 2)")
  }

  test("MAP constructor: Presto zip form, empty form, Spark varargs coexist") {
    Registry.install(spark)
    val row = spark.sql(Registry.rewritePrestoSql(
      """SELECT MAP(ARRAY['a', 'b'], ARRAY[1, 2])['b'] AS zip,
        |  cardinality(MAP()) AS empty,
        |  map('k', 7)['k'] AS varargs""".stripMargin)).collect()(0)
    assert(row.getInt(0) == 2)
    assert(row.getInt(1) == 0)
    assert(row.getInt(2) == 7)
  }

  test("map_concat uses Presto's last-map-wins duplicate-key policy") {
    Registry.install(spark)
    // MapConcatFunction.java: "that key's value in the resulting map
    // comes from the last map"
    val row = spark.sql(Registry.rewritePrestoSql(
      """SELECT map_concat(map('x', 1, 'y', 2), map('x', 9))['x'] AS x,
        |  map_concat(map('x', 1, 'y', 2), map('x', 9))['y'] AS y,
        |  cardinality(map_concat(map('a', 1), map('b', 2),
        |    map('a', 3))) AS n,
        |  map_concat(map('a', 1), map('b', 2), map('a', 3))['a'] AS a3
        |""".stripMargin)).collect()(0)
    assert(row.getInt(0) == 9)
    assert(row.getInt(1) == 2)
    assert(row.getInt(2) == 2)
    assert(row.getInt(3) == 3)
  }

  test("CREATE FUNCTION Presto spellings: namespace, RNONI guard, varchar") {
    Registry.install(spark)
    import spark.implicits._
    val rewritten = Registry.rewritePrestoSql(
      """CREATE FUNCTION cat.sch.f2(a BIGINT, b BIGINT)
        |RETURNS VARCHAR LANGUAGE SQL DETERMINISTIC
        |RETURNS NULL ON NULL INPUT
        |RETURN cast(coalesce(a, 0) + coalesce(b, 0) as string)""".stripMargin)
    // qualified name collapses, TEMPORARY forced, RNONI becomes a guard
    assert(rewritten.contains("TEMPORARY FUNCTION f2("))
    assert(rewritten.contains("RETURNS  STRING") ||
      rewritten.contains("RETURNS STRING"))
    assert(rewritten.contains("a IS NULL OR b IS NULL"))
    spark.sql(rewritten)
    // the body alone would return '7' for (NULL, 7); the guard nulls it
    val r = spark.sql(
      "SELECT f2(3, 4) AS s, f2(CAST(NULL AS BIGINT), 7) AS n").head()
    assert(r.getString(0) == "7" && r.isNullAt(1))
    // CALLED ON NULL INPUT is Spark's default: dropped, body sees nulls
    spark.sql(Registry.rewritePrestoSql(
      """CREATE OR REPLACE FUNCTION g1(x BIGINT) RETURNS BIGINT
        |CALLED ON NULL INPUT
        |RETURN coalesce(x, -1)""".stripMargin))
    assert(spark.sql("SELECT g1(CAST(NULL AS BIGINT)) AS v")
      .as[Long].head() == -1L)
  }

  test("CROSS JOIN UNNEST rewrites to LATERAL VIEW explode; zip/ordinality pass through") {
    Registry.install(spark)
    import spark.implicits._
    val words = spark.sql(Registry.rewritePrestoSql(
      """SELECT t.w FROM (SELECT 'a b c' AS s) x
        |CROSS JOIN UNNEST(split(s, ' ')) AS t(w) ORDER BY w""".stripMargin))
      .as[String].collect().toSeq
    assert(words == Seq("a", "b", "c"))
    // map unnest → two columns
    val kv = spark.sql(Registry.rewritePrestoSql(
      """SELECT k, v FROM (SELECT map('x', 1, 'y', 2) AS m) q
        |CROSS JOIN UNNEST(m) AS t(k, v) ORDER BY k""".stripMargin))
      .as[(String, Int)].collect().toSeq
    assert(kv == Seq(("x", 1), ("y", 2)))
    // unsupported shapes are left verbatim (no partial rewrite)
    val zip = "SELECT * FROM t CROSS JOIN UNNEST(a, b) AS u(x, y)"
    assert(Registry.rewritePrestoSql(zip) == zip)
    val ord = "SELECT * FROM t CROSS JOIN UNNEST(a) WITH ORDINALITY AS u(x, o)"
    assert(Registry.rewritePrestoSql(ord) == ord)
  }

  test("TABLESAMPLE BERNOULLI/SYSTEM rewrites to the percent form") {
    Registry.install(spark)
    graft.Tables.register(spark, SfDir)
    val n = spark.sql(Registry.rewritePrestoSql(
      "SELECT count(*) AS n FROM customer TABLESAMPLE BERNOULLI (50)"))
      .collect()(0).getLong(0)
    assert(n > 0 && n < 150) // sf0.001 customer = 150 rows
    assert(Registry.rewritePrestoSql("x TABLESAMPLE SYSTEM(12.5) y") ==
      "x TABLESAMPLE (12.5 PERCENT) y")
  }

  test("ROW constructor: Presto row() builds a struct, positional cast renames") {
    Registry.install(spark)
    import spark.implicits._
    val v = spark.sql(
      "SELECT cast(row(1, 'a') as struct<x: bigint, y: string>).x AS v")
      .as[Long].head()
    assert(v == 1L)
    val arr = spark.sql(
      "SELECT transform(array(row(1, 2.5D), row(3, 4.5D)), r -> r.col2) AS v")
      .as[Seq[Double]].head()
    assert(arr == Seq(2.5, 4.5))
  }

  test("AT TIME ZONE rewrites onto the zoned struct layer") {
    // column receiver
    assert(Registry.rewritePrestoSql("SELECT x AT TIME ZONE 'UTC'") ==
      "SELECT named_struct('utc', cast((x) as timestamp_ntz), 'tz', 'UTC')")
    // call receiver walks back through the group
    assert(Registry.rewritePrestoSql("SELECT f(a, b) AT TIME ZONE '+02:00'")
      .contains("cast((f(a, b)) as timestamp_ntz)"))
    // timestamp-literal receiver swallows the type keyword
    assert(Registry.rewritePrestoSql(
      "SELECT timestamp '2020-01-01 00:00:00' AT TIME ZONE '+01:00'")
      .contains("cast((timestamp '2020-01-01 00:00:00') as timestamp_ntz)"))
    // inside a string literal: untouched
    val s0 = "SELECT 'x AT TIME ZONE ''y''' AS v"
    assert(Registry.rewritePrestoSql(s0) == s0)
    // end to end: instant preserved, wall clock moves
    val wall = spark.sql(Registry.rewritePrestoSql(
      "SELECT cast(zoned_local(timestamp '2020-06-10 10:00:00' " +
        "AT TIME ZONE 'Asia/Kolkata') as string) AS v")).as[String].head()
    assert(wall == "2020-06-10 15:30:00")
  }

  test("DESCRIBE renders Presto type signatures from catalog metadata") {
    graft.Tables.register(spark, SfDir)
    val rows = Registry.prestoStatement(spark, "DESC nation").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("n_name") == "varchar")
    assert(rows("n_nationkey") == "integer")
    // DESCRIBE INPUT must not be swallowed by the table form
    intercept[Exception] {
      Registry.prestoStatement(spark, "DESCRIBE INPUT no_such_stmt")
    }
  }

  test("EXPLAIN family: VALIDATE analyzes only, IO lists tables, paren query is not options") {
    graft.Tables.register(spark, SfDir)
    val valid = Registry.prestoStatement(spark,
      "EXPLAIN (TYPE VALIDATE) SELECT count(*) FROM nation")
      .collect()(0).getBoolean(0)
    assert(valid)
    intercept[Exception] {
      Registry.prestoStatement(spark,
        "EXPLAIN (TYPE VALIDATE) SELECT no_such_col FROM nation")
    }
    val io = Registry.prestoStatement(spark,
      "EXPLAIN (TYPE IO) SELECT r_name FROM region r2 JOIN nation ON n_regionkey = r_regionkey")
      .collect()(0).getString(0)
    assert(io == """{"inputTables":["nation","region"]}""")
    // `EXPLAIN (SELECT 1)` — parenthesized query, not an option list
    val txt = Registry.prestoStatement(spark, "EXPLAIN (SELECT 1)")
      .collect()(0).getString(0)
    assert(txt.nonEmpty && !txt.contains("Exception"))
  }

  test("SET SESSION maps hash_partition_count onto shuffle partitions; RESET restores") {
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    Registry.prestoStatement(spark, "SET SESSION hash_partition_count = 5")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "5")
    val shown = Registry.prestoStatement(spark, "SHOW SESSION")
      .filter(col("Name") === "hash_partition_count")
      .collect()(0).getString(1)
    assert(shown == "5")
    Registry.prestoStatement(spark, "RESET SESSION hash_partition_count")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prior)
    intercept[Exception] {
      Registry.prestoStatement(spark, "SET SESSION not_a_property = 1")
    }
  }

  test("session-property registry carries the full reference inventory") {
    import graft.functions.SessionProperties.defs
    // 92 SystemSessionProperties registrations (11 hidden) + the hive
    // catalog's complete 58-property inventory (4 hidden) —
    // tools/extract_session_props.py + extract_hive_session_props.py
    // are the extractions; these counts lock against drift
    assert(defs.size == 150)
    assert(defs.count(_.hidden) == 15)
    assert(defs.count(_.catalog.contains("hive")) == 58)
    assert(defs.map(_.name).distinct.size == defs.size)
    assert(defs.forall(d => d.name == d.name.toLowerCase))
    assert(defs.forall(d =>
      Set("varchar", "boolean", "integer", "bigint", "double")(d.typ)))
    assert(defs.forall(_.desc.nonEmpty))
    // machine-dependent defaults computed, never the RUNTIME marker
    assert(defs.forall(_.default != "RUNTIME"))
    val byName = defs.map(d => d.name -> d).toMap
    assert(byName("initial_splits_per_node").default ==
      (Runtime.getRuntime.availableProcessors * 2).toString)
    // SHOW SESSION sorts system properties by name, skips hidden,
    // renders the hive property catalog-qualified and last
    val names = Registry.prestoStatement(spark, "SHOW SESSION")
      .collect().map(_.getString(0)).toSeq
    assert(names.size == 135)
    val (sys, hive) = names.partition(!_.startsWith("hive."))
    assert(sys.size == 81 && hive.size == 54)
    assert(names == sys ++ hive) // system section first
    assert(sys == sys.sorted && hive == hive.sorted)
  }

  test("SHOW CREATE FUNCTION replays the created text; DROP FUNCTION removes it") {
    Registry.prestoStatement(spark,
      "CREATE OR REPLACE FUNCTION graft.default.t_scf(x BIGINT) RETURNS BIGINT RETURN x + 1")
    assert(spark.sql("SELECT t_scf(41) AS v").as[Long].head() == 42L)
    val text = Registry.prestoStatement(spark, "SHOW CREATE FUNCTION t_scf")
      .collect()(0).getString(0)
    assert(text.contains("RETURN x + 1"))
    Registry.prestoStatement(spark, "DROP FUNCTION IF EXISTS t_scf")
    assert(spark.sql("SHOW USER FUNCTIONS LIKE 't_scf'").count() == 0)
    intercept[Exception] {
      Registry.prestoStatement(spark, "SHOW CREATE FUNCTION t_scf")
    }
  }

  test("transaction statements are autocommit no-ops") {
    assert(Registry.prestoStatement(spark, "START TRANSACTION READ ONLY")
      .collect()(0).getString(0) == "START TRANSACTION")
    assert(Registry.prestoStatement(spark, "COMMIT WORK")
      .collect()(0).getString(0) == "COMMIT")
    assert(Registry.prestoStatement(spark, "ROLLBACK")
      .collect()(0).getString(0) == "ROLLBACK")
  }

  test("DESCRIBE OUTPUT types prepared statements without executing them") {
    graft.Tables.register(spark, SfDir)
    Registry.prestoStatement(spark,
      "PREPARE t_dio FROM SELECT n_name, n_nationkey * 2 AS dbl FROM nation WHERE n_nationkey > ?")
    val out = Registry.prestoStatement(spark, "DESCRIBE OUTPUT t_dio")
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(out("n_name") == "varchar")
    assert(out("dbl") == "integer")
    val in = Registry.prestoStatement(spark, "DESCRIBE INPUT t_dio").collect()
    assert(in.length == 1 && in(0).getInt(0) == 0)
    Registry.prestoStatement(spark, "DEALLOCATE PREPARE t_dio")
  }

  test("ALTER FUNCTION flips the null-input characteristic by re-registration") {
    Registry.install(spark)
    Registry.prestoStatement(spark,
      "CREATE FUNCTION t_af(x INT) RETURNS INT RETURN coalesce(x, -1) + 1")
    // default CALLED ON NULL INPUT: body sees the NULL
    assert(spark.sql("SELECT t_af(cast(null as int)) AS v")
      .collect()(0).getInt(0) == 0)
    Registry.prestoStatement(spark,
      "ALTER FUNCTION t_af RETURNS NULL ON NULL INPUT")
    assert(spark.sql("SELECT t_af(cast(null as int)) AS v")
      .collect()(0).isNullAt(0))
    assert(spark.sql("SELECT t_af(5) AS v").collect()(0).getInt(0) == 6)
    // ... and back
    Registry.prestoStatement(spark,
      "ALTER FUNCTION t_af CALLED ON NULL INPUT")
    assert(spark.sql("SELECT t_af(cast(null as int)) AS v")
      .collect()(0).getInt(0) == 0)
    // SHOW CREATE FUNCTION reflects the altered text
    val text = Registry.prestoStatement(spark, "SHOW CREATE FUNCTION t_af")
      .collect()(0).getString(0)
    assert(text.toUpperCase.contains("CALLED ON NULL INPUT"))
    Registry.prestoStatement(spark, "DROP FUNCTION IF EXISTS t_af")
    // unknown function is loud
    intercept[Exception] {
      Registry.prestoStatement(spark,
        "ALTER FUNCTION t_missing RETURNS NULL ON NULL INPUT")
    }
  }

  test("zoned values compare, order, join, and IN by instant") {
    Registry.install(spark)
    // 15:30+05:30 and 12:00+02:00 are the same instant (10:00 UTC) in
    // different zones — struct pair comparison would call them unequal;
    // the reference compares instants (TimestampWithTimeZoneType
    // compareTo). Column-bearing comparisons route through the
    // ZonedInstantComparison optimizer rule.
    val rows = spark.sql(Registry.rewritePrestoSql(
      """WITH z AS (SELECT id, zoned_timestamp(s) AS z FROM VALUES
        |    (1, '2020-06-10T15:30:00+05:30'),
        |    (2, '2020-06-10T12:00:00+02:00'),
        |    (3, '2020-12-31T23:45:00-03:30') AS t(id, s))
        |SELECT id,
        |  z = zoned_timestamp('2020-06-10T10:00:00Z') AS eq_inst,
        |  z < zoned_timestamp('2020-07-01T00:00:00Z') AS lt_july,
        |  rank() OVER (ORDER BY z) AS rk,
        |  z IN (zoned_timestamp('2020-06-10T20:00:00+10:00'),
        |        zoned_timestamp('1999-01-01T00:00:00Z')) AS in_inst
        |FROM z ORDER BY id""".stripMargin))
      .collect().map(r => (r.getInt(0), r.getBoolean(1), r.getBoolean(2),
        r.getInt(3), r.getBoolean(4)))
    assert(rows(0) == ((1, true, true, 1, true)))
    assert(rows(1) == ((2, true, true, 1, true)))
    assert(rows(2) == ((3, false, false, 3, false)))
    // joins key on the instant too (same-instant different-zone match)
    val joined = spark.sql(Registry.rewritePrestoSql(
      """SELECT count(*) AS n FROM
        |  (SELECT zoned_timestamp(s) AS a FROM VALUES
        |    ('2020-06-10T15:30:00+05:30') AS t(s)) l
        |JOIN
        |  (SELECT zoned_timestamp(s) AS b FROM VALUES
        |    ('2020-06-10T12:00:00+02:00') AS t(s)) r
        |ON l.a = r.b""".stripMargin)).collect()(0).getLong(0)
    assert(joined == 1L)
  }

  test("GROUP BY / DISTINCT / PARTITION BY over zoned values use the instant") {
    Registry.install(spark)
    // rows 1 and 2 are the same instant in different zones; the
    // reference groups by the packed millis (one arbitrary
    // representative zone survives per group) — r7 closes this ledger
    // residual: grouping keys rewrite to utc, bare key outputs become
    // first(key).
    val grouped = spark.sql(Registry.rewritePrestoSql(
      """WITH z AS (SELECT id, zoned_timestamp(s) AS z FROM VALUES
        |    (1, '2020-06-10T15:30:00+05:30'),
        |    (2, '2020-06-10T12:00:00+02:00'),
        |    (3, '2020-12-31T23:45:00-03:30') AS t(id, s))
        |SELECT zoned_instant(z) AS inst, z AS rep, count(*) AS n
        |FROM z GROUP BY z ORDER BY inst""".stripMargin)).collect()
    assert(grouped.length == 2)
    assert(grouped(0).getLong(2) == 2L) // same-instant rows collapsed
    assert(grouped(1).getLong(2) == 1L)
    // the representative is one of the group's actual values
    assert(!grouped(0).isNullAt(1))
    val distinct = spark.sql(Registry.rewritePrestoSql(
      """SELECT DISTINCT zoned_timestamp(s) AS z FROM VALUES
        |    ('2020-06-10T15:30:00+05:30'),
        |    ('2020-06-10T12:00:00+02:00') AS t(s)""".stripMargin)).collect()
    assert(distinct.length == 1)
    // window PARTITION BY zoned: both same-instant rows share a partition
    val parts = spark.sql(Registry.rewritePrestoSql(
      """WITH z AS (SELECT id, zoned_timestamp(s) AS z FROM VALUES
        |    (1, '2020-06-10T15:30:00+05:30'),
        |    (2, '2020-06-10T12:00:00+02:00'),
        |    (3, '2020-12-31T23:45:00-03:30') AS t(id, s))
        |SELECT id, count(*) OVER (PARTITION BY z) AS np
        |FROM z ORDER BY id""".stripMargin)).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(parts.toSeq == Seq((1, 2L), (2, 2L), (3, 1L)))
    // DISTINCT inside an aggregate dedups by instant too (r8): two
    // same-instant rows in different zones are ONE distinct value
    // (TimestampWithTimeZoneType hashes packed millis only)
    val cd = spark.sql(Registry.rewritePrestoSql(
      """WITH z AS (SELECT id, zoned_timestamp(s) AS z FROM VALUES
        |    (1, '2020-06-10T15:30:00+05:30'),
        |    (2, '2020-06-10T12:00:00+02:00'),
        |    (3, '2020-12-31T23:45:00-03:30') AS t(id, s))
        |SELECT count(DISTINCT z) AS n FROM z""".stripMargin))
      .collect()(0).getLong(0)
    assert(cd == 2L)
  }
}

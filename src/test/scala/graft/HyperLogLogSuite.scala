package graft

import graft.functions.{HyperLogLog, Registry}

/** The real HLL estimator behind approx_set/merge/cardinality
  * (HyperLogLog.scala): error profile across magnitudes, sparse/dense
  * representations, canonical serialization, partition-independent
  * merges, and the SQL surface. */
class HyperLogLogSuite extends GraftSuite {

  private def build(n: Int, seed: Long = 0L): HyperLogLog.State = {
    val st = new HyperLogLog.State(HyperLogLog.DefaultP)
    var i = 0L
    while (i < n) {
      // xxhash-quality mixing of distinct longs (splitmix64 finalizer)
      var z = (i + seed) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      st.offer(z ^ (z >>> 31))
      i += 1
    }
    st
  }

  test("estimate error stays inside 3 standard errors across magnitudes") {
    // SE at p=12 is 1.04/sqrt(4096) = 1.625%; gate each magnitude at 3σ
    for (n <- Seq(100, 3000, 20000, 100000, 400000, 1000000)) {
      val est = build(n).cardinality
      val err = math.abs(est - n).toDouble / n
      assert(err <= 0.05, s"n=$n est=$est err=$err")
    }
  }

  test("small range uses linear counting and is near-exact") {
    // below 2.5m with empty registers: m*ln(m/V). Linear counting's SE
    // is ≈ sqrt(m(e^t − t − 1))/n at fill ratio t=n/m — sub-0.5% for
    // tiny n, ~1.3% at t≈0.5 — so gate at ~3σ per magnitude.
    for ((n, tol) <- Seq(10 -> 0.0, 500 -> 0.035, 2000 -> 0.04)) {
      val est = build(n).cardinality
      assert(math.abs(est - n).toDouble / math.max(n, 1) <= tol,
        s"n=$n est=$est")
    }
    assert(new HyperLogLog.State(12).cardinality == 0L)
  }

  test("merge of disjoint shards is byte-identical to the direct build") {
    val direct = build(300000)
    val parts = (0 until 8).map { s =>
      val st = new HyperLogLog.State(HyperLogLog.DefaultP)
      var i = s.toLong
      while (i < 300000) {
        var z = i + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        st.offer(z ^ (z >>> 31))
        i += 8
      }
      st
    }
    val merged = new HyperLogLog.State(HyperLogLog.DefaultP)
    parts.foreach(merged.mergeWith)
    assert(java.util.Arrays.equals(merged.serialize(), direct.serialize()))
  }

  test("sparse and dense serializations round-trip and agree") {
    val small = build(200) // stays sparse
    val smallBytes = small.serialize()
    assert(HyperLogLog.isHll(smallBytes))
    assert(HyperLogLog.deserialize(smallBytes).cardinality == small.cardinality)
    val big = build(50000) // dense
    val bigBytes = big.serialize()
    assert(bigBytes.length == 4 + 1 + 1 + 4096) // dense layout
    assert(HyperLogLog.deserialize(bigBytes).cardinality == big.cardinality)
    // merging a sparse sketch into a dense one keeps every register
    val m = HyperLogLog.deserialize(bigBytes)
    m.mergeWith(HyperLogLog.deserialize(smallBytes))
    assert(m.cardinality >= big.cardinality)
  }

  test("SQL surface: approx_set/merge/cardinality on lineitem match exact") {
    Registry.install(spark)
    Tables.register(spark, SfDir)
    val rows = spark.sql(
      """WITH p AS (
        |  SELECT l_returnflag, l_linestatus, approx_set(l_partkey) AS hs
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (SELECT l_returnflag, merge(hs) AS hs FROM p GROUP BY 1),
        |d AS (SELECT l_returnflag, approx_set(l_partkey) AS hs,
        |             count(DISTINCT l_partkey) AS exact
        |      FROM lineitem GROUP BY 1)
        |SELECT d.l_returnflag, d.exact,
        |  cardinality(d.hs) AS est, m.hs = d.hs AS merged_same
        |FROM d JOIN m ON d.l_returnflag = m.l_returnflag""".stripMargin)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1)
      val est = r.getLong(2)
      // fixture cardinalities sit in the linear-counting regime: tight
      assert(math.abs(est - exact).toDouble / exact <= 0.02,
        s"${r.getString(0)}: exact=$exact est=$est")
      assert(r.getBoolean(3), "merged sketch differs from direct build")
    }
  }

  test("merge() dispatches across all five sketch families by content") {
    Registry.install(spark)
    Tables.register(spark, SfDir)
    // qdigest and tdigest partials re-aggregate through the SAME SQL
    // name the reference overloads; estimates stay near exact
    val row = spark.sql(
      """WITH p AS (
        |  SELECT l_returnflag,
        |    qdigest_agg(l_extendedprice, 0.01) AS dd,
        |    tdigest_agg(l_extendedprice) AS td,
        |    make_set_digest(l_suppkey) AS sd
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus),
        |m AS (SELECT l_returnflag, merge(dd) AS dd, merge(td) AS td,
        |             merge(sd) AS sd
        |      FROM p GROUP BY l_returnflag),
        |x AS (SELECT l_returnflag,
        |        percentile(l_extendedprice, 0.5d) AS p50,
        |        count(DISTINCT l_suppkey) AS supps
        |      FROM lineitem GROUP BY l_returnflag)
        |SELECT
        |  max(abs(value_at_quantile(m.dd, 0.5d) - x.p50) / x.p50) AS dd_err,
        |  max(abs(value_at_quantile(m.td, 0.5d) - x.p50) / x.p50) AS td_err,
        |  max(abs(cardinality(m.sd) - x.supps)) AS sd_err
        |FROM m JOIN x ON m.l_returnflag = x.l_returnflag""".stripMargin)
      .collect()(0)
    assert(row.getDouble(0) <= 0.02, s"qdigest merge err ${row.getDouble(0)}")
    assert(row.getDouble(1) <= 0.02, s"tdigest merge err ${row.getDouble(1)}")
    assert(row.getLong(2) == 0L) // KMV exact below saturation
  }

  test("merge_hll and empty_approx_set compose; mixed families fail loudly") {
    Registry.install(spark)
    val est = spark.sql(
      """SELECT cardinality(merge_hll(hs)) AS c FROM (
        |  SELECT approx_set(id) AS hs FROM range(1000) GROUP BY id % 4)
        |""".stripMargin).collect()(0).getLong(0)
    assert(math.abs(est - 1000) <= 20)
    assert(spark.sql("SELECT cardinality(empty_approx_set()) AS c")
      .collect()(0).getLong(0) == 0L)
    val err = intercept[Exception] {
      spark.sql(
        """SELECT merge(s) FROM (
          |  SELECT approx_set(id) AS s FROM range(10)
          |  UNION ALL
          |  SELECT make_set_digest(id) FROM range(10))""".stripMargin)
        .collect()
    }
    assert(err.getMessage.contains("cannot merge"),
      s"unexpected: ${err.getMessage}")
  }

  test("approx_distinct rides the real HLL: default p=11, 2-arg SE, bounds") {
    graft.functions.Registry.install(spark)
    spark.range(400000L).toDF("id").createOrReplaceTempView("graft_ad_ids")
    val r = spark.sql(
      """SELECT approx_distinct(id) AS a1,
        |  approx_distinct(id, 0.0115) AS a2,
        |  approx_distinct(id, 0.26) AS a3,
        |  approx_distinct(CAST(NULL AS BIGINT)) AS a0
        |FROM graft_ad_ids""".stripMargin).head()
    // default = the reference's 2.3% SE (2048 registers); gate at 3 SE
    assert(math.abs(r.getLong(0) - 400000L) <= (3 * 0.023 * 400000).toLong)
    assert(math.abs(r.getLong(1) - 400000L) <= (3 * 0.0115 * 400000).toLong)
    assert(math.abs(r.getLong(2) - 400000L) <= (3 * 0.26 * 400000).toLong)
    assert(r.getLong(3) == 0L) // all-null input estimates 0
    // out-of-range maxStandardError fails with the reference's text
    val err = intercept[Exception] {
      spark.sql("SELECT approx_distinct(id, 0.5) FROM graft_ad_ids").collect()
    }
    assert(err.getMessage.contains("Max standard error"),
      s"unexpected: ${err.getMessage}")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.sources.TpcdsGen

/** DSv2 contract of the graft-tpcds generator (sources/TpcdsGen.scala):
  * every table generates, key pushdown prunes generation (incl. the
  * non-trivial returns/inventory key inverses), referential slices
  * hold, and the catalog spelling resolves read-only. */
class TpcdsGenSuite extends GraftSuite {

  private def t(name: String, sf: String = "0.01") =
    spark.read.format("graft-tpcds")
      .option("table", name).option("sf", sf).load()

  test("all 24 tables generate with their declared schemas") {
    TpcdsGen.tables.foreach { name =>
      val df = t(name)
      val n = TpcdsGen.rowCount(name, 0.01)
      val take = df.limit(5).collect()
      assert(take.nonEmpty, s"$name generated no rows")
      assert(df.schema == TpcdsGen.schemaOf(name), name)
      // spot-check count on the small tables only (facts are large)
      if (n <= 100000) assert(df.count() == n, name)
    }
  }

  test("date_dim calendar fields agree with java.time") {
    val r = t("date_dim").filter(col("d_date_sk") === 2451545) // 2000-01-01
      .collect()(0)
    assert(r.getAs[java.sql.Date]("d_date").toString == "2000-01-01")
    assert(r.getAs[Int]("d_year") == 2000)
    assert(r.getAs[Int]("d_moy") == 1)
    assert(r.getAs[Int]("d_dom") == 1)
    assert(r.getAs[String]("d_day_name") == "Saturday")
  }

  test("key pushdown prunes generation incl. returns and inventory inverses") {
    // cd: 1.92M-row cross product; a key bound generates 1400 rows
    val cd = t("customer_demographics").filter(col("cd_demo_sk") <= 1400)
    assert(cd.count() == 1400L)
    // returns: key = parent ticket of sampled row 10k
    val sr = t("store_returns").filter(col("sr_ticket_number") <= 100)
    val srAll = sr.collect()
    assert(srAll.nonEmpty)
    assert(srAll.forall(_.getAs[Long]("sr_ticket_number") <= 100L))
    // pruned plan generates fewer rows than the full table
    assert(srAll.length < TpcdsGen.rowCount("store_returns", 0.01))
    // inventory: key = week-start date_sk
    val inv = t("inventory").filter(col("inv_date_sk") === 2450815L)
    val dates = inv.select(countDistinct(col("inv_date_sk"))).collect()(0)
    assert(dates.getLong(0) == 1L)
    assert(inv.count() ==
      TpcdsGen.rowCount("item", 0.01) * TpcdsGen.rowCount("warehouse", 0.01))
  }

  test("demographics cross products enumerate without collision") {
    val cd = t("customer_demographics").filter(col("cd_demo_sk") <= 2800)
    assert(cd.select(col("cd_gender"), col("cd_marital_status"),
      col("cd_education_status"), col("cd_purchase_estimate"),
      col("cd_credit_rating")).distinct().count() == 2800L)
    val hd = t("household_demographics")
    assert(hd.count() == 7200L)
    assert(hd.select(col("hd_income_band_sk"), col("hd_buy_potential"),
      col("hd_dep_count"), col("hd_vehicle_count")).distinct()
      .count() == 7200L)
  }

  test("fact foreign keys land inside their dimension key spaces") {
    val ss = t("store_sales").limit(4000)
    val nItem = TpcdsGen.rowCount("item", 0.01)
    val nStore = TpcdsGen.rowCount("store", 0.01)
    val bad = ss.filter(col("ss_item_sk") < 1 ||
      col("ss_item_sk") > nItem ||
      col("ss_store_sk") < 1 || col("ss_store_sk") > nStore ||
      col("ss_sold_date_sk") < 2450815L ||
      col("ss_sold_date_sk") > 2450815L + 1825L)
    assert(bad.count() == 0L)
  }

  test("catalog spelling resolves, lists 24 tables, stays read-only") {
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft_tpcds.tiny.income_band")
      .collect()(0).getLong(0) == 20L)
    val tbls = spark.sql("SHOW TABLES IN graft_tpcds.tiny")
      .collect().map(_.getString(1)).toSet
    assert(tbls.size == 24 && tbls.contains("store_sales"), tbls.toString)
    val e = intercept[Exception] {
      spark.sql("DROP TABLE graft_tpcds.tiny.store_sales")
    }
    assert(e.getMessage.contains("read-only"), e.getMessage)
  }
}

package graft

import graft.functions.Registry

/** Presto-name SQL resolution through the expression-template registry,
  * including the builtin-shadowing compatibility rules (Spark 4 resolves
  * Column-API builtin names through the same session registry). */
class RegistrySuite extends GraftSuite {

  import spark.implicits._

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    Registry.install(spark)
  }

  private def sql1[T](q: String): T =
    spark.sql(s"SELECT $q AS r").collect()(0).getAs[T]("r")

  test("string functions resolve under Presto names") {
    assert(sql1[Boolean]("regexp_like('lineitem', '^line')"))
    assert(sql1[String]("format('%s-%03d', 'x', 7)") == "x-007")
    assert(spark.sql("SELECT split_to_map('a=1,b=2', ',', '=') AS r")
      .selectExpr("r['b']").collect()(0).getString(0) == "2")
    assert(sql1[Int]("strpos('hello world', 'world')") == 7)
    assert(sql1[Int]("strpos('hello', 'xyz')") == 0)
    assert(sql1[Int]("codepoint('A')") == 65)
    assert(sql1[Int]("levenshtein_distance('kitten', 'sitting')") == 3)
    assert(sql1[Boolean]("starts_with('presto', 'pre')"))
  }

  test("math and bitwise functions") {
    assert(sql1[Long]("from_base('ff', 16)") == 255L)
    assert(sql1[String]("to_base(255, 16)") == "ff")
    assert(sql1[Double]("truncate(-3.7)") == -3.0)
    assert(sql1[Boolean]("is_finite(1.0)"))
    assert(!sql1[Boolean]("is_finite(infinity())"))
    assert(sql1[Boolean]("is_nan(nan())"))
    assert(sql1[Long]("bitwise_xor(5, 9)") == 12L)
    assert(sql1[Long]("bitwise_left_shift(3, 4)") == 48L)
  }

  test("timestampadd/timestampdiff cover Presto date_add/date_diff") {
    // date_add/date_diff themselves are grammar-reserved in Spark (unit
    // validated pre-resolution) — the supported spelling:
    assert(sql1[java.sql.Timestamp](
      "timestampadd(DAY, 10, TIMESTAMP '2024-03-05 00:00:00')")
      == java.sql.Timestamp.valueOf("2024-03-15 00:00:00"))
    assert(sql1[Long](
      "timestampdiff(HOUR, TIMESTAMP '2024-03-05 00:00:00', TIMESTAMP '2024-03-06 12:00:00')")
      == 36L)
  }

  test("datetime: ISO numbering and MySQL patterns") {
    // 2024-03-05 is a Tuesday: ISO dow = 2 (Spark dayofweek would say 3)
    assert(sql1[Int]("day_of_week(DATE '2024-03-05')") == 2)
    assert(sql1[Int]("day_of_year(DATE '2024-03-05')") == 65)
    assert(sql1[String]("date_format(TIMESTAMP '2024-03-05 10:30:00', '%d/%m/%Y')")
      == "05/03/2024")
    assert(sql1[java.sql.Timestamp]("date_parse('2024-03-05', '%Y-%m-%d')")
      == java.sql.Timestamp.valueOf("2024-03-05 00:00:00"))
    // literal letters in the pattern get java.time single-quoting — the
    // builder must escape them for the SQL string (ISO 'T' form)
    assert(sql1[java.sql.Timestamp](
      "date_parse('2024-03-05T10:30:00', '%Y-%m-%dT%H:%i:%s')")
      == java.sql.Timestamp.valueOf("2024-03-05 10:30:00"))
  }

  test("date_format keeps working with java patterns after install") {
    // the shadowed builtin must still accept java.time patterns (no '%')
    assert(sql1[String]("date_format(TIMESTAMP '2024-03-05 10:30:00', 'yyyy-MM')")
      == "2024-03")
    import org.apache.spark.sql.functions._
    val viaColumnApi = Seq(java.sql.Timestamp.valueOf("2024-03-05 10:30:00"))
      .toDF("ts").select(date_format(col("ts"), "yyyy-MM-dd").as("s"))
      .as[String].collect()(0)
    assert(viaColumnApi == "2024-03-05")
  }

  test("vector functions are the native codegen expressions") {
    assert(math.abs(sql1[Double](
      "cosine_similarity(array(1.0, 0.0), array(1.0, 0.0))") - 1.0) < 1e-12)
    assert(sql1[Double]("dot_product(array(1.0, 2.0), array(3.0, 4.0))") == 11.0)
    val plan = spark.sql(
      "SELECT cosine_similarity(array(1.0), array(1.0))")
      .queryExecution.analyzed.toString
    assert(plan.contains("vec_cosine"))
  }

  test("aggregates and url functions") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    df.createOrReplaceTempView("t_reg")
    val r = spark.sql(
      """SELECT approx_distinct(x) AS ad, arbitrary(x) AS arb,
        |approx_percentile(x, 0.5) AS ap FROM t_reg""".stripMargin).collect()(0)
    assert(r.getAs[Long]("ad") == 4L)
    assert(Set(1.0, 2.0, 3.0, 4.0).contains(r.getAs[Double]("arb")))
    assert(sql1[String](
      "url_extract_host('https://spark.apache.org/docs/latest?q=1')")
      == "spark.apache.org")
    assert(sql1[String](
      "url_extract_parameter('https://x.org/p?a=1&b=2', 'b')") == "2")
  }
}

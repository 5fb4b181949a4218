package graft

import org.apache.spark.sql.functions._

import graft.functions.{LinearModel, Registry}

/** Behavioral tests for the presto-ml pack: OLS regressor (exact on a
  * rationally-solvable fixture, multi-feature), nearest-centroid
  * classifier, merge-vs-bulk identity (partial aggregation must be
  * lossless), and the evaluate report format. */
class LinearModelSuite extends GraftSuite {

  import spark.implicits._

  test("learn_regressor recovers an exact planted linear model") {
    // y = 3x1 - 2x2 + 5, noise-free: OLS must recover it exactly
    // (the normal equations are consistent; solve error ~ machine eps)
    val rows = for (x1 <- 0 to 9; x2 <- 0 to 9)
      yield (x1.toDouble, x2.toDouble, 3.0 * x1 - 2.0 * x2 + 5.0)
    val df = rows.toDF("x1", "x2", "y")
    val model = df.agg(LinearModel.learnRegressor(col("y"),
      map(lit(0L), col("x1"), lit(1L), col("x2"))).as("m"))
    val pred = df.limit(1).crossJoin(model)
      .select(LinearModel.regress(
        map(lit(0L), lit(7.0), lit(1L), lit(11.0)), col("m")))
      .as[Double].head()
    assert(math.abs(pred - (3.0 * 7 - 2.0 * 11 + 5)) < 1e-9)
  }

  test("regressor merge-vs-bulk identity: partial aggregation is lossless") {
    val rows = (1 to 400).map(i =>
      ((i % 13).toDouble, (i % 7).toDouble, (i % 13) * 2.5 - (i % 7) * 1.5 + (i % 3)))
    val st1 = new LinearModel.RegressState
    rows.foreach { case (a, b, y) => st1.add(Array((0, a), (1, b)), y) }
    val st2a = new LinearModel.RegressState
    val st2b = new LinearModel.RegressState
    rows.zipWithIndex.foreach { case ((a, b, y), i) =>
      (if (i % 2 == 0) st2a else st2b).add(Array((0, a), (1, b)), y)
    }
    st2a.mergeWith(st2b)
    // merged sums differ from bulk sums only by FP addition order
    assert(st1.solve().zip(st2a.solve()).forall {
      case (x, y) => math.abs(x - y) < 1e-6
    })
  }

  test("regressor state grows dimension across merge (sparse features)") {
    val a = new LinearModel.RegressState
    a.add(Array((0, 1.0)), 2.0) // d=1
    val b = new LinearModel.RegressState
    b.add(Array((0, 2.0), (2, 1.0)), 7.0) // d=3
    a.mergeWith(b)
    val w = a.solve()
    assert(w.length == 4) // 3 features + intercept
  }

  test("classify returns the nearest centroid, ties toward smaller label") {
    val train = Seq(
      (0L, 0.0, 0.0), (0L, 1.0, 1.0),
      (1L, 10.0, 10.0), (1L, 11.0, 11.0)).toDF("lbl", "f1", "f2")
    val model = train.agg(LinearModel.learnClassifier(col("lbl"),
      map(lit(0L), col("f1"), lit(1L), col("f2"))).as("m"))
    val probe = Seq((0.2, 0.3), (9.0, 12.0), (5.25, 5.25)).toDF("f1", "f2")
    val got = probe.crossJoin(model)
      .select(LinearModel.classify(
        map(lit(0L), col("f1"), lit(1L), col("f2")), col("m")))
      .as[Long].collect().toSeq
    // (5.25, 5.25) is equidistant from centroids (0.5,0.5) and
    // (10.5,10.5)? no — midpoint is 5.5; 5.25 is nearer the 0-centroid
    assert(got == Seq(0L, 1L, 0L))
  }

  test("evaluate_classifier_predictions formats the reference report") {
    val df = Seq((1L, 1L), (1L, 1L), (1L, 0L), (0L, 0L)).toDF("t", "p")
    val report = df.agg(LinearModel.evaluatePredictions(col("t"), col("p")))
      .as[String].head()
    assert(report ==
      "Accuracy: 3/4 (75.00%)\n" +
        "Class '0'\nPrecision: 1/2 (50.00%)\nRecall: 1/1 (100.00%)\n" +
        "Class '1'\nPrecision: 2/2 (100.00%)\nRecall: 2/3 (66.67%)\n")
  }

  test("learn_regressor plans as partial+final aggregation (map-side combine)") {
    Registry.install(spark)
    graft.Tables.register(spark, SfDir)
    val df = spark.sql(
      """SELECT l_returnflag,
        |  learn_regressor(l_extendedprice, features(l_quantity)) AS m
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    val plan = df.queryExecution.executedPlan.treeString
    // TypedImperativeAggregate rides ObjectHashAggregate with a partial
    // stage below the exchange — the property that bounds shuffle bytes
    // to one Gram matrix per group per partition
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_learn_regressor") ||
      plan.toLowerCase.contains("partial"))
  }

  test("features() SQL builds the map encoding; learn_libsvm_* aliases run") {
    Registry.install(spark)
    val m = spark.sql(
      "SELECT features(1.5, 2.5) AS f").select(col("f"))
      .as[Map[Long, Double]].head()
    assert(m == Map(0L -> 1.5, 1L -> 2.5))
    val rows = spark.sql(
      """WITH t(x, y) AS (VALUES (1.0, 7.0), (2.0, 9.0), (3.0, 11.0))
        |SELECT round(regress(features(10.0),
        |  learn_libsvm_regressor(y, features(x), '-s 3')), 6) AS p
        |FROM t""".stripMargin).as[Double].head()
    assert(math.abs(rows - 25.0) < 1e-6) // y = 2x + 5 exactly
  }
}

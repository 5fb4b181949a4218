package graft

import org.apache.spark.sql.functions._

import graft.functions.{GeomAlgebra, LinearModel}

/** Dev probe: the round-6 associative-state aggregates at 10x input —
  * evidence that learn_regressor / learn_classifier / convex_hull_agg
  * run as ordinary partial+final aggregations whose cost is one scan
  * (state stays bounded: (d+1)² Gram doubles, #labels×d centroid sums,
  * the running hull), i.e. time grows ~linearly with rows and the
  * shuffled state does not grow at all. */
object ProbeMlScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val sf = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $name: $s%.2f s (result=$n)")
      s
    }

    val li0 = Tables.view(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
    val li10 = (0 until 10).map(k =>
      li0.select(col("l_returnflag"), (col("x") + lit(k * 1e-3)).as("x"),
        col("y"))).reduce(_ unionAll _)

    def ols(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("l_returnflag")
        .agg(LinearModel.learnRegressor(col("y"),
          map(lit(0L), col("x"))).as("m"))
        .count()
    ols(li0) // untimed prewarm: scan + codegen (the Bench.scala stance)
    val t1 = time("learn_regressor_600k")(ols(li0))
    val t10 = time("learn_regressor_6m")(ols(li10))

    def centroids(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(LinearModel.learnClassifier(
        (col("x") % 5).cast("long"),
        map(lit(0L), col("x"), lit(1L), col("y"))).as("m")).count()
    time("learn_classifier_600k")(centroids(li0))
    time("learn_classifier_6m")(centroids(li10))

    def hull(df: org.apache.spark.sql.DataFrame): Long =
      df.select(struct(col("x"), col("y")).as("p"))
        .agg(GeomAlgebra.convexHullAgg(col("p")).as("h"))
        .selectExpr("size(h) AS n").collect()(0).getInt(0).toLong
    time("convex_hull_agg_600k")(hull(li0))
    time("convex_hull_agg_6m")(hull(li10))

    val growth = t10 / t1
    val verdict = if (growth <= 15.0) "PASS" else "FAIL"
    println(f"[scale] learn_regressor time at 10x rows: $growth%.1fx " +
      f"(linear = 10x, bound 15x) -> $verdict")
    spark.stop()
  }
}

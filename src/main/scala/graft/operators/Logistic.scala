package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Logistic-regression training by batch gradient descent — the
  * convex-optimization sibling of the ML pack's closed-form OLS
  * (`functions/LinearModel.learnRegressor`) and nearest-centroid
  * classifier, and the classical quality-classifier recipe of the
  * data-curation literature (a linear model over cheap text features).
  *
  * Each iteration is ONE mergeable aggregate pass: the gradient of the
  * log-loss, `avg((sigmoid(w·x) − y) · xⱼ)` per dimension, computed as
  * d parallel `avg` aggregates (map-side partial, one exchange). The
  * driver holds only the d-dim weight vector between passes — the
  * standard distributed-GD shape; T iterations cost T scans, nothing
  * accumulates driver-side. Deterministic by construction: w₀ = 0,
  * fixed learning rate and iteration count, no RNG — so a DuckDB
  * oracle replays training as chained CTEs (one gradient CTE + one
  * weight CTE per iteration) and the gate pins rounded weights.
  */
object Logistic {

  /** w·x in a FIXED left-fold order (the oracle replays it verbatim). */
  def score(xCols: Seq[Column], w: Array[Double]): Column =
    xCols.zip(w).map { case (c, wi) => c * lit(wi) }.reduce(_ + _)

  private def sigmoid(s: Column): Column = lit(1.0) / (lit(1.0) + exp(-s))

  /** One gradient pass: ∇ = avg((σ(w·x) − y)·xⱼ) for each j. */
  def gradient(df: DataFrame, xCols: Seq[Column], yCol: Column,
      w: Array[Double]): Array[Double] = {
    val err = sigmoid(score(xCols, w)) - yCol
    val row: Row = df.agg(
      avg(err * xCols.head), xCols.tail.map(c => avg(err * c)): _*).head()
    Array.tabulate(w.length)(row.getDouble)
  }

  /** Mean log-loss under weights w (used for the convergence gate). */
  def logLoss(df: DataFrame, xCols: Seq[Column], yCol: Column,
      w: Array[Double]): Double = {
    val p = sigmoid(score(xCols, w))
    // clamp away from 0/1 so the loss stays finite on confident rows
    val pc = greatest(least(p, lit(1 - 1e-12)), lit(1e-12))
    df.agg(avg(-(yCol * log(pc) + (lit(1.0) - yCol) * log(lit(1.0) - pc))))
      .head().getDouble(0)
  }

  /** T iterations of batch GD from w₀ = 0. */
  def train(df: DataFrame, xCols: Seq[Column], yCol: Column,
      lr: Double, iters: Int): Array[Double] = {
    var w = Array.fill(xCols.length)(0.0)
    var i = 0
    while (i < iters) {
      val g = gradient(df, xCols, yCol, w)
      w = w.zip(g).map { case (wi, gi) => wi - lr * gi }
      i += 1
    }
    w
  }
}

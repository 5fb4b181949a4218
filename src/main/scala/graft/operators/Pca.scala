package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{VectorExpressions, VectorMoments}

/** Distributed PCA over an embedding column — the dimensionality-reduction
  * step a training-data pipeline runs before ANN indexing / clustering
  * (compacting d-dim vectors to their top-k principal components).
  *
  * Reference framing: presto-ml's model functions learn from one
  * aggregation pass (`LearnAggregations`); PCA follows the same shape —
  * the SUFFICIENT STATISTICS (count, per-dim sums, upper-triangular
  * second moments) are associative, so training is ONE mergeable
  * aggregate scan (functions/VectorMoments, O(d²) = 16 KB state at
  * d=64) and only the d×d covariance ever reaches the driver. The
  * eigensolve is classical cyclic Jacobi (public textbook algorithm,
  * Golub & Van Loan §8.4) on that driver-side matrix: deterministic
  * (fixed sweep order, fixed convergence threshold, no RNG), O(d³) on
  * 64×64 — microseconds, scale-independent. Projection broadcasts the
  * k×d component matrix as literals and rides the codegen'd vec_dot
  * expression: one map-only scan, no shuffle.
  *
  * Determinism for the differential gate: eigenpairs sort by
  * (eigenvalue desc, then first-differing component), and each
  * component's sign is canonicalized so its largest-|.| coordinate is
  * positive — the eigenvector sign ambiguity never reaches the output.
  */
object Pca {

  final case class Model(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]])

  /** One aggregate pass + driver-side Jacobi. `k` = components kept. */
  def fit(df: DataFrame, vecCol: Column, k: Int): Model = {
    val row = df.agg(VectorMoments.agg(vecCol).as("m")).head()
    require(!row.isNullAt(0), "pca: empty input")
    val flat = row.getSeq[Double](0).toArray
    val n = flat(0)
    require(n >= 2, s"pca: needs >= 2 rows, got $n")
    // reconstruct d from the layout length: 1 + d + d(d+1)/2
    val d = ((math.sqrt(9 + 8.0 * (flat.length - 1)) - 3) / 2).round.toInt
    require(1 + d + d * (d + 1) / 2 == flat.length, "pca: bad moments layout")
    require(k >= 1 && k <= d, s"pca: k=$k out of range for d=$d")
    val mean = Array.tabulate(d)(i => flat(1 + i) / n)
    // covariance (population): C = SS/n - mean meanᵀ
    val c = Array.ofDim[Double](d, d)
    var idx = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = flat(idx) / n - mean(i) * mean(j)
        c(i)(j) = v; c(j)(i) = v
        idx += 1; j += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigen(c)
    // order by eigenvalue desc (index tiebreak is already deterministic),
    // canonicalize each vector's sign
    val order = vals.indices.sortBy(i => (-vals(i), i)).take(k)
    val comps = order.map { oi =>
      val v = Array.tabulate(d)(r => vecs(r)(oi))
      var m = 0
      var mi = 0
      while (mi < d) { if (math.abs(v(mi)) > math.abs(v(m))) m = mi; mi += 1 }
      if (v(m) < 0) { var t = 0; while (t < d) { v(t) = -v(t); t += 1 } }
      v
    }.toArray
    Model(mean, order.map(vals).toArray, comps)
  }

  /** Append `pc1..pck` projection columns: (x − μ)·vᵢ via the codegen'd
    * dot product against broadcast literal component vectors. */
  def project(df: DataFrame, vecCol: Column, model: Model): DataFrame = {
    val x = Similarity.toDouble(vecCol)
    model.components.zipWithIndex.foldLeft(df) { case (acc, (comp, i)) =>
      val compLit = ColumnBridge.toCol(
        Literal.create(comp, ArrayType(DoubleType, containsNull = false)))
      val meanDot = comp.indices.map(j => comp(j) * model.mean(j)).sum
      acc.withColumn(s"pc${i + 1}",
        VectorExpressions.dot(x, compLit) - lit(meanDot))
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: rotations
    * sweep the strict upper triangle in row-major order until the
    * off-diagonal Frobenius mass falls below 1e-12 (≤ 64 sweeps — far
    * more than the ~10 a 64×64 matrix needs). Returns (eigenvalues,
    * column-eigenvector matrix). */
  private[graft] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case tt if tt == 0.0 => 1.0 // theta == 0 -> 45 degrees
                case tt => tt
              }
            val cos = 1.0 / math.sqrt(t * t + 1.0)
            val sin = t * cos
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = cos * arp - sin * arq
              a(r)(q) = sin * arp + cos * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = cos * apr - sin * aqr
              a(q)(r) = sin * apr + cos * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = cos * vrp - sin * vrq
              v(r)(q) = sin * vrp + cos * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    require(off <= 1e-9,
      s"pca: Jacobi did not converge (off-diagonal mass $off)")
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}

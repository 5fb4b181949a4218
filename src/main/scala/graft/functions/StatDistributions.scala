package graft.functions

import org.apache.commons.math3.distribution.BetaDistribution
import org.apache.commons.math3.special.Erf

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Statistical distribution scalars (reference `presto-main/.../scalar/
  * MathFunctions.java:608-660`): normal_cdf / inverse_normal_cdf /
  * beta_cdf / inverse_beta_cdf. The reference delegates to
  * commons-math3 (`Erf.erf`, `BetaDistribution`) — the SAME library Spark
  * ships in its jars — so these produce bit-identical doubles to the
  * reference, argument checks included. Per-row scalar math,
  * CodegenFallback is a virtual call around a transcendental — not a
  * hot-path concern.
  */
private[functions] trait StatTernary extends TernaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    Seq(first, second, third).find(_.dataType != DoubleType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects double arguments, got ${c.dataType.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
}

/** normal_cdf(mean, sd, value) — MathFunctions.java:624. */
case class NormalCdf(first: Expression, second: Expression, third: Expression)
    extends StatTernary {
  override def prettyName: String = "normal_cdf"
  override def nullSafeEval(m: Any, sd: Any, v: Any): Any = {
    val s = sd.asInstanceOf[Double]
    require(s > 0, "standardDeviation must be > 0")
    0.5 * (1 + Erf.erf((v.asInstanceOf[Double] - m.asInstanceOf[Double]) /
      (s * math.sqrt(2))))
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** inverse_normal_cdf(mean, sd, p) — MathFunctions.java:613. */
case class InverseNormalCdf(first: Expression, second: Expression,
    third: Expression) extends StatTernary {
  override def prettyName: String = "inverse_normal_cdf"
  override def nullSafeEval(m: Any, sd: Any, p: Any): Any = {
    val pp = p.asInstanceOf[Double]
    val s = sd.asInstanceOf[Double]
    require(pp > 0 && pp < 1, "p must be 0 > p > 1")
    require(s > 0, "sd must be > 0")
    m.asInstanceOf[Double] + s * 1.4142135623730951 * Erf.erfInv(2 * pp - 1)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** beta_cdf(a, b, value) — MathFunctions.java:651. */
case class BetaCdf(first: Expression, second: Expression, third: Expression)
    extends StatTernary {
  override def prettyName: String = "beta_cdf"
  override def nullSafeEval(a: Any, b: Any, v: Any): Any = {
    val (aa, bb, vv) = (a.asInstanceOf[Double], b.asInstanceOf[Double],
      v.asInstanceOf[Double])
    require(vv >= 0 && vv <= 1, "value must be in the interval [0, 1]")
    require(aa > 0, "a must be > 0")
    require(bb > 0, "b must be > 0")
    new BetaDistribution(null, aa, bb,
      BetaDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .cumulativeProbability(vv)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** inverse_beta_cdf(a, b, p) — MathFunctions.java:636. */
case class InverseBetaCdf(first: Expression, second: Expression,
    third: Expression) extends StatTernary {
  override def prettyName: String = "inverse_beta_cdf"
  override def nullSafeEval(a: Any, b: Any, p: Any): Any = {
    val (aa, bb, pp) = (a.asInstanceOf[Double], b.asInstanceOf[Double],
      p.asInstanceOf[Double])
    require(pp >= 0 && pp <= 1, "p must be in the interval [0, 1]")
    require(aa > 0, "a must be > 0")
    require(bb > 0, "b must be > 0")
    new BetaDistribution(null, aa, bb,
      BetaDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .inverseCumulativeProbability(pp)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

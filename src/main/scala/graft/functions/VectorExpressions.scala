package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd vector math over `array<double>` columns.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`/`transform`) are
  * `CodegenFallback` — every element evaluation is interpreted with boxing
  * through `NamedLambdaVariable`. For the similarity hot paths (cosine
  * verification over hundreds of thousands of candidate pairs) that is the
  * dominant cost, so these are proper Catalyst expressions with
  * `doGenCode`: one fused multiply-accumulate loop per pair, inside
  * whole-stage codegen. This mirrors the reference's approach of compiling
  * `cosine_similarity` to a tight primitive loop
  * (`presto-main/.../scalar/MathFunctions.java`).
  *
  * Null/length semantics: null input → null; arrays are consumed up to the
  * shorter length (callers pass fixed-dims embeddings); null elements are
  * treated as 0 (fixture embeddings contain none).
  */
abstract class VectorFoldExpression extends BinaryExpression {

  // The Column constructors below insert casts, but validate anyway:
  // a direct constructor call with array<float> would otherwise read
  // 4-byte floats as doubles and return garbage without erroring.
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double> inputs, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = DoubleType

  /** Scala body: fold over the two arrays. */
  protected def fold(a: ArrayData, b: ArrayData): Double

  /** Java statements: read arrays `a`, `b`, assign the result variable.
    * All locals must come from `ctx.freshName` — the code is inlined into
    * a shared codegen scope where fixed names would collide. */
  protected def genLoop(ctx: CodegenContext, a: String, b: String,
                        result: String): String

  override def nullSafeEval(left: Any, right: Any): Any =
    fold(left.asInstanceOf[ArrayData], right.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => genLoop(ctx, a, b, ev.value.code))
}

/** dot(a, b) = Σ a_i * b_i — fused codegen loop. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "vec_dot"

  override protected def fold(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def genLoop(ctx: CodegenContext, a: String, b: String,
                                 result: String): String = {
    val (n, acc, i) = (ctx.freshName("n"), ctx.freshName("acc"), ctx.freshName("i"))
    s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $acc += $a.getDouble($i) * $b.getDouble($i);
       |}
       |$result = $acc;
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot / (|a| |b|) — single fused pass over both arrays
  * (the three dot products share one loop). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "vec_cosine"

  override protected def fold(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def genLoop(ctx: CodegenContext, a: String, b: String,
                                 result: String): String = {
    val (n, i) = (ctx.freshName("n"), ctx.freshName("i"))
    val (dot, na, nb) =
      (ctx.freshName("dot"), ctx.freshName("na"), ctx.freshName("nb"))
    val (x, y) = (ctx.freshName("x"), ctx.freshName("y"))
    s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $x = $a.getDouble($i);
       |  double $y = $b.getDouble($i);
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |$result = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** l2(a, b) = sqrt(Σ (a_i - b_i)²) — fused codegen loop. */
case class L2Distance(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "vec_l2"

  override protected def fold(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def genLoop(ctx: CodegenContext, a: String, b: String,
                                 result: String): String = {
    val (n, acc, i, d) = (ctx.freshName("n"), ctx.freshName("acc"),
      ctx.freshName("i"), ctx.freshName("d"))
    s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $d = $a.getDouble($i) - $b.getDouble($i);
       |  $acc += $d * $d;
       |}
       |$result = java.lang.Math.sqrt($acc);
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import ColumnBridge.{toCol, toExpr}

  // Cast to array<double> at construction: float embeddings keep working
  // through the Column API (no-op when already double).
  private def d(c: Column): Expression =
    Cast(toExpr(c), ArrayType(DoubleType))

  def dot(a: Column, b: Column): Column = toCol(DotProduct(d(a), d(b)))
  def cosine(a: Column, b: Column): Column =
    toCol(CosineSimilarity(d(a), d(b)))
  def l2(a: Column, b: Column): Column = toCol(L2Distance(d(a), d(b)))
}

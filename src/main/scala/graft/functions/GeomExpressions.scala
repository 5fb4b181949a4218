package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, StructType}

/** `st_intersects(a, b)` / `st_disjoint(a, b)` over this pack's
  * `array<struct<x,y>>` linestrings (presto-geospatial GeoFunctions
  * ST_Intersects/ST_Disjoint, restricted to the point/linestring subset —
  * polygon interiors stay with st_contains' ray casting).
  *
  * Predicate: any segment pair shares a point — the classic orientation
  * (cross-product sign) test plus collinear on-segment checks, endpoints
  * inclusive, so touching and collinear-overlapping lines intersect. A
  * single-point array acts as the degenerate segment (p, p). All
  * arithmetic is products/differences of the input doubles — exact for
  * the fixture's small-decimal coordinates and bit-reproducible in the
  * DuckDB oracle replay.
  *
  * O(n·m) pairwise — geometry scalar work over per-row vertex arrays,
  * same stance as the st_area/st_length folds (not a hot aggregate
  * path). CodegenFallback: called once per row pair on small arrays.
  */
case class SegmentsIntersect(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "st_intersects"
  override def dataType: DataType = BooleanType

  private def isPointArray(dt: DataType): Boolean = dt match {
    case ArrayType(st: StructType, _) =>
      st.fields.length == 2 &&
        st.fields.forall(_.dataType == DoubleType) &&
        st.fieldNames.toSet == Set("x", "y")
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isPointArray(left.dataType) && isPointArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<struct<x:double,y:double>> " +
        s"linestrings, got (${left.dataType.catalogString}, " +
        s"${right.dataType.catalogString})")

  private def xIdx(e: Expression): Int =
    e.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].fieldIndex("x")

  @transient private lazy val (lx, rx) = (xIdx(left), xIdx(right))

  private def pts(v: Any, xi: Int): Array[Double] = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Double](2 * n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      out(2 * i) = row.getDouble(xi)
      out(2 * i + 1) = row.getDouble(1 - xi)
      i += 1
    }
    out
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val pa = pts(a, lx)
    val pb = pts(b, rx)
    if (pa.isEmpty || pb.isEmpty) return false
    val na = math.max(1, pa.length / 2 - 1)
    val nb = math.max(1, pb.length / 2 - 1)
    var i = 0
    while (i < na) {
      val (ax1, ay1) = (pa(2 * i), pa(2 * i + 1))
      val j2 = math.min(i + 1, pa.length / 2 - 1)
      val (ax2, ay2) = (pa(2 * j2), pa(2 * j2 + 1))
      var j = 0
      while (j < nb) {
        val (bx1, by1) = (pb(2 * j), pb(2 * j + 1))
        val k2 = math.min(j + 1, pb.length / 2 - 1)
        val (bx2, by2) = (pb(2 * k2), pb(2 * k2 + 1))
        if (SegmentsIntersect.segs(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2))
          return true
        j += 1
      }
      i += 1
    }
    false
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SegmentsIntersect {

  @inline private def cross(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Double =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  @inline private def onSeg(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Boolean =
    math.min(ax, bx) <= cx && cx <= math.max(ax, bx) &&
      math.min(ay, by) <= cy && cy <= math.max(ay, by)

  /** Segment (a1,a2) intersects segment (b1,b2), endpoints inclusive. */
  private[functions] def segs(a1x: Double, a1y: Double, a2x: Double,
      a2y: Double, b1x: Double, b1y: Double, b2x: Double,
      b2y: Double): Boolean = {
    val d1 = cross(b1x, b1y, b2x, b2y, a1x, a1y)
    val d2 = cross(b1x, b1y, b2x, b2y, a2x, a2y)
    val d3 = cross(a1x, a1y, a2x, a2y, b1x, b1y)
    val d4 = cross(a1x, a1y, a2x, a2y, b2x, b2y)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) true
    else if (d1 == 0 && onSeg(b1x, b1y, b2x, b2y, a1x, a1y)) true
    else if (d2 == 0 && onSeg(b1x, b1y, b2x, b2y, a2x, a2y)) true
    else if (d3 == 0 && onSeg(a1x, a1y, a2x, a2y, b1x, b1y)) true
    else if (d4 == 0 && onSeg(a1x, a1y, a2x, a2y, b2x, b2y)) true
    else false
  }
}

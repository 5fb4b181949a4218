package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Exact weighted percentile — the execution engine behind Presto's
  * 3-arg weighted `approx_percentile(x, w, p)` spelling
  * (`presto-main/.../aggregation/ApproximateWeightedPercentileAggregations
  * .java`; exact results trivially satisfy the approximate contract).
  *
  * Why not Spark's own `percentile(x, p, frequency)`: its state is a
  * boxed `OpenHashMap[AnyRef, Long]` keyed by value — at lineitem price
  * cardinality every partial holds a 100k+-entry boxed map that is
  * hashed per row, serialized whole, and merged entry-by-entry; three
  * percentile calls over sf0.1 lineitem measured 5.9 s. This aggregate
  * keeps FLAT primitive arrays (value, weight) instead: update is an
  * append, merge is an arraycopy, and one dual-array quicksort at eval
  * resolves the quantile — same exact semantics (verified against
  * Spark's percentile in FunctionsSuite), ~10x less state overhead.
  *
  * Scale: state size is O(rows in the group) either way for an EXACT
  * percentile (values can't be compressed without losing exactness);
  * at 100 TB swap in the mergeable t-digest ([[TDigestAgg]] takes a
  * weight) and tolerance-gate the result — the in-code stance since r3.
  */
object WeightedPercentile {

  /** Append-only paired buffer; merge concatenates. */
  final class State(var values: Array[Double], var weights: Array[Long],
      var size: Int) {
    def this() = this(new Array[Double](16), new Array[Long](16), 0)

    private def grow(need: Int): Unit = {
      if (need > values.length) {
        val cap = math.max(need, values.length * 2)
        values = java.util.Arrays.copyOf(values, cap)
        weights = java.util.Arrays.copyOf(weights, cap)
      }
    }

    def add(v: Double, w: Long): Unit = {
      require(w >= 0, s"approx_percentile: negative weight $w")
      if (w > 0) {
        grow(size + 1)
        values(size) = v
        weights(size) = w
        size += 1
      }
    }

    def mergeWith(o: State): Unit = {
      grow(size + o.size)
      System.arraycopy(o.values, 0, values, size, o.size)
      System.arraycopy(o.weights, 0, weights, size, o.size)
      size += o.size
    }

    /** In-place dual-array quicksort by value (weights ride along) —
      * avoids boxing 1M-element index arrays at eval. Ordering is
      * java.lang.Double.compare's total order (NaN greatest, -0.0 <
      * 0.0) — the same order Spark's percentile(x, p, frequency) sorts
      * by, so NaN-bearing columns keep the exact-equivalence contract
      * (ADVICE r6; < / > both report false against a NaN pivot, which
      * previously let NaNs land anywhere). */
    private def sortPairs(lo0: Int, hi0: Int): Unit = {
      def cmp(a: Double, b: Double): Int = java.lang.Double.compare(a, b)
      var stack = List((lo0, hi0))
      while (stack.nonEmpty) {
        val (lo, hi) = stack.head
        stack = stack.tail
        if (lo < hi) {
          // median-of-three pivot guards the sorted-input worst case
          val mid = lo + (hi - lo) / 2
          val pivot = {
            val a = values(lo); val b = values(mid); val c = values(hi)
            if (cmp(a, b) <= 0) {
              if (cmp(b, c) <= 0) b else if (cmp(a, c) <= 0) c else a
            } else {
              if (cmp(a, c) <= 0) a else if (cmp(b, c) <= 0) c else b
            }
          }
          var i = lo
          var j = hi
          while (i <= j) {
            while (cmp(values(i), pivot) < 0) i += 1
            while (cmp(values(j), pivot) > 0) j -= 1
            if (i <= j) {
              val tv = values(i); values(i) = values(j); values(j) = tv
              val tw = weights(i); weights(i) = weights(j); weights(j) = tw
              i += 1; j -= 1
            }
          }
          if (lo < j) stack = (lo, j) :: stack
          if (i < hi) stack = (i, hi) :: stack
        }
      }
    }

    /** Spark `percentile(x, p, frequency)` semantics over the expanded
      * multiset, without expanding: 0-based position p*(W-1), linear
      * interpolation between the two bracketing expanded elements. */
    def percentile(p: Double): Any = {
      if (size == 0) return null
      sortPairs(0, size - 1)
      var total = 0L
      var i = 0
      while (i < size) { total += weights(i); i += 1 }
      if (total == 0) return null
      val position = p * (total - 1)
      val lower = math.floor(position).toLong
      val higher = math.ceil(position).toLong
      def valueAt(target: Long): Double = {
        var c = 0L
        var k = 0
        while (k < size) {
          c += weights(k)
          if (c > target) return values(k)
          k += 1
        }
        values(size - 1)
      }
      val lv = valueAt(lower)
      if (higher == lower) lv
      else {
        val hv = valueAt(higher)
        lv * (higher - position) + hv * (position - lower)
      }
    }

    def serialize(): Array[Byte] = {
      val buf = ByteBuffer.allocate(4 + size * 16)
      buf.putInt(size)
      var i = 0
      while (i < size) { buf.putDouble(values(i)); i += 1 }
      i = 0
      while (i < size) { buf.putLong(weights(i)); i += 1 }
      buf.array()
    }
  }

  def deserialize(bytes: Array[Byte]): State = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val vs = new Array[Double](math.max(n, 16))
    val ws = new Array[Long](math.max(n, 16))
    var i = 0
    while (i < n) { vs(i) = buf.getDouble; i += 1 }
    i = 0
    while (i < n) { ws(i) = buf.getLong; i += 1 }
    new State(vs, ws, n)
  }
}

/** approx_percentile(x, w, p) — Presto's weighted spelling, exact. */
case class WeightedPercentileAgg(child: Expression, weight: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[WeightedPercentile.State] {

  override def prettyName: String = "approx_percentile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child, weight, pExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!child.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a numeric value, got ${child.dataType.catalogString}")
    else if (!weight.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a numeric weight, got ${weight.dataType.catalogString}")
    else if (!pExpr.foldable || p.isNaN || p < 0.0 || p > 1.0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName percentage must be a literal in [0, 1]")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val p: Double = pExpr match {
    case Literal(v: Decimal, _) => v.toDouble
    case Literal(v: Number, _) => v.doubleValue()
    case e => e.eval() match {
      case d: Decimal => d.toDouble
      case n: Number => n.doubleValue()
      case _ => Double.NaN
    }
  }

  private def toDouble(e: Expression): Any => Double = e.dataType match {
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
    case _ => v => v.asInstanceOf[Number].doubleValue()
  }
  @transient private lazy val valueOf = toDouble(child)
  @transient private lazy val weightOf: Any => Long = weight.dataType match {
    case _: DecimalType => v => v.asInstanceOf[Decimal].toLong
    case _ => v => v.asInstanceOf[Number].longValue()
  }

  override def createAggregationBuffer(): WeightedPercentile.State =
    new WeightedPercentile.State()

  override def update(b: WeightedPercentile.State,
      input: InternalRow): WeightedPercentile.State = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      if (w != null) b.add(valueOf(v), weightOf(w))
    }
    b
  }

  override def merge(b: WeightedPercentile.State,
      o: WeightedPercentile.State): WeightedPercentile.State = {
    b.mergeWith(o); b
  }

  override def eval(b: WeightedPercentile.State): Any = b.percentile(p)
  override def serialize(b: WeightedPercentile.State): Array[Byte] =
    b.serialize()
  override def deserialize(bytes: Array[Byte]): WeightedPercentile.State =
    WeightedPercentile.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): WeightedPercentileAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): WeightedPercentileAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), weight = newChildren(1),
      pExpr = newChildren(2))
}

package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType, MapType, NumericType}

/** `numeric_histogram(buckets, value)` — the reference's adaptive
  * streaming histogram (`presto-main/.../aggregation/NumericHistogram
  * .java`, surfaced by `DoubleHistogramAggregation.java`): the Ben-Haim &
  * Tom-Tov (JMLR 2010) algorithm. Bins are (value, weight) pairs kept
  * sorted; inserting past capacity merges the CLOSEST adjacent pair into
  * its weighted mean. Output is `map<double,double>` bin → weight, like
  * the reference.
  *
  * Invariants the algorithm preserves exactly (and the query gates test):
  * total weight is conserved (merges add weights), bin values stay inside
  * the observed data range (weighted means of interior points), and the
  * weighted mean of the histogram equals the input mean up to float
  * rounding. Bin PLACEMENT depends on arrival order, so outputs are
  * gated on these invariants, not on bin identity (same stance as the
  * t-digest pack).
  *
  * Scale: state is O(buckets) — map-side partial aggregation, tiny
  * shuffle payloads, merge = re-insert + compact, like every sketch in
  * this engine.
  */
object NumericHistogram {

  final class State(val maxBuckets: Int) {
    require(maxBuckets >= 2, "numeric_histogram needs at least 2 buckets")
    private[graft] val values = new ArrayBuffer[Double]
    private[graft] val weights = new ArrayBuffer[Double]

    def add(x: Double, w: Double = 1.0): Unit = {
      require(w > 0, s"weight must be positive, got $w")
      // insertion point in the sorted bin list
      var lo = 0
      var hi = values.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (values(mid) < x) lo = mid + 1 else hi = mid
      }
      if (lo < values.length && values(lo) == x) weights(lo) += w
      else {
        values.insert(lo, x)
        weights.insert(lo, w)
        if (values.length > maxBuckets) compactOne()
      }
    }

    /** Merge the adjacent pair with the smallest value gap (first such
      * pair on ties — NumericHistogram.java mergeBuckets order). */
    private def compactOne(): Unit = {
      var best = 0
      var bestGap = Double.PositiveInfinity
      var i = 0
      while (i < values.length - 1) {
        val gap = values(i + 1) - values(i)
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val w = weights(best) + weights(best + 1)
      val v = (values(best) * weights(best) +
        values(best + 1) * weights(best + 1)) / w
      values(best) = v
      weights(best) = w
      values.remove(best + 1)
      weights.remove(best + 1)
    }

    def mergeWith(o: State): Unit = {
      var i = 0
      while (i < o.values.length) {
        add(o.values(i), o.weights(i))
        i += 1
      }
    }

    def serialize(): Array[Byte] = {
      val buf = ByteBuffer.allocate(4 + 4 + 16 * values.length)
      buf.putInt(maxBuckets).putInt(values.length)
      var i = 0
      while (i < values.length) {
        buf.putDouble(values(i)); buf.putDouble(weights(i)); i += 1
      }
      buf.array()
    }
  }

  def deserialize(bytes: Array[Byte]): State = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new State(buf.getInt)
    val n = buf.getInt
    var i = 0
    while (i < n) {
      // already sorted and distinct: append directly
      st.values += buf.getDouble
      st.weights += buf.getDouble
      i += 1
    }
    st
  }

  /** Column API: numeric_histogram(buckets, value). */
  def agg(buckets: Int, c: Column): Column =
    ColumnBridge.toCol(NumericHistogramAgg(buckets, ColumnBridge.toExpr(c))
      .toAggregateExpression())
}

/** numeric_histogram aggregate: numeric input → map<double,double>. */
case class NumericHistogramAgg(buckets: Int, child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[NumericHistogram.State] {

  override def prettyName: String = "numeric_histogram"
  override def dataType: DataType = MapType(DoubleType, DoubleType, false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType if buckets >= 2 => TypeCheckResult.TypeCheckSuccess
    case _: NumericType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs at least 2 buckets, got $buckets")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a numeric argument, got ${dt.catalogString}")
  }

  @transient private lazy val toDouble: Any => Double = child.dataType match {
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
    case _ => v => v.asInstanceOf[Number].doubleValue()
  }

  override def createAggregationBuffer(): NumericHistogram.State =
    new NumericHistogram.State(buckets)

  override def update(b: NumericHistogram.State,
      input: InternalRow): NumericHistogram.State = {
    val v = child.eval(input)
    if (v != null) b.add(toDouble(v))
    b
  }

  override def merge(b: NumericHistogram.State,
      o: NumericHistogram.State): NumericHistogram.State = {
    b.mergeWith(o); b
  }

  override def eval(b: NumericHistogram.State): Any =
    ArrayBasedMapData(b.values.toArray, b.weights.toArray)

  override def serialize(b: NumericHistogram.State): Array[Byte] =
    b.serialize()
  override def deserialize(bytes: Array[Byte]): NumericHistogram.State =
    NumericHistogram.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): NumericHistogramAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): NumericHistogramAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

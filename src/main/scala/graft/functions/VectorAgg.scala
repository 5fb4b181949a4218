package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `vector_avg(array<double>)` — element-wise mean of fixed-dimension
  * vectors, the centroid-recompute step of Lloyd iterations (IVF coarse
  * quantizer training, qk6).
  *
  * State is a dense `Array[Double]` of component sums plus a count —
  * O(dims) per group regardless of group size, with map-side partial
  * aggregation. This is the 100 TB shape for centroid updates: the
  * alternative (`posexplode` → groupBy(cell, dim) → re-collect) shuffles
  * n·d rows where this shuffles k·d doubles. Dimension is locked to the
  * first row seen; a ragged vector fails loudly (the fixture contract is
  * fixed-width embeddings).
  */
object VectorAvg {

  final class State {
    private[functions] var sums: Array[Double] = null
    private[functions] var count: Long = 0L

    def add(v: ArrayData, fromFloat: Boolean): Unit = {
      val n = v.numElements()
      if (sums == null) sums = new Array[Double](n)
      require(n == sums.length,
        s"vector_avg: ragged input (${n} vs ${sums.length} dims)")
      var i = 0
      if (fromFloat) while (i < n) { sums(i) += v.getFloat(i); i += 1 }
      else while (i < n) { sums(i) += v.getDouble(i); i += 1 }
      count += 1L
    }

    def mergeWith(o: State): Unit = {
      if (o.sums == null) return
      if (sums == null) { sums = o.sums.clone(); count = o.count; return }
      require(sums.length == o.sums.length, "vector_avg: ragged merge")
      var i = 0
      while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
      count += o.count
    }
  }

  /** Column API: element-wise mean vector. */
  def agg(c: Column): Column =
    ColumnBridge.toCol(VectorAvgAgg(ColumnBridge.toExpr(c))
      .toAggregateExpression())
}

/** `vector_moments(array<double|float>)` — count, per-dimension sums and
  * the UPPER-TRIANGULAR second-moment sums Σ xᵢxⱼ in one mergeable pass:
  * the sufficient statistics of a covariance matrix (PCA training,
  * operators/Pca). State is O(d²) doubles (d=64 → 16 KB) independent of
  * row count, with map-side partial aggregation — the 100 TB shape for
  * covariance: one scan, one 16 KB merge tree, no n·d² shuffle. Element
  * values are widened to double BEFORE multiplying (the oracle's
  * CAST(x AS DOUBLE) * CAST(y AS DOUBLE) replays the identical product).
  * Output layout: [n, sum_0..sum_{d-1}, ss_00, ss_01..ss_0{d-1},
  * ss_11..] (row-major upper triangle). */
object VectorMoments {

  final class State {
    private[functions] var d: Int = -1
    private[functions] var count: Long = 0L
    private[functions] var sums: Array[Double] = null
    private[functions] var ss: Array[Double] = null

    def add(v: ArrayData, fromFloat: Boolean): Unit = {
      val n = v.numElements()
      if (d < 0) {
        d = n
        sums = new Array[Double](n)
        ss = new Array[Double](n * (n + 1) / 2)
      }
      require(n == d, s"vector_moments: ragged input ($n vs $d dims)")
      val x = new Array[Double](n)
      var i = 0
      if (fromFloat) while (i < n) { x(i) = v.getFloat(i); i += 1 }
      else while (i < n) { x(i) = v.getDouble(i); i += 1 }
      var k = 0
      i = 0
      while (i < n) {
        sums(i) += x(i)
        var j = i
        while (j < n) { ss(k) += x(i) * x(j); j += 1; k += 1 }
        i += 1
      }
      count += 1L
    }

    def mergeWith(o: State): Unit = {
      if (o.d < 0) return
      if (d < 0) {
        d = o.d; count = o.count
        sums = o.sums.clone(); ss = o.ss.clone()
        return
      }
      require(d == o.d, "vector_moments: ragged merge")
      var i = 0
      while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
      i = 0
      while (i < ss.length) { ss(i) += o.ss(i); i += 1 }
      count += o.count
    }
  }

  def agg(c: Column): Column =
    ColumnBridge.toCol(VectorMomentsAgg(ColumnBridge.toExpr(c))
      .toAggregateExpression())
}

case class VectorMomentsAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorMoments.State] {

  override def prettyName: String = "vector_moments"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(et @ (DoubleType | FloatType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double|float>, got ${child.dataType.catalogString}")

  @transient private lazy val fromFloat = elemType.contains(FloatType)

  override def createAggregationBuffer(): VectorMoments.State =
    new VectorMoments.State

  override def update(b: VectorMoments.State,
      input: InternalRow): VectorMoments.State = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData], fromFloat)
    b
  }

  override def merge(b: VectorMoments.State,
      o: VectorMoments.State): VectorMoments.State = {
    b.mergeWith(o); b
  }

  override def eval(b: VectorMoments.State): Any =
    if (b.d < 0) null
    else {
      val out = new Array[Double](1 + b.sums.length + b.ss.length)
      out(0) = b.count.toDouble
      System.arraycopy(b.sums, 0, out, 1, b.sums.length)
      System.arraycopy(b.ss, 0, out, 1 + b.sums.length, b.ss.length)
      new GenericArrayData(out)
    }

  override def serialize(b: VectorMoments.State): Array[Byte] = {
    val n = math.max(b.d, 0)
    val tri = n * (n + 1) / 2
    val buf = ByteBuffer.allocate(8 + 4 + 8 * (n + tri))
    buf.putLong(b.count).putInt(b.d)
    var i = 0
    while (i < n) { buf.putDouble(b.sums(i)); i += 1 }
    i = 0
    while (i < tri) { buf.putDouble(b.ss(i)); i += 1 }
    buf.array()
  }
  override def deserialize(bytes: Array[Byte]): VectorMoments.State = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new VectorMoments.State
    st.count = buf.getLong
    st.d = buf.getInt
    if (st.d >= 0) {
      val n = st.d
      val tri = n * (n + 1) / 2
      st.sums = new Array[Double](n)
      st.ss = new Array[Double](tri)
      var i = 0
      while (i < n) { st.sums(i) = buf.getDouble; i += 1 }
      i = 0
      while (i < tri) { st.ss(i) = buf.getDouble; i += 1 }
    }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

case class VectorAvgAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorAvg.State] {

  override def prettyName: String = "vector_avg"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(et @ (DoubleType | FloatType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double|float>, got ${child.dataType.catalogString}")

  @transient private lazy val fromFloat = elemType.contains(FloatType)

  override def createAggregationBuffer(): VectorAvg.State = new VectorAvg.State

  override def update(b: VectorAvg.State, input: InternalRow): VectorAvg.State = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData], fromFloat)
    b
  }

  override def merge(b: VectorAvg.State, o: VectorAvg.State): VectorAvg.State = {
    b.mergeWith(o); b
  }

  override def eval(b: VectorAvg.State): Any =
    if (b.sums == null) null
    else {
      val out = new Array[Double](b.sums.length)
      var i = 0
      while (i < out.length) { out(i) = b.sums(i) / b.count; i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(b: VectorAvg.State): Array[Byte] = {
    val n = if (b.sums == null) 0 else b.sums.length
    val buf = ByteBuffer.allocate(8 + 4 + 8 * n)
    buf.putLong(b.count).putInt(n)
    var i = 0
    while (i < n) { buf.putDouble(b.sums(i)); i += 1 }
    buf.array()
  }
  override def deserialize(bytes: Array[Byte]): VectorAvg.State = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new VectorAvg.State
    st.count = buf.getLong
    val n = buf.getInt
    if (n > 0) {
      st.sums = new Array[Double](n)
      var i = 0
      while (i < n) { st.sums(i) = buf.getDouble; i += 1 }
    }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorAvgAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorAvgAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

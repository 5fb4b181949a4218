package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Approximate heavy hitters — the Presto `approx_most_frequent(buckets,
  * value, capacity)` aggregate (`presto-main/.../aggregation/
  * approxmostfrequent/ApproxMostFrequent.java`, stream-summary state in
  * `ApproxMostFrequentHistogram.java`), re-expressed as a Spark
  * `TypedImperativeAggregate` over the same space-saving sketch
  * (Metwally, Agrawal, El Abbadi 2005).
  *
  * State is at most `capacity` counters regardless of input cardinality,
  * and merge is the mergeable-summaries union (Agarwal et al. 2012):
  * absent keys take the other side's minimum counter as both estimate and
  * error bound, then the union is trimmed back to `capacity`. That makes
  * partial aggregation map-side safe at 100 TB — one bounded state per
  * group ever shuffles, exactly like the HLL/qdigest packs.
  *
  * Guarantees (space-saving invariants, asserted in FunctionsSuite):
  * estimate >= true count, estimate - error <= true count, and any key
  * with true count > N/capacity is present. When `capacity` >= the number
  * of distinct keys the sketch never evicts, every count is EXACT and
  * merge-then-top equals direct-build — which is what makes qe4
  * oracle-checkable row-for-row.
  *
  * Ties and eviction order are deterministic: (count, then key) ordering,
  * so equal inputs give equal outputs under any partitioning.
  */
object ApproxMostFrequent {

  private val KindLong: Byte = 0
  private val KindString: Byte = 1

  /** Space-saving summary. Keys are boxed Long or String per `kind`. */
  final class State(val capacity: Int) {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    private[functions] var kind: Byte = -1
    // key -> (estimate, error)
    private[functions] val counters =
      scala.collection.mutable.HashMap.empty[Any, (Long, Long)]

    private def keyLt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: java.lang.Long, y: java.lang.Long) => x < y
      case (x: String, y: String) => x < y
      case _ => sys.error("mixed key kinds in one sketch")
    }

    /** Smallest counter, 0 while spare capacity remains (the standard
      * absent-key bound: nothing evicted yet means absent = truly 0). */
    private[functions] def minCount: Long =
      if (counters.size < capacity) 0L else counters.valuesIterator.map(_._1).min

    def insert(key: Any): Unit = {
      counters.get(key) match {
        case Some((c, e)) => counters.update(key, (c + 1L, e))
        case None if counters.size < capacity => counters.update(key, (1L, 0L))
        case None =>
          // evict the deterministic minimum: smallest count, then smallest key
          val (mk, (mc, _)) = counters.minBy { case (k, (c, _)) => (c, k) }(
            Ordering.Tuple2(Ordering.Long, keyOrdering))
          counters.remove(mk)
          counters.update(key, (mc + 1L, mc))
      }
    }

    private def keyOrdering: Ordering[Any] = (a: Any, b: Any) =>
      if (keyLt(a, b)) -1 else if (keyLt(b, a)) 1 else 0

    def mergeWith(o: State): Unit = {
      if (o.counters.isEmpty) return
      if (kind == -1) kind = o.kind
      require(o.kind == kind, "cannot merge sketches over different key types")
      val mA = if (counters.isEmpty) 0L else minCount
      val mB = o.minCount
      val merged = scala.collection.mutable.HashMap.empty[Any, (Long, Long)]
      (counters.keysIterator ++ o.counters.keysIterator).foreach { k =>
        if (!merged.contains(k)) {
          val (ca, ea) = counters.getOrElse(k, (mA, mA))
          val (cb, eb) = o.counters.getOrElse(k, (mB, mB))
          merged.update(k, (ca + cb, ea + eb))
        }
      }
      counters.clear()
      if (merged.size <= capacity) counters ++= merged
      else counters ++= merged.toSeq
        .sortBy { case (k, (c, _)) => (-c, k) }(
          Ordering.Tuple2(Ordering.Long, keyOrdering))
        .take(capacity)
    }

    /** Top-n entries, (count desc, key asc) — the map the aggregate emits. */
    def top(n: Int): Seq[(Any, Long)] = counters.toSeq
      .sortBy { case (k, (c, _)) => (-c, k) }(
        Ordering.Tuple2(Ordering.Long, keyOrdering))
      .take(n)
      .map { case (k, (c, _)) => (k, c) }

    /** Estimate + error for one key (test surface for the invariants). */
    def estimate(key: Any): (Long, Long) =
      counters.getOrElse(key, (minCount, minCount))

    def serialize(): Array[Byte] = {
      val entries = counters.toSeq.sortBy { case (k, (c, _)) => (-c, k) }(
        Ordering.Tuple2(Ordering.Long, keyOrdering))
      val keyBytes = entries.map {
        case (k: String, _) => k.getBytes(StandardCharsets.UTF_8)
        case _ => Array.emptyByteArray
      }
      val size = 4 + 1 + 4 + entries.zip(keyBytes).map { case ((k, _), kb) =>
        16 + (if (k.isInstanceOf[String]) 4 + kb.length else 8)
      }.sum
      val buf = ByteBuffer.allocate(size)
      buf.putInt(capacity).put(kind).putInt(entries.size)
      entries.zip(keyBytes).foreach { case ((k, (c, e)), kb) =>
        k match {
          case l: java.lang.Long => buf.putLong(l)
          case _: String => buf.putInt(kb.length).put(kb)
        }
        buf.putLong(c).putLong(e)
      }
      buf.array()
    }
  }

  def deserialize(bytes: Array[Byte]): State = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new State(buf.getInt)
    st.kind = buf.get
    val n = buf.getInt
    var i = 0
    while (i < n) {
      val k: Any =
        if (st.kind == KindString) {
          val kb = new Array[Byte](buf.getInt)
          buf.get(kb)
          new String(kb, StandardCharsets.UTF_8)
        } else java.lang.Long.valueOf(buf.getLong)
      st.counters.update(k, (buf.getLong, buf.getLong))
      i += 1
    }
    st
  }

  private[functions] def kindFor(dt: DataType): Byte = dt match {
    case StringType => KindString
    case _ => KindLong
  }

  /** Column API: `approx_most_frequent(buckets, value, capacity)`. */
  def apply(buckets: Int, value: Column, capacity: Int): Column =
    ColumnBridge.toCol(
      ApproxMostFrequentAgg(ColumnBridge.toExpr(value), buckets, capacity)
        .toAggregateExpression())
}

/** The aggregate: integral or string input → map<key, bigint> of the
  * `buckets` highest estimated counts. */
case class ApproxMostFrequentAgg(child: Expression, buckets: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ApproxMostFrequent.State] {

  override def prettyName: String = "approx_most_frequent"
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  override def dataType: DataType = child.dataType match {
    case StringType => MapType(StringType, LongType, valueContainsNull = false)
    case _ => MapType(LongType, LongType, valueContainsNull = false)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | ByteType | ShortType | IntegerType | LongType =>
      if (buckets <= 0 || capacity < buckets) TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 0 < buckets <= capacity, got " +
          s"buckets=$buckets capacity=$capacity")
      else TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a varchar or integral argument, got " +
        dt.catalogString)
  }

  @transient private lazy val toKey: Any => Any = child.dataType match {
    case StringType => v => v.asInstanceOf[UTF8String].toString
    case _ => v => java.lang.Long.valueOf(v.asInstanceOf[Number].longValue())
  }

  override def createAggregationBuffer(): ApproxMostFrequent.State = {
    val st = new ApproxMostFrequent.State(capacity)
    st.kind = ApproxMostFrequent.kindFor(child.dataType)
    st
  }

  override def update(b: ApproxMostFrequent.State, input: InternalRow): ApproxMostFrequent.State = {
    val v = child.eval(input)
    if (v != null) b.insert(toKey(v))
    b
  }

  override def merge(b: ApproxMostFrequent.State, o: ApproxMostFrequent.State): ApproxMostFrequent.State = {
    b.mergeWith(o); b
  }

  override def eval(b: ApproxMostFrequent.State): Any = {
    val entries = b.top(buckets)
    val keys = entries.map {
      case (k: String, _) => UTF8String.fromString(k)
      case (k, _) => k
    }
    ArrayBasedMapData(keys.toArray, entries.map(_._2).toArray)
  }

  override def serialize(b: ApproxMostFrequent.State): Array[Byte] =
    b.serialize()
  override def deserialize(bytes: Array[Byte]): ApproxMostFrequent.State =
    ApproxMostFrequent.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): ApproxMostFrequentAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ApproxMostFrequentAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, Decimal, DecimalType, DoubleType, NumericType}

/** Fixed-width equal-bucket histogram over a declared [min, max) range —
  * the state shared by the reference's `differential_entropy` and
  * `classification_*` aggregate families
  * (`presto-main/.../aggregation/fixedhistogram/FixedDoubleHistogram.java`).
  *
  * Bucketing matches `FixedHistogramUtils.getIndexForValue:28`:
  * `min(int(buckets * (v - min) / (max - min)), buckets - 1)`, valid for
  * `min <= v < max` (loud error outside, like the reference's
  * checkArgument). State is a dense O(buckets) weight array — map-side
  * partial aggregation with tiny shuffle payloads; merge is element-wise
  * addition, exactly the reference's `mergeWith`. With integer-valued
  * weights every per-bucket sum is exact in a double, so results are
  * independent of row arrival order (the property the oracle replay
  * relies on).
  */
object FixedHistogram {

  final class State(val buckets: Int, val min: Double, val max: Double) {
    require(buckets > 0, s"bucket count must be positive: $buckets")
    require(min < max, s"min must be less than max: min=$min, max=$max")
    private[graft] val weights = new Array[Double](buckets)

    def width: Double = (max - min) / buckets

    /** Bucket left edge, with the reference's exact IEEE grouping
      * (`FixedHistogramUtils.getLeftValueForIndex:40`:
      * `min + index * (max - min) / bucketCount` — NOT `index * width`,
      * which rounds differently: 3 * 0.1 != 3 * 1.0 / 10). */
    def leftFor(i: Int): Double = min + i * (max - min) / buckets

    def indexFor(v: Double): Int = {
      require(v >= min && v < max,
        s"value must be within range: $v [$min, $max)")
      math.min((buckets * (v - min) / (max - min)).toInt, buckets - 1)
    }

    def add(v: Double, w: Double): Unit = {
      require(w >= 0.0, s"weight must be non-negative: $w")
      weights(indexFor(v)) += w
    }

    def mergeWith(o: State): Unit = {
      require(o.buckets == buckets && o.min == min && o.max == max,
        "inconsistent histogram parameters in merge")
      var i = 0
      while (i < buckets) { weights(i) += o.weights(i); i += 1 }
    }

    def totalWeight: Double = {
      var s = 0.0
      var i = 0
      while (i < buckets) { s += weights(i); i += 1 }
      s
    }

    def writeTo(buf: ByteBuffer): Unit = {
      buf.putInt(buckets).putDouble(min).putDouble(max)
      var i = 0
      while (i < buckets) { buf.putDouble(weights(i)); i += 1 }
    }

    def byteSize: Int = 4 + 16 + 8 * buckets
  }

  def readFrom(buf: ByteBuffer): State = {
    val st = new State(buf.getInt, buf.getDouble, buf.getDouble)
    var i = 0
    while (i < st.buckets) { st.weights(i) = buf.getDouble; i += 1 }
    st
  }

  private[graft] def toDoubleFn(dt: DataType): Any => Double = dt match {
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
    case _ => v => v.asInstanceOf[Number].doubleValue()
  }
}

/** `differential_entropy(buckets, sample, weight, 'fixed_histogram_mle',
  * min, max)` — the reference's deterministic strategy
  * (`FixedHistogramMleStateStrategy.java:86-100`): bucket the samples on
  * a fixed [min, max) grid, then
  * `(-Σ p_i ln p_i + ln(width)) / ln 2` with `p_i = w_i / Σw` and
  * `0 ln 0 = 0` (`FixedHistogramStateStrategyUtils.getXLogX`). NaN on
  * empty input, like the reference.
  *
  * The 2/3-arg reservoir-sample forms
  * (`UnweightedReservoirSampleStateStrategy.java`) and
  * `fixed_histogram_jacknife` are rejected loudly at registration: the
  * reservoirs are sampling-based (nondeterministic under a differential
  * gate by construction) and the jacknife needs the per-sample breakdown
  * histogram; `fixed_histogram_mle` is the strategy whose output is a
  * pure function of the data.
  */
case class DifferentialEntropyAgg(buckets: Int, min: Double, max: Double,
    sample: Expression, weight: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FixedHistogram.State] {

  override def prettyName: String = "differential_entropy"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(sample, weight)

  override def checkInputDataTypes(): TypeCheckResult =
    (sample.dataType, weight.dataType) match {
      case (_: NumericType, _: NumericType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects numeric (sample, weight), got " +
          s"(${sample.dataType.catalogString}, ${weight.dataType.catalogString})")
    }

  @transient private lazy val sampleD = FixedHistogram.toDoubleFn(sample.dataType)
  @transient private lazy val weightD = FixedHistogram.toDoubleFn(weight.dataType)

  override def createAggregationBuffer(): FixedHistogram.State =
    new FixedHistogram.State(buckets, min, max)

  override def update(b: FixedHistogram.State,
      input: InternalRow): FixedHistogram.State = {
    val s = sample.eval(input)
    val w = weight.eval(input)
    if (s != null && w != null) b.add(sampleD(s), weightD(w))
    b
  }

  override def merge(b: FixedHistogram.State,
      o: FixedHistogram.State): FixedHistogram.State = { b.mergeWith(o); b }

  override def eval(b: FixedHistogram.State): Any = {
    val sum = b.totalWeight
    if (sum == 0.0) Double.NaN
    else {
      var raw = 0.0
      var i = 0
      while (i < b.buckets) {
        val p = b.weights(i) / sum
        if (p > 0.0) raw -= p * math.log(p)
        i += 1
      }
      (raw + math.log(b.width)) / math.log(2.0)
    }
  }

  override def serialize(b: FixedHistogram.State): Array[Byte] = {
    val buf = ByteBuffer.allocate(b.byteSize)
    b.writeTo(buf)
    buf.array()
  }
  override def deserialize(bytes: Array[Byte]): FixedHistogram.State =
    FixedHistogram.readFrom(ByteBuffer.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): DifferentialEntropyAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DifferentialEntropyAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sample = newChildren(0), weight = newChildren(1))
}

object DifferentialEntropyAgg {
  /** Column API: differential_entropy(buckets, sample, weight, min, max),
    * fixed_histogram_mle strategy. */
  def agg(buckets: Int, sample: Column, weight: Column,
      min: Double, max: Double): Column =
    ColumnBridge.toCol(DifferentialEntropyAgg(buckets, min, max,
      ColumnBridge.toExpr(sample), ColumnBridge.toExpr(weight))
      .toAggregateExpression())
}

/** `differential_entropy(..., 'fixed_histogram_jacknife', min, max)` —
  * the reference's second deterministic strategy
  * (`FixedHistogramJacknifeStateStrategy.java`): a BREAKDOWN histogram
  * (per bucket, per distinct weight value, a sample count —
  * `FixedDoubleBreakdownHistogram.java`) feeding a jacknife
  * (leave-one-out) bias correction of the histogram entropy:
  *
  *   H_jk = n·H(S) − Σ_entries count·(n−1)·H(S − entry)/n
  *
  * with `H(width, Σw, Σ w ln w) = max((ln(width·Σw) − Σ w ln w / Σw)
  * / ln 2, 0)` (`EntropyCalculations.calculateEntropyFromHistogram
  * Aggregates`). State is a sorted (bucket, weight) → count map:
  * deterministic iteration, byte-stable merge; size is
  * O(buckets × distinct weights) — same growth the reference accepts.
  */
case class DifferentialEntropyJacknifeAgg(buckets: Int, min: Double,
    max: Double, sample: Expression, weight: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DifferentialEntropyJacknifeAgg.State] {

  import DifferentialEntropyJacknifeAgg._

  override def prettyName: String = "differential_entropy"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(sample, weight)

  override def checkInputDataTypes(): TypeCheckResult =
    (sample.dataType, weight.dataType) match {
      case (_: NumericType, _: NumericType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects numeric (sample, weight)")
    }

  @transient private lazy val sampleD = FixedHistogram.toDoubleFn(sample.dataType)
  @transient private lazy val weightD = FixedHistogram.toDoubleFn(weight.dataType)

  override def createAggregationBuffer(): State = new State(buckets, min, max)

  override def update(b: State, input: InternalRow): State = {
    val s = sample.eval(input)
    val w = weight.eval(input)
    if (s != null && w != null) b.add(sampleD(s), weightD(w))
    b
  }

  override def merge(b: State, o: State): State = { b.mergeWith(o); b }

  override def eval(b: State): Any = {
    // per-bucket total weights Σ count·w, in ascending bucket order
    val bucketWeight = new Array[Double](b.buckets)
    var n = 0L
    b.entries.foreach { case ((bk, w), cnt) =>
      bucketWeight(bk) += cnt * w
      n += cnt
    }
    var sumW = 0.0
    var sumWLW = 0.0
    var i = 0
    while (i < b.buckets) {
      sumW += bucketWeight(i)
      sumWLW += xLogX(bucketWeight(i))
      i += 1
    }
    if (sumW == 0.0) Double.NaN
    else {
      val width = (b.max - b.min) / b.buckets
      var entropy = n * hFromAggregates(width, sumW, sumWLW)
      b.entries.foreach { case ((bk, w), cnt) =>
        val bw = bucketWeight(bk)
        if (bw > 0.0) {
          val holdBw = math.max(bw - w, 0.0)
          val holdSumW = sumW - bw + holdBw
          val holdSumWLW = sumWLW - xLogX(bw) + xLogX(holdBw)
          entropy -= cnt * (n - 1) *
            hFromAggregates(width, holdSumW, holdSumWLW) / n
        }
      }
      entropy
    }
  }

  override def serialize(b: State): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 16 + 4 + 20 * b.entries.size)
    buf.putInt(b.buckets).putDouble(b.min).putDouble(b.max)
    buf.putInt(b.entries.size)
    b.entries.foreach { case ((bk, w), cnt) =>
      buf.putInt(bk).putDouble(w).putLong(cnt)
    }
    buf.array()
  }
  override def deserialize(bytes: Array[Byte]): State = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new State(buf.getInt, buf.getDouble, buf.getDouble)
    val n = buf.getInt
    var i = 0
    while (i < n) {
      st.entries.update((buf.getInt, buf.getDouble), buf.getLong)
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): DifferentialEntropyJacknifeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DifferentialEntropyJacknifeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sample = newChildren(0), weight = newChildren(1))
}

object DifferentialEntropyJacknifeAgg {

  private[functions] def xLogX(x: Double): Double =
    if (x <= 0.0) 0.0 else x * math.log(x)

  /** EntropyCalculations.calculateEntropyFromHistogramAggregates. */
  private[functions] def hFromAggregates(width: Double, sumWeight: Double,
      sumWeightLogWeight: Double): Double = {
    require(sumWeight > 0.0, "sum of weights must be positive")
    math.max(
      (math.log(width * sumWeight) - sumWeightLogWeight / sumWeight) /
        math.log(2.0), 0.0)
  }

  final class State(val buckets: Int, val min: Double, val max: Double) {
    private val grid = new FixedHistogram.State(buckets, min, max)
    // sorted for deterministic iteration + byte-stable serialization
    private[functions] val entries =
      scala.collection.mutable.TreeMap.empty[(Int, Double), Long]

    def add(v: Double, w: Double): Unit = {
      require(w >= 0.0, s"weight must be non-negative: $w")
      val key = (grid.indexFor(v), w)
      entries.update(key, entries.getOrElse(key, 0L) + 1L)
    }

    def mergeWith(o: State): Unit =
      o.entries.foreach { case (k, c) =>
        entries.update(k, entries.getOrElse(k, 0L) + c)
      }
  }
}

/** The `classification_{precision,recall,fall_out,miss_rate,thresholds}`
  * array aggregates (`PrecisionRecallAggregation.java:48-117` + the five
  * one-class subclasses): true/false outcome weights are bucketed on a
  * fixed [0, 1) histogram of the prediction score (score 1.0 accepted and
  * clamped to 0.99999999999, `MAX_PREDICTION_VALUE_FOR_HISTOGRAM`), and
  * the output walks buckets as thresholds, emitting one double per
  * threshold while true weight remains (`getResultsIterator:181-238`
  * stops when `runningTrueWeight` exhausts `totalTrueWeight`).
  *
  * Per-threshold quantities follow `BucketResult` VERBATIM — including
  * its idiosyncratic field mapping (`getResultsIterator` assigns
  * `falsePositive = runningTrueWeight` and `falseNegative =
  * totalFalseWeight - runningFalseWeight`), so:
  *   precision = (T≥t) / ((T≥t) + (F≥t))   — standard precision
  *   recall    = (T≥t) / T                  — standard recall
  *   fall_out  = (T<t) / F                  — reference's formula, kept
  *   miss_rate = (F≥t) / T                  — reference's formula, kept
  * where T/F are total true/false weights and ≥t / <t split at the
  * threshold. Matching the reference's observable output is the
  * contract; the two non-standard ratios are replicated, not "fixed".
  */
case class ClassificationMetricAgg(metric: String, buckets: Int,
    outcome: Expression, pred: Expression, weight: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ClassificationMetricAgg.State] {

  import ClassificationMetricAgg._

  require(Metrics.contains(metric), s"unknown classification metric $metric")

  override def prettyName: String = s"classification_$metric"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(outcome, pred, weight)

  override def checkInputDataTypes(): TypeCheckResult =
    (outcome.dataType, pred.dataType, weight.dataType) match {
      case (BooleanType, _: NumericType, _: NumericType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (boolean outcome, numeric pred, numeric weight)")
    }

  @transient private lazy val predD = FixedHistogram.toDoubleFn(pred.dataType)
  @transient private lazy val weightD = FixedHistogram.toDoubleFn(weight.dataType)

  override def createAggregationBuffer(): State = new State(buckets)

  override def update(b: State, input: InternalRow): State = {
    val o = outcome.eval(input)
    val p = pred.eval(input)
    val w = weight.eval(input)
    if (o != null && p != null && w != null)
      b.add(o.asInstanceOf[Boolean], predD(p), weightD(w))
    b
  }

  override def merge(b: State, o: State): State = { b.mergeWith(o); b }

  override def eval(b: State): Any = {
    val totalTrue = b.trueW.totalWeight
    val totalFalse = b.falseW.totalWeight
    val out = Array.newBuilder[Double]
    var runningTrue = 0.0
    var runningFalse = 0.0
    var i = 0
    // hasNext: bucket remains AND true weight not yet exhausted
    while (i < b.buckets && totalTrue > runningTrue) {
      val threshold = b.trueW.leftFor(i)
      val tp = totalTrue - runningTrue
      val fp = runningTrue
      val fn = totalFalse - runningFalse
      out += (metric match {
        case "thresholds" => threshold
        case "precision" => tp / (tp + fn)
        case "recall" => tp / totalTrue
        case "fall_out" => fp / totalFalse
        case "miss_rate" => fn / totalTrue
      })
      runningTrue += b.trueW.weights(i)
      runningFalse += b.falseW.weights(i)
      i += 1
    }
    new GenericArrayData(out.result())
  }

  override def serialize(b: State): Array[Byte] = {
    val buf = ByteBuffer.allocate(b.trueW.byteSize + b.falseW.byteSize)
    b.trueW.writeTo(buf)
    b.falseW.writeTo(buf)
    buf.array()
  }
  override def deserialize(bytes: Array[Byte]): State = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new State(FixedHistogram.readFrom(buf), FixedHistogram.readFrom(buf))
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): ClassificationMetricAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ClassificationMetricAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(outcome = newChildren(0), pred = newChildren(1),
      weight = newChildren(2))
}

object ClassificationMetricAgg {
  val Metrics: Set[String] =
    Set("precision", "recall", "fall_out", "miss_rate", "thresholds")

  /** Score 1.0 is legal input but lands in the top bucket
    * (PrecisionRecallAggregation.MAX_PREDICTION_VALUE_FOR_HISTOGRAM). */
  private val MaxPredForHistogram = 0.99999999999

  final class State private[functions] (
      private[functions] val trueW: FixedHistogram.State,
      private[functions] val falseW: FixedHistogram.State) {

    def this(buckets: Int) =
      this(new FixedHistogram.State(buckets, 0.0, 1.0),
        new FixedHistogram.State(buckets, 0.0, 1.0))

    def buckets: Int = trueW.buckets

    def add(outcome: Boolean, pred: Double, weight: Double): Unit = {
      require(pred >= 0.0 && pred <= 1.0,
        s"Prediction value must be between 0.0 and 1.0: $pred")
      val p = math.min(pred, MaxPredForHistogram)
      if (outcome) trueW.add(p, weight) else falseW.add(p, weight)
    }

    def mergeWith(o: State): Unit = {
      trueW.mergeWith(o.trueW)
      falseW.mergeWith(o.falseW)
    }
  }

  /** Column API: classification_<metric>(buckets, outcome, pred, weight). */
  def agg(metric: String, buckets: Int, outcome: Column, pred: Column,
      weight: Column): Column =
    ColumnBridge.toCol(ClassificationMetricAgg(metric, buckets,
      ColumnBridge.toExpr(outcome), ColumnBridge.toExpr(pred),
      ColumnBridge.toExpr(weight)).toAggregateExpression())
}

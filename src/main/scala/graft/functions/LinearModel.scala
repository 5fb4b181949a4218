package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The presto-ml surface (`presto-ml/.../MLFunctions.java`,
  * `LearnRegressorAggregation.java`, `LearnClassifierAggregation.java`,
  * `EvaluateClassifierPredictionsAggregation.java`) re-expressed as
  * Spark aggregates over `map<bigint,double>` feature vectors (the
  * reference's `features()` encoding) with binary model columns.
  *
  * DOCUMENTED DIVERGENCE — model family, not API: the reference trains
  * libsvm models (SVM / SVR), which are driver-iterative and
  * order-sensitive; this engine trains closed-form models whose
  * sufficient statistics are ASSOCIATIVE sums, so learning runs as an
  * ordinary partial+final aggregation:
  *  - `learn_regressor` → ordinary-least-squares via the normal
  *    equations: state is the (d+1)x(d+1) Gram matrix X'X and X'y
  *    (intercept column folded in), merged by addition; `eval` solves by
  *    Gaussian elimination with partial pivoting. Bounded state
  *    (d <= 64), one small buffer per group ever shuffled.
  *  - `learn_classifier` → nearest-centroid: state is per-label
  *    (count, Σ features); `classify` returns the label of the nearest
  *    centroid (ties broken toward the smaller label). Deterministic,
  *    bounded by #labels x d.
  * At 100 TB this is the property that matters: both models train in one
  * distributed pass with map-side combine, where an SVM cannot.
  *
  * `evaluate_classifier_predictions` replicates the reference's output
  * text format exactly (`EvaluateClassifierPredictionsAggregation
  * .java:80-98`), with labels emitted in sorted order (the reference
  * iterates a hash-set union whose order is unspecified).
  */
object LinearModel {

  /** Feature-count cap: sizes the aggregation state (d² doubles). */
  val MaxDim = 64

  private[functions] def readFeatures(m: MapData, keyIsLong: Boolean): Array[(Int, Double)] = {
    val n = m.numElements()
    val keys = m.keyArray()
    val vals = m.valueArray()
    val out = new Array[(Int, Double)](n)
    var i = 0
    while (i < n) {
      val k = if (keyIsLong) keys.getLong(i).toInt else keys.getInt(i)
      require(k >= 0 && k < MaxDim,
        s"feature index $k outside [0, $MaxDim)")
      out(i) = (k, vals.getDouble(i))
      i += 1
    }
    out
  }

  // ---- regressor ----

  /** Normal-equations accumulator: position d is the intercept column
    * (constant 1), so the solved vector is (w_0..w_{d-1}, intercept). */
  final class RegressState {
    private[functions] var d = 0 // feature count seen so far
    // dense (d+1)² Gram matrix, lazily grown; last row/col = intercept
    private[functions] var xtx = new Array[Double](1)
    private[functions] var xty = new Array[Double](1)
    private[functions] var n = 0L

    private def ensure(dim: Int): Unit = if (dim > d) {
      val nd = dim
      val nxtx = new Array[Double]((nd + 1) * (nd + 1))
      val nxty = new Array[Double](nd + 1)
      var i = 0
      while (i <= d) {
        var j = 0
        while (j <= d) {
          // old intercept slot d moves to slot nd
          val oi = if (i == d) nd else i
          val oj = if (j == d) nd else j
          nxtx(oi * (nd + 1) + oj) = xtx(i * (d + 1) + j)
          j += 1
        }
        nxty(if (i == d) nd else i) = xty(i)
        i += 1
      }
      xtx = nxtx; xty = nxty; d = nd
    }

    def add(feats: Array[(Int, Double)], y: Double): Unit = {
      var maxK = -1
      feats.foreach { case (k, _) => if (k > maxK) maxK = k }
      ensure(maxK + 1)
      val w = d + 1
      var i = 0
      while (i < feats.length) {
        val (ki, vi) = feats(i)
        var j = 0
        while (j < feats.length) {
          val (kj, vj) = feats(j)
          xtx(ki * w + kj) += vi * vj
          j += 1
        }
        xtx(ki * w + d) += vi // intercept column
        xtx(d * w + ki) += vi
        xty(ki) += vi * y
        i += 1
      }
      xtx(d * w + d) += 1.0
      xty(d) += y
      n += 1
    }

    def mergeWith(o: RegressState): Unit = {
      if (o.n == 0) return
      ensure(o.d)
      val w = d + 1
      val ow = o.d + 1
      var i = 0
      while (i <= o.d) {
        val ti = if (i == o.d) d else i
        var j = 0
        while (j <= o.d) {
          val tj = if (j == o.d) d else j
          xtx(ti * w + tj) += o.xtx(i * ow + j)
          j += 1
        }
        xty(ti) += o.xty(i)
        i += 1
      }
      n += o.n
    }

    /** Solve (X'X)w = X'y by Gaussian elimination with partial pivoting;
      * a zero pivot (rank-deficient design) pins that coefficient to 0,
      * keeping the answer defined and deterministic. */
    def solve(): Array[Double] = {
      val m = d + 1
      val a = new Array[Double](m * (m + 1))
      var i = 0
      while (i < m) {
        System.arraycopy(xtx, i * m, a, i * (m + 1), m)
        a(i * (m + 1) + m) = xty(i)
        i += 1
      }
      val piv = (0 until m).toArray
      var col = 0
      while (col < m) {
        var best = col
        var r = col + 1
        while (r < m) {
          if (math.abs(a(piv(r) * (m + 1) + col)) >
            math.abs(a(piv(best) * (m + 1) + col))) best = r
          r += 1
        }
        val t = piv(col); piv(col) = piv(best); piv(best) = t
        val p = a(piv(col) * (m + 1) + col)
        if (p != 0.0) {
          r = col + 1
          while (r < m) {
            val f = a(piv(r) * (m + 1) + col) / p
            if (f != 0.0) {
              var c = col
              while (c <= m) {
                a(piv(r) * (m + 1) + c) -= f * a(piv(col) * (m + 1) + c)
                c += 1
              }
            }
            r += 1
          }
        }
        col += 1
      }
      val wv = new Array[Double](m)
      var row = m - 1
      while (row >= 0) {
        var s = a(piv(row) * (m + 1) + m)
        var c = row + 1
        while (c < m) { s -= a(piv(row) * (m + 1) + c) * wv(c); c += 1 }
        val p = a(piv(row) * (m + 1) + row)
        wv(row) = if (p == 0.0) 0.0 else s / p
        row -= 1
      }
      wv
    }

    def serialize(): Array[Byte] = {
      val w = d + 1
      val buf = ByteBuffer.allocate(4 + 8 + 8 * w * w + 8 * w)
      buf.putInt(d).putLong(n)
      var i = 0
      while (i < w * w) { buf.putDouble(xtx(i)); i += 1 }
      i = 0
      while (i < w) { buf.putDouble(xty(i)); i += 1 }
      buf.array()
    }
  }

  private[functions] def deserializeRegress(bytes: Array[Byte]): RegressState = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new RegressState
    st.d = buf.getInt
    st.n = buf.getLong
    val w = st.d + 1
    st.xtx = new Array[Double](w * w)
    st.xty = new Array[Double](w)
    var i = 0
    while (i < w * w) { st.xtx(i) = buf.getDouble; i += 1 }
    i = 0
    while (i < w) { st.xty(i) = buf.getDouble; i += 1 }
    st
  }

  // ---- model wire format ----
  private[functions] val RegressorTag = 1
  private[functions] val ClassifierTag = 2

  /** tag, d, w_0..w_{d-1}, intercept */
  private[functions] def regressorModel(weights: Array[Double]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 4 + 8 * weights.length)
    buf.putInt(RegressorTag).putInt(weights.length - 1)
    weights.foreach(buf.putDouble)
    buf.array()
  }

  /** tag, d, k, then per label (sorted): label, count, Σ features */
  private[functions] def classifierModel(d: Int,
      cents: Seq[(Long, Long, Array[Double])]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 4 + 4 + cents.size * (16 + 8 * d))
    buf.putInt(ClassifierTag).putInt(d).putInt(cents.size)
    cents.foreach { case (lbl, cnt, sums) =>
      buf.putLong(lbl).putLong(cnt)
      var i = 0
      while (i < d) { buf.putDouble(sums(i)); i += 1 }
    }
    buf.array()
  }

  // ---- classifier ----

  /** Label cap: centroid state is #labels × d doubles — a classifier
    * fed a high-cardinality "label" (a mistake, not a use case) must
    * fail loudly instead of OOMing an executor. */
  val MaxLabels = 10000

  final class ClassifyState {
    private[functions] var d = 0
    private[functions] val byLabel =
      scala.collection.mutable.HashMap.empty[Long, (Long, Array[Double])]

    def add(feats: Array[(Int, Double)], label: Long): Unit = {
      feats.foreach { case (k, _) => if (k + 1 > d) d = k + 1 }
      val (cnt, sums) = byLabel.getOrElse(label, (0L, new Array[Double](MaxDim)))
      require(cnt > 0 || byLabel.size < MaxLabels,
        s"learn_classifier: more than $MaxLabels distinct labels")
      feats.foreach { case (k, v) => sums(k) += v }
      byLabel.update(label, (cnt + 1, sums))
    }

    def mergeWith(o: ClassifyState): Unit = {
      if (o.d > d) d = o.d
      o.byLabel.foreach { case (lbl, (ocnt, osums)) =>
        byLabel.get(lbl) match {
          case Some((cnt, sums)) =>
            var i = 0
            while (i < MaxDim) { sums(i) += osums(i); i += 1 }
            byLabel.update(lbl, (cnt + ocnt, sums))
          case None =>
            require(byLabel.size < MaxLabels,
              s"learn_classifier: more than $MaxLabels distinct labels")
            byLabel.update(lbl, (ocnt, osums.clone()))
        }
      }
    }

    def toModel: Array[Byte] = classifierModel(d,
      byLabel.toSeq.sortBy(_._1).map { case (l, (c, s)) => (l, c, s) })

    def serialize(): Array[Byte] = {
      val buf = ByteBuffer.allocate(4 + 4 + byLabel.size * (16 + 8 * d))
      buf.putInt(d).putInt(byLabel.size)
      byLabel.toSeq.sortBy(_._1).foreach { case (lbl, (cnt, sums)) =>
        buf.putLong(lbl).putLong(cnt)
        var i = 0
        while (i < d) { buf.putDouble(sums(i)); i += 1 }
      }
      buf.array()
    }
  }

  private[functions] def deserializeClassify(bytes: Array[Byte]): ClassifyState = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new ClassifyState
    st.d = buf.getInt
    val k = buf.getInt
    var i = 0
    while (i < k) {
      val lbl = buf.getLong
      val cnt = buf.getLong
      val sums = new Array[Double](MaxDim)
      var j = 0
      while (j < st.d) { sums(j) = buf.getDouble; j += 1 }
      st.byLabel.update(lbl, (cnt, sums))
      i += 1
    }
    st
  }

  // ---- Column API ----
  def learnRegressor(label: Column, features: Column): Column =
    ColumnBridge.toCol(LearnRegressorAgg(ColumnBridge.toExpr(label),
      ColumnBridge.toExpr(features)).toAggregateExpression())
  def learnClassifier(label: Column, features: Column): Column =
    ColumnBridge.toCol(LearnClassifierAgg(ColumnBridge.toExpr(label),
      ColumnBridge.toExpr(features)).toAggregateExpression())
  def regress(features: Column, model: Column): Column =
    ColumnBridge.toCol(RegressPredict(ColumnBridge.toExpr(features),
      ColumnBridge.toExpr(model)))
  def classify(features: Column, model: Column): Column =
    ColumnBridge.toCol(ClassifyPredict(ColumnBridge.toExpr(features),
      ColumnBridge.toExpr(model)))
  def evaluatePredictions(truth: Column, pred: Column): Column =
    ColumnBridge.toCol(EvaluatePredictionsAgg(ColumnBridge.toExpr(truth),
      ColumnBridge.toExpr(pred)).toAggregateExpression())
}

private[functions] trait FeatureInput {
  def features: Expression

  protected def checkFeatures(prettyName: String): TypeCheckResult =
    features.dataType match {
      case MapType(LongType | IntegerType, DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects map<bigint,double> features " +
          s"(the features() encoding), got ${dt.catalogString}")
    }

  @transient protected lazy val keyIsLong: Boolean =
    features.dataType.asInstanceOf[MapType].keyType == LongType

  protected def featsOf(v: Any): Array[(Int, Double)] =
    LinearModel.readFeatures(v.asInstanceOf[MapData], keyIsLong)
}

/** learn_regressor(label double, features map<bigint,double>) → binary
  * OLS model (`LearnRegressorAggregation.java`; model family diverges —
  * see [[LinearModel]]). */
case class LearnRegressorAgg(label: Expression, features: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LinearModel.RegressState]
    with FeatureInput {

  override def prettyName: String = "learn_regressor"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(label, features)

  override def checkInputDataTypes(): TypeCheckResult = label.dataType match {
    case _: NumericType => checkFeatures(prettyName)
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a numeric label, got ${dt.catalogString}")
  }

  @transient private lazy val labelD: Any => Double = label.dataType match {
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
    case _ => v => v.asInstanceOf[Number].doubleValue()
  }

  override def createAggregationBuffer(): LinearModel.RegressState =
    new LinearModel.RegressState

  override def update(b: LinearModel.RegressState, input: InternalRow): LinearModel.RegressState = {
    val y = label.eval(input)
    val f = features.eval(input)
    if (y != null && f != null) b.add(featsOf(f), labelD(y))
    b
  }

  override def merge(b: LinearModel.RegressState, o: LinearModel.RegressState): LinearModel.RegressState = {
    b.mergeWith(o); b
  }

  override def eval(b: LinearModel.RegressState): Any =
    if (b.n == 0) null else LinearModel.regressorModel(b.solve())

  override def serialize(b: LinearModel.RegressState): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): LinearModel.RegressState =
    LinearModel.deserializeRegress(bytes)

  override def withNewMutableAggBufferOffset(o: Int): LearnRegressorAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LearnRegressorAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(label = c(0), features = c(1))
}

/** learn_classifier(label bigint, features) → binary nearest-centroid
  * model (`LearnClassifierAggregation.java`; model family diverges — see
  * [[LinearModel]]). Varchar labels stay descoped: `classify`'s return
  * type must be static under name-only resolution. */
case class LearnClassifierAgg(label: Expression, features: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LinearModel.ClassifyState]
    with FeatureInput {

  override def prettyName: String = "learn_classifier"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(label, features)

  override def checkInputDataTypes(): TypeCheckResult = label.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      checkFeatures(prettyName)
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an integral label, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): LinearModel.ClassifyState =
    new LinearModel.ClassifyState

  override def update(b: LinearModel.ClassifyState, input: InternalRow): LinearModel.ClassifyState = {
    val y = label.eval(input)
    val f = features.eval(input)
    if (y != null && f != null)
      b.add(featsOf(f), y.asInstanceOf[Number].longValue())
    b
  }

  override def merge(b: LinearModel.ClassifyState, o: LinearModel.ClassifyState): LinearModel.ClassifyState = {
    b.mergeWith(o); b
  }

  override def eval(b: LinearModel.ClassifyState): Any =
    if (b.byLabel.isEmpty) null else b.toModel

  override def serialize(b: LinearModel.ClassifyState): Array[Byte] =
    b.serialize()
  override def deserialize(bytes: Array[Byte]): LinearModel.ClassifyState =
    LinearModel.deserializeClassify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): LearnClassifierAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LearnClassifierAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(label = c(0), features = c(1))
}

/** regress(features, model) → double (`MLFunctions.java regress`). The
  * model rarely changes across rows (it arrives via a broadcast 1-row
  * join), so the deserialized form is cached per byte-array. */
case class RegressPredict(features: Expression, model: Expression)
    extends BinaryExpression with CodegenFallback with FeatureInput {

  override def left: Expression = features
  override def right: Expression = model
  override def prettyName: String = "regress"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = model.dataType match {
    case BinaryType => checkFeatures(prettyName)
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary model, got ${dt.catalogString}")
  }

  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastW: Array[Double] = _

  private def weightsOf(bytes: Array[Byte]): Array[Double] = {
    if ((bytes ne lastBytes) && !java.util.Arrays.equals(bytes, lastBytes)) {
      val buf = ByteBuffer.wrap(bytes)
      require(buf.getInt == LinearModel.RegressorTag,
        "regress: model is not a regressor")
      val d = buf.getInt
      val w = new Array[Double](d + 1)
      var i = 0
      while (i <= d) { w(i) = buf.getDouble; i += 1 }
      lastW = w
    }
    lastBytes = bytes
    lastW
  }

  override def nullSafeEval(f: Any, m: Any): Any = {
    val w = weightsOf(m.asInstanceOf[Array[Byte]])
    val d = w.length - 1
    var s = w(d) // intercept
    featsOf(f).foreach { case (k, v) => if (k < d) s += w(k) * v }
    s
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression =
    copy(features = l, model = r)
}

/** classify(features, model) → bigint label of the nearest centroid
  * (`MLFunctions.java classify`; ties toward the smaller label). */
case class ClassifyPredict(features: Expression, model: Expression)
    extends BinaryExpression with CodegenFallback with FeatureInput {

  override def left: Expression = features
  override def right: Expression = model
  override def prettyName: String = "classify"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = model.dataType match {
    case BinaryType => checkFeatures(prettyName)
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary model, got ${dt.catalogString}")
  }

  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastCents: Array[(Long, Array[Double])] = _

  private def centroidsOf(bytes: Array[Byte]): Array[(Long, Array[Double])] = {
    if ((bytes ne lastBytes) && !java.util.Arrays.equals(bytes, lastBytes)) {
      val buf = ByteBuffer.wrap(bytes)
      require(buf.getInt == LinearModel.ClassifierTag,
        "classify: model is not a classifier")
      val d = buf.getInt
      val k = buf.getInt
      val cents = new Array[(Long, Array[Double])](k)
      var i = 0
      while (i < k) {
        val lbl = buf.getLong
        val cnt = buf.getLong
        val c = new Array[Double](d)
        var j = 0
        while (j < d) { c(j) = buf.getDouble / cnt; j += 1 }
        cents(i) = (lbl, c)
        i += 1
      }
      lastCents = cents
    }
    lastBytes = bytes
    lastCents
  }

  override def nullSafeEval(f: Any, m: Any): Any = {
    val cents = centroidsOf(m.asInstanceOf[Array[Byte]])
    val feats = featsOf(f)
    var bestLbl = 0L
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < cents.length) {
      val (lbl, c) = cents(i)
      var dist = 0.0
      var j = 0
      while (j < c.length) { dist += c(j) * c(j); j += 1 }
      // dist = Σ c² - 2 Σ c·f + Σ f², where Σ f² is label-independent:
      // compare on Σ c² − 2 Σ c·f
      feats.foreach { case (k, v) => if (k < c.length) dist -= 2.0 * c(k) * v }
      if (dist < bestD || (dist == bestD && lbl < bestLbl)) {
        bestD = dist; bestLbl = lbl
      }
      i += 1
    }
    bestLbl
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression =
    copy(features = l, model = r)
}

/** evaluate_classifier_predictions(truth, prediction) → the reference's
  * accuracy/precision/recall report text, labels sorted. */
case class EvaluatePredictionsAgg(truth: Expression, pred: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[EvaluatePredictionsAgg.State] {

  import EvaluatePredictionsAgg._

  override def prettyName: String = "evaluate_classifier_predictions"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(truth, pred)

  override def checkInputDataTypes(): TypeCheckResult =
    (truth.dataType, pred.dataType) match {
      case (a, b) if a == b && (a == StringType || a == LongType ||
        a == IntegerType || a == ShortType || a == ByteType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects matching bigint or varchar args, got " +
          s"(${a.catalogString}, ${b.catalogString})")
    }

  override def createAggregationBuffer(): State = new State

  override def update(b: State, input: InternalRow): State = {
    val t = truth.eval(input)
    val p = pred.eval(input)
    if (t != null && p != null) b.add(t.toString, p.toString)
    b
  }

  override def merge(b: State, o: State): State = { b.mergeWith(o); b }

  override def eval(b: State): Any =
    if (b.tp.isEmpty && b.fp.isEmpty && b.fn.isEmpty) null // no rows seen
    else UTF8String.fromString(b.report())

  override def serialize(b: State): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): State =
    State.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): EvaluatePredictionsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): EvaluatePredictionsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(truth = c(0), pred = c(1))
}

object EvaluatePredictionsAgg {

  final class State {
    private[functions] val tp = scala.collection.mutable.HashMap.empty[String, Long]
    private[functions] val fp = scala.collection.mutable.HashMap.empty[String, Long]
    private[functions] val fn = scala.collection.mutable.HashMap.empty[String, Long]

    def add(truth: String, pred: String): Unit = {
      require(tp.size + fp.size + fn.size < 3 * LinearModel.MaxLabels,
        "evaluate_classifier_predictions: more than " +
          s"${LinearModel.MaxLabels} distinct labels")
      if (truth == pred) tp.update(truth, tp.getOrElse(truth, 0L) + 1)
      else {
        fp.update(pred, fp.getOrElse(pred, 0L) + 1)
        fn.update(truth, fn.getOrElse(truth, 0L) + 1)
      }
    }

    def mergeWith(o: State): Unit = {
      o.tp.foreach { case (k, v) => tp.update(k, tp.getOrElse(k, 0L) + v) }
      o.fp.foreach { case (k, v) => fp.update(k, fp.getOrElse(k, 0L) + v) }
      o.fn.foreach { case (k, v) => fn.update(k, fn.getOrElse(k, 0L) + v) }
      // Partials with disjoint label sets can exceed the cap only at
      // merge time; without this the reducer state grows unbounded while
      // add() alone appears bounded (mirrors ClassifyState.mergeWith).
      require(tp.size + fp.size + fn.size < 3 * LinearModel.MaxLabels,
        "evaluate_classifier_predictions: more than " +
          s"${LinearModel.MaxLabels} distinct labels")
    }

    /** The reference's format verbatim (Java %.2f = HALF_UP), labels
      * sorted ascending. */
    def report(): String = {
      val sb = new StringBuilder
      val correct = tp.values.sum
      val total = correct + fp.values.sum
      sb.append(String.format(java.util.Locale.US,
        "Accuracy: %d/%d (%.2f%%)\n",
        Long.box(correct), Long.box(total),
        Double.box(100.0 * correct / total.toDouble)))
      val labels = (tp.keySet ++ fp.keySet ++ fn.keySet).toSeq.sorted
      labels.foreach { label =>
        val t = tp.getOrElse(label, 0L)
        val f = fp.getOrElse(label, 0L)
        val n = fn.getOrElse(label, 0L)
        sb.append(String.format(java.util.Locale.US, "Class '%s'\n", label))
        sb.append(String.format(java.util.Locale.US,
          "Precision: %d/%d (%.2f%%)\n", Long.box(t), Long.box(t + f),
          Double.box(100.0 * t / (t + f).toDouble)))
        sb.append(String.format(java.util.Locale.US,
          "Recall: %d/%d (%.2f%%)\n", Long.box(t), Long.box(t + n),
          Double.box(100.0 * t / (t + n).toDouble)))
      }
      sb.toString
    }

    def serialize(): Array[Byte] = {
      def mapBytes(m: scala.collection.mutable.HashMap[String, Long]): Int =
        m.iterator.map { case (k, _) =>
          4 + k.getBytes(StandardCharsets.UTF_8).length + 8 }.sum
      val buf = ByteBuffer.allocate(
        12 + mapBytes(tp) + mapBytes(fp) + mapBytes(fn))
      Seq(tp, fp, fn).foreach { m =>
        buf.putInt(m.size)
        m.foreach { case (k, v) =>
          val kb = k.getBytes(StandardCharsets.UTF_8)
          buf.putInt(kb.length).put(kb).putLong(v)
        }
      }
      buf.array()
    }

  }

  object State {
    def deserialize(bytes: Array[Byte]): State = {
      val buf = ByteBuffer.wrap(bytes)
      val st = new State
      Seq(st.tp, st.fp, st.fn).foreach { m =>
        val n = buf.getInt
        var i = 0
        while (i < n) {
          val kl = buf.getInt
          val kb = new Array[Byte](kl)
          buf.get(kb)
          m.update(new String(kb, StandardCharsets.UTF_8), buf.getLong)
          i += 1
        }
      }
      st
    }
  }
}

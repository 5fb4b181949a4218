package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Row-local nearest-codebook assignment (r17 OPT, guide §1.2 "the
  * distributed algorithm" + §2.4 "remove shuffles outright").
  *
  * The Lloyd/PQ assignment step was a broadcast join of every (sub)vector
  * row against the k-codeword codebook followed by a `max(struct(...))`
  * re-aggregation — n·k joined rows through a hash aggregate per
  * assignment pass (2M rows per PQ pass at sf0.1), with the vector
  * payload carried through the aggregation buffer. The codebook is
  * MODEL-SIZED by construction (m·k rows ≈ KBs at any corpus scale —
  * `operators/Pq.scala` header), so the argmin is evaluated per ROW
  * against the collected codebook instead: no join, no exchange, no
  * aggregate — one fused distance loop per input row, the same plan a
  * production IVF-PQ encoder uses (codebooks ship to workers, vectors
  * never fan out k-fold).
  *
  * Bit-exactness contract (the gates' oracle replays this arithmetic):
  *  - d2 composition is exactly [[VectorExpressions]]' fold order:
  *    (dot(a,a) + dot(b,b)) − 2·dot(a,b), each dot a sequential
  *    ascending-index accumulation;
  *  - cosine is the same single-pass dot/(√na·√nb) fold;
  *  - candidate order is ascending id with a STRICT improvement test on
  *    `java.lang.Double.compare` — exactly `max(struct(key, −id, ...))`:
  *    equal keys keep the smallest id, NaN ranks greatest, and the
  *    negated-key orientation is replicated by comparing on the negated
  *    value where the join form negated it.
  */
private[graft] object NearestAssign {

  /** (id, vector, dot(vector, vector)) — one codebook entry. */
  final case class Entry(id: Long, v: Array[Double], self: Double)
      extends Serializable

  def entriesOf(rows: Seq[(Long, Seq[Double])]): Array[Entry] =
    rows.sortBy(_._1).map { case (id, v) =>
      val arr = v.toArray
      Entry(id, arr, dot(arr, arr))
    }.toArray

  def dot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  def dot(a: ArrayData, b: Array[Double]): Double = {
    val n = math.min(a.numElements(), b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b(i); i += 1 }
    acc
  }

  def self(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); acc += x * x; i += 1 }
    acc
  }

  val outType: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))
}

/** struct(cid, d2) of the codeword minimizing exactD2(sv, cv) within the
  * row's subspace `j` — ties to the smallest cid. */
case class NearestCodeword(left: Expression, right: Expression,
    model: Map[Int, Array[NearestAssign.Entry]])
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "nearest_codeword"
  override def dataType: DataType = NearestAssign.outType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType | LongType | ShortType | ByteType,
          ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (int, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(jv: Any, svv: Any): Any = {
    val cands = model.getOrElse(jv.asInstanceOf[Number].intValue(),
      Array.empty[NearestAssign.Entry])
    if (cands.isEmpty) return null // join form: no codebook row, no output
    val sv = svv.asInstanceOf[ArrayData]
    val selfSv = NearestAssign.self(sv)
    // replicate max(struct(neg_d2, neg_cid, ...)): ascending cid with a
    // strict > on the NEGATED distance keeps the smallest cid on ties
    var bestNeg = Double.NegativeInfinity
    var bestCid = 0L
    var bestD2 = 0.0
    var i = 0
    while (i < cands.length) {
      val c = cands(i)
      val d2 = (selfSv + c.self) - 2.0 * NearestAssign.dot(sv, c.v)
      if (java.lang.Double.compare(-d2, bestNeg) > 0) {
        bestNeg = -d2; bestCid = c.id; bestD2 = d2
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](bestCid, bestD2))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** struct(cent_id, cd) of the centroid maximizing cosine(e, ce) — ties
  * to the smallest cent_id (the qb4 contract). */
case class NearestCentroid(child: Expression,
    model: Array[NearestAssign.Entry])
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = NearestAssign.outType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(ev: Any): Any = {
    if (model.isEmpty) return null // join form: empty centroids, no rows
    val e = ev.asInstanceOf[ArrayData]
    // the join form computed cosine via the single fused pass
    // (CosineSimilarity.fold); dot/na are loop-invariant per row
    val na = NearestAssign.self(e)
    var bestCd = Double.NegativeInfinity
    var bestId = 0L
    var first = true
    var i = 0
    while (i < model.length) {
      val c = model(i)
      val n = math.min(e.numElements(), c.v.length)
      var d = 0.0
      var k = 0
      while (k < n) { d += e.getDouble(k) * c.v(k); k += 1 }
      val cd = d / (math.sqrt(na) * math.sqrt(c.self))
      // max(struct(cd, neg_cent_id, ...)): strict > on Double.compare
      // (NaN greatest) over ascending cent_id keeps smaller ids on ties
      if (first || java.lang.Double.compare(cd, bestCd) > 0) {
        bestCd = cd; bestId = c.id; first = false
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](bestId, bestCd))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NearestAssignColumns {
  def nearestCodeword(j: Column, sv: Column,
      model: Map[Int, Array[NearestAssign.Entry]]): Column =
    ColumnBridge.toCol(NearestCodeword(ColumnBridge.toExpr(j),
      ColumnBridge.toExpr(sv), model))

  def nearestCentroid(e: Column,
      model: Array[NearestAssign.Entry]): Column =
    ColumnBridge.toCol(NearestCentroid(ColumnBridge.toExpr(e), model))
}

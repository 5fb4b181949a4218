package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** FNV hashes, HMACs, and array combinations — the remaining named scalars
  * of the reference's binary/array packs:
  * `presto-main/.../scalar/FnvHash.java` (fnv1_32/fnv1_64/fnv1a_32/
  * fnv1a_64 over varbinary, int results widened to bigint),
  * `HmacFunctions.java` (hmac_md5/sha1/sha256/sha512(data, key)),
  * `ArrayCombinationsFunction.java` (n-subsets in lexicographic index
  * order, n ≤ 5, result elements ≤ 100k).
  *
  * All are per-row scalars over small inputs; CodegenFallback costs
  * nothing measurable next to the JCE/array work itself. */
object HashCombinatorics {
  val Fnv32OffsetBasis: Int = 0x811c9dc5
  val Fnv32Prime: Int = 0x01000193
  val Fnv64OffsetBasis: Long = 0xcbf29ce484222325L
  val Fnv64Prime: Long = 0x100000001b3L

  /** Variant → (fnv1a?, 32-bit?). Presto's int results widen to bigint by
    * Java's implicit conversion, i.e. sign-extended — matched here. */
  val FnvVariants: Map[String, (Boolean, Boolean)] = Map(
    "fnv1_32" -> (false, true), "fnv1_64" -> (false, false),
    "fnv1a_32" -> (true, true), "fnv1a_64" -> (true, false))

  def fnv(bytes: Array[Byte], a: Boolean, is32: Boolean): Long =
    if (is32) {
      var h = Fnv32OffsetBasis
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        if (a) { h ^= b; h *= Fnv32Prime } else { h *= Fnv32Prime; h ^= b }
        i += 1
      }
      h.toLong // sign-extends like the reference's int -> bigint
    } else {
      var h = Fnv64OffsetBasis
      var i = 0
      while (i < bytes.length) {
        val b = (bytes(i) & 0xff).toLong
        if (a) { h ^= b; h *= Fnv64Prime } else { h *= Fnv64Prime; h ^= b }
        i += 1
      }
      h
    }

  /** SQL name → JCE algorithm. */
  val HmacAlgos: Map[String, String] = Map(
    "hmac_md5" -> "HmacMD5", "hmac_sha1" -> "HmacSHA1",
    "hmac_sha256" -> "HmacSHA256", "hmac_sha512" -> "HmacSHA512")
}

/** fnv1_32 / fnv1_64 / fnv1a_32 / fnv1a_64 (varbinary) → bigint. */
case class FnvHashExpr(child: Expression, variant: String)
    extends UnaryExpression with CodegenFallback {
  private val (fnv1a, is32) = HashCombinatorics.FnvVariants(variant)

  override def prettyName: String = variant
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects varbinary, got ${dt.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    HashCombinatorics.fnv(v.asInstanceOf[Array[Byte]], fnv1a, is32)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** hmac_md5 / hmac_sha1 / hmac_sha256 / hmac_sha512(data, key) →
  * varbinary. Argument order follows the reference: data first. */
case class HmacExpr(left: Expression, right: Expression, name: String)
    extends BinaryExpression with CodegenFallback {
  private val algo = HashCombinatorics.HmacAlgos(name)

  override def prettyName: String = name
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (varbinary, varbinary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(data: Any, key: Any): Any = {
    val mac = javax.crypto.Mac.getInstance(algo)
    mac.init(new javax.crypto.spec.SecretKeySpec(
      key.asInstanceOf[Array[Byte]], algo))
    mac.doFinal(data.asInstanceOf[Array[Byte]])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** combinations(array, n): n-element subsequences in lexicographic index
  * order. Reference limits: 0 <= n <= 5, result elements <= 100,000;
  * n > |array| yields an empty result, n = 0 yields [[]]. */
case class ArrayCombinations(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 0 && n <= 5,
    s"combination size must be between 0 and 5, got $n")

  override def prettyName: String = "combinations"
  override def dataType: DataType =
    ArrayType(child.dataType.asInstanceOf[ArrayType])

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array, got ${dt.catalogString}")
  }

  private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[GenericArrayData]
    val idx = Array.range(0, n)
    if (n == 0) out += new GenericArrayData(Array.empty[Any])
    else if (n <= len) {
      var done = false
      while (!done) {
        require(out.length.toLong * n <= 100000L,
          "combinations exceed max size")
        out += new GenericArrayData(
          idx.map(i => arr.get(i, elemType)).toArray[Any])
        // advance to the next lexicographic index combination
        var i = n - 1
        while (i >= 0 && idx(i) == len - n + i) i -= 1
        if (i < 0) done = true
        else {
          idx(i) += 1
          var j = i + 1
          while (j < n) { idx(j) = idx(j - 1) + 1; j += 1 }
        }
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

/** SpookyHash V2 (Bob Jenkins, public domain —
  * burtleburtle.net/bob/hash/spooky.html), the hash behind the
  * reference's `spooky_hash_v2_32` / `spooky_hash_v2_64`
  * (`presto-main/.../scalar/VarbinaryFunctions.java:306,316`, seed 0,
  * result emitted as a big-endian varbinary image).
  *
  * Transcribed from the published V2 algorithm: inputs < 192 bytes take
  * the Short path (32-byte ShortMix blocks + ShortEnd), longer inputs
  * the 96-byte Mix pipeline with the length-stamped final block and
  * 3×EndPartial finish. All word reads are little-endian, as on the
  * reference's x86 (`ALLOW_UNALIGNED_READS` path). The reference's own
  * test vectors (`TestVarbinaryFunctions.java:338-341`) pin the
  * empty/'hello' outputs; longer-path constants follow the published
  * source verbatim.
  */
object SpookyHashV2 {
  private val ScConst = 0xdeadbeefdeadbeefL
  private val NumVars = 12
  private val BlockSize = NumVars * 8 // 96
  private val BufSize = 2 * BlockSize // 192

  @inline private def rot(x: Long, k: Int): Long = (x << k) | (x >>> (64 - k))

  @inline private def le64(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) | ((d(i + 1) & 0xffL) << 8) | ((d(i + 2) & 0xffL) << 16) |
      ((d(i + 3) & 0xffL) << 24) | ((d(i + 4) & 0xffL) << 32) |
      ((d(i + 5) & 0xffL) << 40) | ((d(i + 6) & 0xffL) << 48) |
      ((d(i + 7) & 0xffL) << 56)

  @inline private def le32(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) | ((d(i + 1) & 0xffL) << 8) | ((d(i + 2) & 0xffL) << 16) |
      ((d(i + 3) & 0xffL) << 24)

  def hash32(data: Array[Byte]): Int = hash64(data).toInt

  def hash64(data: Array[Byte]): Long = hash128(data, 0L, 0L)._1

  def hash128(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) =
    if (data.length < BufSize) short(data, seed1, seed2)
    else long(data, seed1, seed2)

  private def short(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) = {
    val length = data.length
    var remainder = length % 32
    var a = seed1
    var b = seed2
    var c = ScConst
    var d = ScConst
    var p = 0

    @inline def shortMix(): Unit = {
      c = rot(c, 50); c += d; a ^= c
      d = rot(d, 52); d += a; b ^= d
      a = rot(a, 30); a += b; c ^= a
      b = rot(b, 41); b += c; d ^= b
      c = rot(c, 54); c += d; a ^= c
      d = rot(d, 48); d += a; b ^= d
      a = rot(a, 38); a += b; c ^= a
      b = rot(b, 37); b += c; d ^= b
      c = rot(c, 62); c += d; a ^= c
      d = rot(d, 34); d += a; b ^= d
      a = rot(a, 5); a += b; c ^= a
      b = rot(b, 36); b += c; d ^= b
    }

    if (length > 15) {
      val end = (length / 32) * 32
      while (p < end) {
        c += le64(data, p); d += le64(data, p + 8)
        shortMix()
        a += le64(data, p + 16); b += le64(data, p + 24)
        p += 32
      }
      if (remainder >= 16) {
        c += le64(data, p); d += le64(data, p + 8)
        shortMix()
        p += 16
        remainder -= 16
      }
    }

    d += length.toLong << 56
    // the reference C switch: cases 15..13 fall into 12 (a 32-bit read of
    // bytes 8-11), 11..9 fall into the single-byte-8 add, 7..5 fall into 4
    // (a 32-bit read of bytes 0-3), 3..2 into the single-byte-0 add.
    if (remainder >= 12) {
      if (remainder >= 15) d += (data(p + 14) & 0xffL) << 48
      if (remainder >= 14) d += (data(p + 13) & 0xffL) << 40
      if (remainder >= 13) d += (data(p + 12) & 0xffL) << 32
      d += le32(data, p + 8)
      c += le64(data, p)
    } else if (remainder >= 9) {
      if (remainder >= 11) d += (data(p + 10) & 0xffL) << 16
      if (remainder >= 10) d += (data(p + 9) & 0xffL) << 8
      d += data(p + 8) & 0xffL
      c += le64(data, p)
    } else if (remainder == 8) {
      c += le64(data, p)
    } else if (remainder >= 4) {
      if (remainder >= 7) c += (data(p + 6) & 0xffL) << 48
      if (remainder >= 6) c += (data(p + 5) & 0xffL) << 40
      if (remainder >= 5) c += (data(p + 4) & 0xffL) << 32
      c += le32(data, p)
    } else if (remainder >= 1) {
      if (remainder >= 3) c += (data(p + 2) & 0xffL) << 16
      if (remainder >= 2) c += (data(p + 1) & 0xffL) << 8
      c += data(p) & 0xffL
    } else {
      c += ScConst; d += ScConst
    }

    // ShortEnd
    d ^= c; c = rot(c, 15); d += c
    a ^= d; d = rot(d, 52); a += d
    b ^= a; a = rot(a, 26); b += a
    c ^= b; b = rot(b, 51); c += b
    d ^= c; c = rot(c, 28); d += c
    a ^= d; d = rot(d, 9); a += d
    b ^= a; a = rot(a, 47); b += a
    c ^= b; b = rot(b, 54); c += b
    d ^= c; c = rot(c, 32); d += c
    a ^= d; d = rot(d, 25); a += d
    b ^= a; a = rot(a, 63); b += a
    (a, b)
  }

  private def long(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) = {
    val h = new Array[Long](NumVars)
    h(0) = seed1; h(3) = seed1; h(6) = seed1; h(9) = seed1
    h(1) = seed2; h(4) = seed2; h(7) = seed2; h(10) = seed2
    h(2) = ScConst; h(5) = ScConst; h(8) = ScConst; h(11) = ScConst

    @inline def mix(d: Array[Byte], p: Int): Unit = {
      h(0) += le64(d, p); h(2) ^= h(10); h(11) ^= h(0); h(0) = rot(h(0), 11); h(11) += h(1)
      h(1) += le64(d, p + 8); h(3) ^= h(11); h(0) ^= h(1); h(1) = rot(h(1), 32); h(0) += h(2)
      h(2) += le64(d, p + 16); h(4) ^= h(0); h(1) ^= h(2); h(2) = rot(h(2), 43); h(1) += h(3)
      h(3) += le64(d, p + 24); h(5) ^= h(1); h(2) ^= h(3); h(3) = rot(h(3), 31); h(2) += h(4)
      h(4) += le64(d, p + 32); h(6) ^= h(2); h(3) ^= h(4); h(4) = rot(h(4), 17); h(3) += h(5)
      h(5) += le64(d, p + 40); h(7) ^= h(3); h(4) ^= h(5); h(5) = rot(h(5), 28); h(4) += h(6)
      h(6) += le64(d, p + 48); h(8) ^= h(4); h(5) ^= h(6); h(6) = rot(h(6), 39); h(5) += h(7)
      h(7) += le64(d, p + 56); h(9) ^= h(5); h(6) ^= h(7); h(7) = rot(h(7), 57); h(6) += h(8)
      h(8) += le64(d, p + 64); h(10) ^= h(6); h(7) ^= h(8); h(8) = rot(h(8), 55); h(7) += h(9)
      h(9) += le64(d, p + 72); h(11) ^= h(7); h(8) ^= h(9); h(9) = rot(h(9), 54); h(8) += h(10)
      h(10) += le64(d, p + 80); h(0) ^= h(8); h(9) ^= h(10); h(10) = rot(h(10), 22); h(9) += h(11)
      h(11) += le64(d, p + 88); h(1) ^= h(9); h(10) ^= h(11); h(11) = rot(h(11), 46); h(10) += h(0)
    }

    @inline def endPartial(): Unit = {
      h(11) += h(1); h(2) ^= h(11); h(1) = rot(h(1), 44)
      h(0) += h(2); h(3) ^= h(0); h(2) = rot(h(2), 15)
      h(1) += h(3); h(4) ^= h(1); h(3) = rot(h(3), 34)
      h(2) += h(4); h(5) ^= h(2); h(4) = rot(h(4), 21)
      h(3) += h(5); h(6) ^= h(3); h(5) = rot(h(5), 38)
      h(4) += h(6); h(7) ^= h(4); h(6) = rot(h(6), 33)
      h(5) += h(7); h(8) ^= h(5); h(7) = rot(h(7), 10)
      h(6) += h(8); h(9) ^= h(6); h(8) = rot(h(8), 13)
      h(7) += h(9); h(10) ^= h(7); h(9) = rot(h(9), 38)
      h(8) += h(10); h(11) ^= h(8); h(10) = rot(h(10), 53)
      h(9) += h(11); h(0) ^= h(9); h(11) = rot(h(11), 42)
      h(10) += h(0); h(1) ^= h(10); h(0) = rot(h(0), 54)
    }

    val length = data.length
    val wholeBlocks = length / BlockSize
    var p = 0
    var i = 0
    while (i < wholeBlocks) { mix(data, p); p += BlockSize; i += 1 }

    // final partial block, zero-padded, length-stamped in the last byte
    val remainder = length - p
    val buf = new Array[Byte](BlockSize)
    System.arraycopy(data, p, buf, 0, remainder)
    buf(BlockSize - 1) = remainder.toByte

    // End: add the final block, then three EndPartial rounds
    var j = 0
    while (j < NumVars) { h(j) += le64(buf, j * 8); j += 1 }
    endPartial(); endPartial(); endPartial()
    (h(0), h(1))
  }
}

/** spooky_hash_v2_32 / spooky_hash_v2_64 (varbinary) → varbinary, the
  * hash value as a big-endian byte image like the reference
  * (`VarbinaryFunctions.java` reverses bytes into a little-endian
  * slice = big-endian image; `hex()` then prints the canonical value). */
case class SpookyHashExpr(child: Expression, is32: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String =
    if (is32) "spooky_hash_v2_32" else "spooky_hash_v2_64"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects varbinary, got ${dt.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    if (is32) {
      val x = SpookyHashV2.hash32(bytes)
      Array((x >>> 24).toByte, (x >>> 16).toByte, (x >>> 8).toByte, x.toByte)
    } else {
      val x = SpookyHashV2.hash64(bytes)
      Array((x >>> 56).toByte, (x >>> 48).toByte, (x >>> 40).toByte,
        (x >>> 32).toByte, (x >>> 24).toByte, (x >>> 16).toByte,
        (x >>> 8).toByte, x.toByte)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

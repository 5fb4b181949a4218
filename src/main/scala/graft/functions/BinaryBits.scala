package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, FloatType}

/** IEEE-754 bit-pattern converters (reference `presto-main/.../scalar/
  * VarbinaryFunctions.java` to_ieee754_32/64, from_ieee754_32/64):
  * big-endian byte images of float/double bit patterns, the standard
  * binary-interchange encoding. No Spark builtin reinterprets float bits,
  * so these are native expressions; the byte order matches the
  * reference (network order).
  */
case class ToIeee754_64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "to_ieee754_64"
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects double, got ${dt.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
    java.nio.ByteBuffer.allocate(8).putLong(bits).array()
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class FromIeee754_64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "from_ieee754_64"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${dt.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    require(bytes.length == 8, "input must be 8 bytes for from_ieee754_64")
    java.lang.Double.longBitsToDouble(
      java.nio.ByteBuffer.wrap(bytes).getLong)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class ToIeee754_32(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "to_ieee754_32"
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects real, got ${dt.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val f = v match {
      case d: java.lang.Double => d.floatValue()
      case f: java.lang.Float => f.floatValue()
    }
    java.nio.ByteBuffer.allocate(4)
      .putInt(java.lang.Float.floatToIntBits(f)).array()
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class FromIeee754_32(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "from_ieee754_32"
  override def dataType: DataType = FloatType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${dt.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    require(bytes.length == 4, "input must be 4 bytes for from_ieee754_32")
    java.lang.Float.intBitsToFloat(
      java.nio.ByteBuffer.wrap(bytes).getInt)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kafka-style message decoders — the Spark-native re-expression of the
  * reference's `presto-record-decoder` module, the layer its Kafka /
  * Redis connectors use to map opaque message bytes onto typed columns.
  *
  *   - RAW (`decoder/raw/RawColumnDecoder.java`): fixed-offset
  *     big-endian fields out of a binary message. The Spark analog is
  *     the [[RawField]] native expression + [[RecordDecoders.raw]];
  *     a connector's field-spec list becomes a plain projection, so
  *     decode runs inside whole-stage codegen'd scans, one pass per
  *     message, no UDF.
  *   - JSON (`decoder/json/JsonRowDecoderFactory.java:65-75`): slash
  *     paths (`a/b` → `$.a.b`) with the four dated field decoders —
  *     `iso8601`, `seconds-since-epoch`, `milliseconds-since-epoch`,
  *     `rfc2822` ("EEE MMM dd HH:mm:ss Z yyyy", the Twitter feed
  *     format) — mapped onto `get_json_object` + the builtin timestamp
  *     constructors.
  *   - CSV (`decoder/csv/CsvRowDecoder.java`): positional fields via
  *     the builtin `from_csv`.
  *
  * The decoders are projection builders, not a connector: the reference
  * separates "where bytes come from" (kafka/redis plugins) from "how
  * bytes become rows" (this module), and Spark's own kafka source has
  * the same shape — a `value: binary` column the user decodes with
  * exactly these projections, batch or streaming alike.
  */
object RecordDecoders {

  import ColumnBridge.{toCol, toExpr}

  /** RAW field: `raw(bin, BIGINT, "LONG", "8")` reads the big-endian
    * long at byte 8. `mapping` is `"start"` or `"start:end"`
    * (`RawColumnDecoder.MAPPING_PATTERN`); varchar fields default to
    * the message tail, fixed-width fields to `start + size`. */
  def raw(bin: Column, target: DataType, dataFormat: String = "BYTE",
      mapping: String = "0"): Column =
    toCol(RawField(toExpr(bin), dataFormat, mapping, target))

  /** JSON field: slash-path mapping plus the reference's dated-format
    * decoders. `dataFormat` "" = plain cast (DefaultJsonFieldDecoder);
    * `formatHint` only for `custom-date-time` (Joda-style pattern,
    * passed through — the common letters coincide with Spark's). */
  def jsonField(msg: Column, mapping: String, target: DataType,
      dataFormat: String = "", formatHint: String = null): Column = {
    val path = "$." + mapping.split('/').mkString(".")
    val v = get_json_object(msg, path)
    dataFormat match {
      case "" => v.cast(target)
      case "iso8601" => to_timestamp(v).cast(target)
      case "seconds-since-epoch" => timestamp_seconds(v.cast(LongType)).cast(target)
      case "milliseconds-since-epoch" => timestamp_millis(v.cast(LongType)).cast(target)
      case "rfc2822" =>
        // "EEE MMM dd HH:mm:ss Z yyyy" (RFC2822JsonFieldDecoder.java:51);
        // Spark >= 3 forbids day-of-week letters in PARSE patterns
        // (formatting keeps them), and the day name carries no date
        // information — strip it and parse the rest.
        to_timestamp(regexp_replace(v, "^[A-Za-z]{3} ", ""),
          "MMM dd HH:mm:ss Z yyyy").cast(target)
      case "custom-date-time" =>
        require(formatHint != null,
          "custom-date-time requires a formatHint pattern")
        to_timestamp(v, formatHint).cast(target)
      case other =>
        throw new IllegalArgumentException(s"unknown dataFormat '$other'")
    }
  }

  /** CSV message: positional decode onto `schema`'s fields. */
  def csvRow(msg: Column, schema: StructType): Column =
    from_csv(msg, schema, Map.empty[String, String])

  /** Avro message (single-record object-container form, the shape the
    * reference's `AvroRowDecoder.decodeRow` consumes): one struct per
    * message, typed from `schemaJson`. */
  def avroRow(msg: Column, schemaJson: String): Column =
    toCol(AvroDecode(toExpr(msg), schemaJson))
}

/** Single-record Avro container decode — `AvroRowDecoder` semantics
  * (`presto-record-decoder/.../avro/AvroRowDecoder.java:57-81`): each
  * message is an Avro object-container (DataFileStream) holding EXACTLY
  * one record — zero or extra records raise loudly. Types map the way
  * the reference's AvroColumnDecoder does: int/long → BIGINT,
  * float/double → DOUBLE, string/enum → VARCHAR, bytes/fixed →
  * VARBINARY, records/arrays/maps structurally; `[null, T]` unions are
  * nullable T, any other union is rejected at construction.
  *
  * The expensive part is per-message container parsing — the same cost
  * the reference pays per kafka message; spark-avro's `from_avro` is
  * not in this distribution (only avro-core ships), so the decode is a
  * CodegenFallback expression over `GenericDatumReader`, one virtual
  * call per row with a JIT-compiled body (the WordShingles stance). */
case class AvroDecode(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema =
    new org.apache.avro.Schema.Parser().parse(schemaJson)
  @transient private lazy val reader =
    new org.apache.avro.generic.GenericDatumReader[
      org.apache.avro.generic.GenericRecord](schema)

  private def toSpark(s: org.apache.avro.Schema): DataType = {
    import org.apache.avro.Schema.Type._
    s.getType match {
      case BOOLEAN => BooleanType
      case INT | LONG => LongType
      case FLOAT | DOUBLE => DoubleType
      case STRING | ENUM => StringType
      case BYTES | FIXED => BinaryType
      case RECORD => StructType(s.getFields.toArray.map {
        case f: org.apache.avro.Schema.Field =>
          StructField(f.name(), toSpark(f.schema()))
      })
      case ARRAY => ArrayType(toSpark(s.getElementType))
      case MAP => MapType(StringType, toSpark(s.getValueType))
      case UNION =>
        val branches = s.getTypes.toArray.toSeq
          .map(_.asInstanceOf[org.apache.avro.Schema])
        val nonNull = branches.filter(_.getType != NULL)
        require(branches.size - nonNull.size <= 1 && nonNull.size == 1,
          s"unsupported avro union ${s}: only [null, T] unions decode")
        toSpark(nonNull.head)
      case other =>
        throw new IllegalArgumentException(s"unsupported avro type $other")
    }
  }

  override def prettyName: String = "avro_row"
  override lazy val dataType: DataType = toSpark(schema)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("avro_row needs a binary message")

  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (b: java.lang.Boolean, BooleanType) => b.booleanValue()
    case (n: Number, LongType) => n.longValue()
    case (n: Number, DoubleType) => n.doubleValue()
    case (s, StringType) => UTF8String.fromString(s.toString)
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (f: org.apache.avro.generic.GenericFixed, BinaryType) => f.bytes().clone()
    case (r: org.apache.avro.generic.GenericRecord, st: StructType) =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        st.fields.map(f => convert(r.get(f.name), f.dataType)): Array[Any])
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        l.toArray.map(convert(_, et)))
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      val entries = m.entrySet().toArray
        .map(_.asInstanceOf[java.util.Map.Entry[_, _]])
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        entries.map(e => UTF8String.fromString(e.getKey.toString)),
        entries.map(e => convert(e.getValue, vt)))
    case (other, t) => throw new IllegalStateException(
      s"cannot convert ${other.getClass.getName} to ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val stream = new org.apache.avro.file.DataFileStream(
      new java.io.ByteArrayInputStream(bytes), reader)
    try {
      if (!stream.hasNext) throw new IllegalStateException(
        "No avro record found")
      val rec = stream.next()
      if (stream.hasNext) throw new IllegalStateException(
        "Unexpected extra record found")
      convert(rec, dataType)
    } finally stream.close()
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fixed-offset big-endian field decode — `RawColumnDecoder` semantics:
  *
  *   - dataFormat ∈ BYTE/SHORT/INT/LONG/FLOAT/DOUBLE (default BYTE)
  *     names the PHYSICAL width; the target SQL type constrains which
  *     widths are legal exactly as `checkFieldTypeOneOf` does (BIGINT
  *     accepts BYTE..LONG, INTEGER BYTE..INT, ..., DOUBLE only
  *     FLOAT/DOUBLE, VARCHAR only BYTE).
  *   - mapping `start[:end]`; a varchar with no end reads to the
  *     message tail. A ZERO-LENGTH slice decodes NULL
  *     (`RawValueProvider.isNull`); offsets past the message end and
  *     a slice shorter than the field width raise loudly
  *     (`decodeField` / `checkEnoughBytes`), surfaced per-row so a
  *     TRY(...) wrapper can absorb them like any Presto scalar error.
  *
  * CodegenFallback with a primitive-only eval body (one virtual call
  * per row, JIT-compiled loop) — the WordShingles stance; fine in a
  * projection, and the decode feeds codegen'd consumers.
  */
case class RawField(child: Expression, dataFormat: String, mapping: String,
    target: DataType) extends UnaryExpression with CodegenFallback {

  private val fieldSize: Int = dataFormat.toUpperCase match {
    case "BYTE" => 1
    case "SHORT" => 2
    case "INT" => 4
    case "LONG" => 8
    case "FLOAT" => 4
    case "DOUBLE" => 8
    case other =>
      throw new IllegalArgumentException(s"invalid dataFormat '$other'")
  }
  private val fmt = dataFormat.toUpperCase

  // checkFieldTypeOneOf (RawColumnDecoder.java:173-183)
  private val allowed: Set[String] = target match {
    case StringType => Set("BYTE")
    case LongType => Set("BYTE", "SHORT", "INT", "LONG")
    case IntegerType => Set("BYTE", "SHORT", "INT")
    case ShortType => Set("BYTE", "SHORT")
    case ByteType => Set("BYTE")
    case BooleanType => Set("BYTE", "SHORT", "INT", "LONG")
    case DoubleType => Set("FLOAT", "DOUBLE")
    case other =>
      throw new IllegalArgumentException(
        s"unsupported column type [${other.simpleString}] for raw decode")
  }
  require(allowed.contains(fmt),
    s"wrong dataFormat '$fmt' for ${target.simpleString} column; " +
      s"implies use of ${allowed.mkString("/")}")

  private val (start: Int, endOpt: Option[Int]) = {
    val m = java.util.regex.Pattern.compile("(\\d+)(?::(\\d+))?")
      .matcher(mapping)
    require(m.matches(), s"invalid mapping format '$mapping'")
    val s = m.group(1).toInt
    val e =
      if (m.group(2) != null) Some(m.group(2).toInt)
      else if (target != StringType) Some(s + fieldSize)
      else None
    (s, e)
  }

  override def prettyName: String = "raw_field"
  override def dataType: DataType = target
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"raw_field needs a binary message, got " +
        child.dataType.simpleString)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val len = bytes.length
    val actualEnd = endOpt.getOrElse(len)
    if (start > len) throw new IllegalStateException(
      s"start offset $start must be less than or equal to value length $len")
    if (actualEnd > len) throw new IllegalStateException(
      s"end offset $actualEnd must be less than or equal to value length $len")
    val size = actualEnd - start
    if (size == 0) return null
    if (target == StringType)
      return UTF8String.fromBytes(bytes, start, size)
    if (size < fieldSize) throw new IllegalStateException(
      s"not enough bytes to decode $fmt at offset $start: have $size")
    val buf = ByteBuffer.wrap(bytes, start, size)
    val asLong: Long = fmt match {
      case "BYTE" => buf.get().toLong
      case "SHORT" => buf.getShort().toLong
      case "INT" => buf.getInt().toLong
      case "LONG" => buf.getLong()
      case _ => 0L // FLOAT/DOUBLE handled below
    }
    target match {
      case BooleanType => asLong != 0L
      case LongType => asLong
      case IntegerType => asLong.toInt
      case ShortType => asLong.toShort
      case ByteType => asLong.toByte
      case DoubleType =>
        if (fmt == "FLOAT") buf.getFloat().toDouble else buf.getDouble()
      case _ => null // unreachable; constructor validated
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in distributed batches.
  *
  * The reference stores media the same way (varbinary columns,
  * `presto-main/.../type/VarbinaryType` + the varbinary function family);
  * the pipeline shapes here — schema, partition-parallel batch decode,
  * fixed-stride frame sampling — are what a training-data pipeline runs
  * over image/audio/video at 100 TB.
  *
  * The actual image/audio codec is STUBBED (`FakeDecoder`): the container
  * has no media libraries, so decode is a deterministic byte-histogram
  * "feature extractor". Everything around it is real: the binary column,
  * the typed `Dataset[MediaRow]` encoder, the `mapPartitions` batch loop
  * (one decoder instance per partition — the shape a JNI/codec handle
  * needs), and the frame-sampling expressions.
  *
  * Scale: decode is per-row map work with no shuffle; a real deployment
  * tunes `spark.sql.files.maxPartitionBytes` so one partition's media fits
  * in executor memory, and the histogram/feature math rides the same
  * partition-parallel path as this fake.
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  case class MediaRow(doc_id: Long, mime: String, n_bytes: Long,
                      media: Array[Byte])

  /** Extracted features: fixed-width vector + scalar stats. */
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                           histogram: Array[Long], feat_norm: Double)

  /** Decoder contract — a real deployment binds an image/audio codec
    * here; one instance per partition (see `extractFeatures`). */
  trait Decoder extends Serializable {
    def decode(media: Array[Byte]): Array[Long]
  }

  /** Deterministic stand-in for the codec: a 16-bin byte histogram
    * (bin = unsigned byte >> 4). Chosen because the differential oracle
    * can replay it from the source text with character-class counts. */
  object FakeDecoder extends Decoder {
    override def decode(media: Array[Byte]): Array[Long] = {
      val hist = new Array[Long](16)
      var i = 0
      while (i < media.length) {
        hist((media(i) & 0xff) >> 4) += 1
        i += 1
      }
      hist
    }
  }

  /** The `documents` corpus as a media table: utf-8 bytes as the opaque
    * binary column (the fixtures ship no real media), mime from source. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.view(spark, dir, "documents")
      .select(col("doc_id"),
        concat(lit("text/plain;src="), col("source")).as("mime"),
        col("n_chars").as("n_bytes"),
        encode(col("text"), "UTF-8").as("media"))

  /** Partition-parallel batch decode: one `Decoder` per partition, rows
    * streamed through it — the Scala analog of a pandas-batch UDF. */
  def extractFeatures(media: Dataset[MediaRow],
                      mkDecoder: () => Decoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = mkDecoder()
      rows.map { r =>
        val hist = decoder.decode(r.media)
        val norm = math.sqrt(hist.map(h => h.toDouble * h).sum)
        MediaFeatures(r.doc_id, r.mime, r.n_bytes, hist, norm)
      }
    }
  }

  /** Fixed-stride frame sampling: byte-range "frames" of `frameBytes`,
    * every `stride`-th kept — pure expressions, no decode needed.
    * (For video this is the keyframe-subsample shape; offsets would come
    * from the container index instead of a fixed stride.) */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames",
        ceil(col("n_bytes").cast("double") / frameBytes).cast("long"))
      // n_frames = 0 must yield no rows: sequence(0, -1) would produce a
      // DESCENDING [0, -1] (Spark defaults to step -1 when start > stop)
      // and emit a phantom empty frame.
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0L), col("n_frames") - 1),
          i => i % stride === 0)))
      .withColumn("frame", expr(
        s"substr(media, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)"))
}

/** `media_dimensions(binary)` — REAL container-header parsing over the
  * opaque media column (no codec library needed: image dimensions live
  * in the first bytes of every common container):
  *
  *  - PNG (`\x89PNG\r\n\x1a\n` signature): IHDR width/height as
  *    big-endian int32 at offsets 16/20
  *  - BMP (`BM`): DIB header-size field at offset 14 picks the layout —
  *    BITMAPINFOHEADER+ (>= 40) int32 width/height at 18/22 (top-down
  *    negative heights reported as magnitude), BITMAPCOREHEADER (12)
  *    uint16 width/height at 18/20; other DIB sizes → NULL
  *  - GIF (`GIF8`): logical-screen width/height as little-endian
  *    uint16 at offsets 6/8
  *  - JPEG (`\xFF\xD8` SOI, r10): a real marker walk — segments are
  *    `FF marker len16` (length includes itself); standalone markers
  *    (TEM, RST0-7) carry no length; the first frame header in the SOF
  *    family (C0-CF except DHT C4, JPG C8, DAC CC) carries precision,
  *    then big-endian uint16 height/width. Walks past APPn/DQT/COM the
  *    way every real file requires; malformed lengths, a missing SOF,
  *    or truncation → NULL.
  *  - MP4 / ISO-BMFF video (`ftyp` at offset 4, r10): a nested box
  *    walk — boxes are `size32 type4` — to `moov` → first `trak` →
  *    `tkhd`, whose presentation width/height sit as 16.16 fixed-point
  *    uint32s at version-dependent offsets (v0: 76/80; v1: 88/92 from
  *    the box payload). The track-header walk every container tool
  *    performs; size-0/size-1 (to-end / 64-bit) boxes and truncation →
  *    NULL.
  *
  * Unrecognized or truncated bytes → NULL (a corrupt blob must not
  * kill a 100 TB scan). Returns struct<format, width, height> — the
  * metadata a pipeline filters on (resolution gates, aspect-ratio
  * buckets) before ever paying a full decode. */
case class MediaDimensions(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  override def prettyName: String = "media_dimensions"
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary, got ${dt.catalogString}")
    }

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    def row(fmt: String, w: Int, h: Int): InternalRow =
      InternalRow(UTF8String.fromString(fmt), w, h)
    if (b.length >= 24 &&
        b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a)
      row("png", be32(b, 16), be32(b, 20))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      // The DIB header-size field at offset 14 discriminates header
      // generations: >= 40 (BITMAPINFOHEADER and successors) carries
      // int32 width/height at 18/22 — height negative for top-down
      // bitmaps, reported as its magnitude; exactly 12
      // (BITMAPCOREHEADER, OS/2 1.x) carries uint16 width/height at
      // 18/20. Anything else is not a layout this parser knows → NULL.
      val dib = le32(b, 14)
      if (dib >= 40) {
        val h = le32(b, 22)
        val w = le32(b, 18)
        // BMP spec: width is strictly positive (only height may be
        // negative, meaning top-down); a non-positive width is garbage
        if (h == Int.MinValue || w <= 0) null
        else row("bmp", w, math.abs(h))
      } else if (dib == 12) {
        // same strictly-positive validation as the 40-byte arm: a
        // garbage core-header blob must NULL, not report width 0
        val w = le16(b, 18); val h = le16(b, 20)
        if (w <= 0 || h <= 0) null else row("bmp", w, h)
      } else null
    }
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8')
      row("gif", le16(b, 6), le16(b, 8))
    else if (b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' &&
        b(7) == 'p') {
      // ISO-BMFF box walk: top level → moov → first trak → tkhd
      def findBox(name: String, from: Int, until: Int): Int = {
        var i = from
        while (i + 8 <= until) {
          val size = be32(b, i)
          if (size < 8 || i + size > until) return -1 // incl. size 0/1
          if (b(i + 4) == name(0) && b(i + 5) == name(1) &&
              b(i + 6) == name(2) && b(i + 7) == name(3)) return i
          i += size
        }
        -1
      }
      val moov = findBox("moov", 0, b.length)
      if (moov < 0) return null
      val moovEnd = moov + be32(b, moov)
      val trak = findBox("trak", moov + 8, moovEnd)
      if (trak < 0) return null
      val tkhd = findBox("tkhd", trak + 8, trak + be32(b, trak))
      if (tkhd < 0) return null
      val ver = b(tkhd + 8) & 0xff
      val wOff = tkhd + 8 + (if (ver == 1) 88 else 76)
      if (ver > 1 || wOff + 8 > tkhd + be32(b, tkhd)) return null
      // 16.16 fixed point; integer part only
      val w = be32(b, wOff) >>> 16
      val h = be32(b, wOff + 4) >>> 16
      if (w <= 0 || h <= 0) null else row("mp4", w, h)
    }
    else if (b.length >= 4 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte) {
      // JPEG marker walk to the first SOF frame header
      var i = 2
      while (i + 3 < b.length) {
        if (b(i) != 0xff.toByte) return null
        val m = b(i + 1) & 0xff
        if (m == 0xff) i += 1 // fill bytes before a marker are legal
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
        else if (m == 0xd9) return null // EOI before any SOF
        else {
          val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
          if (len < 2 || i + 2 + len > b.length) return null
          val sof = m >= 0xc0 && m <= 0xcf &&
            m != 0xc4 && m != 0xc8 && m != 0xcc
          if (sof) {
            if (len < 7) return null
            val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
            val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
            if (w <= 0 || h <= 0) return null
            return row("jpeg", w, h)
          }
          i += 2 + len
        }
      }
      null
    }
    else null
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

/** `media_audio_info(binary)` — the audio counterpart of
  * [[MediaDimensions]]: WAV (RIFF/WAVE) fmt-chunk fields straight from
  * the canonical header layout — channels as little-endian uint16 at
  * offset 22, sample rate as little-endian uint32 at 24, bits per
  * sample at 34. NULL on anything that is not a RIFF/WAVE blob or is
  * truncated. Returns struct<sample_rate, channels, bits> — the
  * metadata an audio pipeline filters on (rate/channel gates) before
  * decoding samples. */
case class MediaAudioInfo(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types._

  override def prettyName: String = "media_audio_info"
  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary, got ${dt.catalogString}")
    }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    if (b.length >= 36 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E' &&
        b(12) == 'f' && b(13) == 'm' && b(14) == 't' && b(15) == ' ')
      InternalRow(le32(b, 24), le16(b, 22), le16(b, 34))
    else if (b.length >= 22 &&
        b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C' &&
        (b(4) & 0x7f) == 0) {
      // FLAC (r10): the mandatory first metadata block is STREAMINFO
      // (type 0 in the block header at offset 4); its packed bit
      // layout puts sample rate (20 bits), channels-1 (3), bits-1 (5)
      // at STREAMINFO offsets 10-12 — i.e. file offsets 18-21.
      val rate = ((b(18) & 0xff) << 12) | ((b(19) & 0xff) << 4) |
        ((b(20) & 0xff) >> 4)
      val channels = ((b(20) >> 1) & 0x7) + 1
      val bits = (((b(20) & 1) << 4) | ((b(21) & 0xff) >> 4)) + 1
      if (rate <= 0) null else InternalRow(rate, channels, bits)
    }
    else null
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

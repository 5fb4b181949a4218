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

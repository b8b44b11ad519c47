package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star ops): image/audio/video as
  * opaque binary columns with typed metadata, processed by typed
  * partition-wise pipelines.
  *
  * The decode step is a clearly-marked deterministic STUB (this
  * container has no image/audio codecs); everything Spark-owns —
  * schema, binary transport, partition-wise batch processing, typed
  * encoders — is real and tested. Swapping [[decodeStub]] for a real
  * codec (JNI/FFI per partition) changes no plumbing.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, checksum: Long)

  /** STUB decoder: deterministic pseudo-features from the payload.
    * A real implementation would decode the image/audio frame here —
    * same signature, same partition-wise batching. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.payload.length
    var ck = 0L
    var i = 0
    while (i < n) { ck = ck * 131L + (r.payload(i) & 0xFF); i += 1 }
    MediaFeatures(r.media_id, r.kind, n, 64 + n % 640, 64 + n % 480, ck)
  }

  /** Partition-wise feature extraction over a typed Dataset — the
    * mapInPandas-equivalent batch shape: one iterator per partition,
    * so a real decoder amortizes model/codec init per partition, not
    * per row. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model load)
      rows.map(decodeStub)
    }
  }

  /** One sampled video frame with its resize target. */
  case class SampledFrame(media_id: Long, frame_idx: Int, frame_ms: Int,
      rw: Int, rh: Int)

  /** Aspect-preserving resize bound (integer arithmetic — deterministic
    * and oracle-reproducible): scale the longer side to `maxSide`. */
  def resizeDims(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxSide) (w, h)
    else (w * maxSide / m, h * maxSide / m)
  }

  /** Frame sampling + resize over media rows, partition-wise (the
    * mapInPandas batch shape). Frame count and dimensions come from
    * the same STUB arithmetic as [[decodeStub]] — a real container
    * parser slots in per partition with no plumbing change; each
    * media row fans out to every `stride`-th frame at 25 fps. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int,
      maxSide: Int): Dataset[SampledFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (demuxer/codec handles)
      rows.flatMap { r =>
        val f = decodeStub(r)
        val nFrames = 1 + f.n_bytes % 240
        val (rw, rh) = resizeDims(f.width, f.height, maxSide)
        (0 until nFrames by stride).iterator
          .map(i => SampledFrame(r.media_id, i, i * 40, rw, rh))
      }
    }
  }

  /** Build a media table from documents: payload = UTF-8 bytes of the
    * text (stand-in for real image bytes; schema/transport identical). */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        concat(lit("img_"), col("lang")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }
}

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

  // ── Real decode path (q44c): binary PPM, the one image format a
  // bare JVM can decode. The fixture ENCODES an actual P6 byte stream
  // per document — ASCII header + 3-byte RGB raster, pixel values a
  // deterministic function of (id, x, y) so the oracle can enumerate
  // the same pixels — and the decode step PARSES it back: a real
  // header tokenizer and raster walk, not a checksum. Codec-dependent
  // formats (JPEG/H.264) keep the documented [[decodeStub]]; this
  // path proves the partition-wise plumbing end-to-end with features
  // derived from decoded pixels.

  /** Pixel-derived features: dimensions from the parsed header,
    * per-channel sums from the decoded raster. */
  case class PixelFeatures(media_id: Long, width: Int, height: Int,
      r_sum: Long, g_sum: Long, b_sum: Long)

  /** Deterministic P6 encoder — the fixture's "camera". */
  def encodePpm(id: Long, w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(i) = ((id + 7L * x + 13L * y) % 256).toByte
        out(i + 1) = ((id * 3L + 5L * x + 11L * y) % 256).toByte
        out(i + 2) = ((id * 5L + 3L * x + 17L * y) % 256).toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Real P6 parser: whitespace-tokenized header (magic, dims,
    * maxval), then the raw RGB raster. Throws on malformed input —
    * it is a decoder, not a fingerprint. */
  def decodePpm(id: Long, bytes: Array[Byte]): PixelFeatures = {
    var pos = 0
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def token(): String = {
      while (pos < bytes.length && isWs(bytes(pos))) pos += 1
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      new String(bytes, start, pos - start,
        java.nio.charset.StandardCharsets.US_ASCII)
    }
    require(token() == "P6", "not a binary PPM (P6) stream")
    val w = token().toInt
    val h = token().toInt
    require(token().toInt == 255, "unsupported maxval")
    pos += 1 // exactly one whitespace byte separates header from raster
    require(bytes.length - pos == w * h * 3,
      s"truncated raster: ${bytes.length - pos} bytes for ${w}x$h")
    var r = 0L; var g = 0L; var b = 0L
    var i = pos
    while (i < bytes.length) {
      r += bytes(i) & 0xFF; g += bytes(i + 1) & 0xFF; b += bytes(i + 2) & 0xFF
      i += 3
    }
    PixelFeatures(id, w, h, r, g, b)
  }

  /** Media table with REAL image payloads: one P6 per document,
    * dimensions 8–16 × 8–14 derived from the id (oracle-mirrorable). */
  def fromDocumentsPpm(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id, "img_ppm", encodePpm(id, (8 + id % 9).toInt, (8 + id % 7).toInt))
    }
  }

  /** Partition-wise REAL decode — the same batch shape as
    * [[extractFeatures]], with an actual parser in the hot spot. */
  def extractPixelFeatures(media: Dataset[MediaRow]): Dataset[PixelFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, buffers)
      rows.map(r => decodePpm(r.media_id, r.payload))
    }
  }

  /** Audio features from decoded PCM: format fields from the parsed
    * RIFF header, per-channel |sample| sums + global peak from the
    * sample walk. */
  case class AudioFeatures(media_id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, l_abs_sum: Long, r_abs_sum: Long, peak: Int)

  /** Deterministic 16-bit stereo PCM WAV encoder — the fixture's
    * "microphone". Interleaved sample i (frame·2 + channel) takes the
    * int16 value ((id·31 + i·7) mod 65536) − 32768, restated verbatim
    * by the oracle. Standard 44-byte RIFF/WAVE/fmt/data layout. */
  def encodeWav(id: Long, nFrames: Int, sampleRate: Int = 8000): Array[Byte] = {
    val n = nFrames * 2
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    bb.put("RIFF".getBytes(ascii)).putInt(36 + dataLen)
      .put("WAVE".getBytes(ascii))
    bb.put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1)                       // PCM
      .putShort(2)                       // stereo
      .putInt(sampleRate)
      .putInt(sampleRate * 2 * 2)        // byte rate
      .putShort(4)                       // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes(ascii)).putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((id * 31L + i * 7L) % 65536L) - 32768L).toShort)
      i += 1
    }
    bb.array()
  }

  /** Real RIFF parser: validates RIFF/WAVE, then WALKS THE CHUNK LIST
    * (fmt then data, skipping unknown chunks — the part naive offset-44
    * readers get wrong on files with LIST/INFO chunks), checks the PCM
    * format fields, then folds the interleaved int16 samples into
    * per-channel stats. Throws on malformed input — a decoder, not a
    * fingerprint. */
  def decodeWav(id: Long, bytes: Array[Byte]): AudioFeatures = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b)
      new String(b, java.nio.charset.StandardCharsets.US_ASCII)
    }
    require(fourcc() == "RIFF", "not a RIFF stream")
    bb.getInt() // riff payload length
    require(fourcc() == "WAVE", "not a WAVE form")
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataStart = -1; var dataLen = -1
    while (bb.remaining() >= 8 && dataStart < 0) {
      val ck = fourcc(); val len = bb.getInt()
      ck match {
        case "fmt " =>
          val end = bb.position() + len
          require(bb.getShort() == 1, "not PCM")
          channels = bb.getShort()
          sampleRate = bb.getInt()
          bb.getInt(); bb.getShort() // byte rate, block align
          bits = bb.getShort()
          bb.position(end + (len & 1)) // chunks are word-aligned
        case "data" =>
          dataStart = bb.position(); dataLen = len
        case _ =>
          bb.position(bb.position() + len + (len & 1)) // skip unknown chunk
      }
    }
    require(sampleRate > 0 && dataStart >= 0, "missing fmt /data chunk")
    require(bits == 16 && channels == 2, "unsupported PCM layout")
    require(dataLen % 4 == 0 && dataStart + dataLen <= bytes.length,
      s"truncated data chunk: $dataLen bytes from $dataStart")
    var l = 0L; var r = 0L; var peak = 0
    var i = 0
    val n = dataLen / 2
    bb.position(dataStart)
    while (i < n) {
      val s = bb.getShort().toInt
      val a = math.abs(s)
      if ((i & 1) == 0) l += a else r += a
      if (a > peak) peak = a
      i += 1
    }
    AudioFeatures(id, sampleRate, channels, n / 2, l, r, peak)
  }

  /** Media table with REAL audio payloads: one stereo WAV per
    * document, 64–127 frames derived from the id (oracle-mirrorable). */
  def fromDocumentsWav(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id, "audio_wav", encodeWav(id, (64 + id % 64).toInt))
    }
  }

  /** Partition-wise real audio decode — [[extractPixelFeatures]]'
    * audio twin. */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(r => decodeWav(r.media_id, r.payload)))
  }
}

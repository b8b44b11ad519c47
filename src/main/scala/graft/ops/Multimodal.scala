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

  /** Parse a P6 header: whitespace-tokenized (magic, dims, maxval).
    * Returns (width, height, raster offset). Throws on malformed
    * input — a parser, not a fingerprint. */
  private def parsePpmHeader(bytes: Array[Byte]): (Int, Int, Int) = {
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
    (w, h, pos)
  }

  /** Real P6 parser: header + raster walk into per-channel sums. */
  def decodePpm(id: Long, bytes: Array[Byte]): PixelFeatures = {
    val (w, h, pos) = parsePpmHeader(bytes)
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
  def encodeWav(id: Long, nFrames: Int, sampleRate: Int = 8000): Array[Byte] =
    buildWav(nFrames, sampleRate)(i =>
      (((id * 31L + i * 7L) % 65536L) - 32768L).toInt)

  /** Standard 44-byte RIFF/WAVE/fmt/data layout around an interleaved
    * int16 sample generator — shared by both fixture encoders. */
  private def buildWav(nFrames: Int, sampleRate: Int)(
      sample: Int => Int): Array[Byte] = {
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
      bb.putShort(sample(i).toShort)
      i += 1
    }
    bb.array()
  }

  /** The shared RIFF chunk walk: validates RIFF/WAVE, walks the chunk
    * list (fmt then data, skipping unknown chunks — the part naive
    * offset-44 readers get wrong on files with LIST/INFO chunks),
    * checks the PCM layout, and returns (sampleRate, channels,
    * dataStart, dataLen). Throws on malformed input — a parser, not a
    * fingerprint. Backs [[decodeWav]], [[gainWav]] and
    * [[audioFingerprint64]]. */
  private def walkWav(bytes: Array[Byte]): (Int, Int, Int, Int) = {
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
    (sampleRate, channels, dataStart, dataLen)
  }

  /** Real RIFF decode ([[walkWav]]) folding the interleaved int16
    * samples into per-channel |sample| sums and the global peak. */
  def decodeWav(id: Long, bytes: Array[Byte]): AudioFeatures = {
    val (sampleRate, channels, dataStart, dataLen) = walkWav(bytes)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
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

  // ── Perceptual-hash image near-dup (q44e): the multimodal twin of
  // q41c's SimHash. dHash over the DECODED raster — integer luma,
  // nearest-neighbor 9×8 downsample, 64 horizontal neighbor
  // comparisons packed into an int64 — then the exact q41c machinery:
  // 16-bit-chunk Hamming blocking + bit_count verify. Every step is
  // integer-exact, so the whole pipeline duck-hash-checks like q41c.
  //
  // The q44e fixture uses a QUADRATIC texture (squared linear form mod
  // 256) instead of q44c's linear ramps: a dHash bit is the sign of a
  // local luma gradient, and under q44c's arithmetic that gradient is
  // constant almost everywhere (adjacent-pixel deltas are fixed
  // residues mod 256), which would collapse every image to nearly the
  // same hash. The squared form's deltas vary with (id, x, y), giving
  // distinct images independent-looking hashes while a re-encoded /
  // brightness-shifted variant stays within a few bits.

  /** Deterministic textured P6 encoder — the q44e fixture's camera.
    * Channel values are squared linear forms mod 256 (see above). */
  def encodePpmTextured(id: Long, w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    def sq(v: Long): Byte = ((v * v) % 256).toByte
    var i = header.length
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(i) = sq(id + 31L * x + 17L * y)
        out(i + 1) = sq(id * 3L + 29L * x + 19L * y)
        out(i + 2) = sq(id * 5L + 23L * x + 37L * y)
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Media table with textured payloads: one P6 per document,
    * dimensions 16–32 × 12–24 (big enough that the 9×8 downsample
    * actually downsamples). */
  def fromDocumentsPpmTextured(spark: SparkSession,
      docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id, "img_ppm_tex",
        encodePpmTextured(id, (16 + id % 17).toInt, (12 + id % 13).toInt))
    }
  }

  /** REAL image transform over the binary payload: parse the P6
    * header, clamp-add `delta` to every raster byte, re-emit the
    * stream — the brightness shift a re-encode pipeline applies. The
    * near-dup fixture's variants are produced by THIS transform on the
    * actual bytes, not re-synthesized. */
  def brightenPpm(bytes: Array[Byte], delta: Int): Array[Byte] = {
    val (_, _, off) = parsePpmHeader(bytes)
    val out = java.util.Arrays.copyOf(bytes, bytes.length)
    var i = off
    while (i < out.length) {
      out(i) = math.min((out(i) & 0xFF) + delta, 255).toByte
      i += 1
    }
    out
  }

  /** dHash: decode, integer luma (299r+587g+114b)/1000, sample a 9×8
    * grid nearest-neighbor (px = gx·(w−1)/8, py = gy·(h−1)/7 in
    * integer division), set bit gy·8+gx when luma rises left→right.
    * Brightness shifts cancel exactly in the comparison except where a
    * channel clamps at 255 — a near-identical variant lands within a
    * few bits, so the q41c chunk blocking finds it (pigeonhole). */
  def dHash64(bytes: Array[Byte]): Long = {
    val (w, h, off) = parsePpmHeader(bytes)
    def luma(px: Int, py: Int): Int = {
      val i = off + (py * w + px) * 3
      (299 * (bytes(i) & 0xFF) + 587 * (bytes(i + 1) & 0xFF) +
        114 * (bytes(i + 2) & 0xFF)) / 1000
    }
    var hash = 0L
    var gy = 0
    while (gy < 8) {
      val py = gy * (h - 1) / 7
      var gx = 0
      while (gx < 8) {
        if (luma(gx * (w - 1) / 8, py) < luma((gx + 1) * (w - 1) / 8, py))
          hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Partition-wise dHash extraction → the (doc, simhash) relation
    * [[Dedup.simHashNearDups]] blocks and verifies — the decode is the
    * per-row hot spot (the justified mapPartitions, as q44c), the
    * candidate/verify stages are the shared relational machinery. */
  def perceptualHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows =>
        rows.map(r => (r.media_id, dHash64(r.payload))))
      .toDF("doc", "simhash")
  }

  // ── Audio near-dup (q44f): the q44e pattern on q44d's decoder. A
  // per-window ENERGY-SIGN fingerprint over decoded PCM — 65 equal
  // frame windows, window energy = Σ|sample| over both channels, bit
  // b set when energy rises window b → b+1 — packed into an int64 and
  // fed to the exact q41c machinery (16-bit-chunk Hamming blocking +
  // bit_count verify). A GAIN transform scales every window energy by
  // the same monotone map, so adjacent-energy comparisons survive it
  // except where int16 clamping bites — a re-mastered variant lands a
  // few bits from its base while distinct streams' quadratic textures
  // give independent energy walks (the q44e lesson: q44d's LINEAR
  // sample ramp has near-constant window-energy deltas and would
  // collapse the fingerprint, so the q44f fixture squares the form).
  // Integer-exact end-to-end; the oracle replays sample → window →
  // sign → pack → block → verify from the texture arithmetic.

  /** Deterministic TEXTURED stereo WAV — q44f's microphone.
    * Interleaved sample i = ((id·31 + i·7)² mod 33000) − 16500, range
    * ±16500 so a ×2 gain clamps only the ~0.7% loudest samples (the
    * few-bit perturbation the near-dup must absorb). Frame count is
    * 65·wlen — exactly 65 fingerprint windows, no tail. */
  def encodeWavTextured(id: Long, wlen: Int,
      sampleRate: Int = 8000): Array[Byte] =
    buildWav(65 * wlen, sampleRate) { i =>
      val q = id * 31L + i * 7L
      (((q * q) % 33000L) - 16500L).toInt
    }

  /** Media table with textured audio payloads: one stereo WAV per
    * document, window length 4–8 frames derived from the id
    * (oracle-mirrorable). */
  def fromDocumentsWavTextured(spark: SparkSession,
      docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id, "audio_wav_tex",
        encodeWavTextured(id, (4 + id % 5).toInt))
    }
  }

  /** REAL audio transform over the binary payload: walk the RIFF
    * chunks, multiply every int16 sample by `gain` with int16
    * clamping, re-emit the stream — the re-master/normalization step
    * an audio pipeline applies. The near-dup fixture's variants are
    * produced by THIS transform on the actual bytes. */
  def gainWav(bytes: Array[Byte], gain: Int): Array[Byte] = {
    val (_, _, dataStart, dataLen) = walkWav(bytes)
    val out = java.util.Arrays.copyOf(bytes, bytes.length)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var p = dataStart
    val end = dataStart + dataLen
    while (p < end) {
      val s = math.min(math.max(gain * bb.getShort(p).toInt, -32768), 32767)
      bb.putShort(p, s.toShort)
      p += 2
    }
    out
  }

  /** The 64-bit energy-sign fingerprint: decode ([[walkWav]]), split
    * the frame sequence into 65 equal windows (tail beyond 65·wlen
    * ignored; the fixture has none), window energy = Σ|sample| over
    * both channels, bit gy set when energy rises into the next
    * window. Gain shifts scale all energies monotonically, so the
    * comparisons survive re-mastering except at clamp sites. */
  def audioFingerprint64(bytes: Array[Byte]): Long = {
    val (_, _, dataStart, dataLen) = walkWav(bytes)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val wlen = (dataLen / 4) / 65 // frames per window
    require(wlen > 0, "too few frames for a 65-window fingerprint")
    val energies = new Array[Long](65)
    var j = 0
    while (j < 65) {
      var acc = 0L
      val base = dataStart + j * wlen * 4 // 2 samples/frame × 2 bytes
      var k = 0
      while (k < 2 * wlen) {
        acc += math.abs(bb.getShort(base + 2 * k).toInt)
        k += 1
      }
      energies(j) = acc
      j += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (energies(b) < energies(b + 1)) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** Partition-wise fingerprint extraction → the (doc, simhash)
    * relation [[Dedup.simHashNearDups]] blocks and verifies —
    * [[perceptualHashes]]' audio twin. */
  def audioFingerprints(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows =>
        rows.map(r => (r.media_id, audioFingerprint64(r.payload))))
      .toDF("doc", "simhash")
  }
}

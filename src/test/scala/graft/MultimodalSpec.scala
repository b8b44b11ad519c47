package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRow

/** The real (non-stub) multimodal decode path: a binary PPM (P6)
  * payload must round-trip encoder → opaque bytes → parser with
  * features derived from the DECODED raster, and the parser must
  * reject malformed streams instead of fingerprinting them. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("P6 round-trip: decoded channel sums equal the analytic pixel sums") {
    for (id <- Seq(0L, 1L, 7L, 123L, 4096L)) {
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val f = Multimodal.decodePpm(id, Multimodal.encodePpm(id, w, h))
      // dims come from the PARSED header, not the caller
      assert((f.width, f.height) == (w, h))
      def want(a: Long, bx: Long, by: Long): Long =
        (for (y <- 0 until h; x <- 0 until w)
          yield (a + bx * x + by * y) % 256).sum
      assert(f.r_sum == want(id, 7, 13), s"r mismatch for id=$id")
      assert(f.g_sum == want(id * 3, 5, 11), s"g mismatch for id=$id")
      assert(f.b_sum == want(id * 5, 3, 17), s"b mismatch for id=$id")
    }
  }

  test("P6 parser rejects malformed streams") {
    val ok = Multimodal.encodePpm(5L, 8, 8)
    // wrong magic
    val badMagic = ok.clone(); badMagic(1) = '5'
    intercept[IllegalArgumentException](Multimodal.decodePpm(5L, badMagic))
    // truncated raster
    intercept[IllegalArgumentException](
      Multimodal.decodePpm(5L, ok.dropRight(1)))
    // not an image at all
    intercept[IllegalArgumentException](
      Multimodal.decodePpm(5L, "hello world".getBytes))
  }

  test("distributed decode equals a driver-side decode of every payload") {
    val docs = Tables.documents(spark, sf).select("doc_id").limit(64)
    val media = Multimodal.fromDocumentsPpm(spark, docs)
    val viaSpark = Multimodal.extractPixelFeatures(media)
      .collect().sortBy(_.media_id).toSeq
    val direct = media.collect().sortBy(_.media_id)
      .map(r => Multimodal.decodePpm(r.media_id, r.payload)).toSeq
    assert(viaSpark == direct)
    // the payloads really are opaque binary image bytes in transit
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
  }

  test("WAV round-trip: hand-computed channel sums, peak and header fields") {
    // id=5, 2 frames → interleaved samples ((5·31 + i·7) mod 65536) − 32768:
    // i=0: −32613 (L), i=1: −32606 (R), i=2: −32599 (L), i=3: −32592 (R)
    val f = Multimodal.decodeWav(5L, Multimodal.encodeWav(5L, nFrames = 2))
    assert(f.sample_rate == 8000 && f.channels == 2 && f.n_frames == 2)
    assert(f.l_abs_sum == 32613L + 32599L)
    assert(f.r_abs_sum == 32606L + 32592L)
    assert(f.peak == 32613)
  }

  test("WAV parser walks the chunk list (unknown chunk before data) and rejects junk") {
    // splice a LIST chunk between fmt and data — a naive offset-44
    // reader would read garbage; the chunk walker must skip it
    val base = Multimodal.encodeWav(9L, nFrames = 3)
    val expected = Multimodal.decodeWav(9L, base)
    val list = java.nio.ByteBuffer.allocate(14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    list.put("LIST".getBytes("US-ASCII")).putInt(6)
      .put("INFOab".getBytes("US-ASCII"))
    val spliced = java.nio.ByteBuffer
      .allocate(base.length + 14).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    spliced.put(base, 0, 36)              // RIFF..fmt chunk end
      .put(list.array())                  // foreign chunk
      .put(base, 36, base.length - 36)    // data chunk
    // patch the RIFF payload length for the extra 14 bytes
    spliced.putInt(4, base.length - 8 + 14)
    val viaWalk = Multimodal.decodeWav(9L, spliced.array())
    assert(viaWalk == expected, "chunk walker must skip the LIST chunk")
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(1L, "RIFFxxxxJUNK".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // truncated data chunk
      Multimodal.decodeWav(9L, base.dropRight(6))
    }
  }
  test("brightenPpm is a real raster transform: header preserved, bytes clamp-added") {
    val img = Multimodal.encodePpmTextured(5L, 20, 15)
    val bright = Multimodal.brightenPpm(img, 40)
    val f0 = Multimodal.decodePpm(5L, img)
    val f1 = Multimodal.decodePpm(5L, bright)
    assert(f1.width == f0.width && f1.height == f0.height)
    // every channel sum rises by ≤ 40·pixels, with equality only if no
    // byte clamped; this fixture clamps some (values near 255 exist)
    val px = f0.width.toLong * f0.height
    assert(f1.r_sum > f0.r_sum && f1.r_sum <= f0.r_sum + 40 * px)
    assert(f1.g_sum > f0.g_sum && f1.g_sum <= f0.g_sum + 40 * px)
    // byte-level law on the raster: out = min(in + 40, 255)
    val header = s"P6\n20 15\n255\n".length
    (header until img.length).foreach { i =>
      assert((bright(i) & 0xFF) == math.min((img(i) & 0xFF) + 40, 255))
    }
  }

  test("dHash: brightness shift stays within a few bits; distinct images are far") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val a = Multimodal.dHash64(Multimodal.encodePpmTextured(12L, 24, 18))
    val aBright = Multimodal.dHash64(
      Multimodal.brightenPpm(Multimodal.encodePpmTextured(12L, 24, 18), 40))
    assert(ham(a, aBright) <= 6,
      s"brightness variant drifted ${ham(a, aBright)} bits")
    // distinct ids under the quadratic texture: independent-looking
    // hashes — far outside the match threshold for this pinned pair
    val b = Multimodal.dHash64(Multimodal.encodePpmTextured(13L, 24, 18))
    assert(ham(a, b) > 12, s"distinct images only ${ham(a, b)} bits apart")
  }

  test("perceptual near-dup pipeline: variant matched to its base, distinct pair unmatched") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id").limit(40)
    val base = Multimodal.fromDocumentsPpmTextured(spark, docs)
    val variants = base.filter($"media_id" % 4 === 0)
      .map(r => MediaRow(r.media_id + 1000000L, r.kind,
        Multimodal.brightenPpm(r.payload, 40)))
    val pairs = graft.ops.Dedup.simHashNearDups(
      Multimodal.perceptualHashes(base.unionByName(variants)), maxHamming = 12)
      .as[(Long, Long, Int)].collect()
    val expected = variants.select("media_id").as[Long].collect()
      .map(v => (v - 1000000L, v)).toSet
    assert(expected.nonEmpty)
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(expected.subsetOf(got),
      s"missing variant-base pairs: ${expected.diff(got)}")
    assert(got == expected,
      s"unexpected cross-image matches: ${got.diff(expected)}")
  }

  test("gainWav is a real PCM transform: header preserved, samples clamp-doubled") {
    val wav = Multimodal.encodeWavTextured(12L, 6)
    val loud = Multimodal.gainWav(wav, 2)
    assert(loud.length == wav.length)
    // header bytes untouched (44-byte canonical layout here)
    assert(java.util.Arrays.equals(loud.slice(0, 44), wav.slice(0, 44)))
    // sample-level law: out = clamp(2·in) over the int16 range
    val in = java.nio.ByteBuffer.wrap(wav)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = java.nio.ByteBuffer.wrap(loud)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (44 until wav.length by 2).foreach { p =>
      val expect = math.min(math.max(2 * in.getShort(p).toInt, -32768), 32767)
      assert(out.getShort(p).toInt == expect, s"sample at $p")
    }
  }

  test("audio fingerprint: gain variant stays within a few bits; distinct streams are far") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val a = Multimodal.audioFingerprint64(Multimodal.encodeWavTextured(12L, 6))
    val aLoud = Multimodal.audioFingerprint64(
      Multimodal.gainWav(Multimodal.encodeWavTextured(12L, 6), 2))
    assert(ham(a, aLoud) <= 6,
      s"gain variant drifted ${ham(a, aLoud)} bits")
    val b = Multimodal.audioFingerprint64(Multimodal.encodeWavTextured(13L, 6))
    assert(ham(a, b) > 12, s"distinct streams only ${ham(a, b)} bits apart")
  }

  test("audio near-dup pipeline: gain variant matched to its base, distinct pair unmatched") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id").limit(40)
    val base = Multimodal.fromDocumentsWavTextured(spark, docs)
    val variants = base.filter($"media_id" % 4 === 0)
      .map(r => MediaRow(r.media_id + 1000000L, r.kind,
        Multimodal.gainWav(r.payload, 2)))
    val pairs = graft.ops.Dedup.simHashNearDups(
      Multimodal.audioFingerprints(base.unionByName(variants)), maxHamming = 12)
      .as[(Long, Long, Int)].collect()
    val expected = variants.select("media_id").as[Long].collect()
      .map(v => (v - 1000000L, v)).toSet
    assert(expected.nonEmpty)
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(expected.subsetOf(got),
      s"missing variant-base pairs: ${expected.diff(got)}")
    assert(got == expected,
      s"unexpected cross-stream matches: ${got.diff(expected)}")
  }
}

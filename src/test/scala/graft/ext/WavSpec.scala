package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Native WAV/PCM decode: pack→decode round-trip and malformed-input
  * rejection (pure byte parsing, no codec dependency).
  */
class WavSpec extends AnyFunSuite {

  test("pack-decode round-trip preserves samples, rate, and bit depth") {
    val samples = Array(-1000, -1, 0, 1, 999, 32767, -32768)
    val bytes = Multimodal.wavPack(samples, 8000)
    val got = Multimodal.decodeWav(bytes).get
    assert(got.sampleRate == 8000)
    assert(got.channels == 1)
    assert(got.bitsPerSample == 16)
    assert(got.samples.toSeq == samples.toSeq)
  }

  test("decode walks past unknown chunks to find fmt/data") {
    val base = Multimodal.wavPack(Array(5, -5), 44100)
    // splice a LIST chunk between WAVE and fmt
    val extra = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
    val spliced = base.take(12) ++ extra.array() ++ base.drop(12)
    // fix RIFF size
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val got = Multimodal.decodeWav(spliced).get
    assert(got.samples.toSeq == Seq(5, -5))
  }

  test("malformed inputs are rejected, not crashed on") {
    assert(Multimodal.decodeWav(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeWav("RIFFxxxxWAVE".getBytes).isEmpty)
    val good = Multimodal.wavPack(Array(1, 2, 3), 8000)
    assert(Multimodal.decodeWav(good.take(30)).isEmpty) // truncated
    // non-PCM format code rejected
    val bad = good.clone()
    bad(20) = 3 // IEEE float format
    assert(Multimodal.decodeWav(bad).isEmpty)
  }

  test("resamplePcm: identity copies, downsample floor-picks, upsample repeats") {
    val a = Multimodal.PcmAudio(8000, 1, 16, Array(10, 20, 30, 40, 50, 60, 70, 80))
    assert(Multimodal.resamplePcm(a, 8000).samples.toSeq == a.samples.toSeq)
    // 8000→2000: n2 = 2, sample j reads ⌊j·4⌋ → indices 0, 4
    val down = Multimodal.resamplePcm(a, 2000)
    assert(down.sampleRate == 2000 && down.samples.toSeq == Seq(10, 50))
    // 8000→16000: every source sample appears twice
    val up = Multimodal.resamplePcm(a, 16000)
    assert(up.samples.toSeq == a.samples.toSeq.flatMap(s => Seq(s, s)))
  }

  test("8-bit unsigned samples decode centered at zero") {
    // hand-build an 8-bit mono WAV: samples 0,128,255 → -128,0,127
    val data = Array[Byte](0, 128.toByte, 255.toByte)
    val bb = java.nio.ByteBuffer.allocate(44 + 3).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 3).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
      .put("data".getBytes).putInt(3).put(data)
    val got = Multimodal.decodeWav(bb.array()).get
    assert(got.bitsPerSample == 8)
    assert(got.samples.toSeq == Seq(-128, 0, 127))
  }
}

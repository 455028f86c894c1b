package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import MediaContainers._

/** Container-level MP3 / MP4 parsing: frame arithmetic against the
  * published MPEG tables, pack→parse round-trips, Xing/ID3 handling,
  * ISO-BMFF box walking, and malformed-input rejection.
  */
class MediaContainersSpec extends AnyFunSuite {

  // --- MP3 frame header arithmetic (known-good real-world headers) ------

  test("the canonical 0xFFFB9000 header: MPEG1 LIII 128 kbps 44.1 kHz stereo, 417-byte frame") {
    // FF FB 90 00 is the most common CBR frame header on the planet
    val hdr = Array(0xff, 0xfb, 0x90, 0x00).map(_.toByte)
    val f = parseMp3Frame(hdr, 0).get
    assert(f.versionId == 3 && f.layer == 3)
    assert(f.bitrateKbps == 128 && f.sampleRate == 44100)
    assert(f.channels == 2 && f.padding == 0)
    assert(f.frameBytes == 417) // 144 * 128000 / 44100 = 417 (floor)
    assert(f.samplesPerFrame == 1152)
  }

  test("padding adds one byte (LIII) or one 4-byte slot (LI)") {
    val noPad = parseMp3Frame(Array(0xff, 0xfb, 0x90, 0x00).map(_.toByte), 0).get
    val pad = parseMp3Frame(Array(0xff, 0xfb, 0x92, 0x00).map(_.toByte), 0).get
    assert(pad.frameBytes == noPad.frameBytes + 1)
    // Layer I, 32 kbps, 32 kHz: (12*32000/32000 + 1) * 4 = 52
    val l1 = parseMp3Frame(Array(0xff, 0xff, 0x1a, 0x00).map(_.toByte), 0).get
    assert(l1.layer == 1 && l1.bitrateKbps == 32 && l1.sampleRate == 32000)
    assert(l1.frameBytes == (12 * 32000 / 32000 + 1) * 4)
    assert(l1.samplesPerFrame == 384)
  }

  test("MPEG2 Layer III uses the low-rate table and 576 samples per frame") {
    // version 10 (MPEG2), layer III, bitrate idx 4 -> 32 kbps, 22.05 kHz
    val f = parseMp3Frame(Array(0xff, 0xf3, 0x40, 0xc0).map(_.toByte), 0).get
    assert(f.versionId == 2 && f.bitrateKbps == 32 && f.sampleRate == 22050)
    assert(f.samplesPerFrame == 576 && f.channels == 1)
    assert(f.frameBytes == 576 / 8 * 32000 / 22050) // 104
  }

  test("reserved version/layer, free-format and bad indices are rejected") {
    assert(parseMp3Frame(Array(0xff, 0xeb, 0x90, 0x00).map(_.toByte), 0).isEmpty) // version 01
    assert(parseMp3Frame(Array(0xff, 0xf9, 0x90, 0x00).map(_.toByte), 0).isEmpty) // layer 00
    assert(parseMp3Frame(Array(0xff, 0xfb, 0x00, 0x00).map(_.toByte), 0).isEmpty) // free format
    assert(parseMp3Frame(Array(0xff, 0xfb, 0xf0, 0x00).map(_.toByte), 0).isEmpty) // idx 15
    assert(parseMp3Frame(Array(0xff, 0xfb, 0x9c, 0x00).map(_.toByte), 0).isEmpty) // srIdx 3
    assert(parseMp3Frame(Array(0xfe, 0xfb, 0x90, 0x00).map(_.toByte), 0).isEmpty) // no sync
  }

  // --- MP3 stream walk --------------------------------------------------

  test("pack→walk round-trip: frame count, duration, CBR mode") {
    val bytes = mp3Pack(versionId = 3, layer = 3, srIdx = 0, mono = false,
      frames = Seq.fill(30)((9, 0))) // 30 x 128 kbps
    val m = parseMp3(bytes).get
    assert(m.nFrames == 30 && m.sampleRate == 44100 && m.channels == 2)
    assert(m.bitrateKbps == 128.0 && m.mode == "CBR" && m.xingFrames.isEmpty)
    assert(math.abs(m.durationMs - 30 * 1152000.0 / 44100) < 1e-9)
    assert(m.id3Bytes == 0)
  }

  test("ID3v2 tag is skipped and measured; Xing tag flips mode to VBR") {
    val bytes = mp3Pack(versionId = 3, layer = 3, srIdx = 0, mono = true,
      frames = Seq.fill(25)((9, 0)), id3Pad = 77, xingDeclared = Some(25))
    val m = parseMp3(bytes).get
    assert(m.id3Bytes == 87) // 10-byte header + 77 pad
    assert(m.nFrames == 25 && m.xingFrames.contains(25) && m.mode == "VBR")
  }

  test("'Info' tag (LAME's CBR marker) keeps mode CBR but carries the count") {
    // real-world CBR files written by LAME carry an Info-tagged header at
    // the Xing position — tag name, not header presence, decides VBR
    val bytes = mp3Pack(versionId = 3, layer = 3, srIdx = 0, mono = true,
      frames = Seq.fill(25)((9, 0)), xingDeclared = Some(25), xingTag = "Info")
    val m = parseMp3(bytes).get
    assert(m.mode == "CBR" && m.xingFrames.contains(25))
    // …but varying bitrates override the Info marker
    val mixed = mp3Pack(3, 3, 0, mono = true,
      frames = Seq((9, 0), (12, 0), (9, 0), (9, 0), (9, 0)),
      xingDeclared = Some(5), xingTag = "Info")
    assert(parseMp3(mixed).get.mode == "VBR")
  }

  test("varying per-frame bitrate walks correctly and averages") {
    val idx = Seq(2, 5, 9, 12) // 40, 64, 128, 224 kbps in MPEG1 LIII
    val bytes = mp3Pack(3, 3, 0, mono = false, frames = idx.map((_, 0)))
    val m = parseMp3(bytes).get
    assert(m.nFrames == 4)
    assert(m.bitrateKbps == (40 + 64 + 128 + 224) / 4.0)
    assert(m.mode == "VBR")
  }

  test("alternating padding bits still chain frame-to-frame") {
    val bytes = mp3Pack(3, 3, 0, mono = false,
      frames = (0 until 21).map(i => (9, i % 2)))
    assert(parseMp3(bytes).get.nFrames == 21)
  }

  test("leading garbage resyncs; random bytes and a lone false sync parse to None") {
    val good = mp3Pack(3, 3, 0, mono = false, frames = Seq.fill(5)((9, 0)))
    val m = parseMp3(Array[Byte](1, 2, -1, 3) ++ good).get
    assert(m.nFrames == 5)
    val rng = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val junk = Array.fill(rng.nextInt(300))(rng.nextInt(256).toByte)
      parseMp3(junk) // must not throw; may legitimately find frames in noise
    }
    assert(parseMp3(Array.empty[Byte]).isEmpty)
  }

  // --- MP4 --------------------------------------------------------------

  test("mp4 pack→parse round-trip recovers movie header and both tracks") {
    val bytes = mp4Pack(600, 6000, Seq(
      (1L, "vide", "avc1", 90000L, 240L, 3750L, 555L, 10L, 320, 240),
      (2L, "soun", "mp4a", 44100L, 430L, 1024L, 222L, 0L, 0, 0)))
    val m = parseMp4(bytes).get
    assert(m.majorBrand == "isom")
    assert(m.movieTimescale == 600 && m.movieDuration == 6000)
    assert(m.tracks.length == 2)
    val v = m.tracks.find(_.handler == "vide").get
    assert(v.trackId == 1 && v.codec == "avc1" && v.timescale == 90000)
    assert(v.nSamples == 240 && v.sampleBytes == 240 * 555 && v.nSync == 10)
    assert(v.totalDelta == 240L * 3750)
    assert(v.width == 320.0 && v.height == 240.0)
    val a = m.tracks.find(_.handler == "soun").get
    assert(a.trackId == 2 && a.codec == "mp4a" && a.nSync == 0)
    assert(a.totalDelta == 430L * 1024 && a.sampleBytes == 430 * 222)
  }

  test("largesize (size==1) and to-EOF (size==0) boxes are honored") {
    val bytes = mp4Pack(600, 600, Seq(
      (1L, "vide", "avc1", 90000L, 24L, 3750L, 100L, 1L, 64, 64)))
    // rewrite ftyp as a largesize box: shift payload, set size=1 + 64-bit size
    val ftypLen = java.nio.ByteBuffer.wrap(bytes).getInt
    val rest = bytes.drop(ftypLen)
    val bb = java.nio.ByteBuffer.allocate(ftypLen + 8)
    bb.putInt(1).put("ftyp".getBytes("US-ASCII")).putLong(ftypLen + 8L)
      .put(bytes.slice(8, ftypLen))
    val m = parseMp4(bb.array() ++ rest).get
    assert(m.majorBrand == "isom" && m.tracks.length == 1)
    // make the trailing mdat a size==0 (to EOF) box
    val bytes2 = bytes.clone()
    val mdatOff = bytes2.length - 24
    java.nio.ByteBuffer.wrap(bytes2).putInt(mdatOff, 0)
    assert(parseMp4(bytes2).get.tracks.length == 1)
  }

  test("crafted oversize box lengths are rejected, not allocated") {
    val bytes = mp4Pack(600, 600, Seq(
      (1L, "vide", "avc1", 90000L, 24L, 3750L, 100L, 1L, 64, 64)))
    val evil = bytes.clone()
    java.nio.ByteBuffer.wrap(evil).putInt(0, Int.MaxValue) // ftyp claims 2 GiB
    assert(parseMp4(evil).isEmpty)
    assert(parseMp4(Array.empty[Byte]).isEmpty)
    assert(parseMp4("notanmp4file".getBytes).isEmpty)
    val rng = new scala.util.Random(11)
    (0 until 50).foreach { _ =>
      parseMp4(Array.fill(rng.nextInt(400))(rng.nextInt(256).toByte)) // no throw
    }
  }

  test("truncated stream parses to None or a clean prefix, never throws") {
    val bytes = mp3Pack(3, 3, 0, mono = false, frames = Seq.fill(8)((9, 0)))
    (1 until bytes.length by 37).foreach { n => parseMp3(bytes.take(n)) }
    val mp4 = mp4Pack(600, 600, Seq(
      (1L, "vide", "avc1", 90000L, 24L, 3750L, 100L, 1L, 64, 64)))
    (1 until mp4.length by 41).foreach { n => parseMp4(mp4.take(n)) }
  }
}

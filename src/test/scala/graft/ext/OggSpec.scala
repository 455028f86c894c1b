package graft.ext

/** OGG container walk ([[MediaContainers.parseOgg]] / [[MediaContainers.oggPack]]):
  * CRC-verified pages, lacing reassembly (255-splits, zero terminator,
  * continuation across pages), BOS codec identification, robustness.
  */
class OggSpec extends graft.SparkSpec {
  import MediaContainers._

  test("pack/parse round trip: pages, packets, granule, vorbis id") {
    val packets = Seq(
      vorbisIdPacket(channels = 2, rate = 44100),
      Array.fill[Byte](510)(3), // exactly 2*255: needs the 0 terminator
      Array.fill[Byte](100)(4),
      Array.fill[Byte](300)(5))
    val ogg = oggPack(packets, serial = 77, Seq(0L, 0L, 960L, 1920L))
    val m = parseOgg(ogg).get
    assert(m.nPackets == 4)
    assert(m.serial == 77 && m.lastGranule == 1920L)
    assert(m.codec == "vorbis" && m.channels == 2 && m.sampleRate == 44100)
  }

  test("packets spanning page boundaries reassemble (continued flag)") {
    val big = Array.tabulate[Byte](255 * 5 + 17)(i => (i % 101).toByte)
    val ogg = oggPack(Seq(vorbisIdPacket(1, 8000), big), serial = 9,
      Seq(0L, 4711L), maxSegsPerPage = 2)
    val m = parseOgg(ogg).get
    assert(m.nPackets == 2 && m.lastGranule == 4711L)
    assert(m.nPages >= 3, s"small pages must force continuation (${m.nPages})")
  }

  test("opus and FLAC-in-Ogg mapping headers identify") {
    val opus = oggPack(Seq(opusHeadPacket(2, 312, 48000)), 1, Seq(0L))
    val mo = parseOgg(opus).get
    assert(mo.codec == "opus" && mo.channels == 2 &&
      mo.sampleRate == 48000 && mo.preSkip == 312)
    val flacStream = FlacCodec.encode(
      Array(Array.tabulate(64)(i => i * 3 - 90)), 32000, blockSize = 64)
    val head = Array[Byte](0x7f, 0x46, 0x4c, 0x41, 0x43, 1, 0, 0, 1) ++
      flacStream.take(42)
    val mf = parseOgg(oggPack(Seq(head), 2, Seq(0L))).get
    assert(mf.codec == "flac" && mf.channels == 1 && mf.sampleRate == 32000)
  }

  test("CRC corruption rejects the page") {
    val ogg = oggPack(Seq(vorbisIdPacket(1, 44100), Array.fill[Byte](64)(9)),
      5, Seq(0L, 100L))
    assert(parseOgg(ogg).isDefined)
    val bad = ogg.clone()
    bad(ogg.length - 10) = (bad(ogg.length - 10) ^ 0x40).toByte
    assert(parseOgg(bad).isEmpty)
  }

  test("crafted inputs never throw") {
    assert(parseOgg(Array.empty[Byte]).isEmpty)
    assert(parseOgg("OggS".getBytes).isEmpty)
    val rnd = new scala.util.Random(3)
    (0 until 50).foreach { _ =>
      val junk = new Array[Byte](256)
      rnd.nextBytes(junk)
      junk(0) = 'O'; junk(1) = 'g'; junk(2) = 'g'; junk(3) = 'S'
      parseOgg(junk): Unit
    }
  }
}

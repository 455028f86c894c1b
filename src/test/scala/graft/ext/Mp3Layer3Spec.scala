package graft.ext

/** MPEG-1 Layer III decode pipeline ([[Mp3Layer3]]) against the in-repo
  * encoder ([[Mp3Encoder]]):
  *  - codebook validation: exactly the documented usable set is
  *    prefix-free + Kraft-complete; unavailable tables are inert;
  *  - the pure filterbank (analysis → MDCT → IMDCT → synthesis) is a
  *    near-inverse pair: ≥30 dB PSNR at ~unit gain, quantization off;
  *  - full codec round trips (mono single tone, mono multi-tone, stereo
  *    with distinct channels) clear PSNR floors through the 4-bit
  *    table-15 quantizer;
  *  - bitstream robustness: garbage input, truncated streams, and frames
  *    selecting an unavailable codebook decode to None / stop cleanly.
  */
class Mp3Layer3Spec extends graft.SparkSpec {

  private val sr = 44100

  private def tone(freqs: (Double, Double)*)(n: Int): Array[Double] =
    Array.tabulate(n)(i =>
      freqs.map { case (f, a) => a * math.sin(2 * math.Pi * f * i / sr) }.sum)

  test("huffman codebooks: usable + normative sets are exactly the documented ones") {
    // 0/4/14 code nothing; everything else decodes (11/13/16-31 via the
    // in-repo canonical stand-ins)
    val expectUsable = (0 until 32).toSet -- Set(0, 4, 14)
    val actual = Mp3Tables.big.zipWithIndex.collect {
      case (t, i) if t.usable => i
    }.toSet
    assert(actual == expectUsable)
    // ISO-normative bit patterns remain exactly the validated set
    val normative = Mp3Tables.big.zipWithIndex.collect {
      case (t, i) if t.usable && t.normative => i
    }.toSet
    assert(normative == Set(1, 2, 3, 5, 6, 7, 8, 9, 10, 12, 15))
    // the 16- and 24-families share their trees and carry the ISO linbits
    assert((16 to 23).map(Mp3Tables.big(_).linbits) == Seq(1, 2, 3, 4, 6, 8, 10, 13))
    assert((24 to 31).map(Mp3Tables.big(_).linbits) == Seq(4, 5, 6, 7, 8, 9, 11, 13))
    assert((17 to 23).forall(i => Mp3Tables.big(i).len.sameElements(Mp3Tables.big(16).len)))
    assert((25 to 31).forall(i => Mp3Tables.big(i).len.sameElements(Mp3Tables.big(24).len)))
    expectUsable.foreach { i =>
      assert(math.abs(Mp3Tables.big(i).kraft - 1.0) < 1e-9, s"table $i kraft")
    }
    assert(math.abs(Mp3Tables.count1A.kraft - 1.0) < 1e-9)
    // every usable table round-trips every codeword through its trie
    expectUsable.foreach { i =>
      val t = Mp3Tables.big(i)
      (0 until t.len.length).filter(t.len(_) > 0).foreach { sym =>
        var node = 0
        var bit = t.len(sym) - 1
        while (bit >= 0) {
          val b = (t.code(sym) >>> bit) & 1
          val v = t.trie(node * 2 + b)
          if (bit == 0) assert(v == -(sym + 1), s"table $i sym $sym")
          else node = v
          bit -= 1
        }
      }
    }
  }

  test("pure filterbank inverse property: >=30 dB at ~unit gain") {
    val x = tone((441.0, 0.35), (1870.0, 0.25), (5012.0, 0.15))(1152 * 6)
    val out = Mp3Layer3.synthesizeSpectra(Mp3Encoder.forwardSpectra(x))
    val (_, gain, psnr) = Mp3Layer3.fitPsnr(x, out, 1500)
    assert(psnr >= 30.0, s"filterbank psnr $psnr")
    assert(math.abs(gain - 1.0) < 0.05, s"chain gain $gain drifted")
  }

  test("mono single-tone codec round trip >= 24 dB") {
    val x = tone((441.0, 0.5))(1152 * 6)
    val d = Mp3Layer3.decode(Mp3Encoder.encode(x)).get
    assert(d.sampleRate == sr && d.channels == 1 && d.nGranules == 12)
    assert(d.samples.length == 1152 * 6)
    val (_, _, psnr) = Mp3Layer3.fitPsnr(x, d.samples, 1500)
    assert(psnr >= 24.0, s"codec psnr $psnr")
  }

  test("mono multi-tone codec round trip >= 20 dB") {
    val x = tone((441.0, 0.35), (1870.0, 0.25), (5012.0, 0.15))(1152 * 6)
    val d = Mp3Layer3.decode(Mp3Encoder.encode(x)).get
    val (_, _, psnr) = Mp3Layer3.fitPsnr(x, d.samples, 1500)
    assert(psnr >= 20.0, s"codec psnr $psnr")
  }

  test("stereo: channels decode independently, each >= 20 dB") {
    val l = tone((441.0, 0.5))(1152 * 4)
    val r = tone((1336.0, 0.4))(1152 * 4)
    val d = Mp3Layer3.decode(Mp3Encoder.encodeStereo(l, r)).get
    assert(d.channels == 2)
    assert(d.samples.length == 1152 * 4 * 2)
    val dl = Array.tabulate(1152 * 4)(i => d.samples(2 * i))
    val dr = Array.tabulate(1152 * 4)(i => d.samples(2 * i + 1))
    val (_, _, pl) = Mp3Layer3.fitPsnr(l, dl, 1500)
    val (_, _, pr) = Mp3Layer3.fitPsnr(r, dr, 1500)
    assert(pl >= 20.0, s"left psnr $pl")
    assert(pr >= 20.0, s"right psnr $pr")
    // cross-check: left signal must NOT fit the right channel
    val (_, _, cross) = Mp3Layer3.fitPsnr(l, dr, 1500)
    assert(cross < 10.0, s"channel bleed: cross psnr $cross")
  }

  test("garbage and truncation are rejected or stop cleanly") {
    assert(Mp3Layer3.decode(Array.fill[Byte](256)(0x55)).isEmpty)
    assert(Mp3Layer3.decode(Array.empty[Byte]).isEmpty)
    // fuzz: valid header prefix + deterministic pseudo-random payloads
    // must reject or decode, never throw
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val junk = new Array[Byte](1044 * 2)
      rnd.nextBytes(junk)
      junk(0) = 0xff.toByte; junk(1) = 0xfb.toByte // MPEG1 L3 sync
      junk(2) = 0xe0.toByte; junk(3) = 0xc0.toByte // 320kbps 44.1 mono
      Mp3Layer3.decode(junk): Unit // must not throw
    }
    val x = tone((441.0, 0.5))(1152 * 6)
    val enc = Mp3Encoder.encode(x)
    // cut mid-frame: whole frames before the cut still decode
    val cut = Mp3Layer3.decode(enc.take(enc.length - 100))
    assert(cut.isDefined && cut.get.nGranules >= 8)
  }

  test("ESC round trip: a high-crest signal selects an escape table, PSNR holds") {
    // a near-full-scale tone over a whisper-level one: the 4-bit cap of
    // table 15 costs the quiet partial; the ESC cap keeps both
    val x = tone((441.0, 0.95), (3000.0, 0.002))(1152 * 4)
    val escEnc = Mp3Encoder.encode(x, escTables = true)
    // the stream genuinely uses a non-normative ESC table: the default
    // decode refuses it...
    assert(Mp3Layer3.decode(escEnc).isEmpty)
    // ...and the opted-in decode round-trips with fidelity
    val d = Mp3Layer3.decode(escEnc, allowNonNormative = true)
    assert(d.isDefined)
    val (_, _, psnr) = Mp3Layer3.fitPsnr(x, d.get.samples, 1500)
    assert(psnr >= 24.0, s"esc psnr $psnr")
    // finer quantization beats the table-15 cap on the same signal
    val plainDec = Mp3Layer3.decode(Mp3Encoder.encode(x)).get
    val (_, _, plainPsnr) = Mp3Layer3.fitPsnr(x, plainDec.samples, 1500)
    assert(psnr > plainPsnr + 3.0,
      s"esc $psnr dB should beat capped $plainPsnr dB")
  }

  test("ESC linbits boundary: quantized value exactly 15 escapes with zero linbits") {
    // amplitude tuned so the peak quantizes into [15, 30): the escape
    // symbol fires with small linbits payloads including zero
    val x = tone((441.0, 0.9))(1152 * 2)
    val enc = Mp3Encoder.encode(x, escTables = true)
    val viaEsc = Mp3Layer3.decode(enc, allowNonNormative = true)
    assert(viaEsc.isDefined)
    val (_, _, psnr) = Mp3Layer3.fitPsnr(x, viaEsc.get.samples, 1500)
    assert(psnr >= 24.0, s"boundary psnr $psnr")
  }

  test("a frame selecting an unavailable codebook decodes to None") {
    val x = tone((441.0, 0.5))(1152 * 2)
    val enc = Mp3Encoder.encode(x)
    // granule 0's first table_select sits at a fixed offset in the mono
    // layout: header(32) + mdb(9)+priv(5)+scfsi(4) + p23(12)+bv(9)+gg(8)+
    // sfc(4)+ws(1) = 84 bits after the header -> bit 116; overwrite the
    // 5-bit field with 13 (a structurally-unavailable table)
    val bad = enc.clone()
    def setBit(bit: Int, v: Int): Unit = {
      val mask = 1 << (7 - (bit & 7))
      if (v == 1) bad(bit >>> 3) = (bad(bit >>> 3) | mask).toByte
      else bad(bit >>> 3) = (bad(bit >>> 3) & ~mask).toByte
    }
    val tsel = 13
    var i = 0
    while (i < 5) { setBit(116 + i, (tsel >>> (4 - i)) & 1); i += 1 }
    assert(Mp3Layer3.decode(bad).isEmpty)
  }

  test("container-synthesized LSF frames decode as silence, never as fake signal") {
    // the container-synthesized MPEG-2 frames (MediaContainers.synthesizeMp3
    // id%3==0 shape) carry an all-zero side-info/payload: since the LSF
    // face landed that IS a valid silent stream (part2_3_length 0 per
    // granule) — it must decode to exact silence, never to garbage
    val lsf = MediaContainers.mp3Pack(2, 3, 0, mono = true,
      frames = Seq.fill(4)((5, 0)))
    val d = Mp3Layer3.decode(lsf)
    assert(d.forall(_.samples.forall(_ == 0.0)))
    assert(MediaContainers.parseMp3(lsf).isDefined)
  }

  test("MPEG-2 LSF round trip: one granule per frame at 22050, >= 24 dB") {
    val sr = 22050
    val n = 576 * 8
    val x = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 441.0 * i / sr))
    val enc = Mp3Encoder.encodeLsf(x, sampleRate = sr)
    // normative codebooks only: NO opt-in needed
    val d = Mp3Layer3.decode(enc)
    assert(d.isDefined)
    assert(d.get.sampleRate == sr && d.get.channels == 1)
    assert(d.get.nGranules >= 6) // one granule per frame
    val (_, _, psnr) = Mp3Layer3.fitPsnr(x, d.get.samples, 1500)
    assert(psnr >= 24.0, s"lsf psnr $psnr")
  }

  test("MPEG-2 LSF + ESC escape tables compose (opt-in decode)") {
    val sr = 24000
    val x = Array.tabulate(576 * 6)(i =>
      0.95 * math.sin(2 * math.Pi * 441.0 * i / sr) +
        0.002 * math.sin(2 * math.Pi * 1632.0 * i / sr))
    val enc = Mp3Encoder.encodeLsf(x, sampleRate = sr, escTables = true)
    assert(Mp3Layer3.decode(enc).isEmpty) // non-normative refusal holds
    val d = Mp3Layer3.decode(enc, allowNonNormative = true)
    assert(d.isDefined)
    val (_, _, psnr) = Mp3Layer3.fitPsnr(x, d.get.samples, 1500)
    assert(psnr >= 24.0, s"lsf esc psnr $psnr")
  }

  test("MPEG-2 LSF stereo: channels decode independently, each >= 20 dB") {
    val sr = 22050
    val n = 576 * 8
    val l = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 441.0 * i / sr))
    val r = Array.tabulate(n)(i => 0.4 * math.sin(2 * math.Pi * 1336.0 * i / sr))
    val d = Mp3Layer3.decode(Mp3Encoder.encodeLsfStereo(l, r, sampleRate = sr)).get
    assert(d.sampleRate == sr && d.channels == 2)
    val half = d.samples.length / 2
    val dl = Array.tabulate(half)(i => d.samples(2 * i))
    val dr = Array.tabulate(half)(i => d.samples(2 * i + 1))
    val (_, _, pl) = Mp3Layer3.fitPsnr(l, dl, 1500)
    val (_, _, pr) = Mp3Layer3.fitPsnr(r, dr, 1500)
    assert(pl >= 20.0, s"lsf left psnr $pl")
    assert(pr >= 20.0, s"lsf right psnr $pr")
    val (_, _, cross) = Mp3Layer3.fitPsnr(l, dr, 1500)
    assert(cross < 10.0, s"lsf channel bleed: cross psnr $cross")
  }

  test("MPEG-2 LSF short blocks: all-blockType-2 stream round-trips >= 20 dB") {
    val sr = 22050
    val n = 576 * 8
    val x = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 441.0 * i / sr))
    val enc = Mp3Encoder.encodeLsf(x, sampleRate = sr, shortBlocks = true)
    val d = Mp3Layer3.decode(enc) // normative codebooks only
    assert(d.isDefined, "LSF short-block stream must decode")
    val (_, _, psnr) = Mp3Layer3.fitPsnr(x, d.get.samples, 1500)
    assert(psnr >= 20.0, s"lsf short psnr $psnr")
  }

  test("MPEG-2 LSF short-block STEREO round-trips") {
    val sr = 24000
    val n = 576 * 6
    val l = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 441.0 * i / sr))
    val r = Array.tabulate(n)(i => 0.4 * math.sin(2 * math.Pi * 1336.0 * i / sr))
    val d = Mp3Layer3.decode(
      Mp3Encoder.encodeLsfStereo(l, r, sampleRate = sr, shortBlocks = true)).get
    assert(d.channels == 2)
    val half = d.samples.length / 2
    val dl = Array.tabulate(half)(i => d.samples(2 * i))
    val (_, _, pl) = Mp3Layer3.fitPsnr(l, dl, 1500)
    assert(pl >= 20.0, s"lsf short stereo psnr $pl")
  }

  test("MPEG-1 short blocks: mono and stereo all-blockType-2 streams round-trip") {
    val x = tone((441.0, 0.5))(1152 * 4)
    val d = Mp3Layer3.decode(Mp3Encoder.encode(x, shortBlocks = true))
    assert(d.isDefined, "MPEG-1 short-block stream must decode")
    val (_, _, psnr) = Mp3Layer3.fitPsnr(x, d.get.samples, 1500)
    assert(psnr >= 20.0, s"m1 short psnr $psnr")
    val r = tone((1336.0, 0.4))(1152 * 4)
    val ds = Mp3Layer3.decode(Mp3Encoder.encodeStereo(x, r, shortBlocks = true)).get
    assert(ds.channels == 2)
    val half = ds.samples.length / 2
    val dr = Array.tabulate(half)(i => ds.samples(2 * i + 1))
    val (_, _, pr) = Mp3Layer3.fitPsnr(r, dr, 1500)
    assert(pr >= 20.0, s"m1 short stereo right psnr $pr")
  }

  test("transition windows: long/start/short/short/stop cycle round-trips (MPEG-1 + LSF)") {
    val x = tone((441.0, 0.5))(1152 * 6)
    val d1 = Mp3Layer3.decode(Mp3Encoder.encode(x, transitionBlocks = true))
    assert(d1.isDefined, "MPEG-1 transition stream must decode")
    val (_, _, p1) = Mp3Layer3.fitPsnr(x, d1.get.samples, 1500)
    assert(p1 >= 20.0, s"m1 transition psnr $p1")
    val sr2 = 22050
    val y = Array.tabulate(576 * 12)(i =>
      0.5 * math.sin(2 * math.Pi * 441.0 * i / sr2))
    val d2 = Mp3Layer3.decode(
      Mp3Encoder.encodeLsf(y, sampleRate = sr2, transitionBlocks = true))
    assert(d2.isDefined, "LSF transition stream must decode")
    val (_, _, p2) = Mp3Layer3.fitPsnr(y, d2.get.samples, 1500)
    assert(p2 >= 20.0, s"lsf transition psnr $p2")
  }

  test("MIXED blocks: two long subbands + short above round-trip (MPEG-1 + LSF)") {
    // energy in BOTH regions: a low tone living in the long subbands and
    // a high tone in the short region — a mixed-path bug in either half
    // fails the fit
    val x = Array.tabulate(1152 * 4)(i =>
      0.4 * math.sin(2 * math.Pi * 300.0 * i / sr) +
        0.3 * math.sin(2 * math.Pi * 6500.0 * i / sr))
    val d1 = Mp3Layer3.decode(Mp3Encoder.encodeMixed(x))
    assert(d1.isDefined, "MPEG-1 mixed-block stream must decode")
    val (_, _, p1) = Mp3Layer3.fitPsnr(x, d1.get.samples, 1500)
    assert(p1 >= 20.0, s"m1 mixed psnr $p1")
    val sr2 = 22050
    val y = Array.tabulate(576 * 10)(i =>
      0.4 * math.sin(2 * math.Pi * 300.0 * i / sr2) +
        0.3 * math.sin(2 * math.Pi * 3250.0 * i / sr2))
    val d2 = Mp3Layer3.decode(Mp3Encoder.encodeLsfMixed(y, sampleRate = sr2))
    assert(d2.isDefined, "LSF mixed-block stream must decode")
    val (_, _, p2) = Mp3Layer3.fitPsnr(y, d2.get.samples, 1500)
    assert(p2 >= 20.0, s"lsf mixed psnr $p2")
  }

  test("LSF intensity stereo: positions render io^pos ratios, illegal/0 positions copy") {
    val sr2 = 22050
    val n = 576 * 8
    val x = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 441.0 * i / sr2))
    def chans(d: Mp3Layer3.Decoded): (Array[Double], Array[Double]) = {
      val half = d.samples.length / 2
      (Array.tabulate(half)(i => d.samples(2 * i)),
        Array.tabulate(half)(i => d.samples(2 * i + 1)))
    }
    // all positions 0: both channels carry the full signal identically
    val d0 = Mp3Layer3.decode(Mp3Encoder.encodeLsfIntensity(x, sampleRate = sr2,
      positions = _ => 0)).get
    assert(d0.channels == 2)
    val (l0, r0) = chans(d0)
    assert(l0.sameElements(r0), "pos=0 must render identical channels")
    val (_, g0, p0) = Mp3Layer3.fitPsnr(x, l0, 1500)
    assert(p0 >= 24.0, s"pos0 psnr $p0")
    // all positions 1 (odd): LEFT attenuated by io, RIGHT full — the gain
    // ratio measures io directly, for both intensity scales
    for ((scale, io) <- Seq(0 -> math.pow(2.0, -0.25), 1 -> math.pow(2.0, -0.5))) {
      val d1 = Mp3Layer3.decode(Mp3Encoder.encodeLsfIntensity(x, sampleRate = sr2,
        intensityScale = scale, positions = _ => 1)).get
      val (l1, r1) = chans(d1)
      val (_, gl, pl) = Mp3Layer3.fitPsnr(x, l1, 1500)
      val (_, gr2, pr) = Mp3Layer3.fitPsnr(x, r1, 1500)
      assert(pl >= 24.0 && pr >= 24.0, s"scale=$scale psnr $pl/$pr")
      // fitPsnr's gain multiplies the DECODED signal to match the
      // reference, so an io-attenuated left means |gl| = |gr|/io:
      // the ratio gr/gl measures io directly
      val ratio = gr2 / gl
      assert(math.abs(ratio - io) < 0.03,
        s"scale=$scale right/left gain ratio $ratio should be io=$io")
    }
    // illegal position (max code 3 under slen 2) leaves channels as
    // decoded: the empty i-channel stays SILENT, left keeps the signal
    val di = Mp3Layer3.decode(Mp3Encoder.encodeLsfIntensity(x, sampleRate = sr2,
      positions = _ => 3)).get
    val (li, ri) = chans(di)
    val (_, _, pli) = Mp3Layer3.fitPsnr(x, li, 1500)
    assert(pli >= 24.0, s"illegal-pos left psnr $pli")
    assert(ri.forall(_ == 0.0), "illegal position must not synthesize a right channel")
    g0: Unit
  }

  test("LSF nonzero scalefac_compress rows: sfc<400, 400<=sfc<500, preflag row") {
    val sr = 22050
    val n = 576 * 6
    val x = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 441.0 * i / sr))
    // slens (1,1,1,1) / (1,1,1,0) / (1,1,0,0)+preflag — real scalefactor
    // bits flow through the stream and the decoder's partition reads +
    // scheme-implied preflag must land back on the original spectrum
    for (sfc <- Seq(101, 425, 504)) {
      val enc = Mp3Encoder.encodeLsf(x, sampleRate = sr, scalefacCompress = sfc)
      val d = Mp3Layer3.decode(enc)
      assert(d.isDefined, s"sfc=$sfc stream must decode")
      val (_, _, psnr) = Mp3Layer3.fitPsnr(x, d.get.samples, 1500)
      assert(psnr >= 20.0, s"sfc=$sfc psnr $psnr")
    }
    // the three rows genuinely produce different scalefactor bit counts:
    // decoding a sfc=101 stream as if sfc were 0 would mis-frame — pin
    // by checking the streams differ in length-bearing content
    val e0 = Mp3Encoder.encodeLsf(x, sampleRate = sr)
    val e1 = Mp3Encoder.encodeLsf(x, sampleRate = sr, scalefacCompress = 101)
    assert(!java.util.Arrays.equals(e0, e1))
  }

  private def splitChans(d: Mp3Layer3.Decoded): (Array[Double], Array[Double]) = {
    val half = d.samples.length / 2
    (Array.tabulate(half)(i => d.samples(2 * i)),
      Array.tabulate(half)(i => d.samples(2 * i + 1)))
  }

  private def rms(a: Array[Double]): Double =
    math.sqrt(a.map(v => v * v).sum / a.length)

  test("MPEG-1 intensity stereo: tan-ratio rendering on long AND short blocks") {
    val sr = 44100
    val n = 576 * 8
    val x = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 441.0 * i / sr))
    for (short <- Seq(false, true)) {
      // pos 3: tan(pi/4) = 1 -> kl = kr = 1/2, identical channels
      val d3 = Mp3Layer3.decode(Mp3Encoder.encodeIntensity(x,
        positions = (_, _) => 3, shortBlocks = short)).get
      assert(d3.channels == 2, s"short=$short")
      val (l3, r3) = splitChans(d3)
      // kl/kr differ only by tan(pi/4)'s last ulp
      val maxDiff = l3.zip(r3).map { case (a, b) => math.abs(a - b) }.max
      assert(maxDiff < 1e-12, s"short=$short pos=3 must render kl ~= kr ($maxDiff)")
      val (_, _, p3) = Mp3Layer3.fitPsnr(x, l3, 1500)
      assert(p3 >= 20.0, s"short=$short pos3 psnr $p3")
      // pos 0: tan(0) = 0 -> everything moves to the RIGHT channel
      val d0 = Mp3Layer3.decode(Mp3Encoder.encodeIntensity(x,
        positions = (_, _) => 0, shortBlocks = short)).get
      val (l0, r0) = splitChans(d0)
      assert(rms(l0) < 1e-9 * math.max(rms(r0), 1e-300),
        s"short=$short pos=0 must zero the left channel")
      val (_, _, p0) = Mp3Layer3.fitPsnr(x, r0, 1500)
      assert(p0 >= 20.0, s"short=$short pos0 right psnr $p0")
      // pos 7 is the ILLEGAL code: channels stay as decoded — the empty
      // i-channel is silent, the left keeps the full signal
      val d7 = Mp3Layer3.decode(Mp3Encoder.encodeIntensity(x,
        positions = (_, _) => 7, shortBlocks = short)).get
      val (l7, r7) = splitChans(d7)
      assert(r7.forall(_ == 0.0), s"short=$short illegal pos right not silent")
      val (_, _, p7) = Mp3Layer3.fitPsnr(x, l7, 1500)
      assert(p7 >= 20.0, s"short=$short illegal-pos left psnr $p7")
    }
  }

  test("MPEG-1 short-block intensity resolves positions and bounds PER WINDOW") {
    val sr = 44100
    val n = 576 * 8
    // low tone: its short-window energy sits entirely in bands 0-5
    val x = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 441.0 * i / sr))
    // per-window POSITIONS: window 0 pos 0 (all right), window 1 pos 3
    // (split), window 2 pos 6 (tan ~inf, all left). An implementation
    // reading one position per band would zero the left everywhere.
    val dw = Mp3Layer3.decode(Mp3Encoder.encodeIntensity(x,
      positions = (_, w) => w * 3, shortBlocks = true)).get
    val (lw, rw) = splitChans(dw)
    // reference full-amplitude render: the illegal-everywhere frame
    val df = Mp3Layer3.decode(Mp3Encoder.encodeIntensity(x,
      positions = (_, _) => 7, shortBlocks = true)).get
    val full = rms(splitChans(df)._1)
    // expected energy: left (0 + 1/4 + 1)/3, right (1 + 1/4 + ~0)/3
    val expect = math.sqrt((0.0 + 0.25 + 1.0) / 3.0)
    assert(math.abs(rms(lw) / full - expect) < 0.08,
      s"per-window positions: left rms ratio ${rms(lw) / full}, want ~$expect")
    assert(math.abs(rms(rw) / full - expect) < 0.08,
      s"per-window positions: right rms ratio ${rms(rw) / full}, want ~$expect")

    // per-window BOUNDS: the right channel carries its OWN spectrum in
    // window 1's bands 0-5 only; positions are 0 everywhere. Bands at or
    // below the carrying bands are excluded from intensity processing in
    // window 1 ONLY — the left channel keeps just its window-1 low-band
    // content (~1/3 of the energy). A band-global bound would keep bands
    // 0-5 in ALL windows (~full energy for this tone); no bound handling
    // at all would keep everything.
    val bands = Mp3Tables.sfbShortM1(0)
    val rightSpec: (Int, Array[Double]) => Array[Double] = (_, left) => {
      val out = new Array[Double](576)
      var sfb = 0
      while (sfb < 6) {
        val lo = bands(sfb); val width = bands(sfb + 1) - lo
        val base = lo * 3 + 1 * width // window 1 lines of this band
        System.arraycopy(left, base, out, base, width)
        sfb += 1
      }
      out
    }
    val db = Mp3Layer3.decode(Mp3Encoder.encodeIntensity(x,
      positions = (_, _) => 0, shortBlocks = true,
      rightSpectrum = rightSpec)).get
    val (lb, rb) = splitChans(db)
    val leftRatio = rms(lb) / full
    assert(leftRatio > 0.40 && leftRatio < 0.70,
      s"per-window bound: left rms ratio $leftRatio, want ~sqrt(1/3)=0.577 " +
        "(a band-global bound would leave ~1.0, no bound ~0.0)")
    assert(rms(rb) > rms(lb),
      "right channel must carry the intensity-moved windows plus its own spectrum")
  }

  test("LSF SHORT-BLOCK intensity stereo: io ratios per window, illegal code refuses") {
    val sr2 = 22050
    val n = 576 * 8
    val x = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 441.0 * i / sr2))
    for ((scale, io) <- Seq(0 -> math.pow(2.0, -0.25), 1 -> math.pow(2.0, -0.5))) {
      val d1 = Mp3Layer3.decode(Mp3Encoder.encodeLsfIntensity(x, sampleRate = sr2,
        intensityScale = scale, positions = _ => 1, shortBlocks = true)).get
      assert(d1.channels == 2, s"scale=$scale")
      val (l1, r1) = splitChans(d1)
      val (_, gl, pl) = Mp3Layer3.fitPsnr(x, l1, 1500)
      val (_, gr2, pr) = Mp3Layer3.fitPsnr(x, r1, 1500)
      assert(pl >= 20.0 && pr >= 20.0, s"scale=$scale psnr $pl/$pr")
      val ratio = gr2 / gl
      assert(math.abs(ratio - io) < 0.03,
        s"scale=$scale short-block right/left gain ratio $ratio should be io=$io")
    }
    // illegal position (max code 3 under slen 2, per (band, window) slot)
    val di = Mp3Layer3.decode(Mp3Encoder.encodeLsfIntensity(x, sampleRate = sr2,
      positions = _ => 3, shortBlocks = true)).get
    val (li, ri) = splitChans(di)
    val (_, _, pli) = Mp3Layer3.fitPsnr(x, li, 1500)
    assert(pli >= 20.0, s"short illegal-pos left psnr $pli")
    assert(ri.forall(_ == 0.0), "short illegal position must not synthesize a right channel")
  }
}

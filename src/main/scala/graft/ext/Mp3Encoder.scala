package graft.ext

/** Minimal MPEG-1/MPEG-2 Layer III encoder — enough to produce VALID,
  * decodable frames for the decode oracle and the multimodal pipeline
  * fixtures. Deliberately simple where the spec allows: mono or plain
  * stereo, all-long or ALL-short-block streams (no transition windows),
  * one global_gain per granule chosen to fit the selected codebook, no
  * bit reservoir (main_data_begin 0), no padding, scfsi 0. MPEG-1
  * frames carry all-zero scalefactors (scalefac_compress 0); LSF frames
  * can additionally emit nonzero scalefactors on any non-intensity
  * scalefac_compress row (the quantizer pre-scales per band so the
  * decoder's requantization lands back on the original spectrum).
  *
  * The analysis side is the textbook pseudo-QMF adjoint of the decoder's
  * synthesis ([[Mp3Layer3]]): 32-band analysis with h(n)cos((2k+1)(n-16)
  * pi/64) filters over the shared computed prototype, then the 36-point
  * sine-windowed forward MDCT with 50% overlap per subband. The round
  * trip encoder → [[Mp3Layer3.decode]] is pinned by a PSNR spec
  * (delay+gain-fitted, as codec comparisons are) — an end-to-end
  * inverse-property check of the whole chain.
  */
object Mp3Encoder {

  // analysis filters a_k(n) = h(n) cos((2k+1)(n-16) pi/64)
  private val analysisA: Array[Array[Double]] = {
    val h = Mp3Tables.synthWindow
    Array.tabulate(32, 512) { (k, n) =>
      h(n) * math.cos((2 * k + 1) * (n - 16) * math.Pi / 64.0)
    }
  }

  /** 32-band analysis: input samples -> subband slices (one 32-vector per
    * 32 input samples). `x` is mono in [-1, 1].
    */
  def analyze(x: Array[Double]): Array[Array[Double]] = {
    val steps = x.length / 32
    val out = Array.ofDim[Double](steps, 32)
    var m = 0
    while (m < steps) {
      val t0 = m * 32 + 31 // newest sample of this step
      var k = 0
      while (k < 32) {
        var sum = 0.0
        var n = 0
        while (n < 512) {
          val ti = t0 - n
          if (ti >= 0) sum += x(ti) * analysisA(k)(n)
          n += 1
        }
        out(m)(k) = sum
        k += 1
      }
      m += 1
    }
    out
  }

  /** forward 36-point MDCT (18 coefficients) with the block type's
    * window (0 long, 1 start, 3 stop — the adjoint of the decoder's
    * long-shape IMDCT with the same window)
    */
  private def forwardMdct(time36: Array[Double], blockType: Int = 0): Array[Double] = {
    val win = Mp3Tables.imdctWin(blockType)
    val out = new Array[Double](18)
    var k = 0
    while (k < 18) {
      var sum = 0.0
      var i = 0
      while (i < 36) {
        sum += time36(i) * win(i) *
          math.cos(math.Pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))
        i += 1
      }
      // 4/N normalization so IMDCT+window+OLA reconstructs at unit gain
      out(k) = sum * (4.0 / 36.0)
      k += 1
    }
    out
  }

  /** forward 3x12-point short MDCT of one subband's 36-sample frame,
    * producing 18 coefficients in the decoder's IMDCT input order
    * (window-interleaved: index w + 3k) — the adjoint of
    * [[Mp3Layer3]]'s blockType-2 IMDCT. The three 12-sample sine windows
    * sit at frame offsets 6/12/18, so an ALL-short granule chain
    * overlap-adds perfectly at the 18-sample granule hop.
    */
  private def forwardMdctShort(time36: Array[Double]): Array[Double] = {
    val win = Mp3Tables.imdctWin(2)
    val out = new Array[Double](18)
    var w = 0
    while (w < 3) {
      var k = 0
      while (k < 6) {
        var sum = 0.0
        var i = 0
        while (i < 12) {
          sum += time36(6 + w * 6 + i) * win(i) *
            math.cos(math.Pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1))
          i += 1
        }
        out(w + 3 * k) = sum * (4.0 / 12.0)
        k += 1
      }
      w += 1
    }
    out
  }

  /** one granule's per-subband 36-sample MDCT input frames (18 carried
    * from the previous granule + 18 new, with the decoder's odd-subband
    * frequency inversion undone); advances `prev` in place.
    */
  private def granuleFrames(slices: Array[Array[Double]], g: Int,
      prev: Array[Array[Double]]): Array[Array[Double]] = {
    val t = Array.ofDim[Double](32, 36)
    var sb = 0
    while (sb < 32) {
      var i = 0
      while (i < 18) {
        t(sb)(i) = prev(sb)(i)
        var v = slices(g * 18 + i)(sb)
        if (sb % 2 == 1 && i % 2 == 1) v = -v
        t(sb)(18 + i) = v
        prev(sb)(i) = v
        i += 1
      }
      sb += 1
    }
    t
  }

  /** inverse of the decoder's short-block reorder: IMDCT-order lines
    * (sb*18 + w + 3k) -> the Huffman/bitstream order (sfb-major,
    * window-minor within each band). For MIXED blocks the first 36
    * lines (two LONG subbands) copy verbatim and the short mapping
    * starts at band 3 — the exact inverse of the decoder's mixed path.
    */
  private def unreorderShort(imdctOrder: Array[Double],
      bands: Array[Int], mixed: Boolean = false): Array[Double] = {
    val out = new Array[Double](576)
    var src = 0
    var sb = 0
    if (mixed) {
      System.arraycopy(imdctOrder, 0, out, 0, 36)
      src = 36; sb = 3
    }
    while (sb < 13) {
      val lo = bands(sb); val width = bands(sb + 1) - lo
      var w = 0
      while (w < 3) {
        var k = 0
        while (k < width) {
          val line = lo * 3 + w + 3 * k
          if (line < 576 && src < 576) out(src) = imdctOrder(line)
          src += 1; k += 1
        }
        w += 1
      }
      sb += 1
    }
    out
  }

  /** forward antialias butterfly at ONE subband boundary (the inverse
    * rotation of the decoder's)
    */
  private def antialiasForwardOne(xr: Array[Double], sbb: Int): Unit = {
    val off = (sbb + 1) * 18
    var bi = 0
    while (bi < 8) {
      val lo = off - 1 - bi
      val hi = off + bi
      val a = xr(lo); val b = xr(hi)
      xr(lo) = a * Mp3Tables.csTab(bi) + b * Mp3Tables.caTab(bi)
      xr(hi) = b * Mp3Tables.csTab(bi) - a * Mp3Tables.caTab(bi)
      bi += 1
    }
  }

  /** forward antialias = inverse butterfly (rotation transpose) */
  private def antialiasForward(xr: Array[Double]): Unit = {
    var sbb = 0
    while (sbb < 31) { antialiasForwardOne(xr, sbb); sbb += 1 }
  }

  /** pattern code for a MIXED granule (block_type 2 + mixed flag):
    * two long subbands below, short windows above
    */
  val MixedBlock = 5

  /** Forward transform with a PER-GRANULE block-type pattern (0 long,
    * 1 start, 2 short, 3 stop): long/start/stop granules use the
    * 36-point MDCT with the matching window plus the forward antialias;
    * short granules use the 3x12 adjoint with NO antialias, emitted in
    * Huffman/bitstream order. A spec-legal sequence keeps perfect
    * reconstruction because adjacent windows are Princen-Bradley
    * complements at the 18-sample hop (long<->start leading halves,
    * start tail <-> first short window, last short <-> stop head).
    */
  def forwardSpectraPattern(x: Array[Double], blockTypes: Int => Int,
      shortBands: Array[Int]): Array[Array[Double]] = {
    val slices = analyze(x)
    val nGran = slices.length / 18
    val prev = Array.ofDim[Double](32, 18)
    val spectra = Array.ofDim[Double](nGran, 576)
    var g = 0
    while (g < nGran) {
      val bt = blockTypes(g)
      val frames = granuleFrames(slices, g, prev)
      if (bt == MixedBlock) {
        // mixed: two LONG subbands (decoder IMDCTs sb<2 with the long
        // window) + short above, antialias on the one long boundary
        val imdctOrder = new Array[Double](576)
        var sb = 0
        while (sb < 2) {
          System.arraycopy(forwardMdct(frames(sb), 0), 0,
            imdctOrder, sb * 18, 18)
          sb += 1
        }
        while (sb < 32) {
          System.arraycopy(forwardMdctShort(frames(sb)), 0,
            imdctOrder, sb * 18, 18)
          sb += 1
        }
        antialiasForwardOne(imdctOrder, 0)
        spectra(g) = unreorderShort(imdctOrder, shortBands, mixed = true)
      } else if (bt == 2) {
        val imdctOrder = new Array[Double](576)
        var sb = 0
        while (sb < 32) {
          System.arraycopy(forwardMdctShort(frames(sb)), 0,
            imdctOrder, sb * 18, 18)
          sb += 1
        }
        spectra(g) = unreorderShort(imdctOrder, shortBands)
      } else {
        var sb = 0
        while (sb < 32) {
          System.arraycopy(forwardMdct(frames(sb), bt), 0,
            spectra(g), sb * 18, 18)
          sb += 1
        }
        antialiasForward(spectra(g))
      }
      g += 1
    }
    spectra
  }

  /** Full forward transform: mono PCM -> per-granule spectra xr[576]
    * (subband-major, 18 lines each), plus the antialias forward
    * butterflies (inverse of the decoder's).
    */
  def forwardSpectra(x: Array[Double]): Array[Array[Double]] =
    forwardSpectraPattern(x, _ => 0, null)

  /** ALL-short-block forward transform: every granule is a blockType-2
    * granule (window_switching on).
    */
  def forwardSpectraShort(x: Array[Double], shortBands: Array[Int]): Array[Array[Double]] =
    forwardSpectraPattern(x, _ => 2, shortBands)

  /** The canonical spec-legal TRANSITION cycle: long, start, short,
    * short, stop, long — every short run is fenced by the start/stop
    * windows exactly as ISO 2.4.3.4.10.3 sequences them.
    */
  val TransitionCycle: Int => Int =
    g => Array(0, 1, 2, 2, 3, 0)(g % 6)

  // ------------------------------------------------------------ bits

  private final class BitWriter {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1)
        nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def bitLength: Int = buf.length * 8 + nbits
    def toBytes(padToBytes: Int): Array[Byte] = {
      while (nbits != 0) write(0, 1)
      while (buf.length < padToBytes) buf += 0
      buf.toArray
    }
  }

  private final case class EncGranule(
      globalGain: Int, bigValues: Int, part23: Int, tableSelect: Int,
      bits: BitWriter)

  /** quantize + huffman-encode one granule spectrum.
    *
    * With `escTables = false` (the normative-interchange default) the
    * quantizer caps at table 15's |value| <= 15 and every emitted frame
    * uses only ISO-normative codebooks. With `escTables = true` the cap
    * widens to 15 + 2^13 - 1 and values above 15 ride an ESC table's
    * linbits escape (ISO 2.4.2.7: huffcode, x linbits, x sign, y linbits,
    * y sign) — the encoder picks the smallest-linbits table of the
    * 16-family that covers the granule's maximum, so quantization is
    * FINER for high-crest spectra (4-bit table-15 quantization costs
    * ~6 dB/bit of headroom). ESC frames decode only with
    * [[Mp3Layer3.decode]]'s allowNonNormative opt-in (the ESC codebooks
    * are in-repo canonical stand-ins, Mp3Tables.big).
    */
  private def encodeGranule(xr: Array[Double], escTables: Boolean): EncGranule = {
    // finest-first cap ladder: a dense fine-quantized granule can blow
    // the 12-bit part2_3_length field (and the 320 kbps main budget), so
    // the encoder settles on the finest cap whose bitstream fits —
    // 15+255 (8 linbits) down through the smaller escapes to plain 15
    val ladder = if (escTables) Seq(15 + 255, 15 + 63, 15 + 15, 15) else Seq(15)
    ladder.iterator.map(encodeGranuleAt(xr, _))
      .find(_.part23 <= 4000)
      .getOrElse(encodeGranuleAt(xr, 15))
  }

  private def encodeGranuleAt(xr: Array[Double], cap: Int): EncGranule = {
    val linbits16 = Array(1, 2, 3, 4, 6, 8, 10, 13)
    // choose global_gain: smallest step with max quantized value <= cap
    val maxAbs = xr.map(math.abs).max
    var gg = 210
    if (maxAbs > 0) {
      // is = (|xr| * 2^(-(gg-210)/4))^(3/4): LOWER gg = larger step =
      // larger quantized values; smallest gg under the cap = finest step
      def maxIs(g: Int): Double =
        math.pow(maxAbs * math.pow(2.0, -(g - 210) / 4.0), 0.75)
      while (gg < 255 && maxIs(gg) > cap) gg += 1
      while (gg > 0 && maxIs(gg - 1) <= cap) gg -= 1
    }
    val step = math.pow(2.0, -(gg - 210) / 4.0)
    val is = new Array[Int](576)
    var last = -1
    var maxQ = 0
    var i = 0
    while (i < 576) {
      val q = math.rint(math.pow(math.abs(xr(i)) * step, 0.75)).toInt
      val qq = math.min(q, cap)
      is(i) = if (xr(i) < 0) -qq else qq
      if (qq != 0) last = i
      if (qq > maxQ) maxQ = qq
      i += 1
    }
    val bigValues = if (last < 0) 0 else (last + 2) / 2
    // table choice: 15 whenever the granule fits it; else the
    // smallest-linbits 16-family ESC table covering (maxQ - 15)
    val tsel =
      if (maxQ <= 15) 15
      else {
        var need = 1
        while ((1 << need) - 1 < maxQ - 15) need += 1
        16 + linbits16.indexWhere(_ >= need)
      }
    val tab = Mp3Tables.big(tsel)
    val bw = new BitWriter
    i = 0
    while (i < bigValues * 2) {
      val x = is(i); val y = is(i + 1)
      val ax = math.abs(x); val ay = math.abs(y)
      val cx = math.min(ax, 15); val cy = math.min(ay, 15)
      val sym = cx * 16 + cy
      bw.write(tab.code(sym), tab.len(sym))
      if (cx == 15 && tab.linbits > 0) bw.write(ax - 15, tab.linbits)
      if (ax != 0) bw.write(if (x < 0) 1 else 0, 1)
      if (cy == 15 && tab.linbits > 0) bw.write(ay - 15, tab.linbits)
      if (ay != 0) bw.write(if (y < 0) 1 else 0, 1)
      i += 2
    }
    // scalefactors are all zero (scalefac_compress 0 -> slen 0,0): part2=0
    EncGranule(gg, bigValues, bw.bitLength, tsel, bw)
  }

  /** Encode mono PCM at a supported MPEG-1 rate into a Layer III stream.
    * `x` in [-1, 1]; length is truncated to whole frames (2 granules =
    * 1152 samples each).
    */
  def encode(x: Array[Double], sampleRate: Int = 44100,
      bitrateIdx: Int = 14, escTables: Boolean = false,
      shortBlocks: Boolean = false,
      transitionBlocks: Boolean = false): Array[Byte] =
    encodeChannels(Array(x), sampleRate, bitrateIdx, escTables,
      pattern(shortBlocks, transitionBlocks))

  /** Stereo variant: independent left/right (mode "stereo", no MS) —
    * exercises the decoder's two-channel side-info and synthesis paths.
    */
  def encodeStereo(l: Array[Double], r: Array[Double],
      sampleRate: Int = 44100, bitrateIdx: Int = 14,
      shortBlocks: Boolean = false): Array[Byte] =
    encodeChannels(Array(l, r), sampleRate, bitrateIdx, escTables = false,
      pattern(shortBlocks, transitions = false))

  private def pattern(shortBlocks: Boolean, transitions: Boolean): Int => Int = {
    require(!(shortBlocks && transitions), "pick one block pattern")
    if (transitions) TransitionCycle
    else if (shortBlocks) (_: Int) => 2
    else (_: Int) => 0
  }

  /** All-MIXED-block mono encode (blockType 2 + mixed flag every
    * granule): the fourth window shape, end-to-end.
    */
  def encodeMixed(x: Array[Double], sampleRate: Int = 44100,
      bitrateIdx: Int = 14): Array[Byte] =
    encodeChannels(Array(x), sampleRate, bitrateIdx, escTables = false,
      (_: Int) => MixedBlock)

  /** All-MIXED-block mono LSF encode. */
  def encodeLsfMixed(x: Array[Double], sampleRate: Int = 22050,
      bitrateIdx: Int = 14): Array[Byte] =
    encodeLsfChannels(Array(x), sampleRate, bitrateIdx, escTables = false,
      (_: Int) => MixedBlock, sfc = 0)

  /** MPEG-1 INTENSITY-stereo encode (ISO 11172-3 2.4.3.4.9.3):
    * joint-stereo mode with the intensity mode-extension bit. The LEFT
    * channel carries the full spectrum (long or ALL-short blocks); the
    * RIGHT channel carries intensity POSITIONS in its scalefactors
    * (scalefac_compress 13 -> slen 3/3, so every position code 0-7 is
    * emittable incl. the illegal 7) and, via `rightSpectrum`, optionally
    * its OWN spectrum in selected lines — the decoder must then exclude
    * the carrying bands from intensity processing in exactly the windows
    * that carry them (the per-window bound of 2.4.3.4.9.3), which is
    * what the round-trip spec discriminates on.
    *
    * `positions(sfb, w)` supplies the position code per scalefactor band
    * and window (`w` = 0 for long blocks). `rightSpectrum(granule,
    * leftXr)` returns the right channel's 576-line spectrum in bitstream
    * (band-major) order, or null/absent for the empty i-channel.
    */
  def encodeIntensity(l: Array[Double], sampleRate: Int = 44100,
      bitrateIdx: Int = 14,
      positions: (Int, Int) => Int = (_, _) => 3,
      shortBlocks: Boolean = false,
      rightSpectrum: (Int, Array[Double]) => Array[Double] = null): Array[Byte] = {
    val srIdx = Array(44100, 48000, 32000).indexOf(sampleRate)
    require(srIdx >= 0, s"unsupported rate $sampleRate")
    val bt: Int => Int = if (shortBlocks) _ => 2 else _ => 0
    val spectra = forwardSpectraPattern(l, bt, Mp3Tables.sfbShortM1(srIdx))
    val nFrames = spectra.length / 2
    val bitrate = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)(bitrateIdx)
    val frameBytes = 144 * bitrate * 1000 / sampleRate
    val sideBytes = 32
    // ch1 sfc 13 -> slen1 = slen2 = 3 (Mp3Tables.slenM1)
    val sfBits1 = if (shortBlocks) 12 * 3 * 3 else 21 * 3
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    var fr = 0
    while (fr < nFrames) {
      val g0s = Array.tabulate(2)(gr => encodeGranule(spectra(fr * 2 + gr), escTables = false))
      val g1s = Array.tabulate(2) { gr =>
        val xr1 = if (rightSpectrum == null) null
          else rightSpectrum(fr * 2 + gr, spectra(fr * 2 + gr))
        if (xr1 == null) null else encodeGranule(xr1, escTables = false)
      }
      val bw = new BitWriter
      bw.write(0x7ff, 11); bw.write(3, 2); bw.write(1, 2); bw.write(1, 1)
      bw.write(bitrateIdx, 4); bw.write(srIdx, 2); bw.write(0, 1)
      bw.write(0, 1) // private
      bw.write(1, 2) // mode: joint stereo
      bw.write(1, 2) // mode extension: intensity on, MS off
      bw.write(0, 1); bw.write(0, 1); bw.write(0, 2)
      bw.write(0, 9) // main_data_begin
      bw.write(0, 3) // private bits
      bw.write(0, 4); bw.write(0, 4) // scfsi
      var gr = 0
      while (gr < 2) {
        // ch0: the full-spectrum channel, sfc 0 (no scalefactor bits)
        val g0 = g0s(gr)
        require(g0.part23 <= 4095)
        bw.write(g0.part23, 12); bw.write(g0.bigValues, 9)
        bw.write(g0.globalGain, 8); bw.write(0, 4)
        if (shortBlocks) {
          bw.write(1, 1); bw.write(2, 2); bw.write(0, 1)
          bw.write(g0.tableSelect, 5); bw.write(g0.tableSelect, 5)
          bw.write(0, 3); bw.write(0, 3); bw.write(0, 3)
        } else {
          bw.write(0, 1)
          bw.write(g0.tableSelect, 5); bw.write(g0.tableSelect, 5)
          bw.write(g0.tableSelect, 5)
          bw.write(7, 4); bw.write(7, 3)
        }
        bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
        // ch1: positions in the scalefactors (+ optional own spectrum)
        val g1 = g1s(gr)
        val part23 = sfBits1 + (if (g1 == null) 0 else g1.part23)
        require(part23 <= 4095)
        bw.write(part23, 12)
        bw.write(if (g1 == null) 0 else g1.bigValues, 9)
        bw.write(if (g1 == null) 210 else g1.globalGain, 8)
        bw.write(13, 4) // scalefac_compress -> slen 3/3
        if (shortBlocks) {
          bw.write(1, 1); bw.write(2, 2); bw.write(0, 1)
          val ts = if (g1 == null) 0 else g1.tableSelect
          bw.write(ts, 5); bw.write(ts, 5)
          bw.write(0, 3); bw.write(0, 3); bw.write(0, 3)
        } else {
          bw.write(0, 1)
          val ts = if (g1 == null) 0 else g1.tableSelect
          bw.write(ts, 5); bw.write(ts, 5); bw.write(ts, 5)
          bw.write(7, 4); bw.write(7, 3)
        }
        bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
        gr += 1
      }
      val mainBits = (0 until 2).map(gr => g0s(gr).part23 + sfBits1 +
        (if (g1s(gr) == null) 0 else g1s(gr).part23)).sum
      require(mainBits <= (frameBytes - 4 - sideBytes) * 8,
        "intensity frame exceeds the main-data budget; raise the bitrate")
      def copyBits(g: EncGranule): Unit = if (g != null) {
        val bytes = g.bits.toBytes(0)
        var bit = 0
        while (bit < g.part23) {
          bw.write((bytes(bit >>> 3) >>> (7 - (bit & 7))) & 1, 1)
          bit += 1
        }
      }
      gr = 0
      while (gr < 2) {
        copyBits(g0s(gr))
        // ch1 scalefactors ARE the intensity positions (3 bits each)
        if (shortBlocks) {
          var sb = 0
          while (sb < 12) {
            var w = 0
            while (w < 3) { bw.write(positions(sb, w) & 7, 3); w += 1 }
            sb += 1
          }
        } else {
          var b = 0
          while (b < 21) { bw.write(positions(b, 0) & 7, 3); b += 1 }
        }
        copyBits(g1s(gr))
        gr += 1
      }
      out ++= bw.toBytes(frameBytes)
      fr += 1
    }
    out.toArray
  }

  /** LSF INTENSITY-stereo encode (ISO 13818-3): joint-stereo mode with
    * the intensity mode-extension bit; the LEFT channel carries the full
    * spectrum and the RIGHT (intensity) channel carries NO spectrum —
    * only intensity POSITIONS in its scalefactors, read under the
    * blocknumber-3-5 scheme (int_scalefac_comp = sfc >> 1, the low bit
    * is the intensity scale selecting io = 2^(-(scale+1)/4)). The
    * decoder renders left = io-attenuated / right = full for odd
    * positions and the converse for even ones.
    */
  def encodeLsfIntensity(x: Array[Double], sampleRate: Int = 22050,
      bitrateIdx: Int = 14, intensityScale: Int = 0,
      positions: Int => Int = b => b % 3,
      shortBlocks: Boolean = false): Array[Byte] = {
    val srIdx = Array(22050, 24000, 16000).indexOf(sampleRate)
    require(srIdx >= 0, s"unsupported LSF rate $sampleRate")
    val spectra =
      if (shortBlocks)
        forwardSpectraPattern(x, _ => 2, Mp3Tables.sfbShortM2(srIdx))
      else forwardSpectra(x)
    val bitrate = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
      128, 144, 160)(bitrateIdx)
    val frameBytes = 72 * bitrate * 1000 / sampleRate
    val sideBytes = 17
    // int_scalefac_comp 86 -> slens (2,2,2,0) over partitions {7,7,7,0}
    // (blocknumber 3): 21 position bands, max legal code 3
    val ch1Sfc = (86 << 1) | (intensityScale & 1)
    val (slens, bn) = Mp3Tables.lsfIntensitySlens(ch1Sfc)
    // shape 0 (long) or 1 (short): 21 long slots / 36 (sfb, window) slots
    val partitions = Mp3Tables.lsfIntensityPartitions(bn)(if (shortBlocks) 1 else 0)
    val sfBits1 = (0 until 4).map(p => slens(p) * partitions(p)).sum
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    var fr = 0
    while (fr < spectra.length) {
      val g0 = encodeGranule(spectra(fr), escTables = false)
      val bw = new BitWriter
      bw.write(0x7ff, 11); bw.write(2, 2); bw.write(1, 2); bw.write(1, 1)
      bw.write(bitrateIdx, 4); bw.write(srIdx, 2); bw.write(0, 1)
      bw.write(0, 1) // private
      bw.write(1, 2) // mode: joint stereo
      bw.write(1, 2) // mode extension: intensity on, MS off
      bw.write(0, 1); bw.write(0, 1); bw.write(0, 2)
      bw.write(0, 8) // main_data_begin
      bw.write(0, 2) // private bits (stereo LSF)
      // ch0: the full-spectrum channel
      require(g0.part23 <= 4095)
      bw.write(g0.part23, 12); bw.write(g0.bigValues, 9)
      bw.write(g0.globalGain, 8); bw.write(0, 9) // sfc 0
      if (shortBlocks) {
        bw.write(1, 1); bw.write(2, 2); bw.write(0, 1) // ws, bt 2, not mixed
        bw.write(g0.tableSelect, 5); bw.write(g0.tableSelect, 5)
        bw.write(0, 3); bw.write(0, 3); bw.write(0, 3) // subblock gains
      } else {
        bw.write(0, 1) // ws off
        bw.write(g0.tableSelect, 5); bw.write(g0.tableSelect, 5)
        bw.write(g0.tableSelect, 5)
        bw.write(7, 4); bw.write(7, 3)
      }
      bw.write(0, 1); bw.write(0, 1)
      // ch1: positions only — part2_3_length covers just the sf bits
      bw.write(sfBits1, 12); bw.write(0, 9) // bigValues 0
      bw.write(210, 8); bw.write(ch1Sfc, 9)
      if (shortBlocks) {
        bw.write(1, 1); bw.write(2, 2); bw.write(0, 1) // ws, bt 2, not mixed
        bw.write(0, 5); bw.write(0, 5) // table 0: codes nothing
        bw.write(0, 3); bw.write(0, 3); bw.write(0, 3)
      } else {
        bw.write(0, 1) // ws off
        bw.write(0, 5); bw.write(0, 5); bw.write(0, 5) // table 0: codes nothing
        bw.write(7, 4); bw.write(7, 3)
      }
      bw.write(0, 1); bw.write(0, 1)
      val mainBudgetBits = (frameBytes - 4 - sideBytes) * 8
      require(g0.part23 + sfBits1 <= mainBudgetBits,
        "intensity frame exceeds the main-data budget; raise the bitrate")
      // main data: ch0 huffman bits, then ch1 position scalefactors
      val bytes = g0.bits.toBytes(0)
      var bit = 0
      while (bit < g0.part23) {
        bw.write((bytes(bit >>> 3) >>> (7 - (bit & 7))) & 1, 1)
        bit += 1
      }
      var b = 0; var part = 0
      while (part < 4) {
        var i = 0
        while (i < partitions(part)) {
          if (slens(part) > 0)
            bw.write(positions(b) & ((1 << slens(part)) - 1), slens(part))
          b += 1; i += 1
        }
        part += 1
      }
      out ++= bw.toBytes(frameBytes)
      fr += 1
    }
    out.toArray
  }


  /** MPEG-2 LSF mono encode (ISO 13818-3): ONE 576-sample granule per
    * frame, 8-bit main_data_begin, 9-bit scalefac_compress (emitted 0 —
    * all slens zero), no scfsi/preflag, frame = 72·bitrate/rate bytes.
    * The shared analysis/quantization/Huffman plane is [[encodeGranule]];
    * with the default `escTables = false` every LSF frame uses only
    * ISO-normative codebooks and decodes without any opt-in.
    */
  def encodeLsf(x: Array[Double], sampleRate: Int = 22050,
      bitrateIdx: Int = 14, escTables: Boolean = false,
      shortBlocks: Boolean = false, scalefacCompress: Int = 0,
      transitionBlocks: Boolean = false): Array[Byte] =
    encodeLsfChannels(Array(x), sampleRate, bitrateIdx, escTables,
      pattern(shortBlocks, transitionBlocks), scalefacCompress)

  /** LSF stereo: independent left/right (mode "stereo", no MS/intensity). */
  def encodeLsfStereo(l: Array[Double], r: Array[Double],
      sampleRate: Int = 22050, bitrateIdx: Int = 14,
      shortBlocks: Boolean = false): Array[Byte] =
    encodeLsfChannels(Array(l, r), sampleRate, bitrateIdx,
      escTables = false, pattern(shortBlocks, transitions = false), sfc = 0)

  /** The LONG-block LSF scalefactor plan for a scalefac_compress value:
    * per-band values (deterministic b&1 pattern where the partition's
    * slen allows), driven by the SAME pinned scheme the decoder reads
    * ([[Mp3Tables.lsfSlens]] / [[Mp3Tables.lsfSfbPartitions]] column 0).
    * Returns (values[21], slens, partitions, preflag, sfBits).
    */
  private def lsfScalefactorPlan(sfc: Int)
      : (Array[Int], Array[Int], Array[Int], Int, Int) = {
    val (slens, blocknumber, preflag) = Mp3Tables.lsfSlens(sfc)
    val partitions = Mp3Tables.lsfSfbPartitions(blocknumber)(0)
    val vals = new Array[Int](21)
    var b = 0; var part = 0; var bits = 0
    while (part < 4) {
      var i = 0
      while (i < partitions(part)) {
        if (slens(part) > 0) { vals(b) = b & 1; bits += slens(part) }
        b += 1; i += 1
      }
      part += 1
    }
    (vals, slens, partitions, preflag, bits)
  }

  private def encodeLsfChannels(chans: Array[Array[Double]], sampleRate: Int,
      bitrateIdx: Int, escTables: Boolean, blockTypes: Int => Int,
      sfc: Int): Array[Byte] = {
    val srIdx = Array(22050, 24000, 16000).indexOf(sampleRate)
    require(srIdx >= 0, s"unsupported LSF rate $sampleRate")
    require(sfc == 0 || (0 until 64).forall(blockTypes(_) == 0),
      "nonzero scalefac_compress is exercised on all-long-block streams")
    val nCh = chans.length
    require(nCh == 1 || nCh == 2)
    val spectra = // [ch][granule][576], bitstream order
      chans.map(forwardSpectraPattern(_, blockTypes, Mp3Tables.sfbShortM2(srIdx)))
    // nonzero sfc: pre-scale each band so the decoder's 2^(-sfMult*(sf+pre))
    // requantization lands back on the original spectrum (sfMult = 0.5)
    val (sfVals, slens, partitions, preflag, sfBits) = lsfScalefactorPlan(sfc)
    if (sfc != 0) {
      val bands = Mp3Tables.sfbLongM2(srIdx)
      spectra.foreach(_.foreach { xr =>
        var b = 0
        while (b < 21) {
          val pre = if (preflag == 1) Mp3Tables.pretab(b) else 0
          val scale = math.pow(2.0, 0.5 * (sfVals(b) + pre))
          var i = bands(b)
          while (i < bands(b + 1)) { xr(i) *= scale; i += 1 }
          b += 1
        }
      })
    }
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    // MPEG-2 Layer III bitrate table (BrMpeg2L23)
    val bitrate = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
      128, 144, 160)(bitrateIdx)
    val frameBytes = 72 * bitrate * 1000 / sampleRate // no padding
    val sideBytes = if (nCh == 1) 9 else 17
    val nFrames = spectra.map(_.length).min
    var fr = 0
    while (fr < nFrames) {
      val gs = Array.tabulate(nCh)(ch => encodeGranule(spectra(ch)(fr), escTables))
      val bw = new BitWriter
      // header: sync(11) version(2)=10 layer(2)=01 noCrc(1)=1
      bw.write(0x7ff, 11); bw.write(2, 2); bw.write(1, 2); bw.write(1, 1)
      bw.write(bitrateIdx, 4); bw.write(srIdx, 2); bw.write(0, 1) // padding
      bw.write(0, 1) // private
      bw.write(if (nCh == 1) 3 else 0, 2) // mode: mono / stereo
      bw.write(0, 2); bw.write(0, 1); bw.write(0, 1); bw.write(0, 2)
      bw.write(0, 8) // main_data_begin
      bw.write(0, if (nCh == 1) 1 else 2) // private bits
      var c = 0
      while (c < nCh) {
        val g = gs(c)
        val part23 = g.part23 + sfBits
        require(part23 <= 4095, s"LSF granule needs $part23 bits")
        bw.write(part23, 12)
        bw.write(g.bigValues, 9)
        bw.write(g.globalGain, 8)
        bw.write(sfc, 9)
        val bt = blockTypes(fr)
        if (bt != 0) {
          bw.write(1, 1) // window switching
          bw.write(if (bt == MixedBlock) 2 else bt, 2) // block_type
          bw.write(if (bt == MixedBlock) 1 else 0, 1) // mixed flag
          bw.write(g.tableSelect, 5); bw.write(g.tableSelect, 5)
          bw.write(0, 3); bw.write(0, 3); bw.write(0, 3) // subblock gains
        } else {
          bw.write(0, 1) // window switching off
          bw.write(g.tableSelect, 5); bw.write(g.tableSelect, 5)
          bw.write(g.tableSelect, 5)
          bw.write(7, 4); bw.write(7, 3) // region counts
        }
        bw.write(0, 1) // scalefac_scale (no preflag field in LSF)
        bw.write(0, 1) // count1 table A
        c += 1
      }
      val mainBudgetBits = (frameBytes - 4 - sideBytes) * 8
      require(gs.map(_.part23 + sfBits).sum <= mainBudgetBits,
        s"granule data exceeds $mainBudgetBits bits; raise the bitrate index")
      // main data per channel: scalefactor bits then huffman bits
      gs.foreach { g =>
        if (sfBits > 0) {
          var b = 0; var part = 0
          while (part < 4) {
            var i = 0
            while (i < partitions(part)) {
              if (slens(part) > 0) bw.write(sfVals(b), slens(part))
              b += 1; i += 1
            }
            part += 1
          }
        }
        val bytes = g.bits.toBytes(0)
        var bit = 0
        while (bit < g.part23) {
          bw.write((bytes(bit >>> 3) >>> (7 - (bit & 7))) & 1, 1)
          bit += 1
        }
      }
      out ++= bw.toBytes(frameBytes)
      fr += 1
    }
    out.toArray
  }

  private def encodeChannels(chans: Array[Array[Double]], sampleRate: Int,
      bitrateIdx: Int, escTables: Boolean,
      blockTypes: Int => Int): Array[Byte] = {
    val srIdx = Array(44100, 48000, 32000).indexOf(sampleRate)
    require(srIdx >= 0, s"unsupported rate $sampleRate")
    val nCh = chans.length
    require(nCh == 1 || nCh == 2)
    val spectra = // [ch][granule][576], bitstream order
      chans.map(forwardSpectraPattern(_, blockTypes, Mp3Tables.sfbShortM1(srIdx)))
    val nFrames = spectra.map(_.length).min / 2
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    val bitrate = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)(bitrateIdx)
    val frameBytes = 144 * bitrate * 1000 / sampleRate // no padding
    val sideBytes = if (nCh == 1) 17 else 32
    var fr = 0
    while (fr < nFrames) {
      // [gr][ch]
      val gs = Array.tabulate(2, nCh)((gr, ch) =>
        encodeGranule(spectra(ch)(fr * 2 + gr), escTables))
      val bw = new BitWriter
      // header: sync(11) version(2)=11 layer(2)=01 noCrc(1)=1
      bw.write(0x7ff, 11); bw.write(3, 2); bw.write(1, 2); bw.write(1, 1)
      bw.write(bitrateIdx, 4); bw.write(srIdx, 2); bw.write(0, 1) // padding
      bw.write(0, 1) // private
      bw.write(if (nCh == 1) 3 else 0, 2) // mode: mono / stereo
      bw.write(0, 2) // mode extension (no MS, no intensity)
      bw.write(0, 1); bw.write(0, 1) // copyright/original
      bw.write(0, 2) // emphasis
      bw.write(0, 9) // main_data_begin
      bw.write(0, if (nCh == 1) 5 else 3) // private
      var c = 0
      while (c < nCh) { bw.write(0, 4); c += 1 } // scfsi per channel
      var gr = 0
      while (gr < 2) {
        c = 0
        while (c < nCh) {
          val g = gs(gr)(c)
          require(g.part23 <= 4095,
            s"granule needs ${g.part23} bits > the 12-bit part2_3_length field; " +
              "simplify the spectrum or lower the ESC cap")
          bw.write(g.part23, 12)
          bw.write(g.bigValues, 9)
          bw.write(g.globalGain, 8)
          bw.write(0, 4) // scalefac_compress
          val bt = blockTypes(fr * 2 + gr)
          if (bt != 0) {
            bw.write(1, 1) // window switching
            bw.write(if (bt == MixedBlock) 2 else bt, 2) // block_type
            bw.write(if (bt == MixedBlock) 1 else 0, 1) // mixed flag
            bw.write(g.tableSelect, 5); bw.write(g.tableSelect, 5)
            bw.write(0, 3); bw.write(0, 3); bw.write(0, 3) // subblock gains
          } else {
            bw.write(0, 1) // window switching off
            bw.write(g.tableSelect, 5); bw.write(g.tableSelect, 5)
            bw.write(g.tableSelect, 5) // table_select (all three regions)
            bw.write(7, 4) // region0_count
            bw.write(7, 3) // region1_count
          }
          bw.write(0, 1) // preflag
          bw.write(0, 1) // scalefac_scale
          bw.write(0, 1) // count1 table A
          c += 1
        }
        gr += 1
      }
      val flat = gs.flatten
      val mainBudgetBits = (frameBytes - 4 - sideBytes) * 8
      require(flat.map(_.part23).sum <= mainBudgetBits,
        s"granule data ${flat.map(_.part23).sum} exceeds $mainBudgetBits " +
          "bits; raise the bitrate index")
      // main data (gr-major, channel-minor — the side-info order) then
      // zero stuffing to the fixed frame size
      flat.foreach { g =>
        val bytes = g.bits.toBytes(0)
        var bit = 0
        while (bit < g.part23) {
          bw.write((bytes(bit >>> 3) >>> (7 - (bit & 7))) & 1, 1)
          bit += 1
        }
      }
      out ++= bw.toBytes(frameBytes)
      fr += 1
    }
    out.toArray
  }
}

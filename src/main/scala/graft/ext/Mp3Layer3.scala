package graft.ext

import graft.ext.MediaContainers.{Mp3Frame, parseMp3Frame, id3v2Size}

/** MPEG-1 Layer III audio decode (ISO 11172-3 §2.4.3.4) — the full
  * pipeline: bit-reservoir main-data assembly, side info, scalefactors,
  * Huffman spectrum, requantization, MS stereo, short-block reorder,
  * antialias butterflies, hybrid IMDCT (block types 0-3 incl. mixed),
  * frequency inversion, and 32-band polyphase synthesis.
  *
  * Honest capability boundary (see DIVERGENCES.md):
  *  - ISO-NORMATIVE Huffman bit patterns cover the offline-validated set
  *    {1,2,3,5,6,7,8,9,10,12,15} + count1 A/B; tables 11/13/16-31 carry
  *    IN-REPO canonical codebooks with the FULL ESC mechanics (linbits
  *    escapes, sign ordering) but non-normative bit assignments
  *    ([[Mp3Tables.big]]) — by default a frame selecting one decodes to
  *    None rather than to plausible garbage; `allowNonNormative = true`
  *    opts in (graft's own encoder's ESC frames round-trip exactly).
  *  - The synthesis prototype window is computed (near-PR pseudo-QMF
  *    design), not the spec's 512 tabulated constants.
  *  - MPEG-2 LSF (576-sample frames) decodes in full: mono, plain/MS
  *    stereo AND intensity stereo (the blocknumber 3-5 position scheme
  *    with io = 2^(-(scale+1)/4) ratios and per-band illegal codes),
  *    every window shape (long, short/mixed, start/stop transitions),
  *    and the complete non-intensity scalefactor scheme (blocknumbers
  *    0-2, incl. the sfc >= 500 preflag row).
  *
  * Intensity stereo positions are applied for long blocks
  * (ISO 2.4.3.4.9.3); short-block intensity falls back to leaving the
  * channels as decoded.
  */
object Mp3Layer3 {

  final case class Decoded(sampleRate: Int, channels: Int, nGranules: Int,
      samples: Array[Double]) {
    /** interleaved 16-bit view with saturation */
    def pcm16: Array[Short] = samples.map { v =>
      val s = math.rint(v * 32768.0)
      math.max(-32768.0, math.min(32767.0, s)).toShort
    }
  }

  // ----------------------------------------------------------- bit I/O

  private final class BitReader(val bytes: Array[Byte]) {
    var pos = 0 // bit position
    def remaining: Int = bytes.length * 8 - pos
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byte = bytes(pos >>> 3) & 0xff
        v = (v << 1) | ((byte >>> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
    def read1(): Int = read(1)
  }

  // --------------------------------------------------------- side info

  private final case class GranuleInfo(
      part23Length: Int, bigValues: Int, globalGain: Int,
      scalefacCompress: Int, windowSwitching: Boolean, blockType: Int,
      mixedBlock: Boolean, tableSelect: Array[Int], subblockGain: Array[Int],
      region0Count: Int, region1Count: Int, preflag: Int,
      scalefacScale: Int, count1Table: Int)

  private final case class SideInfo(mainDataBegin: Int,
      scfsi: Array[Array[Int]], // [ch][4]
      granules: Array[Array[GranuleInfo]]) // [gr][ch]

  private def readSideInfo(br: BitReader, channels: Int,
      lsf: Boolean = false): SideInfo = {
    // MPEG-2 LSF (ISO 13818-3 2.4.1.7): 8-bit main_data_begin, 1/2 private
    // bits, NO scfsi, ONE granule, 9-bit scalefac_compress, NO preflag
    val mainDataBegin = br.read(if (lsf) 8 else 9)
    br.read(if (lsf) (if (channels == 1) 1 else 2)
      else (if (channels == 1) 5 else 3)): Unit // private bits
    val scfsi =
      if (lsf) Array.fill(channels)(Array.fill(4)(0))
      else Array.fill(channels)(Array.fill(4)(br.read1()))
    val granules = Array.fill(if (lsf) 1 else 2) {
      Array.fill(channels) {
        val p23 = br.read(12)
        val bv = br.read(9)
        val gg = br.read(8)
        val sc = br.read(if (lsf) 9 else 4)
        val ws = br.read1() == 1
        if (ws) {
          val bt = br.read(2)
          val mixed = br.read1() == 1
          val ts = Array(br.read(5), br.read(5), 0)
          val sbg = Array(br.read(3), br.read(3), br.read(3))
          // spec-implied regions under window switching
          GranuleInfo(p23, bv, gg, sc, ws, bt, mixed, ts, sbg,
            region0Count = if (bt == 2 && !mixed) 8 else 7,
            region1Count = 20, preflag = 0, 0, 0)
            .copy(preflag = if (lsf) 0 else br.read1(),
              scalefacScale = br.read1(), count1Table = br.read1())
        } else {
          val ts = Array(br.read(5), br.read(5), br.read(5))
          val r0 = br.read(4)
          val r1 = br.read(3)
          GranuleInfo(p23, bv, gg, sc, ws, blockType = 0,
            mixedBlock = false, ts, Array(0, 0, 0), r0, r1,
            preflag = if (lsf) 0 else br.read1(),
            scalefacScale = br.read1(), count1Table = br.read1())
        }
      }
    }
    SideInfo(mainDataBegin, scfsi, granules)
  }

  // ------------------------------------------------------ scalefactors

  /** long sf[22] (last band unscaled); short sf[13][3] flattened */
  private final class Scalefactors {
    val long = new Array[Int](23)
    val short = Array.ofDim[Int](13, 3)
  }

  private def readScalefactors(br: BitReader, g: GranuleInfo, ch: Int,
      gr: Int, scfsi: Array[Int], prev: Scalefactors): Scalefactors = {
    val out = new Scalefactors
    val (slen1, slen2) = Mp3Tables.slenM1(g.scalefacCompress)
    if (g.windowSwitching && g.blockType == 2) {
      if (g.mixedBlock) {
        var b = 0
        while (b < 8) { out.long(b) = br.read(slen1); b += 1 }
        var sb = 3
        while (sb < 12) {
          val sl = if (sb < 6) slen1 else slen2
          var w = 0
          while (w < 3) { out.short(sb)(w) = br.read(sl); w += 1 }
          sb += 1
        }
      } else {
        var sb = 0
        while (sb < 12) {
          val sl = if (sb < 6) slen1 else slen2
          var w = 0
          while (w < 3) { out.short(sb)(w) = br.read(sl); w += 1 }
          sb += 1
        }
      }
    } else {
      // scfsi groups (0-5)(6-10)(11-15)(16-20); reuse only in granule 1
      val groups = Array((0, 6), (6, 11), (11, 16), (16, 21))
      var gi = 0
      while (gi < 4) {
        val (from, until) = groups(gi)
        val reuse = gr == 1 && scfsi(gi) == 1
        var b = from
        while (b < until) {
          val sl = if (b < 11) slen1 else slen2
          out.long(b) = if (reuse) prev.long(b) else br.read(sl)
          b += 1
        }
        gi += 1
      }
    }
    out
  }

  // ---------------------------------------------------------- huffman

  /** decode one codeword from a table trie; -1 on malformed stream */
  private def huffDecode(br: BitReader, trie: Array[Int], limit: Int): Int = {
    var node = 0
    while (true) {
      if (br.pos >= limit || br.pos >= br.bytes.length * 8) return -1
      val b = br.read1()
      val v = trie(node * 2 + b)
      if (v < 0) return -v - 1
      if (v == 0) return -1 // dead branch (incomplete table)
      node = v
    }
    -1
  }

  /** MPEG-2 LSF scalefactors, the full non-intensity face: slens +
    * blocknumber from scalefac_compress ([[Mp3Tables.lsfSlens]]),
    * partitions per block shape ([[Mp3Tables.lsfSfbPartitions]] — the
    * same pinned table the encoder emits against). Returns the
    * scalefactors AND the scheme-implied preflag (LSF has no side-info
    * preflag bit; sfc >= 500 selects the preemphasis row). With
    * `intensity = true` (the right channel of an intensity frame) the
    * values are POSITIONS read under the blocknumber 3-5 scheme, and
    * the per-band illegal codes come back as the third element.
    */
  private def readScalefactorsLsf(br: BitReader, g: GranuleInfo,
      intensity: Boolean = false): (Scalefactors, Int, Array[Int]) = {
    val out = new Scalefactors
    val sfc = g.scalefacCompress
    val (slens, blocknumber, preflag) =
      if (intensity) {
        val (sl, bn) = Mp3Tables.lsfIntensitySlens(sfc)
        (sl, bn, 0)
      } else Mp3Tables.lsfSlens(sfc)
    val shape =
      if (!(g.windowSwitching && g.blockType == 2)) 0
      else if (g.mixedBlock) 2 else 1
    val partitions =
      if (intensity) Mp3Tables.lsfIntensityPartitions(blocknumber)(shape)
      else Mp3Tables.lsfSfbPartitions(blocknumber)(shape)
    // per-slot MAX code (the "illegal" intensity position that disables
    // intensity for the band); needed only on the i-channel. Slot layout
    // follows the read order below: shape 0 -> long band b; shape 1 ->
    // n = sfb*3 + w; shape 2 -> n<6 long band n, then 6 + (sfb-3)*3 + w.
    val maxPos = if (!intensity) null else {
      val slots = shape match { case 0 => 23; case 1 => 36; case _ => 33 }
      val mp = new Array[Int](slots)
      var b = 0; var part = 0
      while (part < 4) {
        var i = 0
        while (i < partitions(part)) {
          if (b < slots) mp(b) = (1 << slens(part)) - 1
          b += 1; i += 1
        }
        part += 1
      }
      mp
    }
    def readOne(sl: Int): Int = if (sl > 0) br.read(sl) else 0
    shape match {
      case 0 => // long: sequential bands 0..20 (21 total in every row)
        var b = 0
        var part = 0
        while (part < 4) {
          var i = 0
          while (i < partitions(part)) {
            if (b < 22) out.long(b) = readOne(slens(part))
            b += 1; i += 1
          }
          part += 1
        }
      case 1 => // short: (sfb, window) pairs sfb-major, 12 bands x 3
        var n = 0
        var part = 0
        while (part < 4) {
          var i = 0
          while (i < partitions(part)) {
            if (n < 36) out.short(n / 3)(n % 3) = readOne(slens(part))
            n += 1; i += 1
          }
          part += 1
        }
      case _ => // mixed: 6 long bands then short bands 3..11 x 3 windows
        var n = 0
        var part = 0
        while (part < 4) {
          var i = 0
          while (i < partitions(part)) {
            if (n < 6) out.long(n) = readOne(slens(part))
            else if (n < 33) {
              val k = n - 6
              out.short(3 + k / 3)(k % 3) = readOne(slens(part))
            }
            n += 1; i += 1
          }
          part += 1
        }
    }
    (out, preflag, maxPos)
  }

  private def sfbLongTab(lsf: Boolean, srIdx: Int): Array[Int] =
    if (lsf) Mp3Tables.sfbLongM2(srIdx) else Mp3Tables.sfbLongM1(srIdx)
  private def sfbShortTab(lsf: Boolean, srIdx: Int): Array[Int] =
    if (lsf) Mp3Tables.sfbShortM2(srIdx) else Mp3Tables.sfbShortM1(srIdx)

  /** Huffman-decode the granule spectrum into is[576]; false on any
    * malformed/unsupported condition.
    */
  private def readSpectrum(br: BitReader, g: GranuleInfo, srIdx: Int,
      granuleEnd: Int, is: Array[Int],
      allowNonNormative: Boolean = false, lsf: Boolean = false): Boolean = {
    java.util.Arrays.fill(is, 0)
    val sfbLong = sfbLongTab(lsf, srIdx)
    // region boundaries in line indices
    val bigLines = math.min(g.bigValues * 2, 576)
    val (r1Start, r2Start) =
      if (g.windowSwitching) (36, 576)
      else {
        val r0 = sfbLong(math.min(g.region0Count + 1, 22))
        val r1 = sfbLong(math.min(g.region0Count + 1 + g.region1Count + 1, 22))
        (r0, r1)
      }
    var i = 0
    while (i < bigLines) {
      val region = if (i < r1Start) 0 else if (i < r2Start) 1 else 2
      val tsel = g.tableSelect(region)
      val tab = Mp3Tables.big(tsel)
      if (tsel != 0 && !tab.usable) return false // unavailable codebook
      // in-repo canonical stand-in tables need the caller's opt-in
      if (tsel != 0 && !tab.normative && !allowNonNormative) return false
      if (tsel == 0) {
        is(i) = 0; is(i + 1) = 0
      } else {
        val sym = huffDecode(br, tab.trie, granuleEnd)
        if (sym < 0) return false
        var x = sym / tab.xy
        var y = sym % tab.xy
        if (x == 15 && tab.linbits > 0) x += br.read(tab.linbits)
        if (x != 0 && br.read1() == 1) x = -x
        if (y == 15 && tab.linbits > 0) y += br.read(tab.linbits)
        if (y != 0 && br.read1() == 1) y = -y
        is(i) = x; is(i + 1) = y
      }
      i += 2
    }
    // count1 region: quads until the granule's bit budget is consumed
    val c1 = Mp3Tables.count1A
    while (br.pos < granuleEnd && i <= 572) {
      var v = 0; var w = 0; var x = 0; var y = 0
      if (g.count1Table == 1) {
        // table B: 4 bits, value = one's complement
        val b = br.read(4) ^ 0xf
        v = (b >> 3) & 1; w = (b >> 2) & 1; x = (b >> 1) & 1; y = b & 1
      } else {
        val sym = huffDecode(br, c1.trie, granuleEnd)
        if (sym < 0) return br.pos >= granuleEnd // ran off exactly = done
        v = (sym >> 3) & 1; w = (sym >> 2) & 1; x = (sym >> 1) & 1; y = sym & 1
      }
      if (v != 0 && br.pos < granuleEnd && br.read1() == 1) v = -v
      if (w != 0 && br.pos < granuleEnd && br.read1() == 1) w = -w
      if (x != 0 && br.pos < granuleEnd && br.read1() == 1) x = -x
      if (y != 0 && br.pos < granuleEnd && br.read1() == 1) y = -y
      if (br.pos <= granuleEnd) {
        is(i) = v; is(i + 1) = w; is(i + 2) = x; is(i + 3) = y
        i += 4
      }
    }
    true
  }

  // ------------------------------------------------------- requantize

  private def requantize(g: GranuleInfo, sf: Scalefactors, srIdx: Int,
      is: Array[Int], xr: Array[Double], lsf: Boolean = false): Unit = {
    val gain = math.pow(2.0, (g.globalGain - 210).toDouble / 4.0)
    val sfMult = if (g.scalefacScale == 1) 1.0 else 0.5
    if (g.windowSwitching && g.blockType == 2) {
      val bands = sfbShortTab(lsf, srIdx)
      val longBands = sfbLongTab(lsf, srIdx)
      var i = 0
      if (g.mixedBlock) {
        // first 36 lines: long bands 0..7
        while (i < 36) {
          val band = longBands.lastIndexWhere(_ <= i,
            longBands.length - 1).max(0)
          val b = longBands.indexWhere(_ > i) - 1
          val pre = if (g.preflag == 1) Mp3Tables.pretab(b) else 0
          xr(i) = Mp3Tables.pow43(is(i)) * gain *
            math.pow(2.0, -sfMult * (sf.long(b) + pre))
          i += 1; band: Unit
        }
      }
      // short region: lines ordered band-major, 3 windows per band
      val startBand = if (g.mixedBlock) 3 else 0
      var sb = startBand
      var pos = i
      while (sb < 13 && pos < 576) {
        val width = bands(sb + 1) - bands(sb)
        var w = 0
        while (w < 3) {
          val sgain = math.pow(2.0,
            (g.globalGain - 210 - 8 * g.subblockGain(w)).toDouble / 4.0)
          val s = math.pow(2.0, -sfMult * (if (sb < 12) sf.short(sb)(w) else 0))
          var k = 0
          while (k < width && pos < 576) {
            xr(pos) = Mp3Tables.pow43(is(pos)) * sgain * s
            pos += 1; k += 1
          }
          w += 1
        }
        sb += 1
      }
      while (pos < 576) { xr(pos) = 0.0; pos += 1 }
    } else {
      val bands = sfbLongTab(lsf, srIdx)
      var b = 0
      while (b < 22) {
        val pre = if (g.preflag == 1) Mp3Tables.pretab(b) else 0
        val s = math.pow(2.0, -sfMult * (sf.long(b) + pre))
        var i = bands(b)
        while (i < bands(b + 1)) {
          xr(i) = Mp3Tables.pow43(is(i)) * gain * s
          i += 1
        }
        b += 1
      }
    }
  }

  /** short-block reorder (ISO 2.4.3.4.10.4): huffman order is band-major
    * (w0 w1 w2 per band); IMDCT wants window-major within each 18-line
    * subband triplet.
    */
  private def reorderShort(g: GranuleInfo, srIdx: Int,
      xr: Array[Double], lsf: Boolean = false): Unit = {
    if (!(g.windowSwitching && g.blockType == 2)) return
    val bands = sfbShortTab(lsf, srIdx)
    val out = new Array[Double](576)
    val start = if (g.mixedBlock) 36 else 0
    System.arraycopy(xr, 0, out, 0, start)
    val startBand = if (g.mixedBlock) 3 else 0
    var src = start
    var sb = startBand
    while (sb < 13) {
      val lo = bands(sb); val width = bands(sb + 1) - lo
      var w = 0
      while (w < 3) {
        var k = 0
        while (k < width) {
          val line = lo * 3 + w + 3 * k // window-interleaved target
          if (line < 576 && src < 576) out(line) = xr(src)
          src += 1; k += 1
        }
        w += 1
      }
      sb += 1
    }
    System.arraycopy(out, 0, xr, 0, 576)
  }

  // ----------------------------------------------------------- stereo

  private def applyStereo(modeExt: Int, g: Array[GranuleInfo],
      sf: Array[Scalefactors], srIdx: Int,
      xr: Array[Array[Double]],
      lsfIntensity: Option[(Double, Array[Int])] = None,
      lsf: Boolean = false): Unit = {
    val ms = (modeExt & 2) != 0
    val intensity = (modeExt & 1) != 0
    if (ms) {
      val invSqrt2 = 1.0 / math.sqrt(2.0)
      var i = 0
      while (i < 576) {
        val m = xr(0)(i); val s = xr(1)(i)
        xr(0)(i) = (m + s) * invSqrt2
        xr(1)(i) = (m - s) * invSqrt2
        i += 1
      }
    }
    if (intensity) {
      // Intensity rendering (ISO 11172-3 2.4.3.4.9.3 / 13818-3): MPEG-1
      // uses tan(pos*pi/12) position ratios with 7 the illegal code;
      // MPEG-2 LSF uses io^pos with io = 2^(-(scale+1)/4) where scale is
      // the i-channel's low scalefac_compress bit: odd pos attenuates
      // LEFT by io^((pos+1)/2), even pos attenuates RIGHT by io^(pos/2);
      // each band's per-slot MAX code is the illegal "no intensity"
      // position. Runs BEFORE the short-block reorder, so short spectra
      // are still band-major (sfb-major, three windows per band).
      val maxPos = lsfIntensity.map(_._2).orNull
      def render(pos: Int, illegalCode: Int, from: Int, until: Int): Unit = {
        val (kl, kr, legal) = lsfIntensity match {
          case Some((io, _)) =>
            val illegal = pos == illegalCode
            if (illegal || pos == 0) (1.0, 1.0, !illegal)
            else if ((pos & 1) == 1)
              (math.pow(io, (pos + 1) / 2), 1.0, true)
            else (1.0, math.pow(io, pos / 2), true)
          case None =>
            if (pos == illegalCode) (0.0, 0.0, false)
            else {
              val ratio = math.tan(pos * math.Pi / 12.0)
              (ratio / (1.0 + ratio), 1.0 / (1.0 + ratio), true)
            }
        }
        if (legal) {
          var i = from
          while (i < until) {
            val v = xr(0)(i)
            xr(0)(i) = v * kl
            xr(1)(i) = v * kr
            i += 1
          }
        }
      }
      val isShort = g(1).windowSwitching && g(1).blockType == 2
      if (!isShort) {
        // long-block intensity: bands at/above the right channel's rzero.
        // Band 21 carries no scalefactor: the spec reuses band 20's
        // position (and its illegal code).
        val bands = sfbLongTab(lsf, srIdx)
        var rzero = 576
        while (rzero > 0 && xr(1)(rzero - 1) == 0.0) rzero -= 1
        var b = 0
        while (b < 22) {
          if (bands(b) >= rzero) {
            val src = if (b == 21) 20 else b
            val pos = sf(1).long(src)
            val illegalCode =
              if (lsfIntensity.isEmpty) 7
              else if (maxPos == null || src >= maxPos.length) Int.MinValue
              else maxPos(src)
            render(pos, illegalCode, bands(b), math.min(bands(b + 1), 576))
          }
          b += 1
        }
      } else {
        // short/mixed-block intensity: the bound is determined for each
        // of the three windows separately (ISO 2.4.3.4.9.3) — a band is
        // intensity in window w iff it lies ABOVE the last band whose
        // window-w lines carry right-channel spectrum. Band 12 carries
        // no scalefactor: band 11's per-window position is reused.
        val sBands = sfbShortTab(lsf, srIdx)
        val mixed = g(1).mixedBlock
        val startBand = if (mixed) 3 else 0
        val lastNz = Array(-1, -1, -1)
        var sb = startBand
        while (sb < 13) {
          val lo = sBands(sb); val width = sBands(sb + 1) - lo
          var w = 0
          while (w < 3) {
            val base = lo * 3 + w * width
            var k = 0
            while (k < width) {
              if (base + k < 576 && xr(1)(base + k) != 0.0) { lastNz(w) = sb; k = width }
              else k += 1
            }
            w += 1
          }
          sb += 1
        }
        sb = startBand
        while (sb < 13) {
          val lo = sBands(sb); val width = sBands(sb + 1) - lo
          var w = 0
          while (w < 3) {
            if (sb > lastNz(w)) {
              val src = if (sb == 12) 11 else sb
              val pos = sf(1).short(src)(w)
              val illegalCode =
                if (lsfIntensity.isEmpty) 7
                else if (maxPos == null) Int.MinValue
                else {
                  val slot = if (!mixed) src * 3 + w else 6 + (src - 3) * 3 + w
                  if (slot < maxPos.length) maxPos(slot) else Int.MinValue
                }
              val base = lo * 3 + w * width
              render(pos, illegalCode, base, math.min(base + width, 576))
            }
            w += 1
          }
          sb += 1
        }
        if (mixed && lastNz(0) < 0 && lastNz(1) < 0 && lastNz(2) < 0) {
          // the whole short region is empty in every window, so the
          // spectrum's last nonzero part sits in the long region below:
          // ordinary long-band intensity against the long-region rzero
          val lBands = sfbLongTab(lsf, srIdx)
          var rzero = 36
          while (rzero > 0 && xr(1)(rzero - 1) == 0.0) rzero -= 1
          var b = 0
          while (b < 8 && lBands(b) < 36) {
            if (lBands(b) >= rzero) {
              val pos = sf(1).long(b)
              val illegalCode =
                if (lsfIntensity.isEmpty) 7
                else if (maxPos == null || b >= 6) Int.MinValue
                else maxPos(b)
              render(pos, illegalCode, lBands(b), math.min(lBands(b + 1), 36))
            }
            b += 1
          }
        }
      }
    }
  }

  // -------------------------------------------------------- antialias

  private def antialias(g: GranuleInfo, xr: Array[Double]): Unit = {
    val sblimit =
      if (g.windowSwitching && g.blockType == 2)
        (if (g.mixedBlock) 1 else 0)
      else 31
    var sb = 0
    while (sb < sblimit) {
      val off = (sb + 1) * 18
      var i = 0
      while (i < 8) {
        val lo = off - 1 - i
        val hi = off + i
        val a = xr(lo); val b = xr(hi)
        xr(lo) = a * Mp3Tables.csTab(i) - b * Mp3Tables.caTab(i)
        xr(hi) = b * Mp3Tables.csTab(i) + a * Mp3Tables.caTab(i)
        i += 1
      }
      sb += 1
    }
  }

  // ------------------------------------------------------------ imdct

  /** 36-point IMDCT of 18 lines (or 3x12 for short blocks), windowed;
    * result length 36.
    */
  private def imdctBlock(xr: Array[Double], off: Int, blockType: Int)
      : Array[Double] = {
    val out = new Array[Double](36)
    if (blockType == 2) {
      val win = Mp3Tables.imdctWin(2)
      var w = 0
      while (w < 3) {
        var i = 0
        while (i < 12) {
          var s = 0.0
          var k = 0
          while (k < 6) {
            s += xr(off + w + 3 * k) *
              math.cos(math.Pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1))
            k += 1
          }
          out(6 + w * 6 + i) += s * win(i)
          i += 1
        }
        w += 1
      }
    } else {
      val win = Mp3Tables.imdctWin(blockType)
      var i = 0
      while (i < 36) {
        var s = 0.0
        var k = 0
        while (k < 18) {
          s += xr(off + k) *
            math.cos(math.Pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))
          k += 1
        }
        out(i) = s * win(i)
        i += 1
      }
    }
    out
  }

  // -------------------------------------------------------- synthesis

  /** Direct-form polyphase synthesis (pseudo-QMF): the k-th synthesis
    * filter is g_k(n) = h(n) * cos((2k+1)(n+16)pi/64) over the 512-tap
    * prototype h ([[Mp3Tables.synthWindow]]); each 32-sample output step
    * convolves the last 16 subband slices with g. The direct form is the
    * unambiguous textbook definition — it avoids the spec's optimized
    * fifo/window access pattern whose sign conventions are baked into the
    * tabulated D constants this container cannot verify. Cost per step is
    * identical to the optimized form with the g table precomputed.
    */
  private val synthG: Array[Array[Double]] = {
    val h = Mp3Tables.synthWindow
    // 32 = band upsampling factor; 4 = measured analysis->synthesis chain
    // calibration for this prototype normalization (pinned by the
    // round-trip gain assertion in Mp3Layer3Spec)
    Array.tabulate(32, 512) { (k, n) =>
      128.0 * h(n) * math.cos((2 * k + 1) * (n + 16) * math.Pi / 64.0)
    }
  }

  /** per-channel synthesis state: ring of the last 16 subband slices */
  private final class SynthState {
    val s = Array.ofDim[Double](16, 32)
    var head = 0 // index of the NEWEST slice
  }

  /** one 32-sample synthesis step from one time-slice sIn[32] */
  private def synthStepFast(st: SynthState, sIn: Array[Double],
      out: Array[Double], outOff: Int, outStride: Int): Unit = {
    st.head = (st.head + 15) & 15 // push front
    System.arraycopy(sIn, 0, st.s(st.head), 0, 32)
    var j = 0
    while (j < 32) {
      var sum = 0.0
      var r = 0
      while (r < 16) {
        val slice = st.s((st.head + r) & 15)
        val n = 32 * r + j
        var k = 0
        while (k < 32) {
          sum += slice(k) * synthG(k)(n)
          k += 1
        }
        r += 1
      }
      out(outOff + j * outStride) = sum
      j += 1
    }
  }

  /** Pure filterbank path for the inverse-property spec: run the decode
    * DSP (antialias, IMDCT, overlap-add, frequency inversion, polyphase
    * synthesis) directly on long-block granule spectra, bypassing the
    * bitstream/quantization layers. Paired with
    * [[Mp3Encoder.forwardSpectra]] this isolates the filterbank's
    * reconstruction error from quantization noise.
    */
  private[ext] def synthesizeSpectra(spectra: Array[Array[Double]])
      : Array[Double] = {
    val g = GranuleInfo(0, 0, 210, 0, windowSwitching = false, 0,
      mixedBlock = false, Array(0, 0, 0), Array(0, 0, 0), 0, 0, 0, 0, 0)
    val overlap = Array.fill(32)(new Array[Double](18))
    val st = new SynthState
    val out = new Array[Double](spectra.length * 576)
    var gi = 0
    while (gi < spectra.length) {
      val xr = spectra(gi).clone()
      antialias(g, xr)
      val timeSb = Array.ofDim[Double](32, 18)
      var sb = 0
      while (sb < 32) {
        val block = imdctBlock(xr, sb * 18, 0)
        var i = 0
        while (i < 18) {
          timeSb(sb)(i) = block(i) + overlap(sb)(i)
          overlap(sb)(i) = block(18 + i)
          i += 1
        }
        if (sb % 2 == 1) {
          i = 1
          while (i < 18) { timeSb(sb)(i) = -timeSb(sb)(i); i += 2 }
        }
        sb += 1
      }
      var t = 0
      while (t < 18) {
        val s = new Array[Double](32)
        var k = 0
        while (k < 32) { s(k) = timeSb(k)(t); k += 1 }
        synthStepFast(st, s, out, gi * 576 + t * 32, 1)
        t += 1
      }
      gi += 1
    }
    out
  }

  /** Delay+gain-fitted PSNR (standard codec comparison): scan delays
    * 0..maxDelay, least-squares gain per delay, return the best
    * (delay, gain, psnrDb). The filterbank chain has a fixed group delay
    * and an arbitrary linear gain convention; fitting both measures
    * waveform fidelity, which is the property the decode chain owes.
    */
  def fitPsnr(ref: Array[Double], dec: Array[Double], maxDelay: Int)
      : (Int, Double, Double) = {
    var best = (0, 0.0, -999.0)
    var d = 0
    while (d <= maxDelay) {
      val n = math.min(ref.length, dec.length - d)
      if (n > 256) {
        var num = 0.0; var den = 0.0; var i = 0
        while (i < n) {
          num += ref(i) * dec(i + d); den += dec(i + d) * dec(i + d); i += 1
        }
        val g = if (den > 0) num / den else 0.0
        var err = 0.0; var sig = 0.0
        i = 0
        while (i < n) {
          val e = ref(i) - g * dec(i + d)
          err += e * e; sig += ref(i) * ref(i); i += 1
        }
        val psnr = if (err > 0) 10.0 * math.log10(sig / err) else 999.0
        if (psnr > best._3) best = (d, g, psnr)
      }
      d += 1
    }
    best
  }

  // ------------------------------------------------------------ decode

  /** Decode an MPEG-1 Layer III stream to PCM. Returns None on any
    * malformed frame, unavailable/refused codebook, or non-MPEG-1 input —
    * a crafted stream whose side-info lengths point past the reservoir
    * must reject, never throw (same malformed-input contract as the
    * other decoders here).
    *
    * `allowNonNormative = true` opts in to the IN-REPO canonical
    * codebooks standing in for ISO tables 11/13/16-31 (full ESC
    * mechanics; see [[Mp3Tables.big]]). The default refuses them: a
    * spec-exact third-party stream selecting those tables would decode
    * to garbage under different bit patterns, and None beats garbage.
    */
  def decode(bytes: Array[Byte], maxFrames: Int = 4096,
      allowNonNormative: Boolean = false): Option[Decoded] =
    try decodeImpl(bytes, maxFrames, allowNonNormative)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(bytes: Array[Byte], maxFrames: Int,
      allowNonNormative: Boolean): Option[Decoded] = {
    var off = id3v2Size(bytes)
    // resync to first frame
    var first: Option[Mp3Frame] = None
    while (first.isEmpty && off + 4 <= bytes.length) {
      first = parseMp3Frame(bytes, off).filter(f =>
        parseMp3Frame(bytes, off + f.frameBytes).isDefined ||
          off + f.frameBytes >= bytes.length)
      if (first.isEmpty) off += 1
    }
    val f0 = first.getOrElse(return None)
    if ((f0.versionId != 3 && f0.versionId != 2) || f0.layer != 3) return None
    val lsf = f0.versionId == 2
    val channels = f0.channels
    val srIdx =
      if (lsf) Array(22050, 24000, 16000).indexOf(f0.sampleRate)
      else Array(44100, 48000, 32000).indexOf(f0.sampleRate)
    if (srIdx < 0) return None

    val reservoir = new java.util.ArrayList[Byte]()
    val pcm = new scala.collection.mutable.ArrayBuffer[Double]()
    // overlap-add store [ch][32][18]
    val overlap = Array.fill(channels, 32)(new Array[Double](18))
    val synth = Array.fill(channels)(new SynthState)
    val prevSf = Array.fill(channels)(new Scalefactors)

    var nGranules = 0
    var frames = 0
    var pos = off
    var ok = true
    while (ok && frames < maxFrames && pos + 4 <= bytes.length) {
      parseMp3Frame(bytes, pos) match {
        case None => pos = bytes.length // done (trailing tag)
        case Some(f) =>
          if (f.versionId != f0.versionId || f.layer != 3 ||
            f.sampleRate != f0.sampleRate || f.channels != channels) {
            ok = false
          } else if (pos + f.frameBytes > bytes.length) {
            pos = bytes.length // truncated final frame: stop cleanly
          } else {
            val crc = (bytes(pos + 1) & 1) == 0
            val headerLen = 4 + (if (crc) 2 else 0)
            val sideLen =
              if (lsf) (if (channels == 1) 9 else 17)
              else if (channels == 1) 17 else 32
            val sideBr = new BitReader(
              java.util.Arrays.copyOfRange(bytes, pos + headerLen,
                pos + headerLen + sideLen))
            val side = readSideInfo(sideBr, channels, lsf)
            val modeExt = (bytes(pos + 3) >> 4) & 3

            val mainStart = pos + headerLen + sideLen
            val mainLen = f.frameBytes - headerLen - sideLen
            if (mainLen < 0) { ok = false }
            else {
              val resBefore = reservoir.size()
              var i = 0
              while (i < mainLen) {
                reservoir.add(bytes(mainStart + i)); i += 1
              }
              val begin = resBefore - side.mainDataBegin
              if (begin >= 0) {
                val resBytes = new Array[Byte](reservoir.size() - begin)
                var j = 0
                while (j < resBytes.length) {
                  resBytes(j) = reservoir.get(begin + j); j += 1
                }
                val br = new BitReader(resBytes)
                val frameOk = decodeFrameGranules(br, side, channels, srIdx,
                  allowNonNormative, lsf, modeExt, prevSf, overlap, synth, pcm)
                if (frameOk) nGranules += (if (lsf) 1 else 2) else ok = false
              }
              // else: reservoir underrun (stream started mid-reservoir) — skip
              // bound the reservoir (spec max 511 bytes of lookback + frame)
              while (reservoir.size() > 4096) reservoir.remove(0)
            }
            frames += 1
            pos += f.frameBytes
          }
      }
    }
    if (!ok || nGranules == 0) None
    else Some(Decoded(f0.sampleRate, channels, nGranules, pcm.toArray))
  }

  /** decode both granules of one frame from the reservoir reader */
  private def decodeFrameGranules(br: BitReader, side: SideInfo,
      channels: Int, srIdx: Int, allowNonNormative: Boolean, lsf: Boolean,
      modeExt: Int,
      prevSf: Array[Scalefactors],
      overlap: Array[Array[Array[Double]]],
      synth: Array[SynthState],
      pcm: scala.collection.mutable.ArrayBuffer[Double]): Boolean = {
    var gr = 0
    val nGr = if (lsf) 1 else 2
    while (gr < nGr) {
      val xr = Array.fill(channels)(new Array[Double](576))
      val gs = side.granules(gr)
      val sfs = new Array[Scalefactors](channels)
      var lsfMaxPos: Array[Int] = null // i-channel per-band illegal codes
      var ch = 0
      while (ch < channels) {
        var g = gs(ch)
        val granuleStart = br.pos
        val granuleEnd = granuleStart + g.part23Length
        if (granuleEnd > br.bytes.length * 8) return false
        val sf =
          if (lsf) {
            // the RIGHT channel of an intensity LSF frame reads the
            // intensity scheme (blocknumbers 3-5) and yields positions
            val isIChannel = channels == 2 && (modeExt & 1) != 0 && ch == 1
            val (s0, pf, mp) = readScalefactorsLsf(br, g, isIChannel)
            g = g.copy(preflag = pf) // scheme-implied (no side-info bit)
            if (isIChannel) lsfMaxPos = mp
            s0
          } else readScalefactors(br, g, ch, gr, side.scfsi(ch), prevSf(ch))
        sfs(ch) = sf
        if (gr == 0 || !(g.windowSwitching && g.blockType == 2))
          prevSf(ch) = sf
        val is = new Array[Int](576)
        if (!readSpectrum(br, g, srIdx, granuleEnd, is, allowNonNormative, lsf))
          return false
        br.pos = granuleEnd // discard stuffing
        requantize(g, sf, srIdx, is, xr(ch), lsf)
        ch += 1
      }
      // stereo processing runs in the band-major (pre-reorder) domain so
      // short-block intensity can resolve per-window bounds; MS is
      // per-line and long-block reorder is the identity, so ordering is
      // immaterial for every other mode
      if (channels == 2)
        applyStereo(modeExt, gs, sfs, srIdx, xr,
          lsfIntensity = if (lsf && (modeExt & 1) != 0)
            Some((math.pow(2.0, -((gs(1).scalefacCompress & 1) + 1) / 4.0),
              lsfMaxPos))
          else None,
          lsf = lsf)
      ch = 0
      while (ch < channels) {
        reorderShort(gs(ch), srIdx, xr(ch), lsf)
        ch += 1
      }

      ch = 0
      val granulePcm = Array.ofDim[Double](channels, 576)
      while (ch < channels) {
        val g = gs(ch)
        antialias(g, xr(ch))
        // hybrid: per subband IMDCT + overlap-add + frequency inversion
        val timeSb = Array.ofDim[Double](32, 18)
        var sb = 0
        while (sb < 32) {
          val bt =
            if (g.windowSwitching && g.mixedBlock && sb < 2) 0
            else if (g.windowSwitching) g.blockType
            else 0
          val block = imdctBlock(xr(ch), sb * 18, bt)
          var i = 0
          while (i < 18) {
            timeSb(sb)(i) = block(i) + overlap(ch)(sb)(i)
            overlap(ch)(sb)(i) = block(18 + i)
            i += 1
          }
          // frequency inversion: odd subbands negate odd samples
          if (sb % 2 == 1) {
            i = 1
            while (i < 18) { timeSb(sb)(i) = -timeSb(sb)(i); i += 2 }
          }
          sb += 1
        }
        // synthesis: 18 time slices of 32 subband samples
        var t = 0
        while (t < 18) {
          val s = new Array[Double](32)
          var k = 0
          while (k < 32) { s(k) = timeSb(k)(t); k += 1 }
          synthStepFast(synth(ch), s, granulePcm(ch), t * 32, 1)
          t += 1
        }
        ch += 1
      }
      // interleave
      var i = 0
      while (i < 576) {
        var c = 0
        while (c < channels) { pcm += granulePcm(c)(i); c += 1 }
        i += 1
      }
      gr += 1
    }
    true
  }
}

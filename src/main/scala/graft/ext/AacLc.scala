package graft.ext

import AacTables._

/** AAC-LC decoder (ISO 13818-7 low-complexity profile over ADTS
  * framing) — the complete constant-free LC path: ADTS header walk,
  * SCE/CPE syntactic elements, ics_info for all four window sequences
  * (ONLY_LONG / LONG_START / EIGHT_SHORT with window grouping /
  * LONG_STOP), section data with escape run-lengths, DPCM scalefactor
  * decode, spectral Huffman tuples (4- and 2-dim books, unsigned books
  * with sign bits, book-11 escape sequences), pulse application, TNS
  * coefficient dequantization + all-pole synthesis filtering, M/S
  * stereo, the 4/3-power dequantizer, and the IMDCT with sine/KBD
  * windows (previous-frame shape on the left slope) and 1024-sample
  * overlap-add.
  *
  * Honesty gate (see [[AacTables]]): the normative Huffman bit patterns
  * and scalefactor-band offsets are offline-unobtainable, so decode
  * REFUSES by default (None); `allowNonNormative = true` opts into the
  * in-repo canonical codebooks, under which streams from [[AacEncoder]]
  * round-trip with measured PSNR. Crafted input never throws.
  */
object AacLc {

  final case class Decoded(sampleRate: Int, channels: Int, nFrames: Int,
      nShortFrames: Int, msUsed: Boolean, tnsUsed: Boolean,
      escUsed: Boolean, samples: Array[Double])

  private object Eos extends RuntimeException("out of bits") {
    override def fillInStackTrace(): Throwable = this
  }
  private final class Malformed(m: String) extends RuntimeException(m)
  private def bad(m: String): Nothing = throw new Malformed(m)

  // MSB-first bit reader (ADTS/AAC bit order)
  private final class BitReader(val bytes: Array[Byte], var pos: Int,
      val limit: Int) {
    def bit(): Int = {
      if (pos >= limit) throw Eos
      val b = bytes(pos >>> 3) & 0xff
      val r = (b >>> (7 - (pos & 7))) & 1
      pos += 1
      r
    }
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def align(): Unit = { pos = (pos + 7) & ~7 }
  }

  private def decodeCanon(br: BitReader, book: CanonBook): Int = {
    var acc = 0
    var len = 0
    while (len < book.maxLen) {
      acc = (acc << 1) | br.bit()
      len += 1
      val e = book.lookup(len, acc)
      if (e >= 0) return e
    }
    bad("invalid codeword")
  }

  // ------------------------------------------------------- ics state

  private final case class IcsInfo(windowSequence: Int, windowShape: Int,
      maxSfb: Int, groups: Array[Int] /* windows per group */) {
    def short: Boolean = windowSequence == 2
    def numWindows: Int = if (short) 8 else 1
    def swb: Array[Int] = if (short) swbShort else swbLong
  }

  private def readIcsInfo(br: BitReader): IcsInfo = {
    if (br.bit() != 0) bad("ics_reserved")
    val ws = br.read(2)
    val shape = br.bit()
    if (ws == 2) {
      val maxSfb = br.read(4)
      if (maxSfb > swbShort.length - 1) bad("max_sfb short")
      val grouping = br.read(7)
      val groups = scala.collection.mutable.ArrayBuffer[Int](1)
      var w = 1
      while (w < 8) {
        if (((grouping >> (7 - w)) & 1) == 1)
          groups(groups.length - 1) += 1
        else groups += 1
        w += 1
      }
      IcsInfo(ws, shape, maxSfb, groups.toArray)
    } else {
      val maxSfb = br.read(6)
      if (maxSfb > swbLong.length - 1) bad("max_sfb long")
      if (br.bit() != 0) bad("predictor_data_present in LC")
      IcsInfo(ws, shape, maxSfb, Array(1))
    }
  }

  // ---------------------------------------------- per-channel stream

  private final case class Tns(nFilt: Array[Int],
      filters: Array[Array[(Int, Int, Boolean, Array[Double])]])
      // per window: (length, order, downward, lpc)

  private final class ChannelData(val info: IcsInfo) {
    // quantized spectra per group, linear (sfb-major, window, bin)
    var sectCb: Array[Array[Int]] = _ // [group][sfb]
    var sf: Array[Array[Int]] = _ // [group][sfb]
    var quant: Array[Array[Int]] = _ // [group][linear coefficients]
    var tns: Option[Tns] = None
    var escUsed = false
    /** dequantized per-WINDOW spectra [window][bin] */
    def dequantize(): Array[Array[Double]] = {
      val swb = info.swb
      val n2 = if (info.short) 128 else 1024
      val out = Array.ofDim[Double](info.numWindows, n2)
      var g = 0
      var winBase = 0
      while (g < info.groups.length) {
        val wins = info.groups(g)
        var off = 0
        var sfb = 0
        while (sfb < info.maxSfb) {
          val width = swb(sfb + 1) - swb(sfb)
          val cb = sectCb(g)(sfb)
          if (cb != 0) {
            val gain = math.pow(2.0, 0.25 * (sf(g)(sfb) - SfOffset))
            var w = 0
            while (w < wins) {
              var i = 0
              while (i < width) {
                val q = quant(g)(off + w * width + i)
                out(winBase + w)(swb(sfb) + i) =
                  math.signum(q.toDouble) *
                    math.pow(math.abs(q).toDouble, 4.0 / 3.0) * gain
                i += 1
              }
              w += 1
            }
          }
          off += width * wins
          sfb += 1
        }
        winBase += wins
        g += 1
      }
      out
    }
  }

  private def readSectionData(br: BitReader, cd: ChannelData): Unit = {
    val info = cd.info
    val secBits = if (info.short) 3 else 5
    val esc = (1 << secBits) - 1
    cd.sectCb = Array.ofDim[Int](info.groups.length, info.maxSfb)
    var g = 0
    while (g < info.groups.length) {
      var k = 0
      while (k < info.maxSfb) {
        val cb = br.read(4)
        if (cb == 12 || cb == 13 || cb == 14 || cb == 15)
          bad(s"unsupported codebook $cb (intensity/reserved)")
        var len = 0
        var l = br.read(secBits)
        while (l == esc) { len += esc; l = br.read(secBits) }
        len += l
        if (len == 0 || k + len > info.maxSfb) bad("section overrun")
        var i = 0
        while (i < len) { cd.sectCb(g)(k + i) = cb; i += 1 }
        k += len
      }
      g += 1
    }
  }

  private def readScaleFactors(br: BitReader, cd: ChannelData,
      globalGain: Int): Unit = {
    val info = cd.info
    cd.sf = Array.ofDim[Int](info.groups.length, info.maxSfb)
    var sf = globalGain
    var g = 0
    while (g < info.groups.length) {
      var sfb = 0
      while (sfb < info.maxSfb) {
        if (cd.sectCb(g)(sfb) != 0) {
          sf += decodeCanon(br, sfBook) - 60
          if (sf < 0 || sf > 255) bad("scalefactor out of range")
          cd.sf(g)(sfb) = sf
        }
        sfb += 1
      }
      g += 1
    }
  }

  private def linearOffset(info: IcsInfo, g: Int, sfb: Int): Int = {
    val swb = info.swb
    var off = 0
    var s = 0
    while (s < sfb) {
      off += (swb(s + 1) - swb(s)) * info.groups(g)
      s += 1
    }
    off
  }

  private def readTns(br: BitReader, cd: ChannelData): Tns = {
    val info = cd.info
    val nW = info.numWindows
    val nFilt = new Array[Int](nW)
    val filters =
      new Array[Array[(Int, Int, Boolean, Array[Double])]](nW)
    var w = 0
    while (w < nW) {
      nFilt(w) = br.read(if (info.short) 1 else 2)
      val fs = new Array[(Int, Int, Boolean, Array[Double])](nFilt(w))
      if (nFilt(w) > 0) {
        val coefResBits = br.bit() + 3
        var f = 0
        while (f < nFilt(w)) {
          val length = br.read(if (info.short) 4 else 6)
          val order = br.read(if (info.short) 3 else 5)
          if (order > 12) bad("tns order")
          if (order > 0) {
            val down = br.bit() == 1
            val compress = br.bit()
            val coefLen = coefResBits - compress
            val iqfac = ((1 << (coefResBits - 1)) - 0.5) / (math.Pi / 2.0)
            val iqfacM = ((1 << (coefResBits - 1)) + 0.5) / (math.Pi / 2.0)
            val refl = Array.fill(order) {
              val raw = br.read(coefLen)
              val s = if (raw >= (1 << (coefLen - 1))) raw - (1 << coefLen)
                else raw
              if (s >= 0) math.sin(s / iqfac) else math.sin(s / iqfacM)
            }
            // reflection -> direct-form LPC (Levinson step-up)
            val a = new Array[Double](order + 1)
            a(0) = 1.0
            var m = 1
            while (m <= order) {
              val b = new Array[Double](order + 1)
              var i = 1
              while (i < m) { b(i) = a(i) + refl(m - 1) * a(m - i); i += 1 }
              i = 1
              while (i < m) { a(i) = b(i); i += 1 }
              a(m) = refl(m - 1)
              m += 1
            }
            fs(f) = (length, order, down, a)
          } else fs(f) = (length, 0, false, Array(1.0))
          f += 1
        }
      }
      filters(w) = fs
      w += 1
    }
    Tns(nFilt, filters)
  }

  /** all-pole TNS synthesis filter over the spectral bands, top-down
    * region allocation (in-repo tns_max_bands = max_sfb, see AacTables)
    */
  private def applyTns(spectra: Array[Array[Double]], cd: ChannelData)
      : Unit = {
    val tns = cd.tns.getOrElse(return)
    val info = cd.info
    val swb = info.swb
    val n2 = if (info.short) 128 else 1024
    var w = 0
    while (w < info.numWindows) {
      var top = info.maxSfb
      var f = 0
      while (f < tns.nFilt(w)) {
        val (length, order, down, a) = tns.filters(w)(f)
        val bottom = math.max(0, top - length)
        if (order > 0) {
          val start = math.min(swb(bottom), n2)
          val end = math.min(swb(top), n2)
          val x = spectra(w)
          if (down) {
            var i = end - 1
            while (i >= start) {
              var k = 1
              while (k <= order && i + k < end) {
                x(i) -= a(k) * x(i + k)
                k += 1
              }
              i -= 1
            }
          } else {
            var i = start
            while (i < end) {
              var k = 1
              while (k <= order && i - k >= start) {
                x(i) -= a(k) * x(i - k)
                k += 1
              }
              i += 1
            }
          }
        }
        top = bottom
        f += 1
      }
      w += 1
    }
  }

  private def readSpectral(br: BitReader, cd: ChannelData): Unit = {
    val info = cd.info
    val swb = info.swb
    cd.quant = Array.tabulate(info.groups.length)(g =>
      new Array[Int](linearOffset(info, g, info.maxSfb)))
    var g = 0
    while (g < info.groups.length) {
      var sfb = 0
      while (sfb < info.maxSfb) {
        val cb = cd.sectCb(g)(sfb)
        if (cb >= 1 && cb <= 11) {
          val book = specBooks(cb)
          val off = linearOffset(info, g, sfb)
          val total = (swb(sfb + 1) - swb(sfb)) * info.groups(g)
          var i = 0
          while (i < total) {
            val entry = decodeCanon(br, book.book)
            val vals = book.tuple(entry)
            var d = 0
            while (d < book.dims) {
              var v = vals(d)
              if (!book.signed && v != 0) {
                val neg = br.bit() == 1
                if (cb == 11 && v == 16) {
                  // escape: N ones, 0, then N+4 bits
                  var n = 0
                  while (br.bit() == 1) {
                    n += 1
                    if (n > 12) bad("escape prefix")
                  }
                  v = (1 << (n + 4)) + br.read(n + 4)
                  cd.escUsed = true
                }
                if (neg) v = -v
              }
              cd.quant(g)(off + i) = v
              i += 1
              d += 1
            }
          }
        }
        sfb += 1
      }
      g += 1
    }
  }

  // --------------------------------------------------- filterbank

  private val imdctTables =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()

  /** cos(2π/N (n + n0)(k + 1/2)) flat [k * N + n], n0 = (N/2 + 1)/2 */
  private[ext] def aacMdctTable(bigN: Int): Array[Double] =
    imdctTables.computeIfAbsent(bigN, { _ =>
      val n2 = bigN / 2
      val n0 = (bigN / 2 + 1) / 2.0
      val t = new Array[Double](n2 * bigN)
      var k = 0
      while (k < n2) {
        var n = 0
        while (n < bigN) {
          t(k * bigN + n) =
            math.cos(2.0 * math.Pi / bigN * (n + n0) * (k + 0.5))
          n += 1
        }
        k += 1
      }
      t
    })

  private def imdct(spec: Array[Double], bigN: Int): Array[Double] = {
    val n2 = bigN / 2
    val t = aacMdctTable(bigN)
    val out = new Array[Double](bigN)
    val scale = 2.0 / bigN
    var k = 0
    while (k < n2) {
      val x = spec(k)
      if (x != 0.0) {
        val base = k * bigN
        var n = 0
        while (n < bigN) { out(n) += x * t(base + n); n += 1 }
      }
      k += 1
    }
    var n = 0
    while (n < bigN) { out(n) *= scale; n += 1 }
    out
  }

  // window halves are pure functions of (shape, length) — compute each
  // ONCE per JVM. longSeqWindow/shortSeqWindow are called per SAMPLE, and
  // rebuilding the 1024-point sine (1024 sin calls) or KBD half (~50k
  // Bessel flops) per lookup made windowing one frame cost ~2M window
  // reconstructions (profiled: 2.2 s/stream, 103 s for the 48-stream
  // battery row; cached: ~linear in samples).
  private lazy val longSine = sineWindow(1024)
  private lazy val longKbd = kbdWindow(1024)
  private lazy val shortSine = sineWindow(128)
  private lazy val shortKbd = kbdWindow(128)
  private def longWin(shape: Int): Array[Double] =
    if (shape == 1) longKbd else longSine
  private def shortWin(shape: Int): Array[Double] =
    if (shape == 1) shortKbd else shortSine

  /** window value at position n of a 2048 LONG-variant frame (sequences
    * 0/1/3) — shared by decoder synthesis and encoder analysis so the
    * two cannot drift
    */
  private[ext] def longSeqWindow(sequence: Int, prevShape: Int,
      shape: Int, n: Int): Double = sequence match {
    case 0 =>
      if (n < 1024) longWin(prevShape)(n) else longWin(shape)(2047 - n)
    case 1 =>
      if (n < 1024) longWin(prevShape)(n)
      else if (n < 1472) 1.0
      else if (n < 1600) shortWin(shape)(1599 - n)
      else 0.0
    case _ =>
      if (n < 448) 0.0
      else if (n < 576) shortWin(prevShape)(n - 448)
      else if (n < 1024) 1.0
      else longWin(shape)(2047 - n)
  }

  /** window value at position n (0..255) of short window w (0..7) in an
    * EIGHT_SHORT frame — first window's rise uses the previous shape
    */
  private[ext] def shortSeqWindow(w: Int, prevShape: Int, shape: Int,
      n: Int): Double =
    if (n < 128) { if (w == 0) shortWin(prevShape)(n) else shortWin(shape)(n) }
    else shortWin(shape)(255 - n)

  /** window the IMDCT output of one frame into a 2048 buffer per the
    * window sequence; left slope uses the PREVIOUS frame's shape
    */
  private[ext] def windowFrame(spectra: Array[Array[Double]],
      info: IcsInfo, prevShape: Int): Array[Double] = {
    val out = new Array[Double](2048)
    if (info.short) {
      var w = 0
      while (w < 8) {
        val time = imdct(spectra(w), 256)
        val base = 448 + 128 * w
        var n = 0
        while (n < 256) {
          out(base + n) +=
            time(n) * shortSeqWindow(w, prevShape, info.windowShape, n)
          n += 1
        }
        w += 1
      }
    } else {
      val time = imdct(spectra(0), 2048)
      var n = 0
      while (n < 2048) {
        out(n) = time(n) *
          longSeqWindow(info.windowSequence, prevShape, info.windowShape, n)
        n += 1
      }
    }
    out
  }

  // --------------------------------------------------- frame decode

  private final case class FrameResult(
      channels: Array[Array[Double]] /* [ch][2048] windowed */,
      info: IcsInfo, msUsed: Boolean, tnsUsed: Boolean, escUsed: Boolean)

  private def readChannelStream(br: BitReader, common: Option[IcsInfo])
      : ChannelData = {
    val globalGain = br.read(8)
    val info = common.getOrElse(readIcsInfo(br))
    val cd = new ChannelData(info)
    readSectionData(br, cd)
    readScaleFactors(br, cd, globalGain)
    // syntax order: pulse flag+data, tns flag+data, gain control flag,
    // spectral data; pulse amplitudes apply to the QUANTIZED values, so
    // the application is deferred until the spectra are read
    var pulsePending: Option[() => Unit] = None
    if (br.bit() == 1) {
      if (info.short) bad("pulse on short window")
      val n = br.read(2) + 1
      val startSfb = br.read(6)
      if (startSfb >= swbLong.length) bad("pulse sfb")
      val offsets = Array.fill(n)((br.read(5), br.read(4)))
      pulsePending = Some(() => {
        var pos = swbLong(startSfb)
        offsets.foreach { case (off, amp) =>
          pos += off
          val sfb = (0 until info.maxSfb).lastIndexWhere(s =>
            info.swb(s) <= pos)
          if (pos < 1024 && sfb >= 0 && pos < info.swb(sfb + 1) &&
              cd.sectCb(0)(sfb) != 0) {
            val o = linearOffset(info, 0, sfb) + (pos - info.swb(sfb))
            val q = cd.quant(0)(o)
            cd.quant(0)(o) = if (q >= 0) q + amp else q - amp
          }
        }
      })
    }
    if (br.bit() == 1) cd.tns = Some(readTns(br, cd))
    if (br.bit() == 1) bad("gain control in LC")
    readSpectral(br, cd)
    pulsePending.foreach(_.apply())
    cd
  }

  private def decodeFrameBody(br: BitReader, channels: Int,
      prevShape: Int): FrameResult = {
    var result: FrameResult = null
    var done = false
    while (!done) {
      val id = br.read(3)
      id match {
        case 0 => // SCE
          br.read(4): Unit // instance tag
          val cd = readChannelStream(br, None)
          val spectra = cd.dequantize()
          applyTns(spectra, cd)
          result = FrameResult(
            Array(windowFrame(spectra, cd.info, prevShape)),
            cd.info, msUsed = false, cd.tns.nonEmpty, cd.escUsed)
        case 1 => // CPE
          br.read(4): Unit
          val commonWindow = br.bit() == 1
          if (!commonWindow) bad("CPE without common window unsupported")
          val info = readIcsInfo(br)
          val msMask = br.read(2)
          val msBits: Array[Array[Boolean]] =
            if (msMask == 1)
              Array.tabulate(info.groups.length, info.maxSfb)((_, _) =>
                br.bit() == 1)
            else
              Array.tabulate(info.groups.length, info.maxSfb)((_, _) =>
                msMask == 2)
          val cdL = readChannelStream(br, Some(info))
          val cdR = readChannelStream(br, Some(info))
          val sl = cdL.dequantize()
          val sr = cdR.dequantize()
          // M/S: applied on dequantized spectra per group/sfb
          var used = false
          var g = 0
          var winBase = 0
          while (g < info.groups.length) {
            var sfb = 0
            while (sfb < info.maxSfb) {
              if (msBits(g)(sfb)) {
                used = true
                val lo = info.swb(sfb)
                val hi = info.swb(sfb + 1)
                var w = 0
                while (w < info.groups(g)) {
                  var i = lo
                  while (i < hi) {
                    val m = sl(winBase + w)(i)
                    val s = sr(winBase + w)(i)
                    sl(winBase + w)(i) = m + s
                    sr(winBase + w)(i) = m - s
                    i += 1
                  }
                  w += 1
                }
              }
              sfb += 1
            }
            winBase += info.groups(g)
            g += 1
          }
          applyTns(sl, cdL)
          applyTns(sr, cdR)
          result = FrameResult(
            Array(windowFrame(sl, info, prevShape),
              windowFrame(sr, info, prevShape)),
            info, used, cdL.tns.nonEmpty || cdR.tns.nonEmpty,
            cdL.escUsed || cdR.escUsed)
        case 4 => // DSE
          br.read(4): Unit
          val alignFlag = br.bit()
          var cnt = br.read(8)
          if (cnt == 255) cnt += br.read(8)
          if (alignFlag == 1) br.align()
          var i = 0
          while (i < cnt) { br.read(8): Unit; i += 1 }
        case 6 => // FIL
          var cnt = br.read(4)
          if (cnt == 15) cnt += br.read(8) - 1
          var i = 0
          while (i < cnt) { br.read(8): Unit; i += 1 }
        case 7 => done = true // END
        case other => bad(s"unsupported element $other")
      }
    }
    if (result == null) bad("no audio element")
    if (result.channels.length != channels) bad("element/channel mismatch")
    result
  }

  // ------------------------------------------------------ stream walk

  /** Decode an ADTS AAC-LC stream. Default REFUSES (the codebooks are
    * in-repo canonical stand-ins, not the normative tables);
    * `allowNonNormative = true` opts in. Never throws.
    */
  def decode(bytes: Array[Byte], allowNonNormative: Boolean = false)
      : Option[Decoded] =
    try {
      if (!allowNonNormative) {
        // verify it IS an ADTS stream, then refuse honestly
        if (bytes.length >= 7 && (bytes(0) & 0xff) == 0xff &&
          (bytes(1) & 0xf0) == 0xf0) None
        else None
      } else decodeImpl(bytes)
    } catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(bytes: Array[Byte]): Option[Decoded] = {
    var off = 0
    var sampleRate = 0
    var channels = 0
    var nFrames = 0
    var nShort = 0
    var ms = false
    var tns = false
    var escU = false
    val prevHalf = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val out = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    var prevShape = 0
    while (off + 7 <= bytes.length) {
      if (!((bytes(off) & 0xff) == 0xff && (bytes(off + 1) & 0xf0) == 0xf0))
        return finish(sampleRate, channels, nFrames, nShort, ms, tns, escU,
          out, channels)
      val hdr = new BitReader(bytes, off * 8 + 12, bytes.length * 8)
      hdr.bit(): Unit // ID
      if (hdr.read(2) != 0) bad("layer")
      val protAbsent = hdr.bit() == 1
      if (hdr.read(2) != 1) bad("profile not LC")
      val srIdx = hdr.read(4)
      if (srIdx >= sampleRates.length) bad("sample rate index")
      hdr.bit(): Unit // private
      val chanCfg = hdr.read(3)
      if (chanCfg < 1 || chanCfg > 2) bad("channel configuration")
      hdr.read(2): Unit // original/home
      hdr.read(2): Unit // copyright bits
      val frameLen = hdr.read(13)
      hdr.read(11): Unit // buffer fullness
      if (hdr.read(2) != 0) bad("multiple raw data blocks")
      if (frameLen < 7 || off + frameLen > bytes.length) bad("frame length")
      if (!protAbsent) hdr.read(16): Unit
      if (sampleRate == 0) {
        sampleRate = sampleRates(srIdx)
        channels = chanCfg
        (0 until channels).foreach(_ => prevHalf += new Array[Double](1024))
      } else if (chanCfg != channels) bad("channel change")
      val br = new BitReader(bytes, hdr.pos, (off + frameLen) * 8)
      val fr = decodeFrameBody(br, channels, prevShape)
      prevShape = fr.info.windowShape
      nFrames += 1
      if (fr.info.short) nShort += 1
      ms |= fr.msUsed
      tns |= fr.tnsUsed
      escU |= fr.escUsed
      val frame = new Array[Double](1024 * channels)
      var ch = 0
      while (ch < channels) {
        val w = fr.channels(ch)
        var n = 0
        while (n < 1024) {
          frame(n * channels + ch) = prevHalf(ch)(n) + w(n)
          n += 1
        }
        prevHalf(ch) = java.util.Arrays.copyOfRange(w, 1024, 2048)
        ch += 1
      }
      out += frame
      off += frameLen
    }
    finish(sampleRate, channels, nFrames, nShort, ms, tns, escU, out,
      channels)
  }

  private def finish(sampleRate: Int, channels: Int, nFrames: Int,
      nShort: Int, ms: Boolean, tns: Boolean, escU: Boolean,
      out: scala.collection.mutable.ArrayBuffer[Array[Double]],
      nCh: Int): Option[Decoded] = {
    if (nFrames == 0 || channels == 0) return None
    val total = out.map(_.length).sum
    val samples = new Array[Double](total)
    var p = 0
    out.foreach { f =>
      System.arraycopy(f, 0, samples, p, f.length)
      p += f.length
    }
    Some(Decoded(sampleRate, channels, nFrames, nShort, ms, tns, escU,
      samples))
  }
}

package graft.ext

import AacTables._

/** AAC-LC encoder over ADTS framing — the round-trip leg for [[AacLc]],
  * emitting real LC streams against the in-repo canonical codebooks
  * (see [[AacTables]] for the honesty boundary): per-frame window
  * sequences (ONLY_LONG / LONG_START / EIGHT_SHORT with grouping /
  * LONG_STOP) with truthful transition planning, sine or KBD window
  * shapes, forward MDCTs matched to the decoder's IMDCT scaling,
  * per-band 4/3-power quantization with a deterministic scalefactor
  * ripple (DPCM coverage), smallest-covering-book selection across all
  * eleven spectral books incl. book-11 escapes, section run-length
  * merging with escape counts, optional M/S (alternating mask bits) and
  * an optional order-2 TNS FIR whose all-pole inverse the decoder
  * applies. Analysis windows come from the decoder's own
  * `longSeqWindow`/`shortSeqWindow` helpers so the two sides cannot
  * drift.
  */
object AacEncoder {

  private final class BitWriter {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var n = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      n += 1
      if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
    }
    def write(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) { writeBit((v >>> i) & 1); i -= 1 }
    }
    def writeCode(book: CanonBook, entry: Int): Unit =
      write(book.codes(entry), book.lengths(entry))
    def align(): Unit = while (n != 0) writeBit(0)
    def toBytes: Array[Byte] = {
      require(n == 0, "unaligned")
      buf.toArray
    }
  }

  /** EIGHT_SHORT grouping used throughout: {0,1},{2},{3,4,5},{6,7} */
  private val ShortGroups = Array(2, 1, 3, 2)

  private val shortGroupOf: Array[Int] = {
    val out = new Array[Int](8)
    var g = 0
    var next = ShortGroups(0)
    var w = 0
    while (w < 8) {
      if (w >= next) { g += 1; next += ShortGroups(g) }
      out(w) = g
      w += 1
    }
    out
  }
  private val groupingField: Int = {
    var bits = 0
    var w = 1
    while (w < 8) {
      if (shortGroupOf(w) == shortGroupOf(w - 1)) bits |= 1 << (7 - w)
      w += 1
    }
    bits
  }

  // ------------------------------------------------------- transforms

  /** forward MDCT matched to AacLc's (2/N)-scaled IMDCT */
  private def forwardMdct(xw: Array[Double], bigN: Int): Array[Double] = {
    val n2 = bigN / 2
    val t = AacLc.aacMdctTable(bigN)
    val out = new Array[Double](n2)
    var k = 0
    while (k < n2) {
      var acc = 0.0
      val base = k * bigN
      var n = 0
      while (n < bigN) { acc += xw(n) * t(base + n); n += 1 }
      out(k) = 2.0 * acc
      k += 1
    }
    out
  }

  /** per-window spectra for one frame starting at input sample `at` */
  private def analyze(x: Array[Double], at: Int, sequence: Int,
      prevShape: Int, shape: Int): Array[Array[Double]] = {
    def sample(i: Int): Double =
      if (i >= 0 && i < x.length) x(i) else 0.0
    if (sequence == 2) {
      Array.tabulate(8) { w =>
        val xw = new Array[Double](256)
        val base = at + 448 + 128 * w
        var n = 0
        while (n < 256) {
          xw(n) = sample(base + n) * AacLc.shortSeqWindow(w, prevShape, shape, n)
          n += 1
        }
        forwardMdct(xw, 256)
      }
    } else {
      val xw = new Array[Double](2048)
      var n = 0
      while (n < 2048) {
        xw(n) = sample(at + n) * AacLc.longSeqWindow(sequence, prevShape, shape, n)
        n += 1
      }
      Array(forwardMdct(xw, 2048))
    }
  }

  // ------------------------------------------------------ quantization

  /** deterministic per-band scalefactor ripple around the base */
  private def bandSf(base: Int, sfb: Int): Int = base + (sfb % 3) - 1

  private def quantize(v: Double, sf: Int): Int = {
    val gain = math.pow(2.0, 0.25 * (sf - SfOffset))
    val q = math.rint(math.pow(math.abs(v) / gain, 0.75)).toInt
    val capped = math.min(q, 8191)
    if (v < 0) -capped else capped
  }

  /** smallest covering book: pairs (1,2),(3,4),(5,6),(7,8),(9,10) with
    * the freqPow variant chosen by sfb parity; 11 for the escape range
    */
  private def pickBook(maxAbs: Int, sfb: Int): Int =
    if (maxAbs == 0) 0
    else if (maxAbs <= 1) 1 + (sfb & 1)
    else if (maxAbs <= 2) 3 + (sfb & 1)
    else if (maxAbs <= 4) 5 + (sfb & 1)
    else if (maxAbs <= 7) 7 + (sfb & 1)
    else if (maxAbs <= 12) 9 + (sfb & 1)
    else 11

  // ------------------------------------------------------ ics emission

  /** one channel's quantized plane for a frame */
  private final class Plane(val sequence: Int, val maxSfb: Int,
      val groups: Array[Int], val swb: Array[Int]) {
    val nGroups: Int = groups.length
    // quant[group] linear in (sfb, window-in-group, bin)
    var quant: Array[Array[Int]] = _
    var cb: Array[Array[Int]] = _ // [group][sfb]
    var sf: Array[Array[Int]] = _
  }

  private def buildPlane(spectra: Array[Array[Double]], sequence: Int,
      sfBase: Int): Plane = {
    val short = sequence == 2
    val swb = if (short) swbShort else swbLong
    val maxSfb = swb.length - 1
    val groups = if (short) ShortGroups else Array(1)
    val p = new Plane(sequence, maxSfb, groups, swb)
    p.quant = new Array[Array[Int]](p.nGroups)
    p.cb = Array.ofDim[Int](p.nGroups, maxSfb)
    p.sf = Array.ofDim[Int](p.nGroups, maxSfb)
    var winBase = 0
    var g = 0
    while (g < p.nGroups) {
      val wins = groups(g)
      val buf = new scala.collection.mutable.ArrayBuffer[Int]()
      var sfb = 0
      while (sfb < maxSfb) {
        val lo = swb(sfb)
        val hi = swb(sfb + 1)
        val sf = bandSf(sfBase, sfb)
        var maxAbs = 0
        val vals = new Array[Int]((hi - lo) * wins)
        var w = 0
        while (w < wins) {
          var i = lo
          while (i < hi) {
            val q = quantize(spectra(winBase + w)(i), sf)
            vals((hi - lo) * w + (i - lo)) = q
            if (math.abs(q) > maxAbs) maxAbs = math.abs(q)
            i += 1
          }
          w += 1
        }
        p.sf(g)(sfb) = sf
        p.cb(g)(sfb) = pickBook(maxAbs, sfb)
        buf ++= vals
        sfb += 1
      }
      p.quant(g) = buf.toArray
      winBase += wins
      g += 1
    }
    p
  }

  private def emitSections(bw: BitWriter, p: Plane): Unit = {
    val secBits = if (p.sequence == 2) 3 else 5
    val esc = (1 << secBits) - 1
    var g = 0
    while (g < p.nGroups) {
      var k = 0
      while (k < p.maxSfb) {
        val cb = p.cb(g)(k)
        var len = 1
        while (k + len < p.maxSfb && p.cb(g)(k + len) == cb) len += 1
        bw.write(cb, 4)
        var rem = len
        while (rem >= esc) { bw.write(esc, secBits); rem -= esc }
        bw.write(rem, secBits)
        k += len
      }
      g += 1
    }
  }

  private def emitScaleFactors(bw: BitWriter, p: Plane, globalGain: Int)
      : Unit = {
    var prev = globalGain
    var g = 0
    while (g < p.nGroups) {
      var sfb = 0
      while (sfb < p.maxSfb) {
        if (p.cb(g)(sfb) != 0) {
          val delta = p.sf(g)(sfb) - prev
          require(delta >= -60 && delta <= 60, s"sf delta $delta")
          bw.writeCode(sfBook, delta + 60)
          prev = p.sf(g)(sfb)
        }
        sfb += 1
      }
      g += 1
    }
  }

  private def emitSpectra(bw: BitWriter, p: Plane): Unit = {
    var g = 0
    while (g < p.nGroups) {
      var off = 0
      var sfb = 0
      while (sfb < p.maxSfb) {
        val width = (p.swb(sfb + 1) - p.swb(sfb)) * p.groups(g)
        val cb = p.cb(g)(sfb)
        if (cb != 0) {
          val book = specBooks(cb)
          var i = 0
          while (i < width) {
            val vals = new Array[Int](book.dims)
            var d = 0
            while (d < book.dims) {
              vals(d) = p.quant(g)(off + i + d)
              d += 1
            }
            val coded = vals.map { v =>
              if (book.signed) v
              else if (cb == 11 && math.abs(v) >= 16) 16
              else math.abs(v)
            }
            bw.writeCode(book.book, book.entryOf(coded))
            // sign bits + escapes for unsigned books, in value order
            if (!book.signed) {
              d = 0
              while (d < book.dims) {
                val v = vals(d)
                if (v != 0) {
                  bw.writeBit(if (v < 0) 1 else 0)
                  val mag = math.abs(v)
                  if (cb == 11 && mag >= 16) {
                    // escape: N ones, 0, N+4 bits of mag - 2^(N+4)
                    var n = 0
                    while (mag >= (1 << (n + 5))) n += 1
                    var j = 0
                    while (j < n) { bw.writeBit(1); j += 1 }
                    bw.writeBit(0)
                    bw.write(mag - (1 << (n + 4)), n + 4)
                  }
                }
                d += 1
              }
            }
            i += book.dims
          }
        }
        off += width
        sfb += 1
      }
      g += 1
    }
  }

  // ----------------------------------------------------------- frames

  /** TNS: order-2 upward FIR on the long-window spectrum over the top
    * `tnsBands` bands; reflection indices are fixed, the lpc is derived
    * exactly as the decoder derives it
    */
  private val TnsReflIdx = Array(2, 1) // 4-bit coef_res raw indices
  private def tnsLpc: Array[Double] = {
    val coefResBits = 4
    val iqfac = ((1 << (coefResBits - 1)) - 0.5) / (math.Pi / 2.0)
    val refl = TnsReflIdx.map(raw => math.sin(raw / iqfac))
    val a = Array(1.0, 0.0, 0.0)
    var m = 1
    while (m <= 2) {
      val b = new Array[Double](3)
      var i = 1
      while (i < m) { b(i) = a(i) + refl(m - 1) * a(m - i); i += 1 }
      i = 1
      while (i < m) { a(i) = b(i); i += 1 }
      a(m) = refl(m - 1)
      m += 1
    }
    a
  }

  private def applyTnsFir(spec: Array[Double], maxSfb: Int,
      tnsLength: Int): Unit = {
    val a = tnsLpc
    val bottom = math.max(0, maxSfb - tnsLength)
    val start = swbLong(bottom)
    val end = swbLong(maxSfb)
    val orig = java.util.Arrays.copyOfRange(spec, start, end)
    var i = start
    while (i < end) {
      var k = 1
      while (k <= 2 && i - k >= start) {
        spec(i) += a(k) * orig(i - k - start)
        k += 1
      }
      i += 1
    }
  }

  private def emitTns(bw: BitWriter, tnsLength: Int): Unit = {
    bw.write(1, 2) // n_filt (long window)
    bw.writeBit(1) // coef_res -> 4 bits
    bw.write(tnsLength, 6)
    bw.write(2, 5) // order 2
    bw.writeBit(0) // direction up
    bw.writeBit(0) // no compression
    TnsReflIdx.foreach(r => bw.write(r, 4))
  }

  /** scalefactor base targeting |q| around ~300 at the frame's peak */
  private def pickSfBase(spectra: Array[Array[Double]]): Int = {
    var peak = 1e-9
    spectra.foreach(_.foreach(v => peak = math.max(peak, math.abs(v))))
    val sf = 100 + math.rint(4.0 * (math.log(peak / 2000.0) / math.log(2.0))).toInt
    math.max(10, math.min(200, sf))
  }

  // ----------------------------------------------------------- encode

  /** Encode PCM into an ADTS AAC-LC stream. `frameSequences` gives the
    * window_sequence per frame (0 ONLY_LONG, 1 LONG_START, 2
    * EIGHT_SHORT, 3 LONG_STOP) — transitions must be legal (START
    * before SHORT runs, STOP after). Frame b consumes input
    * [b*1024 - 1024, b*1024 + 1024); decoded sample j corresponds to
    * input j - 1024.
    */
  def encode(chans: Array[Array[Double]], sampleRate: Int,
      frameSequences: Seq[Int], msStereo: Boolean = false,
      kbdShape: Boolean = false, tnsLength: Int = 0): Array[Byte] = {
    val channels = chans.length
    require(channels == 1 || channels == 2)
    val srIdx = sampleRates.indexOf(sampleRate)
    require(srIdx >= 0, s"unsupported rate $sampleRate")
    val shape = if (kbdShape) 1 else 0
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    var prevShape = 0
    var b = 0
    while (b < frameSequences.length) {
      val seq = frameSequences(b)
      val at = b * 1024 - 1024
      val bw = new BitWriter
      // element
      if (channels == 1) {
        bw.write(0, 3) // SCE
        bw.write(0, 4)
        val spectra = analyze(chans(0), at, seq, prevShape, shape)
        if (tnsLength > 0 && seq != 2)
          applyTnsFir(spectra(0), swbLong.length - 1, tnsLength)
        val p = buildPlane(spectra, seq, pickSfBase(spectra))
        val globalGain = bandSf(pickSfBase(spectra), 0)
        emitIcs(bw, p, globalGain, writeInfo = true, shape,
          tnsLength = if (seq != 2) tnsLength else 0)
      } else {
        bw.write(1, 3) // CPE
        bw.write(0, 4)
        bw.writeBit(1) // common window
        writeIcsInfo(bw, seq, shape)
        val sl = analyze(chans(0), at, seq, prevShape, shape)
        val sr = analyze(chans(1), at, seq, prevShape, shape)
        val swb = if (seq == 2) swbShort else swbLong
        val maxSfb = swb.length - 1
        val groups = if (seq == 2) ShortGroups else Array(1)
        val msBits = Array.tabulate(groups.length, maxSfb)((g, sfb) =>
          msStereo && ((g + sfb) % 2 == 0))
        if (msStereo) {
          bw.write(1, 2) // ms_mask_present: per-band bits
          msBits.foreach(_.foreach(bit => bw.writeBit(if (bit) 1 else 0)))
          // forward M/S on the flagged bands
          var winBase = 0
          var g = 0
          while (g < groups.length) {
            var sfb = 0
            while (sfb < maxSfb) {
              if (msBits(g)(sfb)) {
                var w = 0
                while (w < groups(g)) {
                  var i = swb(sfb)
                  while (i < swb(sfb + 1)) {
                    val m = (sl(winBase + w)(i) + sr(winBase + w)(i)) / 2.0
                    val s = (sl(winBase + w)(i) - sr(winBase + w)(i)) / 2.0
                    sl(winBase + w)(i) = m
                    sr(winBase + w)(i) = s
                    i += 1
                  }
                  w += 1
                }
              }
              sfb += 1
            }
            winBase += groups(g)
            g += 1
          }
        } else bw.write(0, 2)
        val pl = buildPlane(sl, seq, pickSfBase(sl))
        val pr = buildPlane(sr, seq, pickSfBase(sr))
        emitIcs(bw, pl, bandSf(pickSfBase(sl), 0), writeInfo = false, shape, 0)
        emitIcs(bw, pr, bandSf(pickSfBase(sr), 0), writeInfo = false, shape, 0)
      }
      bw.write(7, 3) // END
      bw.align()
      val payload = bw.toBytes
      out ++= adtsHeader(srIdx, channels, payload.length)
      out ++= payload
      prevShape = shape
      b += 1
    }
    out.toArray
  }

  private def writeIcsInfo(bw: BitWriter, seq: Int, shape: Int): Unit = {
    bw.writeBit(0) // reserved
    bw.write(seq, 2)
    bw.writeBit(shape)
    if (seq == 2) {
      bw.write(swbShort.length - 1, 4)
      bw.write(groupingField, 7)
    } else {
      bw.write(swbLong.length - 1, 6)
      bw.writeBit(0) // no predictor
    }
  }

  private def emitIcs(bw: BitWriter, p: Plane, globalGain: Int,
      writeInfo: Boolean, shape: Int, tnsLength: Int): Unit = {
    bw.write(globalGain, 8)
    if (writeInfo) writeIcsInfo(bw, p.sequence, shape)
    emitSections(bw, p)
    emitScaleFactors(bw, p, globalGain)
    bw.writeBit(0) // no pulse
    if (tnsLength > 0) { bw.writeBit(1); emitTns(bw, tnsLength) }
    else bw.writeBit(0)
    bw.writeBit(0) // no gain control
    emitSpectra(bw, p)
  }

  private def adtsHeader(srIdx: Int, channels: Int, payloadLen: Int)
      : Array[Byte] = {
    val frameLen = 7 + payloadLen
    val bw = new BitWriter
    bw.write(0xfff, 12)
    bw.writeBit(1) // ID (MPEG-2)
    bw.write(0, 2) // layer
    bw.writeBit(1) // protection absent
    bw.write(1, 2) // profile LC
    bw.write(srIdx, 4)
    bw.writeBit(0) // private
    bw.write(channels, 3)
    bw.write(0, 2) // original/home
    bw.write(0, 2) // copyright bits
    bw.write(frameLen, 13)
    bw.write(0x7ff, 11) // buffer fullness: VBR
    bw.write(0, 2) // one raw data block
    bw.toBytes
  }
}

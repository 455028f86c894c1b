package graft.ext

/** Ogg Vorbis I decoder (Xiph Vorbis I specification) — the complete
  * decode pipeline: LSB-first bitpack reader, setup-header codebook
  * parse (ordered/sparse length lists, lookup type 1/2 VQ tables,
  * Vorbis-float unpack) with the spec's first-fit codeword assignment
  * under a Kraft-exactness gate, floor type 1 (class/subclass/masterbook
  * decode, low/high-neighbor prediction, render_line curve synthesis
  * through the inverse-dB amplitude table), residue types 0/1/2
  * (classword cascade passes, format-0 step interleave, format-1
  * sequential, type-2 channel interleave), square-polar channel
  * decoupling, the spec IMDCT, and lapped-window overlap-add across
  * mixed long/short block sequences (prev/next window flags).
  *
  * Unlike MP3/AAC, Vorbis carries its Huffman codebooks IN the stream
  * setup header, so the whole decoder is offline-verifiable end-to-end
  * against the in-repo [[VorbisEncoder]] — no normative bit-pattern
  * constants are required anywhere. The one generated table is the
  * floor1 inverse-dB amplitude curve: 256 uniform-dB steps anchored at
  * the spec's published first entry 1.0649863e-07 (entry 255 = 1.0);
  * third-party floor amplitudes may differ from the printed table by
  * <0.07 dB, which does not affect the in-repo round trip (see
  * DIVERGENCES.md).
  *
  * Crafted-input posture matches [[FlacCodec]]/[[Mp3Layer3]]: [[decode]]
  * returns None on any malformed page, header, codebook (over- or
  * under-specified tree), or out-of-range configuration rather than
  * throwing or emitting garbage; allocation-bearing header fields are
  * capped (entries, dimensions, multiplicand counts) so hostile headers
  * cannot memory-bomb an executor. End-of-packet mid-decode is NOT an
  * error (spec 1.3.2): the packet's decoded-so-far state stands.
  */
object VorbisCodec {

  final case class Decoded(sampleRate: Int, channels: Int, nBlocks: Int,
      nShortBlocks: Int, usedCoupling: Boolean, samples: Array[Double])

  // sanity caps for hostile headers (documented; far above any stream
  // our encoder or a typical third-party encoder emits)
  private val MaxChannels = 8
  private val MaxCodebookEntries = 1 << 18
  private val MaxCodebookDims = 256
  private val MaxMultiplicands = 1 << 20

  private object Eop extends RuntimeException("end of packet") {
    override def fillInStackTrace(): Throwable = this
  }
  private final class Malformed(msg: String) extends RuntimeException(msg)
  private def bad(msg: String): Nothing = throw new Malformed(msg)

  // ----------------------------------------------- LSB-first bit I/O

  /** Vorbis bitpack convention (spec §2): LSB of the value first, into
    * the LSB of the current byte.
    */
  private[ext] final class BitReader(val bytes: Array[Byte]) {
    var pos = 0
    def bit(): Int = {
      if (pos >= bytes.length * 8) throw Eop
      val b = bytes(pos >>> 3) & 0xff
      val r = (b >>> (pos & 7)) & 1
      pos += 1
      r
    }
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
    def read32(): Long = {
      var v = 0L
      var i = 0
      while (i < 32) { v |= bit().toLong << i; i += 1 }
      v
    }
  }

  private[ext] final class BitWriter {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nBits = 0
    def writeBit(b: Int): Unit = {
      cur |= (b & 1) << nBits
      nBits += 1
      if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
    }
    /** LSB-first value write */
    def write(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) { writeBit(((v >>> i) & 1L).toInt); i += 1 }
    }
    /** Huffman codeword: first-read bit is the MSB of the code */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBit((code >>> i) & 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      val out = buf.clone()
      if (nBits > 0) out += cur.toByte
      out.toArray
    }
  }

  private[ext] def ilog(x: Int): Int =
    if (x <= 0) 0 else 32 - Integer.numberOfLeadingZeros(x)

  /** spec §9.2.2 float32_unpack: 21-bit mantissa, sign, 10-bit biased
    * exponent (bias 788 after the mantissa's 2^20 scale).
    */
  private[ext] def float32Unpack(x: Long): Double = {
    val mant = (x & 0x1fffffL).toDouble
    val e = ((x & 0x7fe00000L) >>> 21).toInt
    val v = mant * math.pow(2.0, (e - 788).toDouble)
    if ((x & 0x80000000L) != 0) -v else v
  }

  /** inverse of [[float32Unpack]] for the encoder (exact for our grid
    * constants: value = m * 2^(e-788) with m < 2^21)
    */
  private[ext] def float32Pack(v: Double): Long = {
    if (v == 0.0) return 0L
    val sign = if (v < 0) 0x80000000L else 0L
    var m = math.abs(v)
    var e = 788
    while (m < (1L << 20) && e > 0) { m *= 2; e -= 1 }
    while (m >= (1L << 21)) { m /= 2; e += 1 }
    sign | (e.toLong << 21) | math.rint(m).toLong
  }

  /** largest v with v^dim <= entries (spec lookup1_values) */
  private[ext] def lookup1Values(entries: Int, dim: Int): Int = {
    var v = 0
    while (math.pow((v + 1).toDouble, dim.toDouble) <= entries.toDouble) v += 1
    v
  }

  // ---------------------------------------------------------- codebook

  private[ext] final class Codebook(
      val dimensions: Int, val entries: Int, val lengths: Array[Int],
      val lookupType: Int, val minValue: Double, val deltaValue: Double,
      val sequenceP: Boolean, val lookupValues: Int,
      val multiplicands: Array[Int]) {

    /** (len << 32 | codeword-read-MSB-first-accumulated) -> entry */
    private val decodeMap = new java.util.HashMap[Long, Integer]()
    private var maxLen = 0

    /** spec §3.2.1 codeword assignment: entries in order each take the
      * lowest available leaf of their length. Single-used-entry books
      * are the only legal underspecified tree; multi-entry books must
      * satisfy Kraft EXACTLY (over- and under-specified trees rejected).
      */
    locally {
      val used = (0 until entries).filter(lengths(_) > 0)
      if (used.nonEmpty) {
        used.foreach { e => if (lengths(e) > 32) bad("codeword length > 32") }
        if (used.size == 1) {
          decodeMap.put(lengths(used.head).toLong << 32, used.head)
          maxLen = lengths(used.head)
        } else {
          val kraft = used.map(e => 1L << (32 - lengths(e))).sum
          if (kraft != (1L << 32)) bad(s"codebook tree not exact (kraft $kraft)")
          val available = new Array[Long](33)
          val first = used.head
          var i = 1
          while (i <= lengths(first)) { available(i) = 1L << (32 - i); i += 1 }
          decodeMap.put(lengths(first).toLong << 32, first)
          maxLen = lengths(first)
          used.tail.foreach { e =>
            val len = lengths(e)
            var z = len
            while (z > 0 && available(z) == 0) z -= 1
            if (z == 0) bad("overspecified codebook tree")
            val res = available(z)
            available(z) = 0
            var y = z + 1
            while (y <= len) { available(y) = res | (1L << (32 - y)); y += 1 }
            val code = (res >>> (32 - len)).toInt
            decodeMap.put((len.toLong << 32) | (code.toLong & 0xffffffffL), e)
            if (len > maxLen) maxLen = len
          }
        }
      }
    }

    /** encoder side: the assigned codeword for an entry */
    private[ext] lazy val codewords: Array[(Int, Int)] = {
      val out = Array.fill(entries)((-1, 0))
      val it = decodeMap.entrySet().iterator()
      while (it.hasNext) {
        val kv = it.next()
        val len = (kv.getKey >>> 32).toInt
        out(kv.getValue.intValue()) = ((kv.getKey & 0xffffffffL).toInt, len)
      }
      out
    }

    def decodeScalar(br: BitReader): Int = {
      var acc = 0L
      var len = 0
      while (len < maxLen) {
        acc = (acc << 1) | br.bit()
        len += 1
        val hit = decodeMap.get((len.toLong << 32) | acc)
        if (hit != null) return hit.intValue()
      }
      bad("invalid codeword")
    }

    /** spec §3.3 VQ vector lookup */
    def decodeVector(br: BitReader): Array[Double] = {
      val entry = decodeScalar(br)
      val v = new Array[Double](dimensions)
      var last = 0.0
      if (lookupType == 1) {
        var indexDivisor = 1
        var i = 0
        while (i < dimensions) {
          val off = (entry / indexDivisor) % lookupValues
          v(i) = multiplicands(off) * deltaValue + minValue + last
          if (sequenceP) last = v(i)
          indexDivisor *= lookupValues
          i += 1
        }
      } else {
        var i = 0
        while (i < dimensions) {
          v(i) = multiplicands(entry * dimensions + i) * deltaValue +
            minValue + last
          if (sequenceP) last = v(i)
          i += 1
        }
      }
      v
    }
  }

  /** spec §3.2.1 codebook header unpack */
  private[ext] def readCodebook(br: BitReader): Codebook = {
    if (br.read(24) != 0x564342) bad("codebook sync lost")
    val dim = br.read(16)
    val entries = br.read(24)
    if (dim <= 0 || dim > MaxCodebookDims) bad("codebook dimensions")
    if (entries <= 0 || entries > MaxCodebookEntries) bad("codebook entries")
    val lengths = new Array[Int](entries)
    val ordered = br.bit() == 1
    if (!ordered) {
      val sparse = br.bit() == 1
      var i = 0
      while (i < entries) {
        lengths(i) =
          if (sparse) { if (br.bit() == 1) br.read(5) + 1 else 0 }
          else br.read(5) + 1
        i += 1
      }
    } else {
      var cur = 0
      var curLen = br.read(5) + 1
      while (cur < entries) {
        val num = br.read(ilog(entries - cur))
        if (cur + num > entries) bad("ordered lengths overrun")
        var i = 0
        while (i < num) { lengths(cur + i) = curLen; i += 1 }
        cur += num
        curLen += 1
        if (curLen > 32) bad("ordered length > 32")
      }
    }
    val lookup = br.read(4)
    if (lookup < 0 || lookup > 2) bad("reserved lookup type")
    if (lookup == 0)
      new Codebook(dim, entries, lengths, 0, 0, 0, sequenceP = false, 0,
        Array.emptyIntArray)
    else {
      val minV = float32Unpack(br.read32())
      val deltaV = float32Unpack(br.read32())
      val valueBits = br.read(4) + 1
      val seqP = br.bit() == 1
      val lv = if (lookup == 1) lookup1Values(entries, dim) else entries * dim
      if (lv < 0 || lv > MaxMultiplicands) bad("multiplicand count")
      val mult = new Array[Int](lv)
      var i = 0
      while (i < lv) { mult(i) = br.read(valueBits); i += 1 }
      new Codebook(dim, entries, lengths, lookup, minV, deltaV, seqP, lv, mult)
    }
  }

  // ------------------------------------------------------------ floor1

  private[ext] final case class Floor1Config(
      partitionClasses: Array[Int], classDims: Array[Int],
      classSubclasses: Array[Int], classMasterbooks: Array[Int],
      subclassBooks: Array[Array[Int]], multiplier: Int,
      rangebits: Int, xList: Array[Int]) {
    val values: Int = xList.length
    /** indices sorted by X (for step-2 render) */
    val sortOrder: Array[Int] = xList.indices.sortBy(xList(_)).toArray
    /** low/high neighbor per point (index of nearest bracketing earlier
      * point) — spec low_neighbor/high_neighbor
      */
    val lowNeighbor: Array[Int] = Array.tabulate(values) { i =>
      if (i < 2) 0
      else (0 until i).filter(k => xList(k) < xList(i))
        .maxBy(xList(_))
    }
    val highNeighbor: Array[Int] = Array.tabulate(values) { i =>
      if (i < 2) 1
      else (0 until i).filter(k => xList(k) > xList(i))
        .minBy(xList(_))
    }
  }

  private[ext] def readFloor1Config(br: BitReader, books: Array[Codebook])
      : Floor1Config = {
    val partitions = br.read(5)
    val classList = Array.fill(partitions)(br.read(4))
    val maxClass = if (partitions == 0) -1 else classList.max
    val dims = new Array[Int](maxClass + 1)
    val subs = new Array[Int](maxClass + 1)
    val masters = Array.fill(maxClass + 1)(-1)
    val subBooks = new Array[Array[Int]](maxClass + 1)
    var c = 0
    while (c <= maxClass) {
      dims(c) = br.read(3) + 1
      subs(c) = br.read(2)
      if (subs(c) > 0) {
        masters(c) = br.read(8)
        if (masters(c) >= books.length) bad("floor1 masterbook out of range")
      }
      subBooks(c) = Array.fill(1 << subs(c)) {
        val b = br.read(8) - 1
        if (b >= books.length) bad("floor1 subclass book out of range")
        b
      }
      c += 1
    }
    val multiplier = br.read(2) + 1
    val rangebits = br.read(4)
    val xs = scala.collection.mutable.ArrayBuffer[Int](0, 1 << rangebits)
    var i = 0
    while (i < partitions) {
      val cdim = dims(classList(i))
      var j = 0
      while (j < cdim) { xs += br.read(rangebits); j += 1 }
      i += 1
    }
    if (xs.length > 65) bad("floor1 > 65 points")
    if (xs.distinct.length != xs.length) bad("floor1 duplicate X")
    Floor1Config(classList, dims, subs, masters, subBooks, multiplier,
      rangebits, xs.toArray)
  }

  /** floor1 amplitude curve: 256 uniform-dB steps anchored at the spec's
    * first entry 1.0649863e-07; entry 255 = 1.0 (see object Scaladoc).
    */
  private[ext] val inverseDbTable: Array[Double] = {
    val step = math.log(1.0649863e-07) / -255.0
    Array.tabulate(256)(i => math.exp(-step * (255 - i)))
  }

  private val floor1Ranges = Array(256, 128, 86, 64)

  /** spec §7.2.3 floor1 packet decode: Some(finalY) or None when the
    * channel's floor is unused this frame.
    */
  private[ext] def decodeFloor1(br: BitReader, cfg: Floor1Config,
      books: Array[Codebook]): Option[Array[Int]] = {
    if (br.bit() == 0) return None
    val range = floor1Ranges(cfg.multiplier - 1)
    val y = new Array[Int](cfg.values)
    y(0) = br.read(ilog(range - 1))
    y(1) = br.read(ilog(range - 1))
    var offset = 2
    var i = 0
    while (i < cfg.partitionClasses.length) {
      val cls = cfg.partitionClasses(i)
      val cdim = cfg.classDims(cls)
      val cbits = cfg.classSubclasses(cls)
      val csub = (1 << cbits) - 1
      var cval =
        if (cbits > 0) books(cfg.classMasterbooks(cls)).decodeScalar(br)
        else 0
      var j = 0
      while (j < cdim) {
        val bookNum = cfg.subclassBooks(cls)(cval & csub)
        cval >>>= cbits
        y(offset + j) = if (bookNum >= 0) books(bookNum).decodeScalar(br) else 0
        j += 1
      }
      offset += cdim
      i += 1
    }
    Some(y)
  }

  /** spec §7.2.4 step 1: prediction-unwrap the decoded Y values */
  private[ext] def floor1FinalY(cfg: Floor1Config, y: Array[Int])
      : (Array[Int], Array[Boolean]) = {
    val range = floor1Ranges(cfg.multiplier - 1)
    val finalY = new Array[Int](cfg.values)
    val step2 = new Array[Boolean](cfg.values)
    finalY(0) = y(0); finalY(1) = y(1)
    step2(0) = true; step2(1) = true
    var i = 2
    while (i < cfg.values) {
      val low = cfg.lowNeighbor(i)
      val high = cfg.highNeighbor(i)
      val predicted = renderPoint(cfg.xList(low), finalY(low),
        cfg.xList(high), finalY(high), cfg.xList(i))
      val value = y(i)
      val highroom = range - predicted
      val lowroom = predicted
      val room = 2 * math.min(highroom, lowroom)
      if (value != 0) {
        step2(low) = true; step2(high) = true; step2(i) = true
        finalY(i) =
          if (value >= room) {
            if (highroom > lowroom) value - lowroom + predicted
            else predicted - (value - highroom) - 1
          } else if ((value & 1) == 1) predicted - ((value + 1) / 2)
          else predicted + value / 2
      } else {
        step2(i) = false
        finalY(i) = predicted
      }
      i += 1
    }
    var k = 0
    while (k < cfg.values) {
      finalY(k) = math.max(0, math.min(range - 1, finalY(k)))
      k += 1
    }
    (finalY, step2)
  }

  private[ext] def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int)
      : Int = {
    val dy = y1 - y0
    val adx = x1 - x0
    val ady = math.abs(dy)
    val err = ady * (x - x0)
    val off = err / adx
    if (dy < 0) y0 - off else y0 + off
  }

  /** spec render_line: Bresenham in the dB-scaled integer domain,
    * mapping each bin through the inverse-dB table.
    */
  private def renderLine(x0: Int, y0: Int, x1: Int, y1: Int,
      out: Array[Double], n: Int): Unit = {
    val dy = y1 - y0
    val adx = x1 - x0
    var ady = math.abs(dy)
    val base = dy / adx
    var x = x0
    var y = y0
    var err = 0
    val sy = if (dy < 0) base - 1 else base + 1
    ady -= math.abs(base) * adx
    if (x < n) out(x) = inverseDbTable(math.min(255, y))
    x = x0 + 1
    while (x < x1 && x < n) {
      err += ady
      if (err >= adx) { err -= adx; y += sy } else y += base
      out(x) = inverseDbTable(math.min(255, math.max(0, y)))
      x += 1
    }
  }

  /** spec §7.2.4 step 2: synthesize the amplitude curve over n2 bins */
  private[ext] def floor1Curve(cfg: Floor1Config, finalY: Array[Int],
      step2: Array[Boolean], n2: Int): Array[Double] = {
    val out = new Array[Double](n2)
    var lx = 0
    var ly = finalY(cfg.sortOrder(0)) * cfg.multiplier
    var i = 1
    while (i < cfg.values) {
      val p = cfg.sortOrder(i)
      if (step2(p)) {
        val hy = finalY(p) * cfg.multiplier
        val hx = cfg.xList(p)
        renderLine(lx, ly, hx, hy, out, n2)
        lx = hx
        ly = hy
      }
      i += 1
    }
    if (lx < n2) {
      var x = lx
      while (x < n2) { out(x) = inverseDbTable(math.min(255, ly)); x += 1 }
    }
    out
  }

  // ----------------------------------------------------------- residue

  private[ext] final case class ResidueConfig(residueType: Int, begin: Int,
      end: Int, partitionSize: Int, classifications: Int, classbook: Int,
      cascade: Array[Int], books: Array[Array[Int]])

  private[ext] def readResidueConfig(br: BitReader, nBooks: Int)
      : ResidueConfig = {
    val rType = br.read(16)
    if (rType > 2) bad("reserved residue type")
    val begin = br.read(24)
    val end = br.read(24)
    val psize = br.read(24) + 1
    val nClass = br.read(6) + 1
    val classbook = br.read(8)
    if (classbook >= nBooks) bad("residue classbook out of range")
    if (begin > end) bad("residue begin > end")
    val cascade = Array.fill(nClass) {
      val low = br.read(3)
      val high = if (br.bit() == 1) br.read(5) else 0
      high * 8 + low
    }
    val books = Array.tabulate(nClass) { c =>
      Array.tabulate(8) { pass =>
        if ((cascade(c) & (1 << pass)) != 0) {
          val b = br.read(8)
          if (b >= nBooks) bad("residue book out of range")
          b
        } else -1
      }
    }
    ResidueConfig(rType, begin, end, psize, nClass, classbook, cascade, books)
  }

  /** spec §8.6.2 inner residue decode (formats 0 and 1 share the
    * partition/classword walk; format 2 callers pass one interleaved
    * vector). `vectors` are accumulated in place.
    */
  private def decodeResidueInner(br: BitReader, cfg: ResidueConfig,
      books: Array[Codebook], vectors: Array[Array[Double]],
      doNotDecode: Array[Boolean], actualSize: Int, fmt: Int): Unit = {
    val limitBegin = math.min(cfg.begin, actualSize)
    val limitEnd = math.min(cfg.end, actualSize)
    val nToRead = limitEnd - limitBegin
    if (nToRead <= 0) return
    val partitionsToRead = nToRead / cfg.partitionSize
    if (partitionsToRead == 0) return
    val classbook = books(cfg.classbook)
    val classwords = classbook.dimensions
    val nV = vectors.length
    val cls = Array.ofDim[Int](nV, partitionsToRead + classwords)
    var pass = 0
    while (pass < 8) {
      var partitionCount = 0
      while (partitionCount < partitionsToRead) {
        if (pass == 0) {
          var j = 0
          while (j < nV) {
            if (!doNotDecode(j)) {
              var temp = classbook.decodeScalar(br)
              var i = classwords - 1
              while (i >= 0) {
                cls(j)(partitionCount + i) = temp % cfg.classifications
                temp /= cfg.classifications
                i -= 1
              }
            }
            j += 1
          }
        }
        var i = 0
        while (i < classwords && partitionCount < partitionsToRead) {
          var j = 0
          while (j < nV) {
            if (!doNotDecode(j)) {
              val vq = cls(j)(partitionCount)
              val bookNum = cfg.books(vq)(pass)
              if (bookNum >= 0) {
                val book = books(bookNum)
                if (book.lookupType == 0) bad("residue value book has no lookup")
                val offset = limitBegin + partitionCount * cfg.partitionSize
                val vec = vectors(j)
                if (fmt == 0) {
                  val step = cfg.partitionSize / book.dimensions
                  var s = 0
                  while (s < step) {
                    val v = book.decodeVector(br)
                    var d = 0
                    while (d < book.dimensions) {
                      vec(offset + s + d * step) += v(d)
                      d += 1
                    }
                    s += 1
                  }
                } else {
                  var s = 0
                  while (s < cfg.partitionSize) {
                    val v = book.decodeVector(br)
                    var d = 0
                    while (d < book.dimensions && s < cfg.partitionSize) {
                      vec(offset + s) += v(d)
                      d += 1
                      s += 1
                    }
                  }
                }
              }
            }
            j += 1
          }
          partitionCount += 1
          i += 1
        }
      }
      pass += 1
    }
  }

  /** residue decode dispatch: type 0/1 per-channel, type 2 interleaved */
  private[ext] def decodeResidue(br: BitReader, cfg: ResidueConfig,
      books: Array[Codebook], nCh: Int, n2: Int,
      doNotDecode: Array[Boolean]): Array[Array[Double]] = {
    val out = Array.ofDim[Double](nCh, n2)
    if (cfg.residueType == 2) {
      if (doNotDecode.forall(identity)) return out
      val composite = Array.ofDim[Double](1, nCh * n2)
      decodeResidueInner(br, cfg, books, composite, Array(false),
        nCh * n2, fmt = 1)
      var i = 0
      while (i < n2) {
        var j = 0
        while (j < nCh) { out(j)(i) = composite(0)(i * nCh + j); j += 1 }
        i += 1
      }
    } else {
      decodeResidueInner(br, cfg, books, out, doNotDecode, n2,
        fmt = cfg.residueType)
    }
    out
  }

  // --------------------------------------------------------- couplings

  /** spec §4.3.5 inverse square-polar coupling, in place */
  private[ext] def inverseCouple(mag: Array[Double], ang: Array[Double])
      : Unit = {
    var j = 0
    while (j < mag.length) {
      val m = mag(j)
      val a = ang(j)
      if (m > 0) {
        if (a > 0) { mag(j) = m; ang(j) = m - a }
        else { ang(j) = m; mag(j) = m + a }
      } else {
        if (a > 0) { mag(j) = m; ang(j) = m + a }
        else { ang(j) = m; mag(j) = m - a }
      }
      j += 1
    }
  }

  /** encoder-side forward coupling: the exact preimage of
    * [[inverseCouple]] (identity verified exhaustively in the spec)
    */
  private[ext] def forwardCouple(l: Double, r: Double): (Double, Double) =
    if (l > 0 && r < l) (l, l - r)
    else if (r > 0) (r, l - r)
    else if (r > l) (l, r - l)
    else (r, r - l)

  // --------------------------------------------------- IMDCT + windows

  /** per-blocksize cos(π/(2n)·(2j+1+n/2)·(2k+1)) tables, shared with the
    * encoder's forward transform (flat [k * n + j])
    */
  private val mdctTables =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()

  private[ext] def mdctTable(n: Int): Array[Double] =
    mdctTables.computeIfAbsent(n, { _ =>
      val n2 = n / 2
      val t = new Array[Double](n2 * n)
      var k = 0
      while (k < n2) {
        var j = 0
        while (j < n) {
          t(k * n + j) =
            math.cos(math.Pi / (2.0 * n) * (2 * j + 1 + n / 2) * (2 * k + 1))
          j += 1
        }
        k += 1
      }
      t
    })

  /** spec §1.3.2 IMDCT (unscaled; the encoder carries the 4/n factor) */
  private[ext] def imdct(spec: Array[Double], n: Int): Array[Double] = {
    val n2 = n / 2
    val t = mdctTable(n)
    val out = new Array[Double](n)
    var k = 0
    while (k < n2) {
      val x = spec(k)
      if (x != 0.0) {
        var j = 0
        val base = k * n
        while (j < n) { out(j) += x * t(base + j); j += 1 }
      }
      k += 1
    }
    out
  }

  /** the Vorbis window slope primitive sin(π/2·sin²(...)) over a slope
    * of `width` samples at offset i, rising (`right = false`) or falling
    */
  private[ext] def windowSlope(i: Int, width: Int, falling: Boolean)
      : Double = {
    val x = (i + 0.5) / width * (math.Pi / 2) +
      (if (falling) math.Pi / 2 else 0.0)
    math.sin(math.Pi / 2 * math.pow(math.sin(x), 2.0))
  }

  private[ext] final case class WindowShape(n: Int, leftStart: Int,
      leftEnd: Int, rightStart: Int, rightEnd: Int) {
    def apply(i: Int): Double =
      if (i < leftStart) 0.0
      else if (i < leftEnd) windowSlope(i - leftStart, leftEnd - leftStart,
        falling = false)
      else if (i < rightStart) 1.0
      else if (i < rightEnd) windowSlope(i - rightStart, rightEnd - rightStart,
        falling = true)
      else 0.0
  }

  /** spec §4.3.1 window shape from block size + prev/next flags */
  private[ext] def windowShape(n: Int, bs0: Int, long: Boolean,
      prevFlag: Boolean, nextFlag: Boolean): WindowShape = {
    val center = n / 2
    val (ls, le) =
      if (long && !prevFlag) (n / 4 - bs0 / 4, n / 4 + bs0 / 4)
      else (0, center)
    val (rs, re) =
      if (long && !nextFlag) (n * 3 / 4 - bs0 / 4, n * 3 / 4 + bs0 / 4)
      else (center, n)
    WindowShape(n, ls, le, rs, re)
  }

  // ------------------------------------------------------------ header

  private[ext] final case class IdHeader(channels: Int, sampleRate: Int,
      blocksize0: Int, blocksize1: Int)

  private[ext] final case class MappingConfig(couplingMag: Array[Int],
      couplingAng: Array[Int], mux: Array[Int], submapFloor: Array[Int],
      submapResidue: Array[Int])

  private[ext] final case class Mode(blockflag: Boolean, mapping: Int)

  private[ext] final case class Setup(books: Array[Codebook],
      floors: Array[Floor1Config], residues: Array[ResidueConfig],
      mappings: Array[MappingConfig], modes: Array[Mode])

  private def checkVorbisPacket(p: Array[Byte], packetType: Int): BitReader = {
    if (p.length < 7) bad("short header packet")
    val br = new BitReader(p)
    if (br.read(8) != packetType) bad("wrong packet type")
    val tag = Array.fill(6)(br.read(8).toByte)
    if (new String(tag, "US-ASCII") != "vorbis") bad("not a vorbis header")
    br
  }

  private[ext] def readIdHeader(p: Array[Byte]): IdHeader = {
    val br = checkVorbisPacket(p, 1)
    if (br.read32() != 0L) bad("vorbis version")
    val ch = br.read(8)
    if (ch < 1 || ch > MaxChannels) bad("channels")
    val rate = br.read32().toInt
    if (rate <= 0) bad("sample rate")
    br.read32(); br.read32(); br.read32() // bitrate max/nominal/min
    val bs0 = 1 << br.read(4)
    val bs1 = 1 << br.read(4)
    if (bs0 < 64 || bs1 > 8192 || bs0 > bs1) bad("blocksizes")
    if (br.bit() != 1) bad("framing bit")
    IdHeader(ch, rate, bs0, bs1)
  }

  private[ext] def readSetup(p: Array[Byte], channels: Int): Setup = {
    val br = checkVorbisPacket(p, 5)
    val books = Array.fill(br.read(8) + 1)(readCodebook(br))
    val timeCount = br.read(6) + 1
    var i = 0
    while (i < timeCount) {
      if (br.read(16) != 0) bad("time transform type")
      i += 1
    }
    val floors = Array.fill(br.read(6) + 1) {
      val t = br.read(16)
      if (t != 1) bad(s"floor type $t unsupported (floor0 legacy)")
      readFloor1Config(br, books)
    }
    val residues = Array.fill(br.read(6) + 1)(readResidueConfig(br, books.length))
    val mappings = Array.fill(br.read(6) + 1) {
      if (br.read(16) != 0) bad("mapping type")
      val submaps = if (br.bit() == 1) br.read(4) + 1 else 1
      val (mags, angs) =
        if (br.bit() == 1) {
          val steps = br.read(8) + 1
          val m = new Array[Int](steps)
          val a = new Array[Int](steps)
          var s = 0
          while (s < steps) {
            m(s) = br.read(ilog(channels - 1))
            a(s) = br.read(ilog(channels - 1))
            if (m(s) == a(s) || m(s) >= channels || a(s) >= channels)
              bad("coupling channels")
            s += 1
          }
          (m, a)
        } else (Array.emptyIntArray, Array.emptyIntArray)
      if (br.read(2) != 0) bad("mapping reserved")
      val mux =
        if (submaps > 1) Array.fill(channels) {
          val x = br.read(4)
          if (x >= submaps) bad("mux out of range")
          x
        } else new Array[Int](channels)
      val sf = new Array[Int](submaps)
      val sr = new Array[Int](submaps)
      var s = 0
      while (s < submaps) {
        br.read(8) // unused time config
        sf(s) = br.read(8)
        if (sf(s) >= floors.length) bad("submap floor")
        sr(s) = br.read(8)
        if (sr(s) >= residues.length) bad("submap residue")
        s += 1
      }
      MappingConfig(mags, angs, mux, sf, sr)
    }
    val modes = Array.fill(br.read(6) + 1) {
      val bf = br.bit() == 1
      if (br.read(16) != 0) bad("mode window type")
      if (br.read(16) != 0) bad("mode transform type")
      val mapping = br.read(8)
      if (mapping >= mappings.length) bad("mode mapping")
      Mode(bf, mapping)
    }
    if (br.bit() != 1) bad("setup framing bit")
    Setup(books, floors, residues, mappings, modes)
  }

  // ------------------------------------------------------ packet decode

  /** one audio packet -> (windowed time-domain block per channel, shape).
    * None for a non-audio packet type.
    */
  private def decodeAudioPacket(p: Array[Byte], id: IdHeader, setup: Setup)
      : Option[(Array[Array[Double]], WindowShape, Boolean)] = {
    val br = new BitReader(p)
    if (br.bit() != 0) return None // non-audio packet
    val mode = setup.modes(br.read(ilog(setup.modes.length - 1)))
    val mapping = setup.mappings(mode.mapping)
    val n = if (mode.blockflag) id.blocksize1 else id.blocksize0
    val (prevFlag, nextFlag) =
      if (mode.blockflag) (br.bit() == 1, br.bit() == 1) else (true, true)
    val n2 = n / 2
    val nCh = id.channels
    // floor decode per channel
    val floorY = new Array[Option[Array[Int]]](nCh)
    val noResidue = new Array[Boolean](nCh)
    var eop = false
    try {
      var ch = 0
      while (ch < nCh) {
        val cfg = setup.floors(mapping.submapFloor(mapping.mux(ch)))
        floorY(ch) = decodeFloor1(br, cfg, setup.books)
        noResidue(ch) = floorY(ch).isEmpty
        ch += 1
      }
    } catch {
      case Eop =>
        // spec 1.3.2: EOP mid-floor leaves remaining channels unused
        var ch = 0
        while (ch < nCh) {
          if (floorY(ch) == null) { floorY(ch) = None; noResidue(ch) = true }
          ch += 1
        }
        eop = true
    }
    // §4.3.3 nonzero propagation across coupling pairs
    var s = 0
    while (s < mapping.couplingMag.length) {
      val m = mapping.couplingMag(s)
      val a = mapping.couplingAng(s)
      if (!noResidue(m) || !noResidue(a)) {
        noResidue(m) = false; noResidue(a) = false
      }
      s += 1
    }
    // §4.3.4 residue per submap
    val residueVec = new Array[Array[Double]](nCh)
    val nSubmaps = mapping.submapFloor.length
    if (!eop) {
      try {
        var sm = 0
        while (sm < nSubmaps) {
          val chans = (0 until nCh).filter(mapping.mux(_) == sm).toArray
          val dnd = chans.map(noResidue(_))
          val cfg = setup.residues(mapping.submapResidue(sm))
          val vecs = decodeResidue(br, cfg, setup.books, chans.length, n2, dnd)
          var j = 0
          while (j < chans.length) { residueVec(chans(j)) = vecs(j); j += 1 }
          sm += 1
        }
      } catch { case Eop => eop = true }
    }
    var ch = 0
    while (ch < nCh) {
      if (residueVec(ch) == null) residueVec(ch) = new Array[Double](n2)
      ch += 1
    }
    // §4.3.5 inverse coupling (reverse step order)
    s = mapping.couplingMag.length - 1
    while (s >= 0) {
      inverseCouple(residueVec(mapping.couplingMag(s)),
        residueVec(mapping.couplingAng(s)))
      s -= 1
    }
    // §4.3.6 floor curve * residue, §4.3.7 IMDCT, window
    val shape = windowShape(n, id.blocksize0, mode.blockflag, prevFlag,
      nextFlag)
    val out = new Array[Array[Double]](nCh)
    ch = 0
    while (ch < nCh) {
      val spec = residueVec(ch)
      floorY(ch) match {
        case Some(y) =>
          val cfg = setup.floors(mapping.submapFloor(mapping.mux(ch)))
          val (finalY, step2) = floor1FinalY(cfg, y)
          val curve = floor1Curve(cfg, finalY, step2, n2)
          var i = 0
          while (i < n2) { spec(i) *= curve(i); i += 1 }
        case None =>
          java.util.Arrays.fill(spec, 0.0)
      }
      val time = imdct(spec, n)
      var i = 0
      while (i < n) { time(i) *= shape(i); i += 1 }
      out(ch) = time
      ch += 1
    }
    Some((out, shape, mapping.couplingMag.nonEmpty))
  }

  // ------------------------------------------------------ stream decode

  /** Decode a complete Ogg Vorbis stream to interleaved PCM. None on any
    * malformed page, header, or codebook; EOP inside an audio packet is
    * tolerated per spec. Output is trimmed to the final page's granule
    * position when it is shorter than the raw lapped output.
    */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    try decodeImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(bytes: Array[Byte]): Option[Decoded] = {
    val packets = MediaContainers.oggPackets(bytes).getOrElse(return None)
    if (packets.length < 3) return None
    val id = readIdHeader(packets(0))
    checkVorbisPacket(packets(1), 3) // comment header: type-checked, skipped
    val setup = readSetup(packets(2), id.channels)
    val nCh = id.channels
    val outBuf = Array.fill(nCh)(new scala.collection.mutable.ArrayBuffer[Double]())
    // lapping state: previous block's windowed samples from rightStart,
    // aligned to the next block's leftStart
    var prevTail: Array[Array[Double]] = null
    var nBlocks = 0
    var nShort = 0
    var coupled = false
    var granule = -1L
    val meta = MediaContainers.parseOgg(bytes)
    meta.foreach(m => granule = m.lastGranule)
    var pi = 3
    while (pi < packets.length) {
      decodeAudioPacket(packets(pi), id, setup).foreach {
        case (block, shape, usedCoupling) =>
          coupled |= usedCoupling
          nBlocks += 1
          if (shape.n == id.blocksize0 && id.blocksize0 != id.blocksize1)
            nShort += 1
          if (prevTail != null) {
            val overlap = shape.leftEnd - shape.leftStart
            val ret = shape.rightStart - shape.leftStart
            var ch = 0
            while (ch < nCh) {
              val tail = prevTail(ch)
              val cur = block(ch)
              var i = 0
              while (i < ret) {
                val t = if (i < tail.length && i < overlap) tail(i) else 0.0
                outBuf(ch) += t + cur(shape.leftStart + i)
                i += 1
              }
              ch += 1
            }
          }
          prevTail = Array.tabulate(nCh)(ch =>
            java.util.Arrays.copyOfRange(block(ch), shape.rightStart, shape.n))
      }
      pi += 1
    }
    val produced = outBuf(0).length
    val keep =
      if (granule >= 0 && granule < produced) granule.toInt else produced
    val samples = new Array[Double](keep * nCh)
    var i = 0
    while (i < keep) {
      var ch = 0
      while (ch < nCh) {
        samples(i * nCh + ch) = outBuf(ch)(i)
        ch += 1
      }
      i += 1
    }
    Some(Decoded(id.sampleRate, nCh, nBlocks, nShort, coupled, samples))
  }
}

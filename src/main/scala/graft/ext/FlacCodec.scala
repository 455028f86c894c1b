package graft.ext

/** FLAC (Free Lossless Audio Codec) decode + a minimal in-repo encoder —
  * the format is fully public (xiph.org FLAC format spec / RFC 9639) and,
  * unlike the MP3 plane, every bit of it is verifiable OFFLINE: the codec
  * is LOSSLESS, so the in-repo round trip asserts EXACT sample equality,
  * and the frame-header CRC-8 / frame CRC-16 are self-checking.
  *
  * Decoder surface: STREAMINFO + metadata-block walk, frame-header parse
  * (UTF-8 coded frame number, all blocksize/samplerate/samplesize codes),
  * CONSTANT / VERBATIM / FIXED(0-4) / LPC subframes, wasted bits, Rice
  * residual (4- and 5-bit parameter methods, partition orders, raw-bits
  * escape), and the left/side, right/side and mid/side channel
  * decorrelations. 8-32-bit sample sizes (RFC 9639 allows up to 32; the
  * sample path runs in Long because a 32-bit stream's side channel
  * carries 33 bits).
  *
  * Encoder surface (the oracle's witness): per-block best-of FIXED
  * predictor orders 0-4 with Rice residuals, optional VERBATIM and
  * CONSTANT subframes, an LPC leg (the fixed order-2 predictor expressed
  * as a genuine quantized-LPC subframe so the LPC decode path is
  * exercised losslessly), mid/side stereo, correct CRCs.
  */
object FlacCodec {

  final case class Decoded(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Array[Int]], // [channel][n]
      subframeTypes: Set[String])

  // ------------------------------------------------------------- bits

  private final class BitReader(val bytes: Array[Byte]) {
    var pos = 0 // bit position
    def read1(): Int = {
      val b = (bytes(pos >>> 3) >>> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | read1(); i += 1 }
      v
    }
    def readLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | read1(); i += 1 }
      v
    }
    /** signed n-bit two's complement */
    def readSigned(n: Int): Int = {
      val v = read(n)
      if (n > 0 && (v & (1 << (n - 1))) != 0) v - (1 << n) else v
    }
    /** signed n-bit two's complement, n up to 63 (32-bit PCM and its
      * 33-bit side channel need more than Int)
      */
    def readSignedLong(n: Int): Long = {
      val v = readLong(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    /** FLAC unary: n 0-bits then a 1-bit -> n */
    def readUnary(): Int = {
      var n = 0
      while (read1() == 0) n += 1
      n
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7
    def bytePos: Int = pos >>> 3
    def remainingBits: Int = bytes.length * 8 - pos
  }

  private final class BitWriter {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def write(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def writeUnary(n: Int): Unit = { var i = 0; while (i < n) { write(0, 1); i += 1 }; write(1, 1) }
    def alignByte(): Unit = while (nbits != 0) write(0, 1)
    def toBytes: Array[Byte] = { alignByte(); buf.toArray }
  }

  // ------------------------------------------------------------- CRCs

  /** CRC-8, poly 0x07, init 0 (frame header). */
  def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 (whole frame). */
  def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ----------------------------------------------------------- decode

  private val BlockSizes = Array(0, 192, 576, 1152, 2304, 4608, -1, -2,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768) // -1: 8-bit-1, -2: 16-bit-1
  private val SampleRates = Array(0, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000, -1, -2, -3, 0) // -1 8bit kHz, -2 16bit Hz, -3 16bit daHz
  private val SampleSizes = Array(0, 8, 12, 0, 16, 20, 24, 32)

  /** Decode a whole FLAC stream. None on malformed input, bad CRC, or an
    * unsupported corner — never throws on crafted bytes.
    */
  def decode(bytes: Array[Byte], maxFrames: Int = 1 << 20): Option[Decoded] =
    try decodeImpl(bytes, maxFrames)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(bytes: Array[Byte], maxFrames: Int): Option[Decoded] = {
    if (bytes.length < 42) return None
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C'))
      return None
    var off = 4
    var streamInfo: Option[(Int, Int, Int, Long)] = None // rate, ch, bps, total
    var last = false
    while (!last) {
      if (off + 4 > bytes.length) return None
      last = (bytes(off) & 0x80) != 0
      val btype = bytes(off) & 0x7f
      val len = ((bytes(off + 1) & 0xff) << 16) | ((bytes(off + 2) & 0xff) << 8) |
        (bytes(off + 3) & 0xff)
      if (off + 4 + len > bytes.length) return None
      if (btype == 0) { // STREAMINFO
        val br = new BitReader(java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + len))
        br.read(16); br.read(16) // min/max blocksize
        br.read(24); br.read(24) // min/max framesize
        val rate = br.read(20)
        val ch = br.read(3) + 1
        val bps = br.read(5) + 1
        val total = br.readLong(36)
        streamInfo = Some((rate, ch, bps, total))
      }
      off += 4 + len
    }
    val (rate, channels, bps, _) = streamInfo.getOrElse(return None)
    if (rate == 0 || channels < 1 || channels > 8) return None

    val out = Array.fill(channels)(new scala.collection.mutable.ArrayBuffer[Int]())
    val types = scala.collection.mutable.Set.empty[String]
    var frames = 0
    while (off + 2 <= bytes.length && frames < maxFrames) {
      // frame sync: 11111111 111110xx
      if ((bytes(off) & 0xff) != 0xff || ((bytes(off + 1) & 0xfc) != 0xf8))
        return if (frames > 0) result(rate, channels, bps, out, types) else None
      val br = new BitReader(bytes)
      br.pos = off * 8
      br.read(14) // sync
      br.read1() // reserved
      br.read1() // blocking strategy
      val bsCode = br.read(4)
      val srCode = br.read(4)
      val chAssign = br.read(4)
      val ssCode = br.read(3)
      br.read1() // reserved
      // UTF-8 coded frame/sample number
      readUtf8Number(br).getOrElse(return None)
      val blockSize = BlockSizes(bsCode) match {
        case -1 => br.read(8) + 1
        case -2 => br.read(16) + 1
        case 0  => return None
        case v  => v
      }
      SampleRates(srCode) match {
        case -1 => br.read(8): Unit
        case -2 => br.read(16): Unit
        case -3 => br.read(16): Unit
        case _  => ()
      }
      val frameBps = if (ssCode == 0) bps else SampleSizes(ssCode)
      // 8..32-bit PCM (RFC 9639 §5: up to 32; the sample path runs in
      // Long because a 32-bit stream's side channel carries 33 bits)
      if (frameBps == 0 || frameBps > 32) return None
      // header CRC-8
      val headerEnd = br.bytePos
      if (br.read(8) != crc8(bytes, off, headerEnd)) return None

      val nCh = if (chAssign < 8) chAssign + 1 else 2
      if (nCh != channels) return None
      val chans = Array.ofDim[Long](nCh, blockSize)
      var c = 0
      while (c < nCh) {
        // side channels carry one extra bit
        val sideBits = chAssign match {
          case 8 => if (c == 1) 1 else 0  // left/side
          case 9 => if (c == 0) 1 else 0  // right/side (side first)
          case 10 => if (c == 1) 1 else 0 // mid/side
          case _ => 0
        }
        decodeSubframe(br, blockSize, frameBps + sideBits, chans(c), types)
          .getOrElse(return None)
        c += 1
      }
      br.alignByte()
      val frameEnd = br.bytePos
      if (frameEnd + 2 > bytes.length) return None
      val crc = ((bytes(frameEnd) & 0xff) << 8) | (bytes(frameEnd + 1) & 0xff)
      if (crc != crc16(bytes, off, frameEnd)) return None
      // channel decorrelation
      chAssign match {
        case 8 => // left/side: r = l - s
          var i = 0
          while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
        case 9 => // right/side: l = r + s (stream order: side, right)
          var i = 0
          while (i < blockSize) { chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1 }
        case 10 => // mid/side
          var i = 0
          while (i < blockSize) {
            val s = chans(1)(i)
            val m = (chans(0)(i) << 1) | (s & 1)
            chans(0)(i) = (m + s) >> 1
            chans(1)(i) = (m - s) >> 1
            i += 1
          }
        case _ => ()
      }
      c = 0
      while (c < nCh) {
        // post-decorrelation values fit the stream's bps (<= 32 bits)
        var i = 0
        while (i < blockSize) { out(c) += chans(c)(i).toInt; i += 1 }
        c += 1
      }
      off = frameEnd + 2
      frames += 1
    }
    if (frames == 0) None else result(rate, channels, bps, out, types)
  }

  private def result(rate: Int, ch: Int, bps: Int,
      out: Array[scala.collection.mutable.ArrayBuffer[Int]],
      types: scala.collection.mutable.Set[String]): Option[Decoded] =
    Some(Decoded(rate, ch, bps, out.map(_.toArray), types.toSet))

  private def readUtf8Number(br: BitReader): Option[Long] = {
    val b0 = br.read(8)
    if ((b0 & 0x80) == 0) return Some(b0.toLong)
    var n = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { n += 1; mask >>= 1 }
    if (n < 1 || n > 6) return None
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < n) {
      val b = br.read(8)
      if ((b & 0xc0) != 0x80) return None
      v = (v << 6) | (b & 0x3f)
      i += 1
    }
    Some(v)
  }

  private def decodeSubframe(br: BitReader, n: Int, bps: Int,
      out: Array[Long], types: scala.collection.mutable.Set[String]): Option[Unit] = {
    if (br.read1() != 0) return None // padding bit
    val t = br.read(6)
    val wastedFlag = br.read1()
    val wasted = if (wastedFlag == 1) br.readUnary() + 1 else 0
    val effBps = bps - wasted
    val ok: Option[Unit] =
      if (t == 0) { // CONSTANT
        types += "constant"
        val v = br.readSignedLong(effBps)
        java.util.Arrays.fill(out, v); Some(())
      } else if (t == 1) { // VERBATIM
        types += "verbatim"
        var i = 0
        while (i < n) { out(i) = br.readSignedLong(effBps); i += 1 }
        Some(())
      } else if (t >= 8 && t <= 12) { // FIXED order 0-4
        types += "fixed"
        val order = t - 8
        var i = 0
        while (i < order) { out(i) = br.readSignedLong(effBps); i += 1 }
        decodeResidual(br, n, order, out).map { _ =>
          restoreFixed(out, n, order)
        }
      } else if (t >= 32) { // LPC order (t & 31) + 1
        types += "lpc"
        val order = (t & 31) + 1
        var i = 0
        while (i < order) { out(i) = br.readSignedLong(effBps); i += 1 }
        val precision = br.read(4) + 1
        if (precision == 16) return None // 1111 is invalid
        val shift = br.readSigned(5)
        if (shift < 0) return None
        val coef = Array.fill(order)(br.readSigned(precision))
        decodeResidual(br, n, order, out).map { _ =>
          var k = order
          while (k < n) {
            var acc = 0L
            var j = 0
            while (j < order) { acc += coef(j).toLong * out(k - 1 - j); j += 1 }
            out(k) = out(k) + (acc >> shift)
            k += 1
          }
        }
      } else None // reserved subframe types
    ok.map { _ =>
      if (wasted > 0) {
        var i = 0
        while (i < n) { out(i) = out(i) << wasted; i += 1 }
      }
    }
  }

  private def restoreFixed(x: Array[Long], n: Int, order: Int): Unit = {
    var i = order
    while (i < n) {
      order match {
        case 0 => ()
        case 1 => x(i) += x(i - 1)
        case 2 => x(i) += 2 * x(i - 1) - x(i - 2)
        case 3 => x(i) += 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3)
        case 4 => x(i) += 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4)
      }
      i += 1
    }
  }

  /** Rice residual into out[order..n) (FLAC residual coding methods 0/1). */
  private def decodeResidual(br: BitReader, n: Int, order: Int,
      out: Array[Long]): Option[Unit] = {
    val method = br.read(2)
    if (method > 1) return None
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val po = br.read(4)
    val partitions = 1 << po
    if (n % partitions != 0) return None
    var idx = order
    var p = 0
    while (p < partitions) {
      val count = (n >> po) - (if (p == 0) order else 0)
      if (count < 0) return None
      val param = br.read(paramBits)
      if (param == escape) {
        val raw = br.read(5)
        var i = 0
        while (i < count) { out(idx) = if (raw == 0) 0L else br.readSignedLong(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          if (br.remainingBits <= 0) return None
          val q = br.readUnary()
          val u = (q.toLong << param) | br.readLong(param)
          out(idx) = (u >>> 1) ^ -(u & 1L) // un-zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
    Some(())
  }

  // ----------------------------------------------------------- encode

  /** Subframe strategy for [[encode]]. */
  sealed trait Strategy
  case object Verbatim extends Strategy
  case object BestFixed extends Strategy
  /** the fixed order-2 predictor expressed as a genuine quantized-LPC
    * subframe (coefs [2, -1], shift 0) — exercises the LPC decode path
    * with exact reconstruction */
  case object Lpc2 extends Strategy

  /** Encode channels of `bps`-bit PCM (ints in range) as a FLAC stream.
    * Stereo with `midSide` uses the mid/side decorrelation. Lossless by
    * construction — decode returns the exact input samples.
    */
  def encode(chans: Array[Array[Int]], sampleRate: Int, bps: Int = 16,
      blockSize: Int = 4096, strategy: Strategy = BestFixed,
      midSide: Boolean = false): Array[Byte] = {
    require(chans.nonEmpty && chans.length <= 8)
    require(chans.forall(_.length == chans(0).length))
    require(!(midSide && chans.length != 2), "mid/side needs stereo")
    val n = chans(0).length
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= "fLaC".getBytes
    // STREAMINFO (last metadata block), 34 bytes
    val si = new BitWriter
    si.write(1, 1); si.write(0, 7); si.write(34, 24)
    si.write(blockSize.toLong, 16); si.write(blockSize.toLong, 16)
    si.write(0, 24); si.write(0, 24) // min/max framesize unknown
    si.write(sampleRate.toLong, 20)
    si.write((chans.length - 1).toLong, 3)
    si.write((bps - 1).toLong, 5)
    si.write(n.toLong, 36)
    (0 until 16).foreach(_ => si.write(0, 8)) // MD5 unset
    out ++= si.toBytes

    var frameNo = 0
    var pos = 0
    while (pos < n) {
      val bs = math.min(blockSize, n - pos)
      out ++= encodeFrame(chans, pos, bs, sampleRate, bps, frameNo, strategy, midSide)
      pos += bs
      frameNo += 1
    }
    out.toArray
  }

  private def writeUtf8Number(bw: BitWriter, v: Long): Unit = {
    if (v < 0x80) { bw.write(v, 8); return }
    // count payload bits -> bytes
    var nBytes = 2
    while (v >= (1L << (5 * nBytes + 1)) && nBytes < 7) nBytes += 1
    val lead = (0xff << (8 - nBytes)) & 0xff
    bw.write((lead | (v >>> (6 * (nBytes - 1))).toInt).toLong, 8)
    var i = nBytes - 2
    while (i >= 0) {
      bw.write(0x80L | ((v >>> (6 * i)) & 0x3f), 8)
      i -= 1
    }
  }

  private def encodeFrame(chans: Array[Array[Int]], pos: Int, bs: Int,
      sampleRate: Int, bps: Int, frameNo: Int, strategy: Strategy,
      midSide: Boolean): Array[Byte] = {
    val bw = new BitWriter
    bw.write(0x3ffe, 14) // sync
    bw.write(0, 1); bw.write(0, 1) // reserved, fixed-blocksize strategy
    bw.write(7, 4) // blocksize: 16-bit value-1 follows
    bw.write(0, 4) // samplerate: from STREAMINFO
    bw.write(if (midSide) 10L else (chans.length - 1).toLong, 4)
    bw.write(bps match { case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6; case 32 => 7; case _ => 4 }, 3)
    bw.write(0, 1) // reserved
    writeUtf8Number(bw, frameNo.toLong)
    bw.write((bs - 1).toLong, 16)
    val headerBytes = bw.toBytes // byte-aligned here by construction
    val withCrc8 = headerBytes :+ crc8(headerBytes, 0, headerBytes.length).toByte

    val body = new BitWriter
    if (midSide) {
      // mid fits bps bits; side needs bps+1 (33 for 32-bit PCM) -> Long
      val mid = new Array[Long](bs); val side = new Array[Long](bs)
      var i = 0
      while (i < bs) {
        val l = chans(0)(pos + i).toLong; val r = chans(1)(pos + i).toLong
        mid(i) = (l + r) >> 1
        side(i) = l - r
        i += 1
      }
      encodeSubframe(body, mid, bps, strategy)
      encodeSubframe(body, side, bps + 1, strategy)
    } else {
      chans.foreach { ch =>
        val seg = new Array[Long](bs)
        var i = 0
        while (i < bs) { seg(i) = ch(pos + i).toLong; i += 1 }
        encodeSubframe(body, seg, bps, strategy)
      }
    }
    val bodyBytes = body.toBytes
    val frame = withCrc8 ++ bodyBytes
    val crc = crc16(frame, 0, frame.length)
    frame ++ Array(((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte)
  }

  private def encodeSubframe(bw: BitWriter, x: Array[Long], bps: Int,
      strategy: Strategy): Unit = {
    val n = x.length
    if (x.forall(_ == x(0))) { // CONSTANT wins always
      bw.write(0, 1); bw.write(0, 6); bw.write(0, 1)
      bw.write(x(0) & ((1L << bps) - 1), bps)
      return
    }
    strategy match {
      case Verbatim =>
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
        var i = 0
        while (i < n) { bw.write(x(i) & ((1L << bps) - 1), bps); i += 1 }
      case Lpc2 if n > 2 =>
        // subframe type 1xxxxx with order-1 = 1 -> t = 33; coefs [2,-1]
        bw.write(0, 1); bw.write(32 + 1, 6); bw.write(0, 1)
        bw.write(x(0) & ((1L << bps) - 1), bps)
        bw.write(x(1) & ((1L << bps) - 1), bps)
        bw.write(3, 4) // precision-1 = 3 -> 4 bits
        bw.write(0, 5) // shift 0
        bw.write(2L & 0xf, 4); bw.write((-1L) & 0xf, 4)
        val res = new Array[Long](n)
        var i = 2
        while (i < n) { res(i) = x(i) - (2 * x(i - 1) - x(i - 2)); i += 1 }
        writeResidual(bw, res, n, order = 2)
      case _ =>
        // best fixed order 0..4 by sum of |residual|
        val maxOrder = math.min(4, n - 1)
        var best = 0; var bestCost = Long.MaxValue
        var o = 0
        while (o <= maxOrder) {
          var cost = 0L
          var i = o
          while (i < n) { cost += math.abs(fixedResidual(x, i, o)); i += 1 }
          if (cost < bestCost) { bestCost = cost; best = o }
          o += 1
        }
        bw.write(0, 1); bw.write(8 + best, 6); bw.write(0, 1)
        var i = 0
        while (i < best) { bw.write(x(i) & ((1L << bps) - 1), bps); i += 1 }
        val res = new Array[Long](n)
        i = best
        while (i < n) { res(i) = fixedResidual(x, i, best); i += 1 }
        writeResidual(bw, res, n, best)
    }
  }

  private def fixedResidual(x: Array[Long], i: Int, order: Int): Long = order match {
    case 0 => x(i)
    case 1 => x(i) - x(i - 1)
    case 2 => x(i) - (2 * x(i - 1) - x(i - 2))
    case 3 => x(i) - (3 * x(i - 1) - 3 * x(i - 2) + x(i - 3))
    case _ => x(i) - (4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4))
  }

  /** one-partition Rice, parameter fit to the mean magnitude; residuals
    * from 32-bit PCM need parameters past method 0's 14 cap, so the
    * writer escalates to method 1 (5-bit parameters, cap 30) when the
    * fit demands it — both methods were always in the decoder
    */
  private def writeResidual(bw: BitWriter, res: Array[Long], n: Int, order: Int): Unit = {
    var sum = 0L
    var i = order
    while (i < n) { sum += math.abs(res(i)); i += 1 }
    val mean = if (n > order) sum / (n - order) else 0L
    var param = 0
    while (param < 30 && (1L << param) < mean) param += 1
    val method1 = param > 14
    bw.write(if (method1) 1 else 0, 2)
    bw.write(0, 4) // partition order 0
    bw.write(param.toLong, if (method1) 5 else 4)
    i = order
    while (i < n) {
      val v = res(i)
      val u = if (v >= 0) v << 1 else ((-v) << 1) - 1
      bw.writeUnary((u >>> param).toInt)
      if (param > 0) bw.write(u & ((1L << param) - 1), param)
      i += 1
    }
  }
}

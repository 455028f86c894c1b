package graft.ext

/** Ogg Vorbis I encoder — the round-trip leg for [[VorbisCodec]]. Emits
  * REAL Vorbis streams: identification/comment/setup headers with
  * in-stream codebooks (floor value book, residue classbook, two
  * lookup-type-1 value books in a two-pass cascade, an optional
  * lookup-type-2 third pass, an optional floor masterbook/subclass
  * pair), floor type 1 (flat or end-to-end ramp curves), residue types
  * 0/1/2, square-polar channel coupling, and mixed long/short block
  * plans with truthful prev/next window flags, all packed LSB-first and
  * Ogg-paged via [[MediaContainers.oggPack]].
  *
  * The encoder does NOT keep a private model of the bitstream: it
  * builds the setup header bytes, then parses them back through
  * [[VorbisCodec.readSetup]] and drives packet emission off the PARSED
  * configuration (codeword tables included), so any disagreement
  * between writer and reader surfaces as a spec failure rather than a
  * silently self-consistent dialect. Spectral quantization mirrors the
  * decoder's accumulation exactly: digits per cascade pass against the
  * pack/unpack-roundtripped grid constants, partitions below the fine
  * quantization step classified silent (class 0, no codes emitted).
  */
object VorbisEncoder {

  import VorbisCodec._

  /** Dyadic radix grids: d0=1/4 (16 levels), d1=1/64 (16 levels),
    * optional d2=1/256 (4 levels). Every constant is an exact binary
    * fraction, so Vorbis-float packing is lossless and the decoder's
    * `min + m*delta` accumulations are BIT-EXACT doubles. That exactness
    * is load-bearing for coupling: square-polar branches switch on the
    * SIGN of the magnitude channel, so the encoder quantizes each
    * channel onto the grid FIRST and couples the quantized values —
    * M and A are then exact grid points and the decoder's branch
    * decision provably matches the encoder's (coupling unquantized
    * floats lets quantization noise flip M's sign and negate the other
    * channel entirely).
    */
  private val Min0 = -2.0
  private val D0 = 0.25
  private val Min1 = -0.125 // -8 * d1
  private val D1 = 1.0 / 64
  private val Min2 = -0.0078125 // -2 * d2
  private val D2 = 1.0 / 256

  // ----------------------------------------------------- header bytes

  private def headerPrefix(bw: BitWriter, packetType: Int): Unit = {
    bw.write(packetType, 8)
    "vorbis".getBytes("US-ASCII").foreach(b => bw.write(b & 0xffL, 8))
  }

  private def idHeaderBytes(channels: Int, sampleRate: Int, bs0Exp: Int,
      bs1Exp: Int): Array[Byte] = {
    val bw = new BitWriter
    headerPrefix(bw, 1)
    bw.write(0, 32) // version
    bw.write(channels, 8)
    bw.write(sampleRate.toLong, 32)
    bw.write(0, 32); bw.write(0, 32); bw.write(0, 32) // bitrates
    bw.write(bs0Exp, 4)
    bw.write(bs1Exp, 4)
    bw.writeBit(1)
    bw.toBytes
  }

  private def commentHeaderBytes: Array[Byte] = {
    val bw = new BitWriter
    headerPrefix(bw, 3)
    val vendor = "graft".getBytes("US-ASCII")
    bw.write(vendor.length.toLong, 32)
    vendor.foreach(b => bw.write(b & 0xffL, 8))
    bw.write(0, 32) // no user comments
    bw.writeBit(1)
    bw.toBytes
  }

  private def writeScalarBook(bw: BitWriter, dim: Int, entries: Int,
      len: Int): Unit = {
    bw.write(0x564342, 24)
    bw.write(dim, 16)
    bw.write(entries.toLong, 24)
    bw.writeBit(0) // unordered
    bw.writeBit(0) // not sparse
    var i = 0
    while (i < entries) { bw.write(len - 1, 5); i += 1 }
    bw.write(0, 4) // lookup type 0
  }

  private def writeType1Book(bw: BitWriter, levels: Int, minV: Double,
      deltaV: Double): Unit = {
    bw.write(0x564342, 24)
    bw.write(2, 16) // dim 2
    val entries = levels * levels
    bw.write(entries.toLong, 24)
    bw.writeBit(0); bw.writeBit(0)
    val len = ilog(entries - 1)
    var i = 0
    while (i < entries) { bw.write(len - 1, 5); i += 1 }
    bw.write(1, 4)
    bw.write(float32Pack(minV), 32)
    bw.write(float32Pack(deltaV), 32)
    val valueBits = ilog(levels - 1)
    bw.write(valueBits - 1, 4)
    bw.writeBit(0) // sequence_p
    i = 0
    while (i < levels) { bw.write(i, valueBits); i += 1 }
  }

  /** lookup type 2: explicit multiplicand per (entry, dim) — digit
    * layout entry = d0 + levels*d1
    */
  private def writeType2Book(bw: BitWriter, levels: Int, minV: Double,
      deltaV: Double): Unit = {
    bw.write(0x564342, 24)
    bw.write(2, 16)
    val entries = levels * levels
    bw.write(entries.toLong, 24)
    bw.writeBit(0); bw.writeBit(0)
    val len = ilog(entries - 1)
    var i = 0
    while (i < entries) { bw.write(len - 1, 5); i += 1 }
    bw.write(2, 4)
    bw.write(float32Pack(minV), 32)
    bw.write(float32Pack(deltaV), 32)
    val valueBits = ilog(levels - 1)
    bw.write(valueBits - 1, 4)
    bw.writeBit(0)
    i = 0
    while (i < entries) {
      bw.write(i % levels, valueBits) // dim 0 multiplicand
      bw.write(i / levels, valueBits) // dim 1 multiplicand
      i += 1
    }
  }

  /** book indices in the emitted setup header */
  private final case class BookPlan(floorBook: Int, classBook: Int,
      pass0: Int, pass1: Int, pass2: Int, masterBook: Int)

  private def setupHeaderBytes(channels: Int, coupled: Boolean,
      rampFloor: Boolean, thirdPass: Boolean, subclassFloor: Boolean,
      residueType: Int): (Array[Byte], BookPlan) = {
    val bw = new BitWriter
    headerPrefix(bw, 5)
    val plan = BookPlan(floorBook = 0, classBook = 1, pass0 = 2, pass1 = 3,
      pass2 = if (thirdPass) 4 else -1,
      masterBook = if (subclassFloor) (if (thirdPass) 5 else 4) else -1)
    val nBooks = 4 + (if (thirdPass) 1 else 0) + (if (subclassFloor) 1 else 0)
    bw.write(nBooks - 1, 8)
    writeScalarBook(bw, dim = 1, entries = 256, len = 8) // floor values
    writeScalarBook(bw, dim = 4, entries = 16, len = 4) // residue classbook
    writeType1Book(bw, levels = 16, Min0, D0)
    writeType1Book(bw, levels = 16, Min1, D1)
    if (thirdPass) writeType2Book(bw, levels = 4, Min2, D2)
    if (subclassFloor) writeScalarBook(bw, dim = 1, entries = 2, len = 1)
    bw.write(0, 6) // time count - 1
    bw.write(0, 16) // time transform 0
    // one floor (type 1): 2 partitions of one 3-point class
    bw.write(0, 6) // floor count - 1
    bw.write(1, 16)
    bw.write(2, 5) // partitions
    bw.write(0, 4); bw.write(0, 4) // both partitions class 0
    bw.write(3 - 1, 3) // class dim 3
    if (subclassFloor) {
      bw.write(1, 2) // 1 subclass bit
      bw.write(plan.masterBook, 8)
      bw.write(plan.floorBook + 1, 8) // subclass 0 -> floor book
      bw.write(0, 8) // subclass 1 -> unused (-1)
    } else {
      bw.write(0, 2)
      bw.write(plan.floorBook + 1, 8)
    }
    bw.write(0, 2) // multiplier - 1 (range 256)
    bw.write(8, 4) // rangebits
    Seq(32, 64, 96, 128, 160, 192).foreach(x => bw.write(x, 8))
    // one residue
    bw.write(0, 6) // residue count - 1
    bw.write(residueType, 16)
    bw.write(0, 24) // begin
    bw.write(1 << 16, 24) // end (limited by actual size at decode)
    bw.write(8 - 1, 24) // partition size 8
    bw.write(2 - 1, 6) // 2 classifications
    bw.write(plan.classBook, 8)
    bw.write(0, 3); bw.writeBit(0) // class 0: cascade 0 (silent)
    bw.write(if (thirdPass) 7 else 3, 3); bw.writeBit(0) // class 1 cascade
    bw.write(plan.pass0, 8)
    bw.write(plan.pass1, 8)
    if (thirdPass) bw.write(plan.pass2, 8)
    // one mapping (type 0, 1 submap)
    bw.write(0, 6) // mapping count - 1
    bw.write(0, 16)
    bw.writeBit(0) // 1 submap
    if (coupled) {
      bw.writeBit(1)
      bw.write(0, 8) // coupling steps - 1
      bw.write(0, ilog(channels - 1)) // magnitude = ch 0
      bw.write(1, ilog(channels - 1)) // angle = ch 1
    } else bw.writeBit(0)
    bw.write(0, 2) // reserved
    bw.write(0, 8) // time config (unused)
    bw.write(0, 8) // submap floor 0
    bw.write(0, 8) // submap residue 0
    // two modes: 0 short, 1 long
    bw.write(2 - 1, 6)
    bw.writeBit(0); bw.write(0, 16); bw.write(0, 16); bw.write(0, 8)
    bw.writeBit(1); bw.write(0, 16); bw.write(0, 16); bw.write(0, 8)
    bw.writeBit(1) // framing
    (bw.toBytes, plan)
  }

  // -------------------------------------------------------- quantizer

  private final case class Grids(thirdPass: Boolean) {
    val step: Double = if (thirdPass) D2 else D1
    val base: Double = Min0 + Min1 + (if (thirdPass) Min2 else 0.0)
    val maxK: Int = if (thirdPass) 1023 else 255
    /** grid index of k=0 amplitude (exact by dyadic construction) */
    val zeroK: Int = math.rint(-base / step).toInt
    /** silence threshold: within the finest half-step of zero a
      * partition is class 0 (no codes, decoder zeros)
      */
    val threshold: Double = step / 2
    def index(v: Double): Int =
      math.max(0, math.min(maxK, math.rint((v - base) / step).toInt))
    def value(k: Int): Double = base + k * step
    /** radix split of a grid index into per-pass digits */
    def digits(k: Int): (Int, Int, Int) =
      if (thirdPass) ((k >> 6) & 15, (k >> 2) & 15, k & 3)
      else ((k >> 4) & 15, k & 15, 0)
  }

  // ------------------------------------------------------- floor emit

  /** mirror of [[VorbisCodec.decodeFloor1]]: endpoints y0/y1 raw, all
    * partition-point values 0 (predicted line), masterbook entry 1 on
    * the first partition when subclasses are in play (first point ->
    * unused book, exercising the -1 leg)
    */
  private def emitFloor(bw: BitWriter, cfg: Floor1Config,
      books: Array[Codebook], y0: Int, y1: Int): Unit = {
    bw.writeBit(1)
    val range = 256
    bw.write(y0, ilog(range - 1))
    bw.write(y1, ilog(range - 1))
    var i = 0
    while (i < cfg.partitionClasses.length) {
      val cls = cfg.partitionClasses(i)
      val cbits = cfg.classSubclasses(cls)
      val csub = (1 << cbits) - 1
      var cval = 0
      if (cbits > 0) {
        cval = if (i == 0) 1 else 0
        val mb = books(cfg.classMasterbooks(cls))
        val (code, len) = mb.codewords(cval)
        bw.writeCode(code, len)
      }
      var j = 0
      while (j < cfg.classDims(cls)) {
        val bookNum = cfg.subclassBooks(cls)(cval & csub)
        cval >>>= cbits
        if (bookNum >= 0) {
          val (code, len) = books(bookNum).codewords(0) // value 0
          bw.writeCode(code, len)
        }
        j += 1
      }
      i += 1
    }
  }

  /** the floor amplitude curve the decoder will synthesize for (y0, y1,
    * zeros) — used to pre-divide the spectrum
    */
  private def floorCurve(cfg: Floor1Config, y0: Int, y1: Int, n2: Int)
      : Array[Double] = {
    val y = new Array[Int](cfg.values)
    y(0) = y0; y(1) = y1
    val (finalY, step2) = floor1FinalY(cfg, y)
    floor1Curve(cfg, finalY, step2, n2)
  }

  // ------------------------------------------------------ residue emit

  /** mirror of the decoder's §8.6.2 walk over the same pass/partition/
    * classword interleave
    */
  private def emitResidue(bw: BitWriter, cfg: ResidueConfig,
      books: Array[Codebook], vectors: Array[Array[Double]],
      grids: Grids): Unit = {
    val actualSize = vectors(0).length
    val limitEnd = math.min(cfg.end, actualSize)
    val nToRead = limitEnd - math.min(cfg.begin, actualSize)
    if (nToRead <= 0) return
    val partitionsToRead = nToRead / cfg.partitionSize
    val classbook = books(cfg.classbook)
    val classwords = classbook.dimensions
    val nV = vectors.length
    val psize = cfg.partitionSize
    // grid index per component, precomputed once
    val ks = Array.tabulate(nV)(j => vectors(j).map(grids.index))
    // classification per partition: 1 iff any component quantizes away
    // from zero
    val cls = Array.tabulate(nV, partitionsToRead + classwords) { (j, p) =>
      if (p >= partitionsToRead) 0
      else {
        val off = p * psize
        var any = false
        var s = 0
        while (s < psize) {
          if (ks(j)(off + s) != grids.zeroK) any = true
          s += 1
        }
        if (any) 1 else 0
      }
    }
    val digits = Array.tabulate(nV)(j => ks(j).map(grids.digits))
    val maxPass = if (grids.thirdPass) 3 else 2
    var pass = 0
    while (pass < maxPass) {
      var partitionCount = 0
      while (partitionCount < partitionsToRead) {
        if (pass == 0) {
          var j = 0
          while (j < nV) {
            var temp = 0
            var i = 0
            while (i < classwords) {
              temp = temp * cfg.classifications + cls(j)(partitionCount + i)
              i += 1
            }
            val (code, len) = classbook.codewords(temp)
            bw.writeCode(code, len)
            j += 1
          }
        }
        var i = 0
        while (i < classwords && partitionCount < partitionsToRead) {
          var j = 0
          while (j < nV) {
            val bookNum = cfg.books(cls(j)(partitionCount))(pass)
            if (bookNum >= 0) {
              val book = books(bookNum)
              val off = partitionCount * psize
              // digit base: type-1 books index digits via lookupValues;
              // our type-2 books lay digits out base sqrt(entries)
              val levels =
                if (book.lookupType == 1) book.lookupValues
                else math.rint(math.sqrt(book.entries.toDouble)).toInt
              if (cfg.residueType == 0) {
                val step = psize / book.dimensions
                var s = 0
                while (s < step) {
                  val a = digitOf(digits(j)(off + s), pass)
                  val b = digitOf(digits(j)(off + s + step), pass)
                  val (code, len) = book.codewords(a + levels * b)
                  bw.writeCode(code, len)
                  s += 1
                }
              } else {
                var s = 0
                while (s < psize) {
                  val a = digitOf(digits(j)(off + s), pass)
                  val b = digitOf(digits(j)(off + s + 1), pass)
                  val (code, len) = book.codewords(a + levels * b)
                  bw.writeCode(code, len)
                  s += 2
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

  private def digitOf(d: (Int, Int, Int), pass: Int): Int =
    pass match { case 0 => d._1; case 1 => d._2; case _ => d._3 }

  // ----------------------------------------------------------- encode

  /** forward MDCT matched to the decoder's unscaled IMDCT: the 4/n
    * factor here makes windowed OLA reconstruction unity-gain
    */
  private def forwardMdct(xw: Array[Double], n: Int): Array[Double] = {
    val n2 = n / 2
    val t = mdctTable(n)
    val out = new Array[Double](n2)
    val scale = 4.0 / n
    var k = 0
    while (k < n2) {
      var acc = 0.0
      var j = 0
      val base = k * n
      while (j < n) { acc += xw(j) * t(base + j); j += 1 }
      out(k) = acc * scale
      k += 1
    }
    out
  }

  /** decoded output sample 0 corresponds to input sample
    * `leadOffset(plan)` (the first block's right-slope start)
    */
  def leadOffset(blockPlan: Seq[Boolean], bs0Exp: Int = 8,
      bs1Exp: Int = 11): Int = {
    val bs0 = 1 << bs0Exp
    val bs1 = 1 << bs1Exp
    val long0 = blockPlan.head
    val next0 = if (blockPlan.length > 1) blockPlan(1) else true
    windowShape(if (long0) bs1 else bs0, bs0, long0, prevFlag = true,
      nextFlag = next0).rightStart
  }

  /** total decoded sample count for a block plan */
  def decodedLength(blockPlan: Seq[Boolean], bs0Exp: Int = 8,
      bs1Exp: Int = 11): Int = {
    val shapes = planShapes(blockPlan, 1 << bs0Exp, 1 << bs1Exp)
    shapes.drop(1).map(s => s.rightStart - s.leftStart).sum
  }

  private def planShapes(plan: Seq[Boolean], bs0: Int, bs1: Int)
      : Seq[WindowShape] =
    plan.zipWithIndex.map { case (long, b) =>
      val prevF = if (b == 0) true else plan(b - 1)
      val nextF = if (b == plan.length - 1) true else plan(b + 1)
      windowShape(if (long) bs1 else bs0, bs0, long, prevF, nextF)
    }

  /** Encode PCM (one array per channel, [-1, 1]) into a complete Ogg
    * Vorbis stream. `blockPlan` gives the long/short decision per audio
    * packet; `residueType` defaults to 1 for mono and 2 for
    * multi-channel. `rampFloor` emits a 255→243 dB-domain floor ramp
    * instead of the flat unity floor; `thirdPass` adds the
    * lookup-type-2 refinement book; `subclassFloor` routes floor values
    * through a masterbook/subclass pair.
    */
  def encode(chans: Array[Array[Double]], sampleRate: Int,
      blockPlan: Seq[Boolean], coupled: Boolean = false,
      rampFloor: Boolean = false, thirdPass: Boolean = false,
      subclassFloor: Boolean = false, residueType: Int = -1,
      bs0Exp: Int = 8, bs1Exp: Int = 11): Array[Byte] = {
    val channels = chans.length
    require(channels >= 1 && blockPlan.nonEmpty)
    require(!coupled || channels == 2, "coupling needs 2 channels")
    val rType = if (residueType >= 0) residueType
      else if (channels > 1) 2 else 1
    val bs0 = 1 << bs0Exp
    val bs1 = 1 << bs1Exp
    val idB = idHeaderBytes(channels, sampleRate, bs0Exp, bs1Exp)
    val (setupB, _) =
      setupHeaderBytes(channels, coupled, rampFloor, thirdPass,
        subclassFloor, rType)
    // drive emission off the PARSED setup (shared truth with the decoder)
    val id = readIdHeader(idB)
    val setup = readSetup(setupB, channels)
    val grids = Grids(thirdPass)
    val floorCfg = setup.floors(0)
    val resCfg = setup.residues(0)
    val (y0, y1) = if (rampFloor) (255, 243) else (255, 255)
    val shapes = planShapes(blockPlan, bs0, bs1)
    val curves = new java.util.HashMap[Integer, Array[Double]]()
    def curve(n2: Int): Array[Double] =
      curves.computeIfAbsent(n2, (k: Integer) =>
        floorCurve(floorCfg, y0, y1, k.intValue()))
    val packets = scala.collection.mutable.ArrayBuffer[Array[Byte]](
      idB, commentHeaderBytes, setupB)
    val granules = scala.collection.mutable.ArrayBuffer[Long](0L, 0L, 0L)
    var produced = 0L
    var aPos = 0 // absolute input index of the current block's sample 0
    var b = 0
    while (b < blockPlan.length) {
      val long = blockPlan(b)
      val shape = shapes(b)
      val n = shape.n
      val n2 = n / 2
      val bw = new BitWriter
      bw.writeBit(0) // audio packet
      bw.write(if (long) 1 else 0, ilog(setup.modes.length - 1))
      if (long) {
        bw.writeBit(if (b == 0 || blockPlan(b - 1)) 1 else 0)
        bw.writeBit(if (b == blockPlan.length - 1 || blockPlan(b + 1)) 1 else 0)
      }
      // per-channel windowed forward MDCT, floor division
      val residual = Array.tabulate(channels) { ch =>
        val x = chans(ch)
        val xw = new Array[Double](n)
        var j = 0
        while (j < n) {
          val p = aPos + j
          val v = if (p >= 0 && p < x.length) x(p) else 0.0
          xw(j) = v * shape(j)
          j += 1
        }
        val spec = forwardMdct(xw, n)
        val c = curve(n2)
        var k = 0
        while (k < n2) { spec(k) /= c(k); k += 1 }
        spec
      }
      var ch = 0
      while (ch < channels) {
        emitFloor(bw, floorCfg, setup.books, y0, y1)
        ch += 1
      }
      if (coupled) {
        // quantize FIRST, couple the grid values: M and A stay exact
        // grid points, so the decoder's sign-switched inverse branches
        // match the encoder's (see Grids scaladoc)
        var k = 0
        while (k < n2) {
          val lq = grids.value(grids.index(residual(0)(k)))
          val rq = grids.value(grids.index(residual(1)(k)))
          val (m, a) = forwardCouple(lq, rq)
          residual(0)(k) = m
          residual(1)(k) = a
          k += 1
        }
      }
      val vectors =
        if (rType == 2) {
          val composite = new Array[Double](channels * n2)
          var k = 0
          while (k < n2) {
            var c = 0
            while (c < channels) {
              composite(k * channels + c) = residual(c)(k)
              c += 1
            }
            k += 1
          }
          Array(composite)
        } else residual
      emitResidue(bw, resCfg, setup.books, vectors, grids)
      packets += bw.toBytes
      if (b > 0) produced += shape.rightStart - shape.leftStart
      granules += produced
      if (b < blockPlan.length - 1)
        aPos += shape.rightStart - shapes(b + 1).leftStart
      b += 1
    }
    val _ = id // sanity-parsed above
    MediaContainers.oggPack(packets.toSeq, serial = 0x56, granules.toSeq)
  }
}

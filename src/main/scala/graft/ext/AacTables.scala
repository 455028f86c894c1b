package graft.ext

/** AAC-LC (ISO 13818-7) codebook and band-table plane — the honesty
  * boundary for [[AacLc]], mirroring [[Mp3Tables]]'s posture for MP3's
  * ESC codebooks:
  *
  *  - The NORMATIVE Huffman bit patterns (scalefactor book hcb_sf +
  *    spectral books 1-11, ISO 13818-7 tables A.1-A.12) are
  *    offline-unobtainable in this container. Unlike MP3's Table B.7 —
  *    where approximate length vectors could be recalled and then
  *    REJECTED by the prefix-free/Kraft gate (DIVERGENCES.md records the
  *    per-table figures) — no candidate transcription of the AAC tables
  *    with any confidence could be produced at all, so the B.7
  *    acceptance gate was never reachable. The refusal is therefore
  *    sharpened from "no AAC codec" to "normative CODEBOOKS only".
  *  - What stands in: CANONICAL Huffman books built in-repo by running
  *    the actual Huffman algorithm over a deterministic magnitude-decay
  *    frequency model, then canonicalized (shorter first, ties by entry
  *    index). They carry the full mechanics — tuple dimensionality, LAV
  *    per book, signed vs unsigned-with-sign-bits, book-11 escape
  *    sequences — and are Kraft-exact BY CONSTRUCTION (asserted at
  *    init). A third-party ADTS stream decoded against them would be
  *    garbage, so [[AacLc.decode]] refuses by default and
  *    `allowNonNormative = true` opts in (graft's own encoder's streams
  *    round-trip).
  *  - The scalefactor-band tables are likewise an IN-REPO layout
  *    (deterministic ~9%-growth progression, 4-aligned, matching the
  *    normative tables' shape but not their exact offsets); same gate.
  *  - Everything else in the LC path is formula-defined and normative:
  *    the ADTS syntax, the 4/3-power dequantizer, TNS coefficient
  *    dequant + all-pole filter, M/S, the IMDCT, and the sine/KBD
  *    windows (KBD from the Kaiser-Bessel kernel, computed).
  */
object AacTables {

  /** ADTS sampling_frequency_index -> rate (public, every ADTS doc) */
  val sampleRates: Array[Int] = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000)

  // --------------------------------------------- canonical Huffman

  /** Huffman lengths for `freqs` (real Huffman algorithm, deterministic
    * tie-break by smallest entry index), then canonical codes assigned
    * shorter-first / index-order. Kraft-exact by construction.
    */
  private[ext] def huffmanLengths(freqs: Array[Double]): Array[Int] = {
    val n = freqs.length
    require(n >= 2)
    // leaf/internal nodes: (freq, tieOrder, members)
    final case class Node(f: Double, tie: Long, members: List[Int])
    implicit val ord: Ordering[Node] =
      Ordering.by(nd => (nd.f, nd.tie))
    val pq = scala.collection.mutable.PriorityQueue.empty[Node](ord.reverse)
    var i = 0
    while (i < n) { pq.enqueue(Node(freqs(i), i.toLong, List(i))); i += 1 }
    val depth = new Array[Int](n)
    var tie = n.toLong
    while (pq.size > 1) {
      val a = pq.dequeue()
      val b = pq.dequeue()
      (a.members ++ b.members).foreach(m => depth(m) += 1)
      pq.enqueue(Node(a.f + b.f, tie, a.members ++ b.members))
      tie += 1
    }
    depth
  }

  /** (codeword, length) per entry, canonical order; plus a decode map
    * keyed (len << 32 | code-read-MSB-first)
    */
  final class CanonBook(val lengths: Array[Int]) {
    require({
      val kraft = lengths.map(l => 1L << (32 - l)).sum
      kraft == (1L << 32)
    }, "canonical book not Kraft-exact")
    val codes: Array[Int] = {
      val order = lengths.indices.sortBy(e => (lengths(e), e))
      val out = new Array[Int](lengths.length)
      var code = 0
      var prevLen = order.headOption.map(lengths(_)).getOrElse(0)
      order.foreach { e =>
        code <<= (lengths(e) - prevLen)
        out(e) = code
        prevLen = lengths(e)
        code += 1
      }
      out
    }
    val maxLen: Int = lengths.max
    private val decodeMap = new java.util.HashMap[Long, Integer]()
    lengths.indices.foreach { e =>
      decodeMap.put((lengths(e).toLong << 32) | (codes(e).toLong & 0xffffffffL), e)
    }
    /** entry for accumulating MSB-first reads; -1 while no match */
    def lookup(len: Int, acc: Int): Int = {
      val hit = decodeMap.get((len.toLong << 32) | (acc.toLong & 0xffffffffL))
      if (hit == null) -1 else hit.intValue()
    }
  }

  // ------------------------------------------------- spectral books

  /** one spectral codebook: `dims`-tuples over [-lav, lav] (signed
    * in-alphabet) or [0, lav] with sign bits (unsigned); book 11
    * additionally escapes |16|
    */
  final class SpecBook(val dims: Int, val lav: Int, val signed: Boolean,
      freqPow: Double) {
    val radix: Int = if (signed) 2 * lav + 1 else lav + 1
    val entries: Int = math.pow(radix.toDouble, dims.toDouble).toInt
    /** tuple values for an entry index (digit order: first value is the
      * most significant digit, matching emission)
      */
    def tuple(entry: Int): Array[Int] = {
      val out = new Array[Int](dims)
      var e = entry
      var i = dims - 1
      while (i >= 0) {
        val d = e % radix
        out(i) = if (signed) d - lav else d
        e /= radix
        i -= 1
      }
      out
    }
    def entryOf(vals: Array[Int]): Int = {
      var e = 0
      var i = 0
      while (i < dims) {
        val d = if (signed) vals(i) + lav else vals(i)
        e = e * radix + d
        i += 1
      }
      e
    }
    val book: CanonBook = new CanonBook(huffmanLengths(
      Array.tabulate(entries) { e =>
        val t = tuple(e)
        t.map(v => 1.0 / math.pow(1.0 + math.abs(v), freqPow)).product
      }))
  }

  /** spectral books 1-11 (index 0 unused): dims/LAV/signedness follow
    * the normative structure; bit patterns are the in-repo canonical
    * stand-ins (see object doc)
    */
  val specBooks: Array[SpecBook] = Array(
    null,
    new SpecBook(4, 1, signed = true, 2.0), // 1
    new SpecBook(4, 1, signed = true, 1.2), // 2
    new SpecBook(4, 2, signed = false, 2.0), // 3
    new SpecBook(4, 2, signed = false, 1.2), // 4
    new SpecBook(2, 4, signed = true, 2.0), // 5
    new SpecBook(2, 4, signed = true, 1.2), // 6
    new SpecBook(2, 7, signed = false, 2.0), // 7
    new SpecBook(2, 7, signed = false, 1.2), // 8
    new SpecBook(2, 12, signed = false, 2.0), // 9
    new SpecBook(2, 12, signed = false, 1.2), // 10
    new SpecBook(2, 16, signed = false, 0.8)) // 11 (ESC at |16|)

  /** scalefactor book: DPCM deltas in [-60, 60], entry = delta + 60 */
  val sfBook: CanonBook = new CanonBook(huffmanLengths(
    Array.tabulate(121)(e => 1.0 / math.pow(1.0 + math.abs(e - 60), 3.0))))

  val SfOffset = 100 // dequant: 2^(0.25 * (sf - SfOffset))

  // ------------------------------------------- scalefactor bands

  /** in-repo swb offset progression: width 4 growing ~9% (4-aligned)
    * until `total` bins — the normative tables' SHAPE, not their exact
    * offsets (see object doc; gated behind allowNonNormative)
    */
  private def swbProgression(total: Int, start: Int, growth: Double)
      : Array[Int] = {
    val offs = scala.collection.mutable.ArrayBuffer[Int](0)
    var w = start.toDouble
    while (offs.last < total) {
      val width = math.max(4, (math.rint(w / 4.0) * 4).toInt)
      offs += math.min(total, offs.last + width)
      w *= growth
    }
    offs.toArray
  }

  /** long-window swb offsets (1024 bins, ~37 bands; 6-bit max_sfb) */
  val swbLong: Array[Int] = swbProgression(1024, 4, 1.09)

  /** short-window swb offsets (128 bins, ~11 bands; 4-bit max_sfb) */
  val swbShort: Array[Int] = swbProgression(128, 4, 1.25)

  locally {
    require(swbLong.length - 1 <= 63, s"long bands ${swbLong.length - 1}")
    require(swbShort.length - 1 <= 15, s"short bands ${swbShort.length - 1}")
  }

  // ------------------------------------------------------ windows

  /** sine window half: w[n] = sin(π/N (n + 1/2)), N = 2 * half */
  def sineWindow(half: Int): Array[Double] =
    Array.tabulate(half)(n => math.sin(math.Pi / (2.0 * half) * (n + 0.5)))

  /** Kaiser-Bessel-derived window half (ISO 13818-7 formula, computed
    * from the zeroth-order modified Bessel kernel; alpha 4 long / 6
    * short per the spec's parameters)
    */
  def kbdWindow(half: Int): Array[Double] = {
    val alpha = if (half >= 1024) 4.0 else 6.0
    def bessel0(x: Double): Double = {
      var sum = 1.0
      var term = 1.0
      var k = 1
      while (k < 50) {
        term *= (x / 2.0) * (x / 2.0) / (k.toDouble * k)
        sum += term
        k += 1
      }
      sum
    }
    val n2 = half
    val kernel = Array.tabulate(n2 + 1) { n =>
      val x = alpha * math.Pi * math.sqrt(
        math.max(0.0, 1.0 - math.pow((2.0 * n) / n2 - 1.0, 2.0)))
      bessel0(x)
    }
    val total = kernel.sum
    val out = new Array[Double](n2)
    var acc = 0.0
    var n = 0
    while (n < n2) {
      acc += kernel(n)
      out(n) = math.sqrt(acc / total)
      n += 1
    }
    out
  }
}

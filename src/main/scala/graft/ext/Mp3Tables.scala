package graft.ext

/** ISO 11172-3 Layer III constant tables (public spec data) + the computed
  * synthesis prototype window.
  *
  * Huffman tables are the spec's explicit (length, codeword) assignments
  * per (x, y) pair — MP3 codes are NOT canonical, so both are stored.
  * Each table is validated at class-init by [[Mp3TablesSpec]]: prefix-free,
  * Kraft-complete (sum 2^-len == 1), decode trie round-trips every entry.
  *
  * The polyphase synthesis PROTOTYPE here is COMPUTED (Kaiser-windowed
  * ideal lowpass, cutoff pi/64, beta 9 — the standard near-PR pseudo-QMF
  * design) rather than the spec's 512 tabulated constants: the tabulated
  * prototype has no closed form and nothing in this container can verify a
  * transcription of it, while the computed one is verifiable in-repo by
  * the analysis→synthesis PSNR spec. Decoding real-world files therefore
  * applies a slightly different (near-identical passband) reconstruction
  * filter than a spec-exact decoder — see DIVERGENCES.md.
  */
object Mp3Tables {

  // --------------------------------------------------------------- sfb

  /** MPEG-1 long-block scalefactor band boundaries per sample rate
    * (ISO 11172-3 table B.8), index by sample-rate id 0=44100 1=48000
    * 2=32000; 23 boundaries = 22 bands + end 576.
    */
  val sfbLongM1: Array[Array[Int]] = Array(
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
      162, 196, 238, 288, 342, 418, 576),
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
      156, 190, 230, 276, 330, 384, 576),
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
      194, 240, 296, 364, 448, 550, 576))

  /** MPEG-1 short-block boundaries (per one window; 14 = 13 bands + 192). */
  val sfbShortM1: Array[Array[Int]] = Array(
    Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    Array(0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    Array(0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192))

  /** MPEG-2 LSF long-block boundaries, sample-rate id 0=22050 1=24000
    * 2=16000 (ISO 13818-3 annex B).
    */
  val sfbLongM2: Array[Array[Int]] = Array(
    Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168,
      200, 238, 284, 336, 396, 464, 522, 576),
    Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136, 162,
      194, 232, 278, 332, 394, 464, 540, 576),
    Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168,
      200, 238, 284, 336, 396, 464, 522, 576))

  val sfbShortM2: Array[Array[Int]] = Array(
    Array(0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192),
    Array(0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192),
    Array(0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192))

  /** Long-block preemphasis per band (ISO table B.6). */
  val pretab: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

  /** MPEG-1 scalefac_compress -> (slen1, slen2) (ISO 2.4.2.7). */
  val slenM1: Array[(Int, Int)] = Array(
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3))

  /** MPEG-2 LSF scalefactor band-count partitions for the NON-INTENSITY
    * channel (ISO 13818-3 2.4.3.2 decode_scalefac_MPEG2): rows by
    * blocknumber (sfc range), columns by block shape long/short/mixed.
    * ONE pinned table drives both [[Mp3Layer3]]'s read and
    * [[Mp3Encoder]]'s emission. The intensity-channel rows
    * (blocknumbers 3-5) live in [[lsfIntensityPartitions]].
    */
  val lsfSfbPartitions: Array[Array[Array[Int]]] = Array(
    Array(Array(6, 5, 5, 5), Array(9, 9, 9, 9), Array(6, 9, 9, 9)),      // sfc < 400
    Array(Array(6, 5, 7, 3), Array(9, 9, 12, 6), Array(6, 9, 12, 6)),    // 400 <= sfc < 500
    Array(Array(11, 10, 0, 0), Array(18, 18, 0, 0), Array(15, 18, 0, 0)))// 500 <= sfc (preflag)

  /** LSF INTENSITY-channel partitions (blocknumbers 3-5 of the same
    * scheme — the right channel of an intensity-stereo LSF stream
    * carries positions read under these band counts).
    */
  val lsfIntensityPartitions: Array[Array[Array[Int]]] = Array(
    Array(Array(7, 7, 7, 0), Array(12, 12, 12, 0), Array(6, 15, 12, 0)),   // int_sfc < 180
    Array(Array(6, 6, 6, 3), Array(12, 9, 9, 6), Array(6, 12, 9, 6)),      // 180 <= int_sfc < 244
    Array(Array(8, 8, 5, 0), Array(15, 12, 9, 0), Array(6, 18, 9, 0)))     // 244 <= int_sfc

  /** LSF scalefac_compress -> (slen[4], blocknumber, preflag) — the
    * non-intensity branch of decode_scalefac_MPEG2.
    */
  def lsfSlens(sfc: Int): (Array[Int], Int, Int) =
    if (sfc < 400)
      (Array((sfc >> 4) / 5, (sfc >> 4) % 5, (sfc & 15) >> 2, sfc & 3), 0, 0)
    else if (sfc < 500) {
      val t = sfc - 400
      (Array((t >> 2) / 5, (t >> 2) % 5, t & 3, 0), 1, 0)
    } else {
      val t = sfc - 500
      (Array(t / 3, t % 3, 0, 0), 2, 1)
    }

  /** INTENSITY-channel branch: int_scalefac_comp = sfc >> 1 selects
    * blocknumbers 3-5 (index 0-2 into [[lsfIntensityPartitions]]); the
    * low sfc bit is the intensity SCALE (io = 2^(-(scale+1)/4)).
    */
  def lsfIntensitySlens(sfc: Int): (Array[Int], Int) = {
    val t = sfc >> 1
    if (t < 180) (Array(t / 36, (t % 36) / 6, t % 6, 0), 0)
    else if (t < 244) {
      val u = t - 180
      (Array((u & 63) >> 4, (u & 15) >> 2, u & 3, 0), 1)
    } else (Array((t - 244) / 3, (t - 244) % 3, 0, 0), 2)
  }

  // ----------------------------------------------------------- huffman

  /** One big-values Huffman table: dimension `xy` (max x+1), `linbits`,
    * and per-(x,y) (length, code) rows flattened x-major. length 0 =
    * unused entry (only table 0, which codes nothing).
    */
  final case class HuffTable(xy: Int, linbits: Int, len: Array[Int],
      code: Array[Int],
      /** true when the (length, codeword) assignments are the ISO Table
        * B.7 bit patterns; false for the IN-REPO canonical codebooks
        * standing in for tables 11/13/16-31 (see [[canonical]]) — streams
        * interchanged with spec-exact third-party codecs must not use a
        * non-normative table, so the decoder requires an explicit opt-in.
        */
      normative: Boolean = true) {
    /** flat decode trie: node i holds branches [i*2], [i*2+1]; leaves are
      * encoded as -(xy_index + 1). Built once; `None` when the table's
      * transcription is not self-consistent (prefix collision) — such a
      * table is marked unusable and frames selecting it decode to None
      * (see the class doc's offline-verifiability note).
      */
    val trieOpt: Option[Array[Int]] = scala.util.Try(buildTrie).toOption

    /** usable = prefix-free AND Kraft-complete (every bit pattern decodes) */
    val usable: Boolean =
      len.exists(_ > 0) && trieOpt.isDefined && math.abs(kraft - 1.0) < 1e-9

    def trie: Array[Int] = trieOpt.get

    private def buildTrie: Array[Int] = {
      val nodes = scala.collection.mutable.ArrayBuffer(0, 0) // root
      def insert(bits: Int, nbits: Int, leaf: Int): Unit = {
        var node = 0
        var i = nbits - 1
        while (i >= 0) {
          val b = (bits >>> i) & 1
          val slot = node * 2 + b
          if (i == 0) {
            require(nodes(slot) == 0, s"huffman code collision at $leaf")
            nodes(slot) = -(leaf + 1)
          } else {
            if (nodes(slot) == 0) {
              val next = nodes.length / 2
              nodes(slot) = next
              nodes += 0; nodes += 0
            }
            require(nodes(slot) > 0, s"huffman prefix collision at $leaf")
            node = nodes(slot)
          }
          i -= 1
        }
      }
      var i = 0
      while (i < len.length) {
        if (len(i) > 0) insert(code(i), len(i), i)
        i += 1
      }
      nodes.toArray
    }

    def kraft: Double = len.filter(_ > 0).map(l => math.pow(2.0, -l)).sum
  }

  private def t(xy: Int, linbits: Int, lens: Seq[Int], codes: Seq[Int]) = {
    require(lens.length == xy * xy && codes.length == xy * xy)
    HuffTable(xy, linbits, lens.toArray, codes.toArray)
  }

  /** Tables 0-31 (ISO tables B.7). Tables 4 and 14 are not used by the
    * standard; 17-23 and 25-31 reuse the code trees of 16 and 24 with
    * different linbits.
    */
  val big: Array[HuffTable] = {
    val t0 = HuffTable(0, 0, Array(0), Array(0))

    val t1 = t(2, 0,
      Seq(1, 3, 2, 3),
      Seq(1, 1, 1, 0))

    val t2 = t(3, 0,
      Seq(1, 3, 6,
          3, 3, 5,
          5, 5, 6),
      Seq(1, 2, 1,
          3, 1, 1,
          3, 2, 0))

    val t3 = t(3, 0,
      Seq(2, 2, 6,
          3, 2, 5,
          5, 5, 6),
      Seq(3, 2, 1,
          1, 1, 1,
          3, 2, 0))

    val t5 = t(4, 0,
      Seq(1, 3, 6, 7,
          3, 3, 6, 7,
          6, 6, 7, 8,
          7, 6, 7, 8),
      Seq(1, 2, 6, 5,
          3, 1, 4, 4,
          7, 5, 7, 1,
          6, 1, 1, 0))

    val t6 = t(4, 0,
      Seq(3, 3, 5, 7,
          3, 2, 4, 5,
          4, 4, 5, 6,
          6, 5, 6, 7),
      Seq(7, 3, 5, 1,
          6, 2, 3, 2,
          5, 4, 4, 1,
          3, 3, 2, 0))

    val t7 = t(6, 0,
      Seq(1, 3, 6, 8, 8, 9,
          3, 4, 6, 7, 7, 8,
          6, 5, 7, 8, 8, 9,
          7, 7, 8, 9, 9, 9,
          7, 7, 8, 9, 9, 10,
          8, 8, 9, 10, 10, 10),
      Seq(1, 2, 10, 19, 16, 10,
          3, 3, 7, 10, 5, 3,
          11, 4, 13, 17, 8, 4,
          12, 11, 18, 15, 11, 2,
          7, 6, 9, 14, 3, 1,
          6, 4, 5, 3, 2, 0))

    val t8 = t(6, 0,
      Seq(2, 3, 6, 8, 8, 9,
          3, 2, 4, 8, 8, 8,
          6, 4, 6, 8, 8, 9,
          8, 8, 8, 9, 9, 10,
          8, 7, 8, 9, 10, 10,
          9, 8, 9, 9, 11, 11),
      Seq(3, 4, 6, 18, 12, 5,
          5, 1, 2, 16, 9, 3,
          7, 3, 5, 14, 7, 3,
          19, 17, 15, 13, 10, 4,
          13, 5, 8, 11, 5, 1,
          12, 4, 4, 1, 1, 0))

    val t9 = t(6, 0,
      Seq(3, 3, 5, 6, 8, 9,
          3, 3, 4, 5, 6, 8,
          4, 4, 5, 6, 7, 8,
          6, 5, 6, 7, 7, 8,
          7, 6, 7, 7, 8, 9,
          8, 7, 8, 8, 9, 9),
      Seq(7, 5, 9, 14, 15, 7,
          6, 4, 5, 5, 6, 7,
          7, 6, 8, 8, 8, 5,
          15, 6, 9, 10, 5, 1,
          11, 7, 9, 6, 4, 1,
          14, 4, 6, 2, 6, 0))

    val t10 = t(8, 0,
      Seq(1, 3, 6, 8, 9, 9, 9, 10,
          3, 4, 6, 7, 8, 9, 8, 8,
          6, 6, 7, 8, 9, 10, 9, 9,
          7, 7, 8, 9, 10, 10, 9, 10,
          8, 8, 9, 10, 10, 10, 10, 10,
          9, 9, 10, 10, 11, 11, 10, 11,
          8, 8, 9, 10, 10, 10, 11, 11,
          9, 8, 9, 10, 10, 11, 11, 11),
      Seq(1, 2, 10, 23, 35, 30, 12, 17,
          3, 3, 8, 12, 18, 21, 12, 7,
          11, 9, 15, 21, 32, 40, 19, 6,
          14, 13, 22, 34, 46, 23, 18, 7,
          20, 19, 33, 47, 27, 22, 9, 3,
          31, 22, 41, 26, 21, 20, 5, 3,
          14, 13, 10, 11, 16, 6, 5, 1,
          9, 8, 7, 8, 4, 4, 2, 0))

    val t12 = t(8, 0,
      Seq(4, 3, 5, 7, 8, 9, 9, 9,
          3, 3, 4, 5, 7, 7, 8, 8,
          5, 4, 5, 6, 7, 8, 7, 8,
          6, 5, 6, 6, 7, 8, 8, 8,
          7, 6, 7, 7, 8, 8, 8, 9,
          8, 7, 8, 8, 8, 9, 8, 9,
          8, 7, 7, 8, 8, 9, 9, 10,
          9, 8, 8, 9, 9, 9, 9, 10),
      Seq(9, 6, 16, 33, 41, 39, 38, 26,
          7, 5, 6, 9, 23, 16, 26, 11,
          17, 7, 11, 14, 21, 30, 10, 7,
          17, 10, 15, 12, 18, 28, 14, 5,
          32, 13, 22, 19, 18, 16, 9, 5,
          40, 17, 31, 29, 17, 13, 4, 2,
          27, 12, 11, 15, 10, 7, 4, 1,
          27, 12, 8, 12, 6, 3, 1, 0))

    val t15 = t(16, 0,
      Seq(3, 4, 5, 7, 7, 8, 9, 9, 9, 10, 10, 11, 11, 11, 12, 13,
          4, 3, 5, 6, 7, 7, 8, 8, 8, 9, 9, 10, 10, 10, 11, 11,
          5, 5, 5, 6, 7, 7, 8, 8, 8, 9, 9, 10, 10, 11, 11, 11,
          6, 6, 6, 7, 7, 8, 8, 9, 9, 9, 10, 10, 10, 11, 11, 11,
          7, 6, 7, 7, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11,
          8, 7, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 11, 11, 11, 12,
          9, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 12, 12,
          9, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 12,
          9, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 11, 11, 12, 12, 12,
          9, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12,
          10, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 11, 12, 13, 12,
          10, 9, 9, 9, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 13,
          11, 10, 9, 10, 10, 10, 11, 11, 11, 11, 11, 11, 12, 12, 13, 13,
          11, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 12, 12, 13, 13,
          12, 11, 11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 13, 13, 12, 13,
          12, 11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 12, 13, 13, 13, 13),
      Seq(7, 12, 18, 53, 47, 76, 124, 108, 89, 123, 108, 119, 107, 81, 122, 63,
          13, 5, 16, 27, 46, 36, 61, 51, 42, 70, 52, 83, 65, 41, 59, 36,
          19, 17, 15, 24, 41, 34, 59, 48, 40, 64, 50, 78, 62, 80, 56, 33,
          29, 28, 25, 43, 39, 63, 55, 93, 76, 59, 93, 72, 54, 75, 50, 29,
          52, 22, 42, 40, 67, 57, 95, 79, 72, 57, 89, 69, 49, 66, 46, 27,
          77, 37, 35, 66, 58, 52, 91, 74, 62, 48, 79, 63, 90, 62, 40, 38,
          125, 32, 60, 56, 50, 92, 78, 65, 55, 87, 71, 51, 73, 51, 70, 30,
          109, 53, 49, 94, 88, 75, 66, 122, 91, 73, 56, 42, 64, 44, 21, 25,
          90, 43, 41, 77, 73, 63, 56, 92, 77, 66, 47, 67, 48, 53, 36, 20,
          71, 34, 67, 60, 58, 49, 88, 76, 67, 106, 71, 54, 38, 39, 23, 15,
          109, 53, 51, 47, 90, 82, 58, 57, 48, 72, 57, 41, 23, 27, 62, 9,
          86, 42, 40, 37, 70, 64, 52, 43, 70, 55, 42, 25, 29, 18, 11, 11,
          118, 68, 30, 55, 50, 46, 74, 65, 49, 39, 24, 16, 22, 13, 14, 7,
          91, 44, 39, 38, 34, 63, 52, 45, 31, 52, 28, 19, 14, 8, 9, 3,
          123, 60, 58, 53, 47, 43, 32, 22, 37, 24, 17, 12, 15, 10, 2, 1,
          71, 37, 34, 30, 28, 20, 17, 26, 21, 16, 10, 6, 8, 6, 2, 0))

    // Tables 11, 13 and the ESC trees 16/24 (shared by 17-23 / 25-31)
    // carry IN-REPO CANONICAL codebooks, NOT the ISO Table B.7 bit
    // patterns: this container has no copy of the spec to transcribe
    // them from and best-effort recall failed the prefix-free/Kraft
    // self-consistency validation (wrong data labeled normative is worse
    // than absent data — a silently corrupt codebook decodes plausible
    // garbage). The canonical stand-ins make the FULL ESC mechanism real
    // (linbits escapes, sign ordering, region table selection, the
    // encoder's escape-table choice) and are prefix-free/Kraft-complete
    // by construction; they are marked `normative = false`, and
    // [[Mp3Layer3.decode]] refuses them unless the caller opts in — a
    // spec-exact third-party stream selecting 11/13/16-31 still decodes
    // to None rather than to garbage. See DIVERGENCES.md.
    val linbits16 = Array(1, 2, 3, 4, 6, 8, 10, 13)
    val linbits24 = Array(4, 5, 6, 7, 8, 9, 11, 13)
    // table 11 codes max value 7 (spec tables 10-12 are 8x8) — the
    // stand-in keeps the normative DIMENSION even though its bit
    // patterns are in-repo canonical (round-10 transcription retry
    // failed the prefix-free/Kraft gate again; see DIVERGENCES.md)
    val t11 = canonical(8, 0, (x, y) => 1L << (20 - math.min(17, x + y + ((x + 1) >> 2))))
    val t13 = canonical(16, 0, (x, y) => 1L << (20 - math.min(17, x + y)))
    val esc16Base = canonical(16, 0, (x, y) => 1L << (20 - math.min(17, 2 * math.min(x + y, 8))))
    val esc24Base = canonical(16, 0, (x, y) => 1L << (20 - math.min(17, (x + y + 1) / 2 + math.min(x + y, 9))))
    def esc16(lb: Int) = esc16Base.copy(linbits = lb)
    def esc24(lb: Int) = esc24Base.copy(linbits = lb)

    Array(
      t0, t1, t2, t3, t0, t5, t6, t7, t8, t9, t10, t11, t12,
      t13, t0, t15,
      esc16(linbits16(0)), esc16(linbits16(1)), esc16(linbits16(2)),
      esc16(linbits16(3)), esc16(linbits16(4)), esc16(linbits16(5)),
      esc16(linbits16(6)), esc16(linbits16(7)),
      esc24(linbits24(0)), esc24(linbits24(1)), esc24(linbits24(2)),
      esc24(linbits24(3)), esc24(linbits24(4)), esc24(linbits24(5)),
      esc24(linbits24(6)), esc24(linbits24(7)))
  }

  /** Deterministic canonical-Huffman codebook over an `xy`×`xy` symbol
    * grid from integer weights (two-queue Huffman with index tie-breaks,
    * then canonical code assignment in (length, symbol) order) — the
    * stand-in construction for the codebooks whose normative ISO bit
    * patterns are unavailable offline. Prefix-free and Kraft-complete by
    * construction; `normative = false`.
    */
  private def canonical(xy: Int, linbits: Int,
      weight: (Int, Int) => Long): HuffTable = {
    val n = xy * xy
    // Huffman code lengths: merge the two lightest trees; ties break on
    // creation order so the table is deterministic across runs
    final case class Tree(w: Long, order: Int, syms: List[Int])
    implicit val ord: Ordering[Tree] =
      Ordering.by((t: Tree) => (-t.w, -t.order))
    val pq = scala.collection.mutable.PriorityQueue.empty[Tree]
    var i = 0
    while (i < n) { pq.enqueue(Tree(weight(i / xy, i % xy), i, List(i))); i += 1 }
    val lens = new Array[Int](n)
    var order = n
    while (pq.size > 1) {
      val a = pq.dequeue(); val b = pq.dequeue()
      (a.syms ++ b.syms).foreach(s => lens(s) += 1)
      pq.enqueue(Tree(a.w + b.w, order, a.syms ++ b.syms))
      order += 1
    }
    // canonical assignment: ascending (length, symbol)
    val bySym = (0 until n).sortBy(s => (lens(s), s))
    val codes = new Array[Int](n)
    var codeAcc = 0
    var prevLen = lens(bySym.head)
    bySym.foreach { s =>
      codeAcc = codeAcc << (lens(s) - prevLen)
      codes(s) = codeAcc
      prevLen = lens(s)
      codeAcc += 1
    }
    HuffTable(xy, linbits, lens, codes, normative = false)
  }

  /** count1 quadruple tables (ISO B.7 tables A and B): 16 entries keyed
    * by (v,w,x,y) bits. Table A is the variable-length tree; table B is
    * the fixed 4-bit identity code (value = ~bits).
    */
  val count1A: HuffTable = {
    // index = v*8 + w*4 + x*2 + y (flattened 2x2x2x2); codes per ISO B.7-A
    val lens = Array(1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6)
    val codes = Array(1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1)
    HuffTable(4, 0, lens, codes)
  }

  // ----------------------------------------------------- windows / dsp

  /** Antialias butterfly coefficients (ISO 2.4.3.4.10.1, ci table). */
  val (csTab, caTab): (Array[Double], Array[Double]) = {
    val ci = Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142,
      -0.0037)
    val cs = ci.map(c => 1.0 / math.sqrt(1.0 + c * c))
    val ca = ci.zip(cs).map { case (c, s) => c * s }
    (cs, ca)
  }

  /** IMDCT windows per block type (ISO 2.4.3.4.10.3) — closed-form sine
    * pieces, computed.
    */
  val imdctWin: Array[Array[Double]] = {
    val w = Array.ofDim[Double](4, 36)
    var i = 0
    while (i < 36) { w(0)(i) = math.sin(math.Pi / 36.0 * (i + 0.5)); i += 1 }
    i = 0
    while (i < 18) { w(1)(i) = math.sin(math.Pi / 36.0 * (i + 0.5)); i += 1 }
    while (i < 24) { w(1)(i) = 1.0; i += 1 }
    while (i < 30) { w(1)(i) = math.sin(math.Pi / 12.0 * (i - 18 + 0.5)); i += 1 }
    // rest zero
    i = 0
    while (i < 12) { w(2)(i) = math.sin(math.Pi / 12.0 * (i + 0.5)); i += 1 }
    i = 0
    while (i < 6) { w(3)(i) = 0.0; i += 1 }
    while (i < 12) { w(3)(i) = math.sin(math.Pi / 12.0 * (i - 6 + 0.5)); i += 1 }
    while (i < 18) { w(3)(i) = 1.0; i += 1 }
    while (i < 36) { w(3)(i) = math.sin(math.Pi / 36.0 * (i + 0.5)); i += 1 }
    w
  }

  /** Computed 512-tap synthesis prototype (see class doc): Kaiser-windowed
    * ideal lowpass. beta=6 / cutoff 1.1*pi/64 maximizes the measured
    * analysis->synthesis reconstruction PSNR (~35 dB NPR floor) under the
    * ISO (n+-16) modulation angles — scanned in-repo, pinned by the
    * filterbank round-trip spec. Normalized to unit sum; the decoder's
    * synthesis table folds the 32x band gain and the measured 4x chain
    * calibration.
    */
  val synthWindow: Array[Double] = {
    def i0(x: Double): Double = {
      var sum = 1.0; var term = 1.0; var k = 1
      while (k < 32) {
        term *= (x / (2.0 * k)) * (x / (2.0 * k))
        sum += term
        k += 1
      }
      sum
    }
    val n = 512
    val beta = 6.0
    val w = new Array[Double](n)
    var i = 0
    while (i < n) {
      val m = i - (n - 1) / 2.0
      // ideal lowpass, cutoff pi/64 (half the 32-band spacing)
      val cut = 1.1 / 64.0
      val sinc = if (m == 0.0) cut else math.sin(math.Pi * m * cut) / (math.Pi * m)
      val r = 2.0 * i / (n - 1) - 1.0
      w(i) = sinc * i0(beta * math.sqrt(math.max(0.0, 1.0 - r * r))) / i0(beta)
      i += 1
    }
    // normalize: the spec D table's polyphase convention has gain 32x the
    // prototype; scale so a constant subband-0 input reconstructs at unit
    // amplitude (sum of all taps = 32 * sum(h) with sum(h) = 1/32)
    val s = w.sum
    w.map(_ * (1.0 / s))
  }

  /** power 4/3 with sign, the Layer III requantization nonlinearity */
  def pow43(v: Int): Double =
    if (v == 0) 0.0
    else {
      val a = math.pow(math.abs(v).toDouble, 4.0 / 3.0)
      if (v < 0) -a else a
    }
}

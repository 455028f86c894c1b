package graft.ext

/** Real compressed-audio codec kernels — all fully public algorithms:
  *
  *  - G.711 μ-law / A-law companding (ITU-T G.711; the classic
  *    segment-table expansion/compression in Sun's public-domain
  *    `g711.c`, reproduced here from the published algorithm). Each
  *    compressed byte expands to one 16-bit linear sample via a pure
  *    closed-form integer formula — which also makes the decode
  *    DuckDB-replayable in the oracle battery.
  *  - IMA/DVI ADPCM (the IMA Digital Audio Pack 4-bit scheme used by
  *    WAV format tag 0x11): per-block {predictor, step index} header +
  *    4-bit nibbles; the decode recurrence is the published step-table
  *    walk. Blocks are self-contained, so a corpus of blocks decodes
  *    embarrassingly parallel — the property that matters at 100 TB.
  *
  * The reference treats media as opaque payloads (SURVEY §north-star);
  * these kernels exist so the multimodal plumbing demonstrably carries
  * REAL compressed audio, not only PCM. Upstream WAV dispatch lives in
  * [[Multimodal.decodeWav]].
  */
object AudioCodecs {

  private final val QuantMask = 0x0f
  private final val SegShift = 4
  private final val SegMask = 0x70
  private final val SignBit = 0x80
  private final val Bias = 0x84
  private final val UlawClip = 8159

  /** μ-law byte (0–255) → 16-bit linear sample. Closed form:
    * complement, rebuild mantissa+bias, shift by segment, re-sign.
    */
  def ulawDecode(b: Int): Int = {
    val u = (~b) & 0xff
    var t = ((u & QuantMask) << 3) + Bias
    t <<= (u & SegMask) >> SegShift
    if ((u & SignBit) != 0) Bias - t else t - Bias
  }

  /** 16-bit linear sample → μ-law byte: fold to 14-bit magnitude + bias,
    * find the segment (the 8-entry μ-law endpoint table), pack
    * sign|segment|mantissa, complement.
    */
  def ulawEncode(pcm: Int): Int = {
    var v = pcm >> 2 // 16-bit two's complement → 14-bit
    val mask = if (v < 0) { v = -v; 0x7f } else 0xff
    if (v > UlawClip) v = UlawClip
    v += Bias >> 2
    val seg = segment(v, ulawSegEnd)
    if (seg >= 8) (0x7f ^ mask) & 0xff
    else (((seg << SegShift) | ((v >> (seg + 1)) & QuantMask)) ^ mask) & 0xff
  }

  /** A-law byte (0–255) → 16-bit linear sample. */
  def alawDecode(b: Int): Int = {
    val a = (b ^ 0x55) & 0xff
    var t = (a & QuantMask) << 4
    val seg = (a & SegMask) >> SegShift
    seg match {
      case 0 => t += 8
      case 1 => t += 0x108
      case _ => t += 0x108; t <<= seg - 1
    }
    if ((a & SignBit) != 0) t else -t
  }

  /** 16-bit linear sample → A-law byte (13-bit magnitude companding). */
  def alawEncode(pcm: Int): Int = {
    var v = pcm >> 3 // 16-bit → 13-bit
    val mask = if (v >= 0) 0xd5 else { v = -v - 1; 0x55 }
    val seg = segment(v, alawSegEnd)
    if (seg >= 8) (0x7f ^ mask) & 0xff
    else {
      val mant = if (seg < 2) (v >> 1) & QuantMask else (v >> seg) & QuantMask
      (((seg << SegShift) | mant) ^ mask) & 0xff
    }
  }

  private val ulawSegEnd = Array(0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff, 0x1fff)
  private val alawSegEnd = Array(0x1f, 0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff)

  private def segment(v: Int, ends: Array[Int]): Int = {
    var i = 0
    while (i < ends.length && v > ends(i)) i += 1
    i
  }

  // ---------------------------------------------------------------- IMA

  /** The published 89-entry IMA step-size table. */
  val imaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adjustment per nibble magnitude 0–7 (sign bit does not move
    * the index).
    */
  val imaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clampPcm(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v

  private def clampIdx(v: Int): Int =
    if (v > 88) 88 else if (v < 0) 0 else v

  /** Decode one nibble against (predictor, index); returns the new pair.
    * The published recurrence: diff = step/8 (+step if bit2) (+step/2 if
    * bit1) (+step/4 if bit0), signed by bit3.
    */
  def imaStep(pred: Int, index: Int, nibble: Int): (Int, Int) = {
    val step = imaStepTable(index)
    var diff = step >> 3
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 1) != 0) diff += step >> 2
    val p2 = clampPcm(if ((nibble & 8) != 0) pred - diff else pred + diff)
    (p2, clampIdx(index + imaIndexTable(nibble & 7)))
  }

  /** Decode a mono IMA WAV block: 4-byte header {int16 LE predictor,
    * uint8 index, reserved}, then 2 samples per byte (LOW nibble first).
    * Sample 0 is the header predictor itself. `maxSamples` trims the
    * final (short) block to the `fact`-chunk length.
    */
  def imaDecodeBlock(bytes: Array[Byte], off: Int, blockLen: Int,
      maxSamples: Int): Array[Int] = {
    require(blockLen >= 4, "IMA block needs a 4-byte header")
    var pred = ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort.toInt
    var idx = clampIdx(bytes(off + 2) & 0xff)
    val n = math.min(maxSamples, (blockLen - 4) * 2 + 1)
    val out = new Array[Int](math.max(n, 0))
    if (out.length == 0) return out
    out(0) = pred
    var i = 1
    while (i < n) {
      val b = bytes(off + 4 + (i - 1) / 2) & 0xff
      val nib = if ((i - 1) % 2 == 0) b & 0x0f else (b >> 4) & 0x0f
      val (p2, i2) = imaStep(pred, idx, nib)
      pred = p2; idx = i2
      out(i) = pred
      i += 1
    }
    out
  }

  /** Encode mono 16-bit PCM into IMA WAV blocks of `samplesPerBlock`
    * (must be odd: 1 header sample + 2·k nibbles). Standard greedy
    * quantizer: pick the nibble whose decoded delta best tracks the
    * residual — expressed exactly as the bit-by-bit successive
    * approximation from the IMA spec so encode∘decode is the canonical
    * pair.
    */
  def imaEncode(samples: Array[Int], samplesPerBlock: Int): Array[Byte] = {
    require(samplesPerBlock >= 3 && samplesPerBlock % 2 == 1,
      "samplesPerBlock must be odd and >= 3")
    val bytesPerBlock = 4 + (samplesPerBlock - 1) / 2
    val nBlocks = (samples.length + samplesPerBlock - 1) / samplesPerBlock
    val out = new Array[Byte](nBlocks * bytesPerBlock)
    var idx = 0
    var blk = 0
    while (blk < nBlocks) {
      val s0 = blk * samplesPerBlock
      val base = blk * bytesPerBlock
      var pred = samples(s0)
      out(base) = (pred & 0xff).toByte
      out(base + 1) = ((pred >> 8) & 0xff).toByte
      out(base + 2) = idx.toByte
      out(base + 3) = 0
      var i = 1
      while (i < samplesPerBlock) {
        val target = if (s0 + i < samples.length) samples(s0 + i) else 0
        val step = imaStepTable(idx)
        var delta = target - pred
        var nib = if (delta < 0) { delta = -delta; 8 } else 0
        // successive approximation against step, step/2, step/4
        if (delta >= step) { nib |= 4; delta -= step }
        if (delta >= (step >> 1)) { nib |= 2; delta -= step >> 1 }
        if (delta >= (step >> 2)) nib |= 1
        val (p2, i2) = imaStep(pred, idx, nib)
        pred = p2; idx = i2
        val bo = base + 4 + (i - 1) / 2
        if ((i - 1) % 2 == 0) out(bo) = (nib & 0x0f).toByte
        else out(bo) = (out(bo) | ((nib & 0x0f) << 4)).toByte
        i += 1
      }
      blk += 1
    }
    out
  }

  // ------------------------------------------------------- WAV packers

  private def riffWav(fmtPayload: Array[Byte], extraChunks: Seq[(String, Array[Byte])],
      data: Array[Byte]): Array[Byte] = {
    val chunks = ("fmt " -> fmtPayload) +: extraChunks :+ ("data" -> data)
    val body = chunks.map { case (_, p) => 8 + p.length + (p.length & 1) }.sum
    val out = java.nio.ByteBuffer.allocate(12 + body)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + body)
      .put("WAVE".getBytes("US-ASCII"))
    chunks.foreach { case (tag, p) =>
      out.put(tag.getBytes("US-ASCII")).putInt(p.length).put(p)
      if ((p.length & 1) == 1) out.put(0.toByte)
    }
    out.array()
  }

  /** Pack G.711 bytes as a WAV (format tag 7 = μ-law, 6 = A-law), mono. */
  def wavPackG711(compressed: Array[Byte], sampleRate: Int,
      aLaw: Boolean): Array[Byte] = {
    val fmt = java.nio.ByteBuffer.allocate(18)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(if (aLaw) 6 else 7).putShort(1)
      .putInt(sampleRate).putInt(sampleRate)
      .putShort(1).putShort(8).putShort(0) // blockAlign=1, bits=8, cbSize=0
      .array()
    val fact = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(compressed.length).array()
    riffWav(fmt, Seq("fact" -> fact), compressed)
  }

  /** Pack IMA-ADPCM blocks as a WAV (format tag 0x11), mono.
    * `nSamples` goes to the `fact` chunk (trims the last block).
    */
  def wavPackIma(blocks: Array[Byte], sampleRate: Int, samplesPerBlock: Int,
      nSamples: Int): Array[Byte] = {
    val blockAlign = 4 + (samplesPerBlock - 1) / 2
    val avgBps = sampleRate * blockAlign / samplesPerBlock
    val fmt = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(0x11).putShort(1)
      .putInt(sampleRate).putInt(avgBps)
      .putShort(blockAlign.toShort).putShort(4) // bits per (compressed) sample
      .putShort(2).putShort(samplesPerBlock.toShort) // cbSize=2, wSamplesPerBlock
      .array()
    val fact = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(nSamples).array()
    riffWav(fmt, Seq("fact" -> fact), blocks)
  }
}

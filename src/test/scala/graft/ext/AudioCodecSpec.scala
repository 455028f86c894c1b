package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** G.711 / IMA-ADPCM codec kernels + WAV dispatch + MJPEG-AVI container. */
class AudioCodecSpec extends SparkSpec {

  test("G.711 mu-law: every code round-trips through decode->encode") {
    // 0x7f and 0xff are the two zero codes (negative/positive zero) —
    // both decode to 0, which re-encodes to the canonical 0xff
    for (b <- 0 until 256) {
      val x = AudioCodecs.ulawDecode(b)
      val b2 = AudioCodecs.ulawEncode(x)
      if (b == 0x7f) assert(b2 == 0xff)
      else assert(b2 == b, s"mu-law code $b decoded to $x re-encoded to $b2")
    }
  }

  test("G.711 A-law: every code round-trips through decode->encode") {
    for (b <- 0 until 256) {
      val x = AudioCodecs.alawDecode(b)
      val b2 = AudioCodecs.alawEncode(x)
      assert(b2 == b, s"A-law code $b decoded to $x re-encoded to $b2")
    }
  }

  test("G.711 quantization error is bounded and sign-correct") {
    var x = -32768
    while (x <= 32767) {
      val u = AudioCodecs.ulawDecode(AudioCodecs.ulawEncode(x))
      val a = AudioCodecs.alawDecode(AudioCodecs.alawEncode(x))
      // top mu-law segment step is 1024 (16-bit domain); A-law top step 512
      assert(math.abs(u - x) <= 1024, s"mu-law err at $x: $u")
      assert(math.abs(a - x) <= 512, s"A-law err at $x: $a")
      x += 97
    }
  }

  test("IMA step: hand-computed known vector") {
    // pred=0 idx=0 step=7: nib 7 -> diff 0+7+3+1=11, idx 0+8=8
    // step=16: nib 7 -> diff 2+16+8+4=30 -> pred 41, idx 16
    // step=34: nib 0xF -> diff 4+34+17+8=63 -> pred -22, idx 24
    // step=73: nib 0 -> diff 9 -> pred -13, idx 23
    val block = Array[Byte](0, 0, 0, 0, 0x77, 0x0f)
    val out = AudioCodecs.imaDecodeBlock(block, 0, block.length, 5)
    assert(out.toSeq == Seq(0, 11, 41, -22, -13))
  }

  test("IMA encode->decode tracks a smooth signal") {
    val n = 1023
    val pcm = Array.tabulate(n)(i =>
      (8000 * math.sin(i * 0.05) + 3000 * math.sin(i * 0.013)).toInt)
    val spb = 33
    val enc = AudioCodecs.imaEncode(pcm, spb)
    val bpb = 4 + (spb - 1) / 2
    val dec = (0 until enc.length / bpb).flatMap { b =>
      AudioCodecs.imaDecodeBlock(enc, b * bpb, bpb, spb)
    }.toArray.take(n)
    assert(dec.length == n)
    var sig = 0.0; var err = 0.0
    for (i <- 0 until n) {
      sig += pcm(i).toDouble * pcm(i)
      val d = (dec(i) - pcm(i)).toDouble; err += d * d
    }
    val snrDb = 10 * math.log10(sig / err)
    assert(snrDb > 20, s"ADPCM SNR too low: $snrDb dB")
  }

  test("decodeWav dispatches G.711 and IMA WAVs to real decode") {
    val raw = Array.tabulate(300)(i => ((i * 37 + 11) % 256).toByte)
    val u = Multimodal.decodeWav(AudioCodecs.wavPackG711(raw, 8000, aLaw = false)).get
    assert(u.sampleRate == 8000 && u.bitsPerSample == 16)
    assert(u.samples.toSeq == raw.toSeq.map(b => AudioCodecs.ulawDecode(b & 0xff)))
    val a = Multimodal.decodeWav(AudioCodecs.wavPackG711(raw, 8000, aLaw = true)).get
    assert(a.samples.toSeq == raw.toSeq.map(b => AudioCodecs.alawDecode(b & 0xff)))

    val pcm = Array.tabulate(97)(i => (2000 * math.sin(i * 0.2)).toInt)
    val blocks = AudioCodecs.imaEncode(pcm, 33)
    val wav = AudioCodecs.wavPackIma(blocks, 8000, 33, nSamples = 97)
    val ima = Multimodal.decodeWav(wav).get
    assert(ima.samples.length == 97) // fact chunk trims the padded block
    assert(ima.samples(0) == pcm(0)) // sample 0 is the block-header predictor
    // corrupt payloads: None, never throw
    assert(Multimodal.decodeWav(wav.take(30)).isEmpty)
  }

  test("crafted ADPCM fact chunk rejects without allocating") {
    // fmt 0x11 with fact = Int.MaxValue over a tiny data chunk: the decode
    // must reject BEFORE allocating the declared sample count (the
    // never-over-allocate discipline) — previously this built a multi-GB
    // array first and only then failed the pos==total check
    val pcm = Array.tabulate(97)(i => (2000 * math.sin(i * 0.2)).toInt)
    val wav = AudioCodecs.wavPackIma(AudioCodecs.imaEncode(pcm, 33), 8000, 33,
      nSamples = 97)
    // locate the fact chunk and patch its declared count to Int.MaxValue
    val fi = wav.indices.find(i => i + 12 <= wav.length &&
      wav(i) == 'f' && wav(i + 1) == 'a' && wav(i + 2) == 'c' && wav(i + 3) == 't').get
    val crafted = wav.clone()
    crafted(fi + 8) = 0xff.toByte; crafted(fi + 9) = 0xff.toByte
    crafted(fi + 10) = 0xff.toByte; crafted(fi + 11) = 0x7f.toByte
    val before = Runtime.getRuntime.totalMemory()
    assert(Multimodal.decodeWav(crafted).isEmpty)
    // heap must not have ballooned by the ~8 GB the fake fact implies
    assert(Runtime.getRuntime.totalMemory() - before < (1L << 30))
    // the untouched WAV still decodes (fact == real sample count)
    assert(Multimodal.decodeWav(wav).get.samples.length == 97)
  }

  test("MJPEG AVI: pack -> parse -> real JDK frame decode clears PSNR") {
    val spark0 = spark
    import spark0.implicits._
    val ids = Seq(0L, 1L, 2L, 7L).toDF("doc_id")
    val avi = MediaContainers.synthesizeAvi(ids, "doc_id", w = 16, h = 12,
      quality = 0.9f)
    val one = avi.where(col("doc_id") === 7L).collect().head
      .getAs[Array[Byte]]("media")
    val meta = MediaContainers.parseAvi(one).get
    assert(meta.codec == "MJPG" && meta.width == 16 && meta.height == 12)
    assert(meta.scale == 1 && meta.rate == 24 && meta.usPerFrame == 41666L)
    assert(meta.frames.length == (2 + 7 % 4) && meta.declaredFrames == 5)

    val checked = MediaContainers.aviFrameCheck(avi, "doc_id", 16, 12,
      minPsnrDb = 15.0).collect()
    assert(checked.length == Seq(0, 1, 2, 7).map(i => 2 + i % 4).sum)
    assert(checked.forall(_.getAs[Boolean]("psnr_ok")))
    assert(checked.forall(_.getAs[Double]("fps") == 24.0))
    // corrupt container: dropped, not thrown
    assert(MediaContainers.parseAvi(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("pcmStatsFrame integer aggregates match a local replay") {
    val spark0 = spark
    import spark0.implicits._
    val ids = Seq(3L, 4L).toDF("doc_id")
    val df = Multimodal.synthesizeG711(ids, "doc_id", n = 50, aLaw = false)
    val got = Multimodal.pcmStatsFrame(df, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    for (id <- Seq(3L, 4L)) {
      val dec = (0 until 50).map(i => AudioCodecs.ulawDecode(((id * 31 + i * 7) % 256).toInt))
      assert(got(id) == ((50L, dec.map(_.toLong).sum)))
    }
  }
}

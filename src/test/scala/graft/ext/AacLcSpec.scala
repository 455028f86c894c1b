package graft.ext

/** AAC-LC codec ([[AacLc]] / [[AacEncoder]] / [[AacTables]]): the
  * normative 13818-7 Huffman tables are offline-unobtainable (see
  * AacTables — unlike MP3's Table B.7 no gateable transcription
  * candidate exists), so every stream here runs against the in-repo
  * canonical books behind `allowNonNormative`, and the DEFAULT decode
  * path must refuse. Covers: canonical Huffman construction
  * (Kraft-exact by real-Huffman construction, codeword round trip),
  * all four window sequences incl. EIGHT_SHORT grouping and
  * START/STOP transitions, sine + KBD shapes, book selection across
  * all 11 spectral books with book-11 escapes, M/S stereo, TNS
  * FIR/all-pole inversion, DPCM scalefactor ripple, and crafted-input
  * robustness.
  */
class AacLcSpec extends graft.SparkSpec {

  private def tone(n: Int, freq: Double, amp: Double = 0.45,
      sr: Int = 44100): Array[Double] =
    Array.tabulate(n)(i => amp * math.sin(2 * math.Pi * freq * i / sr))

  private def psnrs(d: AacLc.Decoded, refs: Array[Array[Double]])
      : Array[Double] = {
    val nCh = d.channels
    Array.tabulate(nCh) { ch =>
      val dec = Array.tabulate(d.samples.length / nCh)(i =>
        d.samples(i * nCh + ch)).drop(1024)
      val (_, _, p) = Mp3Layer3.fitPsnr(refs(ch), dec, 4)
      p
    }
  }

  test("canonical books are Kraft-exact and codewords round trip") {
    val books = AacTables.sfBook +: AacTables.specBooks.drop(1).map(_.book)
    books.foreach { b =>
      assert(b.lengths.map(l => 1L << (32 - l)).sum == (1L << 32))
      // spot-decode a sample of codewords through a bit loop
      val sample = b.lengths.indices.by(math.max(1, b.lengths.length / 50))
      sample.foreach { e =>
        var acc = 0
        var len = 0
        var hit = -1
        val code = b.codes(e)
        val clen = b.lengths(e)
        var i = clen - 1
        while (i >= 0 && hit < 0) {
          acc = (acc << 1) | ((code >>> i) & 1)
          len += 1
          hit = b.lookup(len, acc)
          i -= 1
        }
        assert(hit == e, s"codeword round trip failed for entry $e")
      }
    }
  }

  test("spectral tuple index round trips for every book") {
    AacTables.specBooks.drop(1).foreach { book =>
      (0 until book.entries).by(7).foreach { e =>
        assert(book.entryOf(book.tuple(e)) == e)
      }
    }
  }

  test("default decode REFUSES (non-normative codebooks); opt-in decodes") {
    val x = tone(6 * 1024, 700.0)
    val enc = AacEncoder.encode(Array(x), 44100, Seq.fill(6)(0))
    assert(AacLc.decode(enc).isEmpty, "must refuse without opt-in")
    val d = AacLc.decode(enc, allowNonNormative = true).get
    assert(d.sampleRate == 44100 && d.channels == 1 && d.nFrames == 6)
    assert(d.escUsed, "tone peak should exercise book-11 escapes")
    val p = psnrs(d, Array(x))
    assert(p(0) >= 30.0, s"psnr ${p(0)}")
  }

  test("EIGHT_SHORT with grouping and START/STOP transitions") {
    val plan = Seq(0, 1, 2, 2, 3, 0)
    val x = tone(plan.length * 1024 + 1024, 1250.0)
    val d = AacLc.decode(AacEncoder.encode(Array(x), 48000, plan),
      allowNonNormative = true).get
    assert(d.nFrames == 6 && d.nShortFrames == 2)
    val p = psnrs(d, Array(x))
    assert(p(0) >= 25.0, s"psnr ${p(0)}")
  }

  test("KBD window shape round trips") {
    val x = tone(5 * 1024, 620.0)
    val d = AacLc.decode(
      AacEncoder.encode(Array(x), 44100, Seq.fill(5)(0), kbdShape = true),
      allowNonNormative = true).get
    val p = psnrs(d, Array(x))
    assert(p(0) >= 30.0, s"psnr ${p(0)}")
  }

  test("stereo CPE with M/S keeps channels apart") {
    val l = tone(5 * 1024, 500.0)
    val r = tone(5 * 1024, 950.0, amp = 0.3)
    val d = AacLc.decode(
      AacEncoder.encode(Array(l, r), 44100, Seq.fill(5)(0), msStereo = true),
      allowNonNormative = true).get
    assert(d.channels == 2 && d.msUsed)
    val p = psnrs(d, Array(l, r))
    assert(p(0) >= 28.0 && p(1) >= 28.0, s"psnr ${p.toSeq}")
    val decL = Array.tabulate(d.samples.length / 2)(i =>
      d.samples(2 * i)).drop(1024)
    val (_, _, cross) = Mp3Layer3.fitPsnr(r, decL, 4)
    assert(cross < 10.0, s"channel bleed $cross")
  }

  test("TNS filter inverts exactly through the all-pole decoder") {
    val x = tone(5 * 1024, 700.0)
    val d = AacLc.decode(
      AacEncoder.encode(Array(x), 44100, Seq.fill(5)(0), tnsLength = 12),
      allowNonNormative = true).get
    assert(d.tnsUsed)
    val p = psnrs(d, Array(x))
    assert(p(0) >= 28.0, s"psnr ${p(0)}")
  }

  test("window sequences satisfy overlap power complementarity") {
    // frame k's fall at 1024+n laps frame k+1's rise at n:
    // rise(n)^2 + fall(1024+n)^2 == 1 across the lap, sine and KBD
    for (shape <- Seq(0, 1); n <- 0 until 1024) {
      val rise = AacLc.longSeqWindow(0, shape, shape, n)
      val fall = AacLc.longSeqWindow(0, shape, shape, 1024 + n)
      assert(math.abs(rise * rise + fall * fall - 1.0) < 1e-9,
        s"shape $shape lap $n")
    }
  }

  test("crafted input never throws") {
    val rnd = new scala.util.Random(7)
    (0 until 60).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(3000))(rnd.nextInt(256).toByte)
      AacLc.decode(junk, allowNonNormative = true)
      AacLc.decode(junk)
    }
    val good = AacEncoder.encode(Array(tone(4096, 800.0)), 44100,
      Seq.fill(4)(0))
    (0 until 60).foreach { _ =>
      AacLc.decode(good.take(rnd.nextInt(good.length)),
        allowNonNormative = true)
    }
    (0 until 120).foreach { _ =>
      val flip = good.clone()
      val at = rnd.nextInt(flip.length)
      flip(at) = (flip(at) ^ (1 << rnd.nextInt(8))).toByte
      AacLc.decode(flip, allowNonNormative = true)
    }
  }
}

package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Native raster decode (no codec library): PPM P6 and 24-bit BMP byte
  * parsing + grid-luma features.
  */
class RasterSpec extends AnyFunSuite {

  private def ppm(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px

  test("PPM P6 decode: header with comment, exact pixel bytes") {
    val px = Array.tabulate(2 * 2 * 3)(i => i.toByte)
    val bytes = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++ px
    val r = Multimodal.decodePpm(bytes).get
    assert(r.width == 2 && r.height == 2)
    assert(r.rgb.toSeq == px.toSeq)
  }

  test("BMP 24-bit decode: bottom-up BGR rows with padding → row-major RGB") {
    // 2×2 image; rows padded to 8 bytes (2*3=6 → pad 2)
    val w = 2; val h = 2
    val rowBytes = 8
    val data = new Array[Byte](54 + rowBytes * h)
    data(0) = 'B'; data(1) = 'M'
    def put32(o: Int, v: Int): Unit = {
      data(o) = (v & 0xff).toByte; data(o + 1) = ((v >> 8) & 0xff).toByte
      data(o + 2) = ((v >> 16) & 0xff).toByte; data(o + 3) = ((v >> 24) & 0xff).toByte
    }
    put32(10, 54); put32(14, 40); put32(18, w); put32(22, h)
    data(26) = 1; data(28) = 24 // planes, bpp
    // bottom row first in file: pixels (y=1 in image space)
    // file row 0 = image bottom row: pixel(0,1)=BGR(1,2,3), pixel(1,1)=BGR(4,5,6)
    val px = Array[Byte](1, 2, 3, 4, 5, 6, 0, 0, /* top row */ 7, 8, 9, 10, 11, 12, 0, 0)
    System.arraycopy(px, 0, data, 54, px.length)
    val r = Multimodal.decodeBmp(data).get
    assert(r.width == 2 && r.height == 2)
    // image row 0 (top) = file's last row; BGR→RGB swaps first/third
    assert(r.rgb.slice(0, 6).toSeq == Seq[Byte](9, 8, 7, 12, 11, 10))
    assert(r.rgb.slice(6, 12).toSeq == Seq[Byte](3, 2, 1, 6, 5, 4))
  }

  test("grid-luma features average cells; uniform image is flat") {
    val px = Array.fill(4 * 4 * 3)(51.toByte) // all channels 51 → luma 0.2
    val r = Multimodal.decodePpm(ppm(4, 4, px)).get
    val f = Multimodal.imageFeatures(r, 2)
    assert(f.length == 4)
    f.foreach(v => assert(math.abs(v - 0.2f) < 1e-6f))
  }

  test("decode sniffs magic and rejects garbage") {
    assert(Multimodal.decode("not an image".getBytes).isEmpty)
    assert(Multimodal.decode(ppm(1, 1, Array[Byte](0, 0, 0))).isDefined)
    // truncated PPM rejected
    assert(Multimodal.decodePpm("P6\n4 4\n255\n..".getBytes).isEmpty)
  }

  test("resizeRaster: identity copies, downscale floor-samples, upscale replicates") {
    // 4×2 raster, pixel (x, y) has R = y*4+x (G = B = 0)
    val px = Array.tabulate(4 * 2 * 3)(i => if (i % 3 == 0) (i / 3).toByte else 0.toByte)
    val r = Multimodal.decodePpm(ppm(4, 2, px)).get
    val same = Multimodal.resizeRaster(r, 4, 2)
    assert(same.rgb.toSeq == r.rgb.toSeq)
    // 2×1: (0,0) ← src(0,0)=0, (1,0) ← src(⌊1·4/2⌋=2,0)=2
    val down = Multimodal.resizeRaster(r, 2, 1)
    assert(down.rgb.grouped(3).map(_(0)).toSeq == Seq[Byte](0, 2))
    // 8×2 upscale: each source column repeats twice
    val up = Multimodal.resizeRaster(r, 8, 2)
    assert(up.rgb.grouped(3).map(_(0)).toSeq ==
      Seq[Byte](0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7))
  }

  test("QOI round-trip is lossless across all chunk types") {
    // build a raster exercising RUN (constant rows), DIFF/LUMA (small
    // gradients), INDEX (revisited colors), and RGB (big jumps)
    val w = 32; val h = 16
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val (r, g, b) =
        if (y < 4) (10, 20, 30)                       // RUN territory
        else if (y < 8) (x, x + 1, x + 2)             // DIFF/LUMA gradients
        else if (y < 12) (10 * ((x % 3) + 1), 20, 30) // INDEX revisits
        else ((x * 97) % 256, (x * 31) % 256, (x * 13) % 256) // RGB jumps
      rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = b.toByte
    }
    val in = Multimodal.Raster(w, h, rgb, 255)
    val bytes = Multimodal.qoiPack(in)
    assert(new String(bytes.take(4)) == "qoif")
    val out = Multimodal.decodeQoi(bytes).get
    assert(out.width == w && out.height == h)
    assert(out.rgb.toSeq == in.rgb.toSeq) // bit-exact round trip
    // the generic dispatch also routes QOI
    assert(Multimodal.decode(bytes).get.rgb.toSeq == in.rgb.toSeq)
  }

  test("QOI decode rejects truncated and foreign payloads") {
    assert(Multimodal.decodeQoi("nope".getBytes).isEmpty)
    val good = Multimodal.qoiPack(Multimodal.Raster(4, 4,
      Array.fill(48)(7.toByte), 255))
    assert(Multimodal.decodeQoi(good.take(10)).isEmpty)
    assert(Multimodal.decodeQoi(good).nonEmpty)
  }

  test("PNG round-trips bit-exact through the JDK codec") {
    val in = Multimodal.formulaRaster(7L, 16, 12)
    val bytes = Multimodal.encodePng(in)
    assert(Multimodal.isPng(bytes))
    val out = Multimodal.decode(bytes).get
    assert(out.width == 16 && out.height == 12)
    assert(out.rgb.toSeq == in.rgb.toSeq) // lossless
  }

  test("baseline JPEG decodes within a PSNR band and rejects garbage") {
    val in = Multimodal.formulaRaster(3L, 16, 12)
    val bytes = Multimodal.encodeJpeg(in, quality = 0.9f)
    assert(Multimodal.isJpeg(bytes))
    val out = Multimodal.decode(bytes).get
    assert(out.width == 16 && out.height == 12)
    var se = 0.0
    for (i <- in.rgb.indices) {
      val d = (out.rgb(i) & 0xff) - (in.rgb(i) & 0xff)
      se += d.toDouble * d
    }
    val psnr = 10.0 * math.log10(255.0 * 255.0 / (se / in.rgb.length))
    assert(psnr >= 20.0, s"JPEG decode PSNR $psnr below band")
    // truncated payload must not crash, just yield None
    assert(Multimodal.decodeImageIo(bytes.take(20)).isEmpty)
    assert(Multimodal.decodeImageIo("not an image".getBytes).isEmpty)
  }
}

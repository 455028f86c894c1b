package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ImageDedupSpec extends AnyFunSuite with SparkSpec {

  private def ppm(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px

  private def gray(w: Int, h: Int)(f: Int => Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => (f(i / 3) & 0xff).toByte)

  test("dHash: identical rasters hash equal; a local brightness edit flips few bits") {
    val base = gray(18, 16)(i => (i * 7) % 256)
    val h1 = Multimodal.dHash(Multimodal.decode(ppm(18, 16, base)).get)
    val h2 = Multimodal.dHash(Multimodal.decode(ppm(18, 16, base.clone())).get)
    assert(h1 == h2)
    // brighten one 2×2 corner patch: a LOCAL edit moves few grid compares
    val edited = base.clone()
    for (y <- 0 until 2; x <- 0 until 2; c <- 0 until 3)
      edited((y * 18 + x) * 3 + c) = 255.toByte
    val h3 = Multimodal.dHash(Multimodal.decode(ppm(18, 16, edited)).get)
    val ham = java.lang.Long.bitCount(h1 ^ h3)
    assert(ham > 0 && ham <= 6, s"local edit should flip few bits, got $ham")
  }

  test("dHash downscale: a 2x-upscaled image hashes identically") {
    val small = gray(9, 8)(i => (i * 13 + 5) % 256)
    val hSmall = Multimodal.dHash(Multimodal.decode(ppm(9, 8, small)).get)
    // nearest-neighbor 2x upscale: every pixel duplicated 2×2
    val big = Array.tabulate(18 * 16 * 3) { j =>
      val p = j / 3; val c = j % 3
      val (y, x) = (p / 18, p % 18)
      small(((y / 2) * 9 + (x / 2)) * 3 + c)
    }
    val hBig = Multimodal.dHash(Multimodal.decode(ppm(18, 16, big)).get)
    assert(hSmall == hBig)
  }

  test("imageNearDups: banded join finds exactly the brute-force pairs") {
    import spark.implicits._
    // 40 images: 4 clusters of 10 tiny variants each — variants differ by
    // one patch, clusters differ wholesale
    val imgs = (0 until 40).map { id =>
      val cluster = id % 4
      val px = gray(9, 8) { i =>
        val base = (cluster * 61 + i * i * 13) % 256
        if (i == 40 + (id / 4)) (base + 120) % 256 else base // per-variant patch
      }
      (id.toLong, ppm(9, 8, px))
    }
    val df = imgs.toDF("id", "media")
    val got = Multimodal.imageNearDups(df, "id", "media", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same hashes
    val hs = imgs.map { case (id, bytes) =>
      id -> Multimodal.dHash(Multimodal.decode(bytes).get)
    }
    val want = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(want.nonEmpty, "fixture should produce at least one near-dup pair")
    assert(got == want)
  }

  test("imageNearDups drops undecodable payloads instead of failing") {
    import spark.implicits._
    val df = Seq(
      (1L, ppm(9, 8, gray(9, 8)(i => i % 256))),
      (2L, ppm(9, 8, gray(9, 8)(i => i % 256))),
      (3L, "not an image".getBytes)
    ).toDF("id", "media")
    val got = Multimodal.imageNearDups(df, "id", "media", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)))
  }
}

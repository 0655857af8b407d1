package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._
  private implicit def s = spark

  private def encode(format: String, pix: Array[Array[Int]]): Array[Byte] = {
    val h = pix.length; val w = pix(0).length
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(y)(x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, format, bos))
    bos.toByteArray
  }

  // horizontal gradient, luma strictly DECREASING left→right: every
  // adjacent-pixel comparison fires, so the hash is all-ones (bits care
  // about horizontal structure, which a vertical gradient lacks entirely)
  private def gradient(shift: Int): Array[Array[Int]] =
    Array.tabulate(32, 32) { (y, x) =>
      val v = 200 - x * 6 + shift
      (v << 16) | (v << 8) | v
    }
  // vertical gradient: rows constant → zero horizontal differences
  private val vertical: Array[Array[Int]] =
    Array.tabulate(32, 32) { (y, x) =>
      val v = 200 - y * 6
      (v << 16) | (v << 8) | v
    }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) =
    rows.map { case (id, b) => (id, "image", "spec", b) }
      .toDF("media_id", "media_type", "source", "content")

  test("dHash: re-encoding and brightness shifts hash identically; orientation does not") {
    val df = mediaDf(Seq(
      1L -> encode("png", gradient(0)),
      2L -> encode("bmp", gradient(0)),   // same pixels, different container
      3L -> encode("png", gradient(10)),  // +10 brightness everywhere
      4L -> encode("png", vertical)))     // transposed structure
    val h = Multimodal.perceptualHash(df).collect()
      .map(r => r.media_id -> r.p_hash).toMap
    assert(h(1L) == h(2L), "container change must not change the hash")
    assert(h(1L) == h(3L), "uniform brightness shift must not change the hash")
    assert(java.lang.Long.bitCount(h(1L) ^ h(4L)) > 10,
      s"orientation flip should be far: ${java.lang.Long.bitCount(h(1L) ^ h(4L))} bits")
  }

  test("undecodable payloads fall back to exact byte hash with decodable=false") {
    val junk = Array[Byte](1, 2, 3, 4, 5)
    val got = Multimodal.perceptualHash(mediaDf(Seq(9L -> junk))).collect()(0)
    assert(!got.decodable)
    assert(got.p_hash == graft.functions.Hashing.fnv1a64(junk, 0, junk.length))
  }

  test("nearDupImagePairs: finds re-encodes and shifts, excludes different structure") {
    val df = mediaDf(Seq(
      1L -> encode("png", gradient(0)),
      2L -> encode("bmp", gradient(0)),
      3L -> encode("png", gradient(10)),
      4L -> encode("png", vertical),
      9L -> Array[Byte](1, 2, 3))) // undecodable — must not appear
    val hashes = Multimodal.perceptualHash(df).toDF()
    val pairs = Multimodal.nearDupImagePairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("gradient planting: PNG round-trip reproduces the planted dHash exactly") {
    // the mm_neardup oracle's whole premise: dHash64(decode(encodeGradientPng(h))) == h
    for (id <- Seq(0L, 1L, 9L, 10L, 137L, 4999L, 123456789L)) {
      val want = Multimodal.plantedDHash(id)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodeGradientPng(want)))
      assert(Multimodal.dHash64(img) === want, s"id $id")
    }
    // cluster structure: member m differs from head in exactly bit m-1
    for (m <- 1 to 9) {
      val d = Multimodal.plantedDHash(20L) ^ Multimodal.plantedDHash(20L + m)
      assert(d === (1L << (m - 1)), s"member $m")
    }
  }

  test("degenerate corpus: 500 identical flat images stay capped AND fully clustered") {
    val flat = Multimodal.perceptualHash(mediaDf(
      (1L to 500L).map(i => i -> encode("png", Array.tabulate(8, 8)((_, _) => 0x808080)))
    )).toDF()
    val pairs = Multimodal.nearDupImagePairs(flat, maxHamming = 0, maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // spanning star: every member reachable from the min id; bounded size
    assert(pairs.length < 5000, s"cap failed: ${pairs.length} pairs")
    val reachable = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(reachable == (1L to 500L).toSet, "cap must not orphan any member")
  }

  test("dctPhash: separable fast path equals a naive 4-loop DCT; planted luma round-trips") {
    val docs = Seq((3L, "s"), (17L, "s")).toDF("doc_id", "source")
    val media = Multimodal.phashMedia(docs).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("content")).toMap
    for (id <- Seq(3L, 17L)) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media(id)))
      val a = 1 + (id % 7).toInt; val b = 1 + (id % 5).toInt; val c = (id % 256).toInt
      // planted closed form survives the PNG round-trip pixel-exactly
      for (x <- 0 until 32; y <- 0 until 32)
        assert(((img.getRGB(x, y) >> 16) & 0xff) == (a * x + b * y + c) % 256, s"id $id ($x,$y)")
    }
    val out = Multimodal.dctPhash(Multimodal.phashMedia(docs)).collect()
      .map(h => h.media_id -> h).toMap
    // independent naive DCT for id 3: direct quadruple sum + median + bits
    val id = 3L
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media(id)))
    def lum(x: Int, y: Int): Long = (img.getRGB(x, y) >> 16) & 0xff
    val f = Array.tabulate(8, 8) { (u, v) =>
      (for (x <- 0 until 32; y <- 0 until 32)
        yield Multimodal.dctCos(u)(x) * Multimodal.dctCos(v)(y) * lum(x, y)).sum
    }
    val ac = (for (u <- 0 until 8; v <- 0 until 8 if (u, v) != ((0, 0))) yield f(u)(v)).sorted
    val med = ac(31)
    var want = 0L
    for (u <- 0 until 8; v <- 0 until 8) if (f(u)(v) > med) want |= 1L << (u * 8 + v)
    assert(out(id).phash64 == want)
    assert(out(id).dc_coeff == f(0)(0) && out(id).median_ac == med)
  }

  test("dctPhash: wrap-free brightness offset flips at most the DC bit; odd sizes drop") {
    // two 32×32 images whose lumas differ by EXACTLY +40 everywhere
    // (no mod wrap): every AC coefficient is identical, so only the DC
    // bit may differ — the invariance that makes pHash a perceptual
    // (not exact) fingerprint
    def grid(off: Int) = Array.tabulate(32, 32) { (y, x) =>
      val v = (3 * x + 2 * y) % 200 + off
      (v << 16) | (v << 8) | v
    }
    val out = Multimodal.dctPhash(mediaDf(Seq(
      1L -> encode("png", grid(0)), 2L -> encode("png", grid(40))))).collect()
      .map(h => h.media_id -> h).toMap
    assert(((out(1L).phash64 ^ out(2L).phash64) & ~1L) == 0L)
    assert(out(1L).median_ac == out(2L).median_ac)
    assert(out(1L).dc_coeff < out(2L).dc_coeff)
    // a non-32×32 image is dropped, not mis-hashed
    val odd = mediaDf(Seq(9L -> encode("png", Array.tabulate(8, 8)((_, _) => 0x404040))))
    assert(Multimodal.dctPhash(odd).collect().isEmpty)
  }
}

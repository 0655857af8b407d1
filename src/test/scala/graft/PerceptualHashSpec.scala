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
}

package graft.ext

import org.apache.spark.sql.functions._

/** Real-codec multimodal decode: every payload here is the output of an
  * actual JDK encoder (ImageIO / AudioSystem), and every assertion checks
  * DECODED pixel/sample values — a header-only or stubbed decoder cannot
  * pass these. (Lives in graft.ext to reach the package-private encode
  * helpers.)
  */
class MultimodalCodecSpec extends graft.SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  private def mediaDf(rows: Seq[(Long, String, Array[Byte])]) =
    rows.map { case (id, t, b) => (id, t, "t", b) }
      .toDF("media_id", "media_type", "source", "content")

  test("image decode: png/bmp round-trip recovers dims and exact pixel sums") {
    val png = Multimodal.encodeImage("png", 17, 9, 10, 20, 30)
    val bmp = Multimodal.encodeImage("bmp", 5, 7, 200, 100, 50)
    val dec = Multimodal.decode(mediaDf(Seq(
      (1L, "image/png", png), (2L, "image/bmp", bmp))))
      .collect().map(d => d.media_id -> d).toMap
    assert(dec(1L).format == "png" && dec(1L).width == 17 && dec(1L).height == 9)
    assert(dec(1L).n_samples == 17L * 9)
    assert(dec(1L).content_sum == 17L * 9 * (10 + 20 + 30))
    assert(dec(2L).format == "bmp" && dec(2L).width == 5 && dec(2L).height == 7)
    assert(dec(2L).content_sum == 5L * 7 * (200 + 100 + 50))
  }

  test("image decode: jpeg/gif real encoder output recovers true dimensions") {
    // jpeg is lossy and gif palettizes — dims are exact, pixel sums aren't
    val jpg = Multimodal.encodeImage("jpg", 33, 21, 128, 128, 128)
    val gif = Multimodal.encodeImage("gif", 12, 18, 0, 255, 0)
    val dec = Multimodal.decode(mediaDf(Seq(
      (1L, "image/jpeg", jpg), (2L, "image/gif", gif))))
      .collect().map(d => d.media_id -> d).toMap
    assert(dec(1L).format == "jpeg" && dec(1L).width == 33 && dec(1L).height == 21)
    assert(dec(1L).content_sum >= 0, "jpeg must actually decode")
    assert(dec(2L).format == "gif" && dec(2L).width == 12 && dec(2L).height == 18)
    // constant green survives gif's palette exactly
    assert(dec(2L).content_sum == 12L * 18 * 255)
    // header parsing agrees with the codec on REAL encoder output
    val meta = Multimodal.extractMeta(mediaDf(Seq(
      (1L, "image/jpeg", jpg), (2L, "image/gif", gif))))
      .collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).width == 33 && meta(1L).height == 21)
    assert(meta(2L).width == 12 && meta(2L).height == 18)
  }

  test("pcmWavBytes is byte-identical to AudioSystem's WAVE output") {
    // the hand-rolled RIFF writer exists to dodge AudioSystem's
    // synchronized provider registry (a lock convoy under 32 concurrent
    // encode tasks) — it must stay indistinguishable from the real
    // encoder's bytes, or the "every payload is a genuine encoder's
    // output" contract breaks
    def viaAudioSystem(rate: Int, data: Array[Byte], frames: Long): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    for (rate <- Seq(8000, 10000, 16000); n <- Seq(0, 1, 64, 3200)) {
      val data = Array.tabulate(n * 2)(i => ((i * 37 + rate) % 251 - 125).toByte)
      assert(java.util.Arrays.equals(
        Multimodal.pcmWavBytes(rate, data), viaAudioSystem(rate, data, n.toLong)),
        s"mismatch at rate=$rate frames=$n")
    }
  }

  test("audio decode: wav round-trip recovers rate, frames and exact sample sum") {
    val wav = Multimodal.encodeWav(16000, 250, -123)
    val dec = Multimodal.decode(mediaDf(Seq((1L, "audio/wav", wav)))).collect().head
    assert(dec.format == "wav" && dec.sample_rate == 16000)
    assert(dec.n_samples == 250L)
    assert(dec.content_sum == 250L * -123)
    val meta = Multimodal.extractMeta(mediaDf(Seq((1L, "audio/wav", wav)))).collect().head
    assert(meta.sample_rate == 16000)
  }

  test("jpeg header scan: 0xFF fill bytes skipped, stops at SOS/EOI") {
    // synthetic marker stream: SOI, fill bytes, then SOF0 with dims 640x480
    val h = 480; val w = 640
    val withPadding = Array[Int](
      0xFF, 0xD8, // SOI
      0xFF, 0xFF, 0xFF, // fill bytes before the marker
      0xC0, 0x00, 0x0B, 0x08, h >> 8, h & 0xff, w >> 8, w & 0xff, 0x01, 0x00, 0x00,
      0xFF, 0xD9).map(_.toByte)
    assert(Multimodal.parseHeader(withPadding).contains((640, 480, 0)))
    // SOS before any SOF terminates the scan (no bogus dims from entropy data)
    val sosFirst = Array[Int](
      0xFF, 0xD8,
      0xFF, 0xDA, 0x00, 0x04, 0x01, 0x00, // SOS, then entropy-coded garbage
      0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 0x10, 0x00, 0x10, 0x01, 0x00, 0x00).map(_.toByte)
    assert(Multimodal.parseHeader(sosFirst).isEmpty)
  }

  test("real resize: nearest-neighbor resample hits target dims, keeps constant color") {
    val src = Multimodal.encodeImage("png", 16, 12, 40, 80, 120)
    val out = Multimodal.resize(mediaDf(Seq((1L, "image/png", src))), 8, 8).collect().head
    assert(out.target_w == 8 && out.target_h == 8)
    val dec = Multimodal.decode(mediaDf(Seq((1L, "image/png", out.content)))).collect().head
    assert(dec.width == 8 && dec.height == 8)
    assert(dec.content_sum == 8L * 8 * (40 + 80 + 120), "constant color must survive resize")
  }

  test("syntheticMedia round-trips through decode to the planted integer formulas") {
    val docs = (0L until 30L).map(id => (id, s"doc $id", "src0")).toDF("doc_id", "text", "source")
    val dec = Multimodal.decode(Multimodal.syntheticMedia(docs))
      .collect().map(d => d.media_id -> d).toMap
    (0L until 30L).foreach { id =>
      val d = dec(id)
      if (id % 3 == 1) {
        assert(d.format == "wav")
        assert(d.sample_rate == 8000 + (id % 5).toInt * 2000)
        assert(d.n_samples == 64 + id % 64)
        assert(d.content_sum == (64 + id % 64) * (id % 2000 - 1000))
      } else {
        assert(d.format == (if (id % 3 == 0) "png" else "bmp"))
        val w = 8 + (id % 17).toInt; val hh = 8 + (id % 13).toInt
        assert(d.width == w && d.height == hh)
        assert(d.content_sum ==
          w.toLong * hh * ((id % 256) + (id * 7 % 256) + (id * 13 % 256)))
      }
    }
  }

  test("frameSample: md5 hashes match local computation; empty payload emits no frames") {
    val content = ("x" * 150).getBytes("UTF-8")
    val media = Seq((1L, "bin", "t", content), (2L, "bin", "t", Array.emptyByteArray))
      .toDF("media_id", "media_type", "source", "content")
    val frames = Multimodal.frameSample(media, 64, 8).collect()
    assert(frames.forall(_.getLong(0) == 1L), "empty payload must emit no frames")
    assert(frames.length == 3) // ceil(150/64) = 3
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect0 = md.digest(content.slice(0, 64)).map("%02x".format(_)).mkString
    assert(frames.find(_.getInt(1) == 0).get.getString(3) == expect0)
    assert(frames.find(_.getInt(1) == 2).get.getInt(2) == 150 - 128)
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: media as opaque
  * `binary` columns + typed metadata, with decode/feature steps running
  * per-partition (the Scala analogue of a pandas-batch UDF: each partition
  * is processed as one iterator, amortizing decoder init across rows).
  *
  * Decode is REAL where the JDK ships a codec: `javax.imageio.ImageIO`
  * (png/jpeg/gif/bmp — true dimensions + actual pixel values) and
  * `javax.sound.sampled.AudioSystem` (wav — true sample rate/frames +
  * actual PCM samples). Container-header metadata (PNG IHDR, JPEG SOF,
  * GIF, BMP, WAV fmt) is additionally parsed directly from the bytes with
  * zero codec involvement — the cheap path when only dimensions are
  * needed. Only genuinely unrecognized payloads fall back to a
  * deterministic stub (clearly marked with `content_sum = -1`).
  */
object Multimodal {

  /** One media row: opaque bytes + routing metadata. */
  case class MediaRecord(media_id: Long, media_type: String,
                         source: String, content: Array[Byte])

  /** Extracted metadata (header-parse path — no pixel/sample decode). */
  case class MediaMeta(media_id: Long, media_type: String, n_bytes: Long,
                       format: String, width: Int, height: Int,
                       sample_rate: Int)

  /** Fully decoded media: real dimensions/rates plus content checksums
    * computed from the DECODED pixels/samples (not the container bytes) —
    * `n_samples` is pixels (w×h) for images / frames for audio, and
    * `content_sum` is Σ(r+g+b) over pixels / Σ(sample values) for audio.
    * Undecodable payloads keep stub dimensions and content_sum = -1.
    */
  case class DecodedMedia(media_id: Long, format: String, width: Int,
                          height: Int, sample_rate: Int, n_samples: Long,
                          content_sum: Long)

  /** Build a media table from the documents fixture: text bytes standing in
    * for an opaque payload (the plumbing doesn't care what the bytes are).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    // Par.fanOut: every mm_* consumer runs per-row encode/decode closures
    // over this frame — CPU-bound work that must not inherit a sub-split
    // file's single scan partition (no-op at natural parallelism)
    Par.fanOut(docs).select(
      col("doc_id").as("media_id"),
      lit("application/octet-stream").as("media_type"),
      col("source"),
      col("text").cast(BinaryType).as("content"))

  /** Deterministic REAL media planted from doc ids — every payload is a
    * genuine encoder's output (JDK ImageIO png/bmp, AudioSystem wav), with
    * dimensions/rates/contents that are pure integer functions of the id.
    * Round-tripping these through [[decode]] proves the decoder is real,
    * and an external oracle can recompute every decoded value from the id
    * alone: kind = id%3 (0 png, 1 wav, 2 bmp); images are (8+id%17) ×
    * (8+id%13) filled with constant rgb(id%256, id*7%256, id*13%256); wav
    * is 16-bit mono at 8000+(id%5)*2000 Hz, 64+id%64 frames of constant
    * sample value id%2000-1000.
    */
  def syntheticMedia(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // fanOut: the per-row ImageIO/AudioSystem encoders below are the CPU
    Par.fanOut(docs).select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, source) =>
          val bytes = (id % 3) match {
            case 1 => encodeWav(8000 + (id % 5).toInt * 2000,
              64 + (id % 64).toInt, (id % 2000 - 1000).toInt)
            case k => encodeImage(if (k == 0) "png" else "bmp",
              8 + (id % 17).toInt, 8 + (id % 13).toInt,
              (id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt)
          }
          MediaRecord(id, if (id % 3 == 1) "audio/wav" else "image", source, bytes)
        }
      }.toDF()
  }

  /** Deterministic GRADIENT images whose dHash is a closed-form function
    * of the id — the non-degenerate twin of [[syntheticMedia]] (whose
    * flat images all dHash to 0). The 9×8 pixel grid is constructed so
    * that [[dHash64]] equals exactly
    * `h(id) = md5_64(id/10)  XOR  (id%10 > 0 ? 1 << (id%10 - 1) : 0)`:
    * each ten-doc cluster shares a head hash and every member differs
    * from the head in exactly one bit (Hamming 1). An external oracle can
    * therefore recompute the FULL near-dup pair set from doc_id alone,
    * which hash-gates the banding recall, the bucket cap, the real PNG
    * round-trip, and the dHash math at once.
    */
  def gradientMedia(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // fanOut: per-row PNG encode is the CPU (see syntheticMedia)
    Par.fanOut(docs).select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, source) =>
          MediaRecord(id, "image", source, encodeGradientPng(plantedDHash(id)))
        }
      }.toDF()
  }

  /** The closed-form hash [[gradientMedia]] plants (mirrored by the
    * DuckDB oracle): unsigned 64-bit parse of the first 16 md5 hex chars
    * of the cluster id, one member bit flipped.
    */
  /** Per-thread MD5 instance: `MessageDigest.getInstance` funnels every
    * call through the synchronized JCA provider lookup, which turned the
    * fanned-out per-row generators into a lock convoy (r12 ProbeJobs:
    * ~32 s of task time for ~2 s of CPU across 32 tasks). digest()
    * resets the instance, so per-thread reuse is safe.
    */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[graft] def plantedDHash(id: Long): Long = {
    val hex = md5Local.get()
      .digest((id / 10).toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    val base = java.lang.Long.parseUnsignedLong(hex.substring(0, 16), 16)
    val m = (id % 10).toInt
    if (m > 0) base ^ (1L << (m - 1)) else base
  }

  /** 9×8 grayscale PNG whose dHash64 is exactly `h`: at grid size the
    * downscale sampling is the identity, and per row the pixel value
    * steps up by 1 leftward exactly where the corresponding hash bit is
    * set (bit (y·8+x) ⇔ luma(x,y) > luma(x+1,y)).
    */
  private[graft] def encodeGradientPng(h: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      val v = new Array[Int](9)
      v(8) = 128
      var x = 7
      while (x >= 0) {
        v(x) = v(x + 1) + (((h >>> (y * 8 + x)) & 1L)).toInt
        x -= 1
      }
      var xx = 0
      while (xx < 9) {
        val p = v(xx)
        img.setRGB(xx, y, (p << 16) | (p << 8) | p)
        xx += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, "png", bos), "no ImageIO writer for png")
    bos.toByteArray
  }

  private[ext] def encodeImage(format: String, w: Int, h: Int,
                               r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, format, bos), s"no ImageIO writer for $format")
    bos.toByteArray
  }

  /** Canonical RIFF/WAVE container for 16-bit signed little-endian mono
    * PCM — BYTE-IDENTICAL to what `AudioSystem.write(..., WAVE, out)`
    * produces for this format (MultimodalSpec asserts it), but without
    * going through AudioSystem: its per-call file-writer provider lookup
    * synchronizes on the JVM-global IIO/sound registry, which turned the
    * fanned-out media generators into a lock convoy (r12 ProbeJobs:
    * 71 s of task time, 3.7 s of CPU, 32 tasks blocked on the registry).
    */
  private[ext] def pcmWavBytes(rate: Int, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](44 + data.length)
    def ascii(off: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    ascii(0, "RIFF"); le32(4, 36 + data.length); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16); le16(20, 1) // PCM
    le16(22, 1) // mono
    le32(24, rate); le32(28, rate * 2) // byte rate = rate * blockAlign
    le16(32, 2); le16(34, 16) // blockAlign, bits
    ascii(36, "data"); le32(40, data.length)
    System.arraycopy(data, 0, out, 44, data.length)
    out
  }

  private[ext] def encodeWav(rate: Int, nFrames: Int, value: Int): Array[Byte] = {
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      data(2 * i) = (value & 0xff).toByte
      data(2 * i + 1) = ((value >> 8) & 0xff).toByte
      i += 1
    }
    pcmWavBytes(rate, data)
  }

  /** Speech-pattern WAVs whose active blocks are a closed-form function
    * of the id — [[gradientMedia]]'s plant-and-replay idea applied to
    * audio. Each clip is 8 blocks × 400 frames of 16-bit mono PCM at
    * 8 kHz (50 ms blocks); block b carries a ±6000 square wave ("speech")
    * iff bit b of md5_64(doc_id) is set, else digital silence. An
    * external oracle recomputes per-window energies, the speech ratio
    * and the segment count from doc_id alone, which hash-gates the REAL
    * encode → container-parse → PCM-windowing pipeline end to end.
    */
  def vadMedia(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // fanOut: per-row WAV encode is the CPU (see syntheticMedia)
    Par.fanOut(docs).select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, source) =>
          MediaRecord(id, "audio/wav", source, encodeVadWav(id))
        }
      }.toDF()
  }

  /** The 8 planted speech bits for [[vadMedia]]: the LOW byte of the
    * unsigned 64-bit parse of md5(doc_id)'s first 16 hex chars — the
    * DuckDB mirror is `CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
    * 15, 2) AS BIGINT)` (hex chars 15–16 ARE bits 0..7 of that value).
    */
  private[graft] def vadBits(id: Long): Int = {
    val hex = md5Local.get()
      .digest(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    (java.lang.Long.parseUnsignedLong(hex.substring(0, 16), 16) & 0xffL).toInt
  }

  private[ext] def encodeVadWav(id: Long): Array[Byte] = {
    val bits = vadBits(id)
    val data = new Array[Byte](8 * 400 * 2)
    var b = 0
    while (b < 8) {
      if (((bits >> b) & 1) == 1) {
        var i = 0
        while (i < 400) {
          val v = if (i % 2 == 0) 6000 else -6000
          val off = (b * 400 + i) * 2
          data(off) = (v & 0xff).toByte
          data(off + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
      }
      b += 1
    }
    pcmWavBytes(8000, data) // byte-identical to the AudioSystem path
  }

  /** One fixed-length energy window of decoded PCM. `sum_abs` feeds the
    * VAD threshold, `sum_sq` the RMS loudness (v² ≤ 3.6e7 per 16-bit
    * sample → ~1.4e10 per 400-sample window: no wrap).
    */
  case class AudioWindow(media_id: Long, win_idx: Long, n_frames: Long,
                         sum_abs: Long, sum_sq: Long, n_zc: Long, alt_sum: Long)

  /** Window decoded 16-bit mono PCM into `windowFrames`-sample energy
    * windows (media_id, win_idx, n_frames, Σ|sample|) — the feature
    * extraction under energy-threshold voice-activity detection. Real
    * AudioSystem parse per clip, per-partition iterator processing like
    * [[decode]]; clips the codec can't parse contribute no windows.
    */
  def audioWindows(media: DataFrame, windowFrames: Int)
                  (implicit spark: SparkSession): Dataset[AudioWindow] = {
    import spark.implicits._
    require(windowFrames > 0, "windowFrames must be positive")
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodePcm(bytes) match {
          case Some(samples) =>
            samples.grouped(windowFrames).zipWithIndex.map { case (w, i) =>
              var s = 0L
              var q = 0L
              var zc = 0L
              var alt = 0L
              var k = 0
              while (k < w.length) {
                val v = w(k).toLong
                s += math.abs(v)
                q += v * v
                // strict sign flip (v·v' < 0): zeros never count, so
                // silence contributes no crossings
                if (k > 0 && v * w(k - 1).toLong < 0) zc += 1
                // Goertzel at the Nyquist bin (f = fs/2): X = Σ(−1)^k·v —
                // the single-bin DFT energy of a period-2 alternation
                alt += (if ((k & 1) == 0) v else -v)
                k += 1
              }
              AudioWindow(id, i.toLong, w.length.toLong, s, q, zc, alt)
            }
          case None => Iterator.empty
        }
      }
  }

  /** The JRE's audio file readers (wav/aiff/au), resolved ONCE: these are
    * the exact providers `AudioSystem.getAudioInputStream` iterates, but
    * that entry point re-walks the synchronized provider registry PER
    * CALL — under 32 concurrent decode tasks the registry lock was a
    * convoy (r12 ProbeJobs: ~35 s of task time for ~2.5 s of CPU on
    * every audio query). The reader instances are stateless parsers.
    */
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    // WAV first, the MIDI prober LAST: SoftMidiAudioFileReader's accept
    // check itself walks the synchronized MIDI provider registry per call
    // (jstack r12: every task blocked in JSSecurityManager.getProviders),
    // so it must only run for bytes no real audio reader accepted —
    // which, with WAVE payloads, is never
    b.result().sortBy(r => (!r.getClass.getSimpleName.contains("Wave"),
      r.getClass.getSimpleName.contains("Midi")))
  }

  /** Registry-free AudioSystem.getAudioInputStream: first accepting
    * reader wins (same semantics — every reader rejects foreign bytes
    * with UnsupportedAudioFileException).
    */
  private[ext] def openAudio(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val in = new java.io.ByteArrayInputStream(bytes)
    audioReaders.foreach { r =>
      try return r.getAudioInputStream(in)
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => in.reset()
      }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no reader accepted the stream")
  }

  /** REAL PCM extraction via the JRE audio readers: the decoded 16-bit
    * mono sample array, or None when no reader accepts the bytes.
    */
  private[ext] def decodePcm(bytes: Array[Byte]): Option[Array[Short]] =
    try {
      val ais = openAudio(bytes)
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1) {
        val data = ais.readAllBytes()
        val out = new Array[Short](data.length / 2)
        var i = 0
        while (i + 1 < data.length) {
          out(i / 2) =
            if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
            else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
          i += 2
        }
        Some(out)
      } else None
    } catch { case _: Exception => None }

  /** Container-format sniff from magic bytes — real logic (PNG/JPEG/RIFF/
    * PDF/GZIP), pure Column expression.
    */
  def sniffFormat(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val magic8 = upper(hex(substring(content, 1, 4)))
    when(magic8.startsWith("89504E47"), "png")
      .when(magic8.startsWith("FFD8"), "jpeg")
      .when(magic8.startsWith("52494646") &&
        upper(hex(substring(content, 9, 4))) === "57415645", "wav")
      .when(magic8.startsWith("52494646"), "riff")
      .when(magic8.startsWith("47494638"), "gif")
      .when(magic8.startsWith("424D"), "bmp")
      .when(magic8.startsWith("25504446"), "pdf")
      .when(magic8.startsWith("1F8B"), "gzip")
      .otherwise("bin")
  }

  /** REAL image decode via the JDK's ImageIO (png/jpeg/gif/bmp readers ship
    * with the JRE): (width, height, Σ(r+g+b) over all pixels). None when no
    * reader accepts the bytes.
    */
  private[ext] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        var s = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some((img.getWidth, img.getHeight, s))
      }
    } catch { case _: Exception => None }

  /** REAL audio decode via javax.sound.sampled (wav/aiff/au readers ship
    * with the JRE): (sampleRate, frames, Σ samples) for 16-bit PCM; frame
    * count only for other encodings. None when no reader accepts the bytes.
    */
  private[ext] def decodeAudio(bytes: Array[Byte]): Option[(Int, Long, Long)] =
    try {
      val ais = openAudio(bytes) // registry-free, see audioReaders
      val fmt = ais.getFormat
      val frames = ais.getFrameLength
      val sum =
        if (fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1) {
          val data = ais.readAllBytes()
          var s = 0L
          var i = 0
          while (i + 1 < data.length) {
            val v =
              if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
              else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
            s += v
            i += 2
          }
          s
        } else 0L
      Some((fmt.getSampleRate.toInt, frames, sum))
    } catch { case _: Exception => None }

  /** Deterministic STUB for unrecognized payloads only: fake dimensions
    * from a content hash, content_sum = -1 marks "not decoded".
    */
  private[ext] def decodeStub(content: Array[Byte]): (Int, Int, Int) = {
    val h = graft.functions.Hashing.fnv1a64(content, 0, content.length)
    val width = 64 + (Math.floorMod(h, 1024L)).toInt
    val height = 64 + (Math.floorMod(h >>> 20, 1024L)).toInt
    val sampleRate = 8000 + (Math.floorMod(h >>> 40, 5L) * 8000).toInt
    (width, height, sampleRate)
  }

  /** Full pixel/sample DECODE: per-partition batch processing with the
    * real JDK codecs (decoder/reader instances initialize once per
    * partition via ImageIO's registry). Images → true dims + pixel sum;
    * audio → true rate/frames + sample sum; anything else → stub dims
    * with content_sum = -1.
    */
  def decode(media: DataFrame)(implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select("media_id", "media_type", "source", "content").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val bytes = if (rec.content == null) Array.emptyByteArray else rec.content
          val fmt = sniffName(bytes)
          fmt match {
            case "png" | "jpeg" | "gif" | "bmp" =>
              decodeImage(bytes) match {
                case Some((w, h, sum)) =>
                  DecodedMedia(rec.media_id, fmt, w, h, 0, w.toLong * h, sum)
                case None =>
                  val (w, h, _) = decodeStub(bytes)
                  DecodedMedia(rec.media_id, fmt, w, h, 0, 0L, -1L)
              }
            case "wav" =>
              decodeAudio(bytes) match {
                case Some((rate, frames, sum)) =>
                  DecodedMedia(rec.media_id, fmt, 0, 0, rate, frames, sum)
                case None =>
                  val (_, _, sr) = decodeStub(bytes)
                  DecodedMedia(rec.media_id, fmt, 0, 0, sr, 0L, -1L)
              }
            case other =>
              val (w, h, _) = decodeStub(bytes)
              DecodedMedia(rec.media_id, other, w, h, 0, 0L, -1L)
          }
        }
      }
  }

  /** Decode/feature-extract metadata WITHOUT touching pixel data: container
    * headers (PNG IHDR, JPEG SOF, GIF, BMP, WAV fmt) parsed directly from
    * the bytes. The cheap path when only dimensions/rates are needed — at
    * 100 TB you never run a full decoder to learn a width. Unrecognized
    * payloads get stub values.
    */
  def extractMeta(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("media_id", "media_type", "source", "content").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val bytes = if (rec.content == null) Array.emptyByteArray else rec.content
          val (w, h, sr) = parseHeader(bytes).getOrElse(decodeStub(bytes))
          MediaMeta(rec.media_id, rec.media_type, bytes.length.toLong,
            sniffName(bytes), w, h, sr)
        }
      }
  }

  /** JVM-side magic sniff (same table as sniffFormat, for the typed path). */
  private[ext] def sniffName(b: Array[Byte]): String =
    if (b.length >= 4 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) "jpeg"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') "riff"
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 4 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F') "pdf"
    else if (b.length >= 2 && b(0) == 0x1F.toByte && b(1) == 0x8B.toByte) "gzip"
    else "bin"

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** REAL container-header parsing — (width, height, sampleRate) from the
    * actual bytes, zero codecs: PNG IHDR (big-endian dims at offset 16),
    * JPEG SOFn marker scan, GIF logical screen descriptor, BMP info
    * header, WAV fmt chunk scan. Returns None for unrecognized payloads.
    */
  private[ext] def parseHeader(b: Array[Byte]): Option[(Int, Int, Int)] =
    sniffName(b) match {
      case "png" if b.length >= 24 =>
        Some((be32(b, 16), be32(b, 20), 0))
      case "jpeg" =>
        // scan markers for SOF0/1/2 (baseline/extended/progressive):
        // [FF Cn][len 2B][precision 1B][height 2B][width 2B].
        // 0xFF bytes may be repeated as fill/padding before a marker —
        // skip them one at a time; stop at SOS (0xDA, entropy-coded data
        // follows, lengths no longer meaningful) and EOI (0xD9).
        var i = 2
        var res: Option[(Int, Int, Int)] = None
        var done = false
        while (!done && res.isEmpty && i + 9 < b.length) {
          if ((b(i) & 0xff) == 0xff) {
            val marker = b(i + 1) & 0xff
            if (marker == 0xff) i += 1 // fill byte, next byte may be the marker
            else if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
              res = Some((be16(b, i + 7), be16(b, i + 5), 0))
            else if (marker == 0xda || marker == 0xd9) done = true
            else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01)
              i += 2 // standalone markers with no length segment
            else if (i + 3 < b.length) i += 2 + be16(b, i + 2)
            else i = b.length
          } else i += 1
        }
        res
      case "gif" if b.length >= 10 =>
        Some((le16(b, 6), le16(b, 8), 0))
      case "bmp" if b.length >= 26 =>
        Some((le32(b, 18), le32(b, 22), 0))
      case "wav" =>
        // walk RIFF chunks for "fmt ": [id 4B][size 4B LE][data…];
        // sample rate is 4B LE at fmt data offset 4
        var i = 12
        var res: Option[(Int, Int, Int)] = None
        while (res.isEmpty && i + 8 <= b.length) {
          val size = le32(b, i + 4)
          if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ' &&
            i + 16 <= b.length)
            res = Some((0, 0, le32(b, i + 12)))
          else i += 8 + size + (size & 1)
        }
        res
      case _ => None
    }

  /** Resampled audio record. */
  case class ResampledMedia(media_id: Long, media_type: String,
                            target_rate: Int, content: Array[Byte])

  /** REAL audio resample for decodable 16-bit mono PCM: deterministic
    * linear interpolation — output frame k reads source position
    * k·srcRate/targetRate, output length = ⌊n·targetRate/srcRate⌋ —
    * re-encoded as little-endian WAV at the target rate. Payloads no
    * audio reader accepts (or non-16-bit-mono encodings) pass through
    * unchanged, so the operator is total. Verified round-trip by
    * mm_resample: re-decoding planted constant-signal WAVs must
    * reproduce the closed-form frame count and sample sum exactly.
    */
  def resampleAudio(media: DataFrame, targetRate: Int)
                   (implicit spark: SparkSession): Dataset[ResampledMedia] = {
    import spark.implicits._
    media.select("media_id", "media_type", "source", "content").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val bytes = if (rec.content == null) Array.emptyByteArray else rec.content
          val out =
            try {
              val ais = openAudio(bytes) // registry-free, see audioReaders
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1) {
                val data = ais.readAllBytes()
                val n = data.length / 2
                val samples = new Array[Short](n)
                var i = 0
                while (i < n) {
                  samples(i) =
                    if (fmt.isBigEndian)
                      ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort
                    else ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
                  i += 1
                }
                val src = fmt.getSampleRate.toInt
                val outN = math.max(1, (n.toLong * targetRate / src).toInt)
                val resampled = new Array[Byte](outN * 2)
                var k = 0
                while (k < outN) {
                  val pos = k.toDouble * src / targetRate
                  val i0 = math.min(pos.toInt, n - 1)
                  val i1 = math.min(i0 + 1, n - 1)
                  val v = Math.round(
                    samples(i0) + (pos - i0) * (samples(i1) - samples(i0))).toInt
                  resampled(2 * k) = (v & 0xff).toByte
                  resampled(2 * k + 1) = ((v >> 8) & 0xff).toByte
                  k += 1
                }
                // byte-identical to the AudioSystem.write path (spec-
                // asserted) without the per-call writer-registry lock
                pcmWavBytes(targetRate, resampled)
              } else bytes
            } catch { case _: Exception => bytes }
          ResampledMedia(rec.media_id, rec.media_type, targetRate, out)
        }
      }
  }

  /** Resized media record. */
  /** 64-bit difference hash (dHash, the standard perceptual image
    * fingerprint): nearest-neighbor downscale to a 9×8 integer-luma grid,
    * bit (y·8+x) set when luma(x,y) > luma(x+1,y). Invariant to uniform
    * brightness shifts and to re-encoding (PNG vs BMP of the same pixels
    * hash identically); near-duplicate images differ in a few bits.
    * All-integer math and the same deterministic floor-sampling as
    * `resize` — no rendering hints, so the hash is platform-stable.
    */
  private[graft] def dHash64(img: java.awt.image.BufferedImage): Long = {
    val gw = 9; val gh = 8
    val g = Array.ofDim[Int](gh, gw)
    var y = 0
    while (y < gh) {
      val sy = (y.toLong * img.getHeight / gh).toInt
      var x = 0
      while (x < gw) {
        val sx = (x.toLong * img.getWidth / gw).toInt
        val rgb = img.getRGB(sx, sy)
        g(y)(x) = 299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    var h = 0L
    y = 0
    while (y < gh) {
      var x = 0
      while (x < 8) {
        if (g(y)(x) > g(y)(x + 1)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  case class MediaHash(media_id: Long, media_type: String,
                       p_hash: Long, decodable: Boolean)

  /** Perceptual hash per media row: dHash for decodable images; payloads
    * no JDK reader accepts fall back to an exact byte hash (FNV-1a) with
    * `decodable = false`, so the column is total and exact dedup still
    * works on opaque blobs.
    */
  def perceptualHash(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaHash] = {
    import spark.implicits._
    media.select("media_id", "media_type", "source", "content").as[MediaRecord]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { rec =>
          val bytes = if (rec.content == null) Array.emptyByteArray else rec.content
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img != null)
            MediaHash(rec.media_id, rec.media_type, dHash64(img), decodable = true)
          else
            MediaHash(rec.media_id, rec.media_type,
              graft.functions.Hashing.fnv1a64(bytes, 0, bytes.length), decodable = false)
        }
      }
  }

  // ---- DCT perceptual hash (pHash) ----

  /** Integer DCT-II cosine basis: C(u)(x) = round(cos((2x+1)·u·π/64) ·
    * 32768) for u < 8, x < 32 — StrictMath, so the 256 integers are
    * identical on every platform; the SAME literals are interpolated
    * into the DuckDB oracle, giving both engines one shared fixed-point
    * basis (no float cosine at query time anywhere).
    */
  private[graft] val dctCos: Array[Array[Long]] =
    Array.tabulate(8, 32) { (u, x) =>
      Math.round(StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 64) * 32768.0)
    }

  case class DctHash(media_id: Long, phash64: Long, dc_coeff: Long, median_ac: Long)

  /** 32×32 grayscale PNGs whose luma grid is the closed form
    * luma(x,y) = ((1 + id%7)·x + (1 + id%5)·y + id%256) mod 256 — a 2-D
    * sawtooth with a non-trivial DCT spectrum that an external oracle
    * recomputes from doc_id alone. (The mod-256 wrap means the id%256
    * term moves wrap boundaries, not just brightness — each id gets a
    * genuinely distinct spectrum; brightness-shift invariance is proven
    * in the spec on wrap-free images instead.)
    */
  def phashMedia(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // fanOut: per-row image synthesis + dct is the CPU (see syntheticMedia)
    Par.fanOut(docs).select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, source) =>
          val a = 1 + (id % 7).toInt; val b = 1 + (id % 5).toInt
          val c = (id % 256).toInt
          val img = new java.awt.image.BufferedImage(32, 32,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              val v = (a * x + b * y + c) % 256
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          require(javax.imageio.ImageIO.write(img, "png", bos), "no png writer")
          MediaRecord(id, "image", source, bos.toByteArray)
        }
      }.toDF()
  }

  /** DCT-II perceptual hash (pHash, the dHash upgrade that survives
    * rescaling/blur): REAL decode → 32×32 luma → separable integer DCT
    * keeping the 8×8 low-frequency block — T(u)(y) = Σ_x C(u)(x)·L(x)(y)
    * then F(u)(v) = Σ_y C(v)(y)·T(u)(y), 8·32·32 + 8·8·32 multiplies per
    * image instead of the naive 64·1024 — and bit (u·8+v) set when
    * F(u)(v) exceeds the lower median of the 63 AC coefficients.
    * All-Long arithmetic (|F| ≤ 32768²·255·1024 < 2⁶³); per-partition
    * decode like every codec step here. Non-32×32/undecodable payloads
    * are dropped (the hash is defined on the normalized grid).
    */
  def dctPhash(media: DataFrame)(implicit spark: SparkSession): Dataset[DctHash] = {
    import spark.implicits._
    media.select("media_id", "media_type", "source", "content").as[MediaRecord]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { rec =>
          val bytes = if (rec.content == null) Array.emptyByteArray else rec.content
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null || img.getWidth != 32 || img.getHeight != 32) None
          else {
            val lum = Array.ofDim[Long](32, 32) // lum(x)(y)
            var y = 0
            while (y < 32) {
              var x = 0
              while (x < 32) {
                lum(x)(y) = (img.getRGB(x, y) >> 16) & 0xff
                x += 1
              }
              y += 1
            }
            val t = Array.ofDim[Long](8, 32) // T(u)(y)
            var u = 0
            while (u < 8) {
              y = 0
              while (y < 32) {
                var s = 0L; var x = 0
                while (x < 32) { s += dctCos(u)(x) * lum(x)(y); x += 1 }
                t(u)(y) = s
                y += 1
              }
              u += 1
            }
            val f = Array.ofDim[Long](8, 8)
            u = 0
            while (u < 8) {
              var v = 0
              while (v < 8) {
                var s = 0L; y = 0
                while (y < 32) { s += dctCos(v)(y) * t(u)(y); y += 1 }
                f(u)(v) = s
                v += 1
              }
              u += 1
            }
            val ac = new Array[Long](63)
            var k = 0; var i = 0
            while (i < 64) {
              if (i != 0) { ac(k) = f(i / 8)(i % 8); k += 1 }
              i += 1
            }
            java.util.Arrays.sort(ac)
            val med = ac(31)
            var h = 0L
            i = 0
            while (i < 64) {
              if (f(i / 8)(i % 8) > med) h |= 1L << i
              i += 1
            }
            Some(DctHash(rec.media_id, h, f(0)(0), med))
          }
        }
      }
  }

  case class LumaHist(media_id: Long, bin: Long, n_px: Long)

  /** 16-bin luma histogram per image: REAL decode (the same planted
    * 32×32 PNGs as [[dctPhash]]), bin = luma div 16, ALL 16 bins emitted
    * (zeros included) so the output is schema-stable regardless of
    * content. Per-partition codec work like every decode step here; no
    * shuffle at all. Non-32×32/undecodable payloads are dropped.
    */
  def lumaHistogram(media: DataFrame)(implicit spark: SparkSession): Dataset[LumaHist] = {
    import spark.implicits._
    media.select("media_id", "media_type", "source", "content").as[MediaRecord]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { rec =>
          val bytes = if (rec.content == null) Array.emptyByteArray else rec.content
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null || img.getWidth != 32 || img.getHeight != 32) Nil
          else {
            val counts = new Array[Long](16)
            var y = 0
            while (y < 32) {
              var x = 0
              while (x < 32) {
                counts(((img.getRGB(x, y) >> 16) & 0xff) / 16) += 1
                x += 1
              }
              y += 1
            }
            (0 until 16).map(b => LumaHist(rec.media_id, b.toLong, counts(b)))
          }
        }
      }
  }

  case class Patch(media_id: Long, px: Long, py: Long, n_px: Long,
                   sum_luma: Long, min_luma: Long, max_luma: Long)

  /** ViT-style patch grid: REAL decode (the same planted 32×32 PNGs as
    * [[dctPhash]]), the image split into a (32/patch)² grid of
    * patch×patch tiles with per-tile luma stats — the deterministic
    * patchify front half of a vision-transformer ingest (the learned
    * linear projection belongs to the model; the engine's job is the
    * grid, the stats, and the schema). Per-partition codec work like
    * every decode step here; no shuffle at all. Non-32×32/undecodable
    * payloads are dropped.
    */
  def patchGrid(media: DataFrame, patch: Int = 8)
               (implicit spark: SparkSession): Dataset[Patch] = {
    import spark.implicits._
    require(patch > 0 && 32 % patch == 0, s"patch $patch must divide 32")
    media.select("media_id", "media_type", "source", "content").as[MediaRecord]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { rec =>
          val bytes = if (rec.content == null) Array.emptyByteArray else rec.content
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null || img.getWidth != 32 || img.getHeight != 32) Nil
          else {
            val g = 32 / patch
            for { py <- 0 until g; px <- 0 until g } yield {
              var sum = 0L; var mn = 255L; var mx = 0L
              var y = py * patch
              while (y < (py + 1) * patch) {
                var x = px * patch
                while (x < (px + 1) * patch) {
                  val l = ((img.getRGB(x, y) >> 16) & 0xff).toLong
                  sum += l; if (l < mn) mn = l; if (l > mx) mx = l
                  x += 1
                }
                y += 1
              }
              Patch(rec.media_id, px.toLong, py.toLong,
                (patch * patch).toLong, sum, mn, mx)
            }
          }
        }
      }
  }

  case class Blockiness(media_id: Long, bsum: Long, isum: Long, blockiness_micro: Long)

  /** JPEG-blockiness proxy: sum of |Δluma| across horizontal 8-px block
    * boundaries (x ≡ 7 mod 8, 3 boundary columns on a 32-wide image)
    * vs the 28 interior columns, as the ratio of the two MEANS in micro
    * — exact integer sums, real decode, per-partition work.
    */
  def blockiness(media: DataFrame)(implicit spark: SparkSession): Dataset[Blockiness] = {
    import spark.implicits._
    media.select("media_id", "media_type", "source", "content").as[MediaRecord]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { rec =>
          val bytes = if (rec.content == null) Array.emptyByteArray else rec.content
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null || img.getWidth != 32 || img.getHeight != 32) None
          else {
            var bsum = 0L; var isum = 0L
            var y = 0
            while (y < 32) {
              var x = 0
              while (x < 31) {
                val d = math.abs(((img.getRGB(x + 1, y) >> 16) & 0xff)
                  - ((img.getRGB(x, y) >> 16) & 0xff)).toLong
                if (x % 8 == 7) bsum += d else isum += d
                x += 1
              }
              y += 1
            }
            // boundary columns: 3 of 31; interior: 28 of 31 (n per col = 32)
            val ratio = if (isum == 0L) 0L else (bsum * 28L * 1000000L) / (isum * 3L)
            Some(Blockiness(rec.media_id, bsum, isum, ratio))
          }
        }
      }
  }

  case class LumaVec(media_id: Long, luma: Array[Long])

  /** The decoded 32×32 luma grid flattened row-major (y·32+x) — the
    * pixel-level export downstream pairwise metrics (SSIM) join on.
    */
  def lumaVector(media: DataFrame)(implicit spark: SparkSession): Dataset[LumaVec] = {
    import spark.implicits._
    media.select("media_id", "media_type", "source", "content").as[MediaRecord]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { rec =>
          val bytes = if (rec.content == null) Array.emptyByteArray else rec.content
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null || img.getWidth != 32 || img.getHeight != 32) None
          else {
            val a = new Array[Long](1024)
            var y = 0
            while (y < 32) {
              var x = 0
              while (x < 32) { a(y * 32 + x) = ((img.getRGB(x, y) >> 16) & 0xff).toLong; x += 1 }
              y += 1
            }
            Some(LumaVec(rec.media_id, a))
          }
        }
      }
  }

  case class Sharpness(media_id: Long, n_px: Long, lap_var: Long)

  /** Variance of the 4-neighbor Laplacian over the 30×30 interior —
    * the OpenCV blur score, exact integers end-to-end.
    */
  def sharpness(media: DataFrame)(implicit spark: SparkSession): Dataset[Sharpness] = {
    import spark.implicits._
    media.select("media_id", "media_type", "source", "content").as[MediaRecord]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { rec =>
          val bytes = if (rec.content == null) Array.emptyByteArray else rec.content
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null || img.getWidth != 32 || img.getHeight != 32) None
          else {
            def l(x: Int, y: Int): Long = ((img.getRGB(x, y) >> 16) & 0xff).toLong
            var s = 0L; var ss = 0L; var n = 0L
            var y = 1
            while (y < 31) {
              var x = 1
              while (x < 31) {
                val v = 4 * l(x, y) - l(x - 1, y) - l(x + 1, y) - l(x, y - 1) - l(x, y + 1)
                s += v; ss += v * v; n += 1
                x += 1
              }
              y += 1
            }
            Some(Sharpness(rec.media_id, n, (n * ss - s * s) / (n * n)))
          }
        }
      }
  }

  /** Image near-dup pairs by dHash Hamming distance ≤ `maxHamming`,
    * found via 4×16-bit banding (pigeonhole: ≤3 differing bits leave at
    * least one band intact), candidate-capped through the shared
    * spanning-star bucket guard (flat/boilerplate images hash
    * identically and would otherwise degenerate every band bucket to
    * all-pairs), then exact bit_count verify after an ids-only shuffle —
    * the image twin of the SimHash text pipeline.
    */
  def nearDupImagePairs(hashes: DataFrame, maxHamming: Int = 3,
                        maxBucket: Int = 1000): DataFrame = {
    require(maxHamming <= 3, "4x16-bit banding only guarantees recall for hamming <= 3")
    val banded = hashes.filter(col("decodable"))
      .select(col("media_id").as("id"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("band"),
            shiftright(col("p_hash"), i * 16).bitwiseAND(0xffffL).as("bkey"))): _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bkey").as("bkey"))
    val cand = Dedup.bucketPairs(banded, Seq("band", "bkey"), maxBucket, "dhash")
      .distinct()
    val h = hashes.select(col("media_id"), col("p_hash"))
    cand
      .join(h.select(col("media_id").as("id_a"), col("p_hash").as("h_a")), "id_a")
      .join(h.select(col("media_id").as("id_b"), col("p_hash").as("h_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  case class ResizedMedia(media_id: Long, media_type: String,
                          target_w: Int, target_h: Int, content: Array[Byte])

  /** REAL image resize for decodable images: deterministic nearest-neighbor
    * resample (src pixel at floor(x·sw/tw), floor(y·sh/th) — no platform-
    * dependent rendering hints), re-encoded as PNG. Payloads no JDK reader
    * accepts fall back to deterministic byte subsampling to the pixel
    * budget (the prior stub behavior), so the operator is total.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int)
            (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    val budget = targetW * targetH
    media.select("media_id", "media_type", "source", "content").as[MediaRecord]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { rec =>
          val bytes = if (rec.content == null) Array.emptyByteArray else rec.content
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          val out =
            if (img != null) {
              val dst = new java.awt.image.BufferedImage(targetW, targetH,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < targetH) {
                val sy = (y.toLong * img.getHeight / targetH).toInt
                var x = 0
                while (x < targetW) {
                  val sx = (x.toLong * img.getWidth / targetW).toInt
                  dst.setRGB(x, y, img.getRGB(sx, sy) & 0xffffff)
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", bos)
              bos.toByteArray
            } else if (bytes.length <= budget) bytes
            else {
              val step = bytes.length.toDouble / budget
              Array.tabulate(budget)(i => bytes((i * step).toInt))
            }
          ResizedMedia(rec.media_id, rec.media_type, targetW, targetH, out)
        }
      }
  }

  /** Frame sampling plumbing: split the payload into fixed-size windows
    * (standing in for video frames / audio chunks), exploded with indexes.
    * Pure expressions — `substring` works on binary and stays in codegen;
    * frame hashes are md5 (externally reproducible from the same bytes).
    */
  def frameSample(media: DataFrame, frameBytes: Int, maxFrames: Int): DataFrame = {
    val nFrames = least(ceil(length(col("content")).cast(DoubleType) / frameBytes), lit(maxFrames))
      .cast(IntegerType)
    val frames = when(nFrames > 0,
      transform(sequence(lit(0), nFrames - 1), i =>
        call_function("substring", col("content"), i * frameBytes + 1, lit(frameBytes))))
      .otherwise(array().cast(ArrayType(BinaryType)))
    media
      .select(col("media_id"), posexplode(frames))
      .select(col("media_id"), col("pos").as("frame_idx"),
        length(col("col")).as("frame_n_bytes"),
        md5(col("col")).as("frame_hash"))
  }
}

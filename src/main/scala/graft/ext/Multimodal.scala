package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: media as opaque
  * `binary` columns + typed metadata, with decode/feature steps running
  * per-partition (the Scala analogue of a pandas-batch UDF: each partition
  * is processed as one iterator, amortizing any decoder init across rows —
  * the pattern a real image/audio decoder plugs into).
  *
  * METADATA IS REAL, PIXEL DECODE IS STUBBED: container headers (PNG IHDR,
  * JPEG SOF, GIF, BMP, WAV fmt) are parsed for real — dimensions and
  * sample rates come from the actual bytes, no codec needed. Only pixel/
  * sample DATA decoding is stubbed (`decodeStub` derives deterministic
  * fake values for unrecognized payloads — the container has no codecs).
  * The Spark-side plumbing — schema, binary handling, partition batching,
  * frame explode — is real and tested; swap `decodeStub` for a codec to
  * productionize.
  */
object Multimodal {

  /** One media row: opaque bytes + routing metadata. */
  case class MediaRecord(media_id: Long, media_type: String,
                         source: String, content: Array[Byte])

  /** Extracted metadata (what a real decoder would emit). */
  case class MediaMeta(media_id: Long, media_type: String, n_bytes: Long,
                       format: String, width: Int, height: Int,
                       sample_rate: Int)

  /** Build a media table from the documents fixture: text bytes standing in
    * for an opaque payload (the plumbing doesn't care what the bytes are).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("application/octet-stream").as("media_type"),
      col("source"),
      col("text").cast(BinaryType).as("content"))

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

  /** STUB decoder — deterministic fake: dimensions derived from a content
    * hash; a real build replaces the body with an actual codec call.
    * Kept as a plain function so the mapPartitions plumbing is identical
    * either way.
    */
  def decodeStub(content: Array[Byte]): (Int, Int, Int) = {
    val h = graft.functions.Hashing.fnv1a64(content, 0, content.length)
    val width = 64 + (Math.floorMod(h, 1024L)).toInt
    val height = 64 + (Math.floorMod(h >>> 20, 1024L)).toInt
    val sampleRate = 8000 + (Math.floorMod(h >>> 40, 5L) * 8000).toInt
    (width, height, sampleRate)
  }

  /** Decode/feature-extract: per-partition batch processing over typed
    * rows. The partition iterator is the batch — decoder init (the
    * expensive part for real codecs) happens once per partition, not per
    * row. Dimensions/sample-rate come from REAL header parsing when the
    * container format is recognized; the stub only covers opaque payloads.
    */
  def extractMeta(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("media_id", "media_type", "source", "content").as[MediaRecord]
      .mapPartitions { it =>
        // real codecs initialize here, once per partition
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
        // [FF Cn][len 2B][precision 1B][height 2B][width 2B]
        var i = 2
        var res: Option[(Int, Int, Int)] = None
        while (res.isEmpty && i + 9 < b.length) {
          if ((b(i) & 0xff) == 0xff) {
            val marker = b(i + 1) & 0xff
            if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
              res = Some((be16(b, i + 7), be16(b, i + 5), 0))
            else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
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

  /** Resized media record (what a real image resize would emit). */
  case class ResizedMedia(media_id: Long, media_type: String,
                          target_w: Int, target_h: Int, content: Array[Byte])

  /** Resize plumbing: per-partition batch transform producing a
    * fixed-budget payload per row. STUB: deterministic byte subsampling
    * stands in for pixel resampling (no codecs in this container); the
    * schema, typed-row path, and partition batching are the real
    * interface a codec-backed resize plugs into.
    */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int)
                (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    val budget = targetW * targetH
    media.select("media_id", "media_type", "source", "content").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val bytes = if (rec.content == null) Array.emptyByteArray else rec.content
          val out =
            if (bytes.length <= budget) bytes
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
    * Pure expressions — `substring` works on binary and stays in codegen.
    */
  def frameSample(media: DataFrame, frameBytes: Int, maxFrames: Int): DataFrame = {
    val nFrames = least(ceil(length(col("content")).cast(DoubleType) / frameBytes), lit(maxFrames))
      .cast(IntegerType)
    media
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), nFrames - 1), i =>
          call_function("substring", col("content"), i * frameBytes + 1, lit(frameBytes)))))
      .select(col("media_id"), col("pos").as("frame_idx"),
        length(col("col")).as("frame_n_bytes"),
        xxhash64(col("col")).as("frame_hash"))
  }
}

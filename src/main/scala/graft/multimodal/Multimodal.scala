package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column conventions (SURVEY.md §2.4): media travels as an
  * opaque `BINARY` payload plus a typed metadata struct; decode /
  * feature-extract runs partition-parallel over the binary column.
  *
  * The decode kernel is REAL for image payloads — javax.imageio (pure JVM,
  * in every JRE) decodes PNG/BMP/GIF/JPEG and reports true dimensions —
  * and REAL for WAV/AIFF audio payloads — javax.sound.sampled parses the
  * header and reports true sample rate / channels / duration. Other bytes
  * (the text-backed fixtures; video, whose codecs aren't in a bare JVM)
  * fall through to a clearly-marked deterministic stub. Everything Spark-side is real and load-bearing
  * either way: the schema convention, the mapPartitions batch shape (one
  * decoder init per partition, not per row), and the feature-struct output
  * contract are exactly what a JNI/FFI decoder would plug into.
  */
object Multimodal {

  /** Canonical multimodal schema: (id, payload BINARY, meta STRUCT). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("source", StringType),
      StructField("n_bytes", LongType))), nullable = false)))

  /** Wrap the documents table as a media table: text bytes stand in for an
    * encoded media payload (deterministic, schema-correct).
    */
  def documentsAsMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        col("source").as("source"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  final case class MediaFeatures(
      media_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, checksum: Long,
      sample_rate: Int, channels: Int, duration_ms: Long)

  /** Decoded per-payload features; unrelated modality fields are zero
    * (an image has no sample rate, audio has no pixel dims).
    */
  private final case class Decoded(width: Int, height: Int, checksum: Long,
      sampleRate: Int = 0, channels: Int = 0, durationMs: Long = 0L)

  /** STUB decode kernel for payloads that are neither a decodable image
    * nor decodable audio: derives deterministic fake dimensions + a real
    * byte checksum so the plumbing is testable end-to-end on text-backed
    * fixtures. Video demux would replace this (no video codec in a bare
    * JVM).
    */
  private def decodeStub(payload: Array[Byte]): Decoded = {
    // ??? <- real video decoder goes here; deterministic fake below
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum = (sum * 131 + (payload(i) & 0xFF)) % 1000000007L; i += 1 }
    val width = 64 + (sum % 577).toInt
    val height = 64 + ((sum / 577) % 433).toInt
    Decoded(width, height, sum)
  }

  /** Magic-byte sniff: only payloads that LOOK like a supported image are
    * handed to ImageIO — feeding arbitrary text bytes to reader probing
    * per row would be pure overhead on a mixed corpus.
    */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    (p.length >= 8 && (p(0) & 0xFF) == 0x89 && p(1) == 'P'.toByte &&
      p(2) == 'N'.toByte && p(3) == 'G'.toByte) ||                    // PNG
    (p.length >= 2 && p(0) == 'B'.toByte && p(1) == 'M'.toByte) ||    // BMP
    (p.length >= 3 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8) || // JPEG
    (p.length >= 6 && p(0) == 'G'.toByte && p(1) == 'I'.toByte &&
      p(2) == 'F'.toByte)                                             // GIF

  /** Magic-byte sniff for the audio containers a bare JVM can decode:
    * WAV is RIFF....WAVE, AIFF/AIFC is FORM....AIF*.
    */
  private def looksLikeAudio(p: Array[Byte]): Boolean =
    p.length >= 12 && (
      (p(0) == 'R'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte &&
        p(3) == 'F'.toByte && p(8) == 'W'.toByte && p(9) == 'A'.toByte &&
        p(10) == 'V'.toByte && p(11) == 'E'.toByte) ||
      (p(0) == 'F'.toByte && p(1) == 'O'.toByte && p(2) == 'R'.toByte &&
        p(3) == 'M'.toByte && p(8) == 'A'.toByte && p(9) == 'I'.toByte &&
        p(10) == 'F'.toByte))

  /** Decode: real javax.imageio dimensions for image payloads, real
    * javax.sound.sampled header decode (sample rate / channels / duration)
    * for WAV/AIFF payloads, stub otherwise; the checksum is always the
    * true byte checksum. A sniffed payload the decoder still can't parse
    * (truncated file) falls back to the stub rather than failing the
    * task — corrupt media is data, not a bug.
    */
  private def decode(payload: Array[Byte]): Decoded = {
    val stub = decodeStub(payload)
    if (looksLikeImage(payload))
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) stub
        else stub.copy(width = img.getWidth, height = img.getHeight)
      } catch { case scala.util.control.NonFatal(_) => stub }
    else if (looksLikeAudio(payload))
      try {
        // header-only parse (no PCM decode): ByteArrayInputStream supports
        // the mark/reset the sound SPI probes require
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        val fmt = aff.getFormat
        val frames = aff.getFrameLength
        val durationMs =
          if (frames == javax.sound.sampled.AudioSystem.NOT_SPECIFIED ||
              fmt.getFrameRate <= 0) 0L
          else math.round(frames * 1000.0 / fmt.getFrameRate)
        Decoded(0, 0, stub.checksum,
          math.round(fmt.getSampleRate), fmt.getChannels, durationMs)
      } catch { case scala.util.control.NonFatal(_) => stub }
    else stub
  }

  /** Partition-parallel feature extraction over the binary column. The
    * mapPartitions boundary is the real design point: decoder state is
    * initialized once per partition and rows stream through it — the Scala
    * image of a Pandas-UDF `mapInPandas` batch kernel.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.mime"), col("meta.n_bytes"))
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { rows =>
        // per-partition decoder init (once, not per row): ImageIO's disk
        // cache is pure overhead for in-memory byte payloads
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, payload, mime, nBytes) =>
          val d = decode(payload)
          MediaFeatures(id, mime, nBytes, d.width, d.height, d.checksum,
            d.sampleRate, d.channels, d.durationMs)
        }
      }
  }

  final case class MediaResized(media_id: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** STUB resize: nearest-neighbor over the 1-D byte stream to exactly
    * width*height output bytes (a real scaler resamples a pixel grid; the
    * batch shape — fixed output size per row, mapPartitions kernel — is
    * identical). Deterministic; output size is schema-knowable.
    */
  def resize(media: DataFrame, width: Int, height: Int): Dataset[MediaResized] = {
    val spark = media.sparkSession
    import spark.implicits._
    val outLen = width * height
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val out = new Array[Byte](outLen)
          if (payload.nonEmpty) {
            var i = 0
            while (i < outLen) {
              out(i) = payload((i.toLong * payload.length / outLen).toInt)
              i += 1
            }
          }
          MediaResized(id, width, height, out)
        }
      }
  }

  final case class MediaFrame(media_id: Long, frame_idx: Int,
      frame_bytes: Array[Byte])

  /** STUB frame sampling: fixed-size payload chunks stand in for demuxed
    * video frames; every `stride`-th frame is emitted. The row→rows fan-out
    * (typed flatMap) is the real contract a demuxer kernel plugs into —
    * one input row explodes to a bounded set of frame rows, partition-local,
    * no shuffle.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256, stride: Int = 4)
      : Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val nChunks = (payload.length + frameBytes - 1) / frameBytes
        (0 until nChunks by stride).iterator.map { ci =>
          val from = ci * frameBytes
          val until = math.min(from + frameBytes, payload.length)
          MediaFrame(id, ci, java.util.Arrays.copyOfRange(payload, from, until))
        }
      }
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column conventions (SURVEY.md §2.4): media travels as an
  * opaque `BINARY` payload plus a typed metadata struct; decode /
  * feature-extract runs partition-parallel over the binary column.
  *
  * The actual codecs (image/audio libs) are NOT in this container, so the
  * decode kernel is a clearly-marked deterministic STUB — but everything
  * Spark-side is real and load-bearing: the schema convention, the
  * mapPartitions batch shape (one decoder init per partition, not per row),
  * and the feature-struct output contract are exactly what a JNI/FFI decoder
  * would plug into.
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
      width: Int, height: Int, checksum: Long)

  /** STUB decode kernel: in production this would hand `payload` to an
    * image/audio decoder (per-partition init, per-row decode). Here it
    * derives deterministic fake dimensions + a real byte checksum so the
    * plumbing is testable end-to-end.
    */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    // ??? <- real decoder goes here; deterministic fake below
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum = (sum * 131 + (payload(i) & 0xFF)) % 1000000007L; i += 1 }
    val width = 64 + (sum % 577).toInt
    val height = 64 + ((sum / 577) % 433).toInt
    (width, height, sum)
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
        // per-partition decoder init would happen HERE (once, not per row)
        rows.map { case (id, payload, mime, nBytes) =>
          val (w, h, checksum) = decodeStub(payload)
          MediaFeatures(id, mime, nBytes, w, h, checksum)
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

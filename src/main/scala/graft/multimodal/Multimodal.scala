package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed batch-wise per partition.
  *
  * The decode step is PLUGGABLE ([[Decoder]]): the default instance is
  * [[Utf8TextDecoder]] — a real, complete codec for the text modality
  * (charset decoding IS the decode step for text; features are the
  * rendered bounding box: line count × max line width in code points).
  * [[FakeImageDecoder]] remains as the explicitly test-grade stand-in
  * for binary image formats (no image libraries in this environment —
  * a deployment drops in a JPEG/PNG instance with the same two-method
  * contract). The Spark-side plumbing — binary schema, partition-wise
  * batching via mapPartitions, output schema — is identical for every
  * decoder and is what matters at 100 TB:
  *  - payloads never round-trip through the driver;
  *  - the per-partition iterator processes records one batch at a
  *    time (decoders typically amortize model/codec init per batch);
  *  - metadata is a typed struct column, filterable without touching
  *    the payload bytes (Parquet column pruning keeps payload I/O
  *    out of metadata-only queries).
  */
object Multimodal {

  /** One media payload's decoded features: a modality-agnostic
    * bounding box (image: pixel dims; text: lines × widest line;
    * video: a real instance would report the coded frame size). */
  final case class Decoded(width: Int, height: Int)

  /** The decode extension point. Implementations must be
    * `Serializable` — instances ship to executors inside the task
    * closure, and `decode` runs inside the partition iterator, one
    * call per payload, batched by the caller. */
  trait Decoder extends Serializable {
    /** Media-kind tag this decoder handles (informational). */
    def kind: String
    def decode(payload: Array[Byte]): Decoded
  }

  /** REAL decoder for the text modality: decodes the payload as
    * UTF-8 and reports the rendered box — height = line count
    * (trailing empty line counts, `split(_, -1)` semantics), width =
    * widest line in Unicode code points (not UTF-16 units, so
    * supplementary characters count once, matching how an oracle
    * engine measures characters). */
  object Utf8TextDecoder extends Decoder {
    val kind = "text/plain"
    def decode(payload: Array[Byte]): Decoded = {
      val lines = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
        .split("\n", -1)
      Decoded(
        width = if (lines.isEmpty) 0
          else lines.map(l => l.codePointCount(0, l.length)).max,
        height = lines.length)
    }
  }

  /** TEST-GRADE stub for binary image formats: deterministic "dims"
    * derived from the raw bytes. Kept only so specs can exercise the
    * plumbing with a non-text kind; production image decoding plugs in
    * a real codec here. */
  object FakeImageDecoder extends Decoder {
    val kind = "image/fake"
    def decode(payload: Array[Byte]): Decoded = {
      val b0 = if (payload.nonEmpty) payload(0) & 0xFF else 0
      Decoded(64 + (payload.length % 193), 64 + (b0 % 64))
    }
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),
      StructField("declared_bytes", LongType))))))

  /** Wrap a text corpus as a binary media table (the text-modality
    * payload form; the same shape carries image/audio bytes). */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      kind: String = Utf8TextDecoder.kind): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(lit(kind).as("kind"),
        octet_length(col(textCol)).cast("long").as("declared_bytes")).as("meta"))

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Partition-wise batched decode: the multimodal feature-extraction
    * operator. Batching shape: `grouped(batchSize)` per partition, so
    * a real decoder can vectorize per batch. */
  def decodeFeatures(media: DataFrame,
      decoder: Decoder = Utf8TextDecoder, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val dec = decoder.decode(payload)
          Row(id, payload.length, dec.width, dec.height)
        }
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Resize: binary-in binary-out payload transform. The STUB codec
    * truncates to `targetBytes` (a real one re-encodes pixels); the
    * contract that matters at scale is payload -> payload per
    * partition with the meta struct updated in place, never a
    * driver round-trip. */
  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload", "meta.kind").rdd
      .mapPartitions(_.map { r =>
        val resized = r.getAs[Array[Byte]](1).take(targetBytes)
        Row(r.getLong(0), resized, Row(r.getString(2), resized.length.toLong))
      })
    spark.createDataFrame(rdd, mediaSchema)
  }

  private val frameSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_no", IntegerType),
    StructField("frame_len", IntegerType),
    StructField("first_byte", IntegerType)))

  /** Frame sampling: treat the payload as fixed-size frames of
    * `frameBytes` and emit every `everyN`-th frame's features — the
    * video-keyframe-extraction shape. One payload in, ~len/(frame*N)
    * rows out, all computed inside the partition iterator (a real
    * sampler decodes only the touched frames; payloads never shuffle —
    * only the small per-frame feature rows do, if at all). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
      everyN: Int = 4): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val nFrames = (payload.length + frameBytes - 1) / frameBytes
        (0 until nFrames by everyN).iterator.map { f =>
          val start = f * frameBytes
          val len = math.min(frameBytes, payload.length - start)
          Row(id, f, len, payload(start) & 0xFF)
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }
}

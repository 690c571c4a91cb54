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
  * [[ImageIoDecoder]] is the real image-modality instance: JDK
  * `javax.imageio` (PNG/BMP/GIF/JPEG readers ship with the JDK — no
  * external dependency), decoding actual pixel buffers and reporting
  * true dimensions. The Spark-side plumbing — binary schema, partition-wise
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

  /** REAL decoder for the image modality: JDK `javax.imageio` —
    * decodes the payload's actual pixel buffer (PNG/BMP/GIF/JPEG, the
    * formats whose readers ship with every JDK) and reports the true
    * image dimensions. Headless-safe (no display needed for decode).
    * An unreadable payload reports a (0, 0) box rather than failing
    * the task — at corpus scale a corrupt blob is a row to filter
    * (`width > 0`), not a reason to kill a 10k-row partition. */
  object ImageIoDecoder extends Decoder {
    val kind = "image/png"
    def decode(payload: Array[Byte]): Decoded = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) Decoded(0, 0) else Decoded(img.getWidth, img.getHeight)
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

  /** Build a REAL-PNG media table from a row-id source: each row gets
    * a deterministic RGB image (dims and pixels derived from the id)
    * encoded through the actual `javax.imageio` PNG writer, executor-
    * side via mapPartitions — payload bytes are born and stay on
    * executors. This is the image-modality fixture generator for the
    * oracle-gated decode query: the ground-truth dims are pure id
    * arithmetic an independent engine can recompute, while the Spark
    * side must round-trip genuine PNG bytes to recover them. */
  def pngMediaTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = 8 + (id % 32).toInt
        val h = 8 + (id % 16).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((id * 31 + x * 7 + y) & 0xFFFFFF).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val bytes = bos.toByteArray
        Row(id, bytes, Row(ImageIoDecoder.kind, bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

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

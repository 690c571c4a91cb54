package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed batch-wise per partition.
  *
  * The decode step is a STUB (no image/audio libraries in this
  * environment): [[fakeDecode]] derives deterministic "dimensions"
  * from the raw bytes. The Spark-side plumbing — binary schema,
  * partition-wise batching via mapPartitions, output schema — is real
  * and is what matters at 100 TB:
  *  - payloads never round-trip through the driver;
  *  - the per-partition iterator processes records one batch at a
  *    time (decoders typically amortize model/codec init per batch);
  *  - metadata is a typed struct column, filterable without touching
  *    the payload bytes (Parquet column pruning keeps payload I/O
  *    out of metadata-only queries).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),
      StructField("declared_bytes", LongType))))))

  /** Wrap a text corpus as a binary media table (test stand-in for
    * real image/audio payloads). */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(lit("image/fake").as("kind"),
        octet_length(col(textCol)).cast("long").as("declared_bytes")).as("meta"))

  /** Deterministic fake decode: width/height derived from payload
    * bytes. A real deployment swaps this body for an image codec;
    * the signature (bytes -> features) and the mapPartitions batching
    * around it stay identical. */
  def fakeDecode(payload: Array[Byte]): (Int, Int) = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xFF else 0
    (64 + (payload.length % 193), 64 + (b0 % 64))
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Partition-wise batched decode: the multimodal feature-extraction
    * operator. Batching shape: `grouped(batchSize)` per partition, so
    * a real decoder can vectorize per batch. */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (w, h) = fakeDecode(payload)
          Row(id, payload.length, w, h)
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

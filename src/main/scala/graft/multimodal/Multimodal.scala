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

  /** One audio payload's decoded features: format header fields plus
    * the total signal energy (sum of squared samples — exact long
    * arithmetic, so it is oracle-comparable). */
  final case class AudioDecoded(sampleRate: Int, nSamples: Int, energy: Long)

  /** REAL decoder for the audio modality: JDK `javax.sound.sampled`
    * (the WAV/AIFF/AU readers ship with every JDK; headless-safe).
    * Parses the RIFF/WAVE header through the actual audio codec and
    * streams the PCM frames: 16-bit signed little-endian mono is the
    * synthesized fixture format, and the energy sum is pure long
    * arithmetic over the decoded samples. Unreadable payloads report
    * (0, 0, 0) — a row to filter, not a task to kill. */
  object WavDecoder extends Serializable {
    val kind = "audio/wav"
    def decode(payload: Array[Byte]): AudioDecoded =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = ais.getFormat
          val pcm = ais.readAllBytes()
          val n = pcm.length / 2
          var i = 0
          var e = 0L
          while (i < n) {
            val s = ((pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xFF)).toShort
            e += s.toLong * s
            i += 1
          }
          AudioDecoded(fmt.getSampleRate.toInt, n, e)
        } finally ais.close()
      } catch { case _: Exception => AudioDecoded(0, 0, 0L) }
  }

  /** Build a REAL-WAV media table from a row-id source: each row gets
    * a deterministic 16-bit PCM mono signal (sample count and values
    * pure id arithmetic), wrapped in a hand-assembled RIFF/WAVE
    * header, executor-side — the audio twin of [[pngMediaTable]].
    * The ground truth (8 kHz, `64 + id % 64` samples, energy =
    * Σ ((id·31 + k·17) mod 2048 − 1024)²) is recomputable by an
    * independent engine, while the Spark side must round-trip the
    * bytes through the genuine JDK audio codec to recover it. */
  def wavMediaTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val n = 64 + (id % 64).toInt
        val pcm = new Array[Byte](n * 2)
        var k = 0
        while (k < n) {
          val s = ((id * 31 + k * 17) % 2048 - 1024).toInt
          pcm(2 * k) = (s & 0xFF).toByte
          pcm(2 * k + 1) = ((s >> 8) & 0xFF).toByte
          k += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val dos = new java.io.DataOutputStream(bos)
        def u32le(v: Int): Unit = dos.write(Array[Byte](
          (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
          ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte))
        def u16le(v: Int): Unit =
          dos.write(Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte))
        val rate = 8000
        dos.writeBytes("RIFF"); u32le(36 + pcm.length); dos.writeBytes("WAVE")
        dos.writeBytes("fmt "); u32le(16)
        u16le(1)            // PCM
        u16le(1)            // mono
        u32le(rate)         // sample rate
        u32le(rate * 2)     // byte rate (16-bit mono)
        u16le(2)            // block align
        u16le(16)           // bits per sample
        dos.writeBytes("data"); u32le(pcm.length)
        dos.write(pcm)
        val bytes = bos.toByteArray
        Row(id, bytes, Row(WavDecoder.kind, bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  private val audioSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("energy", LongType)))

  /** Partition-wise batched audio decode — same batching shape as
    * [[decodeFeatures]], through the real [[WavDecoder]]. */
  def decodeAudio(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val dec = WavDecoder.decode(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), dec.sampleRate, dec.nSamples, dec.energy)
        }
      }
    }
    spark.createDataFrame(rdd, audioSchema)
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

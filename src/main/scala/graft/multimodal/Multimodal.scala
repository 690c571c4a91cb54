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

  /** ImageIO's default stream cache is DISK-backed: every encode or
    * decode through a plain Input/OutputStream spills to a temp file
    * in java.io.tmpdir, making per-image wall time depend on /tmp
    * page-cache state (measured as a 5x run-to-run swing on the
    * sf0.1 codec queries) and racing a StreamCloser shutdown hook.
    * Our payloads are in-heap byte arrays — the memory cache is
    * strictly better. JVM-global and idempotent; referenced at the
    * top of every codec path so each executor flips it once. */
  private lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

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
      imageIoMemCache
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
    // spread the codec work across all cores: the id projection
    // inherits the (often single-split) parquet scan's partitioning,
    // which would serialize encode/decode on 1-2 tasks; a hash
    // repartition of the tiny long ids is the deterministic, cheap
    // fix — and the right 100 TB posture (even codec load per task)
    val rdd = docs.select(col(idCol).cast("long"))
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .rdd.mapPartitions { it =>
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
        imageIoMemCache
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val bytes = bos.toByteArray
        Row(id, bytes, Row(ImageIoDecoder.kind, bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Build the perceptual-hash fixture: 8×8 grayscale PNGs with
    * md5-derived pixels organized in FAMILIES — ids sharing `id div
    * 10` get the same base image, and the variant `id mod 10` flips
    * ~2 pixels (luma inverted where a second hash lands on 0 mod 32).
    * Same contract as [[pngMediaTable]]: real PNG bytes born
    * executor-side through the JDK codec, ground truth recomputable
    * arithmetically by an independent engine. The family structure is
    * what gives the hamming-near-dup operator true positives to find. */
  def phashMediaTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    // spread the codec work across all cores: the id projection
    // inherits the (often single-split) parquet scan's partitioning,
    // which would serialize encode/decode on 1-2 tasks; a hash
    // repartition of the tiny long ids is the deterministic, cheap
    // fix — and the right 100 TB posture (even codec load per task)
    val rdd = docs.select(col(idCol).cast("long"))
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val fam = id / 10
        val vari = id % 10
        val img = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val base =
              (graft.functions.Text.hash60Literal(s"p$fam:$x:$y") % 256).toInt
            val l =
              if (vari > 0 &&
                  graft.functions.Text.hash60Literal(s"f$vari:$x:$y") % 32 == 0)
                255 - base
              else base
            img.setRGB(x, y, (l << 16) | (l << 8) | l)
            x += 1
          }
          y += 1
        }
        imageIoMemCache
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val bytes = bos.toByteArray
        Row(id, bytes, Row(ImageIoDecoder.kind, bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  private val phashSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("phash_hi", LongType),
    StructField("phash_lo", LongType)))

  /** Average-hash (aHash) over the REAL decoded pixel buffer: decode
    * through `javax.imageio`, integer-luma the top-left 8×8 block
    * (`(299r + 587g + 114b) div 1000` — production inserts a
    * block-average resize before this step), threshold each pixel
    * against the block's floored mean, and pack the 64 bits as two
    * SIGN-SAFE 32-bit halves (phash_hi, phash_lo) so any engine's
    * signed BIGINT carries them exactly. Unreadable or sub-8×8
    * payloads hash to (0, 0) — a row to filter, not a task failure. */
  def imagePhash(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(0)
        imageIoMemCache
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        if (img == null || img.getWidth < 8 || img.getHeight < 8)
          Row(id, 0L, 0L)
        else {
          val lum = new Array[Int](64)
          var sum = 0L
          var i = 0
          while (i < 64) {
            val v = img.getRGB(i % 8, i / 8)
            val l = (299 * ((v >> 16) & 255) + 587 * ((v >> 8) & 255)
              + 114 * (v & 255)) / 1000
            lum(i) = l; sum += l; i += 1
          }
          val mean = sum / 64
          var hi = 0L; var lo = 0L
          i = 0
          while (i < 64) {
            if (lum(i) > mean) {
              if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            }
            i += 1
          }
          // bit index i = y*8 + x, row-major from the top-left
          Row(id, hi, lo)
        }
      })
    }
    spark.createDataFrame(rdd, phashSchema)
  }

  /** Hamming near-dup over perceptual hashes: 4×16-bit band blocking
    * (pigeonhole: any pair within hamming `maxDist` ≤ 3 shares at
    * least one exact band), candidates verified with an exact
    * `bit_count(xor)` — so the banded form returns EXACTLY the
    * all-pairs result while joining only on band equality. The same
    * shape as the SimHash pigeonhole blocking in
    * [[graft.dedup.Dedup]]; at corpus scale a `maxBandBucket` cap
    * would bound a degenerate band (all-black thumbnails) the way
    * the text dedup caps do. Returns (a, b, dist), a < b. */
  def phashNearDup(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4x16-bit banding guarantees recall only to hamming 3")
    val banded = hashes.select(col("media_id"), col("phash_hi"), col("phash_lo"),
      posexplode(array(
        col("phash_lo") % 65536L,
        expr("phash_lo div 65536") % 65536L,
        col("phash_hi") % 65536L,
        expr("phash_hi div 65536"))).as(Seq("band_no", "band_val")))
    val l = banded.select(col("media_id").as("a"), col("phash_hi").as("ha"),
      col("phash_lo").as("la"), col("band_no"), col("band_val"))
    val r = banded.select(col("media_id").as("b"), col("phash_hi").as("hb"),
      col("phash_lo").as("lb"), col("band_no"), col("band_val"))
    l.join(r, Seq("band_no", "band_val"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("ha"), col("la"), col("hb"), col("lb"))
      .distinct()
      .withColumn("dist",
        (bit_count(expr("ha ^ hb")) + bit_count(expr("la ^ lb"))).cast("int"))
      .filter(col("dist") <= maxDist)
      .select(col("a"), col("b"), col("dist"))
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
    // spread the codec work across all cores: the id projection
    // inherits the (often single-split) parquet scan's partitioning,
    // which would serialize encode/decode on 1-2 tasks; a hash
    // repartition of the tiny long ids is the deterministic, cheap
    // fix — and the right 100 TB posture (even codec load per task)
    val rdd = docs.select(col(idCol).cast("long"))
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .rdd.mapPartitions { it =>
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

  private val resampleSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("out_rate", IntegerType),
    StructField("n_out", IntegerType),
    StructField("energy_out", LongType)))

  /** Audio downsample: decode 16-bit mono PCM through the JDK codec,
    * decimate by `factor` with a boxcar (block-mean) anti-alias
    * filter — each output sample is floorDiv(Σ block, factor), a
    * trailing partial block is dropped — and emit the resampled
    * stream's stats. Integer end-to-end, so an independent engine can
    * recompute the result from the signal's generator arithmetic.
    *
    * Same partition-wise batching as [[decodeAudio]]: payload bytes
    * never shuffle and never visit the driver; the output is
    * stats-sized. */
  def resampleAudio(media: DataFrame, factor: Int = 4,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          var rate = 0; var nOut = 0; var energy = 0L
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            try {
              rate = ais.getFormat.getSampleRate.toInt / factor
              val pcm = ais.readAllBytes()
              val n = pcm.length / 2
              nOut = n / factor
              var b = 0
              while (b < nOut) {
                var s = 0L
                var j = 0
                while (j < factor) {
                  val k = b * factor + j
                  s += ((pcm(2 * k + 1).toInt << 8) | (pcm(2 * k) & 0xFF))
                    .toShort.toLong
                  j += 1
                }
                val o = java.lang.Math.floorDiv(s, factor.toLong)
                energy += o * o
                b += 1
              }
            } finally ais.close()
          } catch { case _: Exception => rate = 0; nOut = 0; energy = 0L }
          Row(r.getLong(0), rate, nOut, energy)
        }
      }
    }
    spark.createDataFrame(rdd, resampleSchema)
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

  /** Build the video-fixture media table: each payload is a real
    * FRAME CONTAINER — a big-endian u32 frame count, then count u32
    * frame lengths (the index every real container ships so a
    * sampler can seek), then the frames back-to-back, each one a
    * genuine PNG from the JDK codec. Frame f of media id has
    * ground-truth dims w = 4 + (id·7 + f·3) mod 13,
    * h = 4 + (id·5 + f·11) mod 9 and count 3 + id mod 4 — pure id
    * arithmetic an independent engine recomputes, while the Spark
    * side must parse the container and decode actual PNG bytes to
    * recover them. Same executor-side birth as [[pngMediaTable]]. */
  def videoMediaTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    // spread the codec work across all cores (see [[pngMediaTable]])
    val rdd = docs.select(col(idCol).cast("long"))
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val n = 3 + (id % 4).toInt
        val frames = (0 until n).map { f =>
          val w = 4 + ((id * 7 + f * 3) % 13).toInt
          val h = 4 + ((id * 5 + f * 11) % 9).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, ((id * 31 + f * 13 + x * 7 + y) & 0xFFFFFF).toInt)
              x += 1
            }
            y += 1
          }
          imageIoMemCache
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          bos.toByteArray
        }
        val bos = new java.io.ByteArrayOutputStream()
        val dos = new java.io.DataOutputStream(bos)
        dos.writeInt(n)
        frames.foreach(fb => dos.writeInt(fb.length))
        frames.foreach(dos.write(_))
        val bytes = bos.toByteArray
        Row(id, bytes, Row("video/x-frames+png", bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  private val imageFrameSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_no", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Keyframe extraction over [[videoMediaTable]] containers: read
    * the container's length index, seek to every `everyN`-th frame,
    * and decode THAT frame's PNG bytes through the real JDK codec —
    * skipped frames are never decoded (the point of a container
    * index; a real video sampler seeks keyframes the same way).
    * Payloads stay inside the partition iterator; only the small
    * (media_id, frame_no, width, height) feature rows come out. A
    * malformed container or frame reports (0, 0) dims — a row to
    * filter, not a task failure (corpus-scale posture, as
    * [[ImageIoDecoder]]). */
  def sampleImageFrames(media: DataFrame, everyN: Int = 2): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        try {
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(payload))
          val n = in.readInt()
          val lens = Array.fill(n)(in.readInt())
          val offsets = lens.scanLeft(4 + 4 * n)(_ + _)
          // per-frame guard too: the outer try runs at ITERATOR
          // CONSTRUCTION; the decodes below run lazily as the
          // partition consumer pulls rows, so a garbage frame must
          // catch its own codec error
          (0 until n by everyN).iterator.map { f =>
            try {
              imageIoMemCache
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(payload, offsets(f), lens(f)))
              if (img == null) Row(id, f, 0, 0)
              else Row(id, f, img.getWidth, img.getHeight)
            } catch { case _: Exception => Row(id, f, 0, 0) }
          }
        } catch {
          case _: Exception => Iterator(Row(id, 0, 0, 0))
        }
      }
    }
    spark.createDataFrame(rdd, imageFrameSchema)
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

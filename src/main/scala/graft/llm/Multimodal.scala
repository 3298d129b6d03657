package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque binary columns with
  * typed metadata, plus the decode / feature-extract plumbing a training-data
  * pipeline needs.
  *
  * IMAGE decode is REAL: [[decodeImages]] runs javax.imageio (PNG/BMP/GIF —
  * the pure-JVM codecs) inside the batched mapPartitions shape and emits
  * true decoded dimensions/channels/pixel statistics (q36's oracle checks
  * them against a closed-form pixel generator). AUDIO decode is REAL too:
  * [[decodeAudio]] runs javax.sound.sampled (the JVM's RIFF/WAVE PCM codec)
  * in the same shape (q85's oracle). VIDEO decode is REAL for both AVI
  * frame codecs the JVM can express: [[decodeVideo]] walks the RIFF chunk
  * tree and decodes uncompressed DIB ('00db', q86's oracle) AND
  * compressed MJPEG ('00dc', JPEG-per-frame via the JDK ImageIO codec,
  * q314's oracle) — only INTER-FRAME codecs (H.264/VP9) remain out of
  * scope (the JVM ships no such decoder; `decodeStub` keeps the batching
  * shape a native codec would drop into). The surrounding design is what matters at 100 TB:
  * media rows are large, so operators keep per-task batches bounded and
  * never widen the binary column through a shuffle (features are extracted
  * BEFORE any join/groupBy).
  */
object Multimodal {

  /** Canonical media-column schema: content + typed metadata struct. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("source_uri", StringType)))

  /** Attach a media payload column (here synthesized from text for testing;
    * in production this is the raw bytes from a binaryFile scan). */
  def attachBinary(df: DataFrame, textCol: String, uriCol: String): DataFrame =
    df.withColumn("content", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit("application/octet-stream").as("mime"),
        // byte length of the PAYLOAD (length on binary = octets), not the
        // character count of the source string — they differ for non-ASCII
        length(col("content")).cast(LongType).as("n_bytes"),
        col(uriCol).as("source_uri")))

  case class MediaRow(doc_id: Long, content: Array[Byte])
  case class MediaFeatures(doc_id: Long, n_bytes: Int, head_byte: Int,
                           byte_sum: Long, fake_width: Int, fake_height: Int,
                           fake_channels: Int)

  /** Batched decode/feature-extract over partitions of media rows.
    *
    * STUB: a real implementation calls an image codec per batch here
    * (e.g. JPEG decode → resize → CHW float tensor). The deterministic fake
    * derives "dimensions" from the byte stream so tests can assert plumbing
    * end-to-end. The mapPartitions shape (iterator-in/iterator-out, grouped
    * into bounded batches) is exactly what a vectorized decoder needs.
    */
  def decodeStub(rows: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // === STUB decode: replace with codec call over `batch` ===
        batch.map { r =>
          val n = r.content.length
          val sum = r.content.foldLeft(0L)((a, b) => a + (b & 0xff))
          MediaFeatures(r.doc_id, n, if (n > 0) r.content(0) & 0xff else -1,
            sum, fake_width = 16 + (sum % 16).toInt,
            fake_height = 16 + ((sum / 16) % 16).toInt, fake_channels = 3)
        }
      }
    }
  }

  /** End-to-end media feature pipeline: attach → repartition to keep media
    * batches bounded → decode → features table (binary column dropped before
    * any downstream shuffle). */
  def mediaFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    import spark.implicits._
    val media = attachBinary(df, textCol, idCol)
      .select(col(idCol).cast(LongType).as("doc_id"), col("content"))
      .as[MediaRow]
    decodeStub(media).toDF()
  }

  // ---- real image decode ---------------------------------------------------

  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                           channels: Int, pixel_sum: Long)

  /** REAL batched image decode: javax.imageio per row inside the same
    * bounded-batch mapPartitions shape as [[decodeStub]]. Emits true decoded
    * width/height, color-model component count, and the exact integer sum of
    * all R+G+B samples — the "did the codec actually run" statistic (PNG is
    * lossless, so it is bit-reproducible). Corrupt/undecodable payloads fail
    * loudly rather than emitting garbage features. */
  def decodeImages(rows: Dataset[MediaRow], batchSize: Int = 64): Dataset[ImageFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.content))
          require(img != null, s"undecodable image bytes for doc ${r.doc_id}")
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          ImageFeatures(r.doc_id, w, h,
            img.getColorModel.getNumColorComponents, sum)
        }
      }
    }
  }

  /** Deterministic RGB test image for id: w = 16 + id%16, h = 16 +
    * (id/16)%16, pixel(x,y) = ((x+id)%256, (y+2id)%256, (x+y)%256),
    * PNG-encoded. Every decoded feature of [[decodeImages]] is therefore a
    * closed-form function of id that an external engine can replay (q36's
    * oracle) — while the bytes still go through a real PNG encode/decode. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 16 + (id % 16).toInt
    val h = 16 + ((id / 16) % 16).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x + id) % 256).toInt
        val g = ((y + 2 * id) % 256).toInt
        val b = (x + y) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Image feature pipeline over synthetic PNGs keyed by `idCol`: generate →
    * decode (real codec) → features. Generation and decode stay in ONE
    * mapPartitions pass each; the PNG bytes never cross a shuffle. */
  def imageFeatures(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val media = df.select(col(idCol).cast(LongType).as("doc_id"))
      .as[Long].map(id => MediaRow(id, syntheticPng(id)))
    decodeImages(media).toDF()
  }

  // ---- real audio decode ---------------------------------------------------

  case class AudioFeatures(doc_id: Long, sample_rate: Int, channels: Int,
                           n_frames: Long, sample_sum: Long, peak: Int)

  /** REAL batched audio decode: javax.sound.sampled (the JVM's WAV/PCM
    * codec) inside the same bounded-batch mapPartitions shape. Emits the
    * container-parsed sample rate/channel count, the decoded frame count,
    * the exact integer sum of all 16-bit samples, and the peak absolute
    * amplitude — PCM is lossless, so all are bit-reproducible. */
  def decodeAudio(rows: Dataset[MediaRow], batchSize: Int = 64): Dataset[AudioFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.content))
          try {
            val fmt = in.getFormat
            require(fmt.getSampleSizeInBits == 16,
              s"doc ${r.doc_id}: expected 16-bit PCM, got $fmt")
            val bytes = in.readAllBytes()
            val le = !fmt.isBigEndian
            var sum = 0L
            var peak = 0
            var i = 0
            while (i + 1 < bytes.length) {
              val s =
                if (le) ((bytes(i) & 0xFF) | (bytes(i + 1) << 8)).toShort
                else ((bytes(i + 1) & 0xFF) | (bytes(i) << 8)).toShort
              sum += s
              val a = math.abs(s.toInt)
              if (a > peak) peak = a
              i += 2
            }
            AudioFeatures(r.doc_id, fmt.getSampleRate.toInt, fmt.getChannels,
              bytes.length / fmt.getFrameSize, sum, peak)
          } finally in.close()
        }
      }
    }
  }

  /** Deterministic mono 16-bit 8 kHz WAV for id: n = 256 + id % 256 frames,
    * sample(i) = ((i·31 + id·17) mod 65536) − 32768. Every decoded feature
    * of [[decodeAudio]] is a closed-form function of id an external engine
    * can replay (q85's oracle) — while the bytes still round-trip a real
    * RIFF/WAVE encode and the JVM's audio codec. */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = 256 + (id % 256).toInt
    val sampleRate = 8000
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((i.toLong * 31 + id * 17) % 65536) - 32768).toShort
      pcm(i * 2) = (s & 0xFF).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
      true /* signed */, false /* little-endian */)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Audio feature pipeline over synthetic WAVs keyed by `idCol`: generate →
    * decode (real codec) → features; bytes never cross a shuffle. */
  def audioFeatures(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val media = df.select(col(idCol).cast(LongType).as("doc_id"))
      .as[Long].map(id => MediaRow(id, syntheticWav(id)))
    decodeAudio(media).toDF()
  }

  // ---- real video container decode ----------------------------------------

  case class VideoFeatures(doc_id: Long, width: Int, height: Int,
                           n_frames: Long, pixel_sum: Long)

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** REAL video container decode: a RIFF/AVI parser (chunk walking, 'avih'
    * main header, 'movi' frame list) with TWO real frame codecs:
    * uncompressed DIB ('00db') payloads — bottom-up BGR rows, 4-byte row
    * padding, the standard uncompressed-AVI layout — and COMPRESSED
    * MJPEG ('00dc') payloads, each frame a complete JPEG stream decoded
    * by the JDK's ImageIO JPEG codec (pure JVM, no native deps). Frame
    * extraction and pixel accounting are real for both; inter-frame
    * codecs (H.264/VP9) remain out of scope — the JVM ships no such
    * decoder, and [[decodeStub]] documents that boundary. */
  def decodeVideo(rows: Dataset[MediaRow], batchSize: Int = 16): Dataset[VideoFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val b = r.content
          require(b.length >= 12 && fourcc(b, 0) == "RIFF" &&
            fourcc(b, 8) == "AVI ", s"doc ${r.doc_id}: not a RIFF/AVI file")
          var width = 0; var height = 0
          var frames = 0L; var sum = 0L
          def walk(start: Int, end: Int): Unit = {
            var p = start
            while (p + 8 <= end) {
              val id = fourcc(b, p)
              val size = u32le(b, p + 4).toInt
              val body = p + 8
              // fail loudly on malformed sizes (negative after .toInt, or
              // past the buffer) — a corrupt size would otherwise spin the
              // chunk walk forever or read out of bounds
              require(size >= 0 && body + size <= b.length,
                s"doc ${r.doc_id}: malformed chunk $id size $size at $p")
              id match {
                case "LIST" =>
                  // list type occupies the first 4 body bytes
                  walk(body + 4, body + size)
                case "avih" =>
                  width = u32le(b, body + 32).toInt
                  height = u32le(b, body + 36).toInt
                case "00db" => // uncompressed DIB frame
                  require(width > 0 && height > 0,
                    s"doc ${r.doc_id}: frame chunk before avih dimensions")
                  val rowBytes = ((width * 3 + 3) / 4) * 4
                  // the frame must actually fit its own chunk — a
                  // truncated or dimension-mismatched payload must not
                  // silently sum neighboring bytes
                  require(rowBytes * height <= size,
                    s"doc ${r.doc_id}: frame chunk $size B < " +
                      s"${rowBytes * height} B for ${width}x$height")
                  frames += 1
                  var y = 0
                  while (y < height) {
                    var x = 0
                    val ro = body + y * rowBytes
                    while (x < width) {
                      // BGR triplet — sum all three channels
                      sum += (b(ro + x * 3) & 0xFF) +
                        (b(ro + x * 3 + 1) & 0xFF) +
                        (b(ro + x * 3 + 2) & 0xFF)
                      x += 1
                    }
                    y += 1
                  }
                case "00dc" => // compressed frame: MJPEG (one JPEG/frame)
                  require(size >= 2 && (b(body) & 0xFF) == 0xFF &&
                    (b(body + 1) & 0xFF) == 0xD8,
                    s"doc ${r.doc_id}: 00dc frame is not a JPEG stream " +
                      "(only MJPEG compression is supported)")
                  val img = javax.imageio.ImageIO.read(
                    new java.io.ByteArrayInputStream(b, body, size))
                  require(img != null,
                    s"doc ${r.doc_id}: ImageIO could not decode MJPEG frame")
                  require(width > 0 && height > 0 &&
                    img.getWidth == width && img.getHeight == height,
                    s"doc ${r.doc_id}: frame ${img.getWidth}x${img.getHeight}" +
                      s" != avih ${width}x$height")
                  frames += 1
                  var y = 0
                  while (y < height) {
                    var x = 0
                    while (x < width) {
                      val rgb = img.getRGB(x, y)
                      sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
                        (rgb & 0xFF)
                      x += 1
                    }
                    y += 1
                  }
                case _ =>
              }
              p = body + size + (size & 1) // chunks are word-aligned
            }
          }
          walk(12, b.length)
          require(width > 0 && height > 0 && frames > 0,
            s"doc ${r.doc_id}: no decodable frames")
          VideoFeatures(r.doc_id, width, height, frames, sum)
        }
      }
    }
  }

  /** Deterministic uncompressed AVI for id: w = 8 + id%8, h = 8 + (id/8)%8,
    * n = 2 + id%3 frames; pixel(x, y, f) channels are
    * b = (x+id+f)%256, g = (y+2id)%256, r = (x+y+f)%256 — every decoded
    * feature is a closed-form function of id (q86's oracle) while the bytes
    * round-trip a real RIFF/AVI container with standard DIB framing. */
  def syntheticAvi(id: Long): Array[Byte] = {
    val w = 8 + (id % 8).toInt
    val h = 8 + ((id / 8) % 8).toInt
    val nFrames = 2 + (id % 3).toInt
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val frameBytes = rowBytes * h
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      bos.write((v & 0xFF).toInt); bos.write(((v >> 8) & 0xFF).toInt)
      bos.write(((v >> 16) & 0xFF).toInt); bos.write(((v >> 24) & 0xFF).toInt)
    }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    // sizes: avih=56, strh=56, strf=40
    val strlSize = 4 + 8 + 56 + 8 + 40
    val hdrlSize = 4 + 8 + 56 + 8 + strlSize
    val moviSize = 4 + nFrames * (8 + frameBytes)
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize
    tag("RIFF"); le32(riffSize); tag("AVI ")
    tag("LIST"); le32(hdrlSize); tag("hdrl")
    tag("avih"); le32(56)
    le32(40000); le32(w.toLong * h * 3 * 25); le32(0); le32(0x10) // has index flag-less
    le32(nFrames); le32(0); le32(1); le32(frameBytes)
    le32(w); le32(h); le32(0); le32(0); le32(0); le32(0)
    tag("LIST"); le32(strlSize); tag("strl")
    tag("strh"); le32(56)
    tag("vids"); tag("DIB "); le32(0); le32(0); le32(0)
    le32(1); le32(25); le32(0); le32(nFrames); le32(frameBytes)
    le32(0xFFFFFFFFL); le32(0); le32(0); le32(0)
    tag("strf"); le32(40)
    le32(40); le32(w); le32(h); // BITMAPINFOHEADER
    bos.write(1); bos.write(0); bos.write(24); bos.write(0) // planes=1, bpp=24
    le32(0); le32(frameBytes); le32(0); le32(0); le32(0); le32(0)
    tag("LIST"); le32(moviSize); tag("movi")
    var f = 0
    while (f < nFrames) {
      tag("00db"); le32(frameBytes)
      var y = 0
      while (y < h) {
        var x = 0
        var written = 0
        while (x < w) {
          bos.write(((x + id + f) % 256).toInt) // B
          bos.write(((y + 2 * id) % 256).toInt) // G
          bos.write(((x + y + f) % 256).toInt) // R
          written += 3
          x += 1
        }
        while (written < rowBytes) { bos.write(0); written += 1 }
        y += 1
      }
      f += 1
    }
    bos.toByteArray
  }

  /** Video feature pipeline over synthetic AVIs keyed by `idCol`: generate →
    * container decode (real RIFF/DIB parsing) → features. */
  def videoFeatures(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val media = df.select(col(idCol).cast(LongType).as("doc_id"))
      .as[Long].map(id => MediaRow(id, syntheticAvi(id)))
    decodeVideo(media).toDF()
  }

  /** Deterministic MJPEG AVI for id: same dims/frame-count closed forms as
    * [[syntheticAvi]] (w = 8 + id%8, h = 8 + (id/8)%8, n = 2 + id%3) but
    * every frame is a REAL JPEG stream (JDK ImageIO encoder) in a '00dc'
    * chunk with strh/strf fourcc 'MJPG' — the standard motion-JPEG AVI
    * layout. The source pattern per frame matches syntheticAvi's channels;
    * JPEG is lossy, so decoded PIXEL sums are codec-defined (asserted
    * in-spec by an independent ImageIO decode of the same bytes), while
    * dimensions and frame count stay closed-form oracle surface. */
  def syntheticMjpegAvi(id: Long): Array[Byte] = {
    val w = 8 + (id % 8).toInt
    val h = 8 + ((id / 8) % 8).toInt
    val nFrames = 2 + (id % 3).toInt
    val jpegs: Array[Array[Byte]] = Array.tabulate(nFrames) { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val bC = ((x + id + f) % 256).toInt
          val gC = ((y + 2 * id) % 256).toInt
          val rC = ((x + y + f) % 256).toInt
          img.setRGB(x, y, (rC << 16) | (gC << 8) | bC)
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "jpg", baos),
        "JDK JPEG encoder unavailable")
      baos.toByteArray
    }
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      bos.write((v & 0xFF).toInt); bos.write(((v >> 8) & 0xFF).toInt)
      bos.write(((v >> 16) & 0xFF).toInt); bos.write(((v >> 24) & 0xFF).toInt)
    }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val strlSize = 4 + 8 + 56 + 8 + 40
    val hdrlSize = 4 + 8 + 56 + 8 + strlSize
    // movi holds one word-aligned '00dc' chunk per (variable-size) frame
    val moviSize = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize
    tag("RIFF"); le32(riffSize); tag("AVI ")
    tag("LIST"); le32(hdrlSize); tag("hdrl")
    tag("avih"); le32(56)
    le32(40000); le32(w.toLong * h * 3 * 25); le32(0); le32(0x10)
    le32(nFrames); le32(0); le32(1); le32(w.toLong * h * 3)
    le32(w); le32(h); le32(0); le32(0); le32(0); le32(0)
    tag("LIST"); le32(strlSize); tag("strl")
    tag("strh"); le32(56)
    tag("vids"); tag("MJPG"); le32(0); le32(0); le32(0)
    le32(1); le32(25); le32(0); le32(nFrames); le32(w.toLong * h * 3)
    le32(0xFFFFFFFFL); le32(0); le32(0); le32(0)
    tag("strf"); le32(40)
    le32(40); le32(w); le32(h)
    bos.write(1); bos.write(0); bos.write(24); bos.write(0)
    tag("MJPG") // biCompression fourcc
    le32(w.toLong * h * 3); le32(0); le32(0); le32(0); le32(0)
    tag("LIST"); le32(moviSize); tag("movi")
    jpegs.foreach { j =>
      tag("00dc"); le32(j.length); bos.write(j)
      if ((j.length & 1) == 1) bos.write(0) // word alignment pad
    }
    bos.toByteArray
  }

  /** MJPEG video pipeline keyed by `idCol`: generate real JPEG-in-AVI
    * streams → container + JPEG decode → features. Same bounded-batch
    * mapPartitions shape as every media decoder here. */
  def videoFeaturesMjpeg(spark: SparkSession, df: DataFrame,
                         idCol: String): DataFrame = {
    import spark.implicits._
    val media = df.select(col(idCol).cast(LongType).as("doc_id"))
      .as[Long].map(id => MediaRow(id, syntheticMjpegAvi(id)))
    decodeVideo(media).toDF()
  }

  // ---- real-FILE ingestion (binaryFile scan) -------------------------------

  /** Write deterministic media fixture files (one PNG + WAV + AVI per id)
    * under `dir` — the same byte streams the synthetic pipelines use, but on
    * disk, so the production `binaryFile` entry point can be exercised
    * end-to-end against real files. */
  def writeMediaFixtures(dir: java.nio.file.Path, ids: Seq[Long]): Unit =
    ids.foreach { id =>
      java.nio.file.Files.write(dir.resolve(f"img_$id%05d.png"), syntheticPng(id))
      java.nio.file.Files.write(dir.resolve(f"aud_$id%05d.wav"), syntheticWav(id))
      java.nio.file.Files.write(dir.resolve(f"vid_$id%05d.avi"), syntheticAvi(id))
    }

  /** PRODUCTION media ingestion: a distributed `binaryFile` scan over a
    * directory (glob-filtered), keyed by the numeric id embedded in each
    * file name. This is the real 100 TB entry point — Spark's binaryFile
    * source splits the FILE LIST (not file contents) across executors, each
    * task reads its files locally, and the bytes flow straight into the
    * bounded-batch decoders without ever crossing a shuffle. Files whose
    * names carry no numeric id fail loudly (null doc_id) rather than
    * silently decoding under id 0. */
  def readMediaFiles(spark: SparkSession, dir: String, glob: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "_(\\d+)\\.[a-z0-9]+$", 1).as("id_str"),
        col("content"), col("path"))
      .as[(String, Array[Byte], String)]
      .map { case (idStr, content, path) =>
        require(idStr.nonEmpty, s"media file name carries no numeric id: $path")
        MediaRow(idStr.toLong, content)
      }
  }

  /** End-to-end FILE-based multimodal features: scan a directory of mixed
    * media with three glob-filtered `binaryFile` reads, run the matching
    * real decoder on each, and union the features into one uniform table
    * `(kind, doc_id, d1, d2, n, checksum)`:
    * image → (width, height, channels, pixel_sum);
    * audio → (sample_rate, channels, n_frames, sample_sum);
    * video → (width, height, n_frames, pixel_sum). */
  def mediaFileFeatures(spark: SparkSession, dir: String): DataFrame = {
    def uniform(kind: String, df: DataFrame, d1: String, d2: String,
                n: String, checksum: String): DataFrame =
      df.select(lit(kind).as("kind"), col("doc_id"),
        col(d1).cast(LongType).as("d1"), col(d2).cast(LongType).as("d2"),
        col(n).cast(LongType).as("n"),
        col(checksum).cast(LongType).as("checksum"))
    val img = uniform("image",
      decodeImages(readMediaFiles(spark, dir, "*.png")).toDF(),
      "width", "height", "channels", "pixel_sum")
    val aud = uniform("audio",
      decodeAudio(readMediaFiles(spark, dir, "*.wav")).toDF(),
      "sample_rate", "channels", "n_frames", "sample_sum")
    val vid = uniform("video",
      decodeVideo(readMediaFiles(spark, dir, "*.avi")).toDF(),
      "width", "height", "n_frames", "pixel_sum")
    img.unionAll(aud).unionAll(vid)
  }
}

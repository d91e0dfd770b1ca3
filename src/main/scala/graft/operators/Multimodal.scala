package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` + typed
  * metadata, with decode / feature-extract / resize / frame-sample as
  * partition-local batch transforms.
  *
  * The Spark-side plumbing here is real and tested — schema, partitioning,
  * batch shape, the `binaryFile` source, and the explode-shaped growth of
  * frame sampling. The IMAGE codec path is real (`javax.imageio`: decode,
  * dimensions, resize, luminance-grid features for PNG/JPEG/BMP/GIF), the
  * AUDIO path is real for JRE-supported formats (`javax.sound.sampled`:
  * WAV/PCM/AIFF/AU decode, duration, RMS-energy-grid features), and the
  * VIDEO path is real for MJPEG-in-AVI ([[Codecs.decodeVideo]]: RIFF
  * container parse, per-frame ImageIO JPEG decode — the one mainstream
  * video format needing no external codec). Compressed audio (mp3/flac/
  * ogg) and other video containers (mp4/mkv — no such libraries in this
  * container) fall back to deterministic functions of the input bytes; the
  * swap-in point for further decoders (JNI/javacv/etc.) is the single
  * [[Codecs]] object.
  *
  * Scale design:
  *  - media rows never shuffle with their payload unless the caller asks —
  *    transforms are `mapPartitions` (narrow); joins should project payload
  *    away first and re-attach by id;
  *  - batch shape: decode works on `batchSize` rows at a time inside each
  *    partition (the mapInPandas/Arrow batch pattern expressed in Scala) so
  *    a future vectorized/FFI decoder amortizes per-call overhead;
  *  - frame sampling bounds output growth by `maxFrames`, and
  *    `repartitionForDecode` sizes partitions by row count since payloads
  *    are megabytes, not bytes (maxPartitionBytes logic does not see blob
  *    width at planning time for in-memory datasets).
  */
object Multimodal {

  /** One media object: opaque payload + typed envelope. */
  case class MediaFile(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      meta: Map[String, String])

  /** Decoded-media features: fixed-width envelope + feature vector. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      duration_ms: Long,
      n_bytes: Long,
      features: Array[Float])

  /** One sampled video frame (payload is a decoded-frame stub). */
  case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long, pixels: Array[Byte])

  // ------------------------------------------------------------------ codecs

  /** Codec boundary. The IMAGE path is real: decode / dimensions / resize /
    * luminance-grid features run on `javax.imageio` (in every JRE — PNG,
    * JPEG, BMP, GIF). The AUDIO path is real for JRE-decodable formats:
    * `javax.sound.sampled` (WAV/PCM, AIFF, AU) yields duration and
    * RMS-energy features. Payloads neither API can open — and the video
    * calls (no codec libraries in this container) — fall back to the
    * original deterministic fakes so every function stays total and pure in
    * the payload bytes. Swapping in further decoders still touches only
    * this object.
    */
  object Codecs {

    /** ImageIO defaults to FILE-backed stream caches: every encode/decode
      * creates (and deletes) a temp file through one synchronized registry
      * — at 32 decode threads the codec path serializes on filesystem
      * churn (measured 2.7× on m_media_features isolated at cpus=32).
      * All payloads here are in-memory byte arrays, so the memory cache is
      * strictly better. Idempotent, called from every encode/decode lambda
      * so it runs once per EXECUTOR JVM, not just on the driver.
      */
    @volatile private var imageIoTuned = false
    def ensureFastImageIO(): Unit =
      if (!imageIoTuned) { javax.imageio.ImageIO.setUseCache(false); imageIoTuned = true }

    private def h(bytes: Array[Byte], seed: Long): Long = {
      var acc = seed
      var i = 0
      while (i < bytes.length) { acc = acc * 31 + bytes(i); i += 1 }
      acc
    }

    /** Real image decode; None when the payload is not a decodable image. */
    def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      ensureFastImageIO()
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    }

    /** Shared PNG/JPEG encode (all synthetic corpora + resize go through
      * here so the memory-cache tuning covers every ImageIO touch).
      */
    def encodeImage(img: java.awt.image.BufferedImage, format: String): Array[Byte] = {
      ensureFastImageIO()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, bos)
      bos.toByteArray
    }

    /** Image dimensions: decoded when possible, hash-derived fake otherwise. */
    def imageDims(bytes: Array[Byte]): (Int, Int) =
      decodeImage(bytes) match {
        case Some(img) => (img.getWidth, img.getHeight)
        case None      => fakeDims(bytes)
      }

    private[Multimodal] def fakeDims(bytes: Array[Byte]): (Int, Int) = {
      val x = h(bytes, 17)
      (64 + (Math.floorMod(x, 512L)).toInt, 64 + (Math.floorMod(x >> 16, 512L)).toInt)
    }

    /** Fake media duration (video, and audio formats the JRE can't open). */
    def durationMs(bytes: Array[Byte]): Long = 1000L + Math.floorMod(h(bytes, 29), 600000L)

    /** A decoded audio clip: envelope + mono-mixed normalized samples. */
    case class AudioClip(durationMs: Long, sampleRate: Int, channels: Int, samples: Array[Float])

    /** Real audio decode via `javax.sound.sampled` (in every JRE — WAV/PCM,
      * AIFF, AU). None for formats the JRE has no SPI for (mp3/flac/ogg) —
      * those keep the deterministic fallback, same contract as images.
      * Non-16-bit/float inputs are converted to PCM16 by the sound API.
      */
    def decodeAudio(bytes: Array[Byte]): Option[AudioClip] =
      try {
        val ais0 = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val f0 = ais0.getFormat
        val pcm16 = new javax.sound.sampled.AudioFormat(
          f0.getSampleRate, 16, f0.getChannels, true, false)
        val ais =
          if (f0.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            f0.getSampleSizeInBits == 16 && !f0.isBigEndian) ais0
          else javax.sound.sampled.AudioSystem.getAudioInputStream(pcm16, ais0)
        val fmt = ais.getFormat
        val raw = ais.readAllBytes()
        val ch = fmt.getChannels
        val frameSize = ch * 2
        val n = raw.length / frameSize
        val samples = new Array[Float](n)
        var i = 0
        while (i < n) {
          var acc = 0.0f
          var c = 0
          while (c < ch) {
            val o = i * frameSize + c * 2
            val v = ((raw(o + 1) << 8) | (raw(o) & 0xff)).toShort
            acc += v / 32768.0f
            c += 1
          }
          samples(i) = acc / ch
          i += 1
        }
        Some(AudioClip(Math.round(n * 1000.0 / fmt.getSampleRate),
          fmt.getSampleRate.toInt, ch, samples))
      } catch { case _: Exception => None }

    /** The audio analog of [[luminanceGrid]]: RMS energy over `dim` equal
      * time cells, mapped to [-1, 1] — a cheap content signature for
      * near-dup / similarity over audio columns.
      */
    def energyGrid(clip: AudioClip, dim: Int): Array[Float] = {
      val n = clip.samples.length
      Array.tabulate(dim) { i =>
        val from = (i.toLong * n / dim).toInt
        val to = math.min(n, math.max(from + 1, ((i + 1).toLong * n / dim).toInt))
        if (from >= n) -1.0f
        else {
          var ss = 0.0
          var j = from
          while (j < to) { ss += clip.samples(j).toDouble * clip.samples(j); j += 1 }
          (math.sqrt(ss / (to - from)) * 2.0 - 1.0).toFloat
        }
      }
    }

    /** Feature extractor. Decodable images get a real perceptual signature:
      * the image scaled onto a √dim × √dim luminance grid, cell means in
      * [-1, 1] row-major (the aHash family's base representation). Other
      * payloads get the deterministic hash fake.
      */
    def features(bytes: Array[Byte], dim: Int): Array[Float] =
      decodeImage(bytes) match {
        case Some(img) => luminanceGrid(img, dim)
        case None => decodeAudio(bytes) match {
          case Some(clip) => energyGrid(clip, dim)
          case None       => fakeFeatures(bytes, dim)
        }
      }

    /** The real image signature from an already-decoded frame (so callers
      * that also need dimensions pay ONE decode, not one per derived value).
      */
    def luminanceGrid(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
      val grid = math.max(1, math.ceil(math.sqrt(dim.toDouble)).toInt)
      val small = new java.awt.image.BufferedImage(
        grid, grid, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      try g.drawImage(img, 0, 0, grid, grid, null) finally g.dispose()
      Array.tabulate(dim) { i =>
        val rgb = small.getRGB(i % grid, (i / grid) % grid)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000.0
        (lum / 127.5 - 1.0).toFloat
      }
    }

    private[Multimodal] def fakeFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
      Array.tabulate(dim) { i =>
        (Math.floorMod(h(bytes, 1000L + i), 2000001L) - 1000000L) / 1000000.0f
      }

    /** Resize: real scale + PNG re-encode for decodable images, size-derived
      * fake otherwise.
      */
    def resize(bytes: Array[Byte], w: Int, hgt: Int): Array[Byte] =
      decodeImage(bytes) match {
        case Some(img) =>
          val out = new java.awt.image.BufferedImage(
            w, hgt, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try g.drawImage(img, 0, 0, w, hgt, null) finally g.dispose()
          encodeImage(out, "png")
        case None =>
          val out = new Array[Byte](math.min(bytes.length, math.max(16, (w * hgt) / 1024)))
          var i = 0
          while (i < out.length) { out(i) = bytes(i % math.max(bytes.length, 1)); i += 1 }
          out
      }

    /** Fake frame decode at a timestamp (for containers [[decodeVideo]]
      * can't open — everything but MJPEG-in-AVI).
      */
    def frameAt(bytes: Array[Byte], tsMs: Long): Array[Byte] =
      Array.tabulate(32)(i => (h(bytes, tsMs + i) & 0xff).toByte)

    /** A parsed video: envelope + per-frame JPEG payloads (each payload is
      * a standalone image `javax.imageio` decodes — the MJPEG property).
      */
    case class VideoClip(
        width: Int, height: Int, usPerFrame: Long, frames: IndexedSeq[Array[Byte]]) {
      def durationMs: Long = frames.length.toLong * usPerFrame / 1000L
      def frameImageAt(i: Int): Option[java.awt.image.BufferedImage] =
        decodeImage(frames(math.min(frames.length - 1, math.max(0, i))))
    }

    /** REAL video container decode: MJPEG-in-AVI — the one mainstream video
      * format fully decodable with JRE-only codecs, because the RIFF/AVI
      * container is a plain chunk list and every MJPEG frame is a complete
      * JPEG for `javax.imageio`. Parses the RIFF tree (avih → frame
      * timing, strf/BITMAPINFOHEADER → dimensions, movi `..dc`/`..db`
      * chunks → frame payloads). None for any other container (mp4/mkv
      * need external codec libraries; those payloads keep the deterministic
      * fallback, same contract as images/audio).
      */
    def decodeVideo(bytes: Array[Byte]): Option[VideoClip] =
      try {
        def le32(o: Int): Long =
          (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
            ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
        def fourcc(o: Int): String =
          new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
        if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") None
        else {
          var usPerFrame = 0L
          var w = 0
          var hgt = 0
          // a real AVI carries one strl per stream; only the VIDEO stream's
          // strf is a BITMAPINFOHEADER (an audio strf is WAVEFORMATEX, and
          // last-wins parsing would report sample rates as dimensions).
          // Streams are numbered by strh order, and movi frame chunks carry
          // their stream number as a two-digit fourcc prefix (NNdc/NNdb) —
          // frames are accepted ONLY for the first video stream, so a
          // two-video-stream (or audio+video) file never folds other
          // streams' chunks into the clip, and frame chunks preceding the
          // header (crafted input) are dropped rather than misattributed
          var streamCount = 0
          var videoStream = -1
          var inVideoStream = false
          val frames = IndexedSeq.newBuilder[Array[Byte]]
          // Hostile-input posture: this parser runs on untrusted corpus
          // bytes inside executor tasks, so every failure mode must end in
          // None or a skipped chunk, never a hang or a task-killing Error.
          //  - NEGATIVE declared sizes bail (sz = -8 would pin the walk
          //    offset in place forever — no exception for a catch to see);
          //  - sizes past the buffer CLAMP rather than bail: a truncated
          //    download still salvages every complete frame before it;
          //  - handlers only fire when the chunk really holds the fixed
          //    offsets they read (a 4-byte strf must not read the next
          //    chunk's header as dimensions);
          //  - recursion depth is capped: real AVIs nest 3 levels, and a
          //    crafted 87k-deep LIST chain would otherwise end in
          //    StackOverflowError — an Error, NOT caught by the Exception
          //    handler below, killing the task and with it the whole job.
          def walk(from: Int, to: Int, depth: Int): Unit = {
            var o = from
            var ok = depth <= 16
            while (ok && o + 8 <= to) {
              val id = fourcc(o)
              val sz = le32(o + 4).toInt
              val body = o + 8
              if (sz < 0) ok = false
              else {
                val end = math.min(to.toLong, body.toLong + sz).toInt
                id match {
                  case "LIST" if body + 4 <= end =>
                    walk(body + 4, end, depth + 1)
                  case "avih" if body + 4 <= end =>
                    usPerFrame = le32(body) // dwMicroSecPerFrame
                  case "strh" if body + 4 <= end =>
                    inVideoStream = fourcc(body) == "vids" && videoStream < 0
                    if (inVideoStream) videoStream = streamCount
                    streamCount += 1
                  case "strf" if inVideoStream && body + 12 <= end =>
                    // BITMAPINFOHEADER: biWidth @ +4, biHeight @ +8
                    w = le32(body + 4).toInt; hgt = le32(body + 8).toInt
                  case s if s.length == 4 && (s.endsWith("dc") || s.endsWith("db")) &&
                      s(0).isDigit && s(1).isDigit &&
                      (s(0) - '0') * 10 + (s(1) - '0') == videoStream &&
                      body.toLong + sz <= to =>
                    // complete frame payloads only — a truncated tail frame
                    // is dropped, not decoded as garbage
                    frames += java.util.Arrays.copyOfRange(bytes, body, body + sz)
                  case _ => ()
                }
                // sz >= 0 ⇒ the offset strictly advances every iteration
                o = body + sz + (sz & 1) // chunk bodies pad to even offsets
              }
            }
          }
          walk(12, math.min(bytes.length, 8 + le32(4).toInt), 0)
          val fr = frames.result()
          if (fr.isEmpty || usPerFrame <= 0L) None
          else Some(VideoClip(w, hgt, usPerFrame, fr))
        }
      } catch { case _: Exception => None }
  }

  /** Minimal MJPEG-in-AVI writer (RIFF container per the AVI 1.0 layout:
    * hdrl(avih, strl(strh, strf)) + movi of `00dc` JPEG chunks). Paired
    * with [[Codecs.decodeVideo]] for the synthetic corpus, and a valid AVI
    * for any standards-compliant player — the container carries real
    * ImageIO-encoded JPEGs.
    */
  private[graft] object AviWriter {
    private def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def cc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    private def chunk(id: String, body: Array[Byte]): Array[Byte] =
      cc(id) ++ le32(body.length.toLong) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    private def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(typ) ++ body)

    def write(w: Int, h: Int, usPerFrame: Long, jpegs: Seq[Array[Byte]]): Array[Byte] = {
      val maxSz = jpegs.map(_.length).max
      val avih = chunk("avih",
        le32(usPerFrame) ++ le32(maxSz.toLong * 1000000L / usPerFrame) ++ le32(0) ++
          le32(0x10 /* AVIF_HASINDEX off; plain sequential */ & 0) ++
          le32(jpegs.length.toLong) ++ le32(0) ++ le32(1) ++ le32(maxSz.toLong) ++
          le32(w.toLong) ++ le32(h.toLong) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
      val strh = chunk("strh",
        cc("vids") ++ cc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++
          le32(usPerFrame) /* dwScale */ ++ le32(1000000L) /* dwRate */ ++
          le32(0) ++ le32(jpegs.length.toLong) ++ le32(maxSz.toLong) ++
          le32(0xffffffffL /* default quality */) ++ le32(0) ++
          le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
      val strf = chunk("strf",
        le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++ le16(24) ++
          cc("MJPG") ++ le32(w.toLong * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
      val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
      val movi = list("movi", jpegs.toArray.flatMap(j => chunk("00dc", j)))
      val body = cc("AVI ") ++ hdrl ++ movi
      cc("RIFF") ++ le32(body.length.toLong) ++ body
    }
  }

  // ------------------------------------------------------------------ source

  /** Canonical kind per file extension: downstream transforms dispatch on
    * "image"/"audio"/"video", not on raw extensions.
    */
  val KindByExtension: Map[String, String] = Map(
    "jpg" -> "image", "jpeg" -> "image", "png" -> "image", "gif" -> "image",
    "webp" -> "image", "bmp" -> "image", "tif" -> "image", "tiff" -> "image",
    "image" -> "image",
    "mp3" -> "audio", "wav" -> "audio", "flac" -> "audio", "ogg" -> "audio",
    "m4a" -> "audio", "aac" -> "audio", "audio" -> "audio",
    "mp4" -> "video", "avi" -> "video", "mkv" -> "video", "mov" -> "video",
    "webm" -> "video", "video" -> "video")

  /** Read a directory of media files via the binaryFile source → MediaFile
    * rows. Kind is the canonical media kind mapped from the extension
    * ("other" when unrecognized); path/length/modtime land in the metadata
    * map (typed envelope, payload untouched).
    *
    * `media_id` is a 63-bit path hash — convenient as a join key, but a
    * birthday collision becomes plausible around ~3B files, so
    * `meta("path")` remains the authoritative identity; pipelines at that
    * scale should key on the path (or a 128-bit digest of it) and treat
    * media_id as a bucketing convenience.
    */
  def readMediaDir(spark: SparkSession, dir: String, glob: String = "*"): Dataset[MediaFile] = {
    import spark.implicits._
    val ext = lower(element_at(split(col("path"), "\\."), -1))
    val kindCol = KindByExtension.foldLeft(lit("other")) { case (acc, (e, k)) =>
      when(ext === e, lit(k)).otherwise(acc)
    }
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(
        abs(xxhash64(col("path"))).as("media_id"),
        kindCol.as("kind"),
        col("content").as("bytes"),
        map(
          lit("path"), col("path").cast("string"),
          lit("length"), col("length").cast("string"),
          lit("mtime"), col("modificationTime").cast("string")).as("meta"))
      .as[MediaFile]
  }

  /** Deterministic tiny-PNG corpus keyed by an id column: each id becomes a
    * real encoded PNG (dimensions and pixels derived from the id), so
    * downstream transforms exercise the real `javax.imageio` decode path
    * end-to-end without external media files. Encoding happens inside
    * `map` on executors — narrow, no shuffle.
    */
  def syntheticPngCorpus(ids: Dataset[java.lang.Long]): Dataset[MediaFile] = {
    import ids.sparkSession.implicits._
    ids.map { boxed =>
      val id = boxed.longValue()
      val w = 4 + (Math.floorMod(id, 13L)).toInt
      val h = 4 + (Math.floorMod(id, 7L)).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = id * 6364136223846793005L + x * 9632L + y * 97L
          img.setRGB(x, y, (v & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      MediaFile(id, "image", Codecs.encodeImage(img, "png"), Map("synthetic" -> "png"))
    }
  }

  /** Deterministic WAV corpus keyed by an id column — the audio analog of
    * [[syntheticPngCorpus]]: each id becomes a real PCM16 mono WAV (8 kHz
    * sine, id-derived frequency and duration `100 + id % 400` ms), so the
    * real `javax.sound.sampled` decode path runs end-to-end and the decoded
    * envelope is SQL-predictable.
    */
  def syntheticWavCorpus(ids: Dataset[java.lang.Long]): Dataset[MediaFile] = {
    import ids.sparkSession.implicits._
    ids.map { boxed =>
      val id = boxed.longValue()
      val durMs = (100 + Math.floorMod(id, 400L)).toInt
      val n = 8 * durMs // frames at 8 kHz
      val freq = 200.0 + Math.floorMod(id, 40L) * 50.0
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = (math.sin(2.0 * math.Pi * freq * i / 8000.0) * 12000.0).toInt.toShort
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      MediaFile(id, "audio", bos.toByteArray, Map("synthetic" -> "wav"))
    }
  }

  /** Synthetic WAV corpus with a PLANTED SILENT GAP: 1000 ms mono 8 kHz —
    * tone up to `gapStartMs = 50·(6 + id mod 4)`, 200 ms of silence, tone
    * to the end. The gap is aligned to 50 ms windows, so
    * [[audioSegments]]' output is a pure SQL formula of the id (the same
    * full-hash-gate trick as [[syntheticShotAviCorpus]]).
    */
  def syntheticGapWavCorpus(ids: Dataset[java.lang.Long]): Dataset[MediaFile] = {
    import ids.sparkSession.implicits._
    ids.map { boxed =>
      val id = boxed.longValue()
      val gapStartMs = 50 * (6 + Math.floorMod(id, 4L).toInt)
      val n = 8 * 1000
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val tMs = i / 8
        val silent = tMs >= gapStartMs && tMs < gapStartMs + 200
        val v =
          if (silent) 0.toShort
          else (math.sin(2.0 * math.Pi * 400.0 * i / 8000.0) * 12000.0).toInt.toShort
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      MediaFile(id, "audio", bos.toByteArray, Map("synthetic" -> "gapwav"))
    }
  }

  /** Silence-split audio segmentation over REAL decoded audio: samples are
    * cut into `windowMs` cells, each cell's RMS compared to `rmsThreshold`,
    * and maximal runs of voiced cells emitted as
    * (media_id, segment_idx, start_window, end_window) — end exclusive, in
    * window units. The voice-activity-detection primitive for audio
    * curation (strip silence before feature extraction / dedup). Decode and
    * windowing stay in the payload's task; only answer-sized segment rows
    * shuffle. Undecodable payloads emit nothing (same honest contract as
    * [[shotBoundaries]]).
    */
  def audioSegments(
      media: Dataset[MediaFile], windowMs: Int, rmsThreshold: Double): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").flatMap { m =>
      Codecs.decodeAudio(m.bytes) match {
        case Some(clip) =>
          val perWin = math.max(1, clip.sampleRate * windowMs / 1000)
          val nWin = clip.samples.length / perWin // trailing partial dropped
          val voiced = (0 until nWin).map { w =>
            var ss = 0.0
            var j = w * perWin
            while (j < (w + 1) * perWin) { ss += clip.samples(j).toDouble * clip.samples(j); j += 1 }
            math.sqrt(ss / perWin) > rmsThreshold
          }
          val segs = Seq.newBuilder[(Long, Int, Int, Int)]
          var segIdx = 0
          var start = -1
          var w = 0
          while (w <= nWin) {
            val v = w < nWin && voiced(w)
            if (v && start < 0) start = w
            if (!v && start >= 0) {
              segs += ((m.media_id, segIdx, start, w)); segIdx += 1; start = -1
            }
            w += 1
          }
          segs.result().iterator
        case None => Iterator.empty
      }
    }.toDF("media_id", "segment_idx", "start_window", "end_window")
  }

  /** Deterministic MJPEG-in-AVI corpus keyed by an id column — the video
    * analog of [[syntheticPngCorpus]]: each id becomes a REAL AVI container
    * of `1 + id % maxFramesPerVideo` ImageIO-encoded JPEG frames at `fps`
    * frames/sec, so the full container parse + per-frame JPEG decode path
    * runs end-to-end and the envelope (duration, frame count, sample
    * timestamps) is SQL-predictable: duration_ms = nFrames * 1000 / fps.
    */
  def syntheticAviCorpus(
      ids: Dataset[java.lang.Long], fps: Int = 2, maxFramesPerVideo: Int = 8): Dataset[MediaFile] = {
    import ids.sparkSession.implicits._
    ids.map { boxed =>
      val id = boxed.longValue()
      val nFrames = 1 + Math.floorMod(id, maxFramesPerVideo.toLong).toInt
      val w = 8 + 2 * Math.floorMod(id, 5L).toInt
      val h = 8 + 2 * Math.floorMod(id, 3L).toInt
      val jpegs = (0 until nFrames).map { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = id * 6364136223846793005L + f * 7919L + x * 9632L + y * 97L
            img.setRGB(x, y, (v & 0xffffff).toInt)
            x += 1
          }
          y += 1
        }
        Codecs.encodeImage(img, "jpg")
      }
      MediaFile(id, "video",
        AviWriter.write(w, h, 1000000L / fps, jpegs), Map("synthetic" -> "avi"))
    }
  }

  /** Synthetic AVI corpus with a PLANTED SHOT CUT per video: `framesPerVideo`
    * solid-luminance JPEG frames — scene 1 (luminance ≈ 40) up to the cut
    * index `1 + id mod (framesPerVideo − 1)`, scene 2 (≈ 220) from it. The
    * cut position is a pure SQL formula of the id, which is what lets
    * [[shotBoundaries]] run under the full DuckDB hash gate rather than a
    * weaker determinism contract: the oracle states the expected boundary
    * table outright.
    */
  def syntheticShotAviCorpus(
      ids: Dataset[java.lang.Long], framesPerVideo: Int, fps: Int = 2): Dataset[MediaFile] = {
    require(framesPerVideo >= 2)
    import ids.sparkSession.implicits._
    ids.map { boxed =>
      val id = boxed.longValue()
      val cut = 1 + Math.floorMod(id, (framesPerVideo - 1).toLong).toInt
      val (w, h) = (16, 16)
      val jpegs = (0 until framesPerVideo).map { f =>
        val lum = if (f < cut) 40 else 220
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (lum << 16) | (lum << 8) | lum
        var y = 0
        while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
        Codecs.encodeImage(img, "jpg")
      }
      MediaFile(id, "video",
        AviWriter.write(w, h, 1000000L / fps, jpegs), Map("synthetic" -> "shots"))
    }
  }

  /** Shot-boundary detection over real decoded video frames: a boundary is
    * a consecutive-frame pair whose mean-luminance difference exceeds
    * `threshold` (the classic intensity-delta cut detector). Luminance is
    * [[Codecs.luminanceGrid]]'s NORMALIZED scale (zero-centered, ≈[-1, 1]),
    * so a full black→white cut is a delta of ~2 and real cuts sit around
    * 0.5-1.5 — pick thresholds in those units, not 0-255. One container
    * parse + one JPEG decode per frame, all inside the task that holds the
    * payload — no shuffle; the output is answer-sized (media_id,
    * boundary_idx) rows, the only thing that ever leaves the executor.
    * Undecodable containers emit nothing (they have no real frames to
    * compare — the honest contract, matching the decode-path split in
    * [[extractFeatures]]).
    */
  def shotBoundaries(media: Dataset[MediaFile], threshold: Double): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      Codecs.decodeVideo(m.bytes) match {
        case Some(clip) =>
          val lums = (0 until clip.frames.length).flatMap(i =>
            clip.frameImageAt(i).map { img =>
              // mean over the 16-cell luminance grid = mean luminance
              val g = Codecs.luminanceGrid(img, 16)
              g.sum.toDouble / g.length
            })
          (1 until lums.length).iterator
            .filter(i => math.abs(lums(i) - lums(i - 1)) > threshold)
            .map(i => (m.media_id, i))
        case None => Iterator.empty
      }
    }.toDF("media_id", "boundary_idx")
  }

  /** Rebalance so each partition holds ~`rowsPerPartition` payloads — blob
    * columns make byte-based partition sizing meaningless.
    */
  def repartitionForDecode[T](ds: Dataset[T], totalRows: Long, rowsPerPartition: Int): Dataset[T] =
    ds.repartition(math.max(1, (totalRows / math.max(1, rowsPerPartition)).toInt))

  // -------------------------------------------------------------- transforms

  /** Decode + feature-extract, batched inside each partition (no shuffle).
    * `batchSize` is the vectorization unit a real FFI decoder would see.
    */
  def extractFeatures(media: Dataset[MediaFile], dim: Int = 16, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "decoder call" per batch — the amortization point; each image
        // payload is decoded ONCE, dims + features derived from that frame
        batch.iterator.map { m =>
          // real-video payloads: envelope from the container, features from
          // the first frame's real JPEG decode (one container parse)
          val video = if (m.kind == "video") Codecs.decodeVideo(m.bytes) else None
          val decoded = video match {
            case Some(clip) => clip.frameImageAt(0)
            case None if m.kind == "image" || m.kind == "video" => Codecs.decodeImage(m.bytes)
            case None => None
          }
          val audio = if (m.kind == "audio") Codecs.decodeAudio(m.bytes) else None
          val (w, h) = (video, decoded) match {
            case (Some(clip), _) => (clip.width, clip.height)
            case (None, Some(img)) => (img.getWidth, img.getHeight)
            case (None, None) if m.kind == "image" || m.kind == "video" => Codecs.fakeDims(m.bytes)
            case _ => (0, 0)
          }
          val dur = (m.kind, video, audio) match {
            case ("video", Some(clip), _) => clip.durationMs
            case ("audio", _, Some(clip)) => clip.durationMs
            case ("audio", _, None) | ("video", None, _) => Codecs.durationMs(m.bytes)
            case _ => 0L
          }
          val feats = (decoded, audio) match {
            case (Some(img), _) => Codecs.luminanceGrid(img, dim)
            case (_, Some(clip)) => Codecs.energyGrid(clip, dim)
            case _ => Codecs.fakeFeatures(m.bytes, dim)
          }
          MediaFeatures(m.media_id, m.kind, w, h, dur, m.bytes.length.toLong, feats)
        }
      }
    }
  }

  /** Resize stub for images: narrow, payload-in/payload-out. */
  def resizeImages(media: Dataset[MediaFile], w: Int, h: Int): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.kind == "image")
        m.copy(bytes = Codecs.resize(m.bytes, w, h),
          meta = m.meta + ("resized" -> s"${w}x$h"))
      else m
    }
  }

  /** Uniform frame sampling for videos: ≤ `maxFrames` rows per video at an
    * even stride over the (stubbed) duration. Output growth is bounded and
    * explicit — the 100 TB failure mode of frame extraction is unbounded
    * fan-out, so the cap is part of the operator contract, not the caller's
    * problem.
    */
  def sampleFrames(media: Dataset[MediaFile], maxFrames: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      Codecs.decodeVideo(m.bytes) match {
        case Some(clip) =>
          // real path (MJPEG-in-AVI): duration from the container, payload
          // = the sampled frame's actual JPEG bytes
          val dur = clip.durationMs
          val n = math.min(maxFrames, math.max(1, (dur / 1000L).toInt))
          val stride = dur / n
          (0 until n).iterator.map { i =>
            val ts = i * stride
            val idx = math.min(clip.frames.length - 1, (ts * 1000L / clip.usPerFrame).toInt)
            Frame(m.media_id, i, ts, clip.frames(idx))
          }
        case None =>
          // undecodable container: deterministic stub, same fan-out contract
          val dur = Codecs.durationMs(m.bytes)
          val n = math.min(maxFrames, math.max(1, (dur / 1000L).toInt))
          val stride = dur / n
          (0 until n).iterator.map(i =>
            Frame(m.media_id, i, i * stride, Codecs.frameAt(m.bytes, i * stride)))
      }
    }
  }

  /** Feature rows as a DataFrame joinable against the ANN/dedup operators
    * (payload projected away — this is the frame that shuffles).
    */
  def featureFrame(feats: Dataset[MediaFeatures]): DataFrame =
    feats.toDF().select(
      col("media_id"), col("kind"), col("width"), col("height"),
      col("duration_ms"), col("n_bytes"), col("features").as("embedding"))

  /** 64-bit average perceptual hash (aHash) over the luminance grid: one
    * bit per cell, set iff the cell is brighter than the image mean. Feed
    * the 8×8 grid — [[extractFeatures]] with `dim = 64`. Resize/crop/
    * brightness variants of an image land within small Hamming distance.
    *
    * The grid mean is staged through its own projection so the folds do not
    * re-sum it per cell, and the hash is assembled from two 32-bit
    * accumulate-folds (`acc*2 + bit` over 64 cells would overflow a signed
    * long at the top bit under ANSI mode; 32-bit halves never do).
    */
  def withPHash(features: DataFrame, gridCol: String = "embedding",
      idCol: String = "media_id"): DataFrame = {
    def foldBits(cells: Column, mean: Column): Column =
      aggregate(cells, lit(0L),
        (a, v) => a * 2 + when(v > mean, lit(1L)).otherwise(lit(0L)))
    val staged = features
      // the two 32-cell fold slices silently truncate/misalign on any other
      // grid size — a wrong-dim caller must fail loudly, not hash garbage
      .withColumn(gridCol,
        when(size(col(gridCol)) === 64, col(gridCol))
          .otherwise(raise_error(concat(
            lit(s"withPHash needs a 64-cell grid (extractFeatures dim = 64); got "),
            size(col(gridCol)).cast("string"), lit(" cells")))))
      .withColumn("_mean",
        aggregate(col(gridCol), lit(0.0d), (a, x) => a + x) / size(col(gridCol)))
    staged.withColumn("phash",
        shiftleft(foldBits(slice(col(gridCol), 1, 32), col("_mean")), 32)
          .bitwiseOR(foldBits(slice(col(gridCol), 33, 32), col("_mean"))))
      .drop("_mean")
  }

  /** Image near-duplicate pairs: perceptual hashes within Hamming distance
    * `maxDist`, candidates from the same distinct-value-collapsed block-pair
    * pigeonhole the text SimHash path uses ([[Dedup.simhashPairsFromSketches]])
    * — one machinery, two modalities. Returns (doc_a, doc_b, dist) over
    * `media_id`s.
    */
  def imageNearDupPairs(features: DataFrame, maxDist: Int = 3): DataFrame =
    Dedup.simhashPairsFromSketches(
      withPHash(features).select(col("media_id").as("doc"), col("phash").as("simhash")),
      maxDist)
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata — the
  * parquet-native representation that scales: bytes stay columnar,
  * metadata prunes, and decode happens inside executor partitions.
  *
  * Decode is three-tier: payloads the in-JDK `javax.imageio` codecs
  * recognize (PNG/JPEG/GIF/BMP) decode for REAL — true pixel
  * dimensions plus an 8-bin luminance histogram feature; payloads the
  * in-JDK `javax.sound.sampled` providers recognize (WAV/AIFF/AU)
  * decode for real too — true sample rate/channels/duration plus an
  * 8-bin RMS envelope; everything else (video/opaque bytes — the JDK
  * ships no video codec) falls back to a deterministic fake so the
  * pipeline shape stays testable end-to-end. The Spark-side contract is
  * real throughout: schema, batch iteration shape (`mapPartitions`, the
  * Scala analogue of `mapInPandas` batches), partition sizing, and the
  * metadata/feature schema are exactly what further codecs plug into.
  */
object Multimodal {

  /** Decode ceiling (~64 MP ≈ 256 MB RGBA raster): payloads declaring
    * larger dimensions degrade to the deterministic fake. */
  private val MaxDecodePixels = 64L * 1024 * 1024

  final case class MediaRow(id: Long, modality: String, payload: Array[Byte])

  /** One feature row per payload. Modality decides which fields are
    * live: images fill (width, height), audio fills (sample_rate,
    * n_channels, duration_ms); the other group stays 0. `feature` is
    * the 8-bin modality feature — luminance histogram for images, RMS
    * envelope (one bin per temporal eighth) for audio. */
  final case class MediaFeatures(id: Long, modality: String, n_bytes: Int,
      checksum: String, width: Int, height: Int, sample_rate: Int,
      n_channels: Int, duration_ms: Long, feature: Array[Float])

  /** Wrap a text/binary source column as a media payload with metadata. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      modality: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("payload"))
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("checksum", md5(col("payload")))

  /** Decode one payload, trying each real in-JDK codec tier in turn:
    * `javax.imageio` (PNG/JPEG/GIF/BMP), then `javax.sound.sampled`
    * (WAV/AIFF/AU). Payloads neither tier recognizes (video — the JDK
    * ships no video codec — and opaque bytes) fall back to a
    * deterministic fake so the pipeline shape stays testable. */
  private[ext] def decodeOne(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    val n = bytes.length
    val checksum = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    decodeImage(bytes) match {
      case Some((w, h, feat)) =>
        return MediaFeatures(r.id, r.modality, n, checksum, w, h, 0, 0, 0L, feat)
      case None =>
    }
    decodeAudio(bytes) match {
      case Some((rate, chans, durMs, feat)) =>
        return MediaFeatures(r.id, r.modality, n, checksum, 0, 0,
          rate, chans, durMs, feat)
      case None =>
    }
    // deterministic fake, stable across re-runs for testability
    val fw = 1 + (math.abs(bytes.headOption.getOrElse(0: Byte).toInt) % 64)
    val fh = 1 + (n % 64)
    val feat = Array.tabulate(8)(i =>
      (if (n == 0) 0f else bytes(i % n).toFloat / 128f))
    MediaFeatures(r.id, r.modality, n, checksum, fw, fh, 0, 0, 0L, feat)
  }

  /** In-JDK image decode (PNG/JPEG/GIF/BMP/WBMP): true dimensions plus
    * an 8-bin normalized luminance histogram sampled on a ≤64×64 grid —
    * bounded work per image regardless of resolution. Returns None when
    * no installed reader claims the bytes (magic-sniff via
    * `getImageReaders`, cheap for non-image payloads) or the decode
    * fails, so corrupt files degrade to the fake instead of failing the
    * partition. */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (bytes.length < 8) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // documented no-SPI case returns null; the finally's close() would
    // then NPE and fail the partition instead of degrading to the fake
    if (iis == null) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis)
        // header-declared dimensions gate the decode: a few-KB
        // decompression-bomb PNG declaring 50000x50000 would allocate a
        // ~10 GB raster in read(0) and OOM the executor (an Error, not
        // caught by NonFatal) instead of degrading to the fake
        val (dw, dh) = (reader.getWidth(0), reader.getHeight(0))
        if (dw.toLong * dh > MaxDecodePixels) return None
        val img = reader.read(0)
        val w = img.getWidth
        val h = img.getHeight
        // ceil division: floor (w/64) gives up to 127 samples per axis
        // for 65..127-px dimensions — ~4x the documented 64x64 bound
        val stepX = math.max(1, (w + 63) / 64)
        val stepY = math.max(1, (h + 63) / 64)
        val hist = new Array[Float](8)
        var total = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            hist(math.min(7, lum >> 5)) += 1f
            total += 1
            x += stepX
          }
          y += stepY
        }
        if (total > 0) { var i = 0; while (i < 8) { hist(i) /= total; i += 1 } }
        Some((w, h, hist))
      } finally reader.dispose()
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally iis.close()
  }

  /** Decode ceiling for audio PCM payloads (~200 MB of decoded PCM):
    * like MaxDecodePixels, bounds what one row may allocate. */
  private val MaxDecodeAudioBytes = 200L * 1024 * 1024

  /** In-JDK audio decode (`javax.sound.sampled`: WAV/AIFF/AU): true
    * (sample_rate_hz, n_channels, duration_ms) plus an 8-bin RMS
    * envelope — bin i is the root-mean-square amplitude (0..1) of the
    * i-th temporal eighth, channels mixed. Non-PCM encodings the JDK
    * can convert (U-law/A-law) are converted to 16-bit PCM first.
    * Returns None when no installed provider claims the bytes (the
    * magic sniff throws UnsupportedAudioFileException, cheap for
    * non-audio payloads) or the decode fails, so corrupt files degrade
    * to the fake instead of failing the partition. */
  private[graft] def decodeAudio(
      bytes: Array[Byte]): Option[(Int, Int, Long, Array[Float])] = {
    if (bytes.length < 12) return None
    try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt0 = raw.getFormat
        val pcm = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          fmt0.getSampleRate, 16, fmt0.getChannels,
          2 * fmt0.getChannels, fmt0.getSampleRate, false)
        val in =
          if (fmt0.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt0.getSampleSizeInBits == 16 && !fmt0.isBigEndian) raw
          else javax.sound.sampled.AudioSystem.getAudioInputStream(pcm, raw)
        val fmt = in.getFormat
        val frameSize = fmt.getFrameSize
        // a declared frame count gates allocation like the image-bomb
        // check; AU streams may declare NOT_SPECIFIED (-1) and are then
        // bounded by the read cap below
        val declared = in.getFrameLength
        if (declared > 0 && declared * frameSize > MaxDecodeAudioBytes)
          return None
        val pcmBytes = readAtMost(in, MaxDecodeAudioBytes)
        val nFrames = pcmBytes.length / frameSize
        if (nFrames == 0) return None
        val chans = fmt.getChannels
        val nSamples = nFrames * chans
        // 8 temporal eighths; sum of squares per bin, 16-bit LE signed
        val sumSq = new Array[Double](8)
        val cnt = new Array[Long](8)
        var i = 0
        while (i < nSamples) {
          val lo = pcmBytes(2 * i) & 0xff
          val hi = pcmBytes(2 * i + 1).toInt
          val s = ((hi << 8) | lo) / 32768.0
          val bin = math.min(7, (i / chans) * 8L / nFrames).toInt
          sumSq(bin) += s * s
          cnt(bin) += 1
          i += 1
        }
        val feat = Array.tabulate(8)(b =>
          if (cnt(b) == 0) 0f
          else math.sqrt(sumSq(b) / cnt(b)).toFloat)
        val durMs = math.round(nFrames * 1000.0 / fmt.getSampleRate)
        Some((math.round(fmt.getSampleRate), chans, durMs, feat))
      } finally raw.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Read up to `cap` bytes from the stream (bounded allocation). */
  private def readAtMost(in: java.io.InputStream, cap: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var total = 0L
    var n = in.read(buf)
    while (n >= 0 && total < cap) {
      out.write(buf, 0, math.min(n.toLong, cap - total).toInt)
      total += n
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** Partition-batched decode/feature-extract — executors iterate rows in
    * partition batches exactly as a vectorized codec UDF would; no
    * collect, no driver involvement. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val encIn = Encoders.product[MediaRow]
    media.select("id", "modality", "payload").as[MediaRow]
      .mapPartitions(_.map(decodeOne))
  }

  /** Frame-sample stub for video-like payloads: every k-th chunk of the
    * payload becomes a "frame" row (explode shape of real frame
    * sampling). */
  def sampleFrames(media: DataFrame, chunkBytes: Int, everyK: Int): DataFrame =
    media
      .withColumn("n_frames",
        greatest(lit(1), (length(col("payload")) / chunkBytes).cast("int")))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))))
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $chunkBytes + 1, $chunkBytes)"))
      .select("id", "modality", "frame_idx", "frame")
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata — the
  * parquet-native representation that scales: bytes stay columnar,
  * metadata prunes, and decode happens inside executor partitions.
  *
  * The decode step itself is STUBBED with a deterministic fake (the
  * container ships no image/audio codecs — see the builder brief); the
  * Spark-side contract is real: schema, batch iteration shape
  * (`mapPartitions`, the Scala analogue of `mapInPandas` batches),
  * partition sizing, and the metadata/feature schema are what a codec
  * would plug into.
  */
object Multimodal {

  final case class MediaRow(id: Long, modality: String, payload: Array[Byte])
  final case class MediaFeatures(id: Long, modality: String, n_bytes: Int,
      checksum: String, width: Int, height: Int, feature: Array[Float])

  /** Wrap a text/binary source column as a media payload with metadata. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      modality: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("payload"))
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("checksum", md5(col("payload")))

  /** STUB decode: a real deployment swaps `decodeOne` for a codec call
    * (JNI/libjpeg, ffmpeg, ...). The fake is deterministic from the
    * payload bytes so tests are stable. */
  private[ext] def decodeOne(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    val n = bytes.length
    // ??? <- real codec goes here; deterministic fake below
    val w = 1 + (math.abs(bytes.headOption.getOrElse(0: Byte).toInt) % 64)
    val h = 1 + (n % 64)
    val feat = Array.tabulate(8)(i =>
      (if (n == 0) 0f else bytes(i % n).toFloat / 128f))
    MediaFeatures(r.id, r.modality, n,
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString, w, h, feat)
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

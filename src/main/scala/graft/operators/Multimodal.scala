package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images / audio / video ride through the
  * engine as opaque `binary` columns plus typed metadata, and per-asset
  * compute (decode, resize, feature-extract, frame-sample) runs as a
  * partition-mapped batch function over the binary payloads.
  *
  * Image decode is REAL for the formats the JDK ships codecs for
  * (PNG/JPEG/GIF/BMP via `javax.imageio` — header-only dimension reads, no
  * full raster decode); payloads no installed codec claims fall back to a
  * deterministic stub so audio/video bytes still flow through the same
  * plumbing with honest `format = "unknown"` metadata. At cluster scale
  * the input would be `spark.read.format("binaryFile")` over an object
  * store with `maxPartitionBytes` tuned so a partition's payloads fit
  * executor memory, and the decode function below is the `mapPartitions`
  * body each executor runs.
  */
object Multimodal {

  /** A decoded-asset record. Images fill width/height; audio fills
    * sample_rate/channels/duration_ms (0 where the modality doesn't apply,
    * -1 for an audio duration the header doesn't state). */
  case class AssetMeta(asset_id: Long, n_bytes: Int, format: String,
                       width: Int, height: Int,
                       sample_rate: Int, channels: Int, duration_ms: Long,
                       checksum: String)

  private def crc32(bytes: Array[Byte]): java.util.zip.CRC32 = {
    val crc = new java.util.zip.CRC32
    crc.update(bytes)
    crc
  }

  /** Fallback for payloads neither ImageIO nor the sampled-audio readers
    * recognize (true video stays here — the JDK ships no video codec):
    * deterministic pseudo-dimensions from the checksum, format flagged
    * `unknown` so downstream filters can separate real decodes. */
  def decodeStub(assetId: Long, bytes: Array[Byte]): AssetMeta = {
    val crc = crc32(bytes)
    AssetMeta(
      asset_id = assetId,
      n_bytes = bytes.length,
      format = "unknown",
      width = 64 + (crc.getValue % 1024).toInt,
      height = 64 + ((crc.getValue >> 10) % 1024).toInt,
      sample_rate = 0, channels = 0, duration_ms = 0L,
      checksum = java.lang.Long.toHexString(crc.getValue))
  }

  /** Magic-byte sniff for the three container types the JDK's sampled-audio
    * readers handle — all declare themselves in the first 12 bytes (WAV:
    * "RIFF"…"WAVE", AIFF: "FORM"…"AIFF"/"AIFC", AU: ".snd"). Gating
    * [[decodeAudio]] on this keeps non-audio payloads off the
    * exception-per-provider probe path inside `AudioSystem`, which is pure
    * overhead when most of a corpus is some other modality. */
  private[operators] def looksLikeAudio(b: Array[Byte]): Boolean = {
    def ascii(off: Int, s: String): Boolean =
      b.length >= off + s.length &&
        s.indices.forall(j => b(off + j) == s.charAt(j).toByte)
    (ascii(0, "RIFF") && ascii(8, "WAVE")) ||
      (ascii(0, "FORM") && (ascii(8, "AIFF") || ascii(8, "AIFC"))) ||
      ascii(0, ".snd")
  }

  /** Real JDK-only audio header decode (WAV/AIFF/AU via
    * `javax.sound.sampled`): container type, sample rate, channel count
    * and duration from the declared frame length — header metadata only,
    * the PCM payload is never decoded. None when no installed reader
    * claims the payload. */
  def decodeAudio(assetId: Long, bytes: Array[Byte]): Option[AssetMeta] =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = aff.getFormat
      val frames = aff.getFrameLength
      val durationMs =
        if (frames >= 0 && fmt.getFrameRate > 0)
          math.round(frames * 1000.0 / fmt.getFrameRate)
        else -1L // header doesn't state a length
      Some(AssetMeta(
        asset_id = assetId,
        n_bytes = bytes.length,
        format = aff.getType.toString.toLowerCase, // wave / aiff / au
        width = 0, height = 0,
        sample_rate = math.round(fmt.getSampleRate),
        channels = fmt.getChannels,
        duration_ms = durationMs,
        checksum = java.lang.Long.toHexString(crc32(bytes).getValue)))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None // truncated/corrupt container
    }

  /** Real JDK-only media decode: probe the payload with the registered
    * ImageIO readers and read true dimensions from the header (no raster
    * decode — `getWidth/getHeight(0)` parse metadata only, so a 50 MB JPEG
    * costs a few KB of reads); payloads no image codec claims are probed
    * as audio ([[decodeAudio]]); anything left → [[decodeStub]]. */
  def decodeOne(assetId: Long, bytes: Array[Byte]): AssetMeta = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) {
        if (looksLikeAudio(bytes))
          decodeAudio(assetId, bytes).getOrElse(decodeStub(assetId, bytes))
        else decodeStub(assetId, bytes)
      }
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          AssetMeta(
            asset_id = assetId,
            n_bytes = bytes.length,
            format = r.getFormatName.toLowerCase,
            width = r.getWidth(0),
            height = r.getHeight(0),
            sample_rate = 0, channels = 0, duration_ms = 0L,
            checksum = java.lang.Long.toHexString(crc32(bytes).getValue))
        } catch {
          case _: java.io.IOException => decodeStub(assetId, bytes) // truncated/corrupt
        } finally r.dispose()
      }
    } finally iis.close()
  }

  /** Partition-mapped decode over (id, payload) rows — one JVM-side batch
    * per partition, zero per-row session overhead, the Scala twin of a
    * pandas `mapInPandas` decode. */
  def decodeAssets(assets: DataFrame, idCol: String, binCol: String): Dataset[AssetMeta] = {
    val spark = assets.sparkSession
    implicit val enc = Encoders.product[AssetMeta]
    assets.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.map { case (id, bytes) => decodeOne(id, bytes) })
  }

  /** Pixel-level features of a decoded image. `ok = false` rows carry the
    * stub zeros (payload wasn't a decodable image); mean channels are in
    * integer milli-units (0..255000) and `luma_hist` is an 8-bucket
    * histogram of the BT.601 luma — the deterministic, exact-integer form
    * of "embed the image" that a real pipeline would replace with a model
    * forward pass (same schema, same partitioning, same batch shape). */
  case class PixelFeatures(asset_id: Long, ok: Boolean,
                           width: Int, height: Int,
                           mean_r_milli: Long, mean_g_milli: Long,
                           mean_b_milli: Long, luma_hist: Array[Long])

  /** FULL raster decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP readers
    * ship with the JVM — this is a real decode, not a header probe) +
    * feature extraction, as the same `mapPartitions` batch shape as
    * [[decodeAssets]]. Sums are exact integers, so the features are
    * bit-reproducible anywhere. */
  def pixelFeaturesOne(assetId: Long, bytes: Array[Byte]): PixelFeatures = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
      PixelFeatures(assetId, ok = false, 0, 0, 0L, 0L, 0L, new Array[Long](8))
    else {
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      val hist = new Array[Long](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF
          val g = (rgb >> 8) & 0xFF
          val b = rgb & 0xFF
          sr += r; sg += g; sb += b
          // BT.601 integer luma: (299r + 587g + 114b) / 1000 in [0, 255]
          val luma = (299 * r + 587 * g + 114 * b) / 1000
          hist(luma >> 5) += 1L // 8 buckets of 32 luma levels
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      PixelFeatures(assetId, ok = true, w, h,
        sr * 1000 / n, sg * 1000 / n, sb * 1000 / n, hist)
    }
  }

  /** Partition-mapped [[pixelFeaturesOne]] over (id, payload) rows. */
  def pixelFeatures(assets: DataFrame, idCol: String,
                    binCol: String): Dataset[PixelFeatures] = {
    implicit val enc = Encoders.product[PixelFeatures]
    assets.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.map { case (id, bytes) => pixelFeaturesOne(id, bytes) })
  }

  /** Frame-sample stub: slice `n` evenly spaced windows of `frameBytes`
    * bytes from a binary payload — the partitioning/batch shape of video
    * frame extraction with the codec swapped for byte slicing. */
  def sampleFrames(assets: DataFrame, idCol: String, binCol: String,
                   n: Int, frameBytes: Int): DataFrame = {
    val len = length(col(binCol))
    val idx = explode(sequence(lit(0), lit(n - 1))).as("frame_no")
    assets.select(col(idCol), col(binCol), len.as("n_bytes"))
      .select(col(idCol), col(binCol), col("n_bytes"), idx)
      .withColumn("offset",
        (col("frame_no") * greatest(col("n_bytes") - frameBytes, lit(1)) / n).cast("int") + 1)
      .withColumn("frame", col(binCol).substr(col("offset"), lit(frameBytes)))
      .drop(binCol)
  }
}

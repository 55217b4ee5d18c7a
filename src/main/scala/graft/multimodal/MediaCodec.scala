package graft.multimodal

/** Pluggable decode seam for multimodal payloads (SURVEY.md §2.1 S4).
  *
  * A codec turns one opaque `binary` payload into a fixed-width feature
  * vector; it runs INSIDE the executor-side batch loop
  * ([[Multimodal.decode]]'s mapPartitions), so implementations must be
  * Serializable and stateless (or cheaply re-initializable per partition).
  *
  * This container ships no image/audio libraries, so the only production
  * implementation here is the deterministic [[ByteHistogramCodec]] fake; a
  * real deployment drops in a JNI/ffmpeg/PIL-backed codec without touching
  * the Spark plumbing (schema, partitioning, batch shape are codec-
  * independent — that is the point of the seam).
  */
trait MediaCodec extends Serializable {
  /** Width of the feature vector this codec emits (fixed per codec so the
    * output column is a uniform fixed-width array — vectorizable and
    * joinable with the embeddings table). */
  def featureDim: Int

  /** Decode one payload. `modality` is the media MIME-ish tag
    * ("text/plain", "image/png", …) — real codecs dispatch on it. */
  def decode(payload: Array[Byte], modality: String): MediaDecoded
}

/** Codec output: a content checksum + the feature vector. */
case class MediaDecoded(checksum: Long, feature: Array[Float])

/** The deterministic fake codec (byte-bucket histograms + a rolling
  * checksum): no external libraries, exact values assertable in tests —
  * the stand-in for real decoders in this environment. */
case class ByteHistogramCodec(featureDim: Int = 8) extends MediaCodec {
  override def decode(payload: Array[Byte], modality: String): MediaDecoded = {
    val hist = new Array[Float](featureDim)
    var checksum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      hist(b % featureDim) += 1f
      checksum = checksum * 31 + b
      i += 1
    }
    MediaDecoded(checksum, hist)
  }
}

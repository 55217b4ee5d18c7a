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

/** A REAL image decode path with zero external dependencies: `javax.imageio`
  * (JDK-bundled) decompresses PNG/BMP/GIF/JPEG payloads to pixels, and the
  * feature is the per-channel RGB histogram (`bins` buckets per channel →
  * featureDim = 3·bins), the classic cheap image fingerprint.
  *
  * Non-image modalities and undecodable payloads fall back to
  * [[ByteHistogramCodec]]'s byte histogram at the SAME width, so the output
  * column stays fixed-width across a mixed-modality table — no row is
  * dropped, and the checksum still covers the raw payload either way
  * (provenance survives transcoding bugs).
  *
  * `ImageIO.read` allocates a BufferedImage per payload; at 100 TB that is
  * executor-CPU-bound work with no shuffle — exactly where Spark scales
  * linearly — and the mapPartitions batch shape in [[Multimodal.decode]]
  * amortizes codec setup per partition, not per row. */
case class ImageRgbHistogramCodec(bins: Int = 8) extends MediaCodec {
  require(bins > 0 && bins <= 256 && 256 % bins == 0,
    s"bins must be a positive divisor of 256 (got $bins): a non-divisor bleeds " +
      "one channel's top pixel values into the next channel's buckets")

  override def featureDim: Int = 3 * bins

  override def decode(payload: Array[Byte], modality: String): MediaDecoded = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) {
      checksum = checksum * 31 + (payload(i) & 0xff)
      i += 1
    }
    val img =
      if (modality.startsWith("image/"))
        // NonFatal, not just IOException: broken decoders surface
        // IllegalArgumentException/CMMException etc., and the fallback
        // contract is "no row is dropped" for ANY undecodable payload.
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      else null
    if (img == null) {
      // deterministic same-width fallback (mixed-modality tables stay rectangular)
      val d = ByteHistogramCodec(featureDim).decode(payload, modality)
      return MediaDecoded(checksum, d.feature)
    }
    val hist = new Array[Float](featureDim)
    val bucket = 256 / bins
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        hist(((rgb >> 16) & 0xff) / bucket) += 1f
        hist(bins + (((rgb >> 8) & 0xff) / bucket)) += 1f
        hist(2 * bins + (rgb & 0xff) / bucket) += 1f
        x += 1
      }
      y += 1
    }
    MediaDecoded(checksum, hist)
  }
}

/** Resize-as-decode: nearest-neighbor downsample to a fixed w×h thumbnail,
  * feature = the RGB pixel grid (w·h·3 floats, row-major, channels
  * interleaved R,G,B). The resize every vision pipeline runs before
  * embedding, done with the JDK-only ImageIO decode path; source pixel for
  * target (tx, ty) is (⌊tx·W/w⌋, ⌊ty·H/h⌋), the canonical nearest-neighbor
  * rule, so outputs are deterministic and exactly assertable.
  * Non-image/undecodable payloads fall back to the same-width byte
  * histogram — no row dropped, mixed-modality tables stay rectangular. */
case class ThumbnailCodec(w: Int = 4, h: Int = 4) extends MediaCodec {
  require(w > 0 && h > 0, s"thumbnail dims must be positive: ${w}x$h")

  override def featureDim: Int = w * h * 3

  override def decode(payload: Array[Byte], modality: String): MediaDecoded = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) {
      checksum = checksum * 31 + (payload(i) & 0xff)
      i += 1
    }
    val img =
      if (modality.startsWith("image/"))
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      else null
    if (img == null || img.getWidth == 0 || img.getHeight == 0) {
      val d = ByteHistogramCodec(featureDim).decode(payload, modality)
      return MediaDecoded(checksum, d.feature)
    }
    val out = new Array[Float](featureDim)
    var ty = 0
    while (ty < h) {
      val sy = ty * img.getHeight / h
      var tx = 0
      while (tx < w) {
        val sx = tx * img.getWidth / w
        val rgb = img.getRGB(sx, sy)
        val o = 3 * (ty * w + tx)
        out(o) = (rgb >> 16) & 0xff
        out(o + 1) = (rgb >> 8) & 0xff
        out(o + 2) = rgb & 0xff
        tx += 1
      }
      ty += 1
    }
    MediaDecoded(checksum, out)
  }
}

/** A REAL audio decode path with zero external dependencies: a hand-rolled
  * RIFF/WAVE chunk parser (PCM format 1, 8-bit unsigned or 16-bit signed
  * little-endian, any channel count) and a feature of `bins` amplitude
  * buckets — samples normalized to [-1, 1], bucket `⌊(a+1)/2·bins⌋` clamped
  * into range, the audio analogue of the RGB histogram. The WAV container
  * is simple enough that the JDK needs no codec library: header fields are
  * read with a little-endian ByteBuffer, chunks are walked to `fmt ` then
  * `data` (chunk sizes pad to even length per the RIFF spec).
  *
  * Non-audio modalities, truncated containers, and non-PCM encodings fall
  * back to [[ByteHistogramCodec]] at the SAME width — no row dropped,
  * mixed-modality tables stay rectangular, checksum always covers the raw
  * payload. Same 100 TB shape as the image path: CPU-bound map work, no
  * shuffle, batch amortized per partition. */
case class WavAmplitudeHistogramCodec(bins: Int = 16) extends MediaCodec {
  require(bins > 0, s"bins must be positive, got $bins")

  override def featureDim: Int = bins

  override def decode(payload: Array[Byte], modality: String): MediaDecoded = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) {
      checksum = checksum * 31 + (payload(i) & 0xff)
      i += 1
    }
    val hist =
      if (modality.startsWith("audio/"))
        try decodePcm(payload) catch { case scala.util.control.NonFatal(_) => null }
      else null
    if (hist == null) {
      val d = ByteHistogramCodec(featureDim).decode(payload, modality)
      return MediaDecoded(checksum, d.feature)
    }
    MediaDecoded(checksum, hist)
  }

  /** Null for anything that is not a well-formed PCM 8/16-bit WAV. */
  private def decodePcm(payload: Array[Byte]): Array[Float] = {
    import java.nio.{ByteBuffer, ByteOrder}
    if (payload.length < 44) return null
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(at: Int) = new String(payload, at, 4, "US-ASCII")
    if (tag4(0) != "RIFF" || tag4(8) != "WAVE") return null
    var pos = 12
    var fmtOk = false
    var bits = 0
    var dataAt = -1
    var dataLen = 0
    while (pos + 8 <= payload.length && (dataAt < 0 || !fmtOk)) {
      val id = tag4(pos)
      val size = bb.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > payload.length) return null
      id match {
        case "fmt " =>
          if (size < 16) return null
          val audioFormat = bb.getShort(pos + 8) & 0xffff
          bits = bb.getShort(pos + 8 + 14) & 0xffff
          fmtOk = audioFormat == 1 && (bits == 8 || bits == 16)
          if (!fmtOk) return null
        case "data" =>
          dataAt = pos + 8
          dataLen = size
        case _ => ()
      }
      pos += 8 + size + (size & 1) // RIFF chunks pad to even length
    }
    if (!fmtOk || dataAt < 0) return null
    val hist = new Array[Float](bins)
    def bucket(amp: Double): Int = {
      val b = ((amp + 1.0) / 2.0 * bins).toInt
      if (b < 0) 0 else if (b >= bins) bins - 1 else b
    }
    if (bits == 8) {
      var i = 0
      while (i < dataLen) {
        // 8-bit WAV is UNSIGNED, midpoint 128
        hist(bucket(((payload(dataAt + i) & 0xff) - 128) / 128.0)) += 1f
        i += 1
      }
    } else {
      var i = 0
      while (i + 1 < dataLen) {
        hist(bucket(bb.getShort(dataAt + i) / 32768.0)) += 1f
        i += 2
      }
    }
    hist
  }
}

object MediaCodec {
  /** Config-driven codec selection
    * ("byte-histogram" | "image-rgb" | "image-thumbnail" | "audio-wav"). */
  def byName(name: String): MediaCodec = name match {
    case "byte-histogram"  => ByteHistogramCodec()
    case "image-rgb"       => ImageRgbHistogramCodec()
    case "image-thumbnail" => ThumbnailCodec()
    case "audio-wav"       => WavAmplitudeHistogramCodec()
    case other => throw new IllegalArgumentException(s"unknown media codec: $other")
  }
}

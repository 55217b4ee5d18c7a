package graft

import graft.io.Csv
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class IoMultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CSV round-trip preserves rows and schema (S1-S3)") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType)))
    val df = Seq((1L, "a", 1.5), (2L, "b,with,commas", -3.25), (3L, null, 0.0))
      .toDF("id", "name", "v")
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/out"
    val back = Csv.roundTrip(spark, df, tmp)
    assert(back.schema == schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("permissive CSV read quarantines bad rows instead of failing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_badcsv")
    val f = tmp.resolve("bad.csv")
    java.nio.file.Files.writeString(f, "id,v\n1,2.5\nnot_a_long,3.5\n")
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", DoubleType)))
    val out = Csv.read(spark, f.toString, schema).collect()
    assert(out.length == 2)
    assert(out.count(_.isNullAt(0)) == 1) // corrupt row surfaces as nulls
  }

  test("permissive JSONL read quarantines malformed lines as data") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_badjsonl")
    val f = tmp.resolve("docs.jsonl")
    java.nio.file.Files.writeString(f,
      """{"id": 1, "text": "ok one"}
        |{"id": 2 "text": "missing comma"}
        |{"id": 3, "text": "ok two"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val out = graft.io.Jsonl.read(spark, f.toString, schema).collect()
    assert(out.length == 3)
    val bad = out.filter(!_.isNullAt(2))
    assert(bad.length == 1 && bad.head.isNullAt(0),
      "malformed line must land whole in _corrupt_record with data cols null")
    assert(bad.head.getString(2).contains("missing comma"))
    val good = out.filter(_.isNullAt(2))
    assert(good.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // failFast refuses the same file
    assertThrows[org.apache.spark.SparkException] {
      graft.io.Jsonl.read(spark, f.toString, schema,
        quarantine = false, failFast = true).collect()
    }
  }

  test("default ByteHistogramCodec: exact histogram + checksum on known bytes") {
    val df = Seq((1L, "ab")).toDF("doc_id", "text") // bytes 97, 98
    val media = Multimodal.mediaFromText(df, "doc_id", "text")
    val r = Multimodal.extractFeatures(media).first()
    assert(r.getAs[Long]("n_bytes") == 2L)
    assert(r.getAs[Long]("checksum") == 97L * 31 + 98) // 3105
    val feat = r.getSeq[Float](r.fieldIndex("feature"))
    assert(feat.length == 8)
    assert(feat(97 % 8) == 1f && feat(98 % 8) == 1f)
    assert(feat.sum == 2f)
  }

  test("a second MediaCodec plugs into the same plumbing unchanged") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text") // bytes 97, 98, 99
    val media = Multimodal.mediaFromText(df, "doc_id", "text")
    val r = Multimodal.extractFeatures(media, IoMultimodalSpec.HeadBytesCodec(4)).first()
    assert(r.getAs[Long]("checksum") == 3L) // modality-dispatched branch
    assert(r.getSeq[Float](r.fieldIndex("feature")) == Seq(97f, 98f, 99f, -1f))
  }

  test("ImageRgbHistogramCodec: real PNG decode to exact per-channel histograms") {
    // 2x2 PNG with known pixels: red, green, blue, white — encoded with the
    // same JDK ImageIO the codec decodes with, so the histogram is exact
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray
    val media = Seq((7L, "image/png", png, 2, 2))
      .toDF("media_id", "modality", "payload", "width", "height")
    val r = Multimodal.extractFeatures(media,
      graft.multimodal.MediaCodec.byName("image-rgb")).first()
    val f = r.getSeq[Float](r.fieldIndex("feature"))
    assert(f.size == 24)
    // bins of width 32: channel value 0 -> bucket 0, 255 -> bucket 7.
    // R channel: two 255s (red, white), two 0s; same shape for G and B.
    val expectedChannel = Seq(2f, 0f, 0f, 0f, 0f, 0f, 0f, 2f)
    assert(f.slice(0, 8) == expectedChannel, "red histogram")
    assert(f.slice(8, 16) == expectedChannel, "green histogram")
    assert(f.slice(16, 24) == expectedChannel, "blue histogram")
    assert(r.getAs[Long]("n_bytes") == png.length.toLong)
  }

  test("ImageRgbHistogramCodec: non-image modality falls back to same-width byte histogram") {
    val df = Seq((1L, "hello world")).toDF("doc_id", "text")
    val media = Multimodal.mediaFromText(df, "doc_id", "text")
    val got = Multimodal.extractFeatures(media,
      graft.multimodal.ImageRgbHistogramCodec(bins = 8)).first()
    val want = Multimodal.extractFeatures(media,
      graft.multimodal.ByteHistogramCodec(featureDim = 24)).first()
    assert(got.getSeq[Float](got.fieldIndex("feature")) ==
      want.getSeq[Float](want.fieldIndex("feature")))
    assert(got.getAs[Long]("checksum") == want.getAs[Long]("checksum"))
  }

  test("ThumbnailCodec: exact nearest-neighbor downsample of a known PNG") {
    // 4x4 PNG whose quadrants are solid red/green/blue/white; a 2x2
    // thumbnail must sample pixels (0,0),(2,0),(0,2),(2,2) — one per
    // quadrant — by the floor(t*src/dst) rule
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 4) {
      val c = (x < 2, y < 2) match {
        case (true, true)   => 0xff0000
        case (false, true)  => 0x00ff00
        case (true, false)  => 0x0000ff
        case (false, false) => 0xffffff
      }
      img.setRGB(x, y, c)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val media = Seq((1L, "image/png", bos.toByteArray, 4, 4))
      .toDF("media_id", "modality", "payload", "width", "height")
    val r = Multimodal.extractFeatures(media,
      graft.multimodal.ThumbnailCodec(2, 2)).first()
    val f = r.getSeq[Float](r.fieldIndex("feature"))
    assert(f == Seq(
      255f, 0f, 0f,      0f, 255f, 0f,   // top row: red, green
      0f, 0f, 255f,      255f, 255f, 255f)) // bottom row: blue, white
    // the byName default (4x4) on the same image is the identity resize
    val f4 = Multimodal.extractFeatures(media,
      graft.multimodal.MediaCodec.byName("image-thumbnail")).first()
    assert(f4.getSeq[Float](f4.fieldIndex("feature")).length == 48)
  }

  test("ThumbnailCodec: non-image modality falls back to same-width byte histogram") {
    val media = Multimodal.mediaFromText(
      Seq((1L, "hello world")).toDF("doc_id", "text"), "doc_id", "text")
    val got = Multimodal.extractFeatures(media,
      graft.multimodal.ThumbnailCodec(2, 2)).first()
    val want = Multimodal.extractFeatures(media,
      graft.multimodal.ByteHistogramCodec(featureDim = 12)).first()
    assert(got.getSeq[Float](got.fieldIndex("feature")) ==
      want.getSeq[Float](want.fieldIndex("feature")))
  }

  test("WavAmplitudeHistogramCodec: real 16-bit PCM WAV decode to exact amplitude buckets") {
    // synthesize a minimal RIFF/WAVE container with the JDK audio API so
    // the parser is exercised against a spec-conforming writer: 8 samples
    // at known 16-bit amplitudes
    val samples = Array[Short](Short.MinValue, -16384, -1, 0, 1, 8192, 16384, Short.MaxValue)
    val pcm = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(pcm.putShort)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.array()), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val media = Seq((3L, "audio/wav", wav))
      .toDF("media_id", "modality", "payload")
    val r = Multimodal.extractFeatures(media,
      graft.multimodal.MediaCodec.byName("audio-wav")).first()
    val f = r.getSeq[Float](r.fieldIndex("feature"))
    assert(f.size == 16)
    // bucket = floor((s/32768 + 1)/2 * 16) clamped: -32768→0, -16384→4,
    // -1→7, 0→8, 1→8, 8192→10, 16384→12, 32767→15
    val want = Array.fill(16)(0f)
    Seq(0, 4, 7, 8, 8, 10, 12, 15).foreach(b => want(b) += 1f)
    assert(f == want.toSeq)
    assert(r.getAs[Long]("n_bytes") == wav.length.toLong)
  }

  test("WavAmplitudeHistogramCodec: 8-bit PCM and truncated/non-audio fallback") {
    // 8-bit unsigned samples: 0→bucket 0, 128→8, 255→15
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val raw = Array[Byte](0, -128 /*0x80=128*/, -1 /*0xff=255*/)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt8, raw.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav8 = bos.toByteArray
    val codec = graft.multimodal.WavAmplitudeHistogramCodec(bins = 16)
    val d8 = codec.decode(wav8, "audio/wav")
    val want8 = Array.fill(16)(0f); Seq(0, 8, 15).foreach(b => want8(b) += 1f)
    assert(d8.feature.toSeq == want8.toSeq)
    // truncated container → same-width byte-histogram fallback, no throw
    val truncated = wav8.take(20)
    val fb = codec.decode(truncated, "audio/wav")
    val wantFb = graft.multimodal.ByteHistogramCodec(16).decode(truncated, "audio/wav")
    assert(fb.feature.toSeq == wantFb.feature.toSeq)
    assert(fb.checksum == wantFb.checksum)
    // non-audio modality → fallback too
    val txt = "hello".getBytes("UTF-8")
    assert(codec.decode(txt, "text/plain").feature.toSeq ==
      graft.multimodal.ByteHistogramCodec(16).decode(txt, "text/plain").feature.toSeq)
  }

  test("frameSample: exact frames, stride skipping, short-payload drop") {
    val media = Multimodal.mediaFromText(Seq(
        (1L, "abcdefghij"), // 10 bytes, frame=3 → frames abc,def,ghi; stride 2 → 0,2
        (2L, "xy")          // shorter than one frame → dropped
      ).toDF("doc_id", "text"), "doc_id", "text")
    val rows = Multimodal.frameSample(media, frameBytes = 3, stride = 2)
      .select($"media_id", $"n_frames", $"frame_idx",
        decode($"frame", "UTF-8").as("t"))
      .as[(Long, Int, Int, String)].collect().sortBy(r => (r._1, r._3))
    assert(rows.toSeq == Seq((1L, 3, 0, "abc"), (1L, 3, 2, "ghi")))
  }

  test("media schema carries binary payload + typed metadata") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    val media = Multimodal.mediaFromText(df, "doc_id", "text")
    val types = media.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("payload") == BinaryType)
    assert(types("media_id") == LongType)
    assert(types("modality") == StringType)
  }

  test("JSONL round-trip preserves quotes, newlines, unicode, and nulls (q83 shape)") {
    import spark.implicits._
    val rows = Seq(
      (1L, "plain ascii"),
      (2L, "with \"embedded quotes\" and back\\slash"),
      (3L, "new\nline, tab\t, and carriage\r"),
      (4L, "accents éàü and 中文 and emoji 😀"),
      (5L, null))
    val df = rows.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString + "/docs"
    df.write.mode("overwrite").json(dir)
    val back = spark.read.schema(df.schema).json(dir)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (i, t) => (i, Option(t)) }.toSet
    assert(back == rows.map { case (i, t) => (i, Option(t)) }.toSet)
  }

  test("patchGrid: hand-computed 4x4 tiles over a known byte raster") {
    // width 8, patch 4: payload of 70 'a'..'p' repeating — height = 70
    // DIV 8 = 8 rows, patch grid 2×2; the 6 trailing bytes are cropped.
    val txt = (0 until 70).map(i => ('a' + i % 16).toChar).mkString
    val media = Multimodal.mediaFromText(
      Seq((9L, txt)).toDF("doc_id", "text"), "doc_id", "text")
    val r = Multimodal.patchGrid(media, width = 8, patch = 4)
      .collect().map(x => (x.getLong(1), x.getLong(2)) ->
        (x.getLong(3), x.getDouble(4))).toMap
    assert(r.size == 4)
    // replay the raster arithmetic directly on the string
    def expect(pr: Int, pc: Int): Long =
      (for (dr <- 0 until 4; dc <- 0 until 4)
        yield txt.charAt((pr * 4 + dr) * 8 + pc * 4 + dc).toLong).sum
    for (pr <- 0 to 1; pc <- 0 to 1) {
      val (s, m) = r((pr.toLong, pc.toLong))
      assert(s == expect(pr, pc), s"patch ($pr,$pc)")
      assert(m == s.toDouble / 16, "power-of-two mean is exact")
    }
  }

  test("patchGrid: payloads shorter than one patch row vanish; bad dims fail loud") {
    val media = Multimodal.mediaFromText(
      Seq((1L, "short")).toDF("doc_id", "text"), "doc_id", "text")
    assert(Multimodal.patchGrid(media, width = 16, patch = 4).count() == 0)
    intercept[IllegalArgumentException] {
      Multimodal.patchGrid(media, width = 10, patch = 4) // 10 % 4 != 0
    }
  }
}

object IoMultimodalSpec {
  /** A second codec for the pluggability test: dispatches on modality and
    * emits a different feature width — proves schema, partitioning and
    * batch shape come from the plumbing, not the codec. Defined at the top
    * level so the executor closure doesn't capture the (non-serializable)
    * test suite. */
  case class HeadBytesCodec(featureDim: Int) extends graft.multimodal.MediaCodec {
    override def decode(payload: Array[Byte], modality: String) = {
      val head = Array.tabulate(featureDim)(i =>
        if (i < payload.length) (payload(i) & 0xff).toFloat else -1f)
      graft.multimodal.MediaDecoded(
        if (modality.startsWith("text/")) payload.length.toLong else -1L, head)
    }
  }
}

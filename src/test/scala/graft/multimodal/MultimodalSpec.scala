package graft.multimodal

import graft.SparkSpec
import graft.ops.Ann
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("syntheticMedia produces binary payloads with stable seed") {
    val a = Multimodal.syntheticMedia(spark, 10).select("payload").collect()
    val b = Multimodal.syntheticMedia(spark, 10).select("payload").collect()
    assert(a.map(_.getAs[Array[Byte]](0).toSeq).toSeq ==
           b.map(_.getAs[Array[Byte]](0).toSeq).toSeq)
  }

  test("decodeImages appends typed decode columns, preserves rows and partitioning") {
    val media = Multimodal.syntheticMedia(spark, 50).repartition(4)
    val decoded = Multimodal.decodeImages(media)
    assert(decoded.count() == 50)
    assert(decoded.schema("decoded_h").dataType == IntegerType)
    assert(decoded.schema("mean_luma").dataType == DoubleType)
    assert(decoded.rdd.getNumPartitions == 4) // mapPartitions: no shuffle
    val lumas = decoded.select("mean_luma").as[Double](org.apache.spark.sql.Encoders.scalaDouble).collect()
    assert(lumas.forall(l => l >= 0.0 && l <= 1.0))
    // read the INT columns through the encoder too — guards against
    // silent Int→Double widening in the mapPartitions output rows
    val dims = decoded.select("decoded_h", "decoded_w")
      .as[(Int, Int)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaInt, org.apache.spark.sql.Encoders.scalaInt))
      .collect()
    assert(dims.forall { case (h, w) => h >= 64 && w >= 64 })
  }

  test("decodeImagesJdk decodes a real PNG's true dimensions and luma") {
    import spark.implicits._
    // render known images with java.awt, encode as real PNGs
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, png(37, 21, 0xffffff), "image", "png"),  // white → luma 1.0
      (2L, png(64, 48, 0x000000), "image", "png"),  // black → luma 0.0
      (3L, Array[Byte](1, 2, 3), "image", "png"))   // corrupt → nulls
      .toDF("media_id", "payload", "media_type", "format")
    val out = Multimodal.decodeImagesJdk(df)
      .select("media_id", "decoded_w", "decoded_h", "mean_luma")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getDouble(3)))))
      .toMap
    assert(out(1L).exists { case (w, h, l) => w == 37 && h == 21 && math.abs(l - 1.0) < 1e-6 })
    assert(out(2L).exists { case (w, h, l) => w == 64 && h == 48 && l < 1e-6 })
    assert(out(3L).isEmpty) // unreadable bytes → null decode columns
  }

  test("null payloads yield null decode columns, not exceptions") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[Array[Byte]], "image", "png"))
      .toDF("media_id", "payload", "media_type", "format")
    val decoded = Multimodal.decodeImages(df)
    assert(decoded.where(col("decoded_h").isNull).count() == 1)
  }

  test("extractFeatures output feeds Ann.bruteTopK directly") {
    val media = Multimodal.syntheticMedia(spark, 20)
    val feats = Multimodal.extractFeatures(media, dim = 16)
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    assert(feats.schema("embedding").dataType == ArrayType(FloatType))
    val top = Ann.bruteTopK(feats, feats.where(col("vec_id") < 2), "vec_id", "embedding", k = 3)
    assert(top.count() == 6) // 2 queries × top-3
  }

  test("sampleFrames yields n in-bounds offsets per payload") {
    val media = Multimodal.syntheticMedia(spark, 10)
    val sampled = Multimodal.sampleFrames(media, 4)
    assert(sampled.schema("frame_offsets").dataType == ArrayType(LongType))
    val rows = sampled.select("payload", "frame_offsets").collect()
    rows.foreach { r =>
      val len = r.getAs[Array[Byte]](0).length
      val offs = r.getSeq[Long](1)
      assert(offs.length == 4 && offs.forall(o => o >= 0 && o < len))
    }
  }

  test("decodeImagesBatched matches row-at-a-time decode exactly") {
    val media = Multimodal.syntheticMedia(spark, 100).repartition(4)
    val rowWise = Multimodal.decodeImages(media)
      .select("media_id", "decoded_h", "decoded_w", "mean_luma").collect().toSet
    val batched = Multimodal.decodeImagesBatched(media, batchSize = 16)
      .select("media_id", "decoded_h", "decoded_w", "mean_luma").collect().toSet
    assert(batched == rowWise)
    // partition-preserving, no shuffle
    assert(Multimodal.decodeImagesBatched(media, 16).rdd.getNumPartitions == 4)
  }

  test("decodeAudio appends rate/samples/duration/rms with consistent duration") {
    val media = Multimodal.syntheticMedia(spark, 20)
    val decoded = Multimodal.decodeAudio(media)
    assert(decoded.schema("duration_ms").dataType == LongType)
    val rows = decoded.select("sample_rate", "n_samples", "duration_ms").collect()
    rows.foreach { r =>
      val (rate, n, dur) = (r.getInt(0), r.getLong(1), r.getLong(2))
      assert(rate > 0 && dur == n * 1000L / rate)
    }
  }

  test("decodeAudioJdk round-trips a generated WAV with exact duration and RMS") {
    import javax.sound.sampled._
    // 0.5 s of a 440 Hz sine at 16 kHz mono 16-bit little-endian PCM;
    // expected RMS computed from the SAME quantized shorts that are
    // written, so the decode must match to double round-off
    def wav(rate: Int, nFrames: Int, tpe: AudioFileFormat.Type,
            bigEndian: Boolean): (Array[Byte], Double) = {
      val samples = Array.tabulate(nFrames)(i =>
        (math.sin(2 * math.Pi * 440 * i / rate) * 30000).toShort)
      val bytes = new Array[Byte](nFrames * 2)
      java.nio.ByteBuffer.wrap(bytes)
        .order(if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN
               else java.nio.ByteOrder.LITTLE_ENDIAN)
        .asShortBuffer().put(samples)
      val fmt = new AudioFormat(rate.toFloat, 16, 1, true, bigEndian)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, nFrames.toLong), tpe, out)
      val expRms = math.sqrt(
        samples.map(s => math.pow(s / 32768.0, 2)).sum / nFrames)
      (out.toByteArray, expRms)
    }
    val (wavBytes, wavRms) = wav(16000, 8000, AudioFileFormat.Type.WAVE, bigEndian = false)
    val (aiffBytes, aiffRms) = wav(22050, 22050, AudioFileFormat.Type.AIFF, bigEndian = true)
    val media = Seq(
      (1L, wavBytes, "audio", "wav"),
      (2L, aiffBytes, "audio", "aiff"),
      (3L, Array[Byte](1, 2, 3, 4, 5), "audio", "mp3"), // no JDK codec → nulls
      (4L, null.asInstanceOf[Array[Byte]], "audio", "wav")
    ).toDF("media_id", "payload", "media_type", "format")
    val rows = Multimodal.decodeAudioJdk(media)
      .select("media_id", "sample_rate", "n_samples", "duration_ms", "rms")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getInt(1) === 16000)
    assert(rows(1L).getLong(2) === 8000L)
    assert(rows(1L).getLong(3) === 500L)
    assert(math.abs(rows(1L).getDouble(4) - wavRms) < 1e-12, "WAV RMS must be exact")
    assert(rows(2L).getInt(1) === 22050)
    assert(rows(2L).getLong(2) === 22050L)
    assert(rows(2L).getLong(3) === 1000L)
    assert(math.abs(rows(2L).getDouble(4) - aiffRms) < 1e-12, "AIFF RMS must be exact")
    assert(rows(3L).isNullAt(1) && rows(3L).isNullAt(4))
    assert(rows(4L).isNullAt(1) && rows(4L).isNullAt(4))
  }

  test("decodeAudioJdk handles stereo and 8-bit unsigned PCM") {
    import javax.sound.sampled._
    // stereo 16-bit: L = half-scale square, R = silence → rms over all
    // channel samples = sqrt((0.5² + 0)/2) exactly
    val nFrames = 1000
    val stereo = new Array[Byte](nFrames * 4)
    val bb = java.nio.ByteBuffer.wrap(stereo).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until nFrames).foreach { _ => bb.putShort(16384).putShort(0) }
    val sFmt = new AudioFormat(8000f, 16, 2, true, false)
    val sOut = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(stereo), sFmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, sOut)
    // 8-bit unsigned mono: constant 192 → zero-centered 64/128 = 0.5
    val u8 = Array.fill[Byte](500)(192.toByte)
    val uFmt = new AudioFormat(8000f, 8, 1, false, false)
    val uOut = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(u8), uFmt, 500L),
      AudioFileFormat.Type.WAVE, uOut)
    val media = Seq((1L, sOut.toByteArray, "audio", "wav"),
        (2L, uOut.toByteArray, "audio", "wav"))
      .toDF("media_id", "payload", "media_type", "format")
    val rows = Multimodal.decodeAudioJdk(media)
      .select("media_id", "n_samples", "rms")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(1) === nFrames.toLong)
    val expStereo = math.sqrt((math.pow(16384.0 / 32768.0, 2) + 0.0) / 2)
    assert(math.abs(rows(1L).getDouble(2) - expStereo) < 1e-12)
    assert(rows(2L).getLong(1) === 500L)
    assert(math.abs(rows(2L).getDouble(2) - 0.5) < 1e-12)
  }

  test("stub decode is deterministic per payload") {
    val p = Array[Byte](1, 2, 3, 4)
    assert(Multimodal.StubCodec.decodeImage(p) == Multimodal.StubCodec.decodeImage(p))
    assert(Multimodal.StubCodec.features(p, 8).toSeq == Multimodal.StubCodec.features(p, 8).toSeq)
  }

  test("resizeImagesJdk produces real w x h PNGs preserving gross luma") {
    import spark.implicits._
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, png(120, 80, 0xffffff)),
      (2L, png(33, 57, 0x000000)),
      (3L, Array[Byte](9, 9, 9)))  // corrupt -> null resized
      .toDF("media_id", "payload")
    val out = Multimodal.resizeImagesJdk(df, 16, 16)
      .select("media_id", "resized").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getAs[Array[Byte]](1)))).toMap
    assert(out(3L).isEmpty)
    // re-decode through the SAME real codec: exact target dims, luma kept
    val redecoded = Multimodal.decodeImagesJdk(
      out.collect { case (id, Some(b)) => (id, b) }.toSeq.toDF("media_id", "payload"))
      .select("media_id", "decoded_w", "decoded_h", "mean_luma")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(redecoded(1L) == ((16, 16, 1.0)))
    assert(redecoded(2L)._1 == 16 && redecoded(2L)._2 == 16 && redecoded(2L)._3 < 1e-6)
  }
}

package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.io.ByteArrayOutputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

class AudioMetaSpec extends SparkSpec {
  import spark.implicits._

  /** Real container bytes via javax.sound — the probe must agree with
    * the JDK's own writer/reader. */
  private def encoded(kind: AudioFileFormat.Type, rate: Float, channels: Int,
                      frames: Int, bits: Int = 16): Array[Byte] = {
    val fmt = new AudioFormat(rate, bits, channels,
      true, kind == AudioFileFormat.Type.AIFF || kind == AudioFileFormat.Type.AU)
    val bytesPerFrame = channels * (bits / 8)
    val pcm = new Array[Byte](frames * bytesPerFrame)
    (pcm.indices).foreach(i => pcm(i) = ((i * 37) & 0xff).toByte)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, kind, out)
    out.toByteArray
  }

  test("header probe matches the JDK writer for wav/aiff/au") {
    val cases = Seq(
      (AudioFileFormat.Type.WAVE, "wav", 44100f, 2, 4410),
      (AudioFileFormat.Type.AIFF, "aiff", 22050f, 1, 2205),
      (AudioFileFormat.Type.AU, "au", 8000f, 1, 8000))
    val df = cases.map { case (k, name, r, ch, fr) =>
      (name, r.toInt, ch, fr, encoded(k, r, ch, fr))
    }.toDF("fmt", "rate", "ch", "frames", "payload")
    val rows = df.select(col("fmt"), col("rate"), col("ch"), col("frames"),
        AudioMeta.audioMeta(col("payload")).as("m"))
      .select("fmt", "rate", "ch", "frames",
        "m.format", "m.channels", "m.sample_rate", "m.frames", "m.duration_s")
      .collect()
    rows.foreach { r =>
      assert(r.getString(4) == r.getString(0), r.toString)
      assert(r.getInt(5) == r.getInt(2), s"channels: $r")
      assert(r.getInt(6) == r.getInt(1), s"rate: $r")
      assert(r.getLong(7) == r.getInt(3).toLong, s"frames: $r")
    }
    // wav case: 4410 frames at 44100 Hz = 0.1 s
    assert(rows.find(_.getString(0) == "wav").get.getDouble(8) == 0.1)
  }

  test("probe agrees with a full javax.sound decode") {
    val p = encoded(AudioFileFormat.Type.WAVE, 16000f, 1, 1600)
    val full = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(p))
    val packed = Kernels.audioMetaPacked(p)
    assert(((packed >> 36) & 0xfffff) == full.getFormat.getSampleRate.toLong)
    assert(((packed >> 56) & 0x1f) == full.getFormat.getChannels.toLong)
    assert((packed & 0xfffffffffL) == full.getFrameLength)
  }

  test("hostile payloads are NULL, never an exception") {
    val bad = Seq(
      Array.emptyByteArray,
      "RIFFjunk".getBytes("UTF-8"),
      encoded(AudioFileFormat.Type.WAVE, 8000f, 1, 100).take(20),
      encoded(AudioFileFormat.Type.AIFF, 8000f, 1, 100).take(16),
      ".snd".getBytes("UTF-8"),
      Array.fill[Byte](32)(0x52))
    val df = bad.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "payload")
    assert(df.select(AudioMeta.audioMeta(col("payload")).as("m"))
      .where(col("m").isNotNull).count() == 0L)
  }

  test("SQL surface: audio_meta_packed registered") {
    graft.GraftFunctions.register(spark)
    Seq((1, encoded(AudioFileFormat.Type.AU, 8000f, 2, 400))).toDF("i", "payload")
      .createOrReplaceTempView("au_in")
    val p = spark.sql("SELECT audio_meta_packed(payload) AS p FROM au_in")
      .collect()(0).getLong(0)
    assert((p >>> 61) == 3L)
    assert(((p >> 56) & 0x1f) == 2L && ((p >> 36) & 0xfffff) == 8000L)
    assert((p & 0xfffffffffL) == 400L)
  }
}

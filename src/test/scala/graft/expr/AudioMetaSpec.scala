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

  // compressed-container fixtures, built to the public byte layouts
  // (no JDK encoder exists for flac/mp3/ogg)
  private def flac(rate: Int, ch: Int, total: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80); out.write(0); out.write(0); out.write(34) // last, STREAMINFO
    out.write(Array[Byte](0, 16, 16, 0)) // min/max blocksize
    out.write(new Array[Byte](6))        // min/max framesize
    out.write((rate >> 12) & 0xff)
    out.write((rate >> 4) & 0xff)
    out.write(((rate & 0xf) << 4) | ((ch - 1) << 1)) // bps-1 high bit 0
    out.write((0xf << 4) | ((total >> 32) & 0xf).toInt) // bps-1=15 (16-bit)
    out.write(((total >> 24) & 0xff).toInt); out.write(((total >> 16) & 0xff).toInt)
    out.write(((total >> 8) & 0xff).toInt); out.write((total & 0xff).toInt)
    out.write(new Array[Byte](16)) // md5
    out.toByteArray
  }

  private def mp3Frame(stereo: Boolean): Array[Byte] =
    // MPEG1 Layer III, 128 kbps, 44100 Hz: FF FB 90, mode byte
    Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte,
      (if (stereo) 0x00 else 0xc0).toByte)

  test("flac STREAMINFO: exact rate/channels/total samples") {
    val p = Kernels.audioMetaPacked(flac(44100, 2, 123456L))
    assert((p >>> 61) == 4L, p.toString)
    assert(((p >> 56) & 0x1f) == 2L)
    assert(((p >> 36) & 0xfffff) == 44100L)
    assert((p & 0xfffffffffL) == 123456L)
    // 36-bit total-sample boundary
    val big = Kernels.audioMetaPacked(flac(96000, 8, 0xfffffffffL))
    assert((big & 0xfffffffffL) == 0xfffffffffL)
  }

  test("mp3: Xing frame count, CBR estimate, and ID3v2 skip") {
    // Xing: stereo MPEG1 side info = 32 bytes, so the tag sits at 36
    val xing = new ByteArrayOutputStream()
    xing.write(mp3Frame(stereo = true)); xing.write(new Array[Byte](32))
    xing.write("Xing".getBytes("US-ASCII"))
    xing.write(Array[Byte](0, 0, 0, 1))  // flags: frames present
    xing.write(Array[Byte](0, 0, 0, 250.toByte)) // 250 frames
    xing.write(new Array[Byte](400))
    val px = Kernels.audioMetaPacked(xing.toByteArray)
    assert((px >>> 61) == 5L)
    assert(((px >> 36) & 0xfffff) == 44100L)
    assert(((px >> 56) & 0x1f) == 2L)
    assert((px & 0xfffffffffL) == 250L * 1152L, px.toString)

    // CBR: 128 kbps @ 44100 → 417-byte frames; 10 frames of payload
    val cbr = new ByteArrayOutputStream()
    cbr.write(mp3Frame(stereo = false)); cbr.write(new Array[Byte](417 * 10 - 4))
    val pc = Kernels.audioMetaPacked(cbr.toByteArray)
    assert((pc >>> 61) == 5L)
    assert(((pc >> 56) & 0x1f) == 1L) // mono
    assert((pc & 0xfffffffffL) == 10L * 1152L, pc.toString)

    // ID3v2 prefix (syncsafe size 100) then the same CBR stream
    val id3 = new ByteArrayOutputStream()
    id3.write("ID3".getBytes("US-ASCII"))
    id3.write(Array[Byte](4, 0, 0, 0, 0, 0, 100))
    id3.write(new Array[Byte](100))
    id3.write(cbr.toByteArray)
    val pi = Kernels.audioMetaPacked(id3.toByteArray)
    assert((pi >>> 61) == 5L && (pi & 0xfffffffffL) == 10L * 1152L, pi.toString)
  }

  private def oggPage(granule: Long, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("OggS".getBytes("US-ASCII"))
    out.write(0); out.write(2) // version, header-type (BOS)
    (0 until 8).foreach(j => out.write(((granule >> (8 * j)) & 0xff).toInt))
    out.write(new Array[Byte](12)) // serial, seq, crc
    out.write(1); out.write(payload.length) // one segment
    out.write(payload)
    out.toByteArray
  }

  test("ogg: vorbis id header + last-page granule; opus at 48 kHz") {
    val vorbisId = new ByteArrayOutputStream()
    vorbisId.write(1); vorbisId.write("vorbis".getBytes("US-ASCII"))
    vorbisId.write(new Array[Byte](4)) // version
    vorbisId.write(2)                  // channels
    vorbisId.write(Array[Byte](0x22, 0x56, 0, 0)) // 22050 LE
    vorbisId.write(new Array[Byte](12))
    val v = new ByteArrayOutputStream()
    v.write(oggPage(0L, vorbisId.toByteArray))
    v.write(oggPage(441000L, Array[Byte](0)))
    val pv = Kernels.audioMetaPacked(v.toByteArray)
    assert((pv >>> 61) == 6L, pv.toString)
    assert(((pv >> 56) & 0x1f) == 2L)
    assert(((pv >> 36) & 0xfffff) == 22050L)
    assert((pv & 0xfffffffffL) == 441000L)

    val opusId = new ByteArrayOutputStream()
    opusId.write("OpusHead".getBytes("US-ASCII"))
    opusId.write(1); opusId.write(2) // version, channels
    opusId.write(new Array[Byte](9))
    val o = new ByteArrayOutputStream()
    o.write(oggPage(0L, opusId.toByteArray))
    o.write(oggPage(96000L, Array[Byte](0)))
    val po = Kernels.audioMetaPacked(o.toByteArray)
    assert((po >>> 61) == 6L)
    assert(((po >> 36) & 0xfffff) == 48000L) // granules are 48 kHz
    assert((po & 0xfffffffffL) == 96000L)
  }

  test("struct unpack names the compressed formats (unsigned fmt shift)") {
    val df = Seq(
      (1, flac(48000, 1, 48000L)),
      (2, {
        val b = new ByteArrayOutputStream()
        b.write(mp3Frame(stereo = true)); b.write(new Array[Byte](417 * 5))
        b.toByteArray
      })).toDF("i", "payload")
    val rows = df.select(col("i"), AudioMeta.audioMeta(col("payload")).as("m"))
      .orderBy("i").select("m.format", "m.duration_s").collect()
    assert(rows(0).getString(0) == "flac" && rows(0).getDouble(1) == 1.0)
    assert(rows(1).getString(0) == "mp3")
  }

  test("compressed-container hostile payloads are NULL, never an exception") {
    val bad = Seq(
      flac(44100, 2, 100L).take(20),             // truncated STREAMINFO
      "fLaC".getBytes("US-ASCII"),               // magic only
      Array[Byte](0xff.toByte, 0xe6.toByte, 0, 0), // sync but layer II bits
      "ID3".getBytes("US-ASCII"),                // tag magic only
      ("ID3" + "\u0004\u0000\u0000\u0000\u0000\u0000d")
        .getBytes("ISO-8859-1"), // tag header, no frame
      "OggS".getBytes("US-ASCII"),               // page magic only
      oggPage(0L, Array[Byte](9, 9, 9, 9)).++(new Array[Byte](40))) // neither vorbis nor opus
    val df = bad.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "payload")
    assert(df.select(AudioMeta.audioMeta(col("payload")).as("m"))
      .where(col("m").isNotNull).count() == 0L)
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

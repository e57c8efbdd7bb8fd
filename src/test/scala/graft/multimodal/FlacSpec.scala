package graft.multimodal

import graft.SparkSpec

/** The pure-JVM FLAC codec must round-trip bit-exact PCM through
  * every subframe/channel-assignment shape the encoder can emit,
  * decode the LPC path, reject corrupt frames via CRC, and surface
  * real (rate, frames, rms) through the audio-decode operator. */
class FlacSpec extends SparkSpec {

  private def sine(n: Int, freq: Double, amp: Int, seed: Long): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(n)(i =>
      (amp * math.sin(2 * math.Pi * freq * i / 44100.0)).toInt +
        rnd.nextInt(64) - 32)
  }

  test("mono 16-bit round-trip is bit-exact across frame boundaries") {
    val pcm = sine(10000, 440.0, 20000, 1L) // 3 frames at blocksize 4096
    val flac = Flac.encode(Array(pcm), 44100, 16)
    assert(Flac.isFlac(flac))
    val a = Flac.decode(flac).get
    assert(a.sampleRate == 44100 && a.channels == 1 && a.bits == 16)
    assert(a.nFrames == 10000L)
    assert(a.samples(0).toSeq == pcm.toSeq, "decoded PCM must be bit-exact")
    assert(a.rms > 0.1 && a.rms < 1.0)
  }

  test("stereo round-trips bit-exact under every decorrelation choice") {
    val l = sine(5000, 440.0, 18000, 2L)
    // three correlation shapes so the per-frame cheapest assignment
    // exercises different channel codes; whatever the encoder picks,
    // the decode must be exact
    val shapes = Seq(
      l.clone(),                                     // identical (side = 0)
      sine(5000, 523.25, 18000, 3L),                 // independent
      l.map(v => v + 100))                           // strongly correlated
    for (r <- shapes) {
      val flac = Flac.encode(Array(l, r), 44100, 16, midSide = true)
      val a = Flac.decode(flac).get
      assert(a.channels == 2)
      assert(a.samples(0).toSeq == l.toSeq, "left must be bit-exact")
      assert(a.samples(1).toSeq == r.toSeq, "right must be bit-exact")
    }
    // and the plain independent-channel form
    val flac = Flac.encode(Array(l, shapes(1)), 44100, 16)
    val a = Flac.decode(flac).get
    assert(a.samples(0).toSeq == l.toSeq && a.samples(1).toSeq == shapes(1).toSeq)
  }

  test("constant and silent signals ride the CONSTANT subframe exactly") {
    val const = Array.fill(4500)(-1234)
    val a = Flac.decode(Flac.encode(Array(const), 8000, 16)).get
    assert(a.samples(0).toSeq == const.toSeq)
    val silent = Array.fill(100)(0)
    val b = Flac.decode(Flac.encode(Array(silent), 8000, 16)).get
    assert(b.samples(0).toSeq == silent.toSeq && b.rms == 0.0)
  }

  test("LPC subframes decode (fixture with explicit qlp coefficients)") {
    val pcm = sine(1000, 220.0, 15000, 4L)
    val flac = Flac.encodeLpcFixture(Array(pcm), 22050, 16)
    val a = Flac.decode(flac).get
    assert(a.sampleRate == 22050)
    assert(a.samples(0).toSeq == pcm.toSeq, "LPC path must be bit-exact")
  }

  test("corrupt frames fail CRC and decode to None, never noise") {
    val pcm = sine(3000, 440.0, 20000, 5L)
    val flac = Flac.encode(Array(pcm), 44100, 16)
    // flip one byte well inside the first frame's body
    val corrupt = flac.clone()
    corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x40).toByte
    assert(Flac.decode(corrupt).isEmpty, "CRC must catch the corruption")
    assert(Flac.decode("not a flac".getBytes).isEmpty)
  }

  test("a stream emitting more samples than STREAMINFO declares is refused, not allocated") {
    // splice a second encode's frames after the first: STREAMINFO says
    // 4096 samples, the payload carries 8192 — the shape a crafted
    // CONSTANT-subframe amplification bomb takes (small bytes, huge
    // decoded output). The decoder must bail, not balloon.
    val pcm = Array.fill(4096)(777)
    val one = Flac.encode(Array(pcm), 8000, 16)
    val framesStart = 4 + 4 + 34 // fLaC + block header + STREAMINFO
    val frames = java.util.Arrays.copyOfRange(one, framesStart, one.length)
    val bomb = one ++ frames
    assert(Flac.decode(bomb).isEmpty,
      "over-declared output must refuse, not amplify")
    // the untampered file still decodes
    assert(Flac.decode(one).get.samples(0).toSeq == pcm.toSeq)
  }

  test("32-bit stereo decorrelation (33-bit side samples) is refused, never truncated") {
    // force a decorrelated assignment: near-identical channels make
    // the side channel almost free, so the encoder picks chCode 8/9/10
    val l = Array.tabulate(4096)(i => (i % 1000) * 1000000 - 500000000)
    val r = l.map(_ + 1)
    val flac = Flac.encode(Array(l, r), 44100, 32, midSide = true)
    // sanity: the fixture really chose a decorrelated assignment
    // (byte 42 starts the first frame header; channel code sits in the
    // 4 bits after the 32-bit sync+flags+bs+sr fields = byte 45 high)
    val chCode = (flac(45) & 0xf0) >> 4
    assert(chCode >= 8 && chCode <= 10, s"fixture chose chCode $chCode")
    assert(Flac.decode(flac).isEmpty,
      "33-bit side samples exceed Int buffers — must refuse, not " +
        "silently truncate to wrong PCM")
    // 32-bit INDEPENDENT channels still round-trip exactly
    val indep = Flac.encode(Array(l, r), 44100, 32)
    val a = Flac.decode(indep).get
    assert(a.samples(0).toSeq == l.toSeq && a.samples(1).toSeq == r.toSeq)
  }

  test("decodeAudioJdk surfaces real FLAC metadata next to WAV; mp3-ish stays null") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pcm = sine(4410, 440.0, 20000, 6L)
    val flac = Flac.encode(Array(pcm), 44100, 16)
    // the same PCM as WAV through the JDK writer — rms must agree
    val wav = {
      val bytes = new Array[Byte](pcm.length * 2)
      var i = 0
      while (i < pcm.length) {
        bytes(2 * i) = (pcm(i) & 0xff).toByte
        bytes(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(44100f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, pcm.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, flac), (2L, wav), (3L, "ID3junk-not-decodable".getBytes)
    ).toDF("id", "payload")
    val out = Multimodal.decodeAudioJdk(df)
      .select("id", "sample_rate", "n_samples", "rms")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getLong(2), r.getDouble(3)))))
      .toMap
    val (fr, fn, frms) = out(1L).get
    val (wr, wn, wrms) = out(2L).get
    assert(fr == 44100 && fn == 4410L)
    assert(wr == 44100 && wn == 4410L)
    assert(math.abs(frms - wrms) < 1e-9,
      s"FLAC and WAV of the same PCM must agree on rms: $frms vs $wrms")
    assert(out(3L).isEmpty, "mp3-ish payloads stay the documented null boundary")
  }
}

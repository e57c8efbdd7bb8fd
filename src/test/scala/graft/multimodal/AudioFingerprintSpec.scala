package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  /** 16 kHz mono 16-bit LE WAV of concatenated (freqHz, seconds)
    * segments. */
  private def wav(segments: (Double, Double)*): Array[Byte] = {
    import javax.sound.sampled._
    val rate = 16000
    val samples = segments.flatMap { case (f, secs) =>
      val n = (rate * secs).toInt
      (0 until n).map(i =>
        (math.sin(2 * math.Pi * f * i / rate) * 0.6 * 32767).toShort)
    }
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val bout = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length),
      AudioFileFormat.Type.WAVE, bout)
    bout.toByteArray
  }

  test("distinct frequencies land in distinct dominant bands") {
    val lowSeq = AudioFingerprint.bandSequence(
      (0 until 4096).map(i => math.sin(2 * math.Pi * 300 * i / 16000.0)).toArray,
      16000, 1024, 512, 8, 200.0, 4000.0)
    val highSeq = AudioFingerprint.bandSequence(
      (0 until 4096).map(i => math.sin(2 * math.Pi * 3500 * i / 16000.0)).toArray,
      16000, 1024, 512, 8, 200.0, 4000.0)
    assert(lowSeq.distinct.length == 1 && highSeq.distinct.length == 1)
    assert(lowSeq.head < highSeq.head, (lowSeq.head, highSeq.head))
  }

  test("a clip embedded in another shares fingerprints; unrelated audio does not") {
    val melody = Seq((500.0, 0.5), (1000.0, 0.5), (2000.0, 0.5), (700.0, 0.5))
    val a = wav(melody: _*)
    val b = wav((Seq((3800.0, 0.7)) ++ melody): _*) // melody at an offset
    // unrelated clip confined to the lowest band the others never
    // touch — a constant-tone RUN shingle would otherwise collide
    // with any clip visiting the same band for 4 frames
    val c = wav((205.0, 0.5), (215.0, 0.5), (210.0, 0.5), (220.0, 0.5))
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("clip_id", "audio")
    val pairs = AudioFingerprint.sharedPairs(docs, "clip_id", "audio",
        minShared = 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), pairs)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)), pairs)
  }

  test("amplitude scaling changes nothing (argmax is scale-invariant)") {
    def scaled(gain: Double) = {
      val s = (0 until 8192).map(i =>
        gain * math.sin(2 * math.Pi * 700 * i / 16000.0)).toArray
      AudioFingerprint.bandSequence(s, 16000, 1024, 512, 8, 200.0, 4000.0).toSeq
    }
    assert(scaled(1.0) == scaled(0.05))
  }

  test("undecodable and null payloads yield no rows") {
    val docs = Seq((1L, Array[Byte](1, 2, 3)),
      (2L, null.asInstanceOf[Array[Byte]])).toDF("clip_id", "audio")
    assert(AudioFingerprint.fingerprints(docs, "clip_id", "audio").count() == 0)
  }

  test("deterministic across partitionings") {
    val docs = Seq((1L, wav((440.0, 0.6), (660.0, 0.6)))).toDF("clip_id", "audio")
    val x = AudioFingerprint.fingerprints(docs.repartition(1), "clip_id", "audio")
      .as[(Long, Long)].collect().toSet
    val y = AudioFingerprint.fingerprints(docs.repartition(5), "clip_id", "audio")
      .as[(Long, Long)].collect().toSet
    assert(x == y && x.nonEmpty)
  }
}

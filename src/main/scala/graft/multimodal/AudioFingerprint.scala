package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio fingerprinting for near-duplicate detection — the
  * constellation idea of Wang 2003 (Shazam) in its simplest robust
  * form: frame the signal, find each frame's DOMINANT frequency band,
  * and hash short band-sequence shingles. Two clips sharing audio
  * content share shingles regardless of absolute position (the
  * shingle carries no frame index), while amplitude scaling cancels
  * entirely (argmax over band energies is scale-invariant).
  *
  * Spectral estimation is per-band GOERTZEL, not an FFT library: a
  * three-term recurrence per (frame, band) over pure JDK arithmetic —
  * deterministic doubles (same IEEE ops in any JVM, any
  * partitioning), no native dependency, and exactly the right cost
  * shape when bands ≪ frame size. Band centers are log-spaced across
  * [fLo, fHi] — the perceptual spacing.
  *
  * Scale shape: one mapPartitions over the binary column (the
  * multimodal per-row kernel convention — no Catalyst expression
  * decodes WAV), each clip capped at `maxSeconds` of samples; output
  * is the distinct (id, fp) fingerprint table that joins exactly like
  * the winnowing/minhash indexes (fp-keyed equi-join, hot-fp cap at
  * the consumer). */
object AudioFingerprint {

  /** Mono samples (channel mean, full-scale normalized) via the JDK
    * codec, capped. None for undecodable/compressed payloads. */
  private[multimodal] def monoSamples(payload: Array[Byte],
                                      maxSamples: Int): Option[(Int, Array[Double])] = {
    import javax.sound.sampled._
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        val frameSize = fmt.getFrameSize
        if ((enc != AudioFormat.Encoding.PCM_SIGNED &&
             enc != AudioFormat.Encoding.PCM_UNSIGNED) ||
            bits < 8 || bits > 32 || frameSize <= 0 || ch <= 0) None
        else {
          val bytesPerSample = (bits + 7) / 8
          val big = fmt.isBigEndian
          val full = (1L << (bits - 1)).toDouble
          val out = new scala.collection.mutable.ArrayBuffer[Double](
            math.min(maxSamples, 1 << 16))
          val buf = new Array[Byte](frameSize * 1024)
          var read = in.read(buf)
          var done = false
          while (read > 0 && !done) {
            var off = 0
            while (off + frameSize <= read && !done) {
              var c = 0
              var acc = 0.0
              while (c < ch) {
                val base = off + c * bytesPerSample
                var v = 0L
                if (big) {
                  var i = 0
                  while (i < bytesPerSample) { v = (v << 8) | (buf(base + i) & 0xffL); i += 1 }
                } else {
                  var i = bytesPerSample - 1
                  while (i >= 0) { v = (v << 8) | (buf(base + i) & 0xffL); i -= 1 }
                }
                val s =
                  if (enc == AudioFormat.Encoding.PCM_UNSIGNED) v - (1L << (bits - 1))
                  else { val shift = 64 - bits; (v << shift) >> shift }
                acc += s / full
                c += 1
              }
              out += acc / ch
              if (out.length >= maxSamples) done = true
              off += frameSize
            }
            if (!done) read = in.read(buf)
          }
          if (out.isEmpty) None else Some((fmt.getSampleRate.toInt, out.toArray))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Goertzel power of `samples[off, off+n)` at frequency `f`. */
  private[multimodal] def goertzelPower(samples: Array[Double], off: Int,
                                        n: Int, f: Double, rate: Double): Double = {
    val w = 2.0 * math.Pi * f / rate
    val coeff = 2.0 * StrictMath.cos(w)
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
    var i = 0
    while (i < n) {
      s0 = samples(off + i) + coeff * s1 - s2
      s2 = s1; s1 = s0
      i += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  /** Per-frame dominant band (argmax of Goertzel power over
    * log-spaced band centers; ties to the lower band). */
  private[multimodal] def bandSequence(samples: Array[Double], rate: Int,
      frame: Int, hop: Int, bands: Int, fLo: Double, fHi: Double): Array[Int] = {
    val nFrames = if (samples.length < frame) 0 else (samples.length - frame) / hop + 1
    val centers = Array.tabulate(bands)(b =>
      fLo * StrictMath.pow(fHi / fLo, b.toDouble / (bands - 1)))
    Array.tabulate(nFrames) { fi =>
      val off = fi * hop
      var best = 0
      var bestP = Double.NegativeInfinity
      var b = 0
      while (b < bands) {
        val p = goertzelPower(samples, off, frame, centers(b), rate.toDouble)
        if (p > bestP) { bestP = p; best = b }
        b += 1
      }
      best
    }
  }

  /** Distinct fingerprints per clip: hash of every `shingle`-frame
    * band subsequence (no frame index — position-shift robust).
    * Output: (id, fp). Undecodable clips yield no rows. */
  def fingerprints(df: DataFrame, idCol: String, audioCol: String,
                   frame: Int = 1024, hop: Int = 512, bands: Int = 8,
                   shingle: Int = 4, fLo: Double = 200.0, fHi: Double = 4000.0,
                   maxSeconds: Int = 60): DataFrame = {
    require(frame > 0 && hop > 0 && bands >= 2 && shingle >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val aIdx = df.schema.fieldIndex(audioCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.isNullAt(idIdx) || r.isNullAt(aIdx)) Iterator.empty
        else {
          val id = r.getLong(idIdx)
          monoSamples(r.getAs[Array[Byte]](aIdx), 48000 * maxSeconds) match {
            case None => Iterator.empty
            case Some((rate, samples)) =>
              val seq = bandSequence(samples, rate, frame, hop, bands, fLo, fHi)
              val fps = scala.collection.mutable.LinkedHashSet.empty[Long]
              var i = 0
              while (i + shingle <= seq.length) {
                var h = 1125899906842597L
                var j = 0
                while (j < shingle) { h = h * 31 + seq(i + j); j += 1 }
                fps += h
                i += 1
              }
              fps.iterator.map(fp => (id, fp))
          }
        }
      }
    }.toDF("id", "fp")
  }

  /** Clip pairs sharing ≥ `minShared` fingerprints — same consumer
    * shape as [[graft.text.Winnowing.sharedPairs]]. */
  def sharedPairs(df: DataFrame, idCol: String, audioCol: String,
                  minShared: Int = 3, maxDf: Long = 0L): DataFrame = {
    val fps = fingerprints(df, idCol, audioCol)
    val pruned = if (maxDf > 0) {
      val hot = fps.groupBy("fp").count().where(col("count") > maxDf).select("fp")
      fps.join(broadcast(hot), Seq("fp"), "left_anti")
    } else fps
    pruned.as("a").join(pruned.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}

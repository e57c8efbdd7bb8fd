package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.types._

class VideoCodecSpec extends SparkSpec {
  import spark.implicits._

  private def frame(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  /** gray(0..255) frames so each frame's expected luma is exact. */
  private def grayAvi(levels: Seq[Int], w: Int = 32, h: Int = 24, fps: Int = 10): Array[Byte] =
    MjpegAvi.write(levels.map(g => frame(w, h, (g << 16) | (g << 8) | g)), fps)

  test("MJPEG-AVI round trip: probe recovers header metadata") {
    val avi = grayAvi(Seq(0, 64, 128, 192, 255), w = 40, h = 30, fps = 5)
    val m = VideoCodec.probe(avi).get
    assert(m.container == "avi")
    assert(m.fourcc == "MJPG")
    assert(m.width == 40 && m.height == 30)
    assert(m.nFrames == 5)
    assert(m.durationMs == 1000) // 5 frames @ 5 fps
  }

  test("MJPEG-AVI round trip: demuxed frame chunks decode to the written pixels") {
    val avi = grayAvi(Seq(0, 255, 0, 255))
    val offs = VideoCodec.frameOffsets(avi)
    assert(offs.length == 4)
    assert(offs.forall(o => o > 0 && o < avi.length))
    // every demuxed chunk is a standalone JPEG the JDK can decode
    val lumas = VideoCodec.sampleFrameLumas(avi, 4).get
    assert(lumas.length == 4)
    // JPEG is lossy but flat-gray frames survive to within a few counts
    assert(math.abs(lumas(0) - 0.0) < 0.05 && math.abs(lumas(1) - 1.0) < 0.05)
    assert(math.abs(lumas(2) - 0.0) < 0.05 && math.abs(lumas(3) - 1.0) < 0.05)
    val (off0, len0) = VideoCodec.frameChunks(avi).head
    val (fh, fw, _) = VideoCodec.decodeAviFrame(avi, off0, len0).get
    assert(fh == 24 && fw == 32)
  }

  test("sampleFrameOffsets picks n evenly spaced real offsets") {
    val avi = grayAvi((0 until 20).map(i => i * 12))
    val all = VideoCodec.frameOffsets(avi)
    assert(all.length == 20)
    val s = VideoCodec.sampleFrameOffsets(avi, 4).get
    assert(s.length == 4)
    assert(s.toSet.subsetOf(all.toSet))
    assert(s sameElements s.sorted) // stream order preserved
    // fewer frames than requested → all frames
    val tiny = grayAvi(Seq(10, 20))
    assert(VideoCodec.sampleFrameOffsets(tiny, 8).get.length == 2)
  }

  /** Minimal spec-correct MP4: ftyp + moov(mvhd, trak(tkhd, mdia(minf(
    * stbl(stsd, stsz, stco))))) + mdat. Built by hand so expected
    * values are exact. */
  private def syntheticMp4(): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def be32(v: Long): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(v.toInt).array()
    def be16(v: Int): Array[Byte] =
      ByteBuffer.allocate(2).order(ByteOrder.BIG_ENDIAN).putShort(v.toShort).array()
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ cc(typ) ++ body

    val ftyp = box("ftyp", cc("isom") ++ be32(512) ++ cc("isom") ++ cc("avc1"))
    // mvhd v0: timescale=1000, duration=7500ms
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++ be32(7500) ++
      Array.fill[Byte](80)(0))
    // tkhd v0: width=640.0, height=360.0 as 16.16 fixed at payload offset 76/80
    val tkhd = box("tkhd", Array.fill[Byte](76)(0) ++ be32(640L << 16) ++ be32(360L << 16))
    val stsd = box("stsd", be32(0) ++ be32(1) ++
      box("avc1", Array.fill[Byte](70)(0))) // first entry fourcc at offset 12
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(90)) // 90 samples, variable size
    val stco = box("stco", be32(0) ++ be32(3) ++ be32(4000) ++ be32(5000) ++ be32(6000))
    val stss = box("stss", be32(0) ++ be32(3) ++ be32(1) ++ be32(31) ++ be32(61))
    val stbl = box("stbl", stsd ++ stsz ++ stco ++ stss)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    val mdat = box("mdat", Array.fill[Byte](64)(7))
    ftyp ++ moov ++ mdat
  }

  test("MJPEG-in-MP4 round trip: demuxed samples decode to the written pixels") {
    val levels = Seq(0, 255, 64, 192)
    val mp4 = MjpegMp4.write(
      levels.map(g => frame(36, 28, (g << 16) | (g << 8) | g)), fps = 4)
    val m = VideoCodec.probe(mp4).get
    assert(m.container == "mp4")
    assert(m.fourcc == "jpeg")
    assert(m.width == 36 && m.height == 28)
    assert(m.nFrames == 4)
    assert(m.durationMs == 1000) // 4 frames @ 4 fps
    // full sample addressing: stco × stsc × stsz
    val chunks = VideoCodec.frameChunks(mp4)
    assert(chunks.length == 4)
    val (off0, len0) = chunks.head
    val (fh, fw, _) = VideoCodec.decodeAviFrame(mp4, off0, len0).get
    assert(fh == 28 && fw == 36)
    // end-to-end real lumas out of an MP4 container
    val lumas = VideoCodec.sampleFrameLumas(mp4, 4).get
    assert(lumas.length == 4)
    assert(math.abs(lumas(0) - 0.0) < 0.05 && math.abs(lumas(1) - 1.0) < 0.05)
    assert(math.abs(lumas(2) - 64.0 / 255) < 0.05 && math.abs(lumas(3) - 192.0 / 255) < 0.05)
  }

  test("MP4 sample addressing follows stsc runs across multiple chunks") {
    // hand-build a two-chunk layout: 3 samples, chunk 1 holds 2
    // (stsc run), chunk 2 holds the rest — offsets must walk
    // back-to-back within chunk 1 then jump to chunk 2
    val jpeg = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(frame(8, 8, 0x808080), "jpg", bos)
      bos.toByteArray
    }
    val base = MjpegMp4.write(Seq.fill(3)(frame(8, 8, 0x808080)), fps = 3)
    // the bundled writer uses one chunk; verify its 1-run stsc walked
    // every sample back-to-back at the right absolute offsets
    val chunks = VideoCodec.frameChunks(base)
    assert(chunks.length == 3)
    assert(chunks(1)._1 == chunks(0)._1 + chunks(0)._2)
    assert(chunks(2)._1 == chunks(1)._1 + chunks(1)._2)
    assert(chunks.forall { case (o, l) =>
      VideoCodec.decodeAviFrame(base, o, l).isDefined })
    assert(jpeg.length == chunks(0)._2)
  }

  test("MP4 box parse: mvhd/tkhd/stsd/stsz/stco all recovered") {
    val mp4 = syntheticMp4()
    val m = VideoCodec.probe(mp4).get
    assert(m.container == "mp4")
    assert(m.fourcc == "avc1")
    assert(m.width == 640 && m.height == 360)
    assert(m.nFrames == 90)
    assert(m.durationMs == 7500)
    assert(VideoCodec.frameOffsets(mp4).toSeq == Seq(4000L, 5000L, 6000L))
    assert(VideoCodec.keyframeSamples(mp4).toSeq == Seq(1L, 31L, 61L))
    // AVI (all-intra MJPEG) has no stss: empty = every frame is a keyframe
    assert(VideoCodec.keyframeSamples(grayAvi(Seq(1, 2))).isEmpty)
  }

  test("probe rejects non-video payloads without throwing") {
    assert(VideoCodec.probe(null).isEmpty)
    assert(VideoCodec.probe(Array.emptyByteArray).isEmpty)
    assert(VideoCodec.probe(Array.fill[Byte](100)(42)).isEmpty)
    // truncated AVI header: sniffs as AVI, yields no metadata, no throw
    val avi = grayAvi(Seq(1, 2, 3))
    assert(VideoCodec.probe(avi.take(16)).isEmpty)
    assert(VideoCodec.frameOffsets(avi.take(40)).isEmpty)
    // truncated MP4: box sizes run past the payload end
    val mp4 = syntheticMp4()
    assert(VideoCodec.probe(mp4.take(mp4.length / 2)).map(_.container).forall(_ == "mp4"))
  }

  test("fuzz: random bytes and truncations never throw from any parser entry") {
    val avi = grayAvi(Seq(0, 128, 255))
    val mp4 = syntheticMp4()
    def hammer(payload: Array[Byte]): Unit = {
      VideoCodec.probe(payload)
      VideoCodec.frameOffsets(payload)
      VideoCodec.frameChunks(payload)
      VideoCodec.keyframeSamples(payload)
      VideoCodec.sampleFrameOffsets(payload, 4)
      VideoCodec.sampleFrameLumas(payload, 4)
      ()
    }
    // every truncation point of valid containers
    (0 until avi.length by 3).foreach(n => hammer(avi.take(n)))
    (0 until mp4.length by 3).foreach(n => hammer(mp4.take(n)))
    val mp4j = MjpegMp4.write(Seq(frame(8, 8, 0x404040)))
    (0 until mp4j.length by 7).foreach(n => hammer(mp4j.take(n)))
    // random garbage, and garbage wearing valid magic bytes
    val rnd = new java.util.Random(42)
    (1 to 300).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      hammer(b)
      if (b.length >= 12) {
        System.arraycopy("RIFF".getBytes, 0, b, 0, 4)
        System.arraycopy("AVI ".getBytes, 0, b, 8, 4)
        hammer(b)
        System.arraycopy("ftyp".getBytes, 0, b, 4, 4)
        hammer(b)
      }
    }
    // bit-flipped valid containers (box/chunk sizes get corrupted)
    (1 to 200).foreach { _ =>
      val b = avi.clone(); b(rnd.nextInt(b.length)) = rnd.nextInt().toByte; hammer(b)
      val m = mp4.clone(); m(rnd.nextInt(m.length)) = rnd.nextInt().toByte; hammer(m)
    }
  }

  test("forged stss/stco entry counts are clamped to the containing box") {
    // bump the declared entry count of a sample-table box far beyond
    // what fits in the box: parsers must surface only the entries that
    // physically fit — never sibling-box bytes or -1 sentinels
    def forgeCount(payload: Array[Byte], fourcc: String, n: Int): Array[Byte] = {
      val b = payload.clone()
      val at = b.indices.indexWhere(i => i + 4 <= b.length &&
        new String(b, i, 4, "US-ASCII") == fourcc)
      assert(at > 0, s"$fourcc not in fixture")
      val cnt = at + 4 + 4 // past fourcc, past version/flags
      b(cnt) = ((n >> 24) & 0xff).toByte; b(cnt + 1) = ((n >> 16) & 0xff).toByte
      b(cnt + 2) = ((n >> 8) & 0xff).toByte; b(cnt + 3) = (n & 0xff).toByte
      b
    }
    val mp4 = syntheticMp4()
    val okOffsets = VideoCodec.frameOffsets(mp4).toSeq
    val okKeys = VideoCodec.keyframeSamples(mp4).toSeq
    // in-payload but out-of-box count: clamp to the true entries
    assert(VideoCodec.frameOffsets(forgeCount(mp4, "stco", 50)).toSeq == okOffsets)
    assert(VideoCodec.keyframeSamples(forgeCount(mp4, "stss", 50)).toSeq == okKeys)
    // absurd count (would run far past the payload): same clamp, no -1s
    val huge = VideoCodec.frameOffsets(forgeCount(mp4, "stco", (1 << 22) - 2))
    assert(huge.toSeq == okOffsets)
    assert(!huge.exists(_ < 0))
  }

  test("decodeVideo operator: real columns for real videos, nulls otherwise") {
    val avi = grayAvi(Seq(0, 128, 255), w = 48, h = 36, fps = 4)
    val mp4 = syntheticMp4()
    val mp4j = MjpegMp4.write(
      Seq(0, 255).map(g => frame(16, 12, (g << 16) | (g << 8) | g)), fps = 2)
    val df = Seq(
      (1L, avi, "video", "avi"),
      (2L, mp4, "video", "mp4"),
      (3L, Array[Byte](9, 9, 9), "video", "avi"),
      (4L, mp4j, "video", "mp4"))
      .toDF("media_id", "payload", "media_type", "format")
      .repartition(2)
    val out = Multimodal.decodeVideo(df, sampleFrameCount = 3)
    assert(out.rdd.getNumPartitions == 2) // mapPartitions: no shuffle
    assert(out.schema("n_frames").dataType == LongType)
    assert(out.schema("frame_lumas").dataType == ArrayType(DoubleType))
    val rows = out.select("media_id", "container", "codec", "video_w", "video_h",
        "n_frames", "video_duration_ms", "frame_lumas")
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = rows(1L)
    assert(a.getString(1) == "avi" && a.getString(2) == "MJPG")
    assert(a.getInt(3) == 48 && a.getInt(4) == 36 && a.getLong(5) == 3)
    assert(a.getLong(6) == 750) // 3 frames @ 4 fps (250 ms each)
    val lumas = a.getSeq[Double](7)
    assert(lumas.length == 3)
    assert(math.abs(lumas(0) - 0.0) < 0.05 && math.abs(lumas(2) - 1.0) < 0.05)
    val b = rows(2L)
    assert(b.getString(1) == "mp4" && b.getString(2) == "avc1")
    assert(b.getInt(3) == 640 && b.getLong(5) == 90)
    assert(b.isNullAt(7)) // H.264 frames: demuxable, not JDK-decodable
    val c = rows(3L)
    assert(c.isNullAt(1) && c.isNullAt(3) && c.isNullAt(7))
    // MJPEG-in-MP4: the container AND the frames are real
    val d = rows(4L)
    assert(d.getString(1) == "mp4" && d.getString(2) == "jpeg")
    val dl = d.getSeq[Double](7)
    assert(dl.length == 2)
    assert(math.abs(dl(0) - 0.0) < 0.05 && math.abs(dl(1) - 1.0) < 0.05)
  }

  test("sampleFrames uses the real demuxer index for containers, stub otherwise") {
    val avi = grayAvi((0 until 10).map(_ * 25))
    val realOffsets = VideoCodec.frameOffsets(avi).toSeq
    val df = Seq(
      (1L, avi, "video", "avi"),
      (2L, Array.fill[Byte](500)(3), "video", "bin"))
      .toDF("media_id", "payload", "media_type", "format")
    val out = Multimodal.sampleFrames(df, n = 5)
      .select("media_id", "frame_offsets")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L).toSet.subsetOf(realOffsets.toSet)) // demuxer-backed
    assert(out(1L).length == 5)
    assert(out(2L).length == 5) // stub fallback still deterministic
    assert(out(2L) == Multimodal.StubCodec.frameOffsets(Array.fill[Byte](500)(3), 5).toSeq)
  }

  test("detectScenes: luma-jump cuts, flat videos, and undecodable nulls") {
    import org.apache.spark.sql.functions._
    // three scenes: dark x3, bright x3, mid x2 -> cuts at sampled
    // frames 3 and 6 (0-based), n_scenes = 3
    val scenic = grayAvi(Seq(10, 12, 11, 230, 228, 231, 120, 122))
    val flat = grayAvi(Seq(100, 101, 100, 102))
    val single = grayAvi(Seq(77))
    val df = Seq(
      (1L, scenic), (2L, flat), (3L, single),
      (4L, Array[Byte](9, 9, 9))) // not a container
      .toDF("media_id", "payload")
    val out = Multimodal.detectScenes(df, threshold = 0.12, maxFrames = 16)
      .select("media_id", "scene_cuts", "n_scenes")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getSeq[Int](1) == Seq(3, 6))
    assert(out(1L).getInt(2) == 3)
    assert(out(2L).getSeq[Int](1) == Seq.empty && out(2L).getInt(2) == 1)
    assert(out(3L).getSeq[Int](1) == Seq.empty && out(3L).getInt(2) == 1)
    assert(out(4L).isNullAt(1) && out(4L).isNullAt(2))
  }

  /** Deterministic fake coded samples (content is opaque to the
    * container — only sizes/offsets matter for addressing). */
  private def codedSamples(sizes: Seq[Int]): Seq[Array[Byte]] =
    sizes.zipWithIndex.map { case (n, i) =>
      Array.tabulate[Byte](n)(j => ((i * 31 + j) & 0xff).toByte)
    }

  test("CodedMp4/frameTable: keyframe marks, offsets, and lengths match the box tables") {
    val sizes = Seq(900, 120, 80, 850, 60, 95, 870, 40) // IBB IBB IB GOP-ish
    val keys = Seq(1, 4, 7)                             // 1-based stss
    val samples = codedSamples(sizes)
    val mp4 = CodedMp4.write(samples, keys, w = 64, h = 48, fps = 25)

    val m = VideoCodec.probe(mp4).get
    assert(m.container == "mp4" && m.fourcc == "avc1")
    assert(m.width == 64 && m.height == 48 && m.nFrames == 8)

    // stss surfaces verbatim
    assert(VideoCodec.keyframeSamples(mp4).toSeq == keys.map(_.toLong))

    val table = VideoCodec.frameTable(mp4)
    assert(table.length == 8)
    assert(table.map(_._1).toSeq == (0 until 8)) // container sample numbers
    assert(table.filter(_._2).map(_._1).toSeq == keys.map(_ - 1))
    assert(table.map(_._4).toSeq == sizes.map(_.toLong)) // stsz lengths
    // offsets: samples back-to-back from mdat start, across BOTH
    // chunks (the 2-entry stsc puts samples 0-3 in chunk 1, 4-7 in
    // chunk 2 at chunk2Off = mdatOff + sizes(0..3)) — cumulative
    // either way because the writer packs chunks contiguously
    val mdatOff = table.head._3
    val expected = sizes.scanLeft(mdatOff)(_ + _).init
    assert(table.map(_._3).toSeq == expected)
    // every address slices the written sample bytes exactly
    table.zipWithIndex.foreach { case ((_, _, off, len), i) =>
      val got = java.util.Arrays.copyOfRange(mp4, off.toInt, (off + len).toInt)
      assert(got sameElements samples(i))
    }
  }

  test("keyframeBytes exports exactly the sync samples' coded bytes") {
    val sizes = Seq(500, 100, 480, 90, 70)
    val keys = Seq(1, 3)
    val samples = codedSamples(sizes)
    val mp4 = CodedMp4.write(samples, keys)
    val kf = VideoCodec.keyframeBytes(mp4)
    assert(kf.map(_._1).toSeq == Seq(0, 2))
    assert(kf.map(_._3).toSeq == Seq(500L, 480L))
    assert(kf(0)._4 sameElements samples(0))
    assert(kf(1)._4 sameElements samples(2))
    assert(VideoCodec.keyframeBytes(mp4, maxFrames = 1).length == 1)
    // absent stss (MJPEG MP4) => every sample is a sync sample
    val mjpeg = MjpegMp4.write(Seq(frame(16, 16, 0x808080), frame(16, 16, 0x404040)), fps = 4)
    val allKey = VideoCodec.frameTable(mjpeg)
    assert(allKey.length == 2 && allKey.forall(_._2))
    // garbage payload => empty, never a throw
    assert(VideoCodec.frameTable(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoCodec.keyframeBytes(Array.fill[Byte](64)(7)).isEmpty)
  }

  test("Multimodal.exportFrames: one row per keyframe, bytes joinable to a decoder") {
    val sizes = Seq(700, 80, 60, 640, 50, 620)
    val keys = Seq(1, 4, 6)
    val samples = codedSamples(sizes)
    val mp4 = CodedMp4.write(samples, keys)
    val df = Seq((1L, mp4), (2L, Array[Byte](0, 0, 0))).toDF("media_id", "payload")

    val kf = Multimodal.exportFrames(df, keyOnly = true)
      .select("media_id", "frame_idx", "is_key", "frame_len", "frame_bytes")
      .collect()
    assert(kf.forall(_.getLong(0) == 1L)) // corrupt payload: zero rows
    assert(kf.map(_.getInt(1)).toSeq == Seq(0, 3, 5))
    assert(kf.forall(_.getBoolean(2)))
    assert(kf.map(_.getLong(3)).toSeq == Seq(700L, 640L, 620L))
    assert(kf(1).getAs[Array[Byte]](4) sameElements samples(3))

    val all = Multimodal.exportFrames(df, keyOnly = false)
      .select("frame_idx", "is_key").collect()
    assert(all.length == 6)
    assert(all.filter(_.getBoolean(1)).map(_.getInt(0)).toSeq == Seq(0, 3, 5))
    // per-video cap bounds the fan-out
    assert(Multimodal.exportFrames(df, keyOnly = false, maxFramesPerVideo = 2)
      .count() == 2)
  }
}

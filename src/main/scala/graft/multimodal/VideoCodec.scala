package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JDK video container support — no external codec libs.
  *
  * Two containers:
  *  - **RIFF/AVI** (little-endian chunk stream): full demux — `avih`
  *    main header (frame count, dimensions, frame period), the first
  *    video stream's `strh`/`strf` (fourcc, rate/scale), and the
  *    `movi` chunk walk yielding the byte offset + length of every
  *    video frame. For MJPEG (`MJPG` fourcc) each frame chunk is a
  *    complete JPEG, so frame DECODE is also real via the JDK's
  *    ImageIO — end-to-end real video processing with zero native
  *    dependencies. [[MjpegAvi.write]] is the matching pure-JDK
  *    encoder, so tests round-trip against known pixels.
  *  - **ISO BMFF / MP4** (big-endian box tree): real demux of the
  *    metadata a pipeline filters on — `mvhd` duration/timescale,
  *    `tkhd` display dimensions, `stsd` sample fourcc, `stco`/`co64`
  *    chunk offsets, `stss` sync-sample (keyframe) numbers — plus
  *    FULL sample addressing (`stco` × `stsc` × `stsz`), so
  *    `jpeg`-fourcc (MJPEG-in-MP4) frames DECODE for real through
  *    ImageIO like the AVI path ([[MjpegMp4.write]] is the matching
  *    encoder). Coded H.26x frame decode needs a native codec and
  *    stays out of scope; everything byte-offset/metadata level is
  *    real for any codec.
  *
  * Reference behavior: the reference pipeline treats media as opaque
  * payloads + extracted metadata (etl-validator's file-metadata checks);
  * this is the Spark-native analogue for the video modality.
  *
  * Scale note: all parsing is bounded, forward-only scans of an
  * in-memory payload inside `mapPartitions` — no shuffle, no driver
  * involvement, cost linear in payload bytes with small constants.
  */
object VideoCodec {

  /** Probed container metadata. `durationMs`/`nFrames` are 0 when the
    * container omits them rather than failing the probe. */
  final case class VideoMeta(
      container: String, // "avi" | "mp4"
      fourcc: String,    // video sample fourcc, e.g. "MJPG", "avc1"
      width: Int,
      height: Int,
      nFrames: Long,
      durationMs: Long)

  // ---------- shared helpers ----------

  private def fourcc(b: Array[Byte], off: Int): String =
    if (off + 4 > b.length) ""
    else new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32le(b: Array[Byte], off: Int): Long =
    if (off + 4 > b.length) -1L
    else ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xffffffffL

  private def u32be(b: Array[Byte], off: Int): Long =
    if (off + 4 > b.length) -1L
    else ByteBuffer.wrap(b, off, 4).order(ByteOrder.BIG_ENDIAN).getInt.toLong & 0xffffffffL

  private def u64be(b: Array[Byte], off: Int): Long =
    if (off + 8 > b.length) -1L
    else ByteBuffer.wrap(b, off, 8).order(ByteOrder.BIG_ENDIAN).getLong

  // ---------- public surface ----------

  def isAvi(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      fourcc(payload, 0) == "RIFF" && fourcc(payload, 8) == "AVI "

  def isMp4(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 && fourcc(payload, 4) == "ftyp"

  /** Container sniff + metadata extraction. None if the payload is not
    * a recognizable AVI/MP4 (caller falls back or surfaces nulls). */
  def probe(payload: Array[Byte]): Option[VideoMeta] =
    if (isAvi(payload)) probeAvi(payload)
    else if (isMp4(payload)) probeMp4(payload)
    else None

  /** Byte offsets (into the payload) of every video frame chunk's DATA
    * (AVI: `##dc`/`##db` chunk bodies in `movi`; MP4: `stco`/`co64`
    * chunk offsets). Empty when not demuxable. */
  def frameOffsets(payload: Array[Byte]): Array[Long] =
    if (isAvi(payload)) aviFrameChunks(payload).map(_._1)
    else if (isMp4(payload)) mp4ChunkOffsets(payload)
    else Array.emptyLongArray

  /** (offset, length) pairs of video frame/sample data — the demuxer
    * index callers need to feed [[decodeAviFrame]]. AVI: the `movi`
    * chunk walk. MP4: full sample addressing from the `stbl` tables —
    * `stco`/`co64` chunk offsets × `stsc` sample-to-chunk runs ×
    * `stsz` sample sizes (samples are laid out back-to-back inside
    * each chunk). */
  def frameChunks(payload: Array[Byte]): Array[(Long, Long)] =
    if (isAvi(payload)) aviFrameChunks(payload)
    else if (isMp4(payload)) mp4FrameChunks(payload)
    else Array.empty

  /** MP4 `stss` sync-sample table: 1-based sample numbers of the
    * keyframes of the first trak carrying one. Empty when absent —
    * which by spec means EVERY sample is a sync sample (all-intra
    * codecs like MJPEG omit the box), so callers treat empty as
    * "seek anywhere". */
  def keyframeSamples(payload: Array[Byte]): Array[Long] =
    if (!isMp4(payload)) Array.emptyLongArray
    else {
      var result: Array[Long] = Array.emptyLongArray
      boxes(payload, 0, payload.length) { (typ, off, end) =>
        if (typ == "moov" && result.isEmpty) boxes(payload, off, end) { (t2, o2, e2) =>
          if (t2 == "trak" && result.isEmpty) boxes(payload, o2, e2) { (t3, o3, e3) =>
            if (t3 == "mdia") boxes(payload, o3, e3) { (t4, o4, e4) =>
              if (t4 == "minf") boxes(payload, o4, e4) { (t5, o5, e5) =>
                if (t5 == "stbl") boxes(payload, o5, e5) { (t6, o6, e6) =>
                  if (t6 == "stss" && result.isEmpty && o6 + 8 <= e6) {
                    // clamp the declared count to entries fully inside
                    // THIS box — a forged count must neither read into
                    // sibling boxes nor fabricate out-of-payload values
                    val n = math.min(u32be(payload, o6 + 4),
                      (e6 - (o6 + 8)) / 4L).toInt
                    if (n > 0 && n < (1 << 22))
                      result = Array.tabulate(n)(i => u32be(payload, o6 + 8 + 4 * i))
                  }
                }
              }
            }
          }
        }
      }
      result
    }

  /** `n` evenly spaced frame offsets — the demuxer-backed version of
    * the frame-sampling kernel. None when the container yields no
    * frame index. */
  def sampleFrameOffsets(payload: Array[Byte], n: Int): Option[Array[Long]] = {
    val all = frameOffsets(payload)
    if (all.isEmpty || n <= 0) None
    else if (all.length <= n) Some(all)
    else Some(Array.tabulate(n)(i => all(((i.toLong * all.length) / n).toInt)))
  }

  /** REAL frame decode for an MJPEG sample: the frame data at
    * (offset, len) is a complete JPEG — true for MJPEG-AVI `00dc`
    * chunks AND for `jpeg`-fourcc MP4 samples — decoded to (height,
    * width, meanLuma∈[0,1]) with the same bounded-grid luma sampling
    * as the image path. (Named for the AVI path that came first; the
    * kernel is container-agnostic.) */
  def decodeAviFrame(payload: Array[Byte], offset: Long, len: Long): Option[(Int, Int, Double)] =
    try {
      if (offset < 0 || len <= 0 || offset + len > payload.length) None
      else {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload, offset.toInt, len.toInt))
        if (img == null) None
        else Some((img.getHeight, img.getWidth, Multimodal.meanLumaOf(img)))
      }
    } catch { case _: Throwable => None }

  /** fourccs whose samples are complete JPEGs the JDK can decode. */
  private val jpegFourccs = Set("MJPG", "mjpg", "jpeg", "mjpa", "mjpb")

  /** Decode `n` evenly spaced frames to mean-luma values — the real
    * end-to-end video → per-frame-feature kernel. MJPEG-AVI and
    * MJPEG-in-MP4 (`jpeg` sample fourcc) decode for real; coded
    * H.26x streams return None (native codec out of scope). */
  def sampleFrameLumas(payload: Array[Byte], n: Int): Option[Array[Double]] = {
    if (n <= 0) return None
    val chunks: Array[(Long, Long)] =
      if (isAvi(payload)) aviFrameChunks(payload)
      else if (isMp4(payload) && probe(payload).exists(m => jpegFourccs(m.fourcc)))
        mp4FrameChunks(payload)
      else Array.empty
    if (chunks.isEmpty) return None
    val pick =
      if (chunks.length <= n) chunks
      else Array.tabulate(n)(i => chunks(((i.toLong * chunks.length) / n).toInt))
    val lumas = pick.flatMap { case (off, len) =>
      decodeAviFrame(payload, off, len).map(_._3)
    }
    if (lumas.isEmpty) None else Some(lumas)
  }

  // ---------- AVI (RIFF, little-endian) ----------

  /** Walk a RIFF chunk range, invoking `f(fcc, listType, bodyOff,
    * bodySize)` per chunk; recursion into LIST bodies is the caller's
    * choice via the return offsets. Chunks are 2-byte aligned. */
  private def riffChunks(b: Array[Byte], from: Int, until: Int)(
      f: (String, String, Int, Int) => Unit): Unit = {
    var off = from
    while (off + 8 <= until) {
      val fcc = fourcc(b, off)
      val size = u32le(b, off + 4)
      if (size < 0 || size > Int.MaxValue - 8) return
      val bodyOff = off + 8
      val sz = math.min(size, (until - bodyOff).toLong).toInt
      if (sz < 0) return
      val listType = if (fcc == "LIST" || fcc == "RIFF") fourcc(b, bodyOff) else ""
      f(fcc, listType, bodyOff, sz)
      off = bodyOff + sz + (sz & 1) // word alignment
    }
  }

  private def probeAvi(b: Array[Byte]): Option[VideoMeta] = {
    var totalFrames = 0L; var usPerFrame = 0L
    var w = 0; var h = 0
    var vfourcc = ""
    var rate = 0L; var scale = 0L
    riffChunks(b, 12, b.length) { (fcc, lt, off, sz) =>
      if (fcc == "LIST" && lt == "hdrl") {
        riffChunks(b, off + 4, off + sz) { (fcc2, lt2, off2, sz2) =>
          if (fcc2 == "avih" && sz2 >= 40) {
            usPerFrame = u32le(b, off2)
            totalFrames = u32le(b, off2 + 16)
            w = u32le(b, off2 + 32).toInt
            h = u32le(b, off2 + 36).toInt
          } else if (fcc2 == "LIST" && lt2 == "strl") {
            var isVideo = false
            riffChunks(b, off2 + 4, off2 + sz2) { (fcc3, _, off3, sz3) =>
              if (fcc3 == "strh" && sz3 >= 32) {
                if (fourcc(b, off3) == "vids" && vfourcc.isEmpty) {
                  isVideo = true
                  vfourcc = fourcc(b, off3 + 4).trim
                  scale = u32le(b, off3 + 20)
                  rate = u32le(b, off3 + 24)
                }
              } else if (fcc3 == "strf" && isVideo && sz3 >= 16 && (w == 0 || h == 0)) {
                // BITMAPINFOHEADER: biWidth @4, biHeight @8
                w = u32le(b, off3 + 4).toInt
                h = math.abs(u32le(b, off3 + 8).toInt)
              }
            }
          }
        }
      }
    }
    if (w <= 0 && h <= 0 && totalFrames == 0) None
    else {
      val durMs =
        if (totalFrames > 0 && usPerFrame > 0) totalFrames * usPerFrame / 1000
        else if (totalFrames > 0 && rate > 0 && scale > 0) totalFrames * scale * 1000 / rate
        else 0L
      Some(VideoMeta("avi", vfourcc, w, h, totalFrames, durMs))
    }
  }

  /** (dataOffset, dataLen) of every video frame chunk (`##dc`
    * compressed / `##db` uncompressed) inside `movi`, in stream order. */
  private def aviFrameChunks(b: Array[Byte]): Array[(Long, Long)] = {
    val out = Array.newBuilder[(Long, Long)]
    riffChunks(b, 12, b.length) { (fcc, lt, off, sz) =>
      if (fcc == "LIST" && lt == "movi") {
        riffChunks(b, off + 4, off + sz) { (fcc2, _, off2, sz2) =>
          val isFrame = fcc2.length == 4 &&
            fcc2(0).isDigit && fcc2(1).isDigit &&
            ((fcc2(2) == 'd' && (fcc2(3) == 'c' || fcc2(3) == 'b')))
          if (isFrame && sz2 > 0) out += ((off2.toLong, sz2.toLong))
        }
      }
    }
    out.result()
  }

  // ---------- MP4 / ISO BMFF (big-endian) ----------

  /** Walk a box range, invoking `f(type, bodyOff, bodyEnd)`. Handles
    * 64-bit largesize and size==0 (extends to range end). */
  private def boxes(b: Array[Byte], from: Int, until: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var off = from
    while (off + 8 <= until) {
      var size = u32be(b, off)
      val typ = fourcc(b, off + 4)
      var bodyOff = off + 8
      if (size == 1) { size = u64be(b, off + 8); bodyOff = off + 16 }
      else if (size == 0) size = (until - off).toLong
      if (size < 8 || off + size > until || size > Int.MaxValue) return
      f(typ, bodyOff, off + size.toInt)
      off += size.toInt
    }
  }

  private def probeMp4(b: Array[Byte]): Option[VideoMeta] = {
    var timescale = 0L; var duration = 0L
    var w = 0; var h = 0
    var vfourcc = ""
    var nSamples = 0L
    var found = false
    boxes(b, 0, b.length) { (typ, off, end) =>
      if (typ == "moov") {
        found = true
        boxes(b, off, end) { (t2, o2, e2) =>
          if (t2 == "mvhd" && o2 < b.length) {
            val v = b(o2) & 0xff
            if (v == 1) { timescale = u32be(b, o2 + 20); duration = u64be(b, o2 + 24) }
            else { timescale = u32be(b, o2 + 12); duration = u32be(b, o2 + 16) }
          } else if (t2 == "trak") {
            // only take the first video trak (one with a width/height)
            var tw = 0; var th = 0; var tfcc = ""; var tn = 0L
            boxes(b, o2, e2) { (t3, o3, e3) =>
              if (t3 == "tkhd" && o3 < b.length) {
                val v = b(o3) & 0xff
                val base = if (v == 1) o3 + 88 else o3 + 76
                tw = (u32be(b, base) >> 16).toInt      // 16.16 fixed
                th = (u32be(b, base + 4) >> 16).toInt
              } else if (t3 == "mdia") {
                boxes(b, o3, e3) { (t4, o4, e4) =>
                  if (t4 == "minf") boxes(b, o4, e4) { (t5, o5, e5) =>
                    if (t5 == "stbl") boxes(b, o5, e5) { (t6, o6, _) =>
                      if (t6 == "stsd") {
                        // entry_count @4; first entry: size@8, fourcc@12
                        if (u32be(b, o6 + 4) > 0) tfcc = fourcc(b, o6 + 12)
                      } else if (t6 == "stsz") {
                        tn = u32be(b, o6 + 8) // sample_count
                      }
                    }
                  }
                }
              }
            }
            if (tw > 0 && th > 0 && w == 0) { w = tw; h = th; vfourcc = tfcc; nSamples = tn }
            else if (vfourcc.isEmpty && tfcc.nonEmpty && w == 0) { vfourcc = tfcc; nSamples = tn }
          }
        }
      }
    }
    if (!found) None
    else {
      val durMs = if (timescale > 0) duration * 1000 / timescale else 0L
      Some(VideoMeta("mp4", vfourcc, w, h, nSamples, durMs))
    }
  }

  /** `stco`/`co64` media-chunk byte offsets of the first trak that has
    * them — the real demuxer frame-offset index for MP4. */
  private def mp4ChunkOffsets(b: Array[Byte]): Array[Long] = {
    var result: Array[Long] = Array.emptyLongArray
    boxes(b, 0, b.length) { (typ, off, end) =>
      if (typ == "moov" && result.isEmpty) boxes(b, off, end) { (t2, o2, e2) =>
        if (t2 == "trak" && result.isEmpty) boxes(b, o2, e2) { (t3, o3, e3) =>
          if (t3 == "mdia") boxes(b, o3, e3) { (t4, o4, e4) =>
            if (t4 == "minf") boxes(b, o4, e4) { (t5, o5, e5) =>
              if (t5 == "stbl") boxes(b, o5, e5) { (t6, o6, e6) =>
                // entry counts clamped to the containing box end: forged
                // counts must neither read sibling boxes nor fabricate
                // out-of-payload sentinel offsets
                if (t6 == "stco" && result.isEmpty && o6 + 8 <= e6) {
                  val n = math.min(u32be(b, o6 + 4), (e6 - (o6 + 8)) / 4L).toInt
                  if (n > 0 && n < (1 << 22))
                    result = Array.tabulate(n)(i => u32be(b, o6 + 8 + 4 * i))
                } else if (t6 == "co64" && result.isEmpty && o6 + 8 <= e6) {
                  val n = math.min(u32be(b, o6 + 4), (e6 - (o6 + 8)) / 8L).toInt
                  if (n > 0 && n < (1 << 22))
                    result = Array.tabulate(n)(i => u64be(b, o6 + 8 + 8 * i))
                }
              }
            }
          }
        }
      }
    }
    result
  }

  /** Full MP4 sample addressing: (offset, length) per sample of the
    * first trak carrying a complete `stco`(/`co64`) + `stsz` pair.
    * `stsc` runs map samples into chunks (absent/empty stsc with
    * equal chunk and sample counts degrades to one sample per chunk);
    * samples sit back-to-back inside each chunk, so offset = chunk
    * offset + the sizes of the samples before it in that chunk. All
    * entry counts are clamped to their boxes (see mp4ChunkOffsets);
    * samples that would run outside the payload are dropped rather
    * than surfaced as unreadable addresses. */
  private[multimodal] def mp4FrameChunks(b: Array[Byte]): Array[(Long, Long)] =
    mp4SampleTable(b).map { case (_, off, len) => (off, len) }

  /** Like [[mp4FrameChunks]] but carrying each sample's 0-based stbl
    * sample number, so callers that join against 1-based `stss` sync
    * numbers stay aligned even when out-of-payload samples are
    * dropped from the table. */
  private[multimodal] def mp4SampleTable(b: Array[Byte]): Array[(Int, Long, Long)] = {
    var offsets: Array[Long] = Array.emptyLongArray
    var sizes: Array[Long] = Array.emptyLongArray
    var stsc: Array[(Long, Long)] = Array.empty // (first_chunk 1-based, samples_per_chunk)
    var taken = false
    boxes(b, 0, b.length) { (typ, off, end) =>
      if (typ == "moov" && !taken) boxes(b, off, end) { (t2, o2, e2) =>
        if (t2 == "trak" && !taken) {
          var tOff: Array[Long] = Array.emptyLongArray
          var tSz: Array[Long] = Array.emptyLongArray
          var tSc: Array[(Long, Long)] = Array.empty
          boxes(b, o2, e2) { (t3, o3, e3) =>
            if (t3 == "mdia") boxes(b, o3, e3) { (t4, o4, e4) =>
              if (t4 == "minf") boxes(b, o4, e4) { (t5, o5, e5) =>
                if (t5 == "stbl") boxes(b, o5, e5) { (t6, o6, e6) =>
                  if (t6 == "stco" && tOff.isEmpty && o6 + 8 <= e6) {
                    val n = math.min(u32be(b, o6 + 4), (e6 - (o6 + 8)) / 4L).toInt
                    if (n > 0 && n < (1 << 22))
                      tOff = Array.tabulate(n)(i => u32be(b, o6 + 8 + 4 * i))
                  } else if (t6 == "co64" && tOff.isEmpty && o6 + 8 <= e6) {
                    val n = math.min(u32be(b, o6 + 4), (e6 - (o6 + 8)) / 8L).toInt
                    if (n > 0 && n < (1 << 22))
                      tOff = Array.tabulate(n)(i => u64be(b, o6 + 8 + 8 * i))
                  } else if (t6 == "stsz" && tSz.isEmpty && o6 + 12 <= e6) {
                    val uniform = u32be(b, o6 + 4)
                    val n0 = u32be(b, o6 + 8)
                    if (uniform > 0 && n0 > 0 && n0 < (1 << 22))
                      tSz = Array.fill(n0.toInt)(uniform)
                    else {
                      val n = math.min(n0, (e6 - (o6 + 12)) / 4L).toInt
                      if (n > 0 && n < (1 << 22))
                        tSz = Array.tabulate(n)(i => u32be(b, o6 + 12 + 4 * i))
                    }
                  } else if (t6 == "stsc" && tSc.isEmpty && o6 + 8 <= e6) {
                    val n = math.min(u32be(b, o6 + 4), (e6 - (o6 + 8)) / 12L).toInt
                    if (n > 0 && n < (1 << 20))
                      tSc = Array.tabulate(n)(i =>
                        (u32be(b, o6 + 8 + 12 * i), u32be(b, o6 + 12 + 12 * i)))
                  }
                }
              }
            }
          }
          if (tOff.nonEmpty && tSz.nonEmpty) {
            offsets = tOff; sizes = tSz; stsc = tSc; taken = true
          }
        }
      }
    }
    if (offsets.isEmpty || sizes.isEmpty) return Array.empty
    // samples per chunk from the stsc runs (1:1 when absent)
    def samplesInChunk(chunk1: Int): Long =
      if (stsc.isEmpty) 1L
      else stsc.foldLeft(1L) { case (acc, (first, spc)) =>
        if (first <= chunk1 && first >= 1) spc else acc
      }
    val out = Array.newBuilder[(Int, Long, Long)]
    var sample = 0
    var chunk = 1
    while (sample < sizes.length && chunk <= offsets.length) {
      var within = 0L
      var cursor = offsets(chunk - 1)
      val spc = samplesInChunk(chunk)
      while (within < spc && sample < sizes.length) {
        val len = sizes(sample)
        if (len > 0 && cursor >= 0 && cursor + len <= b.length)
          out += ((sample, cursor, len))
        cursor += len
        within += 1
        sample += 1
      }
      chunk += 1
    }
    out.result()
  }

  /** Full frame/sample address table: (frame_idx — the container's own
    * 0-based sample number — , is_key, offset, length). MP4: the
    * `stbl` addressing ([[mp4SampleTable]]) crossed with `stss` sync
    * marks; an absent `stss` means EVERY sample is a sync sample, per
    * spec (all-intra codecs omit the box). AVI: the `movi` chunk walk;
    * all frames marked key (the MJPEG payloads this demuxer decodes
    * are all-intra, and AVI key flags live in the optional `idx1`
    * index legacy muxers omit — conservative all-true). */
  def frameTable(payload: Array[Byte]): Array[(Int, Boolean, Long, Long)] =
    if (isAvi(payload))
      aviFrameChunks(payload).zipWithIndex.map { case ((off, len), i) => (i, true, off, len) }
    else if (isMp4(payload)) {
      val keys = keyframeSamples(payload) // 1-based sample numbers
      val keySet = keys.toSet
      mp4SampleTable(payload).map { case (i, off, len) =>
        (i, keys.isEmpty || keySet.contains(i + 1L), off, len)
      }
    } else Array.empty

  /** Addressed keyframe EXPORT for coded codecs: (frame_idx, offset,
    * length, coded bytes) per sync sample, in stream order. Decode
    * stays out of scope for H.26x — what this emits is the exact
    * coded sample bytes the `stss`×`stsc`×`stsz`×`stco` tables
    * address, sliceable without parsing the stream, joinable to an
    * external decoder. `maxFrames` bounds the copy for pathological
    * sync tables. */
  def keyframeBytes(payload: Array[Byte],
                    maxFrames: Int = Int.MaxValue): Array[(Int, Long, Long, Array[Byte])] =
    frameTable(payload).iterator
      .filter(_._2).take(math.max(0, maxFrames))
      .map { case (i, _, off, len) =>
        (i, off, len,
          java.util.Arrays.copyOfRange(payload, off.toInt, (off + len).toInt))
      }.toArray
}

/** Pure-JDK MJPEG-AVI **encoder**: JPEG-encode each frame with ImageIO
  * and wrap in a minimal-but-spec-correct RIFF/AVI container (`avih` +
  * `strl(vids/MJPG)` + `movi` with `00dc` chunks). Exists so the
  * demux/decode path round-trips against known pixels in tests, and as
  * a real video SINK for pipelines that emit frame sequences. */
object MjpegAvi {

  def write(frames: Seq[java.awt.image.BufferedImage], fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty && fps > 0)
    val jpegs = frames.map { img =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val (w, h) = (frames.head.getWidth, frames.head.getHeight)
    val usPerFrame = 1000000 / fps

    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()
    def le16(v: Int): Array[Byte] =
      ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
    def cc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(fcc: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
      cc(fcc) ++ le32(body.length) ++ body ++ pad
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(listType) ++ body)

    val avih = chunk("avih",
      le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0x10 /*AVIF_HASINDEX off; none*/ & 0) ++
        le32(jpegs.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      cc("vids") ++ cc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++
        le32(1) /*scale*/ ++ le32(fps) /*rate*/ ++ le32(0) ++
        le32(jpegs.length) ++ le32(jpegs.map(_.length).max.toLong) ++ le32(-1) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf", // BITMAPINFOHEADER
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ cc("MJPG") ++
        le32(w.toLong * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    val riffBody = cc("AVI ") ++ hdrl ++ movi
    bos.write(cc("RIFF")); bos.write(le32(riffBody.length)); bos.write(riffBody)
    bos.toByteArray
  }
}

/** Pure-JDK MJPEG-in-MP4 **encoder**: JPEG-encode each frame and wrap
  * in a minimal-but-spec-shaped ISO BMFF container — `ftyp`, `mdat`
  * holding the JPEG samples back-to-back, and a `moov` with real
  * `mvhd`/`tkhd` and a complete sample table (`stsd` with the `jpeg`
  * sample entry, `stts`, `stsc` one-run, `stsz` per-sample sizes,
  * `stco` one chunk). Exists so the MP4 demux + frame-decode path
  * round-trips against known pixels, mirroring [[MjpegAvi]]. */
/** Pure-JDK **coded-codec** MP4 writer: wraps caller-supplied coded
  * sample payloads (e.g. H.264 access units — content is opaque to the
  * container) in a spec-correct `avc1` track with a real `stss`
  * sync-sample table and samples split across TWO chunks (a 2-entry
  * `stsc`), so the keyframe-export path is exercised against genuinely
  * multi-chunk addressing, not the single-chunk layout MJPEG tests
  * use. Exists as the test fixture for [[VideoCodec.frameTable]] /
  * [[VideoCodec.keyframeBytes]] and as a real sink for pipelines that
  * re-mux addressed coded samples. */
object CodedMp4 {

  /** @param samples    coded sample payloads, stream order
    * @param keyframes1 1-based sample numbers for the `stss` box */
  def write(samples: Seq[Array[Byte]], keyframes1: Seq[Int],
            w: Int = 64, h: Int = 48, fps: Int = 25): Array[Byte] = {
    require(samples.nonEmpty && fps > 0)
    def be32(v: Long): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(v.toInt).array()
    def be16(v: Int): Array[Byte] =
      ByteBuffer.allocate(2).order(ByteOrder.BIG_ENDIAN).putShort(v.toShort).array()
    def cc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ cc(typ) ++ body
    def full(typ: String, body: Array[Byte]): Array[Byte] =
      box(typ, be32(0) ++ body)

    val ftyp = box("ftyp", cc("isom") ++ be32(512) ++ cc("isom") ++ cc("avc1"))
    val mdatBody = samples.toArray.flatten
    val mdatOff = ftyp.length + 8L
    // two chunks: first ceil(n/2) samples back-to-back, rest in chunk 2
    val n = samples.length
    val spc1 = (n + 1) / 2
    val chunk1Off = mdatOff
    val chunk2Off = mdatOff + samples.take(spc1).map(_.length.toLong).sum
    val timescale = 1000L
    val durMs = n * 1000L / fps

    val mvhd = full("mvhd",
      be32(0) ++ be32(0) ++ be32(timescale) ++ be32(durMs) ++
        be32(0x00010000L) ++ be16(0x0100) ++ be16(0) ++ be32(0) ++ be32(0) ++
        Array.fill(36)(0.toByte) ++
        Array.fill(24)(0.toByte) ++ be32(2))
    val tkhd = full("tkhd",
      be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(durMs) ++
        Array.fill(8)(0.toByte) ++ be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++
        Array.fill(36)(0.toByte) ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16))
    val mdhd = full("mdhd",
      be32(0) ++ be32(0) ++ be32(timescale) ++ be32(durMs) ++ be16(0x55c4) ++ be16(0))
    val hdlr = full("hdlr",
      be32(0) ++ cc("vide") ++ Array.fill(12)(0.toByte) ++ cc("vh") ++ Array[Byte](0))
    // minimal avcC (AVCDecoderConfigurationRecord): baseline 3.0, no
    // parameter sets — structurally present so real demuxers accept
    // the sample entry; decode is out of scope
    // version 1, profile 66 (baseline), compat 0, level 30,
    // lengthSizeMinusOne 0xFF, numSPS 0xE0|0, numPPS 0
    val avcC = box("avcC", Array[Byte](1, 66, 0, 30, -1, -32, 0))
    val sampleEntry = box("avc1",
      Array.fill(6)(0.toByte) ++ be16(1) ++
        be16(0) ++ be16(0) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be16(w) ++ be16(h) ++ be32(0x00480000L) ++ be32(0x00480000L) ++
        be32(0) ++ be16(1) ++ Array.fill(32)(0.toByte) ++ be16(24) ++ be16(0xffff) ++ avcC)
    val stsd = full("stsd", be32(1) ++ sampleEntry)
    val stts = full("stts", be32(1) ++ be32(n.toLong) ++ be32(timescale / fps))
    val stsc = full("stsc",
      be32(2) ++
        be32(1) ++ be32(spc1.toLong) ++ be32(1) ++
        be32(2) ++ be32((n - spc1).toLong max 1L) ++ be32(1))
    val stsz = full("stsz",
      be32(0) ++ be32(n.toLong) ++
        samples.toArray.flatMap(s => be32(s.length.toLong)))
    val stco = full("stco", be32(2) ++ be32(chunk1Off) ++ be32(chunk2Off))
    val stss = full("stss",
      be32(keyframes1.length.toLong) ++ keyframes1.toArray.flatMap(k => be32(k.toLong)))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stss ++ stco)
    val dinf = box("dinf", full("dref", be32(1) ++ full("url ", Array.emptyByteArray)))
    val vmhd = full("vmhd", be16(0) ++ be16(0) ++ be16(0) ++ be16(0))
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ box("mdat", mdatBody) ++ moov
  }
}

object MjpegMp4 {

  def write(frames: Seq[java.awt.image.BufferedImage], fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty && fps > 0)
    val jpegs = frames.map { img =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val (w, h) = (frames.head.getWidth, frames.head.getHeight)
    def be32(v: Long): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(v.toInt).array()
    def be16(v: Int): Array[Byte] =
      ByteBuffer.allocate(2).order(ByteOrder.BIG_ENDIAN).putShort(v.toShort).array()
    def cc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ cc(typ) ++ body
    def full(typ: String, body: Array[Byte]): Array[Byte] =
      box(typ, be32(0) ++ body) // version 0, flags 0

    val ftyp = box("ftyp", cc("isom") ++ be32(512) ++ cc("isom") ++ cc("iso2"))
    // mdat follows ftyp: sample offsets are absolute in the file
    val mdatBody = jpegs.toArray.flatten
    val mdatOff = ftyp.length + 8L
    val timescale = 1000L
    val durMs = jpegs.length * 1000L / fps

    val mvhd = full("mvhd",
      be32(0) ++ be32(0) ++ be32(timescale) ++ be32(durMs) ++
        be32(0x00010000L) ++ be16(0x0100) ++ be16(0) ++ be32(0) ++ be32(0) ++
        Array.fill(36)(0.toByte) ++ // rate/volume matrix region the probe skips
        Array.fill(24)(0.toByte) ++ be32(2))
    val tkhd = full("tkhd",
      be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(durMs) ++
        Array.fill(8)(0.toByte) ++ be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++
        Array.fill(36)(0.toByte) ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16)) // 16.16 fixed
    val mdhd = full("mdhd",
      be32(0) ++ be32(0) ++ be32(timescale) ++ be32(durMs) ++ be16(0x55c4) ++ be16(0))
    val hdlr = full("hdlr",
      be32(0) ++ cc("vide") ++ Array.fill(12)(0.toByte) ++ cc("vh") ++ Array[Byte](0))
    // sample entry: 'jpeg' VisualSampleEntry (standard 86-byte layout)
    val sampleEntry = box("jpeg",
      Array.fill(6)(0.toByte) ++ be16(1) ++
        be16(0) ++ be16(0) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be16(w) ++ be16(h) ++ be32(0x00480000L) ++ be32(0x00480000L) ++
        be32(0) ++ be16(1) ++ Array.fill(32)(0.toByte) ++ be16(24) ++ be16(0xffff))
    val stsd = full("stsd", be32(1) ++ sampleEntry)
    val stts = full("stts", be32(1) ++ be32(jpegs.length.toLong) ++ be32(timescale / fps))
    val stsc = full("stsc", be32(1) ++ be32(1) ++ be32(jpegs.length.toLong) ++ be32(1))
    val stsz = full("stsz",
      be32(0) ++ be32(jpegs.length.toLong) ++
        jpegs.toArray.flatMap(j => be32(j.length.toLong)))
    val stco = full("stco", be32(1) ++ be32(mdatOff))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val dinf = box("dinf", full("dref", be32(1) ++ full("url ", Array.emptyByteArray)))
    val vmhd = full("vmhd", be16(0) ++ be16(0) ++ be16(0) ++ be16(0))
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ box("mdat", mdatBody) ++ moov
  }
}

package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.{AudioMeta, ImageDims}

/** Media-payload routing — the front door of a multimodal crawl
  * pipeline: one narrow pass over an opaque binary column decides
  * WHAT each payload is (image/audio/pdf via the header kernels, no
  * decode), attaches the type's scan-speed metadata (dims, rate,
  * duration), runs the privacy checks (EXIF GPS probe + lossless
  * strip), and leaves a frame that downstream per-type operators
  * filter on. Everything is codegen'd expressions in ONE projection —
  * at 100 TB the router costs one scan, no shuffle, no decode. */
object MediaRoute {

  /** 'image/<fmt>' | 'audio/<fmt>' | 'pdf' | 'unknown' from header
    * magic alone. The image probe wins ties by running first (a WebP
    * RIFF container must not be claimed by the WAV RIFF walk — both
    * check their own form fourcc, so there is no actual ambiguity;
    * order just pins the contract). */
  def mediaFormat(payload: Column): Column = {
    val img = ImageDims.imageDims(payload)
    val aud = AudioMeta.audioMeta(payload)
    val pdfMagic = substring(payload, 1, 5) === lit("%PDF-".getBytes("US-ASCII"))
    when(img.isNotNull, concat(lit("image/"), img.getField("format")))
      .when(aud.isNotNull, concat(lit("audio/"), aud.getField("format")))
      .when(pdfMagic, lit("pdf"))
      .otherwise(lit("unknown"))
  }

  /** The routed frame: input columns plus
    * `(media_format, width, height, sample_rate, duration_s,
    * exif_gps, payload_clean)` — `payload_clean` is the EXIF-stripped
    * payload for JPEGs (reference-identical bytes for everything
    * else, so the column costs nothing where it no-ops). Downstream:
    * `where(col("media_format").startsWith("image"))` etc. */
  def route(df: DataFrame, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    val img = ImageDims.imageDims(p)
    val aud = AudioMeta.audioMeta(p)
    df.withColumn("media_format", mediaFormat(p))
      .withColumn("width", img.getField("width"))
      .withColumn("height", img.getField("height"))
      .withColumn("sample_rate", aud.getField("sample_rate"))
      .withColumn("duration_s", aud.getField("duration_s"))
      .withColumn("exif_gps", ImageDims.exifHasGps(p))
      .withColumn("payload_clean", ImageDims.stripExif(p))
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Perceptual image hashing + near-duplicate detection — the
  * multimodal analogue of text SimHash: a 64-bit content fingerprint
  * that survives re-encoding, resizing, and small edits, so duplicate
  * images dedup by Hamming distance exactly like documents do. Decode
  * is the REAL JDK codec (ImageIO: PNG/BMP/GIF/JPEG work offline);
  * the hash pipeline — banding, bucket capping, Hamming verify — is
  * graft.ops.Similarity.simhashPairsFromHashes verbatim, so image and
  * text near-dup share one audited scale path (pigeonhole banding:
  * pairs come from shared small band keys, never corpus²).
  *
  * Scale shape: hashing is a narrow mapPartitions (decode + 8×8
  * downscale per payload, no shuffle, cost independent of megapixels
  * — the downscale samples a bounded grid); the pair join runs on
  * 8-byte hashes, not payloads. At 100 TB the payload column never
  * shuffles anywhere.
  */
object ImageHash {

  /** Bounded-grid 8×8 (or `(w+1)×h` for dHash) luma downscale:
    * averages a ≤32×32 probe grid per target cell rather than every
    * source pixel, so a 100-megapixel payload costs the same as a
    * thumbnail (same discipline as Multimodal.JdkImageCodec). */
  private def lumaGrid(img: java.awt.image.BufferedImage,
      gw: Int, gh: Int): Array[Double] = {
    val (h, w) = (img.getHeight, img.getWidth)
    val out = new Array[Double](gw * gh)
    var cy = 0
    while (cy < gh) {
      val y0 = (cy.toLong * h / gh).toInt
      val y1 = math.max(y0 + 1, ((cy + 1).toLong * h / gh).toInt)
      val sy = math.max(1, (y1 - y0) / 32)
      var cx = 0
      while (cx < gw) {
        val x0 = (cx.toLong * w / gw).toInt
        val x1 = math.max(x0 + 1, ((cx + 1).toLong * w / gw).toInt)
        val sx = math.max(1, (x1 - x0) / 32)
        var (sum, n) = (0.0, 0L)
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            n += 1
            x += sx
          }
          y += sy
        }
        out(cy * gw + cx) = if (n == 0) 0.0 else sum / n
        cx += 1
      }
      cy += 1
    }
    out
  }

  private def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** 64-bit average hash: bit i set iff cell i's luma exceeds the 8×8
    * grid mean. Robust to re-encode/resize; brightness-shift
    * invariant (the mean shifts with it). */
  def aHash64(payload: Array[Byte]): Option[Long] =
    decode(payload).map { img =>
      val g = lumaGrid(img, 8, 8)
      val mean = g.sum / 64.0
      var (bits, i) = (0L, 0)
      while (i < 64) { if (g(i) > mean) bits |= (1L << i); i += 1 }
      bits
    }

  /** 64-bit difference hash: 9×8 grid, bit (r,c) set iff cell (r,c+1)
    * is brighter than (r,c) — encodes the horizontal gradient sign,
    * robust to global brightness/contrast changes. */
  def dHash64(payload: Array[Byte]): Option[Long] =
    decode(payload).map { img =>
      val g = lumaGrid(img, 9, 8)
      var (bits, i) = (0L, 0)
      while (i < 64) {
        val (r, c) = (i / 8, i % 8)
        if (g(r * 9 + c + 1) > g(r * 9 + c)) bits |= (1L << i)
        i += 1
      }
      bits
    }

  /** Hash every payload: `(id, simhash)` — the column names
    * Similarity.simhashPairsFromHashes expects, so the text and image
    * near-dup paths share one banding implementation. Undecodable
    * payloads get null. `kind` ∈ {"ahash", "dhash"}. */
  def hashImages(df: DataFrame, idCol: String, payloadCol: String,
      kind: String = "dhash"): DataFrame = {
    require(kind == "ahash" || kind == "dhash", s"unknown hash kind $kind")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("simhash", LongType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val useA = kind == "ahash"
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("p"))
      .mapPartitions { rows =>
        rows.map { r =>
          // null / non-numeric id → fail fast with a row-level message
          // instead of an opaque NPE from getLong failing the job
          if (r.isNullAt(0)) throw new IllegalArgumentException(
            s"hashImages: '$idCol' is null or not long-castable for a row")
          val h = Option(r.getAs[Array[Byte]]("p"))
            .flatMap(p => if (useA) aHash64(p) else dHash64(p))
          Row(r.getLong(0), h.map(Long.box).orNull)
        }
      }(enc)
  }

  /** Near-duplicate image pairs `(id1, id2, hamming)` within
    * `maxHamming` bits: perceptual hash → pigeonhole banding → capped
    * buckets → Hamming verify, all via the shared Similarity path.
    * Undecodable payloads drop out (no defined similarity). */
  def nearDuplicates(df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 3, maxBucket: Int = 500,
      kind: String = "dhash"): DataFrame =
    graft.ops.Similarity.simhashPairsFromHashes(
      hashImages(df, idCol, payloadCol, kind).where(col("simhash").isNotNull),
      maxHamming, maxBucket)
}

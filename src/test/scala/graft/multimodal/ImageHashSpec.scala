package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImageHashSpec extends SparkSpec {

  import spark.implicits._

  /** PNG of a deterministic per-pixel pattern. */
  private def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def gray(v: Int) = { val c = math.max(0, math.min(255, v)); (c << 16) | (c << 8) | c }
  // smooth diagonal-gradient "scene" in RELATIVE coordinates (so a
  // resize reproduces it); optional brightness shift and sparse noise
  private def scene(w: Int, h: Int, shift: Int = 0, noise: Int = 0,
      flipX: Boolean = false) =
    png(w, h) { (x0, y) =>
      val x = if (flipX) w - 1 - x0 else x0
      if (noise > 0 && (x0 * 31 + y * 17) % 997 < noise) gray(255)
      else gray(20 + shift + (x * 160) / w + (y * 60) / h)
    }

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("aHash/dHash: re-encoded and resized copies hash close, different images far") {
    val big = scene(256, 128)
    val resized = scene(64, 32)          // same scene, quarter resolution
    val brighter = scene(256, 128, shift = 25)
    val mirrored = scene(256, 128, flipX = true) // structurally different
    for (hash <- Seq(ImageHash.aHash64 _, ImageHash.dHash64 _)) {
      val Seq(hb, hr, hbr, hm) =
        Seq(big, resized, brighter, mirrored).map(p => hash(p).get)
      assert(hamming(hb, hr) <= 3, s"resize drifted ${hamming(hb, hr)} bits")
      assert(hamming(hb, hbr) <= 3, s"brightness drifted ${hamming(hb, hbr)} bits")
      assert(hamming(hb, hm) > 10, s"distinct images only ${hamming(hb, hm)} apart")
    }
    // garbage payload decodes to None, never throws
    assert(ImageHash.aHash64(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("nearDuplicates finds perceptual pairs via the shared banding path") {
    val rows = Seq(
      1L -> scene(256, 128),
      2L -> scene(64, 32),                 // near-dup of 1 (resized)
      3L -> scene(256, 128, noise = 4),    // noised copy of 1
      4L -> scene(256, 128, flipX = true), // unrelated structure
      5L -> Array[Byte](9, 9, 9)           // undecodable
    ).toDF("media_id", "payload")
    val pairs = ImageHash.nearDuplicates(rows, "media_id", "payload",
        maxHamming = 3)
      .orderBy("id1", "id2").as[(Long, Long, Int)].collect()
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(found.contains((1L, 2L)) && found.contains((1L, 3L)), s"got $found")
    assert(!found.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!found.exists(p => p._1 == 5L || p._2 == 5L))
    assert(pairs.forall(_._3 <= 3))
    // the payload column must never reach the pair join: only (id,
    // simhash) columns appear post-hash
    val hashed = ImageHash.hashImages(rows, "media_id", "payload")
    assert(hashed.columns.toSeq === Seq("id", "simhash"))
  }

  test("hashing is deterministic and decode failures surface as null") {
    val rows = Seq(1L -> scene(128, 64), 2L -> Array[Byte](0, 1))
      .toDF("media_id", "payload")
    val a = ImageHash.hashImages(rows, "media_id", "payload").collect()
    val b = ImageHash.hashImages(rows, "media_id", "payload").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.find(_.getLong(0) == 2L).get.isNullAt(1))
  }
}

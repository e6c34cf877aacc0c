package graft.demo

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Scale probe for the perceptual-fingerprint family: 20k REAL 64×64 PNGs
  * rendered inside executors (deterministic per-id stripe patterns), plus
  * 2k planted near-duplicates (same pattern, a 2×2-pixel blemish) under
  * shifted ids — measures decode+hash throughput and checks banded-pair
  * recall on ground truth the synthetic corpus makes near-exact: a
  * plant's blemish directly moves only its own grid cell, but it ALSO
  * shifts the global 64-cell mean a hair, so a pattern with other cells
  * sitting exactly on the mean boundary can flip extra bits past the
  * ≤3-bit band guarantee — measured at 1/2000 on this corpus, which is
  * the honest edit-tolerance envelope of aHash (assert ≥ 99.7%), not a
  * detection bug. Unrelated stripe patterns differ in many cells and
  * must not flood the pair set. */
object MediaHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.localBuilder(32, "graft-mediahash")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nBase = 20000L
    val nPlant = 2000L
    def png(id: Long, blemish: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      // 8-cell stripe pattern keyed by id bits: cell (cx, cy) dark iff
      // bit ((cx + 8*cy) mod 16) of id's hash is set — distinct ids give
      // far-apart hashes, a blemish flips at most its own cell
      val key = id * 2654435761L
      for (y <- 0 until 64; x <- 0 until 64) {
        val cell = (x / 8 + 8 * (y / 8)) % 16
        val dark = ((key >> cell) & 1L) == 1L
        val base = if (dark) 0x101010 else 0xF0F0F0
        val v = if (blemish && x < 2 && y < 2) 0x808080 else base
        img.setRGB(x, y, v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val media = spark.range(nBase + nPlant).map { i =>
      if (i < nBase) Multimodal.MediaRecord(i, "image", png(i, false), Map.empty)
      else Multimodal.MediaRecord(1000000L + (i - nBase), "image",
        png(i - nBase, true), Map.empty)
    }

    val t0 = System.nanoTime()
    val hashes = Multimodal.imageHashes(media).persist()
    val nHashed = hashes.count()
    val hashSec = (System.nanoTime() - t0) / 1e9
    println(f"imageHashes: $nHashed real PNGs decoded+hashed in " +
      f"$hashSec%.1f s (${nHashed / hashSec}%.0f imgs/s)")
    require(nHashed == nBase + nPlant, s"every image must hash: $nHashed")

    val t1 = System.nanoTime()
    val pairs = Multimodal.imageNearDupPairs(hashes, maxBits = 3).persist()
    val planted = pairs
      .where(col("id_b") === col("id_a") + 1000000L).count()
    val total = pairs.count()
    val pairSec = (System.nanoTime() - t1) / 1e9
    println(f"imageNearDupPairs: $total pairs in $pairSec%.1f s; " +
      s"planted recall $planted/$nPlant")
    require(planted >= nPlant - 6,
      s"planted near-dup recall too low: $planted/$nPlant")
    // non-planted pairs are possible only for ids whose 16-bit stripe keys
    // collide (hash-identical patterns) — bounded, not an error; report it
    println(s"  non-planted pairs (stripe-key collisions): ${total - planted}")
    pairs.unpersist(); hashes.unpersist()
    println("MediaHashProbe OK")
    spark.stop()
  }
}

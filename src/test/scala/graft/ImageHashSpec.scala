package graft

import graft.multimodal.{MultimodalOps, Vp8l}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual image hashing (dHash) + banded near-dup pairs:
  * invariance and discrimination properties checked on real decoded
  * rasters, and the band join checked against brute-force Hamming. */
class ImageHashSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def bmp(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    // minimal 24-bit BMP writer (same layout syntheticBmp emits)
    val rowBytes = (w * 3 + 3) & ~3
    val out = new java.io.ByteArrayOutputStream(54 + rowBytes * h)
    def b8(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    def le16(x: Int): Unit = b8(x, x >>> 8)
    def le32(x: Int): Unit = b8(x, x >>> 8, x >>> 16, x >>> 24)
    b8('B', 'M'); le32(54 + rowBytes * h); le32(0); le32(54)
    le32(40); le32(w); le32(h); le16(1); le16(24)
    le32(0); le32(rowBytes * h); le32(2835); le32(2835); le32(0); le32(0)
    for (y <- h - 1 to 0 by -1) {
      for (x <- 0 until w) {
        val p = px(x, y)
        b8(p & 0xff, (p >> 8) & 0xff, (p >> 16) & 0xff)
      }
      for (_ <- 0 until rowBytes - w * 3) out.write(0)
    }
    out.toByteArray
  }

  private def hashOf(payloads: Array[Byte]*): Seq[java.lang.Long] = {
    import spark.implicits._
    payloads.toDF("p").select(MultimodalOps.dHash64(col("p")))
      .collect().map(r => if (r.isNullAt(0)) null
        else java.lang.Long.valueOf(r.getLong(0))).toSeq
  }

  test("identical pixels hash identically across codecs (BMP vs VP8L)") {
    def px(x: Int, y: Int) = ((x * 37 + y * 11) % 256 << 16) |
      ((x * 13 + y * 29) % 256 << 8) | ((x * 7 + y * 3) % 256)
    val asBmp = bmp(12, 10, px)
    val argb = Array.tabulate(12 * 10)(i =>
      0xff000000 | px(i % 12, i / 12))
    val asWebp = Vp8l.encode(12, 10, argb, Vp8l.EncOpts(subtractGreen = true))
    val hs = hashOf(asBmp, asWebp)
    assert(hs(0) != null && hs(0) == hs(1),
      "same raster must hash equal regardless of container")
  }

  test("uniform brightness shift is hash-invariant; local edit is not") {
    def base(x: Int, y: Int) = {
      val v = (x * 23 + y * 41) % 200
      (v << 16) | (v << 8) | v
    }
    val h0 = hashOf(bmp(16, 12, base))(0)
    // +40 brightness on every channel: gradient signs unchanged
    val bright = bmp(16, 12, (x, y) => {
      val v = (x * 23 + y * 41) % 200 + 40
      (v << 16) | (v << 8) | v
    })
    assert(hashOf(bright)(0) == h0)
    // blank out a corner region: some bits must flip, but not many
    val edited = bmp(16, 12, (x, y) =>
      if (x < 5 && y < 5) 0xffffff else base(x, y))
    val he = hashOf(edited)(0)
    val d = java.lang.Long.bitCount(h0 ^ he)
    assert(d > 0 && d <= 16, s"corner edit flipped $d bits")
  }

  test("undecodable payloads hash to null") {
    assert(hashOf("not an image".getBytes)(0) == null)
  }

  test("banded imageDupPairs equals brute-force Hamming pairs") {
    import spark.implicits._
    // 60 images in 20 page-groups (exact dups) + noise
    val rows = (0 until 60).map { i =>
      val page = i % 20
      (i.toLong, bmp(10 + page % 5, 8 + page % 4, (x, y) =>
        ((page * 31 + x * 7 + y * 13) % 256 << 16) |
          ((page * 17 + x * 11 + y * 3) % 256 << 8) |
          ((page * 5 + x * 3 + y * 29) % 256)))
    }
    val df = rows.toDF("id", "payload")
    val got = MultimodalOps.imageDupPairs(df, col("id"), col("payload"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force on driver
    val hs = rows.map { case (i, b) => (i, hashOf(b)(0).longValue) }
    val want = (for {
      (i1, h1) <- hs; (i2, h2) <- hs
      if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield (i1, i2)).toSet
    assert(got == want)
    assert(want.size >= 20, "page groups must produce exact-dup pairs")
  }

  test("incremental image dedup ≡ full batch (r15): corpus band table " +
      "+ new batch, probe expansion on the new side only") {
    import spark.implicits._
    val rows = (0 until 80).map { i =>
      val page = i % 24
      (i.toLong, bmp(10 + page % 5, 8 + page % 4, (x, y) =>
        ((page * 31 + x * 7 + y * 13) % 256 << 16) |
          ((page * 17 + x * 11 + y * 3) % 256 << 8) |
          ((page * 5 + x * 3 + y * 29) % 256)))
    }
    val df = rows.toDF("id", "payload")
    val bandAll = MultimodalOps.imageBandTable(df, col("id"),
      col("payload")).persist()
    val bandOld = bandAll.filter(col("i") % 2 === 0)
    val bandNew = bandAll.filter(col("i") % 2 === 1)
    for (maxDist <- Seq(0, 2, 3)) {
      val full = MultimodalOps.imageDupPairsFromBands(bandAll, maxDist)
        .select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val inc = MultimodalOps.incrementalImageDupPairsFromBands(
          bandNew, bandOld, maxDist)
        .select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val old = MultimodalOps.imageDupPairsFromBands(bandOld, maxDist)
        .select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert((old ++ inc) == full,
        s"maxDist=$maxDist: old ∪ inc != full " +
          s"(missing=${(full -- old -- inc).take(3)}, " +
          s"extra=${((old ++ inc) -- full).take(3)})")
      // the incremental sweep must never re-emit old-old pairs
      assert(inc.forall { case (a, b) => a % 2 == 1 || b % 2 == 1 })
      if (maxDist == 3) assert(full.size >= 20)
    }
    bandAll.unpersist(blocking = false)
  }

  test("imageDupPairs blocking column: pairs never cross blocks, " +
      "recall within blocks unchanged (r15)") {
    import spark.implicits._
    val rows = (0 until 60).map { i =>
      val page = i % 15
      (i.toLong, (i % 2).toString, bmp(10 + page % 5, 8 + page % 4,
        (x, y) =>
          ((page * 31 + x * 7 + y * 13) % 256 << 16) |
            ((page * 17 + x * 11 + y * 3) % 256 << 8) |
            ((page * 5 + x * 3 + y * 29) % 256)))
    }
    val df = rows.toDF("id", "blkc", "payload")
    val got = MultimodalOps.imageDupPairs(df, col("id"), col("payload"),
        3, blocking = Some(col("blkc")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hs = rows.map { case (i, blk, b) =>
      (i, blk, hashOf(b)(0).longValue) }
    val want = (for {
      (i1, b1, h1) <- hs; (i2, b2, h2) <- hs
      if i1 < i2 && b1 == b2 && java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield (i1, i2)).toSet
    assert(got == want)
    assert(want.nonEmpty)
    // and the unblocked run must find strictly more (the cross-block
    // page twins), proving n_cross isn't vacuously zero
    val unblocked = MultimodalOps.imageDupPairs(df, col("id"),
        col("payload"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.subsetOf(unblocked) && unblocked.size > want.size)
  }

  private def pHashOf(payloads: Array[Byte]*): Seq[java.lang.Long] = {
    import spark.implicits._
    payloads.toDF("p").select(MultimodalOps.pHash64(col("p")))
      .collect().map(r => if (r.isNullAt(0)) null
        else java.lang.Long.valueOf(r.getLong(0))).toSeq
  }

  test("pHash: brightness shift and 2x NN upscale are invariant") {
    def base(x: Int, y: Int) = {
      val v = (x * 23 + y * 41) % 200
      (v << 16) | (v << 8) | v
    }
    val h0 = pHashOf(bmp(16, 12, base))(0)
    assert(h0 != null)
    // +40 on every channel shifts only the DC coefficient
    val bright = bmp(16, 12, (x, y) => {
      val v = (x * 23 + y * 41) % 200 + 40
      (v << 16) | (v << 8) | v
    })
    assert(pHashOf(bright)(0) == h0, "brightness must not move pHash")
    // 2x nearest-neighbor upscale: floor-division composition keeps
    // every 32x32 sample identical
    val up = bmp(32, 24, (x, y) => base(x / 2, y / 2))
    assert(pHashOf(up)(0) == h0, "2x NN upscale must not move pHash")
    // a real edit must move it
    val edited = bmp(16, 12, (x, y) =>
      if (x < 6 && y < 6) 0xffffff else base(x, y))
    val he = pHashOf(edited)(0)
    val d = java.lang.Long.bitCount(h0 ^ he)
    assert(d > 0, "corner edit must flip pHash bits")
  }

  test("pHash: DC bit stays 0 and distinct textures differ") {
    val a = pHashOf(bmp(12, 12, (x, y) =>
      ((x * 37 + y * 11) % 256 << 16) | ((x * 13) % 256 << 8) | y * 9))(0)
    val b = pHashOf(bmp(12, 12, (x, y) =>
      ((x * 5 + y * 3) % 256 << 16) | ((y * 31) % 256 << 8) | x * 11))(0)
    assert((a.longValue & 1L) == 0L && (b.longValue & 1L) == 0L)
    assert(a != b)
  }
}

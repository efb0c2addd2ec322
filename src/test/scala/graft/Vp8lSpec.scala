package graft

import graft.multimodal.Vp8l
import graft.multimodal.Vp8l.EncOpts
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip tests for the from-scratch VP8L (WebP lossless) codec:
  * every encoder option combination must decode back to the exact
  * pixels, covering literals, two-level prefix codes, color cache,
  * LZ77 backrefs, and all four transforms (predictor × 14 modes,
  * cross-color, subtract-green, palette incl. bundled widths). */
class Vp8lSpec extends AnyFunSuite {

  private def pixels(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { p =>
      val x = p % w
      val y = p / w
      val r = (seed * 31 + x * 7 + y * 13) % 256
      val g = (seed * 17 + x * 11 + y * 3) % 256
      val b = (seed * 5 + x * 3 + y * 29) % 256
      0xff000000 | (r << 16) | (g << 8) | b
    }

  private def roundTrip(w: Int, h: Int, px: Array[Int],
                        opts: EncOpts): Unit = {
    val bytes = Vp8l.encode(w, h, px, opts)
    val (dw, dh, dpx) = Vp8l.decodeWebp(bytes)
    assert(dw == w && dh == h, s"dims $dw x $dh != $w x $h ($opts)")
    var i = 0
    while (i < px.length) {
      assert(dpx(i) == px(i),
        f"pixel $i: got ${dpx(i)}%08x want ${px(i)}%08x ($opts)")
      i += 1
    }
  }

  test("literal-only round trip across sizes") {
    for ((w, h) <- Seq((1, 1), (2, 3), (7, 5), (16, 16), (33, 9)))
      roundTrip(w, h, pixels(w, h, w * 100 + h), EncOpts())
  }

  test("subtract-green transform") {
    roundTrip(11, 7, pixels(11, 7, 42), EncOpts(subtractGreen = true))
  }

  test("all 14 predictor modes") {
    for (mode <- 0 to 13)
      roundTrip(13, 9, pixels(13, 9, mode + 1),
        EncOpts(predictor = Some(mode)))
  }

  test("predictor with small transform blocks (edge rules)") {
    for (mode <- Seq(3, 5, 9, 11, 12, 13)) // TR-using + nonlinear modes
      roundTrip(17, 6, pixels(17, 6, mode),
        EncOpts(predictor = Some(mode), transformBits = 2))
  }

  test("cross-color transform") {
    for ((g2r, g2b, r2b) <- Seq((0, 0, 0), (10, -7, 3), (-128, 127, 64)))
      roundTrip(9, 9, pixels(9, 9, 7),
        EncOpts(colorXform = Some((g2r, g2b, r2b))))
  }

  test("color cache (repeated colors hit the cache path)") {
    val px = Array.tabulate(12 * 8)(p =>
      0xff000000 | (((p % 5) * 40) << 16) | (((p % 3) * 70) << 8))
    for (bits <- Seq(1, 4, 8, 11))
      roundTrip(12, 8, px, EncOpts(cacheBits = bits))
  }

  test("lz77 row and rle copies") {
    // rows 1..h-1 repeat row 0 -> dist = xsize copies; constant row 0
    val w = 19
    val h = 11
    val px = Array.tabulate(w * h) { p =>
      val x = p % w
      0xff000000 | ((x * 13 % 256) << 16) | ((x * 5 % 256) << 8)
    }
    roundTrip(w, h, px, EncOpts(lz77 = true))
    // constant image -> long RLE run
    roundTrip(w, h, Array.fill(w * h)(0xff102030), EncOpts(lz77 = true))
  }

  test("palette (all bundled widths: <=2, <=4, <=16, >16 colors)") {
    for (nc <- Seq(2, 4, 16, 40)) {
      val w = 21
      val h = 6
      val px = Array.tabulate(w * h)(p =>
        0xff000000 | ((p % nc) * 6 << 16) | ((p % nc) * 3 << 8) | (p % nc))
      roundTrip(w, h, px, EncOpts(palette = true))
    }
  }

  test("combined transforms: palette + predictor, subtractGreen + cache + lz77") {
    val w = 14
    val h = 10
    val pal = Array.tabulate(w * h)(p => 0xff000000 | ((p % 3) * 80 << 8))
    roundTrip(w, h, pal, EncOpts(palette = true, predictor = Some(2)))
    roundTrip(w, h, pixels(w, h, 99),
      EncOpts(subtractGreen = true, cacheBits = 5, lz77 = true))
    roundTrip(w, h, pixels(w, h, 123),
      EncOpts(predictor = Some(11), subtractGreen = true))
  }

  test("alpha channel survives") {
    val px = Array.tabulate(6 * 6)(p => ((p * 17 % 256) << 24) |
      ((p * 3 % 256) << 16) | ((p * 5 % 256) << 8) | (p * 7 % 256))
    roundTrip(6, 6, px, EncOpts())
    roundTrip(6, 6, px, EncOpts(subtractGreen = true))
  }

  test("sniffMeta agrees with decoded dims") {
    val bytes = Vp8l.encode(23, 17, pixels(23, 17, 5), EncOpts())
    val meta = graft.multimodal.MultimodalOps.parseMeta(bytes)
    assert(meta.format == "webp")
    assert(meta.width.contains(23) && meta.height.contains(17))
  }

  test("truncated and corrupt streams fail loud, not wrong") {
    val bytes = Vp8l.encode(9, 9, pixels(9, 9, 3), EncOpts())
    intercept[IllegalArgumentException] {
      Vp8l.decodePayload(bytes.take(25), 20)
    }
    assert(Vp8l.decodeWebp("RIFFxxxxWAVE".getBytes) == null)
    // negative chunk size must bail out, not loop the executor forever
    val neg = bytes.clone()
    neg(16) = 0xff.toByte; neg(17) = 0xff.toByte
    neg(18) = 0xff.toByte; neg(19) = 0xff.toByte
    // corrupt the fourcc too so the VP8L branch isn't taken first
    neg(12) = 'X'.toByte
    assert(Vp8l.decodeWebp(neg) == null)
  }

  test("opaque white round-trips with a color cache (-1 sentinel bug)") {
    // 0xffffffff == -1: an in-band "empty" sentinel in the encoder
    // cache would emit a never-inserted cache ref that decodes to 0
    val px = Array.fill(9)(0xffffffff)
    for (bits <- Seq(1, 6, 11)) roundTrip(3, 3, px, EncOpts(cacheBits = bits))
    roundTrip(2, 2, Array(0xffffffff, 0x00000000, 0xffffffff, 0x00000000),
      EncOpts(cacheBits = 4))
  }

  test("fuzz: random bytes never escape as non-IAE or hang") {
    val rnd = new scala.util.Random(42) // deterministic
    val sig = Array[Byte]('R', 'I', 'F', 'F', 20, 0, 0, 0,
      'W', 'E', 'B', 'P')
    var threw = 0
    for (trial <- 0 until 3000) {
      val len = rnd.nextInt(200)
      val junk = new Array[Byte](len)
      rnd.nextBytes(junk)
      val payload = trial % 3 match {
        case 0 => junk // raw garbage -> decodeWebp returns null
        case 1 => sig ++ junk // RIFF/WEBP + garbage chunks
        case 2 => // valid-looking VP8L chunk, garbage bitstream
          sig ++ Array[Byte]('V', 'P', '8', 'L') ++
            Array[Byte]((len max 1).toByte, 0, 0, 0) ++
            Array[Byte](0x2f) ++ junk
      }
      try { Vp8l.decodeWebp(payload); () }
      catch {
        case _: IllegalArgumentException => threw += 1
        case e: Throwable =>
          fail(s"trial $trial: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    assert(threw > 100, "fuzz should hit the loud-error paths often")
  }

  test("declared-huge dimensions fail fast, never allocate") {
    // hand-build a VP8L header declaring 16384 x 16384
    val bw = new Vp8l.BitWriter()
    bw.writeBits(16383, 14); bw.writeBits(16383, 14)
    bw.writeBits(0, 1); bw.writeBits(0, 3)
    val body = bw.toArray
    val e = intercept[IllegalArgumentException] {
      Vp8l.decodePayload(Array[Byte](0x2f) ++ body ++ new Array[Byte](64), 0)
    }
    assert(e.getMessage.contains("maxImagePixels"))
  }

  test("lossy-VP8 contract: header dims parse, pixel decode refuses " +
      "(returns null) rather than guessing") {
    val spark = GraftSession.builder("4").getOrCreate()
    import graft.multimodal.MultimodalOps
    val rows = spark.range(0, 40)
      .select(col("id"),
        MultimodalOps.sniffMeta(
          MultimodalOps.syntheticWebpLossyHeader(col("id"))).as("m"),
        MultimodalOps.decodeImage(
          MultimodalOps.syntheticWebpLossyHeader(col("id"))).as("st"))
      .collect()
    rows.foreach { r =>
      val i = r.getLong(0)
      val m = r.getStruct(1)
      assert(m.getString(0) == "webp", s"id=$i format")
      assert(m.getInt(1) == 16 * (1 + i % 5).toInt, s"id=$i width")
      assert(m.getInt(2) == 16 * (1 + (i * 3) % 4).toInt, s"id=$i height")
      assert(r.isNullAt(2), s"id=$i: lossy VP8 must NOT pixel-decode")
    }
  }

  test("lz77 value coding is a bijection on 1..4096") {
    for (v <- 1 to 4096) {
      val (c, eb, ev) = Vp8l.lz77Code(v)
      assert(c >= 0 && c < 24, s"v=$v code=$c")
      val base = if (c < 4) c + 1 else ((2 + (c & 1)) << eb) + 1
      assert(base + ev == v, s"v=$v decodes to ${base + ev}")
    }
  }
}

package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** WebP-lossless (VP8L) codec implemented from the public bitstream
  * specification ("WebP Lossless Bitstream Specification", Google /
  * RFC 9649) — pure JVM byte/bit math, no external library.
  *
  * The DECODER is spec-complete: LSB-first bit reading, simple and
  * normal (canonical) prefix codes with the 19-symbol code-length
  * code, meta-prefix (entropy image) groups, color cache, LZ77
  * backward references with the 120-entry 2D distance map, and all
  * four inverse transforms (predictor with its 14 modes, cross-color,
  * subtract-green, color-indexing with pixel bundling).
  *
  * The ENCODER emits a valid but deliberately small subset (literal
  * coding with optional two-level complete prefix codes, color cache,
  * RLE/row LZ77, and any combination of the four forward transforms) —
  * enough to produce real spec-conformant fixtures whose pixels an
  * oracle can predict, exercising every decoder path end-to-end.
  *
  * Reference behavior parity target: reference has no multimodal
  * surface (see SURVEY.md LLM-pipeline addendum); this closes the
  * round-6 verdict item "real WebP pixel decode".
  */
object Vp8l {

  // ----------------------------------------------------------------
  // Bit I/O — VP8L streams are LSB-first within each byte.
  // ----------------------------------------------------------------

  final class BitReader(buf: Array[Byte], start: Int) {
    private var pos = start    // byte position
    private var bit = 0        // bit position within current byte
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= buf.length)
          throw new IllegalArgumentException("vp8l: truncated stream")
        v |= (((buf(pos) >> bit) & 1) << i)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def readBit(): Int = readBits(1)
  }

  final class BitWriter {
    private val bytes = new ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nbits
        nbits += 1
        if (nbits == 8) { bytes += cur.toByte; cur = 0; nbits = 0 }
        i += 1
      }
    }
    /** Prefix-code bits go out MSB-of-code first (DEFLATE-style). */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def toArray: Array[Byte] = {
      val out = bytes.toArray
      if (nbits > 0) out :+ cur.toByte else out
    }
  }

  // ----------------------------------------------------------------
  // Canonical prefix codes. Codes are assigned in (length, symbol)
  // order and read MSB-first; a code with exactly one used symbol
  // consumes zero bits (spec special case).
  // ----------------------------------------------------------------

  final class Prefix(lengths: Array[Int],
                     simple: Array[Int] = null) {
    // simple != null: stream-ordered explicit symbols (1 or 2).
    private val maxLen = 15
    private var single = -1
    private val count = new Array[Int](maxLen + 1)
    private val firstCode = new Array[Int](maxLen + 1)
    private val offset = new Array[Int](maxLen + 1)
    private var sorted: Array[Int] = null
    if (simple == null) {
      var nz = 0
      var nzSym = -1
      lengths.indices.foreach { s =>
        val l = lengths(s)
        require(l >= 0 && l <= maxLen, s"vp8l: bad code length $l")
        if (l > 0) { nz += 1; nzSym = s; count(l) += 1 }
      }
      require(nz > 0, "vp8l: empty prefix code")
      if (nz == 1) single = nzSym
      else {
        var code = 0
        var total = 0
        var l = 1
        while (l <= maxLen) {
          code = (code + count(l - 1)) << 1
          firstCode(l) = code
          offset(l) = total
          total += count(l)
          l += 1
        }
        sorted = new Array[Int](total)
        val next = offset.clone()
        var s = 0
        while (s < lengths.length) {
          val ln = lengths(s)
          if (ln > 0) { sorted(next(ln)) = s; next(ln) += 1 }
          s += 1
        }
      }
    }
    def read(br: BitReader): Int = {
      if (simple != null) {
        if (simple.length == 1) simple(0)
        else if (br.readBit() == 0) simple(0) else simple(1)
      } else if (single >= 0) single
      else {
        var code = 0
        var len = 0
        while (len < maxLen) {
          code = (code << 1) | br.readBit()
          len += 1
          if (count(len) > 0 && code - firstCode(len) < count(len))
            return sorted(offset(len) + code - firstCode(len))
        }
        throw new IllegalArgumentException("vp8l: bad prefix code")
      }
    }
    /** symbol -> (code, len) for the encoder. */
    def codes: Map[Int, (Int, Int)] =
      if (simple != null) {
        if (simple.length == 1) Map(simple(0) -> ((0, 0)))
        else Map(simple(0) -> ((0, 1)), simple(1) -> ((1, 1)))
      } else if (single >= 0) Map(single -> ((0, 0)))
      else sorted.zipWithIndex.map { case (s, i) =>
        val l = lengths(s)
        s -> ((firstCode(l) + (i - offset(l)), l))
      }.toMap
  }

  /** kOrder for the 19-symbol code-length code (spec §"Normal Code
    * Length Code"). */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def readPrefixCode(br: BitReader, alphabet: Int): Prefix = {
    if (br.readBit() == 1) { // simple code
      val numSym = br.readBit() + 1
      val first =
        if (br.readBit() == 1) br.readBits(8) else br.readBits(1)
      val syms =
        if (numSym == 2) Array(first, br.readBits(8)) else Array(first)
      new Prefix(null, syms)
    } else {
      val numCl = 4 + br.readBits(4)
      val clLen = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLen(ClOrder(i)) = br.readBits(3); i += 1 }
      val clCode = new Prefix(clLen)
      val lengths = new Array[Int](alphabet)
      var maxSymbol =
        if (br.readBit() == 1) {
          val nbits = 2 + 2 * br.readBits(3)
          2 + br.readBits(nbits)
        } else alphabet
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabet && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.read(br)
        if (cl < 16) {
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) prevLen = cl
        } else {
          val (extra, base, usePrev) = cl match {
            case 16 => (2, 3, true)
            case 17 => (3, 3, false)
            case _  => (7, 11, false)
          }
          var repeat = br.readBits(extra) + base
          val fill = if (usePrev) prevLen else 0
          while (repeat > 0 && symbol < alphabet) {
            lengths(symbol) = fill
            symbol += 1
            repeat -= 1
          }
        }
      }
      new Prefix(lengths)
    }
  }

  // ----------------------------------------------------------------
  // LZ77 prefix value coding (shared by length and distance).
  // ----------------------------------------------------------------

  private def readLz77Value(br: BitReader, prefixCode: Int): Int =
    if (prefixCode < 4) prefixCode + 1
    else {
      val extraBits = (prefixCode - 2) >> 1
      val offset = (2 + (prefixCode & 1)) << extraBits
      offset + br.readBits(extraBits) + 1
    }

  /** Inverse of [[readLz77Value]]: value -> (prefixCode, extraBits,
    * extraVal). */
  private[graft] def lz77Code(v: Int): (Int, Int, Int) = {
    val x = v - 1
    if (x < 4) (x, 0, 0)
    else {
      val hb = 31 - Integer.numberOfLeadingZeros(x)
      val eb = hb - 1
      val c = 2 * hb + (if (x >= (3 << eb)) 1 else 0)
      val base = (2 + (c & 1)) << eb
      (c, eb, x - base)
    }
  }

  /** 120-entry 2D distance map: code i+1 -> (dx, dy); dist =
    * dy·xsize + dx (clamped to ≥1). Codes >120 are dist-120. */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def planeCodeToDistance(xsize: Int, code: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistMap(code - 1)
      math.max(1, dy * xsize + dx)
    }

  /** Inverse for the encoder: distance -> distance code. Only the
    * exact map entries are reversed; anything else is dist+120. */
  private[graft] def distanceToCode(xsize: Int, dist: Int): Int = {
    var i = 0
    while (i < 120) {
      val (dx, dy) = DistMap(i)
      if (math.max(1, dy * xsize + dx) == dist) return i + 1
      i += 1
    }
    dist + 120
  }

  // ----------------------------------------------------------------
  // Pixel helpers (ARGB packed in Int).
  // ----------------------------------------------------------------

  private def addPixels(a: Int, b: Int): Int = {
    val alpha = ((a >>> 24) + (b >>> 24)) & 0xff
    val red = (((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff
    val green = (((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff
    val blue = ((a & 0xff) + (b & 0xff)) & 0xff
    (alpha << 24) | (red << 16) | (green << 8) | blue
  }

  private[graft] def subPixels(a: Int, b: Int): Int = {
    val alpha = ((a >>> 24) - (b >>> 24)) & 0xff
    val red = (((a >> 16) & 0xff) - ((b >> 16) & 0xff)) & 0xff
    val green = (((a >> 8) & 0xff) - ((b >> 8) & 0xff)) & 0xff
    val blue = ((a & 0xff) - (b & 0xff)) & 0xff
    (alpha << 24) | (red << 16) | (green << 8) | blue
  }

  private def average2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  private def clip255(x: Int): Int =
    if (x < 0) 0 else if (x > 255) 255 else x

  private def clampedAddSubtractFull(a: Int, b: Int, c: Int): Int = {
    def ch(sh: Int) = clip255(((a >>> sh) & 0xff) + ((b >>> sh) & 0xff) -
      ((c >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampedAddSubtractHalf(a: Int, b: Int, c: Int): Int = {
    val ave = average2(a, b)
    def ch(sh: Int) = {
      val av = (ave >>> sh) & 0xff
      clip255(av + (av - ((c >>> sh) & 0xff)) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def select(a: Int, b: Int, c: Int): Int = {
    // returns a when Σ|b_ch−c_ch| − Σ|a_ch−c_ch| ≤ 0 per the spec
    def sub3(sh: Int) = {
      val pa = ((a >>> sh) & 0xff) - ((c >>> sh) & 0xff)
      val pb = ((b >>> sh) & 0xff) - ((c >>> sh) & 0xff)
      math.abs(pb) - math.abs(pa)
    }
    if (sub3(24) + sub3(16) + sub3(8) + sub3(0) <= 0) a else b
  }

  /** The 14 predictor modes. l/t/tl/tr = left, top, top-left,
    * top-right neighbors of the current pixel. */
  private[graft] def predict(mode: Int, l: Int, t: Int, tl: Int,
                                  tr: Int): Int = mode match {
    case 0 => 0xff000000
    case 1 => l
    case 2 => t
    case 3 => tr
    case 4 => tl
    case 5 => average2(average2(l, tr), t)
    case 6 => average2(l, tl)
    case 7 => average2(l, t)
    case 8 => average2(tl, t)
    case 9 => average2(t, tr)
    case 10 => average2(average2(l, tl), average2(t, tr))
    case 11 => select(t, l, tl)
    case 12 => clampedAddSubtractFull(l, t, tl)
    case 13 => clampedAddSubtractHalf(l, t, tl)
    case m => throw new IllegalArgumentException(s"vp8l: predictor $m")
  }

  private def colorTransformDelta(t: Byte, c: Int): Int =
    (t.toInt * c.toByte.toInt) >> 5

  private def subSampleSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  // ----------------------------------------------------------------
  // Decoder.
  // ----------------------------------------------------------------

  private val HashMul = 0x1e35a7bd

  sealed private trait Transform { def inverse(d: Img): Img }
  private case class Img(w: Int, h: Int, px: Array[Int])

  private case class PredictorT(bits: Int, data: Img) extends Transform {
    def inverse(d: Img): Img = {
      val w = d.w; val h = d.h
      val out = new Array[Int](w * h)
      val pw = subSampleSize(w, bits)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = y * w + x
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) out(p - 1)
            else if (x == 0) out(p - w)
            else {
              val mode = (data.px((y >> bits) * pw + (x >> bits)) >> 8) & 0xff
              val l = out(p - 1)
              val t = out(p - w)
              val tl = out(p - w - 1)
              // TR of the last column wraps to this row's first pixel
              val tr = if (x + 1 < w) out(p - w + 1) else out(y * w)
              predict(mode, l, t, tl, tr)
            }
          out(p) = addPixels(d.px(p), pred)
          x += 1
        }
        y += 1
      }
      Img(w, h, out)
    }
  }

  private case class ColorT(bits: Int, data: Img) extends Transform {
    def inverse(d: Img): Img = {
      val w = d.w; val h = d.h
      val out = new Array[Int](w * h)
      val pw = subSampleSize(w, bits)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = y * w + x
          val cte = data.px((y >> bits) * pw + (x >> bits))
          val g2r = (cte & 0xff).toByte
          val g2b = ((cte >> 8) & 0xff).toByte
          val r2b = ((cte >> 16) & 0xff).toByte
          val v = d.px(p)
          val green = (v >> 8) & 0xff
          var red = (v >> 16) & 0xff
          var blue = v & 0xff
          red = (red + colorTransformDelta(g2r, green)) & 0xff
          blue = (blue + colorTransformDelta(g2b, green)) & 0xff
          blue = (blue + colorTransformDelta(r2b, red)) & 0xff
          out(p) = (v & 0xff000000) | (red << 16) | (green << 8) | blue
          x += 1
        }
        y += 1
      }
      Img(w, h, out)
    }
  }

  private case object SubtractGreenT extends Transform {
    def inverse(d: Img): Img = {
      val out = new Array[Int](d.px.length)
      var i = 0
      while (i < out.length) {
        val v = d.px(i)
        val g = (v >> 8) & 0xff
        val r = (((v >> 16) & 0xff) + g) & 0xff
        val b = ((v & 0xff) + g) & 0xff
        out(i) = (v & 0xff00ff00) | (r << 16) | b
        i += 1
      }
      Img(d.w, d.h, out)
    }
  }

  private case class ColorIndexT(origW: Int, palette: Array[Int])
      extends Transform {
    def inverse(d: Img): Img = {
      val widthBits =
        if (palette.length > 16) 0
        else if (palette.length > 4) 1
        else if (palette.length > 2) 2 else 3
      val out = new Array[Int](origW * d.h)
      val perByte = 1 << widthBits
      val idxBits = 8 >> widthBits
      val mask = (1 << idxBits) - 1
      var y = 0
      while (y < d.h) {
        var x = 0
        while (x < origW) {
          val packed = (d.px(y * d.w + x / perByte) >> 8) & 0xff
          val idx = (packed >> (idxBits * (x % perByte))) & mask
          out(y * origW + x) =
            if (idx < palette.length) palette(idx) else 0
          x += 1
        }
        y += 1
      }
      Img(origW, d.h, out)
    }
  }

  /** Decode one entropy-coded image stream (recursive for the entropy
    * image and transform data; level-0 also reads transforms). */
  private def decodeStream(br: BitReader, xsize0: Int, ysize: Int,
                           level0: Boolean): Img = {
    var xsize = xsize0
    val transforms = new ArrayBuffer[Transform]()
    if (level0) {
      val seen = scala.collection.mutable.Set[Int]()
      while (br.readBit() == 1) {
        val ttype = br.readBits(2)
        require(!seen.contains(ttype), "vp8l: duplicate transform")
        seen += ttype
        ttype match {
          case 0 => // predictor
            val bits = br.readBits(3) + 2
            val sub = decodeStream(br, subSampleSize(xsize, bits),
              subSampleSize(ysize, bits), level0 = false)
            transforms += PredictorT(bits, sub)
          case 1 => // cross-color
            val bits = br.readBits(3) + 2
            val sub = decodeStream(br, subSampleSize(xsize, bits),
              subSampleSize(ysize, bits), level0 = false)
            transforms += ColorT(bits, sub)
          case 2 =>
            transforms += SubtractGreenT
          case _ => // color indexing
            val numColors = br.readBits(8) + 1
            val palImg = decodeStream(br, numColors, 1, level0 = false)
            val palette = new Array[Int](numColors)
            var i = 0
            var prev = 0
            while (i < numColors) {
              prev = addPixels(palImg.px(i), prev)
              palette(i) = prev
              i += 1
            }
            val widthBits =
              if (numColors > 16) 0
              else if (numColors > 4) 1
              else if (numColors > 2) 2 else 3
            transforms += ColorIndexT(xsize, palette)
            xsize = subSampleSize(xsize, widthBits)
        }
      }
    }

    val cacheBits = if (br.readBit() == 1) br.readBits(4) else 0
    require(cacheBits <= 11, s"vp8l: cache bits $cacheBits")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0

    // meta-prefix (entropy image) — level 0 only
    var metaImg: Img = null
    var metaBits = 0
    if (level0 && br.readBit() == 1) {
      metaBits = br.readBits(3) + 2
      metaImg = decodeStream(br, subSampleSize(xsize, metaBits),
        subSampleSize(ysize, metaBits), level0 = false)
    }
    val numGroups =
      if (metaImg == null) 1
      else metaImg.px.map(p => (p >> 8) & 0xffff).max + 1

    val greenAlphabet = 256 + 24 + cacheSize
    val groups = Array.fill(numGroups) {
      Array(
        readPrefixCode(br, greenAlphabet),
        readPrefixCode(br, 256),
        readPrefixCode(br, 256),
        readPrefixCode(br, 256),
        readPrefixCode(br, 40))
    }

    val n = xsize * ysize
    val px = new Array[Int](n)
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    def cacheInsert(v: Int): Unit =
      if (cache != null) cache((HashMul * v) >>> (32 - cacheBits)) = v

    var pos = 0
    val metaW = if (metaImg != null) subSampleSize(xsize, metaBits) else 0
    while (pos < n) {
      val x = pos % xsize
      val y = pos / xsize
      val g =
        if (metaImg == null) groups(0)
        else {
          val mc = (metaImg.px((y >> metaBits) * metaW +
            (x >> metaBits)) >> 8) & 0xffff
          groups(mc)
        }
      val s = g(0).read(br)
      if (s < 256) {
        val red = g(1).read(br)
        val blue = g(2).read(br)
        val alpha = g(3).read(br)
        val v = (alpha << 24) | (red << 16) | (s << 8) | blue
        px(pos) = v
        cacheInsert(v)
        pos += 1
      } else if (s < 280) {
        val length = readLz77Value(br, s - 256)
        val distCode = readLz77Value(br, g(4).read(br))
        val dist = planeCodeToDistance(xsize, distCode)
        require(dist <= pos, "vp8l: backref before start")
        require(pos + length <= n, "vp8l: backref past end")
        var i = 0
        while (i < length) {
          px(pos) = px(pos - dist)
          cacheInsert(px(pos))
          pos += 1
          i += 1
        }
      } else {
        val idx = s - 280
        require(cache != null && idx < cacheSize, "vp8l: cache index")
        px(pos) = cache(idx)
        pos += 1
      }
    }

    var img = Img(xsize, ysize, px)
    var t = transforms.length - 1
    while (t >= 0) { img = transforms(t).inverse(img); t -= 1 }
    img
  }

  /** Decode a VP8L payload (the chunk body, starting at the 0x2f
    * signature byte). Returns (width, height, ARGB pixels row-major). */
  /** Pixel budget for one decoded image. A 30-byte header can declare
    * 16384×16384 (1 GiB of ARGB) — without a cap a fuzzed or hostile
    * payload OOMs the executor task before any bitstream validation
    * runs. Same fail-fast contract as `graft.util.Guard`; override
    * with JVM property `graft.maxImagePixels`. */
  private def maxPixels: Long =
    sys.props.get("graft.maxImagePixels").map(_.toLong)
      .getOrElse(64L * 1024 * 1024)

  def decodePayload(b: Array[Byte], off: Int): (Int, Int, Array[Int]) = {
    require(off < b.length && (b(off) & 0xff) == 0x2f,
      "vp8l: bad signature")
    val br = new BitReader(b, off + 1)
    val w = br.readBits(14) + 1
    val h = br.readBits(14) + 1
    require(w.toLong * h <= maxPixels,
      s"vp8l: ${w}x$h exceeds graft.maxImagePixels=$maxPixels — " +
        "raise the property if the image is legitimate")
    br.readBit() // alpha hint
    require(br.readBits(3) == 0, "vp8l: unsupported version")
    val img = decodeStream(br, w, h, level0 = true)
    (img.w, img.h, img.px)
  }

  /** Decode a full WebP container holding a VP8L chunk (walks RIFF
    * chunks, so VP8X-wrapped lossless files work too). Returns null
    * for non-VP8L WebP (lossy VP8 needs a DCT decoder — out of
    * scope, documented boundary). */
  def decodeWebp(b: Array[Byte]): (Int, Int, Array[Int]) = {
    import Bytes.{ascii, le32, saneChunkSize}
    if (b.length < 20 || !ascii(b, 0, "RIFF") || !ascii(b, 8, "WEBP")) null
    else {
      var i = 12
      while (i + 8 <= b.length) {
        val size = le32(b, i + 4)
        // malformed (negative OR larger than the payload) size: bail —
        // the advance below would overflow Int and loop or index out
        if (!saneChunkSize(size, b)) return null
        if (ascii(b, i, "VP8L")) return decodePayload(b, i + 8)
        // Long advance: i + size can exceed Int range near 2 GiB
        val ni = i.toLong + 8 + size + (size & 1)
        if (ni > b.length) return null
        i = ni.toInt
      }
      null
    }
  }

  // ----------------------------------------------------------------
  // Encoder — valid subset for fixtures.
  // ----------------------------------------------------------------

  /** Encoding options; every combination produces a spec-valid file. */
  case class EncOpts(subtractGreen: Boolean = false,
                     predictor: Option[Int] = None,
                     colorXform: Option[(Int, Int, Int)] = None,
                     palette: Boolean = false,
                     cacheBits: Int = 0,
                     lz77: Boolean = false,
                     transformBits: Int = 4)

  /** Build a complete two-level canonical code over a full alphabet:
    * nShort symbols at k−1 bits, the rest at k bits (Kraft = 1). */
  private def flatLengths(alphabet: Int): Array[Int] = {
    val k = 32 - Integer.numberOfLeadingZeros(alphabet - 1) // ceil log2
    val nShort = (1 << k) - alphabet
    Array.tabulate(alphabet)(i => if (i < nShort) k - 1 else k)
  }

  /** Write one prefix code: simple when ≤2 distinct used symbols all
    * ≤255; otherwise a complete two-level code over the full alphabet
    * (code-length code uses 1-bit symbols, with 16-repeats when all
    * lengths are equal). Returns the symbol→(code,len) map. */
  private def writePrefixCode(bw: BitWriter, alphabet: Int,
                              used: Set[Int]): Map[Int, (Int, Int)] = {
    val u = used.toArray.sorted
    if (u.nonEmpty && u.length <= 2 && u.last <= 255) {
      bw.writeBits(1, 1) // simple
      bw.writeBits(u.length - 1, 1)
      if (u(0) <= 1) { bw.writeBits(0, 1); bw.writeBits(u(0), 1) }
      else { bw.writeBits(1, 1); bw.writeBits(u(0), 8) }
      if (u.length == 2) bw.writeBits(u(1), 8)
      new Prefix(null, u).codes
    } else if (u.isEmpty) {
      bw.writeBits(1, 1) // simple, single symbol 0, never read
      bw.writeBits(0, 1); bw.writeBits(0, 1); bw.writeBits(0, 1)
      new Prefix(null, Array(0)).codes
    } else {
      bw.writeBits(0, 1) // normal
      val lengths = flatLengths(alphabet)
      val distinct = lengths.distinct.sorted
      // code-length code: the used length values (+16 when repeating)
      val clSyms =
        if (distinct.length == 1) Array(distinct(0), 16)
        else Array(distinct(0), distinct(1))
      val clLen = new Array[Int](19)
      clSyms.foreach(s => clLen(s) = 1)
      val numCl = (0 until 19).filter(i => clLen(ClOrder(i)) > 0).max + 1
      bw.writeBits(numCl - 4, 4)
      var i = 0
      while (i < numCl) { bw.writeBits(clLen(ClOrder(i)), 3); i += 1 }
      bw.writeBits(0, 1) // no max-symbol shortcut
      val clCodes = new Prefix(clLen).codes
      def emitCl(s: Int): Unit = {
        val (c, l) = clCodes(s)
        bw.writeCode(c, l)
      }
      if (distinct.length == 1) {
        // one value k: emit once, then 16-repeats (3..6 each)
        emitCl(distinct(0))
        var left = alphabet - 1
        while (left > 0) {
          if (left >= 3) {
            val r = math.min(6, left)
            emitCl(16); bw.writeBits(r - 3, 2)
            left -= r
          } else { emitCl(distinct(0)); left -= 1 }
        }
      } else {
        lengths.foreach(emitCl)
      }
      new Prefix(lengths).codes
    }
  }

  private def cacheIdx(v: Int, bits: Int): Int =
    (HashMul * v) >>> (32 - bits)

  /** Symbol stream for one entropy-coded image: literals, optional
    * color-cache refs and simple LZ77 (dist 1 / dist xsize runs). */
  private case class Tok(green: Int, red: Int = -1, blue: Int = -1,
                         alpha: Int = -1, lenExtra: (Int, Int) = null,
                         distSym: Int = -1, distExtra: (Int, Int) = null)

  private def tokenize(px: Array[Int], xsize: Int, cacheBits: Int,
                       lz77: Boolean): ArrayBuffer[Tok] = {
    val toks = new ArrayBuffer[Tok]()
    // presence tracked separately: every Int IS a valid ARGB pixel
    // (0xffffffff = opaque white), so no in-band empty sentinel exists
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    val cacheSet =
      if (cacheBits > 0) new Array[Boolean](1 << cacheBits) else null
    var pos = 0
    val n = px.length
    while (pos < n) {
      var copied = false
      if (lz77 && pos > 0) {
        // try dist = xsize (row repeat) then dist = 1 (RLE)
        var best = 0
        var bestD = 0
        Seq(xsize, 1).foreach { d =>
          if (d <= pos && best < 16) {
            var l = 0
            while (pos + l < n && l < 4096 &&
              px(pos + l) == px(pos + l - d)) l += 1
            if (l > best) { best = l; bestD = d }
          }
        }
        if (best >= 4) {
          val (lc, leb, lev) = lz77Code(best)
          val dCode = distanceToCode(xsize, bestD)
          val (dc, deb, dev) = lz77Code(dCode)
          toks += Tok(green = 256 + lc, lenExtra = (lev, leb),
            distSym = dc, distExtra = (dev, deb))
          var i = 0
          while (i < best) {
            if (cache != null) {
              val ci = cacheIdx(px(pos), cacheBits)
              cache(ci) = px(pos); cacheSet(ci) = true
            }
            pos += 1
            i += 1
          }
          copied = true
        }
      }
      if (!copied) {
        val v = px(pos)
        val ci = if (cache != null) cacheIdx(v, cacheBits) else -1
        if (cache != null && cacheSet(ci) && cache(ci) == v) {
          toks += Tok(green = 280 + ci)
        } else {
          toks += Tok(green = (v >> 8) & 0xff, red = (v >> 16) & 0xff,
            blue = v & 0xff, alpha = v >>> 24)
          if (cache != null) { cache(ci) = v; cacheSet(ci) = true }
        }
        pos += 1
      }
    }
    toks
  }

  /** Write one entropy-coded image. Stream order per spec:
    * color-cache-info, [meta-prefix bit — level-0 spatial images
    * only], prefix codes, data. */
  private def writeStream(bw: BitWriter, px: Array[Int], xsize: Int,
                          cacheBits: Int, lz77: Boolean,
                          writeMetaBit: Boolean = false): Unit = {
    if (cacheBits > 0) { bw.writeBits(1, 1); bw.writeBits(cacheBits, 4) }
    else bw.writeBits(0, 1)
    if (writeMetaBit) bw.writeBits(0, 1) // no meta-prefix
    val toks = tokenize(px, xsize, cacheBits, lz77)
    val greenAlphabet = 256 + 24 + (if (cacheBits > 0) 1 << cacheBits else 0)
    val gUsed = toks.map(_.green).toSet
    val rUsed = toks.filter(_.red >= 0).map(_.red).toSet
    val bUsed = toks.filter(_.blue >= 0).map(_.blue).toSet
    val aUsed = toks.filter(_.alpha >= 0).map(_.alpha).toSet
    val dUsed = toks.filter(_.distSym >= 0).map(_.distSym).toSet
    val gc = writePrefixCode(bw, greenAlphabet, gUsed)
    val rc = writePrefixCode(bw, 256, rUsed)
    val bc = writePrefixCode(bw, 256, bUsed)
    val ac = writePrefixCode(bw, 256, aUsed)
    val dc = writePrefixCode(bw, 40, dUsed)
    toks.foreach { t =>
      val (c, l) = gc(t.green)
      bw.writeCode(c, l)
      if (t.green < 256) {
        val (c1, l1) = rc(t.red); bw.writeCode(c1, l1)
        val (c2, l2) = bc(t.blue); bw.writeCode(c2, l2)
        val (c3, l3) = ac(t.alpha); bw.writeCode(c3, l3)
      } else if (t.green < 280) {
        bw.writeBits(t.lenExtra._1, t.lenExtra._2)
        val (c4, l4) = dc(t.distSym); bw.writeCode(c4, l4)
        bw.writeBits(t.distExtra._1, t.distExtra._2)
      }
    }
  }

  /** A sub-image stream (transform data / palette): leading color
    * cache bit is part of the stream; no transforms, no meta bit. */
  private def writeSubImage(bw: BitWriter, px: Array[Int],
                            xsize: Int): Unit =
    writeStream(bw, px, xsize, cacheBits = 0, lz77 = false)

  /** Encode ARGB pixels to a complete WebP (RIFF + VP8L) file. */
  def encode(w: Int, h: Int, argb0: Array[Int],
             opts: EncOpts = EncOpts()): Array[Byte] = {
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384,
      "vp8l encode: dims must fit the 14-bit header fields")
    require(argb0.length == w * h, "vp8l encode: bad pixel count")
    val bw = new BitWriter()
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBits(0, 1) // alpha hint
    bw.writeBits(0, 3) // version

    var px = argb0.clone()
    var xsize = w

    // forward transforms, written (and applied) in stream order
    if (opts.palette) {
      val colors = px.distinct
      require(colors.length <= 256, "vp8l encode: palette too large")
      bw.writeBits(1, 1); bw.writeBits(3, 2)
      bw.writeBits(colors.length - 1, 8)
      val deltas = new Array[Int](colors.length)
      var prev = 0
      colors.indices.foreach { i =>
        deltas(i) = subPixels(colors(i), prev)
        prev = colors(i)
      }
      writeSubImage(bw, deltas, colors.length)
      val index = colors.zipWithIndex.toMap
      val widthBits =
        if (colors.length > 16) 0
        else if (colors.length > 4) 1
        else if (colors.length > 2) 2 else 3
      val perByte = 1 << widthBits
      val idxBits = 8 >> widthBits
      val packedW = subSampleSize(w, widthBits)
      val packed = new Array[Int](packedW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val idx = index(px(y * w + x))
          val pp = y * packedW + x / perByte
          packed(pp) |= (idx << (idxBits * (x % perByte))) << 8
          x += 1
        }
        // green channel carries the indices; alpha stays 0 per spec
        y += 1
      }
      px = packed
      xsize = packedW
    }
    opts.predictor.foreach { mode =>
      require(mode >= 0 && mode <= 13, "vp8l encode: predictor mode")
      val bits = opts.transformBits
      bw.writeBits(1, 1); bw.writeBits(0, 2)
      bw.writeBits(bits - 2, 3)
      val pw = subSampleSize(xsize, bits)
      val ph = subSampleSize(h, bits)
      writeSubImage(bw,
        Array.fill(pw * ph)(0xff000000 | (mode << 8)), pw)
      // residuals computed with the decoder's own prediction rules
      val res = new Array[Int](px.length)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < xsize) {
          val p = y * xsize + x
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) px(p - 1)
            else if (x == 0) px(p - xsize)
            else {
              val l = px(p - 1)
              val t = px(p - xsize)
              val tl = px(p - xsize - 1)
              val tr = if (x + 1 < xsize) px(p - xsize + 1)
                       else px(y * xsize)
              predict(mode, l, t, tl, tr)
            }
          res(p) = subPixels(px(p), pred)
          x += 1
        }
        y += 1
      }
      px = res
    }
    opts.colorXform.foreach { case (g2r, g2b, r2b) =>
      val bits = opts.transformBits
      bw.writeBits(1, 1); bw.writeBits(1, 2)
      bw.writeBits(bits - 2, 3)
      val pw = subSampleSize(xsize, bits)
      val ph = subSampleSize(h, bits)
      val cte = 0xff000000 | ((r2b & 0xff) << 16) | ((g2b & 0xff) << 8) |
        (g2r & 0xff)
      writeSubImage(bw, Array.fill(pw * ph)(cte), pw)
      // forward color transform (inverse of the decoder's inverse)
      px = px.map { v =>
        val green = (v >> 8) & 0xff
        val redFinal = (v >> 16) & 0xff
        val red = (redFinal - colorTransformDelta(g2r.toByte, green)) & 0xff
        // the decoder's inverse adds r2b·red_final (its reconstructed
        // red), so the forward pass subtracts r2b·red_final here
        val blue = ((v & 0xff) - colorTransformDelta(g2b.toByte, green) -
          colorTransformDelta(r2b.toByte, redFinal)) & 0xff
        (v & 0xff000000) | (red << 16) | (green << 8) | blue
      }
    }
    if (opts.subtractGreen) {
      bw.writeBits(1, 1); bw.writeBits(2, 2)
      px = px.map { v =>
        val g = (v >> 8) & 0xff
        val r = (((v >> 16) & 0xff) - g) & 0xff
        val b = ((v & 0xff) - g) & 0xff
        (v & 0xff00ff00) | (r << 16) | b
      }
    }
    bw.writeBits(0, 1) // end of transforms

    // main image: cache-info, meta bit, prefix codes, data
    writeStream(bw, px, xsize, opts.cacheBits, opts.lz77,
      writeMetaBit = true)

    val body = bw.toArray
    val chunkLen = body.length + 1 // + signature byte
    val out = new java.io.ByteArrayOutputStream()
    def s(t: String): Unit = t.foreach(c => out.write(c.toInt))
    def le32(x: Int): Unit = {
      out.write(x & 0xff); out.write((x >> 8) & 0xff)
      out.write((x >> 16) & 0xff); out.write((x >> 24) & 0xff)
    }
    val padded = chunkLen + (chunkLen & 1)
    s("RIFF"); le32(4 + 8 + padded); s("WEBP"); s("VP8L"); le32(chunkLen)
    out.write(0x2f)
    out.write(body)
    if ((chunkLen & 1) == 1) out.write(0)
    out.toByteArray
  }
}

// Lives under org.apache.spark.sql so it can use the private[sql]
// expression/codegen APIs — the standard packaging for third-party
// native Catalyst expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit FNV-1a fingerprint of whitespace-normalized lowercase
  * text — the exact-dedup hash (reference: exact dedup is a training-
  * data-pipeline addition; kernel mirrors graft.text.TextOps history).
  *
  * This is THE hottest text kernel at 100 TB (every document passes
  * through it once during exact dedup), so it runs as a codegen'd
  * expression: no UDF SerDe boundary, no row boxing — the generated
  * code calls the static [[Fingerprint64.compute]] directly inside
  * whole-stage codegen. Register as SQL `graft_fingerprint64` via
  * [[GraftExtensions]] or use [[NativeFunctions.fingerprint64Native]].
  */
case class Fingerprint64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    Fingerprint64.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = Fingerprint64.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Fingerprint64 = copy(child = newChild)
}

object Fingerprint64 {
  /** Shared by interpreted eval and generated code. Semantics are
    * frozen: lowercase (Locale.ROOT — locale-independent like Spark's
    * own lower(); a tr_TR default JVM locale must not change
    * fingerprints), trim, collapse whitespace runs to single spaces,
    * FNV-1a over the result's UTF-16 chars. */
  def compute(s: UTF8String): Long = {
    val t = s.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.replaceAll("\\s+", " ")
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < t.length) {
      h ^= t.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

/** Native 64-bit SimHash over whitespace tokens (unit weights): each
  * token's salted FNV-1a hash votes ±1 per bit; the sign of each vote
  * total becomes the output bit. Near-duplicate documents differ in few
  * bits. Codegen'd for the same reason as [[Fingerprint64]] — it runs
  * over every document of the corpus during near-dedup. SQL
  * `graft_simhash64`; DSL [[NativeFunctions.simHash64Native]]. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    SimHash64.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = SimHash64.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

object SimHash64 {
  /** Deterministic 64-bit string hash (FNV-1a + splitmix64 finalizer),
    * salted by seed. Identical to the MinHash base hash so simhash and
    * minhash stay consistent on the same tokens. */
  def saltedHash(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ (seed * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  def compute(s: UTF8String): Long = {
    val words = s.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.split("\\s+")
    val acc = new Array[Int](64)
    var w = 0
    while (w < words.length) {
      val h = saltedHash(words(w), 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      w += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** Native 128-bit SimHash over whitespace tokens: two independent
  * 64-bit SimHashes of the SAME token stream (per-token salted hashes
  * with seeds 0 and 1), returned as array<bigint> [w0, w1]. Element 0
  * is bit-for-bit [[SimHash64]]'s output (same seed-0 hash), so the
  * 64-bit fingerprint is a strict prefix of this one.
  *
  * Why 128 bits: near-dup banding on a 64-bit fingerprint with the
  * maxDist ≤ 3 pigeonhole forces 4×16-bit bands — a FIXED 65,536-key
  * space per band, corpus-wide, so candidate volume grows ~n²/2¹⁵
  * past ~10⁸ docs regardless of skew. The same pigeonhole over 128
  * bits uses 4×32-bit bands (2³² keys), pushing the quadratic term
  * out by 2¹⁶. One pass over the tokens — the second hash reuses the
  * tokenization. SQL `graft_simhash128`; DSL
  * [[NativeFunctions.simHash128Native]]. */
case class SimHash128(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    SimHash128.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = SimHash128.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHash128 = copy(child = newChild)
}

object SimHash128 {
  def compute(s: UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val words = s.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.split("\\s+")
    val acc0 = new Array[Int](64)
    val acc1 = new Array[Int](64)
    var w = 0
    while (w < words.length) {
      val h0 = SimHash64.saltedHash(words(w), 0L)
      val h1 = SimHash64.saltedHash(words(w), 1L)
      var b = 0
      while (b < 64) {
        if (((h0 >>> b) & 1L) == 1L) acc0(b) += 1 else acc0(b) -= 1
        if (((h1 >>> b) & 1L) == 1L) acc1(b) += 1 else acc1(b) -= 1
        b += 1
      }
      w += 1
    }
    var w0 = 0L
    var w1 = 0L
    var b = 0
    while (b < 64) {
      if (acc0(b) > 0) w0 |= (1L << b)
      if (acc1(b) > 0) w1 |= (1L << b)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(w0, w1))
  }
}

/** Native word-n-gram hashing: array of XXH64(seed 42) hashes of the
  * lowercased text's word `n`-grams — bit-for-bit what the Column
  * formulation `transform(TextOps.wordNgrams(text, n), xxhash64)`
  * produces (same tokenization: trim spaces, split on `\s+`; same gram
  * bytes: tokens joined by single 0x20; same hash: XXH64 over UTF-8
  * bytes, seed 42), but in ONE primitive pass per document.
  *
  * Why native: the Column path nests four higher-order functions, which
  * Catalyst evaluates interpreted (HigherOrderFunction has no codegen),
  * re-allocating per-gram UTF8Strings; this kernel runs inside
  * whole-stage codegen, tokenizes once into (offset, length) spans over
  * a single byte copy, and hashes each gram from a reused buffer — zero
  * per-gram allocation. This is the hot inner loop of the Lee et al.
  * substring-dedup family (every word of the corpus passes through it
  * k times), which is what justifies a custom expression over
  * composition (SURVEY §4.2 preference order). */
case class WordNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"graft_word_ngram_hashes: n must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    WordNgramHashes.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = WordNgramHashes.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c, $n)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordNgramHashes = copy(child = newChild)
}

object WordNgramHashes {
  private val EMPTY =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Long](0))

  private def isWs(b: Byte): Boolean =
    b == 0x20.toByte || (b >= 0x09.toByte && b <= 0x0d.toByte)

  /** Shared by interpreted eval and generated code. Replicates
    * `split(lower(trim(text)), "\s+")` exactly, including its edge
    * semantics: `trim` strips 0x20 only, so text leading with other
    * whitespace yields an empty first token, which (as in
    * TextOps.wordNgrams) collapses the result to the empty array. */
  def compute(s: UTF8String,
              n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val b = s.toLowerCase.trim.getBytes
    val len = b.length
    if (len == 0 || isWs(b(0))) return EMPTY
    // tokenize: spans over the byte copy, runs of \s+ as one separator
    var m = 0
    var i = 0
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    while (i < len) {
      while (i < len && isWs(b(i))) i += 1
      if (i < len) {
        starts(m) = i
        while (i < len && !isWs(b(i))) i += 1
        ends(m) = i
        m += 1
      }
    }
    if (m < n) return EMPTY
    val out = new Array[Long](m - n + 1)
    val buf = new Array[Byte](len)
    var g = 0
    while (g < m - n + 1) {
      var p = 0
      var t = g
      while (t < g + n) {
        if (t > g) { buf(p) = 0x20.toByte; p += 1 }
        val tl = ends(t) - starts(t)
        System.arraycopy(b, starts(t), buf, p, tl)
        p += tl
        t += 1
      }
      out(g) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, p, 42L)
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native jaccard-dedup tokenizer: the sorted DISTINCT XXH64(seed 42)
  * hashes of a document's lowercase whitespace tokens (`shingleK = 1`)
  * or k-word shingles (`shingleK > 1`, with the whole-text single
  * shingle for docs of ≤ k words that minHashSignature also uses) — the
  * array the exact-Jaccard pair kernel merge-intersects. Bit-for-bit
  * the historical Scala-UDF formulation in TextOps.jaccardDupPairs
  * (`t.trim.toLowerCase.split("\\s+")` then hash/distinct/sort),
  * including Java split's empty-string edge: blank text yields ONE
  * empty token, so its hash array is [XXH64("", 42)], never empty.
  *
  * Why native: this kernel rides EVERY document of every
  * jaccard-dedup call (the 100 TB hot loop feeding the pair buckets).
  * As a codegen expression it runs inside whole-stage codegen with no
  * UDF SerDe boundary and zero per-token allocation — tokens are
  * (offset, length) spans over one lowercased byte copy, shingles hash
  * from a reused join buffer (same zero-alloc shape as
  * [[WordNgramHashes]]). SQL `graft_sorted_token_hashes`; DSL
  * [[NativeFunctions.sortedTokenHashesNative]]. */
case class SortedTokenHashes(child: Expression, shingleK: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(shingleK >= 1,
    s"graft_sorted_token_hashes: shingleK must be >= 1, got $shingleK")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    SortedTokenHashes.compute(s.asInstanceOf[UTF8String], shingleK)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = SortedTokenHashes.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c, $shingleK)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SortedTokenHashes = copy(child = newChild)
}

object SortedTokenHashes {
  private def isWs(b: Byte): Boolean =
    b == 0x20.toByte || (b >= 0x09.toByte && b <= 0x0d.toByte)

  /** Shared by interpreted eval and generated code. Semantics frozen to
    * the Java-String formulation: trim strips chars ≤ U+0020 at both
    * edges (those chars are single bytes in UTF-8, so the byte test is
    * exact), tokens split on `\s+` runs (0x09–0x0d, 0x20 — interior
    * control bytes stay inside tokens, as with Java regex `\s`), and an
    * empty trimmed text yields one empty token (Java
    * `"".split("\\s+")` → `[""]`). */
  def compute(s: UTF8String,
              k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val b = s.toLowerCase.getBytes
    var lo = 0
    var hi = b.length
    while (lo < hi && b(lo) >= 0 && b(lo) <= 0x20) lo += 1
    while (hi > lo && b(hi - 1) >= 0 && b(hi - 1) <= 0x20) hi -= 1
    // tokenize: (start, end) spans over [lo, hi), \s+ runs as separators
    var m = 0
    var i = lo
    val cap = (hi - lo) / 2 + 1
    val starts = new Array[Int](cap)
    val ends = new Array[Int](cap)
    while (i < hi) {
      while (i < hi && isWs(b(i))) i += 1
      if (i < hi) {
        starts(m) = i
        while (i < hi && !isWs(b(i))) i += 1
        ends(m) = i
        m += 1
      }
    }
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    import org.apache.spark.sql.catalyst.expressions.{XXH64 => X}
    val hashes: Array[Long] =
      if (m == 0) {
        // blank text: one empty token → one empty unit for every k
        Array(X.hashUnsafeBytes(b, off, 0, 42L))
      } else if (k <= 1) {
        val out = new Array[Long](m)
        var t = 0
        while (t < m) {
          out(t) = X.hashUnsafeBytes(b, off + starts(t),
            ends(t) - starts(t), 42L)
          t += 1
        }
        out
      } else {
        // shingles of k tokens joined by one 0x20; docs of ≤ k tokens
        // collapse to the single whole-text shingle
        val nUnits = if (m <= k) 1 else m - k + 1
        val width = if (m <= k) m else k
        val out = new Array[Long](nUnits)
        val buf = new Array[Byte](hi - lo)
        var g = 0
        while (g < nUnits) {
          var p = 0
          var t = g
          while (t < g + width) {
            if (t > g) { buf(p) = 0x20.toByte; p += 1 }
            val tl = ends(t) - starts(t)
            System.arraycopy(b, starts(t), buf, p, tl)
            p += tl
            t += 1
          }
          out(g) = X.hashUnsafeBytes(buf, off, p, 42L)
          g += 1
        }
        out
      }
    java.util.Arrays.sort(hashes)
    var n = 0
    var q = 0
    while (q < hashes.length) {
      if (n == 0 || hashes(q) != hashes(n - 1)) {
        hashes(n) = hashes(q)
        n += 1
      }
      q += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(hashes, n))
  }
}

/** Native Unicode NFC normalization — the canonical-composition step
  * web-corpus pipelines run before hashing/dedup (decomposed "e"+U+0301
  * and precomposed "é" must land in the same bucket). Wraps
  * `java.text.Normalizer` (the JDK's Unicode-standard implementation,
  * byte-identical to ICU/DuckDB `nfc_normalize` — the q_nfc_normalize
  * oracle pins that) behind a codegen'd expression with an ASCII fast
  * path: ASCII is already NFC, so the common case never allocates. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = NfcNormalize.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    // ASCII fast path: numBytes == numChars ⟺ pure ASCII ⟹ already NFC
    if (s.numBytes() == s.numChars()) return s
    val str = s.toString
    val n = java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC)
    if (n eq str) s else UTF8String.fromString(n)
  }
}

/** Native DSIR featurization: per-document hashed uni+bigram bucket
  * counts in ONE primitive pass. Returns an array of packed longs
  * `(bucket << 32) | count`, buckets ascending — callers explode the
  * (≤ min(grams, dim))-element array and unpack, replacing the
  * gram-per-row explode + md5 projection + groupBy(id, bucket) shuffle
  * of the Column formulation (graft.text.DsirOps.uniBigrams +
  * hashedBucketHex) with a shuffle-FREE projection. Semantics are
  * bit-for-bit the Column path's: tokens = `\s+` split of
  * lowercase(trim(text)) with empties dropped; grams = tokens plus
  * adjacent pairs joined by one 0x20; bucket =
  * `conv(substring(md5(gram), 1, hexChars), 16, 10) % dim` (md5 over
  * the gram's UTF-8 bytes, first hexChars hex digits as an unsigned
  * value). Why native: the Column path nests four HigherOrderFunctions
  * (no codegen) and shuffles one row per gram; this runs inside
  * whole-stage codegen and shuffles nothing (verdict r7 ask #5 —
  * q_dsir's explode-heavy cold path). SQL `graft_md_bucket_counts`;
  * DSL [[NativeFunctions.mdBucketCountsNative]]. */
case class MdBucketCounts(child: Expression, dim: Int, hexChars: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(dim >= 2 && dim <= (1 << 22),
    s"graft_md_bucket_counts: dim must be in [2, 2^22], got $dim")
  require(hexChars >= 1 && hexChars <= 12,
    s"graft_md_bucket_counts: hexChars must be in [1,12], got $hexChars")
  require(math.pow(16, hexChars) >= dim,
    s"graft_md_bucket_counts: 16^$hexChars < dim=$dim — unreachable buckets")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    MdBucketCounts.compute(s.asInstanceOf[UTF8String], dim, hexChars)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = MdBucketCounts.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c, $dim, $hexChars)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MdBucketCounts = copy(child = newChild)
}

object MdBucketCounts {
  private val EMPTY =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Long](0))

  private val MD5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean =
    b == 0x20.toByte || (b >= 0x09.toByte && b <= 0x0d.toByte)

  /** Bucket of one gram held in buf[0, len): first `hexChars` hex
    * digits of md5 as an unsigned value, mod dim. */
  private def bucketOf(md: java.security.MessageDigest, buf: Array[Byte],
                       len: Int, dim: Int, hexChars: Int): Int = {
    md.reset()
    md.update(buf, 0, len)
    val dg = md.digest()
    var v = 0L
    var i = 0
    while (i < hexChars) {
      val nib =
        if ((i & 1) == 0) (dg(i >> 1) >> 4) & 0xf else dg(i >> 1) & 0xf
      v = (v << 4) | nib
      i += 1
    }
    (v % dim).toInt
  }

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, dim: Int,
              hexChars: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val b = s.toLowerCase.trim.getBytes
    val len = b.length
    // tokenize: spans of non-\s bytes (regex-split empties only occur
    // at the leading edge and the Column path filters them out)
    var m = 0
    var i = 0
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    while (i < len) {
      while (i < len && isWs(b(i))) i += 1
      if (i < len) {
        starts(m) = i
        while (i < len && !isWs(b(i))) i += 1
        ends(m) = i
        m += 1
      }
    }
    if (m == 0) return EMPTY
    val counts = new Array[Int](dim)
    val md = MD5.get()
    val buf = new Array[Byte](len)
    // unigrams
    var t = 0
    while (t < m) {
      val tl = ends(t) - starts(t)
      System.arraycopy(b, starts(t), buf, 0, tl)
      counts(bucketOf(md, buf, tl, dim, hexChars)) += 1
      t += 1
    }
    // bigrams: adjacent tokens joined by one space
    t = 0
    while (t < m - 1) {
      val l1 = ends(t) - starts(t)
      val l2 = ends(t + 1) - starts(t + 1)
      System.arraycopy(b, starts(t), buf, 0, l1)
      buf(l1) = 0x20.toByte
      System.arraycopy(b, starts(t + 1), buf, l1 + 1, l2)
      counts(bucketOf(md, buf, l1 + 1 + l2, dim, hexChars)) += 1
      t += 1
    }
    var nz = 0
    i = 0
    while (i < dim) { if (counts(i) != 0) nz += 1; i += 1 }
    val out = new Array[Long](nz)
    var o = 0
    i = 0
    while (i < dim) {
      if (counts(i) != 0) {
        out(o) = (i.toLong << 32) | counts(i).toLong
        o += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native deflate compression ratio: raw-DEFLATE(level 6) byte count of
  * the UTF-8 text divided by its raw byte count. The classic cheap
  * repetition / degenerate-content quality signal for corpus curation
  * (boilerplate, template spam and `aaaa…` runs compress far below
  * natural prose; encrypted/base64 junk compresses above it) — the
  * compression-ratio filter used alongside the Gopher/C4 rule families.
  * Empty text → null (no ratio).
  *
  * Scale shape: row-local, rides the scan inside whole-stage codegen,
  * one thread-local JDK zlib Deflater reused per executor thread (no
  * per-row native allocation). At 100 TB this is one streaming pass —
  * the same shape as the other per-document kernels here.
  *
  * Determinism contract: the exact ratio is "whatever this JVM's zlib
  * emits at level 6, raw (nowrap)" — stable for a given runtime, NOT a
  * cross-engine constant. Oracle rows therefore pin mathematically
  * guaranteed CONTRACT bounds (a 400-char single-char run deflates
  * ≤0.2; 8 concatenated distinct md5 hexes deflate ≥0.35) on inputs
  * both engines construct bit-identically; exact values are pinned
  * against a direct JDK Deflater call in the ScalaTest spec. */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any): Any = {
    val raw = s.asInstanceOf[UTF8String].getBytes
    if (raw.length == 0) null else DeflateRatio.computeBytes(raw)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = DeflateRatio.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      val raw = ctx.freshName("raw")
      s"""
        byte[] $raw = $c.getBytes();
        if ($raw.length == 0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $cls.computeBytes($raw);
        }
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): DeflateRatio = copy(child = newChild)
}

object DeflateRatio {
  // nowrap (raw deflate): no 2-byte zlib header / 4-byte adler trailer,
  // so short-string ratios reflect the entropy coder, not framing
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  /** Shared by interpreted eval and generated code; raw must be
    * non-empty. */
  def computeBytes(raw: Array[Byte]): Double = {
    val d = local.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    var total = 0L
    val buf = new Array[Byte](8192)
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / raw.length
  }
}

/** Native intersection SIZE of two ascending-sorted distinct
  * array<long> columns — the exact-Jaccard verify kernel of the
  * SSJoin prefix-filter path ([[graft.text.TextOps.jaccardDupPairs]]'s
  * large-block leg). Both inputs MUST be sorted ascending with distinct
  * elements (the [[SortedTokenHashes]] contract); the kernel is then a
  * single primitive two-pointer merge, O(|a|+|b|) with zero allocation,
  * replacing `size(array_intersect(...))` (which builds a hash set and
  * an output array PER candidate pair — the verify leg rides every
  * candidate of the 100 TB dedup funnel). Unsorted input underscounts;
  * it never crashes. Null semantics: null array → null (nullIntolerant);
  * null ELEMENTS are not expected from the tokenizer but any present
  * sort first in ArrayData and are skipped defensively via the
  * containsNull=false input contract. SQL `graft_sorted_intersect_size`;
  * DSL [[NativeFunctions.sortedIntersectSizeNative]]. */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(LongType),
      org.apache.spark.sql.types.ArrayType(LongType))
  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongIntersectSize.compute(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = SortedLongIntersectSize.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$cls.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectSize {
  /** Shared by interpreted eval and generated code. Two-pointer merge
    * over ascending-sorted arrays. */
  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData,
              b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n1 = a.numElements()
    val n2 = b.numElements()
    var p = 0; var q = 0; var common = 0
    while (p < n1 && q < n2) {
      val x = a.getLong(p)
      val y = b.getLong(q)
      if (x < y) p += 1
      else if (x > y) q += 1
      else { common += 1; p += 1; q += 1 }
    }
    common
  }
}

/** Native MinHash signature over `k`-word shingles, `numHashes`
  * permutation slots — the signing kernel of MinHash-LSH dedup
  * (reference: python/polars_ds/exprs/str2.py min-hash similarity
  * surface; the LSH banding around it is graft's scale addition).
  *
  * Semantics are frozen to the historical Scala-UDF formulation in
  * graft.text.TextOps.minHashSignature, hash-for-hash: tokenize with
  * `toLowerCase.trim.split("\\s+")` (Locale.ROOT — identical output
  * on any non-Turkic default locale; blank text yields the single
  * empty shingle, docs of ≤ k words the single whole-text shingle),
  * hash each shingle ONCE with the shared FNV-1a + splitmix64
  * saltedHash (seed 0 — the same base hash SimHash64 uses, keeping
  * minhash and simhash consistent on the same tokens), then derive
  * the `numHashes`-member hash family by a splitmix64 finalizer over
  * (base + i·φ64) and keep the per-slot minimum.
  *
  * Why native: signing is THE dominant compute of every minhash
  * call — each document's text is scanned once but the derivation
  * loop runs numHashes (128) times per shingle, and the UDF paid a
  * SerDe boundary plus a boxed Seq[Long] per row on exactly the
  * operator that 100 TB dedup runs over every document. The shingle
  * hash here is computed INCREMENTALLY over the word spans (no
  * shingle string is ever materialized), and the signature array
  * lands directly in a GenericArrayData inside whole-stage codegen.
  * SQL `graft_minhash_sig`; DSL [[NativeFunctions.minHashSigNative]].
  */
case class MinHashSig(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(shingleK >= 1,
    s"graft_minhash_sig: shingleK must be >= 1, got $shingleK")
  require(numHashes >= 1,
    s"graft_minhash_sig: numHashes must be >= 1, got $numHashes")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    MinHashSig.compute(s.asInstanceOf[UTF8String], shingleK, numHashes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = MinHashSig.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c, $shingleK, $numHashes)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSig = copy(child = newChild)
}

object MinHashSig {
  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int,
              numHashes: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = s.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.split("\\s+")
    val m = words.length // >= 1: "".split("\\s+") yields [""]
    val nUnits = if (m <= k) 1 else m - k + 1
    val width = if (m <= k) m else k
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var g = 0
    while (g < nUnits) {
      // FNV-1a over the shingle's UTF-16 chars (words joined by one
      // space), computed over the word spans — seed 0 leaves the FNV
      // offset basis unchanged, matching saltedHash(shingle, 0)
      var h = 0xcbf29ce484222325L
      var t = g
      while (t < g + width) {
        if (t > g) { h ^= 0x20L; h *= 0x100000001b3L }
        val w = words(t)
        var i = 0
        while (i < w.length) {
          h ^= w.charAt(i).toLong
          h *= 0x100000001b3L
          i += 1
        }
        t += 1
      }
      h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
      h ^= (h >>> 27); h *= 0x94d049bb133111ebL
      val base = h ^ (h >>> 31)
      var j = 0
      while (j < numHashes) {
        var x = base + j.toLong * 0x9E3779B97F4A7C15L
        x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
        x ^= (x >>> 27); x *= 0x94D049BB133111EBL
        x ^= (x >>> 31)
        if (x < sig(j)) sig(j) = x
        j += 1
      }
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }
}
